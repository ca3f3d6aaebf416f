"""Minimal REAL WAV (RIFF/WAVE) codec on the stdlib only — PCM int16,
the overwhelmingly common interchange case.  Mirrors the PNG codec in
:mod:`tokrle.functions.png`: genuine spec-conformant container parsing
so the audio pipeline's decode stage is real, not a stand-in.

Supported: 16-bit PCM (format tag 1), any channel count / sample rate.
Everything else raises ValueError.  Tested for byte-identical
round-trips against the independent stdlib ``wave`` implementation.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 array -> WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav: int16 PCM only, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("encode_wav: samples must be (n,) or (n, channels)")
    n_channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 array, sample_rate).

    Walks RIFF chunks properly (unknown chunks skipped, word-aligned),
    so files with LIST/INFO metadata between fmt and data parse fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("decode_wav: truncated RIFF (header size runs "
                         "past end of payload)")
    pos = 12
    n_channels = sample_rate = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + length > len(payload):
            raise ValueError(f"decode_wav: truncated chunk {tag!r}")
        body = payload[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)      # chunks are word-aligned
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("decode_wav: fmt chunk too short")
            fmt_tag, n_channels, sample_rate, _, _, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"decode_wav: only 16-bit PCM supported "
                    f"(format={fmt_tag}, bits={bits})")
        elif tag == b"data":
            data = body
    if n_channels is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    usable = len(data) // (2 * n_channels) * (2 * n_channels)
    samples = np.frombuffer(data[:usable], dtype="<i2") \
        .reshape(-1, n_channels)
    return samples, sample_rate
