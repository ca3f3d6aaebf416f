"""WAV codec tests: round-trips, equivalence against the independent
stdlib ``wave`` implementation, chunk-walking robustness, error paths."""

import io
import struct
import wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokrle.functions.wav import decode_wav, encode_wav


@settings(max_examples=50, deadline=None)
@given(n=st.integers(1, 5000), ch=st.integers(1, 4),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 99))
def test_wav_roundtrip_bit_identical(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(samples, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


def test_wav_matches_stdlib_wave_both_directions():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, (777, 2)).astype(np.int16)
    payload = encode_wav(samples, sample_rate=22050)

    # stdlib reads ours
    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == \
            (2, 2, 22050)
        frames = np.frombuffer(w.readframes(w.getnframes()),
                               dtype="<i2").reshape(-1, 2)
    assert np.array_equal(frames, samples)

    # ours reads stdlib's
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(samples.astype("<i2").tobytes())
    out, rate = decode_wav(buf.getvalue())
    assert rate == 22050
    assert np.array_equal(out, samples)


def test_wav_skips_unknown_chunks_and_word_aligns():
    samples = np.arange(-50, 50, dtype=np.int16)
    payload = bytearray(encode_wav(samples, sample_rate=8000))
    # splice an odd-length LIST chunk (word-aligned with a pad byte)
    # between fmt and data: RIFF(12) + fmt(8+16) = offset 36
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    payload[36:36] = extra
    payload[4:8] = struct.pack("<I", len(payload) - 8)
    out, rate = decode_wav(bytes(payload))
    assert rate == 8000
    assert np.array_equal(out[:, 0], samples)


def test_wav_error_paths():
    samples = np.zeros(64, dtype=np.int16)
    payload = encode_wav(samples)
    with pytest.raises(ValueError):
        decode_wav(b"JUNK" + payload[4:])
    with pytest.raises(ValueError):
        decode_wav(payload[: len(payload) - 10])     # truncated data chunk
    with pytest.raises(ValueError):
        encode_wav(samples.astype(np.float32))       # not int16
    # non-PCM format tag
    bad = bytearray(payload)
    bad[20:22] = struct.pack("<H", 3)                # IEEE float tag
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_audio_sampler_decodes_real_wav(ray_session):
    import ray.data

    from tokrle.functions.multimodal import AudioFrameSampler, \
        synth_media_table

    media = synth_media_table(8, kind="audio")
    blob = media.take(1)[0]["media"]
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    out = media.map_batches(AudioFrameSampler, batch_size=4,
                            batch_format="pyarrow",
                            concurrency=(1, 2)).to_pandas()
    assert len(out) == 8 * 4
    # a sine at amplitude 6000 has RMS ~ 6000/sqrt(2) ~ 4243
    assert (out["rms"] > 1000).all() and (out["rms"] < 10000).all()
