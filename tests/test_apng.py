"""APNG codec tests: per-frame round-trips, frame independence,
spec-layout checks, error paths, video sampler integration."""

import struct
import zlib

import numpy as np
import pytest

from tokrle.functions.apng import (apng_frame_count, decode_apng_frame,
                                   encode_apng, is_apng)
from tokrle.functions.png import _SIG, decode_png


def _frames(n=4, h=9, w=13, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            for _ in range(n)]


@pytest.mark.parametrize("filter_type", [0, 2])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_apng_roundtrip_every_frame(filter_type, ch):
    frames = _frames(5, ch=ch, seed=ch)
    payload = encode_apng(frames, filter_type=filter_type)
    assert is_apng(payload)
    assert apng_frame_count(payload) == 5
    for i, f in enumerate(frames):
        out = decode_apng_frame(payload, i)
        assert np.array_equal(out, f if ch != 1 else f)


def test_apng_frames_decode_independently():
    """Corrupting frame 1's data must not affect frames 0 and 2 —
    proves per-frame zlib streams (the property the sampler relies on
    to skip frames)."""
    frames = _frames(3)
    payload = bytearray(encode_apng(frames, filter_type=0))
    # find the first fdAT chunk and corrupt its zlib body
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = bytes(payload[pos + 4:pos + 8])
        if tag == b"fdAT":
            payload[pos + 16] ^= 0xFF
            break
        pos += 12 + length
    corrupted = bytes(payload)
    assert np.array_equal(decode_apng_frame(corrupted, 0), frames[0])
    assert np.array_equal(decode_apng_frame(corrupted, 2), frames[2])
    with pytest.raises(ValueError):
        decode_apng_frame(corrupted, 1)


def test_apng_default_image_is_plain_png():
    """A conformant APNG is a valid PNG whose default image is frame 0 —
    the plain decoder must read it (ignoring animation chunks)."""
    frames = _frames(3, seed=7)
    payload = encode_apng(frames, filter_type=2)
    assert np.array_equal(decode_png(payload), frames[0])


def test_apng_error_paths():
    frames = _frames(2)
    payload = encode_apng(frames)
    with pytest.raises(ValueError):
        decode_apng_frame(payload, 2)                 # out of range
    with pytest.raises(ValueError):
        decode_apng_frame(payload[:40], 0)            # truncated
    plain_png_like = encode_apng(frames[:1])
    # still an APNG (acTL present) with one frame
    assert apng_frame_count(plain_png_like) == 1
    with pytest.raises(ValueError):
        encode_apng([])
    with pytest.raises(ValueError):
        encode_apng([frames[0], frames[0][:5]])       # shape mismatch
    # sub-region frame rejected: hand-build an fcTL with an offset
    bad = bytearray(payload)
    pos = 8
    while pos + 8 <= len(bad):
        (length,) = struct.unpack(">I", bad[pos:pos + 4])
        tag = bytes(bad[pos + 4:pos + 8])
        if tag == b"fcTL":
            body = bytearray(bad[pos + 8:pos + 8 + length])
            body[12:16] = struct.pack(">I", 1)        # x_offset = 1
            bad[pos + 8:pos + 8 + length] = body
            bad[pos + 8 + length:pos + 12 + length] = struct.pack(
                ">I", zlib.crc32(tag + bytes(body)))
            break
        pos += 12 + length
    with pytest.raises(ValueError):
        decode_apng_frame(bytes(bad), 0)


def test_is_apng_sniff_negative():
    from tokrle.functions.png import encode_png

    plain = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert not is_apng(plain)
    assert not is_apng(b"RIFF....WAVE")


def test_video_sampler_decodes_real_apng(ray_session):
    from tokrle.functions.multimodal import VideoFrameSampler, \
        synth_media_table

    media = synth_media_table(6, kind="video")
    blob = media.take(1)[0]["media"]
    assert blob[:8] == _SIG and is_apng(blob)
    out = media.map_batches(VideoFrameSampler, batch_size=4,
                            batch_format="pyarrow",
                            concurrency=(1, 2)).to_pandas()
    assert len(out) == 6 * 4
    # drifting gradient: frame means must differ across frames of one item
    one = out[out["item_id"] == out["item_id"].iloc[0]]
    assert one["mean_intensity"].nunique() > 1
