"""Real PNG codec tests: round-trips, all five filter reconstructions
(against an independent forward-filter reference), and the multimodal
wiring that replaced the r2 decode stand-in."""

import struct
import zlib

import numpy as np
import pytest

from tokrle.functions.png import _SIG, decode_png, encode_png


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 1), (16, 9, 3),
                                   (5, 23, 4), (1, 1, 3)])
@pytest.mark.parametrize("filter_type", [0, 2])
def test_png_roundtrip_bit_identical(shape, filter_type):
    rng = np.random.default_rng(sum(shape) + filter_type)
    img = rng.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    want = img if img.ndim == 3 else img[:, :, None]
    assert out.shape == want.shape
    assert np.array_equal(out, want)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent spec-literal forward filtering (the encoder decode_png
    must invert), all-Python per-pixel."""
    h, w, ch = img.shape
    rows = img.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        out.append(f)
        rec = rows[y]
        for x in range(stride):
            a = int(rec[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = rec[x]
            elif f == 1:
                v = rec[x] - a
            elif f == 2:
                v = rec[x] - b
            elif f == 3:
                v = rec[x] - (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc else (
                    b if pb <= pc else c)
                v = rec[x] - pred
            out.append(int(v) & 0xFF)
        prev = rec
    return bytes(out)


def _wrap_png(raw: bytes, w: int, h: int, color_type: int) -> bytes:
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_decode_inverts_every_filter(filters):
    rng = np.random.default_rng(42 + sum(filters))
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.int64).astype(np.uint8)
    payload = _wrap_png(_forward_filter(img, filters), 7, 11, 2)
    assert np.array_equal(decode_png(payload), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all----")
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    deep = bytearray(encode_png(img))
    # corrupt IHDR bit depth to 16 (offset: 8 sig + 8 hdr + 8 w/h)
    deep[8 + 8 + 8] = 16
    with pytest.raises(ValueError):
        decode_png(bytes(deep))


def test_media_table_carries_real_payloads(ray_session):
    """synth_media_table alternates genuine PNG (even ids) and baseline
    JPEG (odd ids) so both real decode paths are exercised."""
    from tokrle.functions.multimodal import (decode_image,
                                             synth_media_table)

    media = synth_media_table(8).to_pandas()
    sigs = set()
    for _, row in media.iterrows():
        head = bytes(row["media"][:8])
        if head == _SIG:
            sigs.add("png")
        elif head[:2] == b"\xff\xd8":
            sigs.add("jpeg")
        else:
            raise AssertionError(f"unknown media signature {head!r}")
        img = decode_image(bytes(row["media"]), row["width"], row["height"])
        assert img.shape == (row["height"], row["width"], 3)
    assert sigs == {"png", "jpeg"}


def test_image_features_through_real_decode(ray_session):
    from tokrle.functions.multimodal import (image_feature_pipeline,
                                             synth_media_table)

    media = synth_media_table(16)
    feats = image_feature_pipeline(media, out_size=8).to_pandas()
    assert len(feats) == 16
    assert all(len(f) == 8 for f in feats["features"])
    # gradient images: means are mid-range, not degenerate
    mat = np.stack([np.asarray(f) for f in feats["features"]])
    assert (mat[:, :3] > 10).all() and (mat[:, :3] < 250).all()
