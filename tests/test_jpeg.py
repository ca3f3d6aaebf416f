"""Baseline JPEG codec tests: the transform math is pinned to the
T.81 spec formula by an independent naive double-loop DCT reference;
the entropy path is pinned by exact round-trips of DCT-exact inputs,
PSNR floors on natural-structure images, and a cross-check against the
independently-tested PNG codec."""

import numpy as np
import pytest


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _naive_dct(block):
    """Spec-literal 2-D DCT-II (T.81 A.3.3), O(64^2) double loop —
    independent of the production matrix/einsum implementation."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = cu * cv * s
    return out


def _naive_idct(coef):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += cu * cv * coef[u, v] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = s
    return out


def test_dct_matches_spec_formula():
    """Production vectorized (I)DCT == the spec-literal double loop."""
    from tokrle.functions.jpeg import _C

    rng = np.random.default_rng(5)
    for _ in range(4):
        block = rng.uniform(-128, 127, (8, 8))
        fwd = _C @ block @ _C.T
        assert np.allclose(fwd, _naive_dct(block), atol=1e-9)
        assert np.allclose(_C.T @ fwd @ _C, block, atol=1e-9)
        assert np.allclose(_naive_idct(fwd), block, atol=1e-9)


def test_constant_image_roundtrips_exact():
    """A flat image is DCT-exact (DC only): when the DC coefficient
    divides the quantizer exactly it must survive bit-for-bit; when it
    lands on a quantizer half-step the error is at most the 1-LSB
    rounding inherent to JPEG."""
    from tokrle.functions.jpeg import decode_jpeg, encode_jpeg

    # (80-128)*8 = -384 divides the q75 DC quantizer (16) exactly
    img = np.full((24, 40, 3), 80, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (24, 40, 3)
    assert int(np.abs(out.astype(int) - 80).max()) == 0
    for q in (50, 75, 95):
        img = np.full((24, 40, 3), 77, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert int(np.abs(out.astype(int) - 77).max()) <= 1


def test_gray_roundtrip_psnr():
    from tokrle.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (40, 56, 1)
    assert _psnr(g, out[:, :, 0]) > 38      # q95 luma on pure noise
    out100 = decode_jpeg(encode_jpeg(g, quality=100))
    assert _psnr(g, out100[:, :, 0]) > 50


def test_color_roundtrip_psnr_and_dims():
    """4:2:0 color round-trip: luma survives at high fidelity; odd
    (non-MCU-multiple) dimensions crop back exactly."""
    from tokrle.functions.jpeg import (decode_jpeg, encode_jpeg,
                                       rgb_to_ycbcr)

    yy, xx = np.mgrid[0:48, 0:64]
    rng = np.random.default_rng(9)
    img = np.clip(np.stack([(xx * 2 + 60) % 200, (yy * 3 + 40) % 200,
                            ((xx + yy) + 90) % 200], axis=-1)
                  + rng.integers(0, 8, (48, 64, 3)), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 28
    ya = rgb_to_ycbcr(img)[..., 0]
    yb = rgb_to_ycbcr(out)[..., 0]
    assert _psnr(ya, yb) > 30

    odd = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    oo = decode_jpeg(encode_jpeg(odd, quality=85))
    assert oo.shape == (17, 23, 3)


def test_jpeg_vs_png_decode_agree():
    """Cross-codec check: the same image through the lossless PNG path
    and through JPEG q100 must decode to nearly identical pixels — ties
    the JPEG decoder to the independently-validated PNG decoder."""
    from tokrle.functions.jpeg import decode_jpeg, encode_jpeg
    from tokrle.functions.png import decode_png, encode_png

    yy, xx = np.mgrid[0:32, 0:48]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)[..., None]
    img = np.repeat(img, 3, axis=2)
    via_png = decode_png(encode_png(img, filter_type=2))
    via_jpeg = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(via_png, np.asarray(img))
    assert _psnr(via_png, via_jpeg) > 34


def test_restart_markers_roundtrip():
    """DRI/RSTn path: encoding with restart intervals must produce the
    same decoded pixels as without (markers change the bitstream, not
    the image), for both gray and 4:2:0 color."""
    from tokrle.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(g, quality=90))
    for interval in (1, 3, 7):
        blob = encode_jpeg(g, quality=90, restart_interval=interval)
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
        assert np.array_equal(decode_jpeg(blob), plain), interval

    img = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    blob = encode_jpeg(img, quality=80, restart_interval=2)
    assert np.array_equal(decode_jpeg(blob), plain)


def test_decoder_rejects_non_baseline():
    from tokrle.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2                    # pretend progressive
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(blob))


def test_image_features_dispatch_png_and_jpeg(ray_session):
    """The feature stage must decode mixed PNG/JPEG payloads through the
    REAL codecs (the strict hook raises on anything non-PNG/JPEG, so a
    green run proves no stand-in was used)."""
    import ray.data

    from tokrle.functions.multimodal import (ImageFeatures,
                                             real_decode_image,
                                             synth_media_table)

    media = synth_media_table(12)           # alternates PNG / JPEG
    feats = media.map_batches(
        ImageFeatures, batch_size=8, batch_format="pyarrow",
        fn_constructor_kwargs={"decoder": real_decode_image},
        concurrency=(1, 2)).to_pandas()
    assert len(feats) == 12
    mat = np.stack(feats["features"].map(np.asarray).to_list())
    assert mat.shape[1] == 8
    assert np.isfinite(mat).all()
    assert (mat[:, :3] > 0).all()           # channel means of real pixels
