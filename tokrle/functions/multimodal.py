"""Multimodal (image/audio/video) stages: opaque ``binary`` payload columns
with typed metadata, processed by actor-pool map_batches stages.

Image decode is REAL for PNG payloads (pure-stdlib codec in
tokrle.functions.png) AND baseline JPEG payloads (pure-NumPy T.81
codec in tokrle.functions.jpeg: Huffman scan, dequant, vectorized
IDCT, chroma upsampling); audio decode is REAL for WAV payloads
(RIFF/WAVE parser in tokrle.functions.wav); the synthetic media table
writes genuine PNGs + JPEGs / WAVs so the pipelines exercise
spec-conformant decoding end-to-end, including format dispatch.  Video
decode is REAL for APNG payloads (acTL/fcTL/fdAT frame extraction in
tokrle.functions.apng, the synth video table writes genuine APNGs);
remaining formats (progressive JPEG, mp4, WebP) use a deterministic
stand-in — no libjpeg/ffmpeg in this container — swappable via the
``decoder=`` hook; the surrounding plumbing (schema, batch sizing,
actor signature, output layout) is real and tested either way.

Schema convention for a media table:
    item_id: string, media: binary, media_type: string ("image"|"audio"|...),
    width/height or sample_rate: int32 metadata columns.

Large binary payloads need SMALL batch sizes (a 1 MB image at
batch_size=4096 would make 4 GB batches): these stages default to
batch_size 32-64 and should keep ``DataContext.target_max_block_size`` at
its default so blocks split on payload size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.functions.dedup import auto_concurrency as _auto


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC STAND-IN for an image decoder (no PIL/libjpeg in this
    container).  Expands the payload bytes into an (h, w, 3) uint8 array by
    tiling — replace with a real decoder via the ``decoder=`` hook."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    if len(raw) == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(height, width, 3)


def png_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL image decode for PNG payloads (stdlib-zlib codec in
    tokrle.functions.png — chunk parse, inflate, full filter
    reconstruction); validates the decoded dimensions against the
    table's metadata columns.  Grey images broadcast to 3 channels so
    the feature stage sees a uniform (h, w, 3) layout."""
    from tokrle.functions.png import decode_png

    img = decode_png(payload)
    if img.shape[0] != height or img.shape[1] != width:
        raise ValueError(
            f"media metadata says {height}x{width}, PNG decodes to "
            f"{img.shape[0]}x{img.shape[1]}")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def jpeg_decode_image(payload: bytes, width: int,
                      height: int) -> np.ndarray:
    """REAL image decode for baseline JPEG payloads (pure-NumPy T.81
    codec in tokrle.functions.jpeg: Huffman scan, dequant, vectorized
    IDCT, 4:2:0 upsampling); validates dimensions against the table's
    metadata columns and broadcasts grayscale to 3 channels."""
    from tokrle.functions.jpeg import decode_jpeg

    img = decode_jpeg(payload)
    if img.shape[0] != height or img.shape[1] != width:
        raise ValueError(
            f"media metadata says {height}x{width}, JPEG decodes to "
            f"{img.shape[0]}x{img.shape[1]}")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Default decode hook: real PNG / baseline-JPEG decode when the
    payload signature matches (both codecs are pure-stdlib, in
    tokrle.functions.png / .jpeg); deterministic stand-in for the
    remaining formats (progressive JPEG, WebP, ...)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode_image(payload, width, height)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode_image(payload, width, height)
    return fake_decode_image(payload, width, height)


def real_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Strict production hook: PNG and baseline JPEG decode for real
    (pure stdlib); anything else raises rather than silently faking —
    wire PIL/libjpeg here if the runtime ever gains them."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode_image(payload, width, height)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode_image(payload, width, height)
    raise NotImplementedError(
        "only PNG and baseline JPEG decode natively in this runtime; "
        "other formats need an image library (PIL/ffmpeg) — use "
        "decode_image for plumbing tests with the deterministic stand-in")


class ImageFeatures:
    """Actor stage: decode -> resize (stride subsample) -> channel-stat
    feature vector.  Setup (decoder choice, resize plan) happens once per
    actor; __call__ is per batch."""

    def __init__(self, out_size: int = 32, decoder=decode_image) -> None:
        self.out_size = out_size
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            w = batch.column("width")[i].as_py()
            h = batch.column("height")[i].as_py()
            img = self.decoder(payload, w, h)
            # resize by integer stride sampling (vectorized)
            sy = max(1, img.shape[0] // self.out_size)
            sx = max(1, img.shape[1] // self.out_size)
            small = img[::sy, ::sx][:self.out_size, :self.out_size]
            feats.append(np.concatenate([
                small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                [small.min(), small.max()]]).astype(np.float32))
        mat = np.stack(feats) if feats else np.zeros((0, 8), dtype=np.float32)
        flat = pa.array(mat.ravel(), type=pa.float32())
        offs = pa.array(np.arange(len(feats) + 1, dtype=np.int32) * mat.shape[1]
                        if feats else [0], type=pa.int32())
        return pa.table({
            "item_id": batch.column("item_id"),
            "features": pa.ListArray.from_arrays(offs, flat),
        })


class ImagePixelSums:
    """Actor stage: decode (strict real codecs) -> stride subsample ->
    EXACT integer pixel sum.

    The bit-exact companion to ImageFeatures: float channel stats can't
    be hash-compared against an external oracle, but the strided pixel
    sum of a losslessly-coded image is a pure integer function of the
    source pixels — so a planted gradient PNG gives the whole decode
    path (chunk parse, inflate, filter reconstruction, stride plan) an
    arithmetic oracle."""

    def __init__(self, out_size: int = 8, decoder=real_decode_image) -> None:
        self.out_size = out_size
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        sums = np.empty(len(batch), dtype=np.int64)
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            w = batch.column("width")[i].as_py()
            h = batch.column("height")[i].as_py()
            img = self.decoder(payload, w, h)
            sy = max(1, img.shape[0] // self.out_size)
            sx = max(1, img.shape[1] // self.out_size)
            small = img[::sy, ::sx][:self.out_size, :self.out_size]
            sums[i] = int(small.astype(np.int64).sum())
        return pa.table({
            "item_id": batch.column("item_id"),
            "pixel_sum": pa.array(sums, type=pa.int64()),
        })


class AudioFrameSampler:
    """Actor stage: sample fixed-length windows from an audio payload.

    REAL decode for WAV payloads (RIFF sniff -> the spec-conformant
    stdlib-only codec in tokrle.functions.wav; multi-channel mixes down
    to mono); raw int16-PCM convention for bare payloads.  Deterministic
    window positions."""

    def __init__(self, window: int = 1024, n_windows: int = 4) -> None:
        self.window = window
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokrle.functions.wav import decode_wav

        out_id, out_win, out_rms = [], [], []
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            if payload[:4] == b"RIFF":
                samples, _rate = decode_wav(payload)
                pcm = samples.astype(np.int32).mean(axis=1) \
                    .astype(np.int16) if samples.shape[1] > 1 \
                    else samples[:, 0]
            else:
                # tolerate odd-length payloads (truncated final sample)
                pcm = np.frombuffer(payload[:len(payload) // 2 * 2],
                                    dtype=np.int16)
            if len(pcm) < self.window:
                pcm = np.pad(pcm, (0, self.window - len(pcm)))
            starts = np.linspace(0, len(pcm) - self.window,
                                 self.n_windows).astype(np.int64)
            for w, s in enumerate(starts):
                seg = pcm[s:s + self.window].astype(np.float64)
                out_id.append(batch.column("item_id")[i].as_py())
                out_win.append(w)
                out_rms.append(float(np.sqrt(np.mean(seg * seg))))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.string()),
            "window": pa.array(out_win, type=pa.int32()),
            "rms": pa.array(out_rms, type=pa.float64()),
        })


class AudioWindowSums:
    """Actor stage: REAL WAV decode -> evenly-spaced windows -> EXACT
    integer sample sums.

    The bit-exact companion to AudioFrameSampler: float RMS can't be
    hash-compared, but int16 PCM survives the WAV round-trip losslessly,
    so a planted integer waveform gives the RIFF parser and window plan
    an arithmetic oracle.  Window starts use the same linspace plan as
    AudioFrameSampler; callers wanting SQL-exact positions pick payload
    lengths with (n_samples - window) divisible by (n_windows - 1)."""

    def __init__(self, window: int = 1024, n_windows: int = 4) -> None:
        self.window = window
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokrle.functions.wav import decode_wav

        out_id, out_win, out_sum = [], [], []
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            samples, _rate = decode_wav(payload)
            pcm = samples[:, 0]
            if len(pcm) < self.window:
                # same guard as AudioFrameSampler: zero-pad short
                # payloads so the linspace starts stay non-negative
                # (zeros keep the integer sums exact)
                pcm = np.pad(pcm, (0, self.window - len(pcm)))
            starts = np.linspace(0, len(pcm) - self.window,
                                 self.n_windows).astype(np.int64)
            for w, s in enumerate(starts):
                out_id.append(batch.column("item_id")[i].as_py())
                out_win.append(w)
                out_sum.append(int(pcm[s:s + self.window]
                               .astype(np.int64).sum()))
        return pa.table({
            # mirror the input id type: the module's blessed media
            # tables use string ids, the arithmetic-oracle queries int
            "item_id": pa.array(out_id, type=batch.column("item_id").type),
            "window": pa.array(out_win, type=pa.int32()),
            "window_sum": pa.array(out_sum, type=pa.int64()),
        })


def fake_decode_video_frame(payload: bytes, frame_idx: int, width: int,
                            height: int) -> np.ndarray:
    """DETERMINISTIC STAND-IN for video frame extraction (no ffmpeg in
    this container): frame k is the payload tiled with a k-byte rotation —
    replace with a real seek+decode via the ``frame_decoder=`` hook."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    raw = np.roll(raw, -frame_idx)
    need = width * height * 3
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(height, width, 3)


def apng_decode_video_frame(payload: bytes, frame_idx: int, width: int,
                            height: int) -> np.ndarray:
    """REAL video frame decode for APNG payloads (acTL/fcTL/fdAT parse,
    per-frame independent zlib streams — tokrle.functions.apng).  A
    sampler asking for more frames than the container holds clamps to
    the last frame (evenly-spaced sampling semantics)."""
    from tokrle.functions.apng import apng_frame_count, decode_apng_frame

    n = apng_frame_count(payload)
    img = decode_apng_frame(payload, min(frame_idx, n - 1))
    if img.shape[0] != height or img.shape[1] != width:
        raise ValueError(
            f"media metadata says {height}x{width}, APNG decodes to "
            f"{img.shape[0]}x{img.shape[1]}")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def decode_video_frame(payload: bytes, frame_idx: int, width: int,
                       height: int) -> np.ndarray:
    """Default video decode hook: real APNG frame extraction when the
    payload is an APNG (signature + acTL sniff); deterministic stand-in
    for other containers (mp4 etc. would need ffmpeg, absent here)."""
    from tokrle.functions.apng import is_apng

    if is_apng(payload):
        return apng_decode_video_frame(payload, frame_idx, width, height)
    return fake_decode_video_frame(payload, frame_idx, width, height)


class VideoFrameSampler:
    """Actor stage: sample ``n_frames`` evenly-spaced frames from a video
    byte payload and emit per-frame channel-mean features.  Setup (frame
    plan, decoder choice) once per actor; payloads stay binary columns and
    batches stay SMALL (video payloads are the largest media class)."""

    def __init__(self, n_frames: int = 4, out_size: int = 16,
                 frame_decoder=decode_video_frame) -> None:
        self.n_frames = n_frames
        self.out_size = out_size
        self.frame_decoder = frame_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_mean = [], [], []
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            w = batch.column("width")[i].as_py()
            h = batch.column("height")[i].as_py()
            for f in range(self.n_frames):
                img = self.frame_decoder(payload, f, w, h)
                sy = max(1, img.shape[0] // self.out_size)
                sx = max(1, img.shape[1] // self.out_size)
                small = img[::sy, ::sx][:self.out_size, :self.out_size]
                out_id.append(batch.column("item_id")[i].as_py())
                out_frame.append(f)
                out_mean.append(float(small.mean()))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.string()),
            "frame": pa.array(out_frame, type=pa.int32()),
            "mean_intensity": pa.array(out_mean, type=pa.float64()),
        })


class VideoFramePixelSums:
    """Actor stage: REAL APNG frame decode -> stride subsample -> EXACT
    integer pixel sums per sampled frame (the bit-exact companion to
    VideoFrameSampler, same stride plan as ImagePixelSums)."""

    def __init__(self, n_frames: int = 4, out_size: int = 8,
                 frame_decoder=None) -> None:
        self.n_frames = n_frames
        self.out_size = out_size
        self.frame_decoder = frame_decoder or apng_decode_video_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_sum = [], [], []
        for i in range(len(batch)):
            payload = batch.column("media")[i].as_py()
            w = batch.column("width")[i].as_py()
            h = batch.column("height")[i].as_py()
            for f in range(self.n_frames):
                img = self.frame_decoder(payload, f, w, h)
                sy = max(1, img.shape[0] // self.out_size)
                sx = max(1, img.shape[1] // self.out_size)
                small = img[::sy, ::sx][:self.out_size, :self.out_size]
                out_id.append(batch.column("item_id")[i].as_py())
                out_frame.append(f)
                out_sum.append(int(small.astype(np.int64).sum()))
        return pa.table({
            "item_id": pa.array(out_id, type=batch.column("item_id").type),
            "frame": pa.array(out_frame, type=pa.int32()),
            "pixel_sum": pa.array(out_sum, type=pa.int64()),
        })


def synth_media_table(n: int, *, kind: str = "image", seed: int = 11):
    """Deterministic fake media table for plumbing tests/benches."""
    import ray.data

    def make(batch: dict) -> pa.Table:
        from tokrle.functions.png import encode_png

        idx = batch["id"].astype(np.int64)
        ids, blobs, widths, heights = [], [], [], []
        for i in idx:
            rng = np.random.default_rng(seed * 1_000_003 + int(i))
            w = int(rng.integers(16, 64))
            h = int(rng.integers(16, 64))
            if kind == "image":
                # REAL payloads, alternating PNG and baseline JPEG per
                # item so the decode stage exercises BOTH genuine codec
                # paths (format dispatch included)
                yy, xx = np.mgrid[0:h, 0:w]
                base = ((yy * 3 + xx * 5 + int(i)) % 256)[..., None]
                img = (base + rng.integers(0, 32, (h, w, 3))) \
                    .astype(np.uint8)
                if int(i) % 2:
                    from tokrle.functions.jpeg import encode_jpeg

                    blobs.append(encode_jpeg(img, quality=85))
                else:
                    blobs.append(encode_png(img, filter_type=2))
            elif kind == "audio":
                # REAL WAV payloads (sine + noise, 16 kHz mono int16) so
                # the decode stage exercises the genuine RIFF parser
                from tokrle.functions.wav import encode_wav

                n_samp = int(rng.integers(2048, 8192))
                t = np.arange(n_samp, dtype=np.float64)
                freq = 100.0 + float(i % 40) * 25.0
                sig = (6000 * np.sin(2 * np.pi * freq * t / 16000)
                       + rng.integers(-500, 500, n_samp))
                blobs.append(encode_wav(
                    np.clip(sig, -32768, 32767).astype(np.int16),
                    sample_rate=16000))
            elif kind == "video":
                # REAL APNG payloads (drifting gradient frames) so the
                # frame sampler exercises the genuine container parse
                from tokrle.functions.apng import encode_apng

                yy, xx = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(6):
                    base = ((yy * 3 + xx * 5 + int(i) + f * 17)
                            % 256)[..., None]
                    frames.append(
                        (base + rng.integers(0, 16, (h, w, 3)))
                        .astype(np.uint8))
                blobs.append(encode_apng(frames, filter_type=2))
            else:
                blobs.append(rng.integers(0, 256, size=w * h // 2,
                                          dtype=np.int64)
                             .astype(np.uint8).tobytes())
            ids.append(f"item{int(i)}")
            widths.append(w)
            heights.append(h)
        return pa.table({
            "item_id": pa.array(ids, type=pa.string()),
            "media": pa.array(blobs, type=pa.binary()),
            "media_type": pa.array([kind] * len(ids), type=pa.string()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
        })

    return ray.data.range(n).map_batches(make, batch_format="numpy")


def image_feature_pipeline(media_ds, *, out_size: int = 32,
                           concurrency=None, batch_size: int = 32):
    """The real Ray plumbing: small batches (large payloads), actor pool."""
    return media_ds.map_batches(
        ImageFeatures, batch_size=batch_size, batch_format="pyarrow",
        fn_constructor_kwargs={"out_size": out_size},
        concurrency=concurrency or _auto())
