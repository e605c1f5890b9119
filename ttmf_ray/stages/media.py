"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode tiers:

- REAL kernels for container-less formats — WAV/PCM audio (stdlib
  ``wave``) and P6 PPM images (pure numpy header parse + frombuffer) —
  plus a real block-mean resize.  ``synth_media_batch(real_payloads=
  True)`` generates genuine WAV/PPM bytes so the real path is tested
  end to end.
- Codec formats (JPEG/PNG, MP3, MP4 frame-sample) need libraries NOT in
  this container; those mimes raise ``NotImplementedError`` at the
  ``real_decode`` boundary (wire Pillow/libsndfile/pyav there in
  production) and tests use the deterministic fake instead.

The Ray-side plumbing is identical for both tiers: schemas, actor-pool
stages, small-batch sizing for large binary rows, and Arrow-native
binary handling (``batch_format="pyarrow"`` end to end; binary columns
do not round-trip pandas safely).

Scale notes encoded in the defaults: large payload rows ⇒ small
``batch_size`` (64) so batch × concurrency fits worker heaps, and the
decode pool is an actor pool because real decoders amortize codec /
model initialization per worker.
"""

from __future__ import annotations

import io
import wave
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# codec probes: optional libraries picked up when the environment has
# them (this container does not) — real_decode() then handles the codec
# mimes instead of raising, with zero behavior change otherwise
try:                                    # pragma: no cover - env-dependent
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None
try:                                    # pragma: no cover - env-dependent
    import soundfile as _soundfile
except ImportError:
    _soundfile = None


MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),           # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),     # audio
    ("duration_ms", pa.int32()),     # audio/video
])


def synth_media_batch(ids: np.ndarray, *, seed: int = 42,
                      real_payloads: bool = False) -> pa.Table:
    """Deterministic media rows for tests.

    ``real_payloads=True`` emits GENUINE WAV / binary-PPM bytes (video
    stays opaque — its decode is codec-bound) so the real decode path is
    exercised end to end; otherwise payloads are seeded opaque bytes."""
    from ..sources.pages import mix64

    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in ids.tolist():
        kind = kinds[mix64(seed, 900, i) % 3]
        if real_payloads and kind == "audio":
            payload, mime = synth_wav(seed, i), "audio/wav"
            width = height = 0
        elif real_payloads and kind == "image":
            w = 16 + mix64(seed, 903, i) % 48
            h = 16 + mix64(seed, 904, i) % 48
            payload, mime = synth_ppm(seed, i, w=w, h=h), \
                "image/x-portable-pixmap"
            width, height = w, h
        else:
            size = 256 + mix64(seed, 901, i) % 1024
            payload = bytes(
                (mix64(seed, 902, i, j) % 256 for j in range(size)))
            mime = {"image": "image/jpeg", "audio": "audio/wav",
                    "video": "video/mp4"}[kind]
            width = (64 + mix64(seed, 903, i) % 512
                     if kind != "audio" else 0)
            height = (64 + mix64(seed, 904, i) % 512
                      if kind != "audio" else 0)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
        rows["duration_ms"].append(1000 + mix64(seed, 905, i) % 60000
                                   if kind != "image" else 0)
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


# --- real kernels for container-less formats ------------------------------

def synth_wav(seed: int, i: int, *, rate: int = 16000,
              n: int = 4000) -> bytes:
    """Genuine 16-bit mono PCM WAV bytes: a seeded sine + harmonics."""
    from ..sources.pages import mix64

    f0 = 110.0 + (mix64(seed, 910, i) % 880)
    amp = 0.2 + (mix64(seed, 911, i) % 60) / 100.0
    t = np.arange(n, dtype=np.float64) / rate
    x = amp * np.sin(2 * np.pi * f0 * t) \
        + 0.25 * amp * np.sin(2 * np.pi * 2 * f0 * t)
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_ppm(seed: int, i: int, *, w: int = 24, h: int = 16) -> bytes:
    """Genuine binary P6 PPM bytes: a seeded RGB gradient + stripes."""
    from ..sources.pages import mix64

    xo = mix64(seed, 920, i) % 251
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 7 + xo) % 256,
        (yy * 11 + xo // 2) % 256,
        ((xx + yy) * 5 + xo // 3) % 256,
    ], axis=2).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def synth_jpeg(seed: int, i: int, *, w: int = 32, h: int = 24,
               quality: int = 85) -> bytes:
    """Genuine baseline-JPEG bytes (stages/jpegnp.py encoder): a seeded
    smooth RGB gradient — smooth so the decode error stays within
    quantization noise and feature tests have a tight scalar oracle."""
    from ..sources.pages import mix64
    from .jpegnp import encode_jpeg

    xo = mix64(seed, 930, i) % 97
    fx = 5.0 + mix64(seed, 931, i) % 7
    fy = 4.0 + mix64(seed, 932, i) % 6
    yy, xx = np.mgrid[0:h, 0:w]
    base = 120 + 60 * np.sin((xx + xo) / fx) + 40 * np.cos(yy / fy)
    img = np.stack([base, np.roll(base, 3, axis=1), 255 - base],
                   axis=2).clip(0, 255).astype(np.uint8)
    return encode_jpeg(img, quality=quality)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise NotImplementedError(f"{8 * width}-bit PCM not wired")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → (h, w, 3) uint8 array (pure numpy)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace separated, then
    # exactly one whitespace byte before the raster
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end:end + 1].isspace():
            end += 1
        fields.append(payload[pos:end])
        pos = end
    pos += 1                                       # the single separator
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not wired")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3)


def resize_mean_pool(img: np.ndarray, s: int) -> np.ndarray:
    """Real resize: block-mean pool a 2-D array to (s, s) (pads the
    trailing edge by truncation — deterministic, no interpolation libs)."""
    h, w = img.shape[:2]
    s = min(s, h, w)
    bh, bw = h // s, w // s
    img = img[: bh * s, : bw * s]
    return img.reshape(s, bh, s, bw).mean(axis=(1, 3))


def ahash64(img: np.ndarray, s: int = 8) -> np.int64:
    """Average-hash (aHash) of an (h, w, 3) uint8 image: grayscale →
    block-mean pool to s×s → one bit per cell (above the cell mean),
    packed MSB-first into an int64 — the standard cheap perceptual
    fingerprint (robust to re-encode / small noise, exact-equal for
    byte-identical images)."""
    g = img.astype(np.float64).mean(axis=2)
    p = resize_mean_pool(g, s)
    bits = (p > p.mean()).ravel().astype(np.uint8)
    packed = np.packbits(bits)           # 8 bytes, MSB-first
    return np.int64(packed.view(">u8")[0].astype(np.uint64)
                    .astype(np.int64))


class AHasher:
    """Actor stage: (media_id, payload PPM bytes) → (media_id, ahash).

    Binary decode is inherently per-row (each payload is one image);
    the pool parallelizes across batches, state-free beyond the pool
    itself — the image-dedup front half (reference has no media ops;
    this is the §2.9 multimodal extension surface)."""

    def __init__(self, *, target_size: int = 8):
        self.s = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy().astype(np.int64)
        payloads = batch.column("payload").to_pylist()
        hs = np.fromiter(
            (ahash64(decode_ppm(p), self.s) for p in payloads),
            dtype=np.int64, count=len(ids))
        return pa.table({"media_id": pa.array(ids),
                         "ahash": pa.array(hs)})


def image_ahash_dedup(ds, *, target_size: int = 8,
                      concurrency=None) -> "pd.DataFrame":
    """Perceptual image dedup: aHash every image in an actor pool, then
    one hash-domain groupby (min media_id = canonical, group size) —
    the image twin of docs_exact_dedup; only (media_id, int64 hash)
    rows ever shuffle, payloads stay put."""
    import pandas as pd

    from ray.data.aggregate import Count, Min

    from ..context import auto_pool

    hashes = ds.map_batches(
        AHasher, fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow", batch_size=64,
        concurrency=concurrency or auto_pool())
    # materialize: consumed twice below (groupby + to_pandas) — without
    # this the decode+hash actor stage would run the payloads twice.
    hashes = hashes.materialize()
    groups = (hashes.groupby("ahash")
              .aggregate(Min("media_id", alias_name="canonical_id"),
                         Count(alias_name="n_same")).to_pandas())
    per = hashes.to_pandas()
    out = per.merge(groups, on="ahash")
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("media_id", ignore_index=True)


def real_decode(payload: bytes, mime: str) -> np.ndarray:
    """The codec boundary.  Container-less formats decode HERE with real
    kernels; codec formats use Pillow / libsndfile when the import probe
    found them, and raise the documented NotImplementedError otherwise
    (this container ships neither)."""
    if mime in ("audio/wav", "audio/x-wav"):
        x, _rate = decode_wav(payload)
        return x[None, :]                      # (1, n) — 2-D contract
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(payload).mean(axis=2)  # luminance (h, w)
    if mime in ("image/jpeg", "image/png", "image/webp", "image/bmp"):
        if _PIL_Image is not None:
            img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.float64).mean(axis=2)
        if mime == "image/jpeg":
            # containerless fallback: pure-numpy baseline JPEG decoder
            # (stages/jpegnp.py) — real DCT/Huffman decode, no codec lib.
            from .jpegnp import decode_jpeg
            px = decode_jpeg(payload).astype(np.float64)
            return px.mean(axis=2) if px.ndim == 3 else px
    elif mime in ("audio/mpeg", "audio/mp3", "audio/flac", "audio/ogg"):
        if _soundfile is not None:
            x, _rate = _soundfile.read(io.BytesIO(payload),
                                       dtype="float64")
            if x.ndim > 1:
                x = x.mean(axis=1)
            return x[None, :]
    raise NotImplementedError(
        f"decode for {mime!r} requires codec libraries not present in "
        "this environment; wire Pillow/libsndfile/pyav here in production"
    )


def fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in: payload bytes → small uint8 'pixel' array."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(2, int(len(arr) ** 0.5) // 4)
    return arr[: side * side].reshape(side, side)


@dataclass
class MediaFeatureConfig:
    target_size: int = 8          # resize edge (fake)
    use_fake_decoder: bool = True  # False → NotImplementedError per row


class MediaFeatures:
    """Actor-pool stage: decode → resize → feature-extract per media row.

    ``__init__`` is where a real build loads the codec + feature model
    once per actor; ``__call__`` handles a (small) batch of binary rows
    and emits fixed-width features.
    """

    def __init__(self, cfg: MediaFeatureConfig = MediaFeatureConfig()):
        self.cfg = cfg
        self.decode = fake_decode if cfg.use_fake_decoder else real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        feats = np.zeros((len(payloads), 4), dtype=np.float64)
        s = self.cfg.target_size
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            px = self.decode(p, m).astype(np.float64)
            if self.cfg.use_fake_decoder:
                v = px[:s, :s]                  # "resize" (crop), fake path
            elif px.shape[0] == 1:
                v = px[0]                       # audio: features over signal
            else:
                v = resize_mean_pool(px, s)     # image: real block-mean
            feats[i] = [v.mean(), v.std(), v.min(), v.max()]
        out = pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feat_mean": pa.array(feats[:, 0]),
                "feat_std": pa.array(feats[:, 1]),
                "feat_min": pa.array(feats[:, 2]),
                "feat_max": pa.array(feats[:, 3]),
            }
        )
        return out


def media_features(ds, *, cfg: MediaFeatureConfig | None = None,
                   concurrency: tuple[int, int] | int = (1, 4)):
    """Media Dataset → per-item feature Dataset (small batches: big rows)."""
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs={"cfg": cfg or MediaFeatureConfig()},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


# --- video frame sampling (the fourth multimodal primitive) ----------------

def synth_mpv(seed: int, i: int, *, n_frames: int | None = None,
              w: int = 24, h: int = 16) -> bytes:
    """Genuine container-less 'video': b'MPV1' + uint16 frame count +
    concatenated binary-PPM frames (per-frame seeded content) — the
    codec-free stand-in that lets the frame-sampling plumbing run real
    parse/decode end to end.  (MP4/H.264 needs pyav — that mime still
    raises at the real_decode boundary.)"""
    from ..sources.pages import mix64

    if n_frames is None:
        n_frames = 4 + mix64(seed, 930, i) % 29
    frames = b"".join(synth_ppm(seed, i * 100_000 + f, w=w, h=h)
                      for f in range(n_frames))
    return b"MPV1" + int(n_frames).to_bytes(2, "big") + frames


def mpv_frames(payload: bytes):
    """MPV1 bytes → iterator of (frame_idx, ppm_bytes) — single pass over
    the concatenated frames (each PPM's raster length comes from its own
    header, so frames of differing sizes parse fine)."""
    if payload[:4] != b"MPV1":
        raise ValueError("not an MPV1 payload")
    n = int.from_bytes(payload[4:6], "big")
    pos = 6
    for f in range(n):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"frame {f}: not a P6 frame at {pos}")
        hdr_end, fields = pos + 2, []
        while len(fields) < 3:
            while payload[hdr_end:hdr_end + 1].isspace():
                hdr_end += 1
            e = hdr_end
            while not payload[e:e + 1].isspace():
                e += 1
            fields.append(payload[hdr_end:e])
            hdr_end = e
        hdr_end += 1
        w, h, _mx = (int(x) for x in fields)
        end = hdr_end + w * h * 3
        yield f, payload[pos:end]
        pos = end


class FrameSampler:
    """Actor-pool stage: video rows → every-``stride``-th frame's
    features (mean R/G/B + luminance std after block-mean resize).
    One row per SAMPLED frame — the flat_map-shaped stage a video
    pipeline feeds to per-frame models; ``__init__`` is where a real
    build opens the codec once per actor."""

    def __init__(self, *, stride: int = 4, target_size: int = 8):
        self.stride, self.s = stride, target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy().astype(np.int64)
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": [], "frame_idx": [], "width": [], "height": [],
               "mean_r": [], "mean_g": [], "mean_b": [], "lum_std": []}
        for mid, p in zip(ids.tolist(), payloads):
            for f, ppm in mpv_frames(p):
                if f % self.stride:
                    continue
                img = decode_ppm(ppm).astype(np.float64)
                lum = resize_mean_pool(img.mean(axis=2), self.s)
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["mean_r"].append(img[:, :, 0].mean())
                out["mean_g"].append(img[:, :, 1].mean())
                out["mean_b"].append(img[:, :, 2].mean())
                out["lum_std"].append(lum.std())
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "mean_r": pa.array(out["mean_r"], pa.float64()),
            "mean_g": pa.array(out["mean_g"], pa.float64()),
            "mean_b": pa.array(out["mean_b"], pa.float64()),
            "lum_std": pa.array(out["lum_std"], pa.float64())})


def frame_sample(ds, *, stride: int = 4, target_size: int = 8,
                 concurrency: tuple[int, int] | int = (1, 4)):
    """Video Dataset → sampled-frame feature Dataset (small batches:
    multi-frame payload rows are the biggest objects in the pipeline)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "target_size": target_size},
        batch_format="pyarrow", batch_size=16, concurrency=concurrency)


def audio_fingerprint(x: np.ndarray, *, win: int = 512,
                      n_bands: int = 8) -> np.int64:
    """Spectral-peak audio fingerprint (Shazam-lite, pure numpy): frame
    the mono signal into non-overlapping ``win``-sample windows, rfft
    each, split the spectrum into ``n_bands`` log-ish bands, take the
    argmax bin per band per frame, and fold the (frame, band, peak)
    sequence through the mix64 chain into one int64.

    Deterministic and content-derived: byte-identical audio → identical
    fingerprint; the quantized peak positions (not magnitudes) make the
    per-frame code robust to small gain changes (property pinned in
    test_media.py)."""
    from ..sources.pages import mix64

    n = (len(x) // win) * win
    if n == 0:
        return np.int64(0)
    frames = x[:n].reshape(-1, win)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    nb = spec.shape[1] - 1
    edges = np.unique(np.geomspace(1, nb, n_bands + 1).astype(np.int64))
    h = 0
    for b in range(len(edges) - 1):
        lo, hi = int(edges[b]), int(edges[b + 1])
        peaks = lo + np.argmax(spec[:, lo:hi], axis=1)
        for p in peaks.tolist():
            h = mix64(h, b, p)
    return np.int64(np.uint64(h).astype(np.int64))


class AudioFP:
    """Actor-pool stage: WAV payload → (media_id, afp int64)."""

    def __init__(self, *, win: int = 512):
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = []
        for p in batch.column("payload").to_pylist():
            x, _rate = decode_wav(p)
            fps.append(audio_fingerprint(x, win=self.win))
        return pa.table({
            "media_id": batch.column("media_id"),
            "afp": pa.array(np.asarray(fps, np.int64))})


def audio_fp_dedup(ds, *, concurrency=None) -> "pd.DataFrame":
    """Spectral-fingerprint audio dedup: fingerprint every clip in an
    actor pool, then one hash-domain groupby (min media_id = canonical,
    group size) — the audio twin of image_ahash_dedup; only (media_id,
    int64 afp) rows ever shuffle, payloads stay put."""
    import pandas as pd

    from ray.data.aggregate import Count, Min

    from ..context import auto_pool

    fps = ds.map_batches(
        AudioFP, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency or auto_pool())
    fps = fps.materialize()         # consumed twice below
    groups = (fps.groupby("afp")
              .aggregate(Min("media_id", alias_name="canonical_id"),
                         Count(alias_name="n_same")).to_pandas())
    per = fps.to_pandas()
    out = per.merge(groups, on="afp")
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("media_id", ignore_index=True)
