"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels (JPEG/PNG decode, audio resample, video frame-sample)
need codec libraries that are NOT in this container, so the codec call is
stubbed behind ``NotImplementedError`` with a deterministic fake used by
tests — but the Ray-side plumbing is real: schemas, actor-pool stages,
small-batch sizing for large binary rows, and Arrow-native binary
handling (``batch_format="pyarrow"`` end to end; binary columns do not
round-trip pandas safely).

Scale notes encoded in the defaults: large payload rows ⇒ small
``batch_size`` (64) so batch × concurrency fits worker heaps, and the
decode pool is an actor pool because real decoders amortize codec /
model initialization per worker.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

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


def synth_media_batch(ids: np.ndarray, *, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    from ..sources.pages import mix64

    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in ids.tolist():
        kind = kinds[mix64(seed, 900, i) % 3]
        size = 256 + mix64(seed, 901, i) % 1024
        payload = bytes((mix64(seed, 902, i, j) % 256 for j in range(size)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(64 + mix64(seed, 903, i) % 512
                             if kind != "audio" else 0)
        rows["height"].append(64 + mix64(seed, 904, i) % 512
                              if kind != "audio" else 0)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
        rows["duration_ms"].append(1000 + mix64(seed, 905, i) % 60000
                                   if kind != "image" else 0)
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


def real_decode(payload: bytes, mime: str):
    """The codec boundary. Not available in this container — STUB."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; wire Pillow/libsndfile/pyav here in production"
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
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            px = self.decode(p, m).astype(np.float64)
            s = self.cfg.target_size
            px = px[:s, :s]  # "resize" (crop) in the fake path
            feats[i] = [px.mean(), px.std(), px.min(), px.max()]
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
