"""Stage-level checkpoints for phase B (trust scoring).

Phase B is a fixed-size holistic computation (global KGE training +
estimator fit), so its resume unit is the STAGE, not an input shard: the
expensive trained artifacts (TransE / PTransE embedding matrices) are
checkpointed keyed by a fingerprint of the id-mapped triple table + the
training config, and a re-run whose fingerprint matches loads them
instead of retraining.  The final scored table additionally shards into
per-partition parquet with manifest rows (ttmf_ray.state.manifest) so
output writing resumes exactly like phase A.

Atomicity: arrays are written to a tmp file then os.replace'd; the meta
row (fingerprint) is written last, so a torn write is never mistaken for
a completed checkpoint.
"""

from __future__ import annotations

import json
import os

import numpy as np


class StageCheckpoint:
    def __init__(self, root: str, fingerprint: str):
        self.root = root
        self.fp = fingerprint
        os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        return (os.path.join(self.root, f"{stage}.npz"),
                os.path.join(self.root, f"{stage}.meta.json"))

    def has(self, stage: str) -> bool:
        data, meta = self._paths(stage)
        if not (os.path.exists(data) and os.path.exists(meta)):
            return False
        try:
            with open(meta) as f:
                return json.load(f).get("fingerprint") == self.fp
        except (OSError, json.JSONDecodeError):
            return False

    def load(self, stage: str) -> list[np.ndarray]:
        data, _ = self._paths(stage)
        with np.load(data) as z:
            return [z[k] for k in sorted(z.files)]

    def save(self, stage: str, arrays: list[np.ndarray]) -> None:
        data, meta = self._paths(stage)
        # np.savez appends ".npz" unless the name already ends with it
        tmp = data + f".tmp.{os.getpid()}.npz"
        np.savez(tmp, **{f"a{i:02d}": a for i, a in enumerate(arrays)})
        os.replace(tmp, data)
        mtmp = meta + f".tmp.{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump({"fingerprint": self.fp, "stage": stage}, f)
        os.replace(mtmp, meta)
