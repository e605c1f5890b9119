"""Link-prediction evaluation + error reporting (SURVEY.md A9/O2/O3/M2/J6).

Link prediction replicates the reference's protocol
(`TransE.java:382-535`, `Model1.py:623-741`): for each test triple score
every candidate replacement entity with the TransE energy, rank the gold
entity ascending by energy, and report mean rank and Hits@k — in both
"raw" and "filtered" settings (filtered removes candidates that form a
known-gold triple, the J6 anti-join, done here against a broadcast gold
set — a Bloom filter at larger scale).

The per-triple candidate scoring is a vectorized numpy sweep inside an
actor-pool ``map_batches`` stage; global means via a final tiny reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast


class LinkPredictionScorer:
    """Actor stage: test triples → per-triple (rank_head, rank_tail) raw +
    filtered ranks."""

    def __init__(self, emb_bc: Broadcast, gold_bc: Broadcast):
        self.E, self.R = emb_bc.get()
        gold = np.asarray(gold_bc.get())  # (n, 3) int array of (h, t, r)
        # gold lookup by (t,r) → heads and (h,r) → tails: sorted packed-key
        # arrays + aligned value columns (searchsorted range probe — no
        # per-actor Python dict build over the whole gold set)
        h, t, r = (gold[:, 0].astype(np.int64), gold[:, 1].astype(np.int64),
                   gold[:, 2].astype(np.int64))
        k_tr = (t << 21) | r
        o = np.argsort(k_tr, kind="stable")
        self.key_tr, self.val_tr = k_tr[o], h[o]
        k_hr = (h << 21) | r
        o = np.argsort(k_hr, kind="stable")
        self.key_hr, self.val_hr = k_hr[o], t[o]

    def _known(self, keys: np.ndarray, vals: np.ndarray, key: int):
        lo = np.searchsorted(keys, key, side="left")
        hi = np.searchsorted(keys, key, side="right")
        return vals[lo:hi] if hi > lo else None

    def _rank(self, energies: np.ndarray, gold_idx: int,
              known: np.ndarray | None) -> tuple[int, int]:
        gold_e = energies[gold_idx]
        raw = int((energies < gold_e).sum()) + 1
        if known is None or len(known) == 0:
            return raw, raw
        mask = np.zeros(len(energies), dtype=bool)
        mask[known] = True
        mask[gold_idx] = False
        filt = int((energies[~mask] < gold_e).sum()) + 1
        return raw, filt

    def __call__(self, batch: pa.Table) -> pa.Table:
        E, R = self.E, self.R
        h = batch.column("h").to_numpy()
        t = batch.column("t").to_numpy()
        r = batch.column("r").to_numpy()
        n = len(h)
        rh_raw = np.empty(n, dtype=np.int64)
        rh_f = np.empty(n, dtype=np.int64)
        rt_raw = np.empty(n, dtype=np.int64)
        rt_f = np.empty(n, dtype=np.int64)
        for i in range(n):
            hi, ti, ri = int(h[i]), int(t[i]), int(r[i])
            # corrupt head: energies of (e, t, r) for all e — vectorized
            d = E + (R[ri] - E[ti])[None, :]
            e_h = np.linalg.norm(d, axis=1)
            rh_raw[i], rh_f[i] = self._rank(
                e_h, hi, self._known(self.key_tr, self.val_tr,
                                     (ti << 21) | ri))
            # corrupt tail: energies of (h, e, r)
            d = (E[hi] + R[ri])[None, :] - E
            e_t = np.linalg.norm(d, axis=1)
            rt_raw[i], rt_f[i] = self._rank(
                e_t, ti, self._known(self.key_hr, self.val_hr,
                                     (hi << 21) | ri))
        return pa.table({
            "h": batch.column("h"), "t": batch.column("t"),
            "r": batch.column("r"),
            "rank_head_raw": pa.array(rh_raw),
            "rank_head_filtered": pa.array(rh_f),
            "rank_tail_raw": pa.array(rt_raw),
            "rank_tail_filtered": pa.array(rt_f),
        })


def link_prediction_eval(test_ds, E: np.ndarray, R: np.ndarray,
                         gold, *,
                         concurrency=(1, 8)) -> dict:
    """Dataset of test (h,t,r) → {mean_rank, hits@1, hits@10} raw+filtered.

    ``gold`` is an (n,3) int array (preferred) or a frozenset of tuples."""
    if isinstance(gold, (set, frozenset)):
        gold = np.array(sorted(gold), dtype=np.int64).reshape(-1, 3)
    emb_bc = Broadcast((E, R))
    gold_bc = Broadcast(np.asarray(gold))
    ranks = test_ds.map_batches(
        LinkPredictionScorer,
        fn_constructor_kwargs={"emb_bc": emb_bc, "gold_bc": gold_bc},
        batch_format="pyarrow", batch_size=256, concurrency=concurrency,
    ).to_pandas()
    out = {}
    allr = {
        "raw": np.concatenate([ranks["rank_head_raw"], ranks["rank_tail_raw"]]),
        "filtered": np.concatenate(
            [ranks["rank_head_filtered"], ranks["rank_tail_filtered"]]),
    }
    for mode, rr in allr.items():
        out[f"mean_rank_{mode}"] = float(rr.mean())
        out[f"hits1_{mode}"] = float((rr <= 1).mean())
        out[f"hits10_{mode}"] = float((rr <= 10).mean())
    out["n"] = int(len(ranks))
    return out


def error_report(scored: pd.DataFrame, ent_names: np.ndarray,
                 rel_names: np.ndarray, *, threshold: float | None = None,
                 top_k: int | None = 20) -> pd.DataFrame:
    """The find_errors equivalent (O2 + M2): lowest-confidence triples,
    unmapped back to names (`find_errors.py:52-67`)."""
    df = scored.copy()
    if threshold is not None:
        df = df[df["conf"] < threshold]
    df = df.sort_values(["conf", "h", "t", "r"])
    if top_k is not None:
        df = df.head(top_k)
    return pd.DataFrame({
        "subj": ent_names[df["h"].to_numpy().astype(int)],
        "pred": rel_names[df["r"].to_numpy().astype(int)],
        "obj": ent_names[df["t"].to_numpy().astype(int)],
        "flag": df["flag"].to_numpy(),
        "conf": df["conf"].round(6).to_numpy(),
    })
