"""Distributed sketches over token streams: count-min (heavy-hitter
frequency estimates) and HyperLogLog (distinct counts).

Both sketches are DETERMINISTIC — seeded mix64 over the shared
rolling-fingerprint word hash (`dedup.word_fp`, the same fold every
near-dup mirror pins in SQL) — so a DuckDB oracle rebuilds the IDENTICAL
registers and the estimates match exactly, not just statistically.  This
is the merge-friendly shape for 100-TB streams: every batch contributes
a fixed-size partial (d×w counters / 2^p registers) regardless of input
size; partials combine by + / max — associative, so tree or driver
folding both work and the combine payload is O(sketch), not O(data).

Tokens are lowercase ``[0-9a-z_]+`` runs (the corpus-wide pinned token
class, stages/text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

CM_SEED = 91
HLL_SEED = 92
HLL_P = 12                      # 2^12 = 4096 registers
_HLL_REM_BITS = 64 - HLL_P      # 52: remainder fits a float64 mantissa
_HLL_M = 1 << HLL_P


def _batch_token_tf(t: pa.Table, text_col: str):
    """(unique tokens, term frequencies) of one batch — occurrences, not
    document frequency."""
    from .text import _as_array, _split_flat

    col = _as_array(t.column(text_col))
    flat, _, _ = _split_flat(pc.utf8_lower(col), "[^0-9a-z_]+")
    ok = flat != ""
    if not ok.any():
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    codes, uniq = pd.factorize(flat[ok])
    return uniq, np.bincount(codes).astype(np.int64)


def _uniq_fps(uniq) -> np.ndarray:
    from .dedup import word_fp

    return np.fromiter((word_fp(w) for w in uniq), dtype=np.uint64,
                       count=len(uniq))


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------

def cm_buckets(fps: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) bucket matrix: mix64(CM_SEED, row, fp) % w per hash row."""
    from ..sources.pages import mix64_vec

    return np.stack([
        (mix64_vec(CM_SEED, r, fps) % np.uint64(w)).astype(np.int64)
        for r in range(d)
    ])


def countmin_sketch(docs_ds, *, d: int = 4, w: int = 1024,
                    text_col: str = "text") -> np.ndarray:
    """(d, w) int64 count-min matrix of the corpus token stream."""

    def part(t: pa.Table) -> pa.Table:
        uniq, tf = _batch_token_tf(t, text_col)
        M = np.zeros((d, w), dtype=np.int64)
        if len(uniq):
            B = cm_buckets(_uniq_fps(uniq), d, w)
            for r in range(d):
                np.add.at(M[r], B[r], tf)
        return pa.table({
            "r": pa.array(np.repeat(np.arange(d, dtype=np.int32), w)),
            "b": pa.array(np.tile(np.arange(w, dtype=np.int32), d)),
            "n": pa.array(M.ravel()),
        })

    tbls = ray.get(docs_ds.map_batches(part, batch_format="pyarrow")
                   .to_arrow_refs())
    M = np.zeros((d, w), dtype=np.int64)
    for t in tbls:
        if t.num_rows:
            np.add.at(M, (t.column("r").to_numpy(),
                          t.column("b").to_numpy()),
                      t.column("n").to_numpy())
    return M


def cm_estimate(M: np.ndarray, tokens) -> np.ndarray:
    """Point estimates (min over hash rows) — never under the true count."""
    d, w = M.shape
    B = cm_buckets(_uniq_fps(np.asarray(tokens, dtype=object)), d, w)
    return np.min(np.stack([M[r, B[r]] for r in range(d)]), axis=0)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _hll_rho(rem: np.ndarray) -> np.ndarray:
    """rank of the first 1-bit in the 52-bit remainder (0 → 53).
    Exact: rem < 2^52 fits float64, frexp's exponent IS the bit length."""
    rho = np.full(len(rem), _HLL_REM_BITS + 1, dtype=np.int64)
    nz = rem > 0
    _, e = np.frexp(rem[nz].astype(np.float64))
    rho[nz] = _HLL_REM_BITS - (e - 1)
    return rho


def _batch_pairs(t: pa.Table, id_col: str, text_col: str):
    """Distinct (doc_id, token-fp) pairs of one batch.  Docs are rows, so
    per-batch-distinct pairs are GLOBALLY distinct — no cross-batch
    dedup needed (each doc lives in exactly one row)."""
    from .text import _as_array, _split_flat

    col = _as_array(t.column(text_col))
    ids = t.column(id_col).to_numpy().astype(np.int64)
    flat, doc_idx, _ = _split_flat(pc.utf8_lower(col), "[^0-9a-z_]+")
    ok = flat != ""
    if not ok.any():
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    codes, uniq = pd.factorize(flat[ok])
    key = doc_idx[ok].astype(np.int64) * np.int64(len(uniq)) + codes
    ukey = np.unique(key)
    return ids[ukey // len(uniq)], _uniq_fps(uniq)[ukey % len(uniq)]


def hll_registers(docs_ds, *, id_col: str = "doc_id",
                  text_col: str = "text") -> np.ndarray:
    """2^p int64 max-rho registers over the corpus's DISTINCT
    (doc_id, token) pairs — the vocabulary-coverage cardinality."""
    from ..sources.pages import mix64_vec

    def part(t: pa.Table) -> pa.Table:
        dids, fps = _batch_pairs(t, id_col, text_col)
        regs = np.zeros(_HLL_M, dtype=np.int64)
        if len(dids):
            h = mix64_vec(HLL_SEED, dids, fps)
            b = (h >> np.uint64(_HLL_REM_BITS)).astype(np.int64)
            rem = (h & np.uint64((1 << _HLL_REM_BITS) - 1))
            np.maximum.at(regs, b, _hll_rho(rem))
        keep = np.nonzero(regs)[0]
        return pa.table({"b": pa.array(keep.astype(np.int32)),
                         "rho": pa.array(regs[keep])})

    tbls = ray.get(docs_ds.map_batches(part, batch_format="pyarrow")
                   .to_arrow_refs())
    regs = np.zeros(_HLL_M, dtype=np.int64)
    for t in tbls:
        if t.num_rows:
            np.maximum.at(regs, t.column("b").to_numpy(),
                          t.column("rho").to_numpy())
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (the same closed form the SQL mirror evaluates)."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)
