"""Reachable-path search + cosine ranking per query triple (SURVEY.md
T4/T5; reference `/root/reference/SearchPaths2.py:26-137`).

Per query head: enumerate simple paths of ≤ 3 edges out of the head
(`searchpath` is called with depth 4 and decrements on entry — effective
path length ≤ 3; no node revisits along a path including the start node).
Each path is scored against the query triple (h, t, r) as

    SD = Σ_edges [cos(E[h], E[edge.dst]) + cos(E[t], E[edge.src])
                  + cos(R[r], R[edge.rel])] / (3 · len(path))

(`SearchPaths2.py:26-48`), ranked descending, the trivial self-path
((h,t,r),) skipped, top-50 kept (`:128-137`), and ranks 0..2 feed the
fusion model (`Model1.py:995` max_p=3) — both as scores AND as the padded
edge-id sequences the reference's estimator consumes
(`PrecessData.py:159-197`: per path, three parallel id lists padded with
0 to max_p=3).

Engine shape — TWO actor-pool stages so enumeration overlaps KGE training:

1. ``PathEnum`` (CSR broadcast only): distinct query heads → one row per
   head carrying the padded path matrices as flattened list columns.
   This stage has NO dependency on the trained embeddings, so the trust
   pipeline materializes it concurrently with PTransE training (which
   used to gate the whole search).
2. ``PathScore`` (embeddings + sorted query arrays broadcast): per head
   row, rebuild the per-head index (per-path embedding sums via a
   zero-pad-row gather), score every query with that head, emit ranked
   rows.  All per-query work is array ops on the candidate subset.

The hot kernels are ARRAY-based: level-synchronous path enumeration
(matrices of per-step dst/rel ids — no per-edge Python, no per-expansion
frozenset copies) and blocked cosine scoring via per-path embedding sums
(one matvec per query instead of a Python loop over paths).
``enumerate_paths``/``rank_paths`` below keep the row-at-a-time reference
semantics as the readable spec; the unit tests pin the array kernels
against them.

Path explosion from hub heads is capped by ``max_paths`` per head with a
``truncated`` flag column (no silent caps); truncation keeps the first
``max_paths`` paths in level-synchronous enumeration order
(deterministic — independent of batching and cluster size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import Broadcast, auto_pool
from .graph import CSR

MAX_P = 3  # reference max_p (Model1.py:995): sequences padded to 3 edges


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


# ---------------------------------------------------------------------------
# Reference-shaped (row-at-a-time) spec — kept for unit-test pinning.
# ---------------------------------------------------------------------------

def enumerate_paths(csr: CSR, head: int, *, max_len: int = 3,
                    max_paths: int = 20000):
    """All simple ≤max_len-edge paths from head (readable spec version).

    Returns (paths_by_tail: dict[tail → list[path]], truncated) where a
    path is a tuple of (src, dst, rel) edges.
    """
    levels, truncated = enumerate_paths_arrays(
        csr, head, max_len=max_len, max_paths=max_paths)
    paths_by_tail: dict[int, list[tuple]] = {}
    for dst_mat, rel_mat in levels:
        L = dst_mat.shape[1]
        src_mat = np.column_stack(
            [np.full(len(dst_mat), head, dtype=np.int64), dst_mat[:, :-1]])
        for p in range(len(dst_mat)):
            path = tuple(
                (int(src_mat[p, i]), int(dst_mat[p, i]), int(rel_mat[p, i]))
                for i in range(L)
            )
            paths_by_tail.setdefault(int(dst_mat[p, -1]), []).append(path)
    return paths_by_tail, truncated


def rank_paths(paths: list[tuple], Eu: np.ndarray, Ru: np.ndarray,
               h: int, t: int, r: int, *, top: int = 50):
    """Cosine-score paths for query (h,t,r); descending; skip self-path."""
    eh, et, rr = Eu[h], Eu[t], Ru[r]
    scored = []
    for p in paths:
        if len(p) == 1 and p[0] == (h, t, r):
            continue
        src = np.fromiter((e[0] for e in p), dtype=np.int64, count=len(p))
        dst = np.fromiter((e[1] for e in p), dtype=np.int64, count=len(p))
        rel = np.fromiter((e[2] for e in p), dtype=np.int64, count=len(p))
        sd = (
            (Eu[dst] @ eh).sum() + (Eu[src] @ et).sum() + (Ru[rel] @ rr).sum()
        ) / (3.0 * len(p))
        scored.append((float(sd), p))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[:top]


# ---------------------------------------------------------------------------
# Array kernels (the production path).
# ---------------------------------------------------------------------------

def enumerate_paths_arrays(csr: CSR, head: int, *, max_len: int = 3,
                           max_paths: int = 20000):
    """Level-synchronous enumeration: all simple ≤max_len-edge paths out of
    ``head`` as per-level matrices.

    Returns (levels, truncated); levels[k] = (dst_mat (P, k+1), rel_mat
    (P, k+1)) — step i's source is dst_mat[:, i-1] (head for i=0).  Rows
    appear in frontier-order × CSR-edge-order; ``max_paths`` keeps the
    first rows in that order (visible via the truncated flag).
    """
    levels: list[tuple[np.ndarray, np.ndarray]] = []
    n_paths = 0
    truncated = False

    # level 1: direct out-edges, minus any self-loop back to head
    lo, hi = int(csr.eindptr[head]), int(csr.eindptr[head + 1])
    dst = csr.edst[lo:hi].astype(np.int64)
    rel = csr.erel[lo:hi].astype(np.int64)
    keep = dst != head
    dst_mat, rel_mat = dst[keep, None], rel[keep, None]
    for L in range(1, max_len + 1):
        if len(dst_mat) == 0:
            break
        room = max_paths - n_paths
        if len(dst_mat) > room:
            truncated = True
            dst_mat, rel_mat = dst_mat[:room], rel_mat[:room]
        levels.append((dst_mat, rel_mat))
        n_paths += len(dst_mat)
        if L == max_len or n_paths >= max_paths:
            if L < max_len and n_paths >= max_paths:
                truncated = True
            break
        # extend: endpoints' out-edges, drop revisits (head or any column)
        ends = dst_mat[:, -1]
        starts = csr.eindptr[ends]
        counts = (csr.eindptr[ends + 1] - starts).astype(np.int64)
        nz = counts > 0
        if not nz.any():
            break
        pidx_base = np.nonzero(nz)[0]
        c = counts[nz]
        s = starts[nz]
        total = int(c.sum())
        offs = np.concatenate(([0], np.cumsum(c)[:-1]))
        eidx = np.repeat(s - offs, c) + np.arange(total)
        path_idx = np.repeat(pidx_base, c)
        new_dst = csr.edst[eidx].astype(np.int64)
        new_rel = csr.erel[eidx].astype(np.int64)
        ok = new_dst != head
        for j in range(L):
            ok &= dst_mat[path_idx, j] != new_dst
        dst_mat = np.column_stack([dst_mat[path_idx[ok]], new_dst[ok]])
        rel_mat = np.column_stack([rel_mat[path_idx[ok]], new_rel[ok]])
    return levels, truncated


def _padded_from_levels(head: int, levels) -> tuple[np.ndarray, np.ndarray,
                                                    np.ndarray, np.ndarray,
                                                    np.ndarray]:
    """Levels → (src_pad, dst_pad, rel_pad (P, MAX_P; pad −1), lens, tails)
    in level-concatenation order (the canonical per-head path order)."""
    src_p, dst_p, rel_p, lens, tails = [], [], [], [], []
    for dst_mat, rel_mat in levels:
        P, L = dst_mat.shape
        src_mat = np.column_stack(
            [np.full(P, head, dtype=np.int64), dst_mat[:, :-1]])
        pad = np.full((P, MAX_P - L), -1, dtype=np.int64)
        src_p.append(np.column_stack([src_mat, pad]))
        dst_p.append(np.column_stack([dst_mat, pad]))
        rel_p.append(np.column_stack([rel_mat, pad]))
        lens.append(np.full(P, L, dtype=np.int64))
        tails.append(dst_mat[:, -1])
    if not levels:
        z = np.empty((0, MAX_P), dtype=np.int64)
        e = np.empty(0, dtype=np.int64)
        return z, z, z, e, e
    cat = np.concatenate
    return cat(src_p), cat(dst_p), cat(rel_p), cat(lens), cat(tails)


def _gather_sum(Mz: np.ndarray, idx_pad: np.ndarray, scratch: dict,
                key: str) -> np.ndarray:
    """Σ_steps Mz[idx] per path; pad entries (−1) gather Mz's appended
    all-zero last row, contributing exact 0.0 (bitwise-identical to the
    unpadded per-level sum).  The (P·MAX_P, d) gather reuses a per-actor
    scratch buffer (rule: fresh ≥1 MB allocations per batch page-fault and
    serialize parallel workers on the kernel)."""
    P, L = idx_pad.shape
    d = Mz.shape[1]
    idx = np.where(idx_pad < 0, len(Mz) - 1, idx_pad).reshape(-1)
    buf = scratch.get(key)
    if buf is None or buf.shape[0] < P * L or buf.shape[1] != d:
        buf = np.empty((max(P * L, 1), d), dtype=Mz.dtype)
        scratch[key] = buf
    view = buf[: P * L]
    np.take(Mz, idx, axis=0, out=view)
    return view.reshape(P, L, d).sum(axis=1)


class _HeadIndex:
    """Per-head index: padded path matrices + per-path embedding sums +
    tail-sorted probe index (built once per head, queried per triple).
    All per-query work is array ops on the candidate subset.

    ``Euz``/``Ruz`` are the unit embedding matrices with one appended
    all-zero row, so pad ids (−1) gather an exact-zero contribution.
    """

    __slots__ = ("truncated", "a_dst", "s_src", "s_rel", "lens",
                 "tails_sorted", "tails_order", "src_pad", "dst_pad",
                 "rel_pad", "rel0")

    def __init__(self, head: int, src_pad, dst_pad, rel_pad, lens, tails,
                 truncated: bool, Euz: np.ndarray, Ruz: np.ndarray,
                 *, scratch: dict | None = None):
        self.truncated = truncated
        self.src_pad, self.dst_pad, self.rel_pad = src_pad, dst_pad, rel_pad
        self.lens = lens
        if len(lens) == 0:
            self.tails_sorted = np.empty(0, dtype=np.int64)
            self.tails_order = np.empty(0, dtype=np.int64)
            return
        scratch = scratch if scratch is not None else {}
        # per-path sums: score·3L = eh·ΣEu[dst] + et·ΣEu[src] + rr·ΣRu[rel]
        self.a_dst = _gather_sum(Euz, dst_pad, scratch, "dst") @ Euz[head]
        self.s_src = _gather_sum(Euz, src_pad, scratch, "src")
        self.s_rel = _gather_sum(Ruz, rel_pad, scratch, "rel")
        self.rel0 = rel_pad[:, 0]
        self.tails_order = np.argsort(tails, kind="stable")
        self.tails_sorted = tails[self.tails_order]

    @classmethod
    def build(cls, csr: CSR, Eu: np.ndarray, Ru: np.ndarray, head: int, *,
              max_len: int, max_paths: int, scratch: dict | None = None):
        """Enumerate + index in one step (single-stage/test path)."""
        levels, truncated = enumerate_paths_arrays(
            csr, head, max_len=max_len, max_paths=max_paths)
        src_pad, dst_pad, rel_pad, lens, tails = _padded_from_levels(
            head, levels)
        Euz = np.vstack([Eu, np.zeros((1, Eu.shape[1]), dtype=Eu.dtype)])
        Ruz = np.vstack([Ru, np.zeros((1, Ru.shape[1]), dtype=Ru.dtype)])
        return cls(head, src_pad, dst_pad, rel_pad, lens, tails, truncated,
                   Euz, Ruz, scratch=scratch)

    def query(self, t: int, r: int, *, top: int, Eu, Ru):
        """Top-ranked paths for (t, r) as arrays:
        (scores (k,), src (k,MAX_P), dst, rel — padded 0 — lens (k,))."""
        lo = np.searchsorted(self.tails_sorted, t, side="left")
        hi = np.searchsorted(self.tails_sorted, t, side="right")
        if hi == lo:
            return None
        idx = self.tails_order[lo:hi]
        # skip the trivial self-path (h, t, r): length 1 with rel == r
        idx = idx[~((self.lens[idx] == 1) & (self.rel0[idx] == r))]
        if len(idx) == 0:
            return None
        sc = (self.a_dst[idx] + self.s_src[idx] @ Eu[t]
              + self.s_rel[idx] @ Ru[r]) / (3.0 * self.lens[idx])
        # sort by (-score, flattened path tuple asc); -1 pads sort before
        # real ids so a shorter path with an equal prefix ranks first
        keys = []
        for step in range(MAX_P - 1, -1, -1):
            keys.extend((self.rel_pad[idx, step], self.dst_pad[idx, step],
                         self.src_pad[idx, step]))
        keys.append(-sc)
        order = np.lexsort(keys)[:top]
        pick = idx[order]
        clip0 = lambda m: np.maximum(m[pick], 0).astype(np.int32)  # noqa: E731
        return (sc[order], clip0(self.src_pad), clip0(self.dst_pad),
                clip0(self.rel_pad), self.lens[pick].astype(np.int32))


# ---------------------------------------------------------------------------
# Stage 1 — enumeration (CSR only; overlaps KGE training).
# ---------------------------------------------------------------------------

def _large_list(chunks: list[np.ndarray], dtype=np.int64) -> pa.Array:
    lens = np.fromiter((len(c) for c in chunks), dtype=np.int64,
                       count=len(chunks))
    offsets = np.concatenate(([0], np.cumsum(lens)))
    values = (np.concatenate(chunks) if chunks
              else np.empty(0, dtype=dtype))
    return pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                         pa.array(values))


class PathEnum:
    """Actor stage: batch of distinct heads → one row per head with the
    padded path matrices flattened into list columns.

    Output row: (head, truncated, n_paths, src, dst, rel — each a
    LargeList of n_paths·MAX_P ids, pad −1 — lens, tails — LargeLists of
    n_paths).  Embedding-free: runs while the KGE trainers are still
    converging.
    """

    def __init__(self, csr_bc: Broadcast, *, max_len: int = 3,
                 max_paths: int = 20000):
        self.csr = csr_bc.get()
        self.max_len, self.max_paths = max_len, max_paths

    def __call__(self, batch: pa.Table) -> pa.Table:
        heads = batch.column("head").to_numpy()
        trunc, n_paths = [], []
        srcs, dsts, rels, lens_l, tails_l = [], [], [], [], []
        for head in heads.tolist():
            levels, truncated = enumerate_paths_arrays(
                self.csr, int(head), max_len=self.max_len,
                max_paths=self.max_paths)
            src_pad, dst_pad, rel_pad, lens, tails = _padded_from_levels(
                int(head), levels)
            trunc.append(truncated)
            n_paths.append(len(lens))
            srcs.append(src_pad.reshape(-1))
            dsts.append(dst_pad.reshape(-1))
            rels.append(rel_pad.reshape(-1))
            lens_l.append(lens)
            tails_l.append(tails)
        return pa.table({
            "head": pa.array(heads.astype(np.int64)),
            "truncated": pa.array(np.asarray(trunc, dtype=bool)),
            "n_paths": pa.array(np.asarray(n_paths, dtype=np.int64)),
            "src": _large_list(srcs),
            "dst": _large_list(dsts),
            "rel": _large_list(rels),
            "lens": _large_list(lens_l),
            "tails": _large_list(tails_l),
        })


def enumerate_paths_ds(heads: np.ndarray, csr: CSR, *, max_len: int = 3,
                       max_paths: int = 20000,
                       concurrency: tuple[int, int] | int | None = None):
    """Distinct head array → per-head path Dataset (stage 1)."""
    import pandas as pd
    import ray.data as rd

    from ..context import spread

    heads_ds = rd.from_pandas(
        pd.DataFrame({"head": np.sort(np.asarray(heads, dtype=np.int64))}))
    csr_bc = csr if isinstance(csr, Broadcast) else Broadcast(csr)
    return spread(heads_ds).map_batches(
        PathEnum,
        fn_constructor_kwargs={"csr_bc": csr_bc,
                               "max_len": max_len, "max_paths": max_paths},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency or auto_pool(),
    )


# ---------------------------------------------------------------------------
# Stage 2 — scoring (embeddings + broadcast query arrays).
# ---------------------------------------------------------------------------

class PathScore:
    """Actor stage: batch of per-head path rows → ranked path rows for
    every query triple with that head.

    Output rows per rank < keep_top path: (h, t, r, rank, score, path_len,
    truncated, p_src, p_dst, p_rel) — the last three are the path's edge
    id sequences padded with 0 to MAX_P (the `PrecessData.py:159-197`
    contract the fusion model's path branches consume).
    """

    def __init__(self, emb_bc: Broadcast, queries_bc: Broadcast, *,
                 keep_top: int = 50):
        E, R = emb_bc.get()
        Eu, Ru = _unit(np.asarray(E)), _unit(np.asarray(R))
        self.Euz = np.vstack([Eu, np.zeros((1, Eu.shape[1]), Eu.dtype)])
        self.Ruz = np.vstack([Ru, np.zeros((1, Ru.shape[1]), Ru.dtype)])
        # query triples sorted by (h, t, r): per head a contiguous slice
        self.qh, self.qt, self.qr = queries_bc.get()
        self.keep_top = keep_top
        self.scratch: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        heads = batch.column("head").to_numpy()
        trunc = batch.column("truncated").to_numpy()

        def flat(col):
            arr = batch.column(col).combine_chunks()
            return arr.offsets.to_numpy(), arr.values.to_numpy()

        so, sv = flat("src")
        do, dv = flat("dst")
        ro, rv = flat("rel")
        lo_, lv = flat("lens")
        to_, tv = flat("tails")
        o_h, o_t, o_r, o_rank, o_score, o_len, o_tr = [], [], [], [], [], [], []
        seq_src, seq_dst, seq_rel = [], [], []
        for i in range(len(heads)):
            head = int(heads[i])
            qlo = np.searchsorted(self.qh, head, side="left")
            qhi = np.searchsorted(self.qh, head, side="right")
            if qhi == qlo or lo_[i + 1] == lo_[i]:
                continue
            index = _HeadIndex(
                head,
                sv[so[i]:so[i + 1]].reshape(-1, MAX_P),
                dv[do[i]:do[i + 1]].reshape(-1, MAX_P),
                rv[ro[i]:ro[i + 1]].reshape(-1, MAX_P),
                lv[lo_[i]:lo_[i + 1]],
                tv[to_[i]:to_[i + 1]],
                bool(trunc[i]), self.Euz, self.Ruz, scratch=self.scratch)
            for q in range(qlo, qhi):
                ti, ri = int(self.qt[q]), int(self.qr[q])
                res = index.query(ti, ri, top=self.keep_top,
                                  Eu=self.Euz, Ru=self.Ruz)
                if res is None:
                    continue
                scores, psrc, pdst, prel, lens = res
                k = len(scores)
                o_h.append(np.full(k, head, dtype=np.int32))
                o_t.append(np.full(k, ti, dtype=np.int32))
                o_r.append(np.full(k, ri, dtype=np.int32))
                o_rank.append(np.arange(k, dtype=np.int32))
                o_score.append(scores)
                o_len.append(lens)
                o_tr.append(np.full(k, bool(trunc[i]), dtype=bool))
                seq_src.append(psrc)
                seq_dst.append(pdst)
                seq_rel.append(prel)
        cat = (lambda ps, dt: np.concatenate(ps) if ps
               else np.empty(0, dtype=dt))

        def fsl(rows):
            flat_ = (np.concatenate(rows).reshape(-1) if rows
                     else np.empty(0, dtype=np.int32))
            return pa.FixedSizeListArray.from_arrays(pa.array(flat_), MAX_P)
        return pa.table(
            {
                "h": pa.array(cat(o_h, np.int32)),
                "t": pa.array(cat(o_t, np.int32)),
                "r": pa.array(cat(o_r, np.int32)),
                "rank": pa.array(cat(o_rank, np.int32)),
                "score": pa.array(cat(o_score, np.float64)),
                "path_len": pa.array(cat(o_len, np.int32)),
                "truncated": pa.array(cat(o_tr, bool)),
                "p_src": fsl(seq_src),
                "p_dst": fsl(seq_dst),
                "p_rel": fsl(seq_rel),
            }
        )


# one-slot per-process scorer cache for the task-pool path: tasks of the
# same stage land on reused worker processes, so the unit-normalized
# embedding matrices build once per worker, not once per task
_scorer_cache: dict = {}


def _score_paths_task(batch: pa.Table, *, emb_bc: Broadcast,
                      queries_bc: Broadcast, keep_top: int) -> pa.Table:
    key = (emb_bc._ref.hex(), queries_bc._ref.hex(), keep_top)
    scorer = _scorer_cache.get(key)
    if scorer is None:
        _scorer_cache.clear()
        scorer = _scorer_cache[key] = PathScore(
            emb_bc, queries_bc, keep_top=keep_top)
    return scorer(batch)


def score_paths_for_queries(enum_ds, queries, E: np.ndarray, R: np.ndarray,
                            *, keep_top: int = 50,
                            concurrency: tuple[int, int] | int | None = None):
    """Per-head path Dataset (stage 1 output) + query table → ranked-path
    Dataset.  ``queries`` is a small (h, t, r) DataFrame/dict of arrays —
    broadcast sorted by (h, t, r) so each head's queries are a contiguous
    slice probed by searchsorted — or a ``Broadcast`` of the already
    (h, t, r)-sorted ``(qh, qt, qr)`` arrays (streaming mode).

    Runs as a TASK pool (same kernels via a per-process scorer cache):
    the scoring stage launches only after PTransE finishes, so an actor
    pool's spin-up sat on the trust critical path (~2 s of the ~4.6 s
    post-training tail — the fusion-scorer lesson, CLAUDE.md
    continuation 3); tasks start on warm workers immediately.  Pass
    ``concurrency`` to force the actor-pool variant (GPU scorers)."""
    if isinstance(queries, Broadcast):
        queries_bc = queries
    else:
        qh = np.asarray(queries["h"], dtype=np.int64)
        qt = np.asarray(queries["t"], dtype=np.int64)
        qr = np.asarray(queries["r"], dtype=np.int64)
        order = np.lexsort((qr, qt, qh))
        queries_bc = Broadcast((qh[order], qt[order], qr[order]))
    emb_bc = Broadcast((E, R))
    if concurrency is not None:
        return enum_ds.map_batches(
            PathScore,
            fn_constructor_kwargs={"emb_bc": emb_bc,
                                   "queries_bc": queries_bc,
                                   "keep_top": keep_top},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=concurrency,
        )
    from functools import partial

    return enum_ds.map_batches(
        partial(_score_paths_task, emb_bc=emb_bc, queries_bc=queries_bc,
                keep_top=keep_top),
        batch_format="pyarrow",
        batch_size=16,
    )


def ranked_paths_for_queries(query_ds, csr: CSR, E: np.ndarray, R: np.ndarray,
                             *, keep_top: int = 50, max_paths: int = 20000,
                             concurrency: tuple[int, int] | int | None = None):
    """Query triples Dataset/DataFrame → ranked-path Dataset (the
    single-call composition of the two stages; the trust pipeline calls
    them separately to overlap enumeration with PTransE training)."""
    import pandas as pd

    qdf = query_ds if isinstance(query_ds, pd.DataFrame) else \
        query_ds.to_pandas()
    heads = np.unique(qdf["h"].to_numpy())
    enum_ds = enumerate_paths_ds(heads, csr, max_paths=max_paths,
                                 concurrency=concurrency)
    return score_paths_for_queries(enum_ds, qdf, E, R, keep_top=keep_top,
                                   concurrency=concurrency)
