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

Engine shape: the query-triple Dataset is sorted by head for locality,
then an actor pool holds (CSR adjacency + unit-normalized embedding
matrices) from one ``ray.put`` each.  The hot kernels are ARRAY-based:
level-synchronous path enumeration (matrices of per-step dst/rel ids —
no per-edge Python, no per-expansion frozenset copies) and blocked
cosine scoring via per-path embedding sums (one matvec per query instead
of a Python loop over paths).  ``enumerate_paths``/``rank_paths`` below
keep the row-at-a-time reference semantics as the readable spec; the
unit tests pin the array kernels against them.

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


class _HeadIndex:
    """Per-head precomputation: padded path matrices + per-path embedding
    sums + tail-sorted probe index (built once per head, queried per
    triple).  All per-query work is array ops on the candidate subset."""

    __slots__ = ("truncated", "a_dst", "s_src", "s_rel", "lens",
                 "tails_sorted", "tails_order", "src_pad", "dst_pad",
                 "rel_pad", "rel0")

    def __init__(self, csr: CSR, Eu: np.ndarray, Ru: np.ndarray, head: int,
                 *, max_len: int, max_paths: int):
        levels, self.truncated = enumerate_paths_arrays(
            csr, head, max_len=max_len, max_paths=max_paths)
        eh = Eu[head]
        src_p, dst_p, rel_p = [], [], []
        a_dst, s_src, s_rel, lens, tails = [], [], [], [], []
        for dst_mat, rel_mat in levels:
            P, L = dst_mat.shape
            src_mat = np.column_stack(
                [np.full(P, head, dtype=np.int64), dst_mat[:, :-1]])
            pad = np.full((P, MAX_P - L), -1, dtype=np.int64)
            src_p.append(np.column_stack([src_mat, pad]))
            dst_p.append(np.column_stack([dst_mat, pad]))
            rel_p.append(np.column_stack([rel_mat, pad]))
            # per-path sums: score·3L = eh·ΣEu[dst] + et·ΣEu[src] + rr·ΣRu[rel]
            a_dst.append(Eu[dst_mat].sum(axis=1) @ eh)  # eh is fixed per head
            s_src.append(Eu[src_mat].sum(axis=1))
            s_rel.append(Ru[rel_mat].sum(axis=1))
            lens.append(np.full(P, L, dtype=np.int64))
            tails.append(dst_mat[:, -1])
        if not levels:
            self.tails_sorted = np.empty(0, dtype=np.int64)
            self.tails_order = np.empty(0, dtype=np.int64)
            return
        cat = np.concatenate
        self.src_pad, self.dst_pad = cat(src_p), cat(dst_p)
        self.rel_pad = cat(rel_p)
        self.a_dst, self.s_src, self.s_rel = cat(a_dst), cat(s_src), cat(s_rel)
        self.lens = cat(lens)
        self.rel0 = self.rel_pad[:, 0]
        all_tails = cat(tails)
        self.tails_order = np.argsort(all_tails, kind="stable")
        self.tails_sorted = all_tails[self.tails_order]

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


class PathSearch:
    """Actor stage: batch of query triples (h, t, r) → ranked path rows.

    Output rows per rank < keep_top path: (h, t, r, rank, score, path_len,
    truncated, p_src, p_dst, p_rel) — the last three are the path's edge
    id sequences padded with 0 to MAX_P (the `PrecessData.py:159-197`
    contract the fusion model's path branches consume).
    """

    def __init__(self, csr_bc: Broadcast, emb_bc: Broadcast, *,
                 max_len: int = 3, max_paths: int = 20000,
                 keep_top: int = 50):
        self.csr = csr_bc.get()
        E, R = emb_bc.get()
        self.Eu, self.Ru = _unit(np.asarray(E)), _unit(np.asarray(R))
        self.max_len, self.max_paths, self.keep_top = max_len, max_paths, keep_top
        self._cache_head: int | None = None
        self._cache_index: _HeadIndex | None = None

    def _index_for(self, head: int) -> _HeadIndex:
        if head != self._cache_head:
            self._cache_index = _HeadIndex(
                self.csr, self.Eu, self.Ru, head,
                max_len=self.max_len, max_paths=self.max_paths)
            self._cache_head = head
        return self._cache_index

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy()
        t = batch.column("t").to_numpy()
        r = batch.column("r").to_numpy()
        o_h, o_t, o_r, o_rank, o_score, o_len, o_tr = [], [], [], [], [], [], []
        seq_src, seq_dst, seq_rel = [], [], []
        order = np.argsort(h, kind="stable")  # group same-head queries
        for i in order.tolist():
            hi, ti, ri = int(h[i]), int(t[i]), int(r[i])
            index = self._index_for(hi)
            res = index.query(ti, ri, top=self.keep_top,
                              Eu=self.Eu, Ru=self.Ru)
            if res is None:
                continue
            scores, psrc, pdst, prel, lens = res
            k = len(scores)
            o_h.append(np.full(k, hi, dtype=np.int32))
            o_t.append(np.full(k, ti, dtype=np.int32))
            o_r.append(np.full(k, ri, dtype=np.int32))
            o_rank.append(np.arange(k, dtype=np.int32))
            o_score.append(scores)
            o_len.append(lens)
            o_tr.append(np.full(k, index.truncated, dtype=bool))
            seq_src.append(psrc)
            seq_dst.append(pdst)
            seq_rel.append(prel)
        cat = (lambda ps, dt: np.concatenate(ps) if ps
               else np.empty(0, dtype=dt))

        def fsl(rows):
            flat = (np.concatenate(rows).reshape(-1) if rows
                    else np.empty(0, dtype=np.int32))
            return pa.FixedSizeListArray.from_arrays(pa.array(flat), MAX_P)
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


def ranked_paths_for_queries(query_ds, csr: CSR, E: np.ndarray, R: np.ndarray,
                             *, keep_top: int = 50, max_paths: int = 20000,
                             concurrency: tuple[int, int] | int | None = None):
    """Query triples Dataset → ranked-path Dataset (sorted by head for
    actor-cache locality; the sort is a shuffle of tiny id rows only)."""
    from ..context import spread

    csr_bc = Broadcast(csr)
    emb_bc = Broadcast((E, R))
    return spread(query_ds).sort("h").map_batches(
        PathSearch,
        fn_constructor_kwargs={"csr_bc": csr_bc, "emb_bc": emb_bc,
                               "keep_top": keep_top, "max_paths": max_paths},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency or auto_pool(),
    )
