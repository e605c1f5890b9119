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
fusion model (`Model1.py:995` max_p=3).

Engine shape: the query-triple Dataset is sorted by head for locality,
then an actor pool holds (CSR adjacency + unit-normalized embedding
matrices) from one ``ray.put`` each; the per-head path enumeration is
cached inside the actor across the batch.  Path explosion from hub heads
is capped by ``max_paths`` per head with a ``truncated`` flag column (no
silent caps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import Broadcast, auto_pool
from .graph import CSR


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def enumerate_paths(csr: CSR, head: int, *, max_len: int = 3,
                    max_paths: int = 20000):
    """All simple ≤max_len-edge paths from head.

    Returns (paths_by_tail: dict[tail → list[path]], truncated) where a
    path is a tuple of (src, dst, rel) edges.  Iterative DFS mirroring the
    reference's recursion (visit order does not matter downstream — every
    path is enumerated, only ranking orders them).
    """
    paths_by_tail: dict[int, list[tuple]] = {}
    n_paths = 0
    truncated = False

    stack: list[tuple[int, tuple, frozenset]] = [(head, (), frozenset((head,)))]
    while stack:
        node, path, visited = stack.pop()
        if len(path) >= max_len:
            continue
        lo, hi = csr.eindptr[node], csr.eindptr[node + 1]
        for ei in range(lo, hi):
            v = int(csr.edst[ei])
            if v in visited:
                continue
            rel = int(csr.erel[ei])
            new_path = path + ((node, v, rel),)
            if n_paths >= max_paths:
                truncated = True
                stack.clear()
                break
            paths_by_tail.setdefault(v, []).append(new_path)
            n_paths += 1
            if len(new_path) < max_len:
                stack.append((v, new_path, visited | {v}))
        else:
            continue
        break
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


class PathSearch:
    """Actor stage: batch of query triples (h, t, r) → ranked path rows.

    Output rows: (h, t, r, rank, score, path_len, truncated) for
    rank < keep_top ranked paths per query triple.
    """

    def __init__(self, csr_bc: Broadcast, emb_bc: Broadcast, *,
                 max_len: int = 3, max_paths: int = 20000,
                 keep_top: int = 50):
        self.csr = csr_bc.get()
        E, R = emb_bc.get()
        self.Eu, self.Ru = _unit(np.asarray(E)), _unit(np.asarray(R))
        self.max_len, self.max_paths, self.keep_top = max_len, max_paths, keep_top
        self._cache_head: int | None = None
        self._cache_paths: dict[int, list[tuple]] = {}
        self._cache_trunc = False

    def _paths_for(self, head: int):
        if head != self._cache_head:
            self._cache_paths, self._cache_trunc = enumerate_paths(
                self.csr, head, max_len=self.max_len, max_paths=self.max_paths
            )
            self._cache_head = head
        return self._cache_paths, self._cache_trunc

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy()
        t = batch.column("t").to_numpy()
        r = batch.column("r").to_numpy()
        o_h, o_t, o_r, o_rank, o_score, o_len, o_tr = [], [], [], [], [], [], []
        order = np.argsort(h, kind="stable")  # group same-head queries
        for i in order.tolist():
            hi, ti, ri = int(h[i]), int(t[i]), int(r[i])
            paths_by_tail, trunc = self._paths_for(hi)
            ranked = rank_paths(
                paths_by_tail.get(ti, []), self.Eu, self.Ru, hi, ti, ri,
                top=self.keep_top,
            )
            for rank, (score, p) in enumerate(ranked):
                o_h.append(hi)
                o_t.append(ti)
                o_r.append(ri)
                o_rank.append(rank)
                o_score.append(score)
                o_len.append(len(p))
                o_tr.append(trunc)
        return pa.table(
            {
                "h": pa.array(o_h, pa.int32()),
                "t": pa.array(o_t, pa.int32()),
                "r": pa.array(o_r, pa.int32()),
                "rank": pa.array(o_rank, pa.int32()),
                "score": pa.array(o_score, pa.float64()),
                "path_len": pa.array(o_len, pa.int32()),
                "truncated": pa.array(o_tr, pa.bool_()),
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
