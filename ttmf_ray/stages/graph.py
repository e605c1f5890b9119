"""Fused per-head subgraph → personalized PageRank → ResourceRank features
(SURVEY.md T1+T2+T3 in ONE actor-pool stage — the reference runs three
processes over per-entity FILES: search.py → pagerank.py →
ResourceRankConfidence.py; fusing them removes two materializations and
the all-PR-files-in-one-dict driver load at
/root/reference/ResourceRankConfidence.py:388).

Semantics (clean, order-independent equivalents — SURVEY.md §7.5 item 2):

- subgraph of head = BFS out-expansion, nodes expanded at distance ≤ 3
  (the reference's DFS depth=4, `search.py:76`), each expanded node
  contributes ALL its out-edges with weight #parallel-relations
  row-normalized over its out-edges (`search.py:49-61` normalizes by the
  DFS-visit-order sum; row-normalization is the order-free equivalent);
- PPR per `pagerank.py:18-85`: α=0.85, ≤500 iters, ε=1e-5 L1; dangling
  node fix = self-loop 0.5 + edge-to-core 0.5; init PR(core)=1 others 0;
  update rank(v) = Σ_in α·PR(u)·w(u,v) + (1−α)/N;
- features per `ResourceRankConfidence.py:198-268`: unweighted in/out
  degree within the (un-fixed) subgraph, BFS depth from core, and the PR
  value (the sigmoid f is applied downstream once per-head thresholds
  exist).

Skew / hub control: ``max_nodes`` caps the frontier (the reference's
32 GB-per-500k-triples hazard, README.md:57); truncation is REPORTED in
the ``truncated`` column — no silent caps.

The adjacency is a CSR over (h,t)-grouped edges, built once and
broadcast via ``ray.put`` (shared object store — not copied per worker
like `SearchPaths2.py:224-230`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast


@dataclass
class CSR:
    """Grouped adjacency: for entity u, out-neighbors dst[indptr[u]:indptr[u+1]]
    with parallel-relation counts cnt[...] — plus the ungrouped per-relation
    arrays (edst/erel) used by path search."""

    indptr: np.ndarray   # (n_entities + 1,)
    dst: np.ndarray      # (nnz,) unique neighbor per (u, v)
    cnt: np.ndarray      # (nnz,) number of parallel relations on (u, v)
    eindptr: np.ndarray  # (n_entities + 1,) per-relation edges
    edst: np.ndarray     # (m,)
    erel: np.ndarray     # (m,)


def build_csr(h: np.ndarray, t: np.ndarray, r: np.ndarray, n_entities: int) -> CSR:
    """Driver-side CSR build from id triples (sorted, deduped, vectorized)."""
    order = np.lexsort((r, t, h))
    h, t, r = h[order], t[order], r[order]
    # dedupe exact (h,t,r) (defensive; edges should already be distinct)
    keep = np.ones(len(h), dtype=bool)
    if len(h) > 1:
        keep[1:] = (h[1:] != h[:-1]) | (t[1:] != t[:-1]) | (r[1:] != r[:-1])
    h, t, r = h[keep], t[keep], r[keep]

    eindptr = np.zeros(n_entities + 1, dtype=np.int64)
    np.add.at(eindptr, h + 1, 1)
    np.cumsum(eindptr, out=eindptr)

    # group (h, t) pairs → cnt
    new_pair = np.ones(len(h), dtype=bool)
    if len(h) > 1:
        new_pair[1:] = (h[1:] != h[:-1]) | (t[1:] != t[:-1])
    pair_idx = np.cumsum(new_pair) - 1
    n_pairs = int(pair_idx[-1]) + 1 if len(h) else 0
    dst = t[new_pair]
    ph = h[new_pair]
    cnt = np.zeros(n_pairs, dtype=np.int64)
    np.add.at(cnt, pair_idx, 1)
    indptr = np.zeros(n_entities + 1, dtype=np.int64)
    np.add.at(indptr, ph + 1, 1)
    np.cumsum(indptr, out=indptr)
    return CSR(indptr=indptr, dst=dst, cnt=cnt,
               eindptr=eindptr, edst=t.astype(np.int64), erel=r.astype(np.int64))


def _bfs_subgraph(csr: CSR, core: int, *, depth: int = 4,
                  max_nodes: int = 4000, loc: np.ndarray | None = None):
    """Nodes (local ids), edge arrays (src,dst,w local), depth-from-core,
    truncated flag.  Nodes at distance ≤ depth; expansion at ≤ depth-1.

    Vectorized frontier expansion (equivalent to the per-edge loop,
    including the truncation order: new nodes get local ids in
    frontier-order × CSR-neighbor-order first appearance, and once
    ``max_nodes`` is hit only edges to already-known nodes are added).
    ``loc`` is an optional reusable global→local workspace array (size
    n_entities, all −1) — the actor allocates it once and this function
    restores it before returning.
    """
    n_ent = len(csr.indptr) - 1
    if loc is None:
        loc = np.full(n_ent, -1, dtype=np.int64)
    loc[core] = 0
    glob_parts = [np.array([core], dtype=np.int64)]
    depth_parts = [np.zeros(1, dtype=np.int64)]
    esrc_parts: list[np.ndarray] = []
    edst_parts: list[np.ndarray] = []
    ew_parts: list[np.ndarray] = []
    n_nodes = 1
    truncated = False
    frontier = np.array([core], dtype=np.int64)
    for d in range(depth):
        starts = csr.indptr[frontier]
        counts = (csr.indptr[frontier + 1] - starts).astype(np.int64)
        nz = counts > 0
        if not nz.any():
            break
        f, s, c = frontier[nz], starts[nz], counts[nz]
        total = int(c.sum())
        offs = np.concatenate(([0], np.cumsum(c)[:-1]))
        eidx = np.repeat(s - offs, c) + np.arange(total)
        dsts = csr.dst[eidx]
        cnts = csr.cnt[eidx].astype(np.float64)
        srcs = np.repeat(f, c)
        # per-source row normalization over ALL of u's out-edges
        seg_sum = np.add.reduceat(cnts, offs)
        w = cnts / np.repeat(seg_sum, c)
        # first-appearance-ordered new nodes, capped at max_nodes
        new_mask = loc[dsts] < 0
        if new_mask.any():
            uniq, first = np.unique(dsts[new_mask], return_index=True)
            accepted = uniq[np.argsort(first, kind="stable")]
            room = max_nodes - n_nodes
            if len(accepted) > room:
                truncated = True
                accepted = accepted[:room]
            loc[accepted] = n_nodes + np.arange(len(accepted))
            n_nodes += len(accepted)
            glob_parts.append(accepted)
            depth_parts.append(np.full(len(accepted), d + 1, dtype=np.int64))
        else:
            accepted = np.empty(0, dtype=np.int64)
        lv = loc[dsts]
        keep = lv >= 0  # drops edges to over-cap nodes only
        esrc_parts.append(loc[srcs[keep]])
        edst_parts.append(lv[keep])
        ew_parts.append(w[keep])
        if d + 1 >= depth or len(accepted) == 0:
            break
        frontier = accepted
    glob = np.concatenate(glob_parts)
    loc[glob] = -1  # restore the workspace for the next head
    cat = (lambda ps, dt: np.concatenate(ps) if ps
           else np.empty(0, dtype=dt))
    return (glob, cat(esrc_parts, np.int64), cat(edst_parts, np.int64),
            cat(ew_parts, np.float64), np.concatenate(depth_parts),
            truncated)


def personalized_pagerank(n: int, esrc: np.ndarray, edst: np.ndarray,
                          ew: np.ndarray, core_local: int = 0, *,
                          alpha: float = 0.85, max_iter: int = 500,
                          eps: float = 1e-5) -> np.ndarray:
    """Vectorized reference PPR (`pagerank.py:18-85`), dangling fix included."""
    has_out = np.zeros(n, dtype=bool)
    has_out[esrc] = True
    dangling = np.nonzero(~has_out)[0]
    if len(dangling):
        ds_ = np.concatenate([dangling, dangling[dangling != core_local]])
        dd_ = np.concatenate(
            [dangling, np.full((dangling != core_local).sum(), core_local)]
        )
        dw_ = np.full(len(ds_), 0.5)
        esrc = np.concatenate([esrc, ds_])
        edst = np.concatenate([edst, dd_])
        ew = np.concatenate([ew, dw_])

    pr = np.zeros(n)
    pr[core_local] = 1.0
    damping = (1.0 - alpha) / n
    aew = alpha * ew
    for _ in range(max_iter):
        # bincount is the fast scatter-add for the fixed edge list
        contrib = damping + np.bincount(edst, weights=pr[esrc] * aew,
                                        minlength=n)
        change = np.abs(contrib - pr).sum()
        pr = contrib
        if change < eps:
            break
    return pr


class GraphFeatures:
    """Actor stage: batch of head ids → per-(head, node) feature rows.

    ``__init__`` fetches the broadcast CSR once per actor; ``__call__``
    fuses subgraph + PPR + degree/depth features for each head in the
    batch.  Emits (head, node, pr, in_c, out_c, in_n, out_n, depth,
    truncated).
    """

    def __init__(self, csr_bc: Broadcast, *, depth: int = 4,
                 max_nodes: int = 4000, pairs_bc: Broadcast | None = None):
        self.csr = csr_bc.get()
        self.depth = depth
        self.max_nodes = max_nodes
        # optional packed (head<<32|node) filter: emit only rows the
        # downstream join will consume — the all-nodes output is ~60x
        # bigger than the conf-pair hits and dominated the stage wall
        self.pairs = pairs_bc.get() if pairs_bc is not None else None
        # reusable global→local workspace (allocated once per actor)
        self._loc = np.full(len(self.csr.indptr) - 1, -1, dtype=np.int64)

    def one_head(self, head: int):
        glob, esrc, edst, ew, depth_of, truncated = _bfs_subgraph(
            self.csr, head, depth=self.depth, max_nodes=self.max_nodes,
            loc=self._loc,
        )
        n = len(glob)
        pr = personalized_pagerank(n, esrc, edst, ew)
        # unweighted degrees on the deduped (u, v) subgraph edges (pre-fix)
        pairs = np.unique(esrc * n + edst)
        psrc, pdst = pairs // n, pairs % n
        indeg = np.zeros(n, dtype=np.int64)
        outdeg = np.zeros(n, dtype=np.int64)
        np.add.at(indeg, pdst, 1)
        np.add.at(outdeg, psrc, 1)
        return glob, pr, indeg, outdeg, depth_of, truncated

    def __call__(self, batch: pa.Table) -> pa.Table:
        heads = np.unique(batch.column("head").to_numpy())
        o_head, o_node, o_pr = [], [], []
        o_inc, o_outc, o_inn, o_outn, o_dep, o_tr = [], [], [], [], [], []
        for head in heads.tolist():
            glob, pr, indeg, outdeg, depth_of, truncated = self.one_head(head)
            n = len(glob)
            o_head.append(np.full(n, head, dtype=np.int64))
            o_node.append(glob)
            o_pr.append(pr)
            o_inc.append(np.full(n, indeg[0], dtype=np.int64))
            o_outc.append(np.full(n, outdeg[0], dtype=np.int64))
            o_inn.append(indeg)
            o_outn.append(outdeg)
            o_dep.append(depth_of)
            o_tr.append(np.full(n, truncated, dtype=bool))
        cat = np.concatenate
        head_a, node_a = cat(o_head), cat(o_node)
        cols = {
            "head": head_a,
            "node": node_a,
            "pr": cat(o_pr),
            "in_c": cat(o_inc),
            "out_c": cat(o_outc),
            "in_n": cat(o_inn),
            "out_n": cat(o_outn),
            "depth": cat(o_dep),
            "truncated": cat(o_tr),
        }
        if self.pairs is not None:
            probe = (head_a.astype(np.int64) << 32) | node_a.astype(np.int64)
            if len(self.pairs) == 0:
                mask = np.zeros(len(probe), dtype=bool)
            else:
                pos = np.clip(np.searchsorted(self.pairs, probe), 0,
                              len(self.pairs) - 1)
                mask = self.pairs[pos] == probe
            cols = {k: v[mask] for k, v in cols.items()}
        return pa.table({k: pa.array(v) for k, v in cols.items()})


def rr_sigmoid_f(pr_value: float | np.ndarray, theta: float | np.ndarray):
    """f = 1/(1+e^{−25·(pr−θ)}) (`ResourceRankConfidence.py:136-152`)."""
    return 1.0 / (1.0 + np.exp(-25.0 * (np.asarray(pr_value) - np.asarray(theta))))


RR_MISS_SENTINEL = [0.0, 0.0, 0.0, 0.0, 0.0, 10000.0]  # PrecessData.py:241
RR_F_MISS = 0.001                                      # RRC.py:137-152


def graph_features_for_heads(heads_ds, csr: CSR, *, depth: int = 4,
                             max_nodes: int = 4000, batch_size: int = 16,
                             pairs: "np.ndarray | None" = None,
                             concurrency: tuple[int, int] | int | None = None):
    """heads Dataset['head'] → fused per-(head, node) feature Dataset.

    ``csr`` / ``pairs`` may be ``Broadcast``s (streaming mode: the CSR and
    the packed-pair filter are assembled by remote tasks and never land on
    the driver — a ``Broadcast`` pairs value must be pre-sorted)."""
    from ..context import auto_pool, spread

    bc = csr if isinstance(csr, Broadcast) else Broadcast(csr)
    heads_ds = spread(heads_ds)
    if pairs is None or isinstance(pairs, Broadcast):
        pairs_bc = pairs
    else:
        pairs_bc = Broadcast(np.sort(pairs))
    return heads_ds.map_batches(
        GraphFeatures,
        fn_constructor_kwargs={"csr_bc": bc, "depth": depth,
                               "max_nodes": max_nodes,
                               "pairs_bc": pairs_bc},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: a batch of hub heads must not
        # become the straggler tail of the whole stage
        concurrency=concurrency or auto_pool(),
    )
