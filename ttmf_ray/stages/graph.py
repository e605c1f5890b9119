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


# ---------------------------------------------------------------------------
# Bipartite co-occurrence projection + triangle counting
# ---------------------------------------------------------------------------

def segment_cross_pairs(g: np.ndarray, max_group: int | None = None,
                        label: str = "segment_cross_pairs"):
    """Vectorized within-segment cross-product: positional index arrays
    (lefts, rights) emitting every ordered position pair i<j inside each
    run of equal values in the SEGMENT-SORTED array ``g`` — the shared
    kernel under ``cooccur_pairs`` and ``events_type_lift`` (no Python
    loop over groups; CLAUDE.md rule 3).  Segments larger than
    ``max_group`` are dropped with a printed count, never silently."""
    if len(g) == 0:
        e = np.empty(0, np.int64)
        return e, e
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    sizes = ends - starts
    if max_group is not None:
        big = sizes > max_group
        if big.any():
            print(f"{label}: dropped {int(big.sum())} groups "
                  f"over max_group={max_group}")
    else:
        big = np.zeros(len(sizes), dtype=bool)
    seg_end = np.repeat(ends, sizes)
    seg_ok = np.repeat(~big, sizes)
    idx = np.arange(len(g))
    rep = np.where(seg_ok, seg_end - idx - 1, 0)
    total = int(rep.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    lefts = np.repeat(idx, rep)
    off = np.concatenate(([0], np.cumsum(rep)[:-1]))
    rights = np.arange(total) - np.repeat(off, rep) \
        + np.repeat(idx + 1, rep)
    return lefts, rights


def cooccur_pairs(ds, *, group_col: str, item_col: str,
                  max_group: int = 100_000):
    """Distinct co-occurring item pairs within groups — the bipartite
    projection (items sharing a group get an undirected edge).

    Shape: in-batch distinct → hash-partition by GROUP so every group's
    rows meet in exactly one partition → per-partition vectorized pair
    generation (segment cross-product via repeat/arange offsets — no
    Python loop over groups, which is the many-tiny-groups trap of
    CLAUDE.md rule 3).  Output pairs are oriented ``a < b`` by item id;
    duplicates across partitions remain (same pair from two groups in
    different partitions) — compose with ``distinct_rows``.

    ``max_group`` caps the per-group fan-out (a group of size s emits
    s·(s−1)/2 pairs); capped groups are DROPPED and the count is
    reported via a log line, never silently.  TPC-H orders hold ≤7
    items, so the default cap never binds on the test tables.
    """
    from ..context import num_cpus

    n_part = min(512, max(64, num_cpus() * 4))

    def tag(t: pa.Table) -> pa.Table:
        t = t.select([group_col, item_col]) \
             .group_by([group_col, item_col]).aggregate([])
        g = t.column(group_col).to_numpy()
        part = (g % n_part).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def pairs_in_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([group_col, item_col])
        df = df.sort_values([group_col, item_col])
        g = df[group_col].to_numpy(np.int64)
        it = df[item_col].to_numpy(np.int64)
        # per-element pair fan-out: element at local offset j of a
        # segment of size s pairs with the s-1-j later elements
        lefts, rights = segment_cross_pairs(
            g, max_group, label="cooccur_pairs")
        if len(lefts) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        # segment rows are item-sorted and distinct, so a < b always
        out = pd.DataFrame({"a": it[lefts], "b": it[rights]})
        return out.drop_duplicates()

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("part")
              .map_groups(pairs_in_part, batch_format="pandas"))


class _TriangleCounter:
    """Edge-iterator triangle kernel over a broadcast oriented adjacency.

    For each edge (u, v) of the batch: wedge partners w = out-neighbors
    of v (all > v under the a<b orientation), probe the packed (u, w)
    key in the sorted edge-key array — one vectorized searchsorted per
    batch, no shuffle.  Emits per-node partial triangle counts."""

    def __init__(self, adj_bc: Broadcast):
        indptr, nbr, keys = adj_bc.get()
        self.indptr, self.nbr, self.keys = indptr, nbr, keys

    def __call__(self, t: pa.Table) -> pa.Table:
        u = t.column("a").to_numpy().astype(np.int64)
        v = t.column("b").to_numpy().astype(np.int64)
        cnt = self.indptr[v + 1] - self.indptr[v]
        total = int(cnt.sum())
        if total == 0 or len(self.keys) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        starts = self.indptr[v]
        off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        w = self.nbr[np.arange(total) - np.repeat(off, cnt)
                     + np.repeat(starts, cnt)]
        uu = np.repeat(u, cnt)
        probe = (uu << 32) | w
        pos = np.searchsorted(self.keys, probe)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos] == probe
        tri_nodes = np.concatenate(
            [uu[hit], np.repeat(v, cnt)[hit], w[hit]])
        node, c = np.unique(tri_nodes, return_counts=True)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "tri": pa.array(c.astype(np.int64), pa.int64())})


def triangle_stats(pairs_ds) -> pd.DataFrame:
    """Per-node triangle count + degree + clustering coefficient over a
    DISTINCT oriented (a<b) undirected edge Dataset.

    Edge-iterator algorithm: the oriented adjacency (CSR by ``a``) and
    the sorted packed edge keys broadcast ONCE; the edge Dataset streams
    through an actor pool probing wedges — zero shuffles beyond the tiny
    per-node partial-count groupby.  Broadcast is O(|E|) ints; at the
    scale where the edge list outgrows a node's object store, swap the
    probe for the bucketed ``hash_join`` on the wedge endpoint (same
    outputs, one shuffle) — the membership test is the only broadcast.

    coeff = 2·tri / (deg·(deg−1)), deg = distinct-neighbor degree.
    """
    from ray.data.aggregate import Sum

    from ..context import auto_pool, spread

    import ray.data as rd

    ed = pairs_ds.to_pandas()
    a = ed["a"].to_numpy(np.int64)
    b = ed["b"].to_numpy(np.int64)
    assert (a < b).all(), "triangle_stats expects oriented a<b pairs"
    assert len(a) == 0 or int(max(a.max(), b.max())) < (1 << 31), \
        "packed-key probe needs node ids < 2^31"
    keys = np.sort((a << 32) | b)
    order = np.argsort(a, kind="stable")
    a_s, b_s = a[order], b[order]
    n_max = int(max(a.max(), b.max())) + 1 if len(a) else 0
    indptr = np.zeros(n_max + 1, np.int64)
    if len(a):
        np.add.at(indptr, a_s + 1, 1)
        indptr = np.cumsum(indptr)
    adj_bc = Broadcast((indptr, b_s, keys))

    deg = np.bincount(a, minlength=n_max) + np.bincount(b, minlength=n_max)

    edge_ds = spread(rd.from_pandas(pd.DataFrame({"a": a, "b": b})))
    tri = (edge_ds.map_batches(
               _TriangleCounter,
               fn_constructor_kwargs={"adj_bc": adj_bc},
               batch_format="pyarrow",
               concurrency=auto_pool())
           .groupby("node")
           .aggregate(Sum("tri", alias_name="tri"))
           .to_pandas())
    if "node" not in tri.columns:      # zero triangles in the graph
        tri = pd.DataFrame({"node": np.empty(0, np.int64),
                            "tri": np.empty(0, np.int64)})

    nodes = np.flatnonzero(deg > 0).astype(np.int64)
    out = pd.DataFrame({"node": nodes, "deg": deg[nodes].astype(np.int64)})
    out = out.merge(tri, on="node", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    d = out["deg"].to_numpy(np.float64)
    t3 = out["tri"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(d >= 2, 2.0 * t3 / (d * (d - 1.0)), 0.0)
    from ..context import half_up
    out["coeff"] = half_up(coeff, 6)
    return out.sort_values("node").reset_index(drop=True)


def _kcore_arrays(a: np.ndarray, b: np.ndarray, k: int):
    """Simultaneous-peeling fixpoint: drop every edge touching a node of
    degree < k, recompute, repeat.  The k-core is unique, so any
    peeling schedule (and the SQL level-by-level twin) lands on the
    same (a, b) set."""
    while len(a):
        n = int(max(a.max(), b.max())) + 1
        deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
        keep = deg >= k
        m = keep[a] & keep[b]
        if m.all():
            break
        a, b = a[m], b[m]
    return a, b


def kcore(pairs_ds, *, k: int, driver_max: int = 2_000_000) -> pd.DataFrame:
    """Maximal k-core of a distinct oriented (a<b) edge Dataset →
    (node, deg) rows, deg = degree inside the core.

    Scale shape per round: per-batch degree combiner → one node-sized
    groupby (V ≪ E: the node table is the small side even at web
    scale) → surviving-node set broadcast once → vectorized edge
    membership filter; rounds repeat until no edge drops (k-core
    peeling converges in few rounds on heavy-tailed graphs).  Under
    ``driver_max`` edges the identical kernel runs driver-side
    (CLAUDE.md rule 13; parity pinned in tests)."""
    from ray.data.aggregate import Sum

    import ray.data as rd

    from ..context import Broadcast, spread

    ed = pairs_ds.to_pandas() if hasattr(pairs_ds, "to_pandas") else pairs_ds
    if isinstance(ed, pd.DataFrame) and len(ed) <= driver_max:
        a, b = _kcore_arrays(ed["a"].to_numpy(np.int64),
                             ed["b"].to_numpy(np.int64), k)
        if len(a) == 0:
            return pd.DataFrame({"node": np.empty(0, np.int64),
                                 "deg": np.empty(0, np.int64)})
        n = int(max(a.max(), b.max())) + 1
        deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
        nodes = np.flatnonzero(deg > 0).astype(np.int64)
        return pd.DataFrame({"node": nodes,
                             "deg": deg[nodes].astype(np.int64)})

    ds = spread(rd.from_pandas(ed)).materialize() \
        if isinstance(ed, pd.DataFrame) else ed.materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate([t.column("a").to_numpy(),
                                t.column("b").to_numpy()]).astype(np.int64)
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "deg": pa.array(c.astype(np.int64))})

    def degrees(edge_ds) -> pd.DataFrame:
        return (edge_ds.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg"))
                .to_pandas())

    n_edges = ds.count()
    while n_edges:
        dd = degrees(ds)
        surv = np.sort(dd.loc[dd["deg"] >= k, "node"].to_numpy(np.int64))
        bc = Broadcast(surv)

        def flt(t: pa.Table, _bc=bc) -> pa.Table:
            s = _bc.get()
            aa = t.column("a").to_numpy().astype(np.int64)
            bb = t.column("b").to_numpy().astype(np.int64)
            if len(s) == 0:
                return t.slice(0, 0)
            ina = s[np.clip(np.searchsorted(s, aa), 0, len(s) - 1)] == aa
            inb = s[np.clip(np.searchsorted(s, bb), 0, len(s) - 1)] == bb
            return t.filter(pa.array(ina & inb))

        nxt = ds.map_batches(flt, batch_format="pyarrow").materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            break
        ds, n_edges = nxt, n_next

    if n_edges == 0:
        return pd.DataFrame({"node": np.empty(0, np.int64),
                             "deg": np.empty(0, np.int64)})
    out = degrees(ds).astype({"node": np.int64, "deg": np.int64})
    return out.sort_values("node", ignore_index=True)


# ---------------------------------------------------------------------------
# Adamic-Adar link scores (KG error-detection / link-prediction signal)
# ---------------------------------------------------------------------------

class _AAProber:
    """Edge-iterator Adamic-Adar kernel over a broadcast symmetric CSR.

    For each oriented edge (a, b): candidates w = N(a) (one flat CSR
    gather), a common neighbor iff the packed oriented key
    (min(w,b), max(w,b)) is an edge — one vectorized searchsorted per
    batch.  Contribution 1/ln(deg_sym(w)) summed per edge via bincount
    (deg_sym(w) ≥ 2 for any common neighbor, so ln is never 0)."""

    def __init__(self, adj_bc: Broadcast):
        self.indptr, self.nbr, self.keys, self.deg = adj_bc.get()

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "common_neighbors": pa.array([], pa.int64()),
                          "adamic_adar": pa.array([], pa.float64())})
        if len(self.keys) == 0 or not len(a):
            return empty
        cnt = self.indptr[a + 1] - self.indptr[a]
        total = int(cnt.sum())
        if total == 0:
            return empty
        off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        w = self.nbr[np.arange(total) - np.repeat(off, cnt)
                     + np.repeat(self.indptr[a], cnt)]
        bb = np.repeat(b, cnt)
        eid = np.repeat(np.arange(len(a), dtype=np.int64), cnt)
        cand = w != bb                       # b ∈ N(a); not its own witness
        probe = (np.minimum(w, bb) << 32) | np.maximum(w, bb)
        pos = np.searchsorted(self.keys, probe)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        hit = (self.keys[pos] == probe) & cand
        we, ee = w[hit], eid[hit]
        cn = np.bincount(ee, minlength=len(a))
        aa = np.bincount(ee, weights=1.0 / np.log(self.deg[we]),
                         minlength=len(a))
        keep = cn > 0
        return pa.table({"a": pa.array(a[keep]),
                         "b": pa.array(b[keep]),
                         "common_neighbors": pa.array(
                             cn[keep].astype(np.int64)),
                         "adamic_adar": pa.array(np.round(aa[keep], 6))})


def adamic_adar(pairs_ds) -> pd.DataFrame:
    """Adamic-Adar score of every existing edge of an undirected graph:
    AA(a,b) = Σ_{w ∈ N(a)∩N(b)} 1/ln(deg(w)) — the classic
    common-neighbor link score, here over the KG's distinct undirected
    edges (the reference's error-detection framing: existing triples
    whose endpoints share no context are suspect; cf.
    `ResourceRankConfidence.py` neighborhood features).

    ``pairs_ds``: DISTINCT oriented (a<b) edge Dataset.  The symmetric
    CSR + packed key set + degree vector broadcast ONCE (O(|E|) ints);
    edges stream through the probe pool — zero shuffles.  Edges with no
    common neighbor are dropped (the SQL twin's join semantics)."""
    import ray.data as rd

    from ..context import auto_pool, spread

    ed = pairs_ds.to_pandas()
    a = ed["a"].to_numpy(np.int64)
    b = ed["b"].to_numpy(np.int64)
    assert len(a) == 0 or (a < b).all(), "adamic_adar expects a<b pairs"
    assert len(a) == 0 or int(max(a.max(), b.max())) < (1 << 31), \
        "packed-key probe needs node ids < 2^31"
    if not len(a):
        return pd.DataFrame({"a": np.empty(0, np.int64),
                             "b": np.empty(0, np.int64),
                             "common_neighbors": np.empty(0, np.int64),
                             "adamic_adar": np.empty(0, np.float64)})
    keys = np.sort((a << 32) | b)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    order = np.lexsort((v, u))
    u_s, v_s = u[order], v[order]
    n_max = int(u.max()) + 1
    indptr = np.zeros(n_max + 1, np.int64)
    np.add.at(indptr, u_s + 1, 1)
    indptr = np.cumsum(indptr)
    deg = np.bincount(u, minlength=n_max).astype(np.float64)
    adj_bc = Broadcast((indptr, v_s, keys, deg))

    edge_ds = spread(rd.from_pandas(pd.DataFrame({"a": a, "b": b})))
    out = (edge_ds.map_batches(
               _AAProber,
               fn_constructor_kwargs={"adj_bc": adj_bc},
               batch_format="pyarrow",
               concurrency=auto_pool())
           .to_pandas())
    return out.astype({"a": np.int64, "b": np.int64,
                       "common_neighbors": np.int64}) \
        .sort_values(["a", "b"], ignore_index=True)


# ---------------------------------------------------------------------------
# Seeded deterministic random walks (node2vec/DeepWalk corpus prep)
# ---------------------------------------------------------------------------

def random_walks(ids: pd.DataFrame, n_entities: int, *, n_steps: int = 3,
                 seed: int = 777) -> pd.DataFrame:
    """One deterministic walk per entity over the directed id-mapped KG:
    from ``cur``, the next edge is out-edge rank
    mix64(seed, step, cur, start) % outdeg(cur) under the (t, r)
    lexicographic edge order; a walk emits one (start, step, r, node)
    row per step and stops at the first sink.  This is the corpus-prep
    primitive of DeepWalk/node2vec-style KG embedding pipelines.

    The CSR broadcasts once; every start node advances VECTORIZED one
    step per round (n_steps gathers total, no per-walk Python).  The SQL
    twin unrolls the same steps over a row_number()-ranked edge list
    with the identical mix64 chain."""
    from ..context import Broadcast, auto_pool, spread
    from ..sources.pages import mix64_vec

    import ray.data as rd

    csr = build_csr(ids["h"].to_numpy(np.int64),
                    ids["t"].to_numpy(np.int64),
                    ids["r"].to_numpy(np.int64), n_entities)
    bc = Broadcast((csr.eindptr, csr.edst, csr.erel))

    class Walker:
        def __init__(self, adj_bc: Broadcast):
            self.eindptr, self.edst, self.erel = adj_bc.get()

        def __call__(self, t: pa.Table) -> pa.Table:
            start = t.column("start").to_numpy().astype(np.int64)
            cur = start.copy()
            alive = np.ones(len(start), dtype=bool)
            outs = []
            for step in range(1, n_steps + 1):
                deg = self.eindptr[cur + 1] - self.eindptr[cur]
                alive &= deg > 0
                if not alive.any():
                    break
                a = np.flatnonzero(alive)
                idx = (mix64_vec(seed, step, cur[a], start[a])
                       % deg[a].astype(np.uint64)).astype(np.int64)
                e = self.eindptr[cur[a]] + idx
                nxt, rel = self.edst[e], self.erel[e]
                outs.append(pa.table({
                    "start": pa.array(start[a]),
                    "step": pa.array(np.full(len(a), step, np.int64)),
                    "r": pa.array(rel.astype(np.int64)),
                    "node": pa.array(nxt.astype(np.int64))}))
                cur[a] = nxt
            if not outs:
                return pa.table({"start": pa.array([], pa.int64()),
                                 "step": pa.array([], pa.int64()),
                                 "r": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64())})
            return pa.concat_tables(outs)

    starts = spread(rd.from_pandas(pd.DataFrame(
        {"start": np.arange(n_entities, dtype=np.int64)})))
    out = starts.map_batches(Walker,
                             fn_constructor_kwargs={"adj_bc": bc},
                             batch_format="pyarrow",
                             concurrency=auto_pool()).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["start", "step"], ignore_index=True)


def biased_walks(ids: pd.DataFrame, n_entities: int, *, n_steps: int = 3,
                 seed: int = 911) -> pd.DataFrame:
    """node2vec-style SECOND-ORDER walks (Grover & Leskovec, KDD 2016)
    with p = q = 2 as scaled integer weights: from ``cur`` with previous
    node ``prev``, each out-edge to ``nxt`` weighs

        1   if nxt == prev            (return, 1/p)
        2   if edge prev→nxt exists   (triangle/BFS-ish, 1)
        1   otherwise                 (outward, 1/q)

    and the step takes the first edge (in (t, r) order) whose running
    weight exceeds mix64(seed, step, cur, start) % total_weight.  Step 1
    has no prev and degenerates to the uniform rank draw of
    :func:`random_walks` (all weights 1 ⇒ rank = draw).

    Vectorized per round: one flat gather of every alive walk's
    out-edges (np.repeat + global-cumsum segment trick), one packed-key
    searchsorted for the prev→nxt neighbor test, ONE searchsorted into
    the strictly-increasing global weight cumsum for the selection —
    no per-walk Python.  CSR + sorted (h,t) keys broadcast once.  The
    SQL twin unrolls the identical weighted selection over the ranked
    edge list (window cumsum + first-row-past-the-draw)."""
    from ..context import Broadcast, auto_pool, spread
    from ..sources.pages import mix64_vec

    import ray.data as rd

    h = ids["h"].to_numpy(np.int64)
    t = ids["t"].to_numpy(np.int64)
    assert n_entities < (1 << 31), "packed (h,t) keys need ids < 2^31"
    csr = build_csr(h, t, ids["r"].to_numpy(np.int64), n_entities)
    keys = np.unique((h << 32) | t)
    bc = Broadcast((csr.eindptr, csr.edst, csr.erel, keys))

    class Walker:
        def __init__(self, adj_bc: Broadcast):
            (self.eindptr, self.edst, self.erel,
             self.keys) = adj_bc.get()

        def _tri(self, prev_rep, nxt_all):
            key = (prev_rep << 32) | nxt_all
            if not len(self.keys):
                return np.zeros(len(key), bool)
            pos = np.clip(np.searchsorted(self.keys, key), 0,
                          len(self.keys) - 1)
            return self.keys[pos] == key

        def __call__(self, tb: pa.Table) -> pa.Table:
            start = tb.column("start").to_numpy().astype(np.int64)
            cur = start.copy()
            prev = start.copy()
            alive = np.ones(len(start), dtype=bool)
            outs = []
            for step in range(1, n_steps + 1):
                deg = self.eindptr[cur + 1] - self.eindptr[cur]
                alive &= deg > 0
                if not alive.any():
                    break
                a = np.flatnonzero(alive)
                if step == 1:
                    idx = (mix64_vec(seed, step, cur[a], start[a])
                           % deg[a].astype(np.uint64)).astype(np.int64)
                    e = self.eindptr[cur[a]] + idx
                else:
                    da = deg[a]
                    off = self.eindptr[cur[a]]
                    seg_end = np.cumsum(da)
                    seg_start = seg_end - da
                    total = int(seg_end[-1])
                    flat_e = (np.repeat(off, da)
                              + np.arange(total, dtype=np.int64)
                              - np.repeat(seg_start, da))
                    nxt_all = self.edst[flat_e].astype(np.int64)
                    wrep = np.repeat(np.arange(len(a)), da)
                    prev_rep = prev[a][wrep]
                    back = nxt_all == prev_rep
                    tri = self._tri(prev_rep, nxt_all) & ~back
                    w = np.where(back, 1, np.where(tri, 2, 1)) \
                        .astype(np.int64)
                    cumw = np.cumsum(w)
                    base = np.where(seg_start > 0,
                                    cumw[seg_start - 1], 0)
                    tot = cumw[seg_end - 1] - base
                    draw = (mix64_vec(seed, step, cur[a], start[a])
                            % tot.astype(np.uint64)).astype(np.int64)
                    sel = np.searchsorted(cumw, base + draw,
                                          side="right")
                    e = flat_e[sel]
                nxt, rel = self.edst[e], self.erel[e]
                outs.append(pa.table({
                    "start": pa.array(start[a]),
                    "step": pa.array(np.full(len(a), step, np.int64)),
                    "r": pa.array(rel.astype(np.int64)),
                    "node": pa.array(nxt.astype(np.int64))}))
                prev[a] = cur[a]
                cur[a] = nxt
            if not outs:
                return pa.table({"start": pa.array([], pa.int64()),
                                 "step": pa.array([], pa.int64()),
                                 "r": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64())})
            return pa.concat_tables(outs)

    starts = spread(rd.from_pandas(pd.DataFrame(
        {"start": np.arange(n_entities, dtype=np.int64)})))
    out = starts.map_batches(Walker,
                             fn_constructor_kwargs={"adj_bc": bc},
                             batch_format="pyarrow",
                             concurrency=auto_pool()).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["start", "step"], ignore_index=True)


# ---------------------------------------------------------------------------
# Relation-path statistics: (r1, r2) composition counts over 2-edge paths
# ---------------------------------------------------------------------------

def relpath_2hop(edges_ds, n_rel: int) -> pd.DataFrame:
    """Count 2-edge relation paths r1→r2 over an id-mapped (h, t, r)
    edge Dataset: n_paths(r1, r2) = #{(e1, e2) : e1.t == e2.h,
    e1.r == r1, e2.r == r2} — the path-pattern census behind
    PTransE-style relation-path features (reference
    PTransE.java's path statistics work per (h,t) pair; this is the
    corpus-level profile).

    Shape: per-batch combiner counts distinct (mid, r, side) with
    multiplicity, hash-partitioned by MID NODE so each node's in/out
    edges meet in exactly one partition; the per-partition kernel is one
    (nv×R)ᵀ·(nv×R) matmul — n_paths(r1,r2) = Σ_v in_cnt(v,r1)·out_cnt(v,r2).
    Partition outputs are R×R partials; the driver fold is tiny.  No
    edge-level join ever materializes the quadratic path set."""
    from ..context import num_cpus

    n_part = min(512, max(64, num_cpus() * 4))

    def tag(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        tt = t.column("t").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        # side 0: edge ENTERS mid (mid = t, rel = r1 candidate)
        # side 1: edge LEAVES mid (mid = h, rel = r2 candidate)
        mid = np.concatenate([tt, h])
        rel = np.concatenate([r, r])
        side = np.concatenate([np.zeros(len(r), np.int8),
                               np.ones(len(r), np.int8)])
        key = (mid * n_rel + rel) * 2 + side
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"mid": pa.array(uk // (2 * n_rel)),
                         "rel": pa.array((uk // 2) % n_rel),
                         "side": pa.array((uk % 2).astype(np.int8)),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "part": pa.array(
                             (uk // (2 * n_rel)) % n_part)})

    def cross_in_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"r1": np.empty(0, np.int64),
                                 "r2": np.empty(0, np.int64),
                                 "n_paths": np.empty(0, np.int64)})
        g = df.groupby(["mid", "rel", "side"], as_index=False)["cnt"].sum()
        mid = g["mid"].to_numpy(np.int64)
        rel = g["rel"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        cnt = g["cnt"].to_numpy(np.int64)
        _, vi = np.unique(mid, return_inverse=True)
        nv = vi.max() + 1 if len(vi) else 0
        m_in = np.zeros((nv, n_rel), dtype=np.int64)
        m_out = np.zeros((nv, n_rel), dtype=np.int64)
        i0, i1 = side == 0, side == 1
        np.add.at(m_in, (vi[i0], rel[i0]), cnt[i0])
        np.add.at(m_out, (vi[i1], rel[i1]), cnt[i1])
        part = m_in.T @ m_out
        r1, r2 = np.nonzero(part)
        return pd.DataFrame({"r1": r1.astype(np.int64),
                             "r2": r2.astype(np.int64),
                             "n_paths": part[r1, r2]})

    parts = (edges_ds.map_batches(tag, batch_format="pyarrow")
             .groupby("part")
             .map_groups(cross_in_part, batch_format="pandas")).to_pandas()
    out = parts.groupby(["r1", "r2"], as_index=False)["n_paths"].sum()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["r1", "r2"], ignore_index=True)


def reach2(edges_ds, n_nodes: int, *, src_col: str = "src",
           dst_col: str = "dst", mid_cap: "int | None" = None,
           with_stats: bool = False):
    """Per-node ≤2-hop reach over a distinct directed edge Dataset:
    n1 = distinct out-neighbors, n_reach2 = distinct nodes reachable in
    one OR two hops (self excluded from both) — the neighborhood-size
    profile behind frontier-cap sizing (how much does one extra hop
    cost per node?).

    Shape: edges hash-partition by MID node (the relpath_2hop tagging),
    each partition emits its DISTINCT (src, dst2) 2-hop pairs via a
    vectorized segment cross-product (never a Python loop over mids);
    the union with the 1-hop pairs is deduped by one int-partition
    distinct (stages/dedup.py:distinct_rows) and per-src counts fold as
    |V|-sized bincount partials.  The 2-hop pair volume is the true
    path count Σ_m in(m)·out(m) — at web scale the frontier cap /
    hub-salting lever applies here exactly as in PathEnum.

    ``mid_cap``: the frontier cap.  When set, a mid node keeps only its
    ``mid_cap`` smallest-id in-neighbors and out-neighbors (the
    GraphFeatures/PathEnum deterministic-truncation contract), bounding
    any partition's pair volume at cap²·|mids| instead of the unbounded
    hub product in(m)·out(m).  With ``with_stats=True`` the return is
    ``(df, stats)`` where stats carries ``n_capped_mids`` — the exact
    global count of hub mids that hit the cap (each mid's edges land in
    exactly one hash partition, so per-partition counts sum exactly).
    Packing bound: pairs dedup via ``u * n_nodes + v`` — valid while
    n_nodes < ~3e9 (int64); shard the pair key first beyond that."""
    from ..context import num_cpus
    from .dedup import distinct_rows

    n_part = min(512, max(64, num_cpus() * 4))

    def tag(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy().astype(np.int64)
        d = t.column(dst_col).to_numpy().astype(np.int64)
        mid = np.concatenate([d, s])
        val = np.concatenate([s, d])
        side = np.concatenate([np.zeros(len(s), np.int8),
                               np.ones(len(d), np.int8)])
        return pa.table({"mid": pa.array(mid), "val": pa.array(val),
                         "side": pa.array(side),
                         "part": pa.array(mid % n_part)})

    def pairs_in_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"u": np.empty(0, np.int64),
                                 "v": np.empty(0, np.int64)})
        mid = df["mid"].to_numpy(np.int64)
        val = df["val"].to_numpy(np.int64)
        side = df["side"].to_numpy(np.int8)
        order = np.lexsort((val, side, mid))
        mid, val, side = mid[order], val[order], side[order]
        _, vi = np.unique(mid, return_inverse=True)
        nv = int(vi.max()) + 1 if len(vi) else 0
        a = np.bincount(vi[side == 0], minlength=nv)   # in-edges per mid
        b = np.bincount(vi[side == 1], minlength=nv)   # out-edges per mid
        ins, outs = val[side == 0], val[side == 1]
        in_off = np.concatenate(([0], np.cumsum(a)[:-1]))
        out_off = np.concatenate(([0], np.cumsum(b)[:-1]))
        if mid_cap is not None:
            n_capped = int(np.count_nonzero((a > mid_cap)
                                            | (b > mid_cap)))
            a_c = np.minimum(a, mid_cap)
            b_c = np.minimum(b, mid_cap)
        else:
            n_capped, a_c, b_c = 0, a, b
        npairs = a_c * b_c
        total = int(npairs.sum())
        parts = []
        if total:
            seg = np.repeat(np.arange(nv), npairs)
            k = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs)
            # first a_c/b_c values per mid: within (mid, side) the
            # lexsort left vals ascending, so the cap keeps the
            # smallest-id neighbors deterministically.
            u = ins[in_off[seg] + k // b_c[seg]]
            v = outs[out_off[seg] + k % b_c[seg]]
            key = np.unique(u * n_nodes + v)
            parts.append(pd.DataFrame(
                {"u": (key // n_nodes).astype(np.int64),
                 "v": (key % n_nodes).astype(np.int64)}))
        if n_capped:
            # per-partition stats sentinel: u = -1 - part is unique per
            # partition so it survives the downstream distinct.
            part_id = int(df["part"].iloc[0])
            parts.append(pd.DataFrame(
                {"u": np.array([-1 - part_id], np.int64),
                 "v": np.array([n_capped], np.int64)}))
        if not parts:
            return pd.DataFrame({"u": np.empty(0, np.int64),
                                 "v": np.empty(0, np.int64)})
        return pd.concat(parts, ignore_index=True)

    p2 = (edges_ds.map_batches(tag, batch_format="pyarrow")
          .groupby("part")
          .map_groups(pairs_in_part, batch_format="pandas"))
    p1 = edges_ds.map_batches(
        lambda t: pa.table({
            "u": t.column(src_col).cast(pa.int64()),
            "v": t.column(dst_col).cast(pa.int64())}),
        batch_format="pyarrow")
    un = distinct_rows(p1.union(p2), ["u", "v"])

    import ray as _ray

    def _count_fold(ds) -> np.ndarray:
        # self-loops (u == v) are excluded by definition; negative u
        # rows are per-partition stats sentinels — their v values fold
        # into the trailing extra slot as the global capped-mid count.
        def part(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy().astype(np.int64)
            v = t.column("v").to_numpy().astype(np.int64)
            keep = (u != v) & (u >= 0)
            c = np.bincount(u[keep], minlength=n_nodes).astype(np.int64)
            return pa.table({"c": pa.array(np.concatenate(
                [c, [v[u < 0].sum()]]))})

        acc = np.zeros(n_nodes + 1, dtype=np.int64)
        for t in _ray.get(ds.map_batches(
                part, batch_format="pyarrow").to_arrow_refs()):
            if len(t):
                # a block can hold SEVERAL concatenated per-batch
                # partials (Ray coalesces map_batches outputs — first
                # seen at the 2M-edge sf1 audit run); fold each
                # (n_nodes+1)-sized partial, not the raw column
                acc += t.column("c").to_numpy() \
                    .reshape(-1, n_nodes + 1).sum(axis=0)
        return acc

    folded = _count_fold(un)
    n_r2, n_capped_mids = folded[:-1], int(folded[-1])
    n1 = _count_fold(distinct_rows(p1, ["u", "v"]))[:-1]
    out = pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                        "n1": n1, "n_reach2": n_r2})
    if with_stats:
        stats = pd.DataFrame({"n_capped_mids": [n_capped_mids],
                              "mid_cap": [-1 if mid_cap is None
                                          else int(mid_cap)]})
        return out, stats
    return out


# ---------------------------------------------------------------------------
# Entity relation-signature profile (schema induction over the KG)
# ---------------------------------------------------------------------------

def entity_signatures(edges_ds, n_entities: int) -> pd.DataFrame:
    """Per entity the sorted distinct outgoing / incoming relation-id
    sets as ','-joined strings, plus the number of entities sharing the
    exact (sig_out, sig_in) pair — the relation-signature grouping used
    for KG schema induction / type inference.

    Per-batch combiner emits distinct packed (entity, rel, side) keys —
    the fold state is bounded by |V|·|R| distinct pairs, never the edge
    stream — then one vocab-scale driver pass builds the strings (rule
    13: at this state size a Ray round-trip costs seconds where the
    segment join costs milliseconds)."""
    import ray as _ray

    def pairs(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        tt = t.column("t").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        n_rel = int(r.max()) + 1 if len(r) else 1
        k_out = np.unique(h * n_rel + r)
        k_in = np.unique(tt * n_rel + r)
        return pa.table({
            "ent": pa.array(np.concatenate([k_out // n_rel,
                                            k_in // n_rel])),
            "rel": pa.array(np.concatenate([k_out % n_rel,
                                            k_in % n_rel])),
            "side": pa.array(np.concatenate(
                [np.ones(len(k_out), np.int8),
                 np.zeros(len(k_in), np.int8)]))})

    tbls = [t for t in _ray.get(
        edges_ds.map_batches(pairs, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    cat = pa.concat_tables(tbls).to_pandas().drop_duplicates()

    def sig_map(sub: pd.DataFrame) -> np.ndarray:
        """entity → ','-joined sorted distinct rel ids ('' if absent)."""
        sub = sub.sort_values(["ent", "rel"])
        ent = sub["ent"].to_numpy(np.int64)
        rel = sub["rel"].to_numpy(np.int64)
        sigs = np.full(n_entities, "", dtype=object)
        if len(ent):
            strs = rel.astype(str)
            starts = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
            joined = [",".join(strs[s:e]) for s, e in
                      zip(starts, np.r_[starts[1:], len(ent)])]
            sigs[ent[starts]] = joined
        return sigs

    sig_out = sig_map(cat[cat["side"] == 1])
    sig_in = sig_map(cat[cat["side"] == 0])
    df = pd.DataFrame({"id": np.arange(n_entities, dtype=np.int64),
                       "sig_out": sig_out, "sig_in": sig_in})
    df["n_peers"] = df.groupby(["sig_out", "sig_in"])["id"] \
        .transform("size").astype(np.int64)
    return df
