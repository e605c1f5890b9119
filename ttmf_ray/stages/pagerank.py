"""Global PageRank over an id-mapped edge Dataset — the whole-graph
power iteration (vs. stages/graph.py's per-head PERSONALIZED PageRank on
bounded subgraph balls).

Ray-Data-first shape (the k-means partial pattern, CLAUDE.md rule 3):

- **Out-degrees**: one ``map_batches`` pass emitting per-batch
  ``bincount`` partials over the source column; the driver folds the
  vocab-bounded vectors (|V| floats — the KG vocabulary is the small
  object; the edge list streams).
- **One pass per iteration**: the PR vector is broadcast (``ray.put``
  once per iteration, never per batch); each batch returns
  ``bincount(dst, weights=pr[src]/outdeg[src])`` — a |V|-float partial,
  independent of batch size.  No shuffle: the fold is a driver-side
  vector add, exactly like the k-means centroid update.
- **Quantized iteration**: the new PR vector is rounded to 9 dp every
  update, so float summation-order ulps never compound and a DuckDB
  mirror running the identical unrolled iterations (per-edge pr/od
  SUM + the dangling-mass redistribution) lands on the same vector —
  the `docs_lm_perplexity` / `kmeans` quantize-the-iteration trick.
- **Dangling nodes** (outdeg 0) redistribute their mass uniformly each
  iteration (the standard stochastic-matrix fix; same formula as the
  reference's per-ball PPR dangling handling, `pagerank.py:18-85`).

Driver fast path (rule 13): under ``driver_max`` edges the identical
kernels run on the collected int arrays — at FB15K scale the per-
iteration Ray round-trip costs seconds where the bincounts cost
milliseconds.  Parity is pinned by a driver-vs-pool test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..context import Broadcast, spread

DAMPING = 0.85
PR_ROUND = 9      # dp of the per-iteration quantization (mirror contract)


def _pr_round(x: np.ndarray) -> np.ndarray:
    return np.round(x, PR_ROUND)


def _fold_dense(ds, n: int, col: str, dtype=np.float64) -> np.ndarray:
    """Sum |V|-sized per-batch dense partials from a map_batches output.

    A collected block may hold SEVERAL concatenated partials (Ray
    coalesces small map_batches outputs into one block — first observed
    at the 2M-edge sf1 audit run, where a naive ``acc += column`` crashed
    on a 2·|V| block), so fold in n-sized stripes."""
    acc = np.zeros(n, dtype=dtype)
    for t in ray.get(ds.to_arrow_refs()):
        if len(t):
            acc += t.column(col).to_numpy().reshape(-1, n).sum(axis=0)
    return acc


def _pr_step(pr: np.ndarray, contrib: np.ndarray, dangling: float,
             d: float) -> np.ndarray:
    n = len(pr)
    return _pr_round((1.0 - d) / n + d * (contrib + dangling / n))


def pagerank(edges_ds, n_nodes: int, *, d: float = DAMPING,
             n_iter: int = 10, src_col: str = "src", dst_col: str = "dst",
             driver_max: int = 5_000_000) -> pd.DataFrame:
    """Distinct (src, dst) edge Dataset → (node, pr) DataFrame.

    ``driver_max=0`` forces the pool path (used by the parity test)."""
    edges_ds = edges_ds.materialize()
    if driver_max and edges_ds.count() <= driver_max:
        tbls = ray.get(edges_ds.to_arrow_refs())
        t = pa.concat_tables([x.select([src_col, dst_col])
                              for x in tbls if x.num_rows])
        src = t.column(src_col).to_numpy().astype(np.int64)
        dst = t.column(dst_col).to_numpy().astype(np.int64)
        od = np.bincount(src, minlength=n_nodes)
        pr = _pr_round(np.full(n_nodes, 1.0 / n_nodes))
        w = np.empty(len(src), np.float64)
        for _ in range(n_iter):
            np.divide(pr[src], od[src], out=w)
            contrib = np.bincount(dst, weights=w, minlength=n_nodes)
            dangling = float(pr[od == 0].sum())
            pr = _pr_step(pr, contrib, dangling, d)
        return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                             "pr": pr})

    edges_ds = spread(edges_ds)

    def od_part(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy().astype(np.int64)
        return pa.table({"od": pa.array(
            np.bincount(s, minlength=n_nodes).astype(np.int64))})

    od = _fold_dense(edges_ds.map_batches(od_part, batch_format="pyarrow"),
                     n_nodes, "od", dtype=np.int64)

    pr = _pr_round(np.full(n_nodes, 1.0 / n_nodes))
    zero_od = od == 0
    for _ in range(n_iter):
        state = Broadcast((pr, od))

        def contrib_part(t: pa.Table, state=state) -> pa.Table:
            p, o = state.get()
            s = t.column(src_col).to_numpy().astype(np.int64)
            v = t.column(dst_col).to_numpy().astype(np.int64)
            c = np.bincount(v, weights=p[s] / o[s], minlength=n_nodes)
            return pa.table({"c": pa.array(c)})

        contrib = _fold_dense(
            edges_ds.map_batches(contrib_part, batch_format="pyarrow"),
            n_nodes, "c")
        dangling = float(pr[zero_od].sum())
        pr = _pr_step(pr, contrib, dangling, d)
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "pr": pr})


# ---------------------------------------------------------------------------
# Katz centrality (Katz 1953) — same quantized-iteration shape
# ---------------------------------------------------------------------------

def katz(edges_ds, n_nodes: int, *, beta: float = 0.01, n_iter: int = 8,
         src_col: str = "src", dst_col: str = "dst",
         driver_max: int = 5_000_000) -> pd.DataFrame:
    """Katz centrality over a distinct directed edge Dataset →
    (node, katz): x ← round(β · Σ_{u→v} (1 + x_u), 9) per iteration
    from x = 0, i.e. the attenuated count of incoming walks
    Σ_k β^k |walks of length k ending at v| truncated at ``n_iter``.

    Same plan as :func:`pagerank`: the β-damped vector is the small
    broadcast object, each batch returns a |V|-float bincount partial,
    the fold is a driver vector add, and the per-iteration 9-dp
    quantization lets the unrolled DuckDB twin land on the identical
    vector.  ``driver_max=0`` forces the pool path (parity test)."""
    edges_ds = edges_ds.materialize()
    x = np.zeros(n_nodes, dtype=np.float64)

    if driver_max and edges_ds.count() <= driver_max:
        tbls = ray.get(edges_ds.to_arrow_refs())
        t = pa.concat_tables([b.select([src_col, dst_col])
                              for b in tbls if b.num_rows])
        src = t.column(src_col).to_numpy().astype(np.int64)
        dst = t.column(dst_col).to_numpy().astype(np.int64)
        for _ in range(n_iter):
            x = _pr_round(beta * np.bincount(
                dst, weights=1.0 + x[src], minlength=n_nodes))
        return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                             "katz": x})

    edges_ds = spread(edges_ds)
    for _ in range(n_iter):
        state = Broadcast(x)

        def part(t: pa.Table, state=state) -> pa.Table:
            xv = state.get()
            s = t.column(src_col).to_numpy().astype(np.int64)
            v = t.column(dst_col).to_numpy().astype(np.int64)
            return pa.table({"c": pa.array(np.bincount(
                v, weights=1.0 + xv[s], minlength=n_nodes))})

        acc = _fold_dense(
            edges_ds.map_batches(part, batch_format="pyarrow"),
            n_nodes, "c")
        x = _pr_round(beta * acc)
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "katz": x})


# ---------------------------------------------------------------------------
# HITS hubs/authorities (Kleinberg 1999) — same quantized-iteration shape
# ---------------------------------------------------------------------------

def _hits_norm(raw: np.ndarray) -> np.ndarray:
    """Quantize the per-node sums, then max-normalize and quantize again.

    Max (unlike an L2/L1 norm) is summation-order independent, so the
    normalizer is bit-identical cross-engine; the two 9-dp rounds keep
    the per-target SUM ulps from compounding (pagerank's trick)."""
    q = _pr_round(raw)
    m = q.max() if len(q) else 0.0
    return _pr_round(q / m) if m > 0 else q


def hits(edges_ds, n_nodes: int, *, n_iter: int = 8,
         src_col: str = "src", dst_col: str = "dst",
         driver_max: int = 5_000_000) -> pd.DataFrame:
    """HITS over a distinct directed edge Dataset → (node, hub, auth).

    Per iteration: auth = normalize(Σ_{u→i} hub_u), then
    hub = normalize(Σ_{i→v} auth_v) — two bincount passes over the edge
    stream with the hub/auth vectors broadcast (the graph's node
    vocabulary is the small object, the edge list streams).  Max
    normalization + 9-dp quantization per update makes the unrolled
    DuckDB twin land on the same vectors (stages docstring above).

    ``driver_max=0`` forces the pool path (parity test)."""
    edges_ds = edges_ds.materialize()
    hub = np.ones(n_nodes, dtype=np.float64)
    auth = np.zeros(n_nodes, dtype=np.float64)

    if driver_max and edges_ds.count() <= driver_max:
        tbls = ray.get(edges_ds.to_arrow_refs())
        t = pa.concat_tables([x.select([src_col, dst_col])
                              for x in tbls if x.num_rows])
        src = t.column(src_col).to_numpy().astype(np.int64)
        dst = t.column(dst_col).to_numpy().astype(np.int64)
        for _ in range(n_iter):
            auth = _hits_norm(
                np.bincount(dst, weights=hub[src], minlength=n_nodes))
            hub = _hits_norm(
                np.bincount(src, weights=auth[dst], minlength=n_nodes))
        return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                             "hub": hub, "auth": auth})

    edges_ds = spread(edges_ds)

    def _fold(gather_col: str, weight_vec: np.ndarray,
              weight_idx_col: str) -> np.ndarray:
        state = Broadcast(weight_vec)

        def part(t: pa.Table, state=state) -> pa.Table:
            w = state.get()
            gi = t.column(gather_col).to_numpy().astype(np.int64)
            wi = t.column(weight_idx_col).to_numpy().astype(np.int64)
            return pa.table({"c": pa.array(
                np.bincount(gi, weights=w[wi], minlength=n_nodes))})

        return _fold_dense(
            edges_ds.map_batches(part, batch_format="pyarrow"),
            n_nodes, "c")

    for _ in range(n_iter):
        auth = _hits_norm(_fold(dst_col, hub, src_col))
        hub = _hits_norm(_fold(src_col, auth, dst_col))
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "hub": hub, "auth": auth})
