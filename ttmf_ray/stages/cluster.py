"""Distributed k-means over an embedding column + within-cluster semantic
dedup (the SemDeDup-style curation primitive: cluster, then drop members
that sit within an ε-ball of a lower-id representative).

K-means, Ray-Data-first:

- **Seeded deterministic init**: the k vectors whose ``(mix64(628,6,id),
  id)`` rank is smallest, cluster index = rank.  Cluster-size- and
  block-order-independent, and SQL-expressible (the same mix64 LATERAL
  chain every other seeded mirror uses).
- **One `map_batches` pass per iteration**: each batch computes distances
  against the broadcast (k, d) centroid matrix and returns a k-row
  partial (count, component sums) — the shuffle-free pre-aggregation
  shape (CLAUDE.md rule 3); the driver folds the tiny partials and
  updates centroids.  Empty clusters keep their previous centroid.
- **Bit-reproducible iteration**: distances are computed as direct
  squared differences (no expanded ‖v‖²−2v·c+‖c‖² cancellation) in
  float64 and ROUNDED to 6 dp before the argmin (ties → smallest
  cluster), and centroids are rounded to 6 dp after every update.  The
  rounding quantizes away summation-order ulps, so a DuckDB mirror
  running the identical unrolled iterations (list_distance on
  DOUBLE-cast lists, round(,6), row_number tie-break, avg + round)
  reproduces the assignments exactly — the same trick as the
  `docs_lm_perplexity` SQL-rebuilt model.
- Fixed ``n_iter`` (no data-dependent stopping) so the mirror can unroll.

Scale shape: per-iteration traffic is (k·d) per block, independent of n;
the final labeled output streams.  At 100 TB the read is the cost — the
centroid state is broadcast once per iteration (``ray.put`` via
``Broadcast``), never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..context import Broadcast, auto_pool, spread
from ..sources.pages import mix64_vec
from .ann import list_col_matrix

KMEANS_SEED_TAG = 6     # mix64(seed, KMEANS_SEED_TAG, id) ranks the init


def _round6(x: np.ndarray) -> np.ndarray:
    return np.round(x, 6)


def seeded_init_centroids(ds, *, k: int, seed: int = 628,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> np.ndarray:
    """(k, d) float64 centroid matrix: vectors of the k smallest
    (mix64(seed, 6, id), id) ranks, rounded to 6 dp, cluster = rank."""

    def part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        h = mix64_vec(seed, KMEANS_SEED_TAG, ids)
        keep = np.lexsort((ids, h))[:k]
        return pa.table({
            id_col: pa.array(ids[keep]),
            "__h": pa.array(h[keep]),
            vec_col: t.column(vec_col).take(pa.array(keep)),
        })

    # per-batch partial top-k, then one tiny driver merge (arrow collect:
    # the list column must not round-trip pandas — CLAUDE.md rule 10)
    tbls = ray.get(ds.map_batches(part, batch_format="pyarrow")
                   .to_arrow_refs())
    t = pa.concat_tables([x for x in tbls if x.num_rows] or tbls[:1])
    ids = t.column(id_col).to_numpy().astype(np.int64)
    h = t.column("__h").to_numpy()
    keep = np.lexsort((ids, h))[:k]
    V = list_col_matrix(t.column(vec_col))
    return _round6(V[keep])


class _KMeansPartial:
    """map_batches stage: batch → k-row (cluster, count, sum) partial."""

    def __init__(self, cent_bc: Broadcast, *, vec_col: str):
        self.C = cent_bc.get()
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(self.vec_col))
        a = assign_clusters(V, self.C)[0]
        k, d = self.C.shape
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, a, V)
        return pa.table({
            "c": pa.array(np.arange(k, dtype=np.int32)),
            "n": pa.array(cnt),
            "s": pa.FixedSizeListArray.from_arrays(
                pa.array(sums.ravel()), d),
        })


def assign_clusters(V: np.ndarray, C: np.ndarray):
    """(assignment, rounded distance) — direct squared differences,
    round-6 argmin, ties to the smallest cluster index (the exact rule
    the SQL mirror's row_number ORDER BY round(dist,6), c implements)."""
    dif = V[:, None, :] - C[None, :, :]
    dist = np.sqrt(np.einsum("nkd,nkd->nk", dif, dif))
    rd = _round6(dist)
    a = np.argmin(rd, axis=1)                    # first min = smallest c
    return a, rd[np.arange(len(V)), a]


def _kmeans_driver(ids: np.ndarray, V: np.ndarray, *, k: int,
                   n_iter: int, seed: int):
    """The identical quantized iteration on collected arrays (rule 13:
    per-iteration actor-pool spin-up cost SECONDS on FB15K-scale
    tables; the numpy kernel costs milliseconds).  Same init rank,
    same round-6 centroid update, same assignment rule."""
    h = mix64_vec(seed, KMEANS_SEED_TAG, ids)
    keep = np.lexsort((ids, h))[:k]
    C = _round6(np.asarray(V[keep], dtype=np.float64))
    for _ in range(n_iter):
        a = assign_clusters(V, C)[0]
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros_like(C)
        np.add.at(sums, a, V)
        nonempty = cnt > 0
        C = C.copy()
        C[nonempty] = _round6(sums[nonempty] / cnt[nonempty, None])
    a, dist = assign_clusters(V, C)
    out = pa.table({"vec_id": pa.array(ids),
                    "cluster": pa.array(a.astype(np.int64)),
                    "dist": pa.array(dist)})
    return out, C


def kmeans(ds, *, k: int = 8, n_iter: int = 4, seed: int = 628,
           id_col: str = "vec_id", vec_col: str = "embedding",
           driver_max: int = 200_000):
    """Embedding Dataset → (assignment Dataset [id, cluster, dist],
    final (k, d) centroid matrix).  Under ``driver_max`` rows the whole
    quantized iteration runs driver-side on the collected matrix
    (identical kernels; pass ``driver_max=0`` to force the pool path);
    the round-6 centroid quantization per iteration makes both paths —
    and the SQL mirror's unrolled CTEs — land on the same centroids."""
    import ray.data as rd

    ds = ds.materialize()
    if driver_max and ds.count() <= driver_max:
        tbls = ray.get(ds.to_arrow_refs())
        tbls = [t.select([id_col, vec_col]) for t in tbls if t.num_rows]
        t = pa.concat_tables(tbls)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        order = np.argsort(ids)
        V = list_col_matrix(t.column(vec_col))[order]
        out, C = _kmeans_driver(ids[order], V, k=k, n_iter=n_iter,
                                seed=seed)
        if id_col != "vec_id":
            out = out.rename_columns([id_col, "cluster", "dist"])
        return spread(rd.from_arrow(out)), C
    ds = spread(ds)
    C = seeded_init_centroids(ds, k=k, seed=seed, id_col=id_col,
                              vec_col=vec_col)
    for _ in range(n_iter):
        tbls = ray.get(ds.map_batches(
            _KMeansPartial,
            fn_constructor_kwargs={"cent_bc": Broadcast(C),
                                   "vec_col": vec_col},
            batch_format="pyarrow",
            concurrency=auto_pool(),
        ).to_arrow_refs())
        t = pa.concat_tables([x for x in tbls if x.num_rows] or tbls[:1])
        c = t.column("c").to_numpy()
        n = t.column("n").to_numpy()
        s = (t.column("s").combine_chunks().flatten().to_numpy()
             .reshape(-1, C.shape[1]))
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(cnt, c, n)
        sums = np.zeros_like(C)
        np.add.at(sums, c, s)
        nonempty = cnt > 0
        C = C.copy()
        C[nonempty] = _round6(sums[nonempty] / cnt[nonempty, None])

    cent_bc = Broadcast(C)

    def label(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col))
        a, dist = assign_clusters(V, cent_bc.get())
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(dist),
        })

    return ds.map_batches(label, batch_format="pyarrow"), C


def semantic_dedup(ds, centroids: np.ndarray, *, tau: float,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Within-cluster ε-ball dedup: a row is a duplicate iff some
    LOWER-id member of its k-means cluster has round(cosine, 6) ≥ tau;
    ``dup_of`` is the smallest such id (else -1).

    Pairwise work is confined to one cluster at a time (the SemDeDup
    contract: k bounds the ball size; raise k before raising cluster
    sizes).  Output: (id, cluster, dup_of).
    """
    cent_bc = Broadcast(centroids)

    def with_cluster(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col))
        a, _ = assign_clusters(V, cent_bc.get())
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            vec_col: t.column(vec_col),
        })

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[vec_col]])     # one cluster: small
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                            1e-12)
        cos = _round6(Vn @ Vn.T)
        hit = np.tril(cos >= tau, k=-1)          # lower-id neighbors only
        any_hit = hit.any(axis=1)
        first = np.argmax(hit, axis=1)           # smallest lower index
        ids = g[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids,
            "cluster": g["cluster"].to_numpy(),
            "dup_of": np.where(any_hit, ids[first], -1).astype(np.int64),
        })

    return (ds.map_batches(with_cluster, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_group, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (Gonzalez 1985; Sener & Savarese,
# ICLR 2018 "Core-Set") — the farthest-point data-selection primitive:
# pick k maximally-spread representatives, assign every vector to its
# nearest one.
# ---------------------------------------------------------------------------


def _kcenter_rule(dmin: np.ndarray, ids: np.ndarray) -> int:
    """Next center = argmax by (round-6 min-distance DESC, id ASC) —
    the quantized comparison both engines share."""
    return int(np.lexsort((ids, -dmin))[0])


def _kcenter_driver(ids: np.ndarray, V: np.ndarray, *, k: int):
    """The full greedy loop on collected arrays (rule 13 fast path).
    ``ids`` must be ascending.  Selected centers are rounded to 6 dp
    before any distance against them (the kmeans ``c0`` convention)."""
    sel = [int(ids[0])]
    C = [_round6(np.asarray(V[0], np.float64))]       # seed: min id
    dmin = _round6(np.sqrt(((V - C[0]) ** 2).sum(axis=1)))
    for _ in range(1, k):
        j = _kcenter_rule(dmin, ids)
        sel.append(int(ids[j]))
        C.append(_round6(np.asarray(V[j], np.float64)))
        d = _round6(np.sqrt(((V - C[-1]) ** 2).sum(axis=1)))
        dmin = np.minimum(dmin, d)
    Cm = np.stack(C)
    a, dist = assign_clusters(V, Cm)
    return Cm, sel, a, dist


def kcenter_greedy(ds, *, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   driver_max: int = 200_000) -> pd.DataFrame:
    """Greedy k-center over an embedding Dataset → per-vector
    (id, center ordinal, round-6 distance, is_center flag).

    Seed center = the minimum-id vector; each round adds the vector
    maximizing its round-6 distance to the nearest selected center
    (ties → smallest id).  Every comparison is quantized at 6 dp, so
    the DuckDB mirror's unrolled rounds select the identical centers.

    Scale shape: the greedy loop is k STATELESS passes — each round is
    one ``map_batches`` against the broadcast (r, d) center matrix
    returning a 1-row per-batch partial argmax (no per-vector state
    lives anywhere), then a tiny driver merge; the final labeling pass
    streams.  Under ``driver_max`` rows the identical kernels run on
    the collected matrix (rule 13 — k actor-pool rounds cost seconds
    on FB15K-scale tables, the numpy loop costs milliseconds)."""
    import ray.data as rd

    ds = ds.materialize()
    if driver_max and ds.count() <= driver_max:
        tbls = ray.get(ds.to_arrow_refs())
        tbls = [t.select([id_col, vec_col]) for t in tbls if t.num_rows]
        t = pa.concat_tables(tbls)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        V = list_col_matrix(t.column(vec_col))[order].astype(np.float64)
        Cm, sel, a, dist = _kcenter_driver(ids, V, k=k)
    else:
        ds = spread(ds)

        def seed_part(t: pa.Table) -> pa.Table:
            idv = t.column(id_col).to_numpy().astype(np.int64)
            j = int(np.argmin(idv))
            return pa.table({id_col: pa.array(idv[j:j + 1]),
                             vec_col: t.column(vec_col).take([j])})

        tb = pa.concat_tables(
            [x for x in ray.get(ds.map_batches(
                seed_part, batch_format="pyarrow").to_arrow_refs())
             if x.num_rows])
        sids = tb.column(id_col).to_numpy().astype(np.int64)
        j0 = int(np.argmin(sids))
        sel = [int(sids[j0])]
        C = [_round6(list_col_matrix(tb.column(vec_col))[j0]
                     .astype(np.float64))]
        for _ in range(1, k):
            cb = Broadcast(np.stack(C))

            def far_part(t: pa.Table, cb=cb) -> pa.Table:
                idv = t.column(id_col).to_numpy().astype(np.int64)
                Vb = list_col_matrix(t.column(vec_col)) \
                    .astype(np.float64)
                Cc = cb.get()
                dif = Vb[:, None, :] - Cc[None, :, :]
                dm = _round6(np.sqrt(
                    np.einsum("nkd,nkd->nk", dif, dif))).min(axis=1)
                j = _kcenter_rule(dm, idv)
                return pa.table({
                    id_col: pa.array(idv[j:j + 1]),
                    "__dmin": pa.array(dm[j:j + 1]),
                    vec_col: t.column(vec_col).take([j])})

            tb = pa.concat_tables(
                [x for x in ray.get(ds.map_batches(
                    far_part, batch_format="pyarrow").to_arrow_refs())
                 if x.num_rows])
            pid = tb.column(id_col).to_numpy().astype(np.int64)
            pdm = tb.column("__dmin").to_numpy()
            j = _kcenter_rule(pdm, pid)
            sel.append(int(pid[j]))
            C.append(_round6(list_col_matrix(tb.column(vec_col))[j]
                             .astype(np.float64)))
        Cm = np.stack(C)
        cent_bc = Broadcast(Cm)

        def label(t: pa.Table) -> pa.Table:
            Vb = list_col_matrix(t.column(vec_col)).astype(np.float64)
            a, dist = assign_clusters(Vb, cent_bc.get())
            return pa.table({
                id_col: t.column(id_col).cast(pa.int64()),
                "center": pa.array(a.astype(np.int64)),
                "dist": pa.array(dist)})

        lab = ds.map_batches(label, batch_format="pyarrow").to_pandas() \
            .sort_values(id_col).reset_index(drop=True)
        ids = lab[id_col].to_numpy()
        a = lab["center"].to_numpy()
        dist = lab["dist"].to_numpy()
    is_center = np.isin(ids, np.asarray(sel, np.int64)).astype(np.int64)
    return pd.DataFrame({
        id_col: ids.astype(np.int64),
        "center": a.astype(np.int64),
        "dist": dist.astype(np.float64),
        "is_center": is_center,
    })


# ---------------------------------------------------------------------------
# Product quantization (the IVF-PQ scale path's encoding half)
# ---------------------------------------------------------------------------

def _pq_fit(ds, *, m: int, k: int, n_iter: int, seed: int,
            id_col: str, vec_col: str):
    """(codes Dataset, per-subspace round-6 codebooks, subspace dim)."""
    from ..functions.joins import hash_join

    ds = ds.materialize()
    first = ds.take(1)[0][vec_col]
    dim = len(first)
    d = dim // m

    out, cents = None, []
    for j in range(m):
        lo, hi = j * d, (j + 1) * d

        def slice_b(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            V = list_col_matrix(t.column(vec_col)).astype(np.float64)
            sub = np.ascontiguousarray(V[:, lo:hi])
            return pa.table({
                id_col: t.column(id_col),
                vec_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(sub.reshape(-1), type=pa.float64()),
                    hi - lo)})

        sub_ds = ds.map_batches(slice_b, batch_format="pyarrow")
        asg, C = kmeans(sub_ds, k=k, n_iter=n_iter, seed=seed,
                        id_col=id_col, vec_col=vec_col)
        cents.append(C)

        def tag(t: pa.Table, j=j) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col),
                f"c{j}": t.column("cluster"),
                f"d{j}": t.column("dist")})

        tagged = asg.map_batches(tag, batch_format="pyarrow")
        out = tagged if out is None else \
            hash_join(out, tagged, on=id_col)
    return out, cents, d


def pq_codes(ds, *, m: int = 2, k: int = 4, n_iter: int = 2,
             seed: int = 628, id_col: str = "vec_id",
             vec_col: str = "embedding"):
    """Product-quantization codes (Jégou et al., TPAMI 2011): split each
    vector into ``m`` contiguous subspaces, run the quantized-iteration
    k-means per subspace (same 6-dp-rounded Lloyd loop as
    :func:`kmeans`, so the SQL mirror reproduces every assignment
    exactly), emit per-vector (c_j, dist_j) codes joined on the id.

    The per-subspace codebooks are k·(d/m) floats — broadcast-sized at
    any scale; the join is the repo's bucketed hash_join, so nothing
    but (id, code, dist) rows shuffle.  Returns a Dataset with columns
    (id, c0, d0, ..., c{m-1}, d{m-1}).
    """
    out, _cents, _d = _pq_fit(ds, m=m, k=k, n_iter=n_iter, seed=seed,
                              id_col=id_col, vec_col=vec_col)
    return out


def pq_adc_topk(ds, query: np.ndarray, *, k_top: int = 10, m: int = 2,
                k: int = 4, n_iter: int = 2, seed: int = 628,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half
    of IVF-PQ: the query is compared to each CODEBOOK entry once
    (m·k rounded subspace distances, a lookup table of a few floats),
    then every vector's approximate distance is the fixed-order sum of
    its codes' table entries.  Only (id, code) rows stream; per-batch
    partial top-k, ≤ k_top rows per block reach the driver merge.

    adc = round6(Σ_j dq_j[c_j]²) with dq_j = round6(‖q_j − C_j[c]‖) —
    every float in the chain is quantized, so the SQL mirror ranks
    identically."""
    codes, cents, d = _pq_fit(ds, m=m, k=k, n_iter=n_iter, seed=seed,
                              id_col=id_col, vec_col=vec_col)
    return adc_rank(codes, cents, np.asarray(query, np.float64), d,
                    m=m, k_top=k_top, id_col=id_col)


def adc_rank(codes_ds, cents: list, q: np.ndarray, d: int, *, m: int,
             k_top: int, id_col: str = "vec_id",
             keep_codes: bool = True) -> pd.DataFrame:
    """Rank a codes Dataset by ADC vs the query's rounded codebook
    distance tables (fixed-order float chain; per-batch partial top-k)."""
    dq = [_round6(np.sqrt(((cents[j] - q[j * d:(j + 1) * d]) ** 2)
                          .sum(axis=1))) for j in range(m)]

    def adc_part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        acc = np.zeros(len(ids), np.float64)
        for j in range(m):              # fixed order → SQL parity
            cj = t.column(f"c{j}").to_numpy().astype(np.int64)
            acc = acc + dq[j][cj] ** 2
        adc = _round6(acc)
        order = np.lexsort((ids, adc))[:k_top]
        cols = {id_col: pa.array(ids[order])}
        if keep_codes:
            for j in range(m):
                cols[f"c{j}"] = pa.array(
                    t.column(f"c{j}").to_numpy().astype(np.int64)[order])
        cols["adc"] = pa.array(adc[order], pa.float64())
        return pa.table(cols)

    parts = codes_ds.map_batches(adc_part, batch_format="pyarrow") \
        .to_pandas()
    out = parts.sort_values(["adc", id_col]).head(k_top)
    cast = {id_col: np.int64}
    if keep_codes:
        cast.update({f"c{j}": np.int64 for j in range(m)})
    return out.astype(cast).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Two-level residual quantization (Chen, Guan & Wang 2010; the RVQ
# family IVF-PQ's additive cousin) — quantize, then quantize what the
# first codebook missed.
# ---------------------------------------------------------------------------

def residual_quant(ds, *, k: int = 4, n_iter: int = 2, seed: int = 628,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pd.DataFrame:
    """Level-1 k-means over the vectors, level-2 k-means over the
    residuals v − C1[c1]; returns (id, c1, d1, c2, rq_err) where
    rq_err is the level-2 rounded distance = ‖v − C1[c1] − C2[c2]‖.

    Both levels run the quantized-iteration Lloyd loop of
    :func:`kmeans` (round-6 centroids, round-6 assignment), and the
    residual itself is an exact IEEE subtraction against the ROUNDED
    level-1 centroid — so the SQL twin (the same unrolled CTE chain,
    re-targeted at a residual CTE) reproduces every code.  The
    residual pass is one stateless map_batches against the broadcast
    level-1 centroids; nothing but (id, code, dist) rows shuffle."""
    import ray.data as rd

    from ..functions.joins import hash_join

    ds = ds.materialize()
    asg1, C1 = kmeans(ds, k=k, n_iter=n_iter, seed=seed,
                      id_col=id_col, vec_col=vec_col)
    c1_bc = Broadcast(C1)

    def resid(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col)).astype(np.float64)
        a, _ = assign_clusters(V, c1_bc.get())
        R = V - c1_bc.get()[a]
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            vec_col: pa.FixedSizeListArray.from_arrays(
                pa.array(R.reshape(-1), type=pa.float64()),
                R.shape[1])})

    resid_ds = ds.map_batches(resid, batch_format="pyarrow")
    asg2, _C2 = kmeans(resid_ds, k=k, n_iter=n_iter, seed=seed,
                       id_col=id_col, vec_col=vec_col)

    def tag1(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "c1": t.column("cluster").cast(pa.int64()),
                         "d1": t.column("dist")})

    def tag2(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "c2": t.column("cluster").cast(pa.int64()),
                         "rq_err": t.column("dist")})

    j = hash_join(asg1.map_batches(tag1, batch_format="pyarrow"),
                  asg2.map_batches(tag2, batch_format="pyarrow"),
                  on=id_col)
    out = j.to_pandas().sort_values(id_col).reset_index(drop=True)
    return out.astype({id_col: np.int64, "c1": np.int64,
                       "c2": np.int64})


# ---------------------------------------------------------------------------
# Top principal component by quantized power iteration — the spectral
# diagnostic of an embedding column (anisotropy / dominant-direction
# checks before ANN or clustering).
# ---------------------------------------------------------------------------

def power_iteration_pc1(ds, *, n_iter: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> pd.DataFrame:
    """First principal component via max-normalized power iteration on
    the centered covariance, projections per vector.

    Quantization contract (the kg_hits/kmeans recipe): the per-dim mean
    and every covariance entry are ROUNDED to 6 dp, each iterate is
    normalized by max|y| (a selection, summation-order independent)
    and rounded to 6 dp — so the SQL twin's unrolled iterations land on
    the identical vector, and the final projection round(Σ c_d·x_d, 6)
    matches despite dot-product order drift (~1e-15 ≪ the quantum).

    Distributed shape: two combiner passes (per-batch dim sums, then
    per-batch CᵀC partials — d and d×d numbers per block, independent
    of n); the d×d iteration is driver-side (d = 64); the projection
    pass streams against the broadcast component."""
    ds = ds.materialize()

    def sum_part(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col)).astype(np.float64)
        return pa.table({
            "n": pa.array([np.int64(len(V))]),
            "s": pa.FixedSizeListArray.from_arrays(
                pa.array(V.sum(axis=0).ravel()), V.shape[1])})

    parts = pa.concat_tables(
        [x for x in ray.get(ds.map_batches(
            sum_part, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    n = int(parts.column("n").to_numpy().sum())
    d = len(parts.column("s")[0])
    sums = (parts.column("s").combine_chunks().flatten().to_numpy()
            .reshape(-1, d)).sum(axis=0)
    mean = _round6(sums / n)
    mean_bc = Broadcast(mean)

    def cov_part(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col)).astype(np.float64)
        C = V - mean_bc.get()
        acc = C.T @ C
        return pa.table({"g": pa.FixedSizeListArray.from_arrays(
            pa.array(acc.ravel()), d * d)})

    gparts = pa.concat_tables(
        [x for x in ray.get(ds.map_batches(
            cov_part, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    acc = (gparts.column("g").combine_chunks().flatten().to_numpy()
           .reshape(-1, d * d)).sum(axis=0).reshape(d, d)
    cov = _round6(acc / n)

    x = np.ones(d, np.float64)
    for _ in range(n_iter):
        y = cov @ x
        mx = np.abs(y).max()
        if mx == 0.0:
            break
        x = _round6(y / mx)
    x_bc = Broadcast((mean, x))

    def project(t: pa.Table) -> pa.Table:
        m, xv = x_bc.get()
        V = list_col_matrix(t.column(vec_col)).astype(np.float64)
        p = _round6((V - m) @ xv)
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         "proj": pa.array(p, pa.float64())})

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return out.astype({id_col: np.int64}) \
        .sort_values(id_col).reset_index(drop=True)


def spherical_kmeans(ds, *, k: int = 8, n_iter: int = 4,
                     seed: int = 628, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     driver_max: int = 200_000):
    """Cosine (spherical) k-means: L2-normalize every vector in one
    stateless pass, then run the standard quantized-iteration
    :func:`kmeans` — on the unit sphere, Euclidean argmin ≡ cosine
    argmax, so the whole round-6 mirror machinery carries over
    unchanged (the SQL twin normalizes inside the kmeans CTE chain's
    ``vexpr``).  Returns the assignment Dataset and centroids."""

    def norm_b(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column(vec_col)).astype(np.float64)
        n = np.maximum(np.sqrt((V ** 2).sum(axis=1)), 1e-12)
        U = V / n[:, None]
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            vec_col: pa.FixedSizeListArray.from_arrays(
                pa.array(U.reshape(-1), type=pa.float64()),
                U.shape[1])})

    nds = ds.map_batches(norm_b, batch_format="pyarrow")
    return kmeans(nds, k=k, n_iter=n_iter, seed=seed, id_col=id_col,
                  vec_col=vec_col, driver_max=driver_max)


def cluster_stability_ari(ds, *, k: int = 8, n_iter: int = 4,
                          seed_a: int = 628, seed_b: int = 629,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> pd.DataFrame:
    """Clustering-stability audit: the Adjusted Rand Index between two
    k-means runs that differ ONLY in their init seed — near-1 means the
    structure is real, near-0 means the clusters are init artifacts
    (the standard pre-SemDeDup sanity check).

    Both runs are the quantized-iteration :func:`kmeans`; the
    contingency counts and all three pair sums are exact integers, and
    the final ARI is one fixed-order float expression rounded at 6 dp
    (identical in the SQL twin's two tagged CTE chains).  Output: one
    row (k, n, sum_comb, sum_a, sum_b, ari)."""
    from ..functions.joins import hash_join

    ds = ds.materialize()
    asg_a, _ = kmeans(ds, k=k, n_iter=n_iter, seed=seed_a,
                      id_col=id_col, vec_col=vec_col)
    asg_b, _ = kmeans(ds, k=k, n_iter=n_iter, seed=seed_b,
                      id_col=id_col, vec_col=vec_col)

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                             name: t.column("cluster").cast(pa.int64())})
        return fn

    j = hash_join(asg_a.map_batches(tag("ca"), batch_format="pyarrow"),
                  asg_b.map_batches(tag("cb"), batch_format="pyarrow"),
                  on=id_col).to_pandas()
    ca = j["ca"].to_numpy(np.int64)
    cb = j["cb"].to_numpy(np.int64)
    n = len(j)
    nij = np.zeros((k, k), np.int64)
    np.add.at(nij, (ca, cb), 1)
    ai = nij.sum(axis=1)
    bj = nij.sum(axis=0)

    def comb2(x):
        return int((x.astype(np.int64) * (x - 1) // 2).sum())

    sum_comb = comb2(nij.ravel())
    sum_a, sum_b = comb2(ai), comb2(bj)
    cn = n * (n - 1) // 2
    exp = (float(sum_a) * float(sum_b)) / float(cn) if cn else 0.0
    denom = 0.5 * (sum_a + sum_b) - exp
    ari = round((sum_comb - exp) / denom, 6) if denom != 0 else 1.0
    return pd.DataFrame([{
        "k": np.int64(k), "n": np.int64(n),
        "sum_comb": np.int64(sum_comb), "sum_a": np.int64(sum_a),
        "sum_b": np.int64(sum_b), "ari": ari}])
