"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (queries are ``ray.put`` once; each batch computes
``batch_vecs @ queries.T`` and keeps per-query partial top-k; partials merge
in one tiny reduce).  Scale path: IVF — a seeded k-means coarse quantizer
assigns each vector to a centroid bucket; queries probe the ``n_probe``
nearest buckets only.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast, auto_pool


def _l2norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list<float> / fixed_size_list column → (n, k) matrix without a
    per-row Python loop (``to_pylist`` + ``np.stack`` is a silent row loop —
    CLAUDE.md rule 10).  Requires equal-length, null-free lists."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        k = arr.type.list_size
    elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        widths = np.diff(arr.offsets.to_numpy())
        k = int(widths[0])
        if not (widths == k).all():
            raise ValueError("ragged list column cannot form a matrix")
    else:
        # Ray's ArrowTensorArray (and kin): to_numpy gives (n, k) directly
        m = arr.to_numpy(zero_copy_only=False)
        if m.dtype == object:           # last resort: per-row objects
            m = np.stack([np.asarray(v, dtype=dtype) for v in m])
        return np.ascontiguousarray(np.asarray(m, dtype=dtype))
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(len(arr), k).astype(dtype))


class BruteTopK:
    """map_batches stage: per-batch cosine partial top-k per query.

    ``dims`` truncates both sides to the first ``dims`` coordinates
    before normalizing — the Matryoshka-representation search mode
    (Kusupati et al., NeurIPS 2022): shorter prefixes trade recall for
    memory/FLOPs; :func:`matryoshka_recall` audits that trade."""

    def __init__(self, queries_bc: Broadcast, *, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dims: int | None = None):
        q = np.asarray(queries_bc.get(), dtype=np.float64)
        if dims:
            q = q[:, :dims]
        self.q = _l2norm(q)  # (nq, d)
        self.k = k
        self.dims = dims
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_col_matrix(batch.column(self.vec_col))
        if self.dims:
            vecs = vecs[:, :self.dims]
        ids = batch.column(self.id_col).to_numpy()
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = _l2norm(vecs) @ self.q.T  # (n, nq)
        k = min(self.k, len(ids))
        nq = self.q.shape[0]
        # per-batch partial top-k for ALL queries in one argpartition
        top = np.argpartition(-sims, k - 1, axis=0)[:k]      # (k, nq)
        qi = np.broadcast_to(np.arange(nq, dtype=np.int32), (k, nq))
        return pa.table(
            {
                "query_id": pa.array(qi.ravel(order="F"), pa.int32()),
                "vec_id": pa.array(ids[top.ravel(order="F")].astype(np.int64),
                                   pa.int64()),
                "cosine": pa.array(
                    np.take_along_axis(sims, top, axis=0).ravel(order="F"),
                    pa.float64()),
            }
        )


def merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final reduce of per-batch partial top-k rows (tiny driver-side table).

    Deterministic tie-break: (-cosine, vec_id).
    """
    out = []
    for qid, g in partials.groupby("query_id"):
        rows = sorted(
            zip(g["cosine"], g["vec_id"]), key=lambda t: (-t[0], t[1])
        )[:k]
        for sim, vid in rows:
            out.append((int(qid), int(vid), float(sim)))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])


def brute_topk(ds, queries: np.ndarray, k: int, **stage_kw) -> pd.DataFrame:
    """End-to-end brute-force cosine top-k (small final result → pandas)."""
    bc = Broadcast(queries)
    partials = ds.map_batches(
        BruteTopK,
        fn_constructor_kwargs={"queries_bc": bc, "k": k, **stage_kw},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=auto_pool(0.5),
    ).to_pandas()
    return merge_topk(partials, k)


def range_search(ds, queries: np.ndarray, query_ids, radius: float, *,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> pd.DataFrame:
    """Radius (range) cosine search — ALL corpus vectors within
    ``radius`` of each query, the bounded-neighborhood twin of
    :func:`brute_topk` (top-k fixes the count, range fixes the
    similarity floor; dedup-audit and recall tooling needs both).

    Per batch: one normalized GEMM against the broadcast query matrix,
    cosines rounded 6 dp BEFORE the threshold compare (the house
    cross-engine rule — the SQL twin thresholds
    round(list_cosine_similarity(...), 6) on ::DOUBLE[] casts), self
    matches excluded.  Output is match-domain sized; the corpus
    streams."""
    qn = np.asarray(queries, dtype=np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    bc = Broadcast((qn, np.asarray(query_ids, dtype=np.int64)))

    def part(t: pa.Table) -> pa.Table:
        Q, qids = bc.get()
        X = list_col_matrix(t.column(vec_col))
        ids = t.column(id_col).to_numpy().astype(np.int64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = np.round(Xn @ Q.T, 6)                    # (n, q)
        ri, qi = np.nonzero((cos >= radius)
                            & (ids[:, None] != qids[None, :]))
        return pa.table({
            "query_id": pa.array(qids[qi]),
            id_col: pa.array(ids[ri]),
            "cosine": pa.array(cos[ri, qi])})

    out = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    return out.astype({"query_id": np.int64, id_col: np.int64}) \
        .sort_values(["query_id", id_col], ignore_index=True)


# ---------------------------------------------------------------------------
# IVF (scale path): seeded k-means buckets + probe-limited search
# ---------------------------------------------------------------------------

def _sample_matrix(ds, sample_size: int, vec_col: str) -> np.ndarray:
    """First ``sample_size`` vectors as an (n, d) matrix — Arrow collect +
    ``list_col_matrix`` (a pandas round-trip makes object arrays of lists,
    CLAUDE.md rule 10)."""
    import ray as _ray

    tbls = _ray.get(ds.limit(sample_size).to_arrow_refs())
    col = pa.concat_tables(
        [t.select([vec_col]) for t in tbls if t.num_rows]).column(vec_col)
    return list_col_matrix(col)


def kmeans_fit(sample: np.ndarray, n_centroids: int, *, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Tiny seeded k-means on a driver-side sample (coarse quantizer)."""
    rng = np.random.default_rng(seed)
    x = _l2norm(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    cents = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = x[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def hash_centroids(ds, n_centroids: int, *, salt: int = 17,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: the (normalized) vectors of the
    ``n_centroids`` ids with the smallest ``(mix64(salt, id), id)`` — a
    uniform hash-order sample with NO RNG state and no Lloyd iterations,
    so the whole IVF search is an exact pure function of the table
    (SQL-expressible; see the ``embeddings_ivf_topk`` oracle mirror).

    Computed as a per-batch partial bottom-k + tiny driver merge: only
    ``n_centroids × n_blocks`` candidate rows ever reach the driver.
    """
    from ..sources.pages import mix64_vec

    def bottom(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        key = mix64_vec(salt, ids)
        n = min(n_centroids, len(ids))
        sel = np.lexsort((ids, key))[:n]
        return pa.table({
            "hkey": pa.array(key[sel], pa.uint64()),
            id_col: pa.array(ids[sel], pa.int64()),
            vec_col: batch.column(vec_col).take(pa.array(sel)),
        })

    # Arrow collect — the candidate table is ≤ n_centroids × n_blocks rows
    import ray as _ray

    tbls = _ray.get(
        ds.map_batches(bottom, batch_format="pyarrow").to_arrow_refs())
    cand = pa.concat_tables([t for t in tbls if t.num_rows])
    sel = np.lexsort((cand.column(id_col).to_numpy(),
                      cand.column("hkey").to_numpy()))[:n_centroids]
    vecs = list_col_matrix(cand.column(vec_col).take(pa.array(sel)))
    return _l2norm(vecs)


class IVFAssign:
    """map_batches stage: tag each vector with its centroid bucket."""

    def __init__(self, cents_bc: Broadcast, *, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.cents = np.asarray(cents_bc.get(), dtype=np.float64)
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _l2norm(list_col_matrix(batch.column(self.vec_col)))
        bucket = np.argmax(vecs @ self.cents.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket))


def ivf_topk(ds, queries: np.ndarray, k: int, *, n_centroids: int = 16,
             n_probe: int = 4, sample_size: int = 2048, seed: int = 13,
             centroid_mode: str = "kmeans",
             id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """IVF ANN: assign buckets, search only the n_probe closest buckets.

    The bucket filter is a vectorized map_batches predicate (no shuffle);
    at real scale the assignment is written once as a partitioned parquet
    and queries read only their probed partitions.

    ``centroid_mode="hash"`` uses :func:`hash_centroids` (hash-order
    sample, no Lloyd) — slightly worse buckets, but the result is an
    exact deterministic function of the table and mirrorable in SQL.
    """
    if centroid_mode == "hash":
        ds = ds.materialize()   # consumed twice: centroid scan + search
        cents = hash_centroids(ds, n_centroids, id_col=id_col,
                               vec_col=vec_col)
    else:
        cents = kmeans_fit(_sample_matrix(ds, sample_size, vec_col),
                           n_centroids, seed=seed)
    q = _l2norm(np.asarray(queries, dtype=np.float64))
    # stable: centroid index breaks cosine ties, matching the SQL mirror's
    # (sim DESC, cent_rank ASC) and np.argmax's first-max rule
    probe = np.argsort(-(q @ cents.T), axis=1, kind="stable")[:, :n_probe]
    allowed = np.unique(probe)

    cents_bc = Broadcast(cents)
    tagged = ds.map_batches(
        IVFAssign,
        fn_constructor_kwargs={"cents_bc": cents_bc, "id_col": id_col,
                               "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2),
    )

    allowed_set = set(int(x) for x in allowed)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column("bucket"),
                        value_set=pa.array(sorted(allowed_set), pa.int32()))
        return batch.filter(mask)

    filtered = tagged.map_batches(keep, batch_format="pyarrow")
    res = brute_topk(filtered, queries, k, id_col=id_col, vec_col=vec_col)
    # mask out results from buckets a given query did not probe? brute_topk
    # already searched only filtered rows; per-query probe masks differ, but
    # searching a superset only improves recall — acceptable for ANN.
    return res


# ---------------------------------------------------------------------------
# IVF index on storage: bucket-partitioned parquet, probe-pruned reads
# ---------------------------------------------------------------------------

def ivf_build_partitioned(ds, out_dir: str, *, n_centroids: int = 16,
                          sample_size: int = 2048, seed: int = 13,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> np.ndarray:
    """Write the IVF index to storage: vectors as parquet partitioned by
    centroid bucket (``out_dir/bucket=<b>/``) + the centroid matrix.

    This is the 100-TB shape of :func:`ivf_topk`: assignment runs once,
    and a query session reads ONLY its probed buckets from storage (a
    1/(n_centroids/n_probe) read instead of a full scan).  Buckets are
    also the resume unit — each partition directory is complete or
    rewritten whole.
    """
    sample = _sample_matrix(ds, sample_size, vec_col)
    cents = kmeans_fit(sample, n_centroids, seed=seed)
    cents_bc = Broadcast(cents)
    tagged = ds.map_batches(
        IVFAssign,
        fn_constructor_kwargs={"cents_bc": cents_bc, "id_col": id_col,
                               "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2),
    )
    tagged.write_parquet(out_dir, partition_cols=["bucket"])
    np.save(f"{out_dir.rstrip('/')}/centroids.npy", cents)
    return cents


def ivf_topk_partitioned(out_dir: str, queries: np.ndarray, k: int, *,
                         n_probe: int = 4, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> pd.DataFrame:
    """Query a stored IVF index: read only the probed bucket partitions
    (partition pruning at the file level), then brute top-k over them.
    Same result as :func:`ivf_topk` for identical centroids/probes."""
    import os

    import ray.data as rd

    cents = np.load(f"{out_dir.rstrip('/')}/centroids.npy")
    q = _l2norm(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    import glob

    files: list[str] = []
    for b in np.unique(probe):
        d = f"{out_dir.rstrip('/')}/bucket={int(b)}"
        if os.path.isdir(d):                 # empty buckets absent
            files.extend(sorted(glob.glob(f"{d}/*.parquet")))
    ds = rd.read_parquet(files)
    return brute_topk(ds, queries, k, id_col=id_col, vec_col=vec_col)


# --- JL sign random projection (dimensionality reduction) ------------------

RP_SEED = 211


def random_projection(ds, *, k: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding", seed: int = RP_SEED):
    """Achlioptas/JL sign random projection: ``y = X @ S / sqrt(k)`` with
    ``S[d, j] = +1 if mix64(seed, d, j) % 2 == 0 else -1``.

    The projection matrix is a pure function of (seed, d, j), so nothing
    is broadcast or shipped — every task rebuilds the (d, k) sign matrix
    from the stream of mix64 draws (d·k calls, microseconds) and the
    whole op stays a stateless zero-copy ``map_batches``.  This is the
    scale-path precursor to clustering / semantic dedup on very wide
    embeddings: project once, run k-means / SemDeDup in the k-dim space.

    Output: ``(id_col, p0..p{k-1})`` float64, unrounded.
    """
    from ..sources.pages import mix64_vec

    sign_cache: dict[int, np.ndarray] = {}

    def signs(d: int) -> np.ndarray:
        s = sign_cache.get(d)
        if s is None:
            dg = np.arange(d, dtype=np.int64)[:, None]
            jg = np.arange(k, dtype=np.int64)[None, :]
            s = np.where(mix64_vec(seed, dg, jg) % np.uint64(2) == 0,
                         1.0, -1.0)
            sign_cache[d] = s
        return s

    scale = 1.0 / np.sqrt(float(k))

    def project(batch: pa.Table) -> pa.Table:
        x = list_col_matrix(batch.column(vec_col), np.float64)
        y = (x @ signs(x.shape[1])) * scale if x.shape[0] else \
            np.empty((0, k))
        cols = {id_col: batch.column(id_col)}
        for j in range(k):
            cols[f"p{j}"] = pa.array(y[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def ivfpq_topk(ds, query: np.ndarray, *, k_top: int = 10,
               n_centroids: int = 16, n_probe: int = 4, salt: int = 17,
               m: int = 2, k: int = 4, n_iter: int = 2, seed: int = 628,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> "pd.DataFrame":
    """IVF-PQ: the full scale-path ANN composition — hash-centroid IVF
    picks the ``n_probe`` coarse partitions (cosine, exact deterministic
    function of the table), then only the PROBED vectors' PQ codes are
    ranked by ADC against the query's rounded codebook distance tables.

    Everything heavy streams: the coarse assignment is a broadcast-
    centroid map_batches, the probe filter drops rows to (id) signature
    rows, the PQ codes attach via the bucketed hash_join, and the ADC
    rank is a per-batch partial top-k.  At real scale the assignment is
    the partitioned-parquet layout of ivf_build_partitioned and the
    codes ride in the same files.
    """
    from .cluster import _pq_fit, adc_rank

    ds = ds.materialize()
    codes, cbooks, d_sub = _pq_fit(ds, m=m, k=k, n_iter=n_iter,
                                   seed=seed, id_col=id_col,
                                   vec_col=vec_col)
    cents = hash_centroids(ds, n_centroids, salt=salt, id_col=id_col,
                           vec_col=vec_col)
    q = np.asarray(query, dtype=np.float64)
    qn = _l2norm(q[None, :])
    probe = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[0, :n_probe]
    allowed = np.unique(probe)

    tagged = ds.map_batches(
        IVFAssign,
        fn_constructor_kwargs={"cents_bc": Broadcast(cents),
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2))

    def keep_ids(t: pa.Table) -> pa.Table:
        mask = np.isin(t.column("bucket").to_numpy(), allowed)
        return pa.table({id_col: pa.array(
            t.column(id_col).to_numpy().astype(np.int64)[mask])})

    probed = tagged.map_batches(keep_ids, batch_format="pyarrow")
    from ..functions.joins import hash_join

    joined = hash_join(probed, codes, on=id_col)
    return adc_rank(joined, cbooks, q, d_sub, m=m, k_top=k_top,
                    id_col=id_col, keep_codes=False)


# ---------------------------------------------------------------------------
# kNN graph + mutual-kNN clustering
# ---------------------------------------------------------------------------

def _collect_id_matrix(ds, id_col: str, vec_col: str):
    """Full (ids, matrix) collect via Arrow refs (rule 10: never through
    pandas), sorted by id so stable argsort tie-breaks on neighbor id."""
    import ray as _ray

    tbls = _ray.get(ds.to_arrow_refs())
    tbls = [t.select([id_col, vec_col]) for t in tbls if t.num_rows]
    t = pa.concat_tables(tbls)
    ids = t.column(id_col).to_numpy().astype(np.int64)
    mat = list_col_matrix(t.column(vec_col))
    order = np.argsort(ids)
    return ids[order], mat[order]


class _KnnBatch:
    """Per-batch rows × broadcast corpus matmul → top-k neighbor rows.

    Ranks (and the k-selection) use the 6-dp-ROUNDED cosine with
    ascending-neighbor tie-break — the quantize-the-comparison
    convention, so the SQL row_number ranks identically."""

    def __init__(self, corpus_bc: Broadcast, *, k: int, id_col: str,
                 vec_col: str):
        ids, mat = corpus_bc.get()
        self.ids, self.mat = ids, _l2norm(mat)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_col_matrix(batch.column(self.vec_col))
        bids = batch.column(self.id_col).to_numpy().astype(np.int64)
        if len(bids) == 0 or len(self.ids) < 2:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64())})
        sims = np.round(_l2norm(vecs) @ self.mat.T, 6)   # (b, N)
        sims[bids[:, None] == self.ids[None, :]] = -np.inf   # mask self
        k = min(self.k, len(self.ids) - 1)
        # stable argsort on -cos6: ties fall back to ascending column
        # index == ascending neighbor id (corpus sorted by id)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        rows = np.repeat(bids, k)
        nbr = self.ids[top.ravel()]
        cs = np.take_along_axis(sims, top, axis=1).ravel()
        rank = np.tile(np.arange(1, k + 1, dtype=np.int64), len(bids))
        return pa.table({"vec_id": pa.array(rows),
                         "nbr_id": pa.array(nbr),
                         "cosine": pa.array(cs, pa.float64()),
                         "rank": pa.array(rank)})


def knn_graph(emb_ds, *, k: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding", concurrency=None):
    """Top-``k`` cosine neighbors per vector → Dataset of (vec_id,
    nbr_id, cosine, rank) rows.

    Baseline shape: corpus matrix broadcast once, one matmul per batch —
    exact, O(N²/batch) work that streams.  At the scale where the
    corpus outgrows a node's object store, the IVF path (`ivf_topk`)
    bounds each probe to its coarse cells; the graph layout
    (vec-sorted neighbor rows) is identical."""
    from ..context import auto_pool

    bc = Broadcast(_collect_id_matrix(emb_ds, id_col, vec_col))
    return emb_ds.map_batches(
        _KnnBatch, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency or auto_pool(0.5),
        fn_constructor_kwargs={"corpus_bc": bc, "k": k,
                               "id_col": id_col, "vec_col": vec_col})


def _components_min_label(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Union-find components of (a, b) edges, labeled by the min node id
    — the same unique partition the distributed min-label propagation
    (and its recursive-CTE mirror) converges to."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    parent = np.arange(len(nodes))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for x, y in zip(ai.tolist(), bi.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.fromiter((find(i) for i in range(len(nodes))),
                        dtype=np.int64, count=len(nodes))
    # label = min node id per root; roots are min-index already, and
    # nodes is sorted, so nodes[root] IS the min id of the component
    return pd.DataFrame({"node": nodes.astype(np.int64),
                         "component": nodes[roots].astype(np.int64)})


def mutual_knn_clusters(emb_ds, *, k: int = 5, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        driver_max: int = 2_000_000) -> pd.DataFrame:
    """Connected components of the MUTUAL kNN graph (edge kept iff each
    endpoint is in the other's top-k) — the classic density-robust
    clustering of an embedding corpus.  kNN rows are the small side
    (N·k signature rows); the mutual check is one self-merge.  Under
    ``driver_max`` edges the union-find runs driver-side (rule 13: the
    mutual-kNN graph has long thin chains, so round-per-hop label
    propagation costs Dataset rounds for a millisecond kernel); above
    it, the distributed min-label propagation takes over — both land on
    the identical unique partition with min-id labels."""
    import ray.data as rd

    from ..context import spread
    from .dedup import cluster_pairs_min_label

    kn = knn_graph(emb_ds, k=k, id_col=id_col, vec_col=vec_col) \
        .to_pandas()[["vec_id", "nbr_id"]]
    rev = kn.rename(columns={"vec_id": "nbr_id", "nbr_id": "vec_id"})
    mutual = kn.merge(rev, on=["vec_id", "nbr_id"], how="inner")
    mutual = mutual[mutual["vec_id"] < mutual["nbr_id"]] \
        .rename(columns={"vec_id": "a", "nbr_id": "b"}) \
        .drop_duplicates(ignore_index=True)
    if mutual.empty:
        return pd.DataFrame({"node": np.empty(0, np.int64),
                             "component": np.empty(0, np.int64)})
    if len(mutual) <= driver_max:
        out = _components_min_label(mutual["a"].to_numpy(np.int64),
                                    mutual["b"].to_numpy(np.int64))
    else:
        out = cluster_pairs_min_label(spread(rd.from_pandas(mutual))) \
            .rename(columns={"doc_id": "node", "cluster_id": "component"})
    return out.astype({"node": np.int64, "component": np.int64}) \
        .sort_values("node", ignore_index=True)


# ---------------------------------------------------------------------------
# Scalar (int8-style) quantization — the storage-compression half of ANN
# ---------------------------------------------------------------------------

def scalar_quantize(ds, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", levels: int = 256):
    """Per-dimension min-max scalar quantization of an embedding column:
    code = floor((x − min_d) · (levels−1) / (max_d − min_d)), clipped to
    levels−1 (x = max_d lands exactly on levels−1 + the float-boundary
    guard), plus the per-value squared reconstruction error against the
    bucket midpoint.

    Two streaming passes: (1) per-batch min/max partials → one tiny
    driver fold → broadcast (mn, mx); (2) per-batch vectorized encode.
    Every arithmetic step is a single IEEE double op identical in
    DuckDB, so codes AND errors are bit-identical cross-engine (no
    rounding needed).  Output long-form (vec_id, dim, code, sq_err)."""
    import ray as _ray

    from ..context import Broadcast

    def mnmx(t: pa.Table) -> pa.Table:
        m = list_col_matrix(t.column(vec_col))
        if not m.size:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"dim": pa.array(np.arange(m.shape[1],
                                                   dtype=np.int64)),
                         "mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0))})

    parts = [t for t in _ray.get(
        ds.map_batches(mnmx, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    cat = pa.concat_tables(parts).to_pandas()
    g = cat.groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = g["mn"].to_numpy(np.float64)
    mx = g["mx"].to_numpy(np.float64)
    bc = Broadcast((mn, mx))

    def encode(t: pa.Table) -> pa.Table:
        mn_, mx_ = bc.get()
        m = list_col_matrix(t.column(vec_col))
        ids = t.column(id_col).to_numpy().astype(np.int64)
        n, k = m.shape if m.size else (0, len(mn_))
        span = mx_ - mn_
        safe = np.where(span > 0, span, 1.0)
        code = np.floor((m - mn_) * float(levels - 1) / safe)
        code = np.minimum(code, float(levels - 1)).astype(np.int64)
        code[:, span == 0] = 0
        recon = mn_ + (code.astype(np.float64) + 0.5) * safe \
            / float(levels - 1)
        recon[:, span == 0] = mn_[span == 0]
        err = (m - recon) ** 2
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, k)),
            "dim": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
            "code": pa.array(code.ravel()),
            "sq_err": pa.array(err.ravel()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def ann_recall(ds, query_ids: list[int], *, k: int = 10,
               n_centroids: int = 16, n_probe: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> pd.DataFrame:
    """Recall@k audit of the hash-centroid IVF path against exact brute
    force, per query — the accuracy-vs-speed evidence every ANN
    deployment needs (the embeddings twin of docs_minhash_estimate).

    Both searches run the production operators (:func:`brute_topk`,
    :func:`ivf_topk` with ``centroid_mode="hash"``); n_probe ≪
    n_centroids keeps recall < 1 so the audit is non-trivial.  Output:
    (qid, n_brute, n_ivf, n_common, recall round-6)."""
    import ray as _ray

    ds = ds.materialize()
    qset = sorted(int(x) for x in query_ids)

    def grab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column(id_col),
                                 value_set=pa.array(qset, pa.int64())))

    tb = pa.concat_tables(
        [x for x in _ray.get(ds.map_batches(
            grab, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    got = tb.column(id_col).to_numpy().astype(np.int64)
    order = np.argsort(got)
    Q = list_col_matrix(tb.column(vec_col))[order]
    qids = got[order]

    brute = brute_topk(ds, Q, k, id_col=id_col, vec_col=vec_col)
    ivf = ivf_topk(ds, Q, k, n_centroids=n_centroids, n_probe=n_probe,
                   centroid_mode="hash", id_col=id_col, vec_col=vec_col)
    rows = []
    for j, qid in enumerate(qids):
        bs = set(brute.loc[brute.query_id == j, "vec_id"].astype(int))
        vs = set(ivf.loc[ivf.query_id == j, "vec_id"].astype(int))
        common = len(bs & vs)
        rows.append({"qid": np.int64(qid),
                     "n_brute": np.int64(len(bs)),
                     "n_ivf": np.int64(len(vs)),
                     "n_common": np.int64(common),
                     "recall": round(common / float(k), 6)})
    return pd.DataFrame(rows)


def matryoshka_recall(ds, query_ids: list[int], *, k: int = 10,
                      dims: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> pd.DataFrame:
    """Recall@k of PREFIX-truncated cosine search (first ``dims``
    coordinates) against full-dimension brute force, per query — the
    Matryoshka-embedding audit (how much recall the cheap short-prefix
    pass keeps before a full-dim re-rank).  Same two-operator shape as
    :func:`ann_recall`: both sides run the production
    :func:`brute_topk`; output (qid, n_full, n_trunc, n_common,
    recall round-6)."""
    import ray as _ray

    import pyarrow.compute as pc

    ds = ds.materialize()
    qset = sorted(int(x) for x in query_ids)

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(id_col),
                                 value_set=pa.array(qset, pa.int64())))

    tb = pa.concat_tables(
        [x for x in _ray.get(ds.map_batches(
            grab, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    got = tb.column(id_col).to_numpy().astype(np.int64)
    order = np.argsort(got)
    Q = list_col_matrix(tb.column(vec_col))[order]
    qids = got[order]

    full = brute_topk(ds, Q, k, id_col=id_col, vec_col=vec_col)
    trunc = brute_topk(ds, Q, k, id_col=id_col, vec_col=vec_col,
                       dims=dims)
    rows = []
    for j, qid in enumerate(qids):
        fs = set(full.loc[full.query_id == j, "vec_id"].astype(int))
        ts = set(trunc.loc[trunc.query_id == j, "vec_id"].astype(int))
        common = len(fs & ts)
        rows.append({"qid": np.int64(qid),
                     "n_full": np.int64(len(fs)),
                     "n_trunc": np.int64(len(ts)),
                     "n_common": np.int64(common),
                     "recall": round(common / float(k), 6)})
    return pd.DataFrame(rows)
