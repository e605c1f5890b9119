"""K-means + semantic dedup (stages/cluster.py): recovery on planted
blobs, dedup of planted near-identical vectors, determinism."""

import numpy as np
import pandas as pd

import ray.data as rd

from ttmf_ray.stages.cluster import kmeans, semantic_dedup


def _blob_ds(n_per: int = 40, d: int = 8, sep: float = 20.0):
    rng = np.random.default_rng(3)
    centers = np.eye(3, d) * sep
    vecs, labels = [], []
    for b in range(3):
        vecs.append(centers[b] + rng.standard_normal((n_per, d)))
        labels.extend([b] * n_per)
    V = np.concatenate(vecs)
    df = pd.DataFrame({
        "vec_id": np.arange(len(V), dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in V],
        "blob": np.asarray(labels),
    })
    return rd.from_pandas(df[["vec_id", "embedding"]]), df


def test_kmeans_recovers_separated_blobs():
    ds, df = _blob_ds()
    assign_ds, C = kmeans(ds, k=3, n_iter=5)
    out = assign_ds.to_pandas().sort_values("vec_id", ignore_index=True)
    assert C.shape == (3, 8)
    # each blob maps to exactly one cluster (perfect recovery at sep=20)
    joined = out.merge(df[["vec_id", "blob"]], on="vec_id")
    purity = joined.groupby("blob")["cluster"].nunique()
    assert (purity == 1).all()
    assert joined["cluster"].nunique() == 3


def test_kmeans_deterministic():
    ds, _ = _blob_ds()
    a = kmeans(ds, k=3, n_iter=4)[0].to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    b = kmeans(ds, k=3, n_iter=4)[0].to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_driver_fast_path_parity():
    """Rule-13 contract: the driver fast path (driver_max high) must be
    BIT-IDENTICAL to the actor-pool path (driver_max=0) — same
    assignments, same rounded distances, same centroid matrix."""
    ds, _ = _blob_ds()
    fast_ds, fast_C = kmeans(ds, k=3, n_iter=4, driver_max=10_000)
    pool_ds, pool_C = kmeans(ds, k=3, n_iter=4, driver_max=0)
    fast = fast_ds.to_pandas().sort_values("vec_id", ignore_index=True)
    pool = pool_ds.to_pandas().sort_values("vec_id", ignore_index=True)
    np.testing.assert_array_equal(fast_C, pool_C)
    pd.testing.assert_frame_equal(
        fast.astype({"cluster": np.int64}),
        pool.astype({"cluster": np.int64}))


def test_kcenter_greedy_spreads_and_matches_pool_path():
    """Greedy k-center: (a) with k = #blobs the selected centers land
    one per planted blob (farthest-point must spread); (b) the rule-13
    driver fast path is identical to the actor-pool path; (c) selected
    rows assign to themselves at distance 0."""
    from ttmf_ray.stages.cluster import kcenter_greedy

    ds, df = _blob_ds()
    fast = kcenter_greedy(ds, k=3).reset_index(drop=True)
    pool = kcenter_greedy(ds, k=3, driver_max=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, pool)
    assert fast["is_center"].sum() == 3
    joined = fast.merge(df[["vec_id", "blob"]], on="vec_id")
    centers = joined[joined.is_center == 1]
    assert centers["blob"].nunique() == 3          # one per blob
    # centers are stored rounded to 6 dp, so a selected row's distance
    # to itself is at most one rounding quantum
    assert (centers["dist"] <= 1e-6).all()
    # perfect recovery at sep=20: every vector labels to its blob's center
    purity = joined.groupby("blob")["center"].nunique()
    assert (purity == 1).all()


def test_semantic_dedup_flags_planted_near_identical():
    ds, df = _blob_ds()
    # plant near-identical copies of vec 0 and vec 40 (different blobs)
    base = df[df.vec_id.isin([0, 40])].copy()
    planted = base.copy()
    planted["vec_id"] = planted["vec_id"] + 1_000
    planted["embedding"] = planted["embedding"].map(
        lambda v: (np.asarray(v) * 1.0001).astype(np.float32).tolist())
    all_df = pd.concat([df, planted], ignore_index=True)
    ds2 = rd.from_pandas(all_df[["vec_id", "embedding"]])
    _, C = kmeans(ds2, k=3, n_iter=5)
    out = semantic_dedup(ds2, C, tau=0.999).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    assert len(out) == len(all_df)
    dup = out[out.dup_of >= 0]
    # the planted copies point back at their originals
    got = dict(zip(dup["vec_id"], dup["dup_of"]))
    assert got.get(1000) == 0
    assert got.get(1040) == 40
    # cosine scaling (×1.0001) keeps direction: no false positives among
    # the independent Gaussian rows at tau=0.999
    assert len(dup) == 2
