"""Unit tests for the ANN kernels: multi-query brute top-k vs a naive
numpy reference, list_col_matrix input variants, hash-centroid
determinism across block splits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ttmf_ray.stages.ann import (brute_topk, hash_centroids, ivf_topk,
                                 list_col_matrix, _l2norm)


def _vec_table(n: int, d: int, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.standard_normal((n, d))),
    })


def test_brute_topk_multi_query_matches_naive():
    df = _vec_table(300, 16)
    vecs = np.stack(df["embedding"].to_numpy())
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((5, 16))
    k = 7
    got = brute_topk(rd.from_pandas(df).repartition(4), queries, k)
    sims = _l2norm(vecs) @ _l2norm(queries).T
    for qi in range(len(queries)):
        order = sorted(zip(-sims[:, qi], np.arange(300)))[:k]
        want_ids = sorted(int(i) for _, i in order)
        got_ids = sorted(got.loc[got["query_id"] == qi, "vec_id"].tolist())
        assert got_ids == want_ids, qi


def test_list_col_matrix_variants():
    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    for arr in (
        pa.array(list(m)),                                    # list<double>
        pa.array(list(m.astype(np.float32)),
                 pa.list_(pa.float32(), 3)),                  # fixed_size_list
        pa.chunked_array([pa.array(list(m[:2])), pa.array(list(m[2:]))]),
    ):
        out = list_col_matrix(arr)
        assert out.shape == (4, 3)
        np.testing.assert_allclose(out, m)
    with pytest.raises(ValueError):
        list_col_matrix(pa.array([[1.0, 2.0], [3.0]]))
    assert list_col_matrix(pa.array([], pa.list_(pa.float64()))).size == 0


def test_hash_centroids_block_invariant():
    df = _vec_table(400, 8, seed=3)
    one = hash_centroids(rd.from_pandas(df), 16)
    many = hash_centroids(rd.from_pandas(df).repartition(7), 16)
    np.testing.assert_allclose(one, many)
    assert one.shape == (16, 8)
    np.testing.assert_allclose(np.linalg.norm(one, axis=1), 1.0)


def test_ivf_hash_mode_subset_of_brute():
    """Probed-bucket top-k scores must be a subset of the brute top-k
    universe (IVF searches fewer candidates, never different scores)."""
    df = _vec_table(500, 12, seed=5)
    q = np.stack(df["embedding"].to_numpy())[:1]
    ivf = ivf_topk(rd.from_pandas(df), q, 10, centroid_mode="hash")
    vecs = np.stack(df["embedding"].to_numpy())
    sims = (_l2norm(vecs) @ _l2norm(q).T)[:, 0]
    by_id = {int(i): float(s) for i, s in zip(df["vec_id"], sims)}
    for _, row in ivf.iterrows():
        assert abs(by_id[int(row["vec_id"])] - row["cosine"]) < 1e-9


def test_random_projection_jl_property():
    """Sign projection must roughly preserve pairwise geometry (JL):
    projected squared distances correlate strongly with the originals,
    and the output is block-count invariant (pure function of the seed)."""
    from ttmf_ray.stages.ann import random_projection

    df = _vec_table(300, 64, seed=11)
    one = random_projection(rd.from_pandas(df), k=16).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    many = random_projection(rd.from_pandas(df).repartition(5), k=16) \
        .to_pandas().sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(one, many)

    # E[|y_i - y_j|^2] = |x_i - x_j|^2 for ±1/sqrt(k) signs; with k=16
    # each ratio concentrates with std ≈ sqrt(2/k) ≈ 0.35 — check the
    # estimator is unbiased in aggregate and no ratio is wildly off
    # (isotropic data makes all pairwise distances similar, so a
    # correlation test would only measure noise).
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    y = one[[f"p{j}" for j in range(16)]].to_numpy()
    rng = np.random.default_rng(0)
    i, j = rng.integers(0, len(x), 400), rng.integers(0, len(x), 400)
    keep = i != j
    dx = ((x[i[keep]] - x[j[keep]]) ** 2).sum(axis=1)
    dy = ((y[i[keep]] - y[j[keep]]) ** 2).sum(axis=1)
    ratio = dy / dx
    assert 0.9 < ratio.mean() < 1.1
    assert 0.2 < np.quantile(ratio, 0.02)
    assert np.quantile(ratio, 0.98) < 2.5


def test_union_find_matches_distributed_label_prop(ray_session):
    """Rule-13 parity: driver union-find and the distributed min-label
    propagation produce the identical min-id-labeled partition."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.context import spread
    from ttmf_ray.stages.ann import _components_min_label
    from ttmf_ray.stages.dedup import cluster_pairs_min_label

    rng = np.random.default_rng(3)
    a = rng.integers(0, 80, size=120).astype(np.int64)
    b = rng.integers(0, 80, size=120).astype(np.int64)
    keep = a < b
    ed = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
    drv = _components_min_label(ed["a"].to_numpy(), ed["b"].to_numpy()) \
        .sort_values("node", ignore_index=True)
    dist = cluster_pairs_min_label(spread(rd.from_pandas(ed)),
                                   driver_max=None) \
        .rename(columns={"doc_id": "node", "cluster_id": "component"}) \
        .astype({"node": np.int64, "component": np.int64}) \
        .sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(drv, dist)
