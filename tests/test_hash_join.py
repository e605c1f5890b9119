"""Partitioned hash join (large × large, no broadcast)."""

import numpy as np
import pandas as pd

import ray.data as rd

from ttmf_ray.functions.joins import hash_join


def test_hash_join_matches_pandas_merge():
    rng = np.random.default_rng(0)
    left = pd.DataFrame({
        "k": rng.integers(0, 200, 1000),
        "x": rng.standard_normal(1000),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 200, 300),
        "y": rng.integers(0, 10, 300),
    })
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", n_buckets=16).to_pandas()
    want = left.merge(right, on="k", how="inner")
    got = got.sort_values(["k", "x", "y"]).reset_index(drop=True)
    want = want.sort_values(["k", "x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "x", "y"]], want[["k", "x", "y"]])


def test_hash_join_overlapping_columns_get_suffixes():
    left = pd.DataFrame({"k": [1, 2, 2], "x": [10, 20, 21], "v": [1.0, 2.0, 2.5]})
    right = pd.DataFrame({"k": [2, 2, 3], "x": [99, 98, 97]})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", n_buckets=4).to_pandas()
    want = left.merge(right, on="k", how="inner", suffixes=("_l", "_r"))
    got = got.sort_values(["k", "x_l", "x_r"]).reset_index(drop=True)
    want = want.sort_values(["k", "x_l", "x_r"]).reset_index(drop=True)
    cols = ["k", "x_l", "v", "x_r"]
    pd.testing.assert_frame_equal(got[cols], want[cols])


def test_hash_join_no_matches():
    left = pd.DataFrame({"k": [1, 2], "x": [1.0, 2.0]})
    right = pd.DataFrame({"k": [3, 4], "y": [9, 9]})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", n_buckets=4).to_pandas()
    assert len(out) == 0
