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


def test_left_join_fill_matches_pandas_left_merge():
    from ttmf_ray.functions.joins import left_join_fill

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 100, 500).astype(np.int64),
        "h": rng.integers(0, 50, 500).astype(np.int32),
        "flag": rng.choice([1, -1], 500).astype(np.int8),
    })
    # right UNIQUE on k (attach contract)
    right = pd.DataFrame({
        "k": np.arange(0, 100, 3, dtype=np.int64),
        "pr": rng.standard_normal(34),
        "depth": rng.integers(1, 5, 34).astype(np.int64),
    })
    got = left_join_fill(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        fill={"pr": 0.0, "depth": 0}, hit_col="hit", n_buckets=8,
    ).to_pandas().sort_values(["k", "h", "flag"]).reset_index(drop=True)

    want = left.merge(right, on="k", how="left")
    want["hit"] = want["pr"].notna().astype(np.float64)
    want["pr"] = want["pr"].fillna(0.0)
    want["depth"] = want["depth"].fillna(0).astype(np.int64)
    want = want.sort_values(["k", "h", "flag"]).reset_index(drop=True)

    assert len(got) == len(left)
    pd.testing.assert_frame_equal(
        got[["k", "h", "flag", "pr", "depth", "hit"]],
        want[["k", "h", "flag", "pr", "depth", "hit"]])
    # dtypes restored exactly (int32/int8 survive the null-widened union)
    assert got["h"].dtype == np.int32
    assert got["flag"].dtype == np.int8
    assert got["depth"].dtype == np.int64


def test_left_join_fill_empty_right():
    from ttmf_ray.functions.joins import left_join_fill

    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "x": np.array([1.0, 2.0, 3.0])})
    right = pd.DataFrame({"k": np.array([], dtype=np.int64),
                          "y": np.array([], dtype=np.float64)})
    out = left_join_fill(rd.from_pandas(left), rd.from_pandas(right),
                         on="k", fill={"y": -1.0}, hit_col="hit",
                         n_buckets=4).to_pandas()
    assert len(out) == 3
    assert (out["y"] == -1.0).all()
    assert (out["hit"] == 0.0).all()


def test_left_join_fill_combines_split_partials():
    from ttmf_ray.functions.joins import left_join_fill

    left = pd.DataFrame({"k": np.array([5, 6], dtype=np.int64),
                         "x": np.array([1.0, 2.0])})
    # key 5's pivot row was split into two zero-filled disjoint partials
    right = pd.DataFrame({
        "k": np.array([5, 5, 6], dtype=np.int64),
        "p0": np.array([0.7, 0.0, 0.1]),
        "p1": np.array([0.0, -0.3, 0.0]),
        "p1_has": np.array([0.0, 1.0, 0.0]),
    })
    out = left_join_fill(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        fill={"p0": 0.0, "p1": 0.0, "p1_has": 0.0},
        combine_right_sum=True, n_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "p0"] == 0.7 and out.loc[0, "p1"] == -0.3
    assert out.loc[0, "p1_has"] == 1.0
    assert out.loc[1, "p0"] == 0.1 and out.loc[1, "p1_has"] == 0.0


def test_left_join_fill_coalesce_fragmented_parity(ray_session):
    """coalesce=True must be a pure performance knob: identical output
    to coalesce=False over heavily fragmented inputs (many tiny blocks
    — the 2M-page streaming regime in miniature)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.joins import left_join_fill

    rng = np.random.default_rng(3)
    L = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                      "a": rng.standard_normal(5000)})
    R = pd.DataFrame({"k": rng.choice(5000, 2500, replace=False)
                      .astype(np.int64)})
    R["b"] = rng.standard_normal(2500)
    lds = rd.from_pandas(L).repartition(60).materialize()
    rds = rd.from_pandas(R).repartition(90).materialize()

    outs = []
    for co in (False, True):
        out = left_join_fill(lds, rds, on="k", fill={"b": 0.0},
                             hit_col="hit", combine_right_sum=True,
                             coalesce=co).to_pandas() \
            .sort_values("k", ignore_index=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 5000 and outs[0]["hit"].sum() == 2500


def test_left_join_fill_staged_parity(ray_session):
    """stages>1 (sequential sub-exchanges — the 2 GiB-store livelock
    remedy) must be a pure execution knob: identical output to the
    single-exchange path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.joins import left_join_fill

    rng = np.random.default_rng(7)
    L = pd.DataFrame({"k": np.arange(4000, dtype=np.int64),
                      "a": rng.standard_normal(4000)})
    R = pd.DataFrame({"k": rng.choice(4000, 1500, replace=False)
                      .astype(np.int64)})
    R["b"] = rng.standard_normal(1500)
    lds = rd.from_pandas(L).repartition(16).materialize()
    rds = rd.from_pandas(R).repartition(16).materialize()

    outs = []
    for st in (1, 4):
        out = left_join_fill(lds, rds, on="k", fill={"b": 0.0},
                             hit_col="hit", stages=st,
                             n_buckets=16).to_pandas() \
            .sort_values("k", ignore_index=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 4000 and outs[0]["hit"].sum() == 1500


def test_hash_join_staged_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.joins import hash_join

    rng = np.random.default_rng(11)
    L = pd.DataFrame({"k": rng.integers(0, 800, 3000).astype(np.int64),
                      "a": rng.standard_normal(3000)})
    R = pd.DataFrame({"k": np.arange(800, dtype=np.int64),
                      "b": rng.standard_normal(800)})
    lds = rd.from_pandas(L).repartition(8).materialize()
    rds = rd.from_pandas(R).repartition(8).materialize()
    outs = []
    for st in (1, 3):
        out = hash_join(lds, rds, on="k", stages=st, n_buckets=12) \
            .to_pandas().sort_values(["k", "a"], ignore_index=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 3000
