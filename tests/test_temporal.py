"""Temporal operators: as-of join, sliding windows, range join
(ttmf_ray/stages/temporal.py).  Unit semantics on pinned micro-fixtures
+ oracle parity of the three driver queries at sf0.001."""

import numpy as np
import pandas as pd
import pytest

import os
import sys

import __ray_entry__ as entrymod

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_harness import compare, duckdb_con, to_pandas  # noqa: E402


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_asof_join_backward_and_no_match():
    from ttmf_ray.stages.temporal import asof_join

    left = pd.DataFrame({"k": [1, 1, 2, 3], "ts": [10, 25, 10, 5],
                         "lv": [100, 101, 102, 103]})
    right = pd.DataFrame({"k": [1, 1, 2], "ts": [8, 20, 50],
                          "rv": [1.0, 2.0, 3.0]})
    out = asof_join(_ds(left), _ds(right), by="k", on="ts",
                    n_buckets=2).to_pandas().sort_values("lv")
    # k=1 @10 → right @8; k=1 @25 → right @20; k=2 @10 → none (right @50
    # is later); k=3 → no right rows at all
    assert out["ts_r"].tolist()[:2] == [8, 20]
    assert out["rv"].tolist()[:2] == [1.0, 2.0]
    assert out["ts_r"].isna().tolist() == [False, False, True, True]


def test_asof_join_forward():
    from ttmf_ray.stages.temporal import asof_join

    left = pd.DataFrame({"k": [1, 1], "ts": [10, 25], "lv": [0, 1]})
    right = pd.DataFrame({"k": [1], "ts": [20], "rv": [9.0]})
    out = asof_join(_ds(left), _ds(right), by="k", on="ts",
                    direction="forward").to_pandas().sort_values("lv")
    assert out["ts_r"].tolist() == [20] + [None] \
        or (out["ts_r"].iloc[0] == 20 and pd.isna(out["ts_r"].iloc[1]))


def test_sliding_window_counts_each_row_k_times():
    from ttmf_ray.stages.temporal import sliding_window_agg

    # one event at t=1000 with length 40 / slide 10 → windows 970..1000
    df = pd.DataFrame({"ts": [1000], "g": ["a"], "v": [2.0]})
    out = sliding_window_agg(_ds(df), ts_col="ts", key_cols=["g"],
                             value_col="v", length=40, slide=10) \
        .to_pandas().sort_values("win_start")
    assert out["win_start"].tolist() == [970, 980, 990, 1000]
    assert (out["n"] == 1).all() and (out["sum_value"] == 2.0).all()


def test_sliding_window_rejects_nondivisible_slide():
    from ttmf_ray.stages.temporal import sliding_window_agg

    with pytest.raises(ValueError):
        sliding_window_agg(_ds(pd.DataFrame({"ts": [0], "g": ["a"],
                                             "v": [0.0]})),
                           ts_col="ts", key_cols=["g"], value_col="v",
                           length=40, slide=15)


def test_range_join_band_edges_inclusive_exclusive():
    from ttmf_ray.stages.temporal import range_join_broadcast

    df = pd.DataFrame({"v": [-0.5, 0.0, 0.99, 1.0, 4.99, 5.0, 100.0]})
    out = range_join_broadcast(
        _ds(df), value_col="v", edges=np.array([0.0, 1.0, 5.0]),
    ).to_pandas().sort_values("v")
    # -0.5 (below) and 5.0/100.0 (at/above top edge) drop; lo inclusive
    assert out["v"].tolist() == [0.0, 0.99, 1.0, 4.99]
    assert out["band"].tolist() == ["[0,1)", "[0,1)", "[1,5)", "[1,5)"]


@pytest.mark.parametrize("name", ["events_asof_join", "events_sliding_1h",
                                  "events_value_bands"])
def test_temporal_query_matches_oracle(name, sf_dir):
    con = duckdb_con(sf_dir)
    ray_df = to_pandas(entrymod.queries()[name](sf_dir))
    sql_df = con.execute(entrymod.oracle_sql()[name]).df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems
