"""exact_quantiles: histogram-merge quantiles vs the naive sorted rule."""

import numpy as np
import pandas as pd
import ray.data as rd

from ttmf_ray.stages.quantiles import exact_quantiles

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def naive(vals: np.ndarray, q: float) -> int:
    s = np.sort(vals)
    return int(s[int(np.floor((len(s) - 1) * q))])


def test_grouped_matches_naive_across_blocks():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "x": rng.integers(0, 400, size=n),
        "y": rng.poisson(30, size=n),
    })
    # several blocks so per-batch histograms must merge in the shuffle
    ds = rd.from_pandas(df).repartition(8)
    out = exact_quantiles(ds, ["x", "y"], QS, group_col="g")
    assert list(out.columns) == ["g", "q", "x_q", "y_q"]
    assert len(out) == 3 * len(QS)
    for g, gdf in df.groupby("g"):
        for q in QS:
            row = out[(out["g"] == g) & (out["q"] == q)].iloc[0]
            assert row["x_q"] == naive(gdf["x"].to_numpy(), q), (g, q)
            assert row["y_q"] == naive(gdf["y"].to_numpy(), q), (g, q)


def test_ungrouped_single_value_and_order():
    df = pd.DataFrame({"x": np.full(100, 42, dtype=np.int64)})
    out = exact_quantiles(rd.from_pandas(df).repartition(4), ["x"], QS)
    assert list(out.columns) == ["q", "x_q"]
    assert (out["x_q"] == 42).all()
    assert out["q"].tolist() == sorted(QS)
