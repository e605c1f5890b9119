"""Vectorized all-keys threshold sweep must equal the per-key reference
scan, asc and desc, over randomized inputs (hypothesis-style sampling)."""

import numpy as np
import pandas as pd

from ttmf_ray.functions.transe import threshold_sweep, thresholds_by_key


def _check(df, descending):
    got = thresholds_by_key(df, key="k", value="v", descending=descending)
    for key, g in df.groupby("k"):
        want = threshold_sweep(g["v"].to_numpy(np.float64),
                               g["flag"].to_numpy(), descending=descending)
        assert abs(got[int(key)] - want) < 1e-12, (key, got[int(key)], want)


def test_vectorized_sweep_matches_reference_scan():
    rng = np.random.default_rng(3)
    for trial in range(5):
        n = 400
        df = pd.DataFrame({
            "k": rng.integers(0, 17, size=n),
            "v": np.round(rng.standard_normal(n), 3),  # induce ties
            "flag": rng.choice([1, -1], size=n),
        })
        _check(df, False)
        _check(df, True)


def test_vectorized_sweep_single_rows_and_uniform_flags():
    df = pd.DataFrame({
        "k": [0, 1, 1, 2, 2, 2],
        "v": [5.0, 1.0, 2.0, 3.0, 1.0, 2.0],
        "flag": [1, -1, -1, 1, 1, 1],
    })
    _check(df, False)
    _check(df, True)


def test_distributed_transe_matches_quality():
    import ray  # noqa: F401  (session from conftest)

    from ttmf_ray.functions.transe import (TransEConfig,
                                           train_transe_distributed,
                                           transe_energy)

    n = 60
    h = np.arange(n)
    t = (h + 1) % n
    r = np.zeros(n, dtype=np.int64)
    triples = np.stack([h, t, r], axis=1)
    cfg = TransEConfig(dim=16, epochs=40, lr=0.02, batch_size=16, seed=5)
    E, R = train_transe_distributed(triples, n, 1, cfg, workers=4)
    pos = transe_energy(E, R, h, t, r)
    rng = np.random.default_rng(2)
    neg = transe_energy(E, R, h, rng.integers(0, n, size=n), r)
    assert pos.mean() < neg.mean() - 0.1, (pos.mean(), neg.mean())
