"""Count-min + HyperLogLog sketches (stages/sketches.py): estimator
guarantees, merge associativity, determinism."""

import numpy as np
import pandas as pd

import ray.data as rd


def _docs(n=300, vocab=40, seed=11):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 30)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_countmin_never_underestimates():
    from ttmf_ray.stages.sketches import cm_estimate, countmin_sketch

    df = _docs()
    ds = rd.from_pandas(df)
    M = countmin_sketch(ds, d=4, w=256)
    # exact term frequencies
    toks = pd.Series(" ".join(df["text"]).split(" ")).value_counts()
    est = cm_estimate(M, toks.index.to_numpy(dtype=object))
    exact = toks.to_numpy()
    assert (est >= exact).all()            # the CM guarantee
    assert M.sum() == 4 * exact.sum()      # every row counts every token
    # with w >> vocab the estimates are near-exact
    assert (est == exact).mean() > 0.5


def test_countmin_partials_merge_associative():
    from ttmf_ray.stages.sketches import countmin_sketch

    df = _docs()
    one = countmin_sketch(rd.from_pandas(df), d=4, w=128)
    many = countmin_sketch(rd.from_pandas(df).repartition(13), d=4, w=128)
    assert np.array_equal(one, many)


def test_hll_estimate_accuracy_and_determinism():
    from ttmf_ray.stages.sketches import hll_estimate, hll_registers

    df = _docs(n=800, vocab=500)
    exact = len({(i, w) for i, t in zip(df["doc_id"], df["text"])
                 for w in t.split(" ")})
    r1 = hll_registers(rd.from_pandas(df))
    r2 = hll_registers(rd.from_pandas(df).repartition(7))
    assert np.array_equal(r1, r2)          # block-structure independent
    est = hll_estimate(r1)
    assert abs(est - exact) / exact < 0.05  # p=12 → ~1.6% σ
