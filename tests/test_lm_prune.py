"""Distributed n-gram prune knob (KenLM-style min_count) — identity at
min_count=1 (the mirror-pinned exact model) and a real prune at 2."""

import numpy as np
import pandas as pd


def _docs_ds():
    import ray.data as rd

    from ttmf_ray.context import spread

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat on the mat",
                 "the cat sat",
                 "a dog ran fast",
                 "the mat sat still",
                 "one rare bigram here",
                 "the cat sat on a dog"],
    })
    return spread(rd.from_pandas(docs))


def test_min_count_identity_and_prune(ray_session):
    from ttmf_ray.stages.lm_score import fit_bigram_lm, fit_kn_lm, fit_sb_lm

    ds = _docs_ds()
    base = fit_bigram_lm(ds)
    same = fit_bigram_lm(ds, min_count=1)
    assert (base["bg_keys"] == same["bg_keys"]).all()
    assert (base["bg_cnt"] == same["bg_cnt"]).all()
    pruned = fit_bigram_lm(ds, min_count=2)
    assert len(pruned["bg_keys"]) < len(base["bg_keys"])
    assert (pruned["bg_cnt"] >= 2).all()
    assert pruned["V"] == base["V"]        # unigram rows always survive
    # SB / KN accept the knob with identical defaults
    sb = fit_sb_lm(ds, min_count=2)
    assert (sb["tg_c"] >= 2).all() and (sb["bg_c"] >= 2).all()
    kn = fit_kn_lm(ds, min_count=2)
    assert (kn["bg_cnt"] >= 2).all()
