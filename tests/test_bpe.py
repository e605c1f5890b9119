"""BPE merge learning: hand-verified semantics, greedy-overlap rule,
and driver-path vs Dataset-path parity (CLAUDE.md rule 13)."""

import numpy as np
import pandas as pd

from ttmf_ray.stages.bpe import (_apply_merge, _flat_syms, _pair_counts,
                                 _learn_bpe_dataset, learn_bpe_arrays)


def test_hand_case_matches_classic_bpe():
    # counts: "hug"x10, "pug"x5, "hugs"x5  → classic Sennrich example
    words = np.array(["hug", "pug", "hugs"], dtype=object)
    cnt = np.array([10, 5, 5], dtype=np.int64)
    out = learn_bpe_arrays(words, cnt, 3)
    got = [tuple(r) for r in out[["lhs", "rhs", "cnt"]].itertuples(index=False)]
    # round 1: (h,u)=15, (u,g)=20, (p,u)=5, (g,s)=5 → merge u+g
    # round 2: (h,ug)=15, (p,ug)=5, (ug,s)=5 → merge h+ug
    assert got[:2] == [("u", "g", 20), ("h", "ug", 15)]


def test_greedy_overlap_rule():
    # "aaaa": matches at 0,1,2 → greedy keeps 0 and 2 → "aa","aa"
    syms, wid = _flat_syms(["aaaa"])
    s2, w2 = _apply_merge(syms, wid, "a", "a")
    assert s2.tolist() == ["aa", "aa"]
    # "aaa": keeps 0 → "aa","a"
    syms, wid = _flat_syms(["aaa"])
    s2, _ = _apply_merge(syms, wid, "a", "a")
    assert s2.tolist() == ["aa", "a"]


def test_pair_counts_do_not_cross_words():
    syms, wid = _flat_syms(["ab", "ba"])
    pc = _pair_counts(syms, wid, np.array([1, 1], dtype=np.int64))
    got = {(r.a, r.b): r.c for r in pc.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def _as_wc_ds(wdf: pd.DataFrame):
    import ray.data as rd

    from ttmf_ray.context import spread

    return spread(rd.from_pandas(wdf))


def test_dataset_path_matches_driver_path(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["".join(rng.choice(list("abcdef_"), size=rng.integers(2, 9)))
             for _ in range(300)]
    wdf = pd.DataFrame({"word": sorted(set(vocab))})
    wdf["cnt"] = (np.arange(len(wdf), dtype=np.int64) % 17) + 1
    drv = learn_bpe_arrays(wdf["word"].to_numpy(dtype=object),
                           wdf["cnt"].to_numpy(np.int64), 6)
    dist = _learn_bpe_dataset(_as_wc_ds(wdf), 6)
    pd.testing.assert_frame_equal(drv, dist)


def test_learn_bpe_dataset_native_end_to_end(ray_session):
    """The public entry above ``driver_max`` must never collect the word
    table: parity of learn_bpe(driver_max=0) (Dataset path, word table
    'too big' for the driver) vs the driver path on the same docs."""
    import ray.data as rd

    from ttmf_ray.context import spread
    from ttmf_ray.stages.bpe import learn_bpe

    rng = np.random.default_rng(19)
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(
            ["hug", "pug", "hugs", "bug", "pun", "hun"],
            size=rng.integers(3, 12))) for _ in range(60)],
    })
    ds = spread(rd.from_pandas(docs))
    drv = learn_bpe(ds, k=6, driver_max=10**9)
    dist = learn_bpe(ds, k=6, driver_max=0)
    pd.testing.assert_frame_equal(drv, dist)


def test_encode_words_paths_match(ray_session):
    from ttmf_ray.stages.bpe import _encode_dataset, _encode_state

    rng = np.random.default_rng(11)
    vocab = ["".join(rng.choice(list("abcde_"), size=rng.integers(2, 8)))
             for _ in range(200)]
    wdf = pd.DataFrame({"word": sorted(set(vocab))})
    wdf["cnt"] = (np.arange(len(wdf), dtype=np.int64) % 13) + 1

    words = wdf["word"].to_numpy(dtype=object)
    syms, wid = _encode_state(words, wdf["cnt"].to_numpy(np.int64), 5)
    drv = pd.DataFrame({
        "word": words,
        "cnt": wdf["cnt"].to_numpy(np.int64),
        "n_syms": np.bincount(wid, minlength=len(wdf)).astype(np.int64),
        "encoded": pd.Series(syms).groupby(wid).agg(" ".join)
        .reindex(np.arange(len(wdf))).to_numpy(),
    })
    dist = _encode_dataset(_as_wc_ds(wdf), 5) \
        .sort_values("word", ignore_index=True)
    pd.testing.assert_frame_equal(drv, dist.astype(drv.dtypes.to_dict()))
    # every encoded sequence rebuilds its word
    assert (dist["encoded"].str.replace(" ", "") == dist["word"]).all()
