"""Behavioral tests for the training-data curation stage
(ttmf_ray/stages/curation.py) — planted-contamination recovery, shuffle
permutation/determinism, packing arithmetic, mixture rates, vocabulary
top-k vs a pandas recompute.  Value-level SQL parity is covered by
test_oracle_parity.py; these pin the semantics the SQL can't state."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ttmf_ray.stages.curation import (decontaminate, eval_shingle_set,
                                      pack_bins, shuffle_export,
                                      source_mixture, top_tokens)

DOCS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a completely different document about stream processing engines",
    "the quick brown fox jumps over the lazy dog near the river bank",  # copy of 0
    "stream processing engines shuffle data between workers constantly",
    "short doc",
]


def _ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


def test_decontaminate_flags_planted_copy():
    ev = eval_shingle_set(_ds([DOCS[0]], ids=[100]))
    out = decontaminate(_ds(DOCS[1:4], ids=[1, 2, 3]), ev).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 2 is an exact copy of the eval doc: every shingle hits
    row = out[out["doc_id"] == 2].iloc[0]
    assert row["contaminated"] == 1
    assert row["n_hits"] == row["n_shingles"] > 0
    # unrelated docs share no trigram with it
    assert (out[out["doc_id"] != 2]["contaminated"] == 0).all()


def test_decontaminate_empty_eval_set():
    out = decontaminate(_ds(DOCS[:2]), np.empty(0, dtype=np.int64)) \
        .to_pandas()
    assert (out["contaminated"] == 0).all()
    assert (out["n_shingles"] > 0).all()


def test_shuffle_export_is_sharded_permutation():
    n = 403
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    out = shuffle_export(ds, seed=7, n_shards=4).to_pandas()
    assert len(out) == n
    assert sorted(out["doc_id"]) == list(range(n))
    for s, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # deterministic w.r.t. batching/block layout
    out2 = shuffle_export(ds.repartition(7), seed=7, n_shards=4) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True), out2)
    # a different seed is a different permutation
    out3 = shuffle_export(ds, seed=8, n_shards=4).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert not out3["pos"].equals(
        out.sort_values("doc_id", ignore_index=True)["pos"])


def test_pack_bins_matches_serial_cumsum():
    texts = [f"tok {' '.join(['w'] * (i % 17))}" for i in range(200)]
    out = pack_bins(_ds(texts), bin_tokens=32, n_parts=8).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    ntok = out["n_tokens"].to_numpy()
    want_start = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert (out["start_off"].to_numpy() == want_start).all()
    assert (out["bin"].to_numpy() == want_start // 32).all()
    # bins are contiguous, non-decreasing in doc order
    assert (np.diff(out["bin"].to_numpy()) >= 0).all()


def test_source_mixture_rates_and_determinism():
    n = 4000
    src = np.where(np.arange(n) % 2 == 0, "keepall", "half")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64()),
                                 "source": pa.array(src, pa.string())}))
    out = source_mixture(ds, {"keepall": 1.0, "half": 0.5, "never": 0.0},
                         seed=3).to_pandas()
    kept = out.groupby("source").size()
    assert kept["keepall"] == n // 2          # rate 1.0 keeps everything
    assert abs(kept["half"] / (n // 2) - 0.5) < 0.05
    out2 = source_mixture(ds.repartition(5),
                          {"keepall": 1.0, "half": 0.5}, seed=3).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True),
        out2.sort_values("doc_id", ignore_index=True))
    # unlisted sources drop
    out3 = source_mixture(ds, {"other": 1.0}, seed=3).to_pandas()
    assert len(out3) == 0


def test_top_tokens_matches_pandas_recompute():
    import re

    out = top_tokens(_ds(DOCS), k=5)
    rows = []
    for i, t in enumerate(DOCS):
        for w in set(re.findall(r"[0-9a-z_]+", t.lower())):
            rows.append((i, w))
    df = pd.DataFrame(rows, columns=["doc_id", "token"]) \
        .groupby("token").size().reset_index(name="df") \
        .sort_values(["df", "token"], ascending=[False, True],
                     ignore_index=True).head(5)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), df.astype({"df": np.int64}))


def test_batch_shingle_kernel_matches_scalar():
    from ttmf_ray.stages.dedup import batch_shingle_hashes, shingle_hashes

    cases = DOCS + ["", "one", "two words", "a b", "dup dup dup dup",
                    "x_1 y2 z!! x_1 y2 z", "  ", "a",
                    "héllo wörld unicode fallback path here"]
    flat, lens = batch_shingle_hashes(cases)
    starts = np.cumsum(lens) - lens
    for i, t in enumerate(cases):
        got = flat[starts[i]: starts[i] + lens[i]]
        assert np.array_equal(shingle_hashes(t), got), (i, t)


def test_export_shuffled_resume(tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from ttmf_ray.stages.curation import export_shuffled
    from ttmf_ray.state.manifest import completed_shards

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out1 = str(tmp_path / "one")
    r = export_shuffled(ds, out1, seed=5, n_shards=4)
    assert r["shards_processed"] == 4

    out2 = str(tmp_path / "two")
    with pytest.raises(RuntimeError, match="injected failure"):
        export_shuffled(ds, out2, seed=5, n_shards=4, fail_after_shards=2)
    assert len(completed_shards(out2)) == 2
    r2 = export_shuffled(ds, out2, seed=5, n_shards=4)
    assert r2 == {"shards_total": 4, "shards_skipped": 2,
                  "shards_processed": 2}
    # re-run is a no-op
    assert export_shuffled(ds, out2, seed=5, n_shards=4) \
        ["shards_processed"] == 0

    def load(d):
        return {p.split("/")[-2]: pq.read_table(p).to_pandas()
                for p in sorted(glob.glob(f"{d}/shard=*/part-0.parquet"))}

    a, b = load(out1), load(out2)
    assert a.keys() == b.keys() and len(a) == 4
    all_ids = []
    for k in a:
        pd.testing.assert_frame_equal(a[k], b[k])   # resume == single-shot
        assert list(a[k]["pos"]) == list(range(len(a[k])))  # shuffle order
        all_ids += list(a[k]["doc_id"])
    assert sorted(all_ids) == sorted(
        ds.to_pandas()["doc_id"])                    # exactly-once rows


def test_clean_corpus_drops_planted_duplicate():
    from ttmf_ray.stages.curation import clean_corpus

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to the hills where it finds a very quiet place to "
            "rest for a while before returning home again at last")
    texts = [base, "tiny", base, base + " extra tail words here now"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
    }))
    out = clean_corpus(ds, {"s": 1.0}, min_tokens=5, max_tokens=100,
                       max_dup_word_frac=0.9).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(out["keep_dedup"]) == [1, 1, 0, 1]   # doc 2 loses to doc 0
    assert out.loc[1, "keep_quality"] == 0           # "tiny" under min_tokens
    assert out.loc[0, "keep"] == 1
    assert out.loc[2, "keep"] == 0
    assert (out["keep"] ==
            out[[c for c in out.columns if c.startswith("keep_")]]
            .min(axis=1)).all()


def test_line_dedup_semantics_across_blocks():
    """First occurrence (min doc<<20|line_no) wins; blank lines always
    kept; a doc whose every line is a later duplicate comes back empty."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.curation import line_dedup

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha\nbeta\ngamma",
            "beta\n\ndelta",        # beta dup (lost), blank kept, delta new
            "alpha\nbeta",          # everything lost -> ""
            "delta\nepsilon\n",     # delta lost, epsilon new, trailing blank
        ],
    })
    out = line_dedup(rd.from_pandas(docs).repartition(3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text_kept"].tolist() == [
        "alpha\nbeta\ngamma",
        "\ndelta",
        "",
        "epsilon\n",
    ]
    assert out["doc_id"].tolist() == [0, 1, 2, 3]


def test_lm_perplexity_scores_order():
    """A doc made of reference-corpus tokens must outscore a doc of
    out-of-vocabulary gibberish; token-less docs score 0 by contract."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.lm_score import fit_unigram_lm, perplexity_score

    ref = pd.DataFrame({
        "doc_id": range(4),
        "text": ["the cat sat", "the dog sat", "the cat ran", "a dog ran"],
    })
    model = fit_unigram_lm(rd.from_pandas(ref))
    probe = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the cat sat", "zzq qqz xxj", "   "],
    })
    out = perplexity_score(rd.from_pandas(probe), model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["logprob_mean"][0] > out["logprob_mean"][1]
    assert out["n_tokens"].tolist() == [3, 3, 0]
    assert out["logprob_mean"][2] == 0.0


def test_nb_classifier_separates_classes():
    """Docs built from positive-class tokens must score above docs built
    from negative-class tokens; token-less docs score the bare prior."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.classify import fit_nb_quality, nb_quality_score

    train = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["en", "en", "en", "de", "de", "de"],
        "text": ["the cat sat", "the dog sat", "cat and dog",
                 "der hund", "die katze", "der und die"],
    })
    model = fit_nb_quality(rd.from_pandas(train))
    probe = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the cat", "der hund", "   "],
    })
    out = nb_quality_score(rd.from_pandas(probe), model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["nb_score"][0] > out["nb_score"][1]
    assert out["pred"].tolist()[:2] == [1, 0]
    assert out["n_tokens"].tolist() == [2, 2, 0]
    assert abs(out["nb_score"][2] - model["prior"]) < 1e-12


def test_dsir_weights_favor_target_distribution():
    """Importance weights must rank target-like docs above raw-only docs
    and stay deterministic across runs (seeded bucket hashing)."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.classify import dsir_weights, fit_dsir

    corpus = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["en", "en", "en", "xx", "xx", "xx"],
        "text": ["alpha beta gamma", "alpha beta", "beta gamma alpha",
                 "zork quux", "quux blarg", "zork blarg quux"],
    })
    ds = rd.from_pandas(corpus)
    model = fit_dsir(ds, n_buckets=64)
    out = dsir_weights(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    en = out.loc[:2, "log_weight"]
    xx = out.loc[3:, "log_weight"]
    assert en.min() > xx.max()
    assert out["selected"].tolist() == [1, 1, 1, 0, 0, 0]
    model2 = fit_dsir(ds, n_buckets=64)
    assert (model2["lw"] == model["lw"]).all()


def test_min_label_clusters_equal_union_find():
    """The distributed min-label propagation must produce exactly the
    driver union-find clustering (chains force multi-round propagation)."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.dedup import cluster_pairs, cluster_pairs_min_label

    pairs = pd.DataFrame({
        # one 4-chain (diameter 3), one triangle, one isolated pair
        "a": [10, 11, 12, 20, 20, 21, 30],
        "b": [11, 12, 13, 21, 22, 22, 31],
    })
    got = cluster_pairs_min_label(rd.from_pandas(pairs).repartition(3))
    want = cluster_pairs(pairs)
    pd.testing.assert_frame_equal(got, want)
    # the distributed rounds (driver fast path bypassed) must agree too
    got_dist = cluster_pairs_min_label(
        rd.from_pandas(pairs).repartition(3), driver_max=None)
    pd.testing.assert_frame_equal(got_dist, want)
    assert got[got["doc_id"].isin([10, 11, 12, 13])]["cluster_id"] \
        .eq(10).all()


def test_stratified_sample_quota_and_determinism():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.curation import stratified_sample

    rng = np.random.default_rng(5)
    # skewed groups: 500/50/5 rows
    df = pd.DataFrame({
        "doc_id": np.arange(555, dtype=np.int64),
        "lang": ["en"] * 500 + ["fr"] * 50 + ["de"] * 5,
    })
    out = stratified_sample(rd.from_pandas(df.sample(frac=1, random_state=0)),
                            n_per_group=20, group_col="lang",
                            key_cols=["doc_id"]).to_pandas()
    counts = out["lang"].value_counts().to_dict()
    assert counts == {"en": 20, "fr": 20, "de": 5}  # capped by group size
    # deterministic and input-order-independent
    out2 = stratified_sample(rd.from_pandas(df), n_per_group=20,
                             group_col="lang",
                             key_cols=["doc_id"]).to_pandas()
    a = out.sort_values(["lang", "doc_id"], ignore_index=True)
    b = out2.sort_values(["lang", "doc_id"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_dup_ngram_fraction_planted_copy():
    from ttmf_ray.stages.curation import dup_ngram_fraction

    out = dup_ngram_fraction(_ds(DOCS), min_count=2).to_pandas() \
        .set_index("doc_id").sort_index()
    # docs 0 and 2 are identical: every shingle occurs in >= 2 docs
    for d in (0, 2):
        assert out.loc[d, "n_dup"] == out.loc[d, "n_shingles"] > 0
        assert out.loc[d, "dup_fraction"] == 1.0
        assert out.loc[d, "flagged"] == 1
    # docs 1 and 3 share exactly ONE trigram ("stream processing engines")
    for d in (1, 3):
        assert out.loc[d, "n_dup"] == 1
        assert out.loc[d, "flagged"] == 0
    # the 2-word doc gets a whole-doc hash shared with nothing
    assert out.loc[4, "n_shingles"] == 1
    assert out.loc[4, "n_dup"] == 0


def test_domain_stats_gate_matches_pandas():
    from ttmf_ray.stages.curation import domain_stats
    from ttmf_ray.stages.text import quality_batch

    srcs = ["a", "a", "b", "b", "b", "c"]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(DOCS + ["tiny"], pa.string()),
                  "source": pa.array(srcs, pa.string())})
    out = domain_stats(rd.from_arrow(t), min_docs=2).to_pandas() \
        .set_index("source").sort_index()
    q = quality_batch(t, id_col="source", text_col="text").to_pandas()
    ref = q.groupby("doc_id").agg(n=("n_chars", "size"),
                                  st=("n_tokens", "sum"),
                                  ss=("stop_cnt", "sum"))
    assert (out["n_docs"] == ref["n"].reindex(out.index)).all()
    assert (out["sum_tokens"] == ref["st"].reindex(out.index)).all()
    ratio = np.round(ref["ss"] / ref["st"], 6).reindex(out.index)
    assert np.allclose(out["stop_ratio"], ratio)
    # c has a single doc -> fails the min_docs gate regardless of quality
    assert out.loc["c", "keep"] == 0


def test_remove_dup_spans_surgery():
    """Cross-doc duplicated windows are excised token-exactly; a phrase
    repeated only WITHIN one doc survives (>=2 distinct docs rule); case
    differences don't defeat the match (hashes are case-insensitive)."""
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.curation import remove_dup_spans

    shared = "the quick brown fox jumps"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"alpha beta {shared} gamma delta",
            f"one two {shared.upper()} three four",
            "unique words only here nothing repeats at all",
            "self self self self self self but only in this doc",
        ],
    })
    out = remove_dup_spans(rd.from_pandas(docs), ngram=5).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out.loc[0, "text_clean"] == "alpha beta gamma delta"
    assert out.loc[1, "text_clean"] == "one two three four"
    assert out.loc[2, "text_clean"] == docs.loc[2, "text"]
    assert out.loc[3, "text_clean"] == docs.loc[3, "text"]
    assert out["n_tokens"].tolist() == [9, 9, 8, 11]
    assert out["n_kept"].tolist() == [4, 4, 8, 11]


def test_cdc_chunks_survive_prefix_insertion(ray_session):
    """Content-anchored boundaries: prepending tokens to a doc must not
    shift the chunking of the shared suffix (fixed-size blocks would)."""
    import ray.data as rd

    from ttmf_ray.stages.curation import cdc_dedup

    body = " ".join(f"tok{i % 37}x{(i * 7) % 23}" for i in range(400))
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": [body, "alpha beta gamma " + body],
    })
    out = cdc_dedup(rd.from_pandas(docs)).to_pandas()
    # every interior chunk of the shared body dedups across the two docs
    assert len(out) >= 5
    assert (out["n_docs"] == 2).sum() >= 5
