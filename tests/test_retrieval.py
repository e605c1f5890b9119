"""Behavioral tests for stages/retrieval.py + the PQ encoder — the
oracle-parity rows live in test_oracle_parity.py; these pin the
semantic guarantees the mirrors can't express."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows)).materialize()


def test_winnowing_shared_substring_guarantee():
    """Any shared run of >= window+ngram-1 tokens must yield at least
    one shared (hash) fingerprint — the Schleimer et al. guarantee."""
    from ttmf_ray.stages.retrieval import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens >= 4+3-1
    ds = _docs([
        {"doc_id": 1, "text": "one two " + shared + " three"},
        {"doc_id": 2, "text": shared + " nine ten eleven twelve"},
        {"doc_id": 3, "text": "totally different words here only"},
    ])
    out = winnow_fingerprints(ds, ngram=3, window=4).to_pandas()
    fp1 = set(out.loc[out.doc_id == 1, "fp"])
    fp2 = set(out.loc[out.doc_id == 2, "fp"])
    fp3 = set(out.loc[out.doc_id == 3, "fp"])
    assert fp1 & fp2, "shared substring must share a fingerprint"
    assert not (fp1 & fp3)
    # positions are in-doc token indices of selected n-gram starts
    assert (out["pos"] >= 0).all()


def test_weighted_sample_bias_and_determinism():
    from ttmf_ray.stages.curation import weighted_sample

    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # second half 50x heavier
        "n_chars": np.r_[np.full(n // 2, 10), np.full(n // 2, 500)],
    })
    ds = rd.from_pandas(df).materialize()
    s1 = weighted_sample(ds, n=80)
    s2 = weighted_sample(ds, n=80)
    pd.testing.assert_frame_equal(s1, s2)          # seeded → identical
    heavy = (s1["doc_id"] >= n // 2).mean()
    assert heavy > 0.8, f"heavy half should dominate, got {heavy}"


def test_tfidf_prefers_rare_terms():
    from ttmf_ray.stages.retrieval import tfidf_top_terms

    ds = _docs([
        {"doc_id": 0, "text": "common rareword rareword rareword"},
        {"doc_id": 1, "text": "common common common"},
        {"doc_id": 2, "text": "common stuff common things"},
    ])
    out = tfidf_top_terms(ds, k=1).to_pandas()
    top0 = out.loc[out.doc_id == 0, "token"].iloc[0]
    assert top0 == "rareword"


def test_pq_codes_shape_and_determinism(sf_dir):
    from ttmf_ray.stages.cluster import pq_codes

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = pq_codes(ds, m=2, k=4, n_iter=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert set(out.columns) == {"vec_id", "c0", "d0", "c1", "d1"}
    assert out["c0"].between(0, 3).all() and out["c1"].between(0, 3).all()
    # both subspace codebooks actually used
    assert out["c0"].nunique() > 1 and out["c1"].nunique() > 1
    out2 = pq_codes(ds, m=2, k=4, n_iter=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_source_kl_zero_for_uniform_source():
    """A source whose token distribution equals the corpus's has KL 0
    (identical docs in every source)."""
    from ttmf_ray.stages.retrieval import source_kl

    ds = _docs([{"doc_id": i, "source": f"s{i % 2}",
                 "text": "same words every time"} for i in range(10)])
    out = source_kl(ds)
    assert np.allclose(out["kl"], 0.0)
