"""Streaming phase B (trust_pipeline_streaming): no triple/conf payload on
the driver heap, BIT-IDENTICAL scored_test vs the default driver path for
the same pinned worker counts (SURVEY.md §7.5)."""

import numpy as np
import pandas as pd
import pytest

from ttmf_ray.functions.transe import TransEConfig
from ttmf_ray.pipelines.kg_construct import kg_construct
from ttmf_ray.pipelines.trust import TrustConfig, trust_pipeline
from ttmf_ray.sources.pages import CorpusSpec, pages_dataset


@pytest.fixture(scope="module")
def both_results():
    from dataclasses import replace

    spec = CorpusSpec(seed=42, n_pages=350)
    edges = kg_construct(pages_dataset(spec)).materialize()
    base = TrustConfig(
        transe=TransEConfig(dim=16, epochs=8, lr=0.02),
        ptranse=TransEConfig(dim=16, epochs=3, lr=0.01, loss="logistic"),
        path_max_paths=2000,
        kge_workers=3,   # pinned: shard assignment must match across paths
    )
    driver = trust_pipeline(edges, base)
    streaming = trust_pipeline(edges, replace(base, streaming=True))
    return driver, streaming


def test_streaming_scored_test_bit_identical(both_results):
    """Every FEATURE column is bit-identical; the fused ``conf`` matches
    within float rounding (fusion training crosses a process boundary in
    streaming mode — alignment-sensitive SIMD reduction order inside the
    numpy kernels can differ by ~1 ulp, measured 1.1e-16)."""
    driver, streaming = both_results
    a = driver["scored_test"]
    b = streaming["scored_test"]
    assert len(a) == len(b) and len(a) > 0
    assert set(a.columns) == set(b.columns)
    for c in a.columns:
        if c == "conf":
            assert np.allclose(a[c].to_numpy(), b[c].to_numpy(),
                               rtol=0, atol=1e-9)
        else:
            assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_streaming_conf_valid_bit_identical(both_results):
    """The whole wide feature table (the join-attached path) is
    bit-identical to the driver path's packed-probe attach — values AND
    dtypes, including int8 flag / float32 transV through the
    null-widened union joins."""
    driver, streaming = both_results
    a = driver["conf_valid"].sort_values(["h", "t", "r", "flag"],
                                         ignore_index=True)
    b = streaming["conf_valid"]
    common = [c for c in a.columns if c in b.columns]
    assert len(common) >= 40
    for c in common:
        assert a[c].dtype == b[c].dtype, c
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_streaming_thresholds_identical(both_results):
    driver, streaming = both_results
    assert driver["theta_r"] == streaming["theta_r"]
    assert driver["theta_h"] == streaming["theta_h"]


def test_streaming_metrics_match(both_results):
    driver, streaming = both_results
    assert abs(driver["accuracy"] - streaming["accuracy"]) < 1e-6
    assert abs(driver["max_f1"] - streaming["max_f1"]) < 1e-6
    pd.testing.assert_frame_equal(driver["pr_sweep"], streaming["pr_sweep"],
                                  atol=1e-9, rtol=0)


def test_streaming_exposes_result_dataset(both_results):
    _, streaming = both_results
    # the scale consumer writes parquet from the Dataset instead of
    # collecting — the handle must be a consumable Ray Dataset
    ds = streaming["scored_ds"]
    assert hasattr(ds, "write_parquet")
    assert "conf" in ds.schema().names


def test_streaming_slow_build_parity(both_results, monkeypatch):
    """The >STREAM_FAST_MAX Dataset build (vocab/id-map/labeled_examples
    executions) stays bit-identical to the fast single-task assemble —
    forced via GRAFT_STREAM_FAST_MAX=0 on the same corpus."""
    from dataclasses import replace

    monkeypatch.setenv("GRAFT_STREAM_FAST_MAX", "0")
    spec = CorpusSpec(seed=42, n_pages=350)
    edges = kg_construct(pages_dataset(spec)).materialize()
    base = TrustConfig(
        transe=TransEConfig(dim=16, epochs=8, lr=0.02),
        ptranse=TransEConfig(dim=16, epochs=3, lr=0.01, loss="logistic"),
        path_max_paths=2000,
        kge_workers=3,
    )
    slow = trust_pipeline(edges, replace(base, streaming=True))
    _, fast = both_results
    a = fast["conf_valid"]
    b = slow["conf_valid"]
    assert len(a) == len(b) and len(a) > 0
    for c in a.columns:
        assert a[c].dtype == b[c].dtype, c
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
    assert fast["theta_r"] == slow["theta_r"]
    assert fast["theta_h"] == slow["theta_h"]
