"""Exact-resume: kill mid-run, re-submit, identical output, no
double-counted partitions (BASELINE.md correctness gate)."""

import glob
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ttmf_ray.pipelines.kg_construct import (kg_construct,
                                             kg_construct_resumable)
from ttmf_ray.sources.pages import CorpusSpec, pages_dataset
from ttmf_ray.state.manifest import completed_shards


def _edges_on_disk(out_dir):
    parts = sorted(glob.glob(f"{out_dir}/shard=*/part-*.parquet"))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    return df.drop_duplicates().sort_values(["subj", "pred", "obj"]) \
        .reset_index(drop=True)


def test_resume_after_injected_failure(tmp_path):
    spec = CorpusSpec(seed=42, n_pages=300)
    out = str(tmp_path / "edges")

    with pytest.raises(RuntimeError, match="injected failure"):
        kg_construct_resumable(spec, out, n_shards=4, fail_after_shards=2)
    assert len(completed_shards(out)) == 2

    r = kg_construct_resumable(spec, out, n_shards=4)
    assert r == {"shards_total": 4, "shards_skipped": 2,
                 "shards_processed": 2}

    # re-running again is a no-op (no double-processing)
    r2 = kg_construct_resumable(spec, out, n_shards=4)
    assert r2["shards_processed"] == 0

    # resumed output == single-shot output (as distinct triple sets)
    resumed = _edges_on_disk(out)
    direct = kg_construct(pages_dataset(spec)).to_pandas() \
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, direct)

    # manifests carry lineage + counters
    recs = completed_shards(out)
    assert all(rec.counters["pages"] > 0 for rec in recs.values())
    assert all(rec.input_fingerprint.startswith("s42:") for rec in recs.values())


def test_trust_resume_after_injected_failure(tmp_path):
    """Phase-B resume: shard manifests skip finished partitions and the
    re-run loads the trained embeddings from the stage checkpoint."""
    from ttmf_ray.functions.transe import TransEConfig
    from ttmf_ray.pipelines.trust import TrustConfig, trust_scores_resumable

    spec = CorpusSpec(seed=42, n_pages=400)
    edges = kg_construct(pages_dataset(spec)).materialize()
    cfg = TrustConfig(
        transe=TransEConfig(dim=16, epochs=10, lr=0.02),
        ptranse=TransEConfig(dim=16, epochs=4, lr=0.01, loss="logistic"),
        path_max_paths=2000, kge_workers=2,
        fusion_epochs=20,
    )
    out = str(tmp_path / "scores")

    with pytest.raises(RuntimeError, match="injected failure"):
        trust_scores_resumable(edges, out, cfg, n_shards=4,
                               fail_after_shards=2)
    assert len(completed_shards(out)) == 2

    r = trust_scores_resumable(edges, out, cfg, n_shards=4)
    assert r["shards_skipped"] == 2 and r["shards_processed"] == 2
    # the re-run hit the KGE stage checkpoint (no retraining)
    recs = completed_shards(out)
    assert any(rec.counters.get("kge_ckpt_hit") == 1 for rec in recs.values())

    # third run is a pure no-op
    r3 = trust_scores_resumable(edges, out, cfg, n_shards=4)
    assert r3["shards_processed"] == 0

    # resumed shards reassemble into one deterministic scored table
    parts = sorted(glob.glob(f"{out}/shard=*/part-*.parquet"))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    assert len(df) == len(df.drop_duplicates(["h", "t", "r", "flag"]))
    assert df["conf"].notna().all() and len(df) > 0


def test_fingerprint_drift_triggers_rerun(tmp_path):
    spec = CorpusSpec(seed=42, n_pages=120)
    out = str(tmp_path / "edges")
    kg_construct_resumable(spec, out, n_shards=2)

    # same output dir, different corpus seed → all shards must re-run
    spec2 = CorpusSpec(seed=43, n_pages=120)
    r = kg_construct_resumable(spec2, out, n_shards=2)
    assert r["shards_processed"] == 2

    shutil.rmtree(out, ignore_errors=True)


def test_trust_resumed_matches_uninterrupted(tmp_path):
    """VERDICT r3 item 6: the conf table assembled by a killed-then-
    resumed phase-B run must match an uninterrupted run within the
    pinned drift scheme (CLAUDE.md rules 14/25): h/t/r/flag EXACT,
    conf |diff| bounded loosely (multi-epoch float training amplifies
    per-op alignment drift; a tight atol is a flaky pin) plus a
    drift-SHAPE bound (few rows past one 6-dp quantum)."""
    import numpy as np

    from ttmf_ray.functions.transe import TransEConfig
    from ttmf_ray.pipelines.trust import TrustConfig, trust_scores_resumable

    spec = CorpusSpec(seed=42, n_pages=400)
    edges = kg_construct(pages_dataset(spec)).materialize()
    cfg = TrustConfig(
        transe=TransEConfig(dim=16, epochs=10, lr=0.02),
        ptranse=TransEConfig(dim=16, epochs=4, lr=0.01, loss="logistic"),
        path_max_paths=2000, kge_workers=2,
        fusion_epochs=20,
    )

    def collect(out_dir):
        parts = sorted(glob.glob(f"{out_dir}/shard=*/part-*.parquet"))
        df = pd.concat([pq.read_table(p).to_pandas() for p in parts])
        return df.sort_values(["h", "t", "r"], ignore_index=True)

    out_ref = str(tmp_path / "ref")
    trust_scores_resumable(edges, out_ref, cfg, n_shards=4)
    ref = collect(out_ref)

    out_res = str(tmp_path / "res")
    with pytest.raises(RuntimeError, match="injected failure"):
        trust_scores_resumable(edges, out_res, cfg, n_shards=4,
                               fail_after_shards=1)
    assert len(completed_shards(out_res)) == 1
    r = trust_scores_resumable(edges, out_res, cfg, n_shards=4)
    assert r["shards_skipped"] == 1 and r["shards_processed"] == 3
    res = collect(out_res)

    # keys + labels exact
    pd.testing.assert_frame_equal(ref[["h", "t", "r", "flag"]],
                                  res[["h", "t", "r", "flag"]])
    # conf: loose max bound (>=10x the measured 5e-6 worst case) and a
    # drift-shape bound — most rows agree to well under a 6-dp quantum
    d = np.abs(ref["conf"].to_numpy() - res["conf"].to_numpy())
    assert d.max() <= 1e-4, d.max()
    assert (d > 1e-6).mean() <= 0.15, (d > 1e-6).mean()
