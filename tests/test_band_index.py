"""Band index on storage: partitioned parquet + probe-pruned reads must
emit exactly the in-memory incremental candidate pairs."""

import os

import numpy as np
import pandas as pd
import ray.data as rd


def test_band_index_probe_matches_inmemory(sf_dir, tmp_path):
    from ttmf_ray.pipelines.corpus_queries import _docs_with_planted_dups
    from ttmf_ray.stages.dedup import (MinHashLSH, build_band_index,
                                       candidate_pairs,
                                       incremental_pairs_from_index)

    df = _docs_with_planted_dups(sf_dir)
    existing = df[df["doc_id"] < 10_000_000].reset_index(drop=True)
    new = df[df["doc_id"] >= 10_000_000].reset_index(drop=True)

    idx_dir = str(tmp_path / "bandidx")
    build_band_index(rd.from_pandas(existing), idx_dir, n_index_parts=32)
    n_dirs = len([d for d in os.listdir(idx_dir) if d.startswith("ipart=")])
    assert n_dirs >= 8  # index actually partitioned

    got = incremental_pairs_from_index(
        idx_dir, rd.from_pandas(new), new_from=10_000_000,
        n_index_parts=32).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    # in-memory reference: bucket everything, incremental candidates
    allb = rd.from_pandas(df).map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text"},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 2),
    )
    want = candidate_pairs(allb, new_from=10_000_000).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))
    assert len(got) >= 20  # planted new docs produce candidates
