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


def test_candidate_pairs_hot_bucket_stats(ray_session):
    """Planted hot bucket: with_stats surfaces the capped-bucket counter
    ("no silent caps"), the capped bucket emits chain pairs only, and
    the default (no-stats) path is unchanged."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.dedup import candidate_pairs

    hot_n = 12
    rows = pd.DataFrame({
        "band": np.concatenate([np.zeros(hot_n), np.ones(3)]).astype(
            np.int32),
        "band_hash": np.concatenate([np.full(hot_n, 111),
                                     np.full(3, 222)]).astype(np.uint64),
        "doc_id": np.concatenate([np.arange(hot_n),
                                  100 + np.arange(3)]).astype(np.int64),
    })
    ds = rd.from_pandas(rows)
    pairs, stats = candidate_pairs(ds, cap=8, with_stats=True)
    pdf = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert int(stats["n_buckets"].iloc[0]) == 2
    assert int(stats["n_capped"].iloc[0]) == 1
    assert int(stats["max_bucket"].iloc[0]) == hot_n
    hot = pdf[pdf["a"] < 100]
    assert len(hot) == hot_n - 1          # chain, not all-pairs
    assert len(pdf[pdf["a"] >= 100]) == 3  # 3-doc bucket: all pairs
    assert (pdf["a"] >= 0).all()           # no sentinel leaked
    # default path: identical pair set, no stats
    plain = candidate_pairs(ds, cap=8).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, pdf)


def test_minhash_skips_zero_shingle_docs(ray_session):
    """Docs with zero shingles (no words at all) emit NO bucket rows (their
    all-MERSENNE signatures would otherwise pair all such docs with
    est_j=1.0 while the SQL mirror, built from the shingle table, never
    sees them — ADVICE r2)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.dedup import MinHashLSH, candidate_pairs

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["",                   # zero words → zero shingles
                 "...!?  ",            # zero words → zero shingles
                 "alpha beta gamma delta epsilon",
                 "alpha beta gamma delta epsilon",
                 "totally different text entirely here"],
    })
    buckets = rd.from_pandas(docs).map_batches(
        MinHashLSH, batch_format="pyarrow", concurrency=(1, 2),
        fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text",
                               "k": 8, "n_bands": 4})
    bdf = buckets.to_pandas()
    assert not set(bdf["doc_id"]) & {0, 1}
    pairs = candidate_pairs(buckets).to_pandas()
    assert set(zip(pairs["a"], pairs["b"])) == {(2, 3)}
