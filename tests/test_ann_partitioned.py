"""IVF index on storage: bucket-partitioned parquet + probe-pruned reads
must reproduce the in-memory IVF exactly (same centroids/probes)."""

import numpy as np
import pandas as pd


def test_ivf_partitioned_matches_inmemory(sf_dir, tmp_path):
    import ray.data as rd

    from ttmf_ray.stages.ann import (ivf_build_partitioned, ivf_topk,
                                     ivf_topk_partitioned)

    src = f"{sf_dir}/embeddings.parquet"
    ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in ds.limit(3).to_pandas()["embedding"]])
    out_dir = str(tmp_path / "ivf")
    cents = ivf_build_partitioned(rd.read_parquet(src), out_dir,
                                  n_centroids=8, seed=13)
    assert cents.shape[0] == 8

    got = ivf_topk_partitioned(out_dir, q, 5, n_probe=3)
    want = ivf_topk(rd.read_parquet(src), q, 5, n_centroids=8, n_probe=3,
                    seed=13)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    # probe pruning is real: fewer bucket dirs read than exist
    import os

    n_dirs = len([d for d in os.listdir(out_dir) if d.startswith("bucket=")])
    assert n_dirs >= 3  # index actually partitioned
