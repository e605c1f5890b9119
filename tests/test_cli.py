"""S13 CLI surface: the `python -m ttmf_ray.run` subcommands drive the
same pipelines end-to-end from a fresh process (the ray job submit
shape), including the reference-style .properties config path."""

import json
import os
import subprocess
import sys


def _run(args, timeout=420):
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-m", "ttmf_ray.run", "--num-cpus", "4", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cli_e2e_and_trust_config(tmp_path):
    out = _run(["e2e", "--sf-dir", "/root/testdata/sf0.001",
                "--out", str(tmp_path / "run")])
    assert out["edges"] > 0 and out["scored"] > 0
    assert os.path.isdir(str(tmp_path / "run") + "/scores")

    # trust over the edges the e2e run wrote, with a reference-style
    # properties config (tiny dims/epochs so the test stays fast)
    cfgf = tmp_path / "kge.properties"
    cfgf.write_text(
        "DIMENSION=16\nEPOCHES=6\nMARGIN=1.0\nSTEP_SIZE=0.02\n"
        "NORM=L2\nNEG_SAMPLE_COUNT=15\nBIAS=7.0\n")
    out2 = _run(["trust", "--edges", str(tmp_path / "run" / "edges"),
                 "--out", str(tmp_path / "scores2"),
                 "--config", str(cfgf)])
    assert out2["scored"] > 0 and 0.0 <= out2["accuracy"] <= 1.0


def test_cli_kmeans_dedup_curate(tmp_path):
    out = _run(["kmeans", "--embeddings",
                "/root/testdata/sf0.001/embeddings.parquet",
                "--out", str(tmp_path / "km"), "--k", "4", "--iters", "2"])
    assert out["k"] == 4 and os.path.isdir(str(tmp_path / "km"))
    assert os.path.exists(str(tmp_path / "km") + "_centroids.txt")

    out = _run(["dedup", "--docs",
                "/root/testdata/sf0.001/documents.parquet",
                "--out", str(tmp_path / "dups")])
    assert os.path.isdir(str(tmp_path / "dups"))
    # hot-bucket counters always surface ("no silent caps")
    assert out["n_buckets"] >= 0 and out["n_capped_buckets"] >= 0

    out = _run(["curate", "--docs",
                "/root/testdata/sf0.001/documents.parquet",
                "--out", str(tmp_path / "curated"), "--shards", "4"])
    assert out["shards_total"] == 4 and out["shards_processed"] == 4
    assert os.path.isdir(str(tmp_path / "curated" / "shard=0"))


def test_cli_bpe_index_graph(tmp_path):
    out = _run(["bpe", "--docs", "/root/testdata/sf0.001/documents.parquet",
                "--out", str(tmp_path / "merges.jsonl"), "--merges", "6"])
    assert out["merges"] == 6

    out = _run(["index", "--docs",
                "/root/testdata/sf0.001/documents.parquet",
                "--out", str(tmp_path / "idx"), "--probe", "hash join"])
    assert out["hits"] == 25          # pinned by the docs_phrase_search oracle

    import numpy as np
    import pandas as pd
    pd.DataFrame({"a": np.array([1, 1, 2], dtype=np.int64),
                  "b": np.array([2, 3, 3], dtype=np.int64)}) \
        .to_parquet(tmp_path / "pairs.parquet")
    out = _run(["graph", "--pairs", str(tmp_path / "pairs.parquet"),
                "--out", str(tmp_path / "tri")])
    assert out["rows"] == 3           # the 3-cycle: every node tri=1
