"""S13 properties config parsing + deterministic_sample (O-family
downsample stand-in, `get_triples/train_test_split.py:33,38-39`)."""

import numpy as np
import pandas as pd
import pytest

import os
import sys

import __ray_entry__ as entrymod

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_harness import compare, duckdb_con, to_pandas  # noqa: E402


def test_parse_reference_template(monkeypatch, tmp_path):
    from ttmf_ray.functions.config import (parse_properties,
                                           transe_config_from_properties)

    monkeypatch.setenv("TRAIN_FILE_PATH", "/data/train.tsv")
    props = parse_properties(
        "/root/reference/KGE_config_template.properties")
    assert props["TRAIN_FILE_PATH"] == "/data/train.tsv"  # ${VAR} subst
    cfg = transe_config_from_properties(props)
    # template defaults: DIMENSION=100 MARGIN=1.0 STEP_SIZE=0.001
    # EPOCHES=50 NEG_SAMPLE_COUNT=15 BIAS=7.0
    assert (cfg.dim, cfg.epochs, cfg.margin, cfg.lr) == (100, 50, 1.0, 0.001)
    assert (cfg.neg_per_pos, cfg.bias) == (15, 7.0)

    bad = tmp_path / "l1.properties"
    bad.write_text("NORM=L1\n")
    with pytest.raises(ValueError):
        transe_config_from_properties(str(bad))


def test_deterministic_sample_is_batch_order_independent():
    import ray.data as rd

    from ttmf_ray.functions.sampling import deterministic_sample

    df = pd.DataFrame({"a": np.arange(1000), "b": np.arange(1000) % 7})
    one = deterministic_sample(rd.from_pandas(df), n=50,
                               key_cols=["a"]).to_pandas()
    # different block structure, same rows
    many = deterministic_sample(
        rd.from_pandas(df).repartition(13), n=50, key_cols=["a"]
    ).to_pandas()
    assert one["a"].tolist() == many["a"].tolist()
    assert len(one) == 50 and one["a"].is_unique


def test_grouped_topk_block_structure_invariant():
    import ray.data as rd

    from ttmf_ray.functions.topk import grouped_topk

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 5, 500),
                       "v": rng.integers(0, 100, 500),
                       "id": np.arange(500)})
    kw = dict(key_cols=["g"], value_col="v", k=4, tiebreak_cols=["id"])
    one = grouped_topk(rd.from_pandas(df), **kw).to_pandas() \
        .sort_values(["g", "id"]).reset_index(drop=True)
    many = grouped_topk(rd.from_pandas(df).repartition(17), **kw) \
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    assert (one.groupby("g").size() == 4).all()
    # matches a plain pandas nlargest per group
    want = (df.sort_values(["g", "v", "id"], ascending=[True, False, True])
            .groupby("g").head(4).sort_values(["g", "id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(one[["g", "v", "id"]], want)


def test_top_docs_per_lang_matches_oracle(sf_dir):
    con = duckdb_con(sf_dir)
    ray_df = to_pandas(entrymod.queries()["top_docs_per_lang"](sf_dir))
    sql_df = con.execute(entrymod.oracle_sql()["top_docs_per_lang"]).df()
    problems = compare("top_docs_per_lang", ray_df, sql_df)
    assert not problems, problems


def test_lineitem_sample_matches_oracle(sf_dir):
    con = duckdb_con(sf_dir)
    ray_df = to_pandas(entrymod.queries()["lineitem_sample"](sf_dir))
    sql_df = con.execute(entrymod.oracle_sql()["lineitem_sample"]).df()
    problems = compare("lineitem_sample", ray_df, sql_df)
    assert not problems, problems
