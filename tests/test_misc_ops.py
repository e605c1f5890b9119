"""Coverage for smaller operators: label one-hot, id unmapping, KGC
negative determinism, simhash banding, fingerprints, split column."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_label_onehot():
    from ttmf_ray.functions.sampling import label_onehot

    t = pa.table({"flag": pa.array([1, -1, 1], pa.int8())})
    out = label_onehot(t)
    labels = out.column("label").to_pylist()
    assert labels == [[0, 1], [1, 0], [0, 1]]


def test_id_unmapper_roundtrip():
    from ttmf_ray.context import Broadcast
    from ttmf_ray.functions.vocab import IdMapper, IdUnmapper

    ents = np.array(["A", "B", "C"], dtype=object)
    rels = np.array(["likes"], dtype=object)
    t = pa.table({
        "subj": pa.array(["B", "C"]), "pred": pa.array(["likes"] * 2),
        "obj": pa.array(["A", "B"]),
    })
    mapped = IdMapper(Broadcast(ents), Broadcast(rels))(t)
    back = IdUnmapper(Broadcast(ents), Broadcast(rels))(mapped)
    assert back.column("subj").to_pylist() == ["B", "C"]
    assert back.column("obj").to_pylist() == ["A", "B"]
    assert back.column("pred").to_pylist() == ["likes", "likes"]


def test_idmapper_unknown_maps_to_minus_one():
    from ttmf_ray.context import Broadcast
    from ttmf_ray.functions.vocab import IdMapper

    m = IdMapper(Broadcast(np.array(["A"], dtype=object)),
                 Broadcast(np.array(["r"], dtype=object)))
    t = pa.table({"subj": pa.array(["Z"]), "pred": pa.array(["r"]),
                  "obj": pa.array(["A"])})
    out = m(t)
    assert out.column("h").to_pylist() == [-1]
    assert out.column("t").to_pylist() == [0]


def test_kgc_negatives_deterministic_and_shaped():
    from ttmf_ray.functions.sampling import KGCNegatives

    t = pa.table({
        "h": pa.array([0, 1], pa.int32()),
        "t": pa.array([1, 2], pa.int32()),
        "r": pa.array([0, 0], pa.int32()),
    })
    gen = KGCNegatives(slot="tail", vocab_size=10, k=5)
    a = gen(t)
    b = KGCNegatives(slot="tail", vocab_size=10, k=5)(t)
    assert a.equals(b)
    # 2 kept pairs × (5 draws + original) = 12 rows, all flag=1
    assert a.num_rows == 12
    assert set(a.column("flag").to_pylist()) == {1}
    # originals present
    rows = set(zip(a.column("h").to_pylist(), a.column("t").to_pylist()))
    assert (0, 1) in rows and (1, 2) in rows


def test_kgc_negatives_dedup_across_batches():
    """Duplicated kept pairs split across partitions must dedup globally
    (the per-batch seen-set leak the reference's global groupby(ix).first()
    never had — process_triples.py:38-39)."""
    from ttmf_ray.functions.sampling import kgc_negatives

    df = pd.DataFrame({
        "h": np.array([0, 1, 0, 5], dtype=np.int32),
        "t": np.array([1, 2, 3, 2], dtype=np.int32),  # kept (h,r): (0,0) dup
        "r": np.array([0, 0, 0, 0], dtype=np.int32),
    })
    ds = rd.from_pandas(df).repartition(4)  # duplicates land in different blocks
    out = kgc_negatives(ds, slot="tail", vocab_size=10, k=5).to_pandas()
    # 3 distinct kept pairs × 6 rows; representative t = min over dups
    assert len(out) == 18
    kept = out[["h", "r"]].drop_duplicates()
    assert len(kept) == 3
    originals = set(map(tuple, out[["h", "t", "r"]].values.tolist()))
    assert (0, 1, 0) in originals  # min-t representative of the (0,_,0) dup


def test_unk_replacement_matches_reference_fixture():
    """M4 (`train_test_split.py:15-16,45-48`): OOV → UNKENT/UNKREL in the
    full table; ONE UNK triple appended to train; test filtered to the
    train vocab."""
    from ttmf_ray.functions.vocab import (UNKENT, UNKREL, apply_unk,
                                          split_with_unk)

    df = pd.DataFrame({
        "subj": [f"e{i % 7}" for i in range(40)] + ["rare_subj"],
        "pred": [f"r{i % 3}" for i in range(40)] + ["rare_rel"],
        "obj": [f"e{(i + 1) % 7}" for i in range(40)] + ["rare_obj"],
    })
    train, dev, test, unk_table = split_with_unk(df, seed=628)
    # appended UNK row present exactly once in train
    unk_rows = train[(train["subj"] == UNKENT) & (train["pred"] == UNKREL)
                     & (train["obj"] == UNKENT)]
    assert len(unk_rows) == 1
    # dev/test contain only train-vocab triples
    uniq_ent = set(train["subj"]) | set(train["obj"]) - {UNKENT}
    for part in (dev, test):
        assert part["subj"].isin(uniq_ent).all()
        assert part["obj"].isin(uniq_ent).all()
    # the unk table keeps every row, OOV replaced
    assert len(unk_table) == len(df)
    assert not ((unk_table["subj"] == "rare_subj")
                & (unk_table["pred"] == "rare_rel")).any() \
        or "rare_subj" in set(train["subj"])
    # Dataset variant: apply_unk rewrites OOV against an explicit vocab
    ent_df = pd.DataFrame({"name": ["e0", "e1"], "id": [0, 1]})
    rel_df = pd.DataFrame({"name": ["r0"], "id": [0]})
    small = pd.DataFrame({"subj": ["e0", "zz"], "pred": ["r0", "qq"],
                          "obj": ["e1", "e9"]})
    out = apply_unk(rd.from_pandas(small), ent_df, rel_df).to_pandas()
    assert out.iloc[0].tolist() == ["e0", "r0", "e1"]
    assert out.iloc[1].tolist() == [UNKENT, UNKREL, UNKENT]


def test_simhash_near_duplicates_share_band():
    from ttmf_ray.stages.dedup import hamming64, simhash64, simhash_buckets

    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy")
    far = "completely different content about quantum turbines " * 20
    h1, h2, h3 = simhash64(base), simhash64(near), simhash64(far)
    assert hamming64(h1, h2) < hamming64(h1, h3)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "simhash": pa.array([h1, h2], pa.uint64())})
    bands = simhash_buckets(t).to_pandas()
    shared = bands.groupby(["band", "band_hash"])["doc_id"].nunique()
    if hamming64(h1, h2) <= 3:  # pigeonhole guarantee with 4 bands
        assert (shared >= 2).any()


def test_fingerprint_sensitivity():
    from ttmf_ray.stages.text import fingerprint

    assert fingerprint("abc") != fingerprint("abd")
    assert fingerprint("abc") == fingerprint("abc")


def test_split_bucket_matches_sql_arithmetic():
    import duckdb

    from ttmf_ray.functions.sampling import split_bucket

    h = np.arange(50, dtype=np.int64)
    t = (h * 7) % 23
    r = h % 5
    got = split_bucket(h, t, r)
    con = duckdb.connect()
    df = pd.DataFrame({"h": h, "t": t, "r": r})
    con.register("x", df)
    want = con.execute(
        "SELECT ((h*2654435761 + t*40503 + r*2246822519) % 2147483648) % 10"
        " FROM x"
    ).df().iloc[:, 0].to_numpy()
    assert (got == want).all()


def test_pages_extract_query_all_match(sf_dir):
    from ttmf_ray.pipelines.corpus_queries import pages_extract

    out = pages_extract(sf_dir).to_pandas()
    assert out["match"].all()


def test_docs_compression_ratio_scalar_oracle(ray_session):
    """docs_compression_ratio: per-doc values must equal an independent
    zlib re-compress (level 6) of the same utf-8 bytes."""
    import zlib

    import numpy as np
    import pyarrow.parquet as pq

    from ttmf_ray.pipelines.relational import docs_compression_ratio

    sf = "/root/testdata/sf0.001"
    out = docs_compression_ratio(sf).set_index("doc_id")
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for _, row in docs.head(25).iterrows():
        enc = row["text"].encode("utf-8")
        r = out.loc[row["doc_id"]]
        assert r["n_bytes"] == len(enc)
        assert r["n_compressed"] == len(zlib.compress(enc, 6))
    # ratios in a sane band and the flag consistent with the ratio
    assert ((out["ratio"] > 0) & (out["ratio"] < 1.5)).all()
    assert (out["low_info"] == (out["n_compressed"]
                                / np.maximum(out["n_bytes"], 1)
                                < 0.35).astype(int)).all()


def test_corpus_skew_knob():
    """CorpusSpec.skew: default 3.0 reproduces the historical U^3
    corpus bitwise (cache compatibility); skew=8.0 plants a hub —
    one subject entity heads >15% of fact instances."""
    import collections

    from ttmf_ray.sources.pages import CorpusSpec, fact, u01

    spec = CorpusSpec(seed=42, n_pages=100000)
    nk = spec.n_entities // 3
    legacy = [int(u01(spec.seed, 102, j) ** 3 * nk) % nk
              for j in range(1000)]
    now = [fact(spec, j)[0] // 3 for j in range(1000)]
    assert now == legacy

    hub = CorpusSpec(seed=42, n_pages=100000, skew=8.0)
    c = collections.Counter(fact(hub, j)[0] for j in range(5000))
    top_share = c.most_common(1)[0][1] / 5000
    assert top_share > 0.15, top_share
    # and the cache key separates the variants
    from ttmf_ray.sources.pages import ensure_pages_parquet  # noqa: F401
    import inspect
    src = inspect.getsource(ensure_pages_parquet)
    assert "_k{spec.skew:g}" in src


def test_docs_watermark_perfect_separation(ray_session):
    """docs_watermark: every planted-suffix doc is flagged, no natural
    doc is (the 96-token green run dominates any base-length dilution;
    natural z stays ~N(0,1))."""
    from ttmf_ray.pipelines.relational import docs_watermark

    out = docs_watermark("/root/testdata/sf0.001")
    wm = out["doc_id"] % 7 == 0
    assert (out.loc[wm, "flagged"] == 1).all()
    assert (out.loc[~wm, "flagged"] == 0).all()
    assert out.loc[wm, "z"].min() > 4.5
    assert out.loc[~wm, "z"].abs().max() < 4.0
