"""Corpus-derived queries (rows-only driver checks; pytest carries the
strong assertions — byte-identical text, P/R harness, determinism).

Every query synthesizes its page corpus deterministically from the scale
factor of ``sf_dir`` (CorpusSpec seeded, sized off the documents table) —
no external data (BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..context import Broadcast, half_up
from ..sources.pages import CorpusSpec, pages_dataset, spec_for_sf_dir
from ..pipelines.kg_construct import extract_pages, kg_construct


def _spec(sf_dir: str, cap: int | None = None) -> CorpusSpec:
    spec = spec_for_sf_dir(sf_dir)
    if cap is not None and spec.n_pages > cap:
        spec = CorpusSpec(seed=spec.seed, n_pages=cap)
    return spec


def pages_extract(sf_dir: str):
    """(url, extracted_text, match) — extraction + the byte-identity bit."""
    ds = extract_pages(pages_dataset(_spec(sf_dir)))

    def check(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "url": b.column("url"),
            "extracted_text": b.column("extracted_text"),
            "match": pc.equal(b.column("extracted_text"), b.column("text")),
        })

    return ds.map_batches(check, batch_format="pyarrow")


def kg_construct_pages(sf_dir: str):
    """Full phase A on the synthesized corpus → (subj, pred, obj)."""
    return kg_construct(pages_dataset(_spec(sf_dir)))


def trust_scores(sf_dir: str) -> pd.DataFrame:
    """Phase B on the corpus KG → scored test triples (h, t, r, flag, conf)."""
    from ..functions.transe import TransEConfig
    from ..pipelines.trust import TrustConfig, trust_pipeline

    spec = _spec(sf_dir, cap=6000)
    edges = kg_construct(pages_dataset(spec))
    cfg = TrustConfig(
        transe=TransEConfig(dim=32, epochs=40, lr=0.02),
        ptranse=TransEConfig(dim=32, epochs=15, lr=0.01, loss="logistic"),
        path_max_paths=5000,
        kge_workers=4,  # pinned: results must not depend on cluster size
    )
    res = trust_pipeline(edges, cfg)
    out = res["scored_test"][["h", "t", "r", "flag", "conf"]].copy()
    out["conf"] = out["conf"].round(6)
    return out.astype({"h": np.int64, "t": np.int64, "r": np.int64,
                       "flag": np.int64})


def trust_scores_streaming(sf_dir: str) -> pd.DataFrame:
    """Phase B in STREAMING mode (`pipelines/trust_streaming.py`): the
    scale path where triples/conf tables never land on the driver heap
    (object-store refs + Dataset left-joins).  Same output contract as
    ``trust_scores``; smaller page cap — this query exists to exercise
    the join-attach path inside the driver harness.  Rows-only for the
    same reason as ``trust_scores`` (trained weights); the strong check
    is tests/test_trust_streaming.py's bit-identity parity vs the
    driver path."""
    from ..functions.transe import TransEConfig
    from ..pipelines.trust import TrustConfig, trust_pipeline

    spec = _spec(sf_dir, cap=3000)
    edges = kg_construct(pages_dataset(spec))
    cfg = TrustConfig(
        transe=TransEConfig(dim=32, epochs=25, lr=0.02),
        ptranse=TransEConfig(dim=32, epochs=8, lr=0.01, loss="logistic"),
        path_max_paths=5000,
        kge_workers=4,  # pinned: results must not depend on cluster size
        streaming=True,
    )
    res = trust_pipeline(edges, cfg)
    out = res["scored_test"][["h", "t", "r", "flag", "conf"]].copy()
    out["conf"] = out["conf"].round(6)
    return out.astype({"h": np.int64, "t": np.int64, "r": np.int64,
                       "flag": np.int64})


def _docs_with_planted_dups(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir.rstrip('/')}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    n_plant = max(5, len(t) // 20)
    planted = t.head(n_plant).copy()
    # deterministic light mutation: tweak ~5% of words (Jaccard ≈ 0.7 vs
    # the original — solidly above the 0.5 verification threshold)
    def mutate(row):
        words = row["text"].split(" ")
        for i in range(0, len(words), 20):
            words[i] = words[i] + "x"
        return " ".join(words)

    planted["text"] = planted.apply(mutate, axis=1)
    planted["doc_id"] = planted["doc_id"] + 10_000_000
    return pd.concat([t, planted], ignore_index=True)


def docs_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs over documents + planted mutations.

    Verification is the JOIN-based exact Jaccard (pair rows hash-joined
    against the doc table on both sides) — no id→text dict broadcast.
    """
    from ..stages.dedup import MinHashLSH, candidate_pairs, verify_pairs_join

    df = _docs_with_planted_dups(sf_dir)
    ds = rd.from_pandas(df).materialize()
    buckets = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text"},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
    )
    pairs = candidate_pairs(buckets)
    verified = verify_pairs_join(
        pairs, ds, id_col="doc_id", text_col="text", threshold=0.5,
        n_buckets=16,
    ).to_pandas()
    # shared half-up rule (context.half_up): an exact-half jaccard
    # (25/32) diverged np.round-vs-ROUND at sf0.1 (heavy-mirror sweep).
    verified["jaccard"] = half_up(verified["jaccard"].to_numpy(), 4)
    return verified.astype({"a": np.int64, "b": np.int64}) \
        .sort_values(["a", "b"]).reset_index(drop=True)


def docs_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components over the verified near-dup pairs (the tail of
    the dedup story: pairs → clusters → keeper per cluster) via the
    DISTRIBUTED min-label propagation — one hash-join + one groupby-min
    per round, label-sum convergence witness.  The SQL twin runs the
    identical propagation as a recursive CTE (self-edge carrier rows, a
    changed-label window count as the stopping rule)."""
    from ..stages.dedup import cluster_pairs_min_label

    pairs = docs_minhash_dedup(sf_dir)
    return cluster_pairs_min_label(
        rd.from_pandas(pairs[["a", "b"]]))


BOILER_FOOTER = "(c) 2026 Example Corp. All rights reserved."
BOILER_BANNER = "This site uses cookies to improve your experience."


def docs_remove_boilerplate(sf_dir: str) -> pd.DataFrame:
    """Boilerplate-line removal: lines appearing in ≥3 distinct docs
    are dropped from EVERY doc (template chrome — the jusText-family
    rule, vs docs_line_dedup's keep-first-occurrence).  Deterministic
    augmentation (the redact_pii convention): every 3rd doc gains a
    copyright footer, every 4th a cookie banner (both on %12), so the
    frequent-line dictionary and both drop paths are exercised
    (stages/curation.py:remove_boilerplate)."""
    from ..stages.curation import remove_boilerplate
    from .relational import _read

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        tx = t.column("text").to_numpy(zero_copy_only=False).astype(str)
        tx = np.where(ids % 3 == 0,
                      np.char.add(tx, "\n" + BOILER_FOOTER), tx)
        tx = np.where(ids % 4 == 0,
                      np.char.add(tx, "\n" + BOILER_BANNER), tx)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(tx.astype(object), pa.string())})

    out = remove_boilerplate(
        ds.map_batches(aug, batch_format="pyarrow")).to_pandas()
    return out.astype({"doc_id": np.int64, "n_lines": np.int64,
                       "n_dropped": np.int64}) \
        .sort_values("doc_id", ignore_index=True)


def docs_line_dedup(sf_dir: str) -> pd.DataFrame:
    """Corpus-global line-level dedup (C4/RefinedWeb rule: a duplicated
    line survives only at its first occurrence; docs are rebuilt from
    kept lines).  Fixture: doc i's text gains doc i+1's text as a second
    line (pandas shift / SQL lead), so every line occurs twice — each doc
    keeps its NEIGHBOR's line, loses its own to the predecessor, and the
    last doc comes back empty.  The SQL twin mirrors winner selection
    (min doc<<20|line_no), the blank-line bypass and the rebuild."""
    import pyarrow.parquet as pq

    from ..stages.curation import line_dedup

    t = pq.read_table(f"{sf_dir.rstrip('/')}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    nxt = t["text"].shift(-1)
    t["text"] = t["text"].where(nxt.isna(), t["text"] + "\n" + nxt)
    out = line_dedup(rd.from_pandas(t).materialize()).to_pandas()
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental near-dup: dedup a NEW crawl shard against the EXISTING
    corpus — originals are the existing side, the planted mutations
    (ids ≥ 10M, monotone shard ids) are the new shard.  Same signatures,
    bucket PRUNE (existing-only buckets never pair), pairs must involve a
    new doc as the higher side; verification is the join-based Jaccard.
    The SQL mirror is the full-dedup mirror filtered to new-side pairs —
    the prune provably emits exactly that subset."""
    from ..stages.dedup import MinHashLSH, candidate_pairs, verify_pairs_join

    df = _docs_with_planted_dups(sf_dir)
    ds = rd.from_pandas(df).materialize()
    buckets = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text"},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
    )
    pairs = candidate_pairs(buckets, new_from=10_000_000)
    verified = verify_pairs_join(
        pairs, ds, id_col="doc_id", text_col="text", threshold=0.5,
        n_buckets=16,
    ).to_pandas()
    # shared half-up rule (context.half_up): an exact-half jaccard
    # (25/32) diverged np.round-vs-ROUND at sf0.1 (heavy-mirror sweep).
    verified["jaccard"] = half_up(verified["jaccard"].to_numpy(), 4)
    return verified.astype({"a": np.int64, "b": np.int64}) \
        .sort_values(["a", "b"]).reset_index(drop=True)


def embeddings_near_dup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup: hyperplane-LSH bands → candidate pairs →
    exact cosine verify, over embeddings + planted perturbed copies."""
    import pyarrow.parquet as pq

    from ..stages.dedup import embedding_near_dup

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    dim = len(t["embedding"].iloc[0])
    n_plant = max(5, len(t) // 20)
    planted = t.head(n_plant).copy()
    # deterministic small perturbation → cosine ≈ 0.999 vs the original
    planted["embedding"] = planted.apply(
        lambda row: (np.asarray(row["embedding"], dtype=np.float64)
                     + 0.01 * np.sin(np.arange(dim) + row["vec_id"])).tolist(),
        axis=1)
    planted["vec_id"] = planted["vec_id"] + 10_000_000
    df = pd.concat([t, planted], ignore_index=True)
    out = embedding_near_dup(rd.from_pandas(df), dim=dim,
                             threshold=0.98).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out.astype({"a": np.int64, "b": np.int64}) \
        .sort_values(["a", "b"]).reset_index(drop=True)


def docs_simhash(sf_dir: str):
    """(doc_id, simhash) fingerprints — deterministic."""
    from ..stages.dedup import simhash_batch

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: simhash_batch(b, id_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    )


def docs_lang_detect(sf_dir: str):
    from ..stages.text import lang_id_batch

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "lang", "lang_pred"])


def docs_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID audit: confusion matrix of the declared ``lang``
    column vs the n-gram-profile prediction (the distributed
    lang_id_batch pass + one tiny (lang, lang_pred) groupby) — the
    label-quality check run before any per-language routing."""
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    from ..stages.text import lang_id_batch

    out = (ds.map_batches(lang_id_batch, batch_format="pyarrow")
           .select_columns(["lang", "lang_pred"])
           .groupby(["lang", "lang_pred"]).count().to_pandas()
           .rename(columns={"count()": "n"}))
    return out.astype({"n": np.int64}) \
        .sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def media_features_real(sf_dir: str) -> pd.DataFrame:
    """Multimodal actor-pool pipeline with REAL decode kernels: 120
    deterministic media rows (genuine WAV + binary-PPM payloads; video
    rows carry codec-bound payloads and are filtered out, stages/media.py
    docstring) → decode → resize/pool → 4 features per item.  Rows-only:
    the binary payloads are synthesized, not a DuckDB-visible table."""
    from ..stages.media import (MediaFeatureConfig, media_features,
                                synth_media_batch)

    t = synth_media_batch(np.arange(120), real_payloads=True)
    decodable = t.filter(
        np.isin(np.asarray(t.column("kind")), ["image", "audio"]))
    out = media_features(
        rd.from_arrow(decodable),
        cfg=MediaFeatureConfig(use_fake_decoder=False),
    ).to_pandas()
    for c in ("feat_mean", "feat_std", "feat_min", "feat_max"):
        out[c] = out[c].round(6)
    return out.astype({"media_id": np.int64}) \
        .sort_values("media_id").reset_index(drop=True)


def media_jpeg_features(sf_dir: str) -> pd.DataFrame:
    """JPEG decode through the REAL codec boundary in an actor pool: 60
    deterministic baseline-JPEG payloads (minted by the from-scratch
    numpy encoder, stages/jpegnp.py) → MediaFeatures with
    use_fake_decoder=False (Pillow when present, else the from-scratch
    numpy baseline decoder) → resize-pool features.  Rows-only: the
    payloads are synthesized binary, not a DuckDB-visible table; the
    scalar oracle (independent per-image re-decode) is pinned in
    tests/test_media.py."""
    from ..stages.media import (MEDIA_SCHEMA, MediaFeatureConfig,
                                media_features, synth_jpeg)

    n = 60
    rows = {f.name: [] for f in MEDIA_SCHEMA}
    for i in range(n):
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(synth_jpeg(42, i))
        rows["mime"].append("image/jpeg")
        rows["width"].append(32)
        rows["height"].append(24)
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(0)
    t = pa.table({f.name: pa.array(rows[f.name], f.type)
                  for f in MEDIA_SCHEMA})
    out = media_features(
        rd.from_arrow(t),
        cfg=MediaFeatureConfig(use_fake_decoder=False)).to_pandas()
    for c in ("feat_mean", "feat_std", "feat_min", "feat_max"):
        out[c] = out[c].round(6)
    return out.astype({"media_id": np.int64}) \
        .sort_values("media_id").reset_index(drop=True)


def docs_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style word-repetition quality signals per document
    (dup-word / top-word / top-bigram fractions), SQL-mirrored."""
    from ..stages.text import repetition_batch

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: repetition_batch(b, id_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    ).to_pandas()
    for c in ("dup_word_frac", "top_word_frac", "top_bigram_frac"):
        # count/count ratios are dyadic-tie prone — shared half-up rule
        out[c] = half_up(out[c].to_numpy(), 6)
    return out.astype({"doc_id": np.int64, "n_words": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_fingerprint(sf_dir: str):
    from ..stages.text import fingerprint_batch

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: fingerprint_batch(b, id_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    )


def embeddings_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF ANN top-10 vs vec_id=0's embedding (approximate scale path).

    Runs with ``centroid_mode="hash"`` — centroids are the 16 vectors
    with the smallest ``mix64(17, vec_id)``, probe = 4 nearest buckets —
    so the probed candidate set, and therefore the top-10, is an exact
    deterministic function of the table, mirrored bit-for-bit in SQL.
    """
    import pyarrow.parquet as pq

    from ..stages.ann import ivf_topk

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    q = np.asarray(t.loc[t["vec_id"] == 0, "embedding"].iloc[0],
                   dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ivf_topk(ds, q[None, :], 10, centroid_mode="hash")
    out = out[out["query_id"] == 0][["vec_id", "cosine"]]
    out["cosine"] = out["cosine"].round(5)
    return out.astype({"vec_id": np.int64}).sort_values("vec_id") \
        .reset_index(drop=True)


def kg_negative_samples(sf_dir: str) -> pd.DataFrame:
    """Seeded 1:1 labeled examples over the relational KG (deterministic)."""
    from ..functions.sampling import labeled_examples
    # shared memoized build (_relational_kg): the per-row seeded draws
    # depend only on (h, t, r) values, so the sorted id table is
    # output-identical to the unsorted one it replaced (oracle-checked)
    ent_df, rel_df, ids = _relational_kg(sf_dir)
    out = labeled_examples(rd.from_pandas(ids),
                           ids[["h", "t", "r"]].to_numpy(),
                           n_entities=len(ent_df),
                           n_relations=len(rel_df)).to_pandas()
    return out.astype({"h": np.int64, "t": np.int64, "r": np.int64,
                       "flag": np.int64}) \
        .sort_values(["h", "t", "r", "flag"]).reset_index(drop=True)


def _graph_features_frame(heads, csr) -> pd.DataFrame:
    """Shared tail of the two graph-features queries: run the fused
    stage uncapped (the SQL mirror assumes no truncation), round pr."""
    from ..stages.graph import graph_features_for_heads

    out = graph_features_for_heads(
        rd.from_pandas(pd.DataFrame({"head": heads})), csr,
        max_nodes=200000,
    ).to_pandas()
    assert not out["truncated"].any(), "oracle mirror assumes no truncation"
    out["pr"] = out["pr"].round(8)
    return out.astype({c: np.int64 for c in
                       ["head", "node", "in_c", "out_c", "in_n", "out_n",
                        "depth"]}) \
        .sort_values(["head", "node"]).reset_index(drop=True)


def kg_degree_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact out/in-degree quantiles of the relational KG per relation —
    the quantile stage composed over a second domain (graph degrees
    instead of text lengths).  Degree rows are computed with one
    per-batch combiner groupby; quantile selection is the same
    histogram-merge rule the SQL twin reproduces."""
    from ray.data.aggregate import Sum

    from ..stages.quantiles import exact_quantiles

    ent_df, rel_df, ds = _kg_edges_view(
        sf_dir, {"h": "h", "t": "t", "r": "r"})
    n_ent = len(ent_df)

    def deg_part(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy().astype(np.int64)
        t = b.column("t").to_numpy().astype(np.int64)
        r = b.column("r").to_numpy().astype(np.int64)
        ko, co = np.unique(r * n_ent + h, return_counts=True)
        ki, ci = np.unique(r * n_ent + t, return_counts=True)
        return pa.table({
            "r": pa.array(np.concatenate([ko, ki]) // n_ent),
            "h": pa.array(np.concatenate([ko, ki]) % n_ent),
            "out_deg": pa.array(np.concatenate(
                [co, np.zeros(len(ci), co.dtype)]).astype(np.int64)),
            "in_deg": pa.array(np.concatenate(
                [np.zeros(len(co), ci.dtype), ci]).astype(np.int64))})

    # per-batch (r, node) count partials → one vocab-bounded groupby;
    # only the |V|·|R|-bounded degree table reaches the driver
    merged = (ds.map_batches(deg_part, batch_format="pyarrow")
              .groupby(["r", "h"])
              .aggregate(Sum("out_deg", alias_name="out_deg"),
                         Sum("in_deg", alias_name="in_deg"))
              .to_pandas())
    merged["rel"] = rel_df.set_index("id")["name"] \
        .reindex(merged["r"].to_numpy()).to_numpy()
    ds = rd.from_pandas(merged[["rel", "out_deg", "in_deg"]].astype(
        {"out_deg": np.int64, "in_deg": np.int64}))
    out = exact_quantiles(ds, ["out_deg", "in_deg"],
                          [0.0, 0.5, 0.9, 1.0], group_col="rel")
    return out.astype({"out_deg_q": np.int64, "in_deg_q": np.int64}) \
        .reset_index(drop=True)


def kg_graph_features(sf_dir: str) -> pd.DataFrame:
    """Fused subgraph→PPR→RR features (T1+T2+T3) for the 20 smallest-id
    heads of the relational KG — EXACT SQL mirror including the PPR
    column: the oracle runs the identical update to the identical
    data-dependent stopping rule (L1 change < 1e-5, ≤500 iters) as a
    recursive CTE over (head, node) rows."""
    from ..stages.graph import build_csr

    ent_df, rel_df, ids = _relational_kg(sf_dir)
    tr = ids[["h", "t", "r"]].to_numpy().astype(np.int64)
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], len(ent_df))
    heads = sorted(set(tr[:, 0].tolist()))[:20]
    return _graph_features_frame(heads, csr)


def kg_graph_features_sym(sf_dir: str) -> pd.DataFrame:
    """The same fused stage over the SYMMETRIZED relational KG (each edge
    also reversed, reversed relations get fresh ids) for three spread
    entity ids — depth-4 balls here are 500–3200 nodes with hundreds of
    dangling nodes, so the oracle exercises frontier BFS, row-normalized
    parallel-edge weights, the dangling fix and multi-iteration PPR at a
    size the directed functional graph (out-degree 1) cannot."""
    from ..stages.graph import build_csr

    ent_df, rel_df, ids = _relational_kg(sf_dir)
    tr = ids[["h", "t", "r"]].to_numpy().astype(np.int64)
    n_ent = len(ent_df)
    h2 = np.concatenate([tr[:, 0], tr[:, 1]])
    t2 = np.concatenate([tr[:, 1], tr[:, 0]])
    r2 = np.concatenate([tr[:, 2], tr[:, 2] + len(rel_df)])
    csr = build_csr(h2, t2, r2, n_ent)
    heads = sorted({0, n_ent // 3, (2 * n_ent) // 3})
    return _graph_features_frame(heads, csr)


_KG_CACHE: dict = {}

# rule-13 threshold for the driver (pandas) form of the shared KG build:
# above this edge count, queries that genuinely need driver arrays (CSR
# feature extraction over selected heads, seeded walk tables) fail
# loudly instead of materializing the edge stream; the audit-query
# family below consumes the DATASET form and never hits this.
KG_DRIVER_MAX = int(__import__("os").environ.get(
    "GRAFT_KG_DRIVER_MAX", 5_000_000))


def _kg_cached(form: str, sf_dir: str, builder):
    """Single-key two-form memo for the shared relational-KG build.

    Key includes the Ray job id so a fresh session (bench subprocess)
    never reuses stale state; key change clears every form (one sf_dir
    live at a time — sf_dirs switch rarely)."""
    import ray as _ray

    key = (sf_dir, _ray.get_runtime_context().get_job_id()
           if _ray.is_initialized() else None)
    if _KG_CACHE.get("key") != key:
        _KG_CACHE.clear()
        _KG_CACHE["key"] = key
    if form not in _KG_CACHE:
        _KG_CACHE[form] = builder()
    return _KG_CACHE[form]


def _relational_kg_ds(sf_dir: str):
    """(ent vocab, rel vocab, id-mapped edge DATASET) — the streaming
    form of the shared relational-KG build: vocabs are vocab-domain
    pandas (build_vocab's one-pass combiner), the edge table stays a
    materialized multi-block Dataset, and nothing edge-count-sized
    touches the driver.  Every kg_* audit query that only aggregates
    consumes THIS form; block order is unspecified, so only
    order-independent consumers (groupby folds, distinct, quantized
    iterations) may use it."""
    from ..context import spread
    from ..functions.vocab import build_vocab, id_map_edges
    from ..pipelines.relational import kg_edges_relational

    def build():
        edges = kg_edges_relational(sf_dir).materialize()
        ent_df, rel_df = build_vocab(edges)
        ids_ds = spread(id_map_edges(edges, ent_df, rel_df)) \
            .materialize()
        return ent_df, rel_df, ids_ds

    return _kg_cached("ds", sf_dir, build)


def _relational_kg(sf_dir: str):
    """(ent vocab, rel vocab, sorted id table) of the relational KG —
    the DRIVER (rule-13) form for queries that need whole-edge numpy
    state (CSR builds, seeded walks, packed-key membership).

    Threshold-guarded: above KG_DRIVER_MAX edges this raises instead of
    materializing (use ``_relational_kg_ds`` and stream).  Memoized per
    (sf_dir, Ray job) alongside the Dataset form — six driver queries
    share this exact build; recomputing per query was ~170 s."""

    def build():
        ent_df, rel_df, ids_ds = _relational_kg_ds(sf_dir)
        n = ids_ds.count()
        if n > KG_DRIVER_MAX:
            raise RuntimeError(
                f"_relational_kg: {n} edges exceeds the driver "
                f"materialization threshold KG_DRIVER_MAX="
                f"{KG_DRIVER_MAX}; this query needs whole-edge driver "
                "state — stream via _relational_kg_ds instead, or "
                "raise GRAFT_KG_DRIVER_MAX explicitly")
        # canonical order: row subsets (e.g. head(2000)) must not
        # depend on block arrival order — and the SQL oracles mirror
        # this exact order
        ids = ids_ds.to_pandas() \
            .sort_values(["h", "t", "r"], ignore_index=True)
        return ent_df, rel_df, ids

    return _kg_cached("pandas", sf_dir, build)


def _kg_edges_view(sf_dir: str, mapping: dict[str, str]):
    """(ent vocab, rel vocab, column-pruned/renamed streaming view of
    the shared id-mapped edge Dataset) — e.g. ``{"h": "src",
    "t": "dst"}``.  The view is a zero-copy Arrow select over the
    memoized materialized blocks; each audit query composes its own
    combiner/groupby on top."""
    ent_df, rel_df, ids_ds = _relational_kg_ds(sf_dir)

    def sel(t: pa.Table, m=mapping) -> pa.Table:
        return pa.table({out: t.column(src) for src, out in m.items()})

    return ent_df, rel_df, ids_ds.map_batches(
        sel, batch_format="pyarrow")


def kg_subgraph_stats(sf_dir: str) -> pd.DataFrame:
    """T1+A8 with an exact SQL mirror: BFS subgraph (depth ≤ 4) node
    depths and in/out degrees for the 20 smallest-id heads — the
    PPR-free projection of the fused graph-features stage (the SQL twin
    is a recursive CTE + degree groupbys)."""
    from ..stages.graph import build_csr, graph_features_for_heads

    ent_df, rel_df, ids = _relational_kg(sf_dir)
    tr = ids[["h", "t", "r"]].to_numpy().astype(np.int64)
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], len(ent_df))
    heads = sorted(set(tr[:, 0].tolist()))[:20]
    out = graph_features_for_heads(
        rd.from_pandas(pd.DataFrame({"head": heads})), csr,
        max_nodes=200000,
    ).to_pandas()
    assert not out["truncated"].any(), "oracle mirror assumes no truncation"
    out = out[["head", "node", "depth", "in_c", "out_c", "in_n", "out_n"]]
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["head", "node"]).reset_index(drop=True)


# pinned micro-graph for the PPR oracle (every node has out-edges — no
# dangling fix needed; weights are the subgraph row-normalized 1/outdeg)
_PPR_ESRC = np.array([0, 0, 1, 1, 2, 2, 3, 4])
_PPR_EDST = np.array([1, 2, 2, 3, 0, 3, 4, 0])
_PPR_EW = np.array([0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 1.0, 1.0])


def kg_ppr_micro(sf_dir: str) -> pd.DataFrame:
    """T2 with an exact SQL mirror: the reference personalized-PageRank
    iteration (α=0.85, ε=1e-5 L1, ≤500 iters, PR(core)=1 init —
    `pagerank.py:18-85`) on a pinned 5-node graph; the oracle is a
    recursive CTE running the identical update to the identical
    stopping rule."""
    from ..stages.graph import personalized_pagerank

    pr = personalized_pagerank(5, _PPR_ESRC, _PPR_EDST, _PPR_EW, 0)
    return pd.DataFrame({
        "node": np.arange(5, dtype=np.int64),
        "pr": np.round(pr, 6),
    })


def kg_link_prediction(sf_dir: str) -> pd.DataFrame:
    """Link-prediction eval (A9): Hits@1/10 + mean rank, raw & filtered,
    with a short deterministic TransE fit on the relational KG."""
    from ..functions.eval import link_prediction_eval
    from ..functions.sampling import split_bucket
    from ..functions.transe import TransEConfig, train_transe

    ent_df, rel_df, ids = _relational_kg(sf_dir)
    tr_arr = ids[["h", "t", "r"]].to_numpy().astype(np.int64)
    b = split_bucket(ids["h"].to_numpy(), ids["t"].to_numpy(),
                     ids["r"].to_numpy())
    train = tr_arr[b < 8]
    test = tr_arr[b == 9][:500]
    E, R = train_transe(train, len(ent_df), len(rel_df),
                        TransEConfig(dim=32, epochs=25, lr=0.02,
                                     batch_size=2048))
    gold = tr_arr
    metrics = link_prediction_eval(
        rd.from_pandas(pd.DataFrame(test, columns=["h", "t", "r"])),
        E, R, gold)
    out = pd.DataFrame([
        {"metric": k, "value": round(float(v), 6)}
        for k, v in sorted(metrics.items())
    ])
    return out


def emb_link_rank(sf_dir: str) -> pd.DataFrame:
    """A9/J6 ranking with an EXACT SQL mirror: per-triple link-prediction
    ranks (raw + filtered) over the fixed embeddings table — entity
    vectors are the parquet embeddings, R = 0, so head-corruption energy
    is plainly ``dist(cand, t)`` and tail-corruption ``dist(h, cand)``
    (L2, ``list_distance`` in DuckDB).  The gold KG is synthetic and
    deterministic: for every entity v, (v, (31v+7) mod n, 0) and
    (v, (17v+3) mod n, 0) — two gold tails per (h, r) so the filtered
    anti-join genuinely diverges from raw.  Test = the first 100
    first-formula triples with v ≡ 9 (mod 10).

    This pins the rank rule (strict ``energy < gold_energy`` + 1, gold
    itself kept) and the filtered mask (known \\ {test entity}) of
    functions/eval.py:LinkPredictionScorer against SQL — the trained
    variant ``kg_link_prediction`` reuses the identical code path.
    """
    import pyarrow.parquet as pq

    from ..functions.eval import LinkPredictionScorer
    from ..context import Broadcast
    from ..stages.ann import list_col_matrix

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())
    E = list_col_matrix(t.column("embedding"))[order]
    n = len(E)
    R = np.zeros((1, E.shape[1]), dtype=np.float64)
    v = np.arange(n, dtype=np.int64)
    gold = np.concatenate([
        np.stack([v, (31 * v + 7) % n, np.zeros(n, np.int64)], axis=1),
        np.stack([v, (17 * v + 3) % n, np.zeros(n, np.int64)], axis=1),
    ])
    tv = v[v % 10 == 9][:100]
    test = pd.DataFrame({"h": tv, "t": (31 * tv + 7) % n,
                         "r": np.zeros(len(tv), np.int64)})
    ranks = rd.from_pandas(test).map_batches(
        LinkPredictionScorer,
        fn_constructor_kwargs={"emb_bc": Broadcast((E, R)),
                               "gold_bc": Broadcast(gold)},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    ).to_pandas()
    return ranks.astype({c: np.int64 for c in ranks.columns}) \
        .sort_values(["h", "t", "r"]).reset_index(drop=True)


def kg_error_report(sf_dir: str) -> pd.DataFrame:
    """find_errors equivalent (O2+M2): top-20 lowest-confidence scored
    triples unmapped back to names."""
    from ..functions.eval import error_report
    from ..functions.transe import TransEConfig
    from ..pipelines.trust import TrustConfig, trust_pipeline
    from ..pipelines.kg_construct import kg_construct

    spec = _spec(sf_dir, cap=4000)
    edges = kg_construct(pages_dataset(spec))
    cfg = TrustConfig(
        transe=TransEConfig(dim=32, epochs=30, lr=0.02),
        ptranse=TransEConfig(dim=32, epochs=10, lr=0.01, loss="logistic"),
        path_max_paths=3000,
        kge_workers=4,  # pinned: results must not depend on cluster size
    )
    res = trust_pipeline(edges, cfg)
    ents = res["ent_vocab"]["name"].to_numpy(dtype=object)
    rels = res["rel_vocab"]["name"].to_numpy(dtype=object)
    return error_report(res["scored_test"], ents, rels, top_k=20)


def kg_kgc_negatives(sf_dir: str) -> pd.DataFrame:
    """k-per-positive KGC corruption files (hr_/h_t/_rt; D4 variant,
    `process_triples.py:35-63`, incorrect_count=5) — seeded, deterministic."""
    from ..functions.sampling import kgc_negatives

    ent_df, rel_df, ids = _relational_kg(sf_dir)
    test = ids.head(2000)
    outs = []
    for slot, vocab_size in (("tail", len(ent_df)), ("rel", len(rel_df)),
                             ("head", len(ent_df))):
        neg = kgc_negatives(rd.from_pandas(test), slot=slot,
                            vocab_size=vocab_size, k=5).to_pandas()
        neg["slot"] = slot
        outs.append(neg)
    out = pd.concat(outs, ignore_index=True)
    return out.astype({"h": np.int64, "t": np.int64, "r": np.int64,
                       "flag": np.int64}) \
        .sort_values(["slot", "h", "t", "r"]).reset_index(drop=True)


def embeddings_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Embedding writer/reader + UNK matrix assembly (S4/S5) smoke query."""
    import tempfile

    from ..functions.embeddings_io import (assemble_matrix,
                                           read_embeddings_parquet,
                                           write_embeddings_parquet)

    rng = np.random.default_rng(7)
    ids = np.arange(50, dtype=np.int64)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/emb.parquet"
        write_embeddings_parquet(path, ids, vecs)
        rids, rvecs = read_embeddings_parquet(path)
    vocab = np.arange(60)  # 10 entries lack stored vectors → UNK row
    W, n_unk = assemble_matrix(vocab, rids, rvecs, k=16)
    return pd.DataFrame({
        "stat": ["rows", "n_unk", "roundtrip_exact", "unk_shared"],
        "value": [
            float(W.shape[0]), float(n_unk),
            float(np.array_equal(rvecs, vecs)),
            float(np.array_equal(W[51], W[59])),
        ],
    })


def trust_pr_sweep(sf_dir: str) -> pd.DataFrame:
    """A6/A7: precision/recall/F sweep over thresholds 0.01..0.99 plus the
    mean-confidence row (`Model1.py:543-586`, `TransConfidence.py:96-97`)."""
    from ..functions.transe import TransEConfig
    from ..pipelines.trust import TrustConfig, trust_pipeline

    spec = _spec(sf_dir, cap=6000)
    edges = kg_construct(pages_dataset(spec))
    cfg = TrustConfig(
        transe=TransEConfig(dim=32, epochs=40, lr=0.02),
        ptranse=TransEConfig(dim=32, epochs=15, lr=0.01, loss="logistic"),
        path_max_paths=5000,
        kge_workers=4,  # pinned: results must not depend on cluster size
    )
    res = trust_pipeline(edges, cfg)
    sweep = res["pr_sweep"].copy()
    for c in ["precision", "recall", "f1"]:
        sweep[c] = sweep[c].round(6)
    mean_conf = float(res["scored_test"]["conf"].mean())
    extra = pd.DataFrame({
        "threshold": [-1.0],
        "precision": [round(mean_conf, 6)],   # mean-confidence marker row
        "recall": [round(res["accuracy"], 6)],
        "f1": [round(res["max_f1"], 6)],
    })
    return pd.concat([sweep, extra], ignore_index=True)


# ---------------------------------------------------------------------------
# Training-data curation queries (stages/curation.py; all SQL-mirrored)
# ---------------------------------------------------------------------------

_EVAL_MOD = 41          # eval set = every 41st document
_SHUFFLE_SEED = 41
_MIX_SEED = 97
# keep-rates by source bucket: src0-4 full, src5-9 half, src10-14 tenth,
# src15-19 dropped — the classic quality-tiered web-corpus mixture
_MIX_WEIGHTS = {f"src{i}": (1.0 if i < 5 else 0.5 if i < 10
                            else 0.1 if i < 15 else 0.0)
                for i in range(20)}


def _docs_ds(sf_dir: str, columns: list[str]):
    return rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                           columns=columns)


def docs_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: flag train docs (doc_id % 41 != 0)
    sharing any word-trigram shingle with the eval split (doc_id % 41 == 0).
    Eval shingle set broadcast once; train side streams."""
    from ..stages.curation import decontaminate, eval_shingle_set

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    is_eval = lambda t, eq: t.filter(pa.array(  # noqa: E731
        (t.column("doc_id").to_numpy() % _EVAL_MOD == 0) == eq))
    ev = eval_shingle_set(
        ds.map_batches(lambda t: is_eval(t, True), batch_format="pyarrow"))
    out = decontaminate(
        ds.map_batches(lambda t: is_eval(t, False), batch_format="pyarrow"),
        ev).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_shuffle_export(sf_dir: str) -> pd.DataFrame:
    """Deterministic seeded shuffle-export assignment (shard, pos)."""
    from ..stages.curation import shuffle_export

    out = shuffle_export(_docs_ds(sf_dir, ["doc_id"]),
                         seed=_SHUFFLE_SEED, n_shards=8).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_pack_bins(sf_dir: str) -> pd.DataFrame:
    """Concat-and-chunk sequence packing: global token offsets in doc_id
    order, context-window bin = start_off // 512."""
    from ..stages.curation import pack_bins

    out = pack_bins(_docs_ds(sf_dir, ["doc_id", "text"]),
                    bin_tokens=512, n_parts=32).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_source_mixture(sf_dir: str) -> pd.DataFrame:
    """Quality-tiered source mixture filter (seeded keep-rates)."""
    from ..stages.curation import source_mixture

    out = source_mixture(_docs_ds(sf_dir, ["doc_id", "source"]),
                         _MIX_WEIGHTS, seed=_MIX_SEED).to_pandas()
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_stratified_sample(sf_dir: str, q: int = 40) -> pd.DataFrame:
    """Per-language seeded quota sample (balanced-mixture primitive:
    equal docs per language regardless of corpus skew) — hash-rank
    top-q per group, per-batch combiner, no shuffle."""
    from ..stages.curation import stratified_sample

    out = stratified_sample(_docs_ds(sf_dir, ["doc_id", "lang"]),
                            n_per_group=q, group_col="lang",
                            key_cols=["doc_id"]).to_pandas()
    return out.astype({"doc_id": np.int64}) \
        .sort_values(["lang", "doc_id"], ignore_index=True)


def docs_cm_heavy_hitters(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Count-min sketch heavy hitters: the exact top-k tokens by term
    frequency alongside their sketch estimates (min over hash rows —
    never below the truth).  Deterministic seeded hashes ⇒ the DuckDB
    mirror rebuilds the identical (d, w) counter matrix."""
    from ..stages.sketches import (_batch_token_tf, cm_estimate,
                                   countmin_sketch)

    ds = _docs_ds(sf_dir, ["text"])
    M = countmin_sketch(ds)

    def part(t: pa.Table) -> pa.Table:
        uniq, tf = _batch_token_tf(t, "text")
        return pa.table({"token": pa.array(uniq.astype(object), pa.string()),
                         "tf": pa.array(tf)})

    top = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("token").sum("tf")
           .sort(["sum(tf)", "token"], descending=[True, False])
           .limit(k).to_pandas().rename(columns={"sum(tf)": "exact_tf"}))
    top["cm_est"] = cm_estimate(M, top["token"].to_numpy())
    return top.astype({"exact_tf": np.int64, "cm_est": np.int64}) \
        .sort_values(["exact_tf", "token"], ascending=[False, True],
                     ignore_index=True)


def docs_hll_distinct(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog (p=12) over the corpus's distinct (doc_id, token)
    pairs — the vocabulary-coverage cardinality — next to the exact
    count.  Registers are deterministic (seeded mix64 over (doc_id,
    word-fingerprint)), so the SQL mirror reproduces them bit-for-bit
    and the estimates agree to float rounding."""
    from ..stages.sketches import _batch_pairs, hll_estimate, hll_registers

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    regs = hll_registers(ds)

    def part(t: pa.Table) -> pa.Table:
        dids, _ = _batch_pairs(t, "doc_id", "text")
        # docs are rows ⇒ per-batch-distinct pairs are globally distinct
        return pa.table({"n": pa.array([len(dids)], pa.int64())})

    exact = int(ds.map_batches(part, batch_format="pyarrow")
                .sum("n"))
    return pd.DataFrame({"exact_distinct": [np.int64(exact)],
                         "hll_est": [hll_estimate(regs)]})


def docs_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Top-50 tokens by document frequency (vocabulary building)."""
    from ..stages.curation import top_tokens

    out = top_tokens(_docs_ds(sf_dir, ["doc_id", "text"]), k=50)
    return out[["token", "df"]]


def docs_clean_corpus(sf_dir: str) -> pd.DataFrame:
    """Composed C4-style cleaning pass: exact-dup winner + token band
    [25, 80] + dup-word fraction ≤ 0.65 + the tiered source mixture —
    per-rule flags and the final AND, one row per document."""
    from ..stages.curation import clean_corpus

    out = clean_corpus(_docs_ds(sf_dir, ["doc_id", "text", "source"]),
                       _MIX_WEIGHTS, mix_seed=_MIX_SEED).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_dup_ngrams(sf_dir: str) -> pd.DataFrame:
    """Per-doc fraction of distinct word-trigram shingles duplicated
    across >= 2 documents corpus-wide (Lee et al. 2022 signal),
    SQL-mirrored (same shingle hash chain as minhash/decontaminate)."""
    from ..stages.curation import dup_ngram_fraction

    out = dup_ngram_fraction(_docs_ds(sf_dir, ["doc_id", "text"])) \
        .to_pandas()
    out["dup_fraction"] = out["dup_fraction"].round(6)
    return out.astype({c: np.int64 for c in
                       ("doc_id", "n_shingles", "n_dup", "flagged")}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_remove_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2022 span
    surgery): tokens covered by a cross-doc duplicated word-5-gram are
    dropped, text rebuilt from the kept tokens.  SQL-mirrored exactly
    (same window hashes, same ≥2-distinct-docs rule) — all-int/string
    output, zero float drift."""
    from ..stages.curation import remove_dup_spans

    out = remove_dup_spans(_docs_ds(sf_dir, ["doc_id", "text"]),
                           ngram=5).to_pandas()
    return out.astype({c: np.int64 for c in
                       ("doc_id", "n_tokens", "n_kept")}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source aggregate quality stats + domain keep gate,
    SQL-mirrored (same token/stopword defs as docs_quality)."""
    from ..stages.curation import domain_stats

    out = domain_stats(_docs_ds(sf_dir, ["doc_id", "text", "source"])) \
        .to_pandas()
    out["stop_ratio"] = out["stop_ratio"].round(6)
    return out.astype({c: np.int64 for c in
                       ("n_docs", "sum_chars", "sum_tokens", "keep")}) \
        .sort_values("source").reset_index(drop=True)


def kg_components(sf_dir: str) -> pd.DataFrame:
    """Weakly connected components of the KG with the in_region edges
    removed (regions disconnect → one component per nation-neighborhood)
    via the distributed min-label propagation of
    stages/dedup.py:cluster_pairs_min_label — one hash-join + one
    groupby-min per round over the symmetrized id-mapped edge list,
    label-sum convergence witness.  The SQL twin runs the identical
    propagation as a recursive CTE over the same id map."""
    from ..stages.dedup import cluster_pairs_min_label

    _ent, rel, ids_ds = _relational_kg_ds(sf_dir)
    rid = int(rel.loc[rel["name"] == "in_region", "id"].iloc[0])

    def sel(t: pa.Table) -> pa.Table:
        keep = t.column("r").to_numpy() != rid
        return pa.table({"a": t.column("h").filter(pa.array(keep)),
                         "b": t.column("t").filter(pa.array(keep))})

    out = cluster_pairs_min_label(
        ids_ds.map_batches(sel, batch_format="pyarrow"))
    out = out.rename(columns={"doc_id": "node", "cluster_id": "component"})
    return out.astype({"node": np.int64, "component": np.int64}) \
        .sort_values("node").reset_index(drop=True)


def part_cooccur_triangles(sf_dir: str) -> pd.DataFrame:
    """Bipartite projection + triangle counting: parts co-ordered in the
    same order become an undirected edge; per-node triangle count,
    distinct-neighbor degree and local clustering coefficient.

    Shape (stages/graph.py): in-batch distinct → group-hash partitions →
    vectorized segment cross-product (cooccur_pairs) → one exact-distinct
    shuffle of (a, b) int pairs → edge-iterator triangle probe against a
    broadcast oriented adjacency (zero further shuffles).  The SQL twin
    is the 3-way self-join over the same distinct projection."""
    from ..stages.dedup import distinct_rows
    from ..stages.graph import cooccur_pairs, triangle_stats

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pairs = cooccur_pairs(ds, group_col="l_orderkey",
                          item_col="l_partkey")
    return triangle_stats(distinct_rows(pairs, ["a", "b"]))


def kg_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle census of the SYMMETRIZED relational KG (per-node
    triangle count, distinct-neighbor degree, local clustering
    coefficient) — the closure/community signal the directed KG audit
    family lacks (directed triangles are near-zero on this
    near-bipartite schema, see part_cooccur_adamic_adar's docstring).

    Same edge-iterator kernel as part_cooccur_triangles
    (stages/graph.py:triangle_stats — broadcast oriented adjacency,
    zero shuffles); SQL twin is the shared 3-way self-join over the
    identical least/greatest-oriented distinct pair set."""
    from ..stages.dedup import distinct_rows
    from ..stages.graph import triangle_stats

    _, _, ids_ds = _relational_kg_ds(sf_dir)

    def orient(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy().astype(np.int64)
        t = b.column("t").to_numpy().astype(np.int64)
        keep = h != t
        a = np.minimum(h[keep], t[keep])
        bb = np.maximum(h[keep], t[keep])
        df = pd.DataFrame({"a": a, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = distinct_rows(
        ids_ds.map_batches(orient, batch_format="pyarrow"), ["a", "b"])
    return triangle_stats(pairs)


def part_cooccur_kcore(sf_dir: str) -> pd.DataFrame:
    """Maximal 60-core of the part co-occurrence graph → (node, deg in
    core).  Simultaneous peeling (stages/graph.py:kcore): per round one
    node-sized degree groupby + a broadcast surviving-node filter over
    the edge Dataset; the k-core fixpoint is unique, so the SQL twin's
    level-by-level recursive CTE lands on the identical set.  The
    mirror reads the LAST recursion level, so it assumes a non-empty
    core — asserted here (k=60 is chosen under the test graphs' minimum
    q25 degree; an empty core would match trivially anyway)."""
    from ..stages.dedup import distinct_rows
    from ..stages.graph import cooccur_pairs, kcore

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pairs = cooccur_pairs(ds, group_col="l_orderkey",
                          item_col="l_partkey")
    out = kcore(distinct_rows(pairs, ["a", "b"]), k=60)
    assert len(out), "60-core unexpectedly empty (mirror reads last level)"
    return out


def kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """Global PageRank over the distinct-(h,t) relational KG — the
    whole-graph power iteration (d=0.85, 10 iterations, dangling mass
    redistributed, PR quantized to 9 dp per update) complementing the
    per-head PERSONALIZED PageRank of kg_graph_features.  The SQL twin
    unrolls the identical iterations over the same id assignment
    (stages/pagerank.py docstring: quantize-the-iteration ⇒ no
    cross-engine drift compounds)."""
    from ..stages.dedup import distinct_rows
    from ..stages.pagerank import pagerank

    ent_df, _rel_df, e = _kg_edges_view(
        sf_dir, {"h": "src", "t": "dst"})
    pr = pagerank(distinct_rows(e, ["src", "dst"]), len(ent_df))
    return pr.sort_values("node", ignore_index=True)


def kg_katz(sf_dir: str) -> pd.DataFrame:
    """Katz centrality over the distinct-(h,t) relational KG — the
    attenuated incoming-walk count x = Σ_k β^k (Aᵀ)^k 1 (β=0.01, 8
    iterations, 9-dp quantization per update), the walk-based
    complement to kg_pagerank's stationary-mass view.  The SQL twin
    unrolls the identical iterations over the same id assignment
    (stages/pagerank.py:katz — quantize-the-iteration ⇒ no
    cross-engine drift compounds)."""
    from ..stages.dedup import distinct_rows
    from ..stages.pagerank import katz

    ent_df, _rel_df, e = _kg_edges_view(
        sf_dir, {"h": "src", "t": "dst"})
    kz = katz(distinct_rows(e, ["src", "dst"]), len(ent_df))
    return kz.sort_values("node", ignore_index=True)


def kg_relation_cardinality(sf_dir: str) -> pd.DataFrame:
    """Per-relation cardinality profile (the Bordes et al. 2013 §4
    protocol behind every KGE eval split): tph = triples per distinct
    head, hpt = triples per distinct tail, classified 1-1 / 1-N / N-1 /
    N-N at the 1.5 cutoff.  Per-batch combiner (distinct packed keys +
    counts), one driver fold — the KG vocabulary bounds the state, the
    triple stream never lands anywhere whole."""
    ent_df, rel_df, ds = _kg_edges_view(
        sf_dir, {"h": "h", "t": "t", "r": "r"})
    n_ent = len(ent_df)

    # three vocab-bounded reductions: distinct (r,h), distinct (r,t),
    # triple counts per r — each a per-batch unique/bincount partial
    import ray as _ray

    def parts(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        tt = t.column("t").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        kh = np.unique(r * n_ent + h)
        kt = np.unique(r * n_ent + tt)
        # side 2: per-batch (r, count) partials — the triple tallies
        # fold with the distinct keys in the SAME streaming pass
        ur, cr = np.unique(r, return_counts=True)
        side = np.concatenate([np.zeros(len(kh), np.int8),
                               np.ones(len(kt), np.int8),
                               np.full(len(ur), 2, np.int8)])
        c = np.concatenate([np.ones(len(kh) + len(kt), np.int64),
                            cr.astype(np.int64)])
        return pa.table({"key": pa.array(np.concatenate([kh, kt, ur])),
                         "side": pa.array(side),
                         "c": pa.array(c)})

    tbls = _ray.get(ds.map_batches(parts, batch_format="pyarrow")
                    .to_arrow_refs())
    t = pa.concat_tables([x for x in tbls if x.num_rows])
    key = t.column("key").to_numpy()
    side = t.column("side").to_numpy()
    n_rel = len(rel_df)
    heads = np.zeros(n_rel, np.int64)
    tails = np.zeros(n_rel, np.int64)
    for s, acc in ((0, heads), (1, tails)):
        u = np.unique(key[side == s])
        acc += np.bincount(u // n_ent, minlength=n_rel)
    n_tr = np.zeros(n_rel, np.int64)
    m2 = side == 2
    np.add.at(n_tr, key[m2], t.column("c").to_numpy()[m2])
    tph = n_tr / np.maximum(heads, 1)
    hpt = n_tr / np.maximum(tails, 1)
    cat = np.where(tph < 1.5, np.where(hpt < 1.5, "1-1", "N-1"),
                   np.where(hpt < 1.5, "1-N", "N-N"))
    return pd.DataFrame({
        "rel": rel_df["name"].to_numpy(),
        "n_triples": n_tr,
        "n_heads": heads,
        "n_tails": tails,
        "tph": tph,
        "hpt": hpt,
        "category": cat,
    }).sort_values("rel", ignore_index=True)


def docs_dup_canonical(sf_dir: str) -> pd.DataFrame:
    """Canonical-document selection over the near-dup clusters (the last
    step of a dedup pass: keep ONE representative per cluster) — the
    winner is the member with the most whitespace tokens, ties to the
    smallest doc_id.  Composition: minhash pairs → min-label clusters →
    a per-doc quality probe (the pinned token counter) → per-cluster
    argmax, all over the same Datasets the parent queries stream."""
    from ..pipelines.relational import docs_quality

    clusters = docs_dup_clusters(sf_dir)          # (doc_id, cluster_id)
    q = docs_quality(sf_dir)[["doc_id", "n_tokens"]]
    m = clusters.merge(q, on="doc_id", how="left")
    m["n_tokens"] = m["n_tokens"].fillna(0).astype(np.int64)
    # winner per cluster: max n_tokens, tie -> min doc_id
    m = m.sort_values(["cluster_id", "n_tokens", "doc_id"],
                      ascending=[True, False, True], ignore_index=True)
    first = m.groupby("cluster_id", as_index=False).first() \
        .rename(columns={"doc_id": "canonical_id"})[["cluster_id",
                                                     "canonical_id"]]
    out = m.merge(first, on="cluster_id")
    out["keep"] = (out["doc_id"] == out["canonical_id"]).astype(np.int64)
    return out[["doc_id", "cluster_id", "canonical_id", "keep",
                "n_tokens"]].astype({c: np.int64 for c in
                                     ["doc_id", "cluster_id",
                                      "canonical_id", "keep",
                                      "n_tokens"]}) \
        .sort_values("doc_id", ignore_index=True)


def kg_inverse_relations(sf_dir: str) -> pd.DataFrame:
    """Inverse/symmetric relation detection — the KG-hygiene audit that
    motivated FB15k-237 (Toutanova & Chen 2015: inverse relations leak
    test answers into training).  Run on the KG plus its reversed twin
    (each relation r gains r_rev — a graph constructed to CONTAIN
    inverses, the kg_graph_features_sym trick), so every (r, r_rev)
    pair surfaces at frac 1.0 and the detector's join path is exercised
    end-to-end.

    Shape: forward edges keyed h·|V|+t hash-join reversed edges keyed
    t·|V|+h (only same-bucket rows meet), then a per-batch (r1, r2)
    count combiner folds on the driver — |R|² cells, however large the
    edge stream."""
    from ..functions.joins import hash_join

    ent_df, rel_df, ids_ds = _relational_kg_ds(sf_dir)
    n_ent = len(ent_df)
    n_rel = len(rel_df)

    # symmetrized streaming views: reversed edges get relation id
    # r + n_rel; fwd keys h·|V|+t, rev keys t·|V|+h — built per batch,
    # the edge stream never lands on the driver
    def sym(rcol: str, reverse_key: bool):
        def fn(b: pa.Table) -> pa.Table:
            h = b.column("h").to_numpy().astype(np.int64)
            tt = b.column("t").to_numpy().astype(np.int64)
            r = b.column("r").to_numpy().astype(np.int64)
            h2 = np.concatenate([h, tt])
            t2 = np.concatenate([tt, h])
            r2 = np.concatenate([r, r + n_rel])
            key = (t2 * n_ent + h2) if reverse_key \
                else (h2 * n_ent + t2)
            return pa.table({"key": pa.array(key),
                             rcol: pa.array(r2)})
        return fn

    fwd = ids_ds.map_batches(sym("r1", False), batch_format="pyarrow")
    rev = ids_ds.map_batches(sym("r2", True), batch_format="pyarrow")
    joined = hash_join(fwd, rev, on="key")

    import ray as _ray

    def part(tb: pa.Table) -> pa.Table:
        a = tb.column("r1").to_numpy().astype(np.int64)
        b = tb.column("r2").to_numpy().astype(np.int64)
        k = a * (2 * n_rel) + b
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u), "c": pa.array(c.astype(np.int64))})

    cnt = np.zeros(4 * n_rel * n_rel, dtype=np.int64)
    for tb in _ray.get(joined.map_batches(part, batch_format="pyarrow")
                       .to_arrow_refs()):
        if len(tb):
            np.add.at(cnt, tb.column("k").to_numpy(),
                      tb.column("c").to_numpy())
    names = np.concatenate([rel_df["name"].to_numpy(dtype=object),
                            rel_df["name"].to_numpy(dtype=object) + "_rev"])
    # per-relation edge counts: |R|-bounded per-batch unique partials
    def rc(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("r").to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"r": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    rsz = np.zeros(n_rel, dtype=np.int64)
    for tb in _ray.get(ids_ds.map_batches(
            rc, batch_format="pyarrow").to_arrow_refs()):
        if len(tb):
            np.add.at(rsz, tb.column("r").to_numpy(),
                      tb.column("c").to_numpy())
    sizes = np.concatenate([rsz] * 2).astype(np.int64)
    nz = np.flatnonzero(cnt)
    r1i, r2i = nz // (2 * n_rel), nz % (2 * n_rel)
    frac = cnt[nz] / sizes[r1i]
    return pd.DataFrame({
        "rel1": names[r1i],
        "rel2": names[r2i],
        "n_rel1": sizes[r1i],
        "n_overlap": cnt[nz],
        "frac": frac,
        "kind": np.where(r1i == r2i, "symmetric", "inverse"),
    }).sort_values(["rel1", "rel2"], ignore_index=True)


def part_cooccur_adamic_adar(sf_dir: str) -> pd.DataFrame:
    """Adamic-Adar common-neighbor score for every edge of the part
    co-occurrence graph (the link-prediction / edge-plausibility signal
    on the same projection as part_cooccur_triangles; the relational KG
    itself is near-bipartite — zero triangles — so the co-occurrence
    graph is where neighborhood support exists).  Broadcast symmetric
    CSR + streamed edge-iterator probe (stages/graph.py:adamic_adar),
    zero shuffles past the distinct-pair build.  The SQL twin is the
    two-way adjacency self-join over the same distinct projection."""
    from ..stages.dedup import distinct_rows
    from ..stages.graph import adamic_adar, cooccur_pairs

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pairs = cooccur_pairs(ds, group_col="l_orderkey",
                          item_col="l_partkey")
    return adamic_adar(distinct_rows(pairs, ["a", "b"]))


def docs_bloom_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter decontamination audit (m=2^12 bits, k=3 —
    deliberately undersized so false positives occur and the audit
    columns are exercised): per train
    doc the bloom hits vs exact hits vs false positives — the fixed-size
    broadcast variant of docs_decontaminate, deterministic FPs included,
    SQL-mirrored bit-for-bit via the mix64 chain."""
    from ..stages.curation import bloom_decontaminate, eval_shingle_set

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    is_eval = lambda t, eq: t.filter(pa.array(  # noqa: E731
        (t.column("doc_id").to_numpy() % _EVAL_MOD == 0) == eq))
    ev = eval_shingle_set(
        ds.map_batches(lambda t: is_eval(t, True), batch_format="pyarrow"))
    out = bloom_decontaminate(
        ds.map_batches(lambda t: is_eval(t, False), batch_format="pyarrow"),
        ev).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id").reset_index(drop=True)


def kg_random_walks(sf_dir: str) -> pd.DataFrame:
    """One seeded deterministic 3-step walk per KG entity (DeepWalk-style
    corpus prep) — broadcast CSR, vectorized per-step advance, next edge
    = mix64(777, step, cur, start) % outdeg under the (t, r) edge order;
    SQL twin unrolls the steps over a row_number-ranked edge list."""
    from ..stages.graph import random_walks

    ent_df, _rel_df, ids = _relational_kg(sf_dir)
    return random_walks(ids, len(ent_df), n_steps=3, seed=777)


def kg_biased_walks(sf_dir: str) -> pd.DataFrame:
    """node2vec-style second-order walks (p = q = 2 as integer weights
    1/2/1 for return/triangle/outward) — one seeded 3-step walk per
    entity, weighted next-edge selection by running-weight threshold
    under the (t, r) edge order (stages/graph.py:biased_walks); SQL
    twin unrolls the same weighted pick via window cumsums."""
    from ..stages.graph import biased_walks

    ent_df, _rel_df, ids = _relational_kg(sf_dir)
    return biased_walks(ids, len(ent_df), n_steps=3, seed=911)


def kg_relpath_2hop(sf_dir: str) -> pd.DataFrame:
    """(r1, r2) relation-composition counts over all 2-edge paths of the
    relational KG — the corpus-level path-pattern census behind
    PTransE-style relation-path features.  Edges hash-partition by MID
    node; each partition contributes one R×R in-countᵀ·out-count matmul
    partial (the quadratic path set never materializes); SQL twin is the
    plain edge self-join on the shared mid node."""
    from ..stages.graph import relpath_2hop

    _ent_df, rel_df, ds = _kg_edges_view(
        sf_dir, {"h": "h", "t": "t", "r": "r"})
    return relpath_2hop(ds, len(rel_df))


def kg_reach2(sf_dir: str) -> pd.DataFrame:
    """Per-entity ≤2-hop reach profile over the distinct-(h,t)
    relational KG: n1 = distinct out-neighbors, n_reach2 = distinct
    nodes within two hops, self excluded (stages/graph.py:reach2 —
    mid-node partitions + segment cross-product; the neighborhood-
    growth evidence behind the frontier caps)."""
    from ..stages.dedup import distinct_rows
    from ..stages.graph import reach2

    ent_df, _rel_df, e = _kg_edges_view(
        sf_dir, {"h": "src", "t": "dst"})
    out = reach2(distinct_rows(e, ["src", "dst"]), len(ent_df))
    return out.sort_values("node", ignore_index=True)


def kg_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities over the distinct-(h,t) relational KG —
    8 max-normalized quantized power iterations (node, hub, auth);
    the SQL twin unrolls the identical iterations (max normalization is
    summation-order independent, so the normalizer is bit-identical)."""
    from ..stages.dedup import distinct_rows
    from ..stages.pagerank import hits

    ent_df, _rel_df, e = _kg_edges_view(
        sf_dir, {"h": "src", "t": "dst"})
    out = hits(distinct_rows(e, ["src", "dst"]), len(ent_df))
    return out.sort_values("node", ignore_index=True)


def kg_entity_types(sf_dir: str) -> pd.DataFrame:
    """Relation-signature grouping of every KG entity (schema induction):
    sorted distinct outgoing / incoming relation ids as strings plus the
    size of each (sig_out, sig_in) group — per-batch distinct combiner,
    |V|·|R|-bounded fold, vocab-scale driver string build (rule 13)."""
    from ..stages.graph import entity_signatures

    ent_df, _rel_df, ds = _kg_edges_view(
        sf_dir, {"h": "h", "t": "t", "r": "r"})
    return entity_signatures(ds, len(ent_df))


def media_image_dedup(sf_dir: str) -> pd.DataFrame:
    """Perceptual image dedup over 60 synthesized PPMs: ids 50-59 are
    byte-identical copies of ids 0-9, so aHash collapses each pair to
    one canonical id (stages/media.py:image_ahash_dedup — actor-pool
    decode+hash, hash-domain groupby).  Rows-only: binary payloads are
    synthesized, not a DuckDB-visible table; the pytest pins the
    planted-copy groups and the aHash noise-robustness property."""
    from ..sources.pages import mix64_vec
    from ..stages.media import image_ahash_dedup

    def noise_ppm(i: int, w: int = 24, h: int = 16) -> bytes:
        # per-image mix64 noise: structured gradients (synth_ppm) are
        # perceptually NEAR-DUP by construction — aHash correctly
        # collapses them, so the dedup fixture needs distinct content
        px = (mix64_vec(42, 930, i, np.arange(w * h * 3))
              % np.uint64(256)).astype(np.uint8)
        return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()

    ids = np.arange(60)
    payloads = [noise_ppm(int(i) if i < 50 else int(i) - 50)
                for i in ids]
    t = pa.table({"media_id": pa.array(ids, pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    from ..context import spread

    ds = spread(rd.from_arrow(t))
    return image_ahash_dedup(ds)


def media_frame_sample(sf_dir: str) -> pd.DataFrame:
    """Video frame-sampling actor-pool pipeline: 40 deterministic MPV1
    'videos' (concatenated genuine PPM frames) → every-4th-frame decode →
    per-frame mean R/G/B + pooled-luminance std.  Rows-only: binary
    payloads are synthesized, not a DuckDB-visible table; the pytest
    pins per-frame values against a scalar re-decode."""
    from ..stages.media import frame_sample, synth_mpv

    ids = np.arange(40)
    t = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_mpv(42, int(i)) for i in ids],
                            pa.binary())})
    out = frame_sample(rd.from_arrow(t)).to_pandas()
    for c in ("mean_r", "mean_g", "mean_b", "lum_std"):
        out[c] = out[c].round(6)
    return out.astype({c: np.int64 for c in
                       ("media_id", "frame_idx", "width", "height")}) \
        .sort_values(["media_id", "frame_idx"], ignore_index=True)


def kg_degree_powerlaw(sf_dir: str) -> pd.DataFrame:
    """Power-law fit of the KG out-degree distribution: OLS of
    ln(out-degree) on ln(rank) over the 100 highest-degree entities
    (rank by degree DESC, id ASC) — the hub-skew diagnostic behind the
    frontier caps and hot-key salting.  Same quantize-and-fixed-order
    OLS as docs_zipf_fit; counts are exact integers through one
    degree groupby."""
    from ray.data.aggregate import Sum

    _ent_df, _rel_df, ds = _kg_edges_view(sf_dir, {"h": "h"})

    def part(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("h").to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"h": pa.array(u),
                         "deg": pa.array(c.astype(np.int64))})

    # per-batch count partial → |V|-bounded groupby; only the vocab-
    # scale (h, deg) table reaches the driver for the top-100 fit
    deg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("h").aggregate(Sum("deg", alias_name="deg"))
           .to_pandas())
    deg = deg.sort_values(["deg", "h"], ascending=[False, True],
                          ignore_index=True).head(100)
    n = float(len(deg))
    x = np.log(np.arange(1, len(deg) + 1, dtype=np.float64))
    y = np.log(deg["deg"].to_numpy(np.float64))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame([{
        "n_terms": np.int64(len(deg)),
        "slope": round(slope, 6),
        "intercept": round((sy - slope * sx) / n, 6)}])


def kg_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Per-relation reciprocity: the fraction of (h, t) edges whose
    reversed pair (t, h) exists under ANY relation — the
    symmetric-leakage profile complementing kg_inverse_relations.
    Membership = one packed-key searchsorted against the broadcast
    distinct-pair set; integer counts, one rounded division."""
    ent_df, _rel_df, ids = _relational_kg(sf_dir)
    assert len(ent_df) < (1 << 31)
    h = ids["h"].to_numpy(np.int64)
    t = ids["t"].to_numpy(np.int64)
    r = ids["r"].to_numpy(np.int64)
    keys = np.unique((h << 31) | t)
    rev = (t << 31) | h
    pos = np.clip(np.searchsorted(keys, rev), 0, len(keys) - 1)
    hit = (keys[pos] == rev).astype(np.int64)
    ur, inv = np.unique(r, return_inverse=True)
    n_edges = np.bincount(inv, minlength=len(ur)).astype(np.int64)
    n_rec = np.bincount(inv, weights=hit,
                        minlength=len(ur)).astype(np.int64)
    return pd.DataFrame({
        "r": ur, "n_edges": n_edges, "n_reciprocal": n_rec,
        "reciprocity": np.round(n_rec / n_edges.astype(np.float64), 6),
    }).sort_values("r").reset_index(drop=True)


def kg_type_violations(sf_dir: str) -> pd.DataFrame:
    """Relation domain audit (schema-violation detection for the
    constructed KG): every entity gets a TYPE = the relation it most
    often heads (count DESC, rel ASC tie-break); per relation the
    dominant subject type and the share of edges whose subject deviates
    — spikes flag extraction noise or alias-merge errors.

    All integer counts: (h, r) pair counts come from one per-batch
    combiner + groupby (|V|·|R|-bounded, the edge stream never lands
    whole), the entity-type argmax and per-relation dominance are
    driver folds on that vocab-scale table (rule 13), and the edge
    re-count uses a broadcast type array."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast, spread

    ent_df, _rel_df, ds = _kg_edges_view(
        sf_dir, {"h": "h", "t": "t", "r": "r"})
    n_ent = len(ent_df)

    def hr_counts(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        n_rel = int(r.max()) + 1 if len(r) else 1
        k, c = np.unique(h * n_rel + r, return_counts=True)
        return pa.table({"h": pa.array(k // n_rel),
                         "r": pa.array(k % n_rel),
                         "c": pa.array(c.astype(np.int64))})

    hr = (ds.map_batches(hr_counts, batch_format="pyarrow")
          .groupby(["h", "r"]).aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    # entity type: argmax r by (c DESC, r ASC) per head
    order = np.lexsort((hr["r"].to_numpy(), -hr["c"].to_numpy()))
    hs = hr["h"].to_numpy(np.int64)[order]
    rs = hr["r"].to_numpy(np.int64)[order]
    first = np.unique(hs, return_index=True)[1]
    htype = np.full(n_ent, -1, dtype=np.int64)
    htype[hs[first]] = rs[first]
    bc = Broadcast(htype)

    def rt_counts(t: pa.Table) -> pa.Table:
        types = bc.get()
        h = t.column("h").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        ht = types[h]
        n_t = int(types.max()) + 2
        k, c = np.unique(r * n_t + (ht + 1), return_counts=True)
        return pa.table({"r": pa.array(k // n_t),
                         "htype": pa.array(k % n_t - 1),
                         "c": pa.array(c.astype(np.int64))})

    et = (ds.map_batches(rt_counts, batch_format="pyarrow")
          .groupby(["r", "htype"]).aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    rows = []
    for r_, g in et.groupby("r"):
        c = g["c"].to_numpy(np.int64)
        ty = g["htype"].to_numpy(np.int64)
        o = np.lexsort((ty, -c))
        total = int(c.sum())
        dom_cnt = int(c[o[0]])
        rows.append((int(r_), total, int(ty[o[0]]), total - dom_cnt,
                     float(half_up((total - dom_cnt) / total, 6))))
    return pd.DataFrame(rows, columns=["rel", "n_edges", "dom_subj_type",
                                       "n_viol", "viol_share"]) \
        .astype({"rel": np.int64, "n_edges": np.int64,
                 "dom_subj_type": np.int64, "n_viol": np.int64}) \
        .sort_values("rel", ignore_index=True)


def kg_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the constructed KG: Pearson r between
    the TOTAL degree (in+out) of the two endpoints across edges — the
    hub-wiring diagnostic (disassortative r < 0 means hubs attach to
    leaves, which drives the frontier caps; the out/in variant is
    degenerate here because every subject heads exactly one edge).
    Degrees come from one |V|-bounded combiner+groupby pass and
    broadcast as one lookup array; the correlation sums (Σx, Σy, Σxy,
    Σx², Σy², n) are EXACT integers through a second streaming pass,
    so both engines land on the identical double before the 6-dp
    round."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast, spread

    ent_df, _rel_df, ds = _kg_edges_view(sf_dir, {"h": "h", "t": "t"})
    n_ent = len(ent_df)

    def deg_partial(t: pa.Table) -> pa.Table:
        # SPARSE (id, count) partials — a dense |V|-sized row block per
        # batch would push |V|·#blocks rows through the groupby shuffle
        h = t.column("h").to_numpy().astype(np.int64)
        tt = t.column("t").to_numpy().astype(np.int64)
        uo, co = np.unique(h, return_counts=True)
        ui, ci = np.unique(tt, return_counts=True)
        return pa.table({
            "id": pa.array(np.concatenate([uo, ui])),
            "od": pa.array(np.concatenate(
                [co, np.zeros(len(ci), co.dtype)]).astype(np.int64)),
            "idg": pa.array(np.concatenate(
                [np.zeros(len(co), ci.dtype), ci]).astype(np.int64))})

    deg = (ds.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("id")
           .aggregate(Sum("od", alias_name="od"),
                      Sum("idg", alias_name="idg"))).to_pandas()
    dg = np.zeros(n_ent, np.int64)
    dg[deg["id"].to_numpy(np.int64)] = (deg["od"].to_numpy(np.int64)
                                        + deg["idg"].to_numpy(np.int64))
    bc = Broadcast(dg)

    def corr_partial(t: pa.Table) -> pa.Table:
        d = bc.get()
        x = d[t.column("h").to_numpy().astype(np.int64)]
        y = d[t.column("t").to_numpy().astype(np.int64)]
        return pa.table({
            "n": pa.array([np.int64(len(x))]),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxy": pa.array([(x * y).sum()]),
            "sxx": pa.array([(x * x).sum()]),
            "syy": pa.array([(y * y).sum()])})

    s = ds.map_batches(corr_partial, batch_format="pyarrow").to_pandas() \
        .sum()
    n, sx, sy = int(s["n"]), int(s["sx"]), int(s["sy"])
    sxy, sxx, syy = int(s["sxy"]), int(s["sxx"]), int(s["syy"])
    num = float(n) * sxy - float(sx) * sy
    den = np.sqrt((float(n) * sxx - float(sx) * sx)
                  * (float(n) * syy - float(sy) * sy))
    r = round(num / den, 6) if den > 0 else 0.0
    return pd.DataFrame({"n_edges": [np.int64(n)],
                         "assortativity": [r]})


def kg_twins(sf_dir: str) -> pd.DataFrame:
    """Structural-equivalence twins: entities sharing the EXACT
    (sorted distinct out-neighbor set, sorted distinct in-neighbor set)
    — the alias-merge audit one level deeper than entity_signatures'
    relation-signature grouping (same relations ≠ same neighbors).

    Per-batch distinct (entity, neighbor, side) key combiner (state
    bounded by distinct pairs, never the edge stream) → one groupby →
    per-entity sorted ','-join → twin classes = groupby over the
    (out_sig, in_sig) strings.  Output: one row per entity that has at
    least one twin, with its class id (min entity id in the class) and
    class size.  SQL twin string_agg's the same sorted sets."""
    from ray.data.aggregate import Count

    _, _, ds = _kg_edges_view(sf_dir, {"h": "h", "t": "t"})

    def pairs(b: pa.Table) -> pa.Table:
        hh = b.column("h").to_numpy().astype(np.int64)
        tt = b.column("t").to_numpy().astype(np.int64)
        n = max(int(hh.max()), int(tt.max())) + 1 if len(hh) else 1
        k_out = np.unique(hh * n + tt)
        k_in = np.unique(tt * n + hh)
        return pa.table({
            "ent": pa.array(np.concatenate([k_out // n, k_in // n])),
            "nbr": pa.array(np.concatenate([k_out % n, k_in % n])),
            "side": pa.array(np.concatenate(
                [np.ones(len(k_out), np.int8),
                 np.zeros(len(k_in), np.int8)]))})

    dd = (ds.map_batches(pairs, batch_format="pyarrow")
          .groupby(["ent", "nbr", "side"])
          .aggregate(Count(alias_name="cnt")).to_pandas())
    # vocab-scale driver fold (rule 13): sorted ','-joined sigs
    dd = dd.sort_values(["ent", "side", "nbr"])
    ent = dd["ent"].to_numpy(np.int64)
    nbr = dd["nbr"].to_numpy(np.int64)
    side = dd["side"].to_numpy(np.int8)
    sigs: dict[int, list[str]] = {}
    import itertools

    for (e, sd), grp in itertools.groupby(
            zip(ent.tolist(), side.tolist(), nbr.tolist()),
            key=lambda x: (x[0], x[1])):
        sigs.setdefault(e, ["", ""])[sd] = \
            ",".join(str(x[2]) for x in grp)
    df = pd.DataFrame({
        "ent": list(sigs.keys()),
        "in_sig": [v[0] for v in sigs.values()],
        "out_sig": [v[1] for v in sigs.values()]})
    g = df.groupby(["out_sig", "in_sig"])["ent"]
    df["twin_class"] = g.transform("min").astype(np.int64)
    df["class_size"] = g.transform("size").astype(np.int64)
    out = df[df["class_size"] >= 2][["ent", "twin_class", "class_size"]]
    return out.astype({"ent": np.int64}) \
        .sort_values("ent", ignore_index=True)


def kg_bfs_layers(sf_dir: str, depth: int = 4) -> pd.DataFrame:
    """Directed BFS layer census from 5 fixed seed entities (ids 0, 10,
    20, 30, 40): how many NEW entities are first reached at each depth
    ≤ 4 — the per-seed expansion profile behind frontier-cap sizing
    (the multi-seed sibling of reach2's global 2-hop view).

    Level-synchronous distributed BFS: per level ONE pass over the edge
    Dataset with the (frontier, visited) bitmask broadcast; batches
    emit (seed, newly-reached node) candidate pairs only — the edge
    stream never lands.  Visited state is |V|×5 bits; at web scale the
    bitmask becomes a hash-partitioned frontier join (documented), the
    level structure is identical.  SQL twin unrolls the levels with
    NOT-EXISTS cumulative sets."""
    from ray.data.aggregate import Count

    from ..context import Broadcast

    # duplicate (h, t) edges are harmless to the frontier expansion
    # (per-batch np.unique + the candidate groupby dedup them), so the
    # streaming view needs no distinct pass
    ent_df, _rel_df, ds = _kg_edges_view(sf_dir, {"h": "h", "t": "t"})
    n_ent = len(ent_df)
    seeds = [s for s in (0, 10, 20, 30, 40) if s < n_ent]

    vis = np.zeros((n_ent, len(seeds)), dtype=bool)
    frontier = np.zeros((n_ent, len(seeds)), dtype=bool)
    for i, s in enumerate(seeds):
        vis[s, i] = True
        frontier[s, i] = True
    rows = []
    for d in range(1, depth + 1):
        bc = Broadcast(frontier)

        def expand(t: pa.Table) -> pa.Table:
            fr = bc.get()
            h = t.column("h").to_numpy().astype(np.int64)
            tt = t.column("t").to_numpy().astype(np.int64)
            outs = []
            for i in range(fr.shape[1]):
                nodes = np.unique(tt[fr[h, i]])
                outs.append(pa.table({
                    "seed": pa.array(np.full(len(nodes), i, np.int64)),
                    "node": pa.array(nodes)}))
            return pa.concat_tables(outs)

        cand = (ds.map_batches(expand, batch_format="pyarrow")
                .groupby(["seed", "node"])
                .aggregate(Count(alias_name="c")).to_pandas())
        if "seed" not in cand.columns:      # dead frontier everywhere
            cand = pd.DataFrame({"seed": np.empty(0, np.int64),
                                 "node": np.empty(0, np.int64)})
        frontier = np.zeros_like(frontier)
        for i in range(len(seeds)):
            nodes = cand.loc[cand["seed"] == i, "node"] \
                .to_numpy(np.int64)
            new = nodes[~vis[nodes, i]]
            vis[new, i] = True
            frontier[new, i] = True
            rows.append((seeds[i], d, len(new)))
    out = pd.DataFrame(rows, columns=["seed", "depth", "n_new"])
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["seed", "depth"], ignore_index=True)


def media_audio_dedup(sf_dir: str) -> pd.DataFrame:
    """Spectral-fingerprint audio dedup over 60 synthetic WAV clips:
    ids 50-59 are byte-identical copies of 0-9 (same seeds) — the
    audio sibling of media_image_dedup.  Rows-only (binary payloads);
    the planted copy groups + gain-robustness property are pinned in
    tests/test_media.py."""
    from ..stages.media import audio_fp_dedup, synth_wav

    ids = np.arange(60)
    payloads = [synth_wav(42, int(i % 50 if i >= 50 else i))
                for i in ids]
    t = pa.table({"media_id": pa.array(ids, pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    return audio_fp_dedup(rd.from_arrow(t))


def kg_relation_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-relation object-distribution entropy + normalized form —
    the selectivity audit next to kg_relation_cardinality's tph/hpt
    ratios: H_r = ln(N_r) − (Σ_t c_{r,t}·ln c_{r,t})/N_r, norm =
    H_r / ln(#distinct objects) (1 = uniform fan-out, 0 = a single
    dominant object — extraction-template smell).

    Per-batch (r, t) count combiner → ONE (r, t)-domain groupby →
    per-relation fold over vocab-bounded rows; the entropy chain is
    fixed-order over exact integer counts, rounded 6 dp in both
    engines."""
    from ray.data.aggregate import Sum

    from ..context import half_up

    _, rel_df, ds = _kg_edges_view(sf_dir, {"t": "t", "r": "r"})

    def part(b: pa.Table) -> pa.Table:
        tt = b.column("t").to_numpy().astype(np.int64)
        r = b.column("r").to_numpy().astype(np.int64)
        n_r = int(r.max()) + 1 if len(r) else 1
        k, c = np.unique(tt * n_r + r, return_counts=True)
        return pa.table({"t": pa.array(k // n_r),
                         "r": pa.array(k % n_r),
                         "c": pa.array(c.astype(np.int64))})

    rt = (ds.map_batches(part, batch_format="pyarrow")
          .groupby(["t", "r"]).aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    rows = []
    for r_, g in rt.groupby("r", sort=True):
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        n = float(c.sum())
        k = len(c)
        # per-term round-9 quantization (the kg_pagerank convention):
        # DuckDB's parallel SUM over raw c*ln(c) is order-dependent;
        # quantizing each term first makes the cross-engine sum agree
        sclc = float(np.round(c * np.log(c), 9).sum())
        ent = np.log(n) - sclc / n
        norm = ent / np.log(k) if k > 1 else 0.0
        rows.append((int(r_), int(n), k,
                     float(half_up(ent, 6)), float(half_up(norm, 6))))
    out = pd.DataFrame(rows, columns=["rel", "n_edges", "n_objects",
                                      "entropy", "norm_entropy"])
    return out.astype({"rel": np.int64, "n_edges": np.int64,
                       "n_objects": np.int64}) \
        .sort_values("rel", ignore_index=True)


def docs_split_stratified(sf_dir: str) -> pd.DataFrame:
    """Stratified train/val/test split (80/10/10 per source) by seeded
    hash rank — the leakage-safe eval-split primitive every curation
    run ends with: proportions hold per SOURCE (not just globally), and
    membership depends only on (seed, doc_id), so re-runs and
    incremental ingests agree.

    Per-batch (source, count) partials size the strata; each doc's
    rank within its source = position of mix64(1009, doc_id) among its
    stratum's sorted keys.  The rank pass is a per-source-partition
    vectorized argsort (sources hash-partition; state bounded by the
    stratum).  SQL twin: row_number over the identical mix64 key."""
    from ..sources.pages import mix64_vec

    ds = _docs_ds(sf_dir, ["doc_id", "source"])

    def tag(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy().astype(np.int64)
        key = mix64_vec(1009, did).astype(np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False) \
            .astype(str)
        from ..stages.dedup import word_fp

        codes, uniq = pd.factorize(src)
        # partition by STABLE source hash (python hash() is per-process
        # randomized — it fragmented strata across partitions); few
        # sources -> few partitions; at web scale salt the big strata
        # and merge rank offsets
        part = np.asarray([word_fp(u) % 16 for u in uniq])[codes]
        return pa.table({"doc_id": pa.array(did),
                         "source": pa.array(src, pa.string()),
                         "key": pa.array(key),
                         "part": pa.array(part.astype(np.int32))})

    def split_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "source": np.empty(0, object),
                                 "split": np.empty(0, object)})
        outs = []
        for src, gg in g.groupby("source"):
            key = gg["key"].to_numpy(np.int64)
            order = np.lexsort((gg["doc_id"].to_numpy(np.int64), key))
            n = len(gg)
            n_tr = (n * 8) // 10
            n_va = n // 10
            split = np.empty(n, dtype=object)
            ranks = np.empty(n, dtype=np.int64)
            ranks[order] = np.arange(n)
            split[ranks < n_tr] = "train"
            split[(ranks >= n_tr) & (ranks < n_tr + n_va)] = "val"
            split[ranks >= n_tr + n_va] = "test"
            outs.append(pd.DataFrame({
                "doc_id": gg["doc_id"].to_numpy(np.int64),
                "source": src, "split": split}))
        return pd.concat(outs, ignore_index=True)

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("part").map_groups(split_part,
                                       batch_format="pandas")
           .to_pandas())
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id", ignore_index=True)


def kg_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Count-of-counts degree histogram of the KG (out / in / total
    sides tagged in one table): how many entities have degree k — the
    raw distribution behind kg_degree_powerlaw's fit and the
    frontier-cap sizing.  Per-batch degree partials → one entity-domain
    groupby → tiny histogram fold (the events_user_gini shape)."""
    from ray.data.aggregate import Sum

    _, _, ds = _kg_edges_view(sf_dir, {"h": "h", "t": "t"})

    def part(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy().astype(np.int64)
        t = b.column("t").to_numpy().astype(np.int64)
        uo, co = np.unique(h, return_counts=True)
        ui, ci = np.unique(t, return_counts=True)
        return pa.table({
            "ent": pa.array(np.concatenate([uo, ui])),
            "side": pa.array(np.concatenate(
                [np.zeros(len(uo), np.int8), np.ones(len(ui), np.int8)])),
            "c": pa.array(np.concatenate([co, ci]).astype(np.int64))})

    per = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["ent", "side"])
           .aggregate(Sum("c", alias_name="c")).to_pandas())
    rows = []
    for side_name, sel in (("out", per["side"] == 0),
                           ("in", per["side"] == 1)):
        deg = per.loc[sel, "c"].to_numpy(np.int64)
        u, c = np.unique(deg, return_counts=True)
        rows += [(side_name, int(k), int(n)) for k, n in zip(u, c)]
    tot = per.groupby("ent")["c"].sum().to_numpy(np.int64)
    u, c = np.unique(tot, return_counts=True)
    rows += [("total", int(k), int(n)) for k, n in zip(u, c)]
    out = pd.DataFrame(rows, columns=["side", "degree", "n_entities"])
    return out.astype({"degree": np.int64, "n_entities": np.int64}) \
        .sort_values(["side", "degree"], ignore_index=True)
