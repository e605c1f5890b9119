"""Oracle-checked pipelines over the driver's TPC-H-ish tables.

These exercise the engine's relational operator surface (projection,
broadcast join, groupby aggregate with per-batch partials, sort/limit,
window bucketing, dedup) with exact DuckDB SQL mirrors in
``__ray_entry__.oracle_sql`` — column names, types (int64/float64) and
rounding are matched on both sides.

The KG-from-relational queries derive a (subj, pred, obj) edge table from
customer/supplier/nation/region/orders — the same edge-table data model
phase A produces from web pages, so vocab build / id-mapping / splits /
negative sampling are verifiable against ANSI SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..context import Broadcast, half_up
from ..stages.dedup import distinct_rows


def _read(sf_dir: str, name: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir.rstrip('/')}/{name}.parquet",
                           columns=columns)


def _small_map(sf_dir: str, name: str, key: str, val: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir.rstrip('/')}/{name}.parquet",
                      columns=[key, val])
    return dict(zip(t.column(key).to_pylist(), t.column(val).to_pylist()))


def _dense_lookup(d: dict) -> np.ndarray:
    """{small dense int id → value} → object array for fancy-index maps."""
    arr = np.empty(max(d) + 1, dtype=object)
    for k, v in d.items():
        arr[k] = v
    return arr


# ---------------------------------------------------------------------------
# KG edges from relational tables
# ---------------------------------------------------------------------------

def kg_edges_relational(sf_dir: str):
    """(subj, pred, obj) edges: customers/suppliers→nation, nation→region,
    orders→customer.  Small sides broadcast; distinct via hash-partition
    dedup."""
    nation = _small_map(sf_dir, "nation", "n_nationkey", "n_name")
    region = _small_map(sf_dir, "region", "r_regionkey", "r_name")
    n2r = _small_map(sf_dir, "nation", "n_nationkey", "n_regionkey")
    customer_name = _small_map(sf_dir, "customer", "c_custkey", "c_name")
    # broadcast DENSE id→name arrays: the lookup is a fancy index per
    # batch, not a per-row dict probe
    nation_bc = Broadcast(_dense_lookup(nation))
    cust_bc = Broadcast(_dense_lookup(customer_name))

    def cust_edges(b: pa.Table) -> pa.Table:
        objs = nation_bc.get()[b.column("c_nationkey").to_numpy()]
        n = b.num_rows
        return pa.table({
            "subj": b.column("c_name").cast(pa.string()),
            "pred": pa.array(["in_nation"] * n, pa.string()),
            "obj": pa.array(objs, pa.string()),
        })

    def supp_edges(b: pa.Table) -> pa.Table:
        objs = nation_bc.get()[b.column("s_nationkey").to_numpy()]
        n = b.num_rows
        return pa.table({
            "subj": b.column("s_name").cast(pa.string()),
            "pred": pa.array(["in_nation"] * n, pa.string()),
            "obj": pa.array(objs, pa.string()),
        })

    def order_edges(b: pa.Table) -> pa.Table:
        okey = b.column("o_orderkey").to_numpy()
        subs = np.char.add("order_", okey.astype("U"))
        objs = cust_bc.get()[b.column("o_custkey").to_numpy()]
        return pa.table({
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(["placed_by"] * b.num_rows, pa.string()),
            "obj": pa.array(objs, pa.string()),
        })

    c = _read(sf_dir, "customer", ["c_name", "c_nationkey"]).map_batches(
        cust_edges, batch_format="pyarrow")
    s = _read(sf_dir, "supplier", ["s_name", "s_nationkey"]).map_batches(
        supp_edges, batch_format="pyarrow")
    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        order_edges, batch_format="pyarrow")
    nr = rd.from_items([
        {"subj": nation[k], "pred": "in_region", "obj": region[n2r[k]]}
        for k in sorted(nation)
    ])
    return distinct_rows(c.union(s).union(o).union(nr),
                         ["subj", "pred", "obj"])


def kg_vocab_entities(sf_dir: str) -> pd.DataFrame:
    """Distinct entity names (subj ∪ obj) with sort-assigned int64 ids."""
    from .corpus_queries import _relational_kg_ds  # shared memoized build

    ent_df, _rel, _ids_ds = _relational_kg_ds(sf_dir)
    out = ent_df.copy()
    out["id"] = out["id"].astype(np.int64)
    return out[["name", "id"]]


def kg_edges_idmapped(sf_dir: str) -> pd.DataFrame:
    """Edges id-mapped to (h, t, r) — note the head/TAIL/relation order."""
    from .corpus_queries import _relational_kg

    _ent, _rel, ids = _relational_kg(sf_dir)
    return ids.astype({"h": np.int64, "t": np.int64, "r": np.int64})


def kg_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic arithmetic-hash split → per-split counts."""
    from ..functions.sampling import add_split_column
    from .corpus_queries import _relational_kg_ds

    _ent, _rel, ids_ds = _relational_kg_ds(sf_dir)
    tagged = ids_ds.map_batches(add_split_column,
                                batch_format="pyarrow")
    out = tagged.groupby("split").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    return out.astype({"n": np.int64}).sort_values("split").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Documents / text-analysis queries
# ---------------------------------------------------------------------------

def docs_exact_dedup(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import exact_dedup_docs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup_docs(ds, id_col="doc_id", text_col="text").to_pandas()
    return out.astype({"doc_id": np.int64, "n_dups": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_quality(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: quality_batch(b, id_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    ).to_pandas()
    return out.astype({c: np.int64 for c in out.columns})


def docs_token_stats(sf_dir: str) -> pd.DataFrame:
    """Per-lang doc count + total whitespace tokens (partial-agg pattern)."""
    from ..stages.text import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, id_col="doc_id", text_col="text")
        df = pd.DataFrame({
            "lang": b.column("lang").to_pylist(),
            "ws": t.column("ws_tokens").to_numpy(),
        })
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("ws", "size"), sum_tokens=("ws", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_tokens", alias_name="sum_tokens"))
        .to_pandas()
    )
    return out.astype({"n_docs": np.int64, "sum_tokens": np.int64}) \
        .sort_values("lang").reset_index(drop=True)


def docs_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-language EXACT length quantiles (chars + whitespace tokens)
    via the histogram-merge quantile stage (stages/quantiles.py) — no
    global sort; the shuffle moves (lang, col, value, count) rows only,
    sized by the distinct-value domain, not the corpus."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def feats(b: pa.Table) -> pa.Table:
        q = quality_batch(b, id_col="doc_id", text_col="text")
        return pa.table({
            "lang": b.column("lang"),
            "n_chars": q.column("n_chars"),
            "n_tokens": q.column("n_tokens"),
        })

    out = exact_quantiles(
        ds.map_batches(feats, batch_format="pyarrow"),
        ["n_chars", "n_tokens"],
        [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0],
        group_col="lang",
    )
    return out.astype({"n_chars_q": np.int64, "n_tokens_q": np.int64})


def docs_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """CCNet-style model-based quality score: fit a smoothed unigram LM
    on the even-doc_id half (the 'clean reference corpus'), score every
    doc by mean token ln-probability.  Fit = top-tokens combiner +
    groupby; model broadcast once; scoring is a stateless vectorized
    pass.  SQL twin rebuilds the identical model (same top-V tie-break,
    same add-one smoothing) and scores by join."""
    import pyarrow.compute as pc

    from ..stages.lm_score import fit_unigram_lm, perplexity_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_unigram_lm(ref, vocab_k=20000)
    out = perplexity_score(ds, model).to_pandas()
    out["logprob_mean"] = out["logprob_mean"].round(6)
    return out.astype({"doc_id": np.int64, "n_tokens": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3):
    score every doc with the reference-half unigram LM
    (docs_lm_perplexity's exact model), then bucket per SOURCE into
    perplexity tertiles — head = best (highest mean ln p) third.

    Cross-engine determinism: buckets cut on the 6-dp-rounded score
    reinterpreted as fixed-point int64 (score_fp = round(m,6)·10⁶), and
    the tertile cutpoints are the observed values at integer ranks
    ⌊(n−1)/3⌋ / ⌊2(n−1)/3⌋ — the lower-disc rule with PURE-INTEGER rank
    arithmetic (a float q=1/3 would floor one rank low when (n−1)%3=0).

    Scale shape: fit = top-tokens combiner; scoring = broadcast-model
    actor pool; source attach = one bucketed hash_join; cutpoints come
    from the (source × distinct-score) HISTOGRAM (stages/quantiles.py
    combiner — payload is the distinct fixed-point score domain, not
    the doc count); the final flag pass is stateless."""
    import pyarrow.compute as pc

    from ..context import Broadcast
    from ..functions.joins import hash_join
    from ..stages.lm_score import fit_unigram_lm, perplexity_score
    from ..stages.quantiles import _batch_histogram

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_unigram_lm(ref, vocab_k=20000)
    scored = perplexity_score(ds, model)

    src = ds.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow")
    sc = hash_join(scored, src, on="doc_id").map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "source": t.column("source"),
            "score_fp": pa.array(np.rint(np.round(
                t.column("logprob_mean").to_numpy(), 6) * 1e6)
                .astype(np.int64))}),
        batch_format="pyarrow")

    hist = (sc.map_batches(_batch_histogram(["score_fp"], "source"),
                           batch_format="pyarrow")
            .groupby(["source", "col", "value"]).sum("cnt").to_pandas()
            .rename(columns={"sum(cnt)": "cnt"}))
    cuts: dict = {}
    for s, g in hist.groupby("source", sort=True):
        g = g.sort_values("value")
        vals = g["value"].to_numpy(np.int64)
        cum = np.cumsum(g["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        c1 = int(vals[np.searchsorted(cum, (n - 1) // 3 + 1)])
        c2 = int(vals[np.searchsorted(cum, (2 * (n - 1)) // 3 + 1)])
        cuts[s] = (c1, c2)
    bc = Broadcast(cuts)

    def flag(t: pa.Table) -> pa.Table:
        cu = bc.get()
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        fp = t.column("score_fp").to_numpy()
        c1 = np.array([cu[s][0] for s in srcs], np.int64)
        c2 = np.array([cu[s][1] for s in srcs], np.int64)
        bucket = np.where(fp >= c2, "head",
                          np.where(fp >= c1, "middle", "tail"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "logprob_mean": pa.array(fp / 1e6, pa.float64()),
            "bucket": pa.array(bucket.astype(object), pa.string())})

    out = sc.map_batches(flag, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id", ignore_index=True)


ML_IN_SOURCES = ("src0", "src1", "src2", "src3")


def docs_moore_lewis(sf_dir: str) -> pd.DataFrame:
    """Moore-Lewis cross-entropy-difference selection (ACL 2010): fit
    one add-one unigram LM on the in-domain sources and one on the full
    corpus, score every doc by mean ln p_in − mean ln p_out, keep the
    non-negative ones.  Both fits are the top-tokens combiner shape;
    the two models ride one broadcast; scoring is a single stateless
    vectorized pass (one factorize, two searchsorted probes)."""
    import pyarrow.compute as pc

    from ..stages.lm_score import fit_unigram_lm, moore_lewis_score

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    in_ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("source"),
                                    value_set=pa.array(ML_IN_SOURCES))),
        batch_format="pyarrow")
    m_in = fit_unigram_lm(in_ds, vocab_k=20000)
    m_out = fit_unigram_lm(ds, vocab_k=20000)
    out = moore_lewis_score(ds, m_in, m_out).to_pandas()
    return out.astype({"doc_id": np.int64, "n_tokens": np.int64,
                       "keep": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_heaps_law(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve (per-doc new-type counts +
    running totals) — all-integer, one tagged groupby resolves global
    first occurrences (stages/curation.py:heaps_curve)."""
    from ..stages.curation import heaps_curve

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return heaps_curve(ds)


def embeddings_kcenter(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 / Core-Set,
    ICLR 2018): 8 farthest-point representatives picked by quantized
    round-6 comparisons, every vector labeled with its nearest center
    (stages/cluster.py:kcenter_greedy — k stateless argmax passes, the
    same unrolled-iteration mirror family as embeddings_kmeans)."""
    from ..stages.cluster import kcenter_greedy

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kcenter_greedy(ds, k=8)


def docs_zipf_fit(sf_dir: str) -> pd.DataFrame:
    """Per-source Zipf slope/intercept (OLS of ln count on ln rank over
    the top-100 tokens) — corpus-mixture distribution health
    (stages/retrieval.py:zipf_fit; grouped_topk prunes per batch, only
    ~100·#sources rows reach the driver)."""
    from ..stages.retrieval import zipf_fit

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return zipf_fit(ds, k=100)


def docs_rake_keywords(sf_dir: str) -> pd.DataFrame:
    """Corpus-level RAKE keyword extraction (Rose et al. 2010): top-20
    stopword-delimited phrases by Σ deg/freq word scores
    (stages/retrieval.py:rake_keywords — global word-score model via
    one vocab-sized groupby, broadcast once, per-batch partial top-k;
    a global-top-k phrase outranks ≤ k−1 phrases in any batch, so the
    partials are lossless for both ranking and occurrence counts)."""
    from ..stages.retrieval import rake_keywords

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return rake_keywords(ds, k=20)


def embeddings_rq(sf_dir: str) -> pd.DataFrame:
    """Two-level residual quantization (Chen et al. 2010 RVQ): level-1
    k-means codes, then k-means over the level-1 residuals — codes +
    per-level rounded distances; rq_err = the level-2 distance = the
    reconstruction error of (C1[c1] + C2[c2])
    (stages/cluster.py:residual_quant, the same quantized-iteration
    chain as embeddings_kmeans at both levels)."""
    from ..stages.cluster import residual_quant

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return residual_quant(ds, k=4, n_iter=2)


def events_attribution(sf_dir: str) -> pd.DataFrame:
    """Last-touch attribution: each purchase attributed to the user's
    most recent click at or before it (stages/temporal.py:
    last_touch_attribution — one bucketed asof_join); DuckDB twin is a
    native ASOF LEFT JOIN."""
    from ..stages.temporal import last_touch_attribution

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"])
    return last_touch_attribution(ds, convert_type="purchase",
                                  touch_type="click")


def events_hourly_mad(sf_dir: str) -> pd.DataFrame:
    """Robust hourly anomalies per event type: |count − median| >
    3·MAD, all integer medians by the lower-discrete rule
    (stages/temporal.py:hourly_mad_anomaly)."""
    from ..stages.temporal import hourly_mad_anomaly

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return hourly_mad_anomaly(ds, k_mad=3)


def events_cusum(sf_dir: str) -> pd.DataFrame:
    """Per-type CUSUM drift alarms over the hourly count series —
    Page's one-sided control chart with the lower-discrete median as
    reference and 4·MAD as the alarm line, computed by the all-integer
    prefix identity S_t = P_t − min(0, min running P)
    (stages/temporal.py:cusum_alarm)."""
    from ..stages.temporal import cusum_alarm

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return cusum_alarm(ds, k_thresh=4)


def embeddings_spherical_kmeans(sf_dir: str) -> pd.DataFrame:
    """Cosine (spherical) k-means: unit-normalize, then the quantized
    Lloyd loop of embeddings_kmeans — on the sphere Euclidean argmin ≡
    cosine argmax (stages/cluster.py:spherical_kmeans)."""
    from ..stages.cluster import spherical_kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    asg, _C = spherical_kmeans(ds, k=8, n_iter=4)
    out = asg.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return out.astype({"vec_id": np.int64, "cluster": np.int64})


ANN_RECALL_QIDS = [0, 100, 200, 300, 400]


def embeddings_ann_recall(sf_dir: str) -> pd.DataFrame:
    """Recall@10 audit of the hash-centroid IVF (16 centroids, probe 2)
    vs exact brute force over 5 fixed query vectors — the
    accuracy-vs-speed evidence for the ANN scale path
    (stages/ann.py:ann_recall; the embeddings twin of
    docs_minhash_estimate)."""
    from ..stages.ann import ann_recall

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_recall(ds, ANN_RECALL_QIDS, k=10, n_centroids=16,
                      n_probe=2)


def embeddings_range_search(sf_dir: str) -> pd.DataFrame:
    """Radius cosine search: every corpus vector with round-6 cosine
    ≥ 0.2 to each of the 5 fixed query vectors, self excluded — the
    bounded-neighborhood twin of ann_topk (stages/ann.py:range_search;
    one normalized GEMM per batch against the broadcast query
    matrix)."""
    import ray as _ray
    import pyarrow.compute as pc

    from ..stages.ann import list_col_matrix, range_search

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .materialize()
    qset = sorted(ANN_RECALL_QIDS)
    tb = pa.concat_tables(
        [x for x in _ray.get(ds.map_batches(
            lambda t: t.filter(pc.is_in(
                t.column("vec_id"),
                value_set=pa.array(qset, pa.int64()))),
            batch_format="pyarrow").to_arrow_refs()) if x.num_rows])
    got = tb.column("vec_id").to_numpy().astype(np.int64)
    order = np.argsort(got)
    Q = list_col_matrix(tb.column("embedding"))[order]
    return range_search(ds, Q, got[order], 0.2)


def events_rolling_active(sf_dir: str) -> pd.DataFrame:
    """DAU + trailing-7-day distinct actives per observed day
    (stages/temporal.py:rolling_active — signature-row shuffles only)."""
    from ..stages.temporal import rolling_active

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    return rolling_active(ds, window_days=7)


WINDOW_FUNNEL_US = 48 * 3600 * 1_000_000       # 48 h per hop


def events_window_funnel(sf_dir: str) -> pd.DataFrame:
    """Time-boxed funnel (ClickHouse windowFunnel semantics): each hop
    must occur strictly after and within 48 h of the previous hop's
    qualifying event (stages/temporal.py:window_funnel — one
    hash_join + per-user min groupby per hop)."""
    from ..stages.temporal import window_funnel

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    return window_funnel(ds, FUNNEL_STEPS, window_us=WINDOW_FUNNEL_US)


def events_funnel_time(sf_dir: str) -> pd.DataFrame:
    """Per-hop time-to-convert quantiles for the 48h windowed funnel
    (view→click→purchase): median and p90 of t_hop − t_prev across
    converting users — the latency readout next to
    events_window_funnel's count readout.  Gaps come from the
    identical hop chain (stages/temporal.py:funnel_hop_gaps); the
    quantiles run the distributed histogram-combiner stage with the
    float floor((n−1)·q) rank rule both engines share."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.temporal import funnel_hop_gaps

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    gaps = funnel_hop_gaps(ds, FUNNEL_STEPS,
                           window_us=WINDOW_FUNNEL_US).materialize()
    n = (gaps.groupby("step").count().to_pandas()
         .rename(columns={"count()": "n_users"}))
    q = exact_quantiles(gaps, ["gap_us"], [0.5, 0.9], group_col="step")
    out = q.merge(n, on="step")
    return out.astype({"step": np.int64, "gap_us_q": np.int64,
                       "n_users": np.int64}) \
        .sort_values(["step", "q"], ignore_index=True)


def docs_bpe_fertility(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility per doc under the corpus's own top-8 learned
    BPE merges — pieces-per-word via the broadcast (word → n_syms)
    table (stages/bpe.py:doc_fertility)."""
    from ..stages.bpe import doc_fertility

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_fertility(ds, k=8)


def docs_span_corruption(sf_dir: str) -> pd.DataFrame:
    """Deterministic T5 denoising pairs (mask-rate 15%, sentinel spans,
    final-sentinel-terminated targets) — pure integer/string objective
    prep (stages/curation.py:span_corruption)."""
    from ..stages.curation import span_corruption

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = span_corruption(ds).to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_tokens", "n_masked",
                                  "n_spans"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def docs_prefix_lm(sf_dir: str) -> pd.DataFrame:
    """Deterministic prefix-LM (input, continuation) splits at a seeded
    token boundary (stages/curation.py:prefix_lm_split)."""
    from ..stages.curation import prefix_lm_split

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = prefix_lm_split(ds).to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_tokens", "split_at"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def docs_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch reading ease per doc (vowel-group syllable proxy,
    word-char sentence segments) — stages/text.py:readability_batch,
    one stateless vectorized pass."""
    from ..stages.text import readability_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: readability_batch(t), batch_format="pyarrow") \
        .to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_sents", "n_words",
                                  "n_syllables"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def embeddings_pca1(sf_dir: str) -> pd.DataFrame:
    """First principal component by quantized power iteration (round-6
    mean/covariance/iterates, max|y| normalization) + per-vector
    projections — stages/cluster.py:power_iteration_pc1; two combiner
    passes (d and d×d numbers per block), d×d iteration driver-side,
    projection streams."""
    from ..stages.cluster import power_iteration_pc1

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return power_iteration_pc1(ds, n_iter=8)


GOPHER_AUG = "\n- bullet item ###\ntrailing thought..."


def docs_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-style quality rules (Rae et al. 2021 App. A): word count /
    mean word length / symbol ratio / bullet + ellipsis line fractions /
    alphabetic-word fraction / stopword hits, composed into a keep flag
    (stages/text.py:gopher_quality_batch — one stateless vectorized
    pass).  Every 5th doc gets a deterministic bullet/'###'/ellipsis
    suffix (the docs_redact_pii convention) so the line- and
    symbol-rule kernels are exercised on the synthetic corpus; the SQL
    twin applies the identical augmentation."""
    from ..stages.text import gopher_quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug_and_score(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        tx = t.column("text").to_numpy(zero_copy_only=False).astype(str)
        tx = np.where(ids % 5 == 0, np.char.add(tx, GOPHER_AUG), tx)
        a = pa.table({"doc_id": t.column("doc_id"),
                      "text": pa.array(tx.astype(object), pa.string())})
        return gopher_quality_batch(a)

    out = ds.map_batches(aug_and_score, batch_format="pyarrow") \
        .to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_words", "stop_hits",
                                  "keep"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def docs_mattr(sf_dir: str) -> pd.DataFrame:
    """MATTR lexical diversity (Covington & McFall 2010): moving-average
    type-token ratio over 25-token windows, O(tokens) via per-token
    window-contribution counting (stages/text.py:mattr_batch)."""
    from ..stages.text import mattr_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: mattr_batch(t, w=25), batch_format="pyarrow") \
        .to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_tokens", "n_types",
                                  "n_windows"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def docs_chi2_terms(sf_dir: str) -> pd.DataFrame:
    """Top-50 tokens by chi-square association with the in-domain
    sources (doc-frequency contingency, exact integer counts, fixed
    float chain) — stages/classify.py:chi2_terms; the transparent
    cousin of the NB gate."""
    from ..stages.classify import chi2_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return chi2_terms(ds, ML_IN_SOURCES, k=50)


def events_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM quartile segmentation per user (recency days / frequency /
    6-dp monetary, banded by the lower-discrete quantile rule) —
    stages/temporal.py:rfm_segments, one per-user groupby of 3-number
    partials."""
    from ..stages.temporal import rfm_segments

    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])
    return rfm_segments(ds)


def events_seq_pairs(sf_dir: str) -> pd.DataFrame:
    """A-before-B precedence matrix over event types (n users with some
    a strictly before some b) — stages/temporal.py:seq_pairs, per-user
    min/max combiner + self hash_join, no per-user driver state."""
    from ..stages.temporal import seq_pairs

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    return seq_pairs(ds)


def docs_nb_quality(sf_dir: str) -> pd.DataFrame:
    """fastText-style Naive-Bayes quality gate (stages/classify.py): fit
    the two-class token model on the even-doc_id half (label = lang ==
    'en'), score every doc by prior + Σ token weights.  Fit is (token,
    c1, c0) rows through ONE groupby; the model broadcasts once; scoring
    is a stateless vectorized pass.  SQL twin rebuilds the identical
    model (same (c1+c0) DESC, token tie-break, same add-one smoothing)."""
    import pyarrow.compute as pc

    from ..stages.classify import fit_nb_quality, nb_quality_score

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    train = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_nb_quality(train, vocab_k=20000)
    out = nb_quality_score(ds, model).to_pandas()
    out["nb_score"] = out["nb_score"].round(6)
    return out.astype({"doc_id": np.int64, "n_tokens": np.int64,
                       "pred": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR hashed-n-gram importance weights (stages/classify.py): fit
    per-bucket occurrence counts (target = lang=='en' docs, raw = all
    docs) in one streaming pass + one 1024-row groupby, then score every
    doc by Σ per-occurrence ln ratios.  SQL twin rebuilds the identical
    mix64 buckets from the word fingerprints."""
    from ..stages.classify import dsir_weights, fit_dsir

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    model = fit_dsir(ds, n_buckets=1024)
    out = dsir_weights(ds, model).to_pandas()
    out["log_weight"] = out["log_weight"].round(6)
    return out.astype({"doc_id": np.int64, "n_words": np.int64,
                       "selected": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_length_band_filter(sf_dir: str) -> pd.DataFrame:
    """Quantile-threshold corpus filter — the operator composition the
    quantile stage exists for: keep docs whose token count sits inside
    their language's [p10, p99] band.  Quantiles come from the
    histogram-merge stage (one tiny shuffle); the band map (5 rows) is a
    broadcast closure over a second streaming pass."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def feats(b: pa.Table) -> pa.Table:
        q = quality_batch(b, id_col="doc_id", text_col="text")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "n_tokens": q.column("n_tokens"),
        })

    feat = ds.map_batches(feats, batch_format="pyarrow").materialize()
    qdf = exact_quantiles(feat, ["n_tokens"], [0.1, 0.99],
                          group_col="lang")
    lo = qdf[qdf["q"] == 0.1].set_index("lang")["n_tokens_q"]
    hi = qdf[qdf["q"] == 0.99].set_index("lang")["n_tokens_q"]
    langs = np.asarray(sorted(lo.index), dtype=object)
    lo_a = lo.reindex(langs).to_numpy(np.int64)
    hi_a = hi.reindex(langs).to_numpy(np.int64)

    def band(b: pa.Table) -> pa.Table:
        lg = np.asarray(b.column("lang").to_pylist(), dtype=object)
        pos = np.searchsorted(langs, lg)
        nt = b.column("n_tokens").to_numpy().astype(np.int64)
        keep = (nt >= lo_a[pos]) & (nt <= hi_a[pos])
        return b.filter(pa.array(keep))

    out = feat.map_batches(band, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": np.int64, "n_tokens": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_redact_pii(sf_dir: str) -> pd.DataFrame:
    """PII redaction pass (email → IPv4 → phone, sequential) over
    documents with deterministically planted PII on every 7th doc — the
    plant and the three RE2 rules are reproduced verbatim in the SQL
    mirror (both engines run RE2, so match semantics agree)."""
    from ..stages.text import redact_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        txt = b.column("text").to_pylist()
        planted = [
            t + (f" Contact user{i}@example.com or 10.0.{i % 256}.7"
                 f" call +1 555-{i % 10000:04d}." if i % 7 == 0 else "")
            for i, t in zip(ids.tolist(), txt)
        ]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(planted, pa.string())})

    out = ds.map_batches(plant, batch_format="pyarrow") \
        .map_batches(lambda b: redact_pii_batch(b, id_col="doc_id",
                                                text_col="text"),
                     batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in
                       ["doc_id", "n_email", "n_ipv4", "n_phone"]}) \
        .sort_values("doc_id").reset_index(drop=True)


def lang_counts(sf_dir: str) -> pd.DataFrame:
    out = _read(sf_dir, "documents", ["lang"]).groupby("lang").count() \
        .to_pandas().rename(columns={"count()": "n"})
    return out.astype({"n": np.int64}).sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregate; threshold sweep with SQL mirror
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1h windows per event_type: count + sum(value) (rounded)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()  # µs since epoch
        hour = (ts // 3_600_000_000) * 3600
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pylist(),
            "hour_epoch": hour,
            "value": b.column("value").to_numpy(),
        })
        g = df.groupby(["event_type", "hour_epoch"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out.astype({"n": np.int64, "hour_epoch": np.int64}) \
        .sort_values(["event_type", "hour_epoch"]).reset_index(drop=True)


def events_thresholds(sf_dir: str) -> pd.DataFrame:
    """Per-event_type optimal-split threshold (A3 sweep, SQL-mirrored).

    Labels: flag = +1 when user_id is even else −1 — a deterministic
    pseudo-label so the sweep itself is the thing under test.
    """
    from ..functions.transe import threshold_sweep

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        flags = np.where(g["user_id"].to_numpy() % 2 == 0, 1, -1)
        thr = threshold_sweep(g["value"].to_numpy(np.float64), flags)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "theta": [round(float(thr), 6)]})

    out = ds.groupby("event_type").map_groups(sweep, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H-style aggregates / joins / top-k
# ---------------------------------------------------------------------------

def tpch_q1(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        # dictionary-encode the two string keys (Arrow C kernel — no
        # per-row Python churn) and fold all four aggregates as
        # bincounts over the combined int code.
        rf = b.column("l_returnflag").combine_chunks().dictionary_encode()
        ls = b.column("l_linestatus").combine_chunks().dictionary_encode()
        rfc = rf.indices.to_numpy().astype(np.int64)
        lsc = ls.indices.to_numpy().astype(np.int64)
        nls = len(ls.dictionary)
        nk = len(rf.dictionary) * nls
        key = rfc * nls + lsc
        qty = b.column("l_quantity").to_numpy()
        price = b.column("l_extendedprice").to_numpy()
        rev = price * (1 - b.column("l_discount").to_numpy())
        n = np.bincount(key, minlength=nk)
        ks = np.nonzero(n)[0]
        rf_names = rf.dictionary.to_numpy(zero_copy_only=False) \
            .astype(object)
        ls_names = ls.dictionary.to_numpy(zero_copy_only=False) \
            .astype(object)
        return pa.table({
            "l_returnflag": pa.array(rf_names[ks // nls], pa.string()),
            "l_linestatus": pa.array(ls_names[ks % nls], pa.string()),
            "sum_qty": pa.array(
                np.bincount(key, weights=qty, minlength=nk)[ks]),
            "sum_price": pa.array(
                np.bincount(key, weights=price, minlength=nk)[ks]),
            "sum_rev": pa.array(
                np.bincount(key, weights=rev, minlength=nk)[ks]),
            "n": pa.array(n[ks].astype(np.int64))})

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("sum_price", alias_name="sum_price"),
                   Sum("sum_rev", alias_name="sum_rev"),
                   Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(0).astype(np.int64)
    out["sum_price"] = out["sum_price"].round(2)
    out["sum_rev"] = out["sum_rev"].round(2)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation revenue — broadcast dimension joins."""
    nation = _small_map(sf_dir, "nation", "n_nationkey", "n_name")
    cust_nation = _small_map(sf_dir, "customer", "c_custkey", "c_nationkey")
    # pre-composed dense custkey → nation-name array (one fancy index/batch)
    nmap_arr = _dense_lookup(nation)
    c2n = _dense_lookup(cust_nation)
    cb = Broadcast(np.array(
        [nmap_arr[v] if v is not None else None for v in c2n], dtype=object))

    def tag(b: pa.Table) -> pa.Table:
        names = cb.get()[b.column("o_custkey").to_numpy()]
        df = pd.DataFrame({"n_name": names,
                           "total": b.column("o_totalprice").to_numpy()})
        g = df.groupby("n_name", as_index=False).agg(
            revenue=("total", "sum"), n_orders=("total", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def top_parts(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_retailprice"])
        .sort(["p_size", "p_partkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    out["p_retailprice"] = out["p_retailprice"].round(2)
    return out.astype({"p_partkey": np.int64, "p_size": np.int64})


def part_supplier_pairs(sf_dir: str) -> pd.DataFrame:
    """Distinct (partkey, suppkey) pairs + duplicate count — exact dedup."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("l_partkey", "count")]
        ).rename_columns(["l_partkey", "l_suppkey", "n"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return out.astype({"l_partkey": np.int64, "l_suppkey": np.int64,
                       "n": np.int64}) \
        .sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def ann_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k vs the embedding of vec_id=0 (SQL mirror
    via list_cosine_similarity)."""
    import pyarrow.parquet as pq

    from ..stages.ann import brute_topk

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    q = None
    for batch in t.to_batches():
        ids = batch.column("vec_id").to_numpy()
        hit = np.nonzero(ids == 0)[0]
        if len(hit):
            q = np.asarray(batch.column("embedding").to_pylist()[hit[0]],
                           dtype=np.float64)
            break
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_topk(ds, q[None, :], k)
    out = out[out["query_id"] == 0][["vec_id", "cosine"]]
    out["cosine"] = out["cosine"].round(5)
    return out.astype({"vec_id": np.int64}).sort_values("vec_id") \
        .reset_index(drop=True)


def kg_edges_tsv_roundtrip(sf_dir: str):
    """Reference-native TSV ingestion (S1): dump the relational KG to
    tab-separated header-less triple files (the format the reference
    moves KGs between stages in), re-read them with ray.data.read_csv,
    and return the edges — value-identical to kg_edges_relational, so
    the SAME SQL oracle checks the whole write→read roundtrip."""
    import os

    from ..sources.triples_tsv import read_triples_tsv, write_triples_tsv

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = f"/tmp/ttmf_tsv/{tag}"
    marker = f"/tmp/ttmf_tsv/{tag}.done"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        write_triples_tsv(kg_edges_relational(sf_dir), out_dir)
        open(marker, "w").close()
    return read_triples_tsv(out_dir)


def embeddings_kmeans(sf_dir: str, k: int = 8, n_iter: int = 4) -> pd.DataFrame:
    """Distributed k-means over the embedding column (stages/cluster.py):
    seeded hash-rank init, per-batch (count, sum) partials, centroids
    rounded to 6 dp per iteration so the unrolled-CTE DuckDB mirror
    reproduces the assignments exactly.  Output (vec_id, cluster, dist)."""
    from ..stages.cluster import kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assign_ds, _ = kmeans(ds, k=k, n_iter=n_iter)
    out = assign_ds.to_pandas()
    out["dist"] = out["dist"].round(6)
    return out.astype({"vec_id": np.int64, "cluster": np.int64}) \
        .sort_values("vec_id", ignore_index=True)


def embeddings_rp_project(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """JL sign random projection (stages/ann.py:random_projection):
    y = X @ S / sqrt(k), S[d,j] = ±1 from mix64(211, d, j) — nothing
    broadcast, every task rebuilds the tiny sign matrix from the seed.
    ``code`` packs the signs of the ROUNDED projections (an LSH bucket
    id, the downstream use of the projection).  SQL twin rebuilds the
    identical sign matrix via the mix64 chain."""
    from ..stages.ann import random_projection

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = random_projection(ds, k=k).to_pandas()
    code = np.zeros(len(out), dtype=np.int64)
    for j in range(k):
        out[f"p{j}"] = out[f"p{j}"].round(6)
        code |= (out[f"p{j}"].to_numpy() > 0).astype(np.int64) << j
    out["code"] = code
    return out.astype({"vec_id": np.int64}) \
        .sort_values("vec_id", ignore_index=True)


def embeddings_semantic_dedup(sf_dir: str, k: int = 8, n_iter: int = 4,
                              tau: float = 0.35) -> pd.DataFrame:
    """SemDeDup-style semantic dedup: k-means cluster, then mark members
    with a lower-id neighbor at round(cosine,6) ≥ tau in the SAME
    cluster (dup_of = smallest such id, else -1).  tau=0.35 exercises
    the operator on the synthetic embeddings' natural cosine range
    (max pairwise ≈ 0.48); production corpora use ≈0.9.  SQL mirror:
    same unrolled k-means + a within-cluster self-join."""
    from ..stages.cluster import kmeans, semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, centroids = kmeans(ds, k=k, n_iter=n_iter)
    out = semantic_dedup(ds, centroids, tau=tau).to_pandas()
    return out.astype({"vec_id": np.int64, "cluster": np.int64,
                       "dup_of": np.int64}) \
        .sort_values("vec_id", ignore_index=True)


def events_sessions(sf_dir: str, gap_sec: int = 1800,
                    n_parts: int = 64) -> pd.DataFrame:
    """Gap-based sessionization per user (the streaming-shaped operator
    pattern: partition by key, sort by event time within the partition,
    carry windowed state — here a 30-minute inactivity gap closes a
    session).  SQL-mirrored: session boundaries via lag + cumulative sum.

    Shuffle shape: users are hashed into ``n_parts`` partitions and the
    whole partition is sessionized VECTORIZED (one sort + one boundary
    scan for every user in it) — not a per-user ``map_groups``, which at
    10^9 users is millions of ms-overhead tiny groups (CLAUDE.md rule 3).
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "__part", pa.array((uid % n_parts).astype(np.int32)))

    def sessionize_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        es = (g["ts"].astype("int64") // 1_000_000).to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_s = new_user | np.concatenate(
            ([False], es[1:] - es[:-1] > gap_sec))
        # per-user session ids from one global cumsum: subtract the
        # cumsum value at each user's first row
        cs = np.cumsum(new_s)
        user_base = np.repeat(cs[new_user],
                              np.diff(np.flatnonzero(
                                  np.concatenate((new_user, [True])))))
        sid = cs - user_base
        out = pd.DataFrame({"user_id": uid, "session_id": sid, "es": es})
        return out.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("es", "size"), start_epoch=("es", "min"),
            end_epoch=("es", "max"))

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("__part")
           .map_groups(sessionize_part, batch_format="pandas")
           .to_pandas())
    out = out.drop(columns=["__part"], errors="ignore")
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)


def events_session_paths(sf_dir: str, gap_sec: int = 1800,
                         n_parts: int = 64, k: int = 20) -> pd.DataFrame:
    """Top-20 session journeys: each session's ordered event-type path
    ('click>view>purchase'), counted corpus-wide — the product-
    analytics view the sessionizer exists for (vs events_markov's
    memoryless pairs).  Same shuffle shape as events_sessions: users
    hash into partitions, each partition sessionizes VECTORIZED and
    emits per-path count partials; one tiny path-domain groupby, then
    per-block partial top-k (lossless: global counts are final) →
    final cut on (n DESC, path ASC)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "__part", pa.array((uid % n_parts).astype(np.int32)))

    def paths_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        es = (g["ts"].astype("int64") // 1_000_000).to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_s = new_user | np.concatenate(
            ([False], es[1:] - es[:-1] > gap_sec))
        sid = np.cumsum(new_s)           # globally unique within part
        d = pd.DataFrame({"sid": sid,
                          "event_type": g["event_type"].to_numpy()})
        p = d.groupby("sid", sort=True)["event_type"].agg(">".join)
        return p.value_counts().rename_axis("path") \
            .reset_index(name="c")

    def topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "path": t.column("path").to_numpy(zero_copy_only=False),
            "n_sessions": t.column("sum(c)").to_numpy()
            .astype(np.int64)})
        df = df.sort_values(["n_sessions", "path"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("__part")
           .map_groups(paths_part, batch_format="pandas")
           .groupby("path").sum("c")
           .map_batches(topk, batch_format="pyarrow")
           .to_pandas())
    out = out.sort_values(["n_sessions", "path"],
                          ascending=[False, True]).head(k)
    return out.astype({"n_sessions": np.int64}) \
        .reset_index(drop=True)


def events_markov_transitions(sf_dir: str, n_parts: int = 64) -> pd.DataFrame:
    """First-order Markov transition table over each user's event stream
    (the sequence-model view of the event log): consecutive event-type
    pairs per user → global (from_type, to_type) counts → row-normalized
    probabilities.  Same shuffle shape as sessionization: users hash into
    partitions, each partition's transitions are computed VECTORIZED in
    one sort + one shift, and only the tiny per-partition (from, to, cnt)
    combiner rows leave the workers."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "__part", pa.array((uid % n_parts).astype(np.int32)))

    def transitions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        # same[0] is always False, so roll(1) never wraps into a pair
        out = pd.DataFrame({"from_type": np.roll(et, 1)[same],
                            "to_type": et[same]})
        return out.groupby(["from_type", "to_type"], as_index=False) \
            .size().rename(columns={"size": "cnt"})

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(transitions_part, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby(["from_type", "to_type"], as_index=False)["cnt"] \
        .sum()
    tot = agg.groupby("from_type")["cnt"].transform("sum")
    agg["prob"] = agg["cnt"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    return agg.astype({"cnt": np.int64}) \
        .sort_values(["from_type", "to_type"], ignore_index=True)


def docs_ngram_coverage(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve (tokenizer/vocab sizing signal): the
    fraction of all word OCCURRENCES covered by the top-N words for
    N ∈ {100, 1000, 10000} — one per-batch word-count combiner + one
    vocab-sized groupby (stages/bpe.py:word_counts), cumulative sums on
    the driver over the (cnt DESC, word) rank."""
    from ..stages.bpe import word_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    wdf = word_counts(ds).to_pandas() \
        .sort_values(["cnt", "word"], ascending=[False, True],
                     ignore_index=True)
    cnt = wdf["cnt"].to_numpy(np.int64)
    total = int(cnt.sum())
    cum = np.cumsum(cnt)
    rows = []
    for n in (100, 1000, 10000):
        covered = int(cum[min(n, len(cnt)) - 1]) if len(cnt) else 0
        rows.append((n, len(cnt), covered, total,
                     covered * 1.0 / total if total else 0.0))
    return pd.DataFrame(rows, columns=["top_n", "vocab_size", "covered",
                                       "total", "frac"]) \
        .astype({c: np.int64 for c in ["top_n", "vocab_size", "covered",
                                       "total"]})


def top_docs_per_lang(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per language, the k longest documents (grouped top-k — per-batch
    prune + tiny merge, no global sort).  SQL-mirrored via row_number
    QUALIFY."""
    from ..functions.topk import grouped_topk

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"]).map_batches(
        lambda t: pa.table({
            "lang": t.column("lang"),
            "doc_id": t.column("doc_id"),
            "n_chars": pc.utf8_length(t.column("text").cast(pa.string())),
        }),
        batch_format="pyarrow")
    out = grouped_topk(ds, key_cols=["lang"], value_col="n_chars", k=k,
                       descending=True, tiebreak_cols=["doc_id"]).to_pandas()
    return out.astype({"doc_id": np.int64, "n_chars": np.int64}) \
        .sort_values(["lang", "n_chars", "doc_id"],
                     ascending=[True, False, True]).reset_index(drop=True)


def lineitem_sample(sf_dir: str, n: int = 2000) -> pd.DataFrame:
    """Seeded deterministic size-n subsample of lineitem (O-family; the
    scalable stand-in for the reference's total_size downsample).
    SQL-mirrored: ORDER BY mix64(seed, 4, keys) LIMIT n."""
    from ..functions.sampling import deterministic_sample

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    out = deterministic_sample(
        ds, n=n, key_cols=["l_orderkey", "l_linenumber"],
        tiebreak_cols=["l_quantity"]).to_pandas()  # (okey, lnum) not unique
    return out.astype({"l_orderkey": np.int64, "l_linenumber": np.int64}) \
        .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Temporal operators: as-of join, sliding windows, range join (SQL-mirrored)
# ---------------------------------------------------------------------------

def _events_typed(sf_dir: str, event_type: str, cols: list[str]):
    """events of one type, ts replaced by int64 epoch-µs ``es``."""
    ds = _read(sf_dir, "events", ["event_type", "ts"] + cols)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), pa.scalar(event_type)))
        t = t.append_column("es", t.column("ts").cast(pa.int64()))
        return t.select(["es"] + cols)

    return ds.map_batches(prep, batch_format="pyarrow")


def events_asof_join(sf_dir: str) -> pd.DataFrame:
    """Each purchase joined to the user's most recent prior-or-same-time
    click (bucketed as-of join; DuckDB ``ASOF LEFT JOIN`` mirror).

    (user_id, ts) is unique in the events table, and epoch-µs keys keep
    it so — the tie contract of :func:`asof_join` is never exercised.
    No-match rows surface as click_es = -1 / click_value = 0.
    """
    from ..stages.temporal import asof_join

    purchases = _events_typed(sf_dir, "purchase", ["event_id", "user_id"])
    clicks = _events_typed(sf_dir, "click", ["user_id", "value"])
    out = asof_join(purchases, clicks, by="user_id", on="es").to_pandas()
    out["click_es"] = out["es_r"].fillna(-1).astype(np.int64)
    out["click_value"] = out["value"].fillna(0.0).round(4)
    out = out[["event_id", "user_id", "es", "click_es", "click_value"]]
    return out.astype({"event_id": np.int64, "user_id": np.int64,
                       "es": np.int64}) \
        .sort_values("event_id").reset_index(drop=True)


def events_sliding_1h(sf_dir: str) -> pd.DataFrame:
    """1-hour windows sliding every 15 min per event_type: count +
    sum(value).  Combiner-per-batch keeps the shuffle at (type, window)
    granularity; the SQL mirror explodes each event into its 4 windows."""
    from ..stages.temporal import sliding_window_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = sliding_window_agg(
        ds, ts_col="ts", key_cols=["event_type"], value_col="value",
        length=3_600_000_000, slide=900_000_000,
    ).to_pandas()
    out["win_start"] = out["win_start"] // 1_000_000  # µs → s for readability
    out["sum_value"] = out["sum_value"].round(4)
    return out.astype({"n": np.int64, "win_start": np.int64}) \
        .sort_values(["event_type", "win_start"]).reset_index(drop=True)


# non-uniform band edges: a genuine interval join (no floor() shortcut)
_VALUE_BANDS = [0.0, 1.0, 5.0, 20.0, 100.0, 500.03]


def events_value_bands(sf_dir: str) -> pd.DataFrame:
    """count + sum(value) per (event_type, value band) — broadcast
    interval join against non-uniform band edges, then partial-combined
    groupby.  SQL mirror joins a VALUES band table on lo <= v < hi."""
    from ..stages.temporal import range_join_broadcast

    ds = _read(sf_dir, "events", ["event_type", "value"])
    banded = range_join_broadcast(ds, value_col="value",
                                  edges=np.array(_VALUE_BANDS))

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pylist(),
            "band": b.column("band").to_pylist(),
            "value": b.column("value").to_numpy(),
        })
        g = df.groupby(["event_type", "band"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (banded.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "band"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_value", alias_name="sum_value"))
           .to_pandas())
    out["sum_value"] = out["sum_value"].round(4)
    return out.astype({"n": np.int64}) \
        .sort_values(["event_type", "band"]).reset_index(drop=True)


def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ orders (both large — partitioned hash join, no
    broadcast) → revenue per order priority.  SQL-mirrored."""
    from ..functions.joins import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: t.append_column(
            "rev", pa.array(t.column("l_extendedprice").to_numpy()
                            * (1 - t.column("l_discount").to_numpy()))
        ).select(["l_orderkey", "rev"]).rename_columns(["okey", "rev"]),
        batch_format="pyarrow")
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda t: t.rename_columns(["okey", "o_orderpriority"]),
                     batch_format="pyarrow")
    joined = hash_join(li, od, on="okey")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderpriority", as_index=False).agg(
            revenue=("rev", "sum"), n_items=("rev", "size"))

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(
            lambda t: pa.Table.from_pandas(partial(t.to_pandas()),
                                           preserve_index=False),
            batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Retrieval / divergence queries (stages/retrieval.py)
# ---------------------------------------------------------------------------

BM25_TERMS = ["join", "window", "hash", "vector"]


def docs_tfidf(sf_dir: str) -> pd.DataFrame:
    """Top-5 TF-IDF terms per document — one (token, df) combiner pass +
    vocab-sized groupby, df table broadcast once, stateless per-batch
    scoring with an in-batch top-k (ranked on the 6-dp-rounded score so
    the SQL row_number() picks identical rows)."""
    from ..stages.retrieval import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_top_terms(ds, k=5).to_pandas()
    return out.astype({"doc_id": np.int64, "tf": np.int64,
                       "df": np.int64}) \
        .sort_values(["doc_id", "token"]).reset_index(drop=True)


def docs_bm25(sf_dir: str) -> pd.DataFrame:
    """Top-20 documents by BM25 against the fixed probe query
    BM25_TERMS (k1=1.2, b=0.75, Lucene idf) — per-doc int rows
    materialized once, constant-size stats reduce, broadcast-stats
    scoring with per-batch partial top-k."""
    from ..stages.retrieval import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, BM25_TERMS, k=20)


def docs_winnow(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints (word-3-gram hashes, window 4, rightmost
    minimum) — the plagiarism-robust fingerprint set; pure per-batch
    kernel, no shuffle."""
    from ..stages.retrieval import winnow_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = winnow_fingerprints(ds, ngram=3, window=4).to_pandas()
    return out.astype({"doc_id": np.int64, "pos": np.int64,
                       "fp": np.int64}) \
        .sort_values(["doc_id", "pos", "fp"]).reset_index(drop=True)


def docs_source_kl(sf_dir: str) -> pd.DataFrame:
    """Per-source unigram KL divergence vs the corpus distribution —
    the distribution-drift monitor of a mixture pipeline."""
    from ..stages.retrieval import source_kl

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_kl(ds)


def docs_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Seeded Efraimidis–Spirakis weighted sample (50 docs, weight =
    n_chars) — per-batch partial bottom-n, ≤ n rows per block reach the
    driver merge."""
    from ..stages.curation import weighted_sample

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample(ds, n=50)


def docs_collocations(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-bigram collocations by PMI (min count 5) — one
    tagged unigram+bigram combiner pass, one groupby, unigram totals
    broadcast back."""
    from ..stages.retrieval import pmi_collocations

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pmi_collocations(ds, k=50, min_count=5)


def embeddings_pq_codes(sf_dir: str) -> pd.DataFrame:
    """Product-quantization codes: 2 subspaces × 4 centroids, 2
    quantized-iteration Lloyd rounds per subspace (assignments exactly
    SQL-reproducible), codes joined via the bucketed hash_join."""
    from ..stages.cluster import pq_codes

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = pq_codes(ds, m=2, k=4, n_iter=2).to_pandas()
    cast = {c: np.int64 for c in out.columns if c.startswith(("vec", "c"))}
    return out.astype(cast).sort_values("vec_id").reset_index(drop=True)


def docs_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """documents → sharded JSONL (ray.data.Dataset.write_json) → read
    back with read_json — the source-format coverage for JSONL-native
    web corpora.  Exactness: the table is int64/string only, so the
    JSON round-trip is lossless and the oracle is the identity SELECT."""
    import shutil

    out_dir = "/tmp/ttmf_jsonl_roundtrip"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = _read(sf_dir, "documents", None)
    ds.write_json(out_dir)
    back = rd.read_json(out_dir).to_pandas()
    return back.astype({"doc_id": np.int64, "n_chars": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def embeddings_pq_adc(sf_dir: str) -> pd.DataFrame:
    """ADC top-10 vs the embedding of vec_id=0 over the 2×4 PQ codes —
    the search half of IVF-PQ (codebook-only query distances, fixed
    order quantized float chain, per-batch partial top-k)."""
    import pyarrow.parquet as pq

    from ..stages.cluster import pq_adc_topk

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    row = int(np.nonzero(ids == 0)[0][0])
    q = np.asarray(t.column("embedding").to_pylist()[row],
                   dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_adc_topk(ds, q, k_top=10, m=2, k=4, n_iter=2)


def docs_bigram_perplexity(sf_dir: str) -> pd.DataFrame:
    """Conditional (bigram) LM quality score: fit the add-one-smoothed
    bigram model on the even-doc_id half, score every doc by mean
    ln p(cur|prev) — the KenLM-flavored upgrade of docs_lm_perplexity.
    Same fit shape (combiner → one groupby → broadcast model)."""
    import pyarrow.compute as pc

    from ..stages.lm_score import bigram_perplexity, fit_bigram_lm

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_bigram_lm(ref)
    out = bigram_perplexity(ds, model).to_pandas()
    return out.astype({"doc_id": np.int64, "n_bigrams": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


FUNNEL_STEPS = ["view", "click", "purchase"]


def events_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Day-granularity cohort retention matrix (cohort = first active
    day, offsets 0..13) — distinct-(user,day) combiner, cohort attach
    via bucketed hash_join, tiny (cohort, offset) groupby."""
    from ..stages.temporal import cohort_retention

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    return cohort_retention(ds, max_offset=13)


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered view→click→purchase funnel on first-event times (strict
    ordering), counted through chained bucketed hash_joins."""
    from ..stages.temporal import funnel_counts

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    return funnel_counts(ds, FUNNEL_STEPS)


def embeddings_ivfpq(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ top-10 vs the embedding of vec_id=0: hash-centroid coarse
    probe (4/16 partitions) + ADC over the probed vectors' 2×4 PQ
    codes — the composed scale-path ANN."""
    import pyarrow.parquet as pq

    from ..stages.ann import ivfpq_topk

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    row = int(np.nonzero(ids == 0)[0][0])
    q = np.asarray(t.column("embedding").to_pylist()[row],
                   dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivfpq_topk(ds, q, k_top=10, n_centroids=16, n_probe=4,
                      m=2, k=4, n_iter=2)


def docs_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Top-8 learned BPE merges over the documents word table —
    tokenizer training as an operator (stages/bpe.py): one corpus pass
    for (word, cnt), then per round an adjacent-pair count + greedy
    non-overlap merge apply.  Integer counts + (cnt DESC, pair ASC)
    tie-break make every round exact; the SQL twin unrolls the rounds."""
    from ..stages.bpe import learn_bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return learn_bpe(ds, k=8)


def docs_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """The learned tokenizer APPLIED: every vocabulary word's final
    symbol sequence after the top-8 merges (word, cnt, n_syms, encoded)
    — the encode half of the BPE story (train on the word table, then
    tokenize with the learned merges).  The SQL twin reads the unrolled
    merge chain's final symbol table (string_agg over s8)."""
    from ..stages.bpe import encode_words

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = encode_words(ds, k=8)
    return out.astype({"cnt": np.int64, "n_syms": np.int64})


def docs_token_budget_mixture(sf_dir: str) -> pd.DataFrame:
    """Token-budget mixture planning (the DoReMi/Pile-style recipe
    step): per source, document + whitespace-token totals and the
    repeat factor that hits a 2M-token budget at the source's
    normalized quality-tier weight — repeat > 1 means the source is
    epoch-ed, < 1 means it is subsampled.  One per-batch combiner +
    driver fold; only (source, n_docs, n_tokens) partials move."""
    import ray as _ray

    from ..pipelines.corpus_queries import _MIX_WEIGHTS
    from ..stages.text import _as_array, _split_flat

    budget = 2_000_000.0
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def part(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pandas()
        flat, doc_idx, n = _split_flat(_as_array(t.column("text")),
                                       r"[ \t\n\r\f\v]+")
        toks = np.bincount(doc_idx[flat != ""], minlength=n)
        g = pd.DataFrame({"source": src, "n_docs": 1,
                          "n_tokens": toks.astype(np.int64)}) \
            .groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = _ray.get(ds.map_batches(part, batch_format="pyarrow")
                     .to_arrow_refs())
    agg = pa.concat_tables([t for t in parts if len(t)]).to_pandas() \
        .groupby("source", as_index=False).sum()
    wsum = sum(_MIX_WEIGHTS.values())
    agg["weight"] = agg["source"].map(_MIX_WEIGHTS).astype(np.float64)
    agg["repeat_factor"] = (agg["weight"] / wsum * budget
                            / agg["n_tokens"].to_numpy(np.float64))
    return agg.astype({"n_docs": np.int64, "n_tokens": np.int64}) \
        .sort_values("source", ignore_index=True)


def docs_cdc_dedup(sf_dir: str) -> pd.DataFrame:
    """Content-defined chunking dedup: word-window rolling-hash
    boundaries (hash % 8 == 0) split each document into
    insertion-robust chunks; duplicated chunks (≥2 occurrences
    corpus-wide) surface with doc/occurrence counts
    (stages/curation.py:cdc_dedup)."""
    from ..stages.curation import cdc_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = cdc_dedup(ds).to_pandas()
    return out.astype({"n_tokens": np.int64, "n_docs": np.int64,
                       "n_occ": np.int64}) \
        .sort_values("chunk_md5").reset_index(drop=True)


def docs_sb_perplexity(sf_dir: str) -> pd.DataFrame:
    """Stupid Backoff trigram quality score (Brants et al., 2007): fit
    trigram/bigram/unigram counts on the even-doc_id half in ONE
    tagged-key groupby, score every doc by the mean log backoff score
    (0.4 discount per backoff level, add-one unigram base)."""
    import pyarrow.compute as pc

    from ..stages.lm_score import fit_sb_lm, stupid_backoff_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_sb_lm(ref)
    out = stupid_backoff_score(ds, model).to_pandas()
    return out.astype({"doc_id": np.int64, "n_trigrams": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_hybrid_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid search: reciprocal-rank fusion of the BM25 top-50 (probe
    BM25_TERMS) and brute-cosine top-50 (query = embedding of vec_id 0,
    doc_id-aligned) → top-20 by rrf = 1/(60+r_bm25) + 1/(60+r_cos)
    (stages/retrieval.py:hybrid_rrf)."""
    import pyarrow.parquet as pq

    from ..stages.retrieval import hybrid_rrf

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    row = int(np.nonzero(ids == 0)[0][0])
    q = np.asarray(t.column("embedding").to_pylist()[row],
                   dtype=np.float64)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return hybrid_rrf(docs, emb, BM25_TERMS, q)


def embeddings_knn_graph(sf_dir: str) -> pd.DataFrame:
    """Top-5 cosine-neighbor graph over the embeddings table
    (stages/ann.py:knn_graph): corpus matrix broadcast once, one matmul
    per batch, ranks on the 6-dp-rounded cosine with neighbor-id
    tie-break."""
    from ..stages.ann import knn_graph

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_graph(ds, k=5).to_pandas()
    return out.astype({"vec_id": np.int64, "nbr_id": np.int64,
                       "rank": np.int64}) \
        .sort_values(["vec_id", "rank"], ignore_index=True)


def embeddings_knn_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components of the mutual top-5-NN graph — the
    density-robust clustering of the embedding corpus (mutual check on
    the N·k signature rows, then distributed min-label propagation)."""
    from ..stages.ann import mutual_knn_clusters

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return mutual_knn_clusters(ds, k=5)


PHRASE_QUERY = ["hash", "join"]


def docs_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Exact phrase occurrences via a STORED positional inverted index
    (stages/invindex.py): one corpus pass writes (token, doc_id, pos)
    rows hash-bucketed into partitioned parquet; the probe reads ONLY
    the phrase terms' buckets (partition pruning) and chains sorted
    packed-key positional joins.  The SQL twin is the positional
    self-join on the flat token table."""
    import os
    import uuid

    from ..stages.invindex import build_positional_index, phrase_search

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out_dir = f"/tmp/ttmf_invindex/{uuid.uuid4().hex}"
    os.makedirs(out_dir, exist_ok=True)
    build_positional_index(ds, out_dir)
    return phrase_search(out_dir, PHRASE_QUERY)


BLOCK_TERMS = ["slow", "error", "crash"]


def docs_blocklist(sf_dir: str) -> pd.DataFrame:
    """Word-level blocklist gate: per doc the total blocked-word hits,
    the number of distinct blocked terms present, and keep = no hits —
    the broadcast-term-set filter every curation pipeline carries.
    Stateless per-batch kernel (factorize + membership on the tiny
    term array); nothing shuffles."""
    from ..stages.classify import _doc_words

    terms = np.asarray(sorted(BLOCK_TERMS), dtype=object)

    def gate(t: pa.Table) -> pa.Table:
        flat, didx, n = _doc_words(t.column("text"))
        hits = np.zeros(n, np.int64)
        nterms = np.zeros(n, np.int64)
        if len(flat):
            codes, uniq = pd.factorize(flat)
            pos = np.clip(np.searchsorted(terms, uniq), 0,
                          len(terms) - 1)
            blocked = terms[pos] == uniq
            bmask = blocked[codes]
            hits = np.bincount(didx[bmask], minlength=n).astype(np.int64)
            # distinct blocked terms per doc
            if bmask.any():
                key = didx[bmask] * np.int64(len(terms)) \
                    + pos[codes][bmask]
                uk = np.unique(key)
                nterms = np.bincount((uk // len(terms)).astype(np.int64),
                                     minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_hits": pa.array(hits),
            "n_terms": pa.array(nterms),
            "keep": pa.array((hits == 0).astype(np.int64))})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(gate, batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("doc_id", ignore_index=True)


def docs_word_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc unigram word entropy + normalized entropy (lexical
    diversity quality gate) — pure per-batch kernel, zero shuffle;
    SQL-mirrored term-for-term at 6 dp."""
    from ..stages.text import word_entropy_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(word_entropy_batch, batch_format="pyarrow") \
        .to_pandas()
    return out.astype({"doc_id": np.int64, "n_words": np.int64,
                       "n_unique": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_chunk_windows(sf_dir: str) -> pd.DataFrame:
    """Overlapping 64-token context windows, stride 48 (training-sample
    prep flat_map) — vectorized flat-gather chunking, SQL-mirrored
    chunk-for-chunk including the reassembled window text."""
    from ..stages.curation import chunk_windows

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = chunk_windows(ds, win=64, stride=48).to_pandas()
    return out.astype({c: np.int64 for c in
                       ("doc_id", "chunk_id", "start", "n_tokens")}) \
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)


def embeddings_scalar_quant(sf_dir: str) -> pd.DataFrame:
    """Per-dimension min-max scalar quantization (the int8 compression
    half of an ANN store): long-form (vec_id, dim, code, sq_err) — codes
    and reconstruction errors bit-identical to the SQL twin (pure IEEE
    double chains, no rounding)."""
    from ..stages.ann import scalar_quantize

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = scalar_quantize(ds).to_pandas()
    return out.astype({"vec_id": np.int64, "dim": np.int64,
                       "code": np.int64}) \
        .sort_values(["vec_id", "dim"], ignore_index=True)


def docs_textrank(sf_dir: str) -> pd.DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004) over the corpus:
    adjacent lowercase word pairs build an undirected co-occurrence
    graph (window 2, self-pairs dropped), then the quantized global
    PageRank runs over its symmetric edge list.  Output (word, pr) for
    every word with at least one neighbor.

    Two streaming passes over the documents (pair-vocab build, then
    id-mapped edge emit with the vocab broadcast) + the shared
    ``stages/pagerank.py`` iteration; the SQL twin builds the identical
    pair list via positional token self-joins and unrolls the same
    PageRank (9-dp quantization ⇒ no cross-engine drift)."""
    from ..stages.pagerank import pagerank
    from ..stages.text import _as_array, _split_flat

    ds = _read(sf_dir, "documents", ["text"])

    def adj_pairs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = _as_array(t.column("text"))
        flat, doc_idx, _ = _split_flat(pc.utf8_lower(col), "[^0-9a-z_]+")
        ok = flat != ""
        flat, doc_idx = flat[ok], doc_idx[ok]
        if len(flat) < 2:
            e = np.empty(0, dtype=flat.dtype if len(flat) else object)
            return e, e
        m = (doc_idx[1:] == doc_idx[:-1]) & (flat[1:] != flat[:-1])
        return flat[:-1][m], flat[1:][m]

    def pair_words(t: pa.Table) -> pa.Table:
        a, b = adj_pairs(t)
        return pa.table({"w": pa.array(
            np.unique(np.concatenate([a, b])).astype(object),
            type=pa.string())})

    parts = [t for t in ray.get(
        ds.map_batches(pair_words, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    # tokens are ASCII ⇒ numpy byte sort == SQL codepoint ORDER BY
    words = np.unique(np.concatenate(
        [t.column("w").to_numpy(zero_copy_only=False) for t in parts]))
    bc = Broadcast(pa.array(words, type=pa.string()))

    def edges(t: pa.Table) -> pa.Table:
        v = bc.get()
        a, b = adj_pairs(t)
        ai = pc.index_in(pa.array(a, type=pa.string()), v) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        bi = pc.index_in(pa.array(b, type=pa.string()), v) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([ai, bi])),
                         "dst": pa.array(np.concatenate([bi, ai]))})

    e = distinct_rows(ds.map_batches(edges, batch_format="pyarrow"),
                      ["src", "dst"])
    pr = pagerank(e, len(words))
    out = pd.DataFrame({"word": words[pr["node"].to_numpy()],
                        "pr": pr["pr"].to_numpy()})
    return out.sort_values("word", ignore_index=True)


def docs_quality_auc(sf_dir: str) -> pd.DataFrame:
    """Exact ROC-AUC of the NB quality score on the held-out odd-doc_id
    half (label = lang=='en') — the evaluation half of the model-based
    selection suite.  Distinct-score histogram partials + integer
    Mann-Whitney rank sum; SQL twin reuses the docs_nb_quality model
    CTEs and the same U2/(2·P·N) integer formula."""
    import pyarrow.compute as pc

    from ..stages.classify import fit_nb_quality, nb_auc

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    train = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_nb_quality(train, vocab_k=20000)
    return nb_auc(ds, model)


def docs_dsir_sample(sf_dir: str) -> pd.DataFrame:
    """DSIR importance RESAMPLING: the 100-doc deterministic sample with
    inclusion probability ∝ exp(log_weight) via log-domain
    Efraimidis-Spirakis keys (stages/classify.py dsir_sample) — the
    selection step Xie et al. run after the weights docs_dsir_weights
    computes.  SQL twin wraps the docs_dsir_weights CTEs and rebuilds
    the identical mix64 key chain."""
    from ..stages.classify import dsir_sample, dsir_weights, fit_dsir

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    model = fit_dsir(ds, n_buckets=1024)
    w = dsir_weights(ds, model)
    out = dsir_sample(w, n=100)
    return out.sort_values("key", ignore_index=True)


def docs_kneser_ney(sf_dir: str) -> pd.DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (D=0.75, add-one-
    floored continuation probability): fit on the even-doc_id half,
    score every doc — completes the LM-quality family (add-one unigram /
    add-one bigram / Stupid Backoff).  Every per-bigram probability is
    one fixed-order IEEE chain, mirrored term-for-term in SQL."""
    import pyarrow.compute as pc

    from ..stages.lm_score import fit_kn_lm, kn_perplexity

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    model = fit_kn_lm(ref)
    out = kn_perplexity(ds, model).to_pandas()
    return out.astype({"doc_id": np.int64, "n_bigrams": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_source_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise source×source distinct-shingle overlap + Jaccard (the
    cross-source leakage audit matrix) — shingles hash-partition so each
    partition emits tiny S×S pair partials; SQL twin is the distinct
    (source, shingle) self-join over the same mix64 shingle hashes."""
    from ..stages.curation import source_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_overlap(ds)


def events_hourly_anomaly(sf_dir: str) -> pd.DataFrame:
    """Per-event-type hourly-count z-scores (the pipeline-health anomaly
    monitor): counts aggregate distributed; mean/variance come from
    INTEGER sums (Σc, Σc²) so the z chain is bit-identical
    cross-engine.  is_anomaly = |z| > 2 (pre-rounding)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def bucket(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        hour = (ts // 3_600_000_000) * 3600
        df = pd.DataFrame({"event_type": b.column("event_type").to_pylist(),
                           "hour_epoch": hour})
        g = df.groupby(["event_type", "hour_epoch"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    hourly = (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby(["event_type", "hour_epoch"])
              .aggregate(Sum("n", alias_name="n"))).to_pandas()
    # the per-(type,hour) table is bounded by types×hours — driver math
    # on integer sums (rule 13)
    out = []
    for et, g in hourly.groupby("event_type"):
        c = g["n"].to_numpy(np.int64)
        cnt = len(c)
        s, ss = int(c.sum()), int((c * c).sum())
        mu = s / cnt
        var = ss / cnt - mu * mu
        sd = np.sqrt(var) if var > 0 else 0.0
        z = (c - mu) / sd if sd > 0 else np.zeros(len(c))
        out.append(pd.DataFrame({
            "event_type": et, "hour_epoch": g["hour_epoch"].to_numpy(),
            "n": c, "z": np.round(z, 6),
            "is_anomaly": (np.abs(z) > 2).astype(np.int64)}))
    res = pd.concat(out, ignore_index=True)
    return res.astype({"hour_epoch": np.int64, "n": np.int64}) \
        .sort_values(["event_type", "hour_epoch"], ignore_index=True)


def docs_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """documents → sharded CSV (Dataset.write_csv) → read_csv — the CSV
    source-format coverage (quoting carries embedded newlines/commas).
    int64/string only, so the round-trip is lossless and the oracle is
    the identity SELECT."""
    import shutil

    out_dir = "/tmp/ttmf_csv_roundtrip"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = _read(sf_dir, "documents", None)
    ds.write_csv(out_dir)
    back = rd.read_csv(out_dir).to_pandas()
    return back.astype({"doc_id": np.int64, "n_chars": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_minhash_estimate(sf_dir: str) -> pd.DataFrame:
    """MinHash accuracy audit: signature Jaccard estimate vs exact
    shingle Jaccard per LSH candidate pair (k=16, r=2 — loose bands on
    purpose so weak candidates and visible estimate error appear).  The
    SQL twin rebuilds the permutations (mix64(7,{1,2},j)), signatures
    (min over (a·x+b) mod 2^31−1), band hashes and bucket pairs
    bit-for-bit."""
    from ..stages.dedup import minhash_estimate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_estimate(ds)


_Q3_CUT_US = 883_612_800_000_000          # 1998-01-01 UTC in epoch-us
_Q4_LO_US = 852_076_800_000_000           # 1997-01-01
_Q4_HI_US = 883_612_800_000_000           # 1998-01-01


def tpch_q3(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 analogue (shipping priority): top-10 unshipped-revenue
    orders for the BUILDING segment — orders placed before 1998-01-01
    with lineitems shipping after it.

    Shape: the BUILDING custkey set broadcasts (customer is the small
    side), orders filter streams, ONE bucketed hash_join attaches
    o_orderdate to the filtered lineitems, a per-batch revenue combiner
    feeds one per-order groupby, top-10 on the 6-dp-rounded revenue."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    keys = np.sort(cust.loc[cust.c_mktsegment == "BUILDING",
                            "c_custkey"].to_numpy(np.int64))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        od = t.column("o_orderdate").cast(pa.int64()).to_numpy()
        pos = np.clip(np.searchsorted(keys, ck), 0,
                      max(len(keys) - 1, 0))
        keep = (keys[pos] == ck) & (od < _Q3_CUT_US) if len(keys) else \
            np.zeros(len(ck), bool)
        return pa.table({
            "l_orderkey": pa.array(
                t.column("o_orderkey").to_numpy().astype(np.int64)[keep]),
            "o_orderdate": pa.array(od[keep])})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def lfilt(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = sd > _Q3_CUT_US
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))[keep]
        return pa.table({
            "l_orderkey": pa.array(
                t.column("l_orderkey").to_numpy().astype(np.int64)[keep]),
            "rev": pa.array(rev)})

    j = hash_join(li.map_batches(lfilt, batch_format="pyarrow"),
                  orders.map_batches(ofilt, batch_format="pyarrow"),
                  on="l_orderkey")
    out = (j.groupby(["l_orderkey", "o_orderdate"])
           .aggregate(Sum("rev", alias_name="revenue")).to_pandas())
    out["revenue"] = out["revenue"].round(6)
    out = out.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(10)
    return out.astype({"l_orderkey": np.int64,
                       "o_orderdate": np.int64}).reset_index(drop=True)


def tpch_q4(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 analogue (order-priority checking): orders placed in
    1997 with at least one lineitem shipping after the order date
    (max(l_shipdate) > o_orderdate stands in for the commit/receipt
    columns the synthetic schema lacks), counted per priority.

    Shape: per-order max-shipdate combiner → one groupby → bucketed
    hash_join against the filtered orders; integer counts, zero float
    risk."""
    from ray.data.aggregate import Max

    from ..functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def lmax(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        uo, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uo), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, sd)
        return pa.table({"l_orderkey": pa.array(uo),
                         "max_ship": pa.array(mx)})

    ms = (li.map_batches(lmax, batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Max("max_ship",
                                               alias_name="max_ship")))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ofilt(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (od >= _Q4_LO_US) & (od < _Q4_HI_US)
        return pa.table({
            "l_orderkey": pa.array(
                t.column("o_orderkey").to_numpy().astype(np.int64)[keep]),
            "o_orderdate": pa.array(od[keep]),
            "o_orderpriority": t.column("o_orderpriority").filter(
                pa.array(keep))})

    j = hash_join(orders.map_batches(ofilt, batch_format="pyarrow"),
                  ms, on="l_orderkey")

    def late(t: pa.Table) -> pa.Table:
        keep = (t.column("max_ship").to_numpy()
                > t.column("o_orderdate").to_numpy())
        return pa.table({"o_orderpriority":
                         t.column("o_orderpriority").filter(
                             pa.array(keep))})

    out = (j.map_batches(late, batch_format="pyarrow")
           .groupby("o_orderpriority").count().to_pandas()
           .rename(columns={"count()": "order_count"}))
    return out.astype({"order_count": np.int64}) \
        .sort_values("o_orderpriority").reset_index(drop=True)


SESSION_QS = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def events_session_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact quantiles of session duration (seconds) and session event
    counts — the sessionization × exact-quantile composition (same
    cross-domain pattern as kg_degree_quantiles).  Sessions come from
    the mirrored gap-based sessionizer; the quantiles run the
    distributed histogram-combiner stage over the session table."""
    import ray.data as rd

    from ..context import spread
    from ..stages.quantiles import exact_quantiles

    sess = events_sessions(sf_dir)
    sess = sess.assign(duration_s=(sess["end_epoch"]
                                   - sess["start_epoch"]).astype(np.int64))
    ds = spread(rd.from_pandas(sess[["duration_s", "n_events"]]))
    out = exact_quantiles(ds, ["duration_s", "n_events"], SESSION_QS)
    return out.astype({"duration_s_q": np.int64,
                       "n_events_q": np.int64})


NORM_AUG = "  Weird\tSPACING\r\nPrefix "


def docs_text_norm(sf_dir: str) -> pd.DataFrame:
    """Text canonicalization before hashing/dedup: lowercase, collapse
    every whitespace run to one space, strip the ends — one stateless
    Arrow-kernel pass (utf8_lower + replace_substring_regex +
    utf8_trim).  Every 3rd doc gets a deterministic messy prefix and
    trailing spaces (the redact_pii convention) so the kernels are
    exercised on the clean synthetic corpus; the SQL twin applies the
    identical augmentation.  Output: (doc_id, n_chars_raw,
    n_chars_norm, changed, text_norm)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        tx = t.column("text").to_numpy(zero_copy_only=False).astype(str)
        tx = np.where(ids % 3 == 0,
                      np.char.add(np.char.add(NORM_AUG, tx), "  "), tx)
        raw = pa.array(tx.astype(object), pa.string())
        low = pc.utf8_lower(raw)
        coll = pc.replace_substring_regex(low, r"[ \t\n\r\f\v]+", " ")
        norm_t = pc.utf8_trim(coll, " ")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars_raw": pc.utf8_length(raw).cast(pa.int64()),
            "n_chars_norm": pc.utf8_length(norm_t).cast(pa.int64()),
            "changed": pc.not_equal(raw, norm_t).cast(pa.int64()),
            "text_norm": norm_t})

    out = ds.map_batches(norm, batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in
                       ["doc_id", "n_chars_raw", "n_chars_norm",
                        "changed"]}) \
        .sort_values("doc_id").reset_index(drop=True)


def docs_containment(sf_dir: str) -> pd.DataFrame:
    """Asymmetric containment audit for LSH candidate pairs (|A∩B|/|A|
    and /|B| — the quote/subset detector Jaccard misses);
    stages/dedup.py:containment_audit over the same loose k=16/r=2
    buckets as docs_minhash_estimate."""
    from ..stages.dedup import containment_audit

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return containment_audit(ds, k=16, n_bands=8, ngram=3)


def docs_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-doc corpus-order novelty: fraction of its distinct 3-gram
    shingles first seen in this doc (stages/curation.py:ngram_novelty —
    the heaps_curve shape over the dedup shingle hashes)."""
    from ..stages.curation import ngram_novelty

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_novelty(ds, ngram=3)


def embeddings_cluster_stability(sf_dir: str) -> pd.DataFrame:
    """Adjusted Rand Index between two seed-628/629 k-means runs — the
    are-the-clusters-real audit (stages/cluster.py:
    cluster_stability_ari; exact integer pair sums, one float chain)."""
    from ..stages.cluster import cluster_stability_ari

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cluster_stability_ari(ds, k=8, n_iter=4)


def docs_length_corr(sf_dir: str) -> pd.DataFrame:
    """Per-source Pearson correlation between character and token
    counts — the sanity check behind length-based quality bands; all
    five regression sums are exact integers through one tiny groupby,
    r is one fixed-order float chain rounded at 6 dp."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.text import _as_array, _split_flat

        src = t.column("source").to_numpy(zero_copy_only=False)
        tx = _as_array(t.column("text"))
        flat, didx, n = _split_flat(tx, r"[ \t\n\r\f\v]+")
        keep = flat != ""
        import pyarrow.compute as pc

        x = pc.utf8_length(tx).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = np.bincount(didx[keep], minlength=n).astype(np.int64)
        usrc, inv = np.unique(src, return_inverse=True)

        def seg(v):
            return np.bincount(inv, weights=v,
                               minlength=len(usrc)).astype(np.int64)

        return pa.table({
            "source": pa.array(usrc, pa.string()),
            "n": pa.array(np.bincount(inv, minlength=len(usrc))
                          .astype(np.int64)),
            "sx": pa.array(seg(x)), "sy": pa.array(seg(y)),
            "sxy": pa.array(seg(x * y)), "sxx": pa.array(seg(x * x)),
            "syy": pa.array(seg(y * y))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]])
           .to_pandas()).sort_values("source").reset_index(drop=True)
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx, syy = agg["sxx"].to_numpy(np.float64), agg["syy"].to_numpy(np.float64)
    r = half_up((n * sxy - sx * sy)
                / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    out = pd.DataFrame({
        "source": agg["source"], "n": agg["n"].astype(np.int64),
        "r": r})
    return out


def docs_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-1000 words
    (cnt DESC, token tie-break) — the per-document face of the corpus-
    level docs_ngram_coverage curve.  Vocab = one count groupby,
    broadcast once; scoring is a stateless factorize + searchsorted
    pass."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast
    from ..stages.classify import _doc_words

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        flat, _, _ = _doc_words(t.column("text"))
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    wc = (ds.map_batches(counts, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
          .to_pandas())
    top = wc.sort_values(["cnt", "token"], ascending=[False, True],
                         ignore_index=True).head(1000)
    vocab = np.sort(top["token"].to_numpy(dtype=object))
    bc = Broadcast(vocab)

    def score(t: pa.Table) -> pa.Table:
        v = bc.get()
        flat, didx, n = _doc_words(t.column("text"))
        n_tok = np.bincount(didx, minlength=n).astype(np.int64)
        if len(flat) and len(v):
            pos = np.clip(np.searchsorted(v, flat), 0, len(v) - 1)
            oov = (v[pos] != flat).astype(np.int64)
            n_oov = np.bincount(didx, weights=oov,
                                minlength=n).astype(np.int64)
        else:
            n_oov = n_tok.copy()
        rate = half_up(n_oov / np.maximum(n_tok, 1).astype(np.float64),
                        6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
            "oov_rate": pa.array(rate, pa.float64())})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in
                       ["doc_id", "n_words", "n_oov"]}) \
        .sort_values("doc_id").reset_index(drop=True)


def embeddings_norm_stats(sf_dir: str) -> pd.DataFrame:
    """Per-vector L2 norm (round-6) + quartile band by the lower-
    discrete rule — the embedding-hygiene audit run before cosine
    search (unnormalized outliers dominate dot products).  One
    stateless pass + a norms-sized collect for the band edges (the
    exact-quantile stage is the scale path)."""
    from ..stages.ann import list_col_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        V = list_col_matrix(t.column("embedding")).astype(np.float64)
        nm = np.round(np.sqrt((V ** 2).sum(axis=1)), 6)
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "norm": pa.array(nm, pa.float64())})

    df = ds.map_batches(norms, batch_format="pyarrow").to_pandas()
    v = df["norm"].to_numpy(np.float64)
    s = np.sort(v)
    n = len(s)
    edges = [s[(n - 1) // 4], s[(n - 1) // 2], s[(3 * (n - 1)) // 4]]
    band = np.ones(n, np.int64)
    for e in edges:
        band += (v > e)
    out = pd.DataFrame({"vec_id": df["vec_id"].astype(np.int64),
                        "norm": v, "band": band})
    return out.sort_values("vec_id").reset_index(drop=True)


def embeddings_matryoshka(sf_dir: str) -> pd.DataFrame:
    """Recall@10 of prefix-truncated (first 8 dims) cosine search vs
    full-dimension brute force over the 5 fixed audit queries — the
    Matryoshka-embedding trade audit (stages/ann.py:matryoshka_recall):
    how much of the exact top-k a cheap short-prefix pass keeps before a
    full-dim re-rank."""
    from ..stages.ann import matryoshka_recall

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return matryoshka_recall(ds, ANN_RECALL_QIDS, k=10, dims=8)


def events_ab_test(sf_dir: str) -> pd.DataFrame:
    """Two-proportion z-test between deterministic experiment arms
    (arm = user_id % 2; conversion = the user has ≥1 'purchase' event):
    the standard A/B readout over an event stream.  Per-batch distinct
    (user, converted) partials → ONE user-domain groupby (max) → arm
    counts; the z statistic is one fixed-order float64 chain over four
    integers, so both engines land on identical doubles before the 6-dp
    round.  Output: (arm rows with n_users/n_conv/rate) + z on each."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        conv = (et == "purchase").astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.maximum.at(c, inv, conv)
        return pa.table({"user_id": pa.array(u), "conv": pa.array(c)})

    users = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Max("conv", alias_name="conv")))

    def arm_counts(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        conv = t.column("conv").to_numpy().astype(np.int64)
        arm = uid % 2
        return pa.table({
            "arm": pa.array([0, 1], pa.int64()),
            "n_users": pa.array([int((arm == 0).sum()),
                                 int((arm == 1).sum())]),
            "n_conv": pa.array([int(conv[arm == 0].sum()),
                                int(conv[arm == 1].sum())])})

    g = users.map_batches(arm_counts, batch_format="pyarrow") \
        .to_pandas().groupby("arm", as_index=False).sum()
    n0, n1 = (int(g.loc[g.arm == a, "n_users"].sum()) for a in (0, 1))
    x0, x1 = (int(g.loc[g.arm == a, "n_conv"].sum()) for a in (0, 1))
    p0, p1 = x0 / n0, x1 / n1
    pp = (x0 + x1) / (n0 + n1)
    se = np.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    z = (p0 - p1) / se if se > 0 else 0.0
    return pd.DataFrame({
        "arm": np.array([0, 1], np.int64),
        "n_users": np.array([n0, n1], np.int64),
        "n_conv": np.array([x0, x1], np.int64),
        "rate": half_up([p0, p1], 6),
        "z": np.round([z, z], 6)})


_Q7_LO_US = 820_454_400_000_000           # 1996-01-01 UTC in epoch-us
_Q7_HI_US = 883_612_800_000_000           # 1998-01-01 UTC in epoch-us


def tpch_q7(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 analogue (volume shipping between nation pairs): revenue
    Σ extendedprice·(1−discount) per (supp_nation, cust_nation, year)
    for lineitems shipped in [1996-01-01, 1998-01-01) between DIFFERENT
    nations (the analogue keeps all unequal pairs instead of Q7's two
    fixed nations — a harder join/groupby, same plan shape).

    Shape: nation/customer/supplier are broadcast lookup arrays (small
    sides never shuffle); the one bucketed hash_join attaches
    o_custkey to the date-filtered lineitems on l_orderkey; a per-batch
    (supp_nation, cust_nation, year, rev) combiner feeds one tiny
    groupby."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast
    from ..functions.joins import hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas() \
        .sort_values("n_nationkey")
    nk = nat["n_nationkey"].to_numpy(np.int64)
    n_names = np.empty(int(nk.max()) + 1, dtype=object)
    n_names[nk] = nat["n_name"].to_numpy(dtype=object)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas() \
        .sort_values("c_custkey")
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    bc = Broadcast((cust["c_custkey"].to_numpy(np.int64),
                    cust["c_nationkey"].to_numpy(np.int64),
                    supp["s_suppkey"].to_numpy(np.int64),
                    supp["s_nationkey"].to_numpy(np.int64)))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def lfilt(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (sd >= _Q7_LO_US) & (sd < _Q7_HI_US)
        ep = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        year = (1970 + sd[keep] // 31_557_600_000_000)  # mirrored below
        return pa.table({
            "l_orderkey": pa.array(
                t.column("l_orderkey").to_numpy().astype(np.int64)[keep]),
            "l_suppkey": pa.array(
                t.column("l_suppkey").to_numpy().astype(np.int64)[keep]),
            "rev": pa.array(ep * (1.0 - disc), pa.float64()),
            "l_year": pa.array(year.astype(np.int64))})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64())}),
            batch_format="pyarrow")
    joined = hash_join(li.map_batches(lfilt, batch_format="pyarrow"),
                       orders, on="l_orderkey")

    def combine(t: pa.Table) -> pa.Table:
        ck, cn, sk, sn = bc.get()
        cust_k = t.column("o_custkey").to_numpy().astype(np.int64)
        supp_k = t.column("l_suppkey").to_numpy().astype(np.int64)
        cpos = np.clip(np.searchsorted(ck, cust_k), 0, len(ck) - 1)
        spos = np.clip(np.searchsorted(sk, supp_k), 0, len(sk) - 1)
        cnk = cn[cpos]
        snk = sn[spos]
        rev = t.column("rev").to_numpy()
        year = t.column("l_year").to_numpy().astype(np.int64)
        keep = snk != cnk
        df = pd.DataFrame({"supp_nk": snk[keep], "cust_nk": cnk[keep],
                           "l_year": year[keep], "rev": rev[keep]})
        g = df.groupby(["supp_nk", "cust_nk", "l_year"],
                       as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(combine, batch_format="pyarrow")
           .groupby(["supp_nk", "cust_nk", "l_year"])
           .aggregate(Sum("rev", alias_name="revenue"))).to_pandas()
    agg["supp_nation"] = n_names[agg["supp_nk"].to_numpy(np.int64)]
    agg["cust_nation"] = n_names[agg["cust_nk"].to_numpy(np.int64)]
    agg["revenue"] = np.round(agg["revenue"].to_numpy(), 6)
    return agg[["supp_nation", "cust_nation", "l_year", "revenue"]] \
        .astype({"l_year": np.int64}) \
        .sort_values(["supp_nation", "cust_nation", "l_year"],
                     ignore_index=True)


def docs_emb_cohesion(sf_dir: str) -> pd.DataFrame:
    """Embedding-space source audit (documents ⋈ embeddings on
    doc_id = vec_id): per source — n, mean L2 norm, and cohesion = mean
    cosine of each member to its source CENTROID (the SemDeDup-style
    health check: a source whose vectors don't cohere is noise or
    mixed-domain).  The doc→source attachment is a bucketed
    ``hash_join`` (functions/joins.py) — both sides stream; nothing
    doc-count-sized ever reaches the driver (the only broadcasts are
    the source-name list and the ns×d centroid matrix, both
    source-DOMAIN sized).  Two streaming passes over the materialized
    join: per-batch (source, count, Σvec, Σnorm) partials → tiny
    driver combine → centroid broadcast → per-batch cosine partials."""
    from ..context import Broadcast
    from ..functions.joins import hash_join
    from ..stages.ann import list_col_matrix

    docs_src = _read(sf_dir, "documents", ["doc_id", "source"])
    # distinct source names: per-batch unique partial → driver unique
    # (source-domain sized, tiny)
    names_p = docs_src.map_batches(
        lambda t: pa.table({"source": pa.array(np.unique(
            t.column("source").to_numpy(zero_copy_only=False)
            .astype(str)))}),
        batch_format="pyarrow").to_pandas()
    src_names = np.sort(names_p["source"].unique().astype(str))
    ns = len(src_names)
    nbc = Broadcast(src_names)

    docs_keyed = docs_src.map_batches(
        lambda t: pa.table({
            "vec_id": t.column("doc_id").cast(pa.int64()),
            "source": t.column("source")}), batch_format="pyarrow")
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # materialize: consumed by both streaming passes below
    joined = hash_join(emb, docs_keyed, on="vec_id").materialize()

    def _codes(t: pa.Table) -> np.ndarray:
        s = t.column("source").to_numpy(zero_copy_only=False).astype(str)
        return np.searchsorted(nbc.get(), s)

    def part1(t: pa.Table) -> pa.Table:
        M = list_col_matrix(t.column("embedding"))
        sc = _codes(t)
        cnt = np.bincount(sc, minlength=ns).astype(np.int64)
        sums = np.zeros((ns, M.shape[1]))
        np.add.at(sums, sc, M)
        norms = np.bincount(sc, weights=np.linalg.norm(M, axis=1),
                            minlength=ns)
        return pa.table({
            "sc": pa.array(np.arange(ns, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            "nsum": pa.array(norms, pa.float64())})

    p1 = joined.map_batches(part1, batch_format="pyarrow").to_pandas()
    cnt = np.zeros(ns, np.int64)
    nsum = np.zeros(ns)
    vsum = None
    for sc_, g in p1.groupby("sc"):
        cnt[sc_] = g["cnt"].sum()
        nsum[sc_] = g["nsum"].sum()
        v = np.stack([np.asarray(x) for x in g["vsum"]]).sum(axis=0)
        if vsum is None:
            vsum = np.zeros((ns, len(v)))
        vsum[sc_] = v
    cents = vsum / np.maximum(cnt, 1)[:, None]
    cn = np.linalg.norm(cents, axis=1)
    cn[cn == 0] = 1.0
    cents_u = cents / cn[:, None]
    cbc = Broadcast(cents_u)

    def part2(t: pa.Table) -> pa.Table:
        cu = cbc.get()
        M = list_col_matrix(t.column("embedding"))
        sc = _codes(t)
        nm = np.linalg.norm(M, axis=1)
        nm[nm == 0] = 1.0
        cos = ((M / nm[:, None]) * cu[sc]).sum(axis=1)
        return pa.table({
            "sc": pa.array(np.arange(ns, dtype=np.int64)),
            "csum": pa.array(np.bincount(sc, weights=cos, minlength=ns),
                             pa.float64())})

    p2 = joined.map_batches(part2, batch_format="pyarrow").to_pandas() \
        .groupby("sc", as_index=False)["csum"].sum()
    csum = np.zeros(ns)
    csum[p2["sc"].to_numpy(np.int64)] = p2["csum"].to_numpy()
    safe = np.maximum(cnt, 1).astype(np.float64)
    return pd.DataFrame({
        "source": np.asarray(src_names, dtype=object),
        "n": cnt,
        "mean_norm": np.round(nsum / safe, 6),
        "cohesion": np.round(csum / safe, 6)}) \
        .sort_values("source", ignore_index=True)


def events_sliding_topk(sf_dir: str) -> pd.DataFrame:
    """Top-3 event types per trailing 6-hour window, evaluated at every
    OBSERVED hour (the streaming windowed-top-k monitor: what dominates
    the stream right now).  Shape: per-batch (type, hour) count
    combiner → one groupby; each hourly count row then RE-KEYS to the
    ≤6 anchor hours it contributes to (the rolling_active trick — no
    per-window rescan, state bounded by types × hours × 6); rank by
    (count DESC, type ASC), keep rank ≤ 3.  Anchors = observed event
    hours only, so both engines enumerate identical windows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def hour_counts(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        hour = ts // 3_600_000_000
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hour": hour})
        g = df.groupby(["event_type", "hour"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hourly = (ds.map_batches(hour_counts, batch_format="pyarrow")
              .groupby(["event_type", "hour"])
              .aggregate(Sum("n", alias_name="n"))).to_pandas()
    # hours × types table is tiny (rule 13): window fold on the driver,
    # identical re-key semantics to the distributed rolling_active path
    anchors = np.sort(hourly["hour"].unique())
    h = hourly["hour"].to_numpy(np.int64)
    rows = []
    for a in anchors.tolist():
        m = (h > a - 6) & (h <= a)
        g = hourly.loc[m].groupby("event_type", as_index=False)["n"].sum()
        o = np.lexsort((g["event_type"].to_numpy(dtype=object),
                        -g["n"].to_numpy()))[:3]
        for rank, i in enumerate(o, 1):
            rows.append((int(a), rank, g["event_type"].iloc[i],
                         int(g["n"].iloc[i])))
    return pd.DataFrame(rows, columns=["anchor_hour", "rank",
                                       "event_type", "n"]) \
        .astype({"anchor_hour": np.int64, "rank": np.int64,
                 "n": np.int64}) \
        .sort_values(["anchor_hour", "rank"], ignore_index=True)


def events_streak(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-
    islands): distinct (user, day) rows via per-batch unique + one
    groupby-distinct — state bounded by users × days, the event stream
    never lands whole — then the island fold (day − rank constant
    within a streak) runs vectorized on that table (rule 13; one
    lexsort + one diff, no per-user loop).  Output: (user_id,
    n_active_days, longest_streak, n_streaks)."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def ud(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        uid = t.column("user_id").to_numpy().astype(np.int64)
        day = ts // 86_400_000_000
        k = np.unique(uid * np.int64(1 << 20) + day)
        return pa.table({"user_id": pa.array(k >> 20),
                         "day": pa.array(k & ((1 << 20) - 1))})

    pairs = (ds.map_batches(ud, batch_format="pyarrow")
             .groupby(["user_id", "day"]).count()
             .select_columns(["user_id", "day"])).to_pandas()
    uid = pairs["user_id"].to_numpy(np.int64)
    day = pairs["day"].to_numpy(np.int64)
    o = np.lexsort((day, uid))
    uid, day = uid[o], day[o]
    # island id: same user AND day exactly +1 continues the streak
    new = np.ones(len(uid), dtype=bool)
    if len(uid) > 1:
        new[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
    isl = np.cumsum(new) - 1
    lengths = np.bincount(isl)
    isl_user = uid[new]
    out = pd.DataFrame({"user_id": isl_user, "len": lengths})
    g = out.groupby("user_id").agg(
        longest_streak=("len", "max"), n_streaks=("len", "size"),
        n_active_days=("len", "sum")).reset_index()
    return g[["user_id", "n_active_days", "longest_streak",
              "n_streaks"]] \
        .astype({c: np.int64 for c in g.columns}) \
        .sort_values("user_id", ignore_index=True)


def embeddings_srp_estimate(sf_dir: str) -> pd.DataFrame:
    """SRP (hyperplane-LSH) accuracy audit — the embeddings twin of
    docs_minhash_estimate: for the 50 lowest vec_ids, 16 sign-random
    projections (the embeddings_rp_project matrix, seed 211) → per-pair
    Hamming distance h → est_cos = cos(π·h/16) vs the exact cosine,
    plus the absolute error.  Signs threshold the ROUNDED scaled
    projection so both engines agree by construction.  At scale the
    same audit runs on a sampled id set; the projections themselves
    are the stateless zero-copy map_batches stage."""
    import pyarrow.compute as pc

    from ..sources.pages import mix64_vec
    from ..stages.ann import RP_SEED, list_col_matrix

    k = 16
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sub = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), pa.scalar(50))),
        batch_format="pyarrow")
    import ray as _ray

    tb = pa.concat_tables([t for t in _ray.get(sub.to_arrow_refs())
                           if t.num_rows])
    ids = tb.column("vec_id").to_numpy().astype(np.int64)
    o = np.argsort(ids)
    ids = ids[o]
    X = list_col_matrix(tb.column("embedding"))[o]
    d = X.shape[1]
    dg = np.arange(d, dtype=np.int64)[:, None]
    jg = np.arange(k, dtype=np.int64)[None, :]
    S = np.where(mix64_vec(RP_SEED, dg, jg) % np.uint64(2) == 0,
                 1.0, -1.0)
    y = np.round((X @ S) / np.sqrt(float(k)), 6)
    bits = y > 0
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Xu = X / nrm
    C = Xu @ Xu.T
    ii, jj = np.triu_indices(len(ids), 1)
    h = (bits[ii] != bits[jj]).sum(axis=1).astype(np.int64)
    est = np.cos(np.pi * h / float(k))
    true = C[ii, jj]
    return pd.DataFrame({
        "ida": ids[ii], "idb": ids[jj], "h": h,
        "est_cos": np.round(est, 6),
        "true_cos": np.round(true, 6),
        "err": np.round(np.abs(est - true), 6)}) \
        .astype({"ida": np.int64, "idb": np.int64, "h": np.int64}) \
        .sort_values(["ida", "idb"], ignore_index=True)


def events_pareto(sf_dir: str) -> pd.DataFrame:
    """Event-concentration audit (the 80/20 readout behind bot/power-user
    filters): users ranked by event count (count DESC, user_id ASC),
    split into 10 rank deciles (decile = 10·(rank−1) // n_users); per
    decile n_users / n_events / share / cumulative share.  Counts are
    exact integers through one user-domain groupby; the decile fold
    runs on that bounded table (rule 13); shares are single divisions
    rounded 6 dp."""
    ds = _read(sf_dir, "events", ["user_id"])
    uc = (ds.groupby("user_id").count()
          .to_pandas().rename(columns={"count()": "n"}))
    cnt = uc["n"].to_numpy(np.int64)
    uid = uc["user_id"].to_numpy(np.int64)
    order = np.lexsort((uid, -cnt))
    cnt = cnt[order]
    n_users = len(cnt)
    total = int(cnt.sum())
    dec = (10 * np.arange(n_users, dtype=np.int64)) // n_users
    n_ev = np.bincount(dec, weights=cnt, minlength=10).astype(np.int64)
    n_us = np.bincount(dec, minlength=10).astype(np.int64)
    share = n_ev / float(total)
    return pd.DataFrame({
        "decile": np.arange(10, dtype=np.int64),
        "n_users": n_us,
        "n_events": n_ev,
        "share": half_up(share, 6),
        "cum_share": half_up(np.cumsum(n_ev) / float(total), 6)})


def events_user_gini(sf_dir: str) -> pd.DataFrame:
    """Per-type Gini coefficient of the per-user event-count
    distribution (the inequality twin of events_pareto's decile
    readout).  Exact integer arithmetic end-to-end via the
    count-of-counts histogram: with distinct count values v_j
    (ascending), multiplicities m_j and users-below prefix N_j, the
    rank-weighted sum is Σ v_j·(m_j·N_j + m_j(m_j+1)/2) — invariant to
    tie order — and gini = (2S − (n+1)T) / (nT), one final division.

    Shape: per-batch (user,type) partials → one user-domain groupby →
    per-batch histogram partials → one histogram-domain groupby; the
    driver only ever sees the (types × distinct-count-values) table,
    never the user table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def upartial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy().astype(np.int64),
            "event_type": t.column("event_type")
            .to_numpy(zero_copy_only=False).astype(str)})
        g = df.groupby(["user_id", "event_type"], as_index=False) \
            .size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    uc = (ds.map_batches(upartial, batch_format="pyarrow")
          .groupby(["user_id", "event_type"]).sum("c"))

    def hpartial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t.column("event_type")
            .to_numpy(zero_copy_only=False).astype(str),
            "c": t.column("sum(c)").to_numpy().astype(np.int64)})
        g = df.groupby(["event_type", "c"], as_index=False) \
            .size().rename(columns={"size": "m"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (uc.map_batches(hpartial, batch_format="pyarrow")
            .groupby(["event_type", "c"])
            .aggregate(Sum("m", alias_name="m")).to_pandas())
    rows = []
    for tp, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("c")
        # object dtype: the rank-weighted products reach v·n² — a silent
        # int64 wrap at scale would corrupt gini with no error, so the
        # multiply runs on arbitrary-precision Python ints.
        v = g["c"].to_numpy(np.int64).astype(object)
        m = g["m"].to_numpy(np.int64).astype(object)
        below = np.concatenate(([0], np.cumsum(m)[:-1]))
        s = int(np.sum(v * (m * below + m * (m + 1) // 2)))
        n = int(m.sum())
        total = int(np.sum(v * m))
        gini = (2 * s - (n + 1) * total) / float(n * total)
        rows.append({"event_type": tp, "n_users": np.int64(n),
                     "total": np.int64(total),
                     "gini": half_up(gini, 6)})
    return pd.DataFrame(rows).reset_index(drop=True)


def tpch_q6(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 analogue (forecasting revenue change): revenue
    Σ extendedprice·discount over lineitems with discount in
    [0.05, 0.07] and quantity < 24, per ship year (the analogue keeps
    all years rather than Q6's single-year slice — the tpch_q5
    convention).  One pruned read → stateless filter+combine per
    batch → tiny per-year groupby; nothing but (year, partial-sum)
    rows ever shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        qty = t.column("l_quantity").to_numpy()
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        keep = (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        year = (1970 + sd[keep] // 31_557_600_000_000).astype(np.int64)
        df = pd.DataFrame({"l_year": year, "rev": ep[keep] * disc[keep],
                           "n": np.int64(1)})
        g = df.groupby("l_year", as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_year")
           .aggregate(Sum("rev", alias_name="revenue"),
                      Sum("n", alias_name="n_items")).to_pandas())
    out["revenue"] = np.round(out["revenue"].to_numpy(), 6)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.astype({"l_year": np.int64}) \
        .sort_values("l_year", ignore_index=True)


def tpch_q10(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 analogue (returned-item reporting): top-20 customers
    by lost revenue Σ extendedprice·(1−discount) over lineitems with
    l_returnflag = 'R' (the analogue keeps all order dates rather than
    Q10's one-quarter slice).  Plan: filter+pre-sum per orderkey inside
    the batch → one bucketed hash_join onto orders → per-custkey
    combiner → customer-domain groupby; the customer/nation decoration
    is a broadcast lookup.  Ranking happens on the 6-dp ROUNDED
    revenue with c_custkey tiebreak (the docs_tfidf rule: never rank
    on raw float sums across engines)."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]) \
        .to_pandas().sort_values("c_custkey")
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .to_pandas().sort_values("n_nationkey")
    nk = nat["n_nationkey"].to_numpy(np.int64)
    n_names = np.empty(int(nk.max()) + 1, dtype=object)
    n_names[nk] = nat["n_name"].to_numpy(dtype=object)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        keep = (t.column("l_returnflag")
                .to_numpy(zero_copy_only=False).astype(str) == "R")
        ep = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)[keep]
        df = pd.DataFrame({"l_orderkey": ok, "rev": ep * (1.0 - disc)})
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64())}),
            batch_format="pyarrow")
    joined = hash_join(li.map_batches(lpart, batch_format="pyarrow"),
                       orders, on="l_orderkey")

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_custkey": t.column("o_custkey").to_numpy().astype(np.int64),
            "rev": t.column("rev").to_numpy()})
        g = df.groupby("c_custkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(cpart, batch_format="pyarrow")
           .groupby("c_custkey")
           .aggregate(Sum("rev", alias_name="revenue")).to_pandas())
    agg["revenue"] = np.round(agg["revenue"].to_numpy(), 6)
    agg = agg.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).head(20)
    ck = agg["c_custkey"].to_numpy(np.int64)
    pos = np.searchsorted(cust["c_custkey"].to_numpy(np.int64), ck)
    out = pd.DataFrame({
        "c_custkey": ck,
        "c_name": cust["c_name"].to_numpy(dtype=object)[pos],
        "n_name": n_names[cust["c_nationkey"]
                          .to_numpy(np.int64)[pos]],
        "c_acctbal": np.round(cust["c_acctbal"].to_numpy()[pos], 2),
        "revenue": agg["revenue"].to_numpy()})
    return out.reset_index(drop=True)


def tpch_q14(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 analogue (promotion effect): per ship year, the share
    of revenue Σ extendedprice·(1−discount) coming from PROMO-type
    parts (the analogue keeps all years rather than Q14's one-month
    slice).  The part→is_promo map is a dense broadcast array indexed
    by partkey inside the batch kernel — the lineitem stream never
    joins, only gathers."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pk = part["p_partkey"].to_numpy(np.int64)
    promo = np.zeros(int(pk.max()) + 1, dtype=np.float64)
    promo[pk] = (part["p_type"].to_numpy(dtype=object) == "PROMO") \
        .astype(np.float64)
    bc = Broadcast(promo)

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pm = bc.get()
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))
        is_p = pm[t.column("l_partkey").to_numpy().astype(np.int64)]
        year = (1970 + sd // 31_557_600_000_000).astype(np.int64)
        df = pd.DataFrame({"l_year": year, "promo_rev": rev * is_p,
                           "total_rev": rev})
        g = df.groupby("l_year", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_year")
           .aggregate(Sum("promo_rev", alias_name="promo_rev"),
                      Sum("total_rev", alias_name="total_rev"))
           .to_pandas())
    pr = out["promo_rev"].to_numpy()
    tr = out["total_rev"].to_numpy()
    out["promo_rev"] = np.round(pr, 6)
    out["total_rev"] = np.round(tr, 6)
    # share from the ROUNDED sums: one division over 6-dp-pinned inputs
    out["promo_share"] = np.round(
        100.0 * np.round(pr, 6) / np.round(tr, 6), 6)
    return out.astype({"l_year": np.int64}) \
        .sort_values("l_year", ignore_index=True)


def events_props_extract(sf_dir: str) -> pd.DataFrame:
    """Typed-metadata extraction from the JSON ``props`` column (the
    schema-on-read step every event pipeline runs before analytics):
    pull the integer ``k`` per event with one vectorized RE2
    ``extract_regex`` pass, then per event_type integer stats — n,
    n_with_k, sum_k, min_k, max_k, mean_k (the only float: one
    division over exact integers, 6 dp).  Per-batch combiner → one
    tiny type-domain groupby; the props strings never shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>\d+)')
        ks = pc.struct_field(ex, "k")
        has = pc.is_valid(ks).to_numpy(zero_copy_only=False)
        kv = np.where(has,
                      pc.cast(pc.if_else(pc.is_valid(ks), ks, "0"),
                              pa.int64()).to_numpy(zero_copy_only=False),
                      0).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type")
            .to_numpy(zero_copy_only=False).astype(str),
            "n": np.int64(1),
            "n_with_k": has.astype(np.int64),
            "sum_k": kv,
            "min_k": np.where(has, kv, np.iinfo(np.int64).max),
            "max_k": np.where(has, kv, np.iinfo(np.int64).min)})
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_with_k=("n_with_k", "sum"),
            sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_with_k", alias_name="n_with_k"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k"))
           .to_pandas())
    for c in ["n", "n_with_k", "sum_k", "min_k", "max_k"]:
        out[c] = out[c].astype(np.int64)
    # types with zero extracted k: pin min/max/mean to 0 (matches the
    # mirror's COALESCE so neither engine leaks sentinels or NULLs)
    none = out["n_with_k"].to_numpy() == 0
    out.loc[none, ["min_k", "max_k"]] = np.int64(0)
    out["mean_k"] = np.where(
        none, 0.0,
        half_up(out["sum_k"].to_numpy()
            / np.maximum(out["n_with_k"].to_numpy(np.float64), 1), 6))
    return out.sort_values("event_type", ignore_index=True)


def events_value_stats(sf_dir: str) -> pd.DataFrame:
    """Per-type moments of the event ``value`` column — n, sum, mean,
    population variance, min, max — computed EXACTLY: values are 2-dp
    currency, so the kernel reinterprets them as integer cents and
    every cross-batch reduction is an int64 Σc / Σc² (the
    events_hourly_anomaly trick applied to a payload column); the only
    floats are final single divisions, rounded 6 dp."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # floor(v*100 + 0.5): one shared deterministic cents rule in BOTH
        # engines (np.rint is half-to-even, DuckDB round() half-away —
        # they'd diverge on an exact half cent).
        c = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type")
            .to_numpy(zero_copy_only=False).astype(str),
            "n": np.int64(1), "s": c, "s2": c * c,
            "mn": c, "mx": c})
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
            mn=("mn", "min"), mx=("mx", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s"),
                      Sum("s2", alias_name="s2"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"))
           .to_pandas())
    n = out["n"].to_numpy(np.int64)
    s = out["s"].to_numpy(np.int64)
    s2 = out["s2"].to_numpy(np.int64)
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": n,
        "sum_v": np.round(s / 100.0, 2),
        "mean_v": np.round(s / (100.0 * n), 6),
        # population variance in currency²: (nΣc² − (Σc)²) / (n²·10⁴)
        "var_v": np.round((n * s2 - s * s)
                          / (n.astype(np.float64) ** 2 * 1e4), 6),
        "min_v": np.round(out["mn"].to_numpy(np.int64) / 100.0, 2),
        "max_v": np.round(out["mx"].to_numpy(np.int64) / 100.0, 2),
    }).sort_values("event_type", ignore_index=True)


def embeddings_class_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid separation audit (the labeled-embedding
    health check behind classifier-based curation): per vector, the
    Euclidean distance to its OWN label centroid, the nearest OTHER
    label and its distance, and the margin — negative margins mark
    vectors sitting in another class's territory.

    Cross-engine contract (the kmeans convention): centroids =
    per-dim mean rounded 6 dp; every distance rounded 6 dp before any
    comparison; nearest-other ties break to the smaller label; margin
    recomputed as round(d_other − d_own, 6).  One (label × dim)
    partial-sum combiner builds the centroids; scoring is a stateless
    broadcast pass (labels × dim is the small object)."""
    from ..context import Broadcast
    from ..stages.ann import list_col_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def cpart(t: pa.Table) -> pa.Table:
        X = list_col_matrix(t.column("embedding"))
        lab = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(ul), X.shape[1]), np.float64)
        np.add.at(acc, inv, X)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ul, X.shape[1])),
            "pos": pa.array(np.tile(np.arange(X.shape[1], dtype=np.int64),
                                    len(ul))),
            "s": pa.array(acc.ravel()),
            "cnt": pa.array(np.repeat(cnt, X.shape[1]))})

    from ray.data.aggregate import Sum

    cs = (ds.map_batches(cpart, batch_format="pyarrow")
          .groupby(["label", "pos"])
          .aggregate(Sum("s", alias_name="s"),
                     Sum("cnt", alias_name="cnt")).to_pandas()
          .sort_values(["label", "pos"]))
    labels = np.sort(cs["label"].unique()).astype(np.int64)
    d = int(cs["pos"].max()) + 1
    C = np.round(cs["s"].to_numpy().reshape(len(labels), d)
                 / cs["cnt"].to_numpy().reshape(len(labels), d), 6)
    bc = Broadcast((labels, C))

    def score(t: pa.Table) -> pa.Table:
        labs, Cm = bc.get()
        X = list_col_matrix(t.column("embedding"))
        lab = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        li = np.searchsorted(labs, lab)
        # (n, k) rounded distances to every centroid
        d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
        dist = np.round(np.sqrt(d2), 6)
        n = len(lab)
        d_own = dist[np.arange(n), li]
        masked = dist.copy()
        masked[np.arange(n), li] = np.inf
        oi = np.argmin(masked, axis=1)          # ties → smaller label
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "label": pa.array(lab),
            "d_own": pa.array(d_own),
            "other_label": pa.array(labs[oi]),
            "d_other": pa.array(masked[np.arange(n), oi]),
            "margin": pa.array(np.round(
                masked[np.arange(n), oi] - d_own, 6))})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.astype({"vec_id": np.int64, "label": np.int64,
                       "other_label": np.int64}) \
        .sort_values("vec_id", ignore_index=True)


def events_ab_srm(sf_dir: str) -> pd.DataFrame:
    """Sample-ratio-mismatch guardrail for a hash-randomized experiment
    (the invalidity check every A/B platform runs BEFORE reading the
    metric): users are assigned arm = mix64(9, user_id) % 2, the
    allocation is audited against the designed 50/50 with Pearson's
    χ² = Σ (obs − n/2)² / (n/2), flagged at the α=0.05 cutoff 3.841.
    Per-batch distinct-user partials → one user-domain groupby → two
    integers; χ² is one fixed-order float chain, 6 dp."""
    from ray.data.aggregate import Max

    from ..sources.pages import mix64_vec

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("user_id").to_numpy().astype(np.int64))
        return pa.table({"user_id": pa.array(u),
                         "one": pa.array(np.ones(len(u), np.int64))})

    users = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Max("one", alias_name="one"))
             .to_pandas())
    uid = users["user_id"].to_numpy(np.int64)
    arm = (mix64_vec(9, uid).astype(np.uint64) % np.uint64(2)) \
        .astype(np.int64)
    n = len(uid)
    n1 = int(arm.sum())
    n0 = n - n1
    exp = n / 2.0
    chi2 = (n0 - exp) ** 2 / exp + (n1 - exp) ** 2 / exp
    return pd.DataFrame({
        "arm": np.array([0, 1], np.int64),
        "n_users": np.array([n0, n1], np.int64),
        "expected": np.round([exp, exp], 6),
        "chi2": np.round([chi2, chi2], 6),
        "srm_flag": np.array([int(chi2 > 3.841)] * 2, np.int64)})


def docs_signal_agreement(sf_dir: str) -> pd.DataFrame:
    """Curation-signal agreement audit: Spearman rank correlation
    between the NB quality score (docs_nb_quality) and the unigram-LM
    mean log-probability (docs_lm_perplexity) over every doc — the
    "do our quality gates even agree?" readout that decides whether a
    second signal adds information.

    Exactness: both scores are pinned to 6-dp fixed-point int64, ranks
    are the PERMUTATION row_number over (score_fp, doc_id) — no
    average-rank halves — so Spearman reduces to the all-integer
    identity ρ = 1 − 6·Σd²/(n(n²−1)): one integer Σd², one final
    division.  Both models are the existing broadcast fits; the rank
    sort is over the doc-domain score table (the same bounded object
    every scored-corpus query already returns)."""
    import pyarrow.compute as pc

    from ..stages.classify import fit_nb_quality, nb_quality_score
    from ..stages.lm_score import fit_unigram_lm, perplexity_score

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ref = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    nbm = fit_nb_quality(ref, vocab_k=20000)
    lmm = fit_unigram_lm(ref, vocab_k=20000)
    nb = nb_quality_score(ds, nbm).to_pandas().sort_values("doc_id")
    lm = perplexity_score(ds, lmm).to_pandas().sort_values("doc_id")
    ids = nb["doc_id"].to_numpy(np.int64)
    a = np.rint(np.round(nb["nb_score"].to_numpy(), 6) * 1e6) \
        .astype(np.int64)
    b = np.rint(np.round(lm["logprob_mean"].to_numpy(), 6) * 1e6) \
        .astype(np.int64)
    ra = np.empty(len(a), np.int64)
    ra[np.lexsort((ids, a))] = np.arange(1, len(a) + 1)
    rb = np.empty(len(b), np.int64)
    rb[np.lexsort((ids, b))] = np.arange(1, len(b) + 1)
    d2 = int(((ra - rb) ** 2).sum())
    n = len(a)
    rho = 1.0 - 6.0 * d2 / (n * (n * n - 1))
    return pd.DataFrame({"n_docs": [np.int64(n)],
                         "sum_d2": [np.int64(d2)],
                         "spearman_rho": [float(half_up(rho, 6))]})


def docs_slop_ngrams(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Per-source top-10 repeated word 3-grams by occurrence count —
    the 'slop phrase' detector (over-represented boilerplate phrases
    are the textual fingerprint of template/LLM-generated feeds; the
    phrase-level sibling of docs_dup_rate_by_source).  Per-batch
    (source, ngram, cnt) combiner → one ngram-domain groupby →
    per-block partial top-k per source (lossless: counts are final
    after the groupby) → cut on (n DESC, ngram ASC)."""
    from ray.data.aggregate import Sum

    from ..stages.lm_score import _doc_tokens

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        toks, doc_idx, n = _doc_tokens(t.column("text"))
        src = t.column("source").to_numpy(zero_copy_only=False) \
            .astype(object)
        if len(toks) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "ngram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        ok = np.zeros(max(len(toks) - 2, 0), dtype=bool)
        if len(ok):
            ok = (doc_idx[:-2] == doc_idx[2:])
        tri = np.char.add(np.char.add(np.char.add(np.char.add(
            toks[:-2][ok].astype(str), " "), toks[1:-1][ok].astype(str)),
            " "), toks[2:][ok].astype(str))
        key = np.char.add(np.char.add(
            src[doc_idx[:-2][ok]].astype(str), "\x1f"), tri)
        uk, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"source": pa.array(sp[:, 0], pa.string()),
                         "ngram": pa.array(sp[:, 2], pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    def topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t.column("source").to_numpy(zero_copy_only=False),
            "ngram": t.column("ngram").to_numpy(zero_copy_only=False),
            "n": t.column("sum(c)").to_numpy().astype(np.int64)})
        df = df.sort_values(["source", "n", "ngram"],
                            ascending=[True, False, True]) \
            .groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "ngram"]).sum("c")
           .map_batches(topk, batch_format="pyarrow").to_pandas())
    out = out.sort_values(["source", "n", "ngram"],
                          ascending=[True, False, True]) \
        .groupby("source", sort=False).head(k)
    return out.astype({"n": np.int64}).reset_index(drop=True)


CODE_AUG = ("\ndef f(x):\n    return x + 1\n\nimport os\n"
            "\tval = items[0]; { x = (1, 2); }\n")
_CODE_KWS = ["def ", "import ", "return ", "#include", "function "]
_CODE_SYMS = list("{}();=[]")


def docs_code_detect(sf_dir: str) -> pd.DataFrame:
    """Code-likeness classifier (the pretraining-curation gate that
    routes code-looking text away from the prose pipeline): per doc —
    line count, indented-line count (4-space or tab), code-keyword
    hits, symbol density — composed into an is_code flag
    (indent_frac ≥ 0.2 with ≥ 3 lines, OR ≥ 2 keyword hits, OR symbol
    density > 0.03; thresholds compare 6-dp-rounded ratios so both
    engines land on the identical flag).  Every 7th doc gets a
    deterministic code-snippet suffix (the docs_redact_pii
    convention) so all kernels are exercised on the synthetic corpus.
    One stateless vectorized pass: Arrow count_substring for
    keywords/symbols, one line split for the indent kernel."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        from ..stages.text import _split_flat

        ids = t.column("doc_id").to_numpy().astype(np.int64)
        tx = t.column("text").to_numpy(zero_copy_only=False).astype(str)
        tx = np.where(ids % 7 == 0, np.char.add(tx, CODE_AUG), tx)
        arr = pa.array(tx.astype(object), pa.string())
        n = len(ids)
        kw = np.zeros(n, np.int64)
        for w in _CODE_KWS:
            kw += pc.count_substring(arr, w).to_numpy().astype(np.int64)
        sym = np.zeros(n, np.int64)
        for c in _CODE_SYMS:
            sym += pc.count_substring(arr, c).to_numpy().astype(np.int64)
        nch = pc.utf8_length(arr).to_numpy().astype(np.int64)
        lines, didx, _ = _split_flat(arr, "\n")
        n_lines = np.bincount(didx, minlength=n).astype(np.int64)
        ind = (np.char.startswith(lines.astype(str), "    ")
               | np.char.startswith(lines.astype(str), "\t"))
        indent = np.bincount(didx, weights=ind,
                             minlength=n).astype(np.int64)
        ifrac = half_up(indent / np.maximum(n_lines, 1), 6)
        sdens = half_up(sym / np.maximum(nch, 1), 6)
        is_code = (((ifrac >= 0.2) & (n_lines >= 3)) | (kw >= 2)
                   | (sdens > 0.03)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids), "n_lines": pa.array(n_lines),
            "indent_lines": pa.array(indent), "kw_hits": pa.array(kw),
            "sym_density": pa.array(sdens, pa.float64()),
            "indent_frac": pa.array(ifrac, pa.float64()),
            "is_code": pa.array(is_code)})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    ints = {c: np.int64 for c in ["doc_id", "n_lines", "indent_lines",
                                  "kw_hits", "is_code"]}
    return out.astype(ints).sort_values("doc_id").reset_index(drop=True)


def events_interarrival(sf_dir: str) -> pd.DataFrame:
    """Median inter-event gap per user (the burstiness/bot signal next
    to events_streak): gaps are successive-timestamp diffs within a
    user; median is the EXACT lower-discontinuous element, so both
    engines pick the identical integer microsecond value.  Shape: the
    (user, ts) rows hash-partition once by user (coarse int partitions,
    rule 3); inside each partition one lexsort by (user, gap) lines
    every user's gaps up contiguously and the median is a vectorized
    segment pick — no per-user loop, state bounded by the partition's
    events.  Users with a single event have no gap and are absent from
    both engines' output."""
    from ..context import num_cpus

    n_part = min(256, max(32, num_cpus() * 4))
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "ts": pa.array(t.column("ts").cast(pa.int64()).to_numpy()),
            "part": pa.array((uid % n_part).astype(np.int32))})

    def med_in_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        o = np.lexsort((ts, uid))
        uid, ts = uid[o], ts[o]
        same = uid[1:] == uid[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        guid = uid[1:][same]
        if not len(gap):
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "n_gaps": np.array([], np.int64),
                                 "median_gap_us": np.array([], np.int64)})
        o2 = np.lexsort((gap, guid))
        guid, gap = guid[o2], gap[o2]
        new = np.ones(len(guid), dtype=bool)
        new[1:] = guid[1:] != guid[:-1]
        starts = np.flatnonzero(new)
        k = np.diff(np.append(starts, len(guid)))
        med = gap[starts + (k - 1) // 2]
        return pd.DataFrame({"user_id": guid[starts], "n_gaps": k,
                             "median_gap_us": med})

    out = (ds.map_batches(add_part, batch_format="pyarrow")
           .groupby("part")
           .map_groups(med_in_part, batch_format="pandas")).to_pandas()
    return out.astype({c: np.int64 for c in out.columns}) \
        .sort_values("user_id", ignore_index=True)


def tpch_q5(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 analogue (local-supplier volume): revenue
    Σ extendedprice·(1−discount) per (region, year) for lineitems where
    customer and supplier sit in the SAME nation (the analogue keeps
    all regions/years rather than Q5's single region+year slice).
    Same plan as tpch_q7 — broadcast small-side lookups, one bucketed
    hash_join on the order key, per-batch combiner → tiny groupby."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast
    from ..functions.joins import hash_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas() \
        .sort_values("n_nationkey")
    reg = _read(sf_dir, "region",
                ["r_regionkey", "r_name"]).to_pandas() \
        .sort_values("r_regionkey")
    nk = nat["n_nationkey"].to_numpy(np.int64)
    n2r = np.zeros(int(nk.max()) + 1, np.int64)
    n2r[nk] = nat["n_regionkey"].to_numpy(np.int64)
    rk = reg["r_regionkey"].to_numpy(np.int64)
    r_names = np.empty(int(rk.max()) + 1, dtype=object)
    r_names[rk] = reg["r_name"].to_numpy(dtype=object)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas() \
        .sort_values("c_custkey")
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    bc = Broadcast((cust["c_custkey"].to_numpy(np.int64),
                    cust["c_nationkey"].to_numpy(np.int64),
                    supp["s_suppkey"].to_numpy(np.int64),
                    supp["s_nationkey"].to_numpy(np.int64),
                    n2r))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def lmap(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        year = 1970 + sd // 31_557_600_000_000
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "rev": pa.array(ep * (1.0 - disc), pa.float64()),
            "l_year": pa.array(year.astype(np.int64))})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64())}),
            batch_format="pyarrow")
    joined = hash_join(li.map_batches(lmap, batch_format="pyarrow"),
                       orders, on="l_orderkey")

    def combine(t: pa.Table) -> pa.Table:
        ck, cn, sk, sn, n2r_ = bc.get()
        cust_k = t.column("o_custkey").to_numpy().astype(np.int64)
        supp_k = t.column("l_suppkey").to_numpy().astype(np.int64)
        cnk = cn[np.clip(np.searchsorted(ck, cust_k), 0, len(ck) - 1)]
        snk = sn[np.clip(np.searchsorted(sk, supp_k), 0, len(sk) - 1)]
        keep = snk == cnk
        df = pd.DataFrame({
            "regionkey": n2r_[cnk[keep]],
            "l_year": t.column("l_year").to_numpy(
                zero_copy_only=False).astype(np.int64)[keep],
            "rev": t.column("rev").to_numpy()[keep]})
        g = df.groupby(["regionkey", "l_year"], as_index=False)["rev"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(combine, batch_format="pyarrow")
           .groupby(["regionkey", "l_year"])
           .aggregate(Sum("rev", alias_name="revenue"))).to_pandas()
    agg["region"] = r_names[agg["regionkey"].to_numpy(np.int64)]
    agg["revenue"] = np.round(agg["revenue"].to_numpy(), 6)
    return agg[["region", "l_year", "revenue"]] \
        .astype({"l_year": np.int64}) \
        .sort_values(["region", "l_year"], ignore_index=True)


def docs_dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate rate per source (the per-feed dedup-health
    readout that decides which crawls get re-fetched): n_docs vs
    distinct texts, dup_rate = 1 − unique/docs.  Distinct texts count
    via the 64-bit content hash (stages/dedup.py:stable_hash64 — the
    docs_exact_dedup convention: the SQL twin groups by the exact text,
    identical absent hash collisions): per-batch (source, hash) unique
    partials → one groupby → per-block fold; document text never
    shuffles, only (source, int64) rows."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import stable_hash64

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def pairs(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        tx = t.column("text").to_pylist()
        h = np.fromiter((stable_hash64(x) for x in tx),
                        dtype=np.uint64, count=len(tx)).view(np.int64)
        df = pd.DataFrame({"source": src, "h": h})
        g = df.groupby(["source", "h"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    uh = (ds.map_batches(pairs, batch_format="pyarrow")
          .groupby(["source", "h"])
          .aggregate(Sum("cnt", alias_name="cnt")))

    def fold(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(src)
        return pa.table({
            "source": pa.array(uniq, pa.string()),
            "n_unique": pa.array(np.bincount(
                codes, minlength=len(uniq)).astype(np.int64)),
            "n_docs": pa.array(np.bincount(
                codes, weights=cnt, minlength=len(uniq))
                .astype(np.int64))})

    out = uh.map_batches(fold, batch_format="pyarrow").to_pandas() \
        .groupby("source", as_index=False).sum()
    nd = out["n_docs"].to_numpy(np.int64)
    nu = out["n_unique"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": out["source"],
        "n_docs": nd, "n_unique": nu,
        "dup_rate": half_up(1.0 - nu / nd.astype(np.float64), 6)}) \
        .sort_values("source", ignore_index=True)


# ---------------------------------------------------------------------------
# Round-4 additions: lateness x priority, profit rollup, cohort retention
# ---------------------------------------------------------------------------

_Q12_LATE_US = 60 * 86_400_000_000            # 60-day lateness cutoff


def tpch_q12(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 analogue (shipping-mode priority audit; the synthetic
    schema lacks shipmode/commit/receipt, so lateness is
    l_shipdate > o_orderdate + 60 days): per order priority, the count
    of late vs on-time lineitems.

    Shape: lineitem pre-combines to (orderkey, ship DAY, n) rows —
    shipdates within an order quantize to days, so the combiner cuts
    the join payload without losing the lateness predicate — then ONE
    bucketed hash_join against orders and a stateless per-batch
    lateness fold into a priority-domain groupby.  All integer counts,
    zero float risk."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def lpart(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        day = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        # the packed key reserves 5 decimal digits for the day; a ship
        # date at/past day 100000 (~year 2243) would silently corrupt
        # the lateness predicate after the % recovery — fail loudly
        if day.size and int(day.max()) >= 100_000:
            raise ValueError(
                "tpch_q12: l_shipdate past epoch day 99999 overflows "
                "the orderkey*100000+day packing — widen the multiplier")
        key = ok * 100_000 + (day % 100_000)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "l_orderkey": pa.array(uk // 100_000),
            "ship_day": pa.array(uk % 100_000),
            "n": pa.array(cnt.astype(np.int64))})

    lp = (li.map_batches(lpart, batch_format="pyarrow")
          .groupby(["l_orderkey", "ship_day"])
          .aggregate(Sum("n", alias_name="n")))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_day": pa.array(
                t.column("o_orderdate").cast(pa.int64()).to_numpy()
                // 86_400_000_000),
            "o_orderpriority": t.column("o_orderpriority")}),
            batch_format="pyarrow")
    j = hash_join(lp, orders, on="l_orderkey")

    def fold(t: pa.Table) -> pa.Table:
        late = (t.column("ship_day").to_numpy()
                > t.column("o_day").to_numpy() + 60)
        n = t.column("n").to_numpy().astype(np.int64)
        df = pd.DataFrame({
            "o_orderpriority": t.column("o_orderpriority")
            .to_numpy(zero_copy_only=False).astype(str),
            "late_count": np.where(late, n, 0),
            "ontime_count": np.where(late, 0, n)})
        g = df.groupby("o_orderpriority", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (j.map_batches(fold, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("late_count", alias_name="late_count"),
                      Sum("ontime_count", alias_name="ontime_count"))
           .to_pandas())
    return out.astype({"late_count": np.int64, "ontime_count": np.int64}) \
        .sort_values("o_orderpriority", ignore_index=True)


def tpch_q9(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 analogue (product-type profit rollup; no partsupp table,
    so unit cost is 0.5 * p_retailprice): per supplier nation and ship
    year, profit = sum(l_extendedprice*(1-l_discount)
    - 0.5*p_retailprice*l_quantity).

    The supplier->nation and part->retailprice maps are dense broadcast
    arrays indexed inside the batch kernel (the tpch_q14 convention) —
    the lineitem stream joins nothing, gathers twice, and pre-combines
    per (nation, year) before one tiny groupby."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    sk = sup["s_suppkey"].to_numpy(np.int64)
    snat = np.zeros(int(sk.max()) + 1, dtype=np.int64)
    snat[sk] = sup["s_nationkey"].to_numpy(np.int64)
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = nat["n_nationkey"].to_numpy(np.int64)
    n_names = np.empty(int(nk.max()) + 1, dtype=object)
    n_names[nk] = nat["n_name"].to_numpy(dtype=object)
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]) \
        .to_pandas()
    pk = part["p_partkey"].to_numpy(np.int64)
    pcost = np.zeros(int(pk.max()) + 1, dtype=np.float64)
    pcost[pk] = 0.5 * part["p_retailprice"].to_numpy(np.float64)
    bc = Broadcast((snat, pcost))

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        snat_, pcost_ = bc.get()
        nation = snat_[t.column("l_suppkey").to_numpy().astype(np.int64)]
        year = 1970 + (t.column("l_shipdate").cast(pa.int64()).to_numpy()
                       // 86_400_000_000) // 365
        amount = (t.column("l_extendedprice").to_numpy()
                  * (1.0 - t.column("l_discount").to_numpy())
                  - pcost_[t.column("l_partkey").to_numpy()
                           .astype(np.int64)]
                  * t.column("l_quantity").to_numpy())
        key = nation * 10_000 + year
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "nationkey": pa.array(uk // 10_000),
            "year": pa.array(uk % 10_000),
            "amount": pa.array(np.bincount(inv, weights=amount,
                                           minlength=len(uk)))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["nationkey", "year"])
           .aggregate(Sum("amount", alias_name="amount")).to_pandas())
    out = pd.DataFrame({
        "n_name": n_names[agg["nationkey"].to_numpy(np.int64)],
        "year": agg["year"].astype(np.int64),
        "profit": np.round(agg["amount"].to_numpy(), 2)})
    return out.sort_values(["n_name", "year"], ignore_index=True)


_WEEK_US = 7 * 86_400_000_000


def events_retention(sf_dir: str, max_k: int = 8) -> pd.DataFrame:
    """Weekly cohort retention (the product-analytics staple): users
    cohort by their FIRST active week; retention[cohort, k] = distinct
    users of that cohort active in week cohort+k, as count + rate.

    Shape: per-batch distinct (user, week) partial -> int-partition
    distinct (the signature rows, never the event stream) -> per-user
    min-week groupby -> one bucketed hash_join re-attaching the cohort
    to each (user, week) row -> tiny (cohort, k) count groupby.  Rates
    use the shared half-up rule (dyadic count ratios)."""
    from ray.data.aggregate import Min, Sum

    from ..context import half_up
    from ..functions.joins import hash_join
    from ..stages.dedup import distinct_rows

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def uw(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        w = t.column("ts").cast(pa.int64()).to_numpy() // _WEEK_US
        k = np.unique(u * 100_000 + (w % 100_000))
        return pa.table({"user_id": pa.array(k // 100_000),
                         "week": pa.array(k % 100_000)})

    pairs = distinct_rows(
        ds.map_batches(uw, batch_format="pyarrow"),
        ["user_id", "week"]).materialize()
    cohorts = pairs.groupby("user_id") \
        .aggregate(Min("week", alias_name="cohort_week"))
    j = hash_join(pairs, cohorts, on="user_id")

    def fold(t: pa.Table) -> pa.Table:
        cw = t.column("cohort_week").to_numpy().astype(np.int64)
        k = t.column("week").to_numpy().astype(np.int64) - cw
        keep = k <= max_k
        key = cw[keep] * 1_000 + k[keep]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cohort_week": pa.array(uk // 1_000),
                         "k": pa.array(uk % 1_000),
                         "n_users": pa.array(cnt.astype(np.int64))})

    agg = (j.map_batches(fold, batch_format="pyarrow")
           .groupby(["cohort_week", "k"])
           .aggregate(Sum("n_users", alias_name="n_users")).to_pandas()
           .astype({"cohort_week": np.int64, "k": np.int64,
                    "n_users": np.int64})
           .sort_values(["cohort_week", "k"], ignore_index=True))
    size = agg[agg["k"] == 0].set_index("cohort_week")["n_users"]
    base = size.reindex(agg["cohort_week"]).to_numpy(np.float64)
    agg["rate"] = half_up(agg["n_users"].to_numpy() / base, 6)
    return agg


def embeddings_outliers(sf_dir: str, k: int = 8, n_iter: int = 4,
                        top: int = 20) -> pd.DataFrame:
    """Centroid-distance outlier report (the SemDeDup-family health
    check: vectors far from every cluster center are noise / OOD
    candidates): run the mirrored k-means, rank by ROUNDED distance to
    the assigned centroid (DESC, vec_id tie-break), keep the top 20.
    Reuses the exact quantized-iteration chain, so the SQL twin ranks
    identical distances."""
    from ..stages.cluster import kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assign_ds, _ = kmeans(ds, k=k, n_iter=n_iter)
    out = assign_ds.to_pandas()
    out["dist"] = out["dist"].round(6)
    out = out.sort_values(["dist", "vec_id"],
                          ascending=[False, True]).head(top)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype({"vec_id": np.int64, "cluster": np.int64}) \
        .reset_index(drop=True)


def docs_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-doc zlib compression ratio — the classic low-information /
    boilerplate quality signal (highly repetitive text compresses far
    below prose).  Stateless vectorized-per-doc map_batches; rows-only
    (no SQL zlib) with the scalar re-compress oracle pinned in
    tests/test_misc_ops.py.  Level pinned at 6: the DEFLATE bitstream
    for a given (input, level, zlib build) is deterministic."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        from ..context import half_up

        txt = t.column("text").to_pylist()
        raw = np.array([len(x.encode("utf-8")) for x in txt], np.int64)
        comp = np.array(
            [len(zlib.compress(x.encode("utf-8"), 6)) for x in txt],
            np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_bytes": pa.array(raw),
            "n_compressed": pa.array(comp),
            "ratio": pa.array(half_up(comp / np.maximum(raw, 1), 6)),
            "low_info": pa.array(
                (comp / np.maximum(raw, 1) < 0.35).astype(np.int64))})

    out = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in
                       ("doc_id", "n_bytes", "n_compressed", "low_info")}) \
        .sort_values("doc_id", ignore_index=True)


def embeddings_mips(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Brute-force MAX-INNER-PRODUCT top-k vs the embedding of
    vec_id=1 — the retrieval scoring cosine misses (un-normalized
    relevance, the recommender-model protocol).  Per-batch partial
    top-k on the float64 dot against the broadcast query (lossless —
    scores are global), driver merge; ranked on the ROUNDED score with
    vec_id tie-break (the docs_tfidf rule)."""
    import pyarrow.parquet as pq

    from ..context import Broadcast
    from ..stages.ann import list_col_matrix

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    row = int(np.nonzero(t.column("vec_id").to_numpy() == 1)[0][0])
    q = np.asarray(t.column("embedding").to_pylist()[row], np.float64)
    bc = Broadcast(q)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        M = list_col_matrix(b.column("embedding"))
        ip = M @ bc.get()
        ids = b.column("vec_id").to_numpy().astype(np.int64)
        ipr = np.round(ip, 5)
        order = np.lexsort((ids, -ipr))[:k]
        return pa.table({"vec_id": pa.array(ids[order]),
                         "ip": pa.array(ipr[order])})

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    p = p.sort_values(["ip", "vec_id"],
                      ascending=[False, True]).head(k)
    return p.astype({"vec_id": np.int64}) \
        .sort_values("vec_id", ignore_index=True)


def events_ewma(sf_dir: str, window: int = 16) -> pd.DataFrame:
    """Per-type hourly EWMA with half-life one hour over a bounded
    16-hour window: ewma(t) = sum_{d=0..15} c(t-d) * 2^-(d+1) — the
    streaming anomaly baseline next to events_hourly_anomaly's global
    z-scores.  With alpha = 1/2 every term is an exact dyadic, so the
    windowed sum is EXACT in float64 regardless of addition order —
    bitwise across engines by construction.  Shape: per-batch
    (type, hour) count combiner -> one groupby; each hourly count
    re-keys to the <=16 anchor hours it contributes to (the
    rolling_active trick — no per-window rescan)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def bucket(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        hour = ts // 3_600_000_000
        et = b.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(str)
        df = pd.DataFrame({"event_type": et, "hour": hour})
        g = df.groupby(["event_type", "hour"], as_index=False) \
            .size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hourly = (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby(["event_type", "hour"])
              .aggregate(Sum("c", alias_name="c")))

    # re-key: hour h contributes c*2^-(d+1) to anchors h..h+15 — the
    # anchor set is restricted to OBSERVED (type, hour) rows afterwards
    def rekey(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(object)
        h = t.column("hour").to_numpy().astype(np.int64)
        c = t.column("c").to_numpy().astype(np.int64)
        d = np.arange(window, dtype=np.int64)
        anchor = (h[:, None] + d[None, :]).ravel()
        w = (c[:, None] * (0.5 ** (d[None, :] + 1).astype(np.float64)))
        return pa.table({
            "event_type": pa.array(np.repeat(et, window)),
            "hour": pa.array(anchor),
            "w": pa.array(w.ravel())})

    contrib = (hourly.map_batches(rekey, batch_format="pyarrow")
               .groupby(["event_type", "hour"])
               .aggregate(Sum("w", alias_name="ewma")).to_pandas())
    obs = hourly.to_pandas().rename(columns={"c": "n"})
    out = obs.merge(contrib[["event_type", "hour", "ewma"]],
                    on=["event_type", "hour"], how="left")
    out["ewma"] = out["ewma"].fillna(0.0)
    return out.astype({"hour": np.int64, "n": np.int64}) \
        .sort_values(["event_type", "hour"], ignore_index=True)


def tpch_q13(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 analogue (customer order-count distribution): how many
    customers placed exactly k orders, including k = 0.  Per-batch
    custkey count combiner -> one custkey groupby -> count-of-counts
    histogram (the events_user_gini shape — the customer table never
    lands on the driver; zero-order customers come from a COUNT of the
    customer table minus the distinct order-placing customers)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def part(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        u, c = np.unique(ck, return_counts=True)
        return pa.table({"c_custkey": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    per = (orders.map_batches(part, batch_format="pyarrow")
           .groupby("c_custkey").aggregate(Sum("n", alias_name="n")))

    def hist(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"c_count": pa.array(u),
                         "custdist": pa.array(c.astype(np.int64))})

    out = (per.map_batches(hist, batch_format="pyarrow")
           .groupby("c_count")
           .aggregate(Sum("custdist", alias_name="custdist")).to_pandas())
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with = int(out["custdist"].sum())
    if n_cust > n_with:
        out = pd.concat([out, pd.DataFrame(
            {"c_count": [0], "custdist": [n_cust - n_with]})],
            ignore_index=True)
    return out.astype({"c_count": np.int64, "custdist": np.int64}) \
        .sort_values(["custdist", "c_count"],
                     ascending=[False, False], ignore_index=True)


def tpch_q18(sf_dir: str, qty_threshold: int = 250) -> pd.DataFrame:
    """TPC-H Q18 analogue (large-volume customers): orders whose total
    lineitem quantity exceeds the threshold, decorated with customer
    name and ranked by (total quantity DESC, orderkey ASC), top 20.
    Per-order quantity pre-sums inside the batch -> one orderkey
    groupby -> threshold filter -> bucketed hash_join onto orders ->
    broadcast customer-name gather.  Quantities are integers in the
    generator, so ranking is exact."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def lpart(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        q = t.column("l_quantity").to_numpy()
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(u),
            "qty": pa.array(np.bincount(inv, weights=q,
                                        minlength=len(u)))})

    per = (li.map_batches(lpart, batch_format="pyarrow")
           .groupby("l_orderkey").aggregate(Sum("qty", alias_name="qty"))
           .map_batches(lambda t: t.filter(
               pa.compute.greater(t.column("qty"),
                                  pa.scalar(float(qty_threshold)))),
               batch_format="pyarrow"))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
            "o_totalprice": t.column("o_totalprice"),
            "o_date_us": t.column("o_orderdate").cast(pa.int64())}),
            batch_format="pyarrow")
    j = hash_join(per, orders, on="l_orderkey").to_pandas()
    j["qty"] = np.round(j["qty"].to_numpy(), 0).astype(np.int64)
    j = j.sort_values(["qty", "l_orderkey"],
                      ascending=[False, True]).head(20)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas() \
        .sort_values("c_custkey")
    pos = np.searchsorted(cust["c_custkey"].to_numpy(np.int64),
                          j["o_custkey"].to_numpy(np.int64))
    out = pd.DataFrame({
        "c_name": cust["c_name"].to_numpy(dtype=object)[pos],
        "c_custkey": j["o_custkey"].to_numpy(np.int64),
        "o_orderkey": j["l_orderkey"].to_numpy(np.int64),
        "o_totalprice": np.round(j["o_totalprice"].to_numpy(), 2),
        "total_qty": j["qty"].to_numpy(np.int64)})
    return out.reset_index(drop=True)


def events_cuped(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013):
    the experiment window is the second half of the time range; each
    user's PRE-period spend is the control covariate.  theta =
    cov(pre, post)/var(pre) pooled over users; adjusted arm mean =
    mean_post_arm - theta * (mean_pre_arm - mean_pre_global) — an
    identity on integer sums, so no per-user float pass exists.

    Exactness: values are 2-dp currency -> integer cents (the
    events_value_stats rule); every moment is an int64 sum; theta and
    the adjusted means are ONE fixed-order float64 chain written
    identically in both engines, rounded 6 dp."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])
    mm = (ds.map_batches(lambda t: pa.table({
        "mn": pa.array([int(t.column("ts").cast(pa.int64())
                            .to_numpy().min())]),
        "mx": pa.array([int(t.column("ts").cast(pa.int64())
                            .to_numpy().max())])}),
        batch_format="pyarrow")
        .aggregate(Min("mn"), Max("mx")))
    mid = (mm["min(mn)"] + mm["max(mx)"]) // 2

    def upart(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        c = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        pre = np.where(ts < mid, c, 0)
        post = np.where(ts >= mid, c, 0)
        u, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": pa.array(u),
            "pre": pa.array(np.bincount(inv, weights=pre,
                                        minlength=len(u))
                            .astype(np.int64)),
            "post": pa.array(np.bincount(inv, weights=post,
                                         minlength=len(u))
                             .astype(np.int64))})

    users = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Sum("pre", alias_name="pre"),
                        Sum("post", alias_name="post")))

    def moments(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        x = t.column("pre").to_numpy().astype(np.int64)
        y = t.column("post").to_numpy().astype(np.int64)
        arm = (uid % 2).astype(np.int64)
        rows = []
        _I64 = (1 << 63) - 1
        for a in (0, 1):
            m = arm == a
            # products via arbitrary-precision Python ints: int64 numpy
            # products WRAP silently on a user whose pre-period cents
            # square past 2^63 (~3e9 cents), whereas the SQL mirror's
            # BIGINT sum(pre*pre) RAISES — raise here too so the two
            # engines fail loudly together instead of diverging.
            xo = x[m].astype(object)
            yo = y[m].astype(object)
            sxx = int((xo * xo).sum()) if m.any() else 0
            sxy = int((xo * yo).sum()) if m.any() else 0
            if sxx > _I64 or abs(sxy) > _I64:
                raise OverflowError(
                    "events_cuped: per-arm moment exceeds int64 "
                    "(matches the SQL mirror's BIGINT overflow raise); "
                    "re-scale the covariate before CUPED")
            rows.append((a, int(m.sum()), int(x[m].sum()),
                         int(y[m].sum()), sxx, sxy))
        return pa.table({
            "arm": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "sx": pa.array([r[2] for r in rows], pa.int64()),
            "sy": pa.array([r[3] for r in rows], pa.int64()),
            "sxx": pa.array([r[4] for r in rows], pa.int64()),
            "sxy": pa.array([r[5] for r in rows], pa.int64())})

    g = (users.map_batches(moments, batch_format="pyarrow")
         .groupby("arm")
         .aggregate(Sum("n", alias_name="n"),
                    Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("sxy", alias_name="sxy"))
         .to_pandas().sort_values("arm", ignore_index=True))
    # cross-arm totals in pure Python ints (pandas int64 .sum() would
    # wrap at the same boundary the per-batch kernel now guards)
    n = sum(int(v) for v in g["n"])
    sx, sy = sum(int(v) for v in g["sx"]), sum(int(v) for v in g["sy"])
    sxx = sum(int(v) for v in g["sxx"])
    sxy = sum(int(v) for v in g["sxy"])
    denom = float(n * sxx - sx * sx)
    theta = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    mean_pre_g = sx / n
    na = g["n"].to_numpy(np.int64).astype(np.float64)
    mean_post = g["sy"].to_numpy(np.int64) / na / 100.0
    mean_pre = g["sx"].to_numpy(np.int64) / na
    mean_adj = (g["sy"].to_numpy(np.int64) / na
                - theta * (mean_pre - mean_pre_g)) / 100.0
    return pd.DataFrame({
        "arm": g["arm"].astype(np.int64),
        "n_users": g["n"].astype(np.int64),
        "sum_pre_cents": g["sx"].astype(np.int64),
        "sum_post_cents": g["sy"].astype(np.int64),
        "mean_post": half_up(mean_post, 6),
        "mean_adj": half_up(mean_adj, 6),
        "theta": half_up([theta, theta], 6)})


def tpch_q19(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 analogue (discounted revenue for three brand/size/
    quantity predicate combos, OR-ed): revenue and matching lineitem
    count per combo plus the OR total.  The part (brand, size) map is
    a dense broadcast pair of arrays gathered inside the batch kernel
    (tpch_q14 convention) — the combos are evaluated VECTORIZED in one
    pass, no join, one tiny groupby over 4 partial rows."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]) \
        .to_pandas()
    pk = part["p_partkey"].to_numpy(np.int64)
    n_pk = int(pk.max()) + 1
    brand = np.zeros(n_pk, dtype=np.int64)
    codes, names = pd.factorize(part["p_brand"], sort=True)
    brand[pk] = codes
    b_small = int(np.where(names == "Brand#13")[0][0])
    b_mid = int(np.where(names == "Brand#22")[0][0])
    size = np.zeros(n_pk, dtype=np.int64)
    size[pk] = part["p_size"].to_numpy(np.int64)
    bc = Broadcast((brand, size, b_small, b_mid))

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        brand_, size_, bs, bm = bc.get()
        lp = t.column("l_partkey").to_numpy().astype(np.int64)
        qty = t.column("l_quantity").to_numpy()
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))
        b = brand_[lp]
        s = size_[lp]
        c1 = (b == bs) & (s <= 15) & (qty >= 1) & (qty <= 20)
        c2 = (b == bm) & (s <= 30) & (qty >= 5) & (qty <= 35)
        c3 = (s >= 40) & (qty >= 20)
        combos = [c1, c2, c3, c1 | c2 | c3]
        return pa.table({
            "combo": pa.array(np.arange(4, dtype=np.int64)),
            "n": pa.array([int(c.sum()) for c in combos],
                          pa.int64()),
            "revenue": pa.array([float(rev[c].sum()) for c in combos],
                                pa.float64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("combo")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("revenue", alias_name="revenue")).to_pandas())
    out["revenue"] = np.round(out["revenue"].to_numpy(), 2)
    return out.astype({"combo": np.int64, "n": np.int64}) \
        .sort_values("combo", ignore_index=True)


def docs_burstiness(sf_dir: str, min_df: int = 20,
                    top: int = 50) -> pd.DataFrame:
    """Word burstiness (corpus-linguistics dispersion): for words in
    ≥ 20 docs, burstiness = var/mean of the per-document count over ALL
    documents — bursty words concentrate (names, topics), function
    words spread.  Top-50 by (round-6 burstiness DESC, word ASC).

    Per-batch (word, Σc, Σc², df) partials → ONE word-domain groupby;
    the var/mean chain is fixed-order over exact integer sums in both
    engines."""
    from ray.data.aggregate import Sum

    from ..context import half_up

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.text import _split_flat

        # split-on-complement + drop empties == regexp_extract_all of
        # [0-9a-z_]+ — one Arrow kernel, no per-doc loop
        flat, doc_idx, _ = _split_flat(
            pc.utf8_lower(t.column("text").combine_chunks()),
            "[^0-9a-z_]+")
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        codes, uniq = pd.factorize(flat)
        nw = len(uniq)
        key = doc_idx * nw + codes
        uk, c = np.unique(key, return_counts=True)
        wcode = (uk % nw).astype(np.int64)
        return pa.table({
            "word": pa.array(np.asarray(uniq, dtype=object),
                             pa.string()),
            "sx": pa.array(np.bincount(wcode, weights=c, minlength=nw)
                           .astype(np.int64)),
            "sxx": pa.array(np.bincount(wcode, weights=c * c,
                                        minlength=nw).astype(np.int64)),
            "df": pa.array(np.bincount(wcode, minlength=nw)
                           .astype(np.int64))})

    g = (ds.map_batches(part, batch_format="pyarrow")
         .groupby("word")
         .aggregate(Sum("sx", alias_name="sx"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("df", alias_name="df")).to_pandas())
    g = g[g["df"] >= min_df]
    n = float(n_docs)
    sx = g["sx"].to_numpy(np.int64).astype(np.float64)
    sxx = g["sxx"].to_numpy(np.int64).astype(np.float64)
    mean = sx / n
    b = half_up((sxx / n - (sx / n) * (sx / n)) / (sx / n), 6)
    out = pd.DataFrame({"word": g["word"], "df": g["df"].astype(np.int64),
                        "total": g["sx"].astype(np.int64),
                        "burstiness": b})
    out = out.sort_values(["burstiness", "word"],
                          ascending=[False, True]).head(top)
    return out.reset_index(drop=True)


def events_bot_score(sf_dir: str, min_events: int = 5,
                     top: int = 20) -> pd.DataFrame:
    """Inter-event regularity bot signal: a user whose gaps between
    consecutive events are suspiciously uniform (squared coefficient of
    variation cv2 = var/mean² near 0) is automation, not a human.  The
    traffic-quality guardrail every web-scale ingest runs before
    counting 'users'.

    Per-user gap moments (n, Σg, Σg²) come from per-batch partials over
    user-hash partitions (each partition sorts its own users' events —
    the sessionizer shape); gaps are integer µs so every moment is an
    exact int64 sum; cv2 is one fixed-order float chain rounded 6 dp.
    Output: the 20 most-regular users with ≥ 5 events, ranked
    (cv2 ASC, user_id ASC)."""
    from ray.data.aggregate import Sum

    from ..context import half_up

    n_parts = 64
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "__part", pa.array((uid % n_parts).astype(np.int32)))

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": np.empty(0, np.int64),
                                 "n_gaps": np.empty(0, np.int64),
                                 "sg": np.empty(0, np.int64),
                                 "sgg": np.empty(0, np.int64)})
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        same = uid[1:] == uid[:-1]
        # whole SECONDS: µs gaps squared overflow int64 (and exceed the
        # 2^53 float-exact range) — second-quantized moments stay exact
        # in both engines
        gp = ((ts[1:] - ts[:-1]) // 1_000_000)[same]
        gu = uid[1:][same]
        u, inv = np.unique(gu, return_inverse=True)
        return pd.DataFrame({
            "user_id": u,
            "n_gaps": np.bincount(inv, minlength=len(u))
            .astype(np.int64),
            "sg": np.bincount(inv, weights=gp, minlength=len(u))
            .astype(np.int64),
            "sgg": np.bincount(inv, weights=gp.astype(np.float64) * gp,
                               minlength=len(u)).astype(np.int64)})

    per = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("__part").map_groups(gaps, batch_format="pandas")
           .groupby("user_id")
           .aggregate(Sum("n_gaps", alias_name="n_gaps"),
                      Sum("sg", alias_name="sg"),
                      Sum("sgg", alias_name="sgg")).to_pandas())
    per = per[per["n_gaps"] >= min_events - 1]
    n = per["n_gaps"].to_numpy(np.int64).astype(np.float64)
    sg = per["sg"].to_numpy(np.int64).astype(np.float64)
    sgg = per["sgg"].to_numpy(np.int64).astype(np.float64)
    mean = sg / n
    var = sgg / n - mean * mean
    per["cv2"] = half_up(var / (mean * mean), 6)
    out = per.sort_values(["cv2", "user_id"]).head(top)
    return out[["user_id", "n_gaps", "cv2"]] \
        .astype({"user_id": np.int64, "n_gaps": np.int64}) \
        .reset_index(drop=True)


_WM_SEED = 421


def _wm_sequence(n: int = 96) -> list[str]:
    """Deterministic watermark-POSITIVE token run: starting from 'the',
    each next token is the first of a fixed candidate list whose bigram
    hash is green — every internal pair of the run scores green, so
    appending it pushes a doc's z past any reasonable threshold.
    Computed once in Python and baked as a literal into BOTH engines
    (the redact_pii augmentation convention)."""
    from ..stages.dedup import word_fp
    from ..sources.pages import mix64

    cands = [f"wm{chr(c)}" for c in range(97, 123)]
    seq = ["the"]
    for _ in range(n - 1):
        prev = word_fp(seq[-1])
        nxt = next(w for w in cands
                   if w != seq[-1]
                   and mix64(_WM_SEED, prev, word_fp(w)) % 2 == 1)
        seq.append(nxt)
    return seq


WM_SUFFIX = " " + " ".join(_wm_sequence())


def docs_watermark(sf_dir: str) -> pd.DataFrame:
    """Kirchenbauer-style greenlist watermark DETECTION (ICML 2023):
    token i is 'green' iff mix64(421, fp(w_{i-1}), fp(w_i)) is odd
    (γ = 1/2 greenlist keyed by the previous token); a doc's
    z = (2·greens − pairs)/sqrt(pairs) spikes when text was generated
    under the watermark.  Every 7th doc gets the deterministic
    watermark-positive suffix appended (both engines — the redact_pii
    augmentation convention) so flagged rows exist.

    Vectorized: one Arrow split kernel, per-unique-word rolling fp,
    mix64_vec over consecutive pairs, per-doc bincounts; z is one
    fixed-order integer→double chain.  Output: (doc_id, n_pairs,
    n_green, z round-6, flagged pre-rounding z > 4)."""
    import pyarrow.compute as pc

    from ..context import half_up
    from ..sources.pages import mix64_vec
    from ..stages.dedup import word_fp
    from ..stages.text import _split_flat

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy().astype(np.int64)
        txt = t.column("text").combine_chunks()
        aug = pa.array([
            x + WM_SUFFIX if d % 7 == 0 else x
            for x, d in zip(txt.to_pylist(), did.tolist())],
            pa.string())
        flat, doc_idx, _ = _split_flat(pc.utf8_lower(aug),
                                       "[^0-9a-z_]+")
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        codes, uniq = pd.factorize(flat)
        ufp = np.fromiter((word_fp(w) for w in uniq),
                          dtype=np.int64, count=len(uniq))
        fp = ufp[codes]
        same = doc_idx[1:] == doc_idx[:-1]
        green = (mix64_vec(_WM_SEED, fp[:-1], fp[1:])
                 % np.uint64(2)).astype(np.int64)
        dd = doc_idx[1:][same]
        n = np.bincount(dd, minlength=len(did)).astype(np.int64)
        g = np.bincount(dd, weights=green[same],
                        minlength=len(did)).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(n > 0,
                         (2.0 * g - n) / np.sqrt(n.astype(np.float64)),
                         0.0)
        return pa.table({
            "doc_id": pa.array(did),
            "n_pairs": pa.array(n),
            "n_green": pa.array(g),
            "z": pa.array(half_up(z, 6)),
            "flagged": pa.array((z > 4.0).astype(np.int64))})

    out = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return out.astype({c: np.int64 for c in
                       ("doc_id", "n_pairs", "n_green", "flagged")}) \
        .sort_values("doc_id", ignore_index=True)


def tpch_q22(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 analogue (global sales opportunity): customers with
    above-average positive account balance and NO orders, grouped by
    'country code' = custkey % 10.  The no-orders test is a LEFT join
    with hit flag (functions/joins.py:left_join_fill) against the
    distinct order-placing custkeys — the anti-join shape, no
    driver-side set.  avg comes from exact integer cents."""
    from ray.data.aggregate import Sum

    from ..functions.joins import left_join_fill

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t.column("c_acctbal").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "bal_c": pa.array(c)})

    cds = cust.map_batches(cents, batch_format="pyarrow").materialize()
    pos = cds.map_batches(
        lambda t: pa.table({
            "n": pa.array([int((t.column("bal_c").to_numpy() > 0)
                               .sum())]),
            "s": pa.array([int(t.column("bal_c").to_numpy()
                               [t.column("bal_c").to_numpy() > 0]
                               .sum())])}),
        batch_format="pyarrow") \
        .aggregate(Sum("n"), Sum("s"))
    avg_c = pos["sum(s)"] / pos["sum(n)"]

    ordk = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pa.array(np.unique(
            t.column("o_custkey").to_numpy().astype(np.int64)))}),
        batch_format="pyarrow")
    from ..stages.dedup import distinct_rows

    ordk = distinct_rows(ordk, ["c_custkey"]).map_batches(
        lambda t: t.append_column("has_o", pa.array(
            np.ones(t.num_rows, np.int8))), batch_format="pyarrow")
    j = left_join_fill(cds, ordk, on="c_custkey", fill={"has_o": 0})

    def fold(t: pa.Table) -> pa.Table:
        bal = t.column("bal_c").to_numpy().astype(np.int64)
        has = t.column("has_o").to_numpy().astype(np.int64)
        ck = t.column("c_custkey").to_numpy().astype(np.int64)
        keep = (bal > avg_c) & (has == 0)
        code = ck[keep] % 10
        return pa.table({
            "cntrycode": pa.array(np.arange(10, dtype=np.int64)),
            "numcust": pa.array(np.bincount(code, minlength=10)
                                .astype(np.int64)),
            "totacctbal_c": pa.array(np.bincount(
                code, weights=bal[keep], minlength=10)
                .astype(np.int64))})

    out = (j.map_batches(fold, batch_format="pyarrow")
           .groupby("cntrycode")
           .aggregate(Sum("numcust", alias_name="numcust"),
                      Sum("totacctbal_c", alias_name="totacctbal_c"))
           .to_pandas())
    out = out[out["numcust"] > 0]
    out["totacctbal"] = np.round(
        out["totacctbal_c"].to_numpy(np.int64) / 100.0, 2)
    return out[["cntrycode", "numcust", "totacctbal"]] \
        .astype({"cntrycode": np.int64, "numcust": np.int64}) \
        .sort_values("cntrycode", ignore_index=True)


def events_hour_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day seasonality per event type: the 24-bin activity
    profile plus a chi-square uniformity statistic (a flat profile is
    bot/synthetic traffic; humans have day cycles — the aggregate
    sibling of events_bot_score's per-user regularity).  Per-batch
    (type, hour-of-day) count combiner → one tiny groupby; chi2 =
    sum((o - n/24)^2 / (n/24)) as one fixed-order chain over exact
    integer counts, rounded 6 dp."""
    from ray.data.aggregate import Sum

    from ..context import half_up

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        hod = (ts // 3_600_000_000) % 24
        et = t.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(str)
        codes, uniq = pd.factorize(et)
        key = codes.astype(np.int64) * 24 + hod
        uk, c = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array(
                np.asarray(uniq, dtype=object)[uk // 24], pa.string()),
            "hod": pa.array(uk % 24),
            "n": pa.array(c.astype(np.int64))})

    g = (ds.map_batches(part, batch_format="pyarrow")
         .groupby(["event_type", "hod"])
         .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for et, gg in g.groupby("event_type", sort=True):
        c = np.zeros(24, np.int64)
        c[gg["hod"].to_numpy(np.int64)] = gg["n"].to_numpy(np.int64)
        n = int(c.sum())
        e = n / 24.0
        chi2 = float(half_up(((c - e) * (c - e) / e).sum(), 6))
        for h in range(24):
            rows.append((et, h, int(c[h]), chi2))
    out = pd.DataFrame(rows, columns=["event_type", "hod", "n", "chi2"])
    return out.astype({"hod": np.int64, "n": np.int64}) \
        .sort_values(["event_type", "hod"], ignore_index=True)


def docs_dp_release(sf_dir: str, eps: float = 1.0,
                    seed: int = 1303) -> pd.DataFrame:
    """Differentially-private per-source doc counts (discrete Laplace,
    eps=1): the privacy-release step a corpus-statistics dashboard
    runs before publishing.  Noise = G1 - G2 with G_i =
    floor(ln(u_i)/ln(e^-eps)) geometric draws — and the u_i come from
    the SEEDED mix64 chain over the source's rolling fp, so the
    'noise' is a pure function of (seed, source): reproducible
    releases, exactly mirrorable (both engines call libm ln on
    identical doubles).  n_true kept alongside for the audit."""
    from ray.data.aggregate import Sum

    from ..sources.pages import mix64
    from ..stages.dedup import word_fp

    ds = _read(sf_dir, "documents", ["source"])

    def part(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False) \
            .astype(str)
        codes, uniq = pd.factorize(src)
        return pa.table({
            "source": pa.array(np.asarray(uniq, dtype=object),
                               pa.string()),
            "n": pa.array(np.bincount(codes, minlength=len(uniq))
                          .astype(np.int64))})

    g = (ds.map_batches(part, batch_format="pyarrow")
         .groupby("source").aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    p = float(np.exp(-eps))
    lnp = np.log(p)
    rows = []
    for src, n in zip(g["source"], g["n"].astype(int)):
        fp = word_fp(src)
        u1 = mix64(seed, 1, fp) / float(1 << 64)
        u2 = mix64(seed, 2, fp) / float(1 << 64)
        g1 = int(np.floor(np.log(u1) / lnp))
        g2 = int(np.floor(np.log(u2) / lnp))
        rows.append((src, int(n), int(n) + g1 - g2))
    out = pd.DataFrame(rows, columns=["source", "n_true", "n_noisy"])
    return out.astype({"n_true": np.int64, "n_noisy": np.int64}) \
        .sort_values("source", ignore_index=True)


def embeddings_pq_recall(sf_dir: str, qids=(0, 100, 200),
                         k_top: int = 10) -> pd.DataFrame:
    """Recall@10 of PQ ADC ranking vs exact brute-force L2 for three
    query vectors — the accuracy half of the IVF-PQ trade (the ADC
    ranking exists as embeddings_pq_adc; this audits what the
    quantization costs, the same protocol as embeddings_ann_recall for
    the hash-IVF path).  One PQ fit, per-query ADC + exact-L2 top-10
    (both rank on ROUNDED distance with vec_id tie-break), recall =
    overlap/10."""
    import pyarrow.parquet as pq

    from ..context import Broadcast, half_up
    from ..stages.cluster import _pq_fit, adc_rank

    t = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids_all = t.column("vec_id").to_numpy()
    qvecs = {}
    for qid in qids:
        row = int(np.nonzero(ids_all == qid)[0][0])
        qvecs[qid] = np.asarray(t.column("embedding").to_pylist()[row],
                                np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    codes, cents, d = _pq_fit(ds, m=2, k=4, n_iter=2, seed=628,
                              id_col="vec_id", vec_col="embedding")
    codes = codes.materialize()
    emb = ds.materialize()

    rows = []
    for qid in qids:
        q = qvecs[qid]
        adc_ids = set(adc_rank(codes, cents, q, d, m=2, k_top=k_top)
                      ["vec_id"].tolist())
        bc = Broadcast(q)

        def bpart(b: pa.Table) -> pa.Table:
            from ..stages.ann import list_col_matrix

            M = list_col_matrix(b.column("embedding"))
            dist = np.round(np.sqrt(((M - bc.get()) ** 2).sum(axis=1)),
                            6)
            vid = b.column("vec_id").to_numpy().astype(np.int64)
            order = np.lexsort((vid, dist))[:k_top]
            return pa.table({"vec_id": pa.array(vid[order]),
                             "d": pa.array(dist[order])})

        bp = emb.map_batches(bpart, batch_format="pyarrow").to_pandas()
        brute_ids = set(bp.sort_values(["d", "vec_id"]).head(k_top)
                        ["vec_id"].tolist())
        n_common = len(adc_ids & brute_ids)
        rows.append((int(qid), n_common,
                     float(half_up(n_common / k_top, 6))))
    out = pd.DataFrame(rows, columns=["query_id", "n_common", "recall"])
    return out.astype({"query_id": np.int64, "n_common": np.int64}) \
        .sort_values("query_id", ignore_index=True)


def events_markov_stationary(sf_dir: str, n_iter: int = 20) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain (where
    the user population spends its time at equilibrium — the summary
    scalar events_markov_transitions' full table feeds): 20 quantized
    power iterations x <- round9(x P) over the round-9 transition
    matrix, then one round-6 normalization.  The per-iteration rounding
    is the kg_pagerank convention — it quantizes away summation-order
    ulps so the unrolled SQL twin lands on identical vectors."""
    from ..context import half_up

    tr = events_markov_transitions(sf_dir)
    types = sorted(set(tr["from_type"]) | set(tr["to_type"]))
    idx = {t: i for i, t in enumerate(types)}
    K = len(types)
    P = np.zeros((K, K))
    P[tr["from_type"].map(idx), tr["to_type"].map(idx)] = \
        np.round(tr["prob"].to_numpy(), 9)
    x = np.full(K, np.round(1.0 / K, 9))
    for _ in range(n_iter):
        x = np.round(x @ P, 9)
    s = x.sum()
    out = pd.DataFrame({
        "event_type": np.asarray(types, dtype=object),
        "stationary": half_up(x / s, 6)})
    return out.sort_values("event_type", ignore_index=True)


def docs_hapax(sf_dir: str) -> pd.DataFrame:
    """Hapax legomena profile per source: vocabulary size, hapax count
    (words occurring exactly once within the source) and the hapax
    ratio — the lexical-richness scalar heaps_law's growth curve
    implies.  Per-batch (source, word) count partials → one groupby →
    per-source integer fold; ratio on the shared half-up rule."""
    from ray.data.aggregate import Sum

    from ..context import half_up

    ds = _read(sf_dir, "documents", ["text", "source"])

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.text import _split_flat

        src = t.column("source").to_numpy(zero_copy_only=False) \
            .astype(str)
        flat, doc_idx, _ = _split_flat(
            pc.utf8_lower(t.column("text").combine_chunks()),
            "[^0-9a-z_]+")
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        ws = src[doc_idx]
        df = pd.DataFrame({"source": ws, "word": flat})
        g = df.groupby(["source", "word"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (ds.map_batches(part, batch_format="pyarrow")
         .groupby(["source", "word"])
         .aggregate(Sum("c", alias_name="c")).to_pandas())
    rows = []
    for src, gg in g.groupby("source", sort=True):
        c = gg["c"].to_numpy(np.int64)
        v = len(c)
        hap = int((c == 1).sum())
        rows.append((src, v, hap, float(half_up(hap / v, 6))))
    out = pd.DataFrame(rows, columns=["source", "vocab_size",
                                      "n_hapax", "hapax_ratio"])
    return out.astype({"vocab_size": np.int64, "n_hapax": np.int64}) \
        .sort_values("source", ignore_index=True)


def embeddings_drift(sf_dir: str, k: int = 8,
                     n_iter: int = 4) -> pd.DataFrame:
    """Embedding-distribution drift monitor (population-stability
    check): fit k-means on the EVEN-id half (the 'reference window'),
    assign BOTH halves to those centroids, and compare per-cluster
    shares — chi2 = sum((n_odd - E_c)^2 / E_c) with E_c scaled from
    the even-half counts.  A shifted upstream encoder or corpus mix
    moves mass between clusters and spikes the statistic.

    Reuses the mirrored quantized k-means chain (fit on a filtered
    src); assignment is one broadcast-centroid pass; all counts are
    integers, the chi2 chain is fixed-order, rounded 6 dp."""
    import pyarrow.compute as pc

    from ..context import Broadcast, half_up
    from ..stages.ann import list_col_matrix
    from ..stages.cluster import assign_clusters, kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .materialize()
    even = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("vec_id").cast(pa.int64()), pa.scalar(1)),
            pa.scalar(0))),
        batch_format="pyarrow")
    _, C = kmeans(even, k=k, n_iter=n_iter)
    bc = Broadcast(C)

    def part(t: pa.Table) -> pa.Table:
        vid = t.column("vec_id").to_numpy().astype(np.int64)
        M = list_col_matrix(t.column("embedding"))
        a, _dist = assign_clusters(M, bc.get())
        odd = (vid & 1).astype(np.int64)
        key = a.astype(np.int64) * 2 + odd
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"cluster": pa.array(uk // 2),
                         "odd": pa.array(uk % 2),
                         "n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    g = (ds.map_batches(part, batch_format="pyarrow")
         .groupby(["cluster", "odd"])
         .aggregate(Sum("n", alias_name="n")).to_pandas())
    ne = np.zeros(k, np.int64)
    no = np.zeros(k, np.int64)
    for _, r in g.iterrows():
        (ne if r["odd"] == 0 else no)[int(r["cluster"])] = int(r["n"])
    scale = float(no.sum()) / float(ne.sum())
    E = ne.astype(np.float64) * scale
    safe = np.maximum(E, 1e-12)
    chi2 = float(half_up((((no - E) * (no - E)) / safe).sum(), 6))
    out = pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_even": ne, "n_odd": no,
        "expected_odd": half_up(E, 6),
        "chi2": np.full(k, chi2)})
    return out


def events_type_lift(sf_dir: str) -> pd.DataFrame:
    """Market-basket association over event types: for each unordered
    type pair, lift = P(user did both) / (P(a)·P(b)) — the unordered
    association view next to events_seq_pairs' A-before-B ordering and
    events_markov's chain.  Per-batch distinct (user, type) signature
    rows → one user-domain groupby → per-user type-set cross pairs
    (types are a tiny closed set, so pairs per user ≤ C(T,2)) → tiny
    pair groupby; lift is one fixed-order integer→double chain rounded
    6 dp (shared half-up rule)."""
    from ray.data.aggregate import Count, Sum

    from ..context import half_up
    from ..stages.graph import segment_cross_pairs

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def sig(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(str)
        df = pd.DataFrame({"user_id": uid, "event_type": et}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    ut = (ds.map_batches(sig, batch_format="pyarrow")
          .groupby(["user_id", "event_type"])
          .aggregate(Count(alias_name="c")))

    # sentinel key for the per-partition distinct-user count (the
    # candidate_pairs stats-row trick): every user lands in exactly one
    # %64 partition, so summing these rows through the SAME pair
    # groupby yields n_users with zero extra shuffle
    _USERS = "\x00__nusers__"

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"type_a": np.empty(0, object),
                              "type_b": np.empty(0, object),
                              "n_both": np.empty(0, np.int64)})
        if not len(g):
            return empty
        # vectorized segment cross-product over (user-sorted, type-
        # sorted) rows — the cooccur_pairs kernel, no per-user loop
        codes, uniq = pd.factorize(g["event_type"].astype(str),
                                   sort=True)
        uid = g["user_id"].to_numpy(np.int64)
        order = np.lexsort((codes, uid))
        u_s, c_s = uid[order], codes[order]
        lefts, rights = segment_cross_pairs(u_s)
        n_users_part = int(pd.unique(uid).size)
        sent = pd.DataFrame({"type_a": [_USERS], "type_b": [_USERS],
                             "n_both": np.array([n_users_part],
                                                np.int64)})
        if len(lefts) == 0:
            return sent
        df = pd.DataFrame({"ca": c_s[lefts], "cb": c_s[rights]})
        o = df.groupby(["ca", "cb"], as_index=False).size()
        out = pd.DataFrame({
            "type_a": uniq[o["ca"].to_numpy()],
            "type_b": uniq[o["cb"].to_numpy()],
            "n_both": o["size"].to_numpy(np.int64)})
        return pd.concat([out, sent], ignore_index=True)

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "__part", pa.array((uid % 64).astype(np.int32)))

    pair = (ut.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(pairs, batch_format="pandas")
            .groupby(["type_a", "type_b"])
            .aggregate(Sum("n_both", alias_name="n_both")).to_pandas())
    singles = (ut.map_batches(
        lambda t: pa.table({
            "event_type": t.column("event_type"),
            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
        .groupby("event_type").aggregate(Sum("n", alias_name="n"))
        .to_pandas().set_index("event_type")["n"])
    sent_mask = pair["type_a"] == _USERS
    n_users = int(pair.loc[sent_mask, "n_both"].sum())
    pair = pair.loc[~sent_mask].reset_index(drop=True)
    na = pair["type_a"].map(singles).to_numpy(np.int64)
    nb = pair["type_b"].map(singles).to_numpy(np.int64)
    nboth = pair["n_both"].to_numpy(np.int64)
    lift = (nboth.astype(np.float64) * n_users) \
        / (na.astype(np.float64) * nb.astype(np.float64))
    out = pd.DataFrame({
        "type_a": pair["type_a"], "type_b": pair["type_b"],
        "n_both": nboth, "n_a": na, "n_b": nb,
        "lift": half_up(lift, 6)})
    return out.astype({c: np.int64 for c in ("n_both", "n_a", "n_b")}) \
        .sort_values(["type_a", "type_b"], ignore_index=True)


def tpch_q15(sf_dir: str, year: int = 1996) -> pd.DataFrame:
    """TPC-H Q15 analogue (top supplier): revenue
    Σ extendedprice·(1−discount) per supplier over one ship year, then
    every supplier whose 6-dp-ROUNDED revenue equals the maximum (the
    rounded-rank rule — never compare raw float sums cross-engine).
    Plan: pruned read → stateless filter + per-suppkey pre-sum per
    batch → tiny supplier-domain groupby; the supplier decoration is a
    broadcast lookup (suppliers are O(100) rows at any scale)."""
    from ray.data.aggregate import Sum

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .to_pandas().sort_values("s_suppkey")
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        yr = 1970 + sd // 31_557_600_000_000
        keep = yr == year
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)[keep]
        ep = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        df = pd.DataFrame({"s_suppkey": sk, "rev": ep * (1.0 - disc)})
        g = df.groupby("s_suppkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey")
           .aggregate(Sum("rev", alias_name="total_revenue")).to_pandas())
    agg["total_revenue"] = np.round(agg["total_revenue"].to_numpy(), 6)
    top = agg[agg["total_revenue"] == agg["total_revenue"].max()].copy()
    sk = top["s_suppkey"].to_numpy(np.int64)
    pos = np.searchsorted(sup["s_suppkey"].to_numpy(np.int64), sk)
    top["s_name"] = sup["s_name"].to_numpy(dtype=object)[pos]
    return top[["s_suppkey", "s_name", "total_revenue"]] \
        .astype({"s_suppkey": np.int64}) \
        .sort_values("s_suppkey", ignore_index=True)


def tpch_q17(sf_dir: str, brand: str = "Brand#13") -> pd.DataFrame:
    """TPC-H Q17 analogue (small-quantity-order revenue): over one
    brand's parts, lineitems with quantity below 0.2 × that part's
    average quantity; report Σ extendedprice / 7.0.  Two passes over
    the pruned lineitem columns: (1) per-part (Σqty, n) partials → one
    tiny part-domain groupby → broadcast threshold map; (2) stateless
    filter + sum.  Quantities are integer-valued doubles, so Σqty and
    the average are EXACT and the 0.2·avg threshold is the identical
    IEEE chain in both engines — the comparison can't diverge.
    Output: avg_yearly (6-dp), n_small (the count passing the filter,
    an integer witness of the threshold agreement)."""
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bkeys = np.sort(part.loc[part["p_brand"] == brand, "p_partkey"]
                    .to_numpy(np.int64))
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def qpart(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        keep = np.isin(pk, bkeys)
        qty = t.column("l_quantity").to_numpy()[keep]
        df = pd.DataFrame({"p": pk[keep], "s": qty, "n": np.int64(1)})
        g = df.groupby("p", as_index=False).agg(s=("s", "sum"),
                                                n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (li.map_batches(qpart, batch_format="pyarrow")
             .groupby("p").aggregate(Sum("s", alias_name="s"),
                                     Sum("n", alias_name="n"))
             .to_pandas())
    pkeys = stats["p"].to_numpy(np.int64)
    order = np.argsort(pkeys)
    pkeys = pkeys[order]
    thr = (0.2 * (stats["s"].to_numpy()[order]
                  / stats["n"].to_numpy()[order]))

    def spart(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        keep = np.isin(pk, pkeys)
        pos = np.searchsorted(pkeys, pk[keep])
        qty = t.column("l_quantity").to_numpy()[keep]
        small = qty < thr[pos]
        ep = t.column("l_extendedprice").to_numpy()[keep][small]
        return pa.table({"ep": pa.array([float(ep.sum())]),
                         "n": pa.array([np.int64(small.sum())])})

    tot = (li.map_batches(spart, batch_format="pyarrow").to_pandas())
    return pd.DataFrame({
        "avg_yearly": [np.round(float(tot["ep"].sum()) / 7.0, 6)],
        "n_small": [np.int64(tot["n"].sum())]})


def tpch_q16(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 analogue (parts/supplier relationship): distinct
    supplier count per (p_brand, p_type, p_size) over the lineitem
    part-supplier pairs (the corpus has no partsupp table — lineitem
    IS the observed relationship), excluding Brand#13 and PROMO parts
    and keeping eight sizes.  Plan: per-batch distinct (partkey,
    suppkey) → distinct_rows (signature-pair shuffle only) → broadcast
    part-attribute decoration → integer count groupby.  All-integer
    output; ranked desc by count with full attribute tiebreaks."""
    from ..stages.dedup import distinct_rows

    sizes = np.array([9, 16, 22, 24, 29, 33, 47, 48], np.int64)
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .to_pandas().sort_values("p_partkey")
    pk_all = part["p_partkey"].to_numpy(np.int64)
    keep_part = ((part["p_brand"] != "Brand#13")
                 & (part["p_type"] != "PROMO")
                 & part["p_size"].isin(sizes)).to_numpy()

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    kept_keys = pk_all[keep_part]       # sorted (pk_all is sorted)

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": t.column("l_partkey").to_numpy()
            .astype(np.int64),
            "l_suppkey": t.column("l_suppkey").to_numpy()
            .astype(np.int64)}).drop_duplicates()
        # membership test, not positional lookup — a partkey outside
        # the part table must drop, not index out of bounds
        df = df[np.isin(df["l_partkey"].to_numpy(), kept_keys)]
        return pa.Table.from_pandas(df, preserve_index=False)

    uniq = distinct_rows(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"]).to_pandas()
    pos = np.searchsorted(pk_all, uniq["l_partkey"].to_numpy(np.int64))
    uniq["p_brand"] = part["p_brand"].to_numpy(dtype=object)[pos]
    uniq["p_type"] = part["p_type"].to_numpy(dtype=object)[pos]
    uniq["p_size"] = part["p_size"].to_numpy(np.int64)[pos]
    out = (uniq.groupby(["p_brand", "p_type", "p_size"], as_index=False)
           .agg(supplier_cnt=("l_suppkey", "nunique")))
    return out.astype({"p_size": np.int64,
                       "supplier_cnt": np.int64}) \
        .sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                     ascending=[False, True, True, True],
                     ignore_index=True)


def tpch_q11(sf_dir: str, region: str = "EUROPE",
             fraction: float = 0.001) -> pd.DataFrame:
    """TPC-H Q11 analogue (important parts): per-part shipped value
    Σ extendedprice·quantity over lineitems supplied by one REGION's
    suppliers, keeping parts whose value exceeds ``fraction`` of the
    region total.  The corpus has no partsupp, so observed lineitem
    volume replaces availqty·supplycost; the filter is regional
    because a single synthetic nation can have zero suppliers at
    small scale (sf0.001 has 10 suppliers over 25 nations).
    Supplier→region is a broadcast gather (O(100) rows); per-part
    partials shuffle only (partkey, sum) pairs.  The threshold
    compares ROUNDED per-part values against fraction × Σ(rounded
    values) — a fixed-order exact chain both engines reproduce (the
    kg_relation_entropy quantize-per-term convention)."""
    from ray.data.aggregate import Sum

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
               .astype(int))
    nkeys = set(nat.loc[nat["n_regionkey"].astype(int).isin(rkey),
                        "n_nationkey"].astype(int))
    skeys = np.sort(sup.loc[sup["s_nationkey"].astype(int)
                            .isin(nkeys), "s_suppkey"]
                    .to_numpy(np.int64))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"])

    def vpart(t: pa.Table) -> pa.Table:
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)
        keep = np.isin(sk, skeys)
        pk = t.column("l_partkey").to_numpy().astype(np.int64)[keep]
        val = (t.column("l_extendedprice").to_numpy()[keep]
               * t.column("l_quantity").to_numpy()[keep])
        df = pd.DataFrame({"p_partkey": pk, "value": val})
        g = df.groupby("p_partkey", as_index=False)["value"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (li.map_batches(vpart, batch_format="pyarrow")
           .groupby("p_partkey")
           .aggregate(Sum("value", alias_name="value")).to_pandas())
    if agg.empty:
        return pd.DataFrame({"p_partkey": pd.Series(dtype=np.int64),
                             "value": pd.Series(dtype=np.float64)})
    agg["value"] = np.round(agg["value"].to_numpy(), 6)
    total = float(agg["value"].sum())     # sum of 6-dp values: exact
    out = agg[agg["value"] > total * fraction].copy()
    return out.astype({"p_partkey": np.int64}) \
        .sort_values(["value", "p_partkey"],
                     ascending=[False, True], ignore_index=True)


def tpch_q8(sf_dir: str, supplier_region: str = "EUROPE",
            region: str = "ASIA", ptype: str = "ECONOMY") -> pd.DataFrame:
    """TPC-H Q8 analogue (market share): per order year, the revenue
    share supplied by ``supplier_region``'s suppliers among ``ptype``
    lineitems ordered by customers in ``region``.  (Q8 targets one
    NATION's suppliers; the analogue widens to a region because a
    single synthetic nation can have zero suppliers at small scale.)
    Plan: part-type and supplier-region membership are broadcast masks
    folded per lineitem batch into per-orderkey (rev, rev_target)
    partials; orders decorate per batch with year + customer-region
    keep (customer→nation→region via broadcast gathers); ONE bucketed
    hash_join on orderkey; per-year sums round to 6 dp before the
    share ratio (the tpch_q14 rounded-numerator/denominator rule)."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    tkeys = np.sort(part.loc[part["p_type"] == ptype, "p_partkey"]
                    .to_numpy(np.int64))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    srkey = set(reg.loc[reg["r_name"] == supplier_region,
                        "r_regionkey"].astype(int))
    nkeys = set(nat.loc[nat["n_regionkey"].astype(int).isin(srkey),
                        "n_nationkey"].astype(int))
    t_sup = np.sort(sup.loc[sup["s_nationkey"].astype(int).isin(nkeys),
                            "s_suppkey"].to_numpy(np.int64))
    rkey = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
               .astype(int))
    rnat = np.sort(nat.loc[nat["n_regionkey"].astype(int).isin(rkey),
                           "n_nationkey"].to_numpy(np.int64))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .to_pandas()
    ckeys = np.sort(cust.loc[np.isin(cust["c_nationkey"]
                                     .to_numpy(np.int64), rnat),
                             "c_custkey"].to_numpy(np.int64))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def lpart(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        keep = np.isin(pk, tkeys)
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)[keep]
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)[keep]
        rev = (t.column("l_extendedprice").to_numpy()[keep]
               * (1.0 - t.column("l_discount").to_numpy()[keep]))
        tgt = np.isin(sk, t_sup)
        df = pd.DataFrame({"l_orderkey": ok, "rev": rev,
                           "rev_target": np.where(tgt, rev, 0.0)})
        g = df.groupby("l_orderkey", as_index=False).agg(
            rev=("rev", "sum"), rev_target=("rev_target", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def opart(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        keep = np.isin(ck, ckeys)
        ok = t.column("o_orderkey").to_numpy().astype(np.int64)[keep]
        od = t.column("o_orderdate").cast(pa.int64()).to_numpy()[keep]
        yr = (1970 + od // 31_557_600_000_000).astype(np.int64)
        return pa.table({"l_orderkey": pa.array(ok),
                         "o_year": pa.array(yr)})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(opart, batch_format="pyarrow")
    joined = hash_join(li.map_batches(lpart, batch_format="pyarrow"),
                       orders, on="l_orderkey")
    agg = (joined.groupby("o_year")
           .aggregate(Sum("rev", alias_name="rev_total"),
                      Sum("rev_target", alias_name="rev_target"))
           .to_pandas())
    agg["rev_total"] = np.round(agg["rev_total"].to_numpy(), 6)
    agg["rev_target"] = np.round(agg["rev_target"].to_numpy(), 6)
    # ratio of two rounded sums CAN land on the rounding grid's half
    # (identical revenues) — half_up both engines (CLAUDE.md rule 26)
    agg["mkt_share"] = half_up(
        agg["rev_target"].to_numpy() / agg["rev_total"].to_numpy(), 6)
    return agg[["o_year", "rev_target", "rev_total", "mkt_share"]] \
        .astype({"o_year": np.int64}) \
        .sort_values("o_year", ignore_index=True)


def tpch_q21(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 analogue (suppliers who kept orders waiting): the
    corpus has no commit/receipt dates, so the lateness analogue is
    shipping LAST — for each multi-supplier order of status 'F', blame
    the supplier(s) whose per-order max ship day equals the order's
    max, provided some OTHER supplier finished strictly earlier.
    All-integer day arithmetic end to end.  Plan: per-batch
    (orderkey, suppkey, max-day) partials → pair-domain groupby →
    broadcast order-status filter happens inside the first pass
    (orders joined per batch via a bucketed hash_join would also work,
    but status 'F' keeps ~half the orders, so the semi-join mask is a
    cheap broadcast at any scale ≤ billions of orders; past that,
    swap for hash_join) → per-order (max, min) second groupby →
    per-supplier count.  Output: s_name, numwait desc, name asc."""
    from ray.data.aggregate import Max, Min, Sum

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .to_pandas().sort_values("s_suppkey")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]) \
        .to_pandas()
    fkeys = np.sort(orders.loc[orders["o_orderstatus"] == "F",
                               "o_orderkey"].to_numpy(np.int64))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def pair_max(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        keep = np.isin(ok, fkeys)
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)[keep]
        day = (t.column("l_shipdate").cast(pa.int64()).to_numpy()[keep]
               // 86_400_000_000).astype(np.int64)
        df = pd.DataFrame({"o": ok[keep], "s": sk, "d": day})
        g = df.groupby(["o", "s"], as_index=False)["d"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.joins import hash_join

    pairs = (li.map_batches(pair_max, batch_format="pyarrow")
             .groupby(["o", "s"]).aggregate(Max("d", alias_name="d"))
             .materialize())
    omax = (pairs.groupby("o")
            .aggregate(Max("d", alias_name="omax"),
                       Min("d", alias_name="omin")))
    # pair and order domains both scale with the data — never the
    # driver: bucketed join + stateless blame filter + tiny supplier
    # groupby (the only driver-sized object is the supplier count)
    joined = hash_join(pairs, omax, on="o")

    def blame(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy().astype(np.int64)
        mx = t.column("omax").to_numpy().astype(np.int64)
        mn = t.column("omin").to_numpy().astype(np.int64)
        keep = (d == mx) & (mn < mx)
        s = t.column("s").to_numpy().astype(np.int64)[keep]
        df = pd.DataFrame({"s": s, "n": np.int64(1)})
        g = df.groupby("s", as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = (joined.map_batches(blame, batch_format="pyarrow")
           .groupby("s").aggregate(Sum("n", alias_name="numwait"))
           .to_pandas())
    sk = cnt["s"].to_numpy(np.int64)
    pos = np.searchsorted(sup["s_suppkey"].to_numpy(np.int64), sk)
    out = pd.DataFrame({"s_name": sup["s_name"]
                        .to_numpy(dtype=object)[pos],
                        "numwait": cnt["numwait"].to_numpy(np.int64)})
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True], ignore_index=True)


def tpch_q20(sf_dir: str, name_prefix: str = "cold") -> pd.DataFrame:
    """TPC-H Q20 analogue (leading suppliers of a part class): for
    parts whose name starts with ``name_prefix``, suppliers whose
    shipped quantity is within a factor 2 of that part's TOP supplier
    volume (availqty has no corpus twin; observed near-top volume
    replaces the excess-stock test, and — unlike a half-of-total
    rule, which goes empty once supplier counts grow — is non-trivial
    at every scale because each part's max supplier always
    qualifies).  Quantities are integer-valued, so the test is the
    EXACT integer comparison 2·sq > max_sq — no float anywhere.
    Output: distinct qualifying suppliers (s_suppkey, s_name)."""
    from ray.data.aggregate import Max, Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pkeys = np.sort(part.loc[part["p_name"].str.startswith(name_prefix),
                             "p_partkey"].to_numpy(np.int64))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .to_pandas().sort_values("s_suppkey")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])

    def qpart(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        keep = np.isin(pk, pkeys)
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)[keep]
        qty = t.column("l_quantity").to_numpy()[keep] \
            .astype(np.int64)
        df = pd.DataFrame({"p": pk[keep], "s": sk, "q": qty})
        g = df.groupby(["p", "s"], as_index=False)["q"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.joins import hash_join

    ps = (li.map_batches(qpart, batch_format="pyarrow")
          .groupby(["p", "s"]).aggregate(Sum("q", alias_name="sq"))
          .materialize())
    tot = ps.groupby("p").aggregate(Max("sq", alias_name="mq"))
    # part×supplier and part domains stay distributed; only the
    # qualifying supplier ids (≤ supplier count) reach the driver
    joined = hash_join(ps, tot, on="p")

    def leading(t: pa.Table) -> pa.Table:
        if not t.num_rows or "sq" not in t.column_names:
            return pa.table({"s": pa.array([], pa.int64())})
        sq = t.column("sq").to_numpy().astype(np.int64)
        mq = t.column("mq").to_numpy().astype(np.int64)
        s = t.column("s").to_numpy().astype(np.int64)[2 * sq > mq]
        return pa.table({"s": pa.array(np.unique(s))})

    win = (joined.map_batches(leading, batch_format="pyarrow")
           .to_pandas())
    if win.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object)})
    sk = np.unique(win["s"].to_numpy(np.int64))
    pos = np.searchsorted(sup["s_suppkey"].to_numpy(np.int64), sk)
    return pd.DataFrame({
        "s_suppkey": sk,
        "s_name": sup["s_name"].to_numpy(dtype=object)[pos]})


def tpch_q2(sf_dir: str, ptype: str = "STANDARD") -> pd.DataFrame:
    """TPC-H Q2 analogue (minimum-cost supplier): for each part of one
    type in a size slice, the supplier with the lowest observed unit
    price Σ extendedprice / Σ quantity (no partsupp/supplycost in the
    corpus; observed price replaces it).  The per-part argmin is an
    EXACT integer min over packed (cost_micro, suppkey) keys —
    cost_micro = floor(cost·10⁶ + 0.5) — so cost ties break on
    suppkey identically in both engines (the grouped_topk packed-key
    rule).  Plan: per-(part, supplier) partials → pair-domain groupby
    → packed-key per-part Min → broadcast supplier/nation decoration.
    Output sorted by p_partkey."""
    from ray.data.aggregate import Min, Sum

    sizes = np.array([9, 16, 22], np.int64)
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_type", "p_size"]).to_pandas()
    pkeys = np.sort(part.loc[(part["p_type"] == ptype)
                             & part["p_size"].isin(sizes),
                             "p_partkey"].to_numpy(np.int64))
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]) \
        .to_pandas().sort_values("s_suppkey")
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = nat["n_nationkey"].to_numpy(np.int64)
    n_names = np.empty(int(nk.max()) + 1, dtype=object)
    n_names[nk] = nat["n_name"].to_numpy(dtype=object)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"])

    def pair_part(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        keep = np.isin(pk, pkeys)
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)[keep]
        ep = t.column("l_extendedprice").to_numpy()[keep]
        qty = t.column("l_quantity").to_numpy()[keep] \
            .astype(np.int64)
        df = pd.DataFrame({"p": pk[keep], "s": sk, "ep": ep, "q": qty})
        g = df.groupby(["p", "s"], as_index=False).agg(
            ep=("ep", "sum"), q=("q", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (li.map_batches(pair_part, batch_format="pyarrow")
             .groupby(["p", "s"])
             .aggregate(Sum("ep", alias_name="ep"),
                        Sum("q", alias_name="q")))

    def pack(t: pa.Table) -> pa.Table:
        if not t.num_rows or "ep" not in t.column_names:
            return pa.table({"p": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64())})
        cost = (t.column("ep").to_numpy()
                / t.column("q").to_numpy().astype(np.float64))
        micro = np.floor(cost * 1_000_000 + 0.5).astype(np.int64)
        s = t.column("s").to_numpy().astype(np.int64)
        return pa.table({"p": t.column("p").cast(pa.int64()),
                         "key": pa.array(micro * 10_000_000 + s)})

    best = (pairs.map_batches(pack, batch_format="pyarrow")
            .groupby("p").aggregate(Min("key", alias_name="key"))
            .to_pandas())
    if best.empty:
        return pd.DataFrame({
            "p_partkey": pd.Series(dtype=np.int64),
            "s_suppkey": pd.Series(dtype=np.int64),
            "s_name": pd.Series(dtype=object),
            "n_name": pd.Series(dtype=object),
            "s_acctbal": pd.Series(dtype=np.float64),
            "unit_cost": pd.Series(dtype=np.float64)})
    key = best["key"].to_numpy(np.int64)
    sk = key % 10_000_000
    cost = (key // 10_000_000) / 1e6
    pos = np.searchsorted(sup["s_suppkey"].to_numpy(np.int64), sk)
    out = pd.DataFrame({
        "p_partkey": best["p"].to_numpy(np.int64),
        "s_suppkey": sk,
        "s_name": sup["s_name"].to_numpy(dtype=object)[pos],
        "n_name": n_names[sup["s_nationkey"].to_numpy(np.int64)[pos]],
        "s_acctbal": np.round(sup["s_acctbal"].to_numpy()[pos], 2),
        "unit_cost": cost})
    return out.sort_values("p_partkey", ignore_index=True)


def events_user_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type entropy, reported as a bounded band
    histogram (the user domain itself never leaves the cluster).
    H(u) = ln n_u − (Σ_t c·ln c)/n_u over the user's per-type counts;
    the Σ term is quantized PER TERM (round 9) so the cross-type sum
    is order-independent and exact in both engines (the
    kg_relation_entropy convention), H is half-up 6-dp, and the band
    floor(H/0.25) is integer arithmetic on the rounded value.  Plan:
    per-batch (user, type) count partials → one pair-domain groupby →
    stateless per-row entropy terms → user-domain groupby → banded
    integer aggregate (output ≤ ~20 rows)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy().astype(np.int64),
            "event_type": t.column("event_type")
            .to_numpy(zero_copy_only=False).astype(str)})
        g = df.groupby(["user_id", "event_type"], as_index=False) \
            .agg(c=("event_type", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    ut = (ds.map_batches(pairs, batch_format="pyarrow")
          .groupby(["user_id", "event_type"])
          .aggregate(Sum("c", alias_name="c")))

    def terms(t: pa.Table) -> pa.Table:
        if not t.num_rows or "c" not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        c = t.column("c").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "n": pa.array(c),
            "k": pa.array(np.ones(len(c), np.int64)),
            "s": pa.array(np.round(c * np.log(c.astype(np.float64)),
                                   9))})

    u = (ut.map_batches(terms, batch_format="pyarrow")
         .groupby("user_id")
         .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"),
                    Sum("s", alias_name="s")))

    def band(t: pa.Table) -> pa.Table:
        if not t.num_rows or "n" not in t.column_names:
            return pa.table({"band": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64()),
                             "sum_types": pa.array([], pa.int64()),
                             "min_ent": pa.array([], pa.float64()),
                             "max_ent": pa.array([], pa.float64())})
        n = t.column("n").to_numpy().astype(np.int64)
        k = t.column("k").to_numpy().astype(np.int64)
        s = t.column("s").to_numpy()
        ent = np.where(n <= 1, 0.0,
                       half_up(np.log(n.astype(np.float64))
                               - s / n.astype(np.float64), 6))
        df = pd.DataFrame({
            "band": np.floor(ent / 0.25).astype(np.int64),
            "n_users": np.int64(1), "sum_types": k,
            "min_ent": ent, "max_ent": ent})
        g = df.groupby("band", as_index=False).agg(
            n_users=("n_users", "sum"), sum_types=("sum_types", "sum"),
            min_ent=("min_ent", "min"), max_ent=("max_ent", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (u.map_batches(band, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("n_users", alias_name="n_users"),
                      Sum("sum_types", alias_name="sum_types"),
                      Min("min_ent", alias_name="min_ent"),
                      Max("max_ent", alias_name="max_ent"))
           .to_pandas())
    return out.astype({c: np.int64
                       for c in ("band", "n_users", "sum_types")}) \
        .sort_values("band", ignore_index=True)


def _levenshtein(s1: str, s2: str) -> int:
    """Exact unit-cost Levenshtein distance (matches DuckDB's
    ``levenshtein``).  Vectorized row DP: substitutions/deletions are
    elementwise; chained insertions fold in via the
    min-accumulate-of-(cur − j) identity (min over j' ≤ j of
    cur[j'] + (j − j'))."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    a2 = np.array(list(s2))
    idx = np.arange(len(a2) + 1)
    prev = idx.astype(np.int64).copy()
    cur = np.empty_like(prev)
    for ch in s1:
        cur[0] = prev[0] + 1
        np.minimum(prev[:-1] + (a2 != ch), prev[1:] + 1, out=cur[1:])
        np.minimum(cur, np.minimum.accumulate(cur - idx) + idx, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def docs_edit_similarity(sf_dir: str, trunc: int = 400) -> pd.DataFrame:
    """Exact edit-distance audit of the MinHash candidate pairs: for
    every LSH candidate pair (the docs_minhash_estimate k=16 / r=2
    chain, bit-identical buckets), the Levenshtein distance between the
    two texts truncated to ``trunc`` characters and the normalized
    similarity 1 − d/max(len) (half-up 6 dp).  The character-level
    second opinion next to the shingle-level Jaccard — candidate pairs
    that shingles like but edits reject are the classic templated-spam
    shape.  Pair generation runs the normal bucket shuffle; only the
    involved docs' truncated texts collect (audit-sized, the
    minhash_estimate precedent).  SQL twin: same candidate CTE chain +
    DuckDB's native ``levenshtein`` (exact match, all-integer DP)."""
    from ..context import Broadcast, auto_pool
    from ..stages.dedup import MinHashLSH, candidate_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    buckets = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text",
                               "k": 16, "n_bands": 8, "ngram": 3},
        batch_format="pyarrow", batch_size=2048, concurrency=auto_pool())
    pdf = candidate_pairs(buckets, cap=1 << 30).to_pandas() \
        .astype({"a": np.int64, "b": np.int64})
    empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                          "b": pd.Series(dtype=np.int64),
                          "dist": pd.Series(dtype=np.int64),
                          "sim": pd.Series(dtype=np.float64)})
    if not len(pdf):
        return empty
    involved = np.unique(np.concatenate([pdf["a"].to_numpy(),
                                         pdf["b"].to_numpy()]))
    inv_bc = Broadcast(involved)

    def gather(t: pa.Table) -> pa.Table:
        inv = inv_bc.get()
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(inv, ids), 0, len(inv) - 1)
        keep = inv[pos] == ids
        txt = t.column("text").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "text": pa.array([s[:trunc] for s in txt], pa.string())})

    rows = (ds.map_batches(gather, batch_format="pyarrow").to_pandas())
    texts = dict(zip(rows["doc_id"].to_numpy(np.int64), rows["text"]))
    dist = np.empty(len(pdf), np.int64)
    ml = np.empty(len(pdf), np.int64)
    for i, (da, db) in enumerate(zip(pdf["a"].to_numpy(),
                                     pdf["b"].to_numpy())):
        sa, sb = texts.get(int(da), ""), texts.get(int(db), "")
        dist[i] = _levenshtein(sa, sb)
        ml[i] = max(len(sa), len(sb))
    sim = np.where(ml == 0, 1.0,
                   half_up(1.0 - dist / np.maximum(ml, 1), 6))
    out = pd.DataFrame({"a": pdf["a"].to_numpy(),
                        "b": pdf["b"].to_numpy(),
                        "dist": dist, "sim": sim})
    return out.sort_values(["a", "b"], ignore_index=True)
