"""Driver contract for the ttmf_ray engine.

The driver initializes Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship phase-A pipeline (synthetic Common-Crawl-style
  corpus sized off sf0.001 → extract → triples → canonicalize → dedup).
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ the training-data-pipeline extensions).
- ``oracle_sql()``: DuckDB mirrors for the SQL-expressible subset; the
  corpus/graph/model queries are rows-only here and carry their strong
  assertions in tests/ (byte-identity, P/R ≥ 0.95, determinism).

Why each remaining rows-only query has no SQL twin (everything else is
mirrored value-for-value):

- ``pages_extract`` / ``kg_construct_pages`` — input is the generated
  page corpus, which the oracle harness cannot see (its views cover only
  the ten sf parquet tables); correctness is pinned instead by
  byte-identity and P/R = 1.0 vs ``sources/pages.py:oracle_triples``
  (test_extract, test_kg_construct).
- ``trust_scores`` / ``trust_scores_streaming`` / ``trust_pr_sweep`` /
  ``kg_error_report`` / ``kg_link_prediction`` — outputs pass through
  trained KGE/fusion weights (iterative seeded SGD), which SQL cannot
  reproduce (the streaming variant additionally carries a bit-identity
  parity test vs the driver path, test_trust_streaming.py); the
  protocol AROUND the models is mirrored exactly instead:
  ``emb_link_rank`` pins the rank rule + filtered anti-join with fixed
  embeddings, ``events_thresholds`` the threshold sweep,
  ``kg_negative_samples``/``kg_kgc_negatives`` the corruption draws, and
  ``kg_split_counts`` the split arithmetic.  Rows-only determinism is
  still enforced (pinned worker counts, sorted collections).
- ``media_features_real`` / ``media_image_dedup`` /
  ``media_jpeg_features`` — inputs are synthesized binary WAV/PPM/JPEG
  payloads (no DuckDB-visible table); the decode kernels carry their
  own roundtrip assertions in test_media.py / test_jpegnp.py, the
  aHash dedup pins its planted byte-identical copy groups, and the
  JPEG feature table is pinned against an independent per-image
  re-decode (scalar oracle).
- ``docs_compression_ratio`` — DuckDB has no zlib; the per-doc values
  are pinned against an independent re-compress in test_misc_ops.py.
(``kg_graph_features`` and the symmetrized-graph ``kg_graph_features_sym``
are FULLY mirrored — including the PPR column with its data-dependent
iteration count, via a recursive CTE running the identical update to the
identical L1 stopping rule; ``kg_subgraph_stats`` / ``kg_ppr_micro``
remain as focused single-kernel mirrors.)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from ttmf_ray.context import tune_data_context
    from ttmf_ray.pipelines.corpus_queries import kg_construct_pages

    tune_data_context()
    return kg_construct_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ttmf_ray.context import tune_data_context
    from ttmf_ray.pipelines import corpus_queries as cq
    from ttmf_ray.pipelines import relational as rel

    tune_data_context()
    return {
        # --- SQL-checked: relational KG construction primitives ---------
        "kg_edges_relational": rel.kg_edges_relational,
        "kg_edges_tsv_roundtrip": rel.kg_edges_tsv_roundtrip,
        "kg_vocab_entities": rel.kg_vocab_entities,
        "kg_edges_idmapped": rel.kg_edges_idmapped,
        "kg_split_counts": rel.kg_split_counts,
        # --- SQL-checked: dedup / text analysis / windows / aggregates --
        "part_supplier_pairs": rel.part_supplier_pairs,
        "docs_exact_dedup": rel.docs_exact_dedup,
        "docs_quality": rel.docs_quality,
        "docs_token_stats": rel.docs_token_stats,
        "docs_length_quantiles": rel.docs_length_quantiles,
        "docs_redact_pii": rel.docs_redact_pii,
        "docs_length_band_filter": rel.docs_length_band_filter,
        "docs_lm_perplexity": rel.docs_lm_perplexity,
        "docs_ccnet_buckets": rel.docs_ccnet_buckets,
        "docs_nb_quality": rel.docs_nb_quality,
        "docs_dsir_weights": rel.docs_dsir_weights,
        "lang_counts": rel.lang_counts,
        "events_hourly": rel.events_hourly,
        "events_thresholds": rel.events_thresholds,
        "lineitem_sample": rel.lineitem_sample,
        "top_docs_per_lang": rel.top_docs_per_lang,
        "events_asof_join": rel.events_asof_join,
        "events_sliding_1h": rel.events_sliding_1h,
        "events_value_bands": rel.events_value_bands,
        "tpch_q1": rel.tpch_q1,
        "revenue_by_nation": rel.revenue_by_nation,
        "top_parts": rel.top_parts,
        "ann_topk": rel.ann_topk,
        "embeddings_mips": rel.embeddings_mips,
        "embeddings_pq_recall": rel.embeddings_pq_recall,
        "embeddings_drift": rel.embeddings_drift,
        "events_ewma": rel.events_ewma,
        "events_cuped": rel.events_cuped,
        "events_hour_profile": rel.events_hour_profile,
        "events_type_lift": rel.events_type_lift,
        "embeddings_kmeans": rel.embeddings_kmeans,
        "embeddings_outliers": rel.embeddings_outliers,
        "docs_compression_ratio": rel.docs_compression_ratio,
        "embeddings_rp_project": rel.embeddings_rp_project,
        "embeddings_semantic_dedup": rel.embeddings_semantic_dedup,
        "order_priority_revenue": rel.order_priority_revenue,
        "docs_tfidf": rel.docs_tfidf,
        "docs_bm25": rel.docs_bm25,
        "docs_winnow": rel.docs_winnow,
        "docs_source_kl": rel.docs_source_kl,
        "docs_weighted_sample": rel.docs_weighted_sample,
        "docs_collocations": rel.docs_collocations,
        "kg_components": cq.kg_components,
        "embeddings_pq_codes": rel.embeddings_pq_codes,
        "docs_jsonl_roundtrip": rel.docs_jsonl_roundtrip,
        "embeddings_pq_adc": rel.embeddings_pq_adc,
        "docs_bigram_perplexity": rel.docs_bigram_perplexity,
        "events_cohort_retention": rel.events_cohort_retention,
        "events_funnel": rel.events_funnel,
        "embeddings_ivfpq": rel.embeddings_ivfpq,
        "part_cooccur_triangles": cq.part_cooccur_triangles,
        "kg_triangles": cq.kg_triangles,
        "kg_twins": cq.kg_twins,
        "kg_bfs_layers": cq.kg_bfs_layers,
        "kg_relation_entropy": cq.kg_relation_entropy,
        "kg_degree_histogram": cq.kg_degree_histogram,
        "docs_split_stratified": cq.docs_split_stratified,
        "docs_bpe_merges": rel.docs_bpe_merges,
        "docs_bpe_encode": rel.docs_bpe_encode,
        "docs_token_budget_mixture": rel.docs_token_budget_mixture,
        "docs_ngram_coverage": rel.docs_ngram_coverage,
        "events_markov_transitions": rel.events_markov_transitions,
        "events_markov_stationary": rel.events_markov_stationary,
        "kg_inverse_relations": cq.kg_inverse_relations,
        "docs_cdc_dedup": rel.docs_cdc_dedup,
        "part_cooccur_kcore": cq.part_cooccur_kcore,
        "docs_sb_perplexity": rel.docs_sb_perplexity,
        "docs_hybrid_rrf": rel.docs_hybrid_rrf,
        "embeddings_knn_graph": rel.embeddings_knn_graph,
        "embeddings_knn_clusters": rel.embeddings_knn_clusters,
        "docs_phrase_search": rel.docs_phrase_search,
        "docs_blocklist": rel.docs_blocklist,
        "docs_word_entropy": rel.docs_word_entropy,
        "docs_chunk_windows": rel.docs_chunk_windows,
        "embeddings_scalar_quant": rel.embeddings_scalar_quant,
        "docs_bloom_decontaminate": cq.docs_bloom_decontaminate,
        "kg_random_walks": cq.kg_random_walks,
        "kg_relpath_2hop": cq.kg_relpath_2hop,
        "kg_hits": cq.kg_hits,
        "kg_entity_types": cq.kg_entity_types,
        "kg_type_violations": cq.kg_type_violations,
        "kg_degree_assortativity": cq.kg_degree_assortativity,
        "docs_textrank": rel.docs_textrank,
        "docs_quality_auc": rel.docs_quality_auc,
        "docs_dsir_sample": rel.docs_dsir_sample,
        "docs_kneser_ney": rel.docs_kneser_ney,
        "docs_source_overlap": rel.docs_source_overlap,
        "events_hourly_anomaly": rel.events_hourly_anomaly,
        "docs_csv_roundtrip": rel.docs_csv_roundtrip,
        "docs_minhash_estimate": rel.docs_minhash_estimate,
        "part_cooccur_adamic_adar": cq.part_cooccur_adamic_adar,
        "docs_moore_lewis": rel.docs_moore_lewis,
        "docs_heaps_law": rel.docs_heaps_law,
        "embeddings_kcenter": rel.embeddings_kcenter,
        "docs_zipf_fit": rel.docs_zipf_fit,
        "events_rfm": rel.events_rfm,
        "events_seq_pairs": rel.events_seq_pairs,
        "docs_chi2_terms": rel.docs_chi2_terms,
        "kg_biased_walks": cq.kg_biased_walks,
        "docs_gopher_quality": rel.docs_gopher_quality,
        "docs_mattr": rel.docs_mattr,
        "docs_rake_keywords": rel.docs_rake_keywords,
        "embeddings_rq": rel.embeddings_rq,
        "docs_readability": rel.docs_readability,
        "embeddings_pca1": rel.embeddings_pca1,
        "docs_span_corruption": rel.docs_span_corruption,
        "docs_prefix_lm": rel.docs_prefix_lm,
        "events_window_funnel": rel.events_window_funnel,
        "docs_bpe_fertility": rel.docs_bpe_fertility,
        "embeddings_ann_recall": rel.embeddings_ann_recall,
        "embeddings_matryoshka": rel.embeddings_matryoshka,
        "events_ab_test": rel.events_ab_test,
        "tpch_q7": rel.tpch_q7,
        "events_sliding_topk": rel.events_sliding_topk,
        "events_streak": rel.events_streak,
        "embeddings_srp_estimate": rel.embeddings_srp_estimate,
        "events_pareto": rel.events_pareto,
        "docs_code_detect": rel.docs_code_detect,
        "events_interarrival": rel.events_interarrival,
        "tpch_q5": rel.tpch_q5,
        "tpch_q6": rel.tpch_q6,
        "tpch_q10": rel.tpch_q10,
        "tpch_q14": rel.tpch_q14,
        "events_props_extract": rel.events_props_extract,
        "events_value_stats": rel.events_value_stats,
        "events_ab_srm": rel.events_ab_srm,
        "docs_signal_agreement": rel.docs_signal_agreement,
        "docs_slop_ngrams": rel.docs_slop_ngrams,
        "embeddings_class_centroids": rel.embeddings_class_centroids,
        "embeddings_range_search": rel.embeddings_range_search,
        "events_session_paths": rel.events_session_paths,
        "events_funnel_time": rel.events_funnel_time,
        "events_user_gini": rel.events_user_gini,
        "docs_dup_rate_by_source": rel.docs_dup_rate_by_source,
        "docs_emb_cohesion": rel.docs_emb_cohesion,
        "events_rolling_active": rel.events_rolling_active,
        "embeddings_spherical_kmeans": rel.embeddings_spherical_kmeans,
        "docs_lang_confusion": cq.docs_lang_confusion,
        "events_attribution": rel.events_attribution,
        "events_hourly_mad": rel.events_hourly_mad,
        "events_cusum": rel.events_cusum,
        "tpch_q3": rel.tpch_q3,
        "tpch_q4": rel.tpch_q4,
        "tpch_q12": rel.tpch_q12,
        "tpch_q13": rel.tpch_q13,
        "tpch_q19": rel.tpch_q19,
        "tpch_q22": rel.tpch_q22,
        "docs_burstiness": rel.docs_burstiness,
        "docs_dp_release": rel.docs_dp_release,
        "docs_hapax": rel.docs_hapax,
        "events_bot_score": rel.events_bot_score,
        "docs_watermark": rel.docs_watermark,
        "tpch_q18": rel.tpch_q18,
        "tpch_q9": rel.tpch_q9,
        "tpch_q8": rel.tpch_q8,
        "tpch_q11": rel.tpch_q11,
        "tpch_q15": rel.tpch_q15,
        "tpch_q16": rel.tpch_q16,
        "tpch_q17": rel.tpch_q17,
        "tpch_q20": rel.tpch_q20,
        "tpch_q21": rel.tpch_q21,
        "tpch_q2": rel.tpch_q2,
        "events_user_entropy": rel.events_user_entropy,
        "docs_edit_similarity": rel.docs_edit_similarity,
        "events_retention": rel.events_retention,
        "events_session_quantiles": rel.events_session_quantiles,
        "docs_text_norm": rel.docs_text_norm,
        "docs_containment": rel.docs_containment,
        "docs_ngram_novelty": rel.docs_ngram_novelty,
        "embeddings_cluster_stability": rel.embeddings_cluster_stability,
        "docs_length_corr": rel.docs_length_corr,
        "kg_degree_powerlaw": cq.kg_degree_powerlaw,
        "kg_reciprocity": cq.kg_reciprocity,
        "docs_oov_rate": rel.docs_oov_rate,
        "embeddings_norm_stats": rel.embeddings_norm_stats,
        # (events_sessions registered below with the corpus queries)
        # --- rows-only: corpus phase A/B + near-dup + ANN scale path ----
        "pages_extract": cq.pages_extract,
        "kg_construct_pages": cq.kg_construct_pages,
        "trust_scores": cq.trust_scores,
        "trust_scores_streaming": cq.trust_scores_streaming,
        "docs_minhash_dedup": cq.docs_minhash_dedup,
        "docs_incremental_dedup": cq.docs_incremental_dedup,
        "docs_line_dedup": cq.docs_line_dedup,
        "docs_remove_boilerplate": cq.docs_remove_boilerplate,
        "docs_dup_clusters": cq.docs_dup_clusters,
        "docs_simhash": cq.docs_simhash,
        "docs_lang_detect": cq.docs_lang_detect,
        "docs_fingerprint": cq.docs_fingerprint,
        "embeddings_ivf_topk": cq.embeddings_ivf_topk,
        "emb_link_rank": cq.emb_link_rank,
        "docs_repetition": cq.docs_repetition,
        "media_features_real": cq.media_features_real,
        "media_frame_sample": cq.media_frame_sample,
        "media_image_dedup": cq.media_image_dedup,
        "media_jpeg_features": cq.media_jpeg_features,
        "media_audio_dedup": cq.media_audio_dedup,
        "embeddings_near_dup": cq.embeddings_near_dup,
        "kg_negative_samples": cq.kg_negative_samples,
        "kg_graph_features": cq.kg_graph_features,
        "kg_graph_features_sym": cq.kg_graph_features_sym,
        "kg_degree_quantiles": cq.kg_degree_quantiles,
        "kg_subgraph_stats": cq.kg_subgraph_stats,
        "kg_ppr_micro": cq.kg_ppr_micro,
        "kg_pagerank": cq.kg_pagerank,
        "kg_katz": cq.kg_katz,
        "kg_reach2": cq.kg_reach2,
        "kg_relation_cardinality": cq.kg_relation_cardinality,
        "docs_dup_canonical": cq.docs_dup_canonical,
        "kg_kgc_negatives": cq.kg_kgc_negatives,
        "kg_link_prediction": cq.kg_link_prediction,
        "kg_error_report": cq.kg_error_report,
        "embeddings_roundtrip": cq.embeddings_roundtrip,
        "events_sessions": rel.events_sessions,
        "trust_pr_sweep": cq.trust_pr_sweep,
        # --- SQL-checked: training-data curation (stages/curation.py) ---
        "docs_decontaminate": cq.docs_decontaminate,
        "docs_shuffle_export": cq.docs_shuffle_export,
        "docs_pack_bins": cq.docs_pack_bins,
        "docs_source_mixture": cq.docs_source_mixture,
        "docs_top_tokens": cq.docs_top_tokens,
        "docs_stratified_sample": cq.docs_stratified_sample,
        "docs_cm_heavy_hitters": cq.docs_cm_heavy_hitters,
        "docs_hll_distinct": cq.docs_hll_distinct,
        "docs_clean_corpus": cq.docs_clean_corpus,
        "docs_dup_ngrams": cq.docs_dup_ngrams,
        "docs_remove_dup_spans": cq.docs_remove_dup_spans,
        "docs_domain_stats": cq.docs_domain_stats,
    }


_EDGES_SQL = """
    SELECT subj, pred, obj FROM (
        SELECT c_name AS subj, 'in_nation' AS pred, n_name AS obj
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT s_name, 'in_nation', n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        UNION ALL
        SELECT n_name, 'in_region', r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        UNION ALL
        SELECT 'order_' || o_orderkey, 'placed_by', c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) GROUP BY subj, pred, obj
"""

_VOCAB_SQL = f"""
    WITH edges AS ({_EDGES_SQL}),
    names AS (SELECT subj AS name FROM edges UNION SELECT obj FROM edges)
    SELECT name, CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS id
    FROM names
"""

_IDMAPPED_SQL = f"""
    WITH edges AS ({_EDGES_SQL}),
    names AS (SELECT subj AS name FROM edges UNION SELECT obj FROM edges),
    ents AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS id FROM names),
    rels AS (SELECT pred AS name, row_number() OVER (ORDER BY pred) - 1 AS id
             FROM (SELECT DISTINCT pred FROM edges))
    SELECT CAST(eh.id AS BIGINT) AS h, CAST(et.id AS BIGINT) AS t,
           CAST(rl.id AS BIGINT) AS r
    FROM edges e
    JOIN ents eh ON e.subj = eh.name
    JOIN ents et ON e.obj = et.name
    JOIN rels rl ON e.pred = rl.name
"""

def _pr_iters(n_iter: int = 10, d: str = "0.85") -> tuple[str, str]:
    """Unrolled PageRank iteration CTEs over pre-defined tables
    ``e(u, v)``, ``nodes(id)``, ``nn(n)``, ``odeg(u, od)``, ``p0(id, pr)``
    — shared by kg_pagerank and docs_textrank.  Per iteration: the
    per-edge pr/outdeg SUM per target, the dangling-mass (outdeg-0)
    redistribution, and the 9-dp quantization that keeps the two
    engines' summation-order ulps from compounding.  MATERIALIZED on
    every level (CLAUDE.md: unrolled iteration CTEs referenced twice
    inline exponentially otherwise).  Returns (cte_sql, final_name)."""
    its = []
    prev = "p0"
    for i in range(1, n_iter + 1):
        its.append(f"""
    c{i} AS MATERIALIZED (
        SELECT e.v AS id, sum({prev}.pr / od.od) AS s
        FROM e JOIN {prev} ON {prev}.id = e.u
               JOIN odeg od ON od.u = e.u
        GROUP BY e.v),
    g{i} AS MATERIALIZED (
        SELECT COALESCE(sum(p.pr), 0) AS m
        FROM {prev} p LEFT JOIN odeg od ON od.u = p.id
        WHERE od.u IS NULL),
    p{i} AS MATERIALIZED (
        SELECT n.id,
               round((1 - {d}) / nn.n
                     + {d} * (COALESCE(c{i}.s, 0) + g{i}.m / nn.n),
                     9) AS pr
        FROM nodes n CROSS JOIN nn CROSS JOIN g{i}
        LEFT JOIN c{i} ON c{i}.id = n.id)""")
        prev = f"p{i}"
    return ",".join(its), prev


def _pagerank_sql(n_iter: int = 10, d: str = "0.85") -> str:
    """Global-PageRank mirror of stages/pagerank.py over the id-mapped
    relational KG (see _pr_iters for the iteration contract)."""
    its, prev = _pr_iters(n_iter, d)
    return f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    e AS MATERIALIZED (SELECT DISTINCT h AS u, t AS v FROM edges0),
    nodes AS MATERIALIZED (
        SELECT DISTINCT id FROM (SELECT u AS id FROM e
                                 UNION ALL SELECT v FROM e)),
    nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
    odeg AS MATERIALIZED (SELECT u, count(*) AS od FROM e GROUP BY u),
    p0 AS MATERIALIZED (
        SELECT id, round(1.0 / nn.n, 9) AS pr FROM nodes CROSS JOIN nn),
    {its}
    SELECT CAST(id AS BIGINT) AS node, pr FROM {prev} ORDER BY node
    """


def _katz_sql(n_iter: int = 8, beta: str = "0.01") -> str:
    """Mirror of kg_katz (stages/pagerank.py:katz): unrolled quantized
    iterations x ← round(β · Σ_{u→v} (1 + x_u), 9) from x = 0 over the
    distinct id-mapped KG edges — same edges0/e/nodes scaffold as
    _pagerank_sql, MATERIALIZED per level (CLAUDE.md CTE rule)."""
    its = []
    prev = "k0"
    for i in range(1, n_iter + 1):
        its.append(f"""
    s{i} AS MATERIALIZED (
        SELECT e.v AS id, sum(1 + {prev}.x) AS s
        FROM e JOIN {prev} ON {prev}.id = e.u GROUP BY e.v),
    k{i} AS MATERIALIZED (
        SELECT n.id, round({beta} * COALESCE(s{i}.s, 0), 9) AS x
        FROM nodes n LEFT JOIN s{i} ON s{i}.id = n.id)""")
        prev = f"k{i}"
    return f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    e AS MATERIALIZED (SELECT DISTINCT h AS u, t AS v FROM edges0),
    nodes AS MATERIALIZED (
        SELECT DISTINCT id FROM (SELECT u AS id FROM e
                                 UNION ALL SELECT v FROM e)),
    k0 AS MATERIALIZED (SELECT id, 0.0 AS x FROM nodes),
    {",".join(its)}
    SELECT CAST(id AS BIGINT) AS node, x AS katz FROM {prev}
    ORDER BY node
    """


def _ccnet_sql() -> str:
    """Mirror of docs_ccnet_buckets: the docs_lm_perplexity model/score
    chain, scores pinned to fixed-point int64 (round(m,6)·10⁶), per-
    source tertile cutpoints at INTEGER ranks ⌊(n−1)/3⌋ / ⌊2(n−1)/3⌋
    (the lower-disc rule; float q=1/3 would floor one rank low when
    (n−1)%3=0), head = highest mean ln p third."""
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
               list_transform({_TOKENS}, x -> lower(x)) AS ts
        FROM documents),
    ref AS (SELECT unnest(ts) AS token FROM toks WHERE doc_id % 2 = 0),
    counts AS (SELECT token, count(*) AS cnt FROM ref GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM counts),
    top AS (SELECT token, cnt FROM counts
            ORDER BY cnt DESC, token LIMIT 20000),
    den AS (SELECT (t.total + v.v + 1)::DOUBLE AS d
            FROM tot t, (SELECT count(*) AS v FROM top) v),
    lp AS (SELECT token, ln((cnt + 1)::DOUBLE / den.d) AS lp
           FROM top, den),
    flat AS (SELECT doc_id, unnest(ts) AS token FROM toks),
    scored AS (SELECT f.doc_id,
                      COALESCE(lp.lp, (SELECT ln(1.0 / d) FROM den)) AS lp
               FROM flat f LEFT JOIN lp ON lp.token = f.token),
    agg AS (SELECT doc_id, sum(lp) / count(*) AS m
            FROM scored GROUP BY doc_id),
    fpt AS MATERIALIZED (
        SELECT t.doc_id, t.source,
               CAST(round(round(COALESCE(a.m, 0.0), 6) * 1000000)
                    AS BIGINT) AS fp
        FROM toks t LEFT JOIN agg a USING (doc_id)),
    n AS (SELECT source, count(*) AS n FROM fpt GROUP BY source),
    rc AS MATERIALIZED (
        SELECT source, fp AS v,
               row_number() OVER (PARTITION BY source ORDER BY fp) - 1
                   AS rk
        FROM fpt),
    cuts AS (SELECT rc.source,
                    max(CASE WHEN rc.rk = (n.n - 1) // 3
                        THEN rc.v END) AS c1,
                    max(CASE WHEN rc.rk = (2 * (n.n - 1)) // 3
                        THEN rc.v END) AS c2
             FROM rc JOIN n USING (source) GROUP BY rc.source)
    SELECT f.doc_id, f.source, f.fp::DOUBLE / 1000000.0 AS logprob_mean,
           CASE WHEN f.fp >= c.c2 THEN 'head'
                WHEN f.fp >= c.c1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM fpt f JOIN cuts c USING (source) ORDER BY f.doc_id
    """


_REACH2_SQL_TMPL = """
    WITH edges0 AS MATERIALIZED ({idmapped}),
    e AS MATERIALIZED (SELECT DISTINCT h AS u, t AS v FROM edges0),
    nodes AS MATERIALIZED (
        SELECT DISTINCT id FROM (SELECT u AS id FROM e
                                 UNION ALL SELECT v FROM e)),
    p2 AS (SELECT a.u AS u, b.v AS v FROM e a JOIN e b ON a.v = b.u),
    un AS (SELECT DISTINCT u, v FROM (SELECT u, v FROM e
                                      UNION ALL SELECT u, v FROM p2)
           WHERE u <> v),
    c1 AS (SELECT u, count(*) AS n FROM (
               SELECT DISTINCT u, v FROM e WHERE u <> v) GROUP BY u),
    c2 AS (SELECT u, count(*) AS n FROM un GROUP BY u)
    SELECT CAST(n.id AS BIGINT) AS node,
           COALESCE(c1.n, 0)::BIGINT AS n1,
           COALESCE(c2.n, 0)::BIGINT AS n_reach2
    FROM nodes n LEFT JOIN c1 ON c1.u = n.id
                 LEFT JOIN c2 ON c2.u = n.id
    ORDER BY node
"""


def _slop_ngrams_sql() -> str:
    """Mirror of docs_slop_ngrams: lowered empty-filtered tokens with
    positions, trigrams via positional self-joins (the dup-span
    fingerprint pattern), per-source count, top-10 on (n DESC, ngram)."""
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
               list_transform({_TOKENS}, x -> lower(x)) AS ts
        FROM documents),
    w AS MATERIALIZED (
        SELECT doc_id, source, unnest(ts) AS w,
               generate_subscripts(ts, 1) AS p
        FROM toks),
    tri AS (SELECT a.source,
                   a.w || ' ' || b.w || ' ' || c.w AS ngram
            FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.p = a.p + 1
                     JOIN w c ON c.doc_id = a.doc_id AND c.p = a.p + 2),
    cnt AS (SELECT source, ngram, count(*)::BIGINT AS n
            FROM tri GROUP BY source, ngram),
    rk AS (SELECT source, ngram, n,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n DESC, ngram) AS rn
           FROM cnt)
    SELECT source, ngram, n FROM rk WHERE rn <= 10
    ORDER BY source, n DESC, ngram
    """


def _ab_srm_sql() -> str:
    """Mirror of events_ab_srm: distinct users, arm = mix64(9, uid) % 2,
    Pearson χ² of the two arm counts against the designed 50/50."""
    lat, ref = _mix_chain("srm", ["u.user_id"], [9])
    return f"""
    WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id
               FROM events),
    arms AS (SELECT ({ref} % 2)::BIGINT AS arm FROM u, {lat}),
    cnt AS (SELECT count(*) FILTER (arm = 0)::BIGINT AS n0,
                   count(*) FILTER (arm = 1)::BIGINT AS n1,
                   count(*)::DOUBLE / 2.0 AS e
            FROM arms)
    SELECT t.arm,
           CASE WHEN t.arm = 0 THEN c.n0 ELSE c.n1 END AS n_users,
           round(c.e, 6) AS expected,
           round((c.n0 - c.e) * (c.n0 - c.e) / c.e
                 + (c.n1 - c.e) * (c.n1 - c.e) / c.e, 6) AS chi2,
           CAST(CASE WHEN (c.n0 - c.e) * (c.n0 - c.e) / c.e
                        + (c.n1 - c.e) * (c.n1 - c.e) / c.e > 3.841
                THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM cnt c, (VALUES (0::BIGINT), (1::BIGINT)) t(arm) ORDER BY t.arm
    """


def _signal_agreement_sql() -> str:
    """Mirror of docs_signal_agreement: the NB chain (_nb_model_ctes)
    plus an LM chain DERIVED from it — the unigram counts are c1+c0 and
    the top-20000 tie-break (cnt DESC, token) is identical, so the NB
    CTEs' counts/top/flat are reused verbatim.  Ranks are permutation
    row_numbers over (6-dp fixed-point score, doc_id); Spearman is the
    all-integer Σd² identity."""
    return f"""
    WITH {_nb_model_ctes()},
    lden AS (SELECT ((t.n1 + t.n0) + v.v + 1)::DOUBLE AS d
             FROM tot t, (SELECT count(*) AS v FROM top) v),
    lp AS (SELECT token, ln((c1 + c0 + 1)::DOUBLE / lden.d) AS lp
           FROM top, lden),
    lscored AS (SELECT f.doc_id,
                       COALESCE(lp.lp, (SELECT ln(1.0 / d) FROM lden))
                           AS lp
                FROM flat f LEFT JOIN lp ON lp.token = f.token),
    lagg AS (SELECT doc_id, sum(lp) / count(*) AS m
             FROM lscored GROUP BY doc_id),
    sc AS (SELECT t.doc_id,
                  CAST(round(round(pri.p + COALESCE(a.s, 0.0), 6)
                             * 1000000) AS BIGINT) AS afp,
                  CAST(round(round(COALESCE(la.m, 0.0), 6)
                             * 1000000) AS BIGINT) AS bfp
           FROM toks t LEFT JOIN agg a USING (doc_id)
                LEFT JOIN lagg la USING (doc_id), pri),
    rk AS (SELECT doc_id,
                  row_number() OVER (ORDER BY afp, doc_id) AS ra,
                  row_number() OVER (ORDER BY bfp, doc_id) AS rb
           FROM sc)
    SELECT count(*)::BIGINT AS n_docs,
           sum((ra - rb) * (ra - rb))::BIGINT AS sum_d2,
           floor((1.0 - 6.0 * sum((ra - rb) * (ra - rb))::DOUBLE
                  / (count(*) * (count(*) * count(*) - 1)))
                 * 1000000 + 0.5) / 1000000
               AS spearman_rho
    FROM rk
    """


def _textrank_sql(n_iter: int = 10, d: str = "0.85") -> str:
    """Mirror of docs_textrank: adjacent lowercase word pairs (window 2,
    self-pairs dropped) via positional token self-joins, sorted-word
    vocab ids, symmetric distinct edges, then the shared unrolled
    quantized PageRank (_pr_iters) — joined back to words."""
    its, prev = _pr_iters(n_iter, d)
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    adj AS MATERIALIZED (
        SELECT a.w AS wa, b.w AS wb
        FROM pw a JOIN pw b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        WHERE a.w <> b.w),
    vocab AS MATERIALIZED (
        SELECT w AS word, row_number() OVER (ORDER BY w) - 1 AS id
        FROM (SELECT DISTINCT w FROM (SELECT wa AS w FROM adj
                                      UNION ALL SELECT wb FROM adj))),
    e AS MATERIALIZED (
        SELECT DISTINCT va.id AS u, vb.id AS v
        FROM (SELECT wa, wb FROM adj
              UNION ALL SELECT wb, wa FROM adj) p
        JOIN vocab va ON va.word = p.wa
        JOIN vocab vb ON vb.word = p.wb),
    nodes AS MATERIALIZED (SELECT id FROM vocab),
    nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
    odeg AS MATERIALIZED (SELECT u, count(*) AS od FROM e GROUP BY u),
    p0 AS MATERIALIZED (
        SELECT id, round(1.0 / nn.n, 9) AS pr FROM nodes CROSS JOIN nn),
    {its}
    SELECT v.word, p.pr FROM vocab v JOIN {prev} p ON p.id = v.id
    ORDER BY v.word
    """


def _hits_sql(n_iter: int = 8) -> str:
    """Mirror of kg_hits (stages/pagerank.py:hits): 8 unrolled
    iterations, each auth = round(round(Σ_in hub, 9) / max, 9) then the
    hub analog — max normalization is summation-order independent, so
    only the per-target SUM carries ulps and the 9-dp rounds absorb
    them (the kg_pagerank contract)."""
    its = []
    prev = "h0"
    for i in range(1, n_iter + 1):
        its.append(f"""
    a{i} AS MATERIALIZED (
        SELECT n.id, round(COALESCE(s.s, 0), 9) AS av
        FROM nodes n LEFT JOIN (
            SELECT e.v AS id, sum(hh.hv) AS s
            FROM e JOIN {prev} hh ON hh.id = e.u GROUP BY e.v) s
        ON s.id = n.id),
    am{i} AS MATERIALIZED (SELECT max(av) AS m FROM a{i}),
    an{i} AS MATERIALIZED (
        SELECT id, CASE WHEN am.m > 0 THEN round(av / am.m, 9)
                        ELSE av END AS av
        FROM a{i} CROSS JOIN am{i} am),
    hr{i} AS MATERIALIZED (
        SELECT n.id, round(COALESCE(s.s, 0), 9) AS hv
        FROM nodes n LEFT JOIN (
            SELECT e.u AS id, sum(aa.av) AS s
            FROM e JOIN an{i} aa ON aa.id = e.v GROUP BY e.u) s
        ON s.id = n.id),
    hm{i} AS MATERIALIZED (SELECT max(hv) AS m FROM hr{i}),
    h{i} AS MATERIALIZED (
        SELECT id, CASE WHEN hm.m > 0 THEN round(hv / hm.m, 9)
                        ELSE hv END AS hv
        FROM hr{i} CROSS JOIN hm{i} hm)""")
        prev = f"h{i}"
    return f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    e AS MATERIALIZED (SELECT DISTINCT h AS u, t AS v FROM edges0),
    nodes AS MATERIALIZED (SELECT id FROM ({_VOCAB_SQL})),
    h0 AS MATERIALIZED (SELECT id, 1.0 AS hv FROM nodes),
    {",".join(its)}
    SELECT CAST(n.id AS BIGINT) AS node, h.hv AS hub, a.av AS auth
    FROM nodes n JOIN h{n_iter} h ON h.id = n.id
                 JOIN an{n_iter} a ON a.id = n.id
    ORDER BY node
    """


_RELPATH_2HOP_SQL = f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL})
    SELECT CAST(e1.r AS BIGINT) AS r1, CAST(e2.r AS BIGINT) AS r2,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM edges0 e1 JOIN edges0 e2 ON e1.t = e2.h
    GROUP BY e1.r, e2.r ORDER BY r1, r2
"""


_ENTITY_TYPES_SQL = f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    vocab AS MATERIALIZED ({_VOCAB_SQL}),
    so AS (SELECT h AS id,
                  string_agg(CAST(r AS VARCHAR), ',' ORDER BY r) AS sig
           FROM (SELECT DISTINCT h, r FROM edges0) GROUP BY h),
    si AS (SELECT t AS id,
                  string_agg(CAST(r AS VARCHAR), ',' ORDER BY r) AS sig
           FROM (SELECT DISTINCT t, r FROM edges0) GROUP BY t),
    base AS (SELECT v.id, COALESCE(so.sig, '') AS sig_out,
                    COALESCE(si.sig, '') AS sig_in
             FROM vocab v LEFT JOIN so ON so.id = v.id
                          LEFT JOIN si ON si.id = v.id)
    SELECT CAST(id AS BIGINT) AS id, sig_out, sig_in,
           CAST(count(*) OVER (PARTITION BY sig_out, sig_in) AS BIGINT)
               AS n_peers
    FROM base ORDER BY id
"""


# --- splitmix64 in SQL (mirrors sources/pages.py:mix64 bit-for-bit) --------
# 64-bit wraparound multiply in HUGEINT via hi/lo 32-bit split; each mix
# input is one chain of three LATERAL sub-steps so expressions stay flat.

_M64_MOD = "18446744073709551616::HUGEINT"          # 2^64
_MIX_K0 = "11400714819323198485::HUGEINT"           # 0x9E3779B97F4A7C15
_MIX_K1 = "13787848793156543929::HUGEINT"           # 0xBF58476D1CE4E5B9
_MIX_K2 = "10723151780598845931::HUGEINT"           # 0x94D049BB133111EB


def _m64(a: str, b: str) -> str:
    """(a * b) mod 2^64 without HUGEINT overflow."""
    return (f"((((({a}) % 4294967296) * (({b}) // 4294967296)"
            f" + (({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296)"
            f" * 4294967296"
            f" + (({a}) % 4294967296) * (({b}) % 4294967296)) % {_M64_MOD}")


def _mix_chain(tag: str, inputs: list[str], seed_consts: list[int]) -> tuple[str, str]:
    """LATERAL chain computing mix64(*seed_consts, *inputs).

    Returns (laterals_sql, final_column_ref); ``tag`` keeps alias names
    unique when several chains appear in one query.
    """
    parts = []
    prev = _MIX_K0
    xs = [f"{c}::HUGEINT" for c in seed_consts] + \
         [f"({x})::HUGEINT" for x in inputs]
    for i, x in enumerate(xs):
        a = f"{tag}a{i}"
        b = f"{tag}b{i}"
        c = f"{tag}c{i}"
        parts.append(
            f"LATERAL (SELECT {_m64(f'xor({prev}, {x})', _MIX_K1)} AS v) {a}")
        parts.append(
            f"LATERAL (SELECT {_m64(f'xor({a}.v, {a}.v >> 27)', _MIX_K2)}"
            f" AS v) {b}")
        parts.append(f"LATERAL (SELECT xor({b}.v, {b}.v >> 31) AS v) {c}")
        prev = f"{c}.v"
    return ",\n".join(parts), prev


def _wfp_sql(col: str) -> str:
    """Rolling-hash fingerprint of a (non-empty, ASCII) word — the same
    fold as stages/text.py:fingerprint / stages/dedup.py:word_fp."""
    return (f"list_reduce(list_transform(split({col}, ''),"
            f" c -> unicode(c)::HUGEINT),"
            f" (x, y) -> (x * 1000003 + y) % 2305843009213693951)")


def _drift_sql(k: int = 8, n_iter: int = 4) -> str:
    """Mirror of embeddings_drift: the kmeans chain fit on the even-id
    half (src= filtered subquery), assignment of ALL vectors, integer
    per-cluster counts, fixed-order chi2."""
    body, cfin = _kmeans_ctes(
        k, n_iter,
        src="(SELECT * FROM embeddings WHERE vec_id % 2 = 0)")
    return f"""
    WITH {body},
    aemb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                    embedding::DOUBLE[] AS v FROM embeddings),
    dr_asg AS (SELECT id, c FROM (
        SELECT e.id, c.c,
               row_number() OVER (PARTITION BY e.id
                   ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                   AS rn
        FROM aemb e CROSS JOIN {cfin} c) WHERE rn = 1),
    dr_cnt AS (SELECT c AS cluster,
                   sum(CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_even,
                   sum(CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_odd
            FROM dr_asg GROUP BY c),
    dr_grid AS (SELECT unnest(range(0, {k})) AS cluster),
    dr_f AS (SELECT g.cluster::BIGINT AS cluster,
                 COALESCE(dr_cnt.n_even, 0) AS n_even,
                 COALESCE(dr_cnt.n_odd, 0) AS n_odd
          FROM dr_grid g LEFT JOIN dr_cnt USING (cluster)),
    dr_tot AS (SELECT CAST(sum(n_odd) AS DOUBLE)
                   / CAST(sum(n_even) AS DOUBLE) AS scale FROM dr_f),
    dr_ex AS (SELECT f.cluster, f.n_even, f.n_odd,
                  f.n_even * t.scale AS e FROM dr_f f, dr_tot t),
    dr_c2 AS (SELECT floor(sum((n_odd - e) * (n_odd - e)
                            / greatest(e, 1e-12))
                        * 1000000 + 0.5) / 1000000 AS chi2 FROM dr_ex)
    SELECT ex.cluster, ex.n_even, ex.n_odd,
           floor(ex.e * 1000000 + 0.5) / 1000000 AS expected_odd,
           c2.chi2
    FROM dr_ex ex, dr_c2 c2 ORDER BY cluster
"""


def _markov_stationary_sql(n_iter: int = 20) -> str:
    """Mirror of events_markov_stationary: unrolled quantized power
    iteration over the round-9 transition matrix."""
    ctes = ["""tys AS MATERIALIZED (
        SELECT DISTINCT event_type AS ty FROM events)""",
            """tp AS MATERIALIZED (
        SELECT f, t2, round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY f),
                            9) AS p
        FROM (SELECT s.event_type AS f, s.nxt AS t2, count(*) AS cnt
              FROM (SELECT user_id, event_type,
                           lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt
                    FROM events) s
              WHERE s.nxt IS NOT NULL GROUP BY s.event_type, s.nxt))""",
            """x0 AS (SELECT ty, round(1.0 / (SELECT count(*) FROM tys),
                               9) AS v
         FROM tys)"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""x{i} AS MATERIALIZED (
        SELECT t.ty, COALESCE(round(s.v, 9), 0.0) AS v
        FROM tys t LEFT JOIN (
            SELECT tp.t2 AS ty, sum(x{i - 1}.v * tp.p) AS v
            FROM x{i - 1} JOIN tp ON tp.f = x{i - 1}.ty
            GROUP BY tp.t2) s USING (ty))""")
    body = ",\n".join(ctes)
    return f"""
    WITH {body},
    tot AS (SELECT sum(v) AS s FROM x{n_iter})
    SELECT x.ty AS event_type,
           floor(x.v / tot.s * 1000000 + 0.5) / 1000000 AS stationary
    FROM x{n_iter} x, tot ORDER BY event_type
"""


def _dp_release_sql(eps: float = 1.0, seed: int = 1303) -> str:
    """Mirror of docs_dp_release: the same seeded geometric-difference
    discrete-Laplace noise — u_i = mix64(seed, i, fp(source))/2^64,
    G_i = floor(ln(u_i)/ln(e^-eps))."""
    lat1, ref1 = _mix_chain("dpa", ["f.fp"], [seed, 1])
    lat2, ref2 = _mix_chain("dpb", ["f.fp"], [seed, 2])
    return f"""
    WITH g AS (SELECT source, count(*)::BIGINT AS n
               FROM documents GROUP BY source),
    f AS (SELECT source, n, {_wfp_sql('source')} AS fp FROM g),
    u AS (SELECT f.source, f.n,
                 CAST({ref1} AS DOUBLE) / 18446744073709551616.0 AS u1,
                 CAST({ref2} AS DOUBLE) / 18446744073709551616.0 AS u2
          FROM f, {lat1}, {lat2})
    SELECT source, n AS n_true,
           CAST(n + floor(ln(u1) / ln(exp(-{eps})))
                  - floor(ln(u2) / ln(exp(-{eps}))) AS BIGINT)
               AS n_noisy
    FROM u ORDER BY source
"""


def _split_stratified_sql(seed: int = 1009) -> str:
    """Mirror of docs_split_stratified: rank = row_number over
    (mix64(seed, doc_id), doc_id) per source; integer 80/10/10
    boundaries."""
    lat, ref = _mix_chain("sp", ["d.doc_id"], [seed])
    return f"""
    WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source
               FROM documents),
    k AS (SELECT d.doc_id, d.source,
                 CAST({ref} - CASE WHEN {ref} >= 9223372036854775808
                              THEN 18446744073709551616 ELSE 0 END
                      AS BIGINT) AS key
          FROM d, {lat}),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY key, doc_id) - 1 AS rk,
                 count(*) OVER (PARTITION BY source) AS n
          FROM k)
    SELECT doc_id, source,
           CASE WHEN rk < (n * 8) // 10 THEN 'train'
                WHEN rk < (n * 8) // 10 + n // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM r ORDER BY doc_id
"""


def _watermark_sql() -> str:
    """Mirror of docs_watermark: greenlist bigram hash mix64(421,
    fp(prev), fp(w)) % 2 over positioned token pairs, z from integer
    counts; every 7th doc gets the Python-computed watermark-positive
    suffix literal (shared constant — both engines see identical
    text)."""
    from ttmf_ray.pipelines.relational import WM_SUFFIX

    lat, ref = _mix_chain("wm", ["p.fp_prev", "p.fp"], [421])
    return f"""
    WITH aug AS MATERIALIZED (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || '{WM_SUFFIX}'
                    ELSE text END AS t
        FROM documents),
    d AS (SELECT doc_id,
                 regexp_extract_all(lower(t), '[0-9a-z_]+') AS ws
          FROM aug),
    flat AS (SELECT doc_id, unnest(ws) AS w,
                    generate_subscripts(ws, 1) AS p
             FROM d),
    gw AS (SELECT DISTINCT w FROM flat),
    wf AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ft AS (SELECT f.doc_id, f.p, wf.fp FROM flat f JOIN wf USING (w)),
    pr AS (SELECT a.doc_id, a.fp AS fp_prev, b.fp AS fp
           FROM ft a JOIN ft b ON b.doc_id = a.doc_id
                              AND b.p = a.p + 1),
    gr AS (SELECT p.doc_id, CAST({ref} % 2 AS BIGINT) AS green
           FROM pr p, {lat}),
    agg AS (SELECT doc_id, count(*)::BIGINT AS n_pairs,
                   sum(green)::BIGINT AS n_green
            FROM gr GROUP BY doc_id)
    SELECT d0.doc_id, COALESCE(agg.n_pairs, 0) AS n_pairs,
           COALESCE(agg.n_green, 0) AS n_green,
           floor((CASE WHEN COALESCE(agg.n_pairs, 0) > 0
                  THEN (2.0 * agg.n_green - agg.n_pairs)
                       / sqrt(CAST(agg.n_pairs AS DOUBLE))
                  ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS z,
           CAST(CASE WHEN COALESCE(agg.n_pairs, 0) > 0
                      AND (2.0 * agg.n_green - agg.n_pairs)
                          / sqrt(CAST(agg.n_pairs AS DOUBLE)) > 4.0
                THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM (SELECT doc_id FROM aug) d0 LEFT JOIN agg USING (doc_id)
    ORDER BY d0.doc_id
"""


def _dsir_sql() -> str:
    """Exact mirror of docs_dsir_weights (stages/classify.py): lowercase
    `[0-9a-z_]+` word OCCURRENCES, bucket = mix64(101, rolling-fp(w)) %
    1024, lw[b] = ln((ct+1)/(Σct+1024)) - ln((cr+1)/(Σcr+1024)) with
    target = lang='en' docs and raw = all docs; per-doc weight = Σ
    occurrence lw, selected = weight > 0 (pre-rounding)."""
    lat, ref = _mix_chain("dsir", ["wf.fp"], [101])
    return f"""
    WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                      regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
               FROM documents),
    flat AS (SELECT doc_id, lang, unnest(ws) AS w FROM d),
    gw AS (SELECT DISTINCT w FROM flat),
    wf AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    wb AS (SELECT wf.w, CAST({ref} % 1024 AS BIGINT) AS b
           FROM wf, {lat}),
    occ AS (SELECT f.doc_id, f.lang, wb.b
            FROM flat f JOIN wb ON wb.w = f.w),
    cnts AS (SELECT b,
                    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
                    count(*) AS cr
             FROM occ GROUP BY b),
    tot AS (SELECT (sum(ct) + 1024)::DOUBLE AS tt,
                   (sum(cr) + 1024)::DOUBLE AS tr
            FROM cnts),
    lw AS (SELECT b, ln((ct + 1)::DOUBLE / tot.tt)
                     - ln((cr + 1)::DOUBLE / tot.tr) AS lw
           FROM cnts, tot),
    agg AS (SELECT o.doc_id, count(*) AS n_words, sum(lw.lw) AS s
            FROM occ o JOIN lw USING (b) GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
           ROUND(COALESCE(a.s, 0.0), 6) AS log_weight,
           CAST(CASE WHEN COALESCE(a.s, 0.0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS selected
    FROM d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """


# NB quality-gate model CTEs (stages/classify.py fit_nb_quality /
# NBScorer) — shared by docs_nb_quality and docs_quality_auc.  Ends at
# ``agg`` (per-doc n_tokens + weight sum) and ``pri`` (class prior).
def _nb_model_ctes() -> str:
    return f"""toks AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                       list_transform({_TOKENS}, x -> lower(x)) AS ts
                FROM documents),
            train AS (SELECT doc_id, (lang = 'en') AS ispos,
                             unnest(ts) AS token
                      FROM toks WHERE doc_id % 2 = 0),
            counts AS (SELECT token,
                              sum(CASE WHEN ispos THEN 1 ELSE 0 END) AS c1,
                              sum(CASE WHEN ispos THEN 0 ELSE 1 END) AS c0
                       FROM train GROUP BY token),
            tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0 FROM counts),
            nd AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                              AS d1,
                          sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                              AS d0
                   FROM toks WHERE doc_id % 2 = 0),
            top AS (SELECT token, c1, c0 FROM counts
                    ORDER BY (c1 + c0) DESC, token LIMIT 20000),
            den AS (SELECT (t.n1 + v.v + 1)::DOUBLE AS d1,
                           (t.n0 + v.v + 1)::DOUBLE AS d0
                    FROM tot t, (SELECT count(*) AS v FROM top) v),
            w AS (SELECT token,
                         ln((c1 + 1)::DOUBLE / den.d1)
                         - ln((c0 + 1)::DOUBLE / den.d0) AS w
                  FROM top, den),
            flat AS (SELECT doc_id, unnest(ts) AS token FROM toks),
            scored AS (SELECT f.doc_id,
                              COALESCE(w.w, (SELECT ln(1.0 / d1)
                                             - ln(1.0 / d0) FROM den)) AS w
                       FROM flat f LEFT JOIN w ON w.token = f.token),
            agg AS (SELECT doc_id, count(*) AS n_tokens, sum(w) AS s
                    FROM scored GROUP BY doc_id),
            pri AS (SELECT ln((d1 + 1.0) / (d0 + 1.0)) AS p FROM nd)"""


# exact ROC-AUC of the NB score on the held-out odd half: distinct-score
# histogram + tie-averaged Mann-Whitney rank sum in PURE INTEGER
# arithmetic (stages/classify.py nb_auc) — one final IEEE division
def _quality_auc_sql() -> str:
    return f"""
    WITH {_nb_model_ctes()},
    ev AS (SELECT (t.lang = 'en') AS ispos,
                  ROUND(pri.p + COALESCE(a.s, 0.0), 6) AS s
           FROM toks t LEFT JOIN agg a USING (doc_id), pri
           WHERE t.doc_id % 2 = 1),
    hist AS (SELECT s, sum(CASE WHEN ispos THEN 1 ELSE 0 END) AS n1,
                    sum(CASE WHEN ispos THEN 0 ELSE 1 END) AS n0
             FROM ev GROUP BY s),
    r AS (SELECT n1, n1 + n0 AS cnt,
                 COALESCE(sum(n1 + n0) OVER (
                     ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS cum_before
          FROM hist),
    tots AS (SELECT (SELECT sum(n1) FROM hist) AS p,
                    (SELECT sum(n0) FROM hist) AS nn,
                    sum(n1 * (2 * cum_before + cnt + 1)) AS su FROM r)
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           floor(CAST(su - p * (p + 1) AS DOUBLE) / (2 * p * nn)
                 * 1000000 + 0.5) / 1000000
               AS auc
    FROM tots
    """


def _dsir_sample_sql(n: int = 100, seed: int = 991) -> str:
    """Mirror of docs_dsir_sample (stages/classify.py dsir_sample):
    log-domain Efraimidis-Spirakis keys over the docs_dsir_weights CTEs —
    key = round(ln(-ln u) - log_weight, 9), u = (mix64(seed, id) >> 11
    + 1) / 2^53, n smallest keep."""
    lat, ref = _mix_chain("dss", ["w.doc_id"], [seed])
    return f"""
    WITH w AS MATERIALIZED ({_dsir_sql()}),
    k AS (SELECT w.doc_id, w.log_weight,
                 ROUND(ln(-ln((CAST(({ref}) // 2048 AS DOUBLE) + 1.0)
                              / 9007199254740992.0))
                       - w.log_weight, 9) AS key
          FROM w, {lat})
    SELECT doc_id, log_weight, key FROM k
    ORDER BY key, doc_id LIMIT {n}
    """


# interpolated Kneser-Ney bigram perplexity (stages/lm_score.py
# fit_kn_lm/KNScorer): D=0.75, add-one-floored continuation probability
# pcont=(l2+1)/(T+V); fit on even doc_ids — every per-bigram probability
# is the identical fixed-order IEEE chain as the numpy kernel
def _kneser_ney_sql() -> str:
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         list_transform({_TOKENS}, x -> lower(x)) AS ts
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ts) AS w,
                    (generate_subscripts(ts, 1) - 1)::BIGINT AS p
             FROM toks),
    bg AS (SELECT f1.doc_id, f1.w AS prev, f2.w AS cur
           FROM flat f1 JOIN flat f2
                ON f2.doc_id = f1.doc_id AND f2.p = f1.p + 1),
    v AS (SELECT count(DISTINCT w) AS v FROM flat WHERE doc_id % 2 = 0),
    bc AS (SELECT prev, cur, count(*) AS cnt FROM bg
           WHERE doc_id % 2 = 0 GROUP BY prev, cur),
    cc AS (SELECT prev, sum(cnt) AS cnt, count(*) AS r1 FROM bc
           GROUP BY prev),
    lc AS (SELECT cur, count(*) AS lcnt FROM bc GROUP BY cur),
    tt AS (SELECT count(*) AS nt FROM bc),
    lp AS (SELECT g.doc_id,
                  ln(CASE WHEN c.cnt IS NULL
                          THEN (COALESCE(l.lcnt, 0) + 1.0)
                               / ((tt.nt + v.v)::DOUBLE)
                          ELSE greatest(COALESCE(b.cnt, 0) - 0.75, 0.0)
                                   / c.cnt::DOUBLE
                               + ((0.75 * c.r1::DOUBLE) / c.cnt::DOUBLE)
                                 * ((COALESCE(l.lcnt, 0) + 1.0)
                                    / ((tt.nt + v.v)::DOUBLE))
                     END) AS lp
           FROM bg g
           LEFT JOIN bc b ON b.prev = g.prev AND b.cur = g.cur
           LEFT JOIN cc c ON c.prev = g.prev
           LEFT JOIN lc l ON l.cur = g.cur, tt, v),
    agg AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS logp
            FROM lp GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           ROUND(COALESCE(a.logp, 0.0), 6) AS logp,
           ROUND(exp(-COALESCE(a.logp, 0.0)), 6) AS ppl
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """


def _source_overlap_sql() -> str:
    """Mirror of docs_source_overlap (stages/curation.py): the same
    shingle CTEs as docs_bloom_decontaminate (word fp → seed-17 trigram
    mix64 % 2^31-1), distinct per (source, shingle), then the
    self-join intersection counts + Jaccard over every source pair."""
    t3_lat, t3_ref = _mix_chain("so3", ["t.h0", "t.h1", "t.h2"], [17])
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, source, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id, source,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.source, p.i, wh.fp
           FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.source, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sx AS MATERIALIZED (
        SELECT DISTINCT t.source,
               CAST({t3_ref} % 2147483647 AS BIGINT) AS x
        FROM tri t, {t3_lat}),
    na AS (SELECT source, count(*) AS n FROM sx GROUP BY source),
    inter AS (SELECT a.source AS src_a, b.source AS src_b,
                     count(*) AS n_common
              FROM sx a JOIN sx b ON b.x = a.x AND a.source < b.source
              GROUP BY a.source, b.source),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                     a.n AS n_a, b.n AS n_b
              FROM na a JOIN na b ON a.source < b.source)
    SELECT p.src_a, p.src_b, CAST(p.n_a AS BIGINT) AS n_a,
           CAST(p.n_b AS BIGINT) AS n_b,
           CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
           floor(CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                 / (p.n_a + p.n_b - COALESCE(i.n_common, 0))
                 * 1000000 + 0.5) / 1000000
               AS jaccard
    FROM pairs p LEFT JOIN inter i USING (src_a, src_b)
    ORDER BY src_a, src_b
    """


# per-event-type hourly z-scores: mean/variance from INTEGER sums
# (Σc, Σc²) then the identical IEEE chain as the numpy kernel
_HOURLY_ANOMALY_SQL = """
    WITH h AS (SELECT event_type,
                      CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                          AS hour_epoch,
                      count(*) AS n
               FROM events GROUP BY event_type, hour_epoch),
    st AS (SELECT event_type, count(*) AS cnt, sum(n) AS s,
                  sum(n * n) AS ss
           FROM h GROUP BY event_type),
    z AS (SELECT h.event_type, h.hour_epoch, h.n,
                 CASE WHEN (CAST(st.ss AS DOUBLE) / st.cnt
                            - (CAST(st.s AS DOUBLE) / st.cnt)
                              * (CAST(st.s AS DOUBLE) / st.cnt)) > 0
                      THEN (h.n - CAST(st.s AS DOUBLE) / st.cnt)
                           / sqrt(CAST(st.ss AS DOUBLE) / st.cnt
                                  - (CAST(st.s AS DOUBLE) / st.cnt)
                                    * (CAST(st.s AS DOUBLE) / st.cnt))
                      ELSE 0.0 END AS z
          FROM h JOIN st USING (event_type))
    SELECT event_type, hour_epoch, CAST(n AS BIGINT) AS n,
           ROUND(z, 6) AS z,
           CAST(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END AS BIGINT)
               AS is_anomaly
    FROM z ORDER BY event_type, hour_epoch
"""


def _minhash_estimate_sql(k: int = 16, n_bands: int = 8,
                          final: str | None = None) -> str:
    """Mirror of docs_minhash_estimate (stages/dedup.py): the bloom-SQL
    shingle CTEs, permutation params a=mix64(7,1,j)%(M−1)+1 /
    b=mix64(7,2,j)%M, signatures min((a·x+b)%M) per (doc, j), band hash
    mix64(band, s0, s1), bucket candidate pairs (no cap), then
    estimate = #equal components / k next to the exact shingle Jaccard."""
    r = k // n_bands
    assert r == 2, "mirror pivots exactly two rows per band"
    t3_lat, t3_ref = _mix_chain("me3", ["t.h0", "t.h1", "t.h2"], [17])
    a_lat, a_ref = _mix_chain("mea", ["js.j"], [7, 1])
    b_lat, b_ref = _mix_chain("meb", ["js.j"], [7, 2])
    bh_lat, bh_ref = _mix_chain("meh", ["bd.band", "bd.s0", "bd.s1"], [])
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS MATERIALIZED (
        SELECT DISTINCT t.doc_id,
               CAST({t3_ref} % 2147483647 AS BIGINT) AS x
        FROM tri t, {t3_lat}),
    js AS (SELECT range AS j FROM range({k})),
    perm AS MATERIALIZED (
        SELECT js.j,
               CAST(({a_ref}) % 2147483646 AS BIGINT) + 1 AS a,
               CAST(({b_ref}) % 2147483647 AS BIGINT) AS b
        FROM js, {a_lat}, {b_lat}),
    sig AS MATERIALIZED (
        SELECT s.doc_id, p.j, min((p.a * s.x + p.b) % 2147483647) AS sig
        FROM sh s CROSS JOIN perm p GROUP BY s.doc_id, p.j),
    bd AS (SELECT doc_id, j // {r} AS band,
                  max(CASE WHEN j % {r} = 0 THEN sig END) AS s0,
                  max(CASE WHEN j % {r} = 1 THEN sig END) AS s1
           FROM sig GROUP BY doc_id, j // {r}),
    bh AS MATERIALIZED (
        SELECT bd.doc_id, bd.band, {bh_ref} AS h FROM bd, {bh_lat}),
    cand AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bh x JOIN bh y ON y.band = x.band AND y.h = x.h
                           AND x.doc_id < y.doc_id),
    eq AS (SELECT c.a, c.b, count(*) AS n_eq
           FROM cand c
           JOIN sig sa ON sa.doc_id = c.a
           JOIN sig sb ON sb.doc_id = c.b AND sb.j = sa.j
                      AND sb.sig = sa.sig
           GROUP BY c.a, c.b),
    inter AS (SELECT c.a, c.b, count(*) AS ni
              FROM cand c
              JOIN sh xa ON xa.doc_id = c.a
              JOIN sh xb ON xb.doc_id = c.b AND xb.x = xa.x
              GROUP BY c.a, c.b),
    cn AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    {final if final is not None else f'''
    SELECT c.a, c.b,
           floor(COALESCE(e.n_eq, 0) / {float(k)}
                 * 1000000 + 0.5) / 1000000 AS est_j,
           floor(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                 / (ca.n + cb.n - COALESCE(i.ni, 0))
                 * 1000000 + 0.5) / 1000000 AS true_j,
           floor(abs(COALESCE(e.n_eq, 0) / {float(k)}
                     - CAST(COALESCE(i.ni, 0) AS DOUBLE)
                       / (ca.n + cb.n - COALESCE(i.ni, 0)))
                 * 1000000 + 0.5) / 1000000
               AS abs_err
    FROM cand c
    LEFT JOIN eq e ON e.a = c.a AND e.b = c.b
    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN cn ca ON ca.doc_id = c.a
    JOIN cn cb ON cb.doc_id = c.b
    ORDER BY c.a, c.b'''}
    """


def _novelty_sql() -> str:
    """Exact mirror of docs_ngram_novelty
    (stages/curation.py:ngram_novelty): the minhash shingle chain
    (word fingerprints → mix64(17, h0, h1, h2) % 2^31−1, distinct per
    doc), first occurrence via min(doc_id), all-integer counts."""
    t3_lat, t3_ref = _mix_chain("nv3", ["t.h0", "t.h1", "t.h2"], [17])
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS MATERIALIZED (
        SELECT DISTINCT t.doc_id,
               CAST({t3_ref} % 2147483647 AS BIGINT) AS x
        FROM tri t, {t3_lat}),
    fo AS (SELECT x, min(doc_id) AS fd FROM sh GROUP BY x),
    nv AS (SELECT fd AS doc_id, count(*)::BIGINT AS n_novel FROM fo
           GROUP BY fd),
    ns AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM sh
           GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(ns.n_shingles, 0) AS n_shingles,
           COALESCE(nv.n_novel, 0) AS n_novel,
           floor(COALESCE(nv.n_novel, 0)
                 / greatest(COALESCE(ns.n_shingles, 0), 1)::DOUBLE
                 * 1000000 + 0.5) / 1000000
               AS novelty
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
    LEFT JOIN ns USING (doc_id) LEFT JOIN nv USING (doc_id)
    ORDER BY d.doc_id
    """


_CONTAINMENT_FINAL = """
    SELECT c.a, c.b,
           CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
           floor(COALESCE(i.ni, 0) / greatest(ca.n, 1)::DOUBLE
                 * 1000000 + 0.5) / 1000000
               AS cont_a,
           floor(COALESCE(i.ni, 0) / greatest(cb.n, 1)::DOUBLE
                 * 1000000 + 0.5) / 1000000
               AS cont_b
    FROM cand c
    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN cn ca ON ca.doc_id = c.a
    JOIN cn cb ON cb.doc_id = c.b
    ORDER BY c.a, c.b
"""


def _srp_estimate_sql(k: int = 16, n: int = 50) -> str:
    """Exact mirror of embeddings_srp_estimate: the rp sign chain
    (mix64(211, d, j) % 2) restricted to vec_id < n, bits = rounded
    scaled projection > 0, per-pair Hamming -> cos(pi*h/k) vs exact
    cosine (DOUBLE[] cast per rule 19)."""
    lat, ref = _mix_chain("se", ["sg0.d", "sg0.j"], [211])
    return f"""
    WITH sub AS MATERIALIZED (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < {n}),
    flat AS (SELECT vec_id, unnest(v) AS x,
                    (generate_subscripts(v, 1) - 1)::BIGINT AS d
             FROM sub),
    dims AS (SELECT DISTINCT d FROM flat),
    js AS (SELECT range AS j FROM range({k})),
    sg0 AS (SELECT d, j FROM dims, js),
    sg AS MATERIALIZED (SELECT sg0.d, sg0.j,
                CASE WHEN {ref} % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
           FROM sg0, {lat}),
    bits AS MATERIALIZED (
        SELECT f.vec_id, sg.j,
               CASE WHEN ROUND(sum(f.x * sg.s) / sqrt({k}.0), 6) > 0
                    THEN 1 ELSE 0 END AS b
        FROM flat f JOIN sg ON sg.d = f.d GROUP BY f.vec_id, sg.j),
    pr AS (SELECT a.vec_id AS ida, b.vec_id AS idb, a.v AS va, b.v AS vb
           FROM sub a JOIN sub b ON a.vec_id < b.vec_id),
    ham AS (SELECT ba.vec_id AS ida, bb.vec_id AS idb,
                   sum(CASE WHEN ba.b <> bb.b THEN 1 ELSE 0 END)::BIGINT
                       AS h
            FROM bits ba JOIN bits bb
              ON ba.j = bb.j AND ba.vec_id < bb.vec_id
            GROUP BY ba.vec_id, bb.vec_id)
    SELECT p.ida, p.idb, ham.h,
           ROUND(cos(pi() * ham.h / {k}.0), 6) AS est_cos,
           ROUND(list_cosine_similarity(p.va, p.vb), 6) AS true_cos,
           ROUND(abs(cos(pi() * ham.h / {k}.0)
                     - list_cosine_similarity(p.va, p.vb)), 6) AS err
    FROM pr p JOIN ham ON ham.ida = p.ida AND ham.idb = p.idb
    ORDER BY p.ida, p.idb
    """


def _rp_sql(k: int = 8) -> str:
    """Exact mirror of embeddings_rp_project (stages/ann.py): sign matrix
    S[d,j] = +1 iff mix64(211, d, j) % 2 = 0, y_j = Σ_d x_d·S[d,j] /
    sqrt(k), rounded 6 dp; code packs the rounded signs."""
    lat, ref = _mix_chain("rp", ["sg0.d", "sg0.j"], [211])
    pcols = ",\n           ".join(
        f"ROUND(SUM(CASE WHEN j = {j} THEN v END) / sqrt({k}.0), 6) AS p{j}"
        for j in range(k))
    code = " + ".join(
        f"(CASE WHEN p{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(k))
    return f"""
    WITH flat AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                         unnest(embedding)::DOUBLE AS x,
                         (generate_subscripts(embedding, 1) - 1)::BIGINT
                             AS d
                  FROM embeddings),
    dims AS (SELECT DISTINCT d FROM flat),
    js AS (SELECT range AS j FROM range({k})),
    sg0 AS (SELECT d, j FROM dims, js),
    sg AS (SELECT sg0.d, sg0.j,
                  CASE WHEN {ref} % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
           FROM sg0, {lat}),
    proj AS (SELECT f.vec_id, sg.j, sum(f.x * sg.s) AS v
             FROM flat f JOIN sg ON sg.d = f.d GROUP BY f.vec_id, sg.j),
    piv AS (SELECT vec_id,
           {pcols}
            FROM proj GROUP BY vec_id)
    SELECT vec_id, {", ".join(f"p{j}" for j in range(k))},
           CAST({code} AS BIGINT) AS code
    FROM piv ORDER BY vec_id
    """


def _dup_spans_sql(ngram: int = 3) -> str:
    """Exact mirror of docs_remove_dup_spans (stages/curation.py):
    positional word-``ngram`` hashes mix64(73, fp(lower(w_i))..) over the
    whitespace tokens, duplicated = ≥2 distinct docs, every covered
    token dropped, text rebuilt by joining kept tokens with spaces."""
    aliases = [chr(ord("a") + j) for j in range(ngram)]
    lat, ref = _mix_chain("dsp", [f"{al}.fp" for al in aliases], [73])
    joins = " ".join(
        f"JOIN fl {aliases[j]} ON {aliases[j]}.doc_id = a.doc_id "
        f"AND {aliases[j]}.p = a.p + {j}"
        for j in range(1, ngram))
    h64 = (f"CASE WHEN {ref} >= 9223372036854775808::HUGEINT "
           f"THEN {ref} - 18446744073709551616::HUGEINT "
           f"ELSE {ref} END")
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKENS} AS ts
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ts) AS w,
                    (generate_subscripts(ts, 1) - 1)::BIGINT AS p
             FROM toks),
    gw AS (SELECT DISTINCT lower(w) AS lw FROM flat),
    wf AS (SELECT lw, {_wfp_sql('lw')} AS fp FROM gw),
    fl AS (SELECT f.doc_id, f.p, wf.fp
           FROM flat f JOIN wf ON wf.lw = lower(f.w)),
    tri AS (SELECT a.doc_id, a.p, CAST({h64} AS BIGINT) AS h
            FROM fl a {joins}, {lat}),
    dup AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS c
                           FROM tri GROUP BY h) WHERE c >= 2),
    cover AS (SELECT DISTINCT t.doc_id, t.p + o.o AS p
              FROM tri t JOIN dup USING (h),
                   (SELECT range AS o FROM range({ngram})) o),
    kept AS (SELECT f.doc_id, f.p, f.w
             FROM flat f LEFT JOIN cover c
                  ON c.doc_id = f.doc_id AND c.p = f.p
             WHERE c.p IS NULL),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(w, ' ' ORDER BY p) AS text_clean
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id, CAST(length(t.ts) AS BIGINT) AS n_tokens,
           COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.text_clean, '') AS text_clean
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """


def _rel_bm25_terms() -> list[str]:
    from ttmf_ray.pipelines.relational import BM25_TERMS

    return BM25_TERMS


_TFIDF_SQL = """
    WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                      unnest(regexp_extract_all(lower(text),
                                                '[0-9a-z_]+')) AS token
               FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM w
           GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM w
           GROUP BY token),
    n AS (SELECT count(*)::DOUBLE AS n FROM documents),
    s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 ROUND(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0),
                       6) AS tfidf
          FROM tf JOIN df USING (token), n),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, tf DESC, token) AS rk FROM s)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, tfidf
    FROM r WHERE rk <= 5
"""


def _bm25_sql(terms: list[str], k: int = 20, k1: float = 1.2,
              b: float = 0.75) -> str:
    """Exact mirror of docs_bm25 (stages/retrieval.py): Lucene idf
    ln(1+(N-df+.5)/(df+.5)), per-term contributions added LEFT TO RIGHT
    (the same float64 chain as the numpy kernel, so scores are bitwise
    equal), rank on the 6-dp-rounded score then doc_id."""
    tf_cols = ", ".join(
        f"sum(CASE WHEN w = '{t}' THEN 1 ELSE 0 END) AS tf{j}"
        for j, t in enumerate(terms))
    expr = " + ".join(
        f"(ln(1.0 + (st.n - st.df{j} + 0.5) / (st.df{j} + 0.5))"
        f" * (tf{j} * ({k1} + 1.0))"
        f" / (tf{j} + {k1} * (1.0 - {b} + {b} * dl / st.avgdl)))"
        for j in range(len(terms)))
    df_cols = ", ".join(
        f"(SELECT count(*)::DOUBLE FROM tfp WHERE tf{j} > 0) AS df{j}"
        for j in range(len(terms)))
    return f"""
    WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                      unnest(regexp_extract_all(lower(text),
                                                '[0-9a-z_]+')) AS w
               FROM documents),
    dl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  length(regexp_extract_all(lower(text),
                                            '[0-9a-z_]+'))::BIGINT AS dl
           FROM documents),
    tfp AS (SELECT doc_id, {tf_cols} FROM w GROUP BY doc_id),
    st AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                  (SELECT sum(dl)::DOUBLE FROM dl)
                      / (SELECT count(*)::DOUBLE FROM documents) AS avgdl,
                  {df_cols}),
    sc AS (SELECT dl.doc_id, dl.dl, ROUND({expr}, 6) AS score
           FROM dl LEFT JOIN tfp USING (doc_id), st)
    SELECT doc_id, dl, score FROM sc
    ORDER BY score DESC, doc_id LIMIT {k}
    """


def _winnow_sql(ngram: int = 3, window: int = 4) -> str:
    """Exact mirror of docs_winnow (stages/retrieval.py): the dup-spans
    positional n-gram hash CTEs (mix64 seed 73 over word fingerprints),
    then min per ``window`` consecutive hashes with the rightmost
    position of the minimum (max(p) over the in-window matches)."""
    aliases = [chr(ord("a") + j) for j in range(ngram)]
    lat, ref = _mix_chain("wn", [f"{al}.fp" for al in aliases], [73])
    joins = " ".join(
        f"JOIN fl {aliases[j]} ON {aliases[j]}.doc_id = a.doc_id "
        f"AND {aliases[j]}.p = a.p + {j}"
        for j in range(1, ngram))
    h64 = (f"CASE WHEN {ref} >= 9223372036854775808::HUGEINT "
           f"THEN {ref} - 18446744073709551616::HUGEINT "
           f"ELSE {ref} END")
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKENS} AS ts
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ts) AS w,
                    (generate_subscripts(ts, 1) - 1)::BIGINT AS p
             FROM toks),
    gw AS (SELECT DISTINCT lower(w) AS lw FROM flat),
    wf AS (SELECT lw, {_wfp_sql('lw')} AS fp FROM gw),
    fl AS (SELECT f.doc_id, f.p, wf.fp
           FROM flat f JOIN wf ON wf.lw = lower(f.w)),
    tri AS (SELECT a.doc_id, a.p, CAST({h64} AS BIGINT) AS h
            FROM fl a {joins}, {lat}),
    win AS (SELECT doc_id, p,
                   min(h) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {window - 1}
                       FOLLOWING) AS mh,
                   count(*) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {window - 1}
                       FOLLOWING) AS c
            FROM tri),
    sel AS (SELECT f.doc_id, f.mh AS fp, max(t.p) AS pos
            FROM (SELECT * FROM win WHERE c = {window}) f
            JOIN tri t ON t.doc_id = f.doc_id AND t.h = f.mh
                       AND t.p BETWEEN f.p AND f.p + {window - 1}
            GROUP BY f.doc_id, f.p, f.mh)
    SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp FROM sel
    ORDER BY doc_id, pos, fp
    """


_SOURCE_KL_SQL = """
    WITH w AS (SELECT source,
                      unnest(regexp_extract_all(lower(text),
                                                '[0-9a-z_]+')) AS token
               FROM documents),
    st AS (SELECT source, token, count(*) AS cnt FROM w
           GROUP BY source, token),
    gt AS (SELECT token, sum(cnt) AS gcnt FROM st GROUP BY token),
    g AS (SELECT sum(cnt)::DOUBLE AS gtot FROM st),
    stot AS (SELECT source, sum(cnt)::DOUBLE AS stot FROM st
             GROUP BY source)
    SELECT st.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(st.cnt) AS BIGINT) AS n_words,
           ROUND(sum((st.cnt / stot.stot)
                     * ln((st.cnt / stot.stot) / (gt.gcnt / g.gtot))),
                 6) AS kl
    FROM st JOIN gt USING (token) JOIN stot USING (source), g
    GROUP BY st.source ORDER BY st.source
"""


def _weighted_sample_sql(n: int = 50, seed: int = 173) -> str:
    """Exact mirror of docs_weighted_sample (stages/curation.py):
    Efraimidis–Spirakis exponential race, u = (mix64(seed,id)>>11 + 1) /
    2^53, key = -ln(u)/max(w,1) rounded 9 dp, keep the n smallest."""
    lat, ref = _mix_chain("ws2", ["d.doc_id"], [seed])
    return f"""
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           ROUND(-ln((({ref} // 2048)::DOUBLE + 1.0)
                     / 9007199254740992.0)
                 / greatest(d.n_chars::DOUBLE, 1.0), 9) AS key
    FROM documents d, {lat}
    ORDER BY key, doc_id LIMIT {n}
    """


_COLLOCATIONS_SQL = """
    WITH dt AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-z_]+') AS ws
                FROM documents),
    flat AS (SELECT doc_id, unnest(ws) AS w,
                    (generate_subscripts(ws, 1) - 1)::BIGINT AS p
             FROM dt),
    uni AS (SELECT w, count(*)::DOUBLE AS c FROM flat GROUP BY w),
    wt AS (SELECT sum(c) AS w_tot FROM uni),
    bg AS (SELECT f1.w AS a, f2.w AS b, count(*) AS cnt
           FROM flat f1 JOIN flat f2
                ON f2.doc_id = f1.doc_id AND f2.p = f1.p + 1
           GROUP BY f1.w, f2.w),
    tt AS (SELECT sum(cnt)::DOUBLE AS t_tot FROM bg),
    s AS (SELECT bg.a, bg.b, bg.cnt,
                 ROUND(ln((bg.cnt / tt.t_tot)
                          / ((ua.c / wt.w_tot) * (ub.c / wt.w_tot))),
                       6) AS pmi
          FROM bg JOIN uni ua ON ua.w = bg.a
                  JOIN uni ub ON ub.w = bg.b, tt, wt
          WHERE bg.cnt >= 5)
    SELECT a, b, CAST(cnt AS BIGINT) AS cnt, pmi FROM s
    ORDER BY pmi DESC, a, b LIMIT 50
"""

def _sb_ppl_sql() -> str:
    return """
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         list_transform(""" + _TOKENS + """,
                                        t -> lower(t)) AS ts
                  FROM documents),
    flat AS MATERIALIZED (
        SELECT doc_id, unnest(ts) AS w,
               (generate_subscripts(ts, 1) - 1)::BIGINT AS p
        FROM toks),
    tg AS MATERIALIZED (
        SELECT f1.doc_id, f1.w AS w1, f2.w AS w2, f3.w AS w3
        FROM flat f1
        JOIN flat f2 ON f2.doc_id = f1.doc_id AND f2.p = f1.p + 1
        JOIN flat f3 ON f3.doc_id = f1.doc_id AND f3.p = f1.p + 2),
    tc AS MATERIALIZED (
        SELECT w1, w2, w3, count(*)::BIGINT AS c FROM tg
        WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
    p12 AS (SELECT w1, w2, sum(c)::BIGINT AS c FROM tc GROUP BY w1, w2),
    bgm AS MATERIALIZED (
        SELECT f1.w AS w1, f2.w AS w2, count(*)::BIGINT AS c
        FROM flat f1 JOIN flat f2
             ON f2.doc_id = f1.doc_id AND f2.p = f1.p + 1
        WHERE f1.doc_id % 2 = 0 GROUP BY f1.w, f2.w),
    p1 AS (SELECT w1, sum(c)::BIGINT AS c FROM bgm GROUP BY w1),
    un AS (SELECT w, count(*)::BIGINT AS c FROM flat
           WHERE doc_id % 2 = 0 GROUP BY w),
    nv AS (SELECT (SELECT count(*) FROM flat WHERE doc_id % 2 = 0) AS n,
                  (SELECT count(*) FROM un) AS v),
    lp AS (SELECT g.doc_id,
                  ln(CASE WHEN t.c > 0
                          THEN t.c::DOUBLE / x12.c::DOUBLE
                          WHEN b.c > 0
                          THEN 0.4 * b.c::DOUBLE / x1.c::DOUBLE
                          ELSE 0.16 * (COALESCE(u.c, 0) + 1.0)
                               / (nv.n + nv.v) END) AS lp
           FROM tg g
           LEFT JOIN tc t ON t.w1 = g.w1 AND t.w2 = g.w2 AND t.w3 = g.w3
           LEFT JOIN p12 x12 ON x12.w1 = g.w1 AND x12.w2 = g.w2
           LEFT JOIN bgm b ON b.w1 = g.w2 AND b.w2 = g.w3
           LEFT JOIN p1 x1 ON x1.w1 = g.w2
           LEFT JOIN un u ON u.w = g.w3, nv),
    agg AS (SELECT doc_id, count(*) AS n_trigrams, avg(lp) AS logs
            FROM lp GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           ROUND(COALESCE(a.logs, 0.0), 6) AS logs,
           ROUND(exp(-COALESCE(a.logs, 0.0)), 6) AS sb_ppl
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """


_KCORE_SQL = """
    WITH RECURSIVE li AS MATERIALIZED (
        SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                        CAST(l_partkey AS BIGINT) AS p
        FROM lineitem),
    ed AS MATERIALIZED (
        SELECT DISTINCT x.p AS a, y.p AS b
        FROM li x JOIN li y ON y.o = x.o AND y.p > x.p),
    sym AS MATERIALIZED (
        SELECT a AS u, b AS v FROM ed
        UNION ALL SELECT b, a FROM ed),
    core(it, u, v) AS (
        SELECT 0, u, v FROM sym
        UNION ALL
        SELECT x.it + 1, x.u, x.v
        FROM (SELECT y.*,
                     min(CASE WHEN y.du >= 60 AND y.dv >= 60
                              THEN 1 ELSE 0 END) OVER () AS allkept
              FROM (SELECT p.it, p.u, p.v,
                           count(*) OVER (PARTITION BY p.u) AS du,
                           count(*) OVER (PARTITION BY p.v) AS dv
                    FROM core p WHERE p.it < 100) y) x
        WHERE x.du >= 60 AND x.dv >= 60 AND x.allkept = 0
    ),
    last AS (SELECT u, it FROM core QUALIFY it = max(it) OVER ())
    SELECT u AS node, count(*)::BIGINT AS deg
    FROM last GROUP BY u ORDER BY node
"""


_KNN_RANKED = """
    s AS MATERIALIZED (
        SELECT CAST(a.vec_id AS BIGINT) AS va,
               CAST(b.vec_id AS BIGINT) AS vb,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]),
                     6) AS cs
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
    r AS MATERIALIZED (
        SELECT va, vb, cs, rk FROM (
            SELECT va, vb, cs,
                   row_number() OVER (PARTITION BY va
                                      ORDER BY cs DESC, vb) AS rk
            FROM s)
        WHERE rk <= 5)
"""

_KNN_GRAPH_SQL = f"""
    WITH {_KNN_RANKED}
    SELECT va AS vec_id, vb AS nbr_id, cs AS cosine,
           rk::BIGINT AS rank
    FROM r ORDER BY vec_id, rank
"""

_KNN_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_KNN_RANKED},
    mu AS MATERIALIZED (
        SELECT x.va AS a, x.vb AS b
        FROM r x JOIN r y ON y.va = x.vb AND y.vb = x.va
        WHERE x.va < x.vb),
    nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT a AS n FROM mu UNION ALL SELECT b FROM mu)),
    esym AS MATERIALIZED (
        SELECT a AS u, b AS v FROM mu
        UNION ALL SELECT b, a FROM mu
        UNION ALL SELECT n, n FROM nodes),
    lab(it, node, l, chg) AS (
        SELECT 0, n, n, 1::BIGINT FROM nodes
        UNION ALL
        SELECT x.it + 1, x.node, x.nl,
               SUM(CASE WHEN x.nl < x.ol THEN 1 ELSE 0 END) OVER ()
        FROM (SELECT p.it, e.v AS node, MIN(p.l) AS nl,
                     MIN(CASE WHEN e.u = e.v THEN p.l END) AS ol
              FROM lab p JOIN esym e ON e.u = p.node
              WHERE p.chg > 0 AND p.it < 100
              GROUP BY p.it, e.v) x
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(l AS BIGINT) AS component
    FROM lab QUALIFY it = MAX(it) OVER ()
    ORDER BY node
"""


def _blocklist_sql() -> str:
    from ttmf_ray.pipelines.relational import BLOCK_TERMS

    lst = ", ".join(f"'{t}'" for t in sorted(BLOCK_TERMS))
    return f"""
    WITH flat AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               unnest(regexp_extract_all(lower(text),
                                         '[0-9a-z_]+')) AS w
        FROM documents),
    h AS (SELECT doc_id, count(*)::BIGINT AS n_hits,
                 count(DISTINCT w)::BIGINT AS n_terms
          FROM flat WHERE w IN ({lst}) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
           COALESCE(h.n_terms, 0)::BIGINT AS n_terms,
           CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END::BIGINT AS keep
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
    LEFT JOIN h USING (doc_id)
    ORDER BY doc_id
    """


def _rel_phrase() -> list[str]:
    from ttmf_ray.pipelines.relational import PHRASE_QUERY

    return PHRASE_QUERY


def _phrase_sql(phrase: list[str]) -> str:
    """Exact mirror of docs_phrase_search (stages/invindex.py): the
    positional self-join chain over the flat `[0-9a-z_]+` word table —
    term i of the phrase at position p + i."""
    joins = " ".join(
        f"JOIN flat f{i} ON f{i}.doc_id = f0.doc_id "
        f"AND f{i}.p = f0.p + {i}"
        for i in range(1, len(phrase)))
    conds = " AND ".join(
        f"f{i}.w = '{w}'" for i, w in enumerate(phrase))
    return f"""
    WITH dt AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-z_]+') AS ws
                FROM documents),
    flat AS MATERIALIZED (
        SELECT doc_id, unnest(ws) AS w,
               (generate_subscripts(ws, 1) - 1)::BIGINT AS p
        FROM dt)
    SELECT f0.doc_id, f0.p AS start_pos
    FROM flat f0 {joins}
    WHERE {conds}
    ORDER BY f0.doc_id, start_pos
    """


def _hybrid_rrf_sql(n_list: int = 50, k: int = 20, kr: int = 60) -> str:
    """Exact mirror of docs_hybrid_rrf (stages/retrieval.py): the BM25
    mirror runs as a nested-WITH CTE for the top-n_list list, the
    cosine list is the brute ANN ordering, ranks are row_number over the
    6-dp-rounded scores (id tie-break), and the fused score is the
    rank-rational sum — integers in, so both engines agree exactly."""
    bm25 = _bm25_sql(_rel_bm25_terms(), k=n_list)
    return f"""
    WITH bmtop AS MATERIALIZED ({bm25}),
    bm AS (SELECT doc_id,
                  row_number() OVER (ORDER BY score DESC, doc_id)
                      AS bm25_rank
           FROM bmtop),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id = 0),
    ctop AS MATERIALIZED (
        SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cs
        FROM embeddings e, q
        ORDER BY cs DESC, e.vec_id LIMIT {n_list}),
    cr AS (SELECT vec_id AS doc_id,
                  row_number() OVER (ORDER BY ROUND(cs, 6) DESC, vec_id)
                      AS cos_rank
           FROM ctop),
    f AS (SELECT COALESCE(bm.doc_id, cr.doc_id) AS doc_id,
                 COALESCE(bm.bm25_rank, 0)::BIGINT AS bm25_rank,
                 COALESCE(cr.cos_rank, 0)::BIGINT AS cos_rank,
                 ROUND(CASE WHEN bm.bm25_rank IS NULL THEN 0.0
                            ELSE 1.0 / ({kr} + bm.bm25_rank) END
                       + CASE WHEN cr.cos_rank IS NULL THEN 0.0
                              ELSE 1.0 / ({kr} + cr.cos_rank) END,
                       6) AS rrf
          FROM bm FULL OUTER JOIN cr ON cr.doc_id = bm.doc_id)
    SELECT doc_id, bm25_rank, cos_rank, rrf FROM f
    ORDER BY rrf DESC, doc_id LIMIT {k}
    """


def _cdc_sql(ngram: int = 3, mod: int = 8, min_occ: int = 2) -> str:
    """Exact mirror of docs_cdc_dedup (stages/curation.py): the
    dup-span positional window hashes (mix64 seed 73), boundary flag
    where the uint64 hash % mod == 0, chunk id = count of boundaries
    strictly before the token (window frame ... 1 PRECEDING), chunk
    content = lowercase tokens joined by ' ' → md5, then one groupby."""
    aliases = [chr(ord("a") + j) for j in range(ngram)]
    lat, ref = _mix_chain("cd", [f"{al}.fp" for al in aliases], [73])
    joins = " ".join(
        f"JOIN fl {aliases[j]} ON {aliases[j]}.doc_id = a.doc_id "
        f"AND {aliases[j]}.p = a.p + {j}"
        for j in range(1, ngram))
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKENS} AS ts
                  FROM documents),
    flat AS MATERIALIZED (
        SELECT doc_id, unnest(ts) AS w,
               (generate_subscripts(ts, 1) - 1)::BIGINT AS p
        FROM toks),
    gw AS (SELECT DISTINCT lower(w) AS lw FROM flat),
    wf AS (SELECT lw, {_wfp_sql('lw')} AS fp FROM gw),
    fl AS MATERIALIZED (
        SELECT f.doc_id, f.p, wf.lw, wf.fp
        FROM flat f JOIN wf ON wf.lw = lower(f.w)),
    bnd AS MATERIALIZED (
        SELECT a.doc_id, a.p
        FROM fl a {joins}, {lat}
        WHERE {ref} % {mod} = 0),
    tc AS (SELECT f.doc_id, f.p, f.lw,
                  COALESCE(sum(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END)
                      OVER (PARTITION BY f.doc_id ORDER BY f.p
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS chunk
           FROM fl f LEFT JOIN bnd b
                ON b.doc_id = f.doc_id AND b.p = f.p),
    ch AS (SELECT doc_id, chunk, count(*)::BIGINT AS n_tokens,
                  md5(string_agg(lw, ' ' ORDER BY p)) AS chunk_md5
           FROM tc GROUP BY doc_id, chunk),
    oc AS (SELECT chunk_md5, n_tokens, doc_id, count(*)::BIGINT AS occ
           FROM ch GROUP BY chunk_md5, n_tokens, doc_id)
    SELECT chunk_md5, max(n_tokens)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_docs, sum(occ)::BIGINT AS n_occ
    FROM oc GROUP BY chunk_md5
    HAVING sum(occ) >= {min_occ}
    ORDER BY chunk_md5
    """


def _bpe_sql(k: int = 8, tail: str | None = None) -> str:
    """Exact mirror of docs_bpe_merges (stages/bpe.py): K unrolled merge
    rounds over the word-frequency table.  Per round: lead() adjacency →
    weighted pair counts → argmax (c DESC, a, b — all integers/strings,
    zero float drift) → leftmost-greedy non-overlap matching via the
    row_number-parity trick (runs of consecutive match positions keep
    odd ranks) → renumbered symbol table.  Every multiply-referenced CTE
    is MATERIALIZED (CLAUDE.md: DuckDB inlines level-unrolled CTEs
    exponentially otherwise)."""
    parts = ["""
    WITH wc AS MATERIALIZED (
        SELECT w AS word, count(*)::BIGINT AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                                               '[0-9a-z_]+')) AS w
              FROM documents)
        GROUP BY w),
    s0 AS MATERIALIZED (
        SELECT word, cnt, unnest(cs) AS sym,
               (generate_subscripts(cs, 1) - 1)::BIGINT AS p
        FROM (SELECT word, cnt, regexp_extract_all(word, '.') AS cs
              FROM wc))"""]
    for r in range(1, k + 1):
        parts.append(f""",
    a{r} AS MATERIALIZED (
        SELECT word, cnt, p, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY p) AS nxt
        FROM s{r - 1}),
    b{r} AS MATERIALIZED (
        SELECT sym AS a, nxt AS b, sum(cnt) AS c FROM a{r}
        WHERE nxt IS NOT NULL GROUP BY sym, nxt
        ORDER BY c DESC, a, b LIMIT 1),
    k{r} AS MATERIALIZED (
        SELECT word, p FROM (
            SELECT word, p,
                   row_number() OVER (PARTITION BY word, grp
                                      ORDER BY p) AS j
            FROM (SELECT m.word, m.p,
                         m.p - row_number() OVER (PARTITION BY m.word
                                                  ORDER BY m.p) AS grp
                  FROM a{r} m, b{r} bb
                  WHERE m.sym = bb.a AND m.nxt = bb.b))
        WHERE j % 2 = 1),
    s{r} AS MATERIALIZED (
        SELECT word, cnt,
               row_number() OVER (PARTITION BY word ORDER BY p) - 1 AS p,
               sym
        FROM (SELECT x.word, x.cnt, x.p,
                     CASE WHEN kk.p IS NOT NULL THEN x.sym || x.nxt
                          ELSE x.sym END AS sym
              FROM a{r} x
              LEFT JOIN k{r} kk ON kk.word = x.word AND kk.p = x.p
              LEFT JOIN k{r} dd ON dd.word = x.word AND dd.p = x.p - 1
              WHERE dd.p IS NULL))""")
    if tail is not None:
        parts.append(tail)
        return "".join(parts)
    unions = "\n        UNION ALL ".join(
        f"SELECT {r}::BIGINT AS step, a AS lhs, b AS rhs,"
        f" c::BIGINT AS cnt FROM b{r}"
        for r in range(1, k + 1))
    parts.append(f"""
    SELECT * FROM (
        {unions})
    ORDER BY step
    """)
    return "".join(parts)


def _bfs_layers_sql(depth: int = 4) -> str:
    """Mirror of kg_bfs_layers: unrolled level CTEs with NOT-EXISTS
    cumulative visited sets; a seeds x depths grid left-joins the
    per-level counts so zero-expansion levels emit 0 rows like the Ray
    side."""
    seeds = "(0), (10), (20), (30), (40)"
    ctes = [f"""sd AS (SELECT node AS seed FROM (VALUES {seeds})
                       AS v(node)
                WHERE node <= (SELECT max(greatest(h, t)) FROM ed))"""]
    prev_sets = []
    for d in range(1, depth + 1):
        src = "sd" if d == 1 else f"l{d - 1}"
        src_node = "seed" if d == 1 else "node"
        not_in = " AND ".join(
            f"NOT EXISTS (SELECT 1 FROM l{i} x "
            f"WHERE x.seed = p.seed AND x.node = e.t)"
            for i in prev_sets)
        cond = f"e.t <> p.seed" + (f" AND {not_in}" if not_in else "")
        ctes.append(f"""l{d} AS MATERIALIZED (
            SELECT DISTINCT p.seed, e.t AS node
            FROM ed e JOIN {src} p ON e.h = p.{src_node}
            WHERE {cond})""")
        prev_sets.append(d)
    counts = " UNION ALL ".join(
        f"SELECT seed, {d} AS depth, count(*)::BIGINT AS n_new "
        f"FROM l{d} GROUP BY seed" for d in range(1, depth + 1))
    grid = (f"SELECT s.seed, g.depth FROM sd s, "
            f"(SELECT unnest(range(1, {depth + 1})) AS depth) g")
    return f"""
    WITH idm AS MATERIALIZED ({_IDMAPPED_SQL}),
    ed AS MATERIALIZED (SELECT DISTINCT h, t FROM idm),
    {','.join(ctes)},
    cnt AS ({counts})
    SELECT gr.seed::BIGINT AS seed, gr.depth::BIGINT AS depth,
           COALESCE(c.n_new, 0)::BIGINT AS n_new
    FROM ({grid}) gr LEFT JOIN cnt c USING (seed, depth)
    ORDER BY seed, depth
"""


def _triangles_sql(edge_ctes: str) -> str:
    """Shared 3-way-join triangle mirror over any MATERIALIZED ``ed``
    CTE of DISTINCT oriented a<b undirected edges (part co-occurrence
    projection / symmetrized KG)."""
    return f"""
    WITH {edge_ctes},
    tri AS MATERIALIZED (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM ed e1
        JOIN ed e2 ON e2.a = e1.b
        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
    tn AS (SELECT node, count(*)::BIGINT AS tri FROM (
               SELECT u AS node FROM tri
               UNION ALL SELECT v FROM tri
               UNION ALL SELECT w FROM tri)
           GROUP BY node),
    dg AS (SELECT node, count(*)::BIGINT AS deg FROM (
               SELECT a AS node FROM ed
               UNION ALL SELECT b FROM ed)
           GROUP BY node)
    SELECT dg.node, dg.deg,
           COALESCE(tn.tri, 0)::BIGINT AS tri,
           floor((CASE WHEN dg.deg >= 2
                      THEN 2.0 * COALESCE(tn.tri, 0)::DOUBLE
                           / (dg.deg::DOUBLE * (dg.deg::DOUBLE - 1.0))
                      ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS coeff
    FROM dg LEFT JOIN tn USING (node)
    ORDER BY node
"""


_TRIANGLES_SQL = _triangles_sql("""li AS MATERIALIZED (
        SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                        CAST(l_partkey AS BIGINT) AS p
        FROM lineitem),
    ed AS MATERIALIZED (
        SELECT DISTINCT x.p AS a, y.p AS b
        FROM li x JOIN li y ON y.o = x.o AND y.p > x.p)""")




_KG_COMPONENTS_SQL = f"""
    WITH RECURSIVE edges AS MATERIALIZED ({_EDGES_SQL}),
    names AS MATERIALIZED (
        -- NOT `a UNION b`: inside WITH RECURSIVE DuckDB treats a CTE's
        -- top-level UNION as the recursion split and skips the dedup
        SELECT DISTINCT name FROM (
            SELECT subj AS name FROM edges
            UNION ALL SELECT obj FROM edges)),
    ents AS MATERIALIZED (
        SELECT name, row_number() OVER (ORDER BY name) - 1 AS id
        FROM names),
    vp AS MATERIALIZED (
        SELECT eh.id AS a, et.id AS b
        FROM edges e
        JOIN ents eh ON e.subj = eh.name
        JOIN ents et ON e.obj = et.name
        WHERE e.pred <> 'in_region'),
    nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT a AS n FROM vp UNION ALL SELECT b FROM vp)),
    esym AS MATERIALIZED (
        SELECT a AS u, b AS v FROM vp
        UNION ALL SELECT b, a FROM vp
        UNION ALL SELECT n, n FROM nodes),
    lab(it, node, l, chg) AS (
        SELECT 0, n, n, 1::BIGINT FROM nodes
        UNION ALL
        SELECT x.it + 1, x.node, x.nl,
               SUM(CASE WHEN x.nl < x.ol THEN 1 ELSE 0 END) OVER ()
        FROM (SELECT p.it, e.v AS node, MIN(p.l) AS nl,
                     MIN(CASE WHEN e.u = e.v THEN p.l END) AS ol
              FROM lab p JOIN esym e ON e.u = p.node
              WHERE p.chg > 0 AND p.it < 100
              GROUP BY p.it, e.v) x
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(l AS BIGINT) AS component
    FROM lab QUALIFY it = MAX(it) OVER ()
    ORDER BY node
"""




def _bigram_ppl_sql() -> str:
    return """
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         list_transform(""" + _TOKENS + """,
                                        t -> lower(t)) AS ts
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ts) AS w,
                    (generate_subscripts(ts, 1) - 1)::BIGINT AS p
             FROM toks),
    bg AS (SELECT f1.doc_id, f1.w AS prev, f2.w AS cur
           FROM flat f1 JOIN flat f2
                ON f2.doc_id = f1.doc_id AND f2.p = f1.p + 1),
    v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM flat
          WHERE doc_id % 2 = 0),
    bc AS (SELECT prev, cur, count(*) AS cnt FROM bg
           WHERE doc_id % 2 = 0 GROUP BY prev, cur),
    cc AS (SELECT prev, sum(cnt) AS cnt FROM bc GROUP BY prev),
    lp AS (SELECT g.doc_id,
                  ln((COALESCE(b.cnt, 0) + 1.0)
                     / (COALESCE(c.cnt, 0) + v.v)) AS lp
           FROM bg g
           LEFT JOIN bc b ON b.prev = g.prev AND b.cur = g.cur
           LEFT JOIN cc c ON c.prev = g.prev, v),
    agg AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS logp
            FROM lp GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           ROUND(COALESCE(a.logp, 0.0), 6) AS logp,
           ROUND(exp(-COALESCE(a.logp, 0.0)), 6) AS ppl
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
"""


_COHORT_RETENTION_SQL = """
    WITH ud AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
                FROM events),
    co AS (SELECT user_id, min(day) AS cohort_day FROM ud
           GROUP BY user_id)
    SELECT co.cohort_day, ud.day - co.cohort_day AS "offset",
           CAST(count(*) AS BIGINT) AS n_users
    FROM ud JOIN co USING (user_id)
    WHERE ud.day - co.cohort_day <= 13
    GROUP BY co.cohort_day, ud.day - co.cohort_day
    ORDER BY cohort_day, "offset"
"""

_FUNNEL_SQL = """
    WITH m AS (SELECT user_id, event_type, min(ts) AS t FROM events
               WHERE event_type IN ('view', 'click', 'purchase')
               GROUP BY user_id, event_type),
    p AS (SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN t END) AS t0,
                 min(CASE WHEN event_type = 'click' THEN t END) AS t1,
                 min(CASE WHEN event_type = 'purchase' THEN t END) AS t2
          FROM m GROUP BY user_id)
    SELECT 0::BIGINT AS step, 'view' AS event_type,
           CAST(count(*) FILTER (WHERE t0 IS NOT NULL) AS BIGINT)
               AS n_users FROM p
    UNION ALL
    SELECT 1, 'click',
           CAST(count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0)
                AS BIGINT) FROM p
    UNION ALL
    SELECT 2, 'purchase',
           CAST(count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0
                                 AND t2 > t1) AS BIGINT) FROM p
"""


def _simhash_sql() -> str:
    """Exact mirror of docs_simhash: distinct lowercase \\w+ words, word
    hash mix64(13, rolling-fp(w)), ±1 per bit, sign-bit reassembly; the
    uint64 fingerprint is emitted as its two's-complement BIGINT (the Ray
    side emits the int64 view for the same reason)."""
    lat, ref = _mix_chain("sw", ["wh0.fp"], [13])
    return f"""
    WITH dw AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
        FROM documents
    ),
    gw AS (SELECT DISTINCT w FROM dw),
    wh0 AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    wh AS (SELECT wh0.w, {ref} AS h FROM wh0, {lat}),
    bits AS (
        SELECT d.doc_id, b.b,
               CASE WHEN (wh.h >> b.b) & 1 = 1 THEN 1 ELSE -1 END AS v
        FROM dw d JOIN wh ON wh.w = d.w
        CROSS JOIN (SELECT range AS b FROM range(64)) b
    ),
    acc AS (SELECT doc_id, b, sum(v) AS s FROM bits GROUP BY doc_id, b),
    sim AS (SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::HUGEINT << b)
                            ELSE 0::HUGEINT END) AS v
            FROM acc GROUP BY doc_id)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(CASE WHEN COALESCE(s.v, 0::HUGEINT)
                          >= 9223372036854775808::HUGEINT
                     THEN COALESCE(s.v, 0::HUGEINT)
                          - 18446744073709551616::HUGEINT
                     ELSE COALESCE(s.v, 0::HUGEINT) END AS BIGINT) AS simhash
    FROM documents d LEFT JOIN sim s USING (doc_id)
    """


def _minhash_dedup_sql() -> str:
    """Exact mirror of docs_minhash_dedup: planted every-20th-word
    mutations, mix64 shingle/permutation/band hashes (stages/dedup.py —
    no RNG, no crc32), all-pairs-with-cap-50 LSH buckets, and hash-set
    Jaccard ≥ 0.5 verification."""
    t3_lat, t3_ref = _mix_chain("t3", ["t.h0", "t.h1", "t.h2"], [17])
    pa_lat, pa_ref = _mix_chain("pa", ["j.j"], [7, 1])
    pb_lat, pb_ref = _mix_chain("pb", ["j.j"], [7, 2])
    bh_lat, bh_ref = _mix_chain(
        "bh", ["b.band", "b.s0", "b.s1", "b.s2", "b.s3"], [])
    return f"""
    WITH np AS (SELECT greatest(5, count(*) // 20) AS n FROM documents),
    docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
        UNION ALL
        SELECT CAST(doc_id + 10000000 AS BIGINT),
               array_to_string(
                   list_transform(string_split(text, ' '),
                       (w, i) -> CASE WHEN (i - 1) % 20 = 0
                                      THEN w || 'x' ELSE w END),
                   ' ')
        FROM documents, np WHERE doc_id < np.n
    ),
    wl AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
           FROM docs),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS (SELECT DISTINCT t.doc_id,
                  CAST({t3_ref} % 2147483647 AS BIGINT) AS x
           FROM tri t, {t3_lat}),
    perms AS (SELECT j.j AS j,
                     CAST({pa_ref} % 2147483646 AS BIGINT) + 1 AS a,
                     CAST({pb_ref} % 2147483647 AS BIGINT) AS b
              FROM (SELECT range AS j FROM range(64)) j,
              {pa_lat},
              {pb_lat}),
    sigs AS (SELECT s.doc_id, p.j, min((p.a * s.x + p.b) % 2147483647) AS sv
             FROM sh s CROSS JOIN perms p GROUP BY s.doc_id, p.j),
    bsig AS (SELECT doc_id, j // 4 AS band,
                    min(CASE WHEN j % 4 = 0 THEN sv END) AS s0,
                    min(CASE WHEN j % 4 = 1 THEN sv END) AS s1,
                    min(CASE WHEN j % 4 = 2 THEN sv END) AS s2,
                    min(CASE WHEN j % 4 = 3 THEN sv END) AS s3
             FROM sigs GROUP BY doc_id, band),
    bh AS (SELECT b.doc_id, b.band, {bh_ref} AS h FROM bsig b, {bh_lat}),
    sized AS (SELECT band, h, count(*) AS n FROM bh GROUP BY band, h),
    p_all AS (SELECT l.doc_id AS a, r.doc_id AS b
              FROM bh l
              JOIN bh r ON l.band = r.band AND l.h = r.h
                        AND l.doc_id < r.doc_id
              JOIN sized s ON s.band = l.band AND s.h = l.h
              WHERE s.n <= 50),
    p_chain AS (SELECT a, b FROM (
                    SELECT lag(l.doc_id) OVER (PARTITION BY l.band, l.h
                                               ORDER BY l.doc_id) AS a,
                           l.doc_id AS b
                    FROM bh l JOIN sized s ON s.band = l.band AND s.h = l.h
                    WHERE s.n > 50)
                WHERE a IS NOT NULL),
    cand AS (SELECT DISTINCT a, b FROM
             (SELECT * FROM p_all UNION ALL SELECT * FROM p_chain)),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.a, c.b, count(*) AS ni
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.a
              JOIN sh sb ON sb.doc_id = c.b AND sb.x = sa.x
              GROUP BY c.a, c.b),
    jac AS (SELECT i.a, i.b, i.ni::DOUBLE / (ca.n + cb.n - i.ni) AS j
            FROM inter i
            JOIN cnt ca ON ca.doc_id = i.a
            JOIN cnt cb ON cb.doc_id = i.b)
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           floor(j * 10000 + 0.5) / 10000 AS jaccard
    FROM jac WHERE j >= 0.5
    """


def _bucket_pairs_sql(buckets: str, cap: int = 50) -> str:
    """Candidate (a, b) pairs from (band, h, doc_id) bucket rows — the SQL
    twin of stages/dedup.py:candidate_pairs: all pairs for buckets ≤ cap,
    consecutive sorted pairs for hot buckets, distinct across bands."""
    return f"""
    sized AS (SELECT band, h, count(*) AS n FROM {buckets} GROUP BY band, h),
    p_all AS (SELECT l.doc_id AS a, r.doc_id AS b
              FROM {buckets} l
              JOIN {buckets} r ON l.band = r.band AND l.h = r.h
                        AND l.doc_id < r.doc_id
              JOIN sized s ON s.band = l.band AND s.h = l.h
              WHERE s.n <= {cap}),
    p_chain AS (SELECT a, b FROM (
                    SELECT lag(l.doc_id) OVER (PARTITION BY l.band, l.h
                                               ORDER BY l.doc_id) AS a,
                           l.doc_id AS b
                    FROM {buckets} l
                    JOIN sized s ON s.band = l.band AND s.h = l.h
                    WHERE s.n > {cap})
                WHERE a IS NOT NULL),
    cand AS (SELECT DISTINCT a, b FROM
             (SELECT * FROM p_all UNION ALL SELECT * FROM p_chain))
    """


def _embeddings_near_dup_sql() -> str:
    """Exact mirror of embeddings_near_dup: planted 0.01·sin perturbed
    copies, Box-Muller hyperplanes from mix64 draws (dedup.HyperplaneLSH),
    sign-bit band signatures, capped bucket pairs, cosine ≥ 0.98 verify."""
    h1_lat, h1_ref = _mix_chain("e1", ["i.band", "i.d", "i.p", "1"], [11])
    h2_lat, h2_ref = _mix_chain("e2", ["i.band", "i.d", "i.p", "2"], [11])
    return f"""
    WITH np_ AS (SELECT greatest(5, count(*) // 20) AS n FROM embeddings),
    vecs AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS e
        FROM embeddings
        UNION ALL
        SELECT CAST(vec_id + 10000000 AS BIGINT),
               list_transform(embedding,
                   (x, i) -> x::DOUBLE + 0.01 * sin((i - 1) + vec_id))
        FROM embeddings, np_ WHERE vec_id < np_.n
    ),
    idx AS (SELECT b.b AS band, d.d AS d, p.p AS p
            FROM (SELECT range AS b FROM range(4)) b
            CROSS JOIN (SELECT range AS d FROM range(64)) d
            CROSS JOIN (SELECT range AS p FROM range(12)) p),
    draws AS (SELECT i.band, i.d, i.p, {h1_ref} AS h1, {h2_ref} AS h2
              FROM idx i,
              {h1_lat},
              {h2_lat}),
    planes AS (SELECT band, d, p,
                      sqrt(-2.0 * ln(((h1 >> 11)::DOUBLE + 1.0)
                                     / 9007199254740992.0))
                      * cos(2.0 * pi()
                            * ((h2 >> 11)::DOUBLE / 9007199254740992.0)) AS z
               FROM draws),
    ed AS (SELECT vec_id, u['i'] - 1 AS d, u['x'] AS x FROM (
               SELECT vec_id,
                      unnest(list_transform(e, (x, i) -> {{'i': i, 'x': x}}))
                      AS u
               FROM vecs)),
    dots AS (SELECT v.vec_id, pl.band, pl.p, sum(v.x * pl.z) AS dp
             FROM ed v JOIN planes pl ON pl.d = v.d
             GROUP BY v.vec_id, pl.band, pl.p),
    bh AS (SELECT vec_id AS doc_id, band,
                  sum(CASE WHEN dp > 0 THEN (1::BIGINT << p)
                           ELSE 0 END) AS h
           FROM dots GROUP BY vec_id, band),
    {_bucket_pairs_sql('bh')},
    cosv AS (SELECT c.a, c.b, list_cosine_similarity(va.e, vb.e) AS cs
             FROM cand c
             JOIN vecs va ON va.vec_id = c.a
             JOIN vecs vb ON vb.vec_id = c.b)
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           ROUND(cs, 4) AS cosine
    FROM cosv WHERE cs >= 0.98
    """


_TOKENS = "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'), x -> x <> '')"
_STOPS = ("['the','and','of','to','in','is','was','for','with','that','on',"
          "'as','are','this','at','by','from','it','an','be']")


def _neg_samples_sql() -> str:
    """Exact mirror of the seeded 1:1 NegativeSampler (D4): corrupt-head
    decision mix64(628,1,h,t,r)%2, draws mix64(628,2,h,t,r,draw)%|E|,
    redraw while the candidate is a gold triple (first non-colliding of
    10 draws — the collision chance of 10 straight hits is ~0)."""
    ch_lat, ch_ref = _mix_chain("ch", ["p.h", "p.t", "p.r"], [628, 1])
    dr_lat, dr_ref = _mix_chain("dr", ["c.h", "c.t", "c.r", "d.draw"],
                                [628, 2])
    return f"""
    WITH idmapped AS ({_IDMAPPED_SQL}),
    ne AS (SELECT count(*) AS n FROM ({_VOCAB_SQL})),
    chdec AS (
        SELECT p.h, p.t, p.r, ({ch_ref} % 2 = 0) AS ch
        FROM idmapped p,
        {ch_lat}
    ),
    cand AS (
        SELECT c.h, c.t, c.r, d.draw,
               CASE WHEN c.ch THEN CAST({dr_ref} % ne.n AS BIGINT)
                    ELSE c.h END AS nh,
               CASE WHEN c.ch THEN c.t
                    ELSE CAST({dr_ref} % ne.n AS BIGINT) END AS nt
        FROM chdec c
        CROSS JOIN (SELECT range AS draw FROM range(10)) d
        CROSS JOIN ne,
        {dr_lat}
    ),
    valid AS (
        SELECT c.* FROM cand c
        LEFT JOIN idmapped g ON g.h = c.nh AND g.t = c.nt AND g.r = c.r
        WHERE g.h IS NULL
        QUALIFY row_number() OVER (PARTITION BY c.h, c.t, c.r
                                   ORDER BY c.draw) = 1
    )
    SELECT CAST(h AS BIGINT) AS h, CAST(t AS BIGINT) AS t,
           CAST(r AS BIGINT) AS r, CAST(1 AS BIGINT) AS flag FROM idmapped
    UNION ALL
    SELECT CAST(nh AS BIGINT), CAST(nt AS BIGINT), CAST(r AS BIGINT),
           CAST(-1 AS BIGINT) FROM valid
    """


def _kgc_negatives_sql() -> str:
    """Mirror of kgc_negatives over the first 2000 (h,t,r)-sorted triples:
    per slot, kept-column dedup (min of the non-kept column), then 5
    draws mix64(628,3,slot_id,kept0,kept1,j)%vocab plus the original."""
    parts = []
    for slot, slot_id, kept, other, vocab in (
            ("head", 11, ("t", "r"), "h", "ne"),
            ("tail", 12, ("h", "r"), "t", "ne"),
            ("rel", 13, ("h", "t"), "r", "nr")):
        lat, ref = _mix_chain(
            f"k{slot_id}", [f"q.{kept[0]}", f"q.{kept[1]}", "j.j"],
            [628, 3, slot_id])
        reps = (f"SELECT {kept[0]}, {kept[1]}, min({other}) AS {other} "
                f"FROM test GROUP BY {kept[0]}, {kept[1]}")
        draws = f"""
        SELECT q.h, q.t, q.r, CAST({ref} % {vocab}.n AS BIGINT) AS v
        FROM ({reps}) q
        CROSS JOIN (SELECT range AS j FROM range(5)) j
        CROSS JOIN {vocab},
        {lat}
        """
        orig = f"SELECT h, t, r, {other} AS v FROM ({reps}) q"
        col = {"h": "v" if other == "h" else "h",
               "t": "v" if other == "t" else "t",
               "r": "v" if other == "r" else "r"}
        parts.append(f"""
        SELECT CAST({col['h']} AS BIGINT) AS h, CAST({col['t']} AS BIGINT) AS t,
               CAST({col['r']} AS BIGINT) AS r, CAST(1 AS BIGINT) AS flag,
               '{slot}' AS slot
        FROM ({draws} UNION ALL {orig})
        """)
    union = " UNION ALL ".join(parts)
    return f"""
    WITH idmapped AS ({_IDMAPPED_SQL}),
    ne AS (SELECT count(*) AS n FROM ({_VOCAB_SQL})),
    nr AS (SELECT count(DISTINCT pred) AS n FROM ({_EDGES_SQL})),
    test AS (SELECT h, t, r FROM idmapped ORDER BY h, t, r LIMIT 2000)
    {union}
    """


_SUBGRAPH_STATS_SQL = f"""
    WITH RECURSIVE idmapped AS ({_IDMAPPED_SQL}),
    heads AS (SELECT DISTINCT h FROM idmapped ORDER BY h LIMIT 20),
    bfs(head, node, depth) AS (
        SELECT h, h, 0 FROM heads
        UNION ALL
        SELECT b.head, e.t, b.depth + 1
        FROM bfs b JOIN idmapped e ON e.h = b.node
        WHERE b.depth < 4
    ),
    nodes AS (SELECT head, node, min(depth) AS depth
              FROM bfs GROUP BY head, node),
    expanded AS (SELECT head, node FROM nodes WHERE depth <= 3),
    sub_edges AS (SELECT DISTINCT x.head, e.h AS u, e.t AS v
                  FROM expanded x JOIN idmapped e ON e.h = x.node),
    outd AS (SELECT head, u AS node, count(*) AS out_n
             FROM sub_edges GROUP BY head, u),
    ind AS (SELECT head, v AS node, count(*) AS in_n
            FROM sub_edges GROUP BY head, v),
    stats AS (
        SELECT n.head, n.node, n.depth,
               COALESCE(i.in_n, 0) AS in_n, COALESCE(o.out_n, 0) AS out_n
        FROM nodes n
        LEFT JOIN outd o ON o.head = n.head AND o.node = n.node
        LEFT JOIN ind i ON i.head = n.head AND i.node = n.node
    ),
    core AS (SELECT head, in_n AS in_c, out_n AS out_c
             FROM stats WHERE node = head)
    SELECT CAST(s.head AS BIGINT) AS head, CAST(s.node AS BIGINT) AS node,
           CAST(s.depth AS BIGINT) AS depth, CAST(c.in_c AS BIGINT) AS in_c,
           CAST(c.out_c AS BIGINT) AS out_c, CAST(s.in_n AS BIGINT) AS in_n,
           CAST(s.out_n AS BIGINT) AS out_n
    FROM stats s JOIN core c ON c.head = s.head
"""

# pinned 5-node PPR micro-graph (kg_ppr_micro): identical update +
# stopping rule to pagerank.py:18-85 — damping 0.03/node, α=0.85,
# L1 change < 1e-5 stops, ≤500 iterations
_PPR_MICRO_SQL = """
    WITH RECURSIVE it(i, v0, v1, v2, v3, v4, delta) AS (
        -- literals cast to DOUBLE: bare 1.0 is DECIMAL(2,1) in DuckDB and
        -- would truncate every iterate to one decimal place
        SELECT 0, 1.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
               0.0::DOUBLE, 1e9
        UNION ALL
        SELECT s.i + 1, s.nv0, s.nv1, s.nv2, s.nv3, s.nv4,
               abs(s.nv0 - s.v0) + abs(s.nv1 - s.v1) + abs(s.nv2 - s.v2)
               + abs(s.nv3 - s.v3) + abs(s.nv4 - s.v4)
        FROM (
            SELECT i, v0, v1, v2, v3, v4,
                   0.03 + 0.85 * (0.5 * v2 + 1.0 * v4) AS nv0,
                   0.03 + 0.85 * (0.5 * v0) AS nv1,
                   0.03 + 0.85 * (0.5 * v0 + 0.5 * v1) AS nv2,
                   0.03 + 0.85 * (0.5 * v1 + 0.5 * v2) AS nv3,
                   0.03 + 0.85 * (1.0 * v3) AS nv4
            FROM it WHERE delta >= 1e-5 AND i < 500
        ) s
    ),
    last AS (SELECT * FROM it ORDER BY i DESC LIMIT 1)
    SELECT CAST(0 AS BIGINT) AS node, ROUND(v0, 6) AS pr FROM last
    UNION ALL SELECT 1, ROUND(v1, 6) FROM last
    UNION ALL SELECT 2, ROUND(v2, 6) FROM last
    UNION ALL SELECT 3, ROUND(v3, 6) FROM last
    UNION ALL SELECT 4, ROUND(v4, 6) FROM last
"""

def _graph_features_sql(sym: bool) -> str:
    """FULL mirror of kg_graph_features[_sym] — BFS subgraph + degrees +
    personalized PageRank with the reference's data-dependent stopping
    rule (`pagerank.py:18-85`: L1 change < 1e-5, ≤500 iterations) as a
    recursive CTE over (head, node) rows.

    Every non-recursive CTE is MATERIALIZED: the level-unrolled BFS
    references each previous level twice, and DuckDB 1.0 otherwise
    INLINES the chain exponentially (measured: fd exhaustion from
    re-opened parquet scans at depth 4).

    PPR recursion shape: ``aug`` holds three row kinds per head —
    subgraph edges (weight 0.85·cnt/outsum), the dangling fix
    (self-loop 0.5 + edge-to-core 0.5, `graph.py:166-177`), and one
    self "carrier" row per node (self=1, damp=0.15/N) so each step can
    compute both the new value (Σ pr·aw + damp) and the old value
    (Σ pr·self) for the L1 stopping test with a single scan of the
    recursive table.  Converged heads stop generating rows; the final
    iterate per head is selected with QUALIFY it = max(it)."""
    if sym:
        base = """
    base AS MATERIALIZED (SELECT h, t FROM idmapped
             UNION ALL SELECT t, h FROM idmapped),"""
        heads = """
    nent AS MATERIALIZED (SELECT count(*) AS n FROM
             (SELECT h FROM idmapped UNION SELECT t FROM idmapped)),
    heads AS MATERIALIZED (SELECT 0 AS head FROM nent
              UNION ALL SELECT n // 3 FROM nent
              UNION ALL SELECT (2 * n) // 3 FROM nent),"""
    else:
        base = """
    base AS MATERIALIZED (SELECT h, t FROM idmapped),"""
        heads = """
    heads AS MATERIALIZED (SELECT h AS head FROM
              (SELECT DISTINCT h FROM idmapped ORDER BY h LIMIT 20)),"""
    levels = []
    prev_lvl = "l0"
    for d in (1, 2, 3, 4):
        levels.append(f"""
    l{d} AS MATERIALIZED (SELECT DISTINCT c.head, p.v AS node, {d} AS depth
           FROM {prev_lvl} c JOIN pairs p ON p.u = c.node
           WHERE NOT EXISTS (SELECT 1 FROM c{d-1} x
                             WHERE x.head = c.head AND x.node = p.v)),
    c{d} AS MATERIALIZED (SELECT head, node FROM c{d-1}
           UNION ALL SELECT head, node FROM l{d}),""")
        prev_lvl = f"l{d}"
    levels_sql = "".join(levels)
    return f"""
    WITH RECURSIVE idmapped AS MATERIALIZED ({_IDMAPPED_SQL}),{base}
    pairs AS MATERIALIZED (SELECT h AS u, t AS v, count(*)::DOUBLE AS cnt
              FROM base GROUP BY h, t),
    outsum AS MATERIALIZED (SELECT u, sum(cnt) AS s FROM pairs
              GROUP BY u),{heads}
    l0 AS MATERIALIZED (SELECT head, head AS node, 0 AS depth FROM heads),
    c0 AS MATERIALIZED (SELECT head, node FROM l0),{levels_sql}
    nodes AS MATERIALIZED (SELECT head, node, depth FROM l0
              UNION ALL SELECT * FROM l1 UNION ALL SELECT * FROM l2
              UNION ALL SELECT * FROM l3 UNION ALL SELECT * FROM l4),
    nsize AS MATERIALIZED (SELECT head, count(*) AS n FROM nodes
              GROUP BY head),
    sedges AS MATERIALIZED (SELECT x.head, p.u, p.v, p.cnt / o.s AS w
               FROM nodes x
               JOIN pairs p ON p.u = x.node
               JOIN outsum o ON o.u = x.node
               WHERE x.depth <= 3),
    dang AS MATERIALIZED (SELECT n.head, n.node FROM nodes n
             WHERE NOT EXISTS (SELECT 1 FROM sedges s
                               WHERE s.head = n.head AND s.u = n.node)),
    aug AS MATERIALIZED (
        SELECT head, u, v, 0.85 * w AS aw, 0.0::DOUBLE AS self,
               0.0::DOUBLE AS damp
        FROM sedges
        UNION ALL
        SELECT head, node, node, 0.85 * 0.5, 0.0, 0.0 FROM dang
        UNION ALL
        SELECT head, node, head, 0.85 * 0.5, 0.0, 0.0
        FROM dang WHERE node <> head
        UNION ALL
        SELECT n.head, n.node, n.node, 0.0, 1.0, 0.15::DOUBLE / z.n
        FROM nodes n JOIN nsize z ON z.head = n.head
    ),
    pr(it, head, node, v, chg) AS (
        SELECT 0, head, node,
               CASE WHEN node = head THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END,
               1e9::DOUBLE
        FROM nodes
        UNION ALL
        SELECT x.it + 1, x.head, x.node, x.nv,
               sum(abs(x.nv - x.ov)) OVER (PARTITION BY x.head)
        FROM (
            SELECT p.it, a.head, a.v AS node,
                   sum(p.v * a.aw) + max(a.damp) AS nv,
                   sum(p.v * a.self) AS ov
            FROM pr p JOIN aug a ON a.head = p.head AND a.u = p.node
            WHERE p.chg >= 1e-5 AND p.it < 500
            GROUP BY p.it, a.head, a.v
        ) x
    ),
    final AS MATERIALIZED (SELECT head, node, v FROM pr
              QUALIFY it = max(it) OVER (PARTITION BY head)),
    outd AS MATERIALIZED (SELECT head, u AS node, count(*) AS out_n
             FROM sedges GROUP BY head, u),
    ind AS MATERIALIZED (SELECT head, v AS node, count(*) AS in_n
            FROM sedges GROUP BY head, v),
    stats AS MATERIALIZED (
        SELECT n.head, n.node, n.depth,
               COALESCE(i.in_n, 0) AS in_n, COALESCE(o.out_n, 0) AS out_n
        FROM nodes n
        LEFT JOIN outd o ON o.head = n.head AND o.node = n.node
        LEFT JOIN ind i ON i.head = n.head AND i.node = n.node
    ),
    core AS MATERIALIZED (SELECT head, in_n AS in_c, out_n AS out_c
             FROM stats WHERE node = head)
    SELECT CAST(s.head AS BIGINT) AS head, CAST(s.node AS BIGINT) AS node,
           ROUND(f.v, 8) AS pr,
           CAST(c.in_c AS BIGINT) AS in_c, CAST(c.out_c AS BIGINT) AS out_c,
           CAST(s.in_n AS BIGINT) AS in_n, CAST(s.out_n AS BIGINT) AS out_n,
           CAST(s.depth AS BIGINT) AS depth, FALSE AS truncated
    FROM stats s
    JOIN core c ON c.head = s.head
    JOIN final f ON f.head = s.head AND f.node = s.node
"""


_LANG_WORDS = "list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x))"
_PROFILES_SQL = {
    "en": "['the','and','of','to','in','is','was','for','with','that','on',"
          "'as','are','this','at','by','from','it','an','be']",
    "fr": "['le','la','les','de','des','et','en','un','une','du','est','que',"
          "'pour','dans','qui','au','pas','sur','avec','ne']",
    "de": "['der','die','das','und','in','den','von','zu','mit','ist','des',"
          "'im','nicht','ein','eine','auf','als','auch','es','an']",
    "es": "['el','la','los','las','de','y','en','un','una','del','es','que',"
          "'por','con','no','se','su','para','al','como']",
}

_LANG_DETECT_SQL = f"""
    WITH scored AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
               length({_LANG_WORDS}) AS n,
               length(list_filter({_LANG_WORDS},
                      x -> list_contains({_PROFILES_SQL['en']}, x))) AS s_en,
               length(list_filter({_LANG_WORDS},
                      x -> list_contains({_PROFILES_SQL['fr']}, x))) AS s_fr,
               length(list_filter({_LANG_WORDS},
                      x -> list_contains({_PROFILES_SQL['de']}, x))) AS s_de,
               length(list_filter({_LANG_WORDS},
                      x -> list_contains({_PROFILES_SQL['es']}, x))) AS s_es
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n = 0 OR greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
                WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS lang_pred
    FROM scored
"""


def _ivf_topk_sql(n_centroids: int = 16, n_probe: int = 4, k: int = 10,
                  salt: int = 17) -> str:
    """Exact mirror of stages/ann.py ivf_topk(centroid_mode="hash"):
    centroids = the ``n_centroids`` vectors with the smallest
    (mix64(salt, vec_id), vec_id); every vector is assigned to its
    max-cosine centroid (tie → lower centroid rank, = np.argmax's
    first-max); the query probes the ``n_probe`` best buckets; brute
    cosine top-k over probed rows, tie-break (cosine DESC, vec_id)."""
    lat, ref = _mix_chain("iv", ["e.vec_id"], [salt])
    return f"""
    WITH hk AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, {ref} AS hkey
        FROM embeddings e,
        {lat}
    ),
    cents AS (
        SELECT vec_id AS cent_id, v AS cv,
               ROW_NUMBER() OVER (ORDER BY hkey, vec_id) AS cent_rank
        FROM hk ORDER BY hkey, vec_id LIMIT {n_centroids}
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    probe AS (
        SELECT c.cent_rank FROM cents c, q
        ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cent_rank
        LIMIT {n_probe}
    ),
    assign AS (
        SELECT vec_id, v, cent_rank FROM (
            SELECT e.vec_id, e.v, c.cent_rank,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                c.cent_rank) AS rn
            FROM hk e CROSS JOIN cents c
        ) WHERE rn = 1
    )
    SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
           ROUND(list_cosine_similarity(a.v, q.qv), 5) AS cosine
    FROM assign a JOIN probe p USING (cent_rank), q
    ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.vec_id
    LIMIT {k}
    """


_REPETITION_SQL = """
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(w) AS word,
               unnest(range(1, len(w) + 1)) AS ord
        FROM words
    ),
    wcount AS (
        SELECT doc_id, word, COUNT(*) AS c FROM toks GROUP BY doc_id, word
    ),
    wagg AS (
        SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_unique,
               MAX(c) AS top_w
        FROM wcount GROUP BY doc_id
    ),
    bg AS (
        SELECT a.doc_id, a.word || ' ' || b.word AS bgm
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    ),
    bgc AS (SELECT doc_id, bgm, COUNT(*) AS c FROM bg GROUP BY doc_id, bgm),
    bga AS (SELECT doc_id, MAX(c) AS top_bg FROM bgc GROUP BY doc_id)
    SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
           CAST(w.n_words AS BIGINT) AS n_words,
           floor((w.n_words - w.n_unique) / w.n_words::DOUBLE
                 * 1000000 + 0.5) / 1000000
               AS dup_word_frac,
           floor(w.top_w / w.n_words::DOUBLE
                 * 1000000 + 0.5) / 1000000 AS top_word_frac,
           floor(COALESCE(2.0 * b.top_bg, 0) / w.n_words::DOUBLE
                 * 1000000 + 0.5) / 1000000
               AS top_bigram_frac
    FROM wagg w LEFT JOIN bga b USING (doc_id)
    ORDER BY w.doc_id
"""


_EMB_LINK_RANK_SQL = """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    ents AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    gold AS (
        SELECT vec_id AS h, (31*vec_id+7) % nn.n AS t FROM embeddings, nn
        UNION ALL
        SELECT vec_id, (17*vec_id+3) % nn.n FROM embeddings, nn
    ),
    test AS (
        SELECT vec_id AS h, (31*vec_id+7) % nn.n AS t
        FROM embeddings, nn WHERE vec_id % 10 = 9
        ORDER BY vec_id LIMIT 100
    ),
    scored AS (
        SELECT te.h, te.t, c.vec_id AS cand,
               list_distance(c.v, vt.v) AS dh,
               list_distance(vh.v, c.v) AS dt,
               list_distance(vh.v, vt.v) AS gd,
               EXISTS (SELECT 1 FROM gold g
                       WHERE g.t = te.t AND g.h = c.vec_id) AS kh,
               EXISTS (SELECT 1 FROM gold g
                       WHERE g.h = te.h AND g.t = c.vec_id) AS kt
        FROM test te
        JOIN ents vh ON vh.vec_id = te.h
        JOIN ents vt ON vt.vec_id = te.t
        CROSS JOIN ents c
    )
    SELECT CAST(h AS BIGINT) AS h, CAST(t AS BIGINT) AS t,
           CAST(0 AS BIGINT) AS r,
           CAST(1 + COUNT(*) FILTER (WHERE dh < gd) AS BIGINT)
               AS rank_head_raw,
           CAST(1 + COUNT(*) FILTER (WHERE dh < gd
                AND (cand = h OR NOT kh)) AS BIGINT) AS rank_head_filtered,
           CAST(1 + COUNT(*) FILTER (WHERE dt < gd) AS BIGINT)
               AS rank_tail_raw,
           CAST(1 + COUNT(*) FILTER (WHERE dt < gd
                AND (cand = t OR NOT kt)) AS BIGINT) AS rank_tail_filtered
    FROM scored GROUP BY h, t ORDER BY h, t
"""


def _cm_heavy_hitters_sql(k: int = 20, d: int = 4, w: int = 1024) -> str:
    """Mirror of docs_cm_heavy_hitters: rebuild the (d, w) count-min
    matrix from the identical mix64(91, row, word-fp) buckets, then
    min-over-rows estimates for the exact top-k tokens."""
    lat, ref = _mix_chain("cm", ["r.r", "wh.fp"], [91])
    return f"""
    WITH tok AS MATERIALIZED (
        SELECT unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
        FROM documents),
    tf AS MATERIALIZED (
        SELECT w, count(*)::BIGINT AS tf FROM tok GROUP BY w),
    wh AS MATERIALIZED (SELECT w, tf, {_wfp_sql('w')} AS fp FROM tf),
    bk AS MATERIALIZED (
        SELECT wh.w, wh.tf, r.r, ({ref}) % {w} AS b
        FROM wh CROSS JOIN (SELECT range AS r FROM range({d})) r,
        {lat}),
    sums AS MATERIALIZED (
        SELECT r, b, sum(tf)::BIGINT AS s FROM bk GROUP BY r, b),
    top AS MATERIALIZED (
        SELECT w, tf FROM tf ORDER BY tf DESC, w LIMIT {k})
    SELECT top.w AS token, top.tf AS exact_tf,
           CAST(min(s.s) AS BIGINT) AS cm_est
    FROM top JOIN bk ON bk.w = top.w
    JOIN sums s ON s.r = bk.r AND s.b = bk.b
    GROUP BY top.w, top.tf
    ORDER BY exact_tf DESC, token
    """


def _hll_distinct_sql(p: int = 12) -> str:
    """Mirror of docs_hll_distinct: identical 2^p max-rho registers from
    mix64(92, doc_id, word-fp) (remainder < 2^52 is float64-exact, so
    floor(log2) gives the same bit length numpy's frexp does), then the
    standard estimator with linear-counting correction."""
    lat, ref = _mix_chain("hl", ["wh.doc_id", "wh.fp"], [92])
    m = 1 << p
    rem = 1 << (64 - p)
    rb = 64 - p
    return f"""
    WITH tokd AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
        FROM documents),
    wh AS MATERIALIZED (SELECT doc_id, w, {_wfp_sql('w')} AS fp
                        FROM tokd),
    hh AS MATERIALIZED (SELECT {ref} AS h FROM wh, {lat}),
    reg AS MATERIALIZED (
        SELECT h // {rem} AS b,
               max(CASE WHEN h % {rem} = 0 THEN {rb + 1}
                        ELSE {rb} - CAST(floor(log2((h % {rem})::DOUBLE))
                                         AS BIGINT)
                   END) AS rho
        FROM hh GROUP BY b),
    s AS (SELECT sum(power(2.0, -rho)) AS sp, count(*) AS nb FROM reg),
    est AS (
        SELECT CASE WHEN raw <= 2.5 * {m} AND ({m} - nb) > 0
                    THEN {m} * ln({m}::DOUBLE / ({m} - nb))
                    ELSE raw END AS hll_est
        FROM (SELECT (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m}
                     / (sp + ({m} - nb)) AS raw, nb FROM s))
    SELECT (SELECT count(*)::BIGINT FROM tokd) AS exact_distinct,
           hll_est FROM est
    """


def _stratified_sample_sql(q: int = 40) -> str:
    """Mirror of docs_stratified_sample: per-lang top-q by
    (mix64(628, 7, doc_id), doc_id) rank."""
    lat, ref = _mix_chain("ss", ["d.doc_id"], [628, 7])
    return f"""
    SELECT doc_id, lang FROM (
        SELECT d.doc_id, d.lang,
               row_number() OVER (PARTITION BY d.lang
                   ORDER BY {ref}, d.doc_id) AS rn
        FROM documents d,
        {lat})
    WHERE rn <= {q} ORDER BY lang, doc_id
    """


def _kmeans_ctes(k: int = 8, n_iter: int = 4, tag: str = "",
                 vexpr: str = "e0.embedding::DOUBLE[]",
                 src: str = "embeddings",
                 seed: int = 628) -> tuple[str, str]:
    """Shared CTE chain mirroring stages/cluster.py:kmeans — seeded
    hash-rank init, ``n_iter`` UNROLLED Lloyd iterations (assignment =
    row_number over round(list_distance,6) with cluster tie-break;
    update = element-wise avg rounded to 6 dp, empty clusters keep the
    previous centroid).  The 6-dp rounding on BOTH engines quantizes
    away summation-order ulps, making assignments exactly reproducible.
    ``tag`` prefixes every CTE name so several chains (e.g. the PQ
    subspaces) can coexist in one query; ``vexpr`` is the vector
    expression over ``embeddings e0`` (a list_slice for PQ subspaces).
    Returns (cte_body, final_centroid_cte_name)."""
    lat, ref = _mix_chain(f"km{tag}", ["e0.vec_id"], [seed, 6])
    ctes = [f"""{tag}emb AS MATERIALIZED (
        SELECT e0.vec_id AS id, {vexpr} AS v, {ref} AS h
        FROM {src} e0,
        {lat})""",
            f"""{tag}c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY h, id) - 1 AS c,
               list_transform(v, x -> round(x, 6)) AS v
        FROM (SELECT id, v, h FROM {tag}emb ORDER BY h, id LIMIT {k}))"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""{tag}a{i} AS MATERIALIZED (
        SELECT id, v, c FROM (
            SELECT e.id, e.v, c.c,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM {tag}emb e CROSS JOIN {tag}c{i - 1} c)
        WHERE rn = 1)""")
        ctes.append(f"""{tag}m{i} AS MATERIALIZED (
        SELECT c, list(xr ORDER BY pos) AS v FROM (
            SELECT c, pos, round(avg(x), 6) AS xr FROM (
                SELECT c, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                FROM {tag}a{i})
            GROUP BY c, pos)
        GROUP BY c)""")
        ctes.append(f"""{tag}c{i} AS MATERIALIZED (
        SELECT p.c, COALESCE(m.v, p.v) AS v
        FROM {tag}c{i - 1} p LEFT JOIN {tag}m{i} m USING (c))""")
    return ",\n".join(ctes), f"{tag}c{n_iter}"


def _kcenter_sql(k: int = 8) -> str:
    """Exact mirror of embeddings_kcenter
    (stages/cluster.py:kcenter_greedy): seed = min-id vector, k−1
    unrolled greedy rounds, each picking the row maximizing its round-6
    min-distance to the selected set (ties → smallest id), selected
    vectors rounded to 6 dp before any distance (the kmeans c0
    convention); final assignment = the shared row_number rule."""
    ctes = ["""emb AS MATERIALIZED (
        SELECT CAST(vec_id AS BIGINT) AS id, embedding::DOUBLE[] AS v
        FROM embeddings)""",
            """s0 AS MATERIALIZED (
        SELECT 0 AS c, id, list_transform(v, x -> round(x, 6)) AS v
        FROM emb ORDER BY id LIMIT 1)""",
            """d0 AS MATERIALIZED (
        SELECT e.id, round(list_distance(e.v, s.v), 6) AS dmin
        FROM emb e, s0 s)"""]
    for r in range(1, k):
        ctes.append(f"""p{r} AS (SELECT id FROM d{r - 1}
        ORDER BY dmin DESC, id LIMIT 1)""")
        ctes.append(f"""s{r} AS MATERIALIZED (
        SELECT {r} AS c, e.id, list_transform(e.v, x -> round(x, 6)) AS v
        FROM emb e JOIN p{r} USING (id))""")
        if r < k - 1:
            ctes.append(f"""d{r} AS MATERIALIZED (
        SELECT d.id, least(d.dmin,
                           round(list_distance(e.v, s.v), 6)) AS dmin
        FROM d{r - 1} d JOIN emb e USING (id), s{r} s)""")
    cents = " UNION ALL ".join(f"SELECT c, id, v FROM s{r}"
                               for r in range(k))
    body = ",\n".join(ctes)
    return f"""
    WITH {body},
    cents AS MATERIALIZED ({cents})
    SELECT id AS vec_id, CAST(c AS BIGINT) AS center, d AS dist,
           CAST(CASE WHEN id IN (SELECT id FROM cents)
                THEN 1 ELSE 0 END AS BIGINT) AS is_center
    FROM (
        SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
               row_number() OVER (PARTITION BY e.id
                   ORDER BY round(list_distance(e.v, c.v), 6), c.c) AS rn
        FROM emb e CROSS JOIN cents c)
    WHERE rn = 1 ORDER BY vec_id
    """


def _moore_lewis_sql(vocab_k: int = 20000) -> str:
    """Exact mirror of docs_moore_lewis (stages/lm_score.py
    CEDiffScorer): two add-one unigram LMs — in-domain fitted on
    ML_IN_SOURCES (pipelines/relational.py; keep the literal in sync),
    out-domain on the full corpus — identical top-V (cnt DESC, token)
    tie-break and smoothing as docs_lm_perplexity; ced = per-doc mean
    difference rounded 6 dp BEFORE the keep comparison."""
    srcs = "'src0', 'src1', 'src2', 'src3'"

    def lm(tag: str, where: str) -> str:
        return f"""
    {tag}counts AS (SELECT token, count(*) AS cnt FROM flat {where}
                    GROUP BY token),
    {tag}tot AS (SELECT sum(cnt) AS total FROM {tag}counts),
    {tag}top AS (SELECT token, cnt FROM {tag}counts
                 ORDER BY cnt DESC, token LIMIT {vocab_k}),
    {tag}den AS (SELECT (t.total + v.v + 1)::DOUBLE AS d
                 FROM {tag}tot t,
                      (SELECT count(*) AS v FROM {tag}top) v),
    {tag}lp AS (SELECT token, ln((cnt + 1)::DOUBLE / {tag}den.d) AS lp
                FROM {tag}top, {tag}den)"""

    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                         list_transform({_TOKENS}, x -> lower(x)) AS ts
                  FROM documents),
    flat AS MATERIALIZED (SELECT doc_id, source, unnest(ts) AS token
                          FROM toks),
    {lm("i", f"WHERE source IN ({srcs})")},
    {lm("o", "")},
    scored AS (SELECT f.doc_id,
                      COALESCE(il.lp, (SELECT ln(1.0 / d) FROM iden))
                          AS lpi,
                      COALESCE(ol.lp, (SELECT ln(1.0 / d) FROM oden))
                          AS lpo
               FROM flat f LEFT JOIN ilp il ON il.token = f.token
                           LEFT JOIN olp ol ON ol.token = f.token),
    agg AS (SELECT doc_id, count(*) AS n,
                   sum(lpi) / count(*) - sum(lpo) / count(*) AS ced
            FROM scored GROUP BY doc_id)
    SELECT t.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
           ROUND(COALESCE(a.ced, 0.0), 6) AS ced,
           CAST(CASE WHEN ROUND(COALESCE(a.ced, 0.0), 6) >= 0
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """


_ZIPF_SQL = """
    WITH w AS (SELECT source,
                      unnest(regexp_extract_all(lower(text),
                                                '[0-9a-z_]+')) AS token
               FROM documents),
    st AS (SELECT source, token, count(*) AS cnt FROM w GROUP BY 1, 2),
    rk AS (SELECT source, cnt,
                  row_number() OVER (PARTITION BY source
                      ORDER BY cnt DESC, token) AS rn
           FROM st),
    top AS (SELECT source, ln(rn::DOUBLE) AS x, ln(cnt::DOUBLE) AS y
            FROM rk WHERE rn <= 100),
    s AS (SELECT source, count(*)::DOUBLE AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM top GROUP BY source)
    SELECT source, CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept
    FROM s ORDER BY source
"""


_RFM_SQL = """
    WITH ue AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                       max(epoch_us(ts)) AS umax,
                       count(*)::BIGINT AS freq,
                       ROUND(sum(value), 6) AS monetary
                FROM events GROUP BY user_id),
    g AS (SELECT max(umax) AS gmax, count(*) AS n FROM ue),
    m AS (SELECT u.user_id,
                 ((g.gmax - u.umax) // 86400000000)::BIGINT AS r_days,
                 u.freq, u.monetary
          FROM ue u, g),
    r_o AS (SELECT r_days AS v,
                   row_number() OVER (ORDER BY r_days) - 1 AS rk FROM m),
    f_o AS (SELECT freq AS v,
                   row_number() OVER (ORDER BY freq) - 1 AS rk FROM m),
    m_o AS (SELECT monetary AS v,
                   row_number() OVER (ORDER BY monetary) - 1 AS rk
            FROM m),
    r_e AS (SELECT max(CASE WHEN rk = (n - 1) // 4 THEN v END) AS e25,
                   max(CASE WHEN rk = (n - 1) // 2 THEN v END) AS e50,
                   max(CASE WHEN rk = (3 * (n - 1)) // 4 THEN v END)
                       AS e75
            FROM r_o, g),
    f_e AS (SELECT max(CASE WHEN rk = (n - 1) // 4 THEN v END) AS e25,
                   max(CASE WHEN rk = (n - 1) // 2 THEN v END) AS e50,
                   max(CASE WHEN rk = (3 * (n - 1)) // 4 THEN v END)
                       AS e75
            FROM f_o, g),
    m_e AS (SELECT max(CASE WHEN rk = (n - 1) // 4 THEN v END) AS e25,
                   max(CASE WHEN rk = (n - 1) // 2 THEN v END) AS e50,
                   max(CASE WHEN rk = (3 * (n - 1)) // 4 THEN v END)
                       AS e75
            FROM m_o, g)
    SELECT m.user_id, m.r_days, m.freq, m.monetary,
           CAST(1 + (m.r_days > r_e.e25)::INT + (m.r_days > r_e.e50)::INT
                + (m.r_days > r_e.e75)::INT AS BIGINT) AS r_band,
           CAST(1 + (m.freq > f_e.e25)::INT + (m.freq > f_e.e50)::INT
                + (m.freq > f_e.e75)::INT AS BIGINT) AS f_band,
           CAST(1 + (m.monetary > m_e.e25)::INT
                + (m.monetary > m_e.e50)::INT
                + (m.monetary > m_e.e75)::INT AS BIGINT) AS m_band
    FROM m, r_e, f_e, m_e ORDER BY m.user_id
"""


_SEQ_PAIRS_SQL = """
    WITH ut AS (SELECT user_id, event_type,
                       min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                FROM events GROUP BY user_id, event_type)
    SELECT a.event_type AS etype_a, b.event_type AS etype_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b ON a.user_id = b.user_id
         AND a.event_type != b.event_type AND a.mn < b.mx
    GROUP BY 1, 2 ORDER BY 1, 2
"""


_HEAPS_SQL = """
    WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                      unnest(regexp_extract_all(lower(text),
                                                '[0-9a-z_]+')) AS token
               FROM documents),
    fo AS (SELECT token, min(doc_id) AS fd FROM w GROUP BY token),
    nt AS (SELECT fd AS doc_id, count(*) AS new_types FROM fo
           GROUP BY fd),
    nw AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY doc_id),
    base AS (SELECT d.doc_id, COALESCE(nw.n_words, 0) AS n_words,
                    COALESCE(nt.new_types, 0) AS new_types
             FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id
                   FROM documents) d
             LEFT JOIN nw USING (doc_id) LEFT JOIN nt USING (doc_id))
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(sum(n_words) OVER (ORDER BY doc_id) AS BIGINT)
               AS cum_words,
           CAST(sum(new_types) OVER (ORDER BY doc_id) AS BIGINT)
               AS cum_types
    FROM base ORDER BY doc_id
"""


def _kmeans_outliers_sql(k: int = 8, n_iter: int = 4,
                         top: int = 20) -> str:
    body, cfin = _kmeans_ctes(k, n_iter)
    return f"""
    WITH {body},
    asg AS (SELECT id AS vec_id, CAST(c AS BIGINT) AS cluster, d AS dist
            FROM (
        SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
               row_number() OVER (PARTITION BY e.id
                   ORDER BY round(list_distance(e.v, c.v), 6), c.c) AS rn
        FROM emb e CROSS JOIN {cfin} c)
    WHERE rn = 1)
    SELECT vec_id, cluster, dist,
           row_number() OVER (ORDER BY dist DESC, vec_id) AS rank
    FROM asg ORDER BY dist DESC, vec_id LIMIT {top}
    """


def _kmeans_sql(k: int = 8, n_iter: int = 4) -> str:
    body, cfin = _kmeans_ctes(k, n_iter)
    return f"""
    WITH {body}
    SELECT id AS vec_id, CAST(c AS BIGINT) AS cluster, d AS dist FROM (
        SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
               row_number() OVER (PARTITION BY e.id
                   ORDER BY round(list_distance(e.v, c.v), 6), c.c) AS rn
        FROM emb e CROSS JOIN {cfin} c)
    WHERE rn = 1 ORDER BY vec_id
    """


_SPH_VEXPR = ("list_transform(e0.embedding::DOUBLE[], "
              "x -> x / greatest(sqrt(list_inner_product("
              "e0.embedding::DOUBLE[], e0.embedding::DOUBLE[])), "
              "1e-12))")


def _ari_sql(k: int = 8, n_iter: int = 4, seed_a: int = 628,
             seed_b: int = 629) -> str:
    """Exact mirror of embeddings_cluster_stability
    (stages/cluster.py:cluster_stability_ari): two tagged kmeans CTE
    chains differing only in seed, integer contingency/pair sums, one
    fixed-order float ARI expression."""
    ba, ca = _kmeans_ctes(k, n_iter, tag="ka", seed=seed_a)
    bb, cb = _kmeans_ctes(k, n_iter, tag="kb", seed=seed_b)
    return f"""
    WITH {ba},
    aa AS MATERIALIZED ({_assign_cte("kaemb", ca)}),
    {bb},
    ab AS MATERIALIZED ({_assign_cte("kbemb", cb)}),
    ct AS (SELECT aa.c AS ca, ab.c AS cb, count(*)::BIGINT AS nij
           FROM aa JOIN ab USING (id) GROUP BY aa.c, ab.c),
    n AS (SELECT sum(nij)::BIGINT AS n FROM ct),
    sc AS (SELECT sum(nij * (nij - 1) // 2)::BIGINT AS sum_comb
           FROM ct),
    sa AS (SELECT sum(s * (s - 1) // 2)::BIGINT AS sum_a FROM (
               SELECT sum(nij) AS s FROM ct GROUP BY ca)),
    sb AS (SELECT sum(s * (s - 1) // 2)::BIGINT AS sum_b FROM (
               SELECT sum(nij) AS s FROM ct GROUP BY cb))
    SELECT CAST({k} AS BIGINT) AS k, n.n, sc.sum_comb, sa.sum_a,
           sb.sum_b,
           -- degenerate single-cluster case: denom = 0 → ARI defined as
           -- 1.0 (identical partitions), matching the driver fallback in
           -- stages/cluster.py:cluster_stability_ari
           ROUND(CASE WHEN (0.5 * (sa.sum_a + sb.sum_b)
                            - (sa.sum_a::DOUBLE * sb.sum_b)
                              / (n.n * (n.n - 1) // 2)) = 0 THEN 1.0
                 ELSE (sc.sum_comb - (sa.sum_a::DOUBLE * sb.sum_b)
                                     / (n.n * (n.n - 1) // 2))
                      / (0.5 * (sa.sum_a + sb.sum_b)
                         - (sa.sum_a::DOUBLE * sb.sum_b)
                           / (n.n * (n.n - 1) // 2)) END, 6) AS ari
    FROM n, sc, sa, sb
    """


_LENGTH_CORR_SQL = f"""
    WITH t AS (SELECT source, length(text)::BIGINT AS x,
                      length({_TOKENS})::BIGINT AS y
               FROM documents),
    s AS (SELECT source, count(*)::BIGINT AS n,
                 sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                 sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
                 sum(y * y)::BIGINT AS syy
          FROM t GROUP BY source)
    SELECT source, n,
           floor((n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                        * (n::DOUBLE * syy - sy::DOUBLE * sy))
                 * 1000000 + 0.5) / 1000000 AS r
    FROM s ORDER BY source
"""


def _spherical_kmeans_sql(k: int = 8, n_iter: int = 4) -> str:
    """Exact mirror of embeddings_spherical_kmeans: the kmeans CTE
    chain with an L2-normalizing ``vexpr`` (norm drift ~1e-16 is far
    below every round-6 quantum in the iteration)."""
    body, cfin = _kmeans_ctes(k, n_iter, tag="sp", vexpr=_SPH_VEXPR)
    return f"""
    WITH {body}
    SELECT id AS vec_id, CAST(c AS BIGINT) AS cluster, d AS dist FROM (
        SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
               row_number() OVER (PARTITION BY e.id
                   ORDER BY round(list_distance(e.v, c.v), 6), c.c) AS rn
        FROM spemb e CROSS JOIN {cfin} c)
    WHERE rn = 1 ORDER BY vec_id
    """


def _pq_sql(m: int = 2, k: int = 4, n_iter: int = 2) -> str:
    """Exact mirror of embeddings_pq_codes (stages/cluster.py:pq_codes):
    one quantized-iteration k-means chain per contiguous subspace
    (list_slice of the double-cast embedding), assignments + rounded
    distances joined on the id."""
    bodies, finals = [], []
    for j in range(m):
        vexpr = (f"list_slice(e0.embedding::DOUBLE[], "
                 f"{j} * (len(e0.embedding) // {m}) + 1, "
                 f"{j + 1} * (len(e0.embedding) // {m}))")
        body, cf = _kmeans_ctes(k, n_iter, tag=f"p{j}", vexpr=vexpr)
        bodies.append(body)
        finals.append(f"""q{j} AS (
        SELECT id, c, d FROM (
            SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM p{j}emb e CROSS JOIN {cf} c)
        WHERE rn = 1)""")
    sel = ", ".join(
        f"CAST(q{j}.c AS BIGINT) AS c{j}, q{j}.d AS d{j}"
        for j in range(m))
    joins = " ".join(f"JOIN q{j} ON q{j}.id = q0.id"
                     for j in range(1, m))
    all_bodies = ",\n".join(bodies)
    all_finals = ",\n".join(finals)
    return f"""
    WITH {all_bodies},
    {all_finals}
    SELECT q0.id AS vec_id, {sel}
    FROM q0 {joins} ORDER BY vec_id
    """


def _pq_recall_sql(qids=(0, 100, 200), m: int = 2, k: int = 4,
                   n_iter: int = 2, k_top: int = 10) -> str:
    """Mirror of embeddings_pq_recall: ONE set of PQ fit chains, then
    per query a dq table + ADC top-10 and an exact-L2 top-10 over the
    full vectors, recall = overlap/k_top."""
    bodies, finals = [], []
    for j in range(m):
        vexpr = (f"list_slice(e0.embedding::DOUBLE[], "
                 f"{j} * (len(e0.embedding) // {m}) + 1, "
                 f"{j + 1} * (len(e0.embedding) // {m}))")
        body, cf = _kmeans_ctes(k, n_iter, tag=f"p{j}", vexpr=vexpr)
        bodies.append(body)
        finals.append(f"""q{j} AS (
        SELECT id, c FROM (
            SELECT e.id, c.c,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM p{j}emb e CROSS JOIN {cf} c)
        WHERE rn = 1)""")
        # keep the final-codebook name for dq below
        if j == 0:
            cf0 = cf
        else:
            cf1 = cf
    cfs = [cf0, cf1] if m == 2 else None
    per_q = []
    unions = []
    for qi, qid in enumerate(qids):
        dqs = []
        for j in range(m):
            dqs.append(f"""dq{j}_{qi} AS (
        SELECT c.c, round(list_distance(
            list_slice(qv{qi}.v, {j} * (len(qv{qi}.v) // {m}) + 1,
                       {j + 1} * (len(qv{qi}.v) // {m})), c.v), 6) AS d
        FROM {cfs[j]} c, qv{qi})""")
        adc = " + ".join(f"dq{j}_{qi}.d * dq{j}_{qi}.d"
                         for j in range(m))
        dq_joins = " ".join(f"JOIN dq{j}_{qi} ON dq{j}_{qi}.c = q{j}.c"
                            for j in range(m))
        qj = " ".join(f"JOIN q{j} ON q{j}.id = q0.id"
                      for j in range(1, m))
        per_q.append(f"""qv{qi} AS (SELECT embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id = {qid}),
    {','.join(dqs)},
    adc{qi} AS (SELECT id FROM (
        SELECT q0.id,
               row_number() OVER (
                   ORDER BY round({adc}, 6), q0.id) AS rn
        FROM q0 {qj} {dq_joins})
        WHERE rn <= {k_top}),
    br{qi} AS (SELECT id FROM (
        SELECT f.id,
               row_number() OVER (
                   ORDER BY round(list_distance(f.v, qv{qi}.v), 6),
                            f.id) AS rn
        FROM femb f, qv{qi})
        WHERE rn <= {k_top})""")
        unions.append(f"""SELECT {qid} AS query_id,
               (SELECT count(*) FROM adc{qi} a
                JOIN br{qi} b ON b.id = a.id)::BIGINT AS n_common""")
    all_bodies = ",\n".join(bodies)
    all_finals = ",\n".join(finals)
    all_perq = ",\n".join(per_q)
    un = " UNION ALL ".join(unions)
    return f"""
    WITH {all_bodies},
    femb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                    embedding::DOUBLE[] AS v FROM embeddings),
    {all_finals},
    {all_perq}
    SELECT query_id::BIGINT AS query_id, n_common,
           floor(n_common / {float(k_top)} * 1000000 + 0.5) / 1000000
               AS recall
    FROM ({un}) ORDER BY query_id
"""


def _pq_adc_sql(m: int = 2, k: int = 4, n_iter: int = 2,
                k_top: int = 10) -> str:
    """Exact mirror of embeddings_pq_adc: the PQ assignment chains of
    _pq_sql plus a per-codebook query-distance table (round6 L2 of the
    vec_id=0 subvector to each centroid); adc = round6(Σ dq_j²)."""
    bodies, finals, dqs = [], [], []
    for j in range(m):
        vexpr = (f"list_slice(e0.embedding::DOUBLE[], "
                 f"{j} * (len(e0.embedding) // {m}) + 1, "
                 f"{j + 1} * (len(e0.embedding) // {m}))")
        body, cf = _kmeans_ctes(k, n_iter, tag=f"p{j}", vexpr=vexpr)
        bodies.append(body)
        finals.append(f"""q{j} AS (
        SELECT id, c FROM (
            SELECT e.id, c.c,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM p{j}emb e CROSS JOIN {cf} c)
        WHERE rn = 1)""")
        dqs.append(f"""dq{j} AS (
        SELECT c.c, round(list_distance(
            list_slice(qv.v, {j} * (len(qv.v) // {m}) + 1,
                       {j + 1} * (len(qv.v) // {m})), c.v), 6) AS d
        FROM {cf} c, qv)""")
    adc = " + ".join(f"dq{j}.d * dq{j}.d" for j in range(m))
    code_cols = ", ".join(f"CAST(q{j}.c AS BIGINT) AS c{j}"
                          for j in range(m))
    joins = " ".join(f"JOIN q{j} ON q{j}.id = q0.id"
                     for j in range(1, m))
    dq_joins = " ".join(f"JOIN dq{j} ON dq{j}.c = q{j}.c"
                        for j in range(m))
    all_bodies = ",\n".join(bodies)
    all_finals = ",\n".join(finals)
    all_dqs = ",\n".join(dqs)
    return f"""
    WITH {all_bodies},
    qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id = 0),
    {all_finals},
    {all_dqs}
    SELECT q0.id AS vec_id, {code_cols}, round({adc}, 6) AS adc
    FROM q0 {joins} {dq_joins}
    ORDER BY adc, vec_id LIMIT {k_top}
    """


def _ivfpq_sql(n_centroids: int = 16, n_probe: int = 4, m: int = 2,
               k: int = 4, n_iter: int = 2, k_top: int = 10,
               salt: int = 17) -> str:
    """Exact mirror of embeddings_ivfpq: the hash-centroid IVF CTEs
    (probe = top-n_probe centroids by cosine to the vec_id=0 query,
    assignment = per-vector cosine argmax with rank tie-break) composed
    with the PQ chains of _pq_adc_sql; only probed vectors rank."""
    lat, ref = _mix_chain("ivq", ["e.vec_id"], [salt])
    bodies, finals, dqs = [], [], []
    for j in range(m):
        vexpr = (f"list_slice(e0.embedding::DOUBLE[], "
                 f"{j} * (len(e0.embedding) // {m}) + 1, "
                 f"{j + 1} * (len(e0.embedding) // {m}))")
        body, cf = _kmeans_ctes(k, n_iter, tag=f"p{j}", vexpr=vexpr)
        bodies.append(body)
        finals.append(f"""q{j} AS (
        SELECT id, c FROM (
            SELECT e.id, c.c,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM p{j}emb e CROSS JOIN {cf} c)
        WHERE rn = 1)""")
        dqs.append(f"""dq{j} AS (
        SELECT c.c, round(list_distance(
            list_slice(qv.v, {j} * (len(qv.v) // {m}) + 1,
                       {j + 1} * (len(qv.v) // {m})), c.v), 6) AS d
        FROM {cf} c, qv)""")
    adc = " + ".join(f"dq{j}.d * dq{j}.d" for j in range(m))
    joins = " ".join(f"JOIN q{j} ON q{j}.id = q0.id"
                     for j in range(1, m))
    dq_joins = " ".join(f"JOIN dq{j} ON dq{j}.c = q{j}.c"
                        for j in range(m))
    all_bodies = ",\n".join(bodies)
    all_finals = ",\n".join(finals)
    all_dqs = ",\n".join(dqs)
    return f"""
    WITH {all_bodies},
    qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id = 0),
    {all_finals},
    {all_dqs},
    hk AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, {ref} AS hkey
        FROM embeddings e,
        {lat}
    ),
    cents AS (
        SELECT vec_id AS cent_id, v AS cv,
               ROW_NUMBER() OVER (ORDER BY hkey, vec_id) AS cent_rank
        FROM hk ORDER BY hkey, vec_id LIMIT {n_centroids}
    ),
    probe AS (
        SELECT c.cent_rank FROM cents c, qv
        ORDER BY list_cosine_similarity(c.cv, qv.v) DESC, c.cent_rank
        LIMIT {n_probe}
    ),
    assign AS (
        SELECT vec_id, cent_rank FROM (
            SELECT e.vec_id, c.cent_rank,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                c.cent_rank) AS rn
            FROM hk e CROSS JOIN cents c
        ) WHERE rn = 1
    )
    SELECT q0.id AS vec_id, round({adc}, 6) AS adc
    FROM q0 {joins} {dq_joins}
    JOIN assign a ON a.vec_id = q0.id
    JOIN probe p USING (cent_rank)
    ORDER BY adc, vec_id LIMIT {k_top}
    """


def _semantic_dedup_sql(k: int = 8, n_iter: int = 4,
                        tau: float = 0.35) -> str:
    """Mirror of stages/cluster.py:semantic_dedup — final k-means
    assignment + within-cluster self-join on lower ids at
    round(cosine, 6) ≥ tau; dup_of = smallest such id, else -1."""
    body, cfin = _kmeans_ctes(k, n_iter)
    return f"""
    WITH {body},
    af AS MATERIALIZED (
        SELECT id, v, c FROM (
            SELECT e.id, e.v, c.c,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM emb e CROSS JOIN {cfin} c)
        WHERE rn = 1)
    SELECT a.id AS vec_id, CAST(a.c AS BIGINT) AS cluster,
           COALESCE(MIN(b.id), -1) AS dup_of
    FROM af a LEFT JOIN af b
      ON a.c = b.c AND b.id < a.id
     AND round(list_cosine_similarity(a.v, b.v), 6) >= {tau}
    GROUP BY a.id, a.c ORDER BY a.id
    """


def _lineitem_sample_sql(n: int = 2000) -> str:
    """Mirror of deterministic_sample over lineitem: the n rows with the
    smallest mix64(628, 4, l_orderkey, l_linenumber), key tie-break."""
    lat, ref = _mix_chain("sm", ["li.l_orderkey", "li.l_linenumber"],
                          [628, 4])
    return f"""
    SELECT CAST(li.l_orderkey AS BIGINT) AS l_orderkey,
           CAST(li.l_linenumber AS BIGINT) AS l_linenumber,
           li.l_quantity
    FROM lineitem li,
    {lat}
    ORDER BY {ref}, li.l_orderkey, li.l_linenumber, li.l_quantity
    LIMIT {n}
    """


# --- training-data curation mirrors (stages/curation.py) -------------------

def _decontaminate_sql() -> str:
    """Exact mirror of docs_decontaminate: distinct word-trigram shingle
    hashes (same rolling-fp + mix64(17, ...) % 2^31-1 as the minhash
    mirror), eval = doc_id % 41 = 0, per-train-doc hit counts against the
    eval shingle union."""
    t3_lat, t3_ref = _mix_chain("dc", ["t.h0", "t.h1", "t.h2"], [17])
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS (SELECT DISTINCT t.doc_id,
                  CAST({t3_ref} % 2147483647 AS BIGINT) AS x
           FROM tri t, {t3_lat}),
    ev AS (SELECT DISTINCT x FROM sh WHERE doc_id % 41 = 0),
    tr AS (SELECT doc_id, x FROM sh WHERE doc_id % 41 <> 0),
    hits AS (SELECT t.doc_id, count(*) AS n_hits
             FROM tr t JOIN ev USING (x) GROUP BY t.doc_id),
    cnt AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id)
    SELECT c.doc_id, CAST(c.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS contaminated
    FROM cnt c LEFT JOIN hits h USING (doc_id)
    """


def _dup_ngrams_sql(min_count: int = 2, thr: float = 0.5) -> str:
    """Exact mirror of docs_dup_ngrams: the decontaminate shingle CTEs
    (distinct word-trigram mix64(17,...) % 2^31-1 hashes per doc), then
    per-shingle distinct-document counts and the per-doc duplicated
    fraction (rounded to 6 dp, flag at >= thr on the ROUNDED value)."""
    t3_lat, t3_ref = _mix_chain("dn", ["t.h0", "t.h1", "t.h2"], [17])
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS (SELECT DISTINCT t.doc_id,
                  CAST({t3_ref} % 2147483647 AS BIGINT) AS x
           FROM tri t, {t3_lat}),
    df AS (SELECT x, count(*) AS c FROM sh GROUP BY x),
    per AS (SELECT s.doc_id, count(*) AS n,
                   sum(CASE WHEN d.c >= {min_count} THEN 1 ELSE 0 END) AS nd
            FROM sh s JOIN df d USING (x) GROUP BY s.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n AS BIGINT) AS n_shingles,
           CAST(nd AS BIGINT) AS n_dup,
           floor(nd / n::DOUBLE * 1000000 + 0.5) / 1000000
               AS dup_fraction,
           CAST(CASE WHEN floor(nd / n::DOUBLE * 1000000 + 0.5)
                          / 1000000 >= {thr}
                THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM per
    """


_DOMAIN_STATS_SQL = f"""
    WITH q AS (SELECT source,
                      length(text) AS n_chars,
                      length({_TOKENS}) AS n_tokens,
                      length(list_filter({_TOKENS},
                          x -> list_contains({_STOPS},
                               trim(lower(x), '.,!?;:')))) AS stop_cnt
               FROM documents),
    g AS (SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
                 sum(n_tokens) AS sum_tokens, sum(stop_cnt) AS sum_stop
          FROM q GROUP BY source)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sum_chars AS BIGINT) AS sum_chars,
           CAST(sum_tokens AS BIGINT) AS sum_tokens,
           floor(sum_stop / sum_tokens::DOUBLE * 1000000 + 0.5)
               / 1000000 AS stop_ratio,
           CAST(CASE WHEN n_docs >= 5
                      AND floor(sum_stop / sum_tokens::DOUBLE
                                * 1000000 + 0.5) / 1000000 >= 0.05
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM g
    """


def _shuffle_export_sql() -> str:
    """Exact mirror of docs_shuffle_export: key = mix64(41, doc_id) mod
    2^63, shard = key mod 8, pos = rank of (key, doc_id) within shard."""
    lat, ref = _mix_chain("se", ["d.doc_id"], [41])
    return f"""
    WITH k AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                      CAST({ref} % 9223372036854775808::HUGEINT
                           AS BIGINT) AS key
               FROM documents d, {lat})
    SELECT doc_id, CAST(key % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY key % 8
                                   ORDER BY key, doc_id) - 1
                AS BIGINT) AS pos
    FROM k
    """


def _pack_bins_sql() -> str:
    """Exact mirror of docs_pack_bins: whitespace token counts (same
    class as docs_quality), exclusive running sum in doc_id order,
    bin = start_off // 512."""
    return f"""
    WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        CAST(length({_TOKENS}) AS BIGINT) AS n_tokens
                 FROM documents)
    SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_off,
           CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 512 AS BIGINT) AS bin
    FROM tok
    """


def _source_mixture_sql() -> str:
    """Exact mirror of docs_source_mixture: draw = mix64(97, doc_id) mod
    1e6 < keep-rate(source) × 1e6 (src0-4 full, src5-9 half, src10-14
    tenth, rest dropped)."""
    lat, ref = _mix_chain("mx", ["d.doc_id"], [97])
    return f"""
    WITH dr AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
                       CAST({ref} % 1000000 AS BIGINT) AS draw
                FROM documents d, {lat})
    SELECT doc_id, source FROM dr
    WHERE draw < CASE
        WHEN source IN ('src0','src1','src2','src3','src4') THEN 1000000
        WHEN source IN ('src5','src6','src7','src8','src9') THEN 500000
        WHEN source IN ('src10','src11','src12','src13','src14')
             THEN 100000
        ELSE 0 END
    """


def _clean_corpus_sql() -> str:
    """Exact mirror of docs_clean_corpus: exact-dup winner (min doc_id
    per identical text), token band [25, 80] (same whitespace class as
    docs_quality), dup-word fraction ≤ 0.65 (same empties-kept split as
    docs_repetition), tiered source mixture (same mix64 draw as
    docs_source_mixture)."""
    lat, ref = _mix_chain("cc", ["d.doc_id"], [97])
    return f"""
    WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        CAST(length({_TOKENS}) AS BIGINT) AS n_tokens
                 FROM documents),
    w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents),
    rep AS (SELECT doc_id, count(*) AS nw, count(DISTINCT word) AS nu
            FROM w GROUP BY doc_id),
    ded AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY text)
                        THEN 1 ELSE 0 END AS keep_dedup
            FROM documents),
    mx AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                  CASE WHEN CAST({ref} % 1000000 AS BIGINT) < CASE
                      WHEN d.source IN ('src0','src1','src2','src3','src4')
                           THEN 1000000
                      WHEN d.source IN ('src5','src6','src7','src8','src9')
                           THEN 500000
                      WHEN d.source IN ('src10','src11','src12','src13',
                                        'src14') THEN 100000
                      ELSE 0 END THEN 1 ELSE 0 END AS keep_mixture
           FROM documents d, {lat})
    SELECT t.doc_id,
           CAST(ded.keep_dedup AS BIGINT) AS keep_dedup,
           CAST(CASE WHEN t.n_tokens BETWEEN 25 AND 80 THEN 1 ELSE 0 END
                AS BIGINT) AS keep_quality,
           CAST(CASE WHEN (rep.nw - rep.nu) * 1.0 / rep.nw <= 0.65
                     THEN 1 ELSE 0 END AS BIGINT) AS keep_repetition,
           CAST(mx.keep_mixture AS BIGINT) AS keep_mixture,
           CAST(ded.keep_dedup
                * CASE WHEN t.n_tokens BETWEEN 25 AND 80 THEN 1 ELSE 0 END
                * CASE WHEN (rep.nw - rep.nu) * 1.0 / rep.nw <= 0.65
                       THEN 1 ELSE 0 END
                * mx.keep_mixture AS BIGINT) AS keep
    FROM tok t
    JOIN rep USING (doc_id)
    JOIN ded USING (doc_id)
    JOIN mx USING (doc_id)
    """


_TOP_TOKENS_SQL = """
    WITH dw AS (SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[0-9a-z_]+')) AS token
                FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS df
    FROM dw GROUP BY token
    ORDER BY df DESC, token
    LIMIT 50
"""



_WORD_ENTROPY_SQL = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
        FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    n AS (SELECT doc_id, sum(c) AS nw, count(*) AS nu
          FROM wc GROUP BY doc_id),
    ent AS (
        SELECT wc.doc_id,
               -sum((wc.c / n.nw::DOUBLE) * ln(wc.c / n.nw::DOUBLE)) AS h
        FROM wc JOIN n USING (doc_id) GROUP BY wc.doc_id
    )
    SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
           CAST(n.nw AS BIGINT) AS n_words,
           CAST(n.nu AS BIGINT) AS n_unique,
           round(ent.h, 6) AS entropy,
           round(CASE WHEN n.nu > 1 THEN ent.h / ln(n.nu) ELSE 0 END, 6)
               AS norm_entropy
    FROM n JOIN ent USING (doc_id)
    ORDER BY doc_id
"""


# overlapping 64-token windows, stride 48 — DuckDB list slicing is
# 1-based with an INCLUSIVE end and clamps past the list, so window k
# is ws[k*48+1 : least(k*48+64, nw)]
_CHUNK_WINDOWS_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    n AS (SELECT doc_id, ws, len(ws) AS nw FROM w),
    ch AS (
        SELECT doc_id, ws, nw,
               unnest(range(0, 1 + (greatest(nw - 64, 0) + 47) // 48)) AS k
        FROM n
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           CAST(k * 48 AS BIGINT) AS start,
           CAST(least(k * 48 + 64, nw) - k * 48 AS BIGINT) AS n_tokens,
           array_to_string(ws[k * 48 + 1 : least(k * 48 + 64, nw)], ' ')
               AS chunk_text
    FROM ch ORDER BY doc_id, chunk_id
"""


_ADAMIC_ADAR_SQL = """
    WITH li AS MATERIALIZED (
        SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                        CAST(l_partkey AS BIGINT) AS p
        FROM lineitem),
    und AS MATERIALIZED (
        SELECT DISTINCT x.p AS a, y.p AS b
        FROM li x JOIN li y ON y.o = x.o AND y.p > x.p),
    adj AS MATERIALIZED (
        SELECT a AS u, b AS w FROM und UNION ALL SELECT b, a FROM und),
    deg AS MATERIALIZED (SELECT u, count(*) AS d FROM adj GROUP BY u),
    cn AS (
        SELECT e.a, e.b, x.w
        FROM und e
        JOIN adj x ON x.u = e.a
        JOIN adj y ON y.u = e.b AND y.w = x.w
        WHERE x.w <> e.b AND x.w <> e.a)
    SELECT CAST(cn.a AS BIGINT) AS a, CAST(cn.b AS BIGINT) AS b,
           count(*)::BIGINT AS common_neighbors,
           round(sum(1.0 / ln(deg.d)), 6) AS adamic_adar
    FROM cn JOIN deg ON deg.u = cn.w
    GROUP BY cn.a, cn.b
    ORDER BY a, b
"""



def _bloom_decontaminate_sql(m_bits: int = 1 << 12, k: int = 3,
                             seed: int = 401) -> str:
    """Exact mirror of docs_bloom_decontaminate: the decontaminate
    shingle CTEs, then the Bloom positions mix64(seed+i, x) % m_bits
    (ONE shared bit set over the eval side, i = 0..k-1) and the all-bits
    probe per train shingle — false positives reproduced bit-for-bit."""
    t3_lat, t3_ref = _mix_chain("bd", ["t.h0", "t.h1", "t.h2"], [17])
    pos_lats, pos_cols = [], []
    for i in range(k):
        lat, ref = _mix_chain(f"bp{i}", ["s.x"], [seed + i])
        pos_lats.append(lat)
        pos_cols.append(f"CAST(({ref}) % {m_bits} AS BIGINT) AS p{i}")
    bits_union = "\n             UNION ALL ".join(
        f"SELECT p{i} AS p FROM pos WHERE doc_id % 41 = 0"
        for i in range(k))
    probe = " AND ".join(
        f"p{i} IN (SELECT p FROM bits)" for i in range(k))
    return f"""
    WITH wl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws
                FROM documents),
    pw AS (SELECT doc_id, u['i'] AS i, u['w'] AS w FROM (
               SELECT doc_id,
                      unnest(list_transform(ws,
                             (w, i) -> {{'i': i, 'w': w}})) AS u
               FROM wl)),
    gw AS (SELECT DISTINCT w FROM pw),
    wh AS (SELECT w, {_wfp_sql('w')} AS fp FROM gw),
    ph AS (SELECT p.doc_id, p.i, wh.fp FROM pw p JOIN wh USING (w)),
    tri AS (SELECT a.doc_id, a.fp AS h0, b.fp AS h1, c.fp AS h2
            FROM ph a
            JOIN ph b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN ph c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    sh AS (SELECT DISTINCT t.doc_id,
                  CAST({t3_ref} % 2147483647 AS BIGINT) AS x
           FROM tri t, {t3_lat}),
    pos AS MATERIALIZED (
        SELECT s.doc_id, s.x, {", ".join(pos_cols)}
        FROM sh s, {", ".join(pos_lats)}),
    bits AS MATERIALIZED (
        SELECT DISTINCT p FROM ({bits_union})),
    ev AS (SELECT DISTINCT x FROM sh WHERE doc_id % 41 = 0),
    tr AS (SELECT doc_id, x, {", ".join(f"p{i}" for i in range(k))}
           FROM pos WHERE doc_id % 41 <> 0),
    bh AS (SELECT doc_id, count(*) AS n_bloom FROM tr
           WHERE {probe} GROUP BY doc_id),
    th AS (SELECT t.doc_id, count(*) AS n_true
           FROM tr t JOIN ev USING (x) GROUP BY t.doc_id),
    cnt AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id)
    SELECT c.doc_id, CAST(c.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(b.n_bloom, 0) AS BIGINT) AS n_bloom_hits,
           CAST(COALESCE(h.n_true, 0) AS BIGINT) AS n_true_hits,
           CAST(COALESCE(b.n_bloom, 0) - COALESCE(h.n_true, 0)
                AS BIGINT) AS n_false_pos,
           CAST(CASE WHEN COALESCE(b.n_bloom, 0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS contaminated
    FROM cnt c LEFT JOIN bh b USING (doc_id) LEFT JOIN th h USING (doc_id)
    ORDER BY doc_id
    """


_CHI2_SQL = """
    WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                      (source IN ('src0', 'src1', 'src2', 'src3'))::INT
                          AS pos,
                      lower(text) AS lt
               FROM documents),
    w AS (SELECT DISTINCT doc_id, pos, token FROM (
              SELECT doc_id, pos,
                     unnest(regexp_extract_all(lt, '[0-9a-z_]+'))
                         AS token
              FROM d)),
    st AS (SELECT token, sum(pos)::BIGINT AS c_pos,
                  sum(1 - pos)::BIGINT AS c_neg
           FROM w GROUP BY token),
    tot AS (SELECT count(*)::BIGINT AS n,
                   sum((source IN ('src0', 'src1', 'src2', 'src3'))
                       ::INT)::BIGINT AS np
            FROM documents),
    s AS (SELECT st.token, st.c_pos, st.c_pos + st.c_neg AS df,
                 (st.c_pos * (tot.n - tot.np - st.c_neg)
                  - st.c_neg * (tot.np - st.c_pos)) AS det,
                 tot.n, tot.np
          FROM st, tot)
    SELECT token, CAST(df AS BIGINT) AS df, c_pos,
           ROUND(CASE WHEN ((df::DOUBLE * (n - df)::DOUBLE)
                            * np::DOUBLE) * (n - np)::DOUBLE > 0
                 THEN (n::DOUBLE * (det::DOUBLE * det::DOUBLE))
                      / (((df::DOUBLE * (n - df)::DOUBLE)
                          * np::DOUBLE) * (n - np)::DOUBLE)
                 ELSE 0.0 END, 6) AS chi2
    FROM s ORDER BY chi2 DESC, token LIMIT 50
"""


def _biased_walks_sql(n_steps: int = 3, seed: int = 911) -> str:
    """Exact mirror of kg_biased_walks (stages/graph.py:biased_walks):
    step 1 is the uniform rank draw; steps ≥ 2 weigh each candidate
    edge 1/2/1 (return / prev→nxt edge exists / outward), take the
    first edge in (t, r) order whose running weight cumsum exceeds
    mix64(seed, step, cur, start) % total_weight."""
    lat1, ref1 = _mix_chain("bw1", ["s0.cur", "s0.start"], [seed, 1])
    steps = [f"""
    s1 AS MATERIALIZED (
        SELECT s0.start, e.t AS cur, s0.cur AS prev, e.r
        FROM s0, {lat1}, deg d, er e
        WHERE d.h = s0.cur AND e.h = s0.cur
          AND e.rk = CAST(({ref1}) % d.d AS BIGINT))"""]
    selects = ["SELECT start, 1 AS step, r, cur AS node FROM s1"]
    for st in range(2, n_steps + 1):
        lat, ref = _mix_chain(f"bw{st}", ["c.cur", "c.start"], [seed, st])
        steps.append(f"""
    w{st} AS MATERIALIZED (
        SELECT p.start, p.cur, p.prev, e.t, e.r,
               CASE WHEN e.t = p.prev THEN 1
                    WHEN dd.h IS NOT NULL THEN 2 ELSE 1 END AS w
        FROM s{st - 1} p JOIN er e ON e.h = p.cur
        LEFT JOIN dd ON dd.h = p.prev AND dd.t = e.t),
    c{st} AS MATERIALIZED (
        SELECT *, sum(w) OVER (PARTITION BY start ORDER BY t, r
                       ROWS UNBOUNDED PRECEDING) AS cum,
               sum(w) OVER (PARTITION BY start) AS tot
        FROM w{st}),
    s{st} AS MATERIALIZED (
        SELECT start, t AS cur, cur AS prev, r FROM (
            SELECT c.*, row_number() OVER (PARTITION BY c.start
                        ORDER BY c.t, c.r) AS rsel
            FROM c{st} c, {lat}
            WHERE c.cum > CAST(({ref}) % c.tot AS BIGINT))
        WHERE rsel = 1)""")
        selects.append(
            f"SELECT start, {st} AS step, r, cur AS node FROM s{st}")
    return f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    er AS MATERIALIZED (
        SELECT h, t, r,
               row_number() OVER (PARTITION BY h ORDER BY t, r) - 1 AS rk
        FROM edges0),
    deg AS MATERIALIZED (SELECT h, count(*) AS d FROM er GROUP BY h),
    dd AS MATERIALIZED (SELECT DISTINCT h, t FROM edges0),
    s0 AS MATERIALIZED (
        SELECT id AS start, id AS cur FROM ({_VOCAB_SQL})),
    {",".join(steps)}
    SELECT CAST(start AS BIGINT) AS start, CAST(step AS BIGINT) AS step,
           CAST(r AS BIGINT) AS r, CAST(node AS BIGINT) AS node
    FROM ({" UNION ALL ".join(selects)})
    ORDER BY start, step
    """


def _assign_cte(emb: str, cent: str) -> str:
    """The shared round-6 nearest-centroid assignment select."""
    return f"""
        SELECT id, c, d FROM (
            SELECT e.id, c.c, round(list_distance(e.v, c.v), 6) AS d,
                   row_number() OVER (PARTITION BY e.id
                       ORDER BY round(list_distance(e.v, c.v), 6), c.c)
                       AS rn
            FROM {emb} e CROSS JOIN {cent} c)
        WHERE rn = 1"""


def _rq_sql(k: int = 4, n_iter: int = 2) -> str:
    """Exact mirror of embeddings_rq (stages/cluster.py:residual_quant):
    the level-1 kmeans chain, residuals = raw vector − ROUNDED level-1
    centroid (exact IEEE subtraction, lockstep unnest), then the
    identical chain re-targeted at the residual CTE via the kmeans CTE
    generator's ``src`` parameter."""
    b1, cf1 = _kmeans_ctes(k, n_iter, tag="l1")
    b2, cf2 = _kmeans_ctes(k, n_iter, tag="l2", vexpr="e0.embedding",
                           src="resid")
    return f"""
    WITH {b1},
    a1 AS MATERIALIZED ({_assign_cte("l1emb", cf1)}),
    resid AS MATERIALIZED (
        SELECT id AS vec_id, list(ex - cx ORDER BY pos) AS embedding
        FROM (SELECT a1.id, unnest(e.v) AS ex, unnest(c.v) AS cx,
                     generate_subscripts(e.v, 1) AS pos
              FROM a1 JOIN l1emb e ON e.id = a1.id
                   JOIN {cf1} c ON c.c = a1.c)
        GROUP BY id),
    {b2},
    a2 AS MATERIALIZED ({_assign_cte("l2emb", cf2)})
    SELECT a1.id AS vec_id, CAST(a1.c AS BIGINT) AS c1, a1.d AS d1,
           CAST(a2.c AS BIGINT) AS c2, a2.d AS rq_err
    FROM a1 JOIN a2 ON a2.id = a1.id ORDER BY vec_id
    """


def _rake_sql(k: int = 20) -> str:
    """Exact mirror of docs_rake_keywords
    (stages/retrieval.py:rake_keywords): gaps-and-islands phrase
    grouping (p − row_number over non-stop tokens ≡ the break-at-stop/
    doc-change rule), global word deg/freq scores, phrase score = the
    6-dp-rounded word-score sum."""
    from ttmf_ray.stages.text import _EN_STOP

    stops = "[" + ", ".join(f"'{w}'" for w in _EN_STOP) + "]"
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         regexp_extract_all(lower(text),
                                            '[0-9a-z_]+') AS ws
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ws) AS w,
                    (generate_subscripts(ws, 1) - 1)::BIGINT AS p
             FROM toks),
    ns AS MATERIALIZED (
        SELECT doc_id, w, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                   AS grp
        FROM flat WHERE NOT list_contains({stops}, w)),
    wstat AS (SELECT w, count(*)::BIGINT AS freq FROM ns GROUP BY w),
    plen AS (SELECT doc_id, grp, count(*)::BIGINT AS len
             FROM ns GROUP BY doc_id, grp),
    wdeg AS (SELECT ns.w, sum(plen.len)::BIGINT AS deg
             FROM ns JOIN plen USING (doc_id, grp) GROUP BY ns.w),
    wscore AS (SELECT wstat.w, (wdeg.deg::DOUBLE / wstat.freq) AS s
               FROM wstat JOIN wdeg USING (w)),
    ph AS (SELECT ns.doc_id, ns.grp,
                  string_agg(ns.w, ' ' ORDER BY ns.p) AS phrase,
                  count(*)::BIGINT AS n_words,
                  ROUND(sum(wscore.s), 6) AS score
           FROM ns JOIN wscore ON wscore.w = ns.w
           GROUP BY ns.doc_id, ns.grp),
    agg AS (SELECT phrase, n_words, score, count(*)::BIGINT AS n_occ
            FROM ph GROUP BY phrase, n_words, score)
    SELECT phrase, n_words, score, n_occ
    FROM agg ORDER BY score DESC, phrase LIMIT {k}
    """


_ASSORT_SQL = f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    dg AS (SELECT id, sum(d)::BIGINT AS d FROM (
               SELECT h AS id, count(*) AS d FROM edges0 GROUP BY h
               UNION ALL
               SELECT t AS id, count(*) AS d FROM edges0 GROUP BY t)
           GROUP BY id),
    xy AS (SELECT a.d AS x, b.d AS y
           FROM edges0 e JOIN dg a ON a.id = e.h
                         JOIN dg b ON b.id = e.t),
    s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                 sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                 sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
          FROM xy)
    SELECT n AS n_edges,
           -- zero-variance degeneracy (all heads or all tails share one
           -- degree) → r defined as 0.0, matching the Python kernel
           CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy
                        - CAST(sy AS DOUBLE) * sy) <= 0 THEN 0.0
           ELSE ROUND((CAST(n AS DOUBLE) * sxy
                       - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) END
               AS assortativity
    FROM s
"""


_TYPE_VIOLATIONS_SQL = f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    hr AS (SELECT h, r, count(*)::BIGINT AS c FROM edges0 GROUP BY h, r),
    ht AS (SELECT h, r AS htype FROM (
        SELECT h, r, ROW_NUMBER() OVER (PARTITION BY h
            ORDER BY c DESC, r) AS rn FROM hr) WHERE rn = 1),
    et AS (SELECT e.r, ht.htype, count(*)::BIGINT AS c
           FROM edges0 e JOIN ht ON e.h = ht.h GROUP BY e.r, ht.htype),
    dom AS (SELECT r, htype AS dom_subj_type, c AS dom_cnt FROM (
        SELECT r, htype, c, ROW_NUMBER() OVER (PARTITION BY r
            ORDER BY c DESC, htype) AS rn FROM et) WHERE rn = 1),
    tot AS (SELECT r, sum(c)::BIGINT AS n_edges FROM et GROUP BY r)
    SELECT t.r::BIGINT AS rel, t.n_edges,
           d.dom_subj_type::BIGINT AS dom_subj_type,
           (t.n_edges - d.dom_cnt)::BIGINT AS n_viol,
           floor((t.n_edges - d.dom_cnt)
                 / CAST(t.n_edges AS DOUBLE) * 1000000 + 0.5)
               / 1000000 AS viol_share
    FROM tot t JOIN dom d USING (r) ORDER BY rel
"""


_CODE_DETECT_SQL = """
    WITH aug AS MATERIALIZED (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || e'\ndef f(x):\n    return x + 1\n\nimport os\n\tval = items[0]; { x = (1, 2); }\n'
                    ELSE text END AS t
        FROM documents),
    cc AS (SELECT doc_id,
                  ((length(t) - length(replace(t, 'def ', ''))) // 4 + (length(t) - length(replace(t, 'import ', ''))) // 7 + (length(t) - length(replace(t, 'return ', ''))) // 7 + (length(t) - length(replace(t, '#include', ''))) // 8 + (length(t) - length(replace(t, 'function ', ''))) // 9)::BIGINT AS kw_hits,
                  ((length(t) - length(replace(t, '{' , ''))) + (length(t) - length(replace(t, '}' , ''))) + (length(t) - length(replace(t, '(' , ''))) + (length(t) - length(replace(t, ')' , ''))) + (length(t) - length(replace(t, ';' , ''))) + (length(t) - length(replace(t, '=' , ''))) + (length(t) - length(replace(t, '[' , ''))) + (length(t) - length(replace(t, ']' , ''))))::BIGINT AS sym,
                  length(t)::BIGINT AS nch
           FROM aug),
    ln AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS l
           FROM aug),
    lc AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
                  sum(CASE WHEN l LIKE '    %'
                           OR l LIKE chr(9) || '%'
                      THEN 1 ELSE 0 END)::BIGINT AS indent_lines
           FROM ln GROUP BY doc_id),
    sc AS (SELECT cc.doc_id, lc.n_lines, lc.indent_lines, cc.kw_hits,
                  floor(cc.sym / greatest(cc.nch, 1)::DOUBLE
                        * 1000000 + 0.5) / 1000000
                      AS sym_density,
                  floor(lc.indent_lines
                        / greatest(lc.n_lines, 1)::DOUBLE
                        * 1000000 + 0.5) / 1000000
                      AS indent_frac
           FROM cc JOIN lc USING (doc_id))
    SELECT doc_id, n_lines, indent_lines, kw_hits, sym_density,
           indent_frac,
           (CASE WHEN (indent_frac >= 0.2 AND n_lines >= 3)
                 OR kw_hits >= 2 OR sym_density > 0.03
            THEN 1 ELSE 0 END)::BIGINT AS is_code
    FROM sc ORDER BY doc_id
"""


_INTERARRIVAL_SQL = """
    WITH ev AS (SELECT user_id, epoch_us(ts)::BIGINT AS ts FROM events),
    gp AS (SELECT user_id,
                  ts - lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts) AS gap
           FROM ev),
    g2 AS (SELECT user_id, gap FROM gp WHERE gap IS NOT NULL),
    rk AS (SELECT user_id, gap,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY gap) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS k
           FROM g2)
    SELECT user_id, k::BIGINT AS n_gaps, gap::BIGINT AS median_gap_us
    FROM rk WHERE rn = (k + 1) // 2 ORDER BY user_id
"""


_PARETO_SQL = """
    WITH uc AS (SELECT user_id, count(*)::BIGINT AS n
                FROM events GROUP BY user_id),
    rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id)
                     AS rank FROM uc),
    tot AS (SELECT count(*)::BIGINT AS n_users, sum(n)::BIGINT AS total
            FROM uc),
    dc AS (SELECT (10 * (rk.rank - 1)) // tot.n_users AS decile,
                  rk.n, tot.total
           FROM rk, tot),
    agg AS (SELECT decile, count(*)::BIGINT AS n_users,
                   sum(n)::BIGINT AS n_events, any_value(total) AS total
            FROM dc GROUP BY decile)
    SELECT decile::BIGINT AS decile, n_users, n_events,
           floor(n_events / CAST(total AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS share,
           floor(sum(n_events) OVER (ORDER BY decile
                     ROWS UNBOUNDED PRECEDING)
                 / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS cum_share
    FROM agg ORDER BY decile
"""


_STREAK_SQL = """
    WITH ud AS (SELECT DISTINCT user_id,
                       (epoch_us(ts) // 86400000000)::BIGINT AS day
                FROM events),
    isl AS (SELECT user_id, day,
                   day - ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY day) AS grp
            FROM ud),
    st AS (SELECT user_id, grp, count(*)::BIGINT AS len
           FROM isl GROUP BY user_id, grp)
    SELECT user_id, sum(len)::BIGINT AS n_active_days,
           max(len)::BIGINT AS longest_streak,
           count(*)::BIGINT AS n_streaks
    FROM st GROUP BY user_id ORDER BY user_id
"""


_SLIDING_TOPK_SQL = """
    WITH hc AS (SELECT event_type,
                       (epoch_us(ts) // 3600000000)::BIGINT AS hour,
                       count(*)::BIGINT AS n
                FROM events GROUP BY event_type, hour),
    anchors AS (SELECT DISTINCT hour AS anchor_hour FROM hc),
    win AS (SELECT a.anchor_hour, hc.event_type,
                   sum(hc.n)::BIGINT AS n
            FROM anchors a JOIN hc
              ON hc.hour > a.anchor_hour - 6
             AND hc.hour <= a.anchor_hour
            GROUP BY a.anchor_hour, hc.event_type),
    rk AS (SELECT anchor_hour, event_type, n,
                  ROW_NUMBER() OVER (PARTITION BY anchor_hour
                      ORDER BY n DESC, event_type) AS rank
           FROM win)
    SELECT anchor_hour, rank::BIGINT AS rank, event_type, n
    FROM rk WHERE rank <= 3 ORDER BY anchor_hour, rank
"""


_TPCH_Q5_SQL = """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       l_extendedprice * (1.0 - l_discount) AS rev,
                       1970 + (epoch_us(l_shipdate)
                               // 31557600000000) AS l_year
                FROM lineitem),
    j AS (SELECT li.l_suppkey, li.rev, li.l_year, o.o_custkey
          FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey),
    x AS (SELECT n.n_regionkey, j.l_year, j.rev
          FROM j JOIN supplier s ON j.l_suppkey = s.s_suppkey
                 JOIN customer c ON j.o_custkey = c.c_custkey
                 JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE s.s_nationkey = c.c_nationkey)
    SELECT r.r_name AS region, x.l_year::BIGINT AS l_year,
           ROUND(sum(x.rev), 6) AS revenue
    FROM x JOIN region r ON x.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, x.l_year ORDER BY region, l_year
"""


_TPCH_Q6_SQL = """
    SELECT (1970 + (epoch_us(l_shipdate)
                    // 31557600000000))::BIGINT AS l_year,
           ROUND(sum(l_extendedprice * l_discount), 6) AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem
    WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    GROUP BY l_year ORDER BY l_year
"""


_USER_GINI_SQL = """
    WITH uc AS (SELECT user_id, event_type, count(*)::BIGINT AS c
                FROM events GROUP BY user_id, event_type),
    hist AS (SELECT event_type, c, count(*)::BIGINT AS m
             FROM uc GROUP BY event_type, c),
    -- rank-weighted sum via the count-of-counts histogram:
    -- S = sum v*(m*below + m(m+1)/2), tie-order invariant, all integer
    cum AS (SELECT event_type, c, m,
                   COALESCE(sum(m) OVER (PARTITION BY event_type
                            ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS below
            FROM hist),
    agg AS (SELECT event_type,
                   sum(m)::BIGINT AS n_users,
                   sum(c * m)::BIGINT AS total,
                   sum(c * (m * below + (m * (m + 1)) // 2))::BIGINT AS s
            FROM cum GROUP BY event_type)
    SELECT event_type, n_users, total,
           floor((2 * s - (n_users + 1) * total)::DOUBLE
                 / (n_users * total)::DOUBLE * 1000000 + 0.5)
               / 1000000 AS gini
    FROM agg ORDER BY event_type
"""


_TPCH_Q10_SQL = """
    WITH lo AS (SELECT l_orderkey,
                       sum(l_extendedprice * (1.0 - l_discount)) AS rev
                FROM lineitem WHERE l_returnflag = 'R'
                GROUP BY l_orderkey),
    cr AS (SELECT o.o_custkey AS c_custkey,
                  round(sum(lo.rev), 6) AS revenue
           FROM lo JOIN orders o ON lo.l_orderkey = o.o_orderkey
           GROUP BY o.o_custkey)
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(c.c_acctbal, 2) AS c_acctbal, cr.revenue
    FROM cr JOIN customer c ON cr.c_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY cr.revenue DESC, c.c_custkey LIMIT 20
"""


_TPCH_Q14_SQL = """
    WITH x AS (SELECT 1970 + (epoch_us(l_shipdate)
                              // 31557600000000) AS l_year,
                      l_extendedprice * (1.0 - l_discount) AS rev,
                      CASE WHEN p.p_type = 'PROMO'
                           THEN 1.0 ELSE 0.0 END AS is_p
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    a AS (SELECT l_year::BIGINT AS l_year,
                 round(sum(rev * is_p), 6) AS promo_rev,
                 round(sum(rev), 6) AS total_rev
          FROM x GROUP BY l_year)
    SELECT l_year, promo_rev, total_rev,
           round(100.0 * promo_rev / total_rev, 6) AS promo_share
    FROM a ORDER BY l_year
"""


_PROPS_EXTRACT_SQL = """
    WITH x AS (SELECT event_type,
                      TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                               AS BIGINT) AS k
               FROM events)
    SELECT event_type,
           count(*)::BIGINT AS n,
           count(k)::BIGINT AS n_with_k,
           COALESCE(sum(k), 0)::BIGINT AS sum_k,
           COALESCE(min(k), 0)::BIGINT AS min_k,
           COALESCE(max(k), 0)::BIGINT AS max_k,
           CASE WHEN count(k) = 0 THEN 0.0
                ELSE floor(sum(k)::DOUBLE / count(k)::DOUBLE
                           * 1000000 + 0.5) / 1000000
           END AS mean_k
    FROM x GROUP BY event_type ORDER BY event_type
"""


_BOILERPLATE_SQL = """
    WITH aug AS MATERIALIZED (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               text
               || (CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
                   '(c) 2026 Example Corp. All rights reserved.'
                   ELSE '' END)
               || (CASE WHEN doc_id % 4 = 0 THEN chr(10) ||
                   'This site uses cookies to improve your experience.'
                   ELSE '' END) AS text
        FROM documents),
    l AS MATERIALIZED (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        FROM aug),
    freq AS (SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM l
        WHERE length(line) >= 5 GROUP BY line) WHERE nd >= 3),
    k AS (SELECT l.doc_id, l.pos, l.line,
                 CASE WHEN length(l.line) >= 5 AND f.line IS NOT NULL
                      THEN 0 ELSE 1 END AS keep
          FROM l LEFT JOIN freq f ON l.line = f.line)
    SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(1 - keep)::BIGINT AS n_dropped,
           COALESCE(string_agg(CASE WHEN keep = 1 THEN line END,
                               chr(10) ORDER BY pos), '') AS text_clean
    FROM k GROUP BY doc_id ORDER BY doc_id
"""


_FUNNEL_TIME_SQL = """
    WITH s0 AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                       min(epoch_us(ts)) AS t
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    h1 AS (SELECT CAST(e.user_id AS BIGINT) AS user_id,
                  min(epoch_us(e.ts)) AS t, min(s0.t) AS tprev
           FROM events e JOIN s0 ON s0.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t
             AND epoch_us(e.ts) <= s0.t + 172800000000
           GROUP BY e.user_id),
    h2 AS (SELECT CAST(e.user_id AS BIGINT) AS user_id,
                  min(epoch_us(e.ts)) AS t, min(h1.t) AS tprev
           FROM events e JOIN h1 ON h1.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > h1.t
             AND epoch_us(e.ts) <= h1.t + 172800000000
           GROUP BY e.user_id),
    gaps AS (SELECT 1 AS step, t - tprev AS gap FROM h1
             UNION ALL SELECT 2 AS step, t - tprev AS gap FROM h2),
    n AS (SELECT step, count(*) AS n FROM gaps GROUP BY step),
    qs(q) AS (SELECT unnest([0.5, 0.9]::DOUBLE[])),
    og AS (SELECT step, gap AS v, row_number()
               OVER (PARTITION BY step ORDER BY gap) - 1 AS rk
           FROM gaps)
    SELECT CAST(n.step AS BIGINT) AS step, qs.q,
           CAST(og.v AS BIGINT) AS gap_us_q,
           CAST(n.n AS BIGINT) AS n_users
    FROM n CROSS JOIN qs
    JOIN og ON og.step = n.step
        AND og.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
    ORDER BY step, q
"""


_SESSION_PATHS_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), flagged AS (
        SELECT user_id, event_type, rn,
               CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY rn)
                         IS NULL
                         OR es - lag(es) OVER (PARTITION BY user_id
                                               ORDER BY rn) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ), tagged AS (
        SELECT user_id, event_type, rn,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY rn)
                   AS session_id
        FROM flagged
    ), paths AS (
        SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        FROM tagged GROUP BY user_id, session_id
    )
    SELECT path, count(*)::BIGINT AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
"""


_RANGE_SEARCH_SQL = """
    WITH q AS (SELECT CAST(vec_id AS BIGINT) AS query_id,
                      embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IN (0, 100, 200, 300, 400))
    SELECT q.query_id, CAST(x.vec_id AS BIGINT) AS vec_id,
           round(list_cosine_similarity(q.v, x.embedding::DOUBLE[]), 6)
               AS cosine
    FROM q JOIN embeddings x ON x.vec_id <> q.query_id
    WHERE round(list_cosine_similarity(q.v, x.embedding::DOUBLE[]), 6)
          >= 0.2
    ORDER BY q.query_id, vec_id
"""


_VALUE_STATS_SQL = """
    WITH c AS (SELECT event_type,
                      CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
               FROM events),
    a AS (SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                 sum(c * c)::BIGINT AS s2,
                 min(c)::BIGINT AS mn, max(c)::BIGINT AS mx
          FROM c GROUP BY event_type)
    SELECT event_type, n,
           round(s::DOUBLE / 100.0, 2) AS sum_v,
           round(s::DOUBLE / (100.0 * n), 6) AS mean_v,
           round((n * s2 - s * s)::DOUBLE
                 / (n::DOUBLE * n::DOUBLE * 10000.0), 6) AS var_v,
           round(mn::DOUBLE / 100.0, 2) AS min_v,
           round(mx::DOUBLE / 100.0, 2) AS max_v
    FROM a ORDER BY event_type
"""


_CLASS_CENTROIDS_SQL = """
    WITH emb AS MATERIALIZED (
        SELECT CAST(vec_id AS BIGINT) AS id,
               CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
        FROM embeddings),
    cent AS MATERIALIZED (
        SELECT label, list(xr ORDER BY pos) AS v FROM (
            SELECT label, pos, round(avg(x), 6) AS xr FROM (
                SELECT label, unnest(v) AS x,
                       generate_subscripts(v, 1) AS pos
                FROM emb)
            GROUP BY label, pos)
        GROUP BY label),
    d AS MATERIALIZED (
        SELECT e.id, e.label, c.label AS clabel,
               round(list_distance(e.v, c.v), 6) AS dist
        FROM emb e CROSS JOIN cent c),
    own AS (SELECT id, dist AS d_own FROM d WHERE label = clabel),
    oth AS (SELECT id, clabel AS other_label, dist AS d_other FROM (
        SELECT id, clabel, dist,
               row_number() OVER (PARTITION BY id
                                  ORDER BY dist, clabel) AS rn
        FROM d WHERE label <> clabel) WHERE rn = 1)
    SELECT e.id AS vec_id, e.label, o.d_own, t.other_label, t.d_other,
           round(t.d_other - o.d_own, 6) AS margin
    FROM emb e JOIN own o ON o.id = e.id JOIN oth t ON t.id = e.id
    ORDER BY vec_id
"""


_TPCH_Q7_SQL = """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       l_extendedprice * (1.0 - l_discount) AS rev,
                       1970 + (epoch_us(l_shipdate)
                               // 31557600000000) AS l_year
                FROM lineitem
                WHERE epoch_us(l_shipdate) >= 820454400000000
                  AND epoch_us(l_shipdate) < 883612800000000),
    j AS (SELECT li.l_suppkey, li.rev, li.l_year, o.o_custkey
          FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey),
    x AS (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                 j.l_year, j.rev
          FROM j JOIN supplier s ON j.l_suppkey = s.s_suppkey
                 JOIN customer c ON j.o_custkey = c.c_custkey
                 JOIN nation ns ON s.s_nationkey = ns.n_nationkey
                 JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          WHERE s.s_nationkey <> c.c_nationkey)
    SELECT supp_nation, cust_nation, l_year::BIGINT AS l_year,
           ROUND(sum(rev), 6) AS revenue
    FROM x GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


_EMB_COHESION_SQL = """
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS MATERIALIZED (
        SELECT d.source, e.vec_id, e.v
        FROM documents d JOIN e ON d.doc_id = e.vec_id),
    fl AS (SELECT source, vec_id, unnest(v) AS x,
                  generate_subscripts(v, 1) AS i FROM m),
    cent AS (SELECT source, i, sum(x) / count(*) AS c
             FROM fl GROUP BY source, i),
    cl AS (SELECT source, list(c ORDER BY i) AS cv
           FROM cent GROUP BY source),
    nrm AS (SELECT source, vec_id, sqrt(sum(x * x)) AS nrm
            FROM fl GROUP BY source, vec_id),
    cos AS (SELECT m.source,
                   list_cosine_similarity(m.v, cl.cv) AS cos,
                   n.nrm
            FROM m JOIN cl USING (source)
                   JOIN nrm n ON m.source = n.source
                             AND m.vec_id = n.vec_id)
    SELECT source, count(*)::BIGINT AS n,
           ROUND(sum(nrm) / count(*), 6) AS mean_norm,
           ROUND(sum(cos) / count(*), 6) AS cohesion
    FROM cos GROUP BY source ORDER BY source
"""


_MATRYOSHKA_SQL = """
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS MATERIALIZED (
        SELECT vec_id AS qid, v AS qv FROM e
        WHERE vec_id IN (0, 100, 200, 300, 400)),
    fullk AS MATERIALIZED (SELECT qid, vec_id FROM (
        SELECT qs.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(e.v, qs.qv) DESC,
                            e.vec_id) AS rn
        FROM e, qs) WHERE rn <= 10),
    trunc AS MATERIALIZED (SELECT qid, vec_id FROM (
        SELECT qs.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(e.v[1:8],
                                                   qs.qv[1:8]) DESC,
                            e.vec_id) AS rn
        FROM e, qs) WHERE rn <= 10),
    fc AS (SELECT qid, count(*) AS n_full FROM fullk GROUP BY qid),
    tc AS (SELECT qid, count(*) AS n_trunc FROM trunc GROUP BY qid),
    cm AS (SELECT f.qid, count(*) AS n_common
           FROM fullk f JOIN trunc t USING (qid, vec_id) GROUP BY f.qid)
    SELECT qs.qid::BIGINT AS qid,
           COALESCE(fc.n_full, 0)::BIGINT AS n_full,
           COALESCE(tc.n_trunc, 0)::BIGINT AS n_trunc,
           COALESCE(cm.n_common, 0)::BIGINT AS n_common,
           ROUND(COALESCE(cm.n_common, 0) / 10.0, 6) AS recall
    FROM qs LEFT JOIN fc USING (qid) LEFT JOIN tc USING (qid)
         LEFT JOIN cm USING (qid)
    ORDER BY qid
"""


_AB_TEST_SQL = """
    WITH u AS (SELECT user_id,
                      max(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END)::BIGINT AS conv
               FROM events GROUP BY user_id),
    a AS (SELECT (user_id % 2)::BIGINT AS arm,
                 count(*)::BIGINT AS n_users,
                 sum(conv)::BIGINT AS n_conv
          FROM u GROUP BY 1),
    s AS (SELECT
            (SELECT n_users FROM a WHERE arm = 0) AS n0,
            (SELECT n_users FROM a WHERE arm = 1) AS n1,
            (SELECT n_conv FROM a WHERE arm = 0) AS x0,
            (SELECT n_conv FROM a WHERE arm = 1) AS x1),
    -- identical fixed-order float64 chain as the numpy kernel:
    -- pp = (x0+x1)/(n0+n1); se = sqrt((pp*(1-pp))*(1/n0+1/n1))
    zc AS (SELECT CASE WHEN se > 0 THEN (p0 - p1) / se ELSE 0.0 END AS z
           FROM (SELECT x0 / CAST(n0 AS DOUBLE) AS p0,
                        x1 / CAST(n1 AS DOUBLE) AS p1,
                        sqrt(((x0 + x1) / CAST(n0 + n1 AS DOUBLE)
                              * (1.0 - (x0 + x1)
                                       / CAST(n0 + n1 AS DOUBLE)))
                             * (1.0 / n0 + 1.0 / n1)) AS se
                 FROM s))
    SELECT a.arm, a.n_users, a.n_conv,
           floor(a.n_conv / CAST(a.n_users AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS rate,
           ROUND(zc.z, 6) AS z
    FROM a, zc ORDER BY a.arm
"""


def _ann_recall_sql(qids=(0, 100, 200, 300, 400), k: int = 10,
                    n_centroids: int = 16, n_probe: int = 2,
                    salt: int = 17) -> str:
    """Exact mirror of embeddings_ann_recall (stages/ann.py:ann_recall):
    the hash-centroid IVF chain of _ivf_topk_sql generalized to several
    queries; candidates = the UNION of every query's probed buckets
    (ivf_topk searches that superset for all queries), recall = |ivf ∩
    brute| / k per query."""
    lat, ref = _mix_chain("ar", ["e.vec_id"], [salt])
    qlist = ", ".join(str(int(q)) for q in qids)
    return f"""
    WITH hk AS MATERIALIZED (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, {ref} AS hkey
        FROM embeddings e, {lat}),
    cents AS MATERIALIZED (
        SELECT vec_id AS cent_id, v AS cv,
               ROW_NUMBER() OVER (ORDER BY hkey, vec_id) AS cent_rank
        FROM hk ORDER BY hkey, vec_id LIMIT {n_centroids}),
    qs AS MATERIALIZED (
        SELECT vec_id AS qid, v AS qv FROM hk
        WHERE vec_id IN ({qlist})),
    probe AS (SELECT qid, cent_rank FROM (
        SELECT qs.qid, c.cent_rank,
               ROW_NUMBER() OVER (PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(c.cv, qs.qv) DESC,
                            c.cent_rank) AS pr
        FROM cents c, qs) WHERE pr <= {n_probe}),
    allowed AS (SELECT DISTINCT cent_rank FROM probe),
    assign AS MATERIALIZED (
        SELECT vec_id, v, cent_rank FROM (
            SELECT e.vec_id, e.v, c.cent_rank,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                c.cent_rank) AS rn
            FROM hk e CROSS JOIN cents c) WHERE rn = 1),
    brute AS MATERIALIZED (SELECT qid, vec_id FROM (
        SELECT qs.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(e.v, qs.qv) DESC,
                            e.vec_id) AS rn
        FROM hk e, qs) WHERE rn <= {k}),
    ivf AS MATERIALIZED (SELECT qid, vec_id FROM (
        SELECT qs.qid, a.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(a.v, qs.qv) DESC,
                            a.vec_id) AS rn
        FROM assign a JOIN allowed al USING (cent_rank), qs)
        WHERE rn <= {k}),
    bc AS (SELECT qid, count(*) AS n_brute FROM brute GROUP BY qid),
    vc AS (SELECT qid, count(*) AS n_ivf FROM ivf GROUP BY qid),
    cm AS (SELECT b.qid, count(*) AS n_common
           FROM brute b JOIN ivf i USING (qid, vec_id) GROUP BY b.qid)
    SELECT qs.qid::BIGINT AS qid,
           COALESCE(bc.n_brute, 0)::BIGINT AS n_brute,
           COALESCE(vc.n_ivf, 0)::BIGINT AS n_ivf,
           COALESCE(cm.n_common, 0)::BIGINT AS n_common,
           ROUND(COALESCE(cm.n_common, 0) / {k}.0, 6) AS recall
    FROM qs LEFT JOIN bc USING (qid) LEFT JOIN vc USING (qid)
         LEFT JOIN cm USING (qid)
    ORDER BY qid
    """


_ATTRIBUTION_SQL = """
    WITH p AS (SELECT CAST(event_id AS BIGINT) AS event_id,
                      CAST(user_id AS BIGINT) AS user_id,
                      epoch_us(ts) AS t
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                 epoch_us(ts) AS t
          FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.t,
           COALESCE(c.t, -1)::BIGINT AS touch_t,
           CASE WHEN c.t IS NULL THEN -1
                ELSE p.t - c.t END::BIGINT AS gap_us,
           CAST(CASE WHEN c.t IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS attributed
    FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.t <= p.t
    ORDER BY p.event_id
"""


_HOURLY_MAD_SQL = """
    WITH hc AS (SELECT event_type,
                       (epoch_us(ts) // 3600000000)::BIGINT AS hour,
                       count(*)::BIGINT AS c
                FROM events GROUP BY event_type, hour),
    n AS (SELECT event_type, count(*) AS n FROM hc GROUP BY event_type),
    rc AS (SELECT event_type, c AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY c) - 1 AS rk
           FROM hc),
    med AS (SELECT rc.event_type, max(CASE WHEN rc.rk = (n.n - 1) // 2
                                      THEN rc.v END) AS med
            FROM rc JOIN n USING (event_type) GROUP BY rc.event_type),
    dv AS (SELECT hc.event_type, abs(hc.c - med.med) AS d
           FROM hc JOIN med USING (event_type)),
    rd AS (SELECT event_type, d AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY d) - 1 AS rk
           FROM dv),
    mad AS (SELECT rd.event_type,
                   greatest(max(CASE WHEN rd.rk = (n.n - 1) // 2
                                THEN rd.v END), 1) AS mad
            FROM rd JOIN n USING (event_type) GROUP BY rd.event_type)
    SELECT hc.event_type, hc.hour, hc.c,
           med.med::BIGINT AS med, mad.mad::BIGINT AS mad,
           CAST(CASE WHEN abs(hc.c - med.med) > 3 * mad.mad
                THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM hc JOIN med USING (event_type) JOIN mad USING (event_type)
    ORDER BY hc.event_type, hc.hour
"""


_CUSUM_SQL = """
    WITH hc AS (SELECT event_type,
                       (epoch_us(ts) // 3600000000)::BIGINT AS hour,
                       count(*)::BIGINT AS c
                FROM events GROUP BY event_type, hour),
    n AS (SELECT event_type, count(*) AS n FROM hc GROUP BY event_type),
    rc AS (SELECT event_type, c AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY c) - 1 AS rk
           FROM hc),
    med AS (SELECT rc.event_type, max(CASE WHEN rc.rk = (n.n - 1) // 2
                                      THEN rc.v END) AS med
            FROM rc JOIN n USING (event_type) GROUP BY rc.event_type),
    dv AS (SELECT hc.event_type, abs(hc.c - med.med) AS d
           FROM hc JOIN med USING (event_type)),
    rd AS (SELECT event_type, d AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY d) - 1 AS rk
           FROM dv),
    mad AS (SELECT rd.event_type,
                   greatest(max(CASE WHEN rd.rk = (n.n - 1) // 2
                                THEN rd.v END), 1) AS mad
            FROM rd JOIN n USING (event_type) GROUP BY rd.event_type),
    -- S_t = max(0, S_{t-1} + (c_t - med)) via the prefix identity
    -- S_t = P_t - min(0, running-min P): pure integer window arithmetic.
    ser AS (SELECT hc.event_type, hc.hour, hc.c,
                   sum(hc.c - med.med) OVER (PARTITION BY hc.event_type
                                             ORDER BY hc.hour) AS p
            FROM hc JOIN med USING (event_type)),
    cus AS (SELECT event_type, hour, c,
                   p - least(min(p) OVER (PARTITION BY event_type
                                          ORDER BY hour), 0) AS s
            FROM ser)
    SELECT cus.event_type, cus.hour, cus.c, cus.s::BIGINT AS cusum,
           (4 * mad.mad)::BIGINT AS thresh,
           CAST(CASE WHEN cus.s > 4 * mad.mad
                THEN 1 ELSE 0 END AS BIGINT) AS is_alarm
    FROM cus JOIN mad USING (event_type)
    ORDER BY cus.event_type, cus.hour
"""


_ROLLING_ACTIVE_SQL = """
    WITH ud AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
                       (epoch_us(ts) // 86400000000)::BIGINT AS day
                FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
    ru AS (SELECT DISTINCT d.day AS day, u.user_id
           FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day),
    roll AS (SELECT day, count(*)::BIGINT AS rolling FROM ru
             GROUP BY day)
    SELECT dau.day, dau.dau, roll.rolling FROM dau JOIN roll USING (day)
    ORDER BY day
"""


_WINDOW_FUNNEL_SQL = """
    WITH e0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    e1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN e0 ON e0.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > e0.t
             AND epoch_us(e.ts) <= e0.t + 172800000000
           GROUP BY e.user_id),
    e2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN e1 ON e1.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > e1.t
             AND epoch_us(e.ts) <= e1.t + 172800000000
           GROUP BY e.user_id)
    SELECT * FROM (
        SELECT 0::BIGINT AS step, 'view' AS event_type,
               (SELECT count(*) FROM e0)::BIGINT AS n_users
        UNION ALL
        SELECT 1, 'click', (SELECT count(*) FROM e1)
        UNION ALL
        SELECT 2, 'purchase', (SELECT count(*) FROM e2))
    ORDER BY step
"""


_FERTILITY_TAIL = """,
    wn AS (SELECT word, count(*)::BIGINT AS n_syms FROM s8
           GROUP BY word),
    dw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  unnest(regexp_extract_all(lower(text),
                                            '[0-9a-z_]+')) AS word
           FROM documents),
    agg AS (SELECT dw.doc_id, count(*)::BIGINT AS n_words,
                   sum(COALESCE(wn.n_syms, 0))::BIGINT AS n_pieces
            FROM dw LEFT JOIN wn USING (word) GROUP BY dw.doc_id)
    SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_pieces, 0) AS n_pieces,
           floor((CASE WHEN COALESCE(agg.n_words, 0) > 0
                 THEN agg.n_pieces
                      / greatest(agg.n_words, 1)::DOUBLE
                 ELSE 0.0 END) * 1000000 + 0.5) / 1000000
               AS fertility
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
    LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


def _span_corruption_sql(seed: int = 417, rate: int = 15) -> str:
    """Exact mirror of docs_span_corruption
    (stages/curation.py:span_corruption): mask iff
    mix64(seed, doc, pos) % 100 < rate, islands → sentinel spans,
    string_agg rebuilds both texts — pure integer/string."""
    lat, ref = _mix_chain("sc", ["f.doc_id", "f.p"], [seed])
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         {_TOKENS} AS ts
                  FROM documents),
    flat AS (SELECT doc_id, unnest(ts) AS w,
                    (generate_subscripts(ts, 1) - 1)::BIGINT AS p
             FROM toks),
    mk AS MATERIALIZED (
        SELECT f.doc_id, f.w, f.p, (({ref}) % 100 < {rate}) AS m
        FROM flat f, {lat}),
    sp AS (SELECT *, m AND NOT COALESCE(lag(m) OVER (
                   PARTITION BY doc_id ORDER BY p), FALSE) AS st
           FROM mk),
    sid AS (SELECT *, sum(CASE WHEN st THEN 1 ELSE 0 END) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) - 1 AS k
            FROM sp),
    inp AS (SELECT doc_id,
                   string_agg(CASE WHEN st
                              THEN '<extra_id_' || k || '>'
                              ELSE w END, ' ' ORDER BY p)
                       AS input_text
            FROM sid WHERE NOT m OR st GROUP BY doc_id),
    tgt AS (SELECT doc_id,
                   string_agg(CASE WHEN st
                              THEN '<extra_id_' || k || '> ' || w
                              ELSE w END, ' ' ORDER BY p) AS t,
                   count(*)::BIGINT AS n_masked,
                   (max(k) + 1)::BIGINT AS n_spans
            FROM sid WHERE m GROUP BY doc_id),
    nt AS (SELECT doc_id, count(*)::BIGINT AS n_tokens FROM flat
           GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(nt.n_tokens, 0) AS n_tokens,
           COALESCE(tg.n_masked, 0) AS n_masked,
           COALESCE(tg.n_spans, 0) AS n_spans,
           COALESCE(inp.input_text, '') AS input_text,
           CASE WHEN tg.n_masked > 0
                THEN tg.t || ' <extra_id_' || tg.n_spans || '>'
                ELSE '<extra_id_0>' END AS target_text
    FROM toks t LEFT JOIN nt USING (doc_id)
         LEFT JOIN inp USING (doc_id) LEFT JOIN tgt tg USING (doc_id)
    ORDER BY t.doc_id
    """


def _prefix_lm_sql(seed: int = 419) -> str:
    """Exact mirror of docs_prefix_lm
    (stages/curation.py:prefix_lm_split)."""
    lat, ref = _mix_chain("pl", ["t.doc_id"], [seed])
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         {_TOKENS} AS ts
                  FROM documents),
    sa AS (SELECT t.doc_id, len(t.ts)::BIGINT AS n_tokens,
                  CASE WHEN len(t.ts) >= 2
                       THEN 1 + CAST(({ref}) % (len(t.ts) - 1)
                                     AS BIGINT)
                       ELSE len(t.ts)::BIGINT END AS split_at,
                  t.ts
           FROM toks t, {lat})
    SELECT doc_id, n_tokens, split_at,
           COALESCE(array_to_string(ts[1:split_at], ' '), '') AS prefix,
           COALESCE(array_to_string(ts[split_at + 1:n_tokens], ' '),
                    '') AS continuation
    FROM sa ORDER BY doc_id
    """


_READABILITY_SQL = """
    WITH low AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        lower(text) AS lt FROM documents),
    wt AS (SELECT doc_id,
                  unnest(list_filter(string_split_regex(lt,
                      '[^0-9a-z_]+'), x -> x <> '')) AS w
           FROM low),
    ws AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                  sum(greatest(len(regexp_extract_all(w, '[aeiou]+')),
                               1))::BIGINT AS n_syllables
           FROM wt GROUP BY doc_id),
    st AS (SELECT doc_id, unnest(string_split_regex(lt, '[.!?]+')) AS sg
           FROM low),
    ss AS (SELECT doc_id,
                  sum(CASE WHEN regexp_matches(sg, '[0-9a-z_]')
                      THEN 1 ELSE 0 END)::BIGINT AS n_sents
           FROM st GROUP BY doc_id)
    SELECT l.doc_id,
           COALESCE(ss.n_sents, 0) AS n_sents,
           COALESCE(ws.n_words, 0) AS n_words,
           COALESCE(ws.n_syllables, 0) AS n_syllables,
           ROUND((206.835 - 1.015 * (COALESCE(ws.n_words, 0)
                                     / greatest(COALESCE(ss.n_sents, 0),
                                                1)::DOUBLE))
                 - 84.6 * (COALESCE(ws.n_syllables, 0)
                           / greatest(COALESCE(ws.n_words, 0),
                                      1)::DOUBLE), 6) AS flesch
    FROM low l LEFT JOIN ws USING (doc_id) LEFT JOIN ss USING (doc_id)
    ORDER BY l.doc_id
"""


def _pca1_sql(n_iter: int = 8) -> str:
    """Exact mirror of embeddings_pca1
    (stages/cluster.py:power_iteration_pc1): round-6 mean, round-6
    centered covariance, unrolled max-normalized iterations from the
    all-ones start, round-6 projection of the centered vectors."""
    its = []
    prev = "v0"
    for t in range(1, n_iter + 1):
        its.append(f"""
    y{t} AS (SELECT cov.i AS dim, sum(cov.cv * v.xv) AS s
             FROM cov JOIN {prev} v ON v.dim = cov.j GROUP BY cov.i),
    m{t} AS (SELECT max(abs(s)) AS mx FROM y{t}),
    v{t} AS (SELECT dim, round(s / mx, 6) AS xv FROM y{t}, m{t})""")
        prev = f"v{t}"
    return f"""
    WITH x AS MATERIALIZED (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               unnest(embedding)::DOUBLE AS v,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                   AS dim
        FROM embeddings),
    nn AS (SELECT count(DISTINCT vec_id)::DOUBLE AS n FROM x),
    mn AS MATERIALIZED (
        SELECT dim, round(sum(v) / nn.n, 6) AS m
        FROM x, nn GROUP BY dim, nn.n),
    xc AS MATERIALIZED (
        SELECT x.vec_id, x.dim, x.v - mn.m AS c
        FROM x JOIN mn USING (dim)),
    cov AS MATERIALIZED (
        SELECT a.dim AS i, b.dim AS j,
               round(sum(a.c * b.c) / nn.n, 6) AS cv
        FROM xc a JOIN xc b USING (vec_id), nn
        GROUP BY a.dim, b.dim, nn.n),
    v0 AS (SELECT DISTINCT dim, 1.0::DOUBLE AS xv FROM x),
    {",".join(its)}
    SELECT xc.vec_id, round(sum(xc.c * v.xv), 6) AS proj
    FROM xc JOIN {prev} v USING (dim)
    GROUP BY xc.vec_id ORDER BY xc.vec_id
    """


def _gopher_sql() -> str:
    """Exact mirror of docs_gopher_quality (stages/text.py
    gopher_quality_batch + the every-5th-doc augmentation the wrapper
    applies).  Every ratio is one int/int division rounded at 6 dp;
    keep compares the rounded values."""
    stops = "['and', 'be', 'have', 'of', 'that', 'the', 'to', 'with']"
    return f"""
    WITH aug AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        CASE WHEN doc_id % 5 = 0
                             THEN text || chr(10) || '- bullet item ###'
                                  || chr(10) || 'trailing thought...'
                             ELSE text END AS text
                 FROM documents),
    toks AS (SELECT doc_id, unnest({_TOKENS}) AS w FROM aug),
    ws AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                  sum(length(w))::BIGINT AS sum_len,
                  sum(CASE WHEN regexp_matches(w, '[a-zA-Z]')
                      THEN 1 ELSE 0 END)::BIGINT AS alpha_cnt,
                  sum(CASE WHEN list_contains({stops},
                           trim(lower(w), '.,!?;:'))
                      THEN 1 ELSE 0 END)::BIGINT AS stop_hits
           FROM toks GROUP BY doc_id),
    lns AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
            FROM aug),
    ls AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
                  sum(CASE WHEN ln LIKE '- %' OR ln LIKE '* %'
                           OR ln LIKE '• %'
                      THEN 1 ELSE 0 END)::BIGINT AS bullet_cnt,
                  sum(CASE WHEN ln LIKE '%...'
                      THEN 1 ELSE 0 END)::BIGINT AS ell_cnt
           FROM lns GROUP BY doc_id),
    ch AS (SELECT doc_id,
                  (length(text) - length(replace(text, '#', '')))::BIGINT
                      AS hash_cnt,
                  ((length(text) - length(replace(text, '...', '')))
                   // 3)::BIGINT AS ell3_cnt
           FROM aug),
    feat AS (SELECT a.doc_id,
                    COALESCE(ws.n_words, 0) AS n_words,
                    floor((CASE WHEN COALESCE(ws.n_words, 0) > 0
                          THEN ws.sum_len::DOUBLE / ws.n_words
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000
                        AS mean_word_len,
                    floor((CASE WHEN COALESCE(ws.n_words, 0) > 0
                          THEN (ch.hash_cnt + ch.ell3_cnt)::DOUBLE
                               / ws.n_words
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000
                        AS symbol_ratio,
                    floor(ls.bullet_cnt::DOUBLE / ls.n_lines
                          * 1000000 + 0.5) / 1000000
                        AS bullet_frac,
                    floor(ls.ell_cnt::DOUBLE / ls.n_lines
                          * 1000000 + 0.5) / 1000000
                        AS ellipsis_frac,
                    floor((CASE WHEN COALESCE(ws.n_words, 0) > 0
                          THEN ws.alpha_cnt::DOUBLE / ws.n_words
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000
                        AS alpha_frac,
                    COALESCE(ws.stop_hits, 0) AS stop_hits
             FROM aug a LEFT JOIN ws USING (doc_id)
                  LEFT JOIN ls USING (doc_id) JOIN ch USING (doc_id))
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
           ellipsis_frac, alpha_frac, stop_hits,
           CAST(CASE WHEN n_words BETWEEN 20 AND 100000
                     AND mean_word_len BETWEEN 3.0 AND 10.0
                     AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
                     AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                     AND stop_hits >= 2
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM feat ORDER BY doc_id
    """


def _mattr_sql(w: int = 25) -> str:
    """Exact mirror of docs_mattr (stages/text.py:mattr_batch): the
    per-token window-contribution identity — token at position p with
    previous same-token position q (lag) adds
    max(0, min(p, n−w) − max(q+1, p−w+1) + 1) window-distinct counts —
    then one division per doc."""
    return f"""
    WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         list_transform({_TOKENS}, x -> lower(x)) AS ts
                  FROM documents),
    flat AS MATERIALIZED (
        SELECT doc_id, unnest(ts) AS w,
               (generate_subscripts(ts, 1) - 1)::BIGINT AS p
        FROM toks),
    nn AS (SELECT doc_id, count(*)::BIGINT AS n,
                  count(DISTINCT w)::BIGINT AS d
           FROM flat GROUP BY doc_id),
    pr AS (SELECT doc_id, p,
                  COALESCE(lag(p) OVER (PARTITION BY doc_id, w
                                        ORDER BY p), -1) AS q
           FROM flat),
    ct AS (SELECT pr.doc_id,
                  sum(greatest(0, least(pr.p, nn.n - {w})
                               - greatest(pr.q + 1, pr.p - {w - 1})
                               + 1))::BIGINT AS sd
           FROM pr JOIN nn USING (doc_id) WHERE nn.n >= {w}
           GROUP BY pr.doc_id),
    base AS (SELECT t.doc_id, COALESCE(nn.n, 0) AS n_tokens,
                    COALESCE(nn.d, 0) AS n_types,
                    greatest(COALESCE(nn.n, 0) - {w - 1}, 0)::BIGINT
                        AS n_windows,
                    COALESCE(ct.sd, 0) AS sd
             FROM toks t LEFT JOIN nn USING (doc_id)
                  LEFT JOIN ct USING (doc_id))
    SELECT doc_id, n_tokens, n_types,
           floor((CASE WHEN n_tokens > 0
                 THEN n_types::DOUBLE / n_tokens ELSE 0.0 END)
                 * 1000000 + 0.5) / 1000000 AS ttr,
           n_windows,
           floor((CASE WHEN n_windows > 0
                 THEN sd::DOUBLE / (n_windows * {w})
                 WHEN n_tokens > 0 THEN n_types::DOUBLE / n_tokens
                 ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS mattr
    FROM base ORDER BY doc_id
    """


def _random_walks_sql(n_steps: int = 3, seed: int = 777) -> str:
    """Exact mirror of kg_random_walks: unrolled steps over the
    row_number-ranked (t, r) edge list, next rank =
    mix64(seed, step, cur, start) % outdeg(cur)."""
    steps, selects = [], []
    prev = "s0"
    for st in range(1, n_steps + 1):
        lat, ref = _mix_chain(f"rw{st}",
                              [f"{prev}.cur", f"{prev}.start"], [seed, st])
        steps.append(f"""
    s{st} AS MATERIALIZED (
        SELECT {prev}.start, e.t AS cur, e.r
        FROM {prev}, {lat}, deg d, er e
        WHERE d.h = {prev}.cur AND e.h = {prev}.cur
          AND e.rk = CAST(({ref}) % d.d AS BIGINT))""")
        selects.append(
            f"SELECT start, {st} AS step, r, cur AS node FROM s{st}")
        prev = f"s{st}"
    return f"""
    WITH edges0 AS MATERIALIZED ({_IDMAPPED_SQL}),
    er AS MATERIALIZED (
        SELECT h, t, r,
               row_number() OVER (PARTITION BY h ORDER BY t, r) - 1 AS rk
        FROM edges0),
    deg AS MATERIALIZED (SELECT h, count(*) AS d FROM er GROUP BY h),
    s0 AS MATERIALIZED (
        SELECT id AS start, id AS cur FROM ({_VOCAB_SQL})),
    {",".join(steps)}
    SELECT CAST(start AS BIGINT) AS start, CAST(step AS BIGINT) AS step,
           CAST(r AS BIGINT) AS r, CAST(node AS BIGINT) AS node
    FROM ({" UNION ALL ".join(selects)})
    ORDER BY start, step
    """


# scalar quantization: every arithmetic step is one IEEE double op in
# the same order as the numpy kernel, so codes AND sq_err are
# bit-identical — no rounding anywhere
_SCALAR_QUANT_SQL = """
    WITH x AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               unnest(embedding)::DOUBLE AS v,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
        FROM embeddings),
    mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim),
    enc AS (
        SELECT x.vec_id, x.dim, x.v, mm.mn, mm.mx,
               CASE WHEN mm.mx = mm.mn THEN 0
                    ELSE CAST(least(floor((x.v - mm.mn) * 255.0
                                          / (mm.mx - mm.mn)), 255.0)
                              AS BIGINT) END AS code
        FROM x JOIN mm USING (dim))
    SELECT vec_id, dim, code,
           CASE WHEN mx = mn THEN (v - mn) * (v - mn)
                ELSE (v - (mn + (code + 0.5) * (mx - mn) / 255.0))
                     * (v - (mn + (code + 0.5) * (mx - mn) / 255.0))
           END AS sq_err
    FROM enc ORDER BY vec_id, dim
"""


def oracle_sql() -> dict[str, str]:
    # min-label-propagation components over verified near-dup pairs —
    # shared by docs_dup_clusters and docs_dup_canonical
    dup_clusters_sql = f"""
            WITH RECURSIVE vp AS MATERIALIZED (
                SELECT a, b FROM ({_minhash_dedup_sql()})),
            nodes AS MATERIALIZED (
                SELECT a AS n FROM vp UNION SELECT b FROM vp),
            esym AS MATERIALIZED (
                SELECT a AS u, b AS v FROM vp
                UNION ALL SELECT b, a FROM vp
                UNION ALL SELECT n, n FROM nodes),
            lab(it, node, l, chg) AS (
                SELECT 0, n, n, 1::BIGINT FROM nodes
                UNION ALL
                SELECT x.it + 1, x.node, x.nl,
                       SUM(CASE WHEN x.nl < x.ol THEN 1 ELSE 0 END) OVER ()
                FROM (SELECT p.it, e.v AS node, MIN(p.l) AS nl,
                             MIN(CASE WHEN e.u = e.v THEN p.l END) AS ol
                      FROM lab p JOIN esym e ON e.u = p.node
                      WHERE p.chg > 0 AND p.it < 100
                      GROUP BY p.it, e.v) x
            )
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(l AS BIGINT) AS cluster_id
            FROM lab QUALIFY it = MAX(it) OVER ()
            ORDER BY doc_id
        """
    return {
        "kg_edges_relational": _EDGES_SQL,
        # the TSV write→read roundtrip must reproduce the same edge set
        "kg_edges_tsv_roundtrip": _EDGES_SQL,
        "kg_vocab_entities": _VOCAB_SQL,
        "kg_edges_idmapped": _IDMAPPED_SQL,
        "kg_split_counts": f"""
            WITH idmapped AS ({_IDMAPPED_SQL})
            SELECT split, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT CASE WHEN b < 8 THEN 'train'
                            WHEN b = 8 THEN 'valid' ELSE 'test' END AS split
                FROM (SELECT ((h * 2654435761 + t * 40503 + r * 2246822519)
                              % 2147483648) % 10 AS b FROM idmapped)
            ) GROUP BY split ORDER BY split
        """,
        "part_supplier_pairs": """
            SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                   CAST(l_suppkey AS BIGINT) AS l_suppkey,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_partkey, l_suppkey
            ORDER BY l_partkey, l_suppkey
        """,
        "docs_exact_dedup": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "docs_quality": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length({_TOKENS}) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                        AS BIGINT) AS punct_cnt,
                   CAST(length(list_filter({_TOKENS},
                        x -> list_contains({_STOPS},
                             trim(lower(x), '.,!?;:')))) AS BIGINT) AS stop_cnt
            FROM documents
        """,
        "docs_token_stats": f"""
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length({_TOKENS})) AS BIGINT) AS sum_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "lang_counts": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # unigram LM fitted on even doc_ids (top-20000 vocab by
        # (cnt DESC, token), add-one smoothing over V+1), docs scored by
        # mean ln p with unk fallback (stages/lm_score.py)
        "docs_lm_perplexity": f"""
            WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                                 list_transform({_TOKENS}, x -> lower(x))
                                     AS ts
                          FROM documents),
            ref AS (SELECT unnest(ts) AS token FROM toks
                    WHERE doc_id % 2 = 0),
            counts AS (SELECT token, count(*) AS cnt FROM ref
                       GROUP BY token),
            tot AS (SELECT sum(cnt) AS total FROM counts),
            top AS (SELECT token, cnt FROM counts
                    ORDER BY cnt DESC, token LIMIT 20000),
            den AS (SELECT (t.total + v.v + 1)::DOUBLE AS d
                    FROM tot t, (SELECT count(*) AS v FROM top) v),
            lp AS (SELECT token, ln((cnt + 1)::DOUBLE / den.d) AS lp
                   FROM top, den),
            flat AS (SELECT doc_id, unnest(ts) AS token FROM toks),
            scored AS (SELECT f.doc_id,
                              COALESCE(lp.lp, (SELECT ln(1.0 / d) FROM den))
                                  AS lp
                       FROM flat f LEFT JOIN lp ON lp.token = f.token),
            agg AS (SELECT doc_id, count(*) AS n_tokens,
                           sum(lp) / count(*) AS m
                    FROM scored GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   ROUND(COALESCE(a.m, 0.0), 6) AS logprob_mean
            FROM toks t LEFT JOIN agg a USING (doc_id)
            ORDER BY t.doc_id
        """,
        # NB quality gate: two-class token model fitted on even doc_ids
        # (pos = lang='en'; vocab top-20000 by (c1+c0) DESC, token;
        # add-one over V+1 per class), score = prior + sum of weights
        # (stages/classify.py fit_nb_quality/NBScorer)
        "docs_nb_quality": f"""
            WITH {_nb_model_ctes()}
            SELECT t.doc_id,
                   CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   ROUND(pri.p + COALESCE(a.s, 0.0), 6) AS nb_score,
                   CAST(CASE WHEN pri.p + COALESCE(a.s, 0.0) >= 0
                             THEN 1 ELSE 0 END AS BIGINT) AS pred
            FROM toks t LEFT JOIN agg a USING (doc_id), pri
            ORDER BY t.doc_id
        """,
        # DSIR importance weights: per-occurrence hashed buckets
        # mix64(101, word-fp) % 1024, target = lang='en' docs, raw = all
        # (stages/classify.py fit_dsir/DSIRScorer)
        "docs_dsir_weights": _dsir_sql(),
        "docs_ccnet_buckets": _ccnet_sql(),
        # quantile-threshold filter: keep docs inside their language's
        # [p10, p99] token band (same lower-disc quantile rule)
        "docs_length_band_filter": f"""
            WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                              length({_TOKENS})::BIGINT AS n_tokens
                       FROM documents),
            n AS (SELECT lang, count(*) AS n FROM t GROUP BY lang),
            ot AS (SELECT lang, n_tokens AS v, row_number()
                       OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS rk
                   FROM t),
            band AS (SELECT n.lang, l.v AS lo, h.v AS hi
                     FROM n
                     JOIN ot l ON l.lang = n.lang
                         AND l.rk = CAST(floor((n.n - 1) * 0.1) AS BIGINT)
                     JOIN ot h ON h.lang = n.lang
                         AND h.rk = CAST(floor((n.n - 1) * 0.99) AS BIGINT))
            SELECT t.doc_id, t.lang, t.n_tokens
            FROM t JOIN band b ON b.lang = t.lang
            WHERE t.n_tokens BETWEEN b.lo AND b.hi
            ORDER BY t.doc_id
        """,
        # sequential RE2 redaction; each rule counts against the text as
        # left by the previous rule (stages/text.py PII_RULES order)
        "docs_redact_pii": r"""
            WITH p AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' Contact user' || doc_id
                                 || '@example.com or 10.0.'
                                 || (doc_id % 256) || '.7 call +1 555-'
                                 || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                                 || '.'
                            ELSE text END AS t
                FROM documents),
            s1 AS (SELECT doc_id,
                       CAST(length(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS BIGINT) AS n_email,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t
                   FROM p),
            s2 AS (SELECT doc_id, n_email,
                       CAST(length(regexp_extract_all(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                           AS BIGINT) AS n_ipv4,
                       regexp_replace(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, n_email, n_ipv4,
                       CAST(length(regexp_extract_all(t,
                           '\+\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phone,
                       regexp_replace(t, '\+\d[\d\- ]{7,}\d',
                           '<PHONE>', 'g') AS t
                   FROM s2)
            SELECT doc_id, n_email, n_ipv4, n_phone, t AS text_redacted
            FROM s3 ORDER BY doc_id
        """,
        # exact "lower disc" quantile: the observed value at 0-indexed rank
        # floor((n-1)*q) of the group's sorted multiset (stages/quantiles.py)
        "docs_length_quantiles": f"""
            WITH t AS (SELECT lang, length(text)::BIGINT AS n_chars,
                              length({_TOKENS})::BIGINT AS n_tokens
                       FROM documents),
            n AS (SELECT lang, count(*) AS n FROM t GROUP BY lang),
            qs(q) AS (SELECT unnest(
                [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]::DOUBLE[])),
            oc AS (SELECT lang, n_chars AS v, row_number()
                       OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rk
                   FROM t),
            ot AS (SELECT lang, n_tokens AS v, row_number()
                       OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS rk
                   FROM t)
            SELECT n.lang, qs.q,
                   CAST(c.v AS BIGINT) AS n_chars_q,
                   CAST(tk.v AS BIGINT) AS n_tokens_q
            FROM n CROSS JOIN qs
            JOIN oc c ON c.lang = n.lang
                AND c.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            JOIN ot tk ON tk.lang = n.lang
                AND tk.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            ORDER BY n.lang, qs.q
        """,
        "events_hourly": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY event_type, hour_epoch
            ORDER BY event_type, hour_epoch
        """,
        "lineitem_sample": _lineitem_sample_sql(),
        "top_docs_per_lang": """
            SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY length(text) DESC, doc_id) <= 3
            ORDER BY lang, n_chars DESC, doc_id
        """,
        "events_asof_join": """
            WITH purchases AS (
                SELECT event_id, user_id, epoch_us(ts) AS es
                FROM events WHERE event_type = 'purchase'
            ), clicks AS (
                SELECT user_id, epoch_us(ts) AS es, value
                FROM events WHERE event_type = 'click'
            )
            SELECT CAST(p.event_id AS BIGINT) AS event_id,
                   CAST(p.user_id AS BIGINT) AS user_id,
                   CAST(p.es AS BIGINT) AS es,
                   CAST(COALESCE(c.es, -1) AS BIGINT) AS click_es,
                   ROUND(COALESCE(c.value, 0.0), 4) AS click_value
            FROM purchases p
            ASOF LEFT JOIN clicks c
                 ON p.user_id = c.user_id AND c.es <= p.es
            ORDER BY event_id
        """,
        "events_sliding_1h": """
            SELECT event_type,
                   CAST((e.slot - j.j) * 900 AS BIGINT) AS win_start,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 4) AS sum_value
            FROM (SELECT event_type, value,
                         epoch_us(ts) // 900000000 AS slot FROM events) e
            CROSS JOIN (SELECT range AS j FROM range(4)) j
            GROUP BY event_type, win_start
            ORDER BY event_type, win_start
        """,
        "events_value_bands": """
            WITH bands(lo, hi, band) AS (VALUES
                (0.0, 1.0, '[0,1)'), (1.0, 5.0, '[1,5)'),
                (5.0, 20.0, '[5,20)'), (20.0, 100.0, '[20,100)'),
                (100.0, 500.03, '[100,500.03)'))
            SELECT e.event_type, b.band,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(SUM(e.value), 4) AS sum_value
            FROM events e JOIN bands b
                 ON e.value >= b.lo AND e.value < b.hi
            GROUP BY e.event_type, b.band
            ORDER BY e.event_type, b.band
        """,
        "events_thresholds": """
            WITH labeled AS (
                SELECT event_type, value AS v,
                       CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END AS flag
                FROM events
            ), ordered AS (
                SELECT event_type, v, flag,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY v, flag) AS rn
                FROM labeled
            ), scanned AS (
                SELECT event_type, v, rn,
                       lag(v) OVER (PARTITION BY event_type ORDER BY rn) AS v_prev,
                       COALESCE(sum(flag) OVER (
                           PARTITION BY event_type ORDER BY rn
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS cur
                FROM ordered
            ), best AS (
                SELECT event_type, (v + v_prev) / 2.0 AS thr
                FROM scanned WHERE rn >= 2 AND cur > 0
                QUALIFY row_number() OVER (PARTITION BY event_type
                                           ORDER BY cur DESC, rn ASC) = 1
            ), mins AS (
                SELECT event_type, min(v) - 0.01 AS thr0
                FROM labeled GROUP BY event_type
            )
            SELECT m.event_type, ROUND(COALESCE(b.thr, m.thr0), 6) AS theta
            FROM mins m LEFT JOIN best b USING (event_type)
            ORDER BY event_type
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "top_parts": """
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
                   CAST(p_size AS BIGINT) AS p_size,
                   ROUND(p_retailprice, 2) AS p_retailprice
            FROM part ORDER BY p_size DESC, p_partkey LIMIT 10
        """,
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "events_sessions": """
            WITH ordered AS (
                SELECT user_id, epoch_us(ts) // 1000000 AS es,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ), flagged AS (
                SELECT user_id, es, rn,
                       CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY rn)
                                 IS NULL
                                 OR es - lag(es) OVER (PARTITION BY user_id
                                                       ORDER BY rn) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM ordered
            ), tagged AS (
                SELECT user_id, es,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY rn) - 1
                           AS session_id
                FROM flagged
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(session_id AS BIGINT) AS session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(es) AS BIGINT) AS start_epoch,
                   CAST(max(es) AS BIGINT) AS end_epoch
            FROM tagged GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        # polynomial rolling hash h = fold(h*1000003 + byte) mod 2^61-1
        # (stages/text.py:fingerprint).  The SQL folds CODEPOINTS, which
        # equals the Python byte fold because the synthetic corpus is pure
        # ASCII (the compare validates this holds).
        # pinned contract of the S4/S5 embedding I/O smoke query: 60-id
        # vocab + 2 UNK rows = 62, 10 vocab ids lack stored vectors,
        # write→read is exact, OOV rows share the UNK vector
        "embeddings_roundtrip": """
            SELECT * FROM (VALUES
                ('rows', 62.0), ('n_unk', 10.0),
                ('roundtrip_exact', 1.0), ('unk_shared', 1.0)
            ) t(stat, value)
        """,
        "docs_fingerprint": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
                        list_reduce(
                            list_transform(split(text, ''),
                                           c -> unicode(c)::HUGEINT),
                            (x, y) -> (x * 1000003 + y)
                                      % 2305843009213693951)
                   END AS BIGINT) AS fingerprint
            FROM documents
        """,
        "kg_negative_samples": _neg_samples_sql(),
        "kg_kgc_negatives": _kgc_negatives_sql(),
        "kg_graph_features": _graph_features_sql(sym=False),
        "kg_graph_features_sym": _graph_features_sql(sym=True),
        # degree multiset per relation is id/name-bijection-invariant, so
        # the mirror works on the named edge table directly
        "kg_degree_quantiles": f"""
            WITH edges AS ({_EDGES_SQL}),
            od AS (SELECT pred, subj AS node, count(*) AS d
                   FROM edges GROUP BY pred, subj),
            idn AS (SELECT pred, obj AS node, count(*) AS d
                    FROM edges GROUP BY pred, obj),
            nodes AS (SELECT pred, node FROM od
                      UNION SELECT pred, node FROM idn),
            degs AS (SELECT n.pred AS rel,
                            COALESCE(o.d, 0) AS out_deg,
                            COALESCE(i.d, 0) AS in_deg
                     FROM nodes n
                     LEFT JOIN od o ON o.pred = n.pred AND o.node = n.node
                     LEFT JOIN idn i ON i.pred = n.pred AND i.node = n.node),
            n AS (SELECT rel, count(*) AS n FROM degs GROUP BY rel),
            qs(q) AS (SELECT unnest([0.0, 0.5, 0.9, 1.0]::DOUBLE[])),
            oo AS (SELECT rel, out_deg AS v, row_number()
                       OVER (PARTITION BY rel ORDER BY out_deg) - 1 AS rk
                   FROM degs),
            oi AS (SELECT rel, in_deg AS v, row_number()
                       OVER (PARTITION BY rel ORDER BY in_deg) - 1 AS rk
                   FROM degs)
            SELECT n.rel, qs.q,
                   CAST(a.v AS BIGINT) AS out_deg_q,
                   CAST(b.v AS BIGINT) AS in_deg_q
            FROM n CROSS JOIN qs
            JOIN oo a ON a.rel = n.rel
                AND a.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            JOIN oi b ON b.rel = n.rel
                AND b.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            ORDER BY n.rel, qs.q
        """,
        "kg_subgraph_stats": _SUBGRAPH_STATS_SQL,
        "kg_ppr_micro": _PPR_MICRO_SQL,
        # global PageRank: unrolled quantized power iteration (9 dp per
        # update — no cross-engine drift compounds); stages/pagerank.py
        "kg_pagerank": _pagerank_sql(),
        "kg_katz": _katz_sql(),
        "kg_reach2": _REACH2_SQL_TMPL.format(idmapped=_IDMAPPED_SQL),
        # Bordes et al. 2013 §4 relation cardinality profile: triples
        # per distinct head/tail, 1.5 cutoff
        "kg_relation_cardinality": f"""
            WITH edges AS ({_EDGES_SQL}),
            agg AS (SELECT pred AS rel,
                           count(*) AS n_triples,
                           count(DISTINCT subj) AS n_heads,
                           count(DISTINCT obj) AS n_tails
                    FROM edges GROUP BY pred)
            SELECT rel,
                   CAST(n_triples AS BIGINT) AS n_triples,
                   CAST(n_heads AS BIGINT) AS n_heads,
                   CAST(n_tails AS BIGINT) AS n_tails,
                   n_triples * 1.0 / n_heads AS tph,
                   n_triples * 1.0 / n_tails AS hpt,
                   CASE WHEN n_triples * 1.0 / n_heads < 1.5
                         AND n_triples * 1.0 / n_tails < 1.5 THEN '1-1'
                        WHEN n_triples * 1.0 / n_heads < 1.5 THEN 'N-1'
                        WHEN n_triples * 1.0 / n_tails < 1.5 THEN '1-N'
                        ELSE 'N-N' END AS category
            FROM agg ORDER BY rel
        """,
        # inverse/symmetric relation audit on the KG + reversed twin
        # (Toutanova & Chen 2015 leakage check)
        "kg_inverse_relations": f"""
            WITH edges AS ({_EDGES_SQL}),
            all_e AS (SELECT subj, pred, obj FROM edges
                      UNION ALL
                      SELECT obj, pred || '_rev' AS pred, subj FROM edges),
            sizes AS (SELECT pred, count(*) AS n FROM all_e GROUP BY pred),
            ov AS (SELECT a.pred AS rel1, b.pred AS rel2,
                          count(*) AS n_overlap
                   FROM all_e a JOIN all_e b
                     ON b.subj = a.obj AND b.obj = a.subj
                   GROUP BY a.pred, b.pred)
            SELECT ov.rel1, ov.rel2, CAST(s.n AS BIGINT) AS n_rel1,
                   CAST(ov.n_overlap AS BIGINT) AS n_overlap,
                   ov.n_overlap * 1.0 / s.n AS frac,
                   CASE WHEN ov.rel1 = ov.rel2 THEN 'symmetric'
                        ELSE 'inverse' END AS kind
            FROM ov JOIN sizes s ON s.pred = ov.rel1
            ORDER BY ov.rel1, ov.rel2
        """,
        # canonical doc per near-dup cluster: max n_tokens, tie -> min
        # doc_id (window over the shared min-label-propagation clusters)
        "docs_dup_canonical": f"""
            WITH clusters AS MATERIALIZED ({dup_clusters_sql}),
            q AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         length({_TOKENS}) AS n_tokens
                  FROM documents),
            m AS (SELECT c.doc_id, c.cluster_id,
                         COALESCE(q.n_tokens, 0) AS n_tokens
                  FROM clusters c LEFT JOIN q ON q.doc_id = c.doc_id),
            win AS (SELECT m.*, first_value(doc_id) OVER (
                        PARTITION BY cluster_id
                        ORDER BY n_tokens DESC, doc_id) AS canonical_id
                    FROM m)
            SELECT doc_id, cluster_id, canonical_id,
                   CAST(doc_id = canonical_id AS BIGINT) AS keep,
                   CAST(n_tokens AS BIGINT) AS n_tokens
            FROM win ORDER BY doc_id
        """,
        "docs_lang_detect": _LANG_DETECT_SQL,
        "docs_simhash": _simhash_sql(),
        "docs_minhash_dedup": _minhash_dedup_sql(),
        # incremental mode = full dedup restricted to pairs whose higher
        # side is a new-shard doc (planted ids ≥ 10M); the Ray side's
        # bucket prune emits exactly this subset (candidate_pairs new_from)
        "docs_incremental_dedup": f"""
            SELECT * FROM ({_minhash_dedup_sql()})
            WHERE b >= 10000000
        """,
        # connected components over the verified near-dup pairs: iterative
        # min-label propagation as a recursive CTE — self-edge carrier rows
        # expose each node's previous label, a changed-label window count
        # is the stopping rule (same shape as the PPR mirror)
        "docs_dup_clusters": dup_clusters_sql,
        # line winner = min(doc_id<<20 | line_no); blank lines bypass dedup
        # (stages/curation.py:line_dedup, same fixture: second line = next
        # doc's text)
        "docs_line_dedup": """
            WITH m AS (
                SELECT doc_id,
                       CASE WHEN nxt IS NULL THEN text
                            ELSE text || chr(10) || nxt END AS t
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                             lead(text) OVER (ORDER BY doc_id) AS nxt
                      FROM documents)),
            lines AS (
                SELECT doc_id, u['i'] - 1 AS ln, u['l'] AS line
                FROM (SELECT doc_id,
                             unnest(list_transform(str_split(t, chr(10)),
                                    (l, i) -> {'i': i, 'l': l})) AS u
                      FROM m)),
            win AS (SELECT line,
                           min(doc_id * 1048576 + ln) AS w
                    FROM lines WHERE length(line) >= 1 GROUP BY line),
            kept AS (SELECT l.doc_id, l.ln, l.line
                     FROM lines l LEFT JOIN win ON win.line = l.line
                     WHERE length(l.line) < 1
                        OR l.doc_id * 1048576 + l.ln = win.w)
            SELECT m.doc_id,
                   COALESCE(string_agg(k.line, chr(10) ORDER BY k.ln), '')
                       AS text_kept
            FROM m LEFT JOIN kept k ON k.doc_id = m.doc_id
            GROUP BY m.doc_id ORDER BY m.doc_id
        """,
        "embeddings_near_dup": _embeddings_near_dup_sql(),
        "embeddings_ivf_topk": _ivf_topk_sql(),
        "emb_link_rank": _EMB_LINK_RANK_SQL,
        "docs_repetition": _REPETITION_SQL,
        "ann_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv),
                         5) AS cosine
            FROM embeddings e, q
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
                     e.vec_id
            LIMIT 10
        """,
        # max-inner-product top-10 vs vec_id=1, ranked on the ROUNDED
        # dot (rule-19 ::DOUBLE[] cast so DuckDB accumulates in f64)
        "embeddings_mips": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 1),
            sc AS (SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                          ROUND(list_inner_product(
                              e.embedding::DOUBLE[], q.qv), 5) AS ip
                   FROM embeddings e, q)
            SELECT vec_id, ip FROM (
                SELECT vec_id, ip,
                       row_number() OVER (ORDER BY ip DESC, vec_id)
                           AS rn
                FROM sc) WHERE rn <= 10
            ORDER BY vec_id
        """,
        # CUPED variance-reduced A/B readout on exact integer cents;
        # theta intermediates go through HUGEINT (n*sxx overflows int64
        # at sf0.1 scale) then one double chain shared with the Ray side
        "events_cuped": """
            WITH mm AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)))
                               // 2 AS mid FROM events),
            uc AS (SELECT user_id,
                          sum(CASE WHEN epoch_us(ts) < mm.mid
                              THEN CAST(floor(value * 100.0 + 0.5)
                                        AS BIGINT) ELSE 0 END) AS pre,
                          sum(CASE WHEN epoch_us(ts) >= mm.mid
                              THEN CAST(floor(value * 100.0 + 0.5)
                                        AS BIGINT) ELSE 0 END) AS post
                   FROM events, mm GROUP BY user_id),
            m AS (SELECT user_id % 2 AS arm, count(*)::BIGINT AS n,
                         sum(pre)::BIGINT AS sx, sum(post)::BIGINT AS sy,
                         sum(pre * pre)::BIGINT AS sxx,
                         sum(pre * post)::BIGINT AS sxy
                  FROM uc GROUP BY 1),
            tot AS (SELECT sum(n)::HUGEINT AS n, sum(sx)::HUGEINT AS sx,
                           sum(sy)::HUGEINT AS sy,
                           sum(sxx)::HUGEINT AS sxx,
                           sum(sxy)::HUGEINT AS sxy FROM m),
            th AS (SELECT CASE WHEN (n * sxx - sx * sx) > 0
                          THEN CAST(n * sxy - sx * sy AS DOUBLE)
                               / CAST(n * sxx - sx * sx AS DOUBLE)
                          ELSE 0.0 END AS theta,
                          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                              AS mpre_g
                   FROM tot)
            SELECT m.arm::BIGINT AS arm, m.n AS n_users,
                   m.sx AS sum_pre_cents, m.sy AS sum_post_cents,
                   floor(m.sy / CAST(m.n AS DOUBLE) / 100.0
                         * 1000000 + 0.5) / 1000000
                       AS mean_post,
                   floor((m.sy / CAST(m.n AS DOUBLE)
                          - th.theta * (m.sx / CAST(m.n AS DOUBLE)
                                        - th.mpre_g)) / 100.0
                         * 1000000 + 0.5) / 1000000
                       AS mean_adj,
                   floor(th.theta * 1000000 + 0.5) / 1000000 AS theta
            FROM m, th ORDER BY arm
        """,
        # market-basket lift over unordered event-type pairs
        "events_type_lift": """
            WITH ut AS (SELECT DISTINCT user_id, event_type
                        FROM events),
            nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n
                   FROM events),
            si AS (SELECT event_type, count(*)::BIGINT AS n
                   FROM ut GROUP BY event_type),
            pr AS (SELECT a.event_type AS type_a,
                          b.event_type AS type_b,
                          count(*)::BIGINT AS n_both
                   FROM ut a JOIN ut b ON b.user_id = a.user_id
                                      AND b.event_type > a.event_type
                   GROUP BY 1, 2)
            SELECT pr.type_a, pr.type_b, pr.n_both,
                   sa.n AS n_a, sb.n AS n_b,
                   floor(CAST(pr.n_both AS DOUBLE) * nu.n
                         / (CAST(sa.n AS DOUBLE)
                            * CAST(sb.n AS DOUBLE))
                         * 1000000 + 0.5) / 1000000 AS lift
            FROM pr
            JOIN si sa ON sa.event_type = pr.type_a
            JOIN si sb ON sb.event_type = pr.type_b
            CROSS JOIN nu
            ORDER BY type_a, type_b
        """,
        # hour-of-day seasonality + chi-square uniformity per type
        "events_hour_profile": """
            WITH hc AS (SELECT event_type,
                               (epoch_us(ts) // 3600000000) % 24 AS hod,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1, 2),
            grid AS (SELECT t.event_type, g.hod
                     FROM (SELECT DISTINCT event_type FROM events) t,
                          (SELECT unnest(range(0, 24)) AS hod) g),
            full_ AS (SELECT gr.event_type, gr.hod::BIGINT AS hod,
                             COALESCE(hc.n, 0)::BIGINT AS n
                      FROM grid gr LEFT JOIN hc USING (event_type, hod)),
            tot AS (SELECT event_type, sum(n)::BIGINT AS tn
                    FROM full_ GROUP BY event_type),
            c2 AS (SELECT f.event_type,
                          floor(sum((f.n - t.tn / 24.0)
                                    * (f.n - t.tn / 24.0)
                                    / (t.tn / 24.0))
                                * 1000000 + 0.5) / 1000000 AS chi2
                   FROM full_ f JOIN tot t USING (event_type)
                   GROUP BY f.event_type)
            SELECT f.event_type, f.hod, f.n, c2.chi2
            FROM full_ f JOIN c2 USING (event_type)
            ORDER BY f.event_type, f.hod
        """,
        # half-life-1h EWMA over a 16-hour window: every term is an
        # exact dyadic c*2^-(d+1), so the sum is EXACT in float64 in
        # any addition order — bitwise cross-engine by construction
        "events_ewma": """
            WITH hc AS (SELECT event_type,
                               epoch_us(ts) // 3600000000 AS hour,
                               count(*)::BIGINT AS c
                        FROM events GROUP BY 1, 2)
            SELECT a.event_type, a.hour::BIGINT AS hour, a.c AS n,
                   COALESCE((SELECT sum(b.c * power(
                                 0.5, a.hour - b.hour + 1))
                             FROM hc b
                             WHERE b.event_type = a.event_type
                               AND b.hour BETWEEN a.hour - 15
                                              AND a.hour), 0.0)
                       AS ewma
            FROM hc a ORDER BY a.event_type, a.hour
        """,
        "embeddings_kmeans": _kmeans_sql(),
        # top-20 farthest-from-centroid vectors over the same chain
        "embeddings_outliers": _kmeans_outliers_sql(),
        # JL sign random projection: ±1 from mix64(211, d, j), rounded
        # projections + packed sign code (stages/ann.py)
        "embeddings_rp_project": _rp_sql(),
        "embeddings_semantic_dedup": _semantic_dedup_sql(),
        "docs_decontaminate": _decontaminate_sql(),
        "docs_shuffle_export": _shuffle_export_sql(),
        "docs_pack_bins": _pack_bins_sql(),
        "docs_source_mixture": _source_mixture_sql(),
        "docs_top_tokens": _TOP_TOKENS_SQL,
        "docs_word_entropy": _WORD_ENTROPY_SQL,
        "docs_chunk_windows": _CHUNK_WINDOWS_SQL,
        "part_cooccur_adamic_adar": _ADAMIC_ADAR_SQL,
        "embeddings_scalar_quant": _SCALAR_QUANT_SQL,
        "docs_bloom_decontaminate": _bloom_decontaminate_sql(),
        "kg_random_walks": _random_walks_sql(),
        "kg_relpath_2hop": _RELPATH_2HOP_SQL,
        "kg_hits": _hits_sql(),
        "kg_entity_types": _ENTITY_TYPES_SQL,
        # relation domain audit: entity type = argmax head relation,
        # dominant-type share per relation
        "kg_type_violations": _TYPE_VIOLATIONS_SQL,
        # edge-wise out/in degree Pearson r (exact integer sums)
        "kg_degree_assortativity": _ASSORT_SQL,
        "docs_textrank": _textrank_sql(),
        "docs_quality_auc": _quality_auc_sql(),
        "docs_dsir_sample": _dsir_sample_sql(),
        "docs_kneser_ney": _kneser_ney_sql(),
        "docs_stratified_sample": _stratified_sample_sql(),
        "docs_cm_heavy_hitters": _cm_heavy_hitters_sql(),
        "docs_hll_distinct": _hll_distinct_sql(),
        "docs_clean_corpus": _clean_corpus_sql(),
        "docs_dup_ngrams": _dup_ngrams_sql(),
        # span surgery: drop tokens under cross-doc duplicated 5-grams
        "docs_remove_dup_spans": _dup_spans_sql(5),
        "docs_domain_stats": _DOMAIN_STATS_SQL,
        "docs_tfidf": _TFIDF_SQL,
        "docs_bm25": _bm25_sql(_rel_bm25_terms()),
        "docs_winnow": _winnow_sql(),
        "docs_source_kl": _SOURCE_KL_SQL,
        "docs_weighted_sample": _weighted_sample_sql(),
        "docs_collocations": _COLLOCATIONS_SQL,
        "kg_components": _KG_COMPONENTS_SQL,
        "embeddings_pq_codes": _pq_sql(),
        "embeddings_pq_adc": _pq_adc_sql(),
        # recall@10 of ADC vs exact L2 for 3 queries (one PQ fit)
        "embeddings_pq_recall": _pq_recall_sql(),
        "docs_bigram_perplexity": _bigram_ppl_sql(),
        "events_cohort_retention": _COHORT_RETENTION_SQL,
        "events_funnel": _FUNNEL_SQL,
        "embeddings_ivfpq": _ivfpq_sql(),
        "part_cooccur_triangles": _TRIANGLES_SQL,
        # embedding-distribution drift: even-half fit, both halves
        # assigned, per-cluster population-stability chi2
        "embeddings_drift": _drift_sql(),
        # stationary distribution of the event-type Markov chain
        "events_markov_stationary": _markov_stationary_sql(),
        # DP per-source counts (seeded discrete-Laplace, reproducible)
        "docs_dp_release": _dp_release_sql(),
        # stratified 80/10/10 split by seeded hash rank per source
        "docs_split_stratified": _split_stratified_sql(),
        # count-of-counts degree histogram (out / in / total)
        "kg_degree_histogram": f"""
            WITH idm AS MATERIALIZED ({_IDMAPPED_SQL}),
            od AS (SELECT h AS ent, count(*)::BIGINT AS c
                   FROM idm GROUP BY h),
            idg AS (SELECT t AS ent, count(*)::BIGINT AS c
                    FROM idm GROUP BY t),
            td AS (SELECT ent, sum(c)::BIGINT AS c FROM (
                       SELECT * FROM od UNION ALL SELECT * FROM idg)
                   GROUP BY ent),
            hist AS (
                SELECT 'out' AS side, c AS degree,
                       count(*)::BIGINT AS n_entities
                FROM od GROUP BY c
                UNION ALL
                SELECT 'in', c, count(*)::BIGINT FROM idg GROUP BY c
                UNION ALL
                SELECT 'total', c, count(*)::BIGINT FROM td GROUP BY c)
            SELECT side, degree::BIGINT AS degree, n_entities
            FROM hist ORDER BY side, degree
        """,
        # per-relation object-distribution entropy (selectivity audit)
        "kg_relation_entropy": f"""
            WITH idm AS MATERIALIZED ({_IDMAPPED_SQL}),
            rt AS (SELECT r, t, count(*)::BIGINT AS c
                   FROM idm GROUP BY r, t),
            ag AS (SELECT r, sum(c)::BIGINT AS n,
                          count(*)::BIGINT AS k,
                          -- per-term round-9 quantization (kg_pagerank
                          -- convention) so the parallel SUM's order
                          -- cannot move the 6-dp result cross-engine
                          sum(round(c * ln(c::DOUBLE), 9)) AS sclc
                   FROM rt GROUP BY r)
            SELECT r::BIGINT AS rel, n AS n_edges, k AS n_objects,
                   floor((ln(n::DOUBLE) - sclc / n::DOUBLE)
                         * 1000000 + 0.5) / 1000000 AS entropy,
                   floor((CASE WHEN k > 1
                          THEN (ln(n::DOUBLE) - sclc / n::DOUBLE)
                               / ln(k::DOUBLE)
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000
                       AS norm_entropy
            FROM ag ORDER BY rel
        """,
        # 5-seed directed BFS layer census (unrolled levels)
        "kg_bfs_layers": _bfs_layers_sql(),
        # structural-equivalence twins: exact (out-set, in-set) match
        "kg_twins": f"""
            WITH idm AS MATERIALIZED ({_IDMAPPED_SQL}),
            op AS (SELECT DISTINCT h AS ent, t AS nbr FROM idm),
            ip AS (SELECT DISTINCT t AS ent, h AS nbr FROM idm),
            osig AS (SELECT ent, string_agg(nbr::VARCHAR, ','
                              ORDER BY nbr) AS out_sig
                     FROM op GROUP BY ent),
            isig AS (SELECT ent, string_agg(nbr::VARCHAR, ','
                              ORDER BY nbr) AS in_sig
                     FROM ip GROUP BY ent),
            allent AS (SELECT DISTINCT ent FROM (
                SELECT ent FROM op UNION ALL SELECT ent FROM ip)),
            sig AS (SELECT a.ent,
                           COALESCE(o.out_sig, '') AS out_sig,
                           COALESCE(i.in_sig, '') AS in_sig
                    FROM allent a
                    LEFT JOIN osig o USING (ent)
                    LEFT JOIN isig i USING (ent)),
            cls AS (SELECT out_sig, in_sig,
                           min(ent) AS twin_class,
                           count(*) AS class_size
                    FROM sig GROUP BY 1, 2)
            SELECT s.ent::BIGINT AS ent,
                   c.twin_class::BIGINT AS twin_class,
                   c.class_size::BIGINT AS class_size
            FROM sig s JOIN cls c USING (out_sig, in_sig)
            WHERE c.class_size >= 2 ORDER BY ent
        """,
        # symmetrized-KG triangle census (shared 3-way-join mirror)
        "kg_triangles": _triangles_sql(f"""idm AS MATERIALIZED (
            {_IDMAPPED_SQL}),
    ed AS MATERIALIZED (
        SELECT DISTINCT least(h, t) AS a, greatest(h, t) AS b
        FROM idm WHERE h <> t)"""),
        "docs_bpe_merges": _bpe_sql(8),
        # the encode half: the unrolled merge chain's FINAL symbol table
        "docs_bpe_encode": _bpe_sql(8, tail="""
    SELECT word, CAST(any_value(cnt) AS BIGINT) AS cnt,
           count(*)::BIGINT AS n_syms,
           string_agg(sym, ' ' ORDER BY p) AS encoded
    FROM s8 GROUP BY word ORDER BY word
    """),
        # vocabulary coverage curve: occurrence mass of the top-N words
        "docs_ngram_coverage": """
            WITH wc AS MATERIALIZED (
                SELECT w AS word, count(*) AS cnt
                FROM (SELECT unnest(regexp_extract_all(lower(text),
                                                       '[0-9a-z_]+')) AS w
                      FROM documents)
                GROUP BY w),
            rk AS MATERIALIZED (
                SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word)
                           AS rk
                FROM wc),
            tot AS (SELECT count(*) AS vocab_size, sum(cnt) AS total
                    FROM wc),
            ns AS (SELECT * FROM (VALUES (100), (1000), (10000))
                       AS t(top_n))
            SELECT CAST(ns.top_n AS BIGINT) AS top_n,
                   CAST(tot.vocab_size AS BIGINT) AS vocab_size,
                   CAST(COALESCE((SELECT sum(cnt) FROM rk
                                  WHERE rk.rk <= ns.top_n), 0) AS BIGINT)
                       AS covered,
                   CAST(tot.total AS BIGINT) AS total,
                   COALESCE((SELECT sum(cnt) FROM rk
                             WHERE rk.rk <= ns.top_n), 0) * 1.0 / tot.total
                       AS frac
            FROM ns CROSS JOIN tot ORDER BY top_n
        """,
        # per-user first-order Markov transitions, (ts, event_id)-pinned
        "events_markov_transitions": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
                FROM events),
            agg AS (SELECT event_type AS from_type, nxt AS to_type,
                           count(*) AS cnt
                    FROM seq WHERE nxt IS NOT NULL
                    GROUP BY event_type, nxt)
            SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
                   cnt * 1.0 / sum(cnt) OVER (PARTITION BY from_type)
                       AS prob
            FROM agg ORDER BY from_type, to_type
        """,
        # token-budget mixture plan: per-source doc/token totals +
        # normalized-weight repeat factor against a 2M-token budget
        "docs_token_budget_mixture": f"""
            WITH agg AS (
                SELECT source, count(*) AS n_docs,
                       sum(length({_TOKENS})) AS n_tokens
                FROM documents GROUP BY source),
            w AS (SELECT * FROM (VALUES {", ".join(
                f"('src{i}', {1.0 if i < 5 else 0.5 if i < 10 else 0.1 if i < 15 else 0.0})"
                for i in range(20))}) AS t(source, weight)),
            ws AS (SELECT sum(weight) AS s FROM w)
            SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
                   CAST(a.n_tokens AS BIGINT) AS n_tokens,
                   w.weight,
                   w.weight / ws.s * 2000000.0 / a.n_tokens
                       AS repeat_factor
            FROM agg a JOIN w ON w.source = a.source CROSS JOIN ws
            ORDER BY a.source
        """,
        "docs_cdc_dedup": _cdc_sql(),
        "part_cooccur_kcore": _KCORE_SQL,
        "docs_sb_perplexity": _sb_ppl_sql(),
        "docs_hybrid_rrf": _hybrid_rrf_sql(),
        "embeddings_knn_graph": _KNN_GRAPH_SQL,
        "embeddings_knn_clusters": _KNN_CLUSTERS_SQL,
        "docs_phrase_search": _phrase_sql(_rel_phrase()),
        "docs_blocklist": _blocklist_sql(),
        "docs_jsonl_roundtrip": "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
                                " text, lang, source,"
                                " CAST(n_chars AS BIGINT) AS n_chars"
                                " FROM documents ORDER BY doc_id",
        "docs_csv_roundtrip": "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
                              " text, lang, source,"
                              " CAST(n_chars AS BIGINT) AS n_chars"
                              " FROM documents ORDER BY doc_id",
        "docs_source_overlap": _source_overlap_sql(),
        "events_hourly_anomaly": _HOURLY_ANOMALY_SQL,
        "docs_minhash_estimate": _minhash_estimate_sql(),
        # exact Levenshtein audit over the same candidate chain
        # (DuckDB native levenshtein == the numpy row DP, all-integer)
        "docs_edit_similarity": _minhash_estimate_sql(final="""
            SELECT c.a, c.b,
                   levenshtein(substr(da.text, 1, 400),
                               substr(db.text, 1, 400))::BIGINT AS dist,
                   CASE WHEN greatest(length(substr(da.text, 1, 400)),
                                      length(substr(db.text, 1, 400)))
                             = 0 THEN 1.0
                        ELSE floor((1.0 -
                              levenshtein(substr(da.text, 1, 400),
                                          substr(db.text, 1, 400))
                              ::DOUBLE
                              / greatest(length(substr(da.text, 1, 400)),
                                         length(substr(db.text, 1, 400)))
                             ) * 1000000 + 0.5) / 1000000
                   END AS sim
            FROM cand c
            JOIN documents da ON da.doc_id = c.a
            JOIN documents db ON db.doc_id = c.b
            ORDER BY c.a, c.b"""),
        # Moore-Lewis selection: two rebuilt add-one unigram LMs
        # (in-domain sources vs full corpus), per-doc mean log-prob
        # difference rounded 6 dp, keep on the rounded value
        "docs_moore_lewis": _moore_lewis_sql(),
        # Heaps'-law curve: token first-occurrence doc via min groupby,
        # all-integer running totals over doc order
        "docs_heaps_law": _HEAPS_SQL,
        # greedy k-center: unrolled farthest-point rounds on round-6
        # quantized distances, same assignment rule as embeddings_kmeans
        "embeddings_kcenter": _kcenter_sql(),
        # per-source Zipf OLS over the top-100 ranked tokens
        "docs_zipf_fit": _ZIPF_SQL,
        # RFM quartiles: integer epoch-us recency, lower-disc band edges
        "events_rfm": _RFM_SQL,
        # A-before-B precedence: per (user,type) min/max + self-join
        "events_seq_pairs": _SEQ_PAIRS_SQL,
        # chi-square term selection: exact integer contingency counts,
        # fixed-order float chain, rank on the 6-dp-rounded score
        "docs_chi2_terms": _CHI2_SQL,
        # node2vec-style weighted walks: unrolled steps, window-cumsum
        # weighted pick mirroring the searchsorted selection
        "kg_biased_walks": _biased_walks_sql(),
        # Gopher quality rules: integer counts, int/int ratios, keep on
        # the rounded values (augmentation applied in both engines)
        "docs_gopher_quality": _gopher_sql(),
        # MATTR: lag()-based window-contribution identity, one division
        "docs_mattr": _mattr_sql(),
        # RAKE: gaps-and-islands phrases, global deg/freq word scores
        "docs_rake_keywords": _rake_sql(),
        # residual quantization: two chained kmeans CTE chains, exact
        # IEEE residuals against the rounded level-1 centroids
        "embeddings_rq": _rq_sql(),
        # Flesch reading ease: vowel-group syllables, int/int ratios
        "docs_readability": _READABILITY_SQL,
        # PC1 power iteration: round-6 mean/cov/iterates, max-norm
        "embeddings_pca1": _pca1_sql(),
        # T5 span corruption: seeded masks, island sentinels, pure
        # integer/string
        "docs_span_corruption": _span_corruption_sql(),
        # prefix-LM split at a seeded token boundary
        "docs_prefix_lm": _prefix_lm_sql(),
        # windowed funnel: per-hop 48h box, first-after-previous chain
        "events_window_funnel": _WINDOW_FUNNEL_SQL,
        # tokenizer fertility: the unrolled BPE chain's n_syms joined
        # back onto per-doc words
        "docs_bpe_fertility": _bpe_sql(8, tail=_FERTILITY_TAIL),
        # IVF recall audit: union-of-probes candidate superset, per-
        # query intersection with exact brute top-k
        "embeddings_ann_recall": _ann_recall_sql(),
        # Matryoshka prefix-search recall: truncated-dim top-k ∩ full
        "embeddings_matryoshka": _MATRYOSHKA_SQL,
        # two-proportion z-test between user_id-parity arms
        "events_ab_test": _AB_TEST_SQL,
        # nation-pair shipping revenue (Q7 analogue, all unequal pairs)
        "tpch_q7": _TPCH_Q7_SQL,
        # local-supplier volume per region/year (Q5 analogue)
        "tpch_q5": _TPCH_Q5_SQL,
        "tpch_q6": _TPCH_Q6_SQL,
        "tpch_q10": _TPCH_Q10_SQL,
        "tpch_q14": _TPCH_Q14_SQL,
        "events_props_extract": _PROPS_EXTRACT_SQL,
        "events_value_stats": _VALUE_STATS_SQL,
        "docs_remove_boilerplate": _BOILERPLATE_SQL,
        "events_ab_srm": _ab_srm_sql(),
        "docs_signal_agreement": _signal_agreement_sql(),
        "docs_slop_ngrams": _slop_ngrams_sql(),
        "embeddings_class_centroids": _CLASS_CENTROIDS_SQL,
        "embeddings_range_search": _RANGE_SEARCH_SQL,
        "events_session_paths": _SESSION_PATHS_SQL,
        "events_funnel_time": _FUNNEL_TIME_SQL,
        "events_user_gini": _USER_GINI_SQL,
        # per-source exact-duplicate rate (distinct-text convention of
        # docs_exact_dedup: Python hashes, SQL groups the exact text)
        "docs_dup_rate_by_source": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   count(DISTINCT text)::BIGINT AS n_unique,
                   floor((1.0 - count(DISTINCT text)
                          / CAST(count(*) AS DOUBLE))
                         * 1000000 + 0.5) / 1000000 AS dup_rate
            FROM documents GROUP BY source ORDER BY source
        """,
        # trailing-6h windowed top-3 event types at every observed hour
        "events_sliding_topk": _SLIDING_TOPK_SQL,
        # gaps-and-islands: longest consecutive-day streak per user
        "events_streak": _STREAK_SQL,
        # SRP sign-sketch accuracy audit (cos(pi*h/k) vs exact cosine)
        "embeddings_srp_estimate": _srp_estimate_sql(),
        # event concentration by user rank decile
        "events_pareto": _PARETO_SQL,
        # code-likeness gate (indent/keyword/symbol kernels)
        "docs_code_detect": _CODE_DETECT_SQL,
        # exact lower-disc median inter-event gap per user
        "events_interarrival": _INTERARRIVAL_SQL,
        # embedding-space per-source centroid cohesion audit
        "docs_emb_cohesion": _EMB_COHESION_SQL,
        # DAU + trailing-7-day distinct actives
        "events_rolling_active": _ROLLING_ACTIVE_SQL,
        # spherical kmeans: the kmeans chain over normalized vectors
        "embeddings_spherical_kmeans": _spherical_kmeans_sql(),
        # lang-ID confusion matrix over the mirrored detector
        "docs_lang_confusion": f"""
            SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM ({_LANG_DETECT_SQL})
            GROUP BY lang, lang_pred ORDER BY lang, lang_pred
        """,
        # last-touch attribution: native ASOF LEFT JOIN twin
        "events_attribution": _ATTRIBUTION_SQL,
        # median/MAD robust anomalies, all-integer lower-disc medians
        "events_hourly_mad": _HOURLY_MAD_SQL,
        "events_cusum": _CUSUM_SQL,
        # TPC-H Q3 analogue: BUILDING segment, unshipped revenue top-10
        "tpch_q3": """
            WITH j AS (
                SELECT l.l_orderkey,
                       epoch_us(o.o_orderdate)::BIGINT AS o_orderdate,
                       sum(l.l_extendedprice * (1 - l.l_discount))
                           AS revenue
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                WHERE c.c_mktsegment = 'BUILDING'
                  AND o.o_orderdate < TIMESTAMP '1998-01-01'
                  AND l.l_shipdate > TIMESTAMP '1998-01-01'
                GROUP BY l.l_orderkey, o.o_orderdate)
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, o_orderdate,
                   ROUND(revenue, 6) AS revenue
            FROM j ORDER BY ROUND(revenue, 6) DESC, l_orderkey LIMIT 10
        """,
        # asymmetric containment over the minhash-estimate CTE chain
        "docs_containment": _minhash_estimate_sql(
            final=_CONTAINMENT_FINAL),
        # corpus-order shingle novelty, all-integer first occurrences
        "docs_ngram_novelty": _novelty_sql(),
        # ARI between seed-628/629 kmeans runs (integer pair sums)
        "embeddings_cluster_stability": _ari_sql(),
        # per-source Pearson r from exact integer regression sums
        "docs_length_corr": _LENGTH_CORR_SQL,
        # per-doc OOV rate against the broadcast top-1000 vocabulary
        "docs_oov_rate": """
            WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                              unnest(regexp_extract_all(lower(text),
                                                        '[0-9a-z_]+'))
                                  AS token
                       FROM documents),
            wc AS (SELECT token, count(*) AS cnt FROM w GROUP BY token),
            top AS (SELECT token FROM wc
                    ORDER BY cnt DESC, token LIMIT 1000),
            sc AS (SELECT w.doc_id, count(*)::BIGINT AS n_words,
                          sum(CASE WHEN t.token IS NULL THEN 1 ELSE 0
                              END)::BIGINT AS n_oov
                   FROM w LEFT JOIN top t USING (token)
                   GROUP BY w.doc_id)
            SELECT d.doc_id, COALESCE(sc.n_words, 0) AS n_words,
                   COALESCE(sc.n_oov, 0) AS n_oov,
                   floor(COALESCE(sc.n_oov, 0)
                         / greatest(COALESCE(sc.n_words, 0), 1)::DOUBLE
                         * 1000000 + 0.5) / 1000000 AS oov_rate
            FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id
                  FROM documents) d
            LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id
        """,
        # per-vector L2 norm (round-6) + lower-disc quartile band
        "embeddings_norm_stats": """
            WITH nm AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                               ROUND(sqrt(list_inner_product(
                                   embedding::DOUBLE[],
                                   embedding::DOUBLE[])), 6) AS norm
                        FROM embeddings),
            n AS (SELECT count(*) AS n FROM nm),
            o AS (SELECT norm AS v,
                         row_number() OVER (ORDER BY norm) - 1 AS rk
                  FROM nm),
            e AS (SELECT max(CASE WHEN rk = (n - 1) // 4 THEN v END)
                             AS e25,
                         max(CASE WHEN rk = (n - 1) // 2 THEN v END)
                             AS e50,
                         max(CASE WHEN rk = (3 * (n - 1)) // 4 THEN v
                             END) AS e75
                  FROM o, n)
            SELECT nm.vec_id, nm.norm,
                   CAST(1 + (nm.norm > e.e25)::INT
                        + (nm.norm > e.e50)::INT
                        + (nm.norm > e.e75)::INT AS BIGINT) AS band
            FROM nm, e ORDER BY vec_id
        """,
        # KG out-degree power-law OLS over the top-100 hubs
        "kg_degree_powerlaw": f"""
            WITH edges AS ({_IDMAPPED_SQL}),
            dg AS (SELECT h, count(*)::BIGINT AS deg FROM edges
                   GROUP BY h),
            rk AS (SELECT deg, row_number() OVER (ORDER BY deg DESC, h)
                       AS rn
                   FROM dg),
            top AS (SELECT ln(rn::DOUBLE) AS x, ln(deg::DOUBLE) AS y
                    FROM rk WHERE rn <= 100),
            s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sxx
                  FROM top)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                       AS slope,
                   ROUND((sy - (n * sxy - sx * sy)
                               / (n * sxx - sx * sx) * sx) / n, 6)
                       AS intercept
            FROM s
        """,
        # per-relation reciprocity vs the distinct reversed-pair set
        "kg_reciprocity": f"""
            WITH edges AS ({_IDMAPPED_SQL}),
            dd AS (SELECT DISTINCT h, t FROM edges)
            SELECT e.r, count(*)::BIGINT AS n_edges,
                   sum(CASE WHEN dd.h IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n_reciprocal,
                   ROUND(sum(CASE WHEN dd.h IS NOT NULL THEN 1 ELSE 0
                             END) / count(*)::DOUBLE, 6) AS reciprocity
            FROM edges e LEFT JOIN dd ON dd.h = e.t AND dd.t = e.h
            GROUP BY e.r ORDER BY e.r
        """,
        # whitespace/case canonicalization (augmentation both engines)
        "docs_text_norm": r"""
            WITH aug AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN '  Weird' || chr(9) || 'SPACING'
                             || chr(13) || chr(10) || 'Prefix '
                             || text || '  '
                        ELSE text END AS raw
                 FROM documents),
            n AS (SELECT doc_id, raw,
                         trim(regexp_replace(lower(raw),
                              '[ \t\n\r\f\v]+', ' ', 'g'), ' ')
                             AS text_norm
                  FROM aug)
            SELECT doc_id, length(raw)::BIGINT AS n_chars_raw,
                   length(text_norm)::BIGINT AS n_chars_norm,
                   CAST(CASE WHEN raw <> text_norm THEN 1 ELSE 0 END
                        AS BIGINT) AS changed,
                   text_norm
            FROM n ORDER BY doc_id
        """,
        # sessionization × exact-quantile composition
        "events_session_quantiles": """
            WITH ordered AS (
                SELECT user_id, epoch_us(ts) // 1000000 AS es,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events),
            flagged AS (
                SELECT user_id, es, rn,
                       CASE WHEN lag(es) OVER (PARTITION BY user_id
                                               ORDER BY rn) IS NULL
                                 OR es - lag(es) OVER (PARTITION BY
                                     user_id ORDER BY rn) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM ordered),
            tagged AS (
                SELECT user_id, es,
                       SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY rn) - 1 AS session_id
                FROM flagged),
            s AS (SELECT user_id, session_id,
                         count(*)::BIGINT AS n_events,
                         (max(es) - min(es))::BIGINT AS duration_s
                  FROM tagged GROUP BY user_id, session_id),
            n AS (SELECT count(*) AS n FROM s),
            qs(q) AS (SELECT unnest(
                [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]::DOUBLE[])),
            od AS (SELECT duration_s AS v,
                          row_number() OVER (ORDER BY duration_s) - 1
                              AS rk
                   FROM s),
            oe AS (SELECT n_events AS v,
                          row_number() OVER (ORDER BY n_events) - 1
                              AS rk
                   FROM s)
            SELECT qs.q, CAST(d.v AS BIGINT) AS duration_s_q,
                   CAST(e.v AS BIGINT) AS n_events_q
            FROM n CROSS JOIN qs
            JOIN od d ON d.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            JOIN oe e ON e.rk = CAST(floor((n.n - 1) * qs.q) AS BIGINT)
            ORDER BY qs.q
        """,
        # TPC-H Q4 analogue: late-shipping orders per priority in 1997
        "tpch_q4": """
            WITH ms AS (SELECT l_orderkey, max(epoch_us(l_shipdate))
                            AS max_ship
                        FROM lineitem GROUP BY l_orderkey)
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND ms.max_ship > epoch_us(o.o_orderdate)
            GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """,
        # greenlist watermark detection (planted suffix every 7th doc)
        "docs_watermark": _watermark_sql(),
        # interarrival-regularity bot signal: top-20 most-regular users
        "events_bot_score": """
            WITH ev AS (SELECT user_id, epoch_us(ts) AS ts FROM events),
            gp AS (SELECT user_id,
                          (ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts)) // 1000000
                              AS g
                   FROM ev),
            m AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
                         sum(g)::BIGINT AS sg,
                         sum(g * g)::BIGINT AS sgg
                  FROM gp WHERE g IS NOT NULL GROUP BY user_id),
            sc AS (SELECT user_id, n_gaps,
                          floor(((sgg / CAST(n_gaps AS DOUBLE)
                                  - (sg / CAST(n_gaps AS DOUBLE))
                                    * (sg / CAST(n_gaps AS DOUBLE)))
                                 / ((sg / CAST(n_gaps AS DOUBLE))
                                    * (sg / CAST(n_gaps AS DOUBLE))))
                                * 1000000 + 0.5) / 1000000 AS cv2
                   FROM m WHERE n_gaps >= 4)
            SELECT CAST(user_id AS BIGINT) AS user_id, n_gaps, cv2
            FROM sc ORDER BY cv2, user_id LIMIT 20
        """,
        # per-source hapax-legomena lexical-richness profile
        "docs_hapax": """
            WITH dw AS (SELECT source,
                               unnest(regexp_extract_all(lower(text),
                                      '[0-9a-z_]+')) AS word
                        FROM documents),
            wc AS (SELECT source, word, count(*)::BIGINT AS c
                   FROM dw GROUP BY 1, 2),
            ag AS (SELECT source, count(*)::BIGINT AS vocab_size,
                          sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                              AS n_hapax
                   FROM wc GROUP BY source)
            SELECT source, vocab_size, n_hapax,
                   floor(n_hapax / vocab_size::DOUBLE * 1000000 + 0.5)
                       / 1000000 AS hapax_ratio
            FROM ag ORDER BY source
        """,
        # word burstiness: var/mean dispersion over all docs, top-50
        "docs_burstiness": """
            WITH dw AS (SELECT doc_id,
                               unnest(regexp_extract_all(lower(text),
                                      '[0-9a-z_]+')) AS word
                        FROM documents),
            wc AS (SELECT doc_id, word, count(*)::BIGINT AS c
                   FROM dw GROUP BY 1, 2),
            ag AS (SELECT word, sum(c)::BIGINT AS sx,
                          sum(c * c)::BIGINT AS sxx,
                          count(*)::BIGINT AS df
                   FROM wc GROUP BY word),
            nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
            sc AS (SELECT word, df, sx AS total,
                          floor(((sxx / nd.n - (sx / nd.n)
                                  * (sx / nd.n)) / (sx / nd.n))
                                * 1000000 + 0.5) / 1000000
                              AS burstiness
                   FROM ag, nd WHERE df >= 20)
            SELECT word, df, total, burstiness FROM sc
            ORDER BY burstiness DESC, word LIMIT 50
        """,
        # 3-combo brand/size/quantity discounted revenue (Q19 analogue)
        "tpch_q19": """
            WITH j AS (SELECT l.l_quantity AS qty,
                              l.l_extendedprice * (1 - l.l_discount)
                                  AS rev,
                              p.p_brand AS b, p.p_size AS s
                       FROM lineitem l
                       JOIN part p ON p.p_partkey = l.l_partkey),
            f AS (SELECT qty, rev,
                         (b = 'Brand#13' AND s <= 15
                          AND qty BETWEEN 1 AND 20) AS c1,
                         (b = 'Brand#22' AND s <= 30
                          AND qty BETWEEN 5 AND 35) AS c2,
                         (s >= 40 AND qty >= 20) AS c3
                  FROM j)
            SELECT combo::BIGINT AS combo, n, ROUND(revenue, 2)
                       AS revenue FROM (
                SELECT 0 AS combo, count(*) FILTER (c1)::BIGINT AS n,
                       COALESCE(sum(rev) FILTER (c1), 0.0) AS revenue
                FROM f
                UNION ALL
                SELECT 1, count(*) FILTER (c2),
                       COALESCE(sum(rev) FILTER (c2), 0.0) FROM f
                UNION ALL
                SELECT 2, count(*) FILTER (c3),
                       COALESCE(sum(rev) FILTER (c3), 0.0) FROM f
                UNION ALL
                SELECT 3, count(*) FILTER (c1 OR c2 OR c3),
                       COALESCE(sum(rev) FILTER (c1 OR c2 OR c3), 0.0)
                FROM f)
            ORDER BY combo
        """,
        # above-avg-balance customers with no orders (Q22 analogue)
        "tpch_q22": """
            WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS ck,
                              CAST(floor(c_acctbal * 100.0 + 0.5)
                                   AS BIGINT) AS bal
                       FROM customer),
            av AS (SELECT CAST(sum(bal) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE) AS a
                   FROM c WHERE bal > 0),
            noord AS (SELECT c.ck, c.bal FROM c, av
                      WHERE c.bal > av.a
                        AND NOT EXISTS (SELECT 1 FROM orders o
                                        WHERE o.o_custkey = c.ck))
            SELECT (ck % 10)::BIGINT AS cntrycode,
                   count(*)::BIGINT AS numcust,
                   round(CAST(sum(bal) AS DOUBLE) / 100.0, 2)
                       AS totacctbal
            FROM noord GROUP BY 1 ORDER BY 1
        """,
        # customer order-count distribution incl. the zero class
        "tpch_q13": """
            WITH oc AS (SELECT o_custkey, count(*)::BIGINT AS n
                        FROM orders GROUP BY o_custkey),
            h AS (SELECT n AS c_count, count(*)::BIGINT AS custdist
                  FROM oc GROUP BY n
                  UNION ALL
                  SELECT 0, (SELECT count(*) FROM customer)
                            - (SELECT count(*) FROM oc)
                  WHERE (SELECT count(*) FROM customer)
                        > (SELECT count(*) FROM oc))
            SELECT c_count::BIGINT AS c_count, custdist FROM h
            ORDER BY custdist DESC, c_count DESC
        """,
        # large-volume customers: total order quantity > 250, top 20
        "tpch_q18": """
            WITH per AS (SELECT l_orderkey,
                                CAST(round(sum(l_quantity), 0) AS BIGINT)
                                    AS qty
                         FROM lineitem GROUP BY l_orderkey
                         HAVING sum(l_quantity) > 250)
            SELECT c.c_name, CAST(o.o_custkey AS BIGINT) AS c_custkey,
                   CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
                   ROUND(o.o_totalprice, 2) AS o_totalprice,
                   per.qty AS total_qty
            FROM per
            JOIN orders o ON o.o_orderkey = per.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY per.qty DESC, per.l_orderkey LIMIT 20
        """,
        # priority x 60-day lateness lineitem counts (Q12 analogue)
        "tpch_q12": """
            WITH lp AS (SELECT l_orderkey,
                               epoch_us(l_shipdate) // 86400000000
                                   AS ship_day,
                               count(*)::BIGINT AS n
                        FROM lineitem GROUP BY 1, 2),
            o AS (SELECT o_orderkey,
                         epoch_us(o_orderdate) // 86400000000 AS o_day,
                         o_orderpriority
                  FROM orders)
            SELECT o.o_orderpriority,
                   sum(CASE WHEN lp.ship_day > o.o_day + 60
                       THEN lp.n ELSE 0 END)::BIGINT AS late_count,
                   sum(CASE WHEN lp.ship_day > o.o_day + 60
                       THEN 0 ELSE lp.n END)::BIGINT AS ontime_count
            FROM lp JOIN o ON o.o_orderkey = lp.l_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        # profit rollup per supplier nation x ship year (Q9 analogue;
        # unit cost = 0.5 * p_retailprice, no partsupp in the schema)
        "tpch_q9": """
            SELECT n.n_name,
                   CAST(1970 + (epoch_us(l.l_shipdate) // 86400000000)
                               // 365 AS BIGINT) AS year,
                   ROUND(sum(l.l_extendedprice * (1 - l.l_discount)
                             - 0.5 * p.p_retailprice * l.l_quantity), 2)
                       AS profit
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # weekly cohort retention (distinct active weeks per user)
        "events_retention": """
            WITH uw AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // 604800000000 AS week
                        FROM events),
            ch AS (SELECT user_id, min(week) AS cohort_week
                   FROM uw GROUP BY user_id),
            rws AS (SELECT ch.cohort_week,
                           uw.week - ch.cohort_week AS k
                    FROM uw JOIN ch USING (user_id)
                    WHERE uw.week - ch.cohort_week <= 8),
            agg AS (SELECT cohort_week, k, count(*)::BIGINT AS n_users
                    FROM rws GROUP BY 1, 2),
            base AS (SELECT cohort_week, n_users AS base_n
                     FROM agg WHERE k = 0)
            SELECT a.cohort_week::BIGINT AS cohort_week,
                   a.k::BIGINT AS k, a.n_users,
                   floor(a.n_users / b.base_n::DOUBLE * 1000000 + 0.5)
                       / 1000000 AS rate
            FROM agg a JOIN base b USING (cohort_week)
            ORDER BY cohort_week, k
        """,
        # top supplier by one ship-year's revenue (Q15 analogue;
        # max compared on the 6-dp ROUNDED revenue, ties all kept)
        "tpch_q15": """
            WITH r AS (SELECT l_suppkey AS s_suppkey,
                              round(sum(l_extendedprice
                                        * (1.0 - l_discount)), 6)
                                  AS total_revenue
                       FROM lineitem
                       WHERE 1970 + (epoch_us(l_shipdate)
                                     // 31557600000000) = 1996
                       GROUP BY 1)
            SELECT r.s_suppkey::BIGINT AS s_suppkey, s.s_name,
                   r.total_revenue
            FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM r)
            ORDER BY r.s_suppkey
        """,
        # small-quantity-order revenue for one brand (Q17 analogue;
        # qty/avg are exact integer-valued doubles -> the 0.2*avg
        # threshold is the identical IEEE chain in both engines)
        "tpch_q17": """
            WITH b AS (SELECT p_partkey FROM part
                       WHERE p_brand = 'Brand#13'),
            s AS (SELECT l_partkey, sum(l_quantity) AS sq,
                         count(*) AS nq
                  FROM lineitem JOIN b ON b.p_partkey = l_partkey
                  GROUP BY 1),
            f AS (SELECT l.l_extendedprice
                  FROM lineitem l JOIN s ON s.l_partkey = l.l_partkey
                  WHERE l.l_quantity < CAST(0.2 AS DOUBLE)
                                       * (s.sq / s.nq))
            SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
                   count(*)::BIGINT AS n_small
            FROM f
        """,
        # distinct-supplier count per part attribute group (Q16
        # analogue over the observed lineitem part-supplier pairs)
        "tpch_q16": """
            WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
                           FROM lineitem),
            j AS (SELECT p.p_brand, p.p_type,
                         p.p_size::BIGINT AS p_size, pr.l_suppkey
                  FROM pairs pr
                  JOIN part p ON p.p_partkey = pr.l_partkey
                  WHERE p.p_brand <> 'Brand#13'
                    AND p.p_type <> 'PROMO'
                    AND p.p_size IN (9, 16, 22, 24, 29, 33, 47, 48))
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM j GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        # important parts by one region's shipped value (Q11 analogue;
        # threshold = fraction of the sum of 6-dp-rounded per-part
        # values — an exact fixed-quantization chain in both engines)
        "tpch_q11": """
            WITH sk AS (SELECT s_suppkey FROM supplier s
                        JOIN nation n
                          ON n.n_nationkey = s.s_nationkey
                        JOIN region r
                          ON r.r_regionkey = n.n_regionkey
                        WHERE r.r_name = 'EUROPE'),
            v AS (SELECT l_partkey AS p_partkey,
                         round(sum(l_extendedprice * l_quantity), 6)
                             AS value
                  FROM lineitem l
                  JOIN sk ON sk.s_suppkey = l.l_suppkey
                  GROUP BY 1)
            SELECT p_partkey::BIGINT AS p_partkey, value FROM v
            WHERE value > (SELECT sum(value) FROM v)
                          * CAST(0.001 AS DOUBLE)
            ORDER BY value DESC, p_partkey
        """,
        # national market share per order year (Q8 analogue; share =
        # half-up ratio of the two 6-dp-rounded sums — rule 26)
        "tpch_q8": """
            WITH t AS (SELECT p_partkey FROM part
                       WHERE p_type = 'ECONOMY'),
            ts AS (SELECT s_suppkey FROM supplier s
                   JOIN nation n ON n.n_nationkey = s.s_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey
                   WHERE r.r_name = 'EUROPE'),
            rc AS (SELECT c_custkey FROM customer c
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey
                   WHERE r.r_name = 'ASIA'),
            l AS (SELECT l_orderkey,
                         l_extendedprice * (1.0 - l_discount) AS rev,
                         CASE WHEN l_suppkey IN
                                  (SELECT s_suppkey FROM ts)
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END AS rev_target
                  FROM lineitem
                  JOIN t ON t.p_partkey = l_partkey),
            o AS (SELECT o_orderkey,
                         1970 + (epoch_us(o_orderdate)
                                 // 31557600000000) AS o_year
                  FROM orders JOIN rc ON rc.c_custkey = o_custkey),
            a AS (SELECT o_year::BIGINT AS o_year,
                         round(sum(rev_target), 6) AS rev_target,
                         round(sum(rev), 6) AS rev_total
                  FROM l JOIN o ON o.o_orderkey = l.l_orderkey
                  GROUP BY 1)
            SELECT o_year, rev_target, rev_total,
                   floor(rev_target / rev_total * 1000000 + 0.5)
                       / 1000000 AS mkt_share
            FROM a ORDER BY o_year
        """,
        # suppliers who shipped LAST on multi-supplier 'F' orders
        # (Q21 analogue; all-integer ship-day arithmetic)
        "tpch_q21": """
            WITH f AS (SELECT o_orderkey FROM orders
                       WHERE o_orderstatus = 'F'),
            pm AS (SELECT l_orderkey AS o, l_suppkey AS s,
                          max(epoch_us(l_shipdate)
                              // 86400000000) AS d
                   FROM lineitem
                   JOIN f ON f.o_orderkey = l_orderkey
                   GROUP BY 1, 2),
            om AS (SELECT o, max(d) AS omax, min(d) AS omin
                   FROM pm GROUP BY o)
            SELECT s.s_name, count(*)::BIGINT AS numwait
            FROM pm JOIN om USING (o)
            JOIN supplier s ON s.s_suppkey = pm.s
            WHERE pm.d = om.omax AND om.omin < om.omax
            GROUP BY 1 ORDER BY numwait DESC, s_name
        """,
        # leading suppliers of a part-name class (Q20 analogue;
        # EXACT integer near-top test 2*sq > max_sq)
        "tpch_q20": """
            WITH pk AS (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'cold%'),
            ps AS (SELECT l_partkey AS p, l_suppkey AS s,
                          sum(l_quantity::BIGINT) AS sq
                   FROM lineitem
                   JOIN pk ON pk.p_partkey = l_partkey
                   GROUP BY 1, 2),
            tot AS (SELECT p, max(sq) AS mq FROM ps GROUP BY p)
            SELECT DISTINCT ps.s::BIGINT AS s_suppkey, su.s_name
            FROM ps JOIN tot USING (p)
            JOIN supplier su ON su.s_suppkey = ps.s
            WHERE 2 * ps.sq > tot.mq
            ORDER BY s_suppkey
        """,
        # minimum-cost supplier per part (Q2 analogue; packed
        # (cost_micro, suppkey) integer argmin — exact tiebreaks)
        "tpch_q2": """
            WITH pk AS (SELECT p_partkey FROM part
                        WHERE p_type = 'STANDARD'
                          AND p_size IN (9, 16, 22)),
            ps AS (SELECT l_partkey AS p, l_suppkey AS s,
                          sum(l_extendedprice) AS ep,
                          sum(l_quantity::BIGINT) AS q
                   FROM lineitem
                   JOIN pk ON pk.p_partkey = l_partkey
                   GROUP BY 1, 2),
            m AS (SELECT p,
                         min(CAST(floor(ep / q::DOUBLE * 1000000 + 0.5)
                                  AS BIGINT) * 10000000 + s) AS key
                  FROM ps GROUP BY p)
            SELECT m.p::BIGINT AS p_partkey,
                   (m.key % 10000000)::BIGINT AS s_suppkey,
                   su.s_name, n.n_name,
                   round(su.s_acctbal, 2) AS s_acctbal,
                   (m.key // 10000000) / 1000000.0 AS unit_cost
            FROM m
            JOIN supplier su ON su.s_suppkey = m.key % 10000000
            JOIN nation n ON n.n_nationkey = su.s_nationkey
            ORDER BY p_partkey
        """,
        # per-user event-type entropy band histogram (quantized-per-term
        # sum + half-up 6-dp entropy; integer banding on the rounded H)
        "events_user_entropy": """
            WITH ut AS (SELECT user_id, event_type,
                               count(*)::BIGINT AS c
                        FROM events GROUP BY 1, 2),
            u AS (SELECT user_id, sum(c) AS n,
                         count(*)::BIGINT AS k,
                         sum(round(c * ln(c::DOUBLE), 9)) AS s
                  FROM ut GROUP BY 1),
            h AS (SELECT user_id, k,
                         CASE WHEN n <= 1 THEN 0.0
                              ELSE floor((ln(n::DOUBLE) - s / n::DOUBLE)
                                         * 1000000 + 0.5) / 1000000
                         END AS ent
                  FROM u)
            SELECT CAST(floor(ent / 0.25) AS BIGINT) AS band,
                   count(*)::BIGINT AS n_users,
                   sum(k)::BIGINT AS sum_types,
                   min(ent) AS min_ent, max(ent) AS max_ent
            FROM h GROUP BY 1 ORDER BY band
        """,
    }
