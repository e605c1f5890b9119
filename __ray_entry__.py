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
        "kg_vocab_entities": rel.kg_vocab_entities,
        "kg_edges_idmapped": rel.kg_edges_idmapped,
        "kg_split_counts": rel.kg_split_counts,
        # --- SQL-checked: dedup / text analysis / windows / aggregates --
        "part_supplier_pairs": rel.part_supplier_pairs,
        "docs_exact_dedup": rel.docs_exact_dedup,
        "docs_quality": rel.docs_quality,
        "docs_token_stats": rel.docs_token_stats,
        "lang_counts": rel.lang_counts,
        "events_hourly": rel.events_hourly,
        "events_thresholds": rel.events_thresholds,
        "tpch_q1": rel.tpch_q1,
        "revenue_by_nation": rel.revenue_by_nation,
        "top_parts": rel.top_parts,
        "ann_topk": rel.ann_topk,
        "order_priority_revenue": rel.order_priority_revenue,
        # (events_sessions registered below with the corpus queries)
        # --- rows-only: corpus phase A/B + near-dup + ANN scale path ----
        "pages_extract": cq.pages_extract,
        "kg_construct_pages": cq.kg_construct_pages,
        "trust_scores": cq.trust_scores,
        "docs_minhash_dedup": cq.docs_minhash_dedup,
        "docs_simhash": cq.docs_simhash,
        "docs_lang_detect": cq.docs_lang_detect,
        "docs_fingerprint": cq.docs_fingerprint,
        "embeddings_ivf_topk": cq.embeddings_ivf_topk,
        "embeddings_near_dup": cq.embeddings_near_dup,
        "kg_negative_samples": cq.kg_negative_samples,
        "kg_graph_features": cq.kg_graph_features,
        "kg_kgc_negatives": cq.kg_kgc_negatives,
        "kg_link_prediction": cq.kg_link_prediction,
        "kg_error_report": cq.kg_error_report,
        "embeddings_roundtrip": cq.embeddings_roundtrip,
        "events_sessions": rel.events_sessions,
        "trust_pr_sweep": cq.trust_pr_sweep,
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

_TOKENS = "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'), x -> x <> '')"
_STOPS = ("['the','and','of','to','in','is','was','for','with','that','on',"
          "'as','are','this','at','by','from','it','an','be']")


def oracle_sql() -> dict[str, str]:
    return {
        "kg_edges_relational": _EDGES_SQL,
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
        "events_hourly": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY event_type, hour_epoch
            ORDER BY event_type, hour_epoch
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
    }
