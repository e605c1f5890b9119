"""Phase A — KG construction over Common-Crawl-style pages (SURVEY.md §7.1).

    read pages (url, warc_ts, html, text, lang)
      → extract_text (pinned, byte-identical per url)      [stateless tasks]
      → filter lang == "en"                                [vectorized]
      → sentence split                                     [stateless tasks]
      → triple extraction (compiled patterns)              [actor pool]
      → canonicalization (salted groupby clustering +
        broadcast alias map)                               [shuffle + bcast]
      → exact dedup groupby(subj, pred, obj)               [shuffle]
      → edges parquet (+ per-shard manifest when resumable)

Every stage is Arrow-in/Arrow-out ``map_batches``; the only all-to-all
exchanges are the alias build (pre-combined per batch) and the final dedup
(pre-combined per batch) — both shuffle signature-sized rows, never pages.
"""

from __future__ import annotations

import pyarrow as pa

from ..context import Broadcast, auto_pool
from ..stages.canonicalize import CanonicalizeTriples, build_alias_table
from ..stages.dedup import distinct_rows
from ..stages.extract import extract_text_batch, sentences_batch
from ..stages.text import filter_lang
from ..stages.triples import TripleExtractor


def extract_pages(pages_ds):
    """pages → + extracted_text column (the byte-identical invariant)."""
    return pages_ds.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=1024
    )


def mentions_from_pages(pages_ds, *, lang: str = "en",
                        concurrency: tuple[int, int] | int | None = None,
                        num_gpus: float | None = None):
    """pages → surface-form mention triples (url, sent_id, subj/pred/obj).

    The extractor pool autoscales (min, max) so several pools coexist on a
    small cluster without reserving every CPU (a fixed-size pool per stage
    can deadlock the streaming executor when pools sum past the cluster).
    ``num_gpus`` reserves GPUs per extractor actor (for model-based
    extractors on a GPU cluster; unset on CPU-only nodes).
    """
    extracted = extract_pages(pages_ds)
    sents = extracted.map_batches(
        lambda b: filter_lang(b, lang=lang), batch_format="pyarrow"
    ).map_batches(sentences_batch, batch_format="pyarrow", batch_size=1024)
    from ..context import auto_pool, pool_resources

    return sents.map_batches(
        TripleExtractor,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or auto_pool(),
        **pool_resources(num_gpus=num_gpus),
    )


def edges_from_mentions(mentions_ds, *, policy: str = "titlecase",
                        n_salt: int = 0, keep_url: bool = False):
    """mentions → canonicalized, deduplicated (subj, pred, obj) edge table."""
    # the alias table is a small wide-agg result; materialize to pandas for
    # broadcast (its size is O(#distinct surfaces), not O(corpus))
    alias = build_alias_table(
        mentions_ds, ["subj_surface", "obj_surface"],
        policy=policy, n_salt=n_salt,
    )
    bc = Broadcast(alias)
    canon = mentions_ds.map_batches(
        CanonicalizeTriples,
        fn_constructor_kwargs={"alias_bc": bc},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=auto_pool(),
    )
    if keep_url:
        return distinct_rows(canon, ["subj", "pred", "obj", "url"])
    return distinct_rows(
        canon.map_batches(
            lambda b: b.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        ),
        ["subj", "pred", "obj"],
    )


def kg_construct(pages_ds, *, policy: str = "titlecase", **kw):
    """Full phase A: pages Dataset → deduped edge Dataset.

    ``policy="titlecase"`` (rule-based canonical forms) takes the fused
    single-pass path: extract → triples → inline canonicalize →
    in-batch distinct → ONE dedup shuffle.  Other policies need corpus
    statistics, so mentions are materialized once (they are O(#fact
    sentences), far smaller than pages) and consumed by the alias build
    + canonicalize passes.
    """
    from ..stages.canonicalize import canonicalize_inline_batch

    if policy == "titlecase":
        canon = mentions_from_pages(pages_ds).map_batches(
            canonicalize_inline_batch, batch_format="pyarrow"
        )
        return distinct_rows(
            canon.map_batches(
                lambda b: b.select(["subj", "pred", "obj"]),
                batch_format="pyarrow",
            ),
            ["subj", "pred", "obj"],
        )
    mentions = mentions_from_pages(pages_ds).materialize()
    return edges_from_mentions(mentions, policy=policy, **kw)


# ---------------------------------------------------------------------------
# Resumable variant: shard-at-a-time with manifest (tests/test_resume.py)
# ---------------------------------------------------------------------------

def kg_construct_resumable(spec, out_dir: str, *, n_shards: int = 8,
                           fail_after_shards: int | None = None) -> dict:
    """Phase A over the synthetic corpus, resumable per page-id shard.

    Each shard is an independent page-id range (pure-function corpus ⇒ the
    fingerprint is just (seed, range)); a killed run resumes by processing
    only shards absent from the manifest.  Returns counters.
    """
    import ray.data as rd

    from ..sources.pages import CorpusSpec, pages_batch
    from ..state import manifest as mf

    assert isinstance(spec, CorpusSpec)
    per = (spec.n_pages + n_shards - 1) // n_shards
    shards = {
        sid: f"s{spec.seed}:{sid * per}:{min((sid + 1) * per, spec.n_pages)}"
        for sid in range(n_shards)
    }
    todo = mf.resume_shards(out_dir, shards)
    done_before = n_shards - len(todo)

    processed = 0
    for sid in todo:
        if fail_after_shards is not None and processed >= fail_after_shards:
            raise RuntimeError(f"injected failure after {processed} shards")
        t0 = mf.now()
        lo, hi = sid * per, min((sid + 1) * per, spec.n_pages)
        seed, n_pages = spec.seed, spec.n_pages

        def gen(batch: pa.Table, lo=lo) -> pa.Table:
            local = CorpusSpec(seed=seed, n_pages=n_pages)
            ids = batch.column("id").to_numpy() + lo
            return pages_batch(local, ids)

        pages = rd.range(hi - lo, override_num_blocks=max(1, (hi - lo) // 1000)) \
            .map_batches(gen, batch_format="pyarrow")
        edges = kg_construct(pages)
        table = pa.Table.from_pandas(
            edges.to_pandas().sort_values(["subj", "pred", "obj"]),
            preserve_index=False,
        )
        rows = mf.write_shard_parquet(table, out_dir, sid)
        mf.commit_shard(out_dir, mf.ShardRecord(
            shard_id=sid,
            input_fingerprint=shards[sid],
            rows_in=hi - lo,
            rows_out=rows,
            counters={"pages": hi - lo, "edges": rows},
            wall_sec=mf.now() - t0,
            finished_at=mf.now(),
        ))
        processed += 1

    return {
        "shards_total": n_shards,
        "shards_skipped": done_before,
        "shards_processed": processed,
    }


def kg_construct_incremental(new_pages_ds, existing_edges_ds, *,
                             policy: str = "titlecase"):
    """Incremental phase A: extract triples from NEW pages only and
    anti-join against the existing edge table — the daily-crawl ingest
    shape (re-extracting the historical corpus to add a shard is the
    thing a 10^12-document pipeline can never afford).

    The anti-join is a bucketed LEFT join with hit flag
    (functions/joins.py:left_join_fill) on a packed signature of the
    canonical triple — BOTH sides stream, nothing corpus-sized is
    broadcast; the existing side ships only (signature) rows, never its
    strings twice.  Collision safety: the signature is a 64-bit
    stable_hash64 of the tab-joined triple; at 10^12 edges expect
    birthday collisions — swap to the 128-bit pair (two independent
    hashes) before that scale (documented, same plan shape).

    Returns the NEW distinct (subj, pred, obj) edges not already in
    ``existing_edges_ds``."""
    import pyarrow as pa

    from ..functions.joins import left_join_fill
    from ..stages.dedup import stable_hash64

    def sig(t: pa.Table) -> pa.Table:
        import numpy as np

        keys = [f"{s}\t{p}\t{o}" for s, p, o in zip(
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj").to_pylist())]
        h = np.fromiter((stable_hash64(k) for k in keys),
                        dtype=np.uint64, count=len(keys))
        return t.append_column("__sig", pa.array(h.view(np.int64)))

    new_edges = kg_construct(new_pages_ds, policy=policy) \
        .map_batches(sig, batch_format="pyarrow")
    old_sigs = existing_edges_ds.map_batches(
        lambda t: sig(t).select(["__sig"]).append_column(
            "__old", pa.array([1] * t.num_rows,
                              type=pa.int8())),
        batch_format="pyarrow")
    j = left_join_fill(new_edges, old_sigs, on="__sig",
                       fill={"__old": 0})
    import pyarrow.compute as pc

    return j.map_batches(
        lambda t: t.filter(pc.equal(t.column("__old"),
                                    pa.scalar(0, pa.int8())))
        .select(["subj", "pred", "obj"]),
        batch_format="pyarrow")
