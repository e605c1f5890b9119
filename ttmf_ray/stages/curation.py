"""Training-data curation operators: benchmark decontamination, seeded
deterministic shuffle-export, concat-and-chunk sequence packing, weighted
source mixture, and document-frequency vocabulary building.

These are the large-scale-pipeline extensions the target calls for
(SURVEY.md §2.9) — none exists in the reference (its corpus pass stops at
triple extraction, full_run.sh:20-32); each is built from the same pinned
SQL-expressible primitives as the dedup stages (rolling word fingerprints
+ splitmix64, stages/dedup.py:40-46) so the driver's DuckDB oracle can
verify every value.

Scale shapes (what each stage moves at 100 TB):

- decontaminate: the EVAL side (a benchmark set — thousands of docs by
  construction) is reduced to a sorted distinct shingle-hash array and
  broadcast once via the object store; the train corpus streams through a
  per-batch vectorized membership probe.  Nothing about the train side is
  ever collected.
- shuffle_export: one hash pass (no data movement) + one groupby over
  ``n_shards`` LARGE groups — the good ``map_groups`` shape (few big
  groups, CLAUDE.md rule 3 is about the opposite case).  This replaces a
  true ``random_shuffle`` (all-to-all over the payload) with an
  all-to-all over (doc_id, key) rows only; the payload join happens at
  write time per shard.
- pack_bins: two passes — per-range token sums (tiny aggregate, one row
  per range) + a broadcast prefix, then per-range cumulative offsets.
  Ranges are doc_id spans, so the cumsum never needs a global sort.
- source_mixture: stateless per-batch filter; weights broadcast in the
  closure (bytes, not a shuffle).
- top_tokens: per-batch distinct-(doc, token) partial counts (the
  combiner), then one groupby over tokens whose input is already
  collapsed to one row per (batch, token) — the Zipf head dominates, so
  pre-combining shrinks the shuffle by ~the mean batch df.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..context import half_up
from ..sources.pages import mix64_vec

_I63 = np.uint64(1 << 63)


def _doc_ids(batch: pa.Table, col: str) -> np.ndarray:
    return batch.column(col).to_numpy().astype(np.int64)


# ---------------------------------------------------------------------------
# Benchmark decontamination (shingle-hash semi-join)
# ---------------------------------------------------------------------------

def eval_shingle_set(docs_ds, *, id_col: str = "doc_id",
                     text_col: str = "text", ngram: int = 3) -> np.ndarray:
    """Distinct shingle hashes of an (eval) document set as one sorted
    int64 array.  Per-batch distinct first; the cross-batch union happens
    driver-side over already-deduped arrays (the eval set is a benchmark
    — small by definition; this function is NOT for the train corpus)."""
    from .dedup import batch_shingle_hashes

    def batch_shingles(t: pa.Table) -> pa.Table:
        flat, _ = batch_shingle_hashes(t.column(text_col), ngram)
        return pa.table({"x": pa.array(np.unique(flat))})

    import ray

    tbls = ray.get(
        docs_ds.map_batches(batch_shingles, batch_format="pyarrow")
        .to_arrow_refs())
    parts = [t.column("x").to_numpy() for t in tbls if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def decontaminate(train_ds, eval_hashes: np.ndarray, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  ngram: int = 3):
    """Flag training documents sharing any word-``ngram`` shingle with the
    eval set: (doc_id, n_shingles, n_hits, contaminated).  The eval
    hashes broadcast once; the probe is a per-batch searchsorted."""
    from ..context import Broadcast
    from .dedup import batch_shingle_hashes

    ev_bc = Broadcast(np.sort(eval_hashes.astype(np.int64)))

    def flag(t: pa.Table) -> pa.Table:
        ev = ev_bc.get()
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        n_sh = lens
        if len(flat) and len(ev):
            pos = np.clip(np.searchsorted(ev, flat), 0, len(ev) - 1)
            hit = (ev[pos] == flat).astype(np.int64)
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            n_hit = np.bincount(doc_idx, weights=hit,
                                minlength=len(lens)).astype(np.int64)
        else:
            n_hit = np.zeros(len(lens), dtype=np.int64)
        return pa.table({
            "doc_id": t.column(id_col),
            "n_shingles": pa.array(n_sh),
            "n_hits": pa.array(n_hit),
            "contaminated": pa.array((n_hit > 0).astype(np.int64)),
        })

    return train_ds.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded deterministic shuffle-export
# ---------------------------------------------------------------------------

def shuffle_export(docs_ds, *, seed: int = 41, n_shards: int = 8,
                   id_col: str = "doc_id"):
    """Assign every document a deterministic pseudo-random (shard, pos):
    key = mix64(seed, doc_id) mod 2^63, shard = key mod n_shards, pos =
    rank of (key, doc_id) within the shard.  Equivalent in distribution
    to a seeded global shuffle, but reproducible across runs/cluster
    sizes and resumable per shard — the property a training-data export
    needs that ``random_shuffle`` cannot give."""
    def keyed(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        key = (mix64_vec(seed, ids) % _I63).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "shard": pa.array(key % np.int64(n_shards)),
            "key": pa.array(key),
        })

    def rank_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "doc_id"], ignore_index=True)
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df[["doc_id", "shard", "pos"]]

    return (docs_ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("shard").map_groups(rank_shard, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

def pack_bins(docs_ds, *, bin_tokens: int = 512, n_parts: int = 32,
              id_col: str = "doc_id", text_col: str = "text"):
    """Concat-and-chunk packing (GPT-style pretraining layout): documents
    are laid out in doc_id order, token offsets accumulate globally, and a
    document's context-window bin is ``start_off // bin_tokens``.

    Two passes, no global sort: pass 1 computes per-doc whitespace token
    counts plus per-RANGE sums (ranges are doc_id spans, so in-range
    cumsum in doc_id order equals the global cumsum once each range adds
    the broadcast prefix of the ranges before it).  Output:
    (doc_id, n_tokens, start_off, bin)."""
    from ..context import Broadcast
    from .text import _as_array, _split_flat

    max_id = int(docs_ds.max(id_col))
    span = max(1, (max_id + n_parts) // n_parts)

    def tok_counts(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        col = _as_array(t.column(text_col))
        flat, doc_idx, n = _split_flat(col, r"[ \t\n\r\f\v]+")
        ntok = np.bincount(doc_idx[flat != ""], minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(ntok),
            "part": pa.array(ids // span),
        })

    tok_ds = docs_ds.map_batches(tok_counts, batch_format="pyarrow") \
        .materialize()

    # pass 1b: range sums → exclusive prefix (one row per range — tiny)
    sums = tok_ds.groupby("part").sum("n_tokens").to_pandas() \
        .sort_values("part")
    prefix = np.zeros(n_parts + 1, dtype=np.int64)
    np.add.at(prefix, sums["part"].to_numpy().astype(np.int64) + 1,
              sums["sum(n_tokens)"].to_numpy().astype(np.int64))
    np.cumsum(prefix, out=prefix)
    prefix_bc = Broadcast(prefix)

    def offsets(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", ignore_index=True)
        ntok = df["n_tokens"].to_numpy()
        base = prefix_bc.get()[int(df["part"].iloc[0])]
        start = base + np.concatenate(([0], np.cumsum(ntok)[:-1]))
        out = df[["doc_id", "n_tokens"]].copy()
        out["start_off"] = start
        out["bin"] = start // np.int64(bin_tokens)
        return out

    return tok_ds.groupby("part").map_groups(offsets, batch_format="pandas")


# ---------------------------------------------------------------------------
# Weighted source mixture
# ---------------------------------------------------------------------------

_MIX_SCALE = 1_000_000


def source_mixture(docs_ds, weights: dict[str, float], *, seed: int = 97,
                   id_col: str = "doc_id", source_col: str = "source"):
    """Down/up-weight corpus sources by keep-rate: keep a doc iff
    mix64(seed, doc_id) mod 1e6 < weight(source) × 1e6.  Rates > 1 keep
    everything (epoch-level upsampling is the export loop's job — a row
    filter must stay a filter).  Unlisted sources drop (weight 0)."""
    w_items = sorted(weights.items())
    names = np.asarray([k for k, _ in w_items], dtype=object)
    thresh = np.asarray(
        [min(int(round(v * _MIX_SCALE)), _MIX_SCALE) for _, v in w_items],
        dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        if len(names) == 0:
            return t.filter(pa.array(np.zeros(len(ids), dtype=bool)))
        src = t.column(source_col).to_numpy(zero_copy_only=False)
        draw = (mix64_vec(seed, ids) % np.uint64(_MIX_SCALE)) \
            .astype(np.int64)
        pos_c = np.clip(np.searchsorted(names, src), 0, len(names) - 1)
        mask = (names[pos_c] == src) & (draw < thresh[pos_c])
        return t.filter(pa.array(mask))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Document-frequency vocabulary (top-k tokens)
# ---------------------------------------------------------------------------

def top_tokens(docs_ds, *, k: int = 50, text_col: str = "text"):
    """Top-``k`` tokens by document frequency (ties: token asc) — the
    vocabulary-building / contamination-audit primitive.  Tokens are
    lowercase ``[0-9a-z_]+`` runs (the same class the near-dup stages
    pin).  Per-batch combiner: distinct (doc, token) collapses to one
    (token, df) row per batch before the shuffle."""
    from .text import _as_array, _split_flat

    def partial_df(t: pa.Table) -> pa.Table:
        col = _as_array(t.column(text_col))
        flat, doc_idx, n = _split_flat(pc.utf8_lower(col), "[^0-9a-z_]+")
        ok = flat != ""
        if not ok.any():
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat[ok])
        key = doc_idx[ok] * np.int64(len(uniq)) + codes
        ucodes = np.unique(key) % len(uniq)
        toks, dfc = np.unique(ucodes, return_counts=True)
        return pa.table({"token": pa.array(uniq[toks], pa.string()),
                         "df": pa.array(dfc.astype(np.int64))})

    agg = docs_ds.map_batches(partial_df, batch_format="pyarrow") \
        .groupby("token").sum("df")
    # distributed top-k: sort + limit streams; only k rows land driver-side
    df = agg.sort(["sum(df)", "token"], descending=[True, False]) \
        .limit(k).to_pandas().rename(columns={"sum(df)": "df"})
    return df.astype({"df": np.int64}).reset_index(drop=True)


def heaps_curve(docs_ds, *, id_col: str = "doc_id",
                text_col: str = "text") -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: per doc (in ``id_col`` order)
    the number of word occurrences, the number of NEW types (words whose
    first-occurrence doc this is), and the running totals — the
    dedup-health / tokenizer-sizing diagnostic of a corpus build.

    Distributed shape (all-integer, zero float risk):

      * ONE tagged combiner pass over the corpus emits per batch the
        distinct tokens with their min in-batch doc (``t␞token`` rows)
        plus one ``d␞doc`` row per document carrying its word count —
        then ONE ``groupby(key).min(val)`` resolves global first
        occurrences (doc rows are unique keys, so min is the identity).
      * A second vocab-sized pass folds token rows into per-doc
        ``new_types`` partials and re-keys doc rows; one tiny groupby
        sums them.
      * The prefix sums over doc order are computed on the collected
        (n_docs-row) curve here; at corpus scale swap in the two-pass
        range-prefix cumsum of :func:`pack_bins` (partition by doc-id
        range, cumsum of per-partition totals broadcast back).

    Tokens are lowercase ``[0-9a-z_]+`` runs (the near-dup word class).
    """
    from ray.data.aggregate import Min, Sum

    from .classify import _doc_words

    def tagged(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        flat, doc_idx, n = _doc_words(t.column(text_col))
        keys, vals = [], []
        if len(flat):
            codes, uniq = pd.factorize(flat)
            key = doc_idx * np.int64(len(uniq)) + codes
            ukey = np.unique(key)
            tok_loc = (ukey % len(uniq)).astype(np.int64)
            doc_loc = (ukey // len(uniq)).astype(np.int64)
            # min in-batch doc per distinct token
            order = np.lexsort((ids[doc_loc], tok_loc))
            tl, dl = tok_loc[order], ids[doc_loc][order]
            first = np.ones(len(tl), dtype=bool)
            first[1:] = tl[1:] != tl[:-1]
            keys.append(np.char.add("t\x1e",
                                    uniq[tl[first]].astype(str)))
            vals.append(dl[first])
        nw = np.bincount(doc_idx, minlength=n).astype(np.int64) \
            if len(flat) else np.zeros(n, np.int64)
        keys.append(np.char.add("d\x1e", ids.astype(str)))
        vals.append(nw)
        return pa.table({
            "key": pa.array(np.concatenate(keys), pa.string()),
            "val": pa.array(np.concatenate(vals).astype(np.int64))})

    resolved = (docs_ds.map_batches(tagged, batch_format="pyarrow")
                .groupby("key").aggregate(Min("val", alias_name="val")))

    def fold(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_numpy(zero_copy_only=False).astype(str)
        vals = t.column("val").to_numpy().astype(np.int64)
        is_tok = np.char.startswith(keys, "t\x1e")
        doc_of_tok = vals[is_tok]                       # first-occurrence doc
        d_ids = np.asarray([k[2:] for k in keys[~is_tok]], dtype=np.int64)
        out_id = np.concatenate([doc_of_tok, d_ids])
        out_nt = np.concatenate([np.ones(is_tok.sum(), np.int64),
                                 np.zeros(len(d_ids), np.int64)])
        out_nw = np.concatenate([np.zeros(is_tok.sum(), np.int64),
                                 vals[~is_tok]])
        return pa.table({"doc_id": pa.array(out_id),
                         "new_types": pa.array(out_nt),
                         "n_words": pa.array(out_nw)})

    agg = (resolved.map_batches(fold, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("n_words", alias_name="n_words"),
                      Sum("new_types", alias_name="new_types"))
           .to_pandas())
    agg = agg.sort_values("doc_id").reset_index(drop=True)
    out = pd.DataFrame({
        "doc_id": agg["doc_id"].to_numpy().astype(np.int64),
        "n_words": agg["n_words"].to_numpy().astype(np.int64),
        "new_types": agg["new_types"].to_numpy().astype(np.int64)})
    out["cum_words"] = out["n_words"].cumsum().astype(np.int64)
    out["cum_types"] = out["new_types"].cumsum().astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Resumable shuffled export (shuffle_export → hash_join payload →
# per-shard atomic parquet + manifest)
# ---------------------------------------------------------------------------

def export_shuffled(docs_ds, out_dir: str, *, seed: int = 41,
                    n_shards: int = 8, id_col: str = "doc_id",
                    fingerprint: str | None = None,
                    fail_after_shards: int | None = None) -> dict:
    """Write the corpus as ``n_shards`` pseudo-shuffled parquet shards
    (rows ordered by the seeded shuffle position), each committed with an
    atomic manifest row — the training-data export that a killed run
    resumes without losing or duplicating rows.

    The payload joins the (doc_id, shard, pos) assignment via one
    streaming hash join; the joined Dataset materializes to the OBJECT
    STORE once, so the per-shard filter passes never recompute the input.
    Shard size is the resumability granularity: pick ``n_shards`` so one
    shard ≈ one output file.  ``fingerprint`` defaults to a cheap
    (seed, n_shards, row-count) tag; pass a content checksum when input
    rows can change without changing the count.
    """
    import pyarrow.compute as pc

    from ..functions.joins import hash_join
    from ..state import manifest as mf

    docs_ds = docs_ds.materialize()
    if fingerprint is None:
        fingerprint = f"shuffle:{seed}:{n_shards}:{docs_ds.count()}"
    shards = {sid: f"{fingerprint}|shard{sid}" for sid in range(n_shards)}
    todo = mf.resume_shards(out_dir, shards)
    done_before = n_shards - len(todo)
    if not todo:
        return {"shards_total": n_shards, "shards_skipped": done_before,
                "shards_processed": 0}

    assign = shuffle_export(docs_ds, seed=seed, n_shards=n_shards,
                            id_col=id_col)
    joined = hash_join(assign, docs_ds, on=id_col).materialize()

    processed = 0
    for sid in todo:
        if fail_after_shards is not None and processed >= fail_after_shards:
            raise RuntimeError(f"injected failure after {processed} shards")
        t0 = mf.now()
        import ray

        part = joined.map_batches(
            lambda t, s=sid: t.filter(pc.equal(t.column("shard"), s)),
            batch_format="pyarrow")
        tbls = ray.get(part.to_arrow_refs())
        tbl = pa.concat_tables([t for t in tbls if t.num_rows] or tbls[:1])
        order = np.argsort(tbl.column("pos").to_numpy(), kind="stable")
        tbl = tbl.take(pa.array(order)).drop_columns(["shard"])
        rows = mf.write_shard_parquet(tbl, out_dir, sid)
        mf.commit_shard(out_dir, mf.ShardRecord(
            shard_id=sid,
            input_fingerprint=shards[sid],
            rows_in=int(tbl.num_rows),
            rows_out=rows,
            counters={"seed": seed},
            wall_sec=mf.now() - t0,
            finished_at=mf.now(),
        ))
        processed += 1
    return {"shards_total": n_shards, "shards_skipped": done_before,
            "shards_processed": processed}


# ---------------------------------------------------------------------------
# Composed cleaning pipeline (C4-style): dedup + quality + repetition +
# source mixture, per-rule flags
# ---------------------------------------------------------------------------

def clean_corpus(docs_ds, weights: dict[str, float], *, mix_seed: int = 97,
                 min_tokens: int = 25, max_tokens: int = 80,
                 max_dup_word_frac: float = 0.65,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source"):
    """The composed corpus-cleaning pass every pretraining pipeline runs:
    per-document rule flags (exact-dup winner, token-count band, word
    repetition, seeded source mixture) and the final AND.

    One streaming flag pass (reusing the tested quality/repetition
    kernels), one groupby over (content_hash, doc_id) SIGNATURE rows for
    the dedup winner, one hash join to attach it — no broadcast of
    corpus-sized state, no per-text map_groups.  Returns
    (doc_id, keep_dedup, keep_quality, keep_repetition, keep_mixture,
    keep).
    """
    from ray.data.aggregate import Min

    from ..functions.joins import hash_join
    from .dedup import stable_hash64
    from .text import quality_batch, repetition_batch

    w_items = sorted(weights.items())
    names = np.asarray([k for k, _ in w_items], dtype=object)
    thresh = np.asarray(
        [min(int(round(v * _MIX_SCALE)), _MIX_SCALE) for _, v in w_items],
        dtype=np.int64)

    def flags(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        q = quality_batch(t, id_col=id_col, text_col=text_col)
        r = repetition_batch(t, id_col=id_col, text_col=text_col)
        n_tok = q.column("n_tokens").to_numpy()
        dupf = r.column("dup_word_frac").to_numpy()
        keep_q = (n_tok >= min_tokens) & (n_tok <= max_tokens)
        keep_r = dupf <= max_dup_word_frac
        if len(names):
            src = t.column(source_col).to_numpy(zero_copy_only=False)
            draw = (mix64_vec(mix_seed, ids)
                    % np.uint64(_MIX_SCALE)).astype(np.int64)
            pos = np.clip(np.searchsorted(names, src), 0, len(names) - 1)
            keep_m = (names[pos] == src) & (draw < thresh[pos])
        else:
            keep_m = np.zeros(len(ids), dtype=bool)
        ch = np.fromiter(
            (stable_hash64(x) for x in t.column(text_col).to_pylist()),
            dtype=np.uint64, count=len(ids)).view(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "content_hash": pa.array(ch),
            "keep_quality": pa.array(keep_q.astype(np.int64)),
            "keep_repetition": pa.array(keep_r.astype(np.int64)),
            "keep_mixture": pa.array(keep_m.astype(np.int64)),
        })

    flags_ds = docs_ds.map_batches(flags, batch_format="pyarrow") \
        .materialize()
    winners = flags_ds.groupby("content_hash") \
        .aggregate(Min("doc_id", alias_name="keep_id"))
    joined = hash_join(flags_ds, winners, on="content_hash")

    def finish(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep_d = (ids == t.column("keep_id").to_numpy()).astype(np.int64)
        kq = t.column("keep_quality").to_numpy()
        kr = t.column("keep_repetition").to_numpy()
        km = t.column("keep_mixture").to_numpy()
        return pa.table({
            "doc_id": pa.array(ids),
            "keep_dedup": pa.array(keep_d),
            "keep_quality": pa.array(kq),
            "keep_repetition": pa.array(kr),
            "keep_mixture": pa.array(km),
            "keep": pa.array(keep_d & kq & kr & km),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# --- corpus-global line-level dedup (C4/RefinedWeb-style) ------------------

_LN_SHIFT = 20  # line-number budget per doc: 2^20 lines


def line_dedup(docs_ds, *, id_col: str = "doc_id", text_col: str = "text",
               sep: str = "\n", min_line_len: int = 1,
               n_buckets: int = 64, n_part: int | None = None):
    """Remove every LATER occurrence of a duplicated line corpus-wide and
    rebuild each document from its kept lines (C4 / RefinedWeb line
    dedup).  A line survives only at its first occurrence — the owner is
    min(doc_id << 20 | line_no); lines shorter than ``min_line_len``
    (blank separators) bypass dedup and are always kept.

    Shape (what moves at 100 TB): explode → (line, packed-position) rows
    with a per-batch combiner (one candidate row per distinct in-batch
    line) → groupby(line).min(packed) builds the winners table → the
    exploded rows hash-join the winners on a 64-bit line hash (string
    equality re-checked after the join, so collisions cannot misdedup)
    → rows whose packed == winner survive → per-doc-bucket rebuild.
    Line TEXT crosses the wire once into the winners groupby and once in
    the join; documents themselves are never shuffled.  Keys are exact
    line strings (mirrored in SQL); at larger scale the winners shuffle
    can key on the hash alone — same shape, collision-tolerant.

    Returns Dataset (id_col, text_kept) covering EVERY input doc (empty
    string when all its lines lost) — a zero-line sentinel row per doc
    carries doc identity through the join.
    """
    from ..context import num_cpus
    from ..functions.joins import hash_join
    from .dedup import stable_hash64
    from .text import _as_array

    n_part = n_part or min(256, max(32, num_cpus() * 4))

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        col = _as_array(t.column(text_col))
        split = pc.split_pattern(col, pattern=sep)
        offs = split.offsets.to_numpy()
        counts = np.diff(offs).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        ln = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            offs[:-1].astype(np.int64), counts)
        flat = split.flatten()
        doc = ids[doc_idx]
        # sentinel row per doc (ln = -1): keeps all-lines-lost docs present
        sdoc = ids
        out_doc = np.concatenate([doc, sdoc])
        out_ln = np.concatenate([ln, np.full(len(sdoc), -1, dtype=np.int64)])
        lines_arr = pa.concat_arrays(
            [flat.cast(pa.string()),
             pa.array([""] * len(sdoc), pa.string())])
        packed = (out_doc << _LN_SHIFT) | (out_ln & ((1 << _LN_SHIFT) - 1))
        packed[out_ln < 0] = -1
        return pa.table({
            "line": lines_arr,
            "doc": pa.array(out_doc),
            "ln": pa.array(out_ln),
            "packed": pa.array(packed),
        })

    lines = docs_ds.map_batches(explode, batch_format="pyarrow")

    def batch_min(t: pa.Table) -> pa.Table:
        # combiner: one (line, min packed) candidate per in-batch line
        ok = pc.and_(pc.greater_equal(pc.utf8_length(t.column("line")),
                                      pa.scalar(min_line_len)),
                     pc.greater_equal(t.column("ln"), pa.scalar(0)))
        d = t.filter(ok).select(["line", "packed"])
        return d.group_by("line").aggregate([("packed", "min")]) \
            .rename_columns(["line", "packed"])

    winners = lines.map_batches(batch_min, batch_format="pyarrow") \
        .groupby("line").min("packed")

    def add_lh(t: pa.Table) -> pa.Table:
        h = np.fromiter((stable_hash64(x) for x in
                         t.column("line").to_pylist()),
                        dtype=np.uint64, count=t.num_rows)
        return t.append_column("lh", pa.array(h.view(np.int64)))

    wtag = winners.map_batches(
        lambda t: add_lh(pa.table({"line": t.column("line"),
                                   "wpacked": t.column("min(packed)")})),
        batch_format="pyarrow")

    dedupable = lines.map_batches(
        lambda t: add_lh(t.filter(pc.and_(
            pc.greater_equal(pc.utf8_length(t.column("line")),
                             pa.scalar(min_line_len)),
            pc.greater_equal(t.column("ln"), pa.scalar(0))))),
        batch_format="pyarrow")
    bypass = lines.map_batches(
        lambda t: t.filter(pc.or_(
            pc.less(pc.utf8_length(t.column("line")),
                    pa.scalar(min_line_len)),
            pc.less(t.column("ln"), pa.scalar(0)))),
        batch_format="pyarrow")

    joined = hash_join(dedupable, wtag, on="lh", n_buckets=n_buckets)

    def keep_winners(t: pa.Table) -> pa.Table:
        # string equality re-check (collisions) + first-occurrence test
        keep = pc.and_(pc.equal(t.column("line_l"), t.column("line_r")),
                       pc.equal(t.column("packed"), t.column("wpacked")))
        k = t.filter(keep)
        return pa.table({"line": k.column("line_l"), "doc": k.column("doc"),
                         "ln": k.column("ln")})

    kept = joined.map_batches(keep_winners, batch_format="pyarrow") \
        .union(bypass.map_batches(
            lambda t: t.select(["line", "doc", "ln"]),
            batch_format="pyarrow"))

    def add_part(t: pa.Table) -> pa.Table:
        doc = t.column("doc").to_numpy().astype(np.int64)
        return t.append_column(
            "part", pa.array((doc % n_part).astype(np.int32)))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "ln"])
        body = g[g["ln"] >= 0]
        txt = body.groupby("doc", sort=True)["line"].agg(sep.join)
        all_docs = pd.Index(g["doc"].unique()).sort_values()
        out = txt.reindex(all_docs, fill_value="")
        return pd.DataFrame({id_col: out.index.to_numpy(np.int64),
                             "text_kept": out.to_numpy()})

    return kept.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(rebuild, batch_format="pandas")


def stratified_sample(ds, *, n_per_group: int, group_col: str,
                      key_cols: list[str], seed: int = 628):
    """Per-group seeded quota sample: for each distinct ``group_col``
    value keep the ``n_per_group`` rows with the smallest
    (mix64(seed, 7, *key_cols), *key_cols) rank — the balanced-mixture
    primitive (equal docs per language/source regardless of corpus skew).

    Same shape as ``deterministic_sample``: per-batch partial top-q PER
    GROUP (top-q selection is associative, so merged per-batch winners
    contain the global winners), then one tiny final cut.  Hash-rank
    selection ⇒ no RNG state, order-independent, SQL-mirrorable
    (row_number() OVER (PARTITION BY group ORDER BY mix64, keys) ≤ q).
    Shuffle-free: the merge payload is ≤ q × |groups| per block.
    """
    from ..sources.pages import mix64_vec

    def topq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        keys = [t.column(c).to_numpy() for c in key_cols]
        h = mix64_vec(seed, 7, *keys).astype(np.uint64)
        codes = np.unique(g, return_inverse=True)[1]
        order = np.lexsort(tuple(reversed(keys)) + (h, codes))
        gs = codes[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.maximum.accumulate(
            np.where(first, np.arange(len(gs)), 0))
        keep = order[np.arange(len(gs)) - start < n_per_group]
        return t.take(pa.array(np.sort(keep)))

    return (ds.map_batches(topq, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topq, batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------------------
# Cross-document duplicated-ngram fraction (Lee et al. 2022-style signal)
def remove_boilerplate(docs_ds, *, id_col: str = "doc_id",
                       text_col: str = "text", sep: str = "\n",
                       k_docs: int = 3, min_line_len: int = 5):
    """Boilerplate-line removal (the jusText/trafilatura-family rule):
    a line appearing in ≥ ``k_docs`` DISTINCT documents is template
    chrome (footer, cookie banner, nav) and is dropped from EVERY
    document — unlike :func:`line_dedup`, no first occurrence survives.
    Lines shorter than ``min_line_len`` chars bypass (blank separators
    and stubs are content structure, not boilerplate).

    Shape: one explode pass emits per-batch DISTINCT (line, doc) pairs
    (the docs_top_tokens combiner); one groupby counts distinct docs
    per line; the surviving frequent-line table is the BOILERPLATE
    DICTIONARY — threshold-bounded and heavy-tail small, so it rides a
    single broadcast (the docs_decontaminate shape) and the drop +
    rebuild is a stateless per-batch pass: split, vectorized
    hash-probe + string re-check (collisions cannot misdrop), one
    ``binary_join`` rebuild.  Documents never shuffle.

    Returns Dataset (id_col, n_lines, n_dropped, text_clean)."""
    from ..context import Broadcast
    from .dedup import stable_hash64
    from .text import _as_array

    def pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        split = pc.split_pattern(_as_array(t.column(text_col)),
                                 pattern=sep)
        counts = np.diff(split.offsets.to_numpy()).astype(np.int64)
        doc = np.repeat(ids, counts)
        flat = split.flatten().cast(pa.string())
        ok = pc.greater_equal(pc.utf8_length(flat),
                              pa.scalar(min_line_len)) \
            .to_numpy(zero_copy_only=False)
        d = pa.table({"line": flat.filter(pa.array(ok)),
                      "doc": pa.array(doc[ok])})
        return d.group_by(["line", "doc"]).aggregate([]) \
            .group_by("line").aggregate([("doc", "count_distinct")]) \
            .rename_columns(["line", "nd"])

    freq = (docs_ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("line").sum("nd").to_pandas())
    freq = freq[freq["sum(nd)"] >= k_docs]
    lines = freq["line"].to_numpy(dtype=object)
    hs = np.fromiter((stable_hash64(x) for x in lines),
                     dtype=np.uint64, count=len(lines)).view(np.int64)
    order = np.argsort(hs, kind="stable")
    bc = Broadcast((hs[order], lines[order]))

    def clean(t: pa.Table) -> pa.Table:
        bh, bl = bc.get()
        ids = t.column(id_col).to_numpy().astype(np.int64)
        split = pc.split_pattern(_as_array(t.column(text_col)),
                                 pattern=sep)
        offs = split.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        flat = split.flatten().cast(pa.string())
        fl = flat.to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        drop = np.zeros(len(fl), dtype=bool)
        cand = lens >= min_line_len
        if cand.any() and len(bh):
            ch = np.fromiter((stable_hash64(x) for x in fl[cand]),
                             dtype=np.uint64,
                             count=int(cand.sum())).view(np.int64)
            pos = np.clip(np.searchsorted(bh, ch), 0, len(bh) - 1)
            hit = (bh[pos] == ch) & (bl[pos] == fl[cand])
            drop[np.where(cand)[0][hit]] = True
        keep = ~drop
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        new_counts = np.bincount(doc_idx[keep],
                                 minlength=len(counts)).astype(np.int64)
        kept_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate(
                ([0], np.cumsum(new_counts))).astype(np.int32)),
            flat.filter(pa.array(keep)))
        return pa.table({
            id_col: pa.array(ids),
            "n_lines": pa.array(counts.astype(np.int64)),
            "n_dropped": pa.array(
                counts.astype(np.int64) - new_counts),
            "text_clean": pc.binary_join(
                kept_list, pa.scalar(sep)).cast(pa.string())})

    return docs_ds.map_batches(clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------

def dup_ngram_fraction(docs_ds, *, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 3,
                       min_count: int = 2, flag_threshold: float = 0.5,
                       n_buckets: int = 64):
    """Per-document fraction of its DISTINCT word-``ngram`` shingles that
    occur in ≥ ``min_count`` distinct documents corpus-wide — the
    "duplicated n-gram" signal of *Deduplicating Training Data Makes
    Language Models Better* (Lee et al., ACL 2022), reduced to a per-doc
    statistic + keep flag instead of span surgery.

    Scale shape: the corpus never moves — only (doc_id, shingle-hash)
    int rows do.  Shuffle 1 partitions the pair rows by a shingle-hash
    bucket, so each partition holds EVERY occurrence of its shingles and
    a local value_count is the global document frequency; the partition
    emits one (doc_id, n, n_dup) partial per document it saw.  Shuffle 2
    is a tiny groupby-sum over those partials (≤ |docs| × |buckets|
    rows).  Documents too short to shingle yield no pair rows — callers
    needing them must left-join against the doc table (the driver query
    does).

    Output: (doc_id, n_shingles, n_dup, dup_fraction, flagged).
    """
    from .dedup import batch_shingle_hashes

    def pair_rows(t: pa.Table) -> pa.Table:
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens)),
            "x": pa.array(flat),
            "bucket": pa.array(flat % np.int64(n_buckets)),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # (doc_id, x) rows are distinct per doc by construction, so the
        # per-x row count IS the number of distinct docs containing x
        df_cnt = df["x"].map(df["x"].value_counts())
        dup = (df_cnt.to_numpy() >= min_count).astype(np.int64)
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                          "n": np.int64(1), "n_dup": dup}) \
            .groupby("doc_id", sort=False).sum().reset_index()
        return g

    part = (docs_ds.map_batches(pair_rows, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))
    agg = part.groupby("doc_id").sum(["n", "n_dup"])

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("sum(n)").to_numpy().astype(np.int64)
        nd = t.column("sum(n_dup)").to_numpy().astype(np.int64)
        frac = half_up(np.where(n > 0, nd / np.maximum(n, 1), 0.0), 6)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_shingles": pa.array(n),
            "n_dup": pa.array(nd),
            "dup_fraction": pa.array(frac),
            "flagged": pa.array((frac >= flag_threshold).astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Domain-level aggregation + quality gating (per-source stats)
# ---------------------------------------------------------------------------

def domain_stats(docs_ds, *, source_col: str = "source",
                 text_col: str = "text", min_docs: int = 5,
                 min_stop_ratio: float = 0.05):
    """Per-domain corpus statistics + a keep gate (the classic
    domain-blocklist construction: drop whole sources whose aggregate
    quality is low, instead of scoring every document independently).

    Scale shape: per-batch partial sums keyed by source (the combiner —
    each batch emits ≤ |sources seen| rows), then one groupby-sum whose
    input is already collapsed; the domain table is small by definition.

    Output: (source, n_docs, sum_chars, sum_tokens, stop_ratio, keep)
    with stop_ratio = Σstop_cnt / Σn_tokens rounded to 6 dp.
    """
    from .text import quality_batch

    def partial(t: pa.Table) -> pd.DataFrame:
        q = quality_batch(t, id_col=source_col, text_col=text_col) \
            .to_pandas()
        g = q.groupby("doc_id", sort=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"),
            sum_tokens=("n_tokens", "sum"), sum_stop=("stop_cnt", "sum"),
        ).reset_index().rename(columns={"doc_id": "source"})
        return g

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .sum(["n_docs", "sum_chars", "sum_tokens", "sum_stop"]))

    def finish(t: pa.Table) -> pa.Table:
        nd = t.column("sum(n_docs)").to_numpy().astype(np.int64)
        sc = t.column("sum(sum_chars)").to_numpy().astype(np.int64)
        st = t.column("sum(sum_tokens)").to_numpy().astype(np.int64)
        ss = t.column("sum(sum_stop)").to_numpy().astype(np.int64)
        ratio = half_up(
            np.where(st > 0, ss / np.maximum(st, 1), 0.0), 6)
        keep = ((nd >= min_docs) & (ratio >= min_stop_ratio)) \
            .astype(np.int64)
        return pa.table({
            "source": t.column("source"),
            "n_docs": pa.array(nd),
            "sum_chars": pa.array(sc),
            "sum_tokens": pa.array(st),
            "stop_ratio": pa.array(ratio),
            "keep": pa.array(keep),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact duplicated-substring removal (span surgery)
# ---------------------------------------------------------------------------

DUP_SPAN_SEED = 73


def _window_hashes(col, ngram: int):
    """Positional word-``ngram`` hashes over whitespace tokens.

    Returns (flat original-case tokens, doc index per token, n_docs,
    window-start flat indices, int64 window hashes) — hash =
    mix64(DUP_SPAN_SEED, fp(lower(w_i)), ..., fp(lower(w_{i+n-1}))),
    emitted as the int64 two's-complement view (uint64 > 2^63 keys fall
    back to pickled-object blocks in a Ray groupby — CLAUDE.md).
    Vectorized: one Arrow split + lower, fp per UNIQUE lowercase token
    (memoized), one broadcast mix64 over slice views.
    """
    from .dedup import word_fp
    from .text import _as_array, _split_flat

    flat, didx, n = _split_flat(_as_array(col), r"[ \t\n\r\f\v]+")
    keep = flat != ""
    flat, didx = flat[keep], didx[keep]
    if len(flat) < ngram:
        return flat, didx, n, np.empty(0, np.int64), np.empty(0, np.int64)
    low = pc.utf8_lower(pa.array(flat)).to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(low)
    ufp = np.fromiter((word_fp(w) for w in uniq), dtype=np.uint64,
                      count=len(uniq))
    fps = ufp[codes]
    m = len(fps) - (ngram - 1)
    valid = didx[:m] == didx[ngram - 1:]
    h = mix64_vec(DUP_SPAN_SEED,
                  *[fps[j:m + j] for j in range(ngram)])[valid]
    starts = np.nonzero(valid)[0]
    return flat, didx, n, starts, h.view(np.int64)


def remove_dup_spans(docs_ds, *, id_col: str = "doc_id",
                     text_col: str = "text", ngram: int = 3,
                     min_count: int = 2, n_buckets: int = 64,
                     concurrency=None):
    """Exact duplicated-substring REMOVAL — the span-surgery operator of
    *Deduplicating Training Data Makes Language Models Better* (Lee et
    al., ACL 2022): every token covered by a word-``ngram`` window whose
    case-insensitive hash occurs in ≥ ``min_count`` DISTINCT documents
    corpus-wide is dropped; the cleaned text is the kept tokens joined
    by single spaces.  (``dup_ngram_fraction`` is the per-doc statistic;
    this emits the surgically cleaned corpus.)

    Scale shape: pass 1 ships only distinct (doc_id, hash) int rows,
    bucketed by hash so one partition sees every occurrence (the
    ``dup_ngram_fraction`` shuffle); the resulting duplicated-hash set
    (dup n-grams only — a small fraction of the shingle space by Zipf)
    broadcasts once.  Pass 2 is stateless and vectorized: membership by
    one searchsorted, cover mask by ``ngram`` shifted scatter-ORs, text
    rebuilt with ONE ``pc.binary_join`` per batch (no per-doc loop).  If
    the dup set ever outgrew a broadcast, pass 2 becomes a hash-join of
    the window rows against it (the line-dedup shape) — same semantics.

    Output: (id_col, n_tokens, n_kept, text_clean).
    """
    from ..context import Broadcast, auto_pool

    def pair_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        _, didx, _, starts, h = _window_hashes(t.column(text_col), ngram)
        doc = ids[didx[starts]] if len(starts) else np.empty(0, np.int64)
        # distinct (doc, h) per batch — the DF combiner
        if len(h):
            key = pd.MultiIndex.from_arrays([doc, h])
            keep = ~key.duplicated()
            doc, h = doc[keep], h[keep]
        return pa.table({
            "doc_id": pa.array(doc),
            "h": pa.array(h),
            "bucket": pa.array(h % np.int64(n_buckets)),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dd = df[["doc_id", "h"]].drop_duplicates()
        vc = dd["h"].value_counts()
        return pd.DataFrame({"h": vc[vc >= min_count].index.to_numpy()})

    dup_df = (docs_ds.map_batches(pair_rows, batch_format="pyarrow")
              .groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")
              .to_pandas())
    dup_bc = Broadcast(np.sort(dup_df["h"].to_numpy().astype(np.int64)))

    class SpanCleaner:
        def __init__(self, dup):
            self.dup = dup.get()

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, didx, n, starts, h = _window_hashes(
                batch.column(text_col), ngram)
            cover = np.zeros(len(flat), dtype=bool)
            if len(h) and len(self.dup):
                pos = np.clip(np.searchsorted(self.dup, h), 0,
                              len(self.dup) - 1)
                hit_starts = starts[self.dup[pos] == h]
                for j in range(ngram):
                    cover[hit_starts + j] = True
            kept = ~cover
            n_tok = np.bincount(didx, minlength=n).astype(np.int64)
            n_kept = np.bincount(didx[kept], minlength=n).astype(np.int64)
            offs = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(n_kept, out=offs[1:])
            la = pa.ListArray.from_arrays(
                pa.array(offs), pa.array(flat[kept], pa.string()))
            return pa.table({
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok),
                "n_kept": pa.array(n_kept),
                "text_clean": pc.binary_join(la, " "),
            })

    return docs_ds.map_batches(
        SpanCleaner, fn_constructor_kwargs={"dup": dup_bc},
        batch_format="pyarrow", concurrency=concurrency or auto_pool(),
    )


# ---------------------------------------------------------------------------
# Seeded weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_SEED = 173


def weighted_sample(docs_ds, *, n: int, weight_col: str = "n_chars",
                    id_col: str = "doc_id",
                    seed: int = WEIGHTED_SAMPLE_SEED) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows,
    inclusion probability ∝ ``weight_col`` — the exponential-race form
    of Efraimidis & Spirakis (2006): key = -ln(u)/w with
    u = (mix64(seed, id) >> 11 + 1) / 2^53, keep the n SMALLEST keys.

    Per-batch partial bottom-n → driver merge of ≤ n rows per block;
    nothing else leaves the workers.  Keys are ranked 9-dp-rounded so
    the SQL mirror (same mix64 chain, same ln) selects identical rows.
    """
    two53 = float(1 << 53)

    def partial(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        w = np.asarray(t.column(weight_col), dtype=np.float64)
        w = np.maximum(w, 1.0)
        u = ((mix64_vec(seed, ids) >> np.uint64(11)).astype(np.float64)
             + 1.0) / two53
        key = np.round(-np.log(u) / w, 9)
        order = np.lexsort((ids, key))[:n]
        return pa.table({id_col: pa.array(ids[order]),
                         weight_col: t.column(weight_col).take(
                             pa.array(order)),
                         "key": pa.array(key[order], pa.float64())})

    parts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    out = parts.sort_values(["key", id_col]).head(n)
    return out.astype({id_col: np.int64}).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) sub-document dedup
# ---------------------------------------------------------------------------

def cdc_dedup(docs_ds, *, id_col: str = "doc_id", text_col: str = "text",
              ngram: int = 3, mod: int = 8, min_occ: int = 2):
    """Content-defined chunking dedup — the Rabin/LBFS boundary rule
    (Muthitacharoen et al., SOSP 2001) lifted to word windows: a chunk
    boundary falls AFTER token p whenever the ``ngram``-token rolling
    hash starting at p satisfies ``hash % mod == 0``, so chunk edges
    are content-anchored and survive insertions/deletions (where
    fixed-size blocks would shift every downstream chunk).  Emits the
    duplicated chunks: (chunk_md5, n_tokens, n_docs, n_occ ≥ min_occ).

    Per-batch kernel end-to-end (a doc's tokens never leave its batch):
    the positional window hashes of `_window_hashes` (seed 73, the
    dup-span machinery) → boundary flags → per-doc cumulative chunk id
    → md5 over the lowercase-token join.  Only (md5, doc, occ)
    signature rows shuffle through ONE groupby; at 100 TB the md5 key
    space is uniform so no salt is needed.  The md5 loop per chunk is
    linear in text size — the same cost class as any content hash.
    """
    import hashlib

    from ray.data.aggregate import Count, Max, Sum

    def chunks(t: pa.Table) -> pa.Table:
        flat, didx, _n, starts, h = _window_hashes(t.column(text_col),
                                                   ngram)
        ids = t.column(id_col).to_numpy()
        if len(flat) == 0:
            return pa.table({"chunk_md5": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "occ": pa.array([], pa.int64())})
        low = pc.utf8_lower(pa.array(flat)).to_numpy(zero_copy_only=False)
        bflag = np.zeros(len(flat), dtype=np.int64)
        bnd = starts[(h.view(np.uint64) % mod) == 0]
        bflag[bnd] = 1
        # chunk id = #boundaries strictly before the token, per doc
        cs = np.cumsum(np.r_[0, bflag[:-1]])
        doc_start = np.r_[0, np.flatnonzero(didx[1:] != didx[:-1]) + 1]
        base = np.zeros(len(flat), dtype=np.int64)
        base[doc_start] = cs[doc_start]
        np.maximum.accumulate(base, out=base)
        chunk = cs - base
        # segment boundaries of (doc, chunk)
        seg = np.r_[True, (didx[1:] != didx[:-1]) | (chunk[1:] != chunk[:-1])]
        seg_start = np.flatnonzero(seg)
        seg_end = np.r_[seg_start[1:], len(flat)]
        md5s, ntok, docs = [], [], []
        for s, epos in zip(seg_start.tolist(), seg_end.tolist()):
            txt = " ".join(low[s:epos])
            md5s.append(hashlib.md5(txt.encode()).hexdigest())
            ntok.append(epos - s)
            docs.append(int(ids[didx[s]]))
        df = pd.DataFrame({"chunk_md5": md5s, "n_tokens": ntok,
                           "doc_id": docs})
        # in-batch combiner: occurrences per (doc, chunk)
        df = df.groupby(["chunk_md5", "n_tokens", "doc_id"],
                        as_index=False).size().rename(columns={"size": "occ"})
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (docs_ds.map_batches(chunks, batch_format="pyarrow")
           .groupby("chunk_md5")
           .aggregate(Max("n_tokens", alias_name="n_tokens"),
                      Count(alias_name="n_docs"),
                      Sum("occ", alias_name="n_occ")))

    def flt(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("n_occ"), min_occ)
        return t.filter(keep)

    return agg.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Overlapping context windows (LLM training-sample prep)
# ---------------------------------------------------------------------------

def chunk_windows(docs_ds, *, win: int = 64, stride: int = 48,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Split every document into overlapping fixed-token context windows
    (the sample-prep step that turns a cleaned corpus into training
    sequences).  Tokens are the single-space split of ``text`` (empties
    kept — the SQL twin's ``string_split``); chunk ``k`` of an n-token
    doc covers tokens ``[k·stride, min(k·stride+win, n))`` for
    ``k = 0 .. ceil(max(n−win, 0)/stride)`` — the last window always
    reaches the end of the doc, no degenerate tail windows.

    Fully vectorized flat_map: one Arrow split per batch, window
    boundaries by integer arithmetic, tokens re-gathered with ONE
    ``pc.take`` + ``ListArray`` + ``binary_join`` — zero per-row Python.
    Streams at corpus scale (output ≈ win/stride × input tokens, each
    batch independent)."""
    import pyarrow.compute as pc

    from .text import _as_array

    def emit(t: pa.Table) -> pa.Table:
        col = _as_array(t.column(text_col))
        ids = t.column(id_col).to_numpy().astype(np.int64)
        split = pc.split_pattern(col, pattern=" ")
        offs = split.offsets.to_numpy().astype(np.int64)
        nw = np.diff(offs)
        extra = np.maximum(nw - win, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        tot = int(n_chunks.sum())
        cdoc = np.repeat(np.arange(len(nw), dtype=np.int64), n_chunks)
        first = np.zeros(len(nw), np.int64)
        first[1:] = np.cumsum(n_chunks)[:-1]
        k = np.arange(tot, dtype=np.int64) - first[cdoc]
        start = k * stride
        end = np.minimum(start + win, nw[cdoc])
        lens = end - start
        goffs = np.zeros(tot + 1, np.int64)
        goffs[1:] = np.cumsum(lens)
        idx = (np.arange(goffs[-1], dtype=np.int64)
               - np.repeat(goffs[:-1], lens)
               + np.repeat(offs[cdoc] + start, lens))
        toks = pc.take(split.values, pa.array(idx))
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(goffs, pa.int32()), toks),
            " ")
        return pa.table({"doc_id": pa.array(ids[cdoc]),
                         "chunk_id": pa.array(k),
                         "start": pa.array(start),
                         "n_tokens": pa.array(lens),
                         "chunk_text": chunk_text})

    return docs_ds.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the at-scale membership variant)
# ---------------------------------------------------------------------------

def bloom_decontaminate(train_ds, eval_hashes: np.ndarray, *,
                        m_bits: int = 1 << 12, k: int = 3,
                        seed: int = 401, id_col: str = "doc_id",
                        text_col: str = "text", ngram: int = 3):
    """Decontamination through a Bloom filter instead of the exact
    broadcast set: the eval shingles set k=3 bits each
    (mix64(seed+i, x) % m_bits into ONE shared bit array); a train
    shingle is bloom-positive iff all its k bits are set.  At 100 TB the
    bit array is the fixed-size broadcast (m/8 bytes regardless of eval
    size; the default m is sized small against the test corpus ON
    PURPOSE — ~3% false-positive rate — so the audit columns exercise
    the FP accounting; a production filter sizes m ≈ 10 bits/element) where the exact sorted-hash array grows with the benchmark
    suite; here the exact set rides along too so the output AUDITS the
    filter — per doc: bloom hits, true hits, false positives.

    Deterministic (false positives included — same mix64 chain both
    engines), so the SQL twin reproduces the filter bit-for-bit."""
    from ..context import Broadcast
    from ..sources.pages import mix64_vec
    from .dedup import batch_shingle_hashes

    ev = np.unique(np.asarray(eval_hashes, dtype=np.int64))
    bits = np.zeros(m_bits, dtype=bool)
    for i in range(k):
        bits[(mix64_vec(seed + i, ev) % np.uint64(m_bits))
             .astype(np.int64)] = True
    bc = Broadcast((bits, ev))

    def flag(t: pa.Table) -> pa.Table:
        bits_, ev_ = bc.get()
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        n = len(lens)
        if len(flat):
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            hit = np.ones(len(flat), dtype=bool)
            for i in range(k):
                hit &= bits_[(mix64_vec(seed + i, flat)
                              % np.uint64(m_bits)).astype(np.int64)]
            n_bloom = np.bincount(doc_idx, weights=hit,
                                  minlength=n).astype(np.int64)
            if len(ev_):
                pos = np.clip(np.searchsorted(ev_, flat), 0, len(ev_) - 1)
                true_hit = ev_[pos] == flat
            else:
                true_hit = np.zeros(len(flat), dtype=bool)
            n_true = np.bincount(doc_idx, weights=true_hit,
                                 minlength=n).astype(np.int64)
        else:
            n_bloom = np.zeros(n, dtype=np.int64)
            n_true = np.zeros(n, dtype=np.int64)
        return pa.table({
            "doc_id": t.column(id_col),
            "n_shingles": pa.array(lens),
            "n_bloom_hits": pa.array(n_bloom),
            "n_true_hits": pa.array(n_true),
            "n_false_pos": pa.array(n_bloom - n_true),
            "contaminated": pa.array((n_bloom > 0).astype(np.int64)),
        })

    return train_ds.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-source shingle contamination matrix
# ---------------------------------------------------------------------------

def source_overlap(docs_ds, *, text_col: str = "text",
                   source_col: str = "source", ngram: int = 3,
                   n_parts: int = 64) -> pd.DataFrame:
    """Pairwise source×source overlap of distinct text shingles — the
    corpus-health matrix behind cross-source leakage audits: for every
    source pair (a < b by name) the distinct-shingle counts, the
    intersection size and its Jaccard.

    Shape: per-batch distinct (source, shingle) rows hash-partition by
    SHINGLE so every shingle's sources meet in one partition; the
    per-partition kernel emits S×S pair partials (S = #sources, tiny) —
    the corpus-sized shingle set never lands anywhere whole."""
    from .dedup import batch_shingle_hashes

    def tag(t: pa.Table) -> pa.Table:
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        src = np.repeat(np.asarray(t.column(source_col).to_pylist(),
                                   dtype=object), lens)
        if len(flat):
            d = pd.DataFrame({"source": src, "x": flat}) \
                .drop_duplicates()
        else:
            d = pd.DataFrame({"source": np.empty(0, object),
                              "x": np.empty(0, np.int64)})
        return pa.table({
            "source": pa.array(d["source"], pa.string()),
            "x": pa.array(d["x"].to_numpy(np.int64)),
            "part": pa.array((d["x"].to_numpy(np.int64) % n_parts)
                             .astype(np.int32))})

    def pairs_in_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["source", "x"])
        if not len(df):
            return pd.DataFrame({"src_a": np.empty(0, object),
                                 "src_b": np.empty(0, object),
                                 "n": np.empty(0, np.int64)})
        # per-source totals ride along as diagonal rows (src, src, n)
        tot = df.groupby("source").size().reset_index(name="n")
        diag = pd.DataFrame({"src_a": tot["source"],
                             "src_b": tot["source"], "n": tot["n"]})
        m = df.merge(df, on="x", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        inter = m.groupby(["source_a", "source_b"]).size() \
            .reset_index(name="n") \
            .rename(columns={"source_a": "src_a", "source_b": "src_b"})
        return pd.concat([diag, inter], ignore_index=True)

    parts = (docs_ds.map_batches(tag, batch_format="pyarrow")
             .groupby("part")
             .map_groups(pairs_in_part, batch_format="pandas")).to_pandas()
    acc = parts.groupby(["src_a", "src_b"], as_index=False)["n"].sum()
    tot = acc[acc["src_a"] == acc["src_b"]] \
        .set_index("src_a")["n"].to_dict()
    out = acc[acc["src_a"] < acc["src_b"]].copy()
    srcs = sorted(tot)
    # every source pair appears, zero intersections included
    full = pd.DataFrame([(a, b) for i, a in enumerate(srcs)
                         for b in srcs[i + 1:]],
                        columns=["src_a", "src_b"])
    out = full.merge(out, how="left").fillna({"n": 0})
    na = out["src_a"].map(tot).to_numpy(np.int64)
    nb = out["src_b"].map(tot).to_numpy(np.int64)
    nc = out["n"].to_numpy(np.int64)
    out = pd.DataFrame({
        "src_a": out["src_a"], "src_b": out["src_b"],
        "n_a": na, "n_b": nb, "n_common": nc,
        "jaccard": half_up(nc / (na + nb - nc), 6)})
    return out.sort_values(["src_a", "src_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# T5-style span corruption + prefix-LM splits — the objective-prep
# operators that turn a cleaned corpus into (input, target) pairs.
# ---------------------------------------------------------------------------

SPAN_SEED = 417
SPAN_RATE = 15          # percent of tokens masked
PREFIX_SEED = 419


def span_corruption(docs_ds, *, id_col: str = "doc_id",
                    text_col: str = "text", concurrency=None):
    """Deterministic T5 denoising pairs (Raffel et al. 2020): token i of
    doc d is masked iff mix64(417, d, i) % 100 < 15; consecutive masked
    tokens form a span; span k becomes ``<extra_id_k>`` in the input,
    and the target lists each sentinel with its original tokens,
    terminated by the final sentinel ``<extra_id_n>``.

    Pure integer/string (zero float risk), stateless per batch: one
    whitespace split, one vectorized mix64 over (doc, pos), span ids by
    a per-doc cumsum, both texts rebuilt with ONE ``pc.binary_join``
    each.  Output: (id, n_tokens, n_masked, n_spans, input_text,
    target_text)."""
    from ..context import auto_pool
    from ..sources.pages import mix64_vec
    from .text import _as_array, _split_flat

    def corrupt(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        flat, didx0, n = _split_flat(_as_array(t.column(text_col)),
                                     r"[ \t\n\r\f\v]+")
        keep = flat != ""
        flat, didx = flat[keep].astype(object), didx0[keep]
        n_tok = np.bincount(didx, minlength=n).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        p = np.arange(len(flat), dtype=np.int64) - np.repeat(starts,
                                                             n_tok)
        m = (mix64_vec(SPAN_SEED, ids[didx], p) % np.uint64(100)
             < SPAN_RATE) if len(flat) else np.zeros(0, bool)
        prev_m = np.concatenate([[False], m[:-1]]) & (p > 0)
        st = m & ~prev_m
        cs = np.cumsum(st.astype(np.int64))
        base = np.concatenate([[0], cs])[starts]   # spans before the doc
        k = cs - np.repeat(base, n_tok) - 1        # 0-based span id
        n_spans = np.bincount(didx[st], minlength=n).astype(np.int64)
        n_masked = np.bincount(didx[m], minlength=n).astype(np.int64)

        sent = np.char.add(np.char.add("<extra_id_", k.astype(str)), ">") \
            if len(flat) else np.empty(0, object)
        # input: unmasked tokens + one sentinel per span start
        ikeep = ~m | st
        itok = np.where(st, sent, flat)[ikeep]
        icnt = np.bincount(didx[ikeep], minlength=n).astype(np.int64)
        ioffs = np.zeros(n + 1, np.int32)
        np.cumsum(icnt, out=ioffs[1:])
        inp = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(ioffs),
                                     pa.array(itok.astype(object),
                                              pa.string())), " ")
        # target: per masked token, sentinel-prefixed at span starts
        ttok = np.where(st, np.char.add(np.char.add(
            sent.astype(str), " "), flat.astype(str)).astype(object),
            flat)[m]
        tcnt = n_masked
        toffs = np.zeros(n + 1, np.int32)
        np.cumsum(tcnt, out=toffs[1:])
        tgt0 = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(toffs),
                                     pa.array(ttok.astype(object),
                                              pa.string())), " ") \
            .to_numpy(zero_copy_only=False).astype(str)
        final = np.char.add(np.char.add("<extra_id_",
                                        n_spans.astype(str)), ">")
        tgt = np.where(n_masked > 0,
                       np.char.add(np.char.add(tgt0, " "), final),
                       final)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "n_masked": pa.array(n_masked),
            "n_spans": pa.array(n_spans),
            "input_text": inp,
            "target_text": pa.array(tgt.astype(object), pa.string()),
        })

    return docs_ds.map_batches(corrupt, batch_format="pyarrow")


def prefix_lm_split(docs_ds, *, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Deterministic prefix-LM pairs: doc with n ≥ 2 tokens splits at
    1 + mix64(419, doc) % (n−1) (prefix never empty, continuation never
    empty); shorter docs keep everything in the prefix.  Pure
    integer/string, stateless per batch.  Output: (id, n_tokens,
    split_at, prefix, continuation)."""
    from ..sources.pages import mix64_vec
    from .text import _as_array, _split_flat

    def split(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        flat, didx0, n = _split_flat(_as_array(t.column(text_col)),
                                     r"[ \t\n\r\f\v]+")
        keep = flat != ""
        flat, didx = flat[keep].astype(object), didx0[keep]
        n_tok = np.bincount(didx, minlength=n).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        p = np.arange(len(flat), dtype=np.int64) - np.repeat(starts,
                                                             n_tok)
        draw = mix64_vec(PREFIX_SEED, ids) if n else np.empty(0,
                                                              np.uint64)
        split_at = np.where(
            n_tok >= 2,
            1 + (draw % np.maximum(n_tok - 1, 1).astype(np.uint64))
            .astype(np.int64),
            n_tok)
        in_prefix = p < np.repeat(split_at, n_tok)

        def join(mask):
            cnt = np.bincount(didx[mask], minlength=n).astype(np.int64)
            offs = np.zeros(n + 1, np.int32)
            np.cumsum(cnt, out=offs[1:])
            return pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(offs),
                    pa.array(flat[mask].astype(object), pa.string())),
                " ")

        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "split_at": pa.array(split_at.astype(np.int64)),
            "prefix": join(in_prefix),
            "continuation": join(~in_prefix),
        })

    return docs_ds.map_batches(split, batch_format="pyarrow")


def ngram_novelty(docs_ds, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  ngram: int = 3) -> pd.DataFrame:
    """Corpus-order novelty per doc: the fraction of its DISTINCT
    word-``ngram`` shingles whose global first occurrence (minimum
    doc id) is this doc — the aging/repetition curve of a crawl (new
    crawls of an unchanged site score ≈ 0).

    Same all-integer tagged-groupby shape as :func:`heaps_curve`, over
    the dedup shingle hashes instead of unigrams: one combiner pass
    emits per batch the distinct shingles with their min in-batch doc
    plus one per-doc distinct-shingle count; ONE groupby-min resolves
    global first occurrences; a vocab-sized fold + tiny per-doc sum
    finishes.  Output: (id, n_shingles, n_novel, novelty round-6)."""
    from ray.data.aggregate import Min, Sum

    from .dedup import batch_shingle_hashes

    def tagged(t: pa.Table) -> pa.Table:
        ids = _doc_ids(t, id_col)
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        didx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        keys, vals = [], []
        n_sh = np.zeros(len(ids), np.int64)
        if len(flat):
            key = didx * np.int64(1 << 31) + (flat % np.int64(1 << 31))
            # distinct (doc, hash): hashes are < 2^31-1 (Mersenne field)
            uk = np.unique(key)
            d_loc = (uk >> 31).astype(np.int64)
            h_loc = (uk & ((1 << 31) - 1)).astype(np.int64)
            n_sh = np.bincount(d_loc, minlength=len(ids)) \
                .astype(np.int64)
            order = np.lexsort((ids[d_loc], h_loc))
            hs, ds_ = h_loc[order], ids[d_loc][order]
            first = np.ones(len(hs), dtype=bool)
            first[1:] = hs[1:] != hs[:-1]
            keys.append(np.char.add("t\x1e", hs[first].astype(str)))
            vals.append(ds_[first])
        keys.append(np.char.add("d\x1e", ids.astype(str)))
        vals.append(n_sh)
        return pa.table({
            "key": pa.array(np.concatenate(keys), pa.string()),
            "val": pa.array(np.concatenate(vals).astype(np.int64))})

    resolved = (docs_ds.map_batches(tagged, batch_format="pyarrow")
                .groupby("key").aggregate(Min("val", alias_name="val")))

    def fold(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_numpy(zero_copy_only=False).astype(str)
        vals = t.column("val").to_numpy().astype(np.int64)
        is_tok = np.char.startswith(keys, "t\x1e")
        d_ids = np.asarray([k[2:] for k in keys[~is_tok]],
                           dtype=np.int64)
        out_id = np.concatenate([vals[is_tok], d_ids])
        out_nv = np.concatenate([np.ones(is_tok.sum(), np.int64),
                                 np.zeros(len(d_ids), np.int64)])
        out_ns = np.concatenate([np.zeros(is_tok.sum(), np.int64),
                                 vals[~is_tok]])
        return pa.table({"doc_id": pa.array(out_id),
                         "n_novel": pa.array(out_nv),
                         "n_shingles": pa.array(out_ns)})

    agg = (resolved.map_batches(fold, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("n_shingles", alias_name="n_shingles"),
                      Sum("n_novel", alias_name="n_novel"))
           .to_pandas()).sort_values("doc_id").reset_index(drop=True)
    ns = agg["n_shingles"].to_numpy(np.int64)
    nv = agg["n_novel"].to_numpy(np.int64)
    return pd.DataFrame({
        "doc_id": agg["doc_id"].to_numpy(np.int64),
        "n_shingles": ns, "n_novel": nv,
        "novelty": half_up(nv / np.maximum(ns, 1).astype(np.float64),
                           6)})
