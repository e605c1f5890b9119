"""Stored positional inverted index + phrase search.

The index is (token, doc_id, pos) rows written as hash-bucketed
partitioned parquet (`bucket = word_fp(token) % n_buckets`, one
directory per bucket — the stored-band-index pattern of
stages/dedup.py).  A phrase probe then reads ONLY the buckets its terms
hash to (partition pruning at the read: at 100 TB the index is touched
on ~len(phrase) buckets, not scanned), joins the per-term position
lists per document, and emits the phrase start positions.

Build shape: one pass over the corpus (per-batch Arrow split → flat
(token, doc, pos) rows tagged with the bucket) → `write_parquet`
partitioned by bucket.  Probe shape: pruned read → per-term position
arrays per doc → vectorized intersection (sorted searchsorted chain:
positions p where term_i sits at p+i for every i).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_positional_index", "phrase_search"]

N_BUCKETS = 64


def _flat_positions(col):
    """(lowercase word array, doc idx per word, per-doc position) over
    the `[0-9a-z_]+` word class (the retrieval/shingle definition)."""
    from .classify import _doc_words

    flat, didx, n = _doc_words(col)
    if len(flat) == 0:
        return flat, didx, np.empty(0, np.int64)
    starts = np.r_[0, np.flatnonzero(didx[1:] != didx[:-1]) + 1]
    pos = np.arange(len(flat), dtype=np.int64) - \
        np.repeat(starts, np.diff(np.r_[starts, len(flat)]))
    return flat, didx, pos


def build_positional_index(docs_ds, out_dir: str, *,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           n_buckets: int = N_BUCKETS) -> str:
    """One corpus pass → hash-bucketed positional index on parquet."""
    from .dedup import word_fp

    def rows(t: pa.Table) -> pa.Table:
        flat, didx, pos = _flat_positions(t.column(text_col))
        ids = t.column(id_col).to_numpy().astype(np.int64)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat)
        ufp = np.fromiter((word_fp(w) for w in uniq), dtype=np.uint64,
                          count=len(uniq))
        bucket = (ufp[codes] % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"token": pa.array(flat, pa.string()),
                         "doc_id": pa.array(ids[didx]),
                         "pos": pa.array(pos),
                         "bucket": pa.array(bucket)})

    (docs_ds.map_batches(rows, batch_format="pyarrow")
            .write_parquet(out_dir, partition_cols=["bucket"]))
    return out_dir


def phrase_search(index_dir: str, phrase: list[str], *,
                  n_buckets: int = N_BUCKETS) -> pd.DataFrame:
    """(doc_id, start_pos) of every exact phrase occurrence — reads only
    the phrase terms' buckets (partition pruning), then a vectorized
    positional-join chain."""
    import ray.data as rd

    from .dedup import word_fp

    phrase = [w.lower() for w in phrase]
    # pure-int modulo: python_int % np.uint64 silently promotes BOTH to
    # float64 and returns garbage (measured: every word -> bucket 0)
    buckets = sorted({int(word_fp(w)) % n_buckets for w in phrase})
    import glob as _glob

    paths = [p for b in buckets for p in sorted(
        _glob.glob(f"{index_dir.rstrip('/')}/bucket={b}/*.parquet"))]
    if not paths:
        return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                             "start_pos": np.empty(0, np.int64)})
    idx = rd.read_parquet(paths, columns=["token", "doc_id", "pos"])

    want = set(phrase)

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("token"),
                                 pa.array(sorted(want), pa.string())))

    rows = idx.map_batches(prune, batch_format="pyarrow").to_pandas()
    if rows.empty:
        return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                             "start_pos": np.empty(0, np.int64)})
    # packed (doc, pos) key per term; chain of sorted membership probes
    def packed(term: str) -> np.ndarray:
        sel = rows[rows["token"] == term]
        return np.sort((sel["doc_id"].to_numpy(np.int64) << 32)
                       | sel["pos"].to_numpy(np.int64))

    cand = packed(phrase[0])
    for i, term in enumerate(phrase[1:], start=1):
        keys = packed(term)
        probe = cand + i
        if len(keys) == 0:
            cand = cand[:0]
            break
        pos = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
        cand = cand[keys[pos] == probe]
    return pd.DataFrame({
        "doc_id": (cand >> 32).astype(np.int64),
        "start_pos": (cand & 0xFFFFFFFF).astype(np.int64),
    }).sort_values(["doc_id", "start_pos"], ignore_index=True)
