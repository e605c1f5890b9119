"""Byte-pair-encoding merge learning over the corpus word table —
tokenizer training as a distributed operator.

Classic BPE (Sennrich et al., ACL 2016) trains on the WORD-FREQUENCY
table, not the raw corpus: one corpus pass builds (word, cnt), then each
merge round needs only the vocab-sized symbol table.  Shapes:

  * word counts — per-batch combiner (in-batch unique+count) → ONE
    vocab-sized groupby sum; the corpus text never moves again.
  * each round — per-batch adjacent-pair counting (weighted by word
    count) → tiny collected pair table → driver argmax (count DESC,
    pair ASC tie-break, all integers/strings: exactly mirrorable) →
    the winning pair applied per batch with a leftmost-greedy
    non-overlap rule (runs of consecutive matches keep even offsets —
    "aaa" + merge (a,a) → "aa","a").
  * rounds iterate on a MATERIALIZED vocab-sized Dataset (re-running
    the lazy chain each round would recompute all prior merges).

Per CLAUDE.md rule 13 the vocab table at test scale is FB15K-sized, so
the default path collects it once and runs the IDENTICAL flat-array
kernels driver-side; the Dataset path takes over past ``driver_max``
rows (parity pinned by tests/test_bpe.py).

The SQL twin unrolls the K rounds (lead() adjacency → argmax pair →
row_number-parity greedy matching → renumbered symbol table), the same
quantized-iteration trick as embeddings_kmeans / docs_lm_perplexity —
integer counts make every round exact, no float drift at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["word_counts", "learn_bpe", "learn_bpe_arrays", "encode_words"]


def word_counts(docs_ds, *, text_col: str = "text"):
    """Dataset[(word, cnt)] over the `[0-9a-z_]+` lowercase word class
    (the shingle/fingerprint definition of stages/classify.py)."""
    from ray.data.aggregate import Sum

    from .classify import _doc_words

    def combine(t: pa.Table) -> pa.Table:
        flat, _idx, _n = _doc_words(t.column(text_col))
        w, c = np.unique(flat, return_counts=True)
        return pa.table({"word": pa.array(w, pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    return (docs_ds.map_batches(combine, batch_format="pyarrow")
                   .groupby("word")
                   .aggregate(Sum("cnt", alias_name="cnt")))


# ---------------------------------------------------------------------------
# flat-array kernels (shared verbatim by the driver and Dataset paths)
# ---------------------------------------------------------------------------

def _flat_syms(words) -> tuple[np.ndarray, np.ndarray]:
    """words (str sequence) → (symbol array, word index per symbol);
    initial symbols are single characters."""
    words = list(words)
    joined = "".join(words)
    syms = np.array(list(joined), dtype=object) if joined else \
        np.empty(0, dtype=object)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                       count=len(words))
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    return syms, wid


def _pair_counts(syms: np.ndarray, wid: np.ndarray,
                 wcnt: np.ndarray) -> pd.DataFrame:
    """Adjacent-pair counts weighted by word count → (a, b, c)."""
    if len(syms) < 2:
        return pd.DataFrame({"a": [], "b": [], "c": []})
    same = wid[1:] == wid[:-1]
    df = pd.DataFrame({"a": syms[:-1][same], "b": syms[1:][same],
                       "c": wcnt[wid[:-1][same]]})
    return df.groupby(["a", "b"], as_index=False)["c"].sum()


def _apply_merge(syms: np.ndarray, wid: np.ndarray, a: str,
                 b: str) -> tuple[np.ndarray, np.ndarray]:
    """Replace leftmost-greedy non-overlapping (a, b) adjacencies with
    the concatenated symbol — vectorized run-parity selection."""
    if len(syms) < 2:
        return syms, wid
    m = np.flatnonzero((wid[1:] == wid[:-1])
                       & (syms[:-1] == a) & (syms[1:] == b))
    if len(m) == 0:
        return syms, wid
    run_start = np.r_[True, np.diff(m) != 1]
    first = m[run_start][np.cumsum(run_start) - 1]
    kept = m[((m - first) % 2) == 0]
    syms = syms.copy()
    syms[kept] = a + b
    mask = np.ones(len(syms), dtype=bool)
    mask[kept + 1] = False
    return syms[mask], wid[mask]


def learn_bpe_arrays(words, counts: np.ndarray, k: int) -> pd.DataFrame:
    """K merge rounds over an in-memory word table → (step, lhs, rhs, cnt)."""
    syms, wid = _flat_syms(words)
    counts = np.asarray(counts, dtype=np.int64)
    rows = []
    for step in range(1, k + 1):
        pc_df = _pair_counts(syms, wid, counts)
        if pc_df.empty:
            break
        best = pc_df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True],
            ignore_index=True).iloc[0]
        rows.append((step, best["a"], best["b"], int(best["c"])))
        syms, wid = _apply_merge(syms, wid, str(best["a"]), str(best["b"]))
    return pd.DataFrame(rows, columns=["step", "lhs", "rhs", "cnt"]) \
        .astype({"step": np.int64, "cnt": np.int64})


# ---------------------------------------------------------------------------
# Dataset path: rounds over a materialized list<string> symbol column
# ---------------------------------------------------------------------------

def _batch_arrays(t: pa.Table):
    col = t.column("syms").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    flat = np.asarray(col.values.to_pylist(), dtype=object)
    n = t.num_rows
    lens = np.diff(offsets)
    wid = np.repeat(np.arange(n, dtype=np.int64), lens)
    cnt = t.column("cnt").to_numpy().astype(np.int64)
    return flat, wid, cnt, n


def _count_batch(t: pa.Table) -> pa.Table:
    flat, wid, cnt, _n = _batch_arrays(t)
    df = _pair_counts(flat, wid, cnt)
    return pa.table({"a": pa.array(df["a"], pa.string()),
                     "b": pa.array(df["b"], pa.string()),
                     "c": pa.array(df["c"].to_numpy(np.int64))})


class _ApplyMerge:
    def __init__(self, a: str, b: str):
        self.a, self.b = a, b

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, wid, cnt, n = _batch_arrays(t)
        flat, wid = _apply_merge(flat, wid, self.a, self.b)
        new_lens = np.bincount(wid, minlength=n)
        offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(flat.tolist(), pa.string()))
        return pa.table({"syms": arr, "cnt": t.column("cnt")})


def learn_bpe(docs_ds, *, text_col: str = "text", k: int = 8,
              driver_max: int = 500_000) -> pd.DataFrame:
    """Learn the top-K BPE merges of the corpus → (step, lhs, rhs, cnt).

    Collects the (word, cnt) table when it is under ``driver_max`` rows
    and runs the identical kernels driver-side (rule 13); above it, the
    symbol table stays a Dataset and each round is one pair-count pass
    (per-batch combiner, tiny collected pair table) + one broadcast
    merge apply, materialized so round r+1 never re-runs round r."""
    wc = word_counts(docs_ds, text_col=text_col).materialize()
    if wc.count() <= driver_max:
        wdf = wc.to_pandas().sort_values("word", ignore_index=True)
        return learn_bpe_arrays(wdf["word"].to_numpy(dtype=object),
                                wdf["cnt"].to_numpy(np.int64), k)
    return _learn_bpe_dataset(wc, k)


def _encode_state(words, counts: np.ndarray, k: int):
    """Run K merge rounds and return the FINAL symbol state
    (syms, wid) — the encoding the learned tokenizer assigns every
    vocabulary word (identical round loop as learn_bpe_arrays)."""
    syms, wid = _flat_syms(words)
    counts = np.asarray(counts, dtype=np.int64)
    for _step in range(1, k + 1):
        pc_df = _pair_counts(syms, wid, counts)
        if pc_df.empty:
            break
        best = pc_df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True],
            ignore_index=True).iloc[0]
        syms, wid = _apply_merge(syms, wid, str(best["a"]), str(best["b"]))
    return syms, wid


def encode_words(docs_ds, *, text_col: str = "text", k: int = 8,
                 driver_max: int = 500_000) -> pd.DataFrame:
    """Apply the corpus's own top-K learned merges to its word table →
    (word, cnt, n_syms, encoded) with ``encoded`` the space-joined final
    symbol sequence — the tokenizer-training story's second half (train
    on the word table, then ENCODE with the learned merges).

    Same driver/Dataset split as learn_bpe; the Dataset path applies
    each round's winner as a broadcast map_batches pass and joins the
    per-word symbol lists at the end (parity pinned in test_bpe.py)."""
    wc = word_counts(docs_ds, text_col=text_col).materialize()
    if wc.count() <= driver_max:
        wdf = wc.to_pandas().sort_values("word", ignore_index=True)
        words = wdf["word"].to_numpy(dtype=object)
        syms, wid = _encode_state(words, wdf["cnt"].to_numpy(np.int64), k)
        enc = pd.Series(syms).groupby(wid).agg(" ".join)
        n_syms = np.bincount(wid, minlength=len(wdf)).astype(np.int64)
        return pd.DataFrame({
            "word": words,
            "cnt": wdf["cnt"].to_numpy(np.int64),
            "n_syms": n_syms,
            "encoded": enc.reindex(np.arange(len(wdf))).to_numpy(),
        })
    out = _encode_dataset(wc, k)
    return out.sort_values("word", ignore_index=True)


def _syms_init(t: pa.Table, *, keep_word: bool) -> pa.Table:
    """(word, cnt) batch → (syms list<string>, cnt [, word]) — the
    initial one-character symbol lists, built flat (one join + offsets),
    never a Python per-row list-of-lists."""
    words = t.column("word").to_pylist()
    joined = "".join(words)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                       count=len(words))
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(list(joined), pa.string()))
    cols = {"syms": arr, "cnt": t.column("cnt").cast(pa.int64())}
    if keep_word:
        cols["word"] = t.column("word")
    return pa.table(cols)


def _encode_dataset(wc_ds, k: int) -> pd.DataFrame:
    """Scale path of encode_words: the _learn_bpe_dataset round loop,
    returning the final per-word symbol lists instead of the merges.
    ``wc_ds`` is the (word, cnt) Dataset — it is never collected; the
    symbol table stays distributed through every round."""
    ds = wc_ds.map_batches(
        lambda t: _syms_init(t, keep_word=True),
        batch_format="pyarrow").materialize()
    for _step in range(1, k + 1):
        partial = ds.map_batches(_count_batch,
                                 batch_format="pyarrow").to_pandas()
        if partial.empty:
            break
        pc_df = partial.groupby(["a", "b"], as_index=False)["c"].sum()
        best = pc_df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True],
            ignore_index=True).iloc[0]
        ds = ds.map_batches(
            _ApplyMergeKeep(str(best["a"]), str(best["b"])),
            batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column("syms").combine_chunks()
        return pa.table({
            "word": t.column("word"),
            "cnt": t.column("cnt"),
            "n_syms": pc.list_value_length(col).cast(pa.int64()),
            "encoded": pc.binary_join(col.cast(pa.list_(pa.string())),
                                      " "),
        })

    return ds.map_batches(finish, batch_format="pyarrow").to_pandas()


class _ApplyMergeKeep(_ApplyMerge):
    """_ApplyMerge that carries the word column through each round."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = super().__call__(t.select(["syms", "cnt"]))
        return out.append_column("word", t.column("word"))


def _learn_bpe_dataset(wc_ds, k: int) -> pd.DataFrame:
    """Scale path over the symbol Dataset.  ``wc_ds`` is the (word, cnt)
    Dataset straight from the groupby — it never touches the driver; the
    per-round pair-count collect is combiner-reduced and pair-alphabet
    sized, and the merge table returned is K rows."""
    ds = wc_ds.map_batches(
        lambda t: _syms_init(t, keep_word=False),
        batch_format="pyarrow").materialize()
    rows = []
    for step in range(1, k + 1):
        partial = ds.map_batches(_count_batch,
                                 batch_format="pyarrow").to_pandas()
        if partial.empty:
            break
        pc_df = partial.groupby(["a", "b"], as_index=False)["c"].sum()
        best = pc_df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True],
            ignore_index=True).iloc[0]
        rows.append((step, best["a"], best["b"], int(best["c"])))
        ds = ds.map_batches(
            _ApplyMerge(str(best["a"]), str(best["b"])),
            batch_format="pyarrow").materialize()
    return pd.DataFrame(rows, columns=["step", "lhs", "rhs", "cnt"]) \
        .astype({"step": np.int64, "cnt": np.int64})


def doc_fertility(docs_ds, *, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> pd.DataFrame:
    """Tokenizer fertility per document: encode the corpus word table
    with its own top-``k`` learned merges (:func:`encode_words`), then
    score every doc by pieces-per-word = Σ n_syms(word) / n_words —
    the standard tokenizer-quality diagnostic (fertility ≈ 1 means the
    vocabulary covers the corpus; high fertility flags domain
    mismatch).

    The (word → n_syms) table is vocab-sized and broadcasts once; the
    scoring pass is stateless (one searchsorted + one bincount per
    batch).  Output: (id, n_words, n_pieces, fertility round-6)."""
    from ..context import Broadcast, auto_pool, half_up

    enc = encode_words(docs_ds, text_col=text_col, k=k)
    words = enc["word"].to_numpy(dtype=object)
    nsym = enc["n_syms"].to_numpy(np.int64)
    order = np.argsort(words)
    bc = Broadcast((words[order], nsym[order]))

    class Fertility:
        def __init__(self, model_bc: Broadcast):
            self.words, self.nsym = model_bc.get()

        def __call__(self, t: pa.Table) -> pa.Table:
            from .classify import _doc_words

            flat, didx, n = _doc_words(t.column(text_col))
            n_words = np.bincount(didx, minlength=n).astype(np.int64)
            if len(flat):
                pos = np.clip(np.searchsorted(self.words, flat), 0,
                              max(len(self.words) - 1, 0))
                hit = self.words[pos] == flat
                pieces = np.where(hit, self.nsym[pos], 0)
                n_pieces = np.bincount(didx, weights=pieces,
                                       minlength=n).astype(np.int64)
            else:
                n_pieces = np.zeros(n, np.int64)
            fert = half_up(np.where(
                n_words > 0,
                n_pieces / np.maximum(n_words, 1).astype(np.float64),
                0.0), 6)
            return pa.table({
                id_col: t.column(id_col),
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
                "fertility": pa.array(fert, pa.float64())})

    out = docs_ds.map_batches(
        Fertility, batch_format="pyarrow",
        concurrency=auto_pool(),
        fn_constructor_kwargs={"model_bc": bc}).to_pandas()
    return out.astype({id_col: np.int64, "n_words": np.int64,
                       "n_pieces": np.int64}) \
        .sort_values(id_col).reset_index(drop=True)
