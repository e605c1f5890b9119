"""Deduplication operators — exact and near-dup — as Ray Data stages.

All hashes are stable (no builtin ``hash``), all samplers seeded, so every
operator is deterministic and resumable.  Each near-dup flavor follows the
same scale shape:

    per-batch vectorized signature → explode to (bucket, doc) rows →
    groupby(bucket) → candidate pairs → verify (exact measure) → clusters

The groupby only ever moves signature rows (tens of bytes/doc), never the
documents — that is what keeps it viable at 100 TB.  Candidate-pair
clustering uses iterative min-label propagation expressed with groupbys
(driver union-find only when the candidate set is provably small, guarded).

Reference anchor: exact triple dedup is the reference's
``groupby(ix).first()`` (/root/reference/get_triples/process_triples.py:38-39);
everything else is the large-scale-pipeline extension the target calls for.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import half_up
from ..sources.pages import mix64, mix64_vec

_WORD = re.compile(r"\w+", re.UNICODE)

# 2^31-1: keeps a*x+b < 2^62 so the minhash permutation stays in int64
_MERSENNE = (1 << 31) - 1

# Every near-dup hash is built from two SQL-expressible primitives so the
# driver's DuckDB oracle can recompute them exactly: the polynomial
# rolling hash over bytes (same fold as stages/text.py:fingerprint) and
# splitmix64 (sources/pages.py:mix64 — already mirrored bit-for-bit by
# __ray_entry__._mix_chain).  Pinned seeds keep the two sides in lockstep.
_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1
SHINGLE_SEED = 17
SIMHASH_SEED = 13
PERM_SEED = 7


def stable_hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (two crc32 passes — cheap, pinned)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    lo = zlib.crc32(b)
    hi = zlib.crc32(b, 0x9E3779B9)
    return (hi << 32) | lo


_WFP_CACHE: dict[str, int] = {}


def word_fp(w: str) -> int:
    """Rolling-hash fingerprint of one word (mod 2^61-1), memoized per
    worker process (the word vocabulary is Zipf-bounded, so the cache hit
    rate is high; cleared if it ever outgrows its bound)."""
    h = _WFP_CACHE.get(w)
    if h is None:
        h = 0
        for b in w.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        if len(_WFP_CACHE) > 2_000_000:
            _WFP_CACHE.clear()
        _WFP_CACHE[w] = h
    return h


def _word_fps(words: list[str]) -> np.ndarray:
    return np.fromiter((word_fp(w) for w in words), dtype=np.uint64,
                       count=len(words))


def batch_shingle_hashes(col, ngram: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized :func:`shingle_hashes` over a whole batch: returns
    (flat, lens) where ``flat`` is the concatenation of every doc's
    sorted-distinct shingle hashes and ``lens`` the per-doc counts.

    One Arrow lower+split for the batch, word fingerprints computed once
    per UNIQUE token (the memoized ``word_fp`` over a Zipf-bounded
    vocabulary), shingle mix64 over position-shifted arrays, per-doc
    distinct via one ``np.unique`` on packed (doc, shingle) keys — no
    per-document Python dispatch.  Byte-identical to the scalar kernel
    for ASCII input; non-ASCII batches fall back to the scalar path
    (Python ``\\w`` is unicode-aware, RE2's is not).
    """
    import pyarrow.compute as pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(list(col), pa.string())
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if not pc.all(pc.string_is_ascii(col)).as_py():
        parts = [shingle_hashes(t, ngram) for t in col.to_pylist()]
        lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=n)
        flat = np.concatenate(parts) if lens.sum() else \
            np.empty(0, dtype=np.int64)
        return flat, lens

    split = pc.split_pattern_regex(pc.utf8_lower(col), pattern="[^0-9a-z_]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offs = split.offsets.to_numpy()
    counts = np.diff(offs).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    # dictionary-encode in Arrow: only the UNIQUE vocabulary ever becomes
    # Python strings (materializing every token was a measured 1 s/1M-word
    # fault wall); word fingerprints then compute once per unique
    dic = pc.dictionary_encode(split.flatten())
    codes = dic.indices.to_numpy().astype(np.int64)
    uniq = dic.dictionary.to_pylist()
    ufp = np.fromiter((word_fp(w) for w in uniq), dtype=np.uint64,
                      count=len(uniq))
    if uniq and "" in uniq:
        ok = codes != uniq.index("")
        codes, doc_idx = codes[ok], doc_idx[ok]
    n_words = np.bincount(doc_idx, minlength=n)
    wh = ufp[codes] if len(codes) else np.empty(0, dtype=np.uint64)

    lens = np.zeros(n, dtype=np.int64)
    flat_parts: list[np.ndarray] = []
    if len(wh) >= ngram:
        # positions whose whole ngram window stays inside one doc
        inside = doc_idx[: len(doc_idx) - ngram + 1] == \
            doc_idx[ngram - 1:]
        if inside.any():
            cols = [wh[i: len(wh) - ngram + 1 + i][inside]
                    for i in range(ngram)]
            sh = (mix64_vec(SHINGLE_SEED, *cols)
                  % np.uint64(_MERSENNE)).astype(np.int64)
            sdoc = doc_idx[: len(doc_idx) - ngram + 1][inside]
            key = np.unique((sdoc << np.int64(31)) | sh)
            kdoc = key >> np.int64(31)
            lens = np.bincount(kdoc, minlength=n).astype(np.int64)
            flat_parts.append(key & np.int64((1 << 31) - 1))
    # short docs (0 < words < ngram): whole-doc hash — scalar, but only
    # over the (rare) short docs themselves
    short = np.flatnonzero((n_words > 0) & (n_words < ngram))
    if len(short):
        starts = np.cumsum(n_words) - n_words
        singles = np.fromiter(
            (mix64(SHINGLE_SEED,
                   *(int(x) for x in wh[starts[d]: starts[d] + n_words[d]]))
             % _MERSENNE for d in short),
            dtype=np.int64, count=len(short))
        lens[short] = 1                      # short docs had no window rows
        merged = np.empty(int(lens.sum()), dtype=np.int64)
        fstarts = np.cumsum(lens) - lens
        window_slot = np.ones(len(merged), dtype=bool)
        window_slot[fstarts[short]] = False
        merged[fstarts[short]] = singles
        if flat_parts:
            merged[window_slot] = flat_parts[0]
        return merged, lens
    flat = flat_parts[0] if flat_parts else np.empty(0, dtype=np.int64)
    return flat, lens


def shingle_hashes(text: str, ngram: int = 3) -> np.ndarray:
    """Distinct word-``ngram`` shingle hashes of ``text`` as a sorted int64
    array: shingle identity is mix64(SHINGLE_SEED, fp(w_i..w_{i+n-1})) mod
    2^31-1 — vectorized over positions, set semantics via np.unique."""
    words = _WORD.findall(text.lower())
    if not words:
        return np.empty(0, dtype=np.int64)
    wh = _word_fps(words)
    if len(words) < ngram:
        sh = np.array([mix64(SHINGLE_SEED, *(int(x) for x in wh))],
                      dtype=np.uint64)
    else:
        cols = [wh[i: len(wh) - ngram + 1 + i] for i in range(ngram)]
        sh = mix64_vec(SHINGLE_SEED, *cols)
    return np.unique(sh % np.uint64(_MERSENNE)).astype(np.int64)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def distinct_rows(ds, cols: list[str]):
    """Exact distinct over ``cols`` — the canonical hash-partition dedup.

    Per-batch combiner (drop in-batch duplicates, vectorized Arrow
    group_by) bounds reducer fan-in before the shuffle; then one row per
    group survives.
    """

    from ..context import num_cpus

    n_part = min(512, max(64, num_cpus() * 4))

    def batch_distinct(t: pa.Table) -> pa.Table:
        # in-batch combiner + small int partition key: the shuffle then
        # sorts 2M ints instead of 2M string tuples (measured 26.5s → 5s
        # for the 600k-page edge dedup) and the per-partition distinct is
        # one vectorized drop_duplicates over ~rows/n_part rows
        t = t.select(cols).group_by(cols).aggregate([])
        df = t.to_pandas()
        part = (
            pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
            % n_part
        ).astype(np.int32)
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("part", pa.array(part))

    def within_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols)[cols]

    return (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby("part")
        .map_groups(within_part, batch_format="pandas")
    )


def exact_dedup_docs(ds, *, id_col: str, text_col: str):
    """Exact content dedup: per distinct text, keep min id + dup count.

    Shuffles (text_hash, id) rows only; the representative text never moves
    twice.  Returns (doc_id, n_dups) where doc_id is the keeper.
    """

    def sig(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        h = np.fromiter(
            (stable_hash64(x) for x in texts), dtype=np.uint64, count=len(texts)
        )
        return pa.table(
            {
                # int64 REINTERPRET: top-bit-set uint64 values round-trip
                # Ray's aggregate combiner as Python bigints otherwise
                # (per-block ArrowConversionError → pickled-object fallback)
                "content_hash": pa.array(h.view(np.int64)),
                id_col: t.column(id_col),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401

        g = t.group_by("content_hash").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return g.rename_columns(["content_hash", "keep_id", "n"])

    from ray.data.aggregate import Min, Sum

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("keep_id", alias_name="doc_id"),
                   Sum("n", alias_name="n_dups"))
        .map_batches(lambda t: t.select(["doc_id", "n_dups"]),
                     batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = _WORD.findall(text.lower())
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _perm_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """k permutation params from mix64 draws (SQL-recomputable — no RNG)."""
    j = np.arange(k, dtype=np.int64)
    a = (mix64_vec(seed, 1, j) % np.uint64(_MERSENNE - 1)).astype(np.int64) + 1
    b = (mix64_vec(seed, 2, j) % np.uint64(_MERSENNE)).astype(np.int64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """k-minhash over shingle-hash values; empty set → all MERSENNE."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.int64)
    # (k, |shingles|) permuted values, min over shingles — vectorized int64
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHashLSH:
    """Actor stage: docs → (band, band_hash, doc_id) bucket rows.

    ``__init__`` draws the permutations once per actor (seeded — identical
    across actors); ``__call__`` emits ``n_bands`` rows per doc.
    """

    def __init__(
        self,
        *,
        id_col: str,
        text_col: str,
        k: int = 64,
        n_bands: int = 16,
        ngram: int = 3,
        seed: int = PERM_SEED,
    ):
        assert k % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k, self.n_bands, self.ngram = k, n_bands, ngram
        self.rows_per_band = k // n_bands
        self.a, self.b = _perm_params(k, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        n, r = len(ids), self.rows_per_band
        if n == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        # one segmented-min pass for the WHOLE batch: per-doc shingle sets
        # concatenate (docs are contiguous segments, shingled by the
        # batch-vectorized kernel), each of the k permutations evaluates
        # vectorized over every shingle at once, and np.minimum.reduceat
        # takes the per-doc minima — identical to minhash_signature per
        # doc (same (a·x+b) mod M fold, empty doc → all-MERSENNE)
        flat, lens = batch_shingle_hashes(batch.column(self.text_col),
                                          self.ngram)
        # zero-shingle docs (fewer than `ngram` words) are SKIPPED, not
        # bucketed: their all-MERSENNE signatures would pair every such
        # doc with est_j=1.0, while the SQL mirror's sig/bh CTEs derive
        # from the shingle table and never see them — dropping them here
        # makes both engines agree by construction (ADVICE r2).
        nz = lens > 0
        if not nz.all():
            ids = ids[nz]
            n = len(ids)
        if n == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        sigs = np.empty((n, self.k), dtype=np.int64)
        starts = (np.cumsum(lens) - lens)[nz]
        for j in range(self.k):
            v = (self.a[j] * flat + self.b[j]) % _MERSENNE
            sigs[:, j] = np.minimum.reduceat(v, starts)
        # band hash = mix64(band, sig values of the band) — one vectorized
        # chain over all (doc, band) rows
        S = sigs.reshape(n, self.n_bands, r)
        band_idx = np.tile(np.arange(self.n_bands, dtype=np.int64), n)
        bh = mix64_vec(band_idx, *[S[:, :, i].reshape(-1) for i in range(r)])
        return pa.table(
            {
                "band": pa.array(band_idx.astype(np.int32)),
                "band_hash": pa.array(bh),
                "doc_id": pa.array(np.repeat(ids, self.n_bands)),
            }
        )


def candidate_pairs(bucket_rows, *, cap: int = 50,
                    new_from: int | None = None,
                    with_stats: bool = False):
    """(band, band_hash, doc_id) rows → distinct candidate (a, b) pairs.

    Shape: hash-partition on the bucket key (the one shuffle — signature
    rows only, never documents) so every bucket lands WHOLE in exactly one
    partition, then vectorized all-pairs-with-cap per partition.  Output is
    therefore a pure function of the bucket rows — independent of batch
    and block boundaries (the earlier sort+batch variant emitted different
    pair sets when a bucket straddled a batch).  ~256 coarse partitions
    keep per-group ``map_groups`` overhead negligible (CLAUDE.md rule 3),
    unlike a per-bucket groupby (measured 146 s at 84k buckets).

    ``new_from`` switches to INCREMENTAL mode (dedup a new crawl shard
    against the existing corpus): ids ≥ ``new_from`` are the new shard
    (shard ids are assigned monotonically, so this is one threshold, not
    a membership set).  Buckets containing no new doc are skipped before
    pairing, and only pairs whose higher side ``b`` is new survive —
    exactly the pairs the full run would emit that involve a new doc
    (pruning skips whole untouched buckets, so cap/chain decisions are
    unchanged).  At index scale the same prune becomes a partition
    filter: store the existing corpus's (band, band_hash) rows as
    band_hash-partitioned parquet and read only partitions the new
    shard's bucket keys hit (the IVF-on-parquet pattern in stages/ann.py).

    ``with_stats=True`` returns ``(pairs, stats)`` where ``stats`` is a
    one-row DataFrame (n_buckets, n_capped, max_bucket) — the "no silent
    caps" contract (the chain fallback past ``cap`` is otherwise
    invisible): n_capped > 0 means some buckets emitted consecutive-chain
    pairs instead of all pairs, so near-dup RECALL within those buckets
    is connectivity-only.  Counters ride the same map_groups pass as
    sentinel rows (a = -1; doc ids are never negative), so no second
    pass over the bucket rows.
    """
    from ..context import num_cpus

    n_part = min(256, max(32, num_cpus() * 4))

    def add_part(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy().astype(np.int64)
        bh = t.column("band_hash").to_numpy().astype(np.uint64, copy=False)
        part = (mix64_vec(band, bh) % np.uint64(n_part)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    empty = pd.DataFrame({"a": np.array([], dtype=np.int64),
                          "b": np.array([], dtype=np.int64)})

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"])
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        n = len(ids)
        if n == 0:
            return empty
        new = np.ones(n, dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        n_buckets = n_capped = max_bucket = 0
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            seg = np.unique(ids[s:e])
            m = len(seg)
            if m < 2:
                continue
            if new_from is not None and seg[-1] < new_from:
                continue  # bucket untouched by the new shard
            n_buckets += 1
            max_bucket = max(max_bucket, m)
            if m <= cap:
                ii, jj = np.triu_indices(m, 1)
                pa_, pb_ = seg[ii], seg[jj]
            else:
                # degenerate hot bucket: consecutive pairs only — keeps the
                # connectivity union-find needs, linear output not quadratic
                n_capped += 1
                pa_, pb_ = seg[:-1], seg[1:]
            if new_from is not None:
                keep_new = pb_ >= new_from
                pa_, pb_ = pa_[keep_new], pb_[keep_new]
            out_a.append(pa_)
            out_b.append(pb_)
        if with_stats:
            # per-partition counter sentinels: a = -1/-2/-3 carry
            # (n_buckets, n_capped, max_bucket) in b
            out_a.append(np.array([-1, -2, -3], dtype=np.int64))
            out_b.append(np.array([n_buckets, n_capped, max_bucket],
                                  dtype=np.int64))
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    raw = (
        bucket_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
    )
    if not with_stats:
        return distinct_rows(raw, ["a", "b"])

    import pyarrow.compute as pc

    raw = raw.materialize()
    stats = raw.map_batches(
        lambda t: t.filter(pc.less(t.column("a"), 0)),
        batch_format="pyarrow").to_pandas()
    pairs = raw.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("a"), 0)),
        batch_format="pyarrow")
    stats_row = pd.DataFrame({
        "n_buckets": [int(stats.loc[stats["a"] == -1, "b"].sum())],
        "n_capped": [int(stats.loc[stats["a"] == -2, "b"].sum())],
        "max_bucket": [int(stats.loc[stats["a"] == -3, "b"].max())
                       if (stats["a"] == -3).any() else 0],
    })
    return distinct_rows(pairs, ["a", "b"]), stats_row


def jaccard_of_texts(ta: str, tb: str, ngram: int = 3) -> float:
    """Exact n-gram Jaccard over shingle-HASH sets (the same sets the LSH
    stage min-hashes, so verify and block agree; 64-bit→31-bit hash
    collisions are the only deviation from string-set Jaccard)."""
    sa, sb = shingle_hashes(ta, ngram), shingle_hashes(tb, ngram)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return (inter / union) if union else 0.0


def verify_pairs_join(pairs_ds, docs_ds, *, id_col: str, text_col: str,
                      ngram: int = 3, threshold: float = 0.8,
                      n_buckets: int = 64):
    """Join-based exact n-gram Jaccard verification — the DEFAULT scale
    path: candidate (a, b) pair rows are hash-joined against the doc
    table on each side (texts of candidate docs only ever move — no
    id→text dict broadcast), then the Jaccard is computed per joined row.

    Returns Dataset (a, b, jaccard) for pairs ≥ threshold.
    """
    import pyarrow.compute as pc

    from ..context import Broadcast
    from ..functions.joins import hash_join

    pairs_ds = pairs_ds.materialize()
    cand = pairs_ds.to_pandas()
    cand_ids = np.unique(np.concatenate([cand["a"].to_numpy(),
                                         cand["b"].to_numpy()])) \
        if len(cand) else np.empty(0, dtype=np.int64)
    ids_bc = Broadcast(np.sort(cand_ids.astype(np.int64)))

    def keep_candidates(t: pa.Table) -> pa.Table:
        ids = ids_bc.get()
        probe = t.column(id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return t.filter(pa.array(np.zeros(len(probe), dtype=bool)))
        pos = np.clip(np.searchsorted(ids, probe), 0, len(ids) - 1)
        return t.filter(pa.array(ids[pos] == probe))

    def renamed(side: str):
        return docs_ds.map_batches(keep_candidates, batch_format="pyarrow") \
            .map_batches(
                lambda t, s=side: pa.table(
                    {s: t.column(id_col),
                     f"text_{s}": t.column(text_col).cast(pa.string())}),
                batch_format="pyarrow")

    joined = hash_join(pairs_ds, renamed("a"), on="a", n_buckets=n_buckets)
    joined = hash_join(joined, renamed("b"), on="b", n_buckets=n_buckets)

    def score(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        # shingle both text columns with the batch kernel (one Arrow
        # split + unique-vocab fingerprints per column); only the
        # per-pair set intersection stays a loop, on int arrays
        fa, la = batch_shingle_hashes(t.column("text_a"), ngram)
        fb, lb = batch_shingle_hashes(t.column("text_b"), ngram)
        sa = np.cumsum(la) - la
        sb = np.cumsum(lb) - lb
        ja = np.zeros(t.num_rows, dtype=np.float64)
        for i in range(t.num_rows):
            xs = fa[sa[i]: sa[i] + la[i]]
            ys = fb[sb[i]: sb[i] + lb[i]]
            inter = np.intersect1d(xs, ys, assume_unique=True).size
            union = xs.size + ys.size - inter
            ja[i] = (inter / union) if union else 0.0
        keep = ja >= threshold
        return pa.table({
            "a": pa.array(a[keep].astype(np.int64)),
            "b": pa.array(b[keep].astype(np.int64)),
            "jaccard": pa.array(ja[keep]),
        })

    return joined.map_batches(score, batch_format="pyarrow")


class JaccardVerifier:
    """Verify candidate pairs with the exact n-gram Jaccard.

    Texts are broadcast once (dict id→text) — the SMALL-case variant;
    :func:`verify_pairs_join` (two hash joins of pair rows against the
    doc table) is the scale default used by the pipelines.
    """

    def __init__(self, texts_bc, *, ngram: int = 3, threshold: float = 0.8):
        self.texts = texts_bc.get()
        self.ngram = ngram
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        for x, y in zip(a, b):
            sim = jaccard_of_texts(self.texts[x], self.texts[y], self.ngram)
            if sim >= self.threshold:
                keep_a.append(x)
                keep_b.append(y)
                sims.append(sim)
        return pa.table(
            {
                "a": pa.array(keep_a, pa.int64()),
                "b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )


def cluster_pairs(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over verified pairs → (doc_id, cluster_id=min member).

    Driver-side by design: the verified near-dup pair set is orders of
    magnitude smaller than the corpus.  Guarded so a pathological pair
    explosion fails loudly instead of OOMing silently.
    """
    if len(pairs_df) > 5_000_000:
        raise ValueError(
            f"{len(pairs_df)} verified pairs — run the groupby min-label "
            "propagation variant instead of driver union-find"
        )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "cluster_id": [r[1] for r in rows]}
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over distinct-word features (unit weights); the word
    hash is mix64(SIMHASH_SEED, rolling-fp(word)) so the DuckDB oracle can
    recompute the fingerprint exactly (__ray_entry__ docs_simhash)."""
    words = sorted(set(_WORD.findall(text.lower())))
    if not words:
        return 0
    hs = mix64_vec(SIMHASH_SEED, _word_fps(words))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, simhash) — simhash emitted as int64 (two's-complement view
    of the uint64 fingerprint) so the SQL oracle's BIGINT matches exactly."""
    ids = batch.column(id_col)
    sh = np.fromiter(
        (simhash64(t) for t in batch.column(text_col).to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    return pa.table({"doc_id": ids, "simhash": pa.array(sh.view(np.int64))})


def simhash_buckets(batch: pa.Table, *, n_bands: int = 4) -> pa.Table:
    """Split the 64-bit simhash into bands; hamming ≤ (n_bands-1) dups share
    at least one exact band (pigeonhole)."""
    sh = batch.column("simhash").to_numpy()
    if sh.dtype != np.uint64:          # int64 view from simhash_batch
        sh = sh.view(np.uint64)
    ids = batch.column("doc_id").to_numpy()
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    o_band, o_val, o_id = [], [], []
    for band in range(n_bands):
        vals = (sh >> np.uint64(band * width)) & mask
        o_band.extend([band] * len(ids))
        o_val.extend(vals.tolist())
        o_id.extend(ids.tolist())
    return pa.table(
        {
            "band": pa.array(o_band, pa.int32()),
            "band_hash": pa.array(np.asarray(o_val, dtype=np.uint64)),
            "doc_id": pa.array(np.asarray(o_id, dtype=np.int64)),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneLSH:
    """Random-hyperplane signature stage for embedding near-dup blocking.

    ``n_bands`` independent hyperplane sets, one bucket row per band
    (cosine-near vectors agree on all planes of SOME band with high
    probability — same banded-LSH recall shape as MinHash).  Feeds the
    same ``candidate_pairs`` → verify → cluster tail as the text dedup.
    """

    def __init__(self, *, dim: int, n_planes: int = 12, n_bands: int = 4,
                 seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        # Gaussian planes via Box-Muller over mix64 draws instead of an
        # opaque RNG: every plane value is a pure function of
        # (seed, band, d, p), so the DuckDB oracle recomputes it exactly
        # (__ray_entry__ embeddings_near_dup).  Top-53-bit uniforms keep
        # the int→double conversion exact on both sides.
        b_idx, d_idx, p_idx = np.indices((n_bands, dim, n_planes))
        h1 = mix64_vec(seed, b_idx, d_idx, p_idx, 1)
        h2 = mix64_vec(seed, b_idx, d_idx, p_idx, 2)
        u1 = ((h1 >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0 ** -53
        u2 = (h2 >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
        self.planes = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        self.n_bands = n_bands
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import list_col_matrix

        vecs = list_col_matrix(batch.column(self.vec_col))
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        o_band, o_hash, o_id = [], [], []
        for band in range(self.n_bands):
            bits = (vecs @ self.planes[band]) > 0
            sig = (bits.astype(np.uint64)
                   << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
            o_band.append(np.full(len(sig), band, dtype=np.int32))
            o_hash.append(sig)
            o_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(o_band)),
                "band_hash": pa.array(np.concatenate(o_hash)),
                "doc_id": pa.array(np.concatenate(o_id)),
            }
        )


class CosineVerifier:
    """Verify embedding candidate pairs with exact cosine similarity.

    Vectors of candidate docs are broadcast as one dense matrix (id-sorted
    rows — candidate sets are LSH-bucket-bounded); per batch the cosine is
    one gathered row-product.
    """

    def __init__(self, ids_bc, vecs_bc, *, threshold: float = 0.9):
        self.ids = ids_bc.get()        # sorted int64
        V = np.asarray(vecs_bc.get(), dtype=np.float64)
        self.V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                1e-12)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        cos = (self.V[ia] * self.V[ib]).sum(axis=1)
        keep = cos >= self.threshold
        return pa.table({
            "a": pa.array(a[keep]),
            "b": pa.array(b[keep]),
            "cosine": pa.array(cos[keep]),
        })


def embedding_near_dup(ds, *, id_col: str = "vec_id",
                       vec_col: str = "embedding", dim: int,
                       n_planes: int = 12, n_bands: int = 4,
                       threshold: float = 0.9, seed: int = 11):
    """Embedding-cosine near-dup pipeline: hyperplane-LSH bands →
    candidate pairs (one signature-row shuffle) → exact cosine verify.

    Returns Dataset (a, b, cosine) of verified near-duplicate pairs.
    """
    from ..context import Broadcast, auto_pool

    buckets = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                               "n_bands": n_bands, "seed": seed,
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096,
        concurrency=auto_pool(0.5),
    )
    pairs = candidate_pairs(buckets).materialize()
    cand = pairs.to_pandas()
    cand_ids = np.unique(np.concatenate([cand["a"].to_numpy(),
                                         cand["b"].to_numpy()])) \
        if len(cand) else np.empty(0, dtype=np.int64)
    cand_ids = np.sort(cand_ids.astype(np.int64))
    ids_bc = Broadcast(cand_ids)

    # gather candidate vectors with one streaming filter pass (ids only
    # broadcast; vectors of candidates — LSH-bounded — come back small)
    def keep(t: pa.Table) -> pa.Table:
        ids = ids_bc.get()
        probe = t.column(id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return t.filter(pa.array(np.zeros(len(probe), dtype=bool)))
        pos = np.clip(np.searchsorted(ids, probe), 0, len(ids) - 1)
        return t.filter(pa.array(ids[pos] == probe))

    cvec_df = ds.map_batches(keep, batch_format="pyarrow").to_pandas() \
        .sort_values(id_col, ignore_index=True)
    vecs = (np.stack(cvec_df[vec_col].to_numpy())
            if len(cvec_df) else np.zeros((0, dim)))
    vecs_bc = Broadcast(vecs)
    return pairs.map_batches(
        CosineVerifier,
        fn_constructor_kwargs={"ids_bc": ids_bc, "vecs_bc": vecs_bc,
                               "threshold": threshold},
        batch_format="pyarrow", concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Band index on storage: bucket-partitioned parquet, probe-pruned reads
# ---------------------------------------------------------------------------

def build_band_index(docs_ds, out_dir: str, *, id_col: str = "doc_id",
                     text_col: str = "text", n_index_parts: int = 64,
                     **minhash_kwargs):
    """Write the EXISTING corpus's LSH bucket rows to storage as parquet
    partitioned by ``ipart = mix64(band, band_hash) % n_index_parts``
    (``out_dir/ipart=<p>/``) — the stored form of the incremental-dedup
    index.  Partitioning on the bucket key means every (band, band_hash)
    bucket lands WHOLE in one partition, so cap/chain decisions made
    after a pruned read are identical to a full read.  Partitions are
    also the resume unit (complete or rewritten whole)."""
    buckets = docs_ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               **minhash_kwargs},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
    )

    def tag(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy().astype(np.int64)
        bh = t.column("band_hash").to_numpy().astype(np.uint64, copy=False)
        ip = (mix64_vec(band, bh) % np.uint64(n_index_parts)).astype(np.int32)
        return t.append_column("ipart", pa.array(ip))

    buckets.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["ipart"])


def incremental_pairs_from_index(index_dir: str, new_ds, *,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 new_from: int, n_index_parts: int = 64,
                                 cap: int = 50, **minhash_kwargs):
    """Probe a stored band index with a NEW shard: signature the new docs,
    read ONLY the index partitions their buckets hit (file-level
    partition pruning — at 100 TB the index read is
    hits/n_index_parts of a full scan), union, and run the incremental
    candidate generation.  Emits exactly the pairs the in-memory
    incremental path emits: pruned partitions contain only buckets the
    new shard never touches, which ``candidate_pairs(new_from=...)``
    would skip anyway, and hit partitions carry their buckets whole."""
    import glob
    import os

    import ray.data as rd

    new_buckets = new_ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               **minhash_kwargs},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
    ).materialize()

    def parts_of(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy().astype(np.int64)
        bh = t.column("band_hash").to_numpy().astype(np.uint64, copy=False)
        ip = np.unique(mix64_vec(band, bh) % np.uint64(n_index_parts))
        return pa.table({"ipart": pa.array(ip.astype(np.int64))})

    import ray

    part_tables = ray.get(
        new_buckets.map_batches(parts_of, batch_format="pyarrow")
        .to_arrow_refs())
    hit = np.unique(np.concatenate(
        [t.column("ipart").to_numpy() for t in part_tables]
        or [np.empty(0, dtype=np.int64)]))
    files: list[str] = []
    for p in hit.tolist():
        d = f"{index_dir.rstrip('/')}/ipart={int(p)}"
        if os.path.isdir(d):
            files.extend(sorted(glob.glob(f"{d}/*.parquet")))
    old = (rd.read_parquet(files, columns=["band", "band_hash", "doc_id"])
           if files else None)
    allb = new_buckets if old is None else old.union(new_buckets)
    return candidate_pairs(allb, cap=cap, new_from=new_from)


def cluster_pairs_min_label(pairs_ds, *, n_buckets: int = 64,
                            max_iters: int = 100,
                            driver_max: int | None = 2_000_000
                            ) -> pd.DataFrame:
    """Distributed connected components over verified pairs — the groupby
    min-label propagation variant :func:`cluster_pairs`' guard points at.

    Every node starts labeled with itself; each round a node's label
    becomes min(own, neighbors') via one hash-join + one groupby-min over
    the symmetrized edge list (self-loops carry the node's own label).
    Labels only decrease, so the label SUM is a monotone convergence
    witness: one tiny aggregate per round, stop when it stops falling.
    Rounds = component diameter — fine for near-clique dup clusters, but
    a Dataset round per hop is pathological on thin-chain graphs
    (measured 167 s on the sf0.01 KG for a ms-sized kernel), so under
    ``driver_max`` edges the identical min-id partition comes from a
    driver union-find (rule 13; parity pinned in tests — pass
    ``driver_max=None`` to force the distributed rounds).
    Returns (doc_id, cluster_id=min member), identical to
    :func:`cluster_pairs` (asserted in tests)."""
    import pyarrow.compute as pc  # noqa: F401

    from ..functions.joins import hash_join

    if driver_max is not None:
        pairs_ds = pairs_ds.materialize()
        if pairs_ds.count() <= driver_max:
            from .ann import _components_min_label

            ed = pairs_ds.to_pandas()
            out = _components_min_label(
                ed["a"].to_numpy(np.int64), ed["b"].to_numpy(np.int64)) \
                .rename(columns={"node": "doc_id",
                                 "component": "cluster_id"})
            return out.astype({"doc_id": np.int64,
                               "cluster_id": np.int64}) \
                .sort_values("doc_id").reset_index(drop=True)

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        return pa.table({
            "u": pa.array(np.concatenate([a, b, nodes])),
            "v": pa.array(np.concatenate([b, a, nodes])),
        })

    esym = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    labels = distinct_rows(esym.map_batches(
        lambda t: pa.table({"node": t.column("u")}),
        batch_format="pyarrow"), ["node"]) \
        .map_batches(lambda t: pa.table({"u": t.column("node"),
                                         "lab": t.column("node")}),
                     batch_format="pyarrow").materialize()
    prev_tot = None
    for _ in range(max_iters):
        msg = hash_join(esym, labels, on="u", n_buckets=n_buckets)
        new = msg.groupby("v").min("lab").map_batches(
            lambda t: pa.table({"u": t.column("v"),
                                "lab": t.column("min(lab)")}),
            batch_format="pyarrow").materialize()
        tot = new.sum("lab")
        if tot == prev_tot:
            labels = new
            break
        prev_tot, labels = tot, new
    out = labels.to_pandas().rename(columns={"u": "doc_id",
                                             "lab": "cluster_id"})
    return out.astype({"doc_id": np.int64, "cluster_id": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def minhash_estimate(docs_ds, *, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 16,
                     n_bands: int = 8, ngram: int = 3) -> pd.DataFrame:
    """MinHash ACCURACY AUDIT: for every LSH candidate pair, the
    signature-based Jaccard estimate (fraction of equal minhash
    components) next to the exact shingle Jaccard and their absolute
    error.  k=16 / r=2 bands ON PURPOSE — the loose bands surface
    weak-similarity candidates whose estimate error is visible (the
    production k=64/r=4 setting would only pair near-identical docs).
    The hot-bucket cap is DISABLED here (the SQL twin enumerates every
    bucket pair); the production pipeline keeps it.

    Pair generation runs the normal bucket shuffle; the audit tail
    (signatures + shingle sets for the INVOLVED docs only) collects
    driver-side — candidate pairs are audit-sized.  At corpus scale the
    same est/true columns attach per joined row of verify_pairs_join."""
    import ray as _ray

    from ..context import Broadcast, auto_pool

    buckets = docs_ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "k": k, "n_bands": n_bands, "ngram": ngram},
        batch_format="pyarrow", batch_size=2048, concurrency=auto_pool())
    pdf = candidate_pairs(buckets, cap=1 << 30).to_pandas() \
        .astype({"a": np.int64, "b": np.int64})
    if not len(pdf):
        return pd.DataFrame({"a": np.empty(0, np.int64),
                             "b": np.empty(0, np.int64),
                             "est_j": np.empty(0, np.float64),
                             "true_j": np.empty(0, np.float64),
                             "abs_err": np.empty(0, np.float64)})
    involved = np.unique(np.concatenate([pdf["a"].to_numpy(),
                                         pdf["b"].to_numpy()]))
    inv_bc = Broadcast(involved)
    a_p, b_p = _perm_params(k, PERM_SEED)

    def audit_rows(t: pa.Table) -> pa.Table:
        inv = inv_bc.get()
        ids = t.column(id_col).to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(inv, ids), 0, len(inv) - 1)
        keep = inv[pos] == ids
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        t = t.filter(pa.array(keep))
        ids = ids[keep]
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        sigs = np.full((len(ids), k), _MERSENNE, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            starts = (np.cumsum(lens) - lens)[nz]
            for j in range(k):
                v = (a_p[j] * flat + b_p[j]) % _MERSENNE
                sigs[nz, j] = np.minimum.reduceat(v, starts)
        # sig rows (doc, j, sig) + shingle rows (doc, -1, x) in one table
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.concatenate(
                [np.repeat(ids, k), np.repeat(ids, lens)])),
            "j": pa.array(np.concatenate(
                [np.tile(np.arange(k, dtype=np.int64), n),
                 np.full(int(lens.sum()), -1, np.int64)])),
            "sig": pa.array(np.concatenate(
                [sigs.ravel(), np.zeros(int(lens.sum()), np.int64)])),
            "x": pa.array(np.concatenate(
                [np.zeros(n * k, np.int64), flat]))})

    rows = pa.concat_tables([t for t in _ray.get(
        docs_ds.map_batches(audit_rows, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]).to_pandas()
    sig_rows = rows[rows["j"] >= 0]
    sh_rows = rows[rows["j"] < 0]
    idx = {d: i for i, d in enumerate(involved)}
    S = np.full((len(involved), k), _MERSENNE, dtype=np.int64)
    S[sig_rows[id_col].map(idx).to_numpy(),
      sig_rows["j"].to_numpy()] = sig_rows["sig"].to_numpy()
    sets = {d: np.sort(g["x"].to_numpy(np.int64))
            for d, g in sh_rows.groupby(id_col)}
    empty = np.empty(0, np.int64)
    ai = pdf["a"].map(idx).to_numpy()
    bi = pdf["b"].map(idx).to_numpy()
    est = (S[ai] == S[bi]).sum(axis=1) / float(k)
    tj = np.empty(len(pdf))
    for i, (da, db) in enumerate(zip(pdf["a"], pdf["b"])):
        sa, sb = sets.get(da, empty), sets.get(db, empty)
        ni = len(np.intersect1d(sa, sb, assume_unique=True))
        un = len(sa) + len(sb) - ni
        tj[i] = ni / un if un else 0.0
    out = pd.DataFrame({
        "a": pdf["a"].to_numpy(), "b": pdf["b"].to_numpy(),
        "est_j": half_up(est, 6), "true_j": half_up(tj, 6),
        "abs_err": half_up(np.abs(est - tj), 6)})
    return out.sort_values(["a", "b"], ignore_index=True)


def containment_audit(docs_ds, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 16,
                      n_bands: int = 8, ngram: int = 3) -> pd.DataFrame:
    """ASYMMETRIC near-dup audit: for every LSH candidate pair the
    shingle-set sizes, the exact intersection, and BOTH containment
    scores |A∩B|/|A| and |A∩B|/|B| — the quote/subset detector Jaccard
    misses (a short doc fully contained in a long one has low Jaccard
    but containment ≈ 1).  Same loose k=16/r=2 bucket generation as
    :func:`minhash_estimate` (cap disabled; the SQL twin enumerates
    every bucket pair); the audit tail collects shingle sets for the
    INVOLVED docs only."""
    import ray as _ray

    from ..context import Broadcast, auto_pool

    buckets = docs_ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "k": k, "n_bands": n_bands,
                               "ngram": ngram},
        batch_format="pyarrow", batch_size=2048, concurrency=auto_pool())
    pdf = candidate_pairs(buckets, cap=1 << 30).to_pandas() \
        .astype({"a": np.int64, "b": np.int64})
    cols = ["a", "b", "n_a", "n_b", "n_inter", "cont_a", "cont_b"]
    if not len(pdf):
        return pd.DataFrame({c: np.empty(0) for c in cols})
    involved = np.unique(np.concatenate([pdf["a"].to_numpy(),
                                         pdf["b"].to_numpy()]))
    inv_bc = Broadcast(involved)

    def sh_rows(t: pa.Table) -> pa.Table:
        inv = inv_bc.get()
        ids = t.column(id_col).to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(inv, ids), 0, len(inv) - 1)
        keep = inv[pos] == ids
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        t = t.filter(pa.array(keep))
        ids = ids[keep]
        flat, lens = batch_shingle_hashes(t.column(text_col), ngram)
        return pa.table({id_col: pa.array(np.repeat(ids, lens)),
                         "x": pa.array(flat)})

    rows = pa.concat_tables([t for t in _ray.get(
        docs_ds.map_batches(sh_rows, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]).to_pandas()
    sets = {d: np.unique(g["x"].to_numpy(np.int64))
            for d, g in rows.groupby(id_col)}
    empty = np.empty(0, np.int64)
    na = np.empty(len(pdf), np.int64)
    nb = np.empty(len(pdf), np.int64)
    ni = np.empty(len(pdf), np.int64)
    for i, (da, db) in enumerate(zip(pdf["a"], pdf["b"])):
        sa, sb = sets.get(da, empty), sets.get(db, empty)
        na[i], nb[i] = len(sa), len(sb)
        ni[i] = len(np.intersect1d(sa, sb, assume_unique=True))
    out = pd.DataFrame({
        "a": pdf["a"].to_numpy(), "b": pdf["b"].to_numpy(),
        "n_a": na, "n_b": nb, "n_inter": ni,
        "cont_a": half_up(ni / np.maximum(na, 1).astype(np.float64), 6),
        "cont_b": half_up(ni / np.maximum(nb, 1).astype(np.float64), 6)})
    return out.sort_values(["a", "b"], ignore_index=True)
