"""Splits + negative-example generation (SURVEY.md O4/O5/O6/D4).

The reference's corruption sampling is UNSEEDED (`Data.java:60`,
`process_triples.py:53`); ours is seeded per (seed, partition) so every
output is reproducible — tests depend on it (SURVEY.md §7.5 item 7).

Split is an arithmetic hash of the triple ids (no shuffle, no RNG):
``bucket = mix(h, t, r) % 10`` → train(0-7)/valid(8)/test(9) by default —
the deterministic stand-in for the reference's seeded sklearn split
(`train_test_split.py:33`, random_state=628).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import Broadcast, auto_pool

# Knuth-style multiplicative constants; the formula is fixed because the
# DuckDB oracle mirrors it literally in SQL (no library hash involved).
_A, _B, _C = 2654435761, 40503, 2246822519
_MOD = 1 << 31


def split_bucket(h: np.ndarray, t: np.ndarray, r: np.ndarray) -> np.ndarray:
    """bucket in [0, 10): ((h*A + t*B + r*C) mod 2^31) mod 10 — SQL-mirrored."""
    v = (
        h.astype(np.int64) * _A + t.astype(np.int64) * _B + r.astype(np.int64) * _C
    ) % _MOD
    return (v % 10).astype(np.int32)


def add_split_column(batch: pa.Table) -> pa.Table:
    b = split_bucket(
        batch.column("h").to_numpy(),
        batch.column("t").to_numpy(),
        batch.column("r").to_numpy(),
    )
    split = np.where(b < 8, "train", np.where(b == 8, "valid", "test"))
    return batch.append_column("split", pa.array(split, pa.string()))


def split_edges(ds):
    """(h,t,r) Dataset → (train_ds, valid_ds, test_ds) by arithmetic hash."""
    import pyarrow.compute as pc

    tagged = ds.map_batches(add_split_column, batch_format="pyarrow")

    def part(name):
        return tagged.map_batches(
            lambda t, name=name: t.filter(
                pc.equal(t.column("split"), pa.scalar(name))
            ).drop_columns(["split"]),
            batch_format="pyarrow",
        )

    return part("train"), part("valid"), part("test")


def pack_triples(h, t, r, *, n_entities: int, n_relations: int) -> np.ndarray:
    """Injective uint64 key per (h,t,r): (h·|E| + t)·|R| + r.

    Valid while |E|²·|R| < 2^64 (≈ 4M entities at 1k relations — far past
    FB15K scale; beyond that, swap for a two-level sorted (h,t)/(r) probe,
    same membership semantics).  A sorted packed array replaces the gold
    frozenset broadcast: ~16 bytes/triple of Python heap become 8 bytes of
    shared numpy, and membership is a vectorized ``searchsorted`` instead
    of a per-row ``in``.
    """
    ne, nr = int(n_entities), int(n_relations)
    if ne * ne * nr >= (1 << 64):
        raise ValueError("packed-key space overflow; use two-level probe")
    h = np.asarray(h, dtype=np.uint64)
    t = np.asarray(t, dtype=np.uint64)
    r = np.asarray(r, dtype=np.uint64)
    return (h * np.uint64(ne) + t) * np.uint64(nr) + r


def packed_membership(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean mask: probe ∈ sorted_keys (vectorized)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_keys, probe), 0,
                  len(sorted_keys) - 1)
    return sorted_keys[pos] == probe


class NegativeSampler:
    """map_batches actor: 1:1 head-or-tail corruption with flag ±1 (D4).

    Replicates `KGE/src/data/Data.java:52-77` semantics: for each positive
    (flag 1) emit one corrupted copy (flag -1) with head or tail replaced
    (p=0.5) by a uniform entity, re-drawn while the corrupt triple exists
    in the gold set.  Gold membership is a broadcast SORTED PACKED-KEY
    array (searchsorted per batch); draws are fully vectorized — the
    redraw loop iterates only over still-colliding rows.
    Seeded per (seed, h, t, r) — order-independent, resume-stable, and
    bit-identical to the original per-row mix64 loop.
    """

    def __init__(self, gold_bc, *, n_entities: int,
                 n_relations: int, seed: int = 628):
        # Broadcast ref (actor path) or the sorted packed array itself
        # (driver fast path — labeled_examples_local)
        self.gold = gold_bc.get() if hasattr(gold_bc, "get") else gold_bc
        self.n_entities = n_entities
        self.n_relations = n_relations
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.pages import mix64_vec

        h = batch.column("h").to_numpy().astype(np.int64)
        t = batch.column("t").to_numpy().astype(np.int64)
        r = batch.column("r").to_numpy().astype(np.int64)
        n, ne = len(h), self.n_entities
        corrupt_head = mix64_vec(self.seed, 1, h, t, r) % np.uint64(2) == 0
        nh, nt = h.copy(), t.copy()
        pending = np.arange(n)
        draw = 0
        while len(pending):
            e = (mix64_vec(self.seed, 2, h[pending], t[pending], r[pending],
                           draw) % np.uint64(ne)).astype(np.int64)
            ch = corrupt_head[pending]
            nh[pending] = np.where(ch, e, h[pending])
            nt[pending] = np.where(ch, t[pending], e)
            probe = pack_triples(nh[pending], nt[pending], r[pending],
                                 n_entities=ne, n_relations=self.n_relations)
            pending = pending[packed_membership(self.gold, probe)]
            draw += 1
        oh = np.empty(2 * n, dtype=np.int32)
        ot = np.empty(2 * n, dtype=np.int32)
        orr = np.empty(2 * n, dtype=np.int32)
        ofl = np.empty(2 * n, dtype=np.int8)
        oh[0::2], oh[1::2] = h, nh
        ot[0::2], ot[1::2] = t, nt
        orr[0::2], orr[1::2] = r, r
        ofl[0::2], ofl[1::2] = 1, -1
        return pa.table(
            {
                "h": pa.array(oh),
                "t": pa.array(ot),
                "r": pa.array(orr),
                "flag": pa.array(ofl),
            }
        )


def labeled_examples(pos_ds, gold, *, n_entities: int, n_relations: int,
                     seed: int = 628):
    """Positive (h,t,r) Dataset → labeled (h,t,r,flag) with 1:1 negatives.

    ``gold`` is the full gold triple set: an (n,3) int array (preferred),
    a frozenset of (h,t,r) tuples (converted), or a ``Broadcast`` whose
    value is the pre-sorted packed-key array (streaming mode — the gold
    set then never lands on the driver heap).
    """
    from ..context import spread

    if isinstance(gold, Broadcast):
        bc = gold
    else:
        if isinstance(gold, (set, frozenset)):
            gold = np.array(sorted(gold), dtype=np.int64).reshape(-1, 3)
        gold = np.asarray(gold)
        packed = np.sort(pack_triples(gold[:, 0], gold[:, 1], gold[:, 2],
                                      n_entities=n_entities,
                                      n_relations=n_relations))
        bc = Broadcast(packed)
    return spread(pos_ds).map_batches(
        NegativeSampler,
        fn_constructor_kwargs={"gold_bc": bc, "n_entities": n_entities,
                               "n_relations": n_relations, "seed": seed},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=auto_pool(),
    )


def labeled_examples_local(pos_df, gold_packed: np.ndarray, *,
                           n_entities: int, n_relations: int,
                           seed: int = 628):
    """Driver-side twin of :func:`labeled_examples` for SMALL splits:
    same seeded per-(h,t,r) kernel ⇒ bit-identical rows; skips the Ray
    round-trip (from_pandas + spread + actor pool + collect), which
    measured ~2.5 s of trust critical path for a 24k-row split.

    ``gold_packed`` is the pre-sorted packed gold-key array (share it
    across the valid/test calls instead of re-packing per call).
    """
    sampler = NegativeSampler(gold_packed, n_entities=n_entities,
                              n_relations=n_relations, seed=seed)
    tbl = pa.Table.from_pandas(pos_df[["h", "t", "r"]],
                               preserve_index=False)
    return sampler(tbl).to_pandas()


def deterministic_sample(ds, *, n: int, key_cols: list[str],
                         seed: int = 628,
                         tiebreak_cols: list[str] | None = None):
    """Seeded size-``n`` subsample: the n rows whose mix64(seed, 4, *keys)
    hash is smallest (ties broken by key_cols, then tiebreak_cols).

    The scalable stand-in for the reference's ``total_size`` downsample
    (`get_triples/train_test_split.py:33,38-39`, sklearn split with
    random_state=628): hash-order selection is a per-batch partial top-n
    + one tiny merge — no global sort, no RNG state, order-independent,
    and exactly SQL-mirrorable (ORDER BY mix64 LIMIT n).
    ``key_cols + tiebreak_cols`` must order rows totally (up to fully
    identical rows) for a well-defined result.
    """
    from ..sources.pages import mix64_vec

    order_cols = key_cols + (tiebreak_cols or [])

    def hash_of(t: pa.Table) -> np.ndarray:
        cols = [t.column(c).to_numpy() for c in key_cols]
        return mix64_vec(seed, 4, *cols).astype(np.uint64)

    def prune(t: pa.Table) -> pa.Table:
        h = hash_of(t)
        if len(h) > n:
            # exact per-batch top-n under the same total order as the
            # final cut — top-n selection is associative, so the merge of
            # per-batch winners contains the global winners
            keep = np.lexsort(tuple(
                t.column(c).to_numpy() for c in reversed(order_cols))
                + (h,))[:n]
            t = t.take(pa.array(keep))
        return t

    def final(t: pa.Table) -> pa.Table:
        h = hash_of(t)
        order = np.lexsort(tuple(
            t.column(c).to_numpy() for c in reversed(order_cols)) + (h,))[:n]
        return t.take(pa.array(order))

    return (ds.map_batches(prune, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def label_onehot(batch: pa.Table) -> pa.Table:
    """flag 1 → [0,1], else [1,0] (`PrecessData.py:150-153`)."""
    fl = batch.column("flag").to_numpy()
    onehot = np.zeros((len(fl), 2), dtype=np.int8)
    onehot[fl == 1, 1] = 1
    onehot[fl != 1, 0] = 1
    return batch.append_column(
        "label", pa.FixedSizeListArray.from_arrays(onehot.reshape(-1), 2)
    )


_SLOT_ID = {"head": 11, "tail": 12, "rel": 13}


class KGCNegatives:
    """k-per-positive corruption for one slot (hr_/h_t/_rt files, D4 variant).

    Replicates `process_triples.py:35-63`: dedup on the kept columns,
    then per kept-pair emit ``k`` uniform draws over the value vocab plus
    the original value (all with label 1, as the reference does).
    ``slot``: 2 = corrupt r's... — in reference terms target column 2 is
    'r' of the (h, t, r) layout; we name slots "tail"/"rel"/"head".

    CONTRACT: input rows must already be distinct on the KEPT columns
    (use :func:`kgc_negatives`, which dedups upstream with a Ray groupby
    choosing the min non-kept value as representative) — a per-batch seen
    set cannot dedup across batches/partitions.  Draws are keyed off the
    kept columns only, so the output is independent of which duplicate
    row survived the upstream dedup.  Fully vectorized.
    """

    def __init__(self, *, slot: str, vocab_size: int, k: int = 5, seed: int = 628):
        assert slot in ("head", "tail", "rel")
        self.slot, self.vocab_size, self.k, self.seed = slot, vocab_size, k, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.pages import mix64_vec

        h = batch.column("h").to_numpy().astype(np.int64)
        t = batch.column("t").to_numpy().astype(np.int64)
        r = batch.column("r").to_numpy().astype(np.int64)
        kept0, kept1, orig = {
            "head": (t, r, h), "tail": (h, r, t), "rel": (h, t, r)
        }[self.slot]
        n, k = len(h), self.k
        # (n, k) draw matrix, keyed (seed, 3, slot, kept0, kept1, j)
        j = np.arange(k, dtype=np.int64)
        draws = (
            mix64_vec(self.seed, 3, _SLOT_ID[self.slot],
                      kept0[:, None], kept1[:, None], j[None, :])
            % np.uint64(self.vocab_size)
        ).astype(np.int64)
        vals = np.concatenate([draws, orig[:, None]], axis=1).reshape(-1)
        rep = lambda a: np.repeat(a, k + 1)  # noqa: E731
        out = {"h": rep(h), "t": rep(t), "r": rep(r)}
        out[{"head": "h", "tail": "t", "rel": "r"}[self.slot]] = vals
        return pa.table(
            {
                "h": pa.array(out["h"].astype(np.int32)),
                "t": pa.array(out["t"].astype(np.int32)),
                "r": pa.array(out["r"].astype(np.int32)),
                "flag": pa.array(np.ones(n * (k + 1), dtype=np.int8)),
            }
        )


def kgc_negatives(ds, *, slot: str, vocab_size: int, k: int = 5,
                  seed: int = 628):
    """(h,t,r) Dataset → KGC corruption rows for ``slot`` (global dedup).

    The kept-column dedup is a Ray groupby (min non-kept value as the
    deterministic representative — the reference's groupby(ix).first()
    on an ordered frame, `process_triples.py:38-39`), so duplicates can
    NOT leak across batches/partitions.
    """
    from ray.data.aggregate import Min

    from ..context import spread

    kept = {"head": ["t", "r"], "tail": ["h", "r"], "rel": ["h", "t"]}[slot]
    other = {"head": "h", "tail": "t", "rel": "r"}[slot]
    deduped = (
        ds.select_columns(["h", "t", "r"])
        .groupby(kept)
        .aggregate(Min(other, alias_name=other))
    )
    return spread(deduped).map_batches(
        KGCNegatives,
        fn_constructor_kwargs={"slot": slot, "vocab_size": vocab_size,
                               "k": k, "seed": seed},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=auto_pool(0.5),
    )
