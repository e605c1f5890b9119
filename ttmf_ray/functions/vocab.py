"""Vocab build + id mapping (SURVEY.md A1/M1/M2/S3).

The reference enumerates a Python set to assign ids
(/root/reference/get_triples/process_triples.py:83-84) — a
nondeterministic order.  Here ids are SORT-ASSIGNED: the id of a name is
its rank in the lexicographically sorted distinct-name list, which is
reproducible across runs/resumes (SURVEY.md §7.5 item 3).

The distinct set is computed distributed (per-batch combiner + groupby);
the final rank assignment broadcasts the sorted name array and maps ids
via ``np.searchsorted`` per batch — valid while the vocabulary fits a
node (far beyond FB15K scale; for larger vocabs swap the broadcast for a
sort + per-block offset cumsum, same ordering semantics).

Column-order quirk replicated from the reference: id-mapped triples are
``(h, t, r)`` — head, TAIL, relation —
(/root/reference/get_triples/process_triples.py:18-24 reorders [[0,2,1]]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast, auto_pool
from ..stages.dedup import distinct_rows


def distinct_values(ds, cols: list[str]):
    """Distinct union of the values appearing in ``cols`` → Dataset['name']."""

    def project(t: pa.Table) -> pa.Table:
        arrs = [t.column(c) for c in cols]
        names = pa.concat_arrays(
            [a.combine_chunks().cast(pa.string()) for a in arrs]
        )
        return pa.table({"name": names.unique()})

    return distinct_rows(
        ds.map_batches(project, batch_format="pyarrow"), ["name"]
    )


def build_vocab(edges_ds) -> tuple[pd.DataFrame, pd.DataFrame]:
    """edge Dataset (subj, pred, obj) → (entity_vocab, relation_vocab).

    Each vocab is a pandas DataFrame (name, id) with sort-assigned ids —
    entity names from subj ∪ obj (the reference's head∪tail union, D1),
    relation names from pred.

    Shape: ONE streaming pass — every batch emits its DISTINCT
    (kind, name) pairs (kind 0 = entity, 1 = relation), the per-block
    vocabularies concatenate on the driver, np.unique assigns sort-order
    ids.  No all-to-all: the reduce payload is Σ_blocks |block vocab|,
    vocab-bounded per block (Zipf-bounded name domains), not
    corpus-bounded.  Replaced two sequential distinct shuffles — measured
    10.4 s → ~1 s at 679k edges / 16 cpus; the shuffle path
    (``distinct_values`` + sort) remains the right tool for an open
    vocabulary too large to collect (≳5e7 names, where the id-broadcast
    in ``IdMapper`` stops fitting anyway — see module docstring).
    """
    import pyarrow.compute as pc

    def _uniq(ca) -> pa.Array:
        u = pc.unique(ca)
        return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u

    def batch_vocab(t: pa.Table) -> pa.Table:
        def chunks(c):
            arr = t.column(c).cast(pa.string())
            return list(arr.chunks) if isinstance(arr, pa.ChunkedArray) \
                else [arr]

        ents = _uniq(pa.chunked_array(chunks("subj") + chunks("obj")))
        rels = _uniq(pa.chunked_array(chunks("pred")))
        kind = np.concatenate([np.zeros(len(ents), dtype=np.int8),
                               np.ones(len(rels), dtype=np.int8)])
        return pa.table({"kind": pa.array(kind),
                         "name": pa.concat_arrays([ents, rels])})

    parts = edges_ds.map_batches(batch_vocab, batch_format="pyarrow") \
        .to_pandas()
    kind = parts["kind"].to_numpy()
    names = parts["name"].to_numpy()
    ents = np.unique(names[kind == 0])
    rels = np.unique(names[kind == 1])
    ent_df = pd.DataFrame({"name": ents, "id": np.arange(len(ents), dtype=np.int32)})
    rel_df = pd.DataFrame({"name": rels, "id": np.arange(len(rels), dtype=np.int32)})
    return ent_df, rel_df


UNKENT = "UNKENT"   # reference OOV tokens (train_test_split.py:15-16,45-48)
UNKREL = "UNKREL"


def apply_unk(edges_ds, ent_df: pd.DataFrame, rel_df: pd.DataFrame):
    """M4: replace out-of-vocab entities/relations with UNKENT/UNKREL
    (`train_test_split.py:15-16,45-48` — the reference rewrites the full
    triple table against the TRAIN vocab; rows are kept, not dropped)."""
    ent_bc = Broadcast(ent_df["name"].to_numpy(dtype=object))
    rel_bc = Broadcast(rel_df["name"].to_numpy(dtype=object))

    def repl(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ents = pa.array(ent_bc.get(), pa.string())
        rels = pa.array(rel_bc.get(), pa.string())
        out = {}
        for col, vocab, tok in (("subj", ents, UNKENT),
                                ("pred", rels, UNKREL),
                                ("obj", ents, UNKENT)):
            arr = t.column(col)
            known = pc.is_in(arr, value_set=vocab)
            out[col] = pc.if_else(known, arr, pa.scalar(tok))
        return pa.table(out)

    return edges_ds.map_batches(repl, batch_format="pyarrow")


def split_with_unk(df: pd.DataFrame, *, train_frac: float = 0.8,
                   dev_frac: float = 0.5, seed: int = 628):
    """The reference's train/dev/test prep (`train_test_split.py:33-48`):
    seeded split, test filtered to train-vocab triples (J7/M3 semi-join),
    OOV in the full table replaced with UNK tokens, and ONE UNK triple
    appended to train.  Returns (train, dev, test, unk_table).

    Driver-side pandas by design: this is the reference's data-prep entry
    (single-process in the reference too); the Ray-scale variant is
    ``split_edges`` + ``apply_unk``.
    """
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(df))
    n_train = int(len(df) * train_frac)
    train = df.iloc[perm[:n_train]].reset_index(drop=True)
    rest = df.iloc[perm[n_train:]].reset_index(drop=True)
    uniq_ent = set(train["subj"]) | set(train["obj"])
    uniq_rel = set(train["pred"])
    rest = rest[rest["subj"].isin(uniq_ent) & rest["obj"].isin(uniq_ent)
                & rest["pred"].isin(uniq_rel)].reset_index(drop=True)
    n_dev = int(len(rest) * dev_frac)
    dev, test = rest.iloc[:n_dev], rest.iloc[n_dev:]
    unk_table = df.copy()
    unk_table.loc[~unk_table["subj"].isin(uniq_ent), "subj"] = UNKENT
    unk_table.loc[~unk_table["pred"].isin(uniq_rel), "pred"] = UNKREL
    unk_table.loc[~unk_table["obj"].isin(uniq_ent), "obj"] = UNKENT
    train = pd.concat(
        [train, pd.DataFrame([{"subj": UNKENT, "pred": UNKREL,
                               "obj": UNKENT}])], ignore_index=True)
    return train, dev.reset_index(drop=True), test.reset_index(drop=True), \
        unk_table


class IdMapper:
    """map_batches stage: (subj, pred, obj) strings → (h, t, r) int32.

    Broadcast sorted-name arrays; ids via searchsorted (vectorized).
    Note the (h, t, r) column order (head, tail, relation).
    """

    def __init__(self, ent_bc: Broadcast, rel_bc: Broadcast):
        self.ents = np.asarray(ent_bc.get(), dtype=object)
        self.rels = np.asarray(rel_bc.get(), dtype=object)

    def _lookup(self, sorted_names: np.ndarray, values: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(sorted_names, values)
        idx = np.clip(idx, 0, len(sorted_names) - 1)
        miss = sorted_names[idx] != values
        out = idx.astype(np.int32)
        out[miss] = -1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = np.asarray(batch.column("subj").to_pylist(), dtype=object)
        preds = np.asarray(batch.column("pred").to_pylist(), dtype=object)
        objs = np.asarray(batch.column("obj").to_pylist(), dtype=object)
        return pa.table(
            {
                "h": pa.array(self._lookup(self.ents, subs)),
                "t": pa.array(self._lookup(self.ents, objs)),
                "r": pa.array(self._lookup(self.rels, preds)),
            }
        )


def id_map_edges(edges_ds, ent_df: pd.DataFrame, rel_df: pd.DataFrame):
    """Edges (strings) → id-mapped (h, t, r) Dataset (drops unmappable rows)."""
    import pyarrow.compute as pc

    ent_bc = Broadcast(ent_df["name"].to_numpy(dtype=object))
    rel_bc = Broadcast(rel_df["name"].to_numpy(dtype=object))
    mapped = edges_ds.map_batches(
        IdMapper,
        fn_constructor_kwargs={"ent_bc": ent_bc, "rel_bc": rel_bc},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=auto_pool(),
    )
    return mapped.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.greater_equal(t.column("h"), 0),
                        pc.greater_equal(t.column("t"), 0)),
                pc.greater_equal(t.column("r"), 0),
            )
        ),
        batch_format="pyarrow",
    )


class IdUnmapper:
    """Inverse map (M2): (h, t, r[, ...]) ints → strings for reports."""

    def __init__(self, ent_bc: Broadcast, rel_bc: Broadcast):
        self.ents = np.asarray(ent_bc.get(), dtype=object)
        self.rels = np.asarray(rel_bc.get(), dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy()
        t = batch.column("t").to_numpy()
        r = batch.column("r").to_numpy()
        out = pa.table(
            {
                "subj": pa.array(self.ents[h], pa.string()),
                "pred": pa.array(self.rels[r], pa.string()),
                "obj": pa.array(self.ents[t], pa.string()),
            }
        )
        for name in batch.column_names:
            if name not in ("h", "t", "r"):
                out = out.append_column(name, batch.column(name))
        return out
