"""Entity linking / canonicalization via groupby-aggregate surface-form
clustering (phase A), with the two-phase salted-aggregation pattern for
hot-entity skew (SURVEY.md §7.4; north_rule names this explicitly).

Semantics: mentions are clustered by a deterministic normalized key
(lowercase, collapse whitespace, strip edge punctuation); each cluster
elects a canonical representative.  Two representative policies:

- ``"frequency"``: most frequent raw surface in the cluster, ties broken
  lexicographically (the generic entity-linking behavior);
- ``"titlecase"``: ``norm_key.title()`` (the policy matched to the synthetic
  corpus oracle, where canonical forms are title-cased).

Skew handling: a bare ``groupby(norm_key)`` would ship every mention of a
hub entity to one reducer.  Instead phase 1 pre-aggregates per batch
(``(norm_key, surface) → count``) inside ``map_batches`` — the combiner —
so the shuffle moves at most (#distinct surfaces per key × #blocks) rows,
and the optional explicit salt splits a hot key across ``n_salt``
sub-reducers whose partials are merged in a second, tiny groupby.
"""

from __future__ import annotations

import re
import string
from collections import Counter

import pandas as pd
import pyarrow as pa

from ..context import Broadcast

_WS = re.compile(r"\s+")
_EDGE_PUNCT = string.punctuation + string.whitespace


def norm_key(surface: str) -> str:
    """Deterministic normalization key for a surface form."""
    s = _WS.sub(" ", surface).strip(_EDGE_PUNCT).lower()
    return s


def _partial_counts(batch: pa.Table, cols: list[str]) -> pa.Table:
    """Per-batch combiner: mention surfaces → (norm_key, surface, cnt)."""
    c: Counter = Counter()
    for col in cols:
        for s in batch.column(col).to_pylist():
            c[(norm_key(s), s)] += 1
    keys = list(c.keys())
    return pa.table(
        {
            "norm_key": pa.array([k[0] for k in keys], pa.string()),
            "surface": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def build_alias_table(
    mentions,  # ray.data.Dataset with surface columns
    surface_cols: list[str],
    *,
    policy: str = "frequency",
    n_salt: int = 0,
) -> pd.DataFrame:
    """(norm_key, canonical) alias/linking table as a pandas DataFrame.

    Distributed part: per-batch combiner (the Counter in
    ``_partial_counts``) + a hash-shuffle Sum over (norm_key, surface) —
    this is where the 100-TB mention stream reduces to vocab size.  The
    election itself is vectorized on the (small) aggregate.

    ``n_salt > 1`` inserts the two-level salted aggregation for extreme
    hub surfaces — groupby (norm_key, surface, salt) first, then merge
    the per-salt partials — the pattern the north rule names; with the
    combiner already bounding per-key fan-in it changes results not at
    all (tests assert exact equality with the unsalted path).
    """
    from ray.data.aggregate import Sum

    partials = mentions.map_batches(
        lambda b: _partial_counts(b, surface_cols), batch_format="pyarrow"
    )

    if n_salt and n_salt > 1:
        def add_salt(b: pa.Table) -> pa.Table:
            import zlib

            import numpy as np

            # stable across processes (unlike builtin hash with PYTHONHASHSEED)
            salt = np.fromiter(
                (
                    zlib.crc32(s.encode("utf-8")) % n_salt
                    for s in b.column("surface").to_pylist()
                ),
                dtype=np.int64,
                count=b.num_rows,
            )
            return b.append_column("salt", pa.array(salt))

        partials = (
            partials.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["norm_key", "surface", "salt"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )

    agg = (
        partials.groupby(["norm_key", "surface"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if policy == "titlecase":
        keys = agg["norm_key"].drop_duplicates().sort_values()
        return pd.DataFrame({"norm_key": keys.to_numpy(),
                             "canonical": [k.title() for k in keys]})
    agg = agg.sort_values(["norm_key", "cnt", "surface"],
                          ascending=[True, False, True])
    first = agg.drop_duplicates("norm_key", keep="first")
    return pd.DataFrame({"norm_key": first["norm_key"].to_numpy(),
                         "canonical": first["surface"].to_numpy()})


def canonicalize_inline_batch(batch: pa.Table) -> pa.Table:
    """Rule-policy canonicalization fused into the extraction pass.

    For deterministic representative policies (titlecase of the normalized
    key) the alias table is redundant — canonical(surface) is a pure
    function — so phase A collapses to ONE pass over pages + one dedup
    shuffle.  The groupby-clustering path (``build_alias_table`` +
    ``CanonicalizeTriples``) remains the generic policy for corpus-elected
    representatives.
    """
    subs = [norm_key(s).title()
            for s in batch.column("subj_surface").to_pylist()]
    objs = [norm_key(s).title()
            for s in batch.column("obj_surface").to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "subj": pa.array(subs, pa.string()),
            "pred": batch.column("pred"),
            "obj": pa.array(objs, pa.string()),
        }
    )


class CanonicalizeTriples:
    """Actor-pool stage: map surface triples → canonical triples.

    The alias table is broadcast once (``ray.put``) and fetched from the
    local object store per actor — never re-shipped per batch.  At corpus
    scale where the alias table itself outgrows worker memory, swap this
    stage for a hash-partitioned join on norm_key (bucket groupby); the
    broadcast path is correct whenever #distinct surfaces fits a node,
    which holds far beyond FB15K-scale vocabularies.
    """

    def __init__(self, alias_bc: Broadcast):
        alias = alias_bc.get()  # pandas DataFrame (norm_key, canonical)
        self.alias = dict(zip(alias["norm_key"], alias["canonical"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        amap = self.alias
        subs = [
            amap.get(norm_key(s), s)
            for s in batch.column("subj_surface").to_pylist()
        ]
        objs = [
            amap.get(norm_key(s), s)
            for s in batch.column("obj_surface").to_pylist()
        ]
        out = pa.table(
            {
                "url": batch.column("url"),
                "subj": pa.array(subs, pa.string()),
                "pred": batch.column("pred"),
                "obj": pa.array(objs, pa.string()),
            }
        )
        return out
