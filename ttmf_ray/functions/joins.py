"""Partitioned hash join for two LARGE sides (SURVEY.md §2.4 scale path).

When neither side fits a broadcast, the portable Ray Data pattern is an
explicit bucket join: tag every row of both sides with
``bucket = key % B``, union the tagged datasets, group by bucket, and
join the two sides inside each group with a vectorized pandas merge
(hot keys can be salted into sub-buckets the same way — B is the knob
that bounds per-reducer memory).

This complements the broadcast joins used everywhere else (small
dimension sides) and the packed-key semi-join of the trust pipeline.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _resolve_stages(stages: "int | None") -> int:
    if stages is None:
        return max(1, int(os.environ.get("GRAFT_JOIN_STAGES", "1")))
    return max(1, int(stages))


def _staged_exchange(lt, rt, *, n_buckets: int, coalesce: bool,
                     stages: int, join_fn, stabilize_fn):
    """Run the bucket join as ``stages`` SEQUENTIAL sub-exchanges.

    The plain path sorts the whole tagged union in one all-to-all — its
    active working set (sort buffers + inputs + outputs) must fit the
    object store, which LIVELOCKS the streaming final attach at a 2 GiB
    store (BASELINE.md spill section, round 4).  Staging filters the
    union to ``bucket % stages == s`` per pass and materializes each
    pass's OUTPUT before the next starts: the active exchange holds
    ~1/stages of the data, completed outputs are plain spillable
    blocks, and the result is the exact same row multiset (buckets are
    disjoint).  Cost: the cheap tag/widen maps re-scan the (already
    materialized) inputs once per stage."""
    outs = []
    for s in range(stages):
        def keep(t: pa.Table, s=s) -> pa.Table:
            if not t.num_rows or "__bucket" not in t.column_names:
                return t
            b = t.column("__bucket").to_numpy()
            return t.filter(pa.array(b % stages == s))

        # materialize each side BEFORE the union: a live producer and a
        # large union queue otherwise compete for the same store budget
        # and the executor's reservation backpressure can wedge with the
        # producer's tasks dispatched but unable to commit outputs
        # (observed at a 2 GiB store, round 5).  Materialized blocks
        # are plain spillable objects; the union then only moves refs.
        part = (lt.map_batches(keep, batch_format="pyarrow")
                .materialize()
                .union(rt.map_batches(keep, batch_format="pyarrow")
                       .materialize()))
        outs.append(
            _bucket_group(part, max(2, n_buckets // stages), coalesce)
            .map_groups(join_fn, batch_format="pandas")
            .map_batches(stabilize_fn, batch_format="pyarrow",
                         batch_size=None)
            .materialize())
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def _bucket_group(tagged, n_buckets: int, coalesce: bool):
    """groupby("__bucket"), optionally COALESCING the input first.

    Ray's sort-based map_groups launches roughly one task per sorted
    input block; a fragmented upstream (e.g. 1,478 tiny pivot blocks at
    the 2M-page scale) turned the reducer into 1,777 sub-second tasks
    whose fixed cost serialized the whole join (measured 313 s for ~4 s
    of actual join work; the same join over coalesced inputs runs in
    ~10 s).  ``coalesce=True`` repartitions to ~bucket-count blocks so
    each reducer task is one fat bucket — pass it whenever a join input
    comes out of a small-batch actor/task pool.  Default off: the extra
    exchange costs ~1-2 s on compact interactive joins (measured 2.3x
    on the sf0.1 minhash verify)."""
    if not coalesce:
        return tagged.groupby("__bucket")
    from ..context import num_cpus

    return tagged.repartition(
        max(n_buckets, num_cpus() * 2)).groupby("__bucket")


def hash_join(left, right, *, on: str, n_buckets: int = 64,
              how: str = "inner", suffixes: tuple[str, str] = ("_l", "_r"),
              coalesce: bool = False, stages: "int | None" = None):
    """Dataset ⋈ Dataset on an integer key column; returns joined Dataset.

    Both inputs stream; only same-bucket rows meet in one reducer.
    ``on`` must be integer-typed (hash-partition by modulo — swap in a
    mixing hash for adversarial key distributions).
    """

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            key = t.column(on).to_numpy()
            bucket = (key % n_buckets).astype(np.int32)
            t = t.append_column("__bucket", pa.array(bucket))
            return t.append_column(
                "__side", pa.array([side] * t.num_rows, pa.string())
            )
        return fn

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")

    # non-key columns present on BOTH sides are renamed with the suffixes
    # BEFORE the union (a duplicate-named append_column would otherwise make
    # the later select() raise 'Field exists 2 times in schema')
    lraw = [c for c in left.schema().names if c != on]
    rraw = [c for c in right.schema().names if c != on]
    overlap = set(lraw) & set(rraw)
    lren = {c: c + suffixes[0] for c in overlap}
    rren = {c: c + suffixes[1] for c in overlap}

    def rename(mapping: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names]
            )
        return fn

    if overlap:
        lt = lt.map_batches(rename(lren), batch_format="pyarrow")
        rt = rt.map_batches(rename(rren), batch_format="pyarrow")
    lset = [lren.get(c, c) for c in lraw]
    rset = [rren.get(c, c) for c in rraw]

    # TYPED null columns: bare pa.nulls() is the Arrow null type, which
    # pandas renders as OBJECT columns of None — through the bucket
    # Sort at 10^6-row scale that object churn measured ~280 s and tens
    # of GiB (sf1 bench, round 4).  Typed nulls stay numeric (NaN).
    # This single renamed-column → Arrow-type map serves BOTH the widen
    # step and the empty-block stabilizer below (one source of truth).
    arrow_types: dict[str, pa.DataType] = {}
    for schema, ren in ((left.schema(), lren), (right.schema(), rren)):
        for name, typ in zip(schema.names, schema.types):
            arrow_types[ren.get(name, name)] = typ
    atypes = arrow_types

    def widen(missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            for c in missing:
                t = t.append_column(
                    c, pa.nulls(t.num_rows, type=atypes.get(c)))
            return t
        return fn

    lt = lt.map_batches(widen(rset), batch_format="pyarrow")
    rt = rt.map_batches(widen(lset), batch_format="pyarrow")

    # original dtypes: the null-widened union promotes e.g. int64 → float64;
    # restore after the merge.  Inner-only: a left join's genuine nulls
    # would make the restore schema-inconsistent across buckets.
    if how != "inner":
        raise ValueError("hash_join supports how='inner' only (the "
                         "null-widened union dtype restore is unsound "
                         "for outer joins)")
    dtypes: dict[str, object] = {}
    for schema, ren in ((left.schema(), lren), (right.schema(), rren)):
        for name, typ in zip(schema.names, schema.types):
            try:
                dtypes[ren.get(name, name)] = typ.to_pandas_dtype()
            except Exception:
                pass

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[on] + lset].reset_index(drop=True)
        rg = g[g["__side"] == "r"][[on] + rset].reset_index(drop=True)
        out = lg.merge(rg, on=on, how=how, suffixes=suffixes)
        for c in out.columns:
            want = dtypes.get(c)
            if want is not None and out[c].notna().all():
                try:
                    out[c] = out[c].astype(want)
                except (TypeError, ValueError):
                    pass
        return out

    cols_order = [on] + lset + rset + ["__bucket", "__side"]
    unioned = lt.map_batches(
        lambda t, c=cols_order: t.select(c), batch_format="pyarrow"
    ).union(rt.map_batches(
        lambda t, c=cols_order: t.select(c), batch_format="pyarrow"
    ))
    # normalize Ray's zero-column empty-partition blocks to the join's
    # output schema (same contract as left_join_fill below), reusing the
    # arrow_types map built for the typed-null widen above
    empty = pa.table({c: pa.array([], type=arrow_types[c])
                      for c in [on] + lset + rset})

    def stabilize(t: pa.Table) -> pa.Table:
        return t if t.num_rows else empty

    n_stages = _resolve_stages(stages)
    # explicit stages=1 still routes through _staged_exchange for its
    # materialize-the-union-sides behavior (single pass) — the caller
    # is saying "store headroom is tight but one exchange fits"
    if n_stages > 1 or stages == 1:
        lt2 = lt.map_batches(lambda t, c=cols_order: t.select(c),
                             batch_format="pyarrow")
        rt2 = rt.map_batches(lambda t, c=cols_order: t.select(c),
                             batch_format="pyarrow")
        return _staged_exchange(lt2, rt2, n_buckets=n_buckets,
                                coalesce=coalesce, stages=n_stages,
                                join_fn=join_bucket,
                                stabilize_fn=stabilize)
    return _bucket_group(unioned, n_buckets, coalesce).map_groups(
        join_bucket, batch_format="pandas"
    ).map_batches(stabilize, batch_format="pyarrow", batch_size=None)


def left_join_fill(left, right, *, on: str, fill: dict,
                   hit_col: str | None = None, n_buckets: int = 64,
                   combine_right_sum: bool = False,
                   coalesce: bool = False, stages: "int | None" = None):
    """LEFT join Dataset ⋈ Dataset on an integer key with explicit miss
    defaults — the feature-ATTACH join of the streaming trust pipeline.

    Every left row survives exactly once per matching right row (the
    caller guarantees the right side is unique on ``on`` — attach
    semantics); unmatched left rows take ``fill[col]`` for every right
    column.  Unlike a generic outer join, the dtype restore here is
    SOUND: left columns are never null on left rows, and right columns
    are explicitly filled, so both sides cast back to their original
    Arrow dtypes unconditionally (the ``hash_join`` docstring explains
    why that restore is unsound for a general outer join).

    ``hit_col``: optional float64 1.0/0.0 match-indicator column (the
    streaming RR/path stages key their miss sentinels off it).

    ``combine_right_sum``: sum right rows sharing a key before the merge.
    For ZERO-FILLED DISJOINT partial rows (e.g. a per-rank pivot whose
    input block was split by the block-size limit) the sum reconstructs
    the full row exactly; with unique keys it is the identity.  This is
    what makes the streaming path-feature attach safe against Ray
    splitting an oversized pivot block mid-query.
    """

    lcols = [c for c in left.schema().names if c != on]
    rcols = [c for c in right.schema().names if c != on]
    overlap = (set(lcols) & set(rcols)) | ({on} & set(fill))
    if overlap - {on}:
        raise ValueError(f"left/right column overlap {overlap}: rename the "
                         "right side before the attach join")
    missing = [c for c in rcols if c not in fill]
    if missing:
        raise ValueError(f"fill defaults missing for right columns {missing}")

    dtypes: dict[str, object] = {}
    for schema in (left.schema(), right.schema()):
        for name, typ in zip(schema.names, schema.types):
            try:
                dtypes[name] = typ.to_pandas_dtype()
            except Exception:
                pass

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            key = t.column(on).to_numpy()
            bucket = (key % n_buckets).astype(np.int32)
            t = t.append_column("__bucket", pa.array(bucket))
            if side == "r":
                t = t.append_column("__hit", pa.array(
                    np.ones(t.num_rows, dtype=np.int8)))
            return t.append_column(
                "__side", pa.array([side] * t.num_rows, pa.string()))
        return fn

    rset = rcols + ["__hit"]

    atypes: dict[str, pa.DataType] = {"__hit": pa.int8()}
    for schema in (left.schema(), right.schema()):
        for name, typ in zip(schema.names, schema.types):
            atypes[name] = typ

    # typed nulls — see hash_join.widen: untyped pa.nulls() makes
    # object-dtype None columns through the bucket Sort (measured ~280 s
    # at the 2M-page scale)
    def widen(cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            for c in cols:
                t = t.append_column(
                    c, pa.nulls(t.num_rows, type=atypes.get(c)))
            return t
        return fn

    cols_order = [on] + lcols + rset + ["__bucket", "__side"]
    lt = (left.map_batches(tag("l"), batch_format="pyarrow")
          .map_batches(widen(rset), batch_format="pyarrow")
          .map_batches(lambda t, c=cols_order: t.select(c),
                       batch_format="pyarrow"))
    rt = (right.map_batches(tag("r"), batch_format="pyarrow")
          .map_batches(widen(lcols), batch_format="pyarrow")
          .map_batches(lambda t, c=cols_order: t.select(c),
                       batch_format="pyarrow"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[on] + lcols].reset_index(drop=True)
        rg = g[g["__side"] == "r"][[on] + rset].reset_index(drop=True)
        if combine_right_sum and len(rg):
            rg = rg.groupby(on, as_index=False).sum()
        out = lg.merge(rg, on=on, how="left")
        hit = out["__hit"].notna()
        for c in rcols:
            want = dtypes.get(c)
            col = out[c].fillna(fill[c])
            out[c] = col.astype(want) if want is not None else col
        for c in [on] + lcols:
            want = dtypes.get(c)
            if want is not None:
                out[c] = out[c].astype(want)
        out = out.drop(columns=["__hit"])
        if hit_col is not None:
            out[hit_col] = hit.to_numpy().astype(np.float64)
        return out

    # Ray's map_groups emits ZERO-COLUMN empty blocks for empty sort
    # partitions (observed first at the 2M-page scale): normalize every
    # zero-row block to the canonical output schema so downstream
    # map_batches consumers never see a schema-less table.
    arrow_types: dict[str, pa.DataType] = {}
    for schema in (left.schema(), right.schema()):
        for name, typ in zip(schema.names, schema.types):
            arrow_types[name] = typ
    out_names = [on] + lcols + rcols + ([hit_col] if hit_col else [])
    empty = pa.table({
        c: pa.array([], type=(pa.float64() if c == hit_col
                              else arrow_types[c]))
        for c in out_names})

    def stabilize(t: pa.Table) -> pa.Table:
        return t if t.num_rows else empty

    n_stages = _resolve_stages(stages)
    if n_stages > 1 or stages == 1:     # see hash_join: 1 = materialize
        return _staged_exchange(lt, rt, n_buckets=n_buckets,
                                coalesce=coalesce, stages=n_stages,
                                join_fn=join_bucket,
                                stabilize_fn=stabilize)
    return _bucket_group(lt.union(rt), n_buckets, coalesce).map_groups(
        join_bucket, batch_format="pandas").map_batches(
        stabilize, batch_format="pyarrow", batch_size=None)
