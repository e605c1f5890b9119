"""Exact distributed quantiles over bounded-domain integer columns.

No global sort: each batch emits its value histogram (``np.unique`` —
the per-batch combiner), one shuffle moves only (group, col, value,
count) rows, and quantile selection happens on the merged histogram.
At 100 TB the shuffle payload is the number of DISTINCT values per
group×column (token counts, char lengths, fixed-point scores — domains
of 1e3–1e6), independent of row count; a sort-based quantile would move
every row.

Quantile rule (mirrored exactly in oracle SQL): the "lower disc"
quantile — the value at 0-indexed rank ``floor((n-1)·q)`` of the sorted
multiset, so q=0 is the min and q=1 the max, and the result is always an
observed value.

The reference engine has no quantile operator; this is one of the
training-data-pipeline extensions (SURVEY.md §2.9) — length/quality
distribution cutoffs are how corpus filters are calibrated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_histogram(cols: list[str], group_col: str | None):
    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # explicit types: an inferred all-null schema would clash with
            # non-empty blocks at the groupby
            gt = t.schema.field(group_col).type if group_col else None
            if gt is not None and pa.types.is_dictionary(gt):
                gt = gt.value_type
            fields = ([pa.field(group_col, gt)] if group_col else []) + \
                [pa.field("col", pa.int64()), pa.field("value", pa.int64()),
                 pa.field("cnt", pa.int64())]
            return pa.table({f.name: pa.array([], f.type) for f in fields})
        parts_g: list[np.ndarray] = []
        parts_c: list[np.ndarray] = []
        parts_v: list[np.ndarray] = []
        parts_n: list[np.ndarray] = []
        if group_col is not None:
            gcol = t.column(group_col)
            if pa.types.is_dictionary(gcol.type):
                gcol = gcol.cast(gcol.type.value_type)
            gcodes, guniq = pd.factorize(np.asarray(gcol.to_pylist(),
                                                    dtype=object))
        else:
            gcodes, guniq = np.zeros(t.num_rows, dtype=np.int64), \
                np.array([""], dtype=object)
        n_groups = len(guniq)
        for ci, c in enumerate(cols):
            v = t.column(c).to_numpy().astype(np.int64)
            # per-(group, value) counts in one bincount over packed codes
            vcodes, vuniq = pd.factorize(v)
            packed = gcodes * len(vuniq) + vcodes
            cnt = np.bincount(packed, minlength=n_groups * len(vuniq))
            nz = np.nonzero(cnt)[0]
            parts_g.append((nz // len(vuniq)).astype(np.int64))
            parts_c.append(np.full(len(nz), ci, dtype=np.int64))
            parts_v.append(vuniq[nz % len(vuniq)].astype(np.int64))
            parts_n.append(cnt[nz].astype(np.int64))
        gi = np.concatenate(parts_g)
        out = {
            "col": pa.array(np.concatenate(parts_c)),
            "value": pa.array(np.concatenate(parts_v)),
            "cnt": pa.array(np.concatenate(parts_n)),
        }
        if group_col is not None:
            out = {group_col: pa.array(guniq[gi]), **out}
        return pa.table(out)
    return hist


def exact_quantiles(ds, cols: list[str], qs: list[float], *,
                    group_col: str | None = None) -> pd.DataFrame:
    """Exact quantiles of integer columns, optionally per group.

    Returns a DataFrame with one row per (group,) q: columns
    ``[group_col,] q, <col>_q ...`` — ``<col>_q`` is the observed value
    at 0-indexed rank ``floor((n-1)·q)`` of that group's sorted column.
    """
    keys = ([group_col] if group_col else []) + ["col", "value"]
    hist = ds.map_batches(_batch_histogram(cols, group_col),
                          batch_format="pyarrow")
    merged = hist.groupby(keys).sum("cnt").to_pandas()
    merged = merged.rename(columns={"sum(cnt)": "cnt"})
    if group_col is None:
        group_col = "__g"
        merged[group_col] = ""
    out_cols = ([group_col] if group_col != "__g" else []) + ["q"] + \
        [f"{c}_q" for c in cols]
    if merged.empty:
        return pd.DataFrame(columns=out_cols)
    qs_arr = np.asarray(qs, dtype=np.float64)
    rows = []
    for g, gdf in merged.groupby(group_col, sort=True):
        rec: dict = {group_col: g}
        recs = {q: dict(rec) for q in qs_arr}
        for ci, c in enumerate(cols):
            cdf = gdf[gdf["col"] == ci].sort_values("value")
            vals = cdf["value"].to_numpy()
            cum = np.cumsum(cdf["cnt"].to_numpy())
            n = int(cum[-1]) if len(cum) else 0
            for q in qs_arr:
                rank = int(np.floor((n - 1) * q))
                idx = int(np.searchsorted(cum, rank + 1))
                recs[q][f"{c}_q"] = int(vals[idx]) if n else None
        for q in qs_arr:
            recs[q]["q"] = float(q)
            rows.append(recs[q])
    out = pd.DataFrame(rows)
    sort_keys = out_cols[:2] if group_col != "__g" else out_cols[:1]
    return out[out_cols].sort_values(sort_keys).reset_index(drop=True)
