"""Grouped top-k: per-key top-k rows without a global sort.

The combiner shape: each batch prunes to its local per-key top-k (a
vectorized pandas sort + group-head), the tiny survivors merge once.
Selection under a total order is associative, so the merge of per-batch
winners contains the global winners — the same argument as
``deterministic_sample``.  Shuffle cost: O(k · #keys · #batches) pruned
rows instead of the full table.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def grouped_topk(ds, *, key_cols: list[str], value_col: str, k: int,
                 descending: bool = True,
                 tiebreak_cols: list[str] | None = None):
    """Dataset → per ``key_cols`` group, the top ``k`` rows by
    ``value_col`` (ties broken ascending by ``tiebreak_cols``).

    ``key_cols + value_col + tiebreak_cols`` must order rows totally (up
    to fully identical rows) for a well-defined result.
    """
    tiebreak = tiebreak_cols or []

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            key_cols + [value_col] + tiebreak,
            ascending=[True] * len(key_cols) + [not descending]
            + [True] * len(tiebreak),
            kind="stable")
        df = df.groupby(key_cols, as_index=False, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(local_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(local_topk, batch_format="pyarrow",
                         batch_size=None))
