"""Shared driver-mimic: run a queries() entry and its oracle_sql() twin on
the same sf_dir, normalize both to pandas (columns sorted by name, rows
sorted by all columns), and diff values."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return [f"{name}: columns {list(a.columns)} != {list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"{name}: rows {len(a)} != {len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             atol=1e-6, rtol=1e-9, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            bad = np.nonzero(~(av == bv))[0][:3] if av.dtype == bv.dtype else []
            problems.append(f"{name}: column {c} differs (sample idx {bad})")
    return problems


def run_sim(sf_dir: str, names: list[str] | None = None,
            *, num_cpus: int = 8) -> int:
    """Full driver-sim: every queries() entry vs its oracle_sql() twin
    (rows-only entries get a runs-and-returns check).  Returns the
    number of failures.  One Ray session for the whole sweep."""
    import sys
    import time

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    qs, osql = em.queries(), em.oracle_sql()
    con = duckdb_con(sf_dir)
    fails = []
    names = names or list(qs)
    for name in names:
        t0 = time.time()
        try:
            rdf = to_pandas(qs[name](sf_dir))
            if name in osql:
                probs = compare(name, rdf,
                                con.execute(osql[name]).fetchdf())
            else:
                probs = [] if rdf is not None else [f"{name}: no result"]
            status = "OK" if not probs else "FAIL " + "; ".join(probs)
        except Exception as e:  # noqa: BLE001 - sweep must not stop
            probs = [f"{name}: {type(e).__name__}: {e}"]
            status = "ERR " + probs[0]
        if probs:
            fails.append(name)
        kind = "mirror" if name in osql else "rows-only"
        print(f"{name:42s} {time.time() - t0:6.1f}s {kind:9s} "
              f"{status[:160]}", flush=True)
    print(f"\n{len(names) - len(fails)}/{len(names)} green; "
          f"failures: {fails}")
    return len(fails)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="full driver-sim")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--num-cpus", type=int, default=8)
    a = ap.parse_args()
    raise SystemExit(1 if run_sim(
        a.sf, a.names.split(",") if a.names else None,
        num_cpus=a.num_cpus) else 0)
