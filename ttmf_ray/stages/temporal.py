"""Temporal operators: as-of join, sliding-window aggregate, range join.

Operators the reference lacks but a production event pipeline needs
(SURVEY.md §2.10 extension surface).  Each follows the brief's custom-
operator ladder: expressed as map_batches + bucketed groupby compositions
— no driver-side loops, no whole-dataset materialization.

Partitioning assumptions (documented per the brief):

- ``asof_join`` hash-partitions BOTH sides on the ``by`` key, so only
  same-bucket rows meet in a reducer; per-reducer memory is bounded by
  the largest bucket (``n_buckets`` is the knob; salt hot keys upstream
  if one ``by`` value dominates).  Within a bucket the merge is
  pandas ``merge_asof`` — vectorized C, not a Python row loop.
- ``sliding_window_agg`` emits ``length/slide`` partial rows per input
  row inside map_batches, pre-aggregated per batch, so the global
  shuffle moves only (key, window) partial sums — the classic
  combiner-before-groupby shape that survives 100 TB.
- ``range_join_broadcast`` broadcasts the (small) sorted band edges and
  assigns bands with one ``np.searchsorted`` per batch — an interval
  join with no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, *, by: str, on: str,
              direction: str = "backward", n_buckets: int = 32,
              right_suffix: str = "_r"):
    """left ASOF JOIN right: for each left row, the nearest-prior right
    row with the same ``by`` key and ``right.on <= left.on``
    (``direction='backward'``; 'forward' gives the nearest-later row).

    ``on`` must be integer-typed (e.g. epoch microseconds) on both
    sides.  Left rows with no match keep nulls in the right columns
    (LEFT-join semantics, matching DuckDB ``ASOF LEFT JOIN``).

    Tie contract: right rows are sorted by (``on``, remaining columns)
    within a bucket, and ``merge_asof`` takes the LAST qualifying row —
    with duplicate (by, on) pairs on the right the lexicographically
    greatest value row wins.  Pre-dedup the right side if the engine
    result must match an oracle that resolves ties differently.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    rcols = [c for c in right.schema().names if c not in (by, on)]
    overlap = set(rcols) & set(left.schema().names)
    ren = {c: c + right_suffix for c in rcols if c in overlap}
    ren[on] = on + right_suffix  # keep the matched right timestamp
    rset = [ren.get(c, c) for c in [on] + rcols]
    lset = list(left.schema().names)

    def tag(side: str, rename: dict[str, str] | None = None):
        def fn(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns(
                    [rename.get(c, c) for c in t.column_names])
            key = t.column(by).to_numpy()
            t = t.append_column(
                "__bucket", pa.array((key % n_buckets).astype(np.int32)))
            return t.append_column(
                "__side", pa.array([side] * t.num_rows, pa.string()))
        return fn

    def widen(missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            for c in missing:
                t = t.append_column(c, pa.nulls(t.num_rows))
            return t
        return fn

    cols = list(dict.fromkeys(lset + [by] + rset)) + ["__bucket", "__side"]
    lt = (left.map_batches(tag("l"), batch_format="pyarrow")
          .map_batches(widen(rset), batch_format="pyarrow")
          .map_batches(lambda t, c=cols: t.select(c), batch_format="pyarrow"))
    rt = (right.map_batches(tag("r", ren), batch_format="pyarrow")
          .map_batches(widen([c for c in lset if c != by]),
                       batch_format="pyarrow")
          .map_batches(lambda t, c=cols: t.select(c), batch_format="pyarrow"))

    ron = ren[on]

    # dtypes per side, for restoring after the null-widened union (a
    # bucket holding rows of only ONE side leaves the other side's
    # columns all-null/object — merge_asof then rejects the key dtypes)
    def _dtypes(schema, rename):
        out = {}
        for name, typ in zip(schema.names, schema.types):
            try:
                out[rename.get(name, name)] = typ.to_pandas_dtype()
            except Exception:
                pass
        return out

    l_dtypes = _dtypes(left.schema(), {})
    r_dtypes = _dtypes(right.schema(), ren)

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        for c, want in dtypes.items():
            if c in df.columns:
                try:
                    df[c] = df[c].astype(want)
                except (TypeError, ValueError):
                    pass
        return df

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = _restore(g[g["__side"] == "l"][lset].copy(), l_dtypes)
        rg = _restore(g[g["__side"] == "r"][[by] + rset].copy(), r_dtypes)
        lg = lg.sort_values(on, kind="stable").reset_index(drop=True)
        rg = rg.sort_values([ron] + [c for c in rset if c != ron] + [by],
                            kind="stable").reset_index(drop=True)
        # duplicate the right timestamp as the merge key so the matched
        # value survives as a regular output column (ron)
        rg = rg.assign(**{on: rg[ron].astype(lg[on].dtype)})
        return pd.merge_asof(lg, rg, on=on, by=by, direction=direction)

    unioned = lt.union(rt)
    return unioned.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")


def sliding_window_agg(ds, *, ts_col: str, key_cols: list[str],
                       value_col: str, length: int, slide: int,
                       origin: int = 0):
    """Overlapping-window count + sum: each row lands in ``length/slide``
    windows; output rows are (key..., win_start, n, sum_value).

    ``ts_col`` is cast to int64 (works for epoch ints and Arrow
    timestamps — then the unit is the timestamp unit, e.g. µs);
    ``length`` / ``slide`` / ``origin`` are in the same unit and
    ``slide`` must divide ``length``.  Per-batch partials keep the
    shuffle at (key, window) granularity regardless of input size.
    """
    if length % slide != 0:
        raise ValueError("slide must divide length")
    k = length // slide

    def partial(b: pa.Table) -> pa.Table:
        es = b.column(ts_col).cast(pa.int64()).to_numpy()
        slot = (es - origin) // slide
        # window starts slot-j for j in 0..k-1, vectorized via repeat
        ws = ((np.repeat(slot, k)
               - np.tile(np.arange(k, dtype=np.int64), len(es)))
              * slide + origin)
        df = pd.DataFrame({c: np.repeat(b.column(c).to_numpy(zero_copy_only=False), k)
                           for c in key_cols})
        df["win_start"] = ws
        df["value"] = np.repeat(b.column(value_col).to_numpy(), k)
        g = df.groupby(key_cols + ["win_start"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_cols + ["win_start"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value", alias_name="sum_value")))


def range_join_broadcast(ds, *, value_col: str, edges: np.ndarray,
                         labels: list | None = None,
                         band_col: str = "band"):
    """Interval join against a broadcast band table: row matches band i
    when ``edges[i] <= value < edges[i+1]``; rows outside every band are
    dropped.  ``edges`` must be sorted ascending (len = #bands + 1).

    The band table ships once via the object store (closure capture of a
    small array); assignment is one ``searchsorted`` per batch.
    """
    from ..context import Broadcast

    edges = np.asarray(edges, dtype=np.float64)
    if labels is None:
        labels = [f"[{edges[i]:g},{edges[i+1]:g})"
                  for i in range(len(edges) - 1)]
    bc = Broadcast((edges, np.asarray(labels)))

    def assign(b: pa.Table) -> pa.Table:
        ed, lab = bc.get()
        v = b.column(value_col).to_numpy()
        idx = np.searchsorted(ed, v, side="right") - 1
        ok = (idx >= 0) & (idx < len(ed) - 1) & (v < ed[-1])
        b = b.filter(pa.array(ok))
        return b.append_column(band_col, pa.array(lab[idx[ok]]))

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cohort retention + ordered funnel (event-analytics primitives)
# ---------------------------------------------------------------------------

def cohort_retention(events_ds, *, ts_col: str = "ts",
                     user_col: str = "user_id",
                     max_offset: int = 13) -> pd.DataFrame:
    """Classic day-granularity cohort retention: cohort = a user's first
    active day; cell (cohort_day, offset) = #users of that cohort active
    offset days later (offset 0..max_offset).

    Shape: distinct (user, day) per-batch combiner → one groupby over
    signature rows; cohorts attach via the bucketed hash_join (no
    per-user driver state); the final (cohort, offset) count is a tiny
    groupby.  Days are integer epoch-days so both engines bucket
    identically.
    """
    from ..functions.joins import hash_join
    from ..stages.dedup import distinct_rows

    us = 86_400_000_000

    def days(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        return pa.table({
            user_col: t.column(user_col),
            "day": pa.array((ts // us).astype(np.int64))})

    ud = distinct_rows(
        events_ds.map_batches(days, batch_format="pyarrow"),
        [user_col, "day"]).materialize()
    cohort = ud.groupby(user_col).min("day").map_batches(
        lambda t: pa.table({user_col: t.column(user_col),
                            "cohort_day": t.column("min(day)")}),
        batch_format="pyarrow")
    j = hash_join(ud, cohort, on=user_col)

    def offs(t: pa.Table) -> pa.Table:
        day = t.column("day").to_numpy().astype(np.int64)
        cd = t.column("cohort_day").to_numpy().astype(np.int64)
        off = day - cd
        keep = off <= max_offset
        return pa.table({"cohort_day": pa.array(cd[keep]),
                         "offset": pa.array(off[keep])})

    out = (j.map_batches(offs, batch_format="pyarrow")
           .groupby(["cohort_day", "offset"]).count().to_pandas()
           .rename(columns={"count()": "n_users"}))
    return out.astype({"cohort_day": np.int64, "offset": np.int64,
                       "n_users": np.int64}) \
        .sort_values(["cohort_day", "offset"]).reset_index(drop=True)


def funnel_counts(events_ds, steps: list[str], *, ts_col: str = "ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type") -> pd.DataFrame:
    """Ordered funnel: a user converts step i when their FIRST step-i
    event is strictly after their first step-(i-1) event.  Returns one
    row per step (step, event_type, n_users).

    Shape: per-batch (user, step, min ts) combiner → one groupby; the
    per-step min-ts tables then chain through ``len(steps)-1`` bucketed
    hash_joins with a strict-ordering filter — conversion counting with
    no per-user driver state.
    """
    from ray.data.aggregate import Min

    from ..functions.joins import hash_join

    k = len(steps)
    order = {s: i for i, s in enumerate(steps)}

    def partial(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_numpy(zero_copy_only=False)
        sel = np.isin(et, steps)
        if not sel.any():
            return pa.table({user_col: pa.array([], pa.int64()),
                             "step": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        u = t.column(user_col).to_numpy().astype(np.int64)[sel]
        s = np.asarray([order[x] for x in et[sel]], dtype=np.int64)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()[sel]
        key = u * np.int64(k) + s
        ukey, inv = np.unique(key, return_inverse=True)
        tmin = np.full(len(ukey), np.iinfo(np.int64).max)
        np.minimum.at(tmin, inv, ts)
        return pa.table({user_col: pa.array(ukey // k),
                         "step": pa.array(ukey % k),
                         "t": pa.array(tmin)})

    def pack(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy().astype(np.int64)
        s = t.column("step").to_numpy().astype(np.int64)
        return pa.table({"key": pa.array(u * np.int64(k) + s),
                         "t": t.column("t")})

    agg = (events_ds.map_batches(partial, batch_format="pyarrow")
           .map_batches(pack, batch_format="pyarrow")
           .groupby("key").aggregate(Min("t", alias_name="t"))
           ).materialize()

    def step_tbl(j):
        def split(t: pa.Table, j=j) -> pa.Table:
            key = t.column("key").to_numpy().astype(np.int64)
            sel = (key % k) == j
            return pa.table({
                user_col: pa.array((key[sel] // k)),
                f"t{j}": pa.array(t.column("t").to_numpy()[sel])})
        return agg.map_batches(split, batch_format="pyarrow")

    cur = step_tbl(0).materialize()
    counts = [cur.count()]
    for j in range(1, k):
        cur = hash_join(cur, step_tbl(j), on=user_col)

        def keep(t: pa.Table, j=j) -> pa.Table:
            a = t.column(f"t{j - 1}").to_numpy()
            b = t.column(f"t{j}").to_numpy()
            return t.filter(pa.array(b > a))

        cur = cur.map_batches(keep, batch_format="pyarrow").materialize()
        counts.append(cur.count())
    return pd.DataFrame({
        "step": np.arange(k, dtype=np.int64),
        "event_type": steps,
        "n_users": np.asarray(counts, dtype=np.int64)})


# ---------------------------------------------------------------------------
# RFM user segmentation (recency / frequency / monetary quartile bands)
# ---------------------------------------------------------------------------

US_PER_DAY = 86_400_000_000


def rfm_segments(events_ds, *, ts_col: str = "ts",
                 user_col: str = "user_id",
                 value_col: str = "value") -> pd.DataFrame:
    """Classic RFM segmentation: per user, days since last activity
    (vs the corpus max timestamp), event count, and rounded value sum,
    each banded into quartiles 1–4 by the lower-discrete quantile rule
    (band = 1 + #{edges strictly below the value}, edges at ranks
    floor((n−1)·q), q ∈ {¼, ½, ¾} — the docs_length_band_filter rule).

    Shape: ONE per-user groupby of per-batch (max ts, count, sum)
    partials — the only shuffle, and it moves 3 numbers per (user,
    batch); the quartile edges are computed on the collected per-user
    table (users ≪ events; at larger scale reuse
    stages/quantiles.exact_quantiles over the same per-user Dataset).
    Monetary comparisons use the 6-dp-rounded sum on both engines."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy().astype(np.int64)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        v = t.column(value_col).to_numpy().astype(np.float64)
        uu, inv = np.unique(u, return_inverse=True)
        mx = np.full(len(uu), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table({
            user_col: pa.array(uu),
            "umax": pa.array(mx),
            "freq": pa.array(np.bincount(inv, minlength=len(uu))
                             .astype(np.int64)),
            "mon": pa.array(np.bincount(inv, weights=v,
                                        minlength=len(uu))),
        })

    per_user = (events_ds.map_batches(partial, batch_format="pyarrow")
                .groupby(user_col)
                .aggregate(Max("umax", alias_name="umax"),
                           Sum("freq", alias_name="freq"),
                           Sum("mon", alias_name="mon"))
                .to_pandas())
    umax = per_user["umax"].to_numpy().astype(np.int64)
    gmax = int(umax.max())
    r_days = (gmax - umax) // US_PER_DAY
    freq = per_user["freq"].to_numpy().astype(np.int64)
    mon = np.round(per_user["mon"].to_numpy(np.float64), 6)

    def band(v: np.ndarray) -> np.ndarray:
        s = np.sort(v)
        n = len(s)
        edges = [s[(n - 1) // 4], s[(n - 1) // 2], s[(3 * (n - 1)) // 4]]
        b = np.ones(len(v), np.int64)
        for e in edges:
            b += (v > e)
        return b

    out = pd.DataFrame({
        user_col: per_user[user_col].to_numpy().astype(np.int64),
        "r_days": r_days.astype(np.int64),
        "freq": freq,
        "monetary": mon,
        "r_band": band(r_days),
        "f_band": band(freq),
        "m_band": band(mon),
    })
    return out.sort_values(user_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sequential event-pair reachability (A happens before B per user)
# ---------------------------------------------------------------------------

def seq_pairs(events_ds, *, ts_col: str = "ts",
              user_col: str = "user_id",
              type_col: str = "event_type") -> pd.DataFrame:
    """For every ordered pair of distinct event types (a, b): the
    number of users with SOME a-event strictly before SOME b-event —
    the precedence matrix behind funnel discovery (which funnels are
    worth defining), complementing the adjacent-step Markov
    transitions.

    Reachability test per user: min_ts(a) < max_ts(b) ⟺ an a precedes
    a b.  Shape: per-batch (user, type, min ts, max ts) partials →
    ONE groupby; the pair test is a self hash_join on the user key
    (each side ≤ #types rows per user), then a tiny (a, b) count —
    no per-user driver state, no map_groups over tiny groups."""
    from ray.data.aggregate import Max, Min

    from ..functions.joins import hash_join

    def partial(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy().astype(np.int64)
        et = t.column(type_col).to_numpy(zero_copy_only=False).astype(str)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        key = np.char.add(np.char.add(u.astype(str), "\x1f"), et)
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, inv, ts)
        np.maximum.at(mx, inv, ts)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            user_col: pa.array(sp[:, 0].astype(np.int64)),
            type_col: pa.array(sp[:, 2], pa.string()),
            "mn": pa.array(mn), "mx": pa.array(mx)})

    ut = (events_ds.map_batches(partial, batch_format="pyarrow")
          .groupby([user_col, type_col])
          .aggregate(Min("mn", alias_name="mn"),
                     Max("mx", alias_name="mx")))

    def side(name_t: str, keep: str, out: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({user_col: t.column(user_col),
                             name_t: t.column(type_col),
                             out: t.column(keep)})
        return fn

    left = ut.map_batches(side("etype_a", "mn", "mn_a"),
                          batch_format="pyarrow")
    right = ut.map_batches(side("etype_b", "mx", "mx_b"),
                           batch_format="pyarrow")
    j = hash_join(left, right, on=user_col)

    def pairs(t: pa.Table) -> pa.Table:
        ea = t.column("etype_a").to_numpy(zero_copy_only=False)
        eb = t.column("etype_b").to_numpy(zero_copy_only=False)
        keep = (ea != eb) & (t.column("mn_a").to_numpy()
                             < t.column("mx_b").to_numpy())
        return pa.table({"etype_a": pa.array(ea[keep], pa.string()),
                         "etype_b": pa.array(eb[keep], pa.string())})

    out = (j.map_batches(pairs, batch_format="pyarrow")
           .groupby(["etype_a", "etype_b"]).count().to_pandas()
           .rename(columns={"count()": "n_users"}))
    return out.astype({"n_users": np.int64}) \
        .sort_values(["etype_a", "etype_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Time-boxed (windowed) funnel — each hop must happen within `window_us`
# of the previous hop's qualifying event.
# ---------------------------------------------------------------------------

def window_funnel(events_ds, steps: list[str], *, window_us: int,
                  ts_col: str = "ts", user_col: str = "user_id",
                  type_col: str = "event_type") -> pd.DataFrame:
    """Windowed funnel: a user converts step i at time
    t_i = min{ts of step-i events with t_{i-1} < ts ≤ t_{i-1} +
    window_us} (filter-then-min ≡ min-then-filter since the window is
    anchored at t_{i-1}).  Returns (step, event_type, n_users).

    Unlike :func:`funnel_counts` (first-EVER per step), each hop's
    qualifying time is the first step-i event AFTER the previous hop —
    the ClickHouse ``windowFunnel`` semantics.  Shape: per hop one
    bucketed hash_join of the step's (user, ts) event rows against the
    surviving chain + a per-user min groupby; no per-user driver
    state."""
    from ray.data.aggregate import Min

    from ..functions.joins import hash_join

    def step_rows(j):
        def fn(t: pa.Table) -> pa.Table:
            et = t.column(type_col).to_numpy(zero_copy_only=False)
            sel = et == steps[j]
            return pa.table({
                user_col: pa.array(
                    t.column(user_col).to_numpy().astype(np.int64)[sel]),
                "ets": pa.array(
                    t.column(ts_col).cast(pa.int64()).to_numpy()[sel])})
        return events_ds.map_batches(fn, batch_format="pyarrow")

    chain = (step_rows(0).groupby(user_col)
             .aggregate(Min("ets", alias_name="t"))).materialize()
    counts = [chain.count()]
    for j in range(1, len(steps)):
        joined = hash_join(step_rows(j), chain, on=user_col)

        def eligible(t: pa.Table) -> pa.Table:
            ts = t.column("ets").to_numpy()
            tp = t.column("t").to_numpy()
            keep = (ts > tp) & (ts <= tp + np.int64(window_us))
            return pa.table({
                user_col: pa.array(t.column(user_col)
                                   .to_numpy().astype(np.int64)[keep]),
                "ets": pa.array(ts[keep])})

        chain = (joined.map_batches(eligible, batch_format="pyarrow")
                 .groupby(user_col)
                 .aggregate(Min("ets", alias_name="t"))).materialize()
        counts.append(chain.count())
    return pd.DataFrame({
        "step": np.arange(len(steps), dtype=np.int64),
        "event_type": list(steps),
        "n_users": np.asarray(counts, dtype=np.int64)})


def funnel_hop_gaps(events_ds, steps: list[str], *, window_us: int,
                    ts_col: str = "ts", user_col: str = "user_id",
                    type_col: str = "event_type"):
    """Per-hop conversion GAPS for the windowed funnel: for every user
    surviving hop j of :func:`window_funnel`'s chain, emit
    (step = j, gap_us = t_j − t_{j-1}) — the time-to-convert input the
    per-hop latency quantiles run on.  Identical chain semantics
    (first step-j event strictly after and within ``window_us`` of the
    previous hop); same hash_join + per-user min shape.  Returns a
    Dataset of (step, gap_us) int rows — gap-domain sized."""
    import ray.data as rd

    from ray.data.aggregate import Min

    from ..functions.joins import hash_join

    def step_rows(j):
        def fn(t: pa.Table) -> pa.Table:
            et = t.column(type_col).to_numpy(zero_copy_only=False)
            sel = et == steps[j]
            return pa.table({
                user_col: pa.array(
                    t.column(user_col).to_numpy().astype(np.int64)[sel]),
                "ets": pa.array(
                    t.column(ts_col).cast(pa.int64()).to_numpy()[sel])})
        return events_ds.map_batches(fn, batch_format="pyarrow")

    chain = (step_rows(0).groupby(user_col)
             .aggregate(Min("ets", alias_name="t"))).materialize()
    gap_parts = []
    for j in range(1, len(steps)):
        joined = hash_join(step_rows(j), chain, on=user_col)

        def eligible(t: pa.Table) -> pa.Table:
            ts = t.column("ets").to_numpy()
            tp = t.column("t").to_numpy()
            keep = (ts > tp) & (ts <= tp + np.int64(window_us))
            return pa.table({
                user_col: pa.array(t.column(user_col)
                                   .to_numpy().astype(np.int64)[keep]),
                "ets": pa.array(ts[keep]),
                "tprev": pa.array(tp[keep])})

        nxt = (joined.map_batches(eligible, batch_format="pyarrow")
               .groupby(user_col)
               .aggregate(Min("ets", alias_name="t"),
                          Min("tprev", alias_name="tprev"))).materialize()

        def to_gap(t: pa.Table, j=j) -> pa.Table:
            return pa.table({
                "step": pa.array(np.full(t.num_rows, j, np.int64)),
                "gap_us": pa.array(
                    t.column("t").to_numpy().astype(np.int64)
                    - t.column("tprev").to_numpy().astype(np.int64))})

        gap_parts.append(nxt.map_batches(to_gap, batch_format="pyarrow"))
        chain = nxt.map_batches(
            lambda t: t.select([user_col, "t"]), batch_format="pyarrow") \
            .materialize()
    out = gap_parts[0]
    for g in gap_parts[1:]:
        out = out.union(g)
    return out


# ---------------------------------------------------------------------------
# Rolling active users (DAU + trailing-7-day actives)
# ---------------------------------------------------------------------------

def rolling_active(events_ds, *, window_days: int = 7,
                   ts_col: str = "ts",
                   user_col: str = "user_id") -> pd.DataFrame:
    """Per epoch-day: distinct active users that day (DAU) and distinct
    users active in the trailing ``window_days`` window ending that day
    — the engagement rollup of an event pipeline.  Rolling DISTINCT is
    not a windowed sum, so each distinct (user, day) signature row is
    re-keyed to the ≤ ``window_days`` anchor days it supports, deduped
    once more, and counted — two signature-row shuffles, never event
    payloads.  Only days present in the data become anchors."""
    from ray.data.aggregate import Count

    from ..stages.dedup import distinct_rows

    def days(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()
        return pa.table({
            user_col: t.column(user_col).cast(pa.int64()),
            "day": pa.array((ts // US_PER_DAY).astype(np.int64))})

    ud = distinct_rows(
        events_ds.map_batches(days, batch_format="pyarrow"),
        [user_col, "day"]).materialize()
    dau = (ud.groupby("day").count().to_pandas()
           .rename(columns={"count()": "dau"}))
    present = np.sort(dau["day"].to_numpy().astype(np.int64))
    present_set = present      # anchors = observed days only

    def expand(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy().astype(np.int64)
        d = t.column("day").to_numpy().astype(np.int64)
        anchors, users = [], []
        for off in range(window_days):
            a = d + off
            pos = np.clip(np.searchsorted(present_set, a), 0,
                          max(len(present_set) - 1, 0))
            ok = present_set[pos] == a
            anchors.append(a[ok])
            users.append(u[ok])
        return pa.table({
            "anchor": pa.array(np.concatenate(anchors)),
            user_col: pa.array(np.concatenate(users))})

    ru = distinct_rows(
        ud.map_batches(expand, batch_format="pyarrow"),
        ["anchor", user_col])
    roll = (ru.groupby("anchor").count().to_pandas()
            .rename(columns={"count()": "rolling", "anchor": "day"}))
    out = dau.merge(roll, on="day", how="left").fillna(0)
    return out.astype({"day": np.int64, "dau": np.int64,
                       "rolling": np.int64}) \
        .sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Last-touch attribution (marketing attribution via the as-of join)
# ---------------------------------------------------------------------------

def last_touch_attribution(events_ds, *, convert_type: str,
                           touch_type: str, ts_col: str = "ts",
                           user_col: str = "user_id",
                           id_col: str = "event_id") -> pd.DataFrame:
    """For every conversion event, the user's most recent touch event
    at or before it (ties: equal timestamps attribute — the DuckDB
    ASOF convention) — one bucketed :func:`asof_join`, no per-user
    state.  Output: (event_id, user_id, t, touch_t, gap_us, attributed)
    with touch_t/gap_us = −1 for unattributed conversions."""

    def side(tp: str, keep_id: bool):
        def fn(t: pa.Table) -> pa.Table:
            et = t.column("event_type").to_numpy(zero_copy_only=False)
            sel = et == tp
            cols = {
                user_col: pa.array(t.column(user_col)
                                   .to_numpy().astype(np.int64)[sel]),
                "t": pa.array(t.column(ts_col).cast(pa.int64())
                              .to_numpy()[sel])}
            if keep_id:
                cols[id_col] = pa.array(
                    t.column(id_col).to_numpy().astype(np.int64)[sel])
            return pa.table(cols)
        return events_ds.map_batches(fn, batch_format="pyarrow")

    j = asof_join(side(convert_type, True), side(touch_type, False),
                  by=user_col, on="t", direction="backward")
    df = j.to_pandas()
    touch = df["t_r"]
    out = pd.DataFrame({
        id_col: df[id_col].astype(np.int64),
        user_col: df[user_col].astype(np.int64),
        "t": df["t"].astype(np.int64),
        "touch_t": touch.fillna(-1).astype(np.int64),
        "gap_us": np.where(touch.notna(),
                           df["t"] - touch.fillna(0), -1).astype(np.int64),
        "attributed": touch.notna().astype(np.int64),
    })
    return out.sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Robust hourly anomaly (median / MAD — the outlier-insensitive twin of
# the z-score monitor)
# ---------------------------------------------------------------------------

def hourly_mad_anomaly(events_ds, *, ts_col: str = "ts",
                       type_col: str = "event_type",
                       k_mad: int = 3) -> pd.DataFrame:
    """Per (event_type, hour): the event count, the type's lower-
    discrete median hourly count, the MAD (lower-discrete median of
    absolute deviations, floored at 1), and the anomaly flag
    |c − med| > k·MAD — all integers, zero float risk.

    Shape: one (type, hour) count groupby of per-batch partials; the
    medians run on the collected (types × hours)-row table (tiny; the
    exact-quantile stage is the scale path)."""
    US_PER_HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_numpy(zero_copy_only=False).astype(str)
        hr = (t.column(ts_col).cast(pa.int64()).to_numpy()
              // US_PER_HOUR).astype(np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), hr.astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            type_col: pa.array(sp[:, 0], pa.string()),
            "hour": pa.array(sp[:, 2].astype(np.int64)),
            "c": pa.array(cnt.astype(np.int64))})

    agg = (events_ds.map_batches(partial, batch_format="pyarrow")
           .groupby([type_col, "hour"]).sum("c").to_pandas()
           .rename(columns={"sum(c)": "c"}))
    rows = []
    for tp, g in agg.groupby(type_col, sort=True):
        c = g["c"].to_numpy(np.int64)
        hours = g["hour"].to_numpy(np.int64)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        dev = np.abs(c - med)
        mad = max(int(np.sort(dev)[(len(dev) - 1) // 2]), 1)
        flag = (dev > k_mad * mad).astype(np.int64)
        for h, cc, fl in zip(hours, c, flag):
            rows.append({type_col: tp, "hour": np.int64(h),
                         "c": np.int64(cc), "med": np.int64(med),
                         "mad": np.int64(mad), "is_anomaly": fl})
    return pd.DataFrame(rows).sort_values([type_col, "hour"]) \
        .reset_index(drop=True)


def cusum_alarm(events_ds, *, ts_col: str = "ts",
                type_col: str = "event_type",
                k_thresh: int = 4) -> pd.DataFrame:
    """Per-type CUSUM drift alarm over the hourly count series — the
    one-sided cumulative-sum control chart (Page 1954) with the type's
    lower-discrete median as reference and k·MAD as the alarm line.

    All integer, zero float risk: d_t = c_t − med, and the recursion
    S_t = max(0, S_{t-1} + d_t) is computed by the prefix identity
    S_t = P_t − min(0, min_{j≤t} P_j) with P = cumsum(d), so both the
    distributed kernel and the SQL mirror are pure window arithmetic
    (no per-row recursion).  Hours are the OBSERVED hours, ordered;
    the reference/MAD reuse hourly_mad_anomaly's lower-discrete rule.

    Shape: one (type, hour) count groupby of per-batch partials; the
    per-type scan runs on the collected (types × hours)-row table
    (tiny — hours-domain sized, not event-domain sized)."""
    US_PER_HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_numpy(zero_copy_only=False).astype(str)
        hr = (t.column(ts_col).cast(pa.int64()).to_numpy()
              // US_PER_HOUR).astype(np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), hr.astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            type_col: pa.array(sp[:, 0], pa.string()),
            "hour": pa.array(sp[:, 2].astype(np.int64)),
            "c": pa.array(cnt.astype(np.int64))})

    agg = (events_ds.map_batches(partial, batch_format="pyarrow")
           .groupby([type_col, "hour"]).sum("c").to_pandas()
           .rename(columns={"sum(c)": "c"}))
    frames = []
    for tp, g in agg.groupby(type_col, sort=True):
        g = g.sort_values("hour")
        c = g["c"].to_numpy(np.int64)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        dev = np.abs(c - med)
        mad = max(int(np.sort(dev)[(len(dev) - 1) // 2]), 1)
        p = np.cumsum(c - med)
        run_min = np.minimum(np.minimum.accumulate(p), 0)
        s = p - run_min
        thresh = k_thresh * mad
        frames.append(pd.DataFrame({
            type_col: tp, "hour": g["hour"].to_numpy(np.int64),
            "c": c, "cusum": s.astype(np.int64),
            "thresh": np.int64(thresh),
            "is_alarm": (s > thresh).astype(np.int64)}))
    return pd.concat(frames, ignore_index=True) \
        .sort_values([type_col, "hour"]).reset_index(drop=True)
