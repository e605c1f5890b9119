"""Property-based checks (hypothesis) for the composable operators:
results must match single-process pandas/numpy reference semantics for
ARBITRARY inputs and any block structure."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st


def _events(draw, n_keys=5, n=60):
    ks = draw(st.lists(st.integers(0, n_keys - 1), min_size=1, max_size=n))
    ts = draw(st.lists(st.integers(0, 10_000), min_size=len(ks),
                       max_size=len(ks)))
    return ks, ts


@settings(max_examples=15, deadline=None)
@given(st.data(), st.integers(1, 5))
def test_asof_join_matches_pandas(data, n_parts):
    import ray.data as rd

    from ttmf_ray.stages.temporal import asof_join

    lk, lt = _events(data.draw)
    rk, rt = _events(data.draw)
    left = pd.DataFrame({"k": lk, "ts": lt,
                         "lv": np.arange(len(lk))})
    right = pd.DataFrame({"k": rk, "ts": rt,
                          "rv": np.arange(len(rk), dtype=np.float64)})
    # make (k, ts) unique on the right so the tie contract is not in play
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)

    got = asof_join(rd.from_pandas(left).repartition(n_parts),
                    rd.from_pandas(right).repartition(n_parts),
                    by="k", on="ts", n_buckets=3) \
        .to_pandas().sort_values("lv").reset_index(drop=True)

    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.rename(columns={"ts": "ts_r"}).assign(ts=lambda d: d.ts_r)
        .sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    ).sort_values("lv").reset_index(drop=True)

    assert got["lv"].tolist() == want["lv"].tolist()
    assert got["ts_r"].fillna(-1).tolist() == want["ts_r"].fillna(-1).tolist()
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


@settings(max_examples=15, deadline=None)
@given(st.data(), st.integers(1, 5))
def test_sliding_window_matches_reference_count(data, n_parts):
    import ray.data as rd

    from ttmf_ray.stages.temporal import sliding_window_agg

    ks, ts = _events(data.draw, n_keys=3)
    df = pd.DataFrame({"g": [f"g{k}" for k in ks], "ts": ts,
                       "v": np.ones(len(ks))})
    length, slide = 40, 10
    out = sliding_window_agg(
        rd.from_pandas(df).repartition(n_parts), ts_col="ts",
        key_cols=["g"], value_col="v", length=length, slide=slide,
    ).to_pandas()

    # reference: explode each row into its length/slide windows
    rows = []
    for g, t in zip(df["g"], df["ts"]):
        slot = t // slide
        for j in range(length // slide):
            rows.append((g, (slot - j) * slide))
    want = pd.DataFrame(rows, columns=["g", "win_start"]) \
        .groupby(["g", "win_start"]).size()
    got = out.set_index(["g", "win_start"])["n"].sort_index()
    assert got.astype(int).to_dict() == want.sort_index().to_dict()


@settings(max_examples=15, deadline=None)
@given(st.data(), st.integers(1, 4), st.integers(1, 6))
def test_grouped_topk_matches_pandas(data, n_parts, k):
    import ray.data as rd

    from ttmf_ray.functions.topk import grouped_topk

    ks, vs = _events(data.draw, n_keys=4)
    df = pd.DataFrame({"g": ks, "v": vs, "id": np.arange(len(ks))})
    got = grouped_topk(rd.from_pandas(df).repartition(n_parts),
                       key_cols=["g"], value_col="v", k=k,
                       tiebreak_cols=["id"]) \
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    want = (df.sort_values(["g", "v", "id"], ascending=[True, False, True])
            .groupby("g").head(k).sort_values(["g", "id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want)


@settings(max_examples=10, deadline=None)
@given(st.data(), st.integers(1, 4), st.integers(1, 30))
def test_deterministic_sample_is_prefix_stable(data, n_parts, n):
    """Growing n only APPENDS to the selection (hash order is a total
    order independent of n), and any block structure agrees."""
    import ray.data as rd

    from ttmf_ray.functions.sampling import deterministic_sample

    ids = data.draw(st.lists(st.integers(0, 10_000), min_size=5,
                             max_size=80, unique=True))
    df = pd.DataFrame({"a": ids})
    small = deterministic_sample(
        rd.from_pandas(df).repartition(n_parts), n=n,
        key_cols=["a"]).to_pandas()["a"].tolist()
    big = deterministic_sample(
        rd.from_pandas(df), n=n + 10, key_cols=["a"]).to_pandas()["a"].tolist()
    assert big[:len(small)] == small
