"""Property tests for the cross-engine primitives (hypothesis).

These pin the CONTRACTS the 200 SQL mirrors rest on: the shared
half-up rounding rule matches DuckDB's floor() form on arbitrary
doubles (including exact dyadic ties), the vectorized mix64 equals the
scalar reference, the numpy JPEG codec round-trips within quantization
error for arbitrary images, and the bucket joins equal a pandas
reference join under arbitrary fragmentation.
"""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ttmf_ray.context import half_up
from ttmf_ray.sources.pages import mix64, mix64_vec


@settings(max_examples=200, deadline=None)
@given(st.one_of(
    st.floats(min_value=0, max_value=1e6, allow_nan=False),
    # exact dyadic ties: k/32 at 4dp, k/128 at 6dp
    st.integers(min_value=0, max_value=10**6).map(lambda k: k / 32.0),
    st.integers(min_value=0, max_value=10**7).map(lambda k: k / 128.0)),
    st.sampled_from([2, 4, 6]))
def test_half_up_matches_duckdb_floor_form(x, dp):
    con = duckdb.connect()
    want = con.execute(
        f"SELECT floor(? * {10**dp} + 0.5) / {10**dp}", [x]).fetchone()[0]
    got = float(half_up(x, dp))
    assert got == want, (x, dp, got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=4))
def test_mix64_vec_matches_scalar(xs):
    vec = mix64_vec(*[np.array([x]) for x in xs])
    assert int(vec[0]) == mix64(*xs)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31),
       st.integers(min_value=8, max_value=40),
       st.integers(min_value=8, max_value=40),
       st.sampled_from([60, 85, 95]))
def test_jpeg_roundtrip_bounded_error(seed, h, w, quality):
    from ttmf_ray.stages.jpegnp import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    # JPEG is built for band-limited content; random noise is its worst
    # case, so bound the MEAN error loosely and require exact shape
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == (h, w) and dec.dtype == np.uint8
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).mean()
    assert err < 80, err          # noise at q=60 stays far from garbage


@settings(max_examples=120, deadline=None)
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
def test_half_up_signed_matches_duckdb(x):
    # negative values: both engines use the identical floor() form, so
    # they agree BY CONSTRUCTION even though floor(x+0.5) is half-up
    # toward +inf on negatives
    con = duckdb.connect()
    want = con.execute(
        "SELECT floor(? * 1000000 + 0.5) / 1000000", [x]).fetchone()[0]
    assert float(half_up(x, 6)) == want


def test_left_join_fill_matches_pandas_reference(ray_session):
    """left_join_fill == pandas merge + fill on randomized inputs at
    several fragmentations (block structure must never change values)."""
    import ray.data as rd

    from ttmf_ray.functions.joins import left_join_fill

    rng = np.random.default_rng(11)
    for trial, (nblocks_l, nblocks_r) in enumerate(
            [(1, 1), (7, 23), (40, 3)]):
        nl, nr = 800, 300
        L = pd.DataFrame({
            "k": rng.integers(0, 1000, nl).astype(np.int64),
            "a": rng.standard_normal(nl)}).drop_duplicates("k")
        R = pd.DataFrame({
            "k": rng.choice(1000, nr, replace=False).astype(np.int64),
            "b": rng.standard_normal(nr),
            "c": rng.integers(0, 9, nr).astype(np.int64)})
        got = left_join_fill(
            rd.from_pandas(L).repartition(nblocks_l),
            rd.from_pandas(R).repartition(nblocks_r),
            on="k", fill={"b": 0.0, "c": -1}, hit_col="hit",
            coalesce=bool(trial % 2)).to_pandas() \
            .sort_values("k", ignore_index=True)
        want = L.merge(R, on="k", how="left")
        want["hit"] = want["b"].notna().astype(np.float64)
        want["b"] = want["b"].fillna(0.0)
        want["c"] = want["c"].fillna(-1).astype(np.int64)
        want = want.sort_values("k", ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["k", "a", "b", "c", "hit"]], want)
