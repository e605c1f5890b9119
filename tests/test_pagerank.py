"""Global PageRank (stages/pagerank.py): structure sanity on a known
graph, driver-vs-pool parity, dangling-mass conservation."""

import numpy as np
import pandas as pd

import ray.data as rd

from ttmf_ray.stages.pagerank import pagerank


def _star_ds():
    # hub 0 receives from 1..9; 0 -> 1; node 10 dangling (isolated sink
    # reachable from 9)
    src = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 9], dtype=np.int64)
    dst = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 10], dtype=np.int64)
    return rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})), 11


def test_pagerank_hub_dominates_and_mass_conserved():
    ds, n = _star_ds()
    out = pagerank(ds, n, n_iter=20)
    assert len(out) == n
    pr = out.set_index("node")["pr"]
    assert pr.idxmax() == 0                      # the hub wins
    assert pr.loc[0] > pr.loc[1] > pr.loc[2]     # 1 gets the hub's mass
    # stochastic fix: total mass stays ~1 (quantization leaves ~1e-9/node)
    assert abs(pr.sum() - 1.0) < 1e-6


def test_pagerank_driver_pool_parity():
    ds, n = _star_ds()
    fast = pagerank(ds, n, n_iter=7)
    pool = pagerank(ds, n, n_iter=7, driver_max=0)
    pd.testing.assert_frame_equal(fast, pool)    # bitwise (9-dp quantized)

def test_katz_structure_and_driver_pool_parity():
    from ttmf_ray.stages.pagerank import katz

    ds, n = _star_ds()
    out = katz(ds, n, beta=0.1, n_iter=6)
    assert len(out) == n
    k = out.set_index("node")["katz"]
    assert k.idxmax() == 0                   # 9 incoming walks win
    # one-hop check: katz(10) gets only 9's walks, katz(1) only 0's
    assert k.loc[0] > k.loc[1] > 0
    assert k.loc[2] == 0.0                   # no in-edges at all
    pool = katz(ds, n, beta=0.1, n_iter=6, driver_max=0)
    pd.testing.assert_frame_equal(out, pool)  # bitwise (9-dp quantized)


def test_hits_structure_and_driver_pool_parity():
    from ttmf_ray.stages.pagerank import hits

    ds, n = _star_ds()
    out = hits(ds, n, n_iter=6)
    assert len(out) == n
    a = out.set_index("node")["auth"]
    h = out.set_index("node")["hub"]
    assert a.idxmax() == 0        # everyone points at the hub
    assert a.loc[0] == 1.0        # max normalization pins the top to 1
    assert h.max() == 1.0
    assert h.loc[0] < 1.0         # the hub only points at node 1
    pool = hits(ds, n, n_iter=6, driver_max=0)
    pd.testing.assert_frame_equal(out, pool)  # bitwise (9-dp quantized)
