"""Graph-stage unit tests: CSR build, subgraph BFS, personalized PageRank
(conformance vs an independent literal re-implementation of the pinned
reference formulas — SURVEY.md §5's duplicated-implementation strategy),
threshold sweeps, degrees/depth features."""

import numpy as np
import pandas as pd

from ttmf_ray.functions.transe import threshold_sweep
from ttmf_ray.stages.graph import (_bfs_subgraph, build_csr,
                                   personalized_pagerank)


def _literal_ppr(n, edges, core=0, alpha=0.85, max_iter=500, eps=1e-5):
    """Independent row-by-row port of pagerank.py:18-85 semantics."""
    out = {u: [] for u in range(n)}
    inc = {u: [] for u in range(n)}
    for u, v, w in edges:
        out[u].append((v, w))
        inc[v].append((u, w))
    # dangling fix
    for u in range(n):
        if not out[u]:
            out[u].append((u, 0.5))
            inc[u].append((u, 0.5))
            if u != core:
                out[u].append((core, 0.5))
                inc[core].append((u, 0.5))
    pr = {u: 0.0 for u in range(n)}
    pr[core] = 1.0
    damping = (1 - alpha) / n
    for _ in range(max_iter):
        change = 0.0
        new = {}
        for v in range(n):
            rank = damping
            for (u, w) in inc[v]:
                rank += alpha * pr[u] * w
            new[v] = rank
            change += abs(rank - pr[v])
        pr = new
        if change < eps:
            break
    return np.array([pr[u] for u in range(n)])


def test_ppr_matches_literal_reference_formula():
    edges = [(0, 1, 0.6), (0, 2, 0.4), (1, 3, 1.0), (2, 3, 0.5),
             (2, 4, 0.5), (3, 0, 1.0)]  # node 4 dangling
    n = 5
    esrc = np.array([e[0] for e in edges])
    edst = np.array([e[1] for e in edges])
    ew = np.array([e[2] for e in edges])
    got = personalized_pagerank(n, esrc, edst, ew, 0)
    want = _literal_ppr(n, edges, 0)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert got[0] > 0.1  # core retains mass


def test_csr_and_bfs_subgraph():
    # chain with parallel edges: 0→1 (two rels), 1→2, 2→3, 3→4, 4→5
    h = np.array([0, 0, 1, 2, 3, 4])
    t = np.array([1, 1, 2, 3, 4, 5])
    r = np.array([0, 1, 0, 0, 0, 0])
    csr = build_csr(h, t, r, 6)
    assert csr.cnt[csr.indptr[0]] == 2  # parallel rels counted
    glob, esrc, edst, ew, depth_of, trunc = _bfs_subgraph(csr, 0, depth=4)
    # nodes within distance 4: 0,1,2,3,4 (5 is at distance 5)
    assert set(glob.tolist()) == {0, 1, 2, 3, 4}
    assert not trunc
    # expanded nodes are distance ≤3 → edge 3→4 present, 4→5 absent
    assert depth_of.max() == 4
    # row-normalized weights: node 0 has a single neighbor → weight 1.0
    assert np.allclose(ew[esrc == 0], 1.0)


def test_bfs_truncation_reported():
    # star: 0 → 1..99
    h = np.zeros(99, dtype=np.int64)
    t = np.arange(1, 100, dtype=np.int64)
    r = np.zeros(99, dtype=np.int64)
    csr = build_csr(h, t, r, 100)
    glob, *_, trunc = _bfs_subgraph(csr, 0, depth=4, max_nodes=10)
    assert trunc and len(glob) == 10


def test_threshold_sweep_asc():
    # reference scan: values asc, running +1/-1 on previous flag
    v = np.array([1.0, 2.0, 3.0, 4.0])
    f = np.array([1, 1, -1, -1])
    assert threshold_sweep(v, f) == 2.5
    # all negatives first → threshold stays below the minimum
    f2 = np.array([-1, -1, 1, 1])
    assert threshold_sweep(v, f2) == v[0] - 0.01


def test_threshold_sweep_desc():
    v = np.array([0.9, 0.7, 0.2, 0.1])
    f = np.array([1, 1, -1, -1])
    assert threshold_sweep(v, f, descending=True) == (0.7 + 0.2) / 2
    f2 = np.array([-1, -1, 1, 1])
    assert threshold_sweep(v, f2, descending=True) == 0.9 + 0.01


def test_graph_features_stage_end_to_end():
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.stages.graph import graph_features_for_heads

    h = np.array([0, 1, 1, 2])
    t = np.array([1, 2, 3, 0])
    r = np.array([0, 0, 1, 0])
    csr = build_csr(h, t, r, 4)
    out = graph_features_for_heads(
        rd.from_pandas(pd.DataFrame({"head": [0]})), csr, concurrency=1
    ).to_pandas().set_index("node")
    assert set(out.index) == {0, 1, 2, 3}
    assert out.loc[0, "depth"] == 0
    assert out.loc[1, "depth"] == 1
    assert out.loc[2, "depth"] == 2 and out.loc[3, "depth"] == 2
    # out-degree of node 1 within subgraph = 2
    assert out.loc[1, "out_n"] == 2
    assert abs(out["pr"].sum() - 1.0) < 0.2  # mass roughly conserved


def test_kcore_pool_path_matches_driver_path(ray_session):
    """Rule-13 parity: the Dataset peeling loop and the driver numpy
    kernel land on the identical (unique) k-core."""
    import ray.data as rd

    from ttmf_ray.stages.graph import kcore

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, size=1500).astype(np.int64)
    b = rng.integers(0, 60, size=1500).astype(np.int64)
    keep = a < b
    ed = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
    drv = kcore(rd.from_pandas(ed), k=8)
    dist = kcore(rd.from_pandas(ed), k=8, driver_max=0)
    pd.testing.assert_frame_equal(drv.reset_index(drop=True),
                                  dist.reset_index(drop=True))


def test_biased_walks_diverge_from_uniform(ray_session):
    """Same seed, same graph: the node2vec weighting must change at
    least one step-2+ choice vs the uniform walker (weights 1/2/1 are
    non-uniform wherever a triangle or return edge exists), while
    step-1 rows are identical by construction (no prev yet)."""
    from ttmf_ray.stages.graph import biased_walks, random_walks

    rng = np.random.default_rng(5)
    h = rng.integers(0, 40, size=400).astype(np.int64)
    t = rng.integers(0, 40, size=400).astype(np.int64)
    r = rng.integers(0, 5, size=400).astype(np.int64)
    keep = h != t
    ids = pd.DataFrame({"h": h[keep], "t": t[keep], "r": r[keep]}) \
        .drop_duplicates(ignore_index=True)
    uni = random_walks(ids, 40, n_steps=3, seed=777)
    bia = biased_walks(ids, 40, n_steps=3, seed=777)
    u1 = uni[uni.step == 1].reset_index(drop=True)
    b1 = bia[bia.step == 1].reset_index(drop=True)
    pd.testing.assert_frame_equal(u1, b1)
    u2 = uni[uni.step > 1].reset_index(drop=True)
    b2 = bia[bia.step > 1].reset_index(drop=True)
    assert len(u2) == len(b2)          # same walks stay alive per step?
    assert not u2.equals(b2)           # the weighting changed choices


def test_reach2_frontier_cap_hot_mid_node(ray_session):
    """Planted hub: one mid node with 40 in- and 40 out-neighbors.
    Uncapped reach2 emits the full 40x40 cross product through the
    hub; with mid_cap=5 the hub's pair volume is bounded at 25 and the
    n_capped_mids counter fires.  A cap ABOVE every degree must be a
    no-op (identical counts, zero counter) — the kg_reach2 contract."""
    import ray.data as rd

    from ttmf_ray.stages.graph import reach2

    hub = 0
    ins = np.arange(1, 41, dtype=np.int64)           # 1..40 -> hub
    outs = np.arange(41, 81, dtype=np.int64)         # hub -> 41..80
    ed = pd.DataFrame({
        "src": np.concatenate([ins, np.full(40, hub, np.int64)]),
        "dst": np.concatenate([np.full(40, hub, np.int64), outs])})
    n_nodes = 81

    full = reach2(rd.from_pandas(ed), n_nodes)
    # every in-neighbor reaches hub + all 40 outs
    assert (full.loc[full.node.isin(ins), "n_reach2"] == 41).all()

    capped, stats = reach2(rd.from_pandas(ed), n_nodes,
                           mid_cap=5, with_stats=True)
    assert int(stats["n_capped_mids"].iloc[0]) == 1
    # capped: each in-neighbor keeps hub + the 5 smallest-id outs ...
    ins_kept = capped.loc[capped.node.isin(ins[:5]), "n_reach2"]
    assert (ins_kept == 6).all()
    # ... and in-neighbors outside the kept 5 lose their 2-hop set
    dropped = capped.loc[capped.node.isin(ins[5:]), "n_reach2"]
    assert (dropped == 1).all()

    noop, nstats = reach2(rd.from_pandas(ed), n_nodes,
                          mid_cap=1000, with_stats=True)
    assert int(nstats["n_capped_mids"].iloc[0]) == 0
    pd.testing.assert_frame_equal(noop, full)
