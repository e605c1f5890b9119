"""Path search/ranking and TransE trainer unit tests."""

import numpy as np
import pandas as pd

from ttmf_ray.stages.graph import build_csr
from ttmf_ray.stages.paths import enumerate_paths, rank_paths, _unit
from ttmf_ray.functions.transe import (TransEConfig, train_transe,
                                       transe_energy)


def _toy_csr():
    # 0→1 (r0), 1→2 (r1), 0→2 (r2), 2→0 (r3)
    h = np.array([0, 1, 0, 2])
    t = np.array([1, 2, 2, 0])
    r = np.array([0, 1, 2, 3])
    return build_csr(h, t, r, 3)


def test_enumerate_paths_simple():
    csr = _toy_csr()
    paths, trunc = enumerate_paths(csr, 0, max_len=3)
    assert not trunc
    # paths to 2: direct edge and the 2-hop chain
    p2 = set(paths[2])
    assert ((0, 2, 2),) in p2
    assert ((0, 1, 0), (1, 2, 1)) in p2
    # no revisits: no path returns through 0
    for plist in paths.values():
        for p in plist:
            nodes = [p[0][0]] + [e[1] for e in p]
            assert len(nodes) == len(set(nodes))


def test_rank_paths_skips_self_and_sorts():
    csr = _toy_csr()
    rng = np.random.default_rng(0)
    E = rng.standard_normal((3, 8))
    R = rng.standard_normal((4, 8))
    paths, _ = enumerate_paths(csr, 0, max_len=3)
    ranked = rank_paths(paths[2], _unit(E), _unit(R), 0, 2, 2)
    # the trivial self-path ((0,2,2),) must be excluded
    assert all(p != ((0, 2, 2),) for _, p in ranked)
    scores = [s for s, _ in ranked]
    assert scores == sorted(scores, reverse=True)


def test_path_search_stage():
    import ray.data as rd

    from ttmf_ray.stages.paths import ranked_paths_for_queries

    csr = _toy_csr()
    rng = np.random.default_rng(1)
    E, R = rng.standard_normal((3, 8)), rng.standard_normal((4, 8))
    q = pd.DataFrame({"h": [0], "t": [2], "r": [2]})
    out = ranked_paths_for_queries(rd.from_pandas(q), csr, E, R,
                                   concurrency=1).to_pandas()
    assert len(out) >= 1
    assert (out["rank"] == np.arange(len(out))).all()
    assert out["path_len"].iloc[0] in (1, 2)


def test_transe_learns_chain_structure():
    # ring KG: i --r0--> i+1 (mod n); plus a "same-cluster" relation
    n = 40
    h = np.arange(n)
    t = (h + 1) % n
    r = np.zeros(n, dtype=np.int64)
    triples = np.stack([h, t, r], axis=1)
    cfg = TransEConfig(dim=16, epochs=60, lr=0.01, seed=5)
    E, R = train_transe(triples, n, 1, cfg)
    pos = transe_energy(E, R, h, t, r)
    rng = np.random.default_rng(2)
    corrupt_t = rng.integers(0, n, size=n)
    neg = transe_energy(E, R, h, corrupt_t, r)
    # trained energies: positives should be clearly lower than corrupted
    assert pos.mean() < neg.mean() - 0.2, (pos.mean(), neg.mean())


def test_transe_logistic_mode_runs():
    n = 20
    h = np.arange(n)
    t = (h + 1) % n
    r = np.zeros(n, dtype=np.int64)
    triples = np.stack([h, t, r], axis=1)
    E, R = train_transe(triples, n, 1,
                        TransEConfig(dim=8, epochs=10, loss="logistic"))
    assert np.isfinite(E).all() and np.isfinite(R).all()


def test_ptranse_negative_mix_matches_reference():
    """Per positive: 15 head-corrupt + 15 tail-corrupt + 1 relation-corrupt
    negatives, redrawn only on collision with the original value
    (`PTransE.java:20,324-418,455-494`; KGE_config NEG_SAMPLE_COUNT=15)."""
    from ttmf_ray.functions.transe import _draw_logistic_negatives

    cfg = TransEConfig(loss="logistic")
    assert cfg.neg_per_pos == 15 and cfg.neg_rel == 1
    rng = np.random.default_rng(0)
    B, ne, nr = 50, 200, 9
    bh = rng.integers(0, ne, B)
    bt = rng.integers(0, ne, B)
    br = rng.integers(0, nr, B)
    NH, NT, NR = _draw_logistic_negatives(rng, bh, bt, br, ne, nr, cfg)
    k = cfg.neg_per_pos
    assert len(NH) == len(NT) == len(NR) == B * (2 * k + cfg.neg_rel)
    # head-corrupt block: tail/rel kept, head always differs
    hs, ts, rs = NH[:B * k], NT[:B * k], NR[:B * k]
    assert (ts == np.repeat(bt, k)).all() and (rs == np.repeat(br, k)).all()
    assert (hs != np.repeat(bh, k)).all()
    # tail-corrupt block
    hs, ts, rs = NH[B * k:2 * B * k], NT[B * k:2 * B * k], NR[B * k:2 * B * k]
    assert (hs == np.repeat(bh, k)).all() and (rs == np.repeat(br, k)).all()
    assert (ts != np.repeat(bt, k)).all()
    # relation-corrupt block
    hs, ts, rs = NH[2 * B * k:], NT[2 * B * k:], NR[2 * B * k:]
    assert (hs == bh).all() and (ts == bt).all() and (rs != br).all()
