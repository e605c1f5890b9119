"""Phase B end-to-end: corrupted-triple detection on the synthetic KG —
the estimator must separate flag=1 from flag=-1 (SURVEY.md §5 item 4)."""

import numpy as np
import pytest

from ttmf_ray.functions.transe import TransEConfig
from ttmf_ray.pipelines.kg_construct import kg_construct
from ttmf_ray.pipelines.trust import TrustConfig, trust_pipeline
from ttmf_ray.sources.pages import CorpusSpec, pages_dataset


@pytest.fixture(scope="module")
def trust_result():
    spec = CorpusSpec(seed=42, n_pages=600)
    edges = kg_construct(pages_dataset(spec))
    cfg = TrustConfig(
        transe=TransEConfig(dim=32, epochs=60, lr=0.02),
        ptranse=TransEConfig(dim=32, epochs=20, lr=0.01, loss="logistic"),
    )
    return trust_pipeline(edges, cfg)


def test_detection_separates_corrupted(trust_result):
    assert trust_result["accuracy"] >= 0.70, trust_result["accuracy"]
    assert trust_result["max_f1"] >= 0.70, trust_result["max_f1"]
    st = trust_result["scored_test"]
    assert st[st.flag == 1]["conf"].mean() > st[st.flag == -1]["conf"].mean()


def test_vocab_ids_sorted_and_stable(trust_result):
    ev = trust_result["ent_vocab"]
    assert list(ev["name"]) == sorted(ev["name"])
    assert list(ev["id"]) == list(range(len(ev)))


def test_thresholds_exist_per_key(trust_result):
    assert len(trust_result["theta_r"]) >= 5   # most relations covered
    assert len(trust_result["theta_h"]) >= 10


def test_pr_sweep_table_shape(trust_result):
    sw = trust_result["pr_sweep"]
    assert list(sw.columns) == ["threshold", "precision", "recall", "f1"]
    assert len(sw) == 50
    assert ((sw["precision"] >= 0) & (sw["precision"] <= 1)).all()


def test_negative_sampler_deterministic():
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.sampling import labeled_examples

    pos = pd.DataFrame({"h": [0, 1, 2], "t": [1, 2, 0], "r": [0, 0, 1]})
    gold = frozenset([(0, 1, 0), (1, 2, 0), (2, 0, 1)])
    a = labeled_examples(rd.from_pandas(pos), gold, n_entities=10,
                         n_relations=2).to_pandas()
    b = labeled_examples(rd.from_pandas(pos), gold, n_entities=10,
                         n_relations=2).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["h", "t", "r", "flag"]).reset_index(drop=True),
        b.sort_values(["h", "t", "r", "flag"]).reset_index(drop=True),
    )
    assert (a["flag"].to_numpy() == 1).sum() == 3
    assert (a["flag"].to_numpy() == -1).sum() == 3
    # no generated negative collides with the gold set
    negs = a[a.flag == -1][["h", "t", "r"]].itertuples(index=False)
    assert all(tuple(x) not in gold for x in negs)


def test_split_deterministic_and_disjoint():
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.sampling import split_edges

    df = pd.DataFrame({
        "h": np.arange(1000) % 97,
        "t": np.arange(1000) % 89,
        "r": np.arange(1000) % 7,
    })
    tr, va, te = split_edges(rd.from_pandas(df))
    n_tr, n_va, n_te = tr.count(), va.count(), te.count()
    assert n_tr + n_va + n_te == 1000
    assert n_tr > 600 and n_va > 20 and n_te > 20


def test_trust_scores_driver_query_pinned_fixture():
    """Regression pin for the default phase-B path's RESULTS (BASELINE.md
    §"trust_scores determinism pin") against a committed fixture.

    Split per rule 14 (CLAUDE.md): (h, t, r, flag) is pure seeded data
    movement — pinned EXACTLY.  conf is downstream of multi-epoch float
    training, where numpy's alignment/thread-sensitive SIMD reduction
    order drifts ~1 ulp ACROSS SESSIONS; at float32 a 1-ulp drift flips
    6-dp rounding on ~10% of rows, so an exact conf hash is inherently
    flaky (observed 2026-08-18: two stable-within-session values hours
    apart on identical code).  REVISED 2026-08-20: the original
    atol=2e-6 (one rounding quantum) ALSO failed on identical code —
    a fresh session showed 14/540 rows at up to 5e-6 (max rel 2.4e-5,
    ~200 float32 ulps), rep-to-rep 0.00 within the session and
    byte-identical at the parent commit, i.e. multi-epoch training
    AMPLIFIES the per-op ulp drift well past one quantum.  The pin is
    now two-sided: a loose max bound (5e-5, 10x the measured worst
    case, still ~100x below any semantic change — the pool-vs-rnn
    branch swap moves conf by O(1e-2)) plus a drift-SHAPE bound (at
    most 5% of rows beyond one rounding quantum) that catches a broad
    subtle change an outlier bound would miss."""
    import os

    import numpy as np
    import pandas as pd

    from ttmf_ray.pipelines.corpus_queries import trust_scores

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "trust_scores_sf0001.parquet")
    exp = pd.read_parquet(fixture)

    df = trust_scores("/root/testdata/sf0.001")
    df = df.sort_values(["h", "t", "r", "flag"]).reset_index(drop=True)
    assert len(df) == len(exp) == 540
    for col in ("h", "t", "r", "flag"):
        assert (df[col].to_numpy() == exp[col].to_numpy()).all(), col
    # Two-sided pin (see docstring): loose max bound + drift shape.
    d = np.abs(df["conf"].to_numpy() - exp["conf"].to_numpy())
    np.testing.assert_allclose(df["conf"].to_numpy(),
                               exp["conf"].to_numpy(), atol=5e-5, rtol=0)
    n_drift = int((d > 2e-6).sum())
    assert n_drift <= 0.05 * len(d), \
        f"{n_drift}/{len(d)} conf rows moved past one rounding quantum"


def test_pool_stacked_remote_bitwise_parity(ray_session):
    """The Ray-task pooling path must be BITWISE identical to the
    driver-thread path (per-row kernel, any chunking) — the guarantee
    train_fusion relies on when a worker pool is requested."""
    import numpy as np

    from ttmf_ray.functions.fusion import (MAX_P, N_BRANCH, FusionModel,
                                           pool_stacked_remote)

    rng = np.random.default_rng(5)
    n_ent, n_rel, k, B = 200, 20, 24, 70000
    Ep = rng.standard_normal((n_ent, k)).astype(np.float32)
    Rp = rng.standard_normal((n_rel, k)).astype(np.float32)
    seqs = []
    for _ in range(N_BRANCH):
        s = rng.integers(0, n_ent, (B, MAX_P))
        d = rng.integers(0, n_ent, (B, MAX_P))
        r = rng.integers(0, n_rel, (B, MAX_P))
        ln = rng.integers(0, MAX_P + 1, B)
        seqs.append((s, d, r, ln))
    model = FusionModel(W1=None, b1=None, W2=None, b2=None, mu=None,
                        sd=None, emb=(Ep, Rp))
    thread = model.pool_stacked(seqs)
    remote = pool_stacked_remote((Ep, Rp), seqs, n_tasks=5)
    assert remote.dtype == thread.dtype and remote.shape == thread.shape
    assert (remote == thread).all()


def test_rnn_branch_mode_end_to_end(ray_session):
    """branch_mode="rnn" (reference SimpleRNN cell, Model1.py:88) trains
    and scores; masked-carry semantics: all-pad rows contribute the zero
    state; scoring via precomputed slabs == scoring via seqs gather."""
    import numpy as np
    import pandas as pd

    from ttmf_ray.functions.fusion import (ALL_SEQ_COLUMNS, FEATURES,
                                           MAX_P, N_BRANCH, steps_stacked,
                                           score_fusion_df, train_fusion,
                                           _extract_seqs)

    rng = np.random.default_rng(3)
    n, n_ent, n_rel, k = 600, 50, 8, 12
    df = pd.DataFrame({f: rng.standard_normal(n) for f in FEATURES})
    df["flag"] = np.where(rng.random(n) < 0.5, 1, -1)
    df["h"] = rng.integers(0, n_ent, n)
    df["t"] = rng.integers(0, n_ent, n)
    df["r"] = rng.integers(0, n_rel, n)
    for b in range(N_BRANCH):
        for i in range(MAX_P):
            df[f"p{b}_s{i}"] = rng.integers(0, n_ent, n)
            df[f"p{b}_d{i}"] = rng.integers(0, n_ent, n)
            df[f"p{b}_r{i}"] = rng.integers(0, n_rel, n)
        df[f"p{b}_len"] = rng.integers(0, MAX_P + 1, n)
    assert all(c in df.columns for c in ALL_SEQ_COLUMNS)
    Ep = rng.standard_normal((n_ent, k)).astype(np.float32)
    Rp = rng.standard_normal((n_rel, k)).astype(np.float32)
    model = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                         branch_mode="rnn")
    assert model.branch_mode == "rnn"
    scored = score_fusion_df(df, model)
    assert scored["conf"].between(0, 1).all()
    # slab path == seqs-gather path (same kernels, different entry)
    seqs = _extract_seqs(df)
    trip_ids = tuple(df[c].to_numpy(np.int64) for c in ("h", "r", "t"))
    trip, steps, lens = steps_stacked((Ep, Rp), seqs, trip_ids)
    zk_slab = model._zk_rnn(trip, steps, lens)
    zk_seq = model._zk_rnn_from_seqs(seqs, trip_ids)
    assert (zk_slab == zk_seq).all()
    # all-pad rows: zero state → zk = sigmoid(cb) exactly
    allpad = np.flatnonzero((lens == 0).all(axis=1))
    if len(allpad):
        cb = model.branches[4]
        exp = 1.0 / (1.0 + np.exp(-cb))
        assert np.allclose(zk_slab[allpad], exp[None, :], atol=0, rtol=0)
    # distributed local-SGD with the RNN branch data (the tuple slab
    # rides ray.put; workers run the same _batch_grads BPTT)
    model_w = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                           branch_mode="rnn", workers=2)
    scored_w = score_fusion_df(df, model_w)
    assert scored_w["conf"].between(0, 1).all()


def test_fusion_batch_grads_finite_difference():
    """Numeric gradient check of _batch_grads for BOTH branch modes —
    the BPTT through the masked-carry RNN is the subtlest math in the
    estimator; every parameter tensor is checked entry-wise against
    central differences of the BCE loss."""
    import numpy as np

    from ttmf_ray.functions.fusion import (MAX_P, N_BRANCH, _batch_grads,
                                           _rnn_forward)

    rng = np.random.default_rng(17)
    B, d_scalar, hh, d_step = 12, 5, 3, 4
    xb = rng.standard_normal((B, d_scalar))
    yb = (rng.random(B) < 0.5).astype(np.float64)

    def head_params(d_in):
        return [rng.standard_normal((d_in, 6)) * 0.4, np.zeros(6),
                rng.standard_normal((6, 1)) * 0.4, np.zeros(1)]

    def loss(params, branch_batch, rnn):
        if branch_batch is None:
            Zin = xb
        elif rnn:
            tb, sb, lb = branch_batch
            zk, _ = _rnn_forward(tuple(params[4:]), tb, sb, lb)
            Zin = np.concatenate([zk, xb], axis=1)
        else:
            Wb, bb, wb, cb = params[4:]
            Hk = np.tanh(np.matmul(branch_batch.transpose(1, 0, 2), Wb)
                         .transpose(1, 0, 2) + bb)
            zk = 1.0 / (1.0 + np.exp(-((Hk * wb[None]).sum(axis=2)
                                       + cb)))
            Zin = np.concatenate([zk, xb], axis=1)
        W1, b1, W2, b2 = params[:4]
        H = np.tanh(Zin @ W1 + b1)
        p = 1.0 / (1.0 + np.exp(-(H @ W2 + b2)))[:, 0]
        return -np.mean(yb * np.log(p) + (1 - yb) * np.log(1 - p))

    def check(params, branch_batch, rnn):
        grads = _batch_grads(params, xb, yb, branch_batch, rnn=rnn)
        eps = 1e-6
        for k, (pm, g) in enumerate(zip(params, grads)):
            flat = pm.reshape(-1)
            for j in range(0, flat.size, max(1, flat.size // 7)):
                orig = flat[j]
                flat[j] = orig + eps
                lp = loss(params, branch_batch, rnn)
                flat[j] = orig - eps
                lm = loss(params, branch_batch, rnn)
                flat[j] = orig
                num = (lp - lm) / (2 * eps)
                ana = g.reshape(-1)[j]
                assert abs(num - ana) <= 1e-6 + 1e-4 * abs(num), \
                    (rnn, k, j, num, ana)

    # RNN mode: masked-carry BPTT (lens include 0 = all-pad rows)
    tb = rng.standard_normal((B, d_step))
    sb = rng.standard_normal((B, N_BRANCH, MAX_P, d_step))
    lb = rng.integers(0, MAX_P + 1, (B, N_BRANCH)).astype(np.int64)
    rnn_params = head_params(d_scalar + N_BRANCH) + [
        rng.standard_normal((N_BRANCH, 2 * d_step, hh)) * 0.4,
        rng.standard_normal((N_BRANCH, hh, hh)) * 0.4,
        rng.standard_normal((N_BRANCH, hh)) * 0.2,
        rng.standard_normal((N_BRANCH, hh)) * 0.4,
        rng.standard_normal(N_BRANCH) * 0.2]
    check(rnn_params, (tb, sb, lb), rnn=True)

    # pool mode
    Vm = rng.standard_normal((B, N_BRANCH, 2 * d_step))
    pool_params = head_params(d_scalar + N_BRANCH) + [
        rng.standard_normal((N_BRANCH, 2 * d_step, hh)) * 0.4,
        rng.standard_normal((N_BRANCH, hh)) * 0.2,
        rng.standard_normal((N_BRANCH, hh)) * 0.4,
        rng.standard_normal(N_BRANCH) * 0.2]
    check(pool_params, Vm, rnn=False)

    # scalar-only
    check(head_params(d_scalar), None, rnn=False)


def test_fusion_batch_grads_branch_reg_finite_difference():
    """Numeric gradient check of the branch_reg stack (input Dropout →
    SimpleRNN → batch-stat BatchNorm → Dropout → σ, Model1.py:86-99) —
    every trained tensor including the BN gamma/beta, with FIXED
    dropout masks so the loss is a deterministic function of params."""
    import numpy as np

    from ttmf_ray.functions.fusion import (MAX_P, N_BRANCH, _BN_EPS,
                                           _batch_grads)

    rng = np.random.default_rng(29)
    B, d_scalar, hh, d_step = 12, 5, 3, 4
    xb = rng.standard_normal((B, d_scalar))
    yb = (rng.random(B) < 0.5).astype(np.float64)
    tb = rng.standard_normal((B, d_step))
    sb = rng.standard_normal((B, N_BRANCH, MAX_P, d_step))
    lb = rng.integers(0, MAX_P + 1, (B, N_BRANCH)).astype(np.int64)
    m_in = (rng.random((B, N_BRANCH, MAX_P, 2 * d_step)) < 0.5) / 0.5
    m_out = (rng.random((B, N_BRANCH, hh)) < 0.5) / 0.5

    params = [rng.standard_normal((d_scalar + N_BRANCH, 6)) * 0.4,
              np.zeros(6),
              rng.standard_normal((6, 1)) * 0.4, np.zeros(1),
              rng.standard_normal((N_BRANCH, 2 * d_step, hh)) * 0.4,  # Wx
              rng.standard_normal((N_BRANCH, hh, hh)) * 0.4,          # Wh
              rng.standard_normal((N_BRANCH, hh)) * 0.2,              # bh
              rng.standard_normal((N_BRANCH, hh)) * 0.4,              # wb
              rng.standard_normal(N_BRANCH) * 0.2,                    # cb
              1.0 + 0.3 * rng.standard_normal((N_BRANCH, hh)),   # gamma
              0.2 * rng.standard_normal((N_BRANCH, hh)),         # beta
              np.zeros((N_BRANCH, hh)),                       # run_mean
              np.ones((N_BRANCH, hh))]                        # run_var

    def loss(params):
        W1, b1, W2, b2 = params[:4]
        Wx, Wh, bh, wb, cb = params[4:9]
        gamma, beta = params[9], params[10]
        h = np.zeros((B, N_BRANCH, hh))
        for t in range(MAX_P):
            x = np.empty((B, N_BRANCH, 2 * d_step))
            x[:, :, :d_step] = tb[:, None, :] * m_in[:, :, t, :d_step]
            x[:, :, d_step:] = sb[:, :, t, :] * m_in[:, :, t, d_step:]
            pre = (np.matmul(x.transpose(1, 0, 2), Wx)
                   + np.matmul(h.transpose(1, 0, 2), Wh)
                   + bh[:, None, :])
            hn = np.tanh(pre).transpose(1, 0, 2)
            h = np.where((lb > t)[:, :, None], hn, h)
        mean_b, var_b = h.mean(axis=0), h.var(axis=0)
        hN = (h - mean_b) / np.sqrt(var_b + _BN_EPS)
        hD = (gamma * hN + beta) * m_out
        zk = 1.0 / (1.0 + np.exp(-((hD * wb[None]).sum(axis=2) + cb)))
        Zin = np.concatenate([zk, xb], axis=1)
        H = np.tanh(Zin @ W1 + b1)
        p = 1.0 / (1.0 + np.exp(-(H @ W2 + b2)))[:, 0]
        return -np.mean(yb * np.log(p) + (1 - yb) * np.log(1 - p))

    grads = _batch_grads(params, xb, yb, (tb, sb, lb), rnn=True,
                         reg_masks=(m_in, m_out))
    assert len(grads) == 11                  # run stats take no grads
    eps = 1e-6
    for k, (pm, g) in enumerate(zip(params, grads)):
        flat = pm.reshape(-1)
        for j in range(0, flat.size, max(1, flat.size // 7)):
            orig = flat[j]
            flat[j] = orig + eps
            lp = loss(params)
            flat[j] = orig - eps
            lm = loss(params)
            flat[j] = orig
            num = (lp - lm) / (2 * eps)
            ana = g.reshape(-1)[j]
            assert abs(num - ana) <= 1e-6 + 1e-4 * abs(num), \
                (k, j, num, ana)


def test_fusion_branch_reg_train_and_score():
    """branch_reg=True trains, scores in [0,1], is run-to-run
    deterministic, and the stored BN running stats actually shift off
    their init (proof the momentum update fires)."""
    import numpy as np
    import pandas as pd

    from ttmf_ray.functions.fusion import (ALL_SEQ_COLUMNS, MAX_P,
                                           N_BRANCH, FEATURES,
                                           score_fusion_df, train_fusion)

    rng = np.random.default_rng(47)
    n, n_ent, n_rel, k = 240, 40, 6, 8
    df = pd.DataFrame({f: rng.standard_normal(n) for f in FEATURES})
    df["flag"] = rng.integers(0, 2, n)
    df["h"] = rng.integers(0, n_ent, n)
    df["t"] = rng.integers(0, n_ent, n)
    df["r"] = rng.integers(0, n_rel, n)
    for b in range(N_BRANCH):
        for i in range(MAX_P):
            df[f"p{b}_s{i}"] = rng.integers(0, n_ent, n)
            df[f"p{b}_d{i}"] = rng.integers(0, n_ent, n)
            df[f"p{b}_r{i}"] = rng.integers(0, n_rel, n)
        df[f"p{b}_len"] = rng.integers(0, MAX_P + 1, n)
    assert all(c in df.columns for c in ALL_SEQ_COLUMNS)
    Ep = rng.standard_normal((n_ent, k)).astype(np.float32)
    Rp = rng.standard_normal((n_rel, k)).astype(np.float32)

    m1 = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                      branch_mode="rnn", branch_reg=True)
    assert m1.bn is not None
    gamma, beta, rm, rv = m1.bn
    assert rm.shape == (N_BRANCH, m1.branches[2].shape[1])
    assert not np.allclose(rm, 0.0)          # momentum update fired
    s1 = score_fusion_df(df, m1)
    assert s1["conf"].between(0, 1).all()

    m2 = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                      branch_mode="rnn", branch_reg=True)
    s2 = score_fusion_df(df, m2)
    assert (s1["conf"].to_numpy() == s2["conf"].to_numpy()).all()

    # reg off is bit-identical to the pre-BN kernel path (bn=None)
    m0 = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                      branch_mode="rnn")
    assert m0.bn is None

    # distributed local-SGD path with the reg params (stats average
    # across workers like every other parameter)
    mw = train_fusion(df, epochs=6, path_emb=(Ep, Rp),
                      branch_mode="rnn", branch_reg=True, workers=2)
    sw = score_fusion_df(df, mw)
    assert sw["conf"].between(0, 1).all()
