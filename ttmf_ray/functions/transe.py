"""TransE training + translation-energy features + threshold sweeps
(SURVEY.md T7 / M5 / M6 / A3).

The trainer is a from-scratch numpy SGD reimplementation of the semantics
of the reference's Java trainer (`KGE/src/approaches/TransE.java:245-325`):
margin ranking loss max(0, margin + d(pos) − d(neg)) with L2 distance,
uniform head-or-tail corruption per positive, entity vectors re-normalized
to the unit ball each epoch, dev-loss model selection.  Hyperparameters
default to the reference's (`KGE_config_template.properties:6-13`): k=100,
epochs=50, margin=1.0, lr=0.001.

It runs DRIVER-SIDE over materialized id triples — inherently sequential
SGD does not map to Ray Data (SURVEY.md §7.5 item 4); at real scale the
same step function applies data-parallel with periodic parameter averaging
over ``ds.iter_batches`` shards.  Everything downstream consumes the
embedding matrices via one ``ray.put``.

A PTransE-flavored logistic-loss mode matches the second trainer's shape
(`PTransE.java:279-451`): σ(bias − ½‖h+r−t‖²) with multiple negatives.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast


@dataclass
class TransEConfig:
    dim: int = 100
    epochs: int = 50
    margin: float = 1.0
    lr: float = 0.001
    seed: int = 17
    loss: str = "margin"          # "margin" (TransE) | "logistic" (PTransE)
    bias: float = 7.0             # logistic mode (KGE_config bias=7.0)
    # logistic (PTransE) negative mix — reference defaults
    # (`PTransE.java:20` NEG_SAMPLE_COUNT=15: per positive, 15 head-corrupt
    # + 15 tail-corrupt negatives, plus 1 relation-corrupt negative,
    # `PTransE.java:324-418`; margin mode keeps TransE's 1:1 corruption)
    neg_per_pos: int = 15
    neg_rel: int = 1
    batch_size: int = 4096


def _draw_neg_matrices(rng, bh, bt, br, n_entities: int,
                       n_relations: int, cfg: TransEConfig):
    """The PTransE negative mix for one batch of positives: per positive,
    ``neg_per_pos`` head- and tail-corrupt + ``neg_rel`` relation-corrupt
    draws; each draw is redrawn only while it equals the original value
    (`PTransE.java:455-494` — no gold-membership check in the reference).

    Returns (nh_m (B,k), nt_m (B,k), nr_m (B,neg_rel)) draw matrices.
    """
    B, k = len(bh), cfg.neg_per_pos

    def draw(orig, vocab, count):
        if count == 0 or vocab <= 1:
            return np.empty((B, 0), dtype=np.int64)
        m = rng.integers(0, vocab, size=(B, count))
        while True:
            bad = m == orig[:, None]
            if not bad.any():
                return m
            m[bad] = rng.integers(0, vocab, size=int(bad.sum()))

    nh_m = draw(bh, n_entities, k)              # corrupt head, keep (t, r)
    nt_m = draw(bt, n_entities, k)              # corrupt tail, keep (h, r)
    nr_m = draw(br, n_relations, cfg.neg_rel)   # corrupt rel,  keep (h, t)
    return nh_m, nt_m, nr_m


def _draw_logistic_negatives(rng, bh, bt, br, n_entities: int,
                             n_relations: int, cfg: TransEConfig):
    """Flat (NH, NT, NR) id arrays of all negative rows, blocks in
    head/tail/relation order (the row-level view of the draw matrices)."""
    nh_m, nt_m, nr_m = _draw_neg_matrices(rng, bh, bt, br, n_entities,
                                          n_relations, cfg)
    kh, kt, kr = nh_m.shape[1], nt_m.shape[1], nr_m.shape[1]
    NH = np.concatenate([nh_m.ravel(), np.repeat(bh, kt), np.repeat(bh, kr)])
    NT = np.concatenate([np.repeat(bt, kh), nt_m.ravel(), np.repeat(bt, kr)])
    NR = np.concatenate([np.repeat(br, kh), np.repeat(br, kt), nr_m.ravel()])
    return NH, NT, NR


def _take_rows(scratch: dict | None, key: str, n: int, dim: int):
    """Reused (n, dim) float32 scratch row-buffer (sliced view).

    The negative side of one PTransE batch streams ~160 MB of (31·B, dim)
    temporaries; fresh np.empty per op mmap-faults every page, and with W
    parallel workers the fault churn serializes on the kernel — measured
    4x per-worker slowdown at W=8.  Reusing per-worker buffers keeps the
    pages resident.
    """
    if scratch is None:
        return np.empty((n, dim), np.float32)
    b = scratch.get(key)
    if b is None or b.shape[0] < n or b.shape[1] != dim:
        b = np.empty((n, dim), np.float32)
        scratch[key] = b
    return b[:n]


def _logistic_batch(E, R, bh, bt, br, rng, n_entities, n_relations, cfg,
                    touched=None, scratch=None):
    """One PTransE logistic SGD step: maximize log σ(e(pos)) +
    Σ log(1−σ(e(neg))) with e = bias − ½‖h+r−t‖² (`PTransE.java:299-418`);
    the positive gradient carries the reference's ×3 scale
    (`PTransE.java:314-316`, embCalculator(…, ±3.0f)); negatives are the
    15/15/1 head/tail/relation mix.  Shared by the serial and the
    distributed (local-SGD) trainers so their per-batch semantics are
    identical; ``touched`` (optional bool mask) records every entity row
    the scatter-adds hit, for masked averaging; ``scratch`` (optional
    dict) carries reused per-worker buffers across batches.
    """
    nh_m, nt_m, nr_m = _draw_neg_matrices(
        rng, bh, bt, br, n_entities, n_relations, cfg)
    dim = E.shape[1]

    def coef_of(dd, target, scale):
        # ‖dd‖² once via einsum (no extra (…, dim) temporary), reused for
        # the energy and the row-norm clip.
        # Δθ = lr·(target−p)·de/dθ with de/dE[h]=de/dR=−dd, de/dE[t]=+dd;
        # gradient row-norm clip: unlike the margin loss (unit direction
        # vectors), raw dd feedback self-amplifies on hot entities and
        # overflows f32 at scale.
        sq = np.einsum("...j,...j->...", dd, dd)
        e = np.clip(cfg.bias - 0.5 * sq, -30, 30)
        p = 1.0 / (1.0 + np.exp(-e))
        dn = np.sqrt(sq)
        return (np.minimum(1.0, 5.0 / np.maximum(dn, 1e-12))
                * (p - target) * (cfg.lr * scale)).astype(np.float32)

    def take3(key, M, idx2d):
        # gather M[idx2d] (B, k, dim) into a reused flat buffer
        B, k = idx2d.shape
        buf = _take_rows(scratch, key, B * k, dim)
        np.take(M, idx2d.reshape(-1), axis=0, out=buf)
        return buf.reshape(B, k, dim)

    # positive rows: d = E[h] + R[r] − E[t], ×3 gradient scale
    d = E[bh] + R[br] - E[bt]
    d *= coef_of(d, 1.0, 3.0)[:, None]
    np.add.at(E, bh, d)
    np.add.at(R, br, d)
    np.subtract.at(E, bt, d)

    # negative blocks share the uncorrupted pair per positive, so the
    # gradient onto the SHARED rows is pre-summed over the k draws — one
    # B-row scatter instead of k·B — and only the corrupted side pays the
    # full (B·k)-row gather/scatter (≈3x less memory traffic than the
    # flat-row formulation; algebraically identical updates)
    if nh_m.shape[1]:                       # corrupt head, keep (t, r)
        g = take3("g3", E, nh_m)
        g += (R[br] - E[bt])[:, None, :]
        g *= coef_of(g, 0.0, 1.0)[:, :, None]
        np.add.at(E, nh_m, g)
        gs = g.sum(axis=1)
        np.add.at(R, br, gs)
        np.subtract.at(E, bt, gs)
    if nt_m.shape[1]:                       # corrupt tail, keep (h, r)
        g = take3("g3", E, nt_m)
        np.subtract((E[bh] + R[br])[:, None, :], g, out=g)
        g *= coef_of(g, 0.0, 1.0)[:, :, None]
        gs = g.sum(axis=1)
        np.add.at(E, bh, gs)
        np.add.at(R, br, gs)
        np.subtract.at(E, nt_m, g)
    if nr_m.shape[1]:                       # corrupt rel, keep (h, t)
        g = take3("gr3", R, nr_m)
        g += (E[bh] - E[bt])[:, None, :]
        g *= coef_of(g, 0.0, 1.0)[:, :, None]
        np.add.at(R, nr_m, g)
        gs = g.sum(axis=1)
        np.add.at(E, bh, gs)
        np.subtract.at(E, bt, gs)
    if touched is not None:
        touched[nh_m.reshape(-1)] = True
        touched[nt_m.reshape(-1)] = True


def train_transe(
    triples: np.ndarray,          # (n, 3) int arrays of (h, t, r)
    n_entities: int,
    n_relations: int,
    cfg: TransEConfig = TransEConfig(),
    dev_triples: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (entity2vec, relation2vec); dev-loss best-epoch selection."""
    rng = np.random.default_rng(cfg.seed)
    bound = 6.0 / np.sqrt(cfg.dim)
    E = rng.uniform(-bound, bound, size=(n_entities, cfg.dim)).astype(np.float32)
    R = rng.uniform(-bound, bound, size=(n_relations, cfg.dim)).astype(np.float32)
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12).astype(np.float32)

    h, t, r = triples[:, 0], triples[:, 1], triples[:, 2]
    n = len(h)
    best = (np.inf, E.copy(), R.copy())
    scratch: dict = {}

    def dev_loss(E, R):
        if dev_triples is None or len(dev_triples) == 0:
            return None
        d = E[dev_triples[:, 0]] + R[dev_triples[:, 2]] - E[dev_triples[:, 1]]
        return float(np.linalg.norm(d, axis=1).mean())

    for epoch in range(cfg.epochs):
        # unit-ball renorm of entities each epoch (reference renorms per epoch)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.divide(E, np.maximum(norms, 1.0), out=E)

        perm = rng.permutation(n)
        for start in range(0, n, cfg.batch_size):
            idx = perm[start : start + cfg.batch_size]
            bh, bt, br = h[idx], t[idx], r[idx]
            if cfg.loss == "margin":
                d_pos = E[bh] + R[br] - E[bt]
                # corrupt head or tail uniformly (TransE.java:326-356)
                corrupt_head = rng.random(len(idx)) < 0.5
                neg_e = rng.integers(0, n_entities, size=len(idx))
                nh = np.where(corrupt_head, neg_e, bh)
                nt = np.where(corrupt_head, bt, neg_e)
                d_neg = E[nh] + R[br] - E[nt]
                pos_n = np.linalg.norm(d_pos, axis=1)
                neg_n = np.linalg.norm(d_neg, axis=1)
                viol = cfg.margin + pos_n - neg_n > 0
                if not viol.any():
                    continue
                gp = d_pos[viol] / np.maximum(pos_n[viol, None], 1e-12)
                gn = d_neg[viol] / np.maximum(neg_n[viol, None], 1e-12)
                lr = cfg.lr
                np.add.at(E, bh[viol], -lr * gp)
                np.add.at(E, bt[viol], lr * gp)
                np.add.at(R, br[viol], -lr * gp)
                np.add.at(E, nh[viol], lr * gn)
                np.add.at(E, nt[viol], -lr * gn)
                np.add.at(R, br[viol], lr * gn)
            else:
                _logistic_batch(E, R, bh, bt, br, rng,
                                n_entities, n_relations, cfg,
                                scratch=scratch)

        dl = dev_loss(E, R)
        if dl is not None and dl < best[0]:
            best = (dl, E.copy(), R.copy())

    if dev_triples is not None and best[0] < np.inf:
        return best[1], best[2]
    return E, R


def _epoch_worker(E, R, shard, cfg_dict, round_no, wid, n_entities,
                  local_epochs):
    """``local_epochs`` SGD epochs over one shard from the given weights.

    Module-level (not a closure) so Ray serializes only arguments; E/R
    arrive via the object store (zero-copy reads, copied once for the
    in-place update).  Multiple local epochs per averaging round amortize
    the weight broadcast (local-SGD / FedAvg-style).
    """
    cfg = TransEConfig(**cfg_dict)
    E = np.array(E, dtype=np.float32)  # writable local copies
    R = np.array(R, dtype=np.float32)
    h, t, r = shard[:, 0], shard[:, 1], shard[:, 2]
    n = len(h)
    # touched mask: every entity row this shard's SGD actually scatter-adds
    # into — positives AND the uniformly drawn corruption targets (a plain
    # h/t mask silently discarded the E[nh]/E[nt] updates at averaging
    # time: an entity appearing only as a corruption target never moved)
    touched = np.zeros(len(E), dtype=bool)
    touched[h] = True
    touched[t] = True
    scratch: dict = {}
    for le in range(local_epochs):
        rng = np.random.default_rng((cfg.seed, round_no, le, wid))
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.divide(E, np.maximum(norms, 1.0), out=E)
        perm = rng.permutation(n)
        for start in range(0, n, cfg.batch_size):
            idx = perm[start: start + cfg.batch_size]
            bh, bt, br = h[idx], t[idx], r[idx]
            if cfg.loss != "margin":
                _logistic_batch(E, R, bh, bt, br, rng,
                                n_entities, len(R), cfg, touched=touched,
                                scratch=scratch)
                continue
            corrupt_head = rng.random(len(idx)) < 0.5
            neg_e = rng.integers(0, n_entities, size=len(idx))
            nh = np.where(corrupt_head, neg_e, bh)
            nt = np.where(corrupt_head, bt, neg_e)
            d_pos = E[bh] + R[br] - E[bt]
            d_neg = E[nh] + R[br] - E[nt]
            pos_n = np.linalg.norm(d_pos, axis=1)
            neg_n = np.linalg.norm(d_neg, axis=1)
            viol = cfg.margin + pos_n - neg_n > 0
            if not viol.any():
                continue
            gp = d_pos[viol] / np.maximum(pos_n[viol, None], 1e-12)
            gn = d_neg[viol] / np.maximum(neg_n[viol, None], 1e-12)
            lr = cfg.lr
            np.add.at(E, bh[viol], -lr * gp)
            np.add.at(E, bt[viol], lr * gp)
            np.add.at(R, br[viol], -lr * gp)
            np.add.at(E, nh[viol], lr * gn)
            np.add.at(E, nt[viol], -lr * gn)
            np.add.at(R, br[viol], lr * gn)
            touched[nh[viol]] = True
            touched[nt[viol]] = True
    # return only the touched rows (idx, rows) — the full-matrix return was
    # the transfer bound of the averaging rounds at high worker counts
    idx = np.nonzero(touched)[0]
    return idx, E[idx], R


def _as_partial(x):
    """Leaf worker output (idx, rows, R) → mergeable partial
    (idx, acc, cnt, R_sum, n_workers)."""
    if len(x) == 5:
        return x
    idx, rows, R = x
    return idx, rows, np.ones(len(idx), dtype=np.int32), R, 1


def _combine_partials(a, b):
    """Pairwise merge for the tree-reduce of masked averages."""
    ia, aa, ca, Ra, wa = _as_partial(a)
    ib, ab, cb, Rb, wb = _as_partial(b)
    idx = np.union1d(ia, ib)
    acc = np.zeros((len(idx), aa.shape[1]), dtype=np.float32)
    cnt = np.zeros(len(idx), dtype=np.int32)
    pa_ = np.searchsorted(idx, ia)
    acc[pa_] += aa
    cnt[pa_] += ca
    pb = np.searchsorted(idx, ib)
    acc[pb] += ab
    cnt[pb] += cb
    return idx, acc, cnt, Ra + Rb, wa + wb


def _make_shards(triples: np.ndarray, workers: int, rng_state: dict):
    """Remote shard maker (streaming mode): draws the SAME permutation the
    driver path draws (the bit-generator state is captured right after the
    E/R init consumed the seed stream) and stores each shard separately —
    the full triple array never lands on the driver heap."""
    rng = np.random.default_rng()
    rng.bit_generator.state = rng_state
    shard_ids = rng.permutation(len(triples))
    shards = [np.ascontiguousarray(triples[shard_ids[w::workers]])
              for w in range(workers)]
    # num_returns=1 stores the return value as-is — hand back the bare
    # array so the single-worker shard ref holds an ndarray, not a tuple
    return shards[0] if workers == 1 else tuple(shards)


def _dev_loss_remote(E: np.ndarray, R: np.ndarray, dev: np.ndarray) -> float:
    d = E[dev[:, 0]] + R[dev[:, 2]] - E[dev[:, 1]]
    return float(np.linalg.norm(d, axis=1).mean())


def train_transe_distributed(
    triples,
    n_entities: int,
    n_relations: int,
    cfg: TransEConfig = TransEConfig(),
    dev_triples=None,
    workers: int = 8,
    local_epochs: int = 4,
    n_triples: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Data-parallel TransE: per epoch, W Ray tasks each run one SGD epoch
    over a disjoint shard from the current weights; the results are
    parameter-averaged (one-shot averaging per epoch — the standard
    synchronous local-SGD scheme).  Per-batch semantics match
    ``train_transe`` for BOTH loss modes (margin TransE and logistic
    PTransE share the same batch kernels); this is the trainer the
    multi-node target uses, and it is what lets the KGE stage scale with
    the cluster instead of serializing on the driver (SURVEY.md §7.5
    item 4).  Deterministic for a fixed ``workers`` count (seeded per
    (seed, round, epoch, worker), shards drawn from the config seed).

    Streaming mode: ``triples`` / ``dev_triples`` may be ``ObjectRef``s
    to the (n,3) arrays (pass ``n_triples``) — sharding then happens in a
    remote task continuing the driver's exact rng stream, and the dev
    loss is computed remotely per round, so the triple payloads never
    land on the driver heap.  Bit-identical to the array path.
    """
    import ray

    triples_is_ref = isinstance(triples, ray.ObjectRef)
    dev_is_ref = isinstance(dev_triples, ray.ObjectRef)
    has_dev = dev_triples is not None

    rng = np.random.default_rng(cfg.seed)
    bound = 6.0 / np.sqrt(cfg.dim)
    # float32: halves the per-round weight broadcast + return traffic and
    # speeds the scatter updates; KGE quality is insensitive to f32
    E = rng.uniform(-bound, bound, size=(n_entities, cfg.dim)).astype(np.float32)
    R = rng.uniform(-bound, bound, size=(n_relations, cfg.dim)).astype(np.float32)
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12).astype(np.float32)

    worker = ray.remote(_epoch_worker)
    n = int(n_triples) if triples_is_ref else len(triples)
    workers = max(1, min(workers, n // max(1, cfg.batch_size)))
    local_epochs = max(1, min(local_epochs, cfg.epochs))
    cfg_dict = {f: getattr(cfg, f) for f in cfg.__dataclass_fields__}
    if triples_is_ref:
        out = ray.remote(_make_shards).options(num_returns=workers).remote(
            triples, workers, rng.bit_generator.state)
        shards = [out] if workers == 1 else list(out)
    else:
        shard_ids = rng.permutation(n)
        shards = [
            ray.put(np.ascontiguousarray(triples[shard_ids[w::workers]]))
            for w in range(workers)
        ]
    dev_task = ray.remote(_dev_loss_remote) if dev_is_ref else None

    combine = ray.remote(_combine_partials)
    best = (np.inf, E, R)
    rounds = max(1, cfg.epochs // local_epochs)
    for round_no in range(rounds):
        e_ref, r_ref = ray.put(E), ray.put(R)
        futs = [
            worker.remote(e_ref, r_ref, shards[w], cfg_dict, round_no, w,
                          n_entities, local_epochs)
            for w in range(workers)
        ]
        # masked averaging: E[e] = mean over workers whose shard TOUCHED e
        # (plain mean over all workers divides each sparse update by W —
        # measured to stall training entirely at 300k entities / 16 workers).
        # Workers return touched rows only.  Combining is ADAPTIVE: a
        # pairwise TREE of Ray tasks when the weight payload × workers is
        # big (O(log W) critical path, no W-wide driver gather), a plain
        # driver merge when it is small (remote-task latency would
        # dominate the tiny merges).
        payload = n_entities * cfg.dim * 4 * workers
        if workers > 4 and payload > 64 * 1024 * 1024:
            level = futs
            while len(level) > 1:
                nxt = [combine.remote(level[i], level[i + 1])
                       for i in range(0, len(level) - 1, 2)]
                if len(level) % 2:
                    nxt.append(level[-1])
                level = nxt
            partial = ray.get(level[0])
        else:
            results = ray.get(futs)
            partial = results[0]
            for nxt_leaf in results[1:]:
                partial = _combine_partials(partial, nxt_leaf)
        idx, acc, cnt, r_sum, n_w = _as_partial(partial)
        E = E.copy()
        E[idx] = acc / cnt[:, None]
        R = (r_sum / n_w).astype(np.float32)
        if dev_is_ref:
            dl = ray.get(dev_task.remote(E, R, dev_triples))
            if dl < best[0]:
                best = (dl, E.copy(), R.copy())
        elif has_dev and len(dev_triples):
            d = E[dev_triples[:, 0]] + R[dev_triples[:, 2]] - E[dev_triples[:, 1]]
            dl = float(np.linalg.norm(d, axis=1).mean())
            if dl < best[0]:
                best = (dl, E.copy(), R.copy())
    if has_dev and best[0] < np.inf:
        return best[1], best[2]
    return E, R


# ---------------------------------------------------------------------------
# Energy + confidence features (M5/M6) — vectorized map_batches
# ---------------------------------------------------------------------------

def transe_energy(E: np.ndarray, R: np.ndarray, h, t, r) -> np.ndarray:
    """transV = ‖E[h] + R[r] − E[t]‖₂ — the (h, t, r) column-order energy
    of `TransConfidence.py:37-38` (tri[0]=h, tri[1]=t, tri[2]=r)."""
    d = E[np.asarray(h)] + R[np.asarray(r)] - E[np.asarray(t)]
    return np.linalg.norm(d, axis=1)


class TransEFeature:
    """map_batches stage: + transV and conf_transe = θ_r − transV (M6).

    The sigmoid on `TransConfidence.py:80` is dead code (overwritten on
    line 81); the live feature is the raw margin.  Missing relation → θ=0
    (`TransConfidence.py:73-76`).
    """

    def __init__(self, emb_bc: Broadcast, thresholds: dict[int, float] | None = None):
        E, R = emb_bc.get()
        self.E, self.R = E, R
        self.thr = thresholds or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy()
        t = batch.column("t").to_numpy()
        r = batch.column("r").to_numpy()
        v = transe_energy(self.E, self.R, h, t, r)
        theta = np.fromiter(
            (self.thr.get(int(x), 0.0) for x in r), dtype=np.float64, count=len(r)
        )
        out = batch.append_column("transV", pa.array(v))
        return out.append_column("conf_transe", pa.array(theta - v))


# ---------------------------------------------------------------------------
# Threshold sweeps (A3 asc / A4 desc)
# ---------------------------------------------------------------------------

def threshold_sweep(values: np.ndarray, flags: np.ndarray,
                    *, descending: bool = False) -> float:
    """The reference's optimal-split sweep (`TransConfidence.py:8-26` asc,
    `ResourceRankConfidence.py:61-79` desc).

    Sort by value (asc or desc); θ starts at v[0]∓0.01; scanning i=1..n-1
    with running score += (flag[i-1]==1 ? +1 : -1); strictly-greater score
    moves θ to the midpoint (v[i]+v[i-1])/2.

    Tie order: ties are broken by (value, flag) — deterministic, unlike the
    reference's input-order-stable sort (SURVEY.md §5 acceptance is
    estimator-level, ties in float features are measure-zero).
    """
    order = np.lexsort((flags, values))
    if descending:
        order = np.lexsort((flags, -values))
    v = values[order]
    f = flags[order]
    thr = v[0] - 0.01 if not descending else v[0] + 0.01
    best, cur = 0, 0
    for i in range(1, len(v)):
        cur += 1 if f[i - 1] == 1 else -1
        if cur > best:
            thr = (v[i] + v[i - 1]) / 2.0
            best = cur
    return float(thr)


def thresholds_by_key(df: pd.DataFrame, *, key: str, value: str,
                      descending: bool = False) -> dict[int, float]:
    """Vectorized all-keys-at-once threshold sweep on a driver-side frame.

    Identical semantics to ``threshold_sweep`` per key, computed with
    grouped prefix sums instead of a per-key loop (the labeled dev table
    has one row per example — small — but tens of thousands of DISTINCT
    keys, which made a per-group pass the bottleneck).
    """
    v = df[value].to_numpy(dtype=np.float64)
    order = np.lexsort((df["flag"].to_numpy(), -v if descending else v,
                        df[key].to_numpy()))
    k = df[key].to_numpy()[order]
    vv = v[order]
    ff = df["flag"].to_numpy()[order]

    new_key = np.ones(len(k), dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    seg = np.cumsum(new_key) - 1              # segment id per row
    # cur_i = sum of flags of rows strictly before i within the segment
    cs = np.cumsum(ff)
    first = new_key
    base = (cs - ff)[first]                   # cumsum before each segment
    cur = cs - ff - base[seg]                 # 0 for first row of segment
    cand = ~first                             # sweep positions i ≥ 1
    # per-segment max of cur over candidate positions (strict-first pick)
    out: dict[int, float] = {}
    n_seg = int(seg[-1]) + 1 if len(k) else 0
    seg_max = np.full(n_seg, 0, dtype=np.int64)
    np.maximum.at(seg_max, seg[cand], cur[cand])
    # default threshold: first value ∓ 0.01
    firsts = np.nonzero(first)[0]
    for si, fi in enumerate(firsts):
        out[int(k[fi])] = float(vv[fi] + (0.01 if descending else -0.01))
    hit = cand & (cur == seg_max[seg]) & (seg_max[seg] > 0)
    # first hit per segment: scan hits grouped by seg, take min index
    hit_idx = np.nonzero(hit)[0]
    if len(hit_idx):
        hseg = seg[hit_idx]
        first_hit = np.ones(len(hit_idx), dtype=bool)
        first_hit[1:] = hseg[1:] != hseg[:-1]
        for i in hit_idx[first_hit]:
            out[int(k[i])] = float((vv[i] + vv[i - 1]) / 2.0)
    return out


def per_key_thresholds(ds, *, key: str, value: str,
                       descending: bool = False) -> dict[int, float]:
    """Dataset variant of the sweep (A3/A4): collect the (small) labeled
    table and run the vectorized all-keys sweep driver-side."""
    return thresholds_by_key(ds.to_pandas(), key=key, value=value,
                             descending=descending)


def tc_accuracy(values: np.ndarray, flags: np.ndarray,
                thetas: np.ndarray, *, below_is_positive: bool = True) -> float:
    """Triple-classification accuracy (`TransConfidence.py:86-94`)."""
    if below_is_positive:
        pred_pos = values <= thetas
    else:
        pred_pos = values >= thetas
    right = (pred_pos & (flags == 1)) | (~pred_pos & (flags == -1))
    return float(right.mean())
