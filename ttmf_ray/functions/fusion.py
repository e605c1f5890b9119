"""Fusion estimator: combine TransE margin + ResourceRank features +
reachable-path evidence into one trustworthiness confidence per triple
(SURVEY.md T6/T8; reference `Model1.py:23-160` builds a Keras net with
three path branches + an RRank branch + the TransE scalar).

Keras/TensorFlow is not available in this environment, so the estimator
is a from-scratch numpy network with Adam + binary cross-entropy, seeded
and deterministic, with the same topology role:

- three PATH BRANCHES, one per top-ranked reachable path
  (`Model1.py:23-160`, max_p=3 at `:995`): each consumes the path's
  padded edge-id sequences (`PrecessData.py:159-197` — src/dst/rel id
  lists padded with 0 to length 3), embeds every step with the frozen
  PTransE matrices.  Two branch cells (``branch_mode``):
  "pool" (default) masked-mean-pools the per-step concat over the real
  steps then Dense(tanh) → Dense(1, sigmoid); "rnn" runs the
  reference's actual SimpleRNN cell over the 6-part per-step concat
  (triple-embedding RepeatVector ++ path step, `Model1.py:78-110`)
  with Keras mask_zero carry semantics; ``branch_reg=True`` adds the
  reference's full per-branch regularizer stack (Dropout(0.5) on the
  per-step concat → SimpleRNN → BatchNormalization → Dropout(0.5),
  Model1.py:86-99) with trainable BN affine + momentum running
  stats.  Measured at bench scale (sf0.1, 200k pages, one process):
  rnn acc 0.8610 / maxF1 0.8452 (fusion_train 5.4 s), rnn+reg
  0.8595 / 0.8433 (11.5 s), pool 0.8593 / 0.8432 (1.9 s) — all beat
  the reference's ≈0.8; pool stays the default for speed, the
  regularizers are a fidelity knob (their Keras role is to fight
  overfit the small numpy net doesn't exhibit here);
- the TransE margin scalar, the RRank sigmoid + 6-feature tail, and the
  top-3 path scores as scalar features;
- concat [branch₁..₃, scalars] → Dense(tanh) → Dense(1, sigmoid)
  (the reference's concat → Dense(50) → Dense(2, softmax) head).

Training runs driver-side on the (small) labeled feature table;
inference is an actor-pool ``map_batches`` stage with the trained
weights + frozen embeddings broadcast once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast

FEATURES = [
    "conf_transe",          # θ_r − transV (M6)
    "rr_f",                 # per-head sigmoid of PR (M7)
    "in_c", "out_c", "in_n", "out_n", "depth",  # RR 6-feature tail (M8)
    "p0", "p1", "p2",       # top-3 reachable-path scores (J4/M9)
    "p0_has", "p1_has", "p2_has",
]

MAX_P = 3   # steps per path sequence (Model1.py:995)
N_BRANCH = 3  # top-k paths fed as branches

# Driver/actor scoring kernels work in fixed row chunks on REUSED
# thread-local scratch (fresh 100 MB+ temps page-fault every page —
# CLAUDE.md rule 9 — and were 5 s of a 6 s scoring wall).  Chunk size is
# a constant so results never depend on table or cluster size.
_SCORE_CHUNK = 32768


def _tls_buf(name: str, shape: tuple, dtype) -> np.ndarray:
    """Per-thread reusable scratch buffer (grown-once, keyed by name)."""
    import threading

    tls = _tls_buf._tls
    key = (name, shape, np.dtype(dtype))
    buf = getattr(tls, "bufs", None)
    if buf is None:
        buf = tls.bufs = {}
    arr = buf.get(key)
    if arr is None:
        arr = buf[key] = np.empty(shape, dtype)
    return arr


_tls_buf._tls = __import__("threading").local()


def _chunk_map(work, n: int, *, threads: int = 8) -> None:
    """Run ``work(start_row)`` over fixed _SCORE_CHUNK strides, fanned
    across a small thread pool (numpy kernels release the GIL).  Chunk
    boundaries are size-independent, so outputs are bit-stable."""
    starts = range(0, n, _SCORE_CHUNK)
    if n <= _SCORE_CHUNK or threads <= 1:
        for s in starts:
            work(s)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(work, starts))


def seq_columns(k: int) -> list[str]:
    """Wide-table columns of branch k's padded edge-id sequences."""
    return ([f"p{k}_s{i}" for i in range(MAX_P)]
            + [f"p{k}_d{i}" for i in range(MAX_P)]
            + [f"p{k}_r{i}" for i in range(MAX_P)]
            + [f"p{k}_len"])


ALL_SEQ_COLUMNS = [c for k in range(N_BRANCH) for c in seq_columns(k)]


def _extract_seqs(df: pd.DataFrame):
    """df → list per branch of (src (B,3), dst (B,3), rel (B,3), len (B,))."""
    out = []
    for k in range(N_BRANCH):
        s = df[[f"p{k}_s{i}" for i in range(MAX_P)]].to_numpy(dtype=np.int64)
        d = df[[f"p{k}_d{i}" for i in range(MAX_P)]].to_numpy(dtype=np.int64)
        r = df[[f"p{k}_r{i}" for i in range(MAX_P)]].to_numpy(dtype=np.int64)
        ln = df[f"p{k}_len"].to_numpy(dtype=np.int64)
        out.append((s, d, r, ln))
    return out


def _extract_seqs_table(batch: pa.Table):
    """Arrow variant of :func:`_extract_seqs` — per-column ``to_numpy``
    instead of a whole-table pandas round trip (scorer hot path)."""
    def col(name):
        return batch.column(name).to_numpy().astype(np.int64)

    out = []
    for k in range(N_BRANCH):
        s = np.column_stack([col(f"p{k}_s{i}") for i in range(MAX_P)])
        d = np.column_stack([col(f"p{k}_d{i}") for i in range(MAX_P)])
        r = np.column_stack([col(f"p{k}_r{i}") for i in range(MAX_P)])
        out.append((s, d, r, col(f"p{k}_len")))
    return out


def _stack_pooled(per_branch: list) -> np.ndarray:
    """list of N_BRANCH (B, 3·dim) pooled matrices → (B, N_BRANCH, 3·dim)."""
    return np.stack(per_branch, axis=1)


def _pool_into_rows(emb: tuple, seq, out: np.ndarray,
                    gather: np.ndarray | None) -> None:
    """Write one branch's pooled vectors into ``out`` (a (B, 3·dim)
    float32 view) reusing a (B, MAX_P, dim) ``gather`` scratch.

    Fresh ≥1 MB allocations per call page-fault on first touch and
    serialize parallel workers on the kernel (CLAUDE.md rule 9) —
    measured 13 s of a 25 s fusion-train wall in the allocate-and-
    stack variant; einsum(out=) + np.take(out=) removes all of it.

    Module-level (not a method) so the SAME kernel runs on driver
    threads (pool_stacked) and in Ray tasks (pool_stacked_remote) —
    the masked mean is per-row with a fixed 3-term step sum, so the
    result is bitwise independent of chunking and process boundary."""
    Ep, Rp = emb
    s, d, r, ln = seq
    ke, kr = Ep.shape[1], Rp.shape[1]
    mask = (np.arange(MAX_P)[None, :] < ln[:, None]).astype(np.float32)
    denom = np.maximum(ln, 1)[:, None].astype(np.float32)
    if gather is None:
        gather = np.empty((len(ln), MAX_P, ke), dtype=Ep.dtype)
    for ids, e, sl in ((s, Ep, np.s_[:, :ke]),
                       (d, Ep, np.s_[:, ke:2 * ke]),
                       (r, Rp, np.s_[:, 2 * ke:2 * ke + kr])):
        if e.shape[1] == gather.shape[2]:
            g = gather                      # reused scratch (contiguous)
        else:
            g = np.empty((len(ln), MAX_P, e.shape[1]), e.dtype)
        np.take(e, ids, axis=0, out=g)
        np.einsum("bsd,bs->bd", g, mask, out=out[sl], optimize=True)
        out[sl] /= denom


def _slice_seqs(seqs: list, a: int, b: int) -> list:
    """Row-slice every branch's (s, d, r, len) arrays to [a, b)."""
    return [(s[a:b], d[a:b], r[a:b], ln[a:b]) for (s, d, r, ln) in seqs]


def _pool_chunk_task(emb: tuple, seqs_chunk: list) -> np.ndarray:
    """Ray-task kernel of :func:`pool_stacked_remote`: pool every branch
    of one contiguous row chunk into a fresh (m, K, 3·dim) float32 slab
    (same _SCORE_CHUNK stride + kernels as the driver-thread path)."""
    Ep, Rp = emb
    B = len(seqs_chunk[0][3])
    d_step = 2 * Ep.shape[1] + Rp.shape[1]
    slab = np.empty((B, len(seqs_chunk), d_step), dtype=np.float32)
    ke = max(Ep.shape[1], Rp.shape[1])
    gather = np.empty((min(B, _SCORE_CHUNK), MAX_P, ke), dtype=Ep.dtype)
    for s0 in range(0, B, _SCORE_CHUNK):
        s1 = min(s0 + _SCORE_CHUNK, B)
        for k, seq in enumerate(_slice_seqs(seqs_chunk, s0, s1)):
            _pool_into_rows(emb, seq, slab[s0:s1, k, :],
                            gather[:s1 - s0])
    return slab


def pool_stacked_remote(emb: tuple, seqs: list, *, n_tasks: int) -> np.ndarray:
    """Distributed twin of ``FusionModel.pool_stacked``: the frozen
    (Ep, Rp) matrices ship ONCE via ``ray.put``; contiguous row chunks
    pool in parallel Ray tasks; the driver concatenates the returned
    float32 slabs.  Bitwise identical to the driver-thread path — the
    pooling is per-row (fixed 3-term mask sum, per-row divide), so
    neither chunk boundaries nor the process hop change any bit
    (verified by the pinned trust fixture)."""
    import ray as _ray

    B = len(seqs[0][3])
    n_chunks = max(1, min(n_tasks, (B + _SCORE_CHUNK - 1) // _SCORE_CHUNK))
    if n_chunks == 1:
        return _pool_chunk_task(emb, seqs)
    emb_ref = _ray.put(emb)
    task = _ray.remote(num_returns=1)(_pool_chunk_task)
    bounds = np.linspace(0, B, n_chunks + 1).astype(np.int64)
    futs = [task.remote(emb_ref, _slice_seqs(seqs, int(a), int(b)))
            for a, b in zip(bounds[:-1], bounds[1:])]
    return np.concatenate(_ray.get(futs), axis=0)


# ---------------------------------------------------------------------------
# SimpleRNN branch kernels (branch_mode="rnn" — reference Model1.py:88)
# ---------------------------------------------------------------------------

def _trip_concat_rows(emb: tuple, h, r, t, out: np.ndarray) -> None:
    """[Ep[h], Rp[r], Ep[t]] → ``out`` (m, 2·ke+kr) float32 — the
    triple's own embedding concat (`RepeatVector`ed per step in the
    reference; here projected once, reused at every step)."""
    Ep, Rp = emb
    ke, kr = Ep.shape[1], Rp.shape[1]
    out[:, :ke] = Ep[h]
    out[:, ke:ke + kr] = Rp[r]
    out[:, ke + kr:] = Ep[t]


def _steps_into_rows(emb: tuple, seq, out: np.ndarray) -> None:
    """Path-step concat [Ep[s_t], Rp[r_t], Ep[d_t]] per step →
    ``out`` (m, MAX_P, 2·ke+kr) float32 (reference concat order
    path_h, path_r, path_t — Model1.py:83-85)."""
    Ep, Rp = emb
    s, d, r, _ln = seq
    ke, kr = Ep.shape[1], Rp.shape[1]
    out[:, :, :ke] = Ep[s]
    out[:, :, ke:ke + kr] = Rp[r]
    out[:, :, ke + kr:] = Ep[d]


def _steps_chunk_task(emb: tuple, trip_ids_chunk: tuple,
                      seqs_chunk: list) -> tuple:
    """Remote kernel: gather one contiguous row chunk's RNN inputs →
    (trip (m,d) f32, steps (m,K,MAX_P,d) f32, lens (m,K) i64)."""
    Ep, Rp = emb
    m = len(trip_ids_chunk[0])
    d_step = 2 * Ep.shape[1] + Rp.shape[1]
    K = len(seqs_chunk)
    trip = np.empty((m, d_step), dtype=np.float32)
    _trip_concat_rows(emb, *trip_ids_chunk, trip)
    steps = np.empty((m, K, MAX_P, d_step), dtype=np.float32)
    lens = np.empty((m, K), dtype=np.int64)
    for k, seq in enumerate(seqs_chunk):
        _steps_into_rows(emb, seq, steps[:, k])
        lens[:, k] = seq[3]
    return trip, steps, lens


def steps_stacked(emb: tuple, seqs: list, trip_ids: tuple, *,
                  n_tasks: int | None = None) -> tuple:
    """Gather the frozen RNN input slabs for the whole table —
    (trip, steps, lens).  ``n_tasks`` > 1 fans contiguous row chunks
    over Ray tasks (pure gathers: bitwise chunk-independent)."""
    B = len(trip_ids[0])
    n_chunks = 1 if not n_tasks else max(
        1, min(n_tasks, (B + _SCORE_CHUNK - 1) // _SCORE_CHUNK))
    if n_chunks == 1:
        return _steps_chunk_task(emb, trip_ids, seqs)
    import ray as _ray

    emb_ref = _ray.put(emb)
    task = _ray.remote(_steps_chunk_task)
    bounds = np.linspace(0, B, n_chunks + 1).astype(np.int64)
    futs = [task.remote(
        emb_ref,
        tuple(x[int(a):int(b)] for x in trip_ids),
        _slice_seqs(seqs, int(a), int(b)))
        for a, b in zip(bounds[:-1], bounds[1:])]
    parts = _ray.get(futs)
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


_BN_EPS = 1e-3          # Keras BatchNormalization default epsilon
_BN_MOMENTUM = 0.99     # Keras running-stat momentum
_DROP_RATE = 0.5        # reference Dropout(0.5), Model1.py:86,99


def _rnn_forward(branches: tuple, trip64: np.ndarray, steps: np.ndarray,
                 lens: np.ndarray, *, keep_states: bool = False,
                 bn: tuple | None = None):
    """Masked SimpleRNN forward over MAX_P steps for all K branches →
    (zk (B, K), hs list | None).

    Keras ``mask_zero`` semantics (Model1.py:41-72): the state CARRIES
    through padded steps (h_t = h_{t-1} where t ≥ len); all-pad rows
    end at the zero state.  ``bn`` = (gamma, beta, run_mean, run_var)
    applies the reference's BatchNormalization (Model1.py:89) in
    inference mode (running-stat fold) between the final state and the
    sigmoid head; Dropout is an inference-time identity.  ``bn=None``
    (the default, and every model trained with ``branch_reg=False``)
    is bit-identical to the pre-BN kernel."""
    Wx, Wh, bh, wb, cb = branches
    d = trip64.shape[1]
    B = len(trip64)
    K, _, hh = Wh.shape
    pre_trip = np.matmul(trip64, Wx[:, :d, :])          # (K, B, hh)
    h = np.zeros((B, K, hh))
    hs = [h] if keep_states else None
    for t in range(MAX_P):
        x64 = np.asarray(steps[:, :, t, :], dtype=np.float64)  # (B, K, d)
        pre = np.matmul(x64.transpose(1, 0, 2), Wx[:, d:, :])
        pre += np.matmul(h.transpose(1, 0, 2), Wh)
        pre += pre_trip + bh[:, None, :]
        hn = np.tanh(pre).transpose(1, 0, 2)            # (B, K, hh)
        h = np.where((lens > t)[:, :, None], hn, h)
        if keep_states:
            hs.append(h)
    hout = h
    if bn is not None:
        gamma, beta, rm, rv = bn
        hout = gamma * (h - rm) / np.sqrt(rv + _BN_EPS) + beta
    zk = 1.0 / (1.0 + np.exp(-((hout * wb[None]).sum(axis=2) + cb)))
    return zk, hs


@dataclass
class FusionModel:
    W1: np.ndarray
    b1: np.ndarray
    W2: np.ndarray
    b2: np.ndarray
    mu: np.ndarray
    sd: np.ndarray
    features: list[str] = field(default_factory=lambda: list(FEATURES))
    # path branches (absent → scalar-only model); branch nets are STACKED
    # along a leading branch axis — one einsum per layer for all three
    # branches instead of a Python loop (the per-step call overhead of
    # 3 separate tiny matmul chains dominated training wall)
    emb: tuple | None = None          # frozen (Ep, Rp), PTransE matrices
    branches: tuple | None = None     # (Wb (K,d,h), bb (K,h), wb (K,h), cb (K,))
    # "pool": masked-mean pooling over real steps → Dense(tanh) → σ.
    # "rnn": the reference's SimpleRNN cell (`Model1.py:88`): per step t
    # the input is the 6-part concat [Ep[h], Rp[r], Ep[t]] (the triple's
    # own embeddings, repeated — `RepeatVector`, Model1.py:78-80) ++
    # [Ep[s_t], Rp[r_t], Ep[d_t]] (the path step), recurrence
    # h_t = tanh(x_t·Wx + h_{t-1}·Wh + bh) with the Keras mask_zero
    # carry (state holds through padded steps; all-pad rows stay 0),
    # final state → σ(wb·h + cb).  branches then =
    # (Wx (K, 2·d_step, hh), Wh (K, hh, hh), bh (K, hh), wb, cb).
    branch_mode: str = "pool"
    # branch_reg=True models (reference Model1.py:86-99: Dropout(0.5) on
    # the per-step concat → SimpleRNN → BatchNormalization → Dropout(0.5)
    # → σ head): (gamma, beta, run_mean, run_var), each (K, hh).
    # Inference applies the running-stat BN fold; dropout is identity.
    bn: tuple | None = None

    def pool(self, seq) -> np.ndarray:
        """Masked mean over real steps of the per-step embedding concat.

        The embeddings are FROZEN, so pooled vectors are a pure function
        of the id sequences — callers precompute them once per table and
        train/score against the pooled (B, 3·dim) matrices.
        """
        Ep, Rp = self.emb
        out = np.empty((len(seq[3]), 2 * Ep.shape[1] + Rp.shape[1]),
                       dtype=np.float32)
        self._pool_into(seq, out, None)
        return out

    def _pool_into(self, seq, out: np.ndarray, gather: np.ndarray | None):
        _pool_into_rows(self.emb, seq, out, gather)

    def pool_stacked(self, seqs: list) -> np.ndarray:
        """All branches' pooled vectors as one (B, N_BRANCH, 3·dim) slab —
        allocated ONCE; each branch pools straight into its slice, row
        chunks fanned over a thread pool (numpy releases the GIL in
        take/einsum; per-row masked means are chunk-invariant, so the
        bits match the serial pass exactly)."""
        Ep, Rp = self.emb
        B = len(seqs[0][3])
        d_step = 2 * Ep.shape[1] + Rp.shape[1]
        slab = np.empty((B, len(seqs), d_step), dtype=np.float32)
        ke = max(Ep.shape[1], Rp.shape[1])

        def work(s0: int) -> None:
            s1 = min(s0 + _SCORE_CHUNK, B)
            gather = _tls_buf("pool_gather",
                              (_SCORE_CHUNK, MAX_P, ke), Ep.dtype)
            for k, (s, d, r, ln) in enumerate(seqs):
                self._pool_into((s[s0:s1], d[s0:s1], r[s0:s1], ln[s0:s1]),
                                slab[s0:s1, k, :], gather[:s1 - s0])

        _chunk_map(work, B)
        return slab

    def branch_outputs(self, pooled: np.ndarray) -> np.ndarray:
        """pooled (B, K, d) → (B, K) sigmoid outputs.

        Chunked per-k GEMM on a reused float64 scratch: the old
        whole-slab ``np.matmul(pooled.transpose(1,0,2), Wb)`` promoted
        the float32 slab to a fresh float64 temp (hundreds of MB) every
        call — the page faults on that alloc, not the FLOPs, measured
        5 s of a 6 s scoring wall (CLAUDE.md rule 9).  Bitwise identical
        to the promoted matmul (elementwise cast + same (m,d)@(d,h)
        GEMM k-order, verified on the captured 137k-row slab)."""
        B = pooled.shape[0]
        zk = np.empty((B, len(self.branches[0])), np.float64)
        for s0 in range(0, B, _SCORE_CHUNK):
            s1 = min(s0 + _SCORE_CHUNK, B)
            self._branch_zk_chunk(pooled[s0:s1], zk[s0:s1])
        return zk

    def _branch_zk_chunk(self, pooled_c: np.ndarray,
                         zk_out: np.ndarray) -> None:
        """One row chunk of branch_outputs into ``zk_out`` (thread-local
        scratch; safe under a thread pool)."""
        Wb, bb, wb, cb = self.branches
        m = len(pooled_c)
        K, dd, h = Wb.shape
        c64 = _tls_buf("branch_c64", (_SCORE_CHUNK, K, dd), np.float64)
        Hk = _tls_buf("branch_hk", (_SCORE_CHUNK, K, h), np.float64)
        np.copyto(c64[:m], pooled_c)        # == matmul's f64 promotion
        for k in range(K):
            np.matmul(c64[:m, k, :], Wb[k], out=Hk[:m, k, :])
        np.add(Hk[:m], bb, out=Hk[:m])
        np.tanh(Hk[:m], out=Hk[:m])
        zk_out[:] = 1.0 / (1.0 + np.exp(-((Hk[:m] * wb[None]).sum(axis=2)
                                          + cb)))

    def _zk_from_seqs(self, seqs: list) -> np.ndarray:
        """seqs → (B, K) branch outputs WITHOUT materializing the full
        pooled slab: each thread pools one row chunk into its own
        (chunk, K, d) scratch and immediately reduces it to zk.  The
        scoring path for big tables — peak extra memory is
        threads × chunk × K × d instead of B × K × d."""
        Ep, Rp = self.emb
        B = len(seqs[0][3])
        K = len(seqs)
        d_step = 2 * Ep.shape[1] + Rp.shape[1]
        ke = max(Ep.shape[1], Rp.shape[1])
        zk = np.empty((B, K), np.float64)

        def work(s0: int) -> None:
            s1 = min(s0 + _SCORE_CHUNK, B)
            m = s1 - s0
            slab = _tls_buf("score_slab", (_SCORE_CHUNK, K, d_step),
                            np.float32)
            gather = _tls_buf("pool_gather",
                              (_SCORE_CHUNK, MAX_P, ke), Ep.dtype)
            for k, (s, d, r, ln) in enumerate(seqs):
                self._pool_into((s[s0:s1], d[s0:s1], r[s0:s1], ln[s0:s1]),
                                slab[:m, k, :], gather[:m])
            self._branch_zk_chunk(slab[:m], zk[s0:s1])

        _chunk_map(work, B)
        return zk

    def _zk_rnn(self, trip: np.ndarray, steps: np.ndarray,
                lens: np.ndarray) -> np.ndarray:
        """Precomputed RNN input slabs → (B, K) branch outputs, in
        fixed _SCORE_CHUNK strides (the recurrence is per-row, so
        chunking never changes a bit)."""
        B = len(trip)
        zk = np.empty((B, len(self.branches[0])), np.float64)
        for s0 in range(0, B, _SCORE_CHUNK):
            s1 = min(s0 + _SCORE_CHUNK, B)
            zk[s0:s1], _ = _rnn_forward(
                self.branches, trip[s0:s1].astype(np.float64),
                steps[s0:s1], lens[s0:s1], bn=self.bn)
        return zk

    def _zk_rnn_from_seqs(self, seqs: list, trip_ids: tuple) -> np.ndarray:
        """Scoring path: gather each chunk's RNN inputs on the fly —
        never materializes the full (B, K, MAX_P, d) slab."""
        B = len(trip_ids[0])
        zk = np.empty((B, len(self.branches[0])), np.float64)

        def work(s0: int) -> None:
            s1 = min(s0 + _SCORE_CHUNK, B)
            trip, steps, lens = _steps_chunk_task(
                self.emb, tuple(x[s0:s1] for x in trip_ids),
                _slice_seqs(seqs, s0, s1))
            zk[s0:s1], _ = _rnn_forward(
                self.branches, trip.astype(np.float64), steps, lens,
                bn=self.bn)

        _chunk_map(work, B)
        return zk

    def forward(self, X: np.ndarray, seqs=None, pooled=None) -> np.ndarray:
        Z = (X - self.mu) / self.sd
        if self.branches is not None:
            zb = None
            if self.branch_mode == "rnn":
                if pooled is not None:
                    zb = self._zk_rnn(*pooled)
                elif seqs is not None:
                    zb = self._zk_rnn_from_seqs(*seqs)
            elif pooled is not None:
                zb = self.branch_outputs(pooled)
            elif seqs is not None:
                zb = self._zk_from_seqs(seqs)
            if zb is not None:
                Z = np.concatenate([zb, Z], axis=1)
        H = np.tanh(Z @ self.W1 + self.b1)
        return 1.0 / (1.0 + np.exp(-(H @ self.W2 + self.b2)))


def train_fusion(
    df: pd.DataFrame,
    *,
    hidden: int = 16,
    branch_hidden: int = 16,
    epochs: int = 200,
    batch_size: int = 64,
    lr: float = 0.01,
    patience: int = 20,
    seed: int = 23,
    val_frac: float = 0.2,
    path_emb: tuple | None = None,
    workers: int | None = None,
    local_epochs: int = 5,
    branch_mode: str = "pool",
    branch_reg: bool = False,
) -> FusionModel:
    """BCE + Adam on (FEATURES [+ path branches] → flag==1), early stop on
    val accuracy (reference: batch 64, ≤200 epochs, patience 20 —
    `Model1.py:982,1003,446-447`; validation_split 0.2).

    ``path_emb``: frozen (Ep, Rp) PTransE matrices — enables the per-path
    sequence branches when the ``p{k}_*`` columns are present.
    ``workers`` > 1 switches to synchronous local-SGD over Ray tasks
    (``local_epochs`` per averaging round) — deterministic for a fixed
    worker count; falls back to serial when the train split is small.

    ``branch_reg=True`` (rnn mode only) adds the reference's per-branch
    regularizer stack (Model1.py:86-99): Dropout(0.5) on the 6-part
    per-step concat entering the SimpleRNN, BatchNormalization on the
    final state, Dropout(0.5) after it.  Training uses batch statistics
    + seeded inverted-dropout masks (deterministic); inference folds the
    momentum-0.99 running stats and drops the masks.  gamma/beta train
    under the same Adam loop; the running stats ride the parameter list
    untouched by Adam (the grads list is shorter) and average across
    local-SGD workers like every other parameter.
    """
    rng = np.random.default_rng(seed)
    # feature hygiene: a NaN/inf leaking from any upstream stage would
    # silently poison every weight — zero it and keep the run observable
    X = np.nan_to_num(df[FEATURES].to_numpy(dtype=np.float64),
                      nan=0.0, posinf=0.0, neginf=0.0)
    y = (df["flag"].to_numpy() == 1).astype(np.float64)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Xz = (X - mu) / sd

    use_paths = (path_emb is not None
                 and all(c in df.columns for c in ALL_SEQ_COLUMNS))
    seqs = _extract_seqs(df) if use_paths else None
    n = len(Xz)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    vi, ti = perm[:n_val], perm[n_val:]

    d_scalar = Xz.shape[1]
    d_in = d_scalar + (N_BRANCH if use_paths else 0)
    W1 = rng.standard_normal((d_in, hidden)) * 0.3
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, 1)) * 0.3
    b2 = np.zeros(1)
    params = [W1, b1, W2, b2]
    branches = None
    if use_paths:
        Ep, Rp = path_emb
        Ep = np.asarray(Ep, dtype=np.float32)
        Rp = np.asarray(Rp, dtype=np.float32)
        path_emb = (Ep, Rp)
        d_step = Ep.shape[1] * 2 + Rp.shape[1]
        if branch_mode == "rnn":
            # SimpleRNN cell (reference Model1.py:88): input = the
            # 6-part concat (triple repeat + path step) per step
            draws = [(rng.standard_normal((2 * d_step,
                                           branch_hidden)) * 0.2,
                      rng.standard_normal((branch_hidden,
                                           branch_hidden)) * 0.2,
                      rng.standard_normal((branch_hidden, 1)) * 0.2)
                     for _ in range(N_BRANCH)]
            branches = (np.stack([d[0] for d in draws]),        # Wx
                        np.stack([d[1] for d in draws]),        # Wh
                        np.zeros((N_BRANCH, branch_hidden)),    # bh
                        np.stack([d[2][:, 0] for d in draws]),  # wb
                        np.zeros(N_BRANCH))                     # cb
        else:
            # per-branch draws in a fixed order (seed-stable), stacked
            draws = [(rng.standard_normal((d_step, branch_hidden)) * 0.2,
                      rng.standard_normal((branch_hidden, 1)) * 0.2)
                     for _ in range(N_BRANCH)]
            branches = (np.stack([d[0] for d in draws]),        # Wb (K,d,h)
                        np.zeros((N_BRANCH, branch_hidden)),    # bb
                        np.stack([d[1][:, 0] for d in draws]),  # wb (K,h)
                        np.zeros(N_BRANCH))                     # cb
        params.extend(branches)
    bn = None
    if use_paths and branch_mode == "rnn" and branch_reg:
        # trainable BN affine + momentum running stats (see docstring);
        # ORDER MATTERS: gamma/beta (Adam-trained, grads exist) precede
        # run_mean/run_var (stat-tracked only, past the grads list).
        gamma = np.ones((N_BRANCH, branch_hidden))
        beta = np.zeros((N_BRANCH, branch_hidden))
        run_mean = np.zeros((N_BRANCH, branch_hidden))
        run_var = np.ones((N_BRANCH, branch_hidden))
        params.extend([gamma, beta, run_mean, run_var])
        bn = (gamma, beta, run_mean, run_var)
    model = FusionModel(W1=W1, b1=b1, W2=W2, b2=b2, mu=mu, sd=sd,
                        emb=path_emb if use_paths else None,
                        branches=branches, bn=bn,
                        branch_mode=branch_mode if use_paths else "pool")
    # pooled path vectors are embedding-frozen → precompute ONCE for the
    # whole table (recomputing the gather+concat per batch dominated the
    # training wall ~10x).  With a worker pool requested and a table
    # worth splitting, the pooling itself fans out as Ray tasks (it was
    # the last driver-serial piece of the 16-cpu fusion_train wall);
    # per-row kernels make the remote slab bitwise == the thread path.
    pooled_all = None
    if use_paths:
        remote_n = workers * 2 if (workers and workers > 1
                                   and n > _SCORE_CHUNK) else None
        if branch_mode == "rnn":
            trip_ids = (df["h"].to_numpy(np.int64),
                        df["r"].to_numpy(np.int64),
                        df["t"].to_numpy(np.int64))
            pooled_all = steps_stacked(path_emb, seqs, trip_ids,
                                       n_tasks=remote_n)
        elif remote_n:
            pooled_all = pool_stacked_remote(path_emb, seqs,
                                             n_tasks=remote_n)
        else:
            pooled_all = model.pool_stacked(seqs)

    def sub_pooled(idx):
        if pooled_all is None:
            return None
        if isinstance(pooled_all, tuple):
            return tuple(x[idx] for x in pooled_all)
        return pooled_all[idx]

    # validation slices gathered ONCE — the per-round fancy-index of the
    # (n, K, d) pooled slab was ~1 s/round of fresh-allocation page faults
    X_vi = X[vi]
    y_vi = y[vi]
    pooled_vi = sub_pooled(vi)

    def acc(idx) -> float:
        if idx is vi:
            p = model.forward(X_vi, pooled=pooled_vi)[:, 0]
            return float(((p >= 0.5) == (y_vi == 1)).mean())
        p = model.forward(X[idx], pooled=sub_pooled(idx))[:, 0]
        return float(((p >= 0.5) == (y[idx] == 1)).mean())

    best_acc, best_params, since = -1.0, [p.copy() for p in params], 0
    if workers and workers > 1 and len(ti) >= workers * batch_size:
        # data-parallel local-SGD (the same synchronous parameter-average
        # scheme as train_transe_distributed): each round, W Ray tasks run
        # ``local_epochs`` Adam epochs over disjoint shards of ``ti`` from
        # the current weights; weights average; early stop on val acc.
        # Driver-serial fusion training was the single largest serial
        # stage of phase B at the 16-CPU scaling leg.  Deterministic for
        # a fixed ``workers`` (seeded per (seed, round, wid)).
        import ray as _ray

        shard_perm = rng.permutation(len(ti))
        shards = [np.ascontiguousarray(ti[shard_perm[w::workers]])
                  for w in range(workers)]
        data_ref = _ray.put((Xz, y, pooled_all))
        worker_fn = _ray.remote(_fusion_worker)
        rounds = max(1, epochs // local_epochs)
        patience_r = max(1, patience // local_epochs)
        for round_no in range(rounds):
            futs = [worker_fn.remote(params, data_ref, shards[w],
                                     batch_size, lr, local_epochs,
                                     seed, round_no, w)
                    for w in range(workers)]
            results = _ray.get(futs)
            for k in range(len(params)):
                params[k][...] = (
                    sum(r[k] for r in results) / float(workers))
            a = acc(vi)
            if a > best_acc:
                best_acc, best_params, since = a, [p.copy() for p in params], 0
            else:
                since += 1
                if since >= patience_r:
                    break
    else:
        adam = _AdamState(params)
        for epoch in range(epochs):
            _sgd_epoch(params, adam, Xz, y, pooled_all, ti,
                       batch_size=batch_size, lr=lr, rng=rng)
            a = acc(vi)
            if a > best_acc:
                best_acc, best_params, since = a, [p.copy() for p in params], 0
            else:
                since += 1
                if since >= patience:
                    break

    for pm, best in zip(params, best_params):
        pm[...] = best
    return model


class _AdamState:
    def __init__(self, params):
        self.m = [np.zeros_like(p) for p in params]
        self.v = [np.zeros_like(p) for p in params]
        self.step = 0


def _sgd_epoch(params, adam: _AdamState, Xz, y, pooled_all, ti, *,
               batch_size: int, lr: float, rng) -> None:
    """One Adam/BCE epoch over ``ti`` (in-place on ``params``).

    Module-level so the serial trainer and the Ray local-SGD workers run
    the IDENTICAL per-batch math.
    """
    use_paths = pooled_all is not None
    rnn = isinstance(pooled_all, tuple)      # (trip, steps, lens) slabs
    reg = use_paths and rnn and len(params) > 9   # + [gamma, beta, rm, rv]
    if use_paths and rnn:
        d_step = pooled_all[0].shape[1]
        K_r, hh_r = params[6].shape            # bh (K, hh)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    order = rng.permutation(len(ti))
    for s0 in range(0, len(ti), batch_size):
        idx = ti[order[s0: s0 + batch_size]]
        xb, yb = Xz[idx], y[idx]
        if use_paths and rnn:
            # reused per-thread float64 scratch — a fresh ~30 MB cast
            # per batch page-faults every page (CLAUDE.md rule 9)
            m = len(idx)
            _, K_, P_, d_ = pooled_all[1].shape
            tb = _tls_buf("rnn_tb", (batch_size, d_step),
                          np.float64)[:m]                # (B, d)
            np.copyto(tb, pooled_all[0][idx])
            sb = _tls_buf("rnn_sb", (batch_size, K_, P_, d_),
                          np.float64)[:m]                # (B, K, P, d)
            np.copyto(sb, pooled_all[1][idx])
            lb = pooled_all[2][idx]                      # (B, K)
            branch_batch = (tb, sb, lb)
        elif use_paths:
            branch_batch = pooled_all[idx]
        else:
            branch_batch = None
        reg_masks = None
        if reg:
            # inverted dropout, drawn from the SAME epoch rng stream →
            # deterministic for a fixed (seed, epoch, batch) path
            keep = 1.0 - _DROP_RATE
            m = len(idx)
            m_in = (rng.random((m, K_r, MAX_P, 2 * d_step)) < keep) / keep
            m_out = (rng.random((m, K_r, hh_r)) < keep) / keep
            reg_masks = (m_in, m_out)
        grads = _batch_grads(params, xb, yb, branch_batch, rnn=rnn,
                             reg_masks=reg_masks)
        adam.step += 1
        st = adam.step
        for k, (pm, g) in enumerate(zip(params, grads)):
            adam.m[k] = beta1 * adam.m[k] + (1 - beta1) * g
            adam.v[k] = beta2 * adam.v[k] + (1 - beta2) * g * g
            mh = adam.m[k] / (1 - beta1**st)
            vh = adam.v[k] / (1 - beta2**st)
            pm -= lr * mh / (np.sqrt(vh) + eps)


def _batch_grads(params, xb, yb, branch_batch, *, rnn: bool,
                 reg_masks: tuple | None = None) -> list:
    """BCE gradients of every parameter for one batch — a PURE function
    of (params, batch, masks), shared verbatim by the serial trainer,
    the Ray local-SGD workers and the finite-difference gradient-check
    test (the one side effect: with ``reg_masks`` the BN running stats
    params[11:13] take their momentum update, which never feeds back
    into this batch's loss).

    ``branch_batch``: None (scalar-only model), the batch's pooled slab
    ``Vm`` (branch_mode="pool"), or ``(tb, sb, lb)`` RNN input slices
    (branch_mode="rnn").  ``reg_masks`` = (m_in (B,K,MAX_P,2d),
    m_out (B,K,hh)) scaled inverted-dropout masks enables the
    branch_reg stack (input Dropout → RNN → batch-stat BatchNorm →
    Dropout → σ, reference Model1.py:86-99)."""
    use_paths = branch_batch is not None
    W1, b1, W2, b2 = params[:4]
    if use_paths and rnn and reg_masks is not None:
        Wx, Wh, bh, wb, cb = params[4:9]
        gamma, beta = params[9], params[10]
        tb, sb, lb = branch_batch
        m_in, m_out = reg_masks
        d_step = tb.shape[1]
        B = len(tb)
        K, _, hh = Wh.shape
        # forward with per-step input dropout: x_t = mask ⊙ [trip, step]
        # (the repeated triple concat drops independently per step, as
        # Keras Dropout does on the RepeatVector'ed concat)
        h = np.zeros((B, K, hh))
        hs, xs = [h], []
        for t in range(MAX_P):
            x = np.empty((B, K, 2 * d_step))
            x[:, :, :d_step] = tb[:, None, :] * m_in[:, :, t, :d_step]
            x[:, :, d_step:] = sb[:, :, t, :] * m_in[:, :, t, d_step:]
            pre = np.matmul(x.transpose(1, 0, 2), Wx)
            pre += np.matmul(h.transpose(1, 0, 2), Wh)
            pre += bh[:, None, :]
            hn = np.tanh(pre).transpose(1, 0, 2)
            h = np.where((lb > t)[:, :, None], hn, h)
            xs.append(x)
            hs.append(h)
        hK = hs[-1]
        mean_b = hK.mean(axis=0)               # (K, hh) batch stats
        var_b = hK.var(axis=0)
        inv = 1.0 / np.sqrt(var_b + _BN_EPS)
        hN = (hK - mean_b) * inv
        hD = (gamma * hN + beta) * m_out        # BN affine + out-dropout
        zk = 1.0 / (1.0 + np.exp(-((hD * wb[None]).sum(axis=2) + cb)))
        if len(params) > 12:                    # momentum running stats
            params[11] *= _BN_MOMENTUM
            params[11] += (1 - _BN_MOMENTUM) * mean_b
            params[12] *= _BN_MOMENTUM
            params[12] += (1 - _BN_MOMENTUM) * var_b
        Zin = np.concatenate([zk, xb], axis=1)
    elif use_paths and rnn:
        Wx, Wh, bh, wb, cb = params[4:]
        tb, sb, lb = branch_batch
        d_step = tb.shape[1]
        zk, hs = _rnn_forward((Wx, Wh, bh, wb, cb), tb, sb, lb,
                              keep_states=True)
        Zin = np.concatenate([zk, xb], axis=1)
    elif use_paths:
        Wb, bb, wb, cb = params[4:]
        Vm = branch_batch
        Hk = np.tanh(
            np.matmul(Vm.transpose(1, 0, 2), Wb).transpose(1, 0, 2)
            + bb)
        zk = 1.0 / (1.0 + np.exp(-((Hk * wb[None]).sum(axis=2) + cb)))
        Zin = np.concatenate([zk, xb], axis=1)
    else:
        Zin = xb
    H = np.tanh(Zin @ W1 + b1)
    logits = H @ W2 + b2
    p = 1.0 / (1.0 + np.exp(-logits))
    gl = (p - yb[:, None]) / len(xb)        # dBCE/dlogits
    gW2 = H.T @ gl
    gb2 = gl.sum(axis=0)
    gH = gl @ W2.T
    gZ = gH * (1 - H * H)
    gZin = gZ @ W1.T
    gW1 = Zin.T @ gZ
    gb1 = gZ.sum(axis=0)
    grads = [gW1, gb1, gW2, gb2]
    if use_paths and rnn and reg_masks is not None:
        # head + dropout + batch-stat BN backward, then masked BPTT
        gz = gZin[:, :N_BRANCH] * zk * (1 - zk)    # (B, K)
        gwb = (hD * gz[:, :, None]).sum(axis=0)
        gcb = gz.sum(axis=0)
        ghD = gz[:, :, None] * wb[None, :, :]      # (B, K, hh)
        ghB = ghD * m_out                          # through out-dropout
        ggamma = (ghB * hN).sum(axis=0)
        gbeta = ghB.sum(axis=0)
        ghN = ghB * gamma
        # standard BN backward for biased batch var (np.var default)
        ghK = (inv / B) * (B * ghN - ghN.sum(axis=0)
                           - hN * (ghN * hN).sum(axis=0))
        gh = ghK
        gWx = np.zeros_like(Wx)
        gWh = np.zeros_like(Wh)
        gbh = np.zeros_like(bh)
        for t in reversed(range(MAX_P)):
            mt = (lb > t)[:, :, None]
            gpre = (gh * mt * (1 - hs[t + 1] ** 2)) \
                .transpose(1, 0, 2)                # (K, B, hh)
            gWx += np.matmul(xs[t].transpose(1, 2, 0), gpre)
            gWh += np.matmul(hs[t].transpose(1, 2, 0), gpre)
            gbh += gpre.sum(axis=1)
            gh = (np.matmul(gpre, Wh.transpose(0, 2, 1))
                  .transpose(1, 0, 2)
                  + gh * ~mt)
        grads.extend([gWx, gWh, gbh, gwb, gcb, ggamma, gbeta])
    elif use_paths and rnn:
        # BPTT over the MAX_P masked-carry steps: at step t only rows
        # with len > t flow through the tanh path; the rest carry the
        # state (identity) — gradient mirrors the carry
        gz = gZin[:, :N_BRANCH] * zk * (1 - zk)    # (B, K)
        hK = hs[-1]
        gwb = (hK * gz[:, :, None]).sum(axis=0)
        gcb = gz.sum(axis=0)
        gh = gz[:, :, None] * wb[None, :, :]       # (B, K, hh)
        gWx = np.zeros_like(Wx)
        gWh = np.zeros_like(Wh)
        gbh = np.zeros_like(bh)
        for t in reversed(range(MAX_P)):
            mt = (lb > t)[:, :, None]
            gpre = (gh * mt * (1 - hs[t + 1] ** 2)) \
                .transpose(1, 0, 2)                # (K, B, hh)
            gWx[:, :d_step, :] += np.matmul(tb.T, gpre)
            gWx[:, d_step:, :] += np.matmul(
                sb[:, :, t, :].transpose(1, 2, 0), gpre)
            gWh += np.matmul(hs[t].transpose(1, 2, 0), gpre)
            gbh += gpre.sum(axis=1)
            gh = (np.matmul(gpre, Wh.transpose(0, 2, 1))
                  .transpose(1, 0, 2)
                  + gh * ~mt)
        grads.extend([gWx, gWh, gbh, gwb, gcb])
    elif use_paths:
        gz = gZin[:, :N_BRANCH] * zk * (1 - zk)    # (B, K) sigmoid
        gwb = (Hk * gz[:, :, None]).sum(axis=0)
        gcb = gz.sum(axis=0)
        gHk = gz[:, :, None] * wb[None, :, :]      # (B, K, h)
        gVk = gHk * (1 - Hk * Hk)
        gWb = np.matmul(Vm.transpose(1, 2, 0),     # (K,d,B)@(K,B,h)
                        gVk.transpose(1, 0, 2))
        gbb = gVk.sum(axis=0)
        grads.extend([gWb, gbb, gwb, gcb])
    return grads


def _fusion_worker(params, data, shard, batch_size, lr, local_epochs,
                   seed, round_no, wid):
    """Local-SGD worker: ``local_epochs`` Adam epochs over one shard from
    the given weights; returns the updated parameter list.  Adam moments
    are per-round local state (reset at each averaging round)."""
    params = [np.array(p) for p in params]   # writable local copies
    Xz, y, pooled_all = data
    adam = _AdamState(params)
    rng = np.random.default_rng((seed, 101, round_no, wid))
    for _ in range(local_epochs):
        _sgd_epoch(params, adam, Xz, y, pooled_all, shard,
                   batch_size=batch_size, lr=lr, rng=rng)
    return params


def score_fusion_batch(batch: pa.Table, model: FusionModel) -> pa.Table:
    """One scoring batch: feature columns → + conf (shared by the
    task-based and actor-pool stage variants)."""
    X = np.nan_to_num(
        np.column_stack(
            [batch.column(f).to_numpy().astype(np.float64)
             for f in model.features]
        ),
        nan=0.0, posinf=0.0, neginf=0.0,
    )
    seqs = None
    if (model.branches is not None
            and all(c in batch.column_names for c in ALL_SEQ_COLUMNS)):
        seqs = _extract_seqs_table(batch)
        if model.branch_mode == "rnn":
            seqs = (seqs, tuple(
                batch.column(c).to_numpy().astype(np.int64)
                for c in ("h", "r", "t")))
    conf = model.forward(X, seqs)[:, 0]
    return batch.append_column("conf", pa.array(conf))


def score_fusion_df(df: pd.DataFrame, model: FusionModel) -> pd.DataFrame:
    """Driver-side scoring that never leaves pandas/numpy: identical
    math to :func:`score_fusion_batch` (same column extraction values,
    same forward kernels) without the arrow round-trip that measured
    ~1 s on a 137k×54 conf table."""
    X = np.nan_to_num(df[model.features].to_numpy(dtype=np.float64),
                      nan=0.0, posinf=0.0, neginf=0.0)
    seqs = None
    if (model.branches is not None
            and all(c in df.columns for c in ALL_SEQ_COLUMNS)):
        seqs = _extract_seqs(df)
        if model.branch_mode == "rnn":
            seqs = (seqs, tuple(df[c].to_numpy(np.int64)
                                for c in ("h", "r", "t")))
    conf = model.forward(X, seqs)[:, 0]
    out = df.copy(deep=False)
    out["conf"] = conf
    return out


def score_fusion_task(batch: pa.Table, *, model_bc: Broadcast) -> pa.Table:
    """Task-pool scorer: the model arrives via the broadcast ref (zero-copy
    numpy from the local object store — per-task fetch is cheap, and a
    task pool skips the actor-pool spin-up that dominated the scoring
    wall for small conf tables)."""
    return score_fusion_batch(batch, model_bc.get())


class FusionScorer:
    """Actor map_batches stage: feature columns → + conf (T6 pattern).
    Used when per-actor resources (the ``num_gpus`` knob) are requested;
    the resource-free path scores via :func:`score_fusion_task` tasks."""

    def __init__(self, model_bc: Broadcast):
        self.model: FusionModel = model_bc.get()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_fusion_batch(batch, self.model)


# ---------------------------------------------------------------------------
# Evaluation aggregates (A5 accuracy, A6 P/R sweep)
# ---------------------------------------------------------------------------

def accuracy(conf: np.ndarray, flags: np.ndarray, thr: float = 0.5) -> float:
    pred = conf >= thr
    return float(((pred) & (flags == 1) | (~pred) & (flags != 1)).mean())


def pr_sweep(conf: np.ndarray, flags: np.ndarray) -> pd.DataFrame:
    """P/R/F over thresholds 0.01, 0.03, …, 0.99 (`Model1.py:543-586`)."""
    rows = []
    pos = flags == 1
    for th in np.arange(0.01, 1.0, 0.02):
        pred = conf >= th
        tp = int((pred & pos).sum())
        fp = int((pred & ~pos).sum())
        fn = int((~pred & pos).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        rows.append((round(float(th), 2), p, r, f))
    return pd.DataFrame(rows, columns=["threshold", "precision", "recall", "f1"])
