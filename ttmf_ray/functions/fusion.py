"""Fusion estimator: combine TransE margin + ResourceRank features +
reachable-path scores into one trustworthiness confidence per triple
(SURVEY.md T6/T8; reference `Model1.py:23-160` builds a Keras net with
three path branches + an RRank branch + the TransE scalar).

Keras/TensorFlow is not available in this environment, so the estimator
is a from-scratch numpy MLP with Adam + binary cross-entropy, seeded and
deterministic: the same fusion role (path₁..₃ ⊕ TransE ⊕ RRank → score),
with the path branches' RNN summarized by the ranked path scores
(SURVEY.md §7.5 item 4 documents this deviation; acceptance is the
estimator-level corrupted-triple detection P/R, §5 item 4).

Training runs driver-side on the (small) labeled feature table
(`ds.to_pandas`); inference is an actor-pool ``map_batches`` stage with
the trained weights broadcast once.
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


@dataclass
class FusionModel:
    W1: np.ndarray
    b1: np.ndarray
    W2: np.ndarray
    b2: np.ndarray
    mu: np.ndarray
    sd: np.ndarray
    features: list[str] = field(default_factory=lambda: list(FEATURES))

    def forward(self, X: np.ndarray) -> np.ndarray:
        Z = (X - self.mu) / self.sd
        H = np.tanh(Z @ self.W1 + self.b1)
        return 1.0 / (1.0 + np.exp(-(H @ self.W2 + self.b2)))


def train_fusion(
    df: pd.DataFrame,
    *,
    hidden: int = 16,
    epochs: int = 200,
    batch_size: int = 64,
    lr: float = 0.01,
    patience: int = 20,
    seed: int = 23,
    val_frac: float = 0.2,
) -> FusionModel:
    """BCE + Adam on (FEATURES → flag==1), early stop on val accuracy
    (reference: batch 64, ≤200 epochs, patience 20 — `Model1.py:982,1003,
    446-447`; validation_split 0.2 — `Model1.py:486?` train loop)."""
    rng = np.random.default_rng(seed)
    # feature hygiene: a NaN/inf leaking from any upstream stage would
    # silently poison every weight — zero it and keep the run observable
    X = np.nan_to_num(df[FEATURES].to_numpy(dtype=np.float64),
                      nan=0.0, posinf=0.0, neginf=0.0)
    y = (df["flag"].to_numpy() == 1).astype(np.float64)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Xz = (X - mu) / sd

    n = len(Xz)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    vi, ti = perm[:n_val], perm[n_val:]

    d = Xz.shape[1]
    W1 = rng.standard_normal((d, hidden)) * 0.3
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, 1)) * 0.3
    b2 = np.zeros(1)
    params = [W1, b1, W2, b2]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    step = 0

    best_acc, best_params, since = -1.0, [p.copy() for p in params], 0

    def acc(idx) -> float:
        H = np.tanh(Xz[idx] @ W1 + b1)
        p = 1.0 / (1.0 + np.exp(-(H @ W2 + b2)))[:, 0]
        return float(((p >= 0.5) == (y[idx] == 1)).mean())

    for epoch in range(epochs):
        order = rng.permutation(len(ti))
        for s in range(0, len(ti), batch_size):
            idx = ti[order[s : s + batch_size]]
            xb, yb = Xz[idx], y[idx]
            H = np.tanh(xb @ W1 + b1)
            logits = H @ W2 + b2
            p = 1.0 / (1.0 + np.exp(-logits))
            gl = (p - yb[:, None]) / len(idx)       # dBCE/dlogits
            gW2 = H.T @ gl
            gb2 = gl.sum(axis=0)
            gH = gl @ W2.T
            gZ = gH * (1 - H * H)
            gW1 = xb.T @ gZ
            gb1 = gZ.sum(axis=0)
            grads = [gW1, gb1, gW2, gb2]
            step += 1
            for k, (pm, g) in enumerate(zip(params, grads)):
                m[k] = beta1 * m[k] + (1 - beta1) * g
                v[k] = beta2 * v[k] + (1 - beta2) * g * g
                mh = m[k] / (1 - beta1**step)
                vh = v[k] / (1 - beta2**step)
                pm -= lr * mh / (np.sqrt(vh) + eps)
        a = acc(vi)
        if a > best_acc:
            best_acc, best_params, since = a, [p.copy() for p in params], 0
        else:
            since += 1
            if since >= patience:
                break

    W1, b1, W2, b2 = best_params
    return FusionModel(W1=W1, b1=b1, W2=W2, b2=b2, mu=mu, sd=sd)


class FusionScorer:
    """Actor map_batches stage: feature columns → + conf (T6 pattern)."""

    def __init__(self, model_bc: Broadcast):
        self.model: FusionModel = model_bc.get()

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.nan_to_num(
            np.column_stack(
                [batch.column(f).to_numpy().astype(np.float64)
                 for f in self.model.features]
            ),
            nan=0.0, posinf=0.0, neginf=0.0,
        )
        conf = self.model.forward(X)[:, 0]
        return batch.append_column("conf", pa.array(conf))


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
