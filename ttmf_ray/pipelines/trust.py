"""Phase B — TTMF triple-trustworthiness over a constructed edge table
(SURVEY.md §7.1 pass 2; mirrors `full_run.sh:34-36` stage by stage, as
one Ray Data DAG instead of three process pools over files).

    edges (subj, pred, obj)
      → vocab (A1, sort-assigned ids) → id-map (M1)
      → deterministic split (O4) → labeled ±1 examples (D4)
      → TransE + PTransE-style training (T7, driver numpy)
      → per-relation thresholds (A3) → TransE margin feature (M5/M6)
      → fused subgraph→PPR→RR features per conf head (T1-T3 actor pool)
      → per-head thresholds (A4) → rr_f / RR-6 features (M7/M8)
      → reachable-path search + ranking (T4/T5 actor pool) → top-3 (M9/J4)
      → fusion estimator train (T8, driver) → score (T6 actor pool)
      → accuracy (A5) + P/R sweep (A6)

The labeled/conf tables are small by construction (a split of the edge
set); the HEAVY stages — graph features and path search — stream through
actor pools with the CSR adjacency and embeddings broadcast once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..context import Broadcast
from ..functions.fusion import (FEATURES, FusionScorer, accuracy, pr_sweep,
                                train_fusion)
from ..functions.sampling import labeled_examples, split_edges
from ..functions.transe import (TransEConfig, TransEFeature,
                                thresholds_by_key, train_transe,
                                train_transe_distributed, transe_energy)
from ..functions.vocab import build_vocab, id_map_edges
from ..stages.graph import (RR_F_MISS, RR_MISS_SENTINEL, build_csr,
                            graph_features_for_heads, rr_sigmoid_f)
from ..stages.paths import ranked_paths_for_queries


@dataclass
class TrustConfig:
    transe: TransEConfig = field(default_factory=TransEConfig)
    ptranse: TransEConfig = field(
        default_factory=lambda: TransEConfig(loss="logistic", epochs=30)
    )
    subgraph_depth: int = 4
    subgraph_max_nodes: int = 4000
    path_keep_top: int = 50
    path_max_paths: int = 20000
    neg_seed: int = 628
    kge_workers: int | None = None  # None → auto (num_cpus/2); 0/1 → serial
    fusion_batch_size: int = 64     # reference default (Model1.py:982);
    fusion_epochs: int = 200        # raise batch at large conf tables


def _collect_matching(feature_ds, key_cols: list[str], keys: set) -> pd.DataFrame:
    """Stream a big feature Dataset, keep only rows whose key tuple is in a
    broadcast set (semi-join), materialize the small matched remainder.

    This is the J2/J3 join specialized for a small probe side: the big
    side never materializes, the filter is per-batch, the result is
    bounded by |keys|.
    """
    assert len(key_cols) == 2
    packed = np.sort(np.fromiter(
        ((int(a) << 32) | int(b) for a, b in keys), dtype=np.int64,
        count=len(keys),
    ))
    keys_bc = Broadcast(packed)

    def keep(batch: pa.Table) -> pa.Table:
        karr = keys_bc.get()
        a = batch.column(key_cols[0]).to_numpy().astype(np.int64)
        b = batch.column(key_cols[1]).to_numpy().astype(np.int64)
        probe = (a << 32) | b
        if len(karr) == 0:
            return batch.filter(pa.array(np.zeros(len(probe), dtype=bool)))
        pos = np.searchsorted(karr, probe)
        pos = np.clip(pos, 0, len(karr) - 1)
        mask = karr[pos] == probe
        return batch.filter(pa.array(mask))

    return feature_ds.map_batches(keep, batch_format="pyarrow").to_pandas()


def trust_pipeline(edges_ds, cfg: TrustConfig = TrustConfig()) -> dict:
    """Edge Dataset (subj, pred, obj) → scored conf_test + metrics."""
    import time as _time

    timings: dict[str, float] = {}
    _t = _time.time()

    def _lap(name: str) -> None:
        nonlocal _t
        timings[name] = round(_time.time() - _t, 3)
        _t = _time.time()

    # ---- vocab + ids (A1/M1) -------------------------------------------
    edges_ds = edges_ds.materialize()  # consumed 3x (ents, rels, id-map)
    ent_df, rel_df = build_vocab(edges_ds)
    n_ent, n_rel = len(ent_df), len(rel_df)
    # canonical (h,t,r) order: to_pandas under preserve_order=False reflects
    # block ARRIVAL order, which varies with cluster size — and SGD shard
    # assignment / batch permutations / fusion training all consume row
    # order, so every collected table is sorted before use
    ids_df = id_map_edges(edges_ds, ent_df, rel_df).to_pandas() \
        .sort_values(["h", "t", "r"], ignore_index=True)
    # (driver-side arrays: the id triple table is the KG itself — FB15K
    # scale; the page corpus, which is the 100-TB object, never lands here)
    triples = ids_df[["h", "t", "r"]].to_numpy().astype(np.int64)

    # split driver-side (same arithmetic-hash semantics as split_edges —
    # the id table is already collected; three Ray round-trips saved)
    from ..functions.sampling import split_bucket

    b = split_bucket(ids_df["h"].to_numpy(), ids_df["t"].to_numpy(),
                     ids_df["r"].to_numpy())
    train_df = ids_df[b < 8]
    valid_df = ids_df[b == 8]
    test_df = ids_df[b == 9]

    gold = frozenset(map(tuple, triples.tolist()))
    _lap("vocab_ids_split")

    # ---- labeled examples (D4) -----------------------------------------
    conf_valid = labeled_examples(
        rd.from_pandas(valid_df), gold, n_entities=n_ent, seed=cfg.neg_seed
    ).to_pandas().sort_values(["h", "t", "r", "flag"], ignore_index=True)
    conf_test = labeled_examples(
        rd.from_pandas(test_df), gold, n_entities=n_ent, seed=cfg.neg_seed + 1
    ).to_pandas().sort_values(["h", "t", "r", "flag"], ignore_index=True)

    _lap("negative_sampling")

    # ---- KGE training (T7) ---------------------------------------------
    tr = train_df[["h", "t", "r"]].to_numpy().astype(np.int64)
    dev = valid_df[["h", "t", "r"]].to_numpy().astype(np.int64)
    from ..context import num_cpus as _ncpu

    kge_workers = cfg.kge_workers
    if kge_workers is None:
        # transfer-bound past ~8 workers (each round ships the full weight
        # matrices per worker); cap where the speedup saturates
        kge_workers = min(8, max(2, _ncpu() // 2))
    # PTransE-mode embeddings are only consumed by the path stage —
    # train them in a background Ray task overlapping everything between
    # here and path search (the serial logistic trainer otherwise sits on
    # the critical path)
    import ray as _ray

    _ptranse_task = _ray.remote(train_transe).remote(
        tr, n_ent, n_rel, cfg.ptranse, dev)
    if kge_workers > 1:
        E, R = train_transe_distributed(tr, n_ent, n_rel, cfg.transe,
                                        dev_triples=dev,
                                        workers=kge_workers)
    else:
        E, R = train_transe(tr, n_ent, n_rel, cfg.transe, dev_triples=dev)

    _lap("kge_training")

    # ---- TransE margin features (A3 + M5/M6) ---------------------------
    cv_v = conf_valid.copy()
    cv_v["transV"] = transe_energy(E, R, cv_v["h"].to_numpy(),
                                   cv_v["t"].to_numpy(), cv_v["r"].to_numpy())
    theta_r = thresholds_by_key(cv_v, key="r", value="transV")
    def with_margin(df: pd.DataFrame) -> pd.DataFrame:
        v = transe_energy(E, R, df["h"].to_numpy(), df["t"].to_numpy(),
                          df["r"].to_numpy())
        th = df["r"].map(lambda x: theta_r.get(int(x), 0.0)).to_numpy()
        out = df.copy()
        out["transV"] = v
        out["conf_transe"] = th - v
        return out

    conf_valid = with_margin(conf_valid)
    conf_test = with_margin(conf_test)

    _lap("transe_features")

    # ---- fused graph features for conf heads (T1-T3) -------------------
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], n_ent)
    heads = sorted(set(conf_valid["h"]) | set(conf_test["h"]))
    heads_ds = rd.from_pandas(pd.DataFrame({"head": heads}))
    both = pd.concat([conf_valid, conf_test])
    packed_pairs = np.unique(
        (both["h"].to_numpy().astype(np.int64) << 32)
        | both["t"].to_numpy().astype(np.int64)
    )
    # the pair filter runs INSIDE the actors: only the (h, t) rows the
    # feature join consumes ever leave the stage (~60x output shrink)
    gf_hits = graph_features_for_heads(
        heads_ds, csr, depth=cfg.subgraph_depth,
        max_nodes=cfg.subgraph_max_nodes, pairs=packed_pairs,
        batch_size=96,
    ).to_pandas()
    gf_map = {
        (int(row.head), int(row.node)): row
        for row in gf_hits.itertuples(index=False)
    }

    _lap("graph_features")

    # ---- per-head thresholds on PR (A4, desc sweep) --------------------
    pr_rows = conf_valid.copy()
    pr_rows["pr"] = [
        float(gf_map[(h, t)].pr) if (h, t) in gf_map else 0.0
        for h, t in zip(pr_rows["h"].astype(int), pr_rows["t"].astype(int))
    ]
    theta_h = thresholds_by_key(pr_rows[["h", "pr", "flag"]], key="h",
                                value="pr", descending=True)

    def add_rr(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        fvals, feats = [], []
        for h, t in zip(df["h"].astype(int), df["t"].astype(int)):
            row = gf_map.get((h, t))
            th = theta_h.get(h, 0.5)
            if row is None:
                fvals.append(RR_F_MISS)
                feats.append(RR_MISS_SENTINEL)
            else:
                f = float(rr_sigmoid_f(row.pr, th))
                fvals.append(f)
                feats.append([f, row.in_c, row.out_c, row.in_n, row.out_n,
                              row.depth])
        out["rr_f"] = fvals
        arr = np.asarray(feats, dtype=np.float64)
        for i, c in enumerate(["rr6_f", "in_c", "out_c", "in_n", "out_n",
                               "depth"]):
            out[c] = arr[:, i]
        return out

    conf_valid = add_rr(conf_valid)
    conf_test = add_rr(conf_test)

    _lap("rr_features")

    # ---- reachable paths (T4/T5 + M9) ----------------------------------
    queries = pd.concat([conf_valid, conf_test])[["h", "t", "r"]] \
        .drop_duplicates()
    Ep, Rp = _ray.get(_ptranse_task)
    paths_df = ranked_paths_for_queries(
        rd.from_pandas(queries), csr, Ep, Rp,
        keep_top=cfg.path_keep_top, max_paths=cfg.path_max_paths,
    ).to_pandas()
    top3 = paths_df[paths_df["rank"] < 3]
    pmap: dict[tuple, list[float]] = {}
    for row in top3.itertuples(index=False):
        pmap.setdefault((int(row.h), int(row.t), int(row.r)),
                        [0.0, 0.0, 0.0, 0, 0, 0])
        ent = pmap[(int(row.h), int(row.t), int(row.r))]
        ent[int(row.rank)] = float(row.score)
        ent[3 + int(row.rank)] = 1

    def add_paths(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        vals = np.asarray(
            [
                pmap.get((int(h), int(t), int(r)), [0.0, 0.0, 0.0, 0, 0, 0])
                for h, t, r in zip(df["h"], df["t"], df["r"])
            ],
            dtype=np.float64,
        )
        for i, c in enumerate(["p0", "p1", "p2", "p0_has", "p1_has",
                               "p2_has"]):
            out[c] = vals[:, i]
        return out

    conf_valid = add_paths(conf_valid)
    conf_test = add_paths(conf_test)

    _lap("path_search")

    # ---- fusion train + score (T8/T6) ----------------------------------
    model = train_fusion(conf_valid, batch_size=cfg.fusion_batch_size,
                         epochs=cfg.fusion_epochs)
    model_bc = Broadcast(model)
    from ..context import auto_pool

    from ..context import spread

    scored = spread(rd.from_pandas(conf_test)).map_batches(
        FusionScorer, fn_constructor_kwargs={"model_bc": model_bc},
        batch_format="pyarrow", batch_size=4096, concurrency=auto_pool(0.25),
    ).to_pandas().sort_values(["h", "t", "r", "flag"], ignore_index=True)

    _lap("fusion_train_score")
    conf = scored["conf"].to_numpy()
    flags = scored["flag"].to_numpy()
    sweep = pr_sweep(conf, flags)
    return {
        "ent_vocab": ent_df,
        "rel_vocab": rel_df,
        "n_triples": len(triples),
        "theta_r": theta_r,
        "theta_h": theta_h,
        "conf_valid": conf_valid,
        "scored_test": scored,
        "accuracy": accuracy(conf, flags),
        "pr_sweep": sweep,
        "max_f1": float(sweep["f1"].max()),
        "embeddings": (E, R),
        "csr": csr,
        "timings": timings,
    }
