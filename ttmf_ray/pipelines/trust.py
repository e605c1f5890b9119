"""Phase B — TTMF triple-trustworthiness over a constructed edge table
(SURVEY.md §7.1 pass 2; mirrors `full_run.sh:34-36` stage by stage, as
one Ray Data DAG instead of three process pools over files).

    edges (subj, pred, obj)
      → vocab (A1, sort-assigned ids) → id-map (M1)
      → deterministic split (O4) → labeled ±1 examples (D4)
      → TransE + PTransE training (T7, tree-reduced local-SGD)
      → per-relation thresholds (A3) → TransE margin feature (M5/M6)
      → fused subgraph→PPR→RR features per conf head (T1-T3 actor pool)
      → per-head thresholds (A4) → rr_f / RR-6 features (M7/M8)
      → reachable-path search + ranking (T4/T5 actor pool)
        → top-3 scores AND padded edge-id sequences (M9/J4)
      → fusion estimator train (T8, driver; path branches over embedded
        sequences) → score (T6 actor pool)
      → accuracy (A5) + P/R sweep (A6)

Scale shape: the conf tables are small by construction (a split of the
edge set — the KG is FB15K-scale; the page corpus, the 100-TB object,
never lands on the driver).  The three HEAVY stages — margin-KGE
training, graph features, and path search — have no data dependency on
each other, so they run CONCURRENTLY: graph features and path search
stream through actor pools (CSR + embeddings broadcast once) in driver
threads while the driver round-trips the tree-reduced KGE averaging.
All driver-side feature attachment is vectorized packed-key
searchsorted — no Python dict per (h,t) pair.

Why the id-mapped edge table MAY live on the driver (quantified): the
binding memory ceiling of this algorithm is NOT the edge list but the
KGE weight matrix, which every trainer worker and every path-search
actor holds densely ((|E|+2)×k float32 — broadcast, per PROCESS).  At
the point that matrix stops fitting (≈1e9 entities × 32 dims = 128 GB),
no amount of edge-table streaming saves the pipeline — it needs sharded
embeddings, a different algorithm.  Below that ceiling the edge list is
the cheap object: 24 B/triple ⇒ 100× FB15K (≈5e7 triples) is ~1.2 GB of
driver pandas vs 1-10 GB of broadcast weights per worker.  So the
streaming budget is spent where the data actually grows without bound —
the page corpus in phase A — and phase B pins its own assumption here.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..context import Broadcast
from ..functions.fusion import (FEATURES, MAX_P, N_BRANCH, FusionScorer,
                                accuracy, pr_sweep, train_fusion)
from ..functions.sampling import labeled_examples, pack_triples, split_bucket
from ..functions.transe import (TransEConfig, thresholds_by_key, train_transe,
                                train_transe_distributed, transe_energy)
from ..functions.vocab import build_vocab, id_map_edges
from ..stages.graph import (RR_F_MISS, RR_MISS_SENTINEL, build_csr,
                            graph_features_for_heads, rr_sigmoid_f)
from ..stages.paths import enumerate_paths_ds, score_paths_for_queries


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
    # PTransE / fusion worker counts follow kge_workers when None; pinning
    # kge_workers in rows-only driver queries therefore pins ALL trainer
    # parallelism (results must not depend on cluster size)
    ptranse_workers: int | None = None
    fusion_workers: int | None = None
    fusion_batch_size: int = 64     # reference default (Model1.py:982);
    fusion_epochs: int = 200        # raise batch at large conf tables
    # "pool" (masked-mean + Dense, the fast default) or "rnn" (the
    # reference's SimpleRNN cell over the 6-part per-step concat,
    # Model1.py:78-110 — see functions/fusion.py FusionModel.branch_mode)
    fusion_branch_mode: str = "pool"
    # rnn mode only: add the reference's Dropout(0.5)→BatchNorm→
    # Dropout(0.5) branch regularizer stack (Model1.py:86-99)
    fusion_branch_reg: bool = False
    scorer_num_gpus: float | None = None  # per-actor GPU for the T6 pool
    checkpoint_dir: str | None = None     # stage checkpoints (KGE reuse)
    # streaming=True routes to trust_pipeline_streaming: no triple/conf
    # payload on the driver heap (object-store refs + Dataset joins) —
    # feature table bit-identical for the same pinned worker counts,
    # conf within ~1 ulp (see trust_streaming docstring).  The default
    # (False) is the broadcast/driver path, faster below the
    # weight-matrix ceiling quantified in this module's docstring.
    streaming: bool = False


def _dict_to_arr(d: dict[int, float], n: int, default: float) -> np.ndarray:
    """{id → value} → dense lookup array (vectorized fancy-index attach)."""
    arr = np.full(n, default, dtype=np.float64)
    if d:
        arr[np.fromiter(d.keys(), dtype=np.int64, count=len(d))] = \
            np.fromiter(d.values(), dtype=np.float64, count=len(d))
    return arr


def _packed_probe(sorted_keys: np.ndarray, probe: np.ndarray):
    """(positions, hit_mask) of probe in sorted_keys."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=np.int64), np.zeros(len(probe), bool)
    pos = np.clip(np.searchsorted(sorted_keys, probe), 0, len(sorted_keys) - 1)
    return pos, sorted_keys[pos] == probe


class _StageThread(threading.Thread):
    """Driver thread running one Dataset consumption; re-raises on join."""

    def __init__(self, fn):
        super().__init__(daemon=True)
        self._fn = fn
        self.result = None
        self.error: BaseException | None = None
        self.seconds = 0.0

    def run(self):
        import time as _t
        t0 = _t.time()
        try:
            self.result = self._fn()
        except BaseException as e:  # noqa: BLE001 — re-raised on join
            self.error = e
        self.seconds = round(_t.time() - t0, 3)

    def join_result(self):
        self.join()
        if self.error is not None:
            raise self.error
        return self.result


def trust_pipeline(edges_ds, cfg: TrustConfig = TrustConfig()) -> dict:
    """Edge Dataset (subj, pred, obj) → scored conf_test + metrics."""
    import time as _time

    if cfg.streaming:
        from .trust_streaming import trust_pipeline_streaming

        return trust_pipeline_streaming(edges_ds, cfg)

    timings: dict[str, float] = {}
    _t = _time.time()

    def _lap(name: str) -> None:
        nonlocal _t
        timings[name] = round(_time.time() - _t, 3)
        _t = _time.time()

    # ---- vocab + ids (A1/M1) -------------------------------------------
    # canonical (h,t,r) order: collection under preserve_order=False
    # reflects block ARRIVAL order, which varies with cluster size — and
    # SGD shard assignment / batch permutations / fusion training all
    # consume row order, so the collected table is sorted before use.
    import ray as _ray

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= 5_000_000:
        # driver fast path: the KG is FB15K-scale by contract (module
        # docstring) — ONE Arrow collect, vocab + id-map via Arrow HASH
        # kernels (pc.unique / pc.index_in against the sorted unique
        # set), never numpy object arrays: np.unique + searchsorted on
        # 1.4M Python strings measured 1.1 s where the Arrow kernels
        # take 45 ms (bit-identical ids verified — names are ASCII, so
        # Arrow's byte sort == Python's code-point sort).  Replaces
        # three Ray passes that measured ~4-5 s of the critical chain.
        import pyarrow.compute as _pc
        _tbls = _ray.get(edges_ds.to_arrow_refs())
        _tbl = pa.concat_tables([t for t in _tbls if t.num_rows]
                                or _tbls[:1])
        _subj_c = _tbl.column("subj").combine_chunks()
        _pred_c = _tbl.column("pred").combine_chunks()
        _obj_c = _tbl.column("obj").combine_chunks()
        _ents_u = _pc.unique(pa.chunked_array([_subj_c, _obj_c]))
        _ents_s = _ents_u.take(_pc.array_sort_indices(_ents_u))
        _rels_u = _pc.unique(_pred_c)
        _rels_s = _rels_u.take(_pc.array_sort_indices(_rels_u))
        ent_df = pd.DataFrame({"name": _ents_s.to_numpy(
                                   zero_copy_only=False),
                               "id": np.arange(len(_ents_s),
                                               dtype=np.int32)})
        rel_df = pd.DataFrame({"name": _rels_s.to_numpy(
                                   zero_copy_only=False),
                               "id": np.arange(len(_rels_s),
                                               dtype=np.int32)})
        _h = _pc.index_in(_subj_c, value_set=_ents_s).to_numpy() \
            .astype(np.int64)
        _t2 = _pc.index_in(_obj_c, value_set=_ents_s).to_numpy() \
            .astype(np.int64)
        _r = _pc.index_in(_pred_c, value_set=_rels_s).to_numpy() \
            .astype(np.int64)
    else:
        ent_df, rel_df = build_vocab(edges_ds)
        _tbls = _ray.get(
            id_map_edges(edges_ds, ent_df, rel_df).to_arrow_refs())
        _tbl = pa.concat_tables([t for t in _tbls if t.num_rows]
                                or _tbls[:1])
        _h = _tbl.column("h").to_numpy().astype(np.int64)
        _t2 = _tbl.column("t").to_numpy().astype(np.int64)
        _r = _tbl.column("r").to_numpy().astype(np.int64)
    n_ent, n_rel = len(ent_df), len(rel_df)
    # Arrow collect + np.lexsort, not to_pandas().sort_values (driver
    # wall at 679k edges: ~4 s → ~0.3 s)
    _order = np.lexsort((_r, _t2, _h))
    triples = np.ascontiguousarray(
        np.stack([_h[_order], _t2[_order], _r[_order]], axis=1))
    ids_df = pd.DataFrame({"h": triples[:, 0], "t": triples[:, 1],
                           "r": triples[:, 2]})

    # split driver-side (same arithmetic-hash semantics as split_edges —
    # the id table is already collected; three Ray round-trips saved)
    b = split_bucket(ids_df["h"].to_numpy(), ids_df["t"].to_numpy(),
                     ids_df["r"].to_numpy())
    train_df = ids_df[b < 8]
    valid_df = ids_df[b == 8]
    test_df = ids_df[b == 9]
    _lap("vocab_ids_split")

    # ---- PTransE trainer launches FIRST --------------------------------
    # It gates path search (the longest chain: ptranse → search → path
    # features → fusion) and needs only the train/dev splits — starting it
    # before negative sampling takes ~3 s off the critical path.
    tr = train_df[["h", "t", "r"]].to_numpy().astype(np.int64)
    dev = valid_df[["h", "t", "r"]].to_numpy().astype(np.int64)
    from ..context import num_cpus as _ncpu

    kge_workers = cfg.kge_workers
    if kge_workers is None:
        kge_workers = min(8, max(2, _ncpu() // 2))

    # stage checkpoints (phase-B resume): trained embeddings keyed by a
    # fingerprint of the id-mapped triple table + the training config
    ckpt = None
    if cfg.checkpoint_dir:
        import hashlib

        from ..state.checkpoints import StageCheckpoint

        fp = (hashlib.sha256(triples.tobytes()).hexdigest()[:24]
              + f"|{cfg.transe}|{cfg.ptranse}|w{kge_workers}")
        ckpt = StageCheckpoint(cfg.checkpoint_dir, fp)

    ptranse_workers = cfg.ptranse_workers
    if ptranse_workers is None:
        ptranse_workers = kge_workers

    if ckpt is not None and ckpt.has("ptranse"):
        _ptranse_thread = None
        _ptranse_cached = tuple(ckpt.load("ptranse"))
        timings["ptranse_ckpt_hit"] = 1.0
    else:
        # local-SGD across ptranse_workers Ray tasks, driven from a driver
        # thread (the 31-negatives-per-positive PTransE mix is ~30x the
        # margin trainer's work — single-task training gated path search
        # for ~80 s while the cluster idled)
        _ptranse_cached = None
        if ptranse_workers > 1:
            _ptranse_thread = _StageThread(lambda: train_transe_distributed(
                tr, n_ent, n_rel, cfg.ptranse, dev_triples=dev,
                workers=ptranse_workers))
        else:
            _ptranse_thread = _StageThread(lambda: train_transe(
                tr, n_ent, n_rel, cfg.ptranse, dev))
        _ptranse_thread.start()

    # ---- margin-KGE trainer also launches EARLY ------------------------
    # It too needs only the train/dev splits, and it used to block the
    # MAIN driver thread after negative sampling — started here, the
    # negative-sampling and graph-feature walls hide behind it entirely.
    def _run_kge():
        if ckpt is not None and ckpt.has("kge"):
            timings["kge_ckpt_hit"] = 1.0
            return tuple(ckpt.load("kge"))
        if kge_workers > 1:
            out = train_transe_distributed(tr, n_ent, n_rel, cfg.transe,
                                           dev_triples=dev,
                                           workers=kge_workers)
        else:
            out = train_transe(tr, n_ent, n_rel, cfg.transe, dev_triples=dev)
        if ckpt is not None:
            ckpt.save("kge", list(out))
        return out

    th_kge = _StageThread(_run_kge)
    th_kge.start()

    # ---- labeled examples (D4) -----------------------------------------
    # gold membership is a sorted packed-key array; splits this small
    # (valid+test ≈ 20% of the KG) sample on the DRIVER with the same
    # seeded kernel — bit-identical to the actor path, minus a measured
    # ~2.5 s Ray round-trip on the critical chain.  The actor-pool path
    # (labeled_examples) remains the scale route for huge splits.
    if len(valid_df) + len(test_df) <= 1_000_000:
        from ..functions.sampling import labeled_examples_local

        packed_gold = np.sort(pack_triples(
            triples[:, 0], triples[:, 1], triples[:, 2],
            n_entities=n_ent, n_relations=n_rel))
        conf_valid = labeled_examples_local(
            valid_df, packed_gold, n_entities=n_ent, n_relations=n_rel,
            seed=cfg.neg_seed).sort_values(["h", "t", "r", "flag"],
                                           ignore_index=True)
        conf_test = labeled_examples_local(
            test_df, packed_gold, n_entities=n_ent, n_relations=n_rel,
            seed=cfg.neg_seed + 1).sort_values(["h", "t", "r", "flag"],
                                               ignore_index=True)
    else:
        def _labeled(df, seed):
            return lambda: labeled_examples(
                rd.from_pandas(df), triples, n_entities=n_ent,
                n_relations=n_rel, seed=seed
            ).to_pandas().sort_values(["h", "t", "r", "flag"],
                                      ignore_index=True)

        th_cv = _StageThread(_labeled(valid_df, cfg.neg_seed))
        th_ct = _StageThread(_labeled(test_df, cfg.neg_seed + 1))
        th_cv.start()
        th_ct.start()
        conf_valid = th_cv.join_result()
        conf_test = th_ct.join_result()
    _lap("negative_sampling")

    # ---- the three heavy stages, OVERLAPPED ----------------------------
    # (no data dependency: margin-KGE needs train triples; graph features
    # need CSR + conf pairs; path search needs CSR + PTransE embeddings,
    # which train in a background Ray task started above)
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], n_ent)
    both = pd.concat([conf_valid, conf_test])
    heads = np.union1d(conf_valid["h"].to_numpy(), conf_test["h"].to_numpy())
    heads_ds = rd.from_pandas(pd.DataFrame({"head": heads}))
    packed_pairs = np.unique(
        (both["h"].to_numpy().astype(np.int64) << 32)
        | both["t"].to_numpy().astype(np.int64)
    )
    queries = both[["h", "t", "r"]].drop_duplicates()

    # ---- path ENUMERATION starts now (stage 1, CSR-only) ---------------
    # Path search used to be one stage gated end-to-end by the PTransE
    # embeddings; enumeration needs only the CSR, so it materializes here
    # concurrently with BOTH trainers — only the cheap scoring stage waits
    # for the embeddings.
    def run_path_enum():
        return enumerate_paths_ds(
            np.unique(queries["h"].to_numpy()), csr,
            max_paths=cfg.path_max_paths,
        ).materialize()

    th_enum = _StageThread(run_path_enum)
    th_enum.start()

    def run_graph_features():
        # the pair filter runs INSIDE the actors: only the (h, t) rows the
        # feature join consumes ever leave the stage (~60x output shrink)
        return graph_features_for_heads(
            heads_ds, csr, depth=cfg.subgraph_depth,
            max_nodes=cfg.subgraph_max_nodes, pairs=packed_pairs,
            batch_size=96,
        ).to_pandas()

    path_emb: dict = {}

    def run_paths():
        if _ptranse_cached is not None:
            Ep, Rp = _ptranse_cached
        else:
            Ep, Rp = _ptranse_thread.join_result()
            timings["ptranse_wall"] = _ptranse_thread.seconds
            if ckpt is not None:
                ckpt.save("ptranse", [Ep, Rp])
        path_emb["emb"] = (Ep, Rp)
        import pyarrow.compute as _pc

        import ray as _ray

        enum_mat = th_enum.join_result()
        timings["path_enum_wall"] = th_enum.seconds
        ranked = score_paths_for_queries(
            enum_mat, queries, Ep, Rp, keep_top=cfg.path_keep_top,
        ).map_batches(
            # the fusion features consume only the top N_BRANCH ranks —
            # drop the rest before collecting (~16x fewer driver rows)
            lambda t: t.filter(_pc.less(t.column("rank"), N_BRANCH)),
            batch_format="pyarrow",
        )
        # collect as ARROW (a pandas round-trip turns the FixedSizeList
        # sequence columns into object arrays of lists — np.stack over
        # those was a measured 17 s driver stall at sf0.1)
        tbls = _ray.get(ranked.to_arrow_refs())
        return pa.concat_tables([t for t in tbls if t.num_rows]
                                or tbls[:1])

    th_graph = _StageThread(run_graph_features)
    th_paths = _StageThread(run_paths)
    th_graph.start()
    th_paths.start()

    E, R = th_kge.join_result()
    timings["kge_train_wall"] = th_kge.seconds
    _lap("kge_training")

    # ---- TransE margin features (A3 + M5/M6) ---------------------------
    cv_v = conf_valid.copy()
    cv_v["transV"] = transe_energy(E, R, cv_v["h"].to_numpy(),
                                   cv_v["t"].to_numpy(), cv_v["r"].to_numpy())
    theta_r = thresholds_by_key(cv_v, key="r", value="transV")
    theta_r_arr = _dict_to_arr(theta_r, n_rel, 0.0)  # miss → θ=0 (M6)

    def with_margin(df: pd.DataFrame) -> pd.DataFrame:
        v = transe_energy(E, R, df["h"].to_numpy(), df["t"].to_numpy(),
                          df["r"].to_numpy())
        out = df.copy()
        out["transV"] = v
        out["conf_transe"] = theta_r_arr[df["r"].to_numpy()] - v
        return out

    conf_valid = with_margin(conf_valid)
    conf_test = with_margin(conf_test)
    _lap("transe_features")

    # ---- RR features (T1-T3 output + A4 thresholds, M7/M8) -------------
    gf_hits = th_graph.join_result()
    timings["graph_features_wall"] = th_graph.seconds
    gf_key_raw = ((gf_hits["head"].to_numpy().astype(np.int64) << 32)
                  | gf_hits["node"].to_numpy().astype(np.int64))
    gf_order = np.argsort(gf_key_raw, kind="stable")
    gf_key = gf_key_raw[gf_order]
    gf_pr = gf_hits["pr"].to_numpy()[gf_order]
    gf_feat = gf_hits[["in_c", "out_c", "in_n", "out_n", "depth"]] \
        .to_numpy(dtype=np.float64)[gf_order]

    def pr_of(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        probe = ((df["h"].to_numpy().astype(np.int64) << 32)
                 | df["t"].to_numpy().astype(np.int64))
        pos, hit = _packed_probe(gf_key, probe)
        pr = np.where(hit, gf_pr[pos], 0.0)
        return pr, (pos, hit)

    pr_v, _ = pr_of(conf_valid)
    theta_h = thresholds_by_key(
        pd.DataFrame({"h": conf_valid["h"], "pr": pr_v,
                      "flag": conf_valid["flag"]}),
        key="h", value="pr", descending=True)
    theta_h_arr = _dict_to_arr(theta_h, n_ent, 0.5)  # miss → θ=0.5 (M7)

    def add_rr(df: pd.DataFrame) -> pd.DataFrame:
        pr, (pos, hit) = pr_of(df)
        f = rr_sigmoid_f(pr, theta_h_arr[df["h"].to_numpy()])
        out = df.copy()
        out["rr_f"] = np.where(hit, f, RR_F_MISS)
        out["rr6_f"] = np.where(hit, f, RR_MISS_SENTINEL[0])
        feats = np.where(hit[:, None], gf_feat[pos],
                         np.asarray(RR_MISS_SENTINEL[1:], dtype=np.float64))
        for i, c in enumerate(["in_c", "out_c", "in_n", "out_n", "depth"]):
            out[c] = feats[:, i]
        return out

    conf_valid = add_rr(conf_valid)
    conf_test = add_rr(conf_test)
    _lap("rr_features")

    # ---- reachable paths (T4/T5 + M9) ----------------------------------
    paths_tbl = th_paths.join_result()   # Arrow; rank < N_BRANCH only
    timings["path_search_wall"] = th_paths.seconds
    _lap("path_join_wait")
    Ep, Rp = path_emb["emb"]
    rank_arr = paths_tbl.column("rank").to_numpy()
    p_key_raw = pack_triples(paths_tbl.column("h").to_numpy(),
                             paths_tbl.column("t").to_numpy(),
                             paths_tbl.column("r").to_numpy(),
                             n_entities=n_ent, n_relations=n_rel)
    score_arr = paths_tbl.column("score").to_numpy()
    plen_arr = paths_tbl.column("path_len").to_numpy()
    seq_mats = {
        c: paths_tbl.column(c).combine_chunks().flatten().to_numpy()
        .reshape(-1, MAX_P).astype(np.int64)
        for c in ("p_src", "p_dst", "p_rel")
    }
    per_rank = []
    for k in range(N_BRANCH):
        sel = rank_arr == k
        kk = p_key_raw[sel]
        o = np.argsort(kk, kind="stable")
        seqs = tuple(seq_mats[c][sel][o] for c in ("p_src", "p_dst", "p_rel"))
        per_rank.append((kk[o], score_arr[sel][o], plen_arr[sel][o], seqs))

    def add_paths(df: pd.DataFrame) -> pd.DataFrame:
        probe = pack_triples(df["h"].to_numpy(), df["t"].to_numpy(),
                             df["r"].to_numpy(),
                             n_entities=n_ent, n_relations=n_rel)
        out = df.copy()
        for k, (keys, score, plen, (ps, pd_, pr_)) in enumerate(per_rank):
            pos, hit = _packed_probe(keys, probe)
            out[f"p{k}"] = np.where(hit, score[pos], 0.0)
            out[f"p{k}_has"] = hit.astype(np.float64)
            out[f"p{k}_len"] = np.where(hit, plen[pos], 0).astype(np.int64)
            for i in range(MAX_P):
                # padded edge-id sequences (PrecessData.py:159-197: pad 0)
                out[f"p{k}_s{i}"] = np.where(hit, ps[pos, i], 0)
                out[f"p{k}_d{i}"] = np.where(hit, pd_[pos, i], 0)
                out[f"p{k}_r{i}"] = np.where(hit, pr_[pos, i], 0)
        return out

    conf_valid = add_paths(conf_valid)
    conf_test = add_paths(conf_test)
    _lap("path_features")

    # ---- fusion train + score (T8/T6) ----------------------------------
    fusion_workers = cfg.fusion_workers
    if fusion_workers is None:
        fusion_workers = kge_workers
    model = train_fusion(conf_valid, batch_size=cfg.fusion_batch_size,
                         epochs=cfg.fusion_epochs, path_emb=(Ep, Rp),
                         workers=fusion_workers,
                         branch_mode=cfg.fusion_branch_mode,
                         branch_reg=cfg.fusion_branch_reg)
    _lap("fusion_train")
    if cfg.scorer_num_gpus is None and len(conf_test) <= 1_000_000:
        # driver fast path: per-row math on a conf table this small is
        # ~20 ms of numpy; the Ray round-trip (from_pandas + spread +
        # dispatch + collect) measured 6.7 s for the same 48k rows.  Same
        # kernel as the pool path ⇒ bit-identical conf values.
        # pandas-native: the arrow round-trip + wide 4-key sort_values
        # measured ~2.5 s of the lap at 137k×54; lexsort + take is the
        # identical permutation (the (h,t,r,flag) key is unique).
        from ..functions.fusion import score_fusion_df

        scored = score_fusion_df(conf_test, model)
        _ord = np.lexsort((scored["flag"].to_numpy(),
                           scored["r"].to_numpy(),
                           scored["t"].to_numpy(),
                           scored["h"].to_numpy()))
        scored = scored.take(_ord).reset_index(drop=True)
    else:
        model_bc = Broadcast(model)
        from functools import partial

        from ..context import auto_pool, pool_resources, spread

        from ..functions.fusion import score_fusion_task

        test_ds = spread(rd.from_pandas(conf_test))
        if cfg.scorer_num_gpus:
            scored_ds = test_ds.map_batches(
                FusionScorer, fn_constructor_kwargs={"model_bc": model_bc},
                batch_format="pyarrow", batch_size=4096,
                concurrency=auto_pool(0.25),
                **pool_resources(num_gpus=cfg.scorer_num_gpus),
            )
        else:
            # task pool: no actor spin-up; the model ships once via
            # broadcast — the scale path for conf tables beyond 1M rows
            scored_ds = test_ds.map_batches(
                partial(score_fusion_task, model_bc=model_bc),
                batch_format="pyarrow", batch_size=4096,
            )
        scored = scored_ds.to_pandas().sort_values(["h", "t", "r", "flag"],
                                                   ignore_index=True)
    _lap("fusion_score")

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


# ---------------------------------------------------------------------------
# Resumable phase-B output (per-partition manifest + stage checkpoints)
# ---------------------------------------------------------------------------

def _edges_fingerprint(edges_ds) -> str:
    """Order-independent content checksum of the edge table (commutative
    per-row hash sum — cheap, streaming, deterministic across sessions)."""
    import pandas as pd_

    def part_sum(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = int(pd_.util.hash_pandas_object(df, index=False).sum()
                & 0xFFFFFFFFFFFFFFFF)
        return pa.table({"s": pa.array([s], pa.uint64()),
                         "n": pa.array([len(df)], pa.int64())})

    agg = edges_ds.map_batches(part_sum, batch_format="pyarrow").to_pandas()
    total = int(agg["s"].astype(np.uint64).sum() & 0xFFFFFFFFFFFFFFFF)
    return f"edges:{int(agg['n'].sum())}:{total:016x}"


def trust_scores_resumable(edges_ds, out_dir: str,
                           cfg: TrustConfig = TrustConfig(), *,
                           n_shards: int = 8,
                           fail_after_shards: int | None = None) -> dict:
    """Phase B with exact resume: stage checkpoints (trained embeddings
    reused when the input/config fingerprint matches) + the scored table
    written as ``n_shards`` hash-partitioned parquet shards, each with an
    atomic manifest row (ttmf_ray.state.manifest — the same layout as
    phase A's kg_construct_resumable).

    A killed run re-submits with the same ``out_dir``: completed shards
    are skipped; the (deterministic) pipeline recomputes the scored table
    only if any shard is missing, loading trained stages from checkpoint.
    """
    import os
    from dataclasses import replace

    import pyarrow.parquet as _pq  # noqa: F401  (manifest writes parquet)

    from ..state import manifest as mf

    edges_ds = edges_ds.materialize()
    fp = _edges_fingerprint(edges_ds) + f"|{cfg.transe}|{cfg.ptranse}"
    shards = {sid: f"{fp}|shard{sid}" for sid in range(n_shards)}
    todo = mf.resume_shards(out_dir, shards)
    done_before = n_shards - len(todo)
    if not todo:
        return {"shards_total": n_shards, "shards_skipped": done_before,
                "shards_processed": 0}

    cfg = replace(cfg, checkpoint_dir=os.path.join(out_dir, "_ckpt"))
    res = trust_pipeline(edges_ds, cfg)
    scored = res["scored_test"][["h", "t", "r", "flag", "conf"]]
    processed = 0
    for sid in todo:
        if fail_after_shards is not None and processed >= fail_after_shards:
            raise RuntimeError(f"injected failure after {processed} shards")
        t0 = mf.now()
        sub = scored[scored["h"].to_numpy() % n_shards == sid]
        table = pa.Table.from_pandas(sub, preserve_index=False)
        rows = mf.write_shard_parquet(table, out_dir, sid)
        mf.commit_shard(out_dir, mf.ShardRecord(
            shard_id=sid,
            input_fingerprint=shards[sid],
            rows_in=len(scored),
            rows_out=rows,
            counters={"kge_ckpt_hit": int(res["timings"].get(
                "kge_ckpt_hit", 0))},
            wall_sec=mf.now() - t0,
            finished_at=mf.now(),
        ))
        processed += 1
    return {"shards_total": n_shards, "shards_skipped": done_before,
            "shards_processed": processed,
            "accuracy": res["accuracy"], "max_f1": res["max_f1"]}
