"""Phase B, STREAMING variant — the full trust pipeline with NO triple or
conf-table payload on the driver heap (SURVEY.md §7.5; the scale path the
default ``trust_pipeline`` docstring's weight-matrix ceiling argument
defers to).

Residency contract (what lives where):

- DRIVER heap: the vocab tables, the KGE weight matrices E/R, the theta
  dicts/arrays, the fusion model — everything bounded by |entities| (the
  same ceiling the dense-embedding algorithm itself imposes; see
  ``trust.py`` module docstring).
- OBJECT STORE: the id-mapped triple array, train/valid/test splits,
  packed gold keys, CSR, trainer shards, queries/pairs metadata — each
  assembled by a REMOTE task from Dataset block refs (`_assemble_*`) and
  consumed by reference (``Broadcast.from_ref``); the driver only ever
  holds the refs and the tiny count dict.
- DATASETS (streamed, shuffled by Ray): the conf tables and every
  feature attach.  PR/RR and path features are attached by partitioned
  LEFT joins (`left_join_fill`) instead of the default path's
  driver-side packed-key probes; the threshold sweeps and fusion
  training run in remote tasks over the conf blocks.

Bit-identity: with the same pinned worker counts the WIDE FEATURE TABLE
(conf_valid, every feature column of scored_test) is bit-identical to
``trust_pipeline`` — values and dtypes — and the fused ``conf`` matches
within float rounding (~1 ulp: fusion training crosses a process
boundary here, and numpy's alignment-sensitive SIMD reduction order is
not stable across processes).  Asserted by
``tests/test_trust_streaming.py``: every kernel is shared, the trainer
shards are drawn from the identical rng stream (`transe._make_shards`),
the samplers are content-seeded, and both paths canonicalize conf order
by a final (h, t, r, flag) sort.

Reference parity: same stage semantics as ``trust_pipeline`` (which maps
`full_run.sh:34-36` stage by stage); this module changes only WHERE the
intermediate state lives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..context import Broadcast, num_cpus
from ..functions.fusion import (MAX_P, N_BRANCH, accuracy, pr_sweep,
                                score_fusion_task, train_fusion)
from ..functions.joins import left_join_fill
from ..functions.sampling import (labeled_examples, pack_triples,
                                  split_bucket, split_edges)
from ..functions.transe import (thresholds_by_key, train_transe,
                                train_transe_distributed, transe_energy)
from ..functions.vocab import build_vocab, id_map_edges
from ..stages.graph import (RR_F_MISS, RR_MISS_SENTINEL, build_csr,
                            graph_features_for_heads, rr_sigmoid_f)
from ..stages.paths import enumerate_paths_ds, score_paths_for_queries

GF_COLS = ["in_c", "out_c", "in_n", "out_n", "depth"]
GF_FILL = dict(zip(["pr"] + GF_COLS, [0.0] + RR_MISS_SENTINEL[1:]))


# ---------------------------------------------------------------------------
# Remote assemblers (run as Ray tasks; outputs stay in the object store)
# ---------------------------------------------------------------------------

def _assemble_triples(n_entities: int, n_relations: int, *tbls):
    """Id-mapped blocks → canonical (h,t,r)-sorted splits, sorted packed
    gold keys, and the train CSR — the exact arrays the default path
    builds on the driver (`trust.py` vocab_ids_split), stored remotely."""
    h = np.concatenate([t.column("h").to_numpy() for t in tbls]).astype(np.int64)
    t_ = np.concatenate([t.column("t").to_numpy() for t in tbls]).astype(np.int64)
    r = np.concatenate([t.column("r").to_numpy() for t in tbls]).astype(np.int64)
    order = np.lexsort((r, t_, h))
    h, t_, r = h[order], t_[order], r[order]
    b = split_bucket(h, t_, r)

    def pack3(m):
        return np.ascontiguousarray(np.stack([h[m], t_[m], r[m]], axis=1))

    tr, dev, te = pack3(b < 8), pack3(b == 8), pack3(b == 9)
    gold = np.sort(pack_triples(h, t_, r, n_entities=n_entities,
                                n_relations=n_relations))
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], n_entities)
    counts = {"train": len(tr), "valid": len(dev), "test": len(te),
              "total": len(h)}
    return tr, dev, te, gold, csr, counts


STREAM_FAST_MAX = 5_000_000     # same regime bound as trust.py's driver
# fast path: below it ONE remote task assembles vocab/splits/conf0 from
# the edge blocks (heap = one worker's edge copy); above it the Dataset
# build below streams everything


def _assemble_fast(neg_seed: int, *tbls):
    """Edge blocks (subj, pred, obj) → ONE remote task producing what the
    first three streaming stages previously built as separate Dataset
    executions: the vocab tables via Arrow HASH kernels (trust.py's
    rule-13 driver fast path — pc.unique/pc.index_in, bit-identical ids —
    run remotely so the driver still holds refs only), the canonical
    (h,t,r)-sorted splits + packed gold + train CSR (_assemble_triples'
    outputs), the labeled conf table (the same NegativeSampler kernel on
    the valid/test splits, tagged + keyed), and the conf metadata
    (_conf_meta's outputs).  At the 2M-page sf1 regime the Dataset fixed
    costs this replaces measured vocab_ids_split 7.8 s +
    negative_sampling 7.4 s (BENCH_sf1_trust_paths, round 4) for
    kernels that run in well under a second."""
    import pyarrow.compute as pc

    from ..functions.sampling import NegativeSampler

    tbl = pa.concat_tables([t for t in tbls if t.num_rows]
                           or list(tbls)[:1])
    subj = tbl.column("subj").combine_chunks()
    pred = tbl.column("pred").combine_chunks()
    obj = tbl.column("obj").combine_chunks()
    ents_u = pc.unique(pa.chunked_array([subj, obj]))
    ents_s = ents_u.take(pc.array_sort_indices(ents_u))
    rels_u = pc.unique(pred)
    rels_s = rels_u.take(pc.array_sort_indices(rels_u))
    ent_df = pd.DataFrame({"name": ents_s.to_numpy(zero_copy_only=False),
                           "id": np.arange(len(ents_s), dtype=np.int32)})
    rel_df = pd.DataFrame({"name": rels_s.to_numpy(zero_copy_only=False),
                           "id": np.arange(len(rels_s), dtype=np.int32)})
    n_ent, n_rel = len(ent_df), len(rel_df)
    h = pc.index_in(subj, value_set=ents_s).to_numpy().astype(np.int64)
    t_ = pc.index_in(obj, value_set=ents_s).to_numpy().astype(np.int64)
    r = pc.index_in(pred, value_set=rels_s).to_numpy().astype(np.int64)
    order = np.lexsort((r, t_, h))
    h, t_, r = h[order], t_[order], r[order]
    b = split_bucket(h, t_, r)

    def pack3(m):
        return np.ascontiguousarray(np.stack([h[m], t_[m], r[m]], axis=1))

    tr, dev, te = pack3(b < 8), pack3(b == 8), pack3(b == 9)
    gold = np.sort(pack_triples(h, t_, r, n_entities=n_ent,
                                n_relations=n_rel))
    csr = build_csr(tr[:, 0], tr[:, 1], tr[:, 2], n_ent)
    counts = {"train": len(tr), "valid": len(dev), "test": len(te),
              "total": len(h)}

    # conf0: the identical seeded sampler kernel the Dataset path runs
    # (labeled_examples), then the same tag + key columns
    keyer = _add_keys(n_ent, n_rel)

    def leg(arr, seed, which):
        sampler = NegativeSampler(gold, n_entities=n_ent,
                                  n_relations=n_rel, seed=seed)
        t = sampler(pa.table({"h": pa.array(arr[:, 0]),
                              "t": pa.array(arr[:, 1]),
                              "r": pa.array(arr[:, 2])}))
        t = t.append_column("which", pa.array(
            np.full(t.num_rows, which, dtype=np.int8)))
        return keyer(t)

    conf0 = pa.concat_tables([leg(dev, neg_seed, 0),
                              leg(te, neg_seed + 1, 1)])

    # conf metadata (same kernels as _conf_meta)
    ch = conf0.column("h").to_numpy().astype(np.int64)
    ct = conf0.column("t").to_numpy().astype(np.int64)
    cr = conf0.column("r").to_numpy().astype(np.int64)
    pk = pack_triples(ch, ct, cr, n_entities=n_ent, n_relations=n_rel)
    _, uidx = np.unique(pk, return_index=True)
    queries = (ch[uidx], ct[uidx], cr[uidx])
    pairs = np.unique((ch << 32) | ct)
    heads = np.unique(ch)
    return (ent_df, rel_df, tr, dev, te, gold, csr, counts,
            conf0, queries, pairs, heads)


def _conf_meta(n_entities: int, n_relations: int, *tbls):
    """Conf blocks → (sorted unique query triples, sorted packed (h,t)
    pairs, distinct heads).  Matches the driver path's drop_duplicates +
    lexsort / np.unique exactly (packed order == (h,t,r) lexsort)."""
    h = np.concatenate([t.column("h").to_numpy() for t in tbls]).astype(np.int64)
    t_ = np.concatenate([t.column("t").to_numpy() for t in tbls]).astype(np.int64)
    r = np.concatenate([t.column("r").to_numpy() for t in tbls]).astype(np.int64)
    pk = pack_triples(h, t_, r, n_entities=n_entities, n_relations=n_relations)
    _, uidx = np.unique(pk, return_index=True)
    queries = (h[uidx], t_[uidx], r[uidx])
    pairs = np.unique((h << 32) | t_)
    heads = np.unique(h)
    return queries, pairs, heads


def _sweep_remote(key: str, value: str, descending: bool, *tbls):
    """Remote threshold sweep over the conf_valid rows of the blocks
    (same `thresholds_by_key` kernel as the driver path)."""
    frames = []
    for t in tbls:
        # empty bucket partitions ship as zero-row blocks with NO
        # columns (observed first at the 2M-page scale) — skip them
        if t.num_rows == 0 or key not in t.schema.names:
            continue
        df = t.select([key, value, "flag", "which"]).to_pandas()
        frames.append(df[df["which"] == 0][[key, value, "flag"]])
    return thresholds_by_key(pd.concat(frames, ignore_index=True),
                             key=key, value=value, descending=descending)


def _train_serial_remote(tr, n_ent, n_rel, cfg, dev):
    return train_transe(tr, n_ent, n_rel, cfg, dev_triples=dev)


def _fusion_remote(path_emb, fusion_kwargs, *tbls):
    """Remote fusion training: assemble the valid conf table (object
    store, never the driver), canonical-sort, and run the SAME
    ``train_fusion`` (its local-SGD rounds spawn nested Ray tasks)."""
    tbls = [t for t in tbls
            if t.num_rows and "which" in t.schema.names]
    df = pa.concat_tables(tbls, promote_options="default").to_pandas()
    df = df[df["which"] == 0].drop(columns=["which"])
    df = df.sort_values(["h", "t", "r", "flag"], ignore_index=True)
    return train_fusion(df, path_emb=path_emb, **fusion_kwargs)


# ---------------------------------------------------------------------------
# Attach stages (map_batches; lookup state broadcast once)
# ---------------------------------------------------------------------------

def _attach_stages(left, fill: dict, right=None) -> "int | None":
    """Sub-exchange count for the attach joins (VERDICT r4 item 3): when
    the exchange's working set approaches the object store, stage the
    bucket exchange (`joins._staged_exchange`) so its ACTIVE working set
    is a fraction of the store — the whole-table sort otherwise
    livelocks at a 2 GiB store (BASELINE.md spill section).  None =
    unstaged (the plain single-exchange path).

    Sizing: left_join_fill WIDENS every left row with the full right
    schema (``fill``) before the union, so the exchange moves
    ~left_rows × joined-width bytes — NOT the raw input bytes (round 5
    measured the widened final path attach at ~4x its input bytes;
    sizing from inputs alone judged the livelocking join safe TWICE).
    ``left``/``right`` must be materialized (metadata-only count/size);
    an unmaterialized right contributes its fill-width only."""
    try:
        store = float(ray.cluster_resources().get(
            "object_store_memory", 0))
        sz = float(left.size_bytes() or 0)
        sz += float(left.count()) * 8.0 * max(1, len(fill))
        if right is not None:
            sz += float(right.size_bytes() or 0)
    except Exception:
        return None
    # the exchange does NOT get the whole store: the pipeline's other
    # materialized datasets (conf tables, CSR shards, path pivots, KGE
    # slabs) stay resident beside it, and the active set itself is
    # ~4x sz (tagged+widened copies, union queue, sort buffers,
    # outputs).  Empirically (round 5, 2 GiB store) a sz≈460 MB attach
    # wedged — the effective need is ≥5x sz of free store.  Tiers:
    # comfortable → plain streaming exchange; tight → stages=1 (one
    # exchange over MATERIALIZED union sides, removing the
    # producer-vs-queue wedge); over budget → N sub-exchanges.
    # GRAFT_JOIN_STAGES overrides when we return None (joins'
    # _resolve_stages reads it) — the operational escape hatch.
    if not store or not sz:
        return None
    import math

    if 8.0 * sz > store:
        n = min(16, max(2, math.ceil(8.0 * sz / store)))
    elif 4.0 * sz > store:
        n = 1
    else:
        n = None
    import os as _os

    if _os.environ.get("GRAFT_DEBUG_STAGES"):
        import sys as _sys

        print(f"[attach_stages] sz={sz / 1e6:.0f}MB "
              f"store={store / 1e9:.2f}GB -> stages={n}",
              file=_sys.stderr, flush=True)
    return n


def _add_keys(n_entities: int, n_relations: int):
    def fn(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        t_ = t.column("t").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        ht = (h << 32) | t_
        htr = pack_triples(h, t_, r, n_entities=n_entities,
                           n_relations=n_relations).view(np.int64)
        return (t.append_column("__ht", pa.array(ht))
                 .append_column("__htr", pa.array(htr)))
    return fn


def _gf_right(t: pa.Table) -> pa.Table:
    head = t.column("head").to_numpy().astype(np.int64)
    node = t.column("node").to_numpy().astype(np.int64)
    cols = {"__ht": (head << 32) | node,
            "pr": t.column("pr").to_numpy().astype(np.float64)}
    for c in GF_COLS:
        cols[c] = t.column(c).to_numpy().astype(np.float64)
    return pa.table({k: pa.array(v) for k, v in cols.items()})


class _TransVAttach:
    """+ transV (M5) — E/R broadcast once per actor/task."""

    def __init__(self, emb_bc: Broadcast):
        self.E, self.R = emb_bc.get()

    def __call__(self, t: pa.Table) -> pa.Table:
        v = transe_energy(self.E, self.R,
                          t.column("h").to_numpy(),
                          t.column("t").to_numpy(),
                          t.column("r").to_numpy())
        return t.append_column("transV", pa.array(v))


class _RRAttach:
    """+ rr_f / rr6_f (M7/M8) from the joined pr + hit indicator; the
    per-head thresholds arrive as a dense broadcast array."""

    def __init__(self, theta_bc: Broadcast):
        self.theta = theta_bc.get()

    def __call__(self, t: pa.Table) -> pa.Table:
        pr = t.column("pr").to_numpy()
        h = t.column("h").to_numpy()
        hit = t.column("__gf_hit").to_numpy() > 0
        f = rr_sigmoid_f(pr, self.theta[h])
        t = t.append_column("rr_f", pa.array(np.where(hit, f, RR_F_MISS)))
        t = t.append_column(
            "rr6_f", pa.array(np.where(hit, f, RR_MISS_SENTINEL[0])))
        return t.drop_columns(["pr", "__gf_hit"])


def _margin_attach(theta_r_arr: np.ndarray):
    def fn(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy()
        v = t.column("transV").to_numpy()
        return t.append_column("conf_transe", pa.array(theta_r_arr[r] - v))
    return fn


def _paths_pivot(n_entities: int, n_relations: int):
    """Ranked-path rows → one row per query with per-rank columns.

    In-block pivot: ``PathScore`` emits all of a query's ranks inside one
    output block and the rank filter is block-preserving, so each query's
    rows are never split across blocks (contract documented on
    `PathScore`); (query, rank) is unique."""

    def fn(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().astype(np.int64)
        t_ = t.column("t").to_numpy().astype(np.int64)
        r = t.column("r").to_numpy().astype(np.int64)
        htr = pack_triples(h, t_, r, n_entities=n_entities,
                           n_relations=n_relations).view(np.int64)
        rank = t.column("rank").to_numpy()
        score = t.column("score").to_numpy().astype(np.float64)
        plen = t.column("path_len").to_numpy().astype(np.int64)
        seqs = {
            c: t.column(c).combine_chunks().flatten().to_numpy()
            .reshape(-1, MAX_P).astype(np.int64)
            for c in ("p_src", "p_dst", "p_rel")
        }
        keys, inv = np.unique(htr, return_inverse=True)
        n = len(keys)
        cols: dict[str, np.ndarray] = {"__htr": keys}
        for k in range(N_BRANCH):
            sel = rank == k
            pos = inv[sel]
            pk = np.zeros(n, dtype=np.float64)
            pk[pos] = score[sel]
            has = np.zeros(n, dtype=np.float64)
            has[pos] = 1.0
            ln = np.zeros(n, dtype=np.int64)
            ln[pos] = plen[sel]
            cols[f"p{k}"] = pk
            cols[f"p{k}_has"] = has
            cols[f"p{k}_len"] = ln
            for col, pref in (("p_src", "s"), ("p_dst", "d"), ("p_rel", "r")):
                m = seqs[col][sel]
                for i in range(MAX_P):
                    out = np.zeros(n, dtype=np.int64)
                    out[pos] = m[:, i]
                    cols[f"p{k}_{pref}{i}"] = out
        return pa.table({k: pa.array(v) for k, v in cols.items()})
    return fn


def _path_fill() -> dict:
    fill: dict = {}
    for k in range(N_BRANCH):
        fill[f"p{k}"] = 0.0
        fill[f"p{k}_has"] = 0.0
        fill[f"p{k}_len"] = 0
        for pref in ("s", "d", "r"):
            for i in range(MAX_P):
                fill[f"p{k}_{pref}{i}"] = 0
    return fill


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------

def trust_pipeline_streaming(edges_ds, cfg=None) -> dict:
    """Edge Dataset (subj, pred, obj) → scored conf_test + metrics,
    with all triple/conf payloads object-store- or Dataset-resident."""
    import time as _time

    from .trust import TrustConfig, _StageThread, _dict_to_arr

    if cfg is None:
        cfg = TrustConfig()
    timings: dict[str, float] = {}
    _t = _time.time()

    def _lap(name: str) -> None:
        nonlocal _t
        timings[name] = round(_time.time() - _t, 3)
        _t = _time.time()

    # ---- vocab + id-map + remote assembly --------------------------------
    import os as _os

    edges_ds = edges_ds.materialize()
    # GRAFT_STREAM_FAST_MAX=0 forces the Dataset build (parity test)
    fast = edges_ds.count() <= int(_os.environ.get(
        "GRAFT_STREAM_FAST_MAX", STREAM_FAST_MAX))
    conf0_ref = q_ref = pairs_ref = heads_ref = None
    if fast:
        # ONE remote task replaces the build_vocab + id_map_edges +
        # labeled_examples Dataset executions (see _assemble_fast);
        # the driver receives only vocab tables + the count dict
        asm = ray.remote(_assemble_fast).options(num_returns=12)
        (ent_ref, rel_ref, tr_ref, dev_ref, test_ref, gold_ref,
         csr_ref, counts_ref, conf0_ref, q_ref, pairs_ref,
         heads_ref) = asm.remote(cfg.neg_seed, *edges_ds.to_arrow_refs())
        ent_df, rel_df, counts = ray.get(
            [ent_ref, rel_ref, counts_ref])
        n_ent, n_rel = len(ent_df), len(rel_df)
    else:
        ent_df, rel_df = build_vocab(edges_ds)
        n_ent, n_rel = len(ent_df), len(rel_df)
        ids_ds = id_map_edges(edges_ds, ent_df, rel_df).materialize()
        asm = ray.remote(_assemble_triples).options(num_returns=6)
        (tr_ref, dev_ref, test_ref, gold_ref, csr_ref,
         counts_ref) = asm.remote(n_ent, n_rel, *ids_ds.to_arrow_refs())
        counts = ray.get(counts_ref)
    _lap("vocab_ids_split")

    kge_workers = cfg.kge_workers
    if kge_workers is None:
        kge_workers = min(8, max(2, num_cpus() // 2))
    ptranse_workers = cfg.ptranse_workers
    if ptranse_workers is None:
        ptranse_workers = kge_workers
    fusion_workers = cfg.fusion_workers
    if fusion_workers is None:
        fusion_workers = kge_workers
    dev_arg = dev_ref if counts["valid"] else None

    # ---- trainers launch first (they gate the longest chains) ------------
    def _trainer(tcfg, workers):
        if workers > 1:
            return lambda: train_transe_distributed(
                tr_ref, n_ent, n_rel, tcfg, dev_triples=dev_arg,
                workers=workers, n_triples=counts["train"])
        return lambda: ray.get(ray.remote(_train_serial_remote).remote(
            tr_ref, n_ent, n_rel, tcfg, dev_arg))

    th_pt = _StageThread(_trainer(cfg.ptranse, ptranse_workers))
    th_kge = _StageThread(_trainer(cfg.transe, kge_workers))
    th_pt.start()
    th_kge.start()

    # ---- conf tables (Dataset-resident from here on) ----------------------
    from ..context import spread

    if fast:
        conf0 = spread(rd.from_arrow_refs([conf0_ref])).materialize()
        _lap("negative_sampling")
    else:
        _, valid_pos, test_pos = split_edges(ids_ds)
        gold_bc = Broadcast.from_ref(gold_ref)

        def _tag(which: int):
            def fn(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "which", pa.array(np.full(t.num_rows, which,
                                              dtype=np.int8)))
            return fn

        conf0 = (
            labeled_examples(valid_pos, gold_bc, n_entities=n_ent,
                             n_relations=n_rel, seed=cfg.neg_seed)
            .map_batches(_tag(0), batch_format="pyarrow")
            .union(
                labeled_examples(test_pos, gold_bc, n_entities=n_ent,
                                 n_relations=n_rel, seed=cfg.neg_seed + 1)
                .map_batches(_tag(1), batch_format="pyarrow"))
            .map_batches(_add_keys(n_ent, n_rel), batch_format="pyarrow")
            .materialize())
        _lap("negative_sampling")

        meta = ray.remote(_conf_meta).options(num_returns=3)
        q_ref, pairs_ref, heads_ref = meta.remote(
            n_ent, n_rel, *conf0.to_arrow_refs())
    heads = ray.get(heads_ref)
    heads_ds = rd.from_pandas(pd.DataFrame({"head": heads}))

    # ---- path enumeration starts now (CSR-only; overlaps both trainers) --
    th_enum = _StageThread(lambda: enumerate_paths_ds(
        heads, Broadcast.from_ref(csr_ref),
        max_paths=cfg.path_max_paths).materialize())
    th_enum.start()

    # ---- graph features + attach join -------------------------------------
    def run_gf_join():
        gf_right = graph_features_for_heads(
            heads_ds, Broadcast.from_ref(csr_ref), depth=cfg.subgraph_depth,
            max_nodes=cfg.subgraph_max_nodes,
            pairs=Broadcast.from_ref(pairs_ref), batch_size=96,
        ).map_batches(_gf_right, batch_format="pyarrow")
        return left_join_fill(conf0, gf_right, on="__ht", fill=GF_FILL,
                              hit_col="__gf_hit", coalesce=True,
                              stages=_attach_stages(conf0, GF_FILL)
                              ).materialize()

    th_gf = _StageThread(run_gf_join)
    th_gf.start()

    conf1 = th_gf.join_result()
    timings["graph_features_wall"] = th_gf.seconds
    _lap("rr_join")

    # per-head PR thresholds (A4) from the valid rows, computed remotely
    theta_h = ray.get(ray.remote(_sweep_remote).remote(
        "h", "pr", True, *conf1.to_arrow_refs()))
    theta_h_arr = _dict_to_arr(theta_h, n_ent, 0.5)
    _lap("theta_h_sweep")

    E, R = th_kge.join_result()
    timings["kge_train_wall"] = th_kge.seconds
    _lap("kge_training")

    conf2 = (conf1.map_batches(_TransVAttach,
                               fn_constructor_kwargs={
                                   "emb_bc": Broadcast((E, R))},
                               batch_format="pyarrow",
                               concurrency=(1, max(2, num_cpus() // 2)))
             .map_batches(_RRAttach,
                          fn_constructor_kwargs={
                              "theta_bc": Broadcast(theta_h_arr)},
                          batch_format="pyarrow",
                          concurrency=(1, max(2, num_cpus() // 2)))
             .materialize())
    theta_r = ray.get(ray.remote(_sweep_remote).remote(
        "r", "transV", False, *conf2.to_arrow_refs()))
    theta_r_arr = _dict_to_arr(theta_r, n_rel, 0.0)
    conf3 = conf2.map_batches(_margin_attach(theta_r_arr),
                              batch_format="pyarrow")
    _lap("transe_features")

    # ---- ranked paths + attach join ---------------------------------------
    Ep, Rp = th_pt.join_result()
    timings["ptranse_wall"] = th_pt.seconds
    enum_ds = th_enum.join_result()
    timings["path_enum_wall"] = th_enum.seconds
    import pyarrow.compute as pc

    # batch_size=None: whole blocks, no re-batching — the pivot's in-block
    # contract needs every rank row of a query in ONE batch (PathScore
    # emits them together; the default 1024-row re-batch would split them)
    paths_right = (score_paths_for_queries(
        enum_ds, Broadcast.from_ref(q_ref), Ep, Rp,
        keep_top=cfg.path_keep_top)
        .map_batches(lambda t: t.filter(pc.less(t.column("rank"),
                                                N_BRANCH)),
                     batch_format="pyarrow", batch_size=None)
        .map_batches(_paths_pivot(n_ent, n_rel), batch_format="pyarrow",
                     batch_size=None)
        .materialize())
    final = (left_join_fill(conf3, paths_right, on="__htr",
                            fill=_path_fill(), combine_right_sum=True,
                            coalesce=True,
                            stages=_attach_stages(conf2, _path_fill(),
                                                  paths_right))
             .map_batches(lambda t: t.drop_columns(["__ht", "__htr"]),
                          batch_format="pyarrow")
             .materialize())
    _lap("path_features")

    # ---- fusion train (remote task over the valid blocks) + score --------
    model = ray.get(ray.remote(_fusion_remote).remote(
        (Ep, Rp),
        {"batch_size": cfg.fusion_batch_size, "epochs": cfg.fusion_epochs,
         "workers": fusion_workers,
         "branch_mode": cfg.fusion_branch_mode,
         "branch_reg": cfg.fusion_branch_reg},
        *final.to_arrow_refs()))
    _lap("fusion_train")

    model_bc = Broadcast(model)
    from functools import partial

    scored_ds = (final
                 .map_batches(lambda t: t.filter(
                     pc.equal(t.column("which"), pa.scalar(1)))
                     .drop_columns(["which"]),
                     batch_format="pyarrow")
                 .map_batches(partial(score_fusion_task, model_bc=model_bc),
                              batch_format="pyarrow", batch_size=4096))
    scored = scored_ds.to_pandas().sort_values(["h", "t", "r", "flag"],
                                               ignore_index=True)
    _lap("fusion_score")

    conf = scored["conf"].to_numpy()
    flags = scored["flag"].to_numpy()
    sweep = pr_sweep(conf, flags)
    conf_valid = (final.map_batches(
        lambda t: t.filter(pc.equal(t.column("which"), pa.scalar(0)))
        .drop_columns(["which"]), batch_format="pyarrow")
        .to_pandas().sort_values(["h", "t", "r", "flag"],
                                 ignore_index=True))
    return {
        "ent_vocab": ent_df,
        "rel_vocab": rel_df,
        "conf_valid": conf_valid,
        "n_triples": counts["total"],
        "theta_r": theta_r,
        "theta_h": theta_h,
        "scored_test": scored,
        "scored_ds": scored_ds,
        "accuracy": accuracy(conf, flags),
        "pr_sweep": sweep,
        "max_f1": float(sweep["f1"].max()),
        "embeddings": (E, R),
        "timings": timings,
    }
