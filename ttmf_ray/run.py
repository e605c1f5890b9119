"""CLI entry point — the ``ray job submit`` surface (SURVEY.md S13).

Usage (single node; on a cluster submit exactly this command):

    ray job submit --working-dir . -- \
        python -m ttmf_ray.run construct --pages /path/pages_parquet \
            --out /tmp/edges --shards 16
    python -m ttmf_ray.run trust --edges /tmp/edges_parquet --out /tmp/scores
    python -m ttmf_ray.run e2e --sf-dir /root/testdata/sf0.001 --out /tmp/run

Owns the Ray session (guarded init), unlike the library modules.
"""

from __future__ import annotations

import argparse
import json


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        # RAY_GRAFT_ADDRESS=auto (or a host:port) attaches the CLI to a
        # RUNNING cluster — the `ray job submit` execution model, where
        # the job driver joins the cluster that launched it.  Default
        # stays a self-contained local session (num_cpus applies only
        # there; an attached cluster owns its own resources).
        import os as _os

        addr = _os.environ.get("RAY_GRAFT_ADDRESS", "local")
        if addr == "local" and num_cpus:
            kw["num_cpus"] = num_cpus
        if addr != "local":
            # the RAY_ADDRESS env var silently OVERRIDES the address=
            # parameter (this sandbox presets RAY_ADDRESS=local) — pin
            # it so the attach actually attaches
            _os.environ["RAY_ADDRESS"] = addr
        ray.init(address=addr, **kw)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ttmf_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("construct", help="phase A: pages parquet → edges")
    p1.add_argument("--pages", required=True)
    p1.add_argument("--out", required=True)
    p1.add_argument("--extractor-gpus", type=float, default=None,
                    help="GPUs reserved per extractor actor (GPU clusters)")

    p2 = sub.add_parser("trust", help="phase B: edges parquet → scores")
    p2.add_argument("--edges", required=True)
    p2.add_argument("--out", required=True)
    p2.add_argument("--scorer-gpus", type=float, default=None,
                    help="GPUs reserved per fusion-scorer actor")
    p2.add_argument("--resumable", action="store_true",
                    help="sharded scored output + manifest + stage "
                         "checkpoints (re-submit with the same --out to "
                         "resume)")
    p2.add_argument("--streaming", action="store_true",
                    help="object-store/Dataset-resident phase B "
                         "(trust_streaming) — the beyond-driver-memory "
                         "scale path; feature-identical results")
    p2.add_argument("--config", default=None,
                    help="reference-style KGE .properties file "
                         "(KGE_config_template.properties keys: DIMENSION,"
                         " EPOCHES, MARGIN, STEP_SIZE, NEG_SAMPLE_COUNT,"
                         " BIAS) applied to both trainers")

    p3 = sub.add_parser("e2e", help="synthetic corpus → edges → scores")
    p3.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p3.add_argument("--out", required=True)

    p4 = sub.add_parser("kmeans", help="embedding parquet → cluster "
                                       "assignments parquet")
    p4.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id, embedding list<float>)")
    p4.add_argument("--out", required=True)
    p4.add_argument("--k", type=int, default=8)
    p4.add_argument("--iters", type=int, default=4)

    p5 = sub.add_parser("dedup", help="docs parquet → duplicate pairs "
                                      "(MinHash-LSH + Jaccard verify)")
    p5.add_argument("--docs", required=True,
                    help="parquet with (doc_id, text)")
    p5.add_argument("--out", required=True)
    p5.add_argument("--threshold", type=float, default=0.5)

    p6 = sub.add_parser("curate", help="docs parquet → cleaned + "
                                       "shuffle-exported training shards")
    p6.add_argument("--docs", required=True,
                    help="parquet with (doc_id, text, source)")
    p6.add_argument("--out", required=True)
    p6.add_argument("--shards", type=int, default=8)

    p7 = sub.add_parser("bpe", help="docs parquet → learned BPE merges")
    p7.add_argument("--docs", required=True)
    p7.add_argument("--out", required=True, help="merges JSON path")
    p7.add_argument("--merges", type=int, default=32)

    p8 = sub.add_parser("index", help="docs parquet → stored positional "
                                      "inverted index (+ optional probe)")
    p8.add_argument("--docs", required=True)
    p8.add_argument("--out", required=True, help="index directory")
    p8.add_argument("--probe", default=None,
                    help="space-separated phrase to search after building")

    p9 = sub.add_parser("graph", help="(a, b) pair parquet → triangle "
                                      "stats or k-core")
    p9.add_argument("--pairs", required=True,
                    help="parquet with int64 columns a, b (a < b)")
    p9.add_argument("--out", required=True)
    p9.add_argument("--kcore", type=int, default=None,
                    help="emit the maximal k-core instead of triangles")

    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)

    import ray
    import ray.data as rd

    from .context import tune_data_context

    tune_data_context(target_max_block_size=2 * 1024 * 1024)

    if args.cmd == "construct":
        from .pipelines.kg_construct import (edges_from_mentions,
                                             mentions_from_pages)
        from .stages.canonicalize import canonicalize_inline_batch
        from .stages.dedup import distinct_rows

        mentions = mentions_from_pages(
            rd.read_parquet(args.pages), num_gpus=args.extractor_gpus
        ).map_batches(canonicalize_inline_batch, batch_format="pyarrow")
        edges = distinct_rows(
            mentions.map_batches(
                lambda b: b.select(["subj", "pred", "obj"]),
                batch_format="pyarrow"),
            ["subj", "pred", "obj"])
        edges.write_parquet(args.out)
        print(json.dumps({"edges": edges.count(), "out": args.out}))
    elif args.cmd == "trust":
        from .pipelines.trust import (TrustConfig, trust_pipeline,
                                      trust_scores_resumable)

        cfg = TrustConfig(scorer_num_gpus=args.scorer_gpus,
                          streaming=args.streaming)
        if args.config:
            from .functions.config import transe_config_from_properties

            cfg = TrustConfig(
                scorer_num_gpus=args.scorer_gpus,
                streaming=args.streaming,
                transe=transe_config_from_properties(args.config),
                ptranse=transe_config_from_properties(args.config,
                                                      loss="logistic"),
            )
        if args.resumable:
            r = trust_scores_resumable(rd.read_parquet(args.edges),
                                       args.out, cfg)
            print(json.dumps(r))
        else:
            res = trust_pipeline(rd.read_parquet(args.edges), cfg)
            rd.from_pandas(res["scored_test"]).write_parquet(args.out)
            print(json.dumps({
                "scored": len(res["scored_test"]),
                "accuracy": round(res["accuracy"], 4),
                "max_f1": round(res["max_f1"], 4),
                "out": args.out,
            }))
    elif args.cmd == "e2e":
        from .pipelines.kg_construct import kg_construct
        from .pipelines.trust import TrustConfig, trust_pipeline
        from .functions.transe import TransEConfig
        from .sources.pages import ensure_pages_parquet, spec_for_sf_dir

        spec = spec_for_sf_dir(args.sf_dir)
        pages = ensure_pages_parquet(spec)
        edges = kg_construct(rd.read_parquet(pages)).materialize()
        edges.write_parquet(args.out + "/edges")
        cfg = TrustConfig(transe=TransEConfig(dim=32, epochs=30, lr=0.02))
        res = trust_pipeline(edges, cfg)
        rd.from_pandas(res["scored_test"]).write_parquet(args.out + "/scores")
        print(json.dumps({
            "pages": spec.n_pages,
            "edges": edges.count(),
            "scored": len(res["scored_test"]),
            "accuracy": round(res["accuracy"], 4),
            "out": args.out,
        }))
    elif args.cmd == "kmeans":
        import numpy as np

        from .stages.cluster import kmeans

        assign_ds, C = kmeans(rd.read_parquet(args.embeddings),
                              k=args.k, n_iter=args.iters)
        assign_ds.write_parquet(args.out)
        np.savetxt(args.out.rstrip("/") + "_centroids.txt", C, fmt="%.9g")
        print(json.dumps({"k": args.k, "iters": args.iters,
                          "out": args.out}))
    elif args.cmd == "dedup":
        from .stages.dedup import MinHashLSH, candidate_pairs, \
            verify_pairs_join

        from .context import auto_pool

        ds = rd.read_parquet(args.docs).materialize()
        buckets = ds.map_batches(
            MinHashLSH,
            fn_constructor_kwargs={"id_col": "doc_id", "text_col": "text"},
            batch_format="pyarrow", batch_size=2048,
            concurrency=auto_pool(),
        )
        pairs, cap_stats = candidate_pairs(buckets, with_stats=True)
        verified = verify_pairs_join(
            pairs, ds, id_col="doc_id",
            text_col="text", threshold=args.threshold)
        verified.write_parquet(args.out)
        # "no silent caps": surface the hot-bucket chain-fallback counter
        print(json.dumps({"threshold": args.threshold, "out": args.out,
                          "n_buckets": int(cap_stats["n_buckets"].iloc[0]),
                          "n_capped_buckets":
                              int(cap_stats["n_capped"].iloc[0]),
                          "max_bucket":
                              int(cap_stats["max_bucket"].iloc[0])}))
    elif args.cmd == "curate":
        import pyarrow as pa

        from .functions.joins import hash_join
        from .stages.curation import clean_corpus, export_shuffled

        ds = rd.read_parquet(args.docs).materialize()
        weights = {s: 1.0 for s in ds.unique("source")}
        flagged = clean_corpus(ds, weights, mix_seed=97)
        kept_ids = flagged.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("keep"), 1))
            .select(["doc_id"]),
            batch_format="pyarrow")
        kept = hash_join(ds, kept_ids, on="doc_id")
        r = export_shuffled(kept, args.out, n_shards=args.shards)
        print(json.dumps(r))
    elif args.cmd == "bpe":
        from .stages.bpe import learn_bpe

        merges = learn_bpe(rd.read_parquet(args.docs), k=args.merges)
        merges.to_json(args.out, orient="records", lines=True)
        print(json.dumps({"merges": len(merges), "out": args.out}))
    elif args.cmd == "index":
        from .stages.invindex import build_positional_index, phrase_search

        build_positional_index(rd.read_parquet(args.docs), args.out)
        info = {"out": args.out}
        if args.probe:
            hits = phrase_search(args.out, args.probe.split())
            info["probe"] = args.probe
            info["hits"] = len(hits)
        print(json.dumps(info))
    elif args.cmd == "graph":
        from .stages.dedup import distinct_rows
        from .stages.graph import kcore, triangle_stats

        pairs = distinct_rows(rd.read_parquet(args.pairs), ["a", "b"])
        if args.kcore:
            out = kcore(pairs, k=args.kcore)
        else:
            out = triangle_stats(pairs)
        rd.from_pandas(out).write_parquet(args.out)
        print(json.dumps({"rows": len(out), "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
