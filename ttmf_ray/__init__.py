"""ttmf_ray — a Ray-Data-native knowledge-graph construction and
triple-trustworthiness engine with the capabilities of actapia/TTMF
(WWW 2019), rebuilt from scratch on ``ray.data.Dataset`` pipelines.

Layout:
    sources/    synthetic Common-Crawl-style page corpus + relational readers
    stages/     map_batches stages (extract, triples, canonicalize, dedup,
                text analysis, ANN, graph features, path search, media stubs)
    functions/  pure/driver-side functions (vocab, sampling, TransE, fusion,
                eval) — numpy-vectorized, seeded, deterministic
    pipelines/  end-to-end DAGs (phase A kg_construct, phase B trust,
                relational oracle-checked pipelines)
    state/      per-partition manifest + resumable partitioned parquet writes
"""

__version__ = "0.1.0"
