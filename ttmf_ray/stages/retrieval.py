"""Corpus retrieval / divergence operators: TF-IDF top terms, BM25
ranking against a broadcast query, MOSS-style winnowing fingerprints,
and per-source unigram KL divergence.

These extend the text-analysis surface (SURVEY.md §2.9) with the
standard retrieval-side primitives of a training-data pipeline: picking
representative terms per document (TF-IDF), scoring documents against a
probe query (BM25, the Robertson/Sparck-Jones formula in its Lucene
ln(1 + (N-df+.5)/(df+.5)) form), plagiarism-robust document
fingerprinting (Schleimer et al., SIGMOD 2003 winnowing — the rightmost
minimum of each hash window), and distribution drift per source
(KL(p_source ‖ p_corpus) over unigrams).

Distributed shapes (all stream; nothing but token-count rows shuffles):
  * TF-IDF — one (token, df) combiner pass + ONE vocab-sized groupby,
    model broadcast once, then stateless per-batch scoring with an
    in-batch vectorized top-k (a doc's tokens never leave its batch).
    At web scale the df table outgrows a broadcast long before the
    corpus does; the fallback is a hash join of (doc, token, tf) rows
    against the df table on the token key — same outputs, one shuffle.
  * BM25 — per-doc (dl, tf per query term) rows materialized once
    (ints only, ~16 B × |terms| per doc), a constant-size stats reduce,
    then broadcast-stats scoring with per-batch partial top-k; only
    k rows per batch reach the driver merge.
  * Winnowing — per-batch kernel over the positional n-gram hashes of
    stages/curation.py:_window_hashes (sliding-window minimum via a
    stride view; rightmost tie via argmin over the reversed window).
  * KL — (source, token) count combiner → one groupby, token totals
    broadcast back, per-row contributions, tiny per-source sum.

Scoring ties are broken on ROUND(score, 6) then integer/string keys so
the DuckDB mirrors rank identically (the quantize-the-comparison trick
of docs_lm_perplexity; CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast, auto_pool

__all__ = ["tfidf_top_terms", "bm25_topk", "winnow_fingerprints",
           "source_kl"]


def _words(col):
    """(flat lowercase `[0-9a-z_]+` words, doc index, n_docs) — the
    word class shared by top_tokens / DSIR / the dedup shingles."""
    from .classify import _doc_words

    return _doc_words(col)


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def _df_table(docs_ds, text_col: str) -> pd.DataFrame:
    """(token, df) over the corpus — distinct (doc, token) per batch
    collapses to one row per token before the single vocab-sized
    shuffle (same combiner as curation.top_tokens, without the limit)."""

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _words(t.column(text_col))
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat)
        key = doc_idx * np.int64(len(uniq)) + codes
        ucodes = np.unique(key) % len(uniq)
        toks, dfc = np.unique(ucodes, return_counts=True)
        return pa.table({"token": pa.array(uniq[toks], pa.string()),
                         "df": pa.array(dfc.astype(np.int64))})

    df = (docs_ds.map_batches(partial, batch_format="pyarrow")
          .groupby("token").sum("df")
          .to_pandas().rename(columns={"sum(df)": "df"}))
    order = np.argsort(df["token"].to_numpy())
    return pd.DataFrame({"token": df["token"].to_numpy()[order],
                         "df": df["df"].to_numpy()[order].astype(np.int64)})


class _TfidfScorer:
    """Actor stage: docs → top-k (doc_id, token, tf, df, tfidf) rows.

    idf = ln((1+N)/(1+df)) + 1 (the smoothed sklearn form); rank by
    (round(tf·idf, 6) DESC, tf DESC, token ASC) so the SQL mirror's
    row_number() selects the identical rows.
    """

    def __init__(self, model_bc: Broadcast, *, k: int, n_docs: int,
                 id_col: str, text_col: str):
        m = model_bc.get()
        self.tokens, self.df = m["tokens"], m["df"]
        self.k, self.n_docs = k, n_docs
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _words(batch.column(self.text_col))
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "tfidf": pa.array([], pa.float64())})
        if not len(flat):
            return empty
        codes, uniq = pd.factorize(flat)
        key = doc_idx * np.int64(len(uniq)) + codes
        ukey, tf = np.unique(key, return_counts=True)
        d_loc = (ukey // len(uniq)).astype(np.int64)
        t_loc = (ukey % len(uniq)).astype(np.int64)
        # df lookup against the sorted broadcast vocab
        pos = np.clip(np.searchsorted(self.tokens, uniq), 0,
                      max(len(self.tokens) - 1, 0))
        hit = (self.tokens[pos] == uniq) if len(self.tokens) else \
            np.zeros(len(uniq), bool)
        udf = np.where(hit, self.df[pos] if len(self.df) else 0, 0)
        dfv = udf[t_loc].astype(np.int64)
        idf = np.log((1.0 + self.n_docs) / (1.0 + dfv)) + 1.0
        score = np.round(tf.astype(np.float64) * idf, 6)
        toks = uniq[t_loc]
        order = np.lexsort((toks, -tf, -score, d_loc))
        d_s = d_loc[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        rank = np.arange(len(d_s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(d_s)]))
        keep = order[rank < self.k]
        ids = np.asarray(batch.column(self.id_col), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids[d_loc[keep]]),
            "token": pa.array(toks[keep], pa.string()),
            "tf": pa.array(tf[keep].astype(np.int64)),
            "df": pa.array(dfv[keep]),
            "tfidf": pa.array(score[keep], pa.float64())})


def tfidf_top_terms(docs_ds, *, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text", concurrency=None):
    """Top-``k`` TF-IDF terms per document.  Returns a Dataset of
    (doc_id, token, tf, df, tfidf) rows, ≤ k per doc."""
    dft = _df_table(docs_ds, text_col)
    n_docs = docs_ds.count()
    bc = Broadcast({"tokens": dft["token"].to_numpy(),
                    "df": dft["df"].to_numpy()})
    return docs_ds.map_batches(
        _TfidfScorer, batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
        fn_constructor_kwargs={"model_bc": bc, "k": k, "n_docs": n_docs,
                               "id_col": id_col, "text_col": text_col})


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def bm25_topk(docs_ds, terms: list[str], *, k: int = 20, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> pd.DataFrame:
    """Top-``k`` documents by BM25 against the fixed query ``terms``.

    Two streaming passes over a materialized per-doc int table; the
    score is accumulated TERM BY TERM in list order (a fixed float64
    chain the SQL mirror reproduces left-associatively, so equal inputs
    give bitwise-equal scores in both engines).
    """
    terms = list(terms)
    m = len(terms)

    def per_doc(t: pa.Table) -> pa.Table:
        flat, doc_idx, n = _words(t.column(text_col))
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        cols = {"doc_id": pa.array(ids),
                "dl": pa.array(np.bincount(doc_idx, minlength=n)
                               .astype(np.int64))}
        for j, term in enumerate(terms):
            sel = flat == term
            cols[f"tf{j}"] = pa.array(
                np.bincount(doc_idx[sel], minlength=n).astype(np.int64))
        return pa.table(cols)

    d1 = docs_ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([t.num_rows], pa.int64()),
               "sum_dl": pa.array(
                   [int(np.asarray(t.column("dl")).sum())], pa.int64())}
        for j in range(m):
            out[f"df{j}"] = pa.array(
                [int((np.asarray(t.column(f"tf{j}")) > 0).sum())],
                pa.int64())
        return pa.table(out)

    stats = (d1.map_batches(stats_partial, batch_format="pyarrow")
             .to_pandas().sum())
    n_docs = int(stats["n"])
    avgdl = float(stats["sum_dl"]) / n_docs if n_docs else 1.0
    idf = [float(np.log(1.0 + (n_docs - int(stats[f"df{j}"]) + 0.5)
                        / (int(stats[f"df{j}"]) + 0.5)))
           for j in range(m)]

    def score_partial(t: pa.Table) -> pa.Table:
        dl = np.asarray(t.column("dl"), dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(t.num_rows, np.float64)
        for j in range(m):          # fixed order → bitwise SQL parity
            tf = np.asarray(t.column(f"tf{j}"), dtype=np.float64)
            score = score + idf[j] * (tf * (k1 + 1.0)) / (tf + norm)
        score = np.round(score, 6)
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "dl": pa.array(np.asarray(t.column("dl"))[order]),
                         "score": pa.array(score[order], pa.float64())})

    parts = (d1.map_batches(score_partial, batch_format="pyarrow")
             .to_pandas())
    out = parts.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    return out.astype({"doc_id": np.int64, "dl": np.int64}) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------

def winnow_fingerprints(docs_ds, *, ngram: int = 3, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing (Schleimer et al. 2003): over the positional word
    ``ngram`` hashes, keep the minimum of every ``window`` consecutive
    hashes, rightmost position on ties; distinct (doc, pos, fp) rows.

    Guarantees: any shared substring of ≥ window+ngram-1 tokens yields
    at least one shared fingerprint.  Pure per-batch kernel (a doc's
    hashes never cross batches) — no shuffle at all.
    """
    from .curation import _window_hashes

    def per_batch(t: pa.Table) -> pa.Table:
        flat, didx, n, starts, h = _window_hashes(
            t.column(text_col), ngram)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
        if len(h) < window:
            return empty
        # token position of each n-gram start within its own doc
        first = np.zeros(n, np.int64)
        ud, fi = np.unique(didx, return_index=True)
        first[ud] = fi
        kdoc = didx[starts]
        p = starts - first[kdoc]
        W = np.lib.stride_tricks.sliding_window_view(h, window)
        valid = kdoc[:len(kdoc) - window + 1] == kdoc[window - 1:]
        if not valid.any():
            return empty
        mins = W.min(axis=1)
        ra = (window - 1) - np.argmin(W[:, ::-1], axis=1)
        sel = np.flatnonzero(valid)
        rows = np.stack([kdoc[sel], p[sel + ra[sel]], mins[sel]], axis=1)
        rows = np.unique(rows, axis=0)
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids[rows[:, 0]]),
                         "pos": pa.array(rows[:, 1]),
                         "fp": pa.array(rows[:, 2])})

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-source unigram KL divergence
# ---------------------------------------------------------------------------

def source_kl(docs_ds, *, source_col: str = "source",
              text_col: str = "text") -> pd.DataFrame:
    """KL(p_source ‖ p_corpus) over unigram word distributions.

    One (source, token) combiner pass → one groupby over the packed
    key; global token totals come back as a vocab-sized broadcast, the
    per-row contributions stream, and only |sources| rows land on the
    driver.  (At web scale with per-domain sources the aggregated table
    is |S|·|V| rows — it stays a Dataset throughout; only the final
    per-source sums collect.)
    """
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _words(t.column(text_col))
        if not len(flat):
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        src = np.asarray(t.column(source_col)).astype(str)
        s_codes, s_uniq = pd.factorize(src)
        t_codes, t_uniq = pd.factorize(flat)
        key = s_codes[doc_idx] * np.int64(len(t_uniq)) + t_codes
        ukey, cnt = np.unique(key, return_counts=True)
        sname = s_uniq[(ukey // len(t_uniq)).astype(np.int64)]
        tname = t_uniq[(ukey % len(t_uniq)).astype(np.int64)]
        packed = np.char.add(np.char.add(sname.astype(str), "\x1f"),
                             tname.astype(str))
        return pa.table({"key": pa.array(packed, pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("key").sum("cnt")).materialize()

    def split(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column("key")).astype(str)
        cnt = np.asarray(t.column("sum(cnt)"), dtype=np.int64)
        parts = np.char.partition(keys, "\x1f")
        return pa.table({"source": pa.array(parts[:, 0], pa.string()),
                         "token": pa.array(parts[:, 2], pa.string()),
                         "cnt": pa.array(cnt)})

    rows = agg.map_batches(split, batch_format="pyarrow").materialize()

    gtok = rows.groupby("token").sum("cnt").to_pandas()
    g_order = np.argsort(gtok["token"].to_numpy())
    g_tokens = gtok["token"].to_numpy()[g_order]
    g_cnt = gtok["sum(cnt)"].to_numpy()[g_order].astype(np.float64)
    g_tot = float(g_cnt.sum())
    stot = rows.groupby("source").sum("cnt").to_pandas()
    s_order = np.argsort(stot["source"].to_numpy())
    s_sources = stot["source"].to_numpy()[s_order]
    s_cnt = stot["sum(cnt)"].to_numpy()[s_order].astype(np.float64)
    bc = Broadcast({"g_tokens": g_tokens, "g_cnt": g_cnt, "g_tot": g_tot,
                    "s_sources": s_sources, "s_cnt": s_cnt})

    class Contrib:
        def __init__(self, model_bc: Broadcast):
            self.m = model_bc.get()

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.m
            src = np.asarray(t.column("source")).astype(str)
            tok = np.asarray(t.column("token")).astype(str)
            cnt = np.asarray(t.column("cnt"), dtype=np.float64)
            si = np.searchsorted(m["s_sources"], src)
            ti = np.searchsorted(m["g_tokens"], tok)
            ps = cnt / m["s_cnt"][si]
            pg = m["g_cnt"][ti] / m["g_tot"]
            contrib = ps * np.log(ps / pg)
            return pa.table({"source": pa.array(src, pa.string()),
                             "contrib": pa.array(contrib, pa.float64()),
                             "cnt": t.column("cnt")})

    out = (rows.map_batches(Contrib, batch_format="pyarrow",
                            concurrency=auto_pool(0.5),
                            fn_constructor_kwargs={"model_bc": bc})
           .groupby("source")
           .aggregate(Count(alias_name="n_tokens"),
                      Sum("cnt", alias_name="n_words"),
                      Sum("contrib", alias_name="kl"))
           .to_pandas())
    out["kl"] = out["kl"].round(6)
    return out.astype({"n_tokens": np.int64, "n_words": np.int64}) \
        .sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def pmi_collocations(docs_ds, *, k: int = 50, min_count: int = 5,
                     text_col: str = "text") -> pd.DataFrame:
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information: PMI(a,b) = ln((c_ab/T) / ((c_a/W)·(c_b/W))) over word
    occurrences, bigrams with < ``min_count`` occurrences dropped.

    ONE pass over the corpus emits tagged (kind, key, cnt) combiner rows
    (kind 0 = unigram, 1 = bigram) → one groupby; unigram totals come
    back as a vocab-sized broadcast; only the top-k rows reach the
    driver.  Rank on (round(pmi,6) DESC, a, b) — the SQL row ordering.
    """
    def partial(t: pa.Table) -> pa.Table:
        flat, didx, _ = _words(t.column(text_col))
        if not len(flat):
            return pa.table({"kind": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat)
        utok, ucnt = np.unique(codes, return_counts=True)
        adj = didx[:-1] == didx[1:] if len(flat) > 1 else \
            np.zeros(0, bool)
        bg = codes[:-1][adj].astype(np.int64) * len(uniq) + codes[1:][adj]
        ubg, bcnt = np.unique(bg, return_counts=True)
        u = uniq.astype(str)
        bkey = np.char.add(np.char.add(u[(ubg // len(uniq))], "\x1f"),
                           u[(ubg % len(uniq))])
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(utok), np.int64),
                                   np.ones(len(ubg), np.int64)]),
            "key": pa.array(np.r_[u[utok], bkey], pa.string()),
            "cnt": pa.array(np.r_[ucnt, bcnt].astype(np.int64))})

    def pack(t: pa.Table) -> pa.Table:
        kind = np.asarray(t.column("kind"), dtype=np.int64).astype(str)
        key = np.asarray(t.column("key")).astype(str)
        return pa.table({"kk": pa.array(np.char.add(
            np.char.add(kind, "\x1e"), key), pa.string()),
            "cnt": t.column("cnt")})

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .map_batches(pack, batch_format="pyarrow")
           .groupby("kk").sum("cnt")).materialize()

    def unpacked(t: pa.Table) -> pa.Table:
        kk = np.asarray(t.column("kk")).astype(str)
        parts = np.char.partition(kk, "\x1e")
        return pa.table({"kind": pa.array(parts[:, 0], pa.string()),
                         "key": pa.array(parts[:, 2], pa.string()),
                         "cnt": t.column("sum(cnt)")})

    rows = agg.map_batches(unpacked, batch_format="pyarrow").materialize()
    udf = rows.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t.column("kind")).astype(str) == "0")),
        batch_format="pyarrow").to_pandas()
    order = np.argsort(udf["key"].to_numpy())
    u_tok = udf["key"].to_numpy()[order]
    u_cnt = udf["cnt"].to_numpy()[order].astype(np.float64)
    w_tot = float(u_cnt.sum())
    bsum = rows.map_batches(
        lambda t: pa.table({"s": pa.array([int(np.asarray(
            t.column("cnt"))[np.asarray(t.column("kind")).astype(str)
                             == "1"].sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    t_tot = float(bsum["s"].sum())
    bc = Broadcast({"u_tok": u_tok, "u_cnt": u_cnt,
                    "w_tot": w_tot, "t_tot": t_tot})

    class Pmi:
        def __init__(self, model_bc: Broadcast, *, k: int, min_count: int):
            self.m = model_bc.get()
            self.k, self.min_count = k, min_count

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.m
            kind = np.asarray(t.column("kind")).astype(str)
            sel = (kind == "1") & (np.asarray(t.column("cnt"))
                                   >= self.min_count)
            key = np.asarray(t.column("key")).astype(str)[sel]
            cnt = np.asarray(t.column("cnt"), dtype=np.int64)[sel]
            if not len(key):
                return pa.table({"a": pa.array([], pa.string()),
                                 "b": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64()),
                                 "pmi": pa.array([], pa.float64())})
            parts = np.char.partition(key, "\x1f")
            a, b = parts[:, 0], parts[:, 2]
            ca = m["u_cnt"][np.searchsorted(m["u_tok"], a)]
            cb = m["u_cnt"][np.searchsorted(m["u_tok"], b)]
            pmi = np.round(np.log((cnt / m["t_tot"])
                                  / ((ca / m["w_tot"])
                                     * (cb / m["w_tot"]))), 6)
            order = np.lexsort((b, a, -pmi))[:self.k]
            return pa.table({"a": pa.array(a[order], pa.string()),
                             "b": pa.array(b[order], pa.string()),
                             "cnt": pa.array(cnt[order]),
                             "pmi": pa.array(pmi[order], pa.float64())})

    parts = rows.map_batches(
        Pmi, batch_format="pyarrow", concurrency=auto_pool(0.5),
        fn_constructor_kwargs={"model_bc": bc, "k": k,
                               "min_count": min_count}).to_pandas()
    out = parts.sort_values(["pmi", "a", "b"],
                            ascending=[False, True, True]).head(k)
    return out.astype({"cnt": np.int64}).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ cosine via reciprocal rank fusion
# ---------------------------------------------------------------------------

def hybrid_rrf(docs_ds, emb_ds, terms, qvec: np.ndarray, *,
               n_list: int = 50, k: int = 20, kr: int = 60,
               id_col: str = "doc_id", text_col: str = "text",
               vec_id_col: str = "vec_id",
               vec_col: str = "embedding") -> pd.DataFrame:
    """Reciprocal rank fusion (Cormack et al., SIGIR 2009) of the BM25
    top-``n_list`` and cosine top-``n_list`` lists:

        rrf(d) = Σ_lists 1 / (kr + rank_list(d))      (absent → 0)

    Production-shape hybrid search: each retriever reduces the corpus
    to a bounded candidate list via per-batch partial top-k (only
    ~n_list rows per batch reach the driver merge), and the fusion
    touches ≤ 2·n_list rows — rank-based, so the fused score is a sum
    of exact rationals with zero float-drift risk.  In-list ranks are
    taken on the 6-dp-rounded scores (id tie-break), the repo's
    quantize-the-comparison convention, so the SQL twin ranks
    identically."""
    from .ann import brute_topk

    bm = bm25_topk(docs_ds, terms, k=n_list, id_col=id_col,
                   text_col=text_col).reset_index(drop=True)
    bm_rank = pd.DataFrame({
        "doc_id": bm[id_col].to_numpy(np.int64),
        "bm25_rank": np.arange(1, len(bm) + 1, dtype=np.int64)})

    cs = brute_topk(emb_ds, np.asarray(qvec, np.float64)[None, :],
                    n_list, id_col=vec_id_col, vec_col=vec_col)
    cs = cs.copy()
    cs["cos6"] = np.round(cs["cosine"].to_numpy(np.float64), 6)
    cs = cs.sort_values(["cos6", "vec_id"], ascending=[False, True],
                        ignore_index=True)
    cos_rank = pd.DataFrame({
        "doc_id": cs["vec_id"].to_numpy(np.int64),
        "cos_rank": np.arange(1, len(cs) + 1, dtype=np.int64)})

    f = bm_rank.merge(cos_rank, on="doc_id", how="outer") \
        .fillna(0).astype(np.int64)
    br = f["bm25_rank"].to_numpy(np.float64)
    cr = f["cos_rank"].to_numpy(np.float64)
    rrf = np.where(br > 0, 1.0 / (kr + br), 0.0) \
        + np.where(cr > 0, 1.0 / (kr + cr), 0.0)
    f["rrf"] = np.round(rrf, 6)
    f = f.sort_values(["rrf", "doc_id"], ascending=[False, True],
                      ignore_index=True).head(k)
    return f[["doc_id", "bm25_rank", "cos_rank", "rrf"]]


# ---------------------------------------------------------------------------
# Zipf-slope fit (per-source token-frequency power law)
# ---------------------------------------------------------------------------

def zipf_fit(docs_ds, *, k: int = 100, text_col: str = "text",
             source_col: str = "source") -> pd.DataFrame:
    """Per-source Zipf fit: OLS of ln(count) on ln(rank) over the
    source's top-``k`` tokens (rank by count DESC, token ASC) — the
    distribution-health check of a corpus mixture (a natural-language
    source fits slope ≈ −1; boilerplate/spam flattens or steepens it).

    Shape: the (source, token, cnt) combiner → ONE vocab-sized groupby,
    then :func:`~ttmf_ray.functions.topk.grouped_topk` prunes per batch
    so only ~k·#sources rows reach the driver, where the closed-form
    OLS runs on ≤ k points per source.  Rounded at 6 dp — summation-
    order drift over ≤ k doubles is ~1e-13, invisible at the round
    (the docs_source_kl precedent)."""
    from ..functions.topk import grouped_topk

    def counts(t: pa.Table) -> pa.Table:
        src = t.column(source_col).to_numpy(zero_copy_only=False)
        flat, doc_idx, _ = _words(t.column(text_col))
        if not len(flat):
            return pa.table({source_col: pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        key = np.char.add(np.char.add(src[doc_idx].astype(str), "\x1f"),
                          flat.astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({source_col: pa.array(sp[:, 0], pa.string()),
                         "token": pa.array(sp[:, 2], pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = (docs_ds.map_batches(counts, batch_format="pyarrow")
           .groupby([source_col, "token"]).sum("cnt"))
    agg = agg.map_batches(
        lambda t: pa.table({source_col: t.column(source_col),
                            "token": t.column("token"),
                            "cnt": t.column("sum(cnt)")}),
        batch_format="pyarrow")
    top = grouped_topk(agg, key_cols=[source_col], value_col="cnt",
                       k=k, descending=True, tiebreak_cols=["token"]) \
        .to_pandas()
    rows = []
    for src, g in top.groupby(source_col, sort=True):
        g = g.sort_values(["cnt", "token"], ascending=[False, True],
                          ignore_index=True)
        n = float(len(g))
        x = np.log(np.arange(1, len(g) + 1, dtype=np.float64))
        y = np.log(g["cnt"].to_numpy(np.float64))
        sx, sy = x.sum(), y.sum()
        sxy, sxx = (x * y).sum(), (x * x).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        rows.append({source_col: src, "n_terms": np.int64(len(g)),
                     "slope": round(slope, 6),
                     "intercept": round((sy - slope * sx) / n, 6)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010)
# ---------------------------------------------------------------------------

def rake_keywords(docs_ds, *, k: int = 20, text_col: str = "text") -> pd.DataFrame:
    """Corpus-level RAKE: candidate phrases are maximal runs of
    consecutive non-stopword tokens (lowercase ``[0-9a-z_]+`` words,
    stop list = the EN language profile); word score = deg/freq where
    freq counts occurrences inside candidates and deg adds the length
    of the containing phrase; phrase score = Σ word scores.  Returns
    the top-``k`` distinct phrase texts by (round(score, 6) DESC,
    phrase ASC) with their occurrence counts.

    Two streaming passes: (1) a (word, freq, deg) combiner → ONE
    vocab-sized groupby (the word-score model, broadcast once; at web
    scale swap the broadcast for a hash join on the word key);
    (2) stateless phrase re-derivation + per-batch partial top-k on the
    broadcast scores — only ~k rows per batch reach the driver merge.
    Phrase identity is the joined text, so equal texts score equally
    and the corpus-level dedup is a tiny groupby."""
    from ray.data.aggregate import Sum

    from ..context import Broadcast, auto_pool
    from .text import _EN_STOP

    stops = np.asarray(_EN_STOP, dtype=object)

    def _phrases(col):
        """flat words, phrase id per word (−1 for stopwords), #docs."""
        flat, doc_idx, n = _words(col)
        if not len(flat):
            return flat, np.empty(0, np.int64), doc_idx
        is_stop = np.isin(flat, stops)
        # phrase boundary at every stopword or doc change
        brk = np.ones(len(flat), bool)
        brk[1:] = is_stop[1:] | is_stop[:-1] \
            | (doc_idx[1:] != doc_idx[:-1])
        pid = np.cumsum(brk) - 1
        pid = np.where(is_stop, -1, pid)
        return flat, pid.astype(np.int64), doc_idx

    def word_stats(t: pa.Table) -> pa.Table:
        flat, pid, _ = _phrases(t.column(text_col))
        keep = pid >= 0
        if not keep.any():
            return pa.table({"word": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        w, p = flat[keep], pid[keep]
        _, inv, plen = np.unique(p, return_inverse=True,
                                 return_counts=True)
        codes, uniq = pd.factorize(w)
        freq = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        deg = np.bincount(codes, weights=plen[inv],
                          minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq, pa.string()),
                         "freq": pa.array(freq),
                         "deg": pa.array(deg)})

    ws = (docs_ds.map_batches(word_stats, batch_format="pyarrow")
          .groupby("word")
          .aggregate(Sum("freq", alias_name="freq"),
                     Sum("deg", alias_name="deg"))
          .to_pandas())
    order = np.argsort(ws["word"].to_numpy())
    model = {"words": ws["word"].to_numpy()[order],
             "score": (ws["deg"].to_numpy(np.float64)[order]
                       / ws["freq"].to_numpy(np.float64)[order])}
    bc = Broadcast(model)

    class PhraseScorer:
        def __init__(self, model_bc: Broadcast):
            m = model_bc.get()
            self.words, self.wscore = m["words"], m["score"]

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, pid, _ = _phrases(t.column(text_col))
            keep = pid >= 0
            empty = pa.table({"phrase": pa.array([], pa.string()),
                              "n_words": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
            if not keep.any():
                return empty
            w, p = flat[keep], pid[keep]
            pos = np.clip(np.searchsorted(self.words, w), 0,
                          max(len(self.words) - 1, 0))
            sc = np.where(self.words[pos] == w, self.wscore[pos], 0.0)
            up, inv, plen = np.unique(p, return_inverse=True,
                                      return_counts=True)
            psum = np.bincount(inv, weights=sc, minlength=len(up))
            # phrase text: words are already in position order
            starts = np.concatenate([[0], np.cumsum(plen)[:-1]])
            texts = np.asarray(
                [" ".join(w[s:s + c]) for s, c in zip(starts, plen)],
                dtype=object)
            df = pd.DataFrame({"phrase": texts,
                               "n_words": plen.astype(np.int64),
                               "score": np.round(psum, 6)})
            agg = df.groupby(["phrase", "n_words", "score"],
                             as_index=False).size() \
                .rename(columns={"size": "n_occ"})
            agg = agg.sort_values(["score", "phrase"],
                                  ascending=[False, True]).head(k)
            return pa.Table.from_pandas(
                agg[["phrase", "n_words", "score", "n_occ"]],
                preserve_index=False)

    parts = docs_ds.map_batches(
        PhraseScorer, batch_format="pyarrow",
        concurrency=auto_pool(),
        fn_constructor_kwargs={"model_bc": bc}).to_pandas()
    out = (parts.groupby(["phrase", "n_words", "score"], as_index=False)
           .agg(n_occ=("n_occ", "sum"))
           .sort_values(["score", "phrase"], ascending=[False, True])
           .head(k))
    return out.astype({"n_words": np.int64, "n_occ": np.int64}) \
        .reset_index(drop=True)
