"""Model-based corpus selection: a Naive-Bayes (fastText-style linear)
quality classifier and DSIR hashed-n-gram importance weights.

Both are counts-based, so training is the same distributed shape as the
unigram LM (stages/lm_score.py): per-batch count combiners → ONE small
groupby over tokens/buckets → a few-MB model broadcast once → stateless
vectorized per-batch scoring.  Nothing but (token, count) rows ever
shuffles; the corpus itself streams.

NB classifier (CCNet-style "is this reference-like text?" gate; Joulin et
al. 2017 reduce fastText to exactly this shape for bag-of-words):
  trained on the doc_id %% 2 == 0 half, label y=1 iff lang == 'en';
  vocab = top-V train tokens by (count DESC, token ASC);
  w(t)  = ln((c1(t)+1)/(n1+V+1)) - ln((c0(t)+1)/(n0+V+1)), add-one over
          the kept vocab, OOV tokens get the c=0 weight;
  score(doc) = ln((N1+1)/(N0+1)) + Σ_tokens w(t);  pred = score >= 0.

DSIR (Xie et al., NeurIPS 2023 "Data Selection for Language Models via
Importance Resampling"): hashed word features, bucket = mix64(DSIR_SEED,
word_fp(w)) %% B; target distribution fitted on lang == 'en' docs, raw on
ALL docs; per-doc log importance weight = Σ_occurrences
ln((ct[b]+1)/(Tt+B)) - ln((cr[b]+1)/(Tr+B)); selected = weight > 0.

The reference engine has no model-based corpus selection; these are
training-data-pipeline extensions (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import half_up

from ..context import Broadcast, auto_pool

DSIR_SEED = 101


def _doc_words(col):
    """(flat lowercase `[0-9a-z_]+` words, doc index per word, n_docs) —
    the shingle/fingerprint word definition (stages/dedup.py), NOT the
    whitespace tokens of the quality kernels."""
    from .text import _as_array, _split_flat

    import pyarrow.compute as pc

    arr = _as_array(col)
    lowered = pc.utf8_lower(arr)
    flat, doc_idx, n = _split_flat(lowered, "[^0-9a-z_]+")
    keep = flat != ""
    return flat[keep], doc_idx[keep], n


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier
# ---------------------------------------------------------------------------

def fit_nb_quality(docs_ds, *, text_col: str = "text",
                   label_col: str = "lang", pos_label: str = "en",
                   vocab_k: int = 20000) -> dict:
    """Fit the two-class token model on ``docs_ds`` (caller pre-filters
    to the train split).  Returns the broadcastable model dict."""
    from ray.data.aggregate import Sum

    from .lm_score import _doc_tokens

    def partial(t: pa.Table) -> pa.Table:
        toks, doc_idx, _ = _doc_tokens(t.column(text_col))
        is_pos = (np.asarray(t.column(label_col)) == pos_label)
        codes, uniq = pd.factorize(toks)
        pos_tok = is_pos[doc_idx]
        c1 = np.bincount(codes[pos_tok], minlength=len(uniq)) \
            .astype(np.int64)
        c0 = np.bincount(codes[~pos_tok], minlength=len(uniq)) \
            .astype(np.int64)
        out = pa.table({"token": pa.array(uniq, pa.string()),
                        "c1": pa.array(c1), "c0": pa.array(c0)})
        # doc-count partials ride along as a sentinel row (token = "")
        n1 = int(is_pos.sum())
        sent = pa.table({"token": pa.array([""], pa.string()),
                         "c1": pa.array([n1], pa.int64()),
                         "c0": pa.array([len(is_pos) - n1], pa.int64())})
        return pa.concat_tables([out, sent])

    # distributed prune BEFORE the collect (same pattern as
    # fit_unigram_lm / chi2_terms): groupby blocks partition the token
    # domain, so per-block top-k by the global key (c1+c0 DESC, token
    # ASC) is lossless, and the class token totals ride along as one
    # "\x1etot" sentinel per block.  The doc-count sentinel (token "")
    # passes through untouched.  Only ≤ (vocab_k+2)·n_blocks rows reach
    # the driver.
    def block_topk(t: pa.Table) -> pa.Table:
        tok = t.column("token").to_numpy(zero_copy_only=False)
        c1 = t.column("c1").to_numpy().astype(np.int64)
        c0 = t.column("c0").to_numpy().astype(np.int64)
        real = tok != ""
        docs = ~real
        cnt = c1 + c0
        order = np.flatnonzero(real)[
            np.lexsort((tok[real], -cnt[real]))[:vocab_k]]
        keep = np.concatenate([order, np.flatnonzero(docs)])
        return pa.table({
            "token": pa.array(np.append(tok[keep], ["\x1etot"]),
                              pa.string()),
            "c1": pa.array(np.append(c1[keep], [c1[real].sum()])),
            "c0": pa.array(np.append(c0[keep], [c0[real].sum()]))})

    counts = (docs_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("c1", alias_name="c1"),
                         Sum("c0", alias_name="c0"))
              .map_batches(block_topk, batch_format="pyarrow")
              .to_pandas())
    sent = counts["token"] == ""
    tot = counts["token"] == "\x1etot"
    n_docs1 = int(counts.loc[sent, "c1"].sum())
    n_docs0 = int(counts.loc[sent, "c0"].sum())
    n1 = int(counts.loc[tot, "c1"].sum())
    n0 = int(counts.loc[tot, "c0"].sum())
    counts = counts[~sent & ~tot]
    counts = counts.assign(cnt=counts["c1"] + counts["c0"])
    top = counts.sort_values(["cnt", "token"],
                             ascending=[False, True]).head(vocab_k)
    v = len(top)
    den1, den0 = float(n1 + v + 1), float(n0 + v + 1)
    order = np.argsort(top["token"].to_numpy())
    tokens = top["token"].to_numpy()[order]
    w = (np.log((top["c1"].to_numpy().astype(np.float64)[order] + 1.0)
                / den1)
         - np.log((top["c0"].to_numpy().astype(np.float64)[order] + 1.0)
                  / den0))
    return {"tokens": tokens, "w": w,
            "w_unk": float(np.log(1.0 / den1) - np.log(1.0 / den0)),
            "prior": float(np.log((n_docs1 + 1.0) / (n_docs0 + 1.0)))}


class NBScorer:
    """Actor stage: docs → (doc_id, n_tokens, nb_score, pred)."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m = model_bc.get()
        self.tokens, self.w = m["tokens"], m["w"]
        self.w_unk, self.prior = m["w_unk"], m["prior"]
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .lm_score import _doc_tokens

        toks, doc_idx, n = _doc_tokens(batch.column(self.text_col))
        codes, uniq = pd.factorize(toks)
        if len(uniq) and len(self.tokens):
            pos = np.clip(np.searchsorted(self.tokens, uniq),
                          0, len(self.tokens) - 1)
            hit = self.tokens[pos] == uniq
            uw = np.where(hit, self.w[pos], self.w_unk)
        else:
            uw = np.full(len(uniq), self.w_unk)
        tok_w = uw[codes] if len(codes) else np.empty(0)
        sums = np.bincount(doc_idx, weights=tok_w, minlength=n)
        cnts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        score = self.prior + sums
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_tokens": pa.array(cnts),
            "nb_score": pa.array(score),
            "pred": pa.array((score >= 0).astype(np.int64)),
        })


def nb_quality_score(docs_ds, model: dict, *, id_col: str = "doc_id",
                     text_col: str = "text", concurrency=None):
    bc = Broadcast(model)
    return docs_ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={"model_bc": bc, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
    )


# ---------------------------------------------------------------------------
# DSIR hashed importance weights
# ---------------------------------------------------------------------------

def _word_buckets(col, n_buckets: int):
    """(bucket per word occurrence, doc index, n_docs) — words hashed
    once per UNIQUE token via the memoized word_fp (dedup kernel)."""
    import pyarrow.compute as pc

    from .dedup import mix64_vec, word_fp
    from .text import _as_array

    arr = _as_array(col)
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    split = pc.split_pattern_regex(pc.utf8_lower(pa.array(arr)),
                                   pattern="[^0-9a-z_]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    n = len(arr)
    offs = split.offsets.to_numpy()
    counts = np.diff(offs).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    dic = pc.dictionary_encode(split.flatten())
    codes = dic.indices.to_numpy().astype(np.int64)
    uniq = dic.dictionary.to_pylist()
    if uniq and "" in uniq:
        ok = codes != uniq.index("")
        codes, doc_idx = codes[ok], doc_idx[ok]
    ufp = np.fromiter((word_fp(w) for w in uniq), dtype=np.uint64,
                      count=len(uniq))
    ub = (mix64_vec(DSIR_SEED, ufp) % np.uint64(n_buckets)) \
        .astype(np.int64)
    return ub[codes], doc_idx, n


def fit_dsir(docs_ds, *, text_col: str = "text",
             target_col: str = "lang", target_label: str = "en",
             n_buckets: int = 1024) -> dict:
    """Hashed-bucket occurrence counts: target = ``target_label`` docs,
    raw = ALL docs.  Returns {"lw": per-bucket ln ratio array}."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        b, doc_idx, _ = _word_buckets(t.column(text_col), n_buckets)
        is_t = (np.asarray(t.column(target_col)) == target_label)[doc_idx]
        ct = np.bincount(b[is_t], minlength=n_buckets).astype(np.int64)
        cr = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(n_buckets,
                                                      dtype=np.int64)),
                         "ct": pa.array(ct), "cr": pa.array(cr)})

    g = (docs_ds.map_batches(partial, batch_format="pyarrow")
         .groupby("bucket")
         .aggregate(Sum("ct", alias_name="ct"),
                    Sum("cr", alias_name="cr"))
         .to_pandas().sort_values("bucket"))
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct[g["bucket"].to_numpy()] = g["ct"].to_numpy()
    cr[g["bucket"].to_numpy()] = g["cr"].to_numpy()
    tt, tr = float(ct.sum() + n_buckets), float(cr.sum() + n_buckets)
    lw = (np.log((ct + 1.0) / tt) - np.log((cr + 1.0) / tr))
    return {"lw": lw, "n_buckets": n_buckets}


class DSIRScorer:
    """Actor stage: docs → (doc_id, n_words, log_weight, selected)."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m = model_bc.get()
        self.lw, self.n_buckets = m["lw"], m["n_buckets"]
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        b, doc_idx, n = _word_buckets(batch.column(self.text_col),
                                      self.n_buckets)
        sums = np.bincount(doc_idx, weights=self.lw[b], minlength=n)
        cnts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(cnts),
            "log_weight": pa.array(sums),
            "selected": pa.array((sums > 0).astype(np.int64)),
        })


def dsir_weights(docs_ds, model: dict, *, id_col: str = "doc_id",
                 text_col: str = "text", concurrency=None):
    bc = Broadcast(model)
    return docs_ds.map_batches(
        DSIRScorer,
        fn_constructor_kwargs={"model_bc": bc, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
    )


# ---------------------------------------------------------------------------
# Classifier evaluation: exact ROC-AUC of the NB score (Mann-Whitney U)
# ---------------------------------------------------------------------------

def nb_auc(docs_ds, model: dict, *, id_col: str = "doc_id",
           text_col: str = "text", label_col: str = "lang",
           pos_label: str = "en",
           eval_filter=lambda ids: ids % 2 == 1) -> pd.DataFrame:
    """Exact ROC-AUC of the NB quality score against the held-out half
    (label = ``label_col == pos_label``): one streaming pass emits
    per-batch (rounded score, n_pos, n_neg) partials — the shuffle state
    is bounded by DISTINCT score values, never the doc stream — then the
    tie-averaged Mann-Whitney rank sum runs on the folded histogram in
    PURE INTEGER arithmetic (AUC = U2 / (2·P·N) with
    U2 = Σ n1·(2·cum_before + cnt + 1) − P·(P+1)), so there is no float
    drift anywhere before the single final division."""
    import ray as _ray

    bc = Broadcast(model)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        keep = eval_filter(ids)
        if not keep.any():
            return pa.table({"score": pa.array([], pa.float64()),
                             "n1": pa.array([], pa.int64()),
                             "n0": pa.array([], pa.int64())})
        t = t.filter(pa.array(keep))
        scored = NBScorer(bc, id_col=id_col, text_col=text_col)(t)
        s = np.round(scored.column("nb_score").to_numpy(), 6)
        y = (np.asarray(t.column(label_col).to_pylist(), dtype=object)
             == pos_label)
        us, inv = np.unique(s, return_inverse=True)
        n1 = np.bincount(inv[y], minlength=len(us)).astype(np.int64)
        n0 = np.bincount(inv[~y], minlength=len(us)).astype(np.int64)
        return pa.table({"score": pa.array(us), "n1": pa.array(n1),
                         "n0": pa.array(n0)})

    parts = [t for t in _ray.get(
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return pd.DataFrame({"n_pos": [0], "n_neg": [0], "auc": [0.0]})
    df = pa.concat_tables(parts).to_pandas() \
        .groupby("score", as_index=False).sum().sort_values("score")
    n1 = df["n1"].to_numpy(np.int64)
    n0 = df["n0"].to_numpy(np.int64)
    cnt = n1 + n0
    cum_before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    P, N = int(n1.sum()), int(n0.sum())
    u2 = int((n1 * (2 * cum_before + cnt + 1)).sum()) - P * (P + 1)
    auc = float(half_up(u2 / (2 * P * N), 6)) if P and N else 0.0
    return pd.DataFrame({"n_pos": [P], "n_neg": [N], "auc": [auc]})


# ---------------------------------------------------------------------------
# DSIR importance RESAMPLING (the selection half of Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_SAMPLE_SEED = 991


def dsir_sample(weights_ds, *, n: int, id_col: str = "doc_id",
                weight_col: str = "log_weight",
                seed: int = DSIR_SAMPLE_SEED) -> pd.DataFrame:
    """Deterministic sample of ``n`` docs with inclusion probability
    ∝ exp(log_weight) — Efraimidis-Spirakis in the LOG domain (the
    Gumbel-trick form, so huge weights never overflow exp):
    key = ln(−ln u) − round(log_weight, 6) with
    u = (mix64(seed, id) >> 11 + 1) / 2^53; keep the n SMALLEST keys.
    Same per-batch bottom-n partial → ≤ n rows per block reach the
    driver merge (stages/curation.py weighted_sample shape); keys
    9-dp-rounded so the SQL twin selects identical rows."""
    from ..sources.pages import mix64_vec

    two53 = float(1 << 53)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        lw = np.round(np.asarray(t.column(weight_col), dtype=np.float64),
                      6)
        u = ((mix64_vec(seed, ids) >> np.uint64(11)).astype(np.float64)
             + 1.0) / two53
        key = np.round(np.log(-np.log(u)) - lw, 9)
        order = np.lexsort((ids, key))[:n]
        return pa.table({id_col: pa.array(ids[order]),
                         weight_col: pa.array(lw[order], pa.float64()),
                         "key": pa.array(key[order], pa.float64())})

    parts = weights_ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    out = parts.sort_values(["key", id_col]).head(n)
    return out.astype({id_col: np.int64}).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Chi-square term selection (Manning et al., IIR ch. 13 feature
# selection) — which tokens are most associated with the in-domain
# sources; the transparent cousin of the NB gate's learned weights.
# ---------------------------------------------------------------------------

def chi2_terms(docs_ds, in_sources, *, k: int = 50,
               text_col: str = "text", source_col: str = "source") -> pd.DataFrame:
    """Top-``k`` tokens by chi-square association with the in-domain
    class (doc-frequency contingency table):

        n11 = in-domain docs containing t, n10 = out docs containing t,
        n01/n00 the complements; chi2 = N·det² / (df·(N−df)·n_pos·n_neg)
        with det = n11·n00 − n10·n01.

    All counts are exact integers through ONE vocab-sized groupby of
    per-batch distinct-(doc, token) partials; det stays int64 and the
    final expression is a fixed-order float64 chain (cast, square,
    multiply, one division), so both engines land on identical doubles
    before the 6-dp round.  Per-batch partial top-k after the groupby —
    only ~k rows per block reach the driver merge.  Ranked by
    (round(chi2, 6) DESC, token ASC); tokens in every doc score 0."""
    from ray.data.aggregate import Sum

    in_set = frozenset(in_sources)

    def partial(t: pa.Table) -> pa.Table:
        src = t.column(source_col).to_numpy(zero_copy_only=False)
        flat, doc_idx, _ = _doc_words(t.column(text_col))
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "c_pos": pa.array([], pa.int64()),
                             "c_neg": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat)
        key = doc_idx * np.int64(len(uniq)) + codes
        ukey = np.unique(key)
        tok = (ukey % len(uniq)).astype(np.int64)
        doc = (ukey // len(uniq)).astype(np.int64)
        pos = np.asarray([s in in_set for s in src], dtype=np.int64)[doc]
        c_pos = np.zeros(len(uniq), np.int64)
        c_neg = np.zeros(len(uniq), np.int64)
        np.add.at(c_pos, tok, pos)
        np.add.at(c_neg, tok, 1 - pos)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "c_pos": pa.array(c_pos),
                         "c_neg": pa.array(c_neg)})

    counts = (docs_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("c_pos", alias_name="c_pos"),
                         Sum("c_neg", alias_name="c_neg")))

    # class sizes: one tiny aggregate over the docs table
    def doc_counts(t: pa.Table) -> pa.Table:
        src = t.column(source_col).to_numpy(zero_copy_only=False)
        p = np.int64(sum(1 for s in src if s in in_set))
        return pa.table({"n_pos": pa.array([p]),
                         "n_all": pa.array([np.int64(len(src))])})

    dc = docs_ds.map_batches(doc_counts, batch_format="pyarrow") \
        .to_pandas()
    n_pos = int(dc["n_pos"].sum())
    n_all = int(dc["n_all"].sum())
    n_neg = n_all - n_pos

    def score_topk(t: pa.Table) -> pa.Table:
        tok = t.column("token").to_numpy(zero_copy_only=False)
        cp = t.column("c_pos").to_numpy().astype(np.int64)
        cn = t.column("c_neg").to_numpy().astype(np.int64)
        df = cp + cn
        det = cp * (np.int64(n_neg) - cn) - cn * (np.int64(n_pos) - cp)
        denom = ((df.astype(np.float64)
                  * (np.int64(n_all) - df).astype(np.float64))
                 * np.float64(n_pos)) * np.float64(n_neg)
        with np.errstate(invalid="ignore", divide="ignore"):
            chi2 = np.where(denom > 0,
                            (np.float64(n_all)
                             * (det.astype(np.float64)
                                * det.astype(np.float64)))
                            / np.where(denom > 0, denom, 1.0), 0.0)
        chi2 = np.round(chi2, 6)
        order = np.lexsort((tok, -chi2))[:k]
        return pa.table({"token": pa.array(tok[order], pa.string()),
                         "df": pa.array(df[order]),
                         "c_pos": pa.array(cp[order]),
                         "chi2": pa.array(chi2[order], pa.float64())})

    parts = counts.map_batches(score_topk, batch_format="pyarrow") \
        .to_pandas()
    parts = parts.sort_values(["chi2", "token"],
                              ascending=[False, True]).head(k)
    return parts.astype({"df": np.int64, "c_pos": np.int64}) \
        .reset_index(drop=True)
