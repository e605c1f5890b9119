"""Unigram-LM perplexity scoring — the CCNet-style model-based quality
filter: fit token statistics on a reference (clean) corpus, score every
document by mean log-probability, filter on the score downstream.

Scale shape: fitting is the top-tokens pattern (per-batch distinct-token
combiner → one groupby over tokens, Zipf-bounded); the fitted model is
(vocab ≤ K tokens, log-probs) — a few MB — broadcast once; scoring is a
stateless per-batch vectorized pass (factorize the batch's unique tokens,
one searchsorted into the vocab, one bincount for per-doc sums).

Model (mirrored exactly in oracle SQL): add-one smoothing over the kept
vocab — p(tok) = (cnt+1)/(total+V+1) for the top-V tokens by
(count DESC, token ASC); every other token scores p_unk = 1/(total+V+1);
doc score = mean over tokens of ln p (0.0 for token-less docs).

The reference engine has no model-based corpus filter; this is a
training-data-pipeline extension (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import Broadcast


def _doc_tokens(col, pattern: str = r"[ \t\n\r\f\v]+"):
    """(flat lowercase tokens, doc index per token, n_docs) — same split
    as stages/text.py quality/token kernels (empties dropped)."""
    import pyarrow.compute as pc

    from .text import _as_array, _split_flat

    flat, doc_idx, n = _split_flat(_as_array(col), pattern)
    keep = flat != ""
    lowered = pc.utf8_lower(pa.array(flat[keep])).to_numpy(
        zero_copy_only=False)
    return lowered, doc_idx[keep], n


def fit_unigram_lm(docs_ds, *, text_col: str = "text",
                   vocab_k: int = 20000) -> dict:
    """Token counts over the reference corpus → smoothed unigram model.

    Returns {"tokens": sorted str array, "logp": aligned ln p array,
    "logp_unk": float} — the broadcastable model.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, _, _ = _doc_tokens(t.column(text_col))
        codes, uniq = pd.factorize(toks)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "cnt": pa.array(cnt)})

    # distributed prune BEFORE the collect: the groupby output blocks
    # partition the token domain, so a per-block top-k by the global
    # ranking key (cnt DESC, token ASC) is lossless for the global
    # top-k, and the grand total rides along as one sentinel row per
    # block (token "" never occurs — _doc_tokens drops empties).  Only
    # ≤ (vocab_k+1)·n_blocks rows ever reach the driver; the full
    # token-count table (token-domain sized at web scale) stays
    # distributed.
    def block_topk(t: pa.Table) -> pa.Table:
        tok = t.column("token").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        order = np.lexsort((tok, -cnt))[:vocab_k]
        return pa.table({
            "token": pa.array(np.append(tok[order], [""]), pa.string()),
            "cnt": pa.array(np.append(cnt[order], [cnt.sum()]))})

    parts = (docs_ds.map_batches(partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
             .map_batches(block_topk, batch_format="pyarrow")
             .to_pandas())
    sent = parts["token"] == ""
    total = int(parts.loc[sent, "cnt"].sum())
    counts = parts[~sent]
    top = counts.sort_values(["cnt", "token"],
                             ascending=[False, True]).head(vocab_k)
    v = len(top)
    denom = float(total + v + 1)
    order = np.argsort(top["token"].to_numpy())
    tokens = top["token"].to_numpy()[order]
    logp = np.log((top["cnt"].to_numpy().astype(np.float64)[order] + 1.0)
                  / denom)
    return {"tokens": tokens, "logp": logp,
            "logp_unk": float(np.log(1.0 / denom))}


class PerplexityScorer:
    """Actor stage: docs → (doc_id, n_tokens, logprob_mean).

    Model fetched once per actor from the object store; per batch the
    unique tokens are factorized, probed into the vocab with ONE
    searchsorted, and per-doc sums come from one bincount."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m = model_bc.get()
        self.tokens, self.logp = m["tokens"], m["logp"]
        self.logp_unk = m["logp_unk"]
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, doc_idx, n = _doc_tokens(batch.column(self.text_col))
        codes, uniq = pd.factorize(toks)
        pos = np.searchsorted(self.tokens, uniq) if len(uniq) else \
            np.empty(0, dtype=np.int64)
        pos = np.clip(pos, 0, max(len(self.tokens) - 1, 0))
        hit = (self.tokens[pos] == uniq) if len(self.tokens) and len(uniq) \
            else np.zeros(len(uniq), dtype=bool)
        ulogp = np.where(hit, self.logp[pos] if len(self.tokens) else 0.0,
                         self.logp_unk)
        tok_lp = ulogp[codes] if len(codes) else np.empty(0)
        sums = np.bincount(doc_idx, weights=tok_lp, minlength=n)
        cnts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        mean = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_tokens": pa.array(cnts),
            "logprob_mean": pa.array(mean),
        })


def perplexity_score(docs_ds, model: dict, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     concurrency=None):
    from ..context import auto_pool

    bc = Broadcast(model)
    return docs_ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"model_bc": bc, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
    )


# ---------------------------------------------------------------------------
# Moore-Lewis cross-entropy-difference selection (ACL 2010) — score each
# document by mean ln p_in(w) − mean ln p_out(w) under two add-one unigram
# LMs (in-domain subset vs the general corpus); select where the
# difference is non-negative.  The classic "intelligent selection" rule
# for domain-matched training data.
# ---------------------------------------------------------------------------


class CEDiffScorer:
    """Actor stage: docs → (doc_id, n_tokens, ced, keep).

    Both fitted models (:func:`fit_unigram_lm` outputs) ride ONE
    broadcast; per batch the unique tokens are factorized once and
    probed into each vocab with one searchsorted, so the marginal cost
    over single-model scoring is one extra lookup.  ced is rounded to
    6 dp BEFORE the keep comparison so the SQL twin lands on the
    identical selection."""

    def __init__(self, models_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m_in, m_out = models_bc.get()
        self.m_in, self.m_out = m_in, m_out
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def _per_token_lp(uniq, codes, model):
        tokens, logp = model["tokens"], model["logp"]
        pos = np.searchsorted(tokens, uniq) if len(uniq) else \
            np.empty(0, dtype=np.int64)
        pos = np.clip(pos, 0, max(len(tokens) - 1, 0))
        hit = (tokens[pos] == uniq) if len(tokens) and len(uniq) \
            else np.zeros(len(uniq), dtype=bool)
        ulogp = np.where(hit, logp[pos] if len(tokens) else 0.0,
                         model["logp_unk"])
        return ulogp[codes] if len(codes) else np.empty(0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, doc_idx, n = _doc_tokens(batch.column(self.text_col))
        codes, uniq = pd.factorize(toks)
        lp_in = self._per_token_lp(uniq, codes, self.m_in)
        lp_out = self._per_token_lp(uniq, codes, self.m_out)
        cnts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        s_in = np.bincount(doc_idx, weights=lp_in, minlength=n)
        s_out = np.bincount(doc_idx, weights=lp_out, minlength=n)
        safe = np.maximum(cnts, 1)
        ced = np.round(np.where(cnts > 0, s_in / safe - s_out / safe, 0.0),
                       6)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_tokens": pa.array(cnts),
            "ced": pa.array(ced, pa.float64()),
            "keep": pa.array((ced >= 0.0).astype(np.int64)),
        })


def moore_lewis_score(docs_ds, model_in: dict, model_out: dict, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency=None):
    from ..context import auto_pool

    return docs_ds.map_batches(
        CEDiffScorer, batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
        fn_constructor_kwargs={"models_bc": Broadcast((model_in,
                                                       model_out)),
                               "id_col": id_col, "text_col": text_col})


# ---------------------------------------------------------------------------
# Bigram LM (KenLM-flavored conditional model, add-one smoothed)
# ---------------------------------------------------------------------------

def _prune_ngram_counts(agg_ds, min_count: int):
    """Distributed count prune BEFORE the model collect (KenLM-style):
    drop n-gram rows (keys tagged "b\\x1e"/"t\\x1e") below ``min_count``
    inside the groupby output blocks — the driver then sees a table
    bounded by the pruned model, not the raw n-gram domain.  Unigram
    ("u\\x1e") rows always survive (they define V/N).  ``min_count=1``
    is the identity (exact model, mirror-pinned)."""
    if min_count <= 1:
        return agg_ds

    import pyarrow.compute as pc

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.or_(pc.starts_with(t.column("key"), "u\x1e"),
                      pc.greater_equal(t.column("cnt"),
                                       pa.scalar(min_count)))
        return t.filter(keep)

    return agg_ds.map_batches(prune, batch_format="pyarrow")


def fit_bigram_lm(docs_ds, *, text_col: str = "text",
                  min_count: int = 1) -> dict:
    """Adjacent-bigram counts over the reference corpus → add-one
    conditional model: p(cur|prev) = (c(prev,cur)+1) / (c(prev)+V) with
    c(prev) = Σ_cur c(prev,cur) (prefix occurrences) and V = distinct
    tokens in the reference.  Same distributed shape as the unigram fit:
    per-batch combiner rows → ONE groupby; the model (bigram keys +
    counts, prefix counts, V) broadcasts once.  At web scale the bigram
    table outgrows a broadcast before the corpus does — the fallback is
    a hash join of scoring rows on the packed bigram key."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, didx, _ = _doc_tokens(t.column(text_col))
        rows_k, rows_c = [], []
        if len(toks) > 1:
            adj = didx[:-1] == didx[1:]
            prev, cur = toks[:-1][adj], toks[1:][adj]
            bk = np.char.add(np.char.add(prev.astype(str), "\x1f"),
                             cur.astype(str))
            kk, cnt = np.unique(bk, return_counts=True)
            rows_k.append(np.char.add("b\x1e", kk))
            rows_c.append(cnt)
        if len(toks):
            ut, uc = np.unique(toks, return_counts=True)
            rows_k.append(np.char.add("u\x1e", ut.astype(str)))
            rows_c.append(uc)
        if not rows_k:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(rows_k), pa.string()),
            "cnt": pa.array(np.concatenate(rows_c).astype(np.int64))})

    agg = _prune_ngram_counts(
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")),
        min_count).to_pandas()
    keys = agg["key"].to_numpy().astype(str)
    cnt = agg["cnt"].to_numpy().astype(np.int64)
    is_bg = np.char.startswith(keys, "b\x1e")
    bg_keys = np.asarray([k[2:] for k in keys[is_bg]], dtype=object)
    bg_cnt = cnt[is_bg]
    uni_tok = np.asarray([k[2:] for k in keys[~is_bg]], dtype=object)
    n_vocab = len(uni_tok)
    # prefix counts from the bigram table itself (Σ_cur c(prev,cur))
    prevs = np.asarray([k.split("\x1f", 1)[0] for k in bg_keys],
                       dtype=object)
    p_uniq, p_inv = np.unique(prevs, return_inverse=True)
    p_cnt = np.bincount(p_inv, weights=bg_cnt).astype(np.int64)
    order = np.argsort(bg_keys)
    return {"bg_keys": bg_keys[order], "bg_cnt": bg_cnt[order],
            "prev_tok": p_uniq, "prev_cnt": p_cnt,
            "V": int(n_vocab)}


class BigramScorer:
    """Actor stage: docs → (doc_id, n_bigrams, logp, ppl)."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m = model_bc.get()
        self.bg_keys, self.bg_cnt = m["bg_keys"], m["bg_cnt"]
        self.prev_tok, self.prev_cnt = m["prev_tok"], m["prev_cnt"]
        self.V = m["V"]
        self.id_col, self.text_col = id_col, text_col

    def _lookup(self, keys, table, counts):
        if not len(table):
            return np.zeros(len(keys), np.int64)
        pos = np.clip(np.searchsorted(table, keys), 0, len(table) - 1)
        hit = table[pos] == keys
        return np.where(hit, counts[pos], 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, didx, n = _doc_tokens(batch.column(self.text_col))
        logp_sum = np.zeros(n, np.float64)
        nbg = np.zeros(n, np.int64)
        if len(toks) > 1:
            adj = didx[:-1] == didx[1:]
            prev, cur = toks[:-1][adj], toks[1:][adj]
            dbg = didx[:-1][adj]
            bk = np.char.add(np.char.add(prev.astype(str), "\x1f"),
                             cur.astype(str)).astype(object)
            cb = self._lookup(bk, self.bg_keys, self.bg_cnt)
            cp = self._lookup(prev.astype(object),
                              self.prev_tok, self.prev_cnt)
            lp = np.log((cb + 1.0) / (cp + float(self.V)))
            logp_sum = np.bincount(dbg, weights=lp, minlength=n)
            nbg = np.bincount(dbg, minlength=n).astype(np.int64)
        with np.errstate(invalid="ignore"):
            logp = np.where(nbg > 0, logp_sum / np.maximum(nbg, 1), 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bigrams": pa.array(nbg),
            "logp": pa.array(np.round(logp, 6), pa.float64()),
            "ppl": pa.array(np.round(np.exp(-logp), 6), pa.float64())})


def bigram_perplexity(docs_ds, model: dict, *, id_col: str = "doc_id",
                      text_col: str = "text", concurrency=None):
    from ..context import auto_pool

    return docs_ds.map_batches(
        BigramScorer, batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
        fn_constructor_kwargs={"model_bc": Broadcast(model),
                               "id_col": id_col, "text_col": text_col})


# ---------------------------------------------------------------------------
# Stupid Backoff trigram scoring (Brants et al., EMNLP 2007)
# ---------------------------------------------------------------------------

def fit_sb_lm(docs_ds, *, text_col: str = "text",
              min_count: int = 1) -> dict:
    """Trigram/bigram/unigram counts in ONE tagged-key groupby →
    Stupid Backoff model.  Score of w3 given (w1, w2):

        s = c(w1 w2 w3) / c(w1 w2)            if the trigram was seen
          = 0.4 · c(w2 w3) / c(w2)            elif the bigram was seen
          = 0.4² · (c(w3)+1) / (N+V)          otherwise (add-one base,
                                               so OOV stays finite)

    All context counts come from the n-gram tables themselves
    (Σ over continuations), the same convention as fit_bigram_lm.  The
    model broadcasts once; at web scale the trigram table outgrows the
    broadcast first — the fallback is a hash join on the packed key."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, didx, _ = _doc_tokens(t.column(text_col))
        rows_k, rows_c = [], []
        if len(toks) > 2:
            adj3 = didx[:-2] == didx[2:]
            w1, w2, w3 = toks[:-2][adj3], toks[1:-1][adj3], toks[2:][adj3]
            tk = np.char.add(np.char.add(
                np.char.add(np.char.add(w1.astype(str), "\x1f"),
                            w2.astype(str)), "\x1f"), w3.astype(str))
            kk, cc = np.unique(tk, return_counts=True)
            rows_k.append(np.char.add("t\x1e", kk)); rows_c.append(cc)
        if len(toks) > 1:
            adj = didx[:-1] == didx[1:]
            bk = np.char.add(np.char.add(toks[:-1][adj].astype(str),
                                         "\x1f"),
                             toks[1:][adj].astype(str))
            kk, cc = np.unique(bk, return_counts=True)
            rows_k.append(np.char.add("b\x1e", kk)); rows_c.append(cc)
        if len(toks):
            ut, uc = np.unique(toks, return_counts=True)
            rows_k.append(np.char.add("u\x1e", ut.astype(str)))
            rows_c.append(uc)
        if not rows_k:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(rows_k), pa.string()),
            "cnt": pa.array(np.concatenate(rows_c).astype(np.int64))})

    agg = _prune_ngram_counts(
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")),
        min_count).to_pandas()
    keys = agg["key"].to_numpy().astype(str)
    cnt = agg["cnt"].to_numpy().astype(np.int64)

    def grab(tag):
        m = np.char.startswith(keys, tag + "\x1e")
        kk = np.asarray([k[2:] for k in keys[m]], dtype=object)
        cc = cnt[m]
        order = np.argsort(kk)
        return kk[order], cc[order]

    tg_k, tg_c = grab("t")
    bg_k, bg_c = grab("b")
    un_k, un_c = grab("u")
    # context counts = sum over continuations of the next-order table
    ctx2 = np.asarray([k.rsplit("\x1f", 1)[0] for k in tg_k], dtype=object)
    c2_u, c2_i = np.unique(ctx2, return_inverse=True)
    c2_c = np.bincount(c2_i, weights=tg_c).astype(np.int64) \
        if len(tg_k) else np.empty(0, np.int64)
    ctx1 = np.asarray([k.rsplit("\x1f", 1)[0] for k in bg_k], dtype=object)
    c1_u, c1_i = np.unique(ctx1, return_inverse=True)
    c1_c = np.bincount(c1_i, weights=bg_c).astype(np.int64) \
        if len(bg_k) else np.empty(0, np.int64)
    return {"tg_k": tg_k, "tg_c": tg_c, "bg_k": bg_k, "bg_c": bg_c,
            "un_k": un_k, "un_c": un_c, "c2_u": c2_u, "c2_c": c2_c,
            "c1_u": c1_u, "c1_c": c1_c,
            "N": int(un_c.sum()) if len(un_c) else 0,
            "V": int(len(un_k))}


class SBScorer:
    """Actor stage: docs → (doc_id, n_trigrams, logs, sb_ppl) under the
    broadcast Stupid Backoff model."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.m = model_bc.get()
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def _lookup(keys, table, counts):
        if not len(table):
            return np.zeros(len(keys), np.int64)
        pos = np.clip(np.searchsorted(table, keys), 0, len(table) - 1)
        hit = table[pos] == keys
        return np.where(hit, counts[pos], 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        toks, didx, n = _doc_tokens(batch.column(self.text_col))
        logs_sum = np.zeros(n, np.float64)
        ntg = np.zeros(n, np.int64)
        if len(toks) > 2:
            adj3 = didx[:-2] == didx[2:]
            w1, w2, w3 = toks[:-2][adj3], toks[1:-1][adj3], toks[2:][adj3]
            dtg = didx[:-2][adj3]
            k12 = np.char.add(np.char.add(w1.astype(str), "\x1f"),
                              w2.astype(str)).astype(object)
            k123 = np.char.add(np.char.add(k12.astype(str), "\x1f"),
                               w3.astype(str)).astype(object)
            k23 = np.char.add(np.char.add(w2.astype(str), "\x1f"),
                              w3.astype(str)).astype(object)
            c123 = self._lookup(k123, m["tg_k"], m["tg_c"])
            c12 = self._lookup(k12, m["c2_u"], m["c2_c"])
            c23 = self._lookup(k23, m["bg_k"], m["bg_c"])
            c2 = self._lookup(w2.astype(object), m["c1_u"], m["c1_c"])
            c3 = self._lookup(w3.astype(object), m["un_k"], m["un_c"])
            base = 0.16 * (c3 + 1.0) / (m["N"] + m["V"])
            s2 = np.where((c23 > 0) & (c2 > 0),
                          0.4 * c23 / np.maximum(c2, 1), base)
            s = np.where((c123 > 0) & (c12 > 0),
                         c123 / np.maximum(c12, 1.0), s2)
            lp = np.log(s)
            logs_sum = np.bincount(dtg, weights=lp, minlength=n)
            ntg = np.bincount(dtg, minlength=n).astype(np.int64)
        logs = np.where(ntg > 0, logs_sum / np.maximum(ntg, 1), 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_trigrams": pa.array(ntg),
            "logs": pa.array(np.round(logs, 6), pa.float64()),
            "sb_ppl": pa.array(np.round(np.exp(-logs), 6), pa.float64())})


def stupid_backoff_score(docs_ds, model: dict, *, id_col: str = "doc_id",
                         text_col: str = "text", concurrency=None):
    from ..context import auto_pool

    return docs_ds.map_batches(
        SBScorer, batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
        fn_constructor_kwargs={"model_bc": Broadcast(model),
                               "id_col": id_col, "text_col": text_col})


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
# Goodman 1999) — the standard-smoothing member of the LM-quality family
# (add-one unigram / add-one bigram / Stupid Backoff live above).
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75


def fit_kn_lm(docs_ds, *, text_col: str = "text",
              min_count: int = 1) -> dict:
    """Bigram counts + the KN continuation statistics in ONE pass over
    the fit split (same combiner→groupby shape as fit_bigram_lm):

        cb(w1,w2)  bigram count
        cp(w1)     prefix total        = Σ_w2 cb(w1,w2)
        r1(w1)     distinct right types = |{w2 : cb>0}|
        l2(w2)     distinct left types  = |{w1 : cb>0}|
        T          total bigram types, V vocab size

    Score (KNScorer):  pcont = (l2+1)/(T+V)  [add-one floored so OOV
    stays finite — the house convention];  seen prefix →
    max(cb−D,0)/cp + ((D·r1)/cp)·pcont;  unseen prefix → pcont."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, didx, _ = _doc_tokens(t.column(text_col))
        rows_k, rows_c = [], []
        if len(toks) > 1:
            adj = didx[:-1] == didx[1:]
            prev, cur = toks[:-1][adj], toks[1:][adj]
            bk = np.char.add(np.char.add(prev.astype(str), "\x1f"),
                             cur.astype(str))
            kk, cnt = np.unique(bk, return_counts=True)
            rows_k.append(np.char.add("b\x1e", kk))
            rows_c.append(cnt)
        if len(toks):
            ut = np.unique(toks)
            rows_k.append(np.char.add("u\x1e", ut.astype(str)))
            rows_c.append(np.ones(len(ut), np.int64))
        if not rows_k:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(rows_k), pa.string()),
            "cnt": pa.array(np.concatenate(rows_c).astype(np.int64))})

    agg = _prune_ngram_counts(
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")),
        min_count).to_pandas()
    keys = agg["key"].to_numpy().astype(str)
    cnt = agg["cnt"].to_numpy().astype(np.int64)
    is_bg = np.char.startswith(keys, "b\x1e")
    bg_keys = np.asarray([k[2:] for k in keys[is_bg]], dtype=object)
    bg_cnt = cnt[is_bg]
    # vocab size: u-rows carry per-batch-distinct counts; presence is
    # what matters
    n_vocab = int((~is_bg).sum())
    split = [k.split("\x1f", 1) for k in bg_keys]
    prevs = np.asarray([s[0] for s in split], dtype=object)
    curs = np.asarray([s[1] for s in split], dtype=object)
    p_uniq, p_inv = np.unique(prevs, return_inverse=True)
    p_cnt = np.bincount(p_inv, weights=bg_cnt).astype(np.int64)
    p_types = np.bincount(p_inv).astype(np.int64)
    c_uniq, c_inv = np.unique(curs, return_inverse=True)
    c_types = np.bincount(c_inv).astype(np.int64)
    order = np.argsort(bg_keys)
    return {"bg_keys": bg_keys[order], "bg_cnt": bg_cnt[order],
            "prev_tok": p_uniq, "prev_cnt": p_cnt, "prev_types": p_types,
            "cur_tok": c_uniq, "cur_types": c_types,
            "T": int(len(bg_keys)), "V": n_vocab}


class KNScorer:
    """Actor stage: docs → (doc_id, n_bigrams, logp, ppl) under the
    interpolated-KN model above.  Every per-bigram probability is one
    fixed-order IEEE chain, so the SQL twin lands on identical values
    before the 6-dp round."""

    def __init__(self, model_bc: Broadcast, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        m = model_bc.get()
        self.m = m
        self.id_col, self.text_col = id_col, text_col

    def _lookup(self, keys, table, counts):
        if not len(table):
            return np.zeros(len(keys), np.int64)
        pos = np.clip(np.searchsorted(table, keys), 0, len(table) - 1)
        hit = table[pos] == keys
        return np.where(hit, counts[pos], 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        toks, didx, n = _doc_tokens(batch.column(self.text_col))
        logp_sum = np.zeros(n, np.float64)
        nbg = np.zeros(n, np.int64)
        if len(toks) > 1:
            adj = didx[:-1] == didx[1:]
            prev, cur = toks[:-1][adj], toks[1:][adj]
            dbg = didx[:-1][adj]
            bk = np.char.add(np.char.add(prev.astype(str), "\x1f"),
                             cur.astype(str)).astype(object)
            cb = self._lookup(bk, m["bg_keys"], m["bg_cnt"]) \
                .astype(np.float64)
            po = prev.astype(object)
            cp = self._lookup(po, m["prev_tok"], m["prev_cnt"]) \
                .astype(np.float64)
            r1 = self._lookup(po, m["prev_tok"], m["prev_types"]) \
                .astype(np.float64)
            l2 = self._lookup(cur.astype(object),
                              m["cur_tok"], m["cur_types"]) \
                .astype(np.float64)
            pcont = (l2 + 1.0) / float(m["T"] + m["V"])
            cpf = np.maximum(cp, 1.0)
            p_seen = np.maximum(cb - KN_DISCOUNT, 0.0) / cpf \
                + ((KN_DISCOUNT * r1) / cpf) * pcont
            p = np.where(cp > 0, p_seen, pcont)
            lp = np.log(p)
            logp_sum = np.bincount(dbg, weights=lp, minlength=n)
            nbg = np.bincount(dbg, minlength=n).astype(np.int64)
        with np.errstate(invalid="ignore"):
            logp = np.where(nbg > 0, logp_sum / np.maximum(nbg, 1), 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bigrams": pa.array(nbg),
            "logp": pa.array(np.round(logp, 6), pa.float64()),
            "ppl": pa.array(np.round(np.exp(-logp), 6), pa.float64())})


def kn_perplexity(docs_ds, model: dict, *, id_col: str = "doc_id",
                  text_col: str = "text", concurrency=None):
    from ..context import auto_pool

    return docs_ds.map_batches(
        KNScorer, batch_format="pyarrow",
        concurrency=concurrency or auto_pool(),
        fn_constructor_kwargs={"model_bc": Broadcast(model),
                               "id_col": id_col, "text_col": text_col})
