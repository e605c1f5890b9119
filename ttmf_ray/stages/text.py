"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Pure per-batch functions; the quality/token formulas are deliberately
SQL-expressible (mirrored in ``__ray_entry__.oracle_sql``) so the driver's
DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..context import half_up
import pyarrow.compute as pc

# --- language ID: n-gram/stopword heuristic over a closed profile set -----

_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "for", "with", "that",
           "on", "as", "are", "this", "at", "by", "from", "it", "an", "be"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
           "est", "que", "pour", "dans", "qui", "au", "pas", "sur", "avec", "ne"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist",
           "des", "im", "nicht", "ein", "eine", "auf", "als", "auch", "es", "an"},
    "es": {"el", "la", "los", "las", "de", "y", "en", "un", "una", "del",
           "es", "que", "por", "con", "no", "se", "su", "para", "al", "como"},
}

_WORD = re.compile(r"[a-zA-Z]+")


def detect_lang(text: str) -> str:
    """Most-overlapping stopword profile; ties broken by profile order."""
    words = [w.lower() for w in _WORD.findall(text)]
    if not words:
        return "und"
    best, best_score = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        score = sum(1 for w in words if w in prof)
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Vectorized ``detect_lang`` over the batch: one regex split, token
    codes via ``pd.factorize``, profile membership tested once per UNIQUE
    token, per-doc scores via ``bincount``.  Tie rule identical to the
    scalar loop: first profile in insertion order wins; all-zero → und."""
    import pandas as pd

    col = _as_array(batch.column(text_col))
    flat, doc_idx, n = _split_flat(pc.utf8_lower(col), "[^a-z]+")
    codes, uniq = pd.factorize(flat)
    scores = np.zeros((n, len(_LANG_PROFILES)), dtype=np.int64)
    for j, prof in enumerate(_LANG_PROFILES.values()):
        hit = np.isin(uniq, np.asarray(sorted(prof), dtype=object))[codes]
        scores[:, j] = np.bincount(doc_idx[hit], minlength=n)
    names = np.asarray(list(_LANG_PROFILES), dtype=object)
    langs = np.where(scores.max(axis=1) == 0, "und",
                     names[scores.argmax(axis=1)])
    return batch.append_column("lang_pred", pa.array(langs, pa.string()))


# --- quality scoring (SQL-mirrored formulas) ------------------------------

_EN_STOP = sorted(_LANG_PROFILES["en"])
_PUNCT_CLASS = r"[.,!?;:]"
_PUNCT_RX = re.compile(_PUNCT_CLASS)
# pinned whitespace tokenizer — explicit ASCII class so the DuckDB oracle
# (string_split_regex with the same class) matches token-for-token
_WS_RX = re.compile(r"[ \t\n\r\f\v]+")


def ws_tokens(text: str) -> list[str]:
    return [t for t in _WS_RX.split(text) if t]


def _as_array(col) -> pa.Array:
    """ChunkedArray|Array → single Array (batches are small by contract)."""
    if isinstance(col, pa.ChunkedArray):
        combined = col.combine_chunks()
        if isinstance(combined, pa.ChunkedArray):
            return combined.chunk(0) if combined.num_chunks else \
                pa.array([], col.type)
        return combined
    return col


def _split_flat(col: pa.Array, pattern: str):
    """Regex-split every string → (flat token ndarray, doc index per token,
    n_docs).  One Arrow kernel + numpy bookkeeping — no per-doc loop."""
    split = pc.split_pattern_regex(col, pattern=pattern)
    offs = split.offsets.to_numpy()
    counts = np.diff(offs).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    flat = split.flatten().to_numpy(zero_copy_only=False)
    return flat, doc_idx, len(counts)


def quality_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """Per-doc quality features.

    Definitions (exactly mirrored in oracle SQL):
      n_chars    = length(text)
      n_tokens   = #whitespace-separated tokens
      punct_cnt  = #chars in [.,!?;:]
      stop_cnt   = #tokens whose lowercase strip('.,!?;:') form is an EN stopword
    """
    import pandas as pd

    col = _as_array(batch.column(text_col))
    n = len(col)
    n_chars = pc.utf8_length(col).to_numpy().astype(np.int64)
    punct_cnt = pc.count_substring_regex(col, _PUNCT_CLASS) \
        .to_numpy().astype(np.int64)
    flat, doc_idx, _ = _split_flat(col, r"[ \t\n\r\f\v]+")
    nonempty = flat != ""
    n_tokens = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
    # stopword test once per UNIQUE token (lower + strip on uniques only)
    codes, uniq = pd.factorize(flat)
    stripped = pd.Series(uniq, dtype=object).str.lower().str.strip(".,!?;:")
    is_stop = stripped.isin(set(_EN_STOP)).to_numpy()
    stop_cnt = np.bincount(doc_idx[is_stop[codes] & nonempty],
                           minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "punct_cnt": pa.array(punct_cnt),
            "stop_cnt": pa.array(stop_cnt),
        }
    )


# --- token counting (whitespace + BPE-ish subword estimate) ---------------

_BPE_RX = re.compile(r"[A-Za-z]{1,4}|[0-9]{1,3}|\S")


def token_count_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    col = _as_array(batch.column(text_col))
    flat, doc_idx, n = _split_flat(col, r"[ \t\n\r\f\v]+")
    ws = np.bincount(doc_idx[flat != ""], minlength=n).astype(np.int64)
    # BPE-ish estimate stays a Python findall: leftmost-FIRST alternation
    # (Python re) is the pinned semantics; Arrow/RE2 kernels differ on it
    bpe = np.fromiter(
        (len(_BPE_RX.findall(t)) for t in col.to_pylist()),
        dtype=np.int64, count=n,
    )
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "ws_tokens": pa.array(ws),
            "bpe_tokens": pa.array(bpe),
        }
    )


# --- repetition signals (Gopher-style quality filters, word-level) --------

def repetition_batch(batch: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Per-doc repetition signals for training-data filtering — the
    word-level adaptation of the Gopher repetition rules (duplicate-line
    / top-n-gram fractions) to single-line documents:

      n_words         = len(split(text, ' '))        (empties kept — SQL twin)
      dup_word_frac   = (n_words - n_unique_words) / n_words
      top_word_frac   = count(most frequent word) / n_words
      top_bigram_frac = 2 * count(most frequent adjacent pair) / n_words

    Fully vectorized: one Arrow split per batch, ``pd.factorize`` token
    codes, packed (doc, code) keys through ``np.unique`` — no per-doc
    Python loop.  Exactly mirrored in ``__ray_entry__._REPETITION_SQL``.
    """
    import pandas as pd

    ids = batch.column(id_col)
    col = _as_array(batch.column(text_col))
    split = pc.split_pattern(col, pattern=" ")
    offs = split.offsets.to_numpy()
    counts = np.diff(offs).astype(np.int64)          # n_words per doc (≥1)
    n_docs = len(counts)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    flat = split.flatten().to_numpy(zero_copy_only=False)
    codes, uniques = pd.factorize(flat)
    codes = codes.astype(np.int64)
    V = max(len(uniques), 1)

    # per-(doc, word) counts → n_unique + top word count per doc
    key = doc_idx * V + codes
    uk, uc = np.unique(key, return_counts=True)
    udoc = uk // V
    n_unique = np.bincount(udoc, minlength=n_docs).astype(np.int64)
    top_w = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top_w, udoc, uc)

    # adjacent pairs within a doc → top bigram count per doc
    same = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) > 1 else \
        np.zeros(0, dtype=bool)
    top_bg = np.zeros(n_docs, dtype=np.int64)
    if same.any():
        pair = (codes[:-1][same] << 32) | codes[1:][same]
        pcodes, puniq = pd.factorize(pair)
        P = len(puniq)
        key2 = doc_idx[:-1][same] * P + pcodes.astype(np.int64)
        bk, bc = np.unique(key2, return_counts=True)
        np.maximum.at(top_bg, bk // P, bc)

    nf = counts.astype(np.float64)
    return pa.table({
        "doc_id": ids,
        "n_words": pa.array(counts),
        "dup_word_frac": pa.array((counts - n_unique) / nf),
        "top_word_frac": pa.array(top_w / nf),
        "top_bigram_frac": pa.array(2.0 * top_bg / nf),
    })


# --- rolling-hash fingerprint ---------------------------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def fingerprint(text: str) -> int:
    """Polynomial rolling hash of the whole document (mod 2^61-1)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def fingerprint_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    fps = np.fromiter(
        (fingerprint(t) for t in batch.column(text_col).to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    return pa.table(
        {"doc_id": batch.column(id_col), "fingerprint": pa.array(fps)}
    )


# --- simple vectorized filters --------------------------------------------

def filter_lang(batch: pa.Table, *, lang: str, lang_col: str = "lang") -> pa.Table:
    return batch.filter(pc.equal(batch.column(lang_col), pa.scalar(lang)))


# --- PII redaction (corpus-curation pass) ----------------------------------

# Rules applied IN ORDER (each counts against the text as left by the
# previous rule — the SQL mirror stages the same sequence).  Both engines
# run RE2 (Arrow's count/replace_substring_regex and DuckDB's regexp_*),
# so match semantics are identical by construction.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii_batch(batch: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Per-doc PII redaction + counts (email → IPv4 → phone, in order).

    One Arrow RE2 count + one global replace per rule per batch — no
    per-row Python.  Emits (id, n_email, n_ipv4, n_phone, text_redacted).
    """
    col = _as_array(batch.column(text_col))
    out: dict = {id_col: batch.column(id_col)}
    for name, rx, tok in PII_RULES:
        out[f"n_{name}"] = pa.array(
            pc.count_substring_regex(col, rx).to_numpy().astype(np.int64))
        col = pc.replace_substring_regex(col, pattern=rx, replacement=tok)
    out["text_redacted"] = col
    return pa.table(out)


# --- unigram word entropy (lexical-diversity quality signal) ---------------

def word_entropy_batch(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Per-doc unigram word entropy H = −Σ_w p_w·ln p_w over the
    `[0-9a-z_]+` word occurrences (the shingle word class), plus the
    ln(n_unique)-normalized form — the lexical-diversity companion to
    the Gopher repetition rules (low-entropy docs are boilerplate/spam).

    Pure per-batch kernel: per-doc counts never leave the worker, so the
    stage streams with zero shuffle at corpus scale.  Exactly mirrored
    in SQL term-for-term; both engines round to 6 dp (per-doc sums are
    ≤ a few hundred float64 terms, so cross-engine summation-order drift
    is ~1e-14 ≪ the rounding grain)."""
    import pandas as pd

    from .classify import _doc_words

    ids = batch.column(id_col).to_numpy().astype(np.int64)
    flat, doc_idx, n = _doc_words(batch.column(text_col))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_words": pa.array([], pa.int64()),
                      "n_unique": pa.array([], pa.int64()),
                      "entropy": pa.array([], pa.float64()),
                      "norm_entropy": pa.array([], pa.float64())})
    if not len(flat):
        return empty
    codes, uniq = pd.factorize(flat)
    key = doc_idx * np.int64(len(uniq)) + codes
    ukey, cnt = np.unique(key, return_counts=True)
    udoc = (ukey // len(uniq)).astype(np.int64)
    n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
    n_unique = np.bincount(udoc, minlength=n).astype(np.int64)
    p = cnt.astype(np.float64) / n_words[udoc].astype(np.float64)
    ent = np.bincount(udoc, weights=-(p * np.log(p)), minlength=n)
    keep = n_words > 0          # zero-word docs have no SQL group row
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = np.where(n_unique > 1,
                        ent / np.log(n_unique.astype(np.float64)), 0.0)
    return pa.table({"doc_id": pa.array(ids[keep]),
                     "n_words": pa.array(n_words[keep]),
                     "n_unique": pa.array(n_unique[keep]),
                     "entropy": pa.array(np.round(ent[keep], 6)),
                     "norm_entropy": pa.array(np.round(norm[keep], 6))})


# --- Gopher-style quality rules (Rae et al. 2021, App. A) ------------------

GOPHER_STOPS = sorted(["the", "be", "to", "of", "and", "that", "have",
                       "with"])
_BULLET_PREFIXES = ("- ", "* ", "• ")


def gopher_quality_batch(batch: pa.Table, *, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """Per-doc Gopher quality signals + the composed keep flag.

    Definitions (exactly mirrored in oracle SQL; every ratio is an
    integer/integer division rounded at 6 dp, and ``keep`` compares the
    ROUNDED values):

      n_words       #whitespace tokens
      mean_word_len Σ len(word) / n_words
      symbol_ratio  (#'#' chars + #non-overlapping '...') / n_words
      bullet_frac   #lines starting with '- ', '* ' or '• ' / n_lines
      ellipsis_frac #lines ending with '...' / n_lines
      alpha_frac    #words containing [a-zA-Z] / n_words
      stop_hits     #words whose lowercase '.,!?;:'-strip is a Gopher
                    stopword (the/be/to/of/and/that/have/with)
      keep          20 ≤ n_words ≤ 100000 ∧ 3 ≤ mwl ≤ 10 ∧ sr ≤ 0.1
                    ∧ bf ≤ 0.9 ∧ ef ≤ 0.3 ∧ af ≥ 0.8 ∧ stop_hits ≥ 2
    """
    import pandas as pd

    col = _as_array(batch.column(text_col))
    flat, doc_idx, n = _split_flat(col, r"[ \t\n\r\f\v]+")
    keep_t = flat != ""
    words, widx = flat[keep_t], doc_idx[keep_t]
    n_words = np.bincount(widx, minlength=n).astype(np.int64)
    wl = np.char.str_len(words.astype(str)).astype(np.int64)
    sum_len = np.bincount(widx, weights=wl, minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(
        pa.array(words, pa.string()), "[a-zA-Z]").to_numpy(
        zero_copy_only=False)
    alpha_cnt = np.bincount(widx[alpha], minlength=n).astype(np.int64)
    stripped = pd.Series(words).str.lower() \
        .str.strip(".,!?;:").to_numpy(dtype=object)
    stop = np.isin(stripped, np.asarray(GOPHER_STOPS, dtype=object))
    stop_hits = np.bincount(widx[stop], minlength=n).astype(np.int64)

    lines, lidx, _ = _split_flat(col, "\n")
    n_lines = np.bincount(lidx, minlength=n).astype(np.int64)
    ls = lines.astype(str)
    bullet = np.zeros(len(ls), bool)
    for pre in _BULLET_PREFIXES:
        bullet |= np.char.startswith(ls, pre)
    bullet_cnt = np.bincount(lidx[bullet], minlength=n).astype(np.int64)
    ell = np.char.endswith(ls, "...")
    ell_cnt = np.bincount(lidx[ell], minlength=n).astype(np.int64)

    hash_cnt = pc.count_substring(col, "#").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ell3_cnt = pc.count_substring(col, "...").to_numpy(
        zero_copy_only=False).astype(np.int64)

    nw = np.maximum(n_words, 1).astype(np.float64)
    nl = np.maximum(n_lines, 1).astype(np.float64)
    mwl = half_up(np.where(n_words > 0, sum_len / nw, 0.0), 6)
    sr = half_up(np.where(n_words > 0, (hash_cnt + ell3_cnt) / nw, 0.0),
                 6)
    bf = half_up(bullet_cnt / nl, 6)
    ef = half_up(ell_cnt / nl, 6)
    af = half_up(np.where(n_words > 0, alpha_cnt / nw, 0.0), 6)
    keep = ((n_words >= 20) & (n_words <= 100000)
            & (mwl >= 3.0) & (mwl <= 10.0) & (sr <= 0.1)
            & (bf <= 0.9) & (ef <= 0.3) & (af >= 0.8)
            & (stop_hits >= 2)).astype(np.int64)
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(mwl, pa.float64()),
        "symbol_ratio": pa.array(sr, pa.float64()),
        "bullet_frac": pa.array(bf, pa.float64()),
        "ellipsis_frac": pa.array(ef, pa.float64()),
        "alpha_frac": pa.array(af, pa.float64()),
        "stop_hits": pa.array(stop_hits),
        "keep": pa.array(keep),
    })


# --- MATTR lexical diversity (Covington & McFall 2010) ---------------------

def mattr_batch(batch: pa.Table, *, w: int = 25, id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """Per-doc moving-average type-token ratio over ``w``-token windows
    (lowercase whitespace tokens), plus the plain TTR.  Docs shorter
    than ``w`` fall back to TTR (n_windows = 0).

    The window-distinct total never materializes per window: token i at
    in-doc position p with previous same-token position q contributes
    to exactly max(0, min(p, n−w) − max(q+1, p−w+1) + 1) windows, so
    ΣD is one vectorized integer sum — O(tokens), not O(tokens·w).
    mattr = ΣD / (n_windows·w), one division, rounded 6 dp (identical
    in the SQL twin's lag()-based contribution)."""
    import pandas as pd

    from ..stages.lm_score import _doc_tokens

    toks, didx, n = _doc_tokens(batch.column(text_col))
    n_tok = np.bincount(didx, minlength=n).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    p = np.arange(len(toks), dtype=np.int64) - np.repeat(starts, n_tok)
    # distinct types per doc + previous-occurrence positions
    codes, _uniq = pd.factorize(toks)
    key = didx * np.int64(len(_uniq) + 1) + codes
    n_types = np.zeros(n, np.int64)
    if len(toks):
        first = np.zeros(len(toks), bool)
        order = np.lexsort((p, key))
        ks = key[order]
        first_sorted = np.ones(len(ks), bool)
        first_sorted[1:] = ks[1:] != ks[:-1]
        first[order] = first_sorted
        n_types = np.bincount(didx[first], minlength=n).astype(np.int64)
        q = np.full(len(toks), -1, np.int64)
        prev_sorted = np.full(len(ks), -1, np.int64)
        prev_sorted[1:] = np.where(ks[1:] == ks[:-1], p[order][:-1], -1)
        q[order] = prev_sorted
    nn = n_tok[didx] if len(toks) else np.empty(0, np.int64)
    hi = np.minimum(p, nn - w)
    lo = np.maximum(q + 1, p - w + 1)
    contrib = np.maximum(0, hi - lo + 1)
    sd = np.bincount(didx, weights=contrib, minlength=n).astype(np.int64)
    n_windows = np.maximum(n_tok - w + 1, 0).astype(np.int64)
    safe_n = np.maximum(n_tok, 1).astype(np.float64)
    ttr = half_up(np.where(n_tok > 0, n_types / safe_n, 0.0), 6)
    denom = np.maximum(n_windows * np.int64(w), 1).astype(np.float64)
    mattr = half_up(np.where(n_windows > 0, sd / denom,
                             np.where(n_tok > 0, n_types / safe_n, 0.0)),
                    6)
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(n_tok),
        "n_types": pa.array(n_types),
        "ttr": pa.array(ttr, pa.float64()),
        "n_windows": pa.array(n_windows),
        "mattr": pa.array(mattr, pa.float64()),
    })


# --- Flesch reading ease (Flesch 1948; the classic readability gate) -------

def readability_batch(batch: pa.Table, *, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Per-doc Flesch reading ease over lowered text.

    Definitions (mirrored term-for-term in SQL):
      n_sents     #segments of a '[.!?]+' split containing a word char
      n_words     #lowercase [0-9a-z_]+ runs
      n_syllables Σ per word max(1, #non-overlapping [aeiou]+ groups)
      flesch      (206.835 − 1.015·(w/s)) − 84.6·(sy/w), s and w
                  floored at 1, evaluated in exactly that order,
                  rounded 6 dp.
    """
    col = _as_array(batch.column(text_col))
    low = pc.utf8_lower(col)
    words, widx, n = _split_flat(low, "[^0-9a-z_]+")
    keep = words != ""
    words, widx = words[keep], widx[keep]
    n_words = np.bincount(widx, minlength=n).astype(np.int64)
    groups = pc.count_substring_regex(
        pa.array(words, pa.string()), "[aeiou]+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    syl = np.maximum(groups, 1)
    n_syl = np.bincount(widx, weights=syl, minlength=n).astype(np.int64)
    segs, sidx, _ = _split_flat(low, "[.!?]+")
    has_word = pc.match_substring_regex(
        pa.array(segs, pa.string()), "[0-9a-z_]").to_numpy(
        zero_copy_only=False)
    n_sents = np.bincount(sidx[has_word], minlength=n).astype(np.int64)
    s = np.maximum(n_sents, 1).astype(np.float64)
    w = np.maximum(n_words, 1).astype(np.float64)
    flesch = np.round((206.835 - 1.015 * (n_words / s))
                      - 84.6 * (n_syl / w), 6)
    return pa.table({
        id_col: batch.column(id_col),
        "n_sents": pa.array(n_sents),
        "n_words": pa.array(n_words),
        "n_syllables": pa.array(n_syl),
        "flesch": pa.array(flesch, pa.float64()),
    })
