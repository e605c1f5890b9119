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
    langs = [detect_lang(t) for t in batch.column(text_col).to_pylist()]
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


def quality_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """Per-doc quality features.

    Definitions (exactly mirrored in oracle SQL):
      n_chars    = length(text)
      n_tokens   = #whitespace-separated tokens
      punct_cnt  = #chars in [.,!?;:]
      stop_cnt   = #tokens whose lowercase strip('.,!?;:') form is an EN stopword
    """
    texts = batch.column(text_col).to_pylist()
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    n_tokens = np.empty(len(texts), dtype=np.int64)
    punct_cnt = np.empty(len(texts), dtype=np.int64)
    stop_cnt = np.empty(len(texts), dtype=np.int64)
    stops = set(_EN_STOP)
    for i, t in enumerate(texts):
        toks = ws_tokens(t)
        n_tokens[i] = len(toks)
        punct_cnt[i] = len(_PUNCT_RX.findall(t))
        stop_cnt[i] = sum(
            1 for w in toks if w.lower().strip(".,!?;:") in stops
        )
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
    texts = batch.column(text_col).to_pylist()
    ws = np.fromiter(
        (len(ws_tokens(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    bpe = np.fromiter(
        (len(_BPE_RX.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "ws_tokens": pa.array(ws),
            "bpe_tokens": pa.array(bpe),
        }
    )


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
