"""HTML → text extraction + sentence split (phase A, stage 1).

The extractor is PINNED: pure stdlib (``re`` + ``html.unescape``), no
environment-dependent HTML library, so the per-url byte-identical-text
invariant (BASELINE.json ``input_hint``) holds across machines and versions.

Extraction spec v1 (shared with the corpus oracle in sources/pages.py):

1. decode ``html`` bytes as UTF-8,
2. drop ``<script>``/``<style>``/``<nav>``/``<footer>`` elements wholesale,
3. collect block elements ``<title> <h1>..<h6> <p> <li> <blockquote>`` in
   document order,
4. inside a block: strip all tags (inline markup contributes no whitespace),
   unescape HTML entities, no whitespace normalization whatsoever,
5. join non-empty blocks with ``"\n"``.

Both stages are stateless ``map_batches`` functions over Arrow batches; the
regexes are compiled once at module import (shared by every worker that
imports the module — nothing per-batch).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

_DROP = re.compile(
    r"<(script|style|nav|footer)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_BLOCK = re.compile(
    r"<(title|h[1-6]|p|li|blockquote)\b[^>]*>(.*?)</\1>",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<[^>]+>")
_SENT_SPLIT = re.compile(r"(?<=[.!?]) +")


def extract_text(html: bytes | str) -> str:
    """Pinned extraction of one document (spec v1 above)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _DROP.sub("", html)
    blocks = []
    for m in _BLOCK.finditer(html):
        inner = _TAG.sub("", m.group(2))
        inner = _html.unescape(inner)
        if inner:
            blocks.append(inner)
    return "\n".join(blocks)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: (url, warc_ts, html, lang, ...) → + extracted_text.

    Arrow in / Arrow out; the per-row regex pass is the irreducible parse
    work (HTML is not vectorizable by pyarrow.compute kernels).
    """
    htmls = batch.column("html")
    texts = pa.array([extract_text(h.as_py()) for h in htmls], pa.string())
    return batch.append_column("extracted_text", texts)


def split_sentences(text: str) -> list[str]:
    """Blocks (newline-separated) → sentences (split on terminator + space)."""
    out = []
    for block in text.split("\n"):
        for s in _SENT_SPLIT.split(block):
            s = s.strip()
            if s:
                out.append(s)
    return out


def sentences_batch(batch: pa.Table, *, text_col: str = "extracted_text") -> pa.Table:
    """map_batches stage: explode pages into (url, sent_id, sentence) rows."""
    urls = batch.column("url").to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_url: list[str] = []
    out_sid: list[int] = []
    out_sent: list[str] = []
    for u, t in zip(urls, texts):
        for sid, s in enumerate(split_sentences(t)):
            out_url.append(u)
            out_sid.append(sid)
            out_sent.append(s)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "sent_id": pa.array(np.asarray(out_sid, dtype=np.int32)),
            "sentence": pa.array(out_sent, pa.string()),
        }
    )
