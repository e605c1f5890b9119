"""Deterministic Common-Crawl-style synthetic page corpus (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``)::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every column is a pure function of ``(seed, row_index)`` — no RNG state, no
external data — so any shard can be (re)generated independently at any
scale, which is exactly what a 10^12-document corpus needs: generation is a
``ray.data.range(n).map_batches(...)`` pipeline, and the oracle (expected
extracted text, expected triples) is computable per row without running the
pipeline.

The page embeds factual sentences drawn from a closed (entity, relation)
vocabulary, rendered through HTML templates with nav/script/style/footer
boilerplate and inline markup noise, so that extraction is non-trivial but
exactly determined.  The ``text`` column is the ground-truth extraction the
pipeline must reproduce byte-identically per url.

Entity popularity is skewed (s ~ U^3) so hub entities exist — exercising
the salted-key canonicalization path (SURVEY.md §7.4) like the reference's
hub-entity subgraph blow-up (/root/reference/README.md:57).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# splitmix64 — the only randomness primitive; pure function of its inputs.
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1


def mix64(*xs: int) -> int:
    """Deterministic 64-bit hash of a tuple of ints (splitmix64 core)."""
    h = 0x9E3779B97F4A7C15
    for x in xs:
        h = (h ^ (x & _M)) * 0xBF58476D1CE4E5B9 & _M
        h = (h ^ (h >> 27)) * 0x94D049BB133111EB & _M
        h = h ^ (h >> 31)
    return h


def u01(*xs: int) -> float:
    return mix64(*xs) / float(1 << 64)


def mix64_vec(*xs) -> np.ndarray:
    """Vectorized ``mix64`` — bit-identical for any mix of Python ints and
    numpy integer arrays (broadcast together); uint64 wraparound arithmetic
    replaces the Python-int masking."""
    h = np.uint64(0x9E3779B97F4A7C15)
    k1 = np.uint64(0xBF58476D1CE4E5B9)
    k2 = np.uint64(0x94D049BB133111EB)
    s27, s31 = np.uint64(27), np.uint64(31)
    with np.errstate(over="ignore"):
        for x in xs:
            xv = np.asarray(x).astype(np.int64).astype(np.uint64)
            h = (h ^ xv) * k1
            h = (h ^ (h >> s27)) * k2
            h = h ^ (h >> s31)
    return h


# ---------------------------------------------------------------------------
# Closed vocabulary: entities (person / org / place) and relations.
# ---------------------------------------------------------------------------

_SYL = ["ta", "ri", "ven", "mor", "el", "ka", "do", "su",
        "lin", "bar", "nis", "or", "fel", "gra", "mi", "zo"]
_ORG_SUFFIX = ["Labs", "Systems", "Group", "Industries",
               "Holdings", "& Partners", "Logistics", "Networks"]
_PLACE_PREFIX = ["Port", "Lake", "Mount", "East", "West", "North", "South", "Fort"]

KIND_PERSON, KIND_ORG, KIND_PLACE = 0, 1, 2


def _syllables(idx: int, n: int) -> list[str]:
    out = []
    for _ in range(n):
        out.append(_SYL[idx % 16])
        idx //= 16
    return out


def ent_kind(eid: int) -> int:
    return eid % 3


def ent_name(eid: int) -> str:
    """Canonical surface form of entity ``eid`` (injective per kind)."""
    kind, idx = eid % 3, eid // 3
    if kind == KIND_PERSON:
        s = _syllables(idx, 5)
        return ("".join(s[:2])).capitalize() + " " + ("".join(s[2:])).capitalize()
    if kind == KIND_ORG:
        s = _syllables(idx // 8, 4)
        return ("".join(s)).capitalize() + " " + _ORG_SUFFIX[idx % 8]
    s = _syllables(idx // 8, 3)
    return _PLACE_PREFIX[idx % 8] + " " + ("".join(s)).capitalize()


def surface_form(eid: int, variant: int) -> str:
    """A mention-level surface variant; all variants share one normalized key."""
    name = ent_name(eid)
    v = variant % 4
    if v == 1:
        return name.upper()
    if v == 2:
        return name.lower()
    if v == 3:
        return name.replace(" ", "  ", 1)  # doubled first space
    return name


@dataclass(frozen=True)
class Relation:
    name: str
    subj_kind: int
    obj_kind: int
    templates: tuple[str, ...]  # "{s}"/"{o}" slots; index 0 is primary


# Order matters only for the extractor's pattern list (stages/triples.py);
# here it fixes relation ids (index in RELATIONS).
RELATIONS: tuple[Relation, ...] = (
    Relation("founded", KIND_PERSON, KIND_ORG,
             ("{s} founded {o}.", "{o} was founded by {s}.")),
    Relation("works_at", KIND_PERSON, KIND_ORG, ("{s} works at {o}.",)),
    Relation("ceo_of", KIND_PERSON, KIND_ORG,
             ("{s} is the chief executive of {o}.",)),
    Relation("studied_at", KIND_PERSON, KIND_ORG, ("{s} studied at {o}.",)),
    Relation("hq_in", KIND_ORG, KIND_PLACE, ("{s} is headquartered in {o}.",)),
    Relation("born_in", KIND_PERSON, KIND_PLACE, ("{s} was born in {o}.",)),
    Relation("lives_in", KIND_PERSON, KIND_PLACE, ("{s} lives in {o}.",)),
    Relation("acquired", KIND_ORG, KIND_ORG, ("{s} acquired {o}.",)),
    Relation("partnered_with", KIND_ORG, KIND_ORG, ("{s} partnered with {o}.",)),
    Relation("married_to", KIND_PERSON, KIND_PERSON, ("{s} is married to {o}.",)),
    Relation("near", KIND_PLACE, KIND_PLACE, ("{s} is near {o}.",)),
)

_NOISE = (
    "The weather report mentioned rain for the {n}th day running.",
    "Subscribe to our newsletter for {n} more stories like this.",
    "This article has been read {n} times since publication.",
    "Photo credits appear on page {n} of the print edition.",
    "An earlier version of this story misstated {n} figures.",
    "Traffic on the ring road was delayed by {n} minutes today.",
    "The annual report lists {n} line items under appendix B.",
    "Comments are closed after {n} days.",
)

_LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "en", "fr", "de", "es")


# ---------------------------------------------------------------------------
# Corpus parameters — all derived from (seed, n_pages).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_pages: int = 1000
    # subject-popularity exponent: srank ~ U^skew.  3.0 is the standard
    # corpus (hub subjects exist but are mild); 8.0 makes a SINGLE
    # entity head ~40% of all facts — the deliberately hub-heavy
    # variant for the skew-robustness harness (bench.py --skew).
    # float**int == float**float bitwise in CPython (both route through
    # C pow), so the default reproduces the historical u**3 corpora and
    # existing /tmp caches stay valid.
    skew: float = 3.0

    @property
    def n_entities(self) -> int:
        # sublinear entity growth (≈ pages^0.75, min 60): keeps KG density
        # (facts per entity) GROWING with corpus size like real web corpora
        # (FB15K ≈ 40 triples/entity).  A linear entity count froze density
        # at ~3, starving TransE/graph features of signal at scale.
        return max(60, int(self.n_pages ** 0.75))

    @property
    def n_facts(self) -> int:
        # fact pool ~2 facts per page; pages draw WITH collisions → dup triples.
        return max(120, self.n_pages * 2)


def fact(spec: CorpusSpec, j: int) -> tuple[int, int, int]:
    """Global fact j → (subj_eid, rel_id, obj_eid); pure function.

    Structure (FB15K-like, so trustworthiness features have signal):
    - subject popularity ~ U^3 → hub subjects (hot keys / skew tests);
    - entities live in communities (rank % n_comm); the object stays in
      the subject's community w.p. 0.85 → dense intra-community directed
      subnetworks give true triples reachable paths / PageRank flow that
      uniformly-corrupted triples lack.
    """
    r = mix64(spec.seed, 101, j) % len(RELATIONS)
    rel = RELATIONS[r]
    nk = spec.n_entities // 3  # entities per kind
    n_comm = max(2, nk // 20)  # ~20 entities of each kind per community
    # subject popularity ~ U^3 → hub subjects (hot keys)
    srank = int(u01(spec.seed, 102, j) ** spec.skew * nk) % nk
    if u01(spec.seed, 104, j) < 0.85:
        # same community: ranks sharing srank's residue class mod n_comm
        per_comm = (nk + n_comm - 1) // n_comm
        step = mix64(spec.seed, 103, j) % per_comm
        orank = (srank % n_comm + step * n_comm) % nk
    else:
        orank = mix64(spec.seed, 103, j) % nk
    s = srank * 3 + rel.subj_kind
    o = orank * 3 + rel.obj_kind
    if s == o:  # self-loops only possible for same-kind relations; bump obj
        o = ((orank + 1) % nk) * 3 + rel.obj_kind
    return s, r, o


def page_lang(spec: CorpusSpec, i: int) -> str:
    return _LANGS[mix64(spec.seed, 2, i) % len(_LANGS)]


def page_fact_ids(spec: CorpusSpec, i: int) -> list[int]:
    """Fact-pool indices mentioned by page i (en pages only; 3-8 facts)."""
    if page_lang(spec, i) != "en":
        return []
    k = 3 + mix64(spec.seed, 3, i) % 6
    return [mix64(spec.seed, 4, i, j) % spec.n_facts for j in range(k)]


def render_sentence(spec: CorpusSpec, i: int, j: int) -> str:
    """The fact sentence page i uses for fact j (template + surface variants)."""
    s, r, o = fact(spec, j)
    rel = RELATIONS[r]
    t = rel.templates[mix64(spec.seed, 5, i, j) % len(rel.templates)]
    ssurf = surface_form(s, mix64(spec.seed, 6, i, j))
    osurf = surface_form(o, mix64(spec.seed, 7, i, j))
    return t.format(s=ssurf, o=osurf)


def _noise_sentence(spec: CorpusSpec, i: int, j: int) -> str:
    t = _NOISE[mix64(spec.seed, 8, i, j) % len(_NOISE)]
    return t.format(n=mix64(spec.seed, 9, i, j) % 97 + 2)


def page_blocks(spec: CorpusSpec, i: int) -> list[str]:
    """Plain-text blocks of page i: [title, h1, para1, para2, ...].

    The joined-by-newline form of this list IS the ``text`` oracle column.
    """
    lang = page_lang(spec, i)
    fids = page_fact_ids(spec, i)
    if lang != "en" or not fids:
        title = f"Bulletin {i}"
        sents = [_noise_sentence(spec, i, 50 + j) for j in range(4)]
        return [title, title, " ".join(sents[:2]), " ".join(sents[2:])]

    title = "Notes on " + ent_name(fact(spec, fids[0])[0])
    sentences: list[str] = []
    for k, fj in enumerate(fids):
        sentences.append(render_sentence(spec, i, fj))
        if mix64(spec.seed, 10, i, k) % 3 == 0:
            sentences.append(_noise_sentence(spec, i, k))
    # group into paragraphs of 2-4 sentences
    paras: list[str] = []
    pos = 0
    g = 0
    while pos < len(sentences):
        take = 2 + mix64(spec.seed, 11, i, g) % 3
        paras.append(" ".join(sentences[pos:pos + take]))
        pos += take
        g += 1
    return [title, title] + paras


def _esc(s: str) -> str:
    return _html.escape(s, quote=False)


def render_html(spec: CorpusSpec, i: int) -> str:
    """Compact HTML for page i.

    Inline <b>/<i>/<a> noise wraps deterministic word spans; block structure
    (title/h1/p) carries the payload; nav/script/style/footer are boilerplate
    the extractor must drop.  No inter-tag whitespace is emitted, so
    extraction is byte-exact by construction.
    """
    blocks = page_blocks(spec, i)
    title, h1, paras = blocks[0], blocks[1], blocks[2:]

    def inline(text: str, key: int) -> str:
        words = text.split(" ")
        if len(words) > 3 and mix64(spec.seed, 12, i, key) % 2 == 0:
            w = mix64(spec.seed, 13, i, key) % (len(words) - 1)
            tag = ("b", "i", "em")[mix64(spec.seed, 14, i, key) % 3]
            words[w] = f"<{tag}>{_esc(words[w])}</{tag}>"
            return " ".join(
                _esc(x) if k != w else x for k, x in enumerate(words)
            )
        return _esc(text)

    body = "".join(f"<p>{inline(p, 20 + k)}</p>" for k, p in enumerate(paras))
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{_esc(title)}</title>"
        f"<script>var p_{i} = {mix64(spec.seed, 15, i) % 1000};</script>"
        "<style>.m{color:#333;}</style>"
        "</head><body>"
        '<nav><a href="/">Home</a><a href="/about">About</a></nav>'
        f"<h1>{_esc(h1)}</h1>"
        f"{body}"
        "<footer>&copy; 2026 Example Syndicate.</footer>"
        "</body></html>"
    )


def page_text(spec: CorpusSpec, i: int) -> str:
    return "\n".join(page_blocks(spec, i))


def page_url(i: int) -> str:
    return f"https://example.org/page/{i:09d}"


_BASE_TS = np.datetime64("2025-06-01T00:00:00", "us")


def pages_batch(spec: CorpusSpec, ids: np.ndarray) -> pa.Table:
    """Vectorized-enough batch builder: one Arrow table for a range of pages."""
    urls, htmls, texts, langs = [], [], [], []
    for i in ids.tolist():
        urls.append(page_url(i))
        htmls.append(render_html(spec, i).encode("utf-8"))
        texts.append(page_text(spec, i))
        langs.append(page_lang(spec, i))
    ts = _BASE_TS + ids.astype("timedelta64[us]") * 1_000_000
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Oracle triples (for the P/R harness): the canonical (subj, pred, obj) set
# every en page embeds — this is what the reference extractor "would" emit.
# ---------------------------------------------------------------------------

def oracle_triples_for_page(spec: CorpusSpec, i: int) -> set[tuple[str, str, str]]:
    out = set()
    for fj in page_fact_ids(spec, i):
        s, r, o = fact(spec, fj)
        out.add((ent_name(s), RELATIONS[r].name, ent_name(o)))
    return out


def oracle_triples(spec: CorpusSpec) -> set[tuple[str, str, str]]:
    out: set[tuple[str, str, str]] = set()
    for i in range(spec.n_pages):
        out |= oracle_triples_for_page(spec, i)
    return out


# ---------------------------------------------------------------------------
# Ray corpus materialization (sharded parquet, cached under /tmp).
# ---------------------------------------------------------------------------

def pages_dataset(spec: CorpusSpec, *, shards: int | None = None):
    """A lazy ray.data.Dataset of the corpus (generated, not read from disk)."""
    import ray.data as rd

    n = spec.n_pages
    shards = shards or max(1, min(64, n // 2000 or 1))
    seed, n_pages, skew = spec.seed, spec.n_pages, spec.skew

    def gen(batch: pa.Table) -> pa.Table:
        local = CorpusSpec(seed=seed, n_pages=n_pages, skew=skew)
        ids = batch.column("id").to_numpy()
        return pages_batch(local, ids)

    return (
        rd.range(n, override_num_blocks=shards)
        .map_batches(gen, batch_format="pyarrow", batch_size=4096)
    )


def ensure_pages_parquet(spec: CorpusSpec, root: str = "/tmp/ttmf_pages") -> str:
    """Materialize the corpus once per (seed, n_pages); return the directory."""
    import os

    suffix = "" if spec.skew == 3.0 else f"_k{spec.skew:g}"
    out = os.path.join(root, f"v2_s{spec.seed}_n{spec.n_pages}{suffix}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    pages_dataset(spec).write_parquet(tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def spec_for_sf_dir(sf_dir: str, seed: int = 42) -> CorpusSpec:
    """Corpus size follows the scale factor: lineitem is the one driver
    table that scales linearly with sf (documents does not), so
    n_pages = lineitem/3 → 2k / 20k / 200k pages at sf 0.001/0.01/0.1."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir.rstrip('/')}/lineitem.parquet").num_rows
    return CorpusSpec(seed=seed, n_pages=max(500, int(n) // 3))
