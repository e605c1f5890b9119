"""Rule-based (subj, pred, obj) triple extraction from sentences (phase A).

A deterministic pattern matcher over the closed predicate-phrase vocabulary
of sources/pages.py — the stand-in for the batched GPU relation-extraction
model of the north star.  It is implemented as a CALLABLE CLASS so it runs
as an actor pool: patterns are compiled once per actor in ``__init__`` and
reused for every batch (the T6 stateful-stage pattern of SURVEY.md §2.3).

Pattern order matters ("X was founded by Y." must not be eaten by the
"{s} founded {o}." pattern); patterns are tried in a fixed order and the
first full-sentence match wins.

Why the per-sentence loop stays: a single combined RE2 alternation via
``pc.extract_regex`` (leftmost-first, groups renamed per alternative) was
measured OUTPUT-IDENTICAL but 1.5x SLOWER (0.32 s vs 0.21 s per 25k
sentences, best of 5 in-process) — 40 capture groups disable RE2's DFA.
At ~8 µs/sentence × actor-pool parallelism this loop is not the phase-A
bottleneck; a large open predicate vocabulary would instead want an
Aho-Corasick prefilter on the fixed verb phrases before anchored matching.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sources.pages import RELATIONS


def _template_to_regex(template: str) -> re.Pattern:
    """'{s} founded {o}.' → ^(?P<s>.+?) founded (?P<o>.+?)\\.$ (anchored)."""
    pat = re.escape(template)
    pat = pat.replace(re.escape("{s}"), r"(?P<s>.+?)")
    pat = pat.replace(re.escape("{o}"), r"(?P<o>.+?)")
    return re.compile("^" + pat + "$")


def build_patterns() -> list[tuple[str, re.Pattern]]:
    """(relation_name, compiled_regex) in match-priority order.

    Priority: templates containing another template's verb phrase as a
    substring must come first — concretely, multi-word passive forms
    ("was founded by") before their active stem ("founded").
    """
    pats: list[tuple[str, re.Pattern, int]] = []
    for rel in RELATIONS:
        for t in rel.templates:
            # longer fixed text ⇒ more specific ⇒ try first
            fixed = len(t) - t.count("{s}") * 3 - t.count("{o}") * 3
            pats.append((rel.name, _template_to_regex(t), fixed))
    pats.sort(key=lambda x: -x[2])
    return [(name, rx) for name, rx, _ in pats]


class TripleExtractor:
    """Actor-pool map_batches stage: (url, sent_id, sentence) →
    (url, sent_id, subj_surface, pred, obj_surface)."""

    def __init__(self) -> None:
        self.patterns = build_patterns()

    def match(self, sentence: str) -> tuple[str, str, str] | None:
        for name, rx in self.patterns:
            m = rx.match(sentence)
            if m:
                return m.group("s"), name, m.group("o")
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        sents = batch.column("sentence").to_pylist()
        o_url: list[str] = []
        o_sid: list[int] = []
        o_s: list[str] = []
        o_p: list[str] = []
        o_o: list[str] = []
        for u, sid, sent in zip(urls, sids, sents):
            hit = self.match(sent)
            if hit is not None:
                o_url.append(u)
                o_sid.append(sid)
                o_s.append(hit[0])
                o_p.append(hit[1])
                o_o.append(hit[2])
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "sent_id": pa.array(o_sid, pa.int32()),
                "subj_surface": pa.array(o_s, pa.string()),
                "pred": pa.array(o_p, pa.string()),
                "obj_surface": pa.array(o_o, pa.string()),
            }
        )
