"""Extraction invariant: pinned extractor reproduces the `text` oracle
column byte-identically per url (BASELINE.json input_hint)."""

import pyarrow as pa

from ttmf_ray.sources.pages import (
    CorpusSpec,
    oracle_triples,
    page_blocks,
    pages_batch,
    pages_dataset,
    render_html,
)
from ttmf_ray.stages.extract import extract_text, split_sentences


def test_extract_byte_identical_small():
    spec = CorpusSpec(seed=42, n_pages=300)
    for i in range(spec.n_pages):
        html = render_html(spec, i)
        expected = "\n".join(page_blocks(spec, i))
        got = extract_text(html.encode("utf-8"))
        assert got == expected, f"page {i}: {got!r} != {expected!r}"


def test_extract_handles_entities_and_inline_tags():
    html = (
        b"<html><head><title>A &amp; B</title><script>x</script></head>"
        b"<body><nav><a href='/'>x</a></nav><h1>A &amp; B</h1>"
        b"<p>Hello <b>bold</b> world.</p>"
        b"<footer>drop me</footer></body></html>"
    )
    assert extract_text(html) == "A & B\nA & B\nHello bold world."


def test_extract_batch_via_ray():
    import ray.data as rd  # noqa: F401

    spec = CorpusSpec(seed=42, n_pages=200)
    from ttmf_ray.pipelines.kg_construct import extract_pages

    out = extract_pages(pages_dataset(spec)).to_pandas()
    assert len(out) == 200
    assert (out["extracted_text"] == out["text"]).all()


def test_sentence_split():
    assert split_sentences("A b. C d!\nE f?") == ["A b.", "C d!", "E f?"]


def test_corpus_determinism():
    spec = CorpusSpec(seed=42, n_pages=50)
    t1 = pages_batch(spec, __import__("numpy").arange(50))
    t2 = pages_batch(spec, __import__("numpy").arange(50))
    assert t1.equals(t2)
    assert len(oracle_triples(spec)) > 20
