"""Differential pin: the vectorized batch scanner (stages/html_fast.py) must
be BIT-identical to the per-doc regex scanner on every document — eligible
docs via the fast path, quirky docs via the fallback. Run over the synthetic
corpus, every robustness-suite payload, and a hand-built edge list covering
each eligibility rule and each event class."""

from __future__ import annotations

import pytest

from pdf_extractor_ray.stages.html_extract import extract_html
from pdf_extractor_ray.stages.html_fast import scan_blocks_batch
from pdf_extractor_ray.stages.registry import HtmlExtractor

LONG = "this sentence is long enough to be classified as main content by the density rule"

EDGE_DOCS = [
    b"",
    b"no tags at all just text " + LONG.encode(),
    b"<p>" + LONG.encode() + b"</p>",
    b"<P>" + LONG.encode() + b"</P>",  # uppercase names
    f"<div><p>{LONG}<p>again {LONG}".encode(),  # unclosed tags
    f"<p>{LONG}<br>{LONG}</p>".encode(),
    f"<p>{LONG}</br>{LONG}</p>".encode(),  # closing br quirk
    f'<p title="&amp; quoted &lt;attr&gt;">{LONG}</p>'.encode(),
    f"<p>&amp; entities &lt;kept&gt; {LONG}</p>".encode(),
    b"<!DOCTYPE html><html><body><p>" + LONG.encode() + b"</p></body></html>",
    f"<script>var x = '</p>';</script><p>{LONG}</p>".encode(),
    f"<script/><p>{LONG}</p>".encode(),  # self-closing skip tag: no raw mode
    f"<SCRIPT>hidden</SCRIPT><p>{LONG}</p>".encode(),
    f"<script>never closed {LONG}".encode(),  # raw mode to EOF
    f"<style>.a {{color: red}}</style><p>{LONG}</p>".encode(),
    f"<a href='/x'>{LONG}</a>".encode(),  # fully linked block
    f"<a href='/x'><div>{LONG}</div></a><p>{LONG} real</p>".encode(),  # card link
    f"<div><a href='/x'>broken<p>{LONG}</p><p>{LONG} two</p></div>".encode(),
    f"<a href='/x'><a-icon/><div>{LONG}</div></a><p>{LONG} keep</p>".encode(),
    f"<a/>self closing anchor quirk<p>{LONG}</p>".encode(),
    b"<table><tr><td>" + LONG.encode() + b"</td><td>" + LONG.encode() + b"</td></tr></table>",
    b"<p>x > y and z>w " + LONG.encode() + b"</p>",  # '>' inside text
    b"<123><p>" + LONG.encode() + b"</p>",  # non-alpha tag = noop
    b"</><p>" + LONG.encode() + b"</p>",  # empty close = noop
    b"<custom-elem>" + LONG.encode() + b"</custom-elem>",  # unknown tag
    b"<figcaption>" + LONG.encode() + b"</figcaption>",  # long known name
    b"<blockquote>" + LONG.encode() + b"</blockquote>",
    b"<p>" + LONG.encode(),  # unterminated trailing tag after text
    b"<p>" + LONG.encode() + b"</p><a",  # bare trailing '<a'
    b"<p>" + LONG.encode() + b"<",  # bare trailing '<'
    # ineligible docs (must fall back, still correct):
    f"<!-- comment with > inside --><p>{LONG}</p>".encode(),
    f"<div><a href='/x'>t<!-- </a> --></div><p>{LONG} after</p>".encode(),
    f"< p >{LONG}</p>".encode(),  # whitespace after '<'
    f"</ div><p>{LONG}</p>".encode(),  # whitespace after '</'
    f"<a <b>{LONG}</p>".encode(),  # '<' swallowed inside tag token
    f"<p>naïve café {LONG}</p>".encode("utf-8"),  # non-ASCII
    "<p>日本語のテキスト</p>".encode("utf-8"),
    b"\xff\xfe broken bytes",  # not utf-8 at all
]


def test_differential_fast_vs_slow_edges():
    ex = HtmlExtractor()
    fast = ex.extract_batch(EDGE_DOCS)
    for payload, got in zip(EDGE_DOCS, fast):
        want = extract_html(payload)
        assert got == want, f"mismatch for {payload[:60]!r}"


def test_fast_path_actually_taken():
    """The eligibility gate must not silently send everything to the slow
    path — the corpus-shaped docs must come back non-None from the batch
    scanner (otherwise the fast path is dead code and the bench is lying)."""
    eligible = [
        b"<p>" + LONG.encode() + b"</p>",
        b"<!DOCTYPE html><html><body><p>" + LONG.encode() + b"</p></body></html>",
        f"<script>var x=1;</script><p>{LONG}</p>".encode(),
    ]
    pre = scan_blocks_batch(eligible)
    assert all(rb is not None for rb in pre)
    # and quirky docs must be refused
    refused = scan_blocks_batch([b"<!-- c --><p>x</p>", "<p>café</p>".encode()])
    assert all(rb is None for rb in refused)


PDF_EDGE_DOCS = [
    b"%PDF-1.4\nT 0 72 720 hello\nT 0 112 720 world\n%%EOF\n",
    b"%PDF-1.4\nT 0 72 720 one\nT 0 330 720 two\n%%EOF\n",  # two columns
    b"%PDF-1.4\nT 1 72 720 later\nT 0 72 720 first\n%%EOF\n",  # page order
    b"%PDF-1.4\nT 0 72 770 header\nT 0 72 30 footer\nT 0 72 720 body\n%%EOF\n",
    b"%PDF-1.4\nT 0 72 720 1203\nT 0 112 720 45.00\nT 0 152 720 1,250\n%%EOF\n",
    b"%PDF-1.4\nT 0 72 720 12.3.4\nT 0 112 720 .5\nT 0 152 720 5.\n%%EOF\n",
    b"%PDF-1.4\n%%EOF\n",  # no tokens
    b"%PDF-1.4\n% a comment line\nT 0 72 720 ok\n%%EOF\n",
    b"%PDF-1.4\nT 0 72 720 body",  # missing EOF
    b"not a pdf at all",  # bad magic
    b"",  # empty payload
    b"%PDF-1.4\nT abc def\n%%EOF\n",  # bad token line → fallback
    b"%PDF-1.4\nT 0 72 720 two words\n%%EOF\n",  # space in word → bad line
    b"%PDF-1.4\nTx 0 72 720 w\n%%EOF\n",  # not a token line
    b"%PDF-1.4\nT 0 72 720 caf\xc3\xa9\n%%EOF\n",  # non-ASCII → fallback
    b"%PDF-1.4\nT 0 72 720 w\njunk line\n%%EOF\n",  # junk → bad_token_line
    b"%PDF-1.4\nT 00 072 0720 zeros\n%%EOF\n",  # leading zeros parse equal
    b"%PDF-1.4\nT 0 72 720 a\n\n\nT 0 112 720 b\n%%EOF\n",  # blank lines
    # three columns exercising the every-gap-cuts equivalence
    b"%PDF-1.4\nT 0 72 720 one\nT 0 150 720 two\nT 0 520 720 three\n%%EOF\n",
]


def test_pdf_differential_fast_vs_slow():
    from pdf_extractor_ray.stages.pdf_extract import PdfLayoutExtractor
    from pdf_extractor_ray.stages.registry import PdfExtractor

    ex = PdfExtractor()
    scalar = PdfLayoutExtractor()
    fast = ex.extract_batch(PDF_EDGE_DOCS)
    for payload, got in zip(PDF_EDGE_DOCS, fast):
        want = scalar.extract(payload)
        assert got == want, f"mismatch for {payload[:50]!r}"


def test_pdf_differential_corpus():
    import pyarrow.parquet as pq

    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.stages.pdf_extract import PdfLayoutExtractor
    from pdf_extractor_ray.stages.registry import PdfExtractor

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    payloads = [
        corpus.render_payload(d, t)
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
        if corpus.is_pdf_doc(d)
    ]
    assert len(payloads) > 30
    ex = PdfExtractor()
    scalar = PdfLayoutExtractor()
    for payload, got in zip(payloads, ex.extract_batch(payloads)):
        assert got == scalar.extract(payload)
    # well-formed corpus PDFs must take the fast path
    from pdf_extractor_ray.stages.pdf_fast import extract_pdf_batch

    ok_payloads = [p for p in payloads if len(p) > 25]
    pre = extract_pdf_batch(ok_payloads[:20])
    assert all(r is not None for r in pre)


def test_differential_fast_vs_slow_corpus():
    """Every payload the synthetic corpus generates (HTML, multi-paragraph
    HTML, malformed truncations) — fast batch == slow per-doc."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray import corpus

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    payloads = []
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        if corpus.is_pdf_doc(d):
            continue  # routed to the PDF extractor, not this scanner
        payloads.append(corpus.render_payload(d, t))
        payloads.append(corpus.render_payload(d, t, paragraphs=3))
    ex = HtmlExtractor()
    fast = ex.extract_batch(payloads)
    assert len(fast) == len(payloads)
    n_checked = 0
    for payload, got in zip(payloads, fast):
        want = extract_html(payload)
        assert got == want
        n_checked += 1
    assert n_checked > 500
    # corpus payloads must take the fast path (ASCII, comment-free)
    pre = scan_blocks_batch(payloads[:50])
    assert all(rb is not None for rb in pre)
