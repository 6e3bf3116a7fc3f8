"""Property-based byte-identity: for ANY single-space-separated token text
(the corpus contract), render→extract is the identity — both payload kinds.

Uses hypothesis with a fixed derandomized profile (no flaky CI), printable
non-whitespace token alphabets (whitespace runs are collapsed by design, so
multi-space inputs are outside the round-trip contract)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from pdf_extractor_ray import corpus
from pdf_extractor_ray.stages.html_extract import extract_html
from pdf_extractor_ray.stages.pdf_extract import PdfLayoutExtractor

# printable, no whitespace (collapse would break identity by design)
TOKEN_ALPHABET = "".join(
    c for c in string.ascii_letters + string.digits + string.punctuation
)

tokens = st.lists(
    st.text(alphabet=TOKEN_ALPHABET, min_size=1, max_size=12), min_size=1, max_size=200
)
# density classifier contract: blocks shorter than BLACKLIST_MAX_CHARS can be
# dropped as boilerplate (min-length threshold + phrase blacklist) — the
# round-trip guarantee applies to real article-sized content, so pad the
# token list until it crosses the threshold instead of filtering
long_tokens = st.lists(
    st.text(alphabet=TOKEN_ALPHABET, min_size=1, max_size=12), min_size=30, max_size=200
).map(lambda ws: ws if len(" ".join(ws)) > 160 else ws + ["padding-token"] * 20)
doc_ids = st.integers(min_value=0, max_value=10**9)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(words=long_tokens, doc_id=doc_ids)
def test_html_roundtrip_property(words, doc_id):
    text = " ".join(words)
    payload = corpus.render_html(doc_id, text, "h.example.com")
    r = extract_html(payload)
    assert r["status"] == "ok", r["error"]
    assert r["extracted_text"] == text


def test_html_short_text_is_classified_boilerplate():
    """Documented precision/recall tradeoff: a sub-threshold main block is
    indistinguishable from boilerplate and yields status=empty (trafilatura
    has the same behavior for stub pages)."""
    r = extract_html(corpus.render_html(0, "0", "h.example.com"))
    assert r["status"] == "empty"


@settings(max_examples=60, deadline=None, derandomize=True)
@given(words=tokens, doc_id=doc_ids)
def test_pdf_roundtrip_property(words, doc_id):
    text = " ".join(words)
    payload = corpus.render_pdf(doc_id, text)
    r = PdfLayoutExtractor().extract(payload)
    assert r["status"] == "ok", r["error"]
    assert r["extracted_text"] == text


@settings(max_examples=30, deadline=None, derandomize=True)
@given(words=tokens, doc_id=doc_ids)
def test_render_is_deterministic_property(words, doc_id):
    text = " ".join(words)
    assert corpus.render_payload(doc_id, text) == corpus.render_payload(doc_id, text)


def test_chunk_reassembly_property(ray_session, tmp_path):
    """Property: dropping each chunk's overlap tail (keeping chunk[:stride])
    and concatenating, plus the final chunk whole, reconstructs every doc
    exactly — chunking loses nothing and overlaps agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.textops import chunk_passages

    texts = [
        "x" * 1,
        "ab" * 40,        # exactly stride
        "abc" * 67,       # 201 chars, 3 chunks
        "q" * 553,
        "".join(chr(97 + i % 26) for i in range(239)),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = chunk_passages(str(tmp_path)).to_pandas()
    for d, text in enumerate(texts):
        ch = got[got["doc_id"] == d].sort_values("chunk_id")["chunk_text"].tolist()
        rebuilt = "".join(c[:80] for c in ch[:-1]) + ch[-1]
        assert rebuilt == text
        # every non-final chunk overlaps the next by exactly size-stride
        for a, b in zip(ch, ch[1:]):
            assert a[80:] == b[: len(a) - 80]
