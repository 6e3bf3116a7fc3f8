"""Byte-identity against FROZEN goldens (SURVEY.md §5b, the north rule's
per-url invariant): the distributed pipeline must reproduce the committed
golden extraction exactly, keyed by url — any batch-order, parallelism, or
extractor-semantics drift fails here."""

from __future__ import annotations

import pyarrow.parquet as pq

GOLDEN_PATH = "tests/goldens/goldens_sf0.001.parquet"


def test_ray_pipeline_matches_frozen_goldens(sf_dir):
    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages

    golden = pq.read_table(GOLDEN_PATH).to_pandas().set_index("url")
    pages = corpus.read_pages(sf_dir, fanout_blocks=16)
    out = extract_pages(pages).to_pandas().set_index("url")

    assert set(out.index) == set(golden.index)
    g = golden.loc[out.index]  # align, order-insensitive
    assert (out["extracted_text"] == g["extracted_text"]).all(), "text not byte-identical"
    assert (out["status"] == g["status"]).all()
    assert (out["n_blocks"] == g["n_blocks"]).all()
    assert (out["host"] == g["host"]).all()
    assert (out["doc_id"] == g["doc_id"]).all()
    # span structure (order + offsets + kinds) is pinned too
    from pdf_extractor_ray.goldens import spans_sha

    got_sha = out["spans"].map(lambda s: spans_sha(list(s)))
    assert (got_sha == g["spans_sha"]).all(), "spans not structurally identical"


def test_extraction_is_independent_of_block_layout(sf_dir):
    """Batch/block boundaries must not leak into results: different fanout
    yields identical rows keyed by url."""
    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages

    a = extract_pages(corpus.read_pages(sf_dir, fanout_blocks=4)).to_pandas().set_index("url")
    b = extract_pages(corpus.read_pages(sf_dir, fanout_blocks=32)).to_pandas().set_index("url")
    b = b.loc[a.index]
    for col in ("extracted_text", "status", "n_blocks", "part_id"):
        assert (a[col] == b[col]).all(), col


def test_goldens_regeneration_is_stable(sf_dir):
    """The generator itself is deterministic: regenerating now must equal the
    frozen file (guards against hidden wall-clock/locale dependence)."""
    from pdf_extractor_ray.goldens import generate_goldens

    fresh = generate_goldens(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    frozen = (
        pq.read_table(GOLDEN_PATH).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert fresh.equals(frozen)


def test_multiblock_corpus_distributed_matches_sequential(sf_dir):
    """Multi-paragraph corpus variant: the distributed pipeline matches a
    sequential per-doc pass exactly (text AND block structure), exercising
    multi-block assembly at corpus scale rather than single fixtures."""
    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages
    from pdf_extractor_ray.stages.extract import detect_kind
    from pdf_extractor_ray.stages.html_extract import extract_html
    from pdf_extractor_ray.stages.pdf_extract import PdfLayoutExtractor

    P = 4
    out = (
        extract_pages(corpus.read_pages(sf_dir, fanout_blocks=16, paragraphs=P))
        .to_pandas()
        .set_index("doc_id")
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pdf = PdfLayoutExtractor()
    n_multi = 0
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        payload = corpus.render_payload(d, t, paragraphs=P)
        r = pdf.extract(payload) if detect_kind(payload) == "pdf" else extract_html(payload)
        row = out.loc[d]
        assert row.extracted_text == r["extracted_text"], d
        assert row.status == r["status"], d
        assert row.n_blocks == r["n_blocks"], d
        if r["status"] == "ok" and not corpus.is_pdf_doc(d) and r["n_blocks"] > 1:
            n_multi += 1
            assert "\n" in r["extracted_text"]
    assert n_multi > 300  # most html docs split into multiple content blocks


def test_sf01_goldens_byte_identity():
    """10× corpus byte-identity: 5000 docs against the frozen sf0.1 goldens."""
    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages

    golden = pq.read_table("tests/goldens/goldens_sf0.1.parquet").to_pandas().set_index("url")
    out = (
        extract_pages(corpus.read_pages("/root/testdata/sf0.1", fanout_blocks=32))
        .to_pandas()
        .set_index("url")
    )
    assert set(out.index) == set(golden.index)
    g = golden.loc[out.index]
    assert (out["extracted_text"] == g["extracted_text"]).all()
    assert (out["status"] == g["status"]).all()
