"""Multimodal/OCR plumbing tests: stubs are clearly gated, Ray-side is real."""

from __future__ import annotations

import pytest

from pdf_extractor_ray.sources.sinks import export_xlsx
from pdf_extractor_ray.stages.multimodal import MediaFeatures, OcrStage, decode_image


def test_decode_image_stub_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image(b"\x89PNG\r\n\x1a\n...")


def test_ocr_real_engine_gated():
    with pytest.raises(NotImplementedError, match="OCR requires"):
        OcrStage(use_real_engine=True)


def test_ocr_stage_plumbing_over_pages(sf_dir):
    from pdf_extractor_ray import corpus

    pages = corpus.read_pages(sf_dir, fanout_blocks=8).limit(64)
    out = pages.map_batches(
        OcrStage, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert len(out) == 64
    assert out.ocr_text.str.startswith("ocr:").all()
    assert (out.ocr_engine == "fake_deterministic").all()
    # deterministic across runs
    again = (
        corpus.read_pages(sf_dir, fanout_blocks=8).limit(64)
        .map_batches(OcrStage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert dict(zip(out.url, out.ocr_text)) == dict(zip(again.url, again.ocr_text))


def test_media_features_actor_batches(sf_dir):
    import ray.data as rd
    from pdf_extractor_ray.stages.multimodal import media_table_from_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).limit(32)
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    feats = media.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(feats) == 32
    assert (feats.n_bytes > 0).all()
    assert feats.payload_sha.str.len().eq(64).all()


def test_xlsx_export_gated(sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/region.parquet")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        export_xlsx(ds, "/tmp/out.xlsx")
