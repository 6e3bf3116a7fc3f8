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


def test_parse_image_header_real_formats():
    """The header kernel reads REAL byte layouts: stdlib-built valid PNG
    (zlib IDAT, CRC chunks), minimal GIF, hand-built BMP and JPEG SOF0;
    truncated and non-image payloads return None."""
    import struct
    import zlib

    from pdf_extractor_ray.stages.multimodal import (
        make_gif,
        make_png,
        parse_image_header,
    )

    png = make_png(640, 480)
    assert parse_image_header(png) == ("image/png", 640, 480)
    # the PNG is genuinely valid: IDAT inflates to h*(1+w) filter+pixel bytes
    idat = png[png.index(b"IDAT") + 4 :]
    assert len(zlib.decompress(idat[: len(idat) - 12])) == 480 * 641

    assert parse_image_header(make_gif(12, 7)) == ("image/gif", 12, 7)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 33, -21) + b"\x00" * 10
    assert parse_image_header(bmp) == ("image/bmp", 33, 21)  # top-down rows

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 99, 44)
        + b"\x00" * 10
    )
    assert parse_image_header(jpeg) == ("image/jpeg", 44, 99)

    assert parse_image_header(b"plain words here") is None
    assert parse_image_header(png[:10]) is None  # truncated
    assert parse_image_header(b"") is None
