"""Golden generation: reference-faithful sequential extraction, frozen once.

SURVEY.md §5(b): run the single-process extractor over the deterministic
corpus once, freeze the outputs, then assert the Ray pipeline's per-url
extracted text is byte-identical (order-insensitive, keyed by url). The
golden file is committed to the repo (tests/goldens/) and NOT regenerated at
test time — it anchors extractor semantics across refactors the way the
reference's contract tests anchor parser outputs
(/root/reference/tests/test_parser_contracts.py:19-187).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa
import pyarrow.parquet as pq

from . import corpus
from .stages.extract import detect_kind, url_host
from .stages.html_extract import extract_html
from .stages.pdf_extract import PdfLayoutExtractor


def spans_sha(spans: list[dict]) -> str:
    """Canonical digest of the span structure (order + offsets + kinds)."""
    payload = json.dumps(
        [[s["start"], s["end"], s["kind"]] for s in spans], separators=(",", ":")
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def generate_goldens(sf_dir: str) -> pa.Table:
    """Sequential (no Ray) golden extraction over the synthesized corpus."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pdf = PdfLayoutExtractor()
    rows = []
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        payload = corpus.render_payload(d, t)
        kind = detect_kind(payload)
        r = pdf.extract(payload) if kind == "pdf" else extract_html(payload)
        url = corpus.url_for_doc(d)
        rows.append(
            {
                "doc_id": d,
                "url": url,
                "host": url_host(url),
                "status": r["status"],
                "extracted_text": r["extracted_text"],
                "n_blocks": r["n_blocks"],
                "error": r["error"],
                "spans_sha": spans_sha(r["spans"]),
            }
        )
    return pa.Table.from_pylist(rows)


def write_goldens(sf_dir: str, out_path: str) -> None:
    pq.write_table(generate_goldens(sf_dir), out_path)


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "tests/goldens/goldens_sf0.001.parquet"
    write_goldens(sf, out)
    print(f"wrote goldens for {sf} -> {out}")
