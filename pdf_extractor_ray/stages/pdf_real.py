"""Real-PDF adapter seam (VERDICT r1 #6).

Mirrors the reference's three-library fallback cascade
(/root/reference/dataextractai/utils/utils.py:142-262: pdfplumber →
PyPDF2 → fitz, first success wins) behind the Extractor protocol. None of
the PDF libraries exist in this container, so the adapter:

- discovers importable backends at construction (import-try, the pattern
  proven in stages/multimodal.py),
- is only registered into ``default_registry`` when ≥1 backend imports —
  otherwise real ``%PDF`` payloads keep routing to the synthetic XY-cut
  reader (which reports honest ``bad_token_line`` error rows),
- distinguishes REAL PDFs from the synthetic positioned-token format by
  content sniff, so the synthetic corpus never routes here.

The cascade/adapter logic itself is fully tested via injected fake
backends (tests/test_pdf_real_adapter.py).
"""

from __future__ import annotations

import re

_SYNTHETIC_TOKEN_RE = re.compile(rb"\nT \d+ \d+ \d+ \S+")


def _try_pdfplumber(payload: bytes) -> list[str]:
    import io

    import pdfplumber

    with pdfplumber.open(io.BytesIO(payload)) as pdf:
        return [(page.extract_text() or "") for page in pdf.pages]


def _try_pypdf(payload: bytes) -> list[str]:
    import io

    from pypdf import PdfReader

    reader = PdfReader(io.BytesIO(payload))
    return [(page.extract_text() or "") for page in reader.pages]


def _try_pypdf2(payload: bytes) -> list[str]:
    import io

    from PyPDF2 import PdfReader  # the reference's PyPDF2 era

    reader = PdfReader(io.BytesIO(payload))
    return [(page.extract_text() or "") for page in reader.pages]


def _try_fitz(payload: bytes) -> list[str]:
    import fitz  # PyMuPDF

    with fitz.open(stream=payload, filetype="pdf") as doc:
        return [page.get_text() for page in doc]


#: (name, importable-module, page-extractor) in reference cascade order —
#: each entry imports ITS OWN library so a cascade step never silently
#: re-runs the previous backend
_BACKEND_SPECS = [
    ("pdfplumber", "pdfplumber", _try_pdfplumber),
    ("pypdf", "pypdf", _try_pypdf),
    ("PyPDF2", "PyPDF2", _try_pypdf2),
    ("fitz", "fitz", _try_fitz),
]


def _importable_specs() -> list[tuple[str, "callable"]]:
    import importlib.util

    return [(name, fn) for name, mod, fn in _BACKEND_SPECS if importlib.util.find_spec(mod)]


def available_backends() -> list[str]:
    return [name for name, _ in _importable_specs()]


def is_synthetic_pdf(payload: bytes, probe_bytes: int = 4096) -> bool:
    """The synthetic corpus format: ``%PDF`` magic + ``T page x y word``
    token lines (corpus.render_pdf). Real PDFs have object streams, never
    these token lines."""
    return _SYNTHETIC_TOKEN_RE.search(payload[:probe_bytes]) is not None


class RealPdfExtractor:
    """Extractor-protocol adapter running the first WORKING backend — each
    backend either returns page texts or raises, and the next one in the
    cascade gets its turn (utils.py:142-262 semantics).

    ``backends`` is injectable for tests; by default only importable
    libraries participate."""

    name = "pdf_real_cascade_v1"
    version = "0.1.0"

    def __init__(self, backends=None):
        self._backends = list(backends) if backends is not None else _importable_specs()

    def can_extract(self, head: bytes) -> bool:
        # real %PDF payloads only — the synthetic token format routes to the
        # XY-cut reader (head is a prefix, so the token sniff uses it too)
        return head.lstrip().startswith(b"%PDF") and not is_synthetic_pdf(head)

    def extract(self, payload: bytes) -> dict:
        errors = []
        for bname, fn in self._backends:
            try:
                page_texts = fn(payload)
            except Exception as e:  # cascade: any failure → next library
                errors.append(f"{bname}: {type(e).__name__}")
                continue
            spans, words, offset = [], [], 0
            n_blocks = 0
            for ptext in page_texts:
                pwords = ptext.split()
                if not pwords:
                    continue
                start = offset + (1 if words else 0)
                plen = sum(len(w) for w in pwords) + len(pwords) - 1
                spans.append({"start": start, "end": start + plen, "kind": "page"})
                offset = start + plen
                words.extend(pwords)
                n_blocks += 1
            text = " ".join(words)
            if not text:
                return {
                    "status": "empty",
                    "extracted_text": "",
                    "spans": spans,
                    "n_blocks": 0,
                    "error": f"no_text_via_{bname}",
                }
            return {
                "status": "ok",
                "extracted_text": text,
                "spans": spans,
                "n_blocks": n_blocks,
                "error": None,
            }
        return {
            "status": "error",
            "extracted_text": "",
            "spans": [],
            "n_blocks": 0,
            "error": "all_backends_failed: " + ("; ".join(errors) or "no_backends_available"),
        }
