"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as opaque ``binary`` columns with
typed metadata columns alongside (the reference's analog: PDFs consumed as
binary, PNG crops base64'd to a vision LLM — organizer_extractor.py:489-533 —
never stored in the record model).

The decode/feature kernels that need codec libraries are STUBBED (this
container has no image/audio libs): ``decode_image`` raises
``NotImplementedError`` behind an import-try, and ``MediaFeatures`` uses the
deterministic byte-level fallback. The Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("media", pa.binary()),  # opaque payload
        pa.field("media_type", pa.string()),  # e.g. image/png, audio/wav
    ]
)


def decode_image(payload: bytes):
    """Decode an image payload to HxWxC uint8. STUB: needs an image codec
    library that is not available in this container."""
    try:
        import PIL.Image  # noqa: F401  (not installed here)
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. Pillow); "
            "not available in this environment — byte-level features only"
        ) from e
    raise NotImplementedError("unreachable in this container")


class MediaFeatures:
    """Actor-pool stage: per-payload byte-level features.

    ``__init__`` holds the (cheap) state — at scale this is where a model or
    codec context would load once per actor. ``__call__`` emits one metadata
    row per payload; batch sizes should stay small because each row carries
    a wide binary value (SURVEY.md §4.2)."""

    def __init__(self, with_decode: bool = False):
        self.with_decode = with_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("media").to_pylist()
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
        sha = [hashlib.sha256(p).hexdigest() for p in payloads]
        decoded = []
        if self.with_decode:
            for p in payloads:
                try:
                    decode_image(p)
                    decoded.append(True)
                except NotImplementedError:
                    decoded.append(False)
        else:
            decoded = [False] * len(payloads)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes),
                "payload_sha": pa.array(sha, type=pa.string()),
                "decoded": pa.array(decoded, type=pa.bool_()),
            }
        )


class OcrStage:
    """PDF→image→OCR actor stage (§2.1: pdf2image + pytesseract,
    /root/reference/dataextractai/parsers/organizer_extractor.py:295-306,
    417-419). The OCR engine would load once per actor here; this container
    has neither poppler nor tesseract, so the engine hook is STUBBED with a
    deterministic fake while the Ray-side plumbing (actor signature, batch
    sizing, per-page output layout) is real and tested."""

    def __init__(self, dpi: int = 200, use_real_engine: bool = False):
        self.dpi = dpi
        self.engine = None
        if use_real_engine:
            try:
                import pytesseract  # noqa: F401 (not installed here)

                self.engine = "tesseract"
            except ImportError as e:
                raise NotImplementedError(
                    "OCR requires poppler+pytesseract; not available in this "
                    "environment — use the deterministic fake (default)"
                ) from e

    def _fake_ocr(self, payload: bytes) -> str:
        # deterministic stand-in: page count + payload digest as "recognized text"
        pages = {ln.split(b" ")[1] for ln in payload.split(b"\n") if ln.startswith(b"T ")}
        n_pages = max(1, len(pages))
        return f"ocr:{hashlib.sha256(payload).hexdigest()[:16]}:pages={n_pages}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        texts = [self._fake_ocr(p or b"") for p in payloads]
        return pa.table(
            {
                "url": batch.column("url"),
                "ocr_text": pa.array(texts, type=pa.string()),
                "ocr_engine": pa.array(
                    [self.engine or "fake_deterministic"] * batch.num_rows, type=pa.string()
                ),
            }
        )


def media_table_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic media stand-in: the document text bytes as an opaque
    payload (utf-8) — lets the byte-level feature path be oracle-checked
    (octet_length / sha256 in DuckDB)."""
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "media": pa.array([t.encode("utf-8") for t in texts], type=pa.binary()),
            "media_type": pa.array(["text/plain"] * batch.num_rows, type=pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# REAL image-header parsing (no codec library needed — pure byte layout)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Extract (format, width, height) from raw image BYTES — PNG IHDR,
    GIF logical screen descriptor, BMP BITMAPINFOHEADER, JPEG SOFn scan.
    This is a REAL multimodal kernel (container-independent: the formats'
    header layouts are fixed by spec, no codec needed) — full pixel decode
    stays behind the ``decode_image`` import gate. Returns None for
    non-image / truncated payloads, never raises."""
    import struct

    try:
        if payload.startswith(PNG_SIG) and len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("image/png", int(w), int(h))
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return ("image/gif", int(w), int(h))
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return ("image/bmp", int(w), abs(int(h)))  # negative h = top-down rows
        if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOFn
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    return None
                marker = payload[i + 1]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("image/jpeg", int(w), int(h))
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # bare markers carry no length
                    continue
                (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
                i += 2 + seglen
    except (struct.error, IndexError):
        return None
    return None


def make_png(width: int, height: int, gray: int = 128) -> bytes:
    """Build a VALID single-color 8-bit grayscale PNG with stdlib zlib —
    deterministic real-format test payloads without an image library."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal valid GIF89a header+trailer (logical screen only)."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


class ImageHeaderFeatures:
    """Actor-pool stage over media batches: REAL header-derived
    (format, width, height, megapixels) columns; non-image payloads get
    nulls. Same wide-binary batch discipline as MediaFeatures."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [parse_image_header(p or b"") for p in batch.column("media").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "img_format": pa.array(
                    [m[0] if m else None for m in metas], type=pa.string()
                ),
                "width": pa.array(
                    [m[1] if m else None for m in metas], type=pa.int64()
                ),
                "height": pa.array(
                    [m[2] if m else None for m in metas], type=pa.int64()
                ),
            }
        )
