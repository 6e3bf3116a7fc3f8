"""Unified extraction stage: detect payload kind → route → extract → emit.

The reference routes each file through ``detect_parser_for_file`` (first
``can_parse`` winner, /root/reference/dataextractai/parsers_core/
registry.py:23-36) and *never fails the job on one bad document* (per-row
try/except → log + skip, registry.py:33-35). Here detection is a magic-bytes
sniff per row and extraction errors become ``status="error"`` rows — the
ok/error column convention that every downstream stage preserves
(SURVEY.md §7.4 "error semantics").

Implemented as ONE actor-pool ``map_batches`` stage that routes per row
inside the batch instead of two ``ds.filter`` branch datasets: Ray datasets
re-execute upstream lineage per consumer, so branching at this point would
scan (and re-render) every page twice. The actor holds the stateful
``PdfLayoutExtractor`` (constructed once per actor); the HTML path is a pure
function. The wide ``html`` binary column is dropped on output so downstream
blocks shrink (SURVEY.md §4.2 "wide binary rows").
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..schemas import DEFAULT_NUM_PARTITIONS, EXTRACTED_SCHEMA, EXTRACTOR_VERSION, SPAN_TYPE
from .registry import ExtractorRegistry, default_registry


def detect_kind(payload: bytes, _head: bytes | None = None) -> str:
    """Content sniffing on the payload head (``can_parse`` analog).
    ``_head`` lets a caller that already sliced the head avoid re-slicing."""
    head = (_head if _head is not None else payload[:64]).lstrip()
    if head.startswith(b"%PDF"):
        return "pdf"
    if head.startswith(b"<"):
        return "html"
    return "unknown"


def url_host(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def url_part_id(url: str, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> int:
    """Deterministic url-hash partition id (the explicit partitioning key the
    north rule asks for; crc32 is stable across processes/platforms)."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def _fast_enabled() -> bool:
    """Opt-in switch for the vectorized batch extraction kernels
    (GRAFT_FAST_EXTRACT=1 before ray.init in a fresh process).

    Default OFF: the r3 A/B at sf0.1 (fresh process per leg, min-of-3)
    measured the batch kernels +14% at 8 workers but −8% at 32 workers —
    their numpy prepass is memory-bandwidth-heavier per doc, and at full
    node occupancy the shared bus is the bottleneck (scalar: 149k docs/s
    @32, scaling efficiency 0.979; batch: 137k, 0.791). A production node
    runs fully occupied, so scalar is the right default; enable the batch
    path only for low-concurrency deployments. Both paths stay
    differential-pinned byte-identical (tests/test_html_fast.py)."""
    import os

    return os.environ.get("GRAFT_FAST_EXTRACT", "") == "1"


class ExtractDocuments:
    """Callable class for ``map_batches`` (actor pool or per-worker-cached
    task state — see pipelines/extract.py).

    Stateful setup (the extractor registry with its layout-parser geometry
    and compiled token regexes) happens once in ``__init__``; each
    ``__call__`` processes one Arrow batch, routing every row through the
    first registered extractor whose content sniff matches (§2.10 registry
    contract). Custom extractors plug in via ``registry=``.
    """

    def __init__(
        self,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        registry: ExtractorRegistry | None = None,
    ):
        self.num_partitions = num_partitions
        self.registry = registry or default_registry()

    @staticmethod
    def _extract_row(ex, payload: bytes) -> dict:
        try:
            return ex.extract(payload)
        except Exception as e:
            # the reference's per-row guard (registry.py:33-35): one
            # pathological document becomes an error ROW — it must
            # never fail the task/job (this module's stated contract)
            return {
                "status": "error",
                "extracted_text": "",
                "spans": [],
                "n_blocks": 0,
                "error": f"extractor_exception: {type(e).__name__}: {e}"[:200],
            }

    @staticmethod
    def _set_result(out: dict, i: int, r: dict) -> None:
        out["status"][i] = r["status"]
        out["extracted_text"][i] = r["extracted_text"]
        out["spans"][i] = r["spans"]
        out["n_blocks"][i] = r["n_blocks"]
        out["error"][i] = r["error"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist() if "doc_id" in batch.column_names else [None] * batch.num_rows
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist() if "lang" in batch.column_names else [None] * batch.num_rows

        n = batch.num_rows
        out: dict[str, list] = {k: [None] * n for k in (
            "status", "extracted_text", "spans", "n_blocks", "doc_kind",
            "extractor", "error", "host", "part_id",
        )}
        # route every row first; rows whose extractor implements
        # extract_batch are grouped and handed over in ONE call (r3: the
        # vectorized HTML scanner amortizes over the whole batch)
        batched: dict[int, tuple] = {}  # id(ex) -> (ex, [row_idx], [payload])
        fast = _fast_enabled()  # one environ lookup per batch, not per row
        for i, (url, payload) in enumerate(zip(urls, payloads)):
            payload = payload or b""
            head = payload[:64]  # sniffed ONCE, shared by kind + routing
            out["doc_kind"][i] = detect_kind(payload, _head=head)
            out["host"][i] = url_host(url)
            out["part_id"][i] = url_part_id(url, self.num_partitions)
            ex = self.registry.detect_from_head(head)
            if ex is None:
                out["extractor"][i] = "none"
                self._set_result(out, i, {
                    "status": "error", "extracted_text": "", "spans": [],
                    "n_blocks": 0, "error": "unknown_payload_kind",
                })
                continue
            out["extractor"][i] = ex.name
            if fast and hasattr(ex, "extract_batch"):
                grp = batched.setdefault(id(ex), (ex, [], []))
                grp[1].append(i)
                grp[2].append(payload)
            else:
                self._set_result(out, i, self._extract_row(ex, payload))
        for ex, idxs, pls in batched.values():
            try:
                results = ex.extract_batch(pls)
                if len(results) != len(pls):
                    # a short/long result list would leave None placeholders
                    # that surface later as an opaque Arrow error (ADVICE r3)
                    raise RuntimeError(
                        f"extract_batch returned {len(results)} results for "
                        f"{len(pls)} payloads"
                    )
            except Exception:
                # batch kernel failure degrades to the per-row guard path —
                # one pathological batch must not fail the task
                results = [self._extract_row(ex, p) for p in pls]
            for i, r in zip(idxs, results):
                self._set_result(out, i, r)

        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "status": pa.array(out["status"], type=pa.string()),
                "extracted_text": pa.array(out["extracted_text"], type=pa.large_string()),
                "spans": pa.array(out["spans"], type=pa.list_(SPAN_TYPE)),
                "n_blocks": pa.array(out["n_blocks"], type=pa.int32()),
                "doc_kind": pa.array(out["doc_kind"], type=pa.string()),
                "extractor": pa.array(out["extractor"], type=pa.string()),
                "extractor_version": pa.array([EXTRACTOR_VERSION] * batch.num_rows, type=pa.string()),
                "error": pa.array(out["error"], type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
                "host": pa.array(out["host"], type=pa.string()),
                "part_id": pa.array(out["part_id"], type=pa.int32()),
            },
            schema=EXTRACTED_SCHEMA,
        )
