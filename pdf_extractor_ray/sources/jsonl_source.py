"""JSONL source: newline-delimited JSON page records → pages rows.

Crawl dumps and annotation pipelines commonly ship pages as JSONL
(one object per line: ``{"url": ..., "warc_ts_us": ..., "html": <base64 or
text>, ...}``). This source reads lines with ``ray.data.read_text`` (files
split into line blocks natively — no whole-file driver read) and parses
each line tolerantly inside ``map_batches``: a malformed line becomes an
error ROW (``jsonl_error`` set), never a failed shard — the engine's
ok/error policy (stages/extract.py).

Payload convention: ``html_b64`` carries binary payloads base64-encoded
(JSON has no bytes type); ``html`` carries text payloads directly. Output
schema matches the canonical pages table: (url, warc_ts, html, jsonl_error).
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa


def write_jsonl_like(records: list[dict], path: str) -> None:
    """Test-fixture writer: records = [{url, warc_ts_us, payload}, ...]."""
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(
                json.dumps(
                    {
                        "url": r["url"],
                        "warc_ts_us": r["warc_ts_us"],
                        "html_b64": base64.b64encode(r["payload"]).decode("ascii"),
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )


def parse_jsonl_line(line: str) -> dict:
    """One line → one row dict {url, warc_ts (us int), html (bytes),
    jsonl_error}. Tolerant: every failure mode maps to an error row."""
    try:
        obj = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        return {"url": "", "warc_ts": 0, "html": b"", "jsonl_error": "jsonl_bad_json"}
    if not isinstance(obj, dict):
        return {"url": "", "warc_ts": 0, "html": b"", "jsonl_error": "jsonl_not_object"}
    url = obj.get("url")
    if not isinstance(url, str) or not url:
        return {"url": "", "warc_ts": 0, "html": b"", "jsonl_error": "jsonl_missing_url"}
    err = None
    ts = obj.get("warc_ts_us", 0)
    # bool is an int subclass, and JSON ints are unbounded — either would
    # crash the batch's timestamp("us") array build instead of error-rowing
    if not isinstance(ts, int) or isinstance(ts, bool) or not (-(2**62) <= ts < 2**62):
        ts, err = 0, "jsonl_bad_ts"
    payload = b""
    if "html_b64" in obj:
        try:
            payload = base64.b64decode(obj["html_b64"], validate=True)
        except Exception:
            err = err or "jsonl_bad_base64"
    elif isinstance(obj.get("html"), str):
        payload = obj["html"].encode("utf-8")
    else:
        # absent / null / non-string payload is a BROKEN record, not an
        # empty page — silent b"" would be indistinguishable downstream
        err = err or "jsonl_missing_payload"
    return {"url": url, "warc_ts": ts, "html": payload, "jsonl_error": err}


def read_jsonl_like(paths):
    """JSONL page files → Dataset (url, warc_ts, html, jsonl_error)."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = [parse_jsonl_line(ln) for ln in batch.column("text").to_pylist()]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "jsonl_error": pa.array([r["jsonl_error"] for r in rows], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
