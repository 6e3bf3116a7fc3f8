"""WET-style source: Common-Crawl extracted-TEXT record files → rows.

WET files are the WARC *conversion* sibling — same record framing, but the
payload is the already-extracted plain text of a page, and real WET shards
open with a ``warcinfo`` record that carries no page. This source mirrors
``warc_source`` (one file = one read task, records parsed in-batch) and
emits ``(url, warc_ts, text, wet_error)``; non-conversion records are
skipped, malformed records divert to error rows per the engine's ok/error
policy.

Record format handled::

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <ISO8601>\r\n
    Content-Length: <n>\r\n
    \r\n
    <n utf-8 text bytes>\r\n\r\n
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAGIC = b"WARC/1.0\r\n"


def write_wet_like(records: list[dict], path: str, with_warcinfo: bool = True) -> None:
    """Test-fixture writer: records = [{url, warc_ts_us, text}, ...]."""
    with open(path, "wb") as f:
        if with_warcinfo:
            info = b"software: ray-extract-wet-fixture"
            f.write(_MAGIC)
            f.write(b"WARC-Type: warcinfo\r\n")
            f.write(f"Content-Length: {len(info)}\r\n".encode())
            f.write(_CRLF)
            f.write(info)
            f.write(_HDR_END)
        for r in records:
            ts = datetime.fromtimestamp(r["warc_ts_us"] / 1e6, tz=timezone.utc)
            payload = r["text"].encode("utf-8")
            f.write(_MAGIC)
            f.write(b"WARC-Type: conversion\r\n")
            f.write(f"WARC-Target-URI: {r['url']}\r\n".encode())
            f.write(f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%S.%f')}Z\r\n".encode())
            f.write(f"Content-Length: {len(payload)}\r\n".encode())
            f.write(_CRLF)
            f.write(payload)
            f.write(_HDR_END)


def parse_wet_bytes(data: bytes) -> dict[str, list]:
    """One file's bytes → columns {url, warc_ts (us), text, wet_error}.
    ``warcinfo`` / other non-conversion records are skipped silently (they
    are file metadata, not pages). Record framing and date parsing are the
    shared ``warc_source`` machinery — one implementation, two sources."""
    from .warc_source import iter_warc_records, parse_warc_date_us

    urls: list[str] = []
    ts_us: list[int] = []
    texts: list[str] = []
    errors: list[str | None] = []
    for headers, ok, payload, short in iter_warc_records(data):
        if ok and headers.get("warc-type", "conversion") != "conversion":
            continue  # metadata record (warcinfo etc.)
        url = headers.get("warc-target-uri", "")
        err = None
        text = ""
        if ok and url:
            if short:
                err = "wet_short_payload"
            else:
                try:
                    text = payload.decode("utf-8")
                except UnicodeDecodeError:
                    err = "wet_bad_utf8"
        else:
            err = "wet_bad_header"
        t = 0
        date = headers.get("warc-date", "")
        if date:
            parsed = parse_warc_date_us(date)
            if parsed is None:
                err = err or "wet_bad_date"
            else:
                t = parsed
        urls.append(url)
        ts_us.append(t)
        texts.append(text)
        errors.append(err)
    return {"url": urls, "warc_ts": ts_us, "text": texts, "wet_error": errors}


def read_wet_like(paths):
    """WET-style record files → Dataset (url, warc_ts, text, wet_error)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {"url": [], "warc_ts": [], "text": [], "wet_error": []}
        for data in batch.column("bytes").to_pylist():
            parsed = parse_wet_bytes(data)
            for k in cols:
                cols[k].extend(parsed[k])
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "text": pa.array(cols["text"], pa.string()),
                "wet_error": pa.array(cols["wet_error"], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
