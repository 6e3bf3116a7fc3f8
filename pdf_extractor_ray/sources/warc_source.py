"""WARC-style source: Common-Crawl-shaped record files → pages rows.

Real crawl corpora arrive as WARC record streams, not parquet. This source
reads record files with ``ray.data.read_binary_files`` (one file = one
splittable shard) and parses records inside ``map_batches`` — one input file
row → N pages rows (flat-map semantics), emitting the engine's canonical
pages schema ``(url, warc_ts, html)``.

Record format handled (the WARC subset that matters for response payloads)::

    WARC/1.0\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <ISO8601>\r\n
    Content-Length: <n>\r\n
    \r\n
    <n payload bytes>\r\n\r\n

Malformed records (bad header block, short payload) follow the engine's
ok/error policy: they become rows with empty payloads and a
``warc_error`` note rather than failing the shard.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAGIC = b"WARC/1.0\r\n"

# real Common-Crawl WARC/WET dates come in BOTH fractional- and whole-second
# forms — a single-format parse flags every real record as bad_date
_DATE_FORMATS = ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")


def parse_warc_date_us(date: str) -> int | None:
    """ISO8601 WARC-Date → epoch microseconds, or None if unparseable."""
    for fmt in _DATE_FORMATS:
        try:
            return int(
                datetime.strptime(date, fmt).replace(tzinfo=timezone.utc).timestamp() * 1e6
            )
        except ValueError:
            continue
    return None


def iter_warc_records(data: bytes):
    """Shared WARC record framing: yields (headers, ok, payload, short) per
    record — magic scan, CRLF header parse, Content-Length framing with the
    negative-length guard (a negative n would move the scan position
    BACKWARDS → infinite loop). One implementation for the WARC and WET
    sources so framing fixes cannot diverge."""
    pos = 0
    while True:
        start = data.find(_MAGIC, pos)
        if start < 0:
            return
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            return  # truncated trailing record: header never completes
        headers: dict[str, str] = {}
        ok = True
        for line in data[start + len(_MAGIC) : hdr_end].split(_CRLF):
            if b":" not in line:
                ok = False
                break
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        body_start = hdr_end + len(_HDR_END)
        try:
            n = int(headers.get("content-length", ""))
        except ValueError:
            ok, n = False, 0
        if n < 0:
            ok, n = False, 0
        payload = data[body_start : body_start + n] if ok else b""
        short = ok and len(payload) != n
        yield headers, ok, payload, short
        pos = body_start + n if ok else hdr_end + len(_HDR_END)


def write_warc_like(records: list[dict], path: str) -> None:
    """Test-fixture writer: records = [{url, warc_ts_us, payload}, ...]."""
    with open(path, "wb") as f:
        for r in records:
            ts = datetime.fromtimestamp(r["warc_ts_us"] / 1e6, tz=timezone.utc)
            payload = r["payload"]
            f.write(_MAGIC)
            f.write(f"WARC-Target-URI: {r['url']}\r\n".encode())
            f.write(f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%S.%f')}Z\r\n".encode())
            f.write(f"Content-Length: {len(payload)}\r\n".encode())
            f.write(_CRLF)
            f.write(payload)
            f.write(_HDR_END)


def parse_warc_bytes(data: bytes) -> dict[str, list]:
    """One file's bytes → columns {url, warc_ts (us), html, warc_error}."""
    urls: list[str] = []
    ts_us: list[int] = []
    payloads: list[bytes] = []
    errors: list[str | None] = []
    for headers, ok, payload, short in iter_warc_records(data):
        url = headers.get("warc-target-uri", "")
        err = None
        if ok and url:
            if short:
                err, payload = "warc_short_payload", b""
        else:
            err, payload = "warc_bad_header", b""
        t = 0
        date = headers.get("warc-date", "")
        if date:
            parsed = parse_warc_date_us(date)
            if parsed is None:
                err = err or "warc_bad_date"
            else:
                t = parsed
        urls.append(url)
        ts_us.append(t)
        payloads.append(payload)
        errors.append(err)
    return {"url": urls, "warc_ts": ts_us, "html": payloads, "warc_error": errors}


def read_warc_like(paths):
    """WARC-style record files → pages Dataset (url, warc_ts, html,
    warc_error). One read task per file; records parsed in-batch."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {"url": [], "warc_ts": [], "html": [], "warc_error": []}
        for data in batch.column("bytes").to_pylist():
            parsed = parse_warc_bytes(data)
            for k in cols:
                cols[k].extend(parsed[k])
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "html": pa.array(cols["html"], pa.binary()),
                "warc_error": pa.array(cols["warc_error"], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
