"""WET + JSONL source round-trips (source-format breadth, SURVEY §2.1).

Same contract as the WARC source tests: write fixture shards from the
documents table → read through the Ray source → rows byte-equal the
originals; malformed records divert to error rows, never fail a shard.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from pdf_extractor_ray import corpus
from pdf_extractor_ray.sources.jsonl_source import (
    parse_jsonl_line,
    read_jsonl_like,
    write_jsonl_like,
)
from pdf_extractor_ray.sources.wet_source import (
    parse_wet_bytes,
    read_wet_like,
    write_wet_like,
)


def _doc_rows(sf_dir, n_docs=100):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(
        zip(docs.column("doc_id").to_pylist()[:n_docs], docs.column("text").to_pylist()[:n_docs])
    )


def test_wet_roundtrip_with_warcinfo_skip(sf_dir, tmp_path):
    rows = _doc_rows(sf_dir)
    paths = []
    for i in range(4):
        recs = [
            {"url": corpus.url_for_doc(d), "warc_ts_us": corpus.warc_ts_us_for_doc(d), "text": t}
            for d, t in rows[i * 25 : (i + 1) * 25]
        ]
        p = str(tmp_path / f"shard-{i}.wet")
        write_wet_like(recs, p)  # leading warcinfo record included
        paths.append(p)

    df = read_wet_like(paths).to_pandas()
    assert len(df) == 100  # warcinfo records skipped, conversions kept
    assert df.wet_error.isna().all()
    got = dict(zip(df.url, df.text))
    for d, t in rows:
        assert got[corpus.url_for_doc(d)] == t  # text survives byte-exactly
    want_ts = {corpus.url_for_doc(d): corpus.warc_ts_us_for_doc(d) for d, _ in rows}
    for url, ts in zip(df.url, df.warc_ts):
        assert int(ts.timestamp() * 1e6) == want_ts[url]


def test_wet_malformed_records_flagged_not_fatal():
    good = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/1\r\n"
        b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    short = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/2\r\n"
        b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: 999\r\n\r\nxy"
    )
    bad_utf8 = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/3\r\n"
        b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: 2\r\n\r\n\xff\xfe\r\n\r\n"
    )
    cols = parse_wet_bytes(good + bad_utf8 + short)
    assert cols["wet_error"] == [None, "wet_bad_utf8", "wet_short_payload"]
    assert cols["text"][0] == "abc"

    # negative Content-Length must not loop forever (pos moving backwards)
    neg = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/4\r\n"
        b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: -999\r\n\r\nxx"
    )
    cols = parse_wet_bytes(good + neg)
    assert cols["wet_error"] == [None, "wet_bad_header"]

    from pdf_extractor_ray.sources.warc_source import parse_warc_bytes

    warc_neg = neg.replace(b"WARC-Type: conversion\r\n", b"")
    wcols = parse_warc_bytes(warc_neg)
    assert wcols["warc_error"] == ["warc_bad_header"]


def test_whole_second_warc_dates_accepted():
    """Real Common-Crawl WET/WARC dates have NO fractional seconds — both
    forms must parse (a single-format parse flagged every real record)."""
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/1\r\n"
        b"WARC-Date: 2017-03-20T17:22:30Z\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    cols = parse_wet_bytes(rec)
    assert cols["wet_error"] == [None]
    assert cols["warc_ts"][0] == 1490030550000000  # 2017-03-20T17:22:30Z in us

    from pdf_extractor_ray.sources.warc_source import parse_warc_bytes

    wcols = parse_warc_bytes(rec)
    assert wcols["warc_error"] == [None] and wcols["warc_ts"][0] == 1490030550000000


def test_jsonl_roundtrip_through_extraction(sf_dir, tmp_path):
    from pdf_extractor_ray.pipelines.extract import extract_pages

    rows = _doc_rows(sf_dir)
    paths = []
    for i in range(4):
        recs = [
            {
                "url": corpus.url_for_doc(d),
                "warc_ts_us": corpus.warc_ts_us_for_doc(d),
                "payload": corpus.render_payload(d, t),
            }
            for d, t in rows[i * 25 : (i + 1) * 25]
        ]
        p = str(tmp_path / f"shard-{i}.jsonl")
        write_jsonl_like(recs, p)
        paths.append(p)

    pages = read_jsonl_like(paths)
    df = pages.to_pandas()
    assert len(df) == 100
    assert df.jsonl_error.isna().all()
    assert df.url.is_unique

    # payloads survive base64 round-trip byte-exactly → extraction matches
    out = extract_pages(pages.drop_columns(["jsonl_error"])).to_pandas().set_index("url")
    for d, t in rows:
        if corpus.is_malformed_doc(d) or not t:
            continue
        assert out.loc[corpus.url_for_doc(d)].extracted_text == t


def test_jsonl_malformed_lines_flagged_not_fatal():
    assert parse_jsonl_line("{not json")["jsonl_error"] == "jsonl_bad_json"
    assert parse_jsonl_line("[1, 2]")["jsonl_error"] == "jsonl_not_object"
    assert parse_jsonl_line('{"warc_ts_us": 5}')["jsonl_error"] == "jsonl_missing_url"
    assert (
        parse_jsonl_line('{"url": "u", "warc_ts_us": "x"}')["jsonl_error"] == "jsonl_bad_ts"
    )
    assert (
        parse_jsonl_line('{"url": "u", "warc_ts_us": 1, "html_b64": "!!"}')["jsonl_error"]
        == "jsonl_bad_base64"
    )
    ok = parse_jsonl_line('{"url": "u", "warc_ts_us": 1, "html": "<p>x</p>"}')
    assert ok["jsonl_error"] is None and ok["html"] == b"<p>x</p>"
    # absent / null / non-string payloads are broken records, not empty pages
    for line in (
        '{"url": "u", "warc_ts_us": 1}',
        '{"url": "u", "warc_ts_us": 1, "html": null}',
        '{"url": "u", "warc_ts_us": 1, "html": 123}',
    ):
        assert parse_jsonl_line(line)["jsonl_error"] == "jsonl_missing_payload"
    # bool is an int subclass; unbounded JSON ints overflow timestamp("us") —
    # both must become error ROWS, not batch crashes
    assert parse_jsonl_line('{"url": "u", "warc_ts_us": true}')["jsonl_error"] == "jsonl_bad_ts"
    big = parse_jsonl_line('{"url": "u", "warc_ts_us": 100000000000000000000000000}')
    assert big["jsonl_error"] == "jsonl_bad_ts" and big["warc_ts"] == 0
