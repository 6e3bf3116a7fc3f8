"""WARC-style source round-trip: write records → read → extract → byte-equal
to the parquet-path extraction."""

from __future__ import annotations

import pyarrow.parquet as pq

from pdf_extractor_ray import corpus
from pdf_extractor_ray.sources.warc_source import (
    parse_warc_bytes,
    read_warc_like,
    write_warc_like,
)


def _make_warc_files(sf_dir, tmp_path, n_files=4, n_docs=100):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    paths = []
    recs_per = n_docs // n_files
    rows = list(zip(docs.column("doc_id").to_pylist()[:n_docs], docs.column("text").to_pylist()[:n_docs]))
    for i in range(n_files):
        recs = [
            {
                "url": corpus.url_for_doc(d),
                "warc_ts_us": corpus.warc_ts_us_for_doc(d),
                "payload": corpus.render_payload(d, t),
            }
            for d, t in rows[i * recs_per : (i + 1) * recs_per]
        ]
        p = str(tmp_path / f"shard-{i}.warc")
        write_warc_like(recs, p)
        paths.append(p)
    return paths, rows


def test_warc_roundtrip_and_extraction(sf_dir, tmp_path):
    from pdf_extractor_ray.pipelines.extract import extract_pages

    paths, rows = _make_warc_files(sf_dir, tmp_path)
    pages = read_warc_like(paths)
    df = pages.to_pandas()
    assert len(df) == 100
    assert df.warc_error.isna().all()
    assert df.url.is_unique

    # payloads survive byte-exactly → extraction matches the parquet path
    out = extract_pages(pages.drop_columns(["warc_error"])).to_pandas().set_index("url")
    for d, t in rows:
        if corpus.is_malformed_doc(d) or not t:
            continue
        assert out.loc[corpus.url_for_doc(d)].extracted_text == t
    # warc_ts parsed back to the original microsecond timestamps
    want_ts = {corpus.url_for_doc(d): corpus.warc_ts_us_for_doc(d) for d, _ in rows}
    for url, ts in zip(df.url, df.warc_ts):
        assert int(ts.timestamp() * 1e6) == want_ts[url]


def test_warc_malformed_records_are_flagged_not_fatal():
    # good record + short-payload record + garbage header
    good = b"WARC/1.0\r\nWARC-Target-URI: https://a/1\r\nWARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    short = b"WARC/1.0\r\nWARC-Target-URI: https://a/2\r\nWARC-Date: 2024-01-01T00:00:00.000000Z\r\nContent-Length: 999\r\n\r\nxy"
    bad_hdr = b"WARC/1.0\r\nno-colon-line\r\nContent-Length: 1\r\n\r\nZ\r\n\r\n"
    cols = parse_warc_bytes(good + bad_hdr + good.replace(b"a/1", b"a/3"))
    assert cols["warc_error"] == [None, "warc_bad_header", None]
    cols = parse_warc_bytes(good + short)
    assert cols["warc_error"][1] == "warc_short_payload"
    assert cols["html"][0] == b"abc"


def test_warc_roundtrip_property_adversarial_payloads():
    """Well-formed records always round-trip — even when payloads contain
    CRLFs, header-like lines, or the WARC magic itself (Content-Length
    framing must win over content sniffing)."""
    from hypothesis import given, settings, strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200) | st.just(b"WARC/1.0\r\nWARC-Date: x\r\n\r\n"),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=40, deadline=None, derandomize=True)
    @given(ps=payloads)
    def run(ps):
        import io

        recs = [
            {"url": f"https://x/{i}", "warc_ts_us": 1_700_000_000_000_000 + i, "payload": p}
            for i, p in enumerate(ps)
        ]
        import tempfile, os

        with tempfile.NamedTemporaryFile(delete=False) as f:
            path = f.name
        try:
            write_warc_like(recs, path)
            cols = parse_warc_bytes(open(path, "rb").read())
            assert cols["url"] == [r["url"] for r in recs]
            assert cols["html"] == [r["payload"] for r in recs]
            assert cols["warc_error"] == [None] * len(recs)
        finally:
            os.unlink(path)

    run()
