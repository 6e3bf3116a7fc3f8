"""Extension surface (registry) + CSV sources/sinks tests."""

from __future__ import annotations

import os

import pandas as pd

import pyarrow.parquet as pq

from pdf_extractor_ray.sources.csv_source import read_headered_csv, read_wf_bank_positional
from pdf_extractor_ray.sources.sinks import export_csv, write_partitioned_parquet
from pdf_extractor_ray.stages.extract import ExtractDocuments
from pdf_extractor_ray.stages.registry import (
    ExtractorRegistry,
    HtmlExtractor,
    PdfExtractor,
    default_registry,
)


def test_registry_first_match_wins_and_lists():
    reg = default_registry()
    assert reg.list_extractors() == ["pdf_xycut_v1", "html_density_v1"]
    assert reg.detect(b"%PDF-1.4\n...").name == "pdf_xycut_v1"
    assert reg.detect(b"  <html>").name == "html_density_v1"
    assert reg.detect(b"\x00junk") is None


def test_registry_custom_extractor_routes_rows():
    class TsvExtractor:
        name = "tsv_v1"
        version = "0.0.1"

        def can_extract(self, head: bytes) -> bool:
            return head.startswith(b"#TSV")

        def extract(self, payload: bytes) -> dict:
            body = payload.decode("utf-8").split("\n", 1)[1]
            return {
                "status": "ok",
                "extracted_text": body.replace("\t", " "),
                "spans": [],
                "n_blocks": 1,
                "error": None,
            }

    reg = ExtractorRegistry()
    reg.register(TsvExtractor())
    reg.register(PdfExtractor())
    reg.register(HtmlExtractor())

    import pyarrow as pa

    batch = pa.table(
        {
            "doc_id": [1],
            "url": ["https://x.example/doc/1"],
            "html": [b"#TSV\na\tb\tc"],
            "lang": ["en"],
        }
    )
    out = ExtractDocuments(registry=reg)(batch)
    assert out.column("extractor")[0].as_py() == "tsv_v1"
    assert out.column("extracted_text")[0].as_py() == "a b c"


def test_positional_and_headered_csv_sources(tmp_path):
    headered = tmp_path / "h.csv"
    headered.write_text("date,amount\n2024-01-02,5.5\n2024-01-03,-1.0\n")
    ds = read_headered_csv([str(headered)], columns=["amount"])
    assert sorted(r["amount"] for r in ds.take_all()) == [-1.0, 5.5]

    positional = tmp_path / "p.csv"
    positional.write_text('01/02/24,"$1,234.00",*,1001,CHECK PAYMENT\n')
    ds = read_wf_bank_positional([str(positional)])
    row = ds.take_all()[0]
    assert row["date"] == "01/02/24"
    assert row["amount"] == "$1,234.00"
    assert row["check_number"] == "1001"


def test_sinks_partitioned_parquet_and_csv(sf_dir, tmp_path):
    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages

    ext = extract_pages(corpus.read_pages(sf_dir, fanout_blocks=8))
    out = str(tmp_path / "pq")
    write_partitioned_parquet(ext, out)
    parts = [d for d in os.listdir(out) if d.startswith("part_id=")]
    assert len(parts) == 16
    assert pq.read_table(out).num_rows == 500

    csv_out = str(tmp_path / "csv")
    ext2 = extract_pages(corpus.read_pages(sf_dir, fanout_blocks=8))
    export_csv(ext2.limit(50), csv_out, drop_columns=["spans"])
    files = os.listdir(csv_out)
    assert files


def test_raising_extractor_becomes_error_row_not_task_failure():
    """Per-row guard (review r2): one pathological document must divert to a
    status=error row — the reference's registry.py:33-35 contract — never
    fail the batch/task/job."""
    import pyarrow as pa

    from pdf_extractor_ray.stages.extract import ExtractDocuments
    from pdf_extractor_ray.stages.registry import ExtractorRegistry, HtmlExtractor

    class Bomb:
        name = "bomb_v1"
        version = "0"

        def can_extract(self, head: bytes) -> bool:
            return head.startswith(b"BOOM")

        def extract(self, payload: bytes) -> dict:
            raise RecursionError("pathological layout")

    reg = ExtractorRegistry()
    reg.register(Bomb())
    reg.register(HtmlExtractor())
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "url": ["https://h/x", "https://h/y"],
            "html": [b"BOOM payload", b"<p>" + b"fine content word " * 5 + b"</p>"],
            "lang": ["en", "en"],
        }
    )
    out = ExtractDocuments(registry=reg)(batch)
    rows = out.to_pylist()
    assert rows[0]["status"] == "error"
    assert "extractor_exception: RecursionError" in rows[0]["error"]
    assert rows[0]["extractor"] == "bomb_v1"
    assert rows[1]["status"] == "ok"  # the rest of the batch is unaffected


# --- ORC / Arrow-IPC round trips -------------------------------------------


def test_orc_round_trip(ray_session, tmp_path):
    """documents → ORC dir → read back: same rows; column pruning at the
    decode; content-addressed names make a second write a no-op set."""
    import os

    import ray.data as rd

    from pdf_extractor_ray.sources.orc_ipc import read_orc_dir, write_orc_dir

    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "orc")
    n = write_orc_dir(src, out)
    assert n == 500
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".orc") for f in files)

    back = read_orc_dir(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want[back.columns])

    pruned = read_orc_dir(out, columns=["doc_id", "lang"]).to_pandas()
    assert sorted(pruned.columns) == ["doc_id", "lang"] and len(pruned) == 500

    # idempotent re-write: same content → same names → same file set
    n2 = write_orc_dir(rd.read_parquet("/root/testdata/sf0.001/documents.parquet"), out)
    assert n2 == 500
    assert sorted(os.listdir(out)) == files


def test_ipc_round_trip(ray_session, tmp_path):
    import ray.data as rd

    from pdf_extractor_ray.sources.orc_ipc import read_ipc_dir, write_ipc_dir

    src = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "ipc")
    n = write_ipc_dir(src, out)
    assert n == 1000
    back = read_ipc_dir(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert back.equals(want[back.columns])


def test_union_by_name_schema_evolution(ray_session, tmp_path):
    """Snapshot B drops 'lang' and adds 'crawl_id': the union carries the
    superset schema, null-filling what each side lacks, all rows intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdf_extractor_ray.sources.sinks import union_by_name

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "lang": pa.array(["en", "fr"], pa.string()),
            }
        ),
        tmp_path / "a.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3], pa.int64()),
                "crawl_id": pa.array([7], pa.int64()),
            }
        ),
        tmp_path / "b.parquet",
    )
    a = rd.read_parquet(str(tmp_path / "a.parquet"))
    b = rd.read_parquet(str(tmp_path / "b.parquet"))
    got = union_by_name([a, b]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(got.columns) == ["crawl_id", "doc_id", "lang"]
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["lang"].tolist()[:2] == ["en", "fr"] and pd.isna(got["lang"][2])
    assert pd.isna(got["crawl_id"][0]) and got["crawl_id"][2] == 7


def test_partition_pruned_read_never_touches_pruned_dirs(ray_session, tmp_path):
    """Path-level pruning proof: a CORRUPT parquet file planted in a
    non-selected partition cannot break the read (a scan-then-filter
    reader would die on it); selected rows round-trip exactly and the
    partition column is re-attached."""
    import ray.data as rd

    from pdf_extractor_ray.sources.partitioned import (
        list_partitions,
        read_partitioned_parquet,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(12),
            "lang": ["en", "de", "fr"] * 4,
            "n": [i * 10 for i in range(12)],
        }
    )
    root = str(tmp_path / "lake")
    rd.from_pandas(df).write_parquet(root, partition_cols=["lang"])
    assert list_partitions(root, "lang") == ["de", "en", "fr"]

    # poison a partition the query will NOT select
    with open(os.path.join(root, "lang=fr", "garbage.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    got = (
        read_partitioned_parquet(root, "lang", values=["en", "de"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        df[df["lang"].isin(["en", "de"])]
        .astype({"lang": str})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )

    # misspelled partition fails loudly, not silently-empty
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_partitioned_parquet(root, "lang", values=["zz"])


def test_compact_parquet_dir_idempotent_roundtrip(ray_session, tmp_path):
    """Many tiny files -> few target-sized files; rows/values round-trip;
    re-running the compaction converges on the IDENTICAL output set
    (content-addressed names — no duplicates from a crashed retry)."""
    import ray.data as rd

    from pdf_extractor_ray.sources.partitioned import compact_parquet_dir

    src = tmp_path / "small"
    df = pd.DataFrame({"k": range(1000), "v": [i * 3 for i in range(1000)]})
    rd.from_pandas(df).repartition(50).write_parquet(str(src))
    n_small = sum(1 for n in os.listdir(src) if n.endswith(".parquet"))
    assert n_small >= 20  # genuinely fragmented input

    out = tmp_path / "compact"
    r1 = compact_parquet_dir(str(src), str(out), target_rows_per_file=400)
    assert r1["rows"] == 1000
    assert r1["files_out"] <= 4  # ceil(1000/400)=3 blocks (+slack)
    got = rd.read_parquet(str(out)).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df, check_dtype=False)

    before = sorted(os.listdir(out))
    r2 = compact_parquet_dir(str(src), str(out), target_rows_per_file=400)
    assert sorted(os.listdir(out)) == before  # idempotent re-run
