"""Checkpoint/resume semantics (FIXTURES.md §4, SURVEY.md §5d):
kill after partial commit, re-run, assert no duplicates, no recompute of
committed partitions, and an identical final table."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pdf_extractor_ray.state.lineage import LineageLedger, extract_with_resume


def _read_all(out_dir):
    return pq.read_table(os.path.join(out_dir, "data")).to_pandas()


def test_full_run_commits_all_partitions(sf_dir, tmp_path):
    out = str(tmp_path / "run")
    r = extract_with_resume(sf_dir, out, units=4)
    assert r["units_run"] == 4
    ledger = LineageLedger(out)
    assert ledger.committed_parts() == set(range(16))
    df = _read_all(out)
    assert len(df) == 500
    assert df.doc_id.is_unique
    m = ledger.manifest().to_pandas()
    assert m.n_rows.sum() == 500
    assert (m.n_ok + m.n_error + m.n_empty == m.n_rows).all()


def test_crash_and_resume_recomputes_nothing_committed(sf_dir, tmp_path):
    out = str(tmp_path / "run")
    # run 1: crash after 2 of 4 units committed
    with pytest.raises(RuntimeError, match="injected_failure"):
        extract_with_resume(sf_dir, out, units=4, fail_after_units=2)
    ledger = LineageLedger(out)
    done_before = ledger.committed_parts()
    assert 0 < len(done_before) < 16
    # record the committed partitions' file mtimes
    mtimes = {}
    for p in done_before:
        pdir = os.path.join(out, "data", f"part_id={p}")
        for f in os.listdir(pdir):
            mtimes[f"{p}/{f}"] = os.path.getmtime(os.path.join(pdir, f))

    # run 2: resume to completion
    r = extract_with_resume(sf_dir, out, units=4)
    assert r["skipped_parts"] == sorted(done_before)
    assert r["units_run"] == 2  # only the uncommitted waves ran
    assert ledger.committed_parts() == set(range(16))

    # committed partitions were not rewritten
    for key, mt in mtimes.items():
        p, f = key.split("/", 1)
        path = os.path.join(out, "data", f"part_id={p}", f)
        assert os.path.getmtime(path) == mt, f"partition {p} was recomputed"

    # final table identical to a clean one-shot run
    df = _read_all(out).sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    assert df.doc_id.is_unique
    clean = str(tmp_path / "clean")
    extract_with_resume(sf_dir, clean, units=4)
    cdf = _read_all(clean).sort_values("doc_id").reset_index(drop=True)
    pd_cols = ["doc_id", "url", "status", "extracted_text", "host", "part_id"]
    assert df[pd_cols].equals(cdf[pd_cols])


def test_resume_on_complete_run_is_noop(sf_dir, tmp_path):
    out = str(tmp_path / "run")
    extract_with_resume(sf_dir, out, units=2)
    r = extract_with_resume(sf_dir, out, units=2)
    assert r["units_run"] == 0
    assert r["skipped_parts"] == list(range(16))


def test_mid_write_crash_partial_files_are_cleared_on_resume(sf_dir, tmp_path):
    """A crash MID-WRITE leaves parquet files in a partition dir with no
    manifest row; resume must treat them as garbage (manifest-after-data
    ordering), not append next to them."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    out = str(tmp_path / "run")
    with pytest.raises(RuntimeError):
        extract_with_resume(sf_dir, out, units=4, fail_after_units=2)
    done = LineageLedger(out).committed_parts()
    victim = next(p for p in range(16) if p not in done)
    pdir = os.path.join(out, "data", f"part_id={victim}")
    os.makedirs(pdir, exist_ok=True)
    # fake partial output from the dead run
    pq2.write_table(
        pa.table({"doc_id": [999999], "url": ["https://junk/x"], "status": ["ok"]}),
        os.path.join(pdir, "partial-000.parquet"),
    )
    extract_with_resume(sf_dir, out, units=4)
    df = _read_all(out)
    assert len(df) == 500
    assert df.doc_id.is_unique
    assert 999999 not in set(df.doc_id)
