"""CLI lifecycle test (SURVEY.md §3 entry-point parity). Runs in-process
against the session fixture's Ray (the CLI must not shut down a session it
did not start)."""

from __future__ import annotations

import json

import ray

from pdf_extractor_ray.cli import main


def test_cli_extract_status_quality(sf_dir, tmp_path, capsys):
    out = str(tmp_path / "run")
    assert main(["extract", "--sf-dir", sf_dir, "--out", out, "--units", "2"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["units_run"] == 2
    assert r["n_rows"] == 500 and r["n_ok"] == 490
    assert ray.is_initialized()  # embedded session untouched

    assert main(["status", "--out", out]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["committed_parts"] == list(range(16))

    # idempotent resume: second extract run is a no-op
    assert main(["extract", "--sf-dir", sf_dir, "--out", out, "--units", "2"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["units_run"] == 0
    assert r2["skipped_parts"] == list(range(16))

    assert main(["quality", "--sf-dir", sf_dir]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hosts = {h["host"]: h for h in q["hosts"]}
    assert hosts["big-portal.example.com"]["n_pages"] == 200  # skew head
    assert ray.is_initialized()
