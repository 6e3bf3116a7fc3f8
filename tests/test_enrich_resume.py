"""Kill-between-passes resume for the enrichment pipeline (VERDICT r1 #9).

Mirrors test_lineage_resume's crash-injection pattern: a run that dies
between pass 1 and pass 2 must, on resume, skip pass 1 entirely (marker
run_id unchanged) and produce output identical to the uncheckpointed
classify_escalate pipeline.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_ray.pipelines.enrich import (
    PASS_LOGIC_VERSION,
    classify_escalate,
    classify_escalate_resumable,
)
from pdf_extractor_ray.state.lineage import PassCheckpointer


def _canon(obj) -> pd.DataFrame:
    df = obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)[sorted(df.columns)]


def _escalate_fp(sf_dir: str) -> str:
    return f"{sf_dir}|fast>precise|v{PASS_LOGIC_VERSION}"


def test_crash_between_passes_resumes_without_recompute(sf_dir, tmp_path):
    out = str(tmp_path / "enrich_ck")

    # run A: crashes after completing pass 1
    with pytest.raises(RuntimeError, match="injected_failure"):
        classify_escalate_resumable(sf_dir, out, fail_after_passes=1, run_id="runA")

    ck = PassCheckpointer(out, fingerprint=_escalate_fp(sf_dir))
    assert ck.done("fast")
    assert not ck.done("precise")
    assert ck.committed_run_id("fast") == "runA"

    # run B: resumes — only the precise pass runs; pass 1 is NOT recomputed
    res = classify_escalate_resumable(sf_dir, out, run_id="runB")
    assert res["passes_run"] == 1
    assert ck.committed_run_id("fast") == "runA"  # untouched by run B
    assert ck.committed_run_id("precise") == "runB"

    # final output byte-equal to the uncheckpointed pipeline
    pd.testing.assert_frame_equal(
        _canon(res["result"]), _canon(classify_escalate(sf_dir)), check_dtype=False
    )


def test_three_pass_crash_resume(sf_dir, tmp_path):
    from pdf_extractor_ray.pipelines.enrich import (
        classify_three_pass,
        classify_three_pass_resumable,
    )

    out = str(tmp_path / "three_ck")
    with pytest.raises(RuntimeError, match="injected_failure"):
        classify_three_pass_resumable(sf_dir, out, fail_after_passes=1, run_id="runA")
    ck = PassCheckpointer(
        out, fingerprint=f"{sf_dir}|classify_distinct>join_back|v{PASS_LOGIC_VERSION}"
    )
    assert ck.done("classify_distinct") and not ck.done("join_back")

    res = classify_three_pass_resumable(sf_dir, out, run_id="runB")
    assert res["passes_run"] == 1  # the model stage was NOT recomputed
    assert ck.committed_run_id("classify_distinct") == "runA"
    pd.testing.assert_frame_equal(
        _canon(res["result"]), _canon(classify_three_pass(sf_dir)), check_dtype=False
    )


def test_changed_input_invalidates_checkpoints(tmp_path):
    """ADVICE r2: rerunning with the same out_dir but a different sf_dir must
    NOT silently reuse the stale pass snapshot — the marker fingerprint
    mismatch forces a recompute."""
    out = str(tmp_path / "enrich_fp")
    a = classify_escalate_resumable("/root/testdata/sf0.001", out, run_id="runA")
    assert a["passes_run"] == 2
    b = classify_escalate_resumable("/root/testdata/sf0.01", out, run_id="runB")
    assert b["passes_run"] == 2  # both passes recomputed for the new input
    pd.testing.assert_frame_equal(
        _canon(b["result"]),
        _canon(classify_escalate("/root/testdata/sf0.01")),
        check_dtype=False,
    )


def test_completed_run_is_idempotent(sf_dir, tmp_path):
    out = str(tmp_path / "enrich_ck2")
    first = classify_escalate_resumable(sf_dir, out, run_id="run1")
    assert first["passes_run"] == 2
    again = classify_escalate_resumable(sf_dir, out, run_id="run2")
    assert again["passes_run"] == 0  # nothing recomputed
    pd.testing.assert_frame_equal(
        _canon(first["result"]), _canon(again["result"]), check_dtype=False
    )
