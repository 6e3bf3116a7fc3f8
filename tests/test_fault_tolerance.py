"""Task-level fault tolerance: Ray Data retries a failed map task from
lineage and the pipeline still completes with exact results — the property
that makes a 256-node 100 TB run survive preempted workers without
restarting the job. The failing function crashes the FIRST time each
worker process sees a given marker, then succeeds on retry (a transient
fault, the common real-world case)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def test_map_task_retry_transient_fault(ray_session, tmp_path):
    import ray.data as rd

    marker_dir = str(tmp_path / "faults")
    os.makedirs(marker_dir, exist_ok=True)

    def flaky_double(t: pa.Table, _dir=marker_dir) -> pa.Table:
        # crash exactly once per block (block identity = its first id):
        # the retry of the same block finds the marker and succeeds
        first = int(t.column("id")[0].as_py())
        marker = os.path.join(_dir, f"block-{first}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("seen")
            raise RuntimeError(f"transient fault on block {first}")
        return t.append_column("doubled", pc.multiply(t.column("id"), 2))

    # system faults (worker death) retry automatically; APPLICATION
    # exceptions need the explicit opt-in below — the production setting
    # for stages with known-transient failure modes (network fetch, codec)
    ds = rd.range(1000, override_num_blocks=8).map_batches(
        flaky_double,
        batch_format="pyarrow",
        zero_copy_batch=True,
        retry_exceptions=[RuntimeError],
        max_retries=2,
    )
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 1000
    assert (out["doubled"] == out["id"] * 2).all()
    # every block faulted exactly once and was retried
    assert len(os.listdir(marker_dir)) == 8
