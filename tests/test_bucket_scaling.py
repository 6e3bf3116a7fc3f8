"""Scale-derived bucket counts (VERDICT r4 wrong #1 / next-round #2).

``map_key_buckets`` no longer partitions every input into a fixed 64
buckets: the count derives from the input's metadata row count so one
bucket's pandas frame is memory-bounded by design. These tests pin

1. the derivation itself (floor at small inputs, ceil(rows/target) when
   forced, execution-free estimates through transform chains), and
2. bucket-count INVARIANCE: forcing a tiny GRAFT_ROWS_PER_BUCKET (many
   buckets) leaves window-family results bit-identical — bucketing is pure
   partitioning, never semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_ray.pipelines.relational import (
    N_KEY_BUCKETS,
    _source_row_estimate,
    derive_n_buckets,
)


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_source_row_estimate_fresh_read(sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    assert _source_row_estimate(ds) == 1000


def test_source_row_estimate_through_transforms(sf_dir):
    """The estimate must not require execution: a map_batches chain still
    reports the source read's metadata rows (1:1-transform proxy)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    assert _source_row_estimate(ds) == 1000


def test_source_row_estimate_unknown_input():
    import ray.data as rd

    ds = rd.from_items([{"k": 1}, {"k": 2}])
    # from_items has no parquet metadata -> None is acceptable, or the exact
    # count if Ray knows it; derive_n_buckets must fall back to the floor.
    assert derive_n_buckets(ds) == N_KEY_BUCKETS


def test_derive_floor_and_scaling(sf_dir, monkeypatch):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    # 1000 rows / 2M target -> floor
    assert derive_n_buckets(ds) == N_KEY_BUCKETS
    # forced tiny target -> ceil(1000/7) = 143 buckets
    monkeypatch.setenv("GRAFT_ROWS_PER_BUCKET", "7")
    assert derive_n_buckets(ds) == 143
    # est_rows override wins over metadata
    assert derive_n_buckets(ds, est_rows=7000) == 1000


@pytest.mark.parametrize(
    "qname",
    [
        "running_total",
        "events_since_purchase",
        "last_nonnull_carry",
        "windowed_topk_types",
        "rank_in_group",
    ],
)
def test_bucket_count_invariance(sf_dir, qname, monkeypatch):
    """Forcing many tiny buckets must leave results bit-identical: the
    bucket is partitioning only (every row of a key still lands in exactly
    one bucket), so per-key window results cannot depend on the count."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn = mod.queries()[qname]

    monkeypatch.delenv("GRAFT_ROWS_PER_BUCKET", raising=False)
    base = _canon(fn(sf_dir))
    monkeypatch.setenv("GRAFT_ROWS_PER_BUCKET", "3")  # ceil(1000/3) = 334 buckets
    many = _canon(fn(sf_dir))
    pd.testing.assert_frame_equal(base, many, check_exact=True)
