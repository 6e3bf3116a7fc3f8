"""Flagship extraction pipeline: pages → extracted (+ quality-by-host stats).

Ray-Data-first shape (SURVEY.md §7.1): ``read_parquet`` (or the synthetic
pages stage) → one actor-pool ``map_batches`` extraction stage → streaming
consumers (``write_parquet`` partitioned by url-hash, or grouped quality
stats with per-batch pre-aggregation before the shuffle).
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow as pa

from ..schemas import DEFAULT_NUM_PARTITIONS
from ..stages.extract import ExtractDocuments


@lru_cache(maxsize=None)
def _worker_extractor(num_partitions: int) -> ExtractDocuments:
    """Task-mode state amortization: one ExtractDocuments per WORKER PROCESS
    (lru_cache is per-process), so compiled patterns are reused across tasks
    without paying actor-pool scheduling overhead."""
    return ExtractDocuments(num_partitions=num_partitions)


def extract_pages(
    pages_ds,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_size: int | None = None,
    concurrency=None,
):
    """pages Dataset → extracted Dataset (EXTRACTED_SCHEMA rows).

    Default is STATELESS TASKS (concurrency=None): measured 3× faster than an
    actor pool for this stage on a single node because the extractor's state
    (compiled regexes, geometry config) is cheap — it is rebuilt lazily once
    per worker process via ``_worker_extractor``. Pass ``concurrency=N`` or
    ``(min, max)`` to run as an actor pool instead — the right choice when
    per-actor state is genuinely expensive (models, codecs); size the pool
    below the CPU count so upstream read tasks are not starved.

    ``batch_size=None`` keeps block-driven batching: Ray otherwise bundles
    upstream blocks up to batch_size INPUT rows, which collapses parallelism
    when input rows are few but heavy (the wide-binary-payload case,
    SURVEY.md §4.2).
    """
    if concurrency is None:
        return pages_ds.map_batches(
            lambda b: _worker_extractor(num_partitions)(b),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return pages_ds.map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"num_partitions": num_partitions},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dedup_extracted_by_url(extracted_ds):
    """Exact dedup on the url key (§2.7, normalize_api.py:21-33 semantics):
    hash-partition on url via groupby, keep the deterministic representative
    (first by (status, doc_id) — prefers an ok row over an error row for the
    same url, then the lowest doc_id). Used on re-crawled corpora where the
    unique-url input invariant does not hold."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import fnv1a64_arrow

    n_buckets = 64

    def add_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        status = t.column("status")
        rank = pc.if_else(
            pc.equal(status, "ok"),
            pa.scalar(0, pa.int64()),
            pc.if_else(pc.equal(status, "empty"), pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64())),
        ).to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # one sortable key: status rank in the high bits, doc_id below.
        # ADVICE r2: a doc_id ≥ 2^52 would silently corrupt the packed
        # ordering — fail loudly instead (switch to a two-column idxmin if
        # ids ever outgrow this)
        if doc.size and int(doc.max()) >= (1 << 52):
            raise ValueError("dedup_extracted_by_url: doc_id >= 2^52 breaks the packed rank key")
        key = rank * np.int64(1 << 52) + doc
        # vectorized buffer-view hash (bucket id only — any stable hash
        # works; the old zlib.crc32 fromiter was a per-row Python trip)
        bucket = (fnv1a64_arrow(t.column("url")) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return t.append_column("_rank_key", pa.array(key)).append_column(
            "_bucket", pa.array(bucket)
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # one group per url-hash BUCKET, not per url (NOTES: ~1 ms/group for
        # tiny groups); the per-url argmin is vectorized pandas inside
        idx = g.groupby("url")["_rank_key"].idxmin()
        return g.loc[idx].drop(columns=["_rank_key", "_bucket"])

    return (
        extracted_ds.map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pick, batch_format="pandas")
    )


def _quality_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation (combiner) before the groupby shuffle:
    emit one row per host per batch instead of one per page, so the
    all-to-all exchange moves ~|hosts| rows per block, not the whole table.
    This is also the skew defence — a 40%-of-corpus host contributes one
    partial row per block regardless of its row share."""
    import pyarrow.compute as pc

    tbl = pa.table(
        {
            "host": batch.column("host"),
            "is_ok": pc.cast(pc.equal(batch.column("status"), "ok"), pa.int64()),
            "is_error": pc.cast(pc.equal(batch.column("status"), "error"), pa.int64()),
            "is_empty": pc.cast(pc.equal(batch.column("status"), "empty"), pa.int64()),
            # utf8_length takes large_string directly — the cast-to-string it
            # replaced copied every extracted byte per batch (and would hit
            # the 2 GiB int32-offset ceiling on huge blocks)
            "n_chars": pc.cast(pc.utf8_length(batch.column("extracted_text")), pa.int64()),
            "n_blocks": pc.cast(batch.column("n_blocks"), pa.int64()),
        }
    )
    return tbl.group_by("host").aggregate(
        [
            ("is_ok", "sum"),
            ("is_error", "sum"),
            ("is_empty", "sum"),
            ("n_chars", "sum"),
            ("n_blocks", "sum"),
            ("host", "count"),
        ]
    ).rename_columns(["host", "n_ok", "n_error", "n_empty", "sum_chars", "sum_blocks", "n_pages"])


def quality_by_host(extracted_ds):
    """groupby(host) extraction-quality stats with partial pre-aggregation
    (reference analog: per-parser success/fail rollup, SURVEY.md §2.5)."""
    from ray.data.aggregate import Sum

    partials = extracted_ds.map_batches(_quality_partials, batch_format="pyarrow")
    return partials.groupby("host").aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_ok", alias_name="n_ok"),
        Sum("n_error", alias_name="n_error"),
        Sum("n_empty", alias_name="n_empty"),
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("sum_blocks", alias_name="sum_blocks"),
    )
