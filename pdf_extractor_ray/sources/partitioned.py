"""Hive-layout partitioned parquet source with PATH-LEVEL partition pruning.

The write side (`sinks.write_partitioned_parquet`) lays out
``root/col=value/*.parquet``; at 100 TB the read side must be able to open
ONLY the partitions a query needs — a full-scan-then-filter read pays the
whole corpus's IO for a one-partition question. Pruning here is explicit
path enumeration (glob the selected ``col=value`` dirs), not an opaque
predicate-pushdown promise: the non-selected partitions are PROVABLY
untouched (the test plants a corrupt parquet file in a pruned-away
partition and the read still succeeds).

Reference parity: the reference reads per-client directories selectively
(/root/reference/dataextractai/utils/config.py — per-source input dirs);
this is that idea lifted to a keyed data-lake layout.
"""

from __future__ import annotations

import os


def list_partitions(root: str, partition_col: str) -> list[str]:
    """Values present under ``root`` for ``partition_col`` (sorted, decoded
    from the ``col=value`` dir names)."""
    pre = partition_col + "="
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith(pre) and os.path.isdir(os.path.join(root, name)):
            out.append(name[len(pre) :])
    return out


def read_partitioned_parquet(
    root: str,
    partition_col: str,
    values=None,
    columns: list[str] | None = None,
):
    """Read a hive-partitioned parquet tree, opening ONLY the partitions in
    ``values`` (all partitions when None). The partition column is
    re-attached as a string column (hive dirs erase it from the row
    groups), so downstream code sees the same schema the writer had.

    Scale shape: pruning happens before any file is opened — IO is
    proportional to the SELECTED partitions; each partition dir keeps its
    own read-task fan-out. Selecting a value with no directory raises
    (misspelled partition values should fail loudly, not return an empty
    dataset that looks like a correct answer).
    """
    import pyarrow as pa
    import ray.data as rd

    if values is None:
        values = list_partitions(root, partition_col)
    # hive dirs erase the partition column from row groups — never ask the
    # file reader for it
    file_cols = None if columns is None else [c for c in columns if c != partition_col]
    parts = []
    for v in values:
        d = os.path.join(root, f"{partition_col}={v}")
        if not os.path.isdir(d):
            raise ValueError(f"no partition dir {d!r}")
        ds = rd.read_parquet(d, columns=file_cols)
        val = str(v)

        def attach(t: pa.Table, _v=val) -> pa.Table:
            if partition_col in t.column_names:
                return t
            return t.append_column(
                partition_col, pa.array([_v] * t.num_rows, pa.string())
            )

        parts.append(ds.map_batches(attach, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def compact_parquet_dir(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 100_000,
    columns: list[str] | None = None,
) -> dict:
    """Small-file compaction — the data-lake maintenance pass every
    streaming writer eventually needs (a day of micro-batches leaves
    thousands of KB-sized files whose per-file open/footer cost dominates
    reads). Reads the directory, repartitions to ~target_rows_per_file
    blocks, and writes CONTENT-ADDRESSED files (name = sha256 of the
    file's own bytes, the orc_ipc sink convention) — so re-running a
    crashed compaction converges on the identical output set instead of
    duplicating it, and a concurrent reader never sees a torn file
    (os.replace of a same-dir temp).

    Returns {"files_in", "files_out", "rows"} for the maintenance log.
    Scale shape: one streaming read → repartition (block exchange, no
    row shuffle) → one write task per output block."""
    import hashlib
    import io

    import pyarrow.parquet as pq
    import ray.data as rd

    files_in = sum(1 for n in os.listdir(in_dir) if n.endswith(".parquet"))
    ds = rd.read_parquet(in_dir, columns=columns)
    rows = ds.count()
    n_out = max(1, -(-rows // target_rows_per_file))  # ceil
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t):
        if t.num_rows == 0:
            return t.slice(0, 0)
        buf = io.BytesIO()
        pq.write_table(t, buf)
        data = buf.getvalue()
        name = hashlib.sha256(data).hexdigest()[:16]
        tmp = os.path.join(out_dir, f".tmp-{name}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, f"{name}.parquet"))
        return t.slice(0, 0)

    ds.repartition(n_out).map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    files_out = sum(1 for n in os.listdir(out_dir) if n.endswith(".parquet"))
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
