"""ORC and Arrow-IPC (Feather v2) sources/sinks (SURVEY.md §2.1 breadth).

Ray 2.49 ships no read_orc / read_ipc; both formats arrive here as
``read_binary_files`` + an in-batch pyarrow decode — the same
bytes-then-parse shape as the WARC/WET sources, so a lake laid out in ORC
or IPC streams through the engine without a conversion hop. Sinks write
ONE FILE PER BLOCK into a directory (resumable layout, never one giant
file), named by the sha256 of the file's own bytes — content-addressed, so
re-runs converge on the identical file set and concurrent writers can
never corrupt each other (an idempotent commit, same property the
parquet export manifest gates on).

Scale note: a single ORC/IPC file decodes inside one task (file-level
parallelism, like every file-based reader); shard the lake into many files
— the writers here do exactly that.
"""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa


def read_orc_dir(path_or_paths, columns: list[str] | None = None):
    """ORC directory/file(s) → Dataset: binary files → per-file pyarrow.orc
    decode (column-pruned at the decode — ORC stripes make that cheap)."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        out = []
        for buf in batch.column("bytes").to_pylist():
            f = orc.ORCFile(io.BytesIO(buf))
            out.append(f.read(columns=columns))
        return pa.concat_tables(out) if out else pa.table({})

    files = rd.read_binary_files(path_or_paths, file_extensions=["orc"])
    return files.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def write_orc_dir(ds, out_dir: str) -> int:
    """Dataset → directory of content-addressed ORC files, one per block.
    Returns total rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        bio = io.BytesIO()
        orc.write_table(batch, bio)
        data = bio.getvalue()
        name = hashlib.sha256(data).hexdigest()[:16]
        with open(os.path.join(out_dir, f"part-{name}.orc"), "wb") as f:
            f.write(data)
        return pa.table({"n_rows": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True)
    return int(parts.sum("n_rows") or 0)


def read_ipc_dir(path_or_paths, columns: list[str] | None = None):
    """Arrow IPC / Feather-v2 files → Dataset (zero-copy-friendly decode)."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        from pyarrow import ipc

        out = []
        for buf in batch.column("bytes").to_pylist():
            t = ipc.open_file(pa.BufferReader(buf)).read_all()
            if columns:
                t = t.select(columns)
            out.append(t)
        return pa.concat_tables(out) if out else pa.table({})

    files = rd.read_binary_files(path_or_paths, file_extensions=["arrow", "feather"])
    return files.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def write_ipc_dir(ds, out_dir: str) -> int:
    """Dataset → directory of content-addressed Arrow IPC files, one per
    block (the hashed bytes ARE the file). Returns total rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import ipc

        bio = pa.BufferOutputStream()
        with ipc.new_file(bio, batch.schema) as w:
            w.write_table(batch)
        data = bio.getvalue().to_pybytes()
        name = hashlib.sha256(data).hexdigest()[:16]
        with open(os.path.join(out_dir, f"part-{name}.arrow"), "wb") as f:
            f.write(data)
        return pa.table({"n_rows": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True)
    return int(parts.sum("n_rows") or 0)
