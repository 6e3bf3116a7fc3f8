"""Sinks: partitioned parquet (primary) + CSV export tail (SURVEY.md §2.1).

The reference writes one CSV per source plus a consolidated CSV
(/root/reference/dataextractai/utils/config.py:117-202); the engine's primary
sink is url-hash-partitioned parquet (resumable layout — one directory per
partition, see state/lineage.py for the committed-partition ledger), with CSV
export as an explicit tail step for interop.
"""

from __future__ import annotations


def write_partitioned_parquet(
    ds,
    out_dir: str,
    *,
    partition_cols: list[str] | None = None,
    min_rows_per_file: int | None = None,
    mode: str = "append",
):
    """Partitioned parquet sink. ``partition_cols`` defaults to the url-hash
    ``part_id`` so output layout aligns with the resume ledger; never one
    giant file (min_rows_per_file bounds file counts, partitions bound
    re-computation on failure)."""
    kwargs = {"mode": mode}
    if partition_cols is None:
        partition_cols = ["part_id"]
    kwargs["partition_cols"] = partition_cols
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    return ds.write_parquet(out_dir, **kwargs)


def export_xlsx(ds, out_path: str):
    """XLSX export (reference: df.to_excel, amazon_parser.py:266-277).
    Gated behind an import-try: no spreadsheet library ships in this
    container, so this raises NotImplementedError here; the call shape and
    the driver-side collection contract are what the engine defines."""
    try:
        import openpyxl  # noqa: F401 (not installed here)
    except ImportError as e:
        raise NotImplementedError(
            "xlsx export requires openpyxl; not available in this environment "
            "— use export_csv or write_partitioned_parquet"
        ) from e
    ds.to_pandas().to_excel(out_path, index=False)  # pragma: no cover


def export_csv(ds, out_dir: str, drop_columns: list[str] | None = None):
    """CSV export tail (drops non-CSV-representable columns like the spans
    list first — mirrors the reference's flat CSV contract)."""
    if drop_columns:
        present = [c for c in drop_columns if c in ds.schema().names]
        if present:
            ds = ds.drop_columns(present)
    return ds.write_csv(out_dir)


def union_by_name(datasets):
    """Schema-evolution union (UNION ALL BY NAME): align any number of
    Datasets whose schemas drifted — later snapshots adding or dropping
    columns — by the UNION of column names, null-filling what each side
    lacks, preserving each column's type from the first dataset that has
    it. The data-lake reality `ds.union`'s strict schema match can't
    serve. One stateless map_batches per input; no shuffle.

    Assumes a column's type in every later dataset is Arrow-castable to the
    first owner's type (int widening, string↔large_string); an incompatible
    drift (e.g. string → struct) fails inside the per-dataset align cast."""
    import pyarrow as pa

    if not datasets:
        raise ValueError("union_by_name: need at least one dataset")
    fields: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        for name, typ in zip(sch.names, sch.types):
            fields.setdefault(name, typ)
    names = list(fields)

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in t.column_names:
                cols.append(t.column(n).cast(fields[n]))
            else:
                cols.append(pa.nulls(t.num_rows, fields[n]))
        return pa.table(dict(zip(names, cols)))

    aligned = [
        ds.map_batches(align, batch_format="pyarrow", zero_copy_batch=True)
        for ds in datasets
    ]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
