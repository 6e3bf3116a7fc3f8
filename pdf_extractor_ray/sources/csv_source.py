"""CSV sources — headered and headerless-positional (SURVEY.md §2.1).

The reference consumes per-bank CSVs two ways: header-sniffed
(``pd.read_csv``, apple_card/capitalone/chase parsers) and headerless with a
fixed positional 5-column schema (/root/reference/dataextractai/parsers/
wellsfargo_bank_csv_parser.py:67-71: ``date, amount, *, check_number,
description``). Both become ``ray.data.read_csv`` with explicit Arrow
options — schema declared at the boundary, not inferred row-by-row.
"""

from __future__ import annotations

import pyarrow as pa
from pyarrow import csv as pacsv

WF_BANK_POSITIONAL = ["date", "amount", "star", "check_number", "description"]


def read_headered_csv(paths, columns: list[str] | None = None):
    """Header row present; optional column pruning at the read."""
    import ray.data as rd

    ds = rd.read_csv(paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_positional_csv(paths, column_names: list[str], column_types: dict | None = None):
    """Headerless CSV with a fixed positional schema."""
    import ray.data as rd

    read_options = pacsv.ReadOptions(column_names=column_names)
    convert_options = None
    if column_types:
        convert_options = pacsv.ConvertOptions(column_types=column_types)
    return rd.read_csv(
        paths, read_options=read_options, convert_options=convert_options
    )


def read_wf_bank_positional(paths):
    """The reference's 5-column headerless layout, typed at the boundary."""
    return read_positional_csv(
        paths,
        WF_BANK_POSITIONAL,
        {
            "date": pa.string(),
            "amount": pa.string(),  # tolerant cast downstream (cast_float_default_zero)
            "star": pa.string(),
            "check_number": pa.string(),
            "description": pa.string(),
        },
    )
