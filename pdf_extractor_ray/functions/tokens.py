"""Tokenization kernels: whitespace split, explode, counts.

Backs the explode operator (amazon item explode → 1 doc → N records,
/root/reference/dataextractai/parsers/amazon_parser.py:305-338) and the
token-counting ops for training-data pipelines. Fully vectorized: Arrow
list arrays + np.repeat — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a BPE-ish fallback tokenizer: word runs, digit runs, or single punctuation
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def split_ws(col) -> pa.Array:
    """Split on single spaces (exact inverse of ' '.join, matching DuckDB's
    string_split(text, ' ') so the oracle agrees on empty tokens)."""
    return pc.split_pattern(col, pattern=" ")


def token_counts(col) -> pa.Array:
    return pc.list_value_length(split_ws(col))


def explode_tokens(batch: pa.Table, id_col: str, text_col: str, out_col: str = "token") -> pa.Table:
    """1 row → N token rows (flat_map semantics inside map_batches)."""
    lists = split_ws(batch.column(text_col))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    # null text → null list → null length: fill with 0 so the row emits no
    # tokens (SQL unnest-of-NULL semantics) instead of crashing the int cast;
    # flatten() drops the null slot, so ids stay aligned
    lengths = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, lengths)),
            out_col: lists.flatten(),
        }
    )


def count_in_lists(lists: pa.ListArray, vocab: list[str]) -> pa.Array:
    """Per-row count of list elements that fall in ``vocab``: flatten →
    membership mask → per-row segment sum via list offsets. SHARED by
    count_in_set and quality_features so the offsets-rebase subtlety lives
    in exactly one place."""
    hits = pc.cast(pc.is_in(lists.flatten(), value_set=pa.array(vocab)), pa.int64())
    hits_np = hits.to_numpy(zero_copy_only=False)
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    # flatten() re-bases a sliced ListArray at 0 while .offsets keeps the
    # original base — normalize so segment sums stay aligned
    offsets = offsets - offsets[0]
    cum = np.concatenate([[0], np.cumsum(hits_np)])
    return pa.array((cum[offsets[1:]] - cum[offsets[:-1]]).astype(np.int64))


def count_in_set(col, vocab: list[str]) -> pa.Array:
    """Per-row count of tokens that fall in ``vocab`` (stopword counting)."""
    lists = split_ws(col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return count_in_lists(lists, vocab)
