"""Document quality scoring: length / punctuation / stopword ratios.

Training-data quality heuristics (Gopher/C4-style rule features), computed
vectorized over Arrow columns. Integer-valued features are kept as integers
so the DuckDB oracle can match them hash-exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .tokens import count_in_lists, split_ws

DEFAULT_STOPWORDS = ["the", "a", "and", "row", "data"]


def quality_features(batch: pa.Table, text_col: str = "text", stopwords: list[str] | None = None) -> pa.Table:
    """Add n_chars_q, n_tokens, n_stop, n_punct columns (all int64)."""
    stopwords = stopwords if stopwords is not None else DEFAULT_STOPWORDS
    text = batch.column(text_col)
    lists = split_ws(text)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    n_tokens = pc.cast(pc.list_value_length(lists), pa.int64())
    # stopword count via the SHARED segment-sum helper (tokens.count_in_lists)
    n_stop = count_in_lists(lists, stopwords)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, pattern=r"[^\w\s]"), pa.int64()
    )
    out = batch
    for name, arr in (
        ("n_chars_q", n_chars),
        ("n_tokens", n_tokens),
        ("n_stop", n_stop),
        ("n_punct", n_punct),
    ):
        out = out.append_column(name, arr)
    return out
