"""Edit-distance fuzzy-match kernels (pure Python/numpy, deterministic).

Reference semantics: rapidfuzz ``token_sort_ratio`` with threshold 80 and
best-match selection (/root/reference/dataextractai/parsers_core/
organizer_extractor.py:603-658). Re-skinned on Levenshtein (unit
ins/del/sub costs) instead of rapidfuzz's InDel ratio so the similarity is
*oracle-exact* against DuckDB's ``levenshtein()``:

    token_sort_similarity(a, b)
      = round(1 - lev(sort_tokens(a), sort_tokens(b)) / max(|a'|, |b'|, 1), 6)

Sorting the whitespace tokens first gives the word-order invariance that
``token_sort_ratio`` is used for.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def token_sort_key(s: str) -> str:
    """Whitespace-tokenize, sort lexicographically, re-join — matches
    DuckDB ``array_to_string(list_sort(string_split(s, ' ')), ' ')`` on
    ASCII input (both sort by code point)."""
    return " ".join(sorted(s.split(" ")))


@lru_cache(maxsize=65536)
def levenshtein(a: str, b: str) -> int:
    """Classic unit-cost edit distance, row-vectorized: the horizontal
    (insertion) dependency is resolved with the running-minimum identity
    cur[j] = min(cur[j], min_k (cur[k] - k) + j + ... ) instead of a Python
    inner loop. Cached per worker — fuzzy joins see heavily repeated keys."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    b_codes = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(a, 1):
        cost = (b_codes != ord(ca)).astype(np.int64)
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        # deletion (from prev row) and substitution — no horizontal dep
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        # insertion: cur[j] = min(cur[j], min_{k<=j}(cur[k] - k) + j)
        runmin = np.minimum.accumulate(cur - idx)
        cur = np.minimum(cur, runmin + idx)
        prev = cur
    return int(prev[lb])


def token_sort_similarity(a: str, b: str) -> float:
    """Normalized token-sort edit similarity in [0, 1], rounded to 6dp
    (np.round — lands on DuckDB's ROUND-to-DECIMAL double, see NOTES.md)."""
    sa, sb = token_sort_key(a), token_sort_key(b)
    return float(np.round(1.0 - levenshtein(sa, sb) / max(len(sa), len(sb), 1), 6))
