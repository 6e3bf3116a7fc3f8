"""Token-sort edit-distance kernel: known distances/ratios, DuckDB parity.

Reference semantics modeled: rapidfuzz token_sort_ratio >= 80 best-match
(organizer_extractor.py:603-658), re-skinned on Levenshtein so DuckDB's
levenshtein() is the oracle (see functions/fuzzy.py docstring).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pdf_extractor_ray.functions.fuzzy import (
    levenshtein,
    token_sort_key,
    token_sort_similarity,
)


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("kitten", "sitting", 3),
        ("", "abc", 3),
        ("abc", "", 3),
        ("abc", "abc", 0),
        ("flaw", "lawn", 2),
        ("intention", "execution", 5),
        ("a", "b", 1),
    ],
)
def test_levenshtein_known_distances(a, b, d):
    assert levenshtein(a, b) == d
    assert levenshtein(b, a) == d


def test_levenshtein_matches_duckdb_randomish():
    words = ["cold widget", "widget cold", "small bolt", "large rod x", "blue", ""]
    con = duckdb.connect()
    for a in words:
        for b in words:
            want = con.sql(f"SELECT levenshtein('{a}', '{b}') AS d").df().d[0]
            assert levenshtein(a, b) == want, (a, b)


def test_token_sort_invariance():
    assert token_sort_key("large bolt blue") == token_sort_key("blue large bolt")
    assert token_sort_similarity("cold widget", "widget cold") == 1.0
    # known ratio: sorted keys 'cold widget' vs 'cold widgets' -> lev 1, max len 12
    assert token_sort_similarity("cold widget", "widgets cold") == float(
        np.round(1 - 1 / 12, 6)
    )
