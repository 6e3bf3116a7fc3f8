"""word_chunk_arrays must be BYTE-identical to the scalar split/join loop
it replaces (VERDICT r4 wrong #2) — same differential-pin discipline as
test_batch_kernels_match_scalar for the sketch kernels."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_ray.pipelines.textops import PARA_WORDS, word_chunk_arrays


def scalar_chunks(texts: list[str], w: int) -> list[tuple[int, int, str]]:
    out = []
    for i, tx in enumerate(texts):
        words = tx.split(" ")
        for ci in range((len(words) + w - 1) // w or 1):
            out.append((i, ci, " ".join(words[ci * w : (ci + 1) * w])))
    return out


def _vector(texts: list[str], w: int) -> list[tuple[int, int, str]]:
    doc, ci, para = word_chunk_arrays(pa.array(texts, type=pa.string()), w)
    return list(zip(doc.tolist(), ci.tolist(), para.to_pylist()))


EDGE_TEXTS = [
    "",  # empty -> one empty chunk ("".split(" ") == [""])
    "one",
    "a b",
    " leading space",
    "trailing space ",
    "double  space   runs",
    " ".join(f"w{i}" for i in range(PARA_WORDS)),  # exactly one full chunk
    " ".join(f"w{i}" for i in range(PARA_WORDS + 1)),  # one word spills
    " ".join(f"w{i}" for i in range(3 * PARA_WORDS)),  # three exact chunks
    "unicode éè café 中文 words mixed in ☃ here",
    "   ",  # only spaces -> 4 empty words -> 1 chunk of "   "
]


def test_edge_cases_match_scalar():
    assert _vector(EDGE_TEXTS, PARA_WORDS) == scalar_chunks(EDGE_TEXTS, PARA_WORDS)


@pytest.mark.parametrize("w", [1, 2, 3, 5, 20])
def test_small_chunk_sizes(w):
    assert _vector(EDGE_TEXTS, w) == scalar_chunks(EDGE_TEXTS, w)


def test_empty_column():
    doc, ci, para = word_chunk_arrays(pa.array([], type=pa.string()), PARA_WORDS)
    assert len(doc) == 0 and len(ci) == 0 and len(para) == 0


def test_sliced_and_chunked_input():
    """_string_buffer_view handles offsets of sliced/chunked arrays; the
    kernel must stay exact on them (a map_batches block is often a slice)."""
    texts = EDGE_TEXTS * 3
    arr = pa.chunked_array([texts[:7], texts[7:]], type=pa.string())
    got = list(zip(*[x.tolist() if hasattr(x, "tolist") else x.to_pylist() for x in word_chunk_arrays(arr, 4)]))
    assert got == scalar_chunks(texts, 4)
    sl = pa.array(texts, type=pa.string()).slice(3, 11)
    got2 = list(zip(*[x.tolist() if hasattr(x, "tolist") else x.to_pylist() for x in word_chunk_arrays(sl, 4)]))
    assert got2 == scalar_chunks(texts[3:14], 4)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab é中")),
            max_size=40,
        ),
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_property_matches_scalar(texts, w):
    assert _vector(texts, w) == scalar_chunks(texts, w)
