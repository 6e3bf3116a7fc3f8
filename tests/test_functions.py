"""Unit tests for the scalar kernel library (no Ray needed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_extractor_ray.functions.amounts import (
    amount_from_split,
    cast_float_default_zero,
    normalize_sign,
)
from pdf_extractor_ray.functions.dates import parse_date_cascade, splice_year, to_iso_date
from pdf_extractor_ray.functions.hashing import (
    fnv1a64,
    hash_bucket,
    rolling_fingerprint,
    row_sha256,
)
from pdf_extractor_ray.functions.langid import LangId
from pdf_extractor_ray.functions.sketches import (
    MinHasher,
    hamming64,
    jaccard,
    shingles,
    simhash64,
)
from pdf_extractor_ray.functions.text import clean_description, contains_any, standardize_name
from pdf_extractor_ray.functions.tokens import count_in_set, explode_tokens, token_counts


def test_sign_normalizer_conventions():
    amounts = pa.array([10.0, 20.0, 30.0])
    types = pa.array(["charge", "payment", "charge"])
    out = normalize_sign(amounts, types, {"charge"}).to_pylist()
    assert out == [-10.0, 20.0, -30.0]
    # is_charge_positive inversion (apple_card semantics)
    out = normalize_sign(amounts, types, {"charge"}, is_charge_positive=True).to_pylist()
    assert out == [10.0, -20.0, 30.0]


def test_amount_from_split_and_tolerant_cast():
    credits = pa.array([5.0, None, 0.0])
    charges = pa.array([None, 3.0, 1.5])
    assert amount_from_split(credits, charges).to_pylist() == [5.0, -3.0, -1.5]
    col = pa.array(["$1,234.50", "oops", "7"])
    assert cast_float_default_zero(col).to_pylist() == [1234.5, 0.0, 7.0]


def test_date_cascade_multi_format_and_failure():
    col = pa.array(["2024-03-05", "03/05/2024", "March 5, 2024", "05.03.2024", "not a date"])
    iso = to_iso_date(parse_date_cascade(col)).to_pylist()
    assert iso == ["2024-03-05"] * 4 + [None]


def test_year_splice_december_rollback():
    out = splice_year(
        pa.array([12, 11, 1]), pa.array([2025, 2025, 2025]), pa.array([1, 1, 1])
    ).to_pylist()
    assert out == [2024, 2025, 2025]


def test_hashing_stability_and_bucket_range():
    assert fnv1a64(b"abc") == fnv1a64(b"abc")
    assert fnv1a64(b"abc") != fnv1a64(b"abd")
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    h = row_sha256(t, ["a", "b"]).to_pylist()
    assert h[0] != h[1] and len(h[0]) == 64
    import hashlib

    assert h[0] == hashlib.sha256(b"1|x").hexdigest()
    buckets = hash_bucket(pa.array(range(1000)), 64).to_pylist()
    assert set(buckets) <= set(range(64))
    fp = rolling_fingerprint("a b c")
    assert fp == rolling_fingerprint("a b c")
    assert fp != rolling_fingerprint("c b a")  # order-sensitive


def test_text_kernels():
    col = pa.array(["keep dup this", "dup", "x  y"])
    assert clean_description(col).to_pylist() == ["keep this", "", "x y"]
    assert contains_any(pa.array(["abc", "xyz"]), ["b", "q"]).to_pylist() == [True, False]
    assert standardize_name("Total Amount ($)") == "total_amount_"


def test_token_kernels():
    col = pa.array(["a b c", "a", ""])
    assert token_counts(col).to_pylist() == [3, 1, 1]  # "" splits to [""]
    t = pa.table({"id": [1, 2], "text": ["x y", "z"]})
    e = explode_tokens(t, "id", "text")
    assert e.column("id").to_pylist() == [1, 1, 2]
    assert e.column("token").to_pylist() == ["x", "y", "z"]
    assert count_in_set(pa.array(["the cat the", "dog"]), ["the"]).to_pylist() == [2, 0]


def test_minhash_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely here now today friends"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = float(np.mean(sa == sb))
    sim_ac = float(np.mean(sa == sc))
    true_ab = jaccard(set(shingles(a).tolist()), set(shingles(b).tolist()))
    assert sim_ab > 0.5 and sim_ac < 0.2
    assert abs(sim_ab - true_ab) < 0.2  # estimator tracks the true Jaccard
    # determinism across instances (workers)
    assert np.array_equal(MinHasher(num_perm=128).signature(a), sa)


def test_simhash_near_texts_have_small_hamming():
    a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    b = a.replace("zeta", "zetaa")
    c = "unrelated totally different content goes right here instead"
    assert hamming64(simhash64(a), simhash64(b)) < 12
    assert hamming64(simhash64(a), simhash64(c)) > 16
    assert simhash64(a) == simhash64(a)


def test_langid_on_natural_text():
    lid = LangId()
    assert lid.predict("the quick brown fox and the lazy dog went to the market of things") == "en"
    assert lid.predict("der schnelle braune fuchs und die faulen hunde gingen in den wald") == "de"
    assert lid.predict("le renard brun rapide et le chien paresseux vont au marché de la ville") == "fr"
    assert lid.predict("今天天气很好我们一起去公园散步吧这是一个测试文本") == "zh"
    assert lid.predict("") == "und"


def test_nfkd_ascii_fold():
    from pdf_extractor_ray.functions.text import normalize_nfkd_ascii

    assert normalize_nfkd_ascii("Café – naïve ﬁn") == "Cafe  naive fin"
    assert normalize_nfkd_ascii("plain ascii") == "plain ascii"


def test_bloom_filter_no_false_negatives_low_fp():
    from pdf_extractor_ray.functions.bloom import BloomFilter

    keys = list(range(0, 2000, 2))
    bf = BloomFilter(capacity=len(keys), fp_rate=0.01)
    bf.add_many(keys)
    assert all(k in bf for k in keys)  # no false negatives, ever
    others = np.arange(1, 4001, 2)
    fp = bf.contains_many(others).mean()
    assert fp < 0.03  # ~1% target with slack


def test_hll_accuracy_and_mergeability():
    from pdf_extractor_ray.functions.sketches import HyperLogLog

    h = HyperLogLog()
    for i in range(50_000):
        h.add(f"tok{i}")
    assert abs(h.estimate() - 50_000) / 50_000 < 0.03
    # merge of disjoint halves == union estimate, order-independent
    a, b = HyperLogLog(), HyperLogLog()
    for i in range(10_000):
        a.add(f"x{i}")
    for i in range(5_000, 15_000):
        b.add(f"x{i}")
    m1 = HyperLogLog.from_bytes(a.to_bytes()).merge(b).estimate()
    m2 = HyperLogLog.from_bytes(b.to_bytes()).merge(a).estimate()
    assert m1 == m2
    assert abs(m1 - 15_000) / 15_000 < 0.05


def test_hll_add_batch_bit_identical_to_scalar():
    """The vectorized add_batch (frexp-rank) must leave the registers
    BIT-identical to per-value add — empties, unicode, duplicates, and
    enough keys to exercise every rank branch."""
    import numpy as np

    from pdf_extractor_ray.functions.sketches import HyperLogLog

    toks = ["", "a", "héllo", "tok" * 40] + [f"t{i}" for i in range(20_000)] + ["a", ""]
    scalar, batch = HyperLogLog(), HyperLogLog()
    for t in toks:
        scalar.add(t)
    batch.add_batch(toks)
    assert np.array_equal(scalar.registers, batch.registers)
    # p < 11 falls back to the scalar loop — still identical
    s9, b9 = HyperLogLog(9), HyperLogLog(9)
    for t in toks[:1000]:
        s9.add(t)
    b9.add_batch(toks[:1000])
    assert np.array_equal(s9.registers, b9.registers)


def test_pii_scrub_and_count():
    from pdf_extractor_ray.functions.text import count_pii, scrub_pii

    col = pa.array(
        [
            "contact me at jane.doe@example.com or 555-123-4567 ok",
            "card 4111111111111111 was used",
            "no pii here at all",
        ]
    )
    assert count_pii(col).to_pylist() == [2, 1, 0]
    cleaned = scrub_pii(col).to_pylist()
    assert cleaned[0] == "contact me at [REDACTED] or [REDACTED] ok"
    assert cleaned[1] == "card [REDACTED] was used"
    assert cleaned[2] == "no pii here at all"


def test_null_safety_kernels():
    """Review r2: nulls/NaN in inputs become null/empty OUTPUTS, never
    crashed tasks — row_sha256, explode_tokens, LangId, validity reasons."""
    import numpy as np

    from pdf_extractor_ray.functions.langid import LangId
    from pdf_extractor_ray.functions.tokens import explode_tokens
    from pdf_extractor_ray.pipelines.normalize import _validity_reason

    # row_sha256: null column value -> null hash (SQL sha256(NULL))
    t = pa.table({"a": [1, None], "b": ["x", "y"]})
    h = row_sha256(t, ["a", "b"]).to_pylist()
    assert len(h[0]) == 64 and h[1] is None

    # explode_tokens: null text -> zero rows for that id, others aligned
    t2 = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": ["a b", None, "c"]})
    out = explode_tokens(t2, "doc_id", "text").to_pylist()
    assert [(r["doc_id"], r["token"]) for r in out] == [(1, "a"), (1, "b"), (3, "c")]

    # LangId: NaN / None / non-str -> "und", no crash
    li = LangId()
    assert li.predict(np.nan) == "und"
    assert li.predict(None) == "und"

    # validity: null amount is zero_amount, not silently valid (or_ is
    # non-Kleene; or_(True, null) would be null without the fill)
    v = pa.table(
        {
            "transaction_date": ["2024-01-01"],
            "description": ["ok desc"],
            "amount": pa.array([None], pa.float64()),
            "source": ["x"],
        }
    )
    assert _validity_reason(v).to_pylist() == ["zero_amount"]


def test_approx_quantile_hist_bounded_error(ray_session):
    """The histogram quantile's reported max_abs_error must actually bound
    the distance to the exact quantile_disc value (inverted_cdf)."""
    import numpy as np
    import pandas as pd

    from pdf_extractor_ray.pipelines.relational import approx_quantile_hist

    sf = "/root/testdata/sf0.001"
    res = approx_quantile_hist(sf)
    v = pd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_extendedprice"]
    ).l_extendedprice.to_numpy()
    assert list(res.q) == [0.5, 0.9, 0.99]
    for _, row in res.iterrows():
        exact = np.quantile(v, row.q, method="inverted_cdf")
        assert abs(row.approx_value - exact) <= row.max_abs_error + 1e-9
    # deterministic: same result twice (counts merge commutatively)
    res2 = approx_quantile_hist(sf)
    assert np.array_equal(res.approx_value.to_numpy(), res2.approx_value.to_numpy())


def test_unigram_logprob_score_semantics(ray_session):
    """In-vocabulary-heavy docs must score higher than OOV-heavy docs, and
    every score sits in [ln(phi), 0) — the oracle-parity suite pins the
    exact values; this pins the model's meaning."""
    import numpy as np

    from pdf_extractor_ray.pipelines.textops import unigram_logprob_score

    sf = "/root/testdata/sf0.001"
    df = unigram_logprob_score(sf).to_pandas()
    assert len(df) == 500
    assert (df.lm_score < 0).all() and (df.lm_score >= np.log(0.001) - 1e-9).all()
    assert df.lm_score.nunique() > 10  # a real signal, not a constant


def test_hex_prefix_int64_matches_scalar_parse():
    """Buffer-view hex parse == int(s[:8], 16), including on a SLICED column
    (non-zero col.offset) and a large_string column (int64 offsets)."""
    import numpy as np
    import pyarrow as pa

    from pdf_extractor_ray.functions.hashing import hex_prefix_int64, sha256_hex

    shas = [sha256_hex(f"doc {i}") for i in range(257)] + ["0000000012ab", "ffffffffff"]
    want = np.array([int(s[:8], 16) for s in shas], dtype=np.int64)
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(shas, type=typ)
        assert (hex_prefix_int64(col) == want).all()
        assert (hex_prefix_int64(col.slice(3, 100)) == want[3:103]).all()
    chunked = pa.chunked_array([shas[:100], shas[100:]], type=pa.string())
    assert (hex_prefix_int64(chunked) == want).all()
    assert hex_prefix_int64(pa.array([], type=pa.string())).shape == (0,)


def test_fnv1a64_arrow_matches_scalar():
    """Arrow-buffer FNV == the scalar fnv1a64 per element (the bit-identity
    contract every sketch kernel in this repo carries), on sliced and
    large_string columns, ragged lengths, and empty strings."""
    import numpy as np
    import pyarrow as pa

    from pdf_extractor_ray.functions.hashing import fnv1a64, fnv1a64_arrow

    urls = [
        f"https://host{i % 7}.example/path/{'x' * (i % 23)}?q={i}" for i in range(211)
    ] + ["", "a", "éléphant-unicode"]
    want = np.array([fnv1a64(u.encode("utf-8")) for u in urls], dtype=np.uint64)
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(urls, type=typ)
        assert (fnv1a64_arrow(col) == want).all()
        assert (fnv1a64_arrow(col.slice(5, 50)) == want[5:55]).all()
    assert fnv1a64_arrow(pa.array([], type=pa.string())).shape == (0,)
