"""Training-data export family (pipelines/training.py) — semantic pins
beyond the hash-exact oracle parity (which covers all three automatically
via test_oracle_parity):

- shard packing invariants (contiguity, budget bound, never-split docs)
- split stability under corpus growth (the reason hash-splits exist)
- per-key sample size bound + determinism across runs
"""

import numpy as np
import pandas as pd

from pdf_extractor_ray.pipelines import training as tr

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_token_budget_shards_invariants(ray_session):
    budget = 5_000
    df = _df(tr.token_budget_shards(SF, budget=budget)).sort_values("doc_id")

    # prefix sum is the exact cumulative of n_tokens in doc_id order
    assert np.array_equal(df.cum_tokens.to_numpy(), np.cumsum(df.n_tokens.to_numpy()))
    # shard ids are a non-decreasing contiguous range starting at 0
    sid = df.shard_id.to_numpy()
    assert sid[0] == 0 and np.all(np.diff(sid) >= 0)
    assert set(np.unique(sid)) == set(range(int(sid.max()) + 1))
    # a doc is assigned to the shard its FIRST token falls in
    assert np.array_equal(sid, (df.cum_tokens.to_numpy() - df.n_tokens.to_numpy()) // budget)
    # every shard's token load is < budget + the largest doc that overflowed
    # into it (docs are never split, so the only overshoot is one doc's tail)
    per_shard = df.groupby("shard_id").n_tokens.sum()
    assert (per_shard.iloc[:-1] < budget + df.n_tokens.max()).all()


def test_split_assign_stable_under_growth(ray_session, tmp_path):
    """A doc's split must not change when the corpus grows — the property
    that makes hash-splits usable for incremental training corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = _df(tr.split_assign(SF)).set_index("doc_id")["split"]
    # rough 80/10/10 at 500 docs (Knuth %100 is not perfectly uniform on
    # tiny sequential ids — allow a wide but meaningful band)
    frac = full.value_counts(normalize=True)
    assert 0.70 < frac.get("train", 0) < 0.90
    assert 0.03 < frac.get("val", 0) < 0.20
    assert 0.03 < frac.get("test", 0) < 0.20

    # half corpus → identical assignment for the shared ids
    src = pd.read_parquet(f"{SF}/documents.parquet")
    pq.write_table(
        pa.Table.from_pandas(src.iloc[: len(src) // 2], preserve_index=False),
        tmp_path / "documents.parquet",
    )
    half = _df(tr.split_assign(str(tmp_path))).set_index("doc_id")["split"]
    assert (full.loc[half.index] == half).all()


def test_sample_per_customer_bounded_and_deterministic(ray_session):
    a = _df(tr.sample_orders_per_customer(SF, k=3))
    assert a.groupby("o_custkey").size().max() <= 3
    # customers with <3 orders keep everything
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    have = orders.o_custkey.value_counts()
    got = a.o_custkey.value_counts()
    small = have[have < 3]
    assert (got.reindex(small.index).fillna(0) == small).all()
    # two runs pick identical rows (hash order, no RNG anywhere)
    b = _df(tr.sample_orders_per_customer(SF, k=3))
    key = ["o_custkey", "o_orderkey"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_split_contamination_detects_planted_dups(ray_session, tmp_path):
    """sf0.001 has no exact dups (the oracle-parity pair pins the zero
    case); here we PLANT cross-split duplicates and check they are counted
    — and that train-train dups are NOT."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # find ids per split under the same hash arithmetic
    ids = np.arange(3000, dtype=np.int64)
    pct = tr.knuth_hash(ids) % 100
    train_ids = ids[pct < 80]
    val_ids = ids[(pct >= 80) & (pct < 90)]
    test_ids = ids[pct >= 90]

    rows = [{"doc_id": int(i), "text": f"unique text {i}"} for i in ids]
    by_id = {r["doc_id"]: r for r in rows}
    # 3 val docs and 2 test docs copy a train doc's text; 2 train docs
    # duplicate each other (must not count)
    for v, t in zip(val_ids[:3], train_ids[:3]):
        by_id[int(v)]["text"] = by_id[int(t)]["text"]
    for x, t in zip(test_ids[:2], train_ids[3:5]):
        by_id[int(x)]["text"] = by_id[int(t)]["text"]
    by_id[int(train_ids[6])]["text"] = by_id[int(train_ids[7])]["text"]
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    out = _df(tr.split_contamination(str(tmp_path))).set_index("split")
    assert int(out.loc["val", "n_contaminated"]) == 3
    assert int(out.loc["test", "n_contaminated"]) == 2
    assert int(out.loc["val", "n_docs"]) == len(val_ids)
    assert int(out.loc["test", "n_docs"]) == len(test_ids)


def test_dsir_weights_formula_exact(ray_session, tmp_path):
    """Pin the full DSIR scoring path against an independent per-doc Python
    reimplementation (Counter over hashed uni+bigrams, add-1 smoothed
    log-ratio) on a controlled corpus — exercises segment sums, the
    tgt/raw count split, and the bigram index arithmetic."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.functions.hashing import fnv1a64

    texts = [
        ("the quick brown fox", "en"),
        ("the quick red fox jumps", "en"),
        ("le renard brun rapide", "fr"),
        ("der schnelle braune fuchs", "de"),
        ("the fox", "en"),
        ("", "fr"),  # splits to one empty token (string_split semantics)
        ("single", "de"),  # 1 token → no bigrams
    ]
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"doc_id": i, "text": t, "lang": lang}
                for i, (t, lang) in enumerate(texts)
            ]
        ),
        tmp_path / "documents.parquet",
    )
    n_feat = 64

    def feats(text):
        toks = text.split(" ")  # split_ws == DuckDB string_split: "" → [""]
        grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
        return [fnv1a64(g.encode()) % n_feat for g in grams]

    tgt = collections.Counter()
    raw = collections.Counter()
    for t, lang in texts:
        (tgt if lang == "en" else raw).update(feats(t))
    lr = {
        b: np.log((tgt[b] + 1) / (sum(tgt.values()) + n_feat))
        - np.log((raw[b] + 1) / (sum(raw.values()) + n_feat))
        for b in range(n_feat)
    }
    expect = [np.round(sum(lr[b] for b in feats(t)), 6) for t, _ in texts]

    got = (
        _df(tr.dsir_weights(str(tmp_path), n_feat=n_feat))
        .sort_values("doc_id")
        .log_weight.to_numpy()
    )
    assert np.allclose(got, expect, atol=1e-9)


def test_dsir_weights_ranks_target_lang(ray_session):
    """On the real sf corpus, target-language docs must score strictly
    higher in aggregate than every other language, and two runs must be
    bit-identical (integer count partials — merge order can't matter)."""
    a = _df(tr.dsir_weights(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _df(tr.dsir_weights(SF)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    by_lang = a.merge(docs, on="doc_id").groupby("lang").log_weight.mean()
    assert (by_lang.drop("en") < by_lang["en"]).all()


def test_pack_sequences_invariants(ray_session):
    L = 256
    df = _df(tr.pack_sequences(SF, seq_len=L))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_tok = docs.text.str.count(" ").to_numpy() + 1
    # every doc fully covered: fragment lengths sum to its token count,
    # fragments are contiguous from offset 0 in (seq_id) order
    per_doc = df.sort_values(["doc_id", "seq_id"])
    for did, g in per_doc.groupby("doc_id"):
        assert g.frag_len.sum() == n_tok[did]
        assert g.frag_start.iloc[0] == 0
        assert np.array_equal(
            g.frag_start.to_numpy()[1:],
            (g.frag_start + g.frag_len).to_numpy()[:-1],
        )
        assert np.array_equal(g.seq_id.to_numpy(), np.arange(g.seq_id.iloc[0], g.seq_id.iloc[0] + len(g)))
    # every sequence except the last is exactly full
    per_seq = df.groupby("seq_id").frag_len.sum()
    assert (per_seq.iloc[:-1] == L).all() and per_seq.iloc[-1] <= L
    # total conservation
    assert df.frag_len.sum() == n_tok.sum()


def test_repetition_signals_constructed(ray_session, tmp_path):
    """Pin the long-n path (n_dup=5, degenerate repeats) and the overlap
    semantics the sf corpus can't exercise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.textops import repetition_signals

    texts = [
        "a b c d e f g h",                    # no repeats at all
        "x y x y x y x y",                    # "x y" occurs 4x (overlapping alternation)
        "p q r s t p q r s t p q r s t",      # 5-gram "p q r s t" occurs 3x
        "w w w w w w",                        # degenerate: same token; frac may exceed 1
    ]
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
        tmp_path / "documents.parquet",
    )
    df = (
        _df(repetition_signals(str(tmp_path), n_top=2, n_dup=5))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def half6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    # doc 0: all 2-grams unique -> top = 1*len("a b")/len = 3/15; dup5 = 0
    assert df.top_gram_frac[0] == half6(3 / 15) and df.dup_gram_frac[0] == 0
    # doc 1: "x y" occurs 4x -> 4*3/15; "y x" 3x -> 9/15 is smaller; no dup 5-gram
    # occurs >1? "x y x y x" occurs 2x (positions 0,2) -> dup = 2*9/15
    assert df.top_gram_frac[1] == half6(12 / 15)
    assert df.dup_gram_frac[1] == half6((2 * 9 + 2 * 9) / 15)  # both alternating 5-grams repeat
    # doc 2: top 2-gram "p q" (or others) 3x*3 chars = 9/29 ... text len = 29
    nch2 = len(texts[2])
    assert df.top_gram_frac[2] == half6(9 / nch2)
    # 5-grams occurring >1: windows repeat with period 5; spans "p q r s t"(3x),
    # and the 10 other rotations each occur 2x
    # enumerate exactly via python for the expected value
    toks = texts[2].split(" ")
    from collections import Counter

    c5 = Counter(" ".join(toks[i : i + 5]) for i in range(len(toks) - 4))
    dup = sum(cnt * len(g) for g, cnt in c5.items() if cnt > 1)
    assert df.dup_gram_frac[2] == half6(dup / nch2)
    # doc 3: "w w" occurs 5x * 3 chars = 15/11 > 1 (documented overshoot)
    assert df.top_gram_frac[3] == half6(15 / 11) > 1


def test_bpe_known_answer():
    """Hand-computed BPE merges (Sennrich example vocabulary): frequency-
    weighted pair counts with lexicographic-ascending tie-breaks."""
    vocab = pd.DataFrame(
        {"word": ["low", "lower", "newest", "widest"], "n": [5, 2, 6, 3]}
    )
    m = tr.bpe_merges_from_vocab(vocab, n_merges=5)
    assert list(zip(m["left"], m["right"])) == [
        ("e", "s"),   # 9, tie with (s,t) → lexicographic min
        ("es", "t"),  # 9
        ("l", "o"),   # 7, tie with (o,w) → lexicographic min
        ("lo", "w"),  # 7
        ("e", "w"),   # 6, tie with (n,e)? no — ('e','w') < ('n','e') < ('w','est')
    ]
    assert list(m["pair_count"]) == [9, 9, 7, 7, 6]
    assert list(m["rank"]) == [0, 1, 2, 3, 4]


def test_bpe_train_merges_deterministic(ray_session):
    a = _df(tr.bpe_train_merges(SF, n_merges=8, top_v=500))
    b = _df(tr.bpe_train_merges(SF, n_merges=8, top_v=500))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 8


def test_source_mixture_sublinear(ray_session):
    """Bigger sources keep a smaller FRACTION (the temperature semantics)."""
    kept = _df(tr.source_mixture_sample(SF)).groupby("source").size()
    import duckdb

    tot = (
        duckdb.sql(
            f"SELECT source, COUNT(*) n FROM read_parquet('{SF}/documents.parquet') GROUP BY source"
        )
        .df()
        .set_index("source")["n"]
    )
    frac = (kept / tot).dropna()
    # fraction must decrease (weakly) as source size increases
    ordered = frac[tot.sort_values().index.intersection(frac.index)]
    assert (np.diff(ordered.to_numpy()) <= 1e-12).all() or len(ordered) < 2


def test_stratified_sample_exact_k_per_tile(ray_session):
    got = _df(tr.stratified_sample_by_decile(SF))
    per = got.groupby("tile").size()
    assert sorted(per.index) == list(range(1, 11))
    assert (per == 20).all()
    assert got["doc_id"].is_unique


def test_logreg_recovers_planted_rule(ray_session):
    """Distributed full-batch GD separates the planted linear rule well
    above the base rate, and the label balance makes that non-trivial."""
    df = _df(tr.logreg_quality_train(SF))
    pos = df["label"].mean()
    assert 0.35 < pos < 0.65  # balanced — majority-class guessing can't pass
    acc = (df["label"] == df["pred"]).mean()
    assert acc >= 0.95


def test_logreg_deterministic(ray_session):
    a = _df(tr.logreg_quality_train(SF, iters=10)).sort_values("doc_id").reset_index(drop=True)
    b = _df(tr.logreg_quality_train(SF, iters=10)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_classifier_auc_matches_local_rank_computation(ray_session):
    """The distributed AUC must BIT-equal a single-process Mann-Whitney
    computation over the same scored output (rank sums are half-integers
    < 2^53, so there is no float-order slack to hide behind)."""
    got = _df(tr.classifier_auc(SF))
    scored = _df(tr.logreg_quality_train(SF)).sort_values(["prob", "doc_id"]).reset_index(drop=True)
    r = np.arange(1, len(scored) + 1, dtype=np.float64)
    r = pd.Series(r).groupby(scored["prob"].to_numpy(), sort=False).transform("mean").to_numpy()
    y = scored["label"].to_numpy()
    P, N = int((y == 1).sum()), int((y == 0).sum())
    auc = (r[y == 1].sum() - P * (P + 1) / 2.0) / (P * N)
    assert float(got["auc"][0]) == float(np.round(auc, 6))
    assert int(got["n_pos"][0]) == P and int(got["n_neg"][0]) == N
    assert got["auc"][0] > 0.9  # the planted rule is genuinely separable


def test_padding_waste_closed_form(ray_session, tmp_path):
    """4 docs, 2 tiles: waste per tile = n·max − Σlen, hand-checked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.training import padding_waste_by_length_tile

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "n_chars": pa.array([10, 20, 30, 100], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = padding_waste_by_length_tile(str(tmp_path), tiles=2)
    got = got.sort_values("tile").reset_index(drop=True)
    # tile 1 = lens {10, 20}: waste = 2*20-30 = 10; tile 2 = {30, 100}: 2*100-130 = 70
    assert got["padding_waste"].tolist() == [10, 70]
    assert got["max_len"].tolist() == [20, 100]


def test_span_corruption_matches_scalar_reimpl(ray_session, tmp_path):
    """Vectorized run detection == per-doc scalar loop (boundary reset:
    a masked doc-final token never continues into the next doc's run)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.training import span_corruption_stats

    texts = ["a b c d e f g h", "x y z", "one", "w " * 49 + "w"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        span_corruption_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for row, text in zip(got.itertuples(index=False), texts):
        nt = len(text.split(" "))
        m = [
            ((row.doc_id * 131071 + k) % 2**31) * 2654435761 % 2**31 % 100 < 15
            for k in range(nt)
        ]
        n_spans = sum(1 for k in range(nt) if m[k] and (k == 0 or not m[k - 1]))
        assert row.n_tokens == nt
        assert row.n_masked == sum(m)
        assert row.n_spans == n_spans


def test_ngram_contamination_planted(ray_session, tmp_path):
    """A train doc quoting a 5-token test passage is flagged with the right
    hit count; train docs sharing <5-token overlap are not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.training import (
        knuth_hash,
        ngram_contamination_filter,
    )
    import numpy as np

    # find ids: one test-split id (pct>=90) and two train ids (pct<80)
    ids = np.arange(1, 500, dtype=np.int64)
    pct = knuth_hash(ids) % 100
    test_id = int(ids[pct >= 90][0])
    tr_a, tr_b = (int(x) for x in ids[pct < 80][:2])

    passage = "alpha beta gamma delta epsilon"
    docs = pa.table(
        {
            "doc_id": pa.array([test_id, tr_a, tr_b], pa.int64()),
            "text": pa.array(
                [
                    f"lead {passage} tail",
                    f"quote {passage} end",  # 5-gram hit (exactly one window)
                    "alpha beta gamma x y",  # only 3-token overlap — clean
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = ngram_contamination_filter(str(tmp_path)).to_pandas()
    assert got["doc_id"].tolist() == [tr_a]
    assert got["n_hits"].tolist() == [1]


def test_weighted_quantile_tokens_not_docs(ray_session, tmp_path):
    """One 100-token doc vs ninety-nine 1-token docs: the per-DOC median
    length is the short doc's, but the token-WEIGHTED median is the long
    doc's length (100 of 199 token mass ≥ half)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.training import weighted_quantile_doc_len

    long_doc = "w " * 99 + "w"  # 100 tokens, 199 chars
    docs = [long_doc] + ["x"] * 99
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(docs))), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = weighted_quantile_doc_len(str(tmp_path)).set_index("q")["weighted_len"]
    assert got["p50"] == 199
    assert got["p90"] == 199


def test_temperature_mixture_sqrt_upweights_small_sources(ray_session, tmp_path):
    """Temperature-2 mixing: a source with 4x the chars gets only ~2x the
    allocation (sqrt weights), the total is EXACTLY the budget, and seats
    from the largest-remainder step keep every allocation within 1 of its
    exact quota."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.training import temperature_mixture_allocation

    pq.write_table(
        pa.table(
            {
                "source": pa.array(["big"] * 4 + ["small"]),
                "n_chars": pa.array([1000, 1000, 1000, 1000, 1000], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = temperature_mixture_allocation(str(tmp_path), budget=999).set_index("source")
    assert out["alloc"].sum() == 999
    # sizes 4000 vs 1000 -> sqrt weights 2:1 -> allocs ~666:333
    assert abs(out.loc["big", "alloc"] - 2 * out.loc["small", "alloc"]) <= 2
