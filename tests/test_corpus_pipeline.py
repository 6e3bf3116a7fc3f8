"""Composed corpus pipeline (extract → quality → exact dedup → near-dup →
components → representatives): audit arithmetic + brute-force verification.

The near-dup stage is LSH (recall < 1 by design), so the checks are:
precision exactly 1.0 (the verify stage is exact Jaccard), recall ≥ 0.7
against the brute-force pair set, and the audit row's accounting identity
re-derived with an independent union-find.
"""

from __future__ import annotations

import pandas as pd

from pdf_extractor_ray.functions.sketches import jaccard, shingles
from pdf_extractor_ray.pipelines.textops import corpus_near_dup_pipeline

THRESHOLD = 0.6


def _survivors_and_pairs(sf_dir):
    """Independent (no-Ray) reimplementation of quality filter + exact dedup,
    then ALL ≥-threshold shingle-Jaccard pairs over the survivors."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.functions.quality import DEFAULT_STOPWORDS

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    stop = set(DEFAULT_STOPWORDS)
    kept: dict[str, int] = {}
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        if corpus.is_malformed_doc(d) or not t:
            continue
        toks = t.split(" ")
        n_stop = sum(1 for w in toks if w in stop)
        n_punct_ok = 10 <= len(toks) <= 200 and n_stop * 10 >= len(toks)
        if not n_punct_ok:
            continue
        if t not in kept or d < kept[t]:
            kept[t] = d
    id2text = {v: k for k, v in kept.items()}
    ids = sorted(id2text)
    sh = {i: set(shingles(id2text[i]).tolist()) for i in ids}
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if round(jaccard(sh[a], sh[b]), 6) >= THRESHOLD:
                pairs.add((a, b))
    return id2text, pairs


def _union_find_stats(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = len(parent)
    clusters = len({find(n) for n in parent})
    return members, clusters


def test_corpus_pipeline_cogrouped_survivor_path_matches(sf_dir, monkeypatch):
    """Forcing the distributed (no-broadcast) survivor semi-join must give
    the identical audit row — the 100 TB path stays correctness-tested."""
    from pdf_extractor_ray.pipelines import textops

    default = corpus_near_dup_pipeline(sf_dir)
    monkeypatch.setattr(textops, "SURVIVOR_BROADCAST_THRESHOLD", 0)
    forced = corpus_near_dup_pipeline(sf_dir)
    pd.testing.assert_frame_equal(default, forced)


def test_corpus_pipeline_distributed_audit_matches(sf_dir, monkeypatch):
    """Forcing the distributed audit finish (AUDIT_DRIVER_PAIRS=0: member
    count + bucket-distinct cluster count as scalars, label table never on
    the driver) must give the identical audit row."""
    from pdf_extractor_ray.pipelines import textops

    default = corpus_near_dup_pipeline(sf_dir)
    monkeypatch.setattr(textops, "AUDIT_DRIVER_PAIRS", 0)
    forced = corpus_near_dup_pipeline(sf_dir)
    pd.testing.assert_frame_equal(default, forced)


def test_corpus_pipeline_audit_and_brute_force(sf_dir):
    import ray.data as rd

    from pdf_extractor_ray.pipelines.dedup import minhash_near_dup_ds

    audit = corpus_near_dup_pipeline(sf_dir).iloc[0]
    id2text, want_pairs = _survivors_and_pairs(sf_dir)

    # stage counts pinned against the independent implementation (×2 crawl)
    assert audit.n_quality_kept == 2 * len(id2text)
    assert audit.n_exact_unique == len(id2text)

    # near-dup pairs over the same survivor set, via the Dataset entry point
    survivors = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(id2text.keys()), "text": list(id2text.values())}
        )
    ).repartition(4)
    got = minhash_near_dup_ds(survivors, threshold=THRESHOLD)
    got_df = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got_pairs = set(zip(got_df.doc_a.astype(int), got_df.doc_b.astype(int)))

    assert got_pairs <= want_pairs  # precision 1.0 (exact verify)
    if want_pairs:
        assert len(got_pairs) / len(want_pairs) >= 0.7  # LSH recall floor
    assert audit.n_near_dup_pairs == len(got_pairs)

    # audit accounting identity, re-derived with an independent union-find
    members, clusters = _union_find_stats(got_pairs)
    assert audit.n_clusters == clusters
    assert audit.n_final == audit.n_exact_unique - members + clusters
    assert audit.n_ok >= audit.n_quality_kept
    assert audit.n_pages >= audit.n_ok
