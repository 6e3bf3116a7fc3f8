"""Self-auditing rows-only outputs (VERDICT r4 #6): every sketch/recall
entry now carries its own ground-truth columns so a driver rows+schema
check is meaningful. These tests pin that the audit columns exist AND that
the audited invariants hold at sf0.001."""

from __future__ import annotations

import pandas as pd


def _df(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_ann_recall_audits(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.similarity import ann_topk_ivf, pq_ann_topk

    ivf = _df(ann_topk_ivf(sf_dir))
    assert "in_exact_topk" in ivf.columns
    assert ivf["in_exact_topk"].sum() >= 5  # recall@10 >= 0.5 at n_probe=3/8

    pq = _df(pq_ann_topk(sf_dir))
    assert pq["in_exact_topk"].sum() >= 7  # recall@10 >= 0.7 (existing pin)


def test_kmv_exact_audit(sf_dir, ray_session):
    """The bitmask combo audit must equal true set algebra — and at
    sf0.001/k=256 the KMV sample is exhaustive, so est == exact too."""
    import pyarrow.parquet as pq_mod

    from pdf_extractor_ray.pipelines.relational import kmv_user_overlap

    t = pq_mod.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    sets = {k: set(g["user_id"]) for k, g in t.groupby("event_type")}
    for r in kmv_user_overlap(sf_dir).itertuples(index=False):
        A, B = sets[r.type_a], sets[r.type_b]
        assert (r.exact_a, r.exact_b, r.exact_union, r.exact_inter) == (
            len(A), len(B), len(A | B), len(A & B)
        )
        assert (r.est_a, r.est_b, r.est_union, r.est_inter) == (
            r.exact_a, r.exact_b, r.exact_union, r.exact_inter
        )


def test_approx_distinct_audits(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.relational import (
        approx_distinct_tokens,
        approx_distinct_tokens_by_source,
    )

    g = _df(approx_distinct_tokens(sf_dir))
    assert {"approx_distinct", "exact_distinct", "rel_err"} <= set(g.columns)
    assert float(g["rel_err"].iloc[0]) <= 0.05  # ±~1.6% at p=12, generous band

    s = _df(approx_distinct_tokens_by_source(sf_dir))
    assert (s["rel_err"] <= 0.05).all()
    assert s["exact_distinct"].notna().all()


def test_quantile_bound_audit(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.relational import approx_quantile_hist

    h = _df(approx_quantile_hist(sf_dir))
    assert h["within_bound"].all()
    assert (h["exact_value"] > 0).all()


def test_window_recurrence_audits(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.relational import (
        capped_session_windows,
        throttle_events_cooldown,
    )

    t = _df(throttle_events_cooldown(sf_dir))
    assert ((t["gap_prev_kept_s"] == -1) | (t["gap_prev_kept_s"] >= 3600)).all()
    c = _df(capped_session_windows(sf_dir))
    assert (c["since_start_s"] <= 14400).all()
    assert (c["since_start_s"] >= 0).all()


def test_vector_family_audits(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.similarity import (
        cluster_balanced_sample,
        pca_project,
        semdedup,
    )

    s = _df(cluster_balanced_sample(sf_dir))
    assert (s["rank_in_cluster"] < 20).all()
    p = _df(pca_project(sf_dir))
    assert (p["norm_ratio"] <= 1.000001).all()  # Bessel
    d = _df(semdedup(sf_dir))
    assert ((d["max_cos_prev"] >= 0.95) == d["is_dup"]).all()


def test_pagerank_mass_and_minhash_err_audits(sf_dir, ray_session):
    from pdf_extractor_ray.pipelines.dedup import source_minhash_similarity
    from pdf_extractor_ray.pipelines.graph import pagerank

    r = _df(pagerank(sf_dir))
    assert abs(float(r["rank_sum_all"].iloc[0]) - 1.0) < 1e-4
    m = _df(source_minhash_similarity(sf_dir))
    # MinHash s.e. ≈ 1/sqrt(128) ≈ 0.088; 2-sigma band
    assert (m["abs_err"] <= 0.18).all()
    assert (m["exact_jaccard"] >= 0).all() and (m["exact_jaccard"] <= 1).all()


def test_embedding_near_dup_empty_keeps_schema(sf_dir, ray_session):
    """Zero verified pairs must still return the typed (vec_a, vec_b,
    cos_r) schema — groupby().aggregate() on empty input drops it
    otherwise and the driver's schema check degrades to vacuous."""
    from pdf_extractor_ray.pipelines.similarity import embedding_near_dup

    out = _df(embedding_near_dup(sf_dir))  # threshold=0.95 -> no pairs here
    assert list(out.columns) == ["vec_a", "vec_b", "cos_r"]
