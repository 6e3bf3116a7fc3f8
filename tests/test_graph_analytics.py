"""Graph-analytics + basket-mining + incremental-index ops: semantics pinned
on constructed inputs where the expected answer is hand-checkable (the
oracle-parity suite pins them against DuckDB on the real tables at both
scales; these tests pin the kernels' edge cases)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_ray.pipelines.graph import degree_distribution, triangle_count
from pdf_extractor_ray.pipelines.incremental import incremental_ingest_dedup
from pdf_extractor_ray.pipelines.relational import copurchase_pairs


def _write_lineitem(tmp_path, baskets: dict[int, list[int]]):
    ok, pk = [], []
    for o, parts in baskets.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    return str(tmp_path)


def test_triangle_count_k4(ray_session, tmp_path):
    """Baskets {1,2,3}, {2,3,4}, {1,4} yield the complete graph K4
    (edge 2-3 arrives twice — the distinct pass must collapse it):
    C(4,3) = 4 triangles."""
    sf = _write_lineitem(tmp_path, {1: [1, 2, 3], 2: [2, 3, 4], 3: [1, 4]})
    got = triangle_count(sf)
    assert got.iloc[0].to_dict() == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}


def test_triangle_count_no_triangles(ray_session, tmp_path):
    """A path graph (1-2, 2-3) and a single-item basket: zero triangles,
    and the singleton contributes no node."""
    sf = _write_lineitem(tmp_path, {1: [1, 2], 2: [2, 3], 3: [9]})
    got = triangle_count(sf)
    assert got.iloc[0].to_dict() == {"n_nodes": 3, "n_edges": 2, "n_triangles": 0}


def test_degree_distribution_k4(ray_session, tmp_path):
    sf = _write_lineitem(tmp_path, {1: [1, 2, 3], 2: [2, 3, 4], 3: [1, 4]})
    got = degree_distribution(sf).to_pandas()
    assert got.to_dict("records") == [{"degree": 3, "n_nodes": 4}]


def test_copurchase_pairs_counts_orders_not_rows(ray_session, tmp_path):
    """(2,3) co-occurs in two orders → count 2; a duplicated (order, part)
    row must NOT inflate any count; a single-item order contributes no
    pair. Tie-break below the top pair is (part_a, part_b) ascending."""
    sf = _write_lineitem(
        tmp_path,
        {1: [1, 2, 3, 3], 2: [2, 3, 4], 3: [1, 4], 4: [7]},
    )
    got = copurchase_pairs(sf, k=10).to_pandas()
    assert got.iloc[0].to_dict() == {"part_a": 2, "part_b": 3, "n_orders": 2}
    assert (got["n_orders"].iloc[1:] == 1).all()
    rest = list(zip(got["part_a"].iloc[1:], got["part_b"].iloc[1:]))
    assert rest == sorted(rest)
    assert len(got) == 6  # K4 edges; the singleton order added none


def test_incremental_ingest_dedup_min_winner(ray_session, tmp_path):
    """Day-2 (doc_id % 3 == 0) rows dedup against day-1 content AND within
    day 2 by min doc_id — the index's min-merge must be arrival-order
    independent, so the winner set is exactly {min doc_id per new text}."""
    docs = {
        1: "seen-yesterday",  # day 1
        3: "seen-yesterday",  # day 2, suppressed by day-1 content
        6: "fresh-b",  # day 2 winner
        9: "fresh-b",  # day 2 dup of 6
        12: "fresh-c",  # day 2 winner
        5: "day1-only",  # day 1
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
                "source": pa.array(["s"] * len(docs), pa.string()),
                "n_chars": pa.array([len(v) for v in docs.values()], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = incremental_ingest_dedup(str(tmp_path)).to_pandas()
    assert sorted(got["doc_id"]) == [6, 12]


def test_resample_ffill_constructed(ray_session, tmp_path):
    """User 1: events in hours 10 and 13 (two events in hour 10 — the MAX
    event_id's value must win) → grid 10..13 with hours 11-12 forward-filled.
    User 2: single event → single grid row."""
    H = 3_600_000_000  # us per hour
    ts = pa.array([10 * H + 5, 10 * H + 9, 13 * H + 1, 20 * H], pa.int64()).cast(
        pa.timestamp("us")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([7, 3, 9, 1], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": ts,
                "value": pa.array([111.0, 222.0, 333.0, 5.5], pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from pdf_extractor_ray.pipelines.relational import resample_ffill_hourly

    got = (
        resample_ffill_hourly(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "hour_id"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"user_id": 1, "hour_id": 10, "value_ff": 111.0},  # event_id 7 > 3
        {"user_id": 1, "hour_id": 11, "value_ff": 111.0},  # filled
        {"user_id": 1, "hour_id": 12, "value_ff": 111.0},  # filled
        {"user_id": 1, "hour_id": 13, "value_ff": 333.0},
        {"user_id": 2, "hour_id": 20, "value_ff": 5.5},
    ]


def test_event_transition_matrix_constructed(ray_session, tmp_path):
    """Chains are per-user and ordered by (ts, event_id): user 1 a→b→a,
    user 2 b→b; no cross-user transition. Equal-ts events order by
    event_id."""
    H = 3_600_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array([H, 2 * H, 2 * H, H, 9 * H], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": pa.array(["a", "b", "a", "b", "b"], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from pdf_extractor_ray.pipelines.relational import event_transition_matrix

    got = (
        event_transition_matrix(str(tmp_path))
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"from_type": "a", "to_type": "b", "n": 1},
        {"from_type": "b", "to_type": "a", "n": 1},
        {"from_type": "b", "to_type": "b", "n": 1},
    ]


def test_left_join_null_fill_zero_rows(ray_session, tmp_path):
    """A customer with no orders must appear with n_orders=0 (the real
    testdata has no orderless customers, so the outer semantics need a
    constructed case)."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_mktsegment": pa.array(["A", "B", "A"], pa.string()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 1, 3], pa.int64())}),
        tmp_path / "orders.parquet",
    )
    from pdf_extractor_ray.pipelines.relational import left_join_null_fill

    got = (
        left_join_null_fill(str(tmp_path))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"c_custkey": 1, "c_mktsegment": "A", "n_orders": 2},
        {"c_custkey": 2, "c_mktsegment": "B", "n_orders": 0},
        {"c_custkey": 3, "c_mktsegment": "A", "n_orders": 1},
    ]


def test_percent_rank_singleton_partition(ray_session, tmp_path):
    """A single-row partition gets pct_rank 0 (the n=1 division guard)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(["P1", "P1", "SOLO"], pa.string()),
                "o_totalprice": pa.array([10.0, 20.0, 5.0], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    from pdf_extractor_ray.pipelines.relational import percent_rank_in_group

    got = (
        percent_rank_in_group(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert got["pct_rank"].tolist() == [0.0, 1.0, 0.0]


def test_grouped_hll_accuracy(ray_session):
    """Per-source HLL estimates within the p=12 error envelope of the exact
    COUNT(DISTINCT token) for every group."""
    import duckdb

    from pdf_extractor_ray.pipelines.relational import approx_distinct_tokens_by_source

    sf = "/root/testdata/sf0.001"
    # returns a DataFrame since the r5 self-audit columns (exact joined in)
    approx = approx_distinct_tokens_by_source(sf).set_index("source")["approx_distinct"]
    exact = (
        duckdb.sql(
            f"""SELECT source, COUNT(DISTINCT tok) AS n FROM (
                  SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM read_parquet('{sf}/documents.parquet')) GROUP BY source"""
        )
        .df()
        .set_index("source")["n"]
    )
    assert set(approx.index) == set(exact.index)
    rel = ((approx - exact).abs() / exact).max()
    assert rel <= 0.05


def test_bigram_pmi_hand_computed(ray_session, tmp_path):
    """Corpus 'x y x y' ⊕ 'z z': N=6 tokens, M=4 bigrams; PMI(x,y) =
    log2((2/4)/((2/6)(2/6))) = log2(4.5); the min_count gate must drop
    pairs below the threshold."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["x y x y", "z z"], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    from pdf_extractor_ray.pipelines.relational import bigram_pmi_topk

    got = bigram_pmi_topk(str(tmp_path), min_count=1, k=10).to_pandas()
    xy = got[(got["w1"] == "x") & (got["w2"] == "y")].iloc[0]
    assert xy["n_pair"] == 2
    assert xy["pmi"] == round(np.log2((2 / 4) / ((2 / 6) * (2 / 6))), 4)
    assert len(got) == 3  # (x,y), (y,x), (z,z) — nothing else
    got2 = bigram_pmi_topk(str(tmp_path), min_count=2, k=10).to_pandas()
    assert set(zip(got2["w1"], got2["w2"])) == {("x", "y")}


# --- k-core decomposition ---------------------------------------------------


def test_kcore_peels_tail_keeps_triangle(ray_session, tmp_path):
    """Triangle 1-2-3 plus tail 3-4: the 2-core drops node 4 (degree 1),
    after which node 3's degree falls to 2 and the triangle survives."""
    from pdf_extractor_ray.pipelines.graph import kcore_nodes

    sf = _write_lineitem(tmp_path, {1: [1, 2, 3], 2: [3, 4]})
    got = kcore_nodes(sf, k=2).to_pandas().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == [1, 2, 3]
    assert got["deg"].tolist() == [2, 2, 2]


def test_kcore_cascading_peel_empties_tree(ray_session, tmp_path):
    """A path graph has empty 2-core: each peel round exposes the next
    leaf, so the cascade must iterate to exhaustion, not stop after one."""
    from pdf_extractor_ray.pipelines.graph import kcore_nodes

    # path 1-2-3-4 via overlapping 2-part baskets
    sf = _write_lineitem(tmp_path, {1: [1, 2], 2: [2, 3], 3: [3, 4]})
    got = kcore_nodes(sf, k=2).to_pandas()
    assert len(got) == 0


def test_kcore_matches_exact_peel_sf0001(ray_session):
    """Distributed peel == single-process exact peel on the real sf0.001
    co-occurrence graph (the reimplementation pin rows-only ops get)."""
    from pdf_extractor_ray.pipelines.graph import _part_cooccurrence_edges, kcore_nodes

    sf = "/root/testdata/sf0.001"
    ek = _part_cooccurrence_edges(sf).to_pandas()["ekey"].to_numpy(dtype=np.int64)
    a, b = ek >> 32, ek & 0xFFFFFFFF
    k = 3
    alive = np.ones(len(ek), dtype=bool)
    while True:
        nodes, degs = np.unique(np.concatenate([a[alive], b[alive]]), return_counts=True)
        bad = set(nodes[degs < k].tolist())
        if not bad:
            break
        hit = np.array([x in bad or y in bad for x, y in zip(a, b)])
        alive &= ~hit
    want = dict(zip(nodes.tolist(), degs.tolist()))
    got = kcore_nodes(sf, k=k).to_pandas()
    assert dict(zip(got["node"].tolist(), got["deg"].tolist())) == want


def test_compression_ratio_reimplementation_and_monotonicity(ray_session, tmp_path):
    """Byte-exact vs direct zlib; repetitive text compresses far below a
    high-entropy string of the same length."""
    import zlib

    from pdf_extractor_ray.pipelines.textops import compression_ratio_signal

    rng = np.random.default_rng(7)
    rand_text = "".join(chr(97 + c) for c in rng.integers(0, 26, 4096))
    rep_text = "spam ham " * 455 + "s"  # same 4096-byte length
    assert len(rep_text) == 4096
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([rand_text, rep_text], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        compression_ratio_signal(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate([rand_text, rep_text]):
        assert got["n_bytes"][i] == 4096
        assert got["n_compressed"][i] == len(zlib.compress(t.encode(), 6))
    assert got["compression_ratio"][1] < 0.05 < got["compression_ratio"][0]


def test_triangle_count_cogroup_path_matches_broadcast(ray_session, tmp_path):
    """``broadcast_nodes=0`` forces the degree-attach CO-GROUP (the scale
    path — the full degree table must never be ray.put when the node set is
    webgraph-sized): identical output to the broadcast path on K4 and on
    the real sf0.001 co-occurrence graph."""
    sf = _write_lineitem(tmp_path, {1: [1, 2, 3], 2: [2, 3, 4], 3: [1, 4]})
    got = triangle_count(sf, broadcast_nodes=0)
    assert got.iloc[0].to_dict() == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}
    sf2 = "/root/testdata/sf0.001"
    assert (
        triangle_count(sf2, broadcast_nodes=0).iloc[0].to_dict()
        == triangle_count(sf2).iloc[0].to_dict()
    )


def test_kcore_cogroup_frontier_matches_broadcast(ray_session, tmp_path):
    """``frontier_broadcast=0`` forces the per-endpoint anti-join co-groups
    every round (round-1 frontiers are all sub-k nodes — potentially most
    of the graph — so the scale path must not assume a driver-sized set):
    identical peel result on the cascading path graph and at sf0.001."""
    import pandas as pd

    from pdf_extractor_ray.pipelines.graph import kcore_nodes

    sf = _write_lineitem(tmp_path, {1: [1, 2], 2: [2, 3], 3: [3, 4]})
    assert len(kcore_nodes(sf, k=2, frontier_broadcast=0).to_pandas()) == 0
    sf2 = "/root/testdata/sf0.001"
    a = kcore_nodes(sf2, k=3).to_pandas().sort_values("node").reset_index(drop=True)
    b = (
        kcore_nodes(sf2, k=3, frontier_broadcast=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kmv_overlap_exact_when_exhaustive_and_banded_when_not(ray_session):
    """KMV set-operation sketch: when every per-type distinct-user count
    fits the sample (sf0.001, k=256) all four estimates are EXACT; when
    the estimator engages (sf0.01, k=64) every estimate stays inside a
    2×-s.e. band of the true set-algebra answer."""
    import numpy as np
    import pyarrow.parquet as pq_mod

    from pdf_extractor_ray.pipelines.relational import kmv_user_overlap

    def true_sets(sf):
        t = pq_mod.read_table(
            sf + "/events.parquet", columns=["user_id", "event_type"]
        ).to_pandas()
        return {k: set(g["user_id"]) for k, g in t.groupby("event_type")}

    sf = "/root/testdata/sf0.001"
    sets = true_sets(sf)
    for r in kmv_user_overlap(sf).itertuples(index=False):
        A, B = sets[r.type_a], sets[r.type_b]
        assert (r.est_a, r.est_b, r.est_union, r.est_inter) == (
            len(A), len(B), len(A | B), len(A & B)
        )

    sf = "/root/testdata/sf0.01"
    sets = true_sets(sf)
    for r in kmv_user_overlap(sf, k=64).itertuples(index=False):
        A, B = sets[r.type_a], sets[r.type_b]
        for est, true in (
            (r.est_a, len(A)), (r.est_b, len(B)),
            (r.est_union, len(A | B)), (r.est_inter, len(A & B)),
        ):
            assert abs(est - true) / max(true, 1) <= 0.25, (r, est, true)
