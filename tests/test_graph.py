"""Distributed PageRank (pipelines/graph.py): semantics pinned against an
independent numpy power iteration on the same derived edge set, plus a
constructed graph exercising dangling-mass redistribution exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_ray.pipelines.graph import _customer_supplier_edges, pagerank

SF = "/root/testdata/sf0.001"


def _ref_pagerank(e: pd.DataFrame, n_iters: int, d: float = 0.85) -> pd.DataFrame:
    nodes = np.unique(np.concatenate([e.src.to_numpy(), e.dst.to_numpy()]))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    deg = e.groupby("src").size()
    src_i = e.src.map(idx).to_numpy()
    dst_i = e.dst.map(idx).to_numpy()
    w = 1.0 / e.src.map(deg).to_numpy()
    has_out = np.zeros(N, bool)
    has_out[src_i] = True
    r = np.full(N, 1.0 / N)
    for _ in range(n_iters):
        inflow = np.zeros(N)
        np.add.at(inflow, dst_i, r[src_i] * w)
        r = (1 - d) / N + d * (inflow + r[~has_out].sum() / N)
    return pd.DataFrame({"node": nodes, "rank": np.round(r, 10)})


def test_edges_distinct_and_bipartite(ray_session):
    e = _customer_supplier_edges(SF).to_pandas()
    assert not e.duplicated(["src", "dst"]).any()
    assert (e.src < (1 << 32)).all() and (e.dst >= (1 << 32)).all()


def test_pagerank_matches_numpy_power_iteration(ray_session):
    got = pagerank(SF, n_iters=10).to_pandas().sort_values("node").reset_index(drop=True)
    e = _customer_supplier_edges(SF).to_pandas()
    ref = _ref_pagerank(e, 10).sort_values("node").reset_index(drop=True)
    assert len(got) == len(ref)
    assert np.allclose(got["rank"], ref["rank"], atol=1e-9)
    # probability distribution, dangling mass conserved
    assert abs(got["rank"].sum() - 1.0) < 1e-6


def test_pagerank_constructed_dangling(ray_session, tmp_path):
    """Hand-checkable 4-node graph: c1→{s10,s20}, c2→{s10}; suppliers are
    pure sinks, so every round redistributes their mass uniformly. Pins the
    dangling arithmetic and the edge derivation exactly."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # duplicated (order 1, supp 10) line: must not create a multi-edge
                "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
                "l_suppkey": pa.array([10, 20, 10, 10], pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = pagerank(str(tmp_path), n_iters=2).to_pandas().sort_values("node").reset_index(drop=True)
    e = _customer_supplier_edges(str(tmp_path)).to_pandas()
    assert len(e) == 3
    ref = _ref_pagerank(e, 2).sort_values("node").reset_index(drop=True)
    assert np.allclose(got["rank"], ref["rank"], atol=1e-12)
    # s10 (in-degree 2) must outrank s20 (in-degree 1)
    s = got.set_index("node")["rank"]
    assert s[10 + (1 << 32)] > s[20 + (1 << 32)]


def test_bfs_hops_horizon_bound(ray_session, tmp_path):
    """Chain graph 1-(101)-2-(102)-3-(103)-4: nodes beyond max_hops=4 are
    excluded; hop counts are exact shortest distances."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.graph import bfs_hops

    # order k connects cust c to supp s (one lineitem per order)
    links = [(1, 1, 101), (2, 2, 101), (3, 2, 102), (4, 3, 102), (5, 3, 103), (6, 4, 103)]
    ok, ck, sk = zip(*links)
    pq.write_table(
        pa.table({"o_orderkey": pa.array(ok, pa.int64()), "o_custkey": pa.array(ck, pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_suppkey": pa.array(sk, pa.int64()),
                "l_quantity": pa.array([50.0] * len(ok)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = bfs_hops(str(tmp_path), seed=1, max_hops=4).to_pandas()
    OFF = np.int64(1) << np.int64(32)
    want = {1: 0, 101 + OFF: 1, 2: 2, 102 + OFF: 3, 3: 4}
    assert dict(zip(got["node"], got["hops"])) == want


def test_pagerank_resumable_bit_identical_after_crash(ray_session, tmp_path):
    """Kill between iterations, resume: final ranks BIT-equal to an
    uninterrupted pagerank; only the remaining iterations run."""
    import pytest

    from pdf_extractor_ray.pipelines.graph import pagerank, pagerank_resumable

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "pr_ckpt")
    with pytest.raises(RuntimeError, match="simulated crash"):
        pagerank_resumable(sf, out, n_iters=4, fail_after_iters=2)
    res = pagerank_resumable(sf, out, n_iters=4)
    assert res["iters_skipped"] == 2 and res["iters_run"] == 2
    got = res["ranks"].to_pandas().sort_values("node").reset_index(drop=True)
    want = pagerank(sf, n_iters=4).to_pandas().sort_values("node").reset_index(drop=True)
    assert (got["node"] == want["node"]).all()
    assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()  # bit-equal


def test_pagerank_resumable_fingerprint_invalidates(ray_session, tmp_path):
    """Changed n_iters ⇒ different fingerprint ⇒ committed snapshots are NOT
    reused (ADVICE r2: marker presence alone must not validate resume)."""
    from pdf_extractor_ray.pipelines.graph import pagerank_resumable

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "pr_ckpt2")
    pagerank_resumable(sf, out, n_iters=2)
    res = pagerank_resumable(sf, out, n_iters=3)
    assert res["iters_skipped"] == 0 and res["iters_run"] == 3
