"""Distributed graph analytics over derived relational edges.

Third iterative-algorithm family beside k-means (`similarity.kmeans_clusters`)
and connected components (`dedup.connected_components*`): PageRank by power
iteration, expressed as bucket co-grouped Dataset passes — ranks and edges
are co-located by `node % B` hash buckets, contributions flow through ONE
dst-bucket shuffle per iteration, and only B dangling-mass scalars reach the
driver per round. No per-node Ray groups anywhere (the r2 ~1 ms/group rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import N_KEY_BUCKETS, _read

DAMPING = 0.85


def _customer_supplier_edges(sf_dir: str, min_qty: int | None = None):
    """Derived bipartite purchase graph: DISTINCT customer→supplier edges
    via orders ⋈ lineitem on the order key. Suppliers get node ids offset
    by 2^32 so the two id spaces cannot collide. The join is the proven
    bucket co-group: both sides keyed by orderkey % B, merged vectorized
    inside the bucket, deduplicated per bucket before leaving it.
    ``min_qty`` keeps only high-quantity purchase edges (exact integer
    rule) — the sparser subgraph BFS traverses; None keeps all (PageRank,
    degree, triangles)."""
    cols = ["l_orderkey", "l_suppkey"] + (["l_quantity"] if min_qty is not None else [])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = _read(sf_dir, "lineitem", cols)
    if min_qty is not None:
        thr = float(min_qty)
        items = items.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t.column("l_quantity"), thr)
            ).select(["l_orderkey", "l_suppkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    SUPP_OFF = np.int64(1) << np.int64(32)
    B = N_KEY_BUCKETS

    def tag_orders(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(k),
                "_bucket": pa.array(k % B),
                "cust": t.column("o_custkey").cast(pa.int64()),
                "supp": pa.array(np.full(len(k), -1, dtype=np.int64)),
            }
        )

    def tag_items(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(k),
                "_bucket": pa.array(k % B),
                "cust": pa.array(np.full(len(k), -1, dtype=np.int64)),
                "supp": t.column("l_suppkey").cast(pa.int64()),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(items.map_batches(tag_items, batch_format="pyarrow", zero_copy_batch=True))

    def join(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["supp"] < 0][["key", "cust"]]
        li = g[g["cust"] < 0][["key", "supp"]]
        m = li.merge(o, on="key")[["cust", "supp"]].drop_duplicates()
        return pd.DataFrame(
            {
                "src": m["cust"].to_numpy(dtype=np.int64),
                "dst": m["supp"].to_numpy(dtype=np.int64) + SUPP_OFF,
            }
        )

    joined = tagged.groupby("_bucket").map_groups(join, batch_format="pandas")

    # the in-bucket dedup above is per ORDER bucket; the same (cust, supp)
    # pair recurs across orders in other buckets — global distinct needs one
    # src-keyed pass (a pair's bucket is a pure function of src, so the
    # distinct is exact and stays vectorized).
    def src_bucket(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        return t.append_column("_bucket", pa.array(s % B, type=pa.int64()))

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return (
        joined.map_batches(src_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(distinct, batch_format="pandas")
    )


def pagerank(sf_dir: str, n_iters: int = 10, damping: float = DAMPING):
    """PageRank over the customer→supplier purchase graph (power iteration,
    fixed ``n_iters`` — deterministic, no RNG). Suppliers are pure sinks
    (dangling); their mass redistributes uniformly each round, per the
    standard formulation r'(v) = (1-d)/N + d·(Σ_in r(u)/deg(u) +
    dangling/N). Returns (node, rank) rounded to 10 dp; supplier node ids
    carry a 2^32 offset.

    Scale shape — ONE co-group shuffle per iteration (the CC-rounds rule:
    a measured union+groupby pass costs seconds of fixed overhead, so the
    rank-rebuild is FOLDED into the next round's pass instead of being its
    own shuffle): the iteration state is the (node, contribution) partial
    table keyed by node % B; each pass unions {partials, node skeleton,
    src-bucketed edges} — all three keyed by the SAME bucket id — and
    inside the bucket (a) reduces partials to ranks in sorted order,
    (b) joins ranks onto the co-resident edges, emitting next-round
    (dst, contrib) partials plus one dangling scalar per bucket. Only B
    dangling scalars reach the driver per round. Edges and skeleton are
    materialized once and re-read from the object store every round.
    Float sums happen in sorted key order, so results are bit-reproducible
    given a fixed block layout (the k-means convention)."""
    static, n_nodes = _pagerank_static(sf_dir)

    # state: contribution partials keyed by node bucket; round 0 starts with
    # none (ranks reduce to the uniform init when no partials are present).
    state = None  # Dataset of (_bucket, kind=0, node, c, dst=-1, deg=0)
    base = 1.0 / n_nodes  # round-0 "rank" for every node
    uniform0 = True

    for _ in range(n_iters):
        state, base = _pagerank_round(
            static, state, base, uniform0, damping, n_nodes
        )
        uniform0 = False

    ranks = _pagerank_finish(static, state, base, damping).materialize()
    # self-audit (VERDICT r4 #6): total rank mass — a probability
    # distribution sums to 1 only when dangling redistribution is right,
    # so the driver sees conservation, not just per-node floats. One
    # distributed Sum over the already-materialized node-sized table.
    from ray.data.aggregate import Sum

    tot = round(float(ranks.aggregate(Sum("rank"))["sum(rank)"]), 6)

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_sum_all", pa.array(np.full(t.num_rows, tot, dtype=np.float64))
        )

    return ranks.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def pagerank_resumable(
    sf_dir: str,
    out_dir: str,
    *,
    n_iters: int = 10,
    damping: float = DAMPING,
    fail_after_iters: int | None = None,
    run_id: str | None = None,
) -> dict:
    """``pagerank`` with a checkpoint after every power iteration — the
    second iterative family on the PassCheckpointer resume story (k-means
    set the pattern): per-iteration state is the (node, contribution)
    partial table plus the base scalar (stored as a node=-2 row), so a
    crash loses at most one iteration over the full graph. Every in-bucket
    float sum happens in sorted (node, c) order (see ``_pagerank_round``),
    so the resumed run is BIT-IDENTICAL to an uninterrupted ``pagerank``
    even though the snapshot changes the state's block layout (pinned in
    tests/test_graph.py). Fingerprinted per ADVICE r2.

    Returns {"iters_run", "iters_skipped", "ranks" (Dataset)}."""
    import uuid as _uuid

    import ray.data as rd

    from ..state.lineage import PassCheckpointer

    cp = PassCheckpointer(
        out_dir, fingerprint=f"{sf_dir}|pagerank-v1|d={damping}|n_iters={n_iters}"
    )
    rid = run_id or _uuid.uuid4().hex[:8]
    static, n_nodes = _pagerank_static(sf_dir)
    B = N_KEY_BUCKETS
    state = None
    base = 1.0 / n_nodes
    uniform = True
    ran = skipped = 0

    def snapshot_ds(state_ds, base_val):
        live = state_ds.select_columns(["node", "c"])
        brow = rd.from_arrow(
            pa.table({"node": pa.array([-2], pa.int64()), "c": pa.array([base_val])})
        )
        return live.union(brow)

    def restore(name):
        import pyarrow.parquet as pq_mod

        snap = pq_mod.read_table(cp.data_dir(name))
        node = snap.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        c = snap.column("c").to_numpy(zero_copy_only=False)
        is_base = node == -2
        base_val = float(c[is_base][0])
        node, c = node[~is_base], c[~is_base]
        t = pa.table(
            {
                "_bucket": pa.array(node % B),
                "kind": pa.array(np.zeros(len(node), dtype=np.int8)),
                "node": pa.array(node),
                "c": pa.array(c),
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "deg": pa.array(np.zeros(len(node), dtype=np.int64)),
            }
        )
        return rd.from_arrow(t).repartition(8).materialize(), base_val

    # committed prefix: only the LAST committed snapshot needs reading
    while skipped < n_iters and cp.done(f"iter-{skipped:03d}"):
        skipped += 1
    if skipped:
        state, base = restore(f"iter-{skipped - 1:03d}")
        uniform = False

    for i in range(skipped, n_iters):
        name = f"iter-{i:03d}"
        if fail_after_iters is not None and ran >= fail_after_iters:
            raise RuntimeError(f"simulated crash before {name}")
        state, base = _pagerank_round(static, state, base, uniform, damping, n_nodes)
        uniform = False
        cp.write_pass(name, snapshot_ds(state, base), rid)
        ran += 1

    return {
        "iters_run": ran,
        "iters_skipped": skipped,
        "ranks": _pagerank_finish(static, state, base, damping),
    }


def _pagerank_static(sf_dir: str):
    """Build the materialized static side of every PageRank round (tagged
    skeleton ∪ degree-annotated edges, coalesced to O(CPUs) blocks once —
    NOTES block-count rule) and the node count. Shared by ``pagerank`` and
    the checkpoint/resume variant."""
    B = N_KEY_BUCKETS
    edges = _customer_supplier_edges(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        return t.append_column("_bucket", pa.array(s % B, type=pa.int64()))

    def degree(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        deg = g.groupby("src")["dst"].transform("size").to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": g["src"].to_numpy(), "dst": g["dst"].to_numpy(), "deg": deg}
        )

    edges_b = (
        edges.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(degree, batch_format="pandas")
        .repartition(32)  # NOTES block-count rule: re-enters a shuffle every round
        .materialize()
    )

    def node_rows(t: pa.Table) -> pa.Table:
        n = np.unique(
            np.concatenate(
                [
                    t.column("src").to_numpy(zero_copy_only=False),
                    t.column("dst").to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table({"node": pa.array(n), "_bucket": pa.array(n % B)})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")[["node", "_bucket"]]

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(dedup_nodes, batch_format="pandas")
        .repartition(32)  # same rule
        .materialize()
    )
    n_nodes = nodes.count()

    # Unified row layout for the 3-way union:
    #   kind 0 = contribution partial (node, c)
    #   kind 1 = node skeleton row    (node)
    #   kind 2 = edge row             (node=src, dst, deg)
    def skel_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_bucket": t.column("_bucket"),
                "kind": pa.array(np.full(n, 1, dtype=np.int8)),
                "node": t.column("node"),
                "c": pa.array(np.zeros(n)),
                "dst": pa.array(np.full(n, -1, dtype=np.int64)),
                "deg": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def edge_tag(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        n = len(s)
        return pa.table(
            {
                "_bucket": pa.array(s % B),
                "kind": pa.array(np.full(n, 2, dtype=np.int8)),
                "node": pa.array(s),
                "c": pa.array(np.zeros(n)),
                "dst": t.column("dst"),
                "deg": t.column("deg"),
            }
        )

    # static side of every round's union, coalesced to a few blocks ONCE —
    # the union+groupby sort cost scales with BLOCK count, and bucket
    # outputs arrive as one tiny block per bucket (measured 13.7 s/iter
    # with ~200 raw blocks vs ~3 s after coalescing; NOTES r3).
    static = (
        nodes.map_batches(skel_tag, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            edges_b.map_batches(edge_tag, batch_format="pyarrow", zero_copy_batch=True)
        )
        .repartition(8)
        .materialize()
    )
    return static, n_nodes


def _pagerank_round(static, state, base, uniform, damping, n_nodes):
    """One power-iteration round (shared by ``pagerank`` and the
    checkpoint/resume variant): co-group {static, state partials}, emit
    next-round partials + B dangling scalars, return (new_state, new_base).
    Deterministic regardless of block layout: every in-bucket float sum
    happens in sorted (node, c) order and the dangling sum sorts first."""
    import pyarrow.compute as pc

    B = N_KEY_BUCKETS

    def make_pass(base_val, uniform):
        def step(g: pd.DataFrame) -> pd.DataFrame:
            sk = g[g["kind"] == 1][["node"]].drop_duplicates()
            eg = g[g["kind"] == 2][["node", "dst", "deg"]]
            if uniform:
                r = pd.Series(base_val, index=sk["node"].to_numpy())
            else:
                cp = g[g["kind"] == 0].sort_values(["node", "c"], kind="mergesort")
                s = cp.groupby("node", sort=True)["c"].sum()
                r = pd.Series(
                    base_val + damping * sk["node"].map(s).fillna(0.0).to_numpy(),
                    index=sk["node"].to_numpy(),
                )
            m = eg.assign(r=eg["node"].map(r).to_numpy())
            out = pd.DataFrame(
                {
                    "node": m["dst"].to_numpy(dtype=np.int64),
                    "c": (m["r"] / m["deg"]).to_numpy(),
                }
            ).sort_values(["node", "c"], kind="mergesort")
            agg = out.groupby("node", sort=True)["c"].sum().reset_index()
            dang = float(r[~r.index.isin(eg["node"].unique())].sum())
            agg = pd.concat(
                [agg, pd.DataFrame({"node": [np.int64(-1)], "c": [dang]})],
                ignore_index=True,
            )
            bucket = int(g["_bucket"].iloc[0])
            return pd.DataFrame(
                {
                    "_bucket": np.where(
                        agg["node"].to_numpy() >= 0,
                        agg["node"].to_numpy(dtype=np.int64) % B,
                        -1,
                    ).astype(np.int64),
                    "kind": np.zeros(len(agg), dtype=np.int8),
                    "node": agg["node"].to_numpy(dtype=np.int64),
                    "c": agg["c"].to_numpy(),
                    "dst": np.full(len(agg), -1, dtype=np.int64),
                    "deg": np.zeros(len(agg), dtype=np.int64),
                }
            )

        return step

    u = static if state is None else static.union(state)
    parts = (
        u.groupby("_bucket")
        .map_groups(make_pass(base, uniform), batch_format="pandas")
        .repartition(8)
        .materialize()
    )

    def dang_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("node"), -1)).select(["c"])

    dang = (
        parts.map_batches(dang_rows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("c")["c"]
        .sum()
    )
    new_base = (1.0 - damping) / n_nodes + damping * float(dang) / n_nodes

    def live_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("node"), 0))

    new_state = parts.map_batches(
        live_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return new_state, new_base


def _pagerank_finish(static, state, base, damping):
    """Final rank evaluation: one last co-group of partials with the
    skeleton (shared by both pagerank variants)."""

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        sk = g[g["kind"] == 1][["node"]].drop_duplicates()
        cp = g[g["kind"] == 0].sort_values(["node", "c"], kind="mergesort")
        s = cp.groupby("node", sort=True)["c"].sum()
        r = base + damping * sk["node"].map(s).fillna(0.0).to_numpy()
        return pd.DataFrame(
            {"node": sk["node"].to_numpy(dtype=np.int64), "rank": np.round(r, 10)}
        )

    return (
        static.union(state)
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


def _part_cooccurrence_edges(sf_dir: str):
    """Derived unipartite graph over parts: an edge {a, b} (a < b) iff the
    two parts co-occur in at least one order. Pair generation is the
    shifted-lag kernel inside orderkey-hash buckets (sort by (order, part);
    for lag d emit (part[i], part[i+d]) where order matches — vectorized,
    basket-bounded); global distinct is one pair-hash bucket pass. Edges
    leave as a single packed int64 key (a<<32 | b)."""
    from .relational import map_key_buckets

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        ok = g["l_orderkey"].to_numpy(dtype=np.int64)
        pk = g["l_partkey"].to_numpy(dtype=np.int64)
        packed = []
        max_lag = int(np.bincount(np.unique(ok, return_inverse=True)[1]).max()) if len(ok) else 0
        for d in range(1, max_lag):
            same = ok[:-d] == ok[d:]
            packed.append((pk[:-d][same] << 32) | pk[d:][same])
        allp = np.unique(np.concatenate(packed)) if packed else np.empty(0, dtype=np.int64)
        return pd.DataFrame({"ekey": allp})

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ekey": np.unique(g["ekey"].to_numpy(dtype=np.int64))})

    pairs = map_key_buckets(ds, "l_orderkey", pairs_in_bucket, sort_by=["l_orderkey", "l_partkey"])
    return map_key_buckets(pairs, "ekey", distinct)


def degree_distribution(sf_dir: str):
    """Degree histogram of the part co-occurrence graph: how many nodes have
    each degree. Scale shape: per-batch endpoint-count partials → one
    node-hash bucket merge (per-node degree finished vectorized inside the
    bucket, emitting per-bucket (degree, n_nodes) partials) → the final
    merge groups by DEGREE, whose cardinality is bounded by the max basket
    fan-out, not the node count."""
    from ray.data.aggregate import Sum

    from .relational import map_key_buckets

    edges = _part_cooccurrence_edges(sf_dir)

    def endpoint_partials(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy(zero_copy_only=False)
        nodes = np.concatenate([ek >> 32, ek & 0xFFFFFFFF])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(c.astype(np.int64))})

    def degree_hist_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node", sort=False)["deg"].sum().to_numpy(dtype=np.int64)
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"degree": u, "n_nodes": c.astype(np.int64)})

    parts = edges.map_batches(
        endpoint_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    hist = map_key_buckets(parts, "node", degree_hist_in_bucket)
    return (
        hist.groupby("degree")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
        .sort("degree")
    )


def triangle_count(sf_dir: str, broadcast_nodes: int = 100_000):
    """Exact triangle count of the part co-occurrence graph — the classic
    distributed node-iterator: orient every edge from the (degree, id)-
    smaller endpoint to the larger (each triangle then closes at exactly
    one node), generate wedges (pairs of out-neighbors) per source node,
    and count wedges whose closing pair is itself an edge.

    Scale shape: degrees come from the same bucket-merged endpoint partials
    as ``degree_distribution``. Attaching a degree to each edge endpoint is
    a NODE-HASH BUCKET CO-GROUP of degree rows with edge-endpoint rows,
    followed by an ekey-bucket co-group that rejoins the two endpoint
    degrees and orients — the degree table never leaves the cluster
    (VERDICT r3 wrong #3: the previous ``ray.put`` of the full (node, deg)
    arrays was a node-count-sized driver + object-store payload; at
    webgraph scale that is tens of GB). Below ``broadcast_nodes`` the
    dimension-sized broadcast is kept as the measured fast path (two fewer
    shuffles — the components-crossover pattern); tests pin both paths to
    identical output with ``broadcast_nodes=0``.

    Orientation + wedge generation is the shifted-lag kernel in src-hash
    buckets (out-degrees are bounded by ~sqrt(2|E|) under this orientation,
    the standard guarantee); the closing test is a bucket co-group of wedge
    partials with edge rows on the packed pair key — the edge set is never
    broadcast and never becomes per-key Ray groups. Driver sees one scalar
    per key bucket. Returns one row (n_nodes, n_edges, n_triangles)."""
    import ray

    from .relational import N_KEY_BUCKETS, map_key_buckets

    B = N_KEY_BUCKETS
    edges = _part_cooccurrence_edges(sf_dir).materialize()

    def endpoint_partials(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy(zero_copy_only=False)
        nodes = np.concatenate([ek >> 32, ek & 0xFFFFFFFF])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(c.astype(np.int64))})

    def merge_deg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["deg"].sum().reset_index()
        return pd.DataFrame(
            {"node": s["node"].to_numpy(dtype=np.int64), "deg": s["deg"].to_numpy(dtype=np.int64)}
        )

    deg = map_key_buckets(
        edges.map_batches(endpoint_partials, batch_format="pyarrow", zero_copy_batch=True),
        "node",
        merge_deg,
    ).materialize()
    n_nodes = deg.count()
    n_edges = edges.count()

    if n_nodes <= broadcast_nodes:
        # small-graph fast path: dimension-sized degree broadcast (two
        # fewer shuffles; measured faster at sf0.1's |parts| cardinality)
        deg_df = deg.to_pandas().sort_values("node")
        deg_ref = ray.put(
            (deg_df["node"].to_numpy(dtype=np.int64), deg_df["deg"].to_numpy(dtype=np.int64))
        )

        def orient(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            ek = t.column("ekey").to_numpy(zero_copy_only=False)
            a, b = ek >> 32, ek & 0xFFFFFFFF
            da = degs[np.searchsorted(nodes, a)]
            db = degs[np.searchsorted(nodes, b)]
            # orient from (deg, id)-smaller to larger
            a_first = (da < db) | ((da == db) & (a < b))
            src = np.where(a_first, a, b)
            dst = np.where(a_first, b, a)
            return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

        oriented = edges.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # scale path: co-group degree rows with edge ENDPOINT rows by node
        # hash (each edge emits one row per endpoint), then rejoin the two
        # per-endpoint degrees by ekey hash and orient. Sides carry an
        # explicit int8 flag + dummy-zero int columns (nullable-int64 union
        # columns become float64 in the pandas group — same discipline as
        # connected_components' gen_msgs).
        def tag_deg(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "_bucket": pa.array(n % B),
                    "node": pa.array(n),
                    "deg": t.column("deg"),
                    "ekey": pa.array(np.zeros(len(n), dtype=np.int64)),
                    "is_deg": pa.array(np.ones(len(n), dtype=np.int8)),
                }
            )

        def tag_endpoints(t: pa.Table) -> pa.Table:
            ek = t.column("ekey").to_numpy(zero_copy_only=False)
            node = np.concatenate([ek >> 32, ek & 0xFFFFFFFF])
            ekey2 = np.concatenate([ek, ek])
            return pa.table(
                {
                    "_bucket": pa.array(node % B),
                    "node": pa.array(node),
                    "deg": pa.array(np.zeros(len(node), dtype=np.int64)),
                    "ekey": pa.array(ekey2),
                    "is_deg": pa.array(np.zeros(len(node), dtype=np.int8)),
                }
            )

        def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
            is_d = g["is_deg"].to_numpy() == 1
            dmap = pd.Series(
                g["deg"].to_numpy(dtype=np.int64)[is_d],
                index=g["node"].to_numpy(dtype=np.int64)[is_d],
            )
            node = g["node"].to_numpy(dtype=np.int64)[~is_d]
            ekey = g["ekey"].to_numpy(dtype=np.int64)[~is_d]
            dg = pd.Series(node).map(dmap).to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "ekey": ekey,
                    "deg": dg,
                    "is_a": (node == (ekey >> 32)).astype(np.int8),
                }
            )

        attached = (
            deg.map_batches(tag_deg, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                edges.map_batches(
                    tag_endpoints, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("_bucket")
            .map_groups(attach_deg, batch_format="pandas")
        )

        def orient_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
            ek = g["ekey"].to_numpy(dtype=np.int64)
            dg = g["deg"].to_numpy(dtype=np.int64)
            ia = g["is_a"].to_numpy()
            order = np.lexsort((ia, ek))
            ek, dg = ek[order], dg[order]
            # distinct edges → exactly two rows per ekey, b-row (is_a=0)
            # then a-row (is_a=1) after the lexsort
            e = ek[0::2]
            db, da = dg[0::2], dg[1::2]
            a, b = e >> 32, e & 0xFFFFFFFF
            a_first = (da < db) | ((da == db) & (a < b))
            return pd.DataFrame(
                {"src": np.where(a_first, a, b), "dst": np.where(a_first, b, a)}
            )

        oriented = map_key_buckets(attached, "ekey", orient_in_bucket)

    def wedges_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy(dtype=np.int64)
        d = g["dst"].to_numpy(dtype=np.int64)
        # sort by (src, dst id) so lag pairs have w_lo < w_hi by id — the
        # edge packing's (a < b) convention
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        packed = []
        max_lag = int(np.bincount(np.unique(s, return_inverse=True)[1]).max()) if len(s) else 0
        for lag in range(1, max_lag):
            same = s[:-lag] == s[lag:]
            packed.append((d[:-lag][same] << 32) | d[lag:][same])
        allw = np.concatenate(packed) if packed else np.empty(0, dtype=np.int64)
        u, c = np.unique(allw, return_counts=True)
        return pd.DataFrame({"ekey": u, "n": c.astype(np.int64)})

    wedges = map_key_buckets(oriented, "src", wedges_in_bucket)

    # closing test: co-group wedge partials with edge rows on ekey % B
    def tag_wedge(t: pa.Table) -> pa.Table:
        k = t.column("ekey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"_bucket": pa.array(k % B), "ekey": t.column("ekey"), "n": t.column("n")}
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        k = t.column("ekey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_bucket": pa.array(k % B),
                "ekey": t.column("ekey"),
                "n": pa.array(np.zeros(len(k), dtype=np.int64)),
            }
        )

    both = wedges.map_batches(tag_wedge, batch_format="pyarrow", zero_copy_batch=True).union(
        edges.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True)
    )

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["n"].to_numpy() == 0
        ekeys = g["ekey"].to_numpy(dtype=np.int64)
        closed = np.isin(ekeys[~is_edge], ekeys[is_edge])
        return pd.DataFrame({"tri": [int(g["n"].to_numpy()[~is_edge][closed].sum())]})

    tri = int(
        both.groupby("_bucket")
        .map_groups(close_count, batch_format="pandas")
        .sum("tri")
    )
    return pd.DataFrame(
        {
            "n_nodes": np.array([n_nodes], dtype=np.int64),
            "n_edges": np.array([n_edges], dtype=np.int64),
            "n_triangles": np.array([tri], dtype=np.int64),
        }
    )


def bfs_hops(sf_dir: str, seed: int = 1, max_hops: int = 4):
    """Distributed BFS shortest-hops from a seed over the UNDIRECTED
    purchase graph — the only iterative algorithm here with an EXACT SQL
    oracle (DuckDB recursive CTE), so the whole iterative machinery is
    hash-gated, not just unit-pinned. Bounded-round min-hop label
    relaxation (Bellman-Ford over unit weights) in the PageRank FOLDED
    shape: ONE bucket co-group per round whose input unions {edges
    (src-bucket), labels (node-bucket), last round's hop candidates
    (node-bucket)} — the bucket fn merges candidates into labels AND emits
    the next round's candidates, so each round costs one shuffle barrier,
    not three (the first, 3-barrier version measured 33 s at sf0.1; this
    one ~a third of that). map_groups output is ≤B blocks, so no
    repartition pass is needed either.

    Row kinds share one schema: dst ≥ 0 edge, dst == −1 label,
    dst == −2 candidate. Emission is FRONTIER-SPARSE: only nodes whose
    label improved this round emit next-round candidates (in unit-weight
    BFS a label improves exactly once), so per-round candidate volume is
    the frontier size, not the reached-set size — the property that keeps
    later rounds cheap on large graphs. At this test scale the fixed
    per-round shuffle barrier dominates either way (NOTES)."""
    INF = max_hops + 1
    B = N_KEY_BUCKETS
    edges = _customer_supplier_edges(sf_dir, min_qty=48)

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        src = np.concatenate([s, d])
        dst = np.concatenate([d, s])
        return pa.table(
            {
                "_bucket": pa.array(src % B),
                "src": pa.array(src),
                "dst": pa.array(dst),
                "hops": pa.array(np.full(len(src), -1, dtype=np.int64)),
            }
        )

    # NOTES iterative-coalescing rule: blocks that re-enter a shuffle every
    # round stay at O(CPUs); without this the union's block count grows by
    # +128/round and round time grows 2.9 s → 29.6 s (measured)
    edges_b = (
        edges.map_batches(undirect, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(32)
        .materialize()
    )

    def init_labels(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        nodes = np.unique(s)  # undirected edge list → src covers every node
        hops = np.where(nodes == seed, 0, INF).astype(np.int64)
        return pa.table(
            {
                "_bucket": pa.array(nodes % B),
                "src": pa.array(nodes),
                "dst": pa.array(np.full(len(nodes), -1, dtype=np.int64)),
                "hops": pa.array(hops),
            }
        )

    def dedup_labels(g: pd.DataFrame) -> pa.Table:
        lab = g.groupby("src", sort=False)["hops"].min().reset_index()
        src = lab["src"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "_bucket": pa.array(src % B),
                "src": pa.array(src),
                "dst": pa.array(np.full(len(lab), -1, dtype=np.int64)),
                "hops": pa.array(lab["hops"].to_numpy(dtype=np.int64)),
            }
        )

    labels = (
        edges_b.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(dedup_labels, batch_format="pandas")
        .repartition(32)
        .materialize()
    )

    def make_step(last: bool):
        def step(g: pd.DataFrame) -> pa.Table:
            lab = g[g["dst"] == -1][["src", "hops"]]
            cand = g[g["dst"] == -2][["src", "hops"]]
            if len(cand):
                c = cand.groupby("src", sort=False)["hops"].min()
                prev = lab.set_index("src")["hops"]
                cr = c.reindex(prev.index)
                improved = (cr < prev).fillna(False).to_numpy()
                merged = prev.to_numpy(dtype=np.int64).copy()
                merged[improved] = cr.to_numpy()[improved].astype(np.int64)
                lab = pd.DataFrame({"src": prev.index.to_numpy(dtype=np.int64), "hops": merged})
                # FRONTIER-SPARSE emission: in unit-weight BFS a label only
                # improves once (its final value), so the next round's
                # candidates need only come from nodes reached THIS round —
                # emission volume ∝ frontier, not ∝ all reached nodes
                frontier = lab[improved]
            else:
                frontier = lab[lab["hops"] == 0]  # round 0: the seed
            src = lab["src"].to_numpy(dtype=np.int64)
            hops = lab["hops"].to_numpy(dtype=np.int64)
            out = {
                "_bucket": src % B,
                "src": src,
                "dst": np.full(len(lab), -1, dtype=np.int64),
                "hops": hops,
            }
            if not last:
                e = g[g["dst"] >= 0][["src", "dst"]]
                reach = frontier[frontier["hops"] <= max_hops]
                m = e.merge(reach, on="src")
                if len(m):
                    m["c"] = m["hops"] + 1
                    nxt = m.groupby("dst", sort=False)["c"].min().reset_index()
                    d = nxt["dst"].to_numpy(dtype=np.int64)
                    out = {
                        "_bucket": np.concatenate([out["_bucket"], d % B]),
                        "src": np.concatenate([out["src"], d]),
                        "dst": np.concatenate(
                            [out["dst"], np.full(len(nxt), -2, dtype=np.int64)]
                        ),
                        "hops": np.concatenate(
                            [out["hops"], nxt["c"].to_numpy(dtype=np.int64)]
                        ),
                    }
            return pa.table({k: pa.array(v) for k, v in out.items()})

        return step

    state = labels
    for r in range(max_hops + 1):
        state = (
            edges_b.union(state)
            .groupby("_bucket")
            .map_groups(make_step(r == max_hops), batch_format="pandas")
            .repartition(32)
            .materialize()
        )

    def finish(t: pa.Table) -> pa.Table:
        h = t.column("hops").to_numpy(zero_copy_only=False)
        keep = (t.column("dst").to_numpy(zero_copy_only=False) == -1) & (h <= max_hops)
        return pa.table(
            {
                "node": pa.array(t.column("src").to_numpy(zero_copy_only=False)[keep]),
                "hops": pa.array(h[keep]),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def kcore_nodes(sf_dir: str, k: int = 3, max_rounds: int = 50, frontier_broadcast: int = 100_000):
    """k-core decomposition of the part co-occurrence graph — iterative
    peel: drop every node with degree < k, recompute degrees on the
    surviving subgraph, repeat to fixpoint; survivors are the k-core (the
    densely-connected backbone community detection and spam-cluster
    analysis start from). Completes the graph family's fourth iterative
    algorithm (PageRank / BFS / CC / k-core).

    Per round: per-batch endpoint-count partials → ONE node-bucket merge
    (vectorized per-node degree inside the bucket — never per-node Ray
    groups) → the drop FRONTIER (nodes whose degree just fell below k) is
    counted distributed first. "Shrinking every round" only holds from
    round 2 — ROUND 1's frontier is every node with degree < k, potentially
    most of the graph (VERDICT r3 wrong #3 caveat) — so the filter is
    size-gated: at or below ``frontier_broadcast`` nodes the frontier is
    broadcast as an Arrow value_set for a vectorized ``pc.is_in`` edge
    drop; above it the drop becomes two node-bucket co-group ANTI-joins
    (one per edge endpoint) and the frontier never touches the driver.
    Surviving edges are repartitioned to O(CPUs) blocks each round (NOTES
    block-count accumulation rule).

    Returns surviving (node, degree) — degrees all ≥ k at fixpoint."""
    import pyarrow.compute as pc
    import ray

    from .relational import map_key_buckets

    edges = (
        _part_cooccurrence_edges(sf_dir)
        .repartition(8)
        .materialize()
    )

    def endpoint_partials(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy(zero_copy_only=False)
        nodes = np.concatenate([ek >> 32, ek & 0xFFFFFFFF])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(c.astype(np.int64))})

    def degree_in_bucket(g: pd.DataFrame) -> pa.Table:
        d = g.groupby("node", sort=False)["deg"].sum().reset_index()
        return pa.table(
            {
                "node": pa.array(d["node"].to_numpy(dtype=np.int64)),
                "deg": pa.array(d["deg"].to_numpy(dtype=np.int64)),
            }
        )

    B = 64

    def _anti_join_endpoint(eds, drop_ds, shift: int):
        """Drop edges whose endpoint at ``shift`` is in drop_ds: node-hash
        bucket co-group of edge rows (tagged by that endpoint) with drop
        rows. int8 flag + dummy-zero columns (nullable-int64 union columns
        become float64 in the pandas group)."""

        def tag_edge(t: pa.Table) -> pa.Table:
            ek = t.column("ekey").to_numpy(zero_copy_only=False)
            node = (ek >> shift) & 0xFFFFFFFF
            return pa.table(
                {
                    "_bucket": pa.array(node % B),
                    "node": pa.array(node),
                    "ekey": pa.array(ek),
                    "is_drop": pa.array(np.zeros(len(ek), dtype=np.int8)),
                }
            )

        def tag_drop(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "_bucket": pa.array(n % B),
                    "node": pa.array(n),
                    "ekey": pa.array(np.zeros(len(n), dtype=np.int64)),
                    "is_drop": pa.array(np.ones(len(n), dtype=np.int8)),
                }
            )

        def filt(g: pd.DataFrame) -> pd.DataFrame:
            is_d = g["is_drop"].to_numpy() == 1
            bad = g["node"].to_numpy(dtype=np.int64)[is_d]
            node = g["node"].to_numpy(dtype=np.int64)[~is_d]
            ekey = g["ekey"].to_numpy(dtype=np.int64)[~is_d]
            return pd.DataFrame({"ekey": ekey[~np.isin(node, bad)]})

        return (
            eds.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                drop_ds.map_batches(
                    tag_drop, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("_bucket")
            .map_groups(filt, batch_format="pandas")
        )

    for _ in range(max_rounds):
        degs = map_key_buckets(
            edges.map_batches(
                endpoint_partials, batch_format="pyarrow", zero_copy_batch=True
            ),
            "node",
            degree_in_bucket,
        ).materialize()
        drop_ds = degs.map_batches(
            lambda t: t.filter(pc.less(t.column("deg"), k)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        n_drop = drop_ds.count()
        if n_drop == 0:
            return degs.select_columns(["node", "deg"])
        if n_drop <= frontier_broadcast:
            # frontier fits the driver: build the Arrow value_set ONCE and
            # broadcast it — rebuilding a set→list→array per batch was
            # per-batch Python overhead on the hot filter
            drop = drop_ds.to_pandas()
            drop_ref = ray.put(
                pa.array(np.sort(drop["node"].to_numpy(dtype=np.int64)))
            )

            def drop_edges(t: pa.Table, _ref=drop_ref) -> pa.Table:
                bad = ray.get(_ref)
                a = pc.bit_wise_and(
                    pc.shift_right(t.column("ekey"), 32), 0xFFFFFFFF
                )
                b = pc.bit_wise_and(t.column("ekey"), 0xFFFFFFFF)
                keep = pc.and_(
                    pc.invert(pc.is_in(a, value_set=bad)),
                    pc.invert(pc.is_in(b, value_set=bad)),
                )
                return t.filter(keep)

            edges = edges.map_batches(
                drop_edges, batch_format="pyarrow", zero_copy_batch=True
            )
        else:
            # scale path (round-1-sized frontiers): two co-group anti-joins
            edges = _anti_join_endpoint(
                _anti_join_endpoint(edges, drop_ds, 32), drop_ds, 0
            )
        edges = edges.repartition(8).materialize()
    raise RuntimeError(f"kcore_nodes: no fixpoint within {max_rounds} rounds")
