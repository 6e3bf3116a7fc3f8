"""Deduplication family over the documents table (training-data ops).

Ray-Data shapes (ray_guide "Aggregation at scale"):
- exact: content-hash → groupby(hash) → deterministic representative
  (in relational.dedup_exact),
- MinHash+LSH: per-batch shingle→minhash→band rows (explode) →
  groupby(band_id, band_hash) → candidate pairs → verify exact Jaccard,
- SimHash: 64-bit fingerprint per doc; near-dup = same fingerprint bucket
  (or small Hamming distance within buckets),
- n-gram Jaccard: char-trigram sets, LSH-free small-scale verify within
  hash-prefix buckets.

All sketches are deterministic (functions/sketches.py) — identical across
workers, runs, and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import MinHasher, char_ngrams, jaccard, shingles, simhash64

NUM_PERM = 64
NUM_BANDS = 16  # 16 bands × 4 rows → catches J≳0.6 with high prob


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


class MinHashBander:
    """Actor: the hash family is built once per worker (§2.3 pattern).
    ``mode="word"`` sketches word k-shingles; ``mode="char"`` sketches char
    trigrams (the n-gram-Jaccard blocking key)."""

    def __init__(
        self,
        num_perm: int = NUM_PERM,
        num_bands: int = NUM_BANDS,
        shingle_k: int = 3,
        mode: str = "word",
    ):
        self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
        self.num_bands = num_bands
        self.mode = mode

    def _element_hashes(self, text: str) -> np.ndarray:
        if self.mode == "char":
            from ..functions.hashing import fnv1a64 as _f

            grams = char_ngrams(text)
            if not grams:
                return np.empty(0, dtype=np.uint64)
            return np.unique(
                np.fromiter((_f(g.encode()) for g in grams), dtype=np.uint64, count=len(grams))
            )
        return shingles(text, self.mh.shingle_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.mh.signature_from_hashes(self._element_hashes(t))
            for band_id, h in enumerate(self.mh.band_hashes(sig, self.num_bands)):
                out_doc.append(d)
                out_band.append(band_id)
                out_hash.append(h - (1 << 63))  # to signed int64
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )


def minhash_candidates(sf_dir: str, concurrency=(2, 16), mode: str = "word"):
    """documents → (band_id, band_hash) buckets → unique candidate pairs.

    Two-phase bucket join: (1) a NATIVE count aggregate finds buckets with
    ≥2 members — near-dup buckets are rare, so this hot set is small and is
    broadcast; (2) pair generation runs only on rows in hot buckets. This
    avoids `map_groups` over millions of singleton groups (measured 3×+
    faster) and is the scale path: phase-1 shuffle moves (key, count)
    partials, phase-2 touches only the near-dup fraction of the data."""
    import ray
    from ray.data.aggregate import Count

    bands = (
        _read_docs(sf_dir)
        .repartition(32)  # single-file read fan-out (see corpus.read_pages note)
        .map_batches(
            MinHashBander,
            fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=concurrency,
        )
    )
    # sketch once, reuse twice (count pass + pair pass): the band table is
    # 3 int columns — tiny next to the documents — so pinning it is safe
    bands = bands.materialize()

    counts = bands.groupby(["band_id", "band_hash"]).aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t.column("n"), 2)).select(
            ["band_id", "band_hash"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if len(hot) == 0:
        return None
    hot_ref = ray.put(set(zip(hot.band_id, hot.band_hash)))

    def in_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        bid = t.column("band_id").to_pylist()
        bh = t.column("band_hash").to_pylist()
        mask = pa.array([(a, b) in keys for a, b in zip(bid, bh)], type=pa.bool_())
        return t.filter(mask)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    hot_rows = bands.map_batches(in_hot, batch_format="pyarrow")
    return hot_rows.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")


def minhash_near_dup(sf_dir: str, threshold: float = 0.6):
    """Candidate pairs (deduped across bands) verified by exact shingle
    Jaccard. The verify stage broadcasts nothing: it re-reads only candidate
    docs' texts via a broadcast id→text map built from the (small) candidate
    id set — at larger scale this becomes a semi-join read of the candidate
    partition files."""
    import pyarrow.parquet as pq
    import ray

    cand_ds = minhash_candidates(sf_dir)
    cand = cand_ds.to_pandas().drop_duplicates() if cand_ds is not None else pd.DataFrame()
    if len(cand) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "jaccard_r": pd.Series([], dtype=np.float64),
            }
        )
    need = set(cand.doc_a) | set(cand.doc_b)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    id2text = {
        d: t
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
        if d in need
    }
    texts_ref = ray.put(id2text)
    import ray.data as rd

    cand_ds = rd.from_pandas(cand)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(texts_ref)
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        jac = [
            jaccard(set(shingles(m[x]).tolist()), set(shingles(m[y]).tolist()))
            for x, y in zip(a, b)
        ]
        t = pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "jaccard_r": pa.array(np.round(jac, 6)),
            }
        )
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("jaccard_r"), threshold))

    return cand_ds.map_batches(verify, batch_format="pyarrow")


def connected_components(
    pairs_ds,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_rounds: int = 15,
    driver_threshold: int = 100_000,
):
    """Distributed connected components over near-dup pairs by iterative
    min-label propagation (ray_guide dedup section): each round every node
    takes the minimum label among itself and its neighbours, via two groupby
    shuffles — no driver-side graph, no broadcast; converges in O(component
    diameter) rounds (near-dup components are shallow in practice).

    Returns (node, component) where component = min node id in the component.
    The round primitive: union(label rows, edge rows) → groupby(key) emits
    (neighbour, my_label) messages → groupby(node).min picks new labels.

    Below ``driver_threshold`` edges the candidate set is provably small
    (near-dup pairs are a vanishing fraction of the corpus) and a driver-side
    union-find is used instead — the ray_guide's stated crossover. The
    distributed rounds are the scale path and are covered by tests with
    ``driver_threshold=0``.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    pairs = pairs_ds.to_pandas() if not isinstance(pairs_ds, pd.DataFrame) else pairs_ds
    if len(pairs) <= driver_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a_, b_ in zip(pairs[col_a], pairs[col_b]):
            ra, rb = find(int(a_)), find(int(b_))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted((n, find(n)) for n in parent)
        return rd.from_pandas(
            pd.DataFrame(rows, columns=["node", "component"]).astype(np.int64)
        )
    # build the symmetric edge list once (small: one row per near-dup pair)
    a = pairs[col_a].to_numpy()
    b = pairs[col_b].to_numpy()
    edges_pd = pd.DataFrame(
        {"key": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
    ).drop_duplicates()
    nodes = np.unique(edges_pd["key"].to_numpy())
    labels = rd.from_pandas(pd.DataFrame({"node": nodes, "label": nodes}))
    if len(nodes) == 0:
        return labels
    edges = rd.from_pandas(edges_pd)

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        key = int(g["key"].iloc[0])
        label = int(g.loc[g["dst"].isna(), "label"].min())  # the node's label row
        dsts = g.loc[g["dst"].notna(), "dst"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "node": np.concatenate([np.array([key], dtype=np.int64), dsts]),
                "label": np.int64(label),
            }
        )

    prev_sum = None
    for _ in range(max_rounds):
        tagged_labels = labels.map_batches(
            lambda t: t.rename_columns(["key", "label"]).append_column(
                "dst", pa.nulls(t.num_rows, pa.float64())
            ),
            batch_format="pyarrow",
        )
        tagged_edges = edges.map_batches(
            lambda t: pa.table(
                {
                    "key": t.column("key"),
                    "label": pa.nulls(t.num_rows, pa.int64()),
                    "dst": pa.compute.cast(t.column("dst"), pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        msgs = tagged_labels.union(tagged_edges).groupby("key").map_groups(
            propagate, batch_format="pandas"
        )
        labels = msgs.groupby("node").aggregate(Min("label", alias_name="label"))
        s = int(labels.to_pandas()["label"].sum())  # tiny: one row per node
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def connected_components_star(pairs_ds, col_a: str = "doc_a", col_b: str = "doc_b", max_rounds: int = 30):
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds regardless of component diameter, the
    scale path for large-diameter graphs that min-label propagation
    (O(diameter) rounds) handles poorly.

    large-star(u): for every neighbour v > u, re-attach v to
    m = min(Γ(u) ∪ {u}).  small-star(u): over edges oriented to the larger
    endpoint, re-attach all smaller neighbours (and u) to the minimum.
    Fixpoint = a star forest: every edge (child, root). Implemented as one
    groupby shuffle per phase over the symmetric edge list.
    """
    import ray.data as rd

    pairs = pairs_ds.to_pandas() if not isinstance(pairs_ds, pd.DataFrame) else pairs_ds
    a = pairs[col_a].to_numpy(dtype=np.int64)
    b = pairs[col_b].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    edges = rd.from_pandas(
        pd.DataFrame({"u": np.concatenate([a, b]), "v": np.concatenate([b, a])}).drop_duplicates()
    )

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy(dtype=np.int64)
        m = min(int(nbrs.min()), u)
        bigger = nbrs[nbrs > u]
        return pd.DataFrame({"u": bigger, "v": np.int64(m)})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy(dtype=np.int64)  # all ≤ u by orientation
        m = int(nbrs.min())
        members = np.unique(np.concatenate([nbrs, [u]]))
        out = members[members != m]
        return pd.DataFrame({"u": out, "v": np.int64(m)})

    prev_sig = None
    for _ in range(max_rounds):
        # large-star over the symmetric view
        sym = edges.map_batches(
            lambda t: pa.concat_tables(
                [t, pa.table({"u": t.column("v"), "v": t.column("u")})]
            ),
            batch_format="pyarrow",
        )
        edges = (
            sym.groupby("u").map_groups(large_star, batch_format="pandas")
            .groupby(["u", "v"]).count().drop_columns(["count()"])
        )
        # small-star over edges oriented toward the larger endpoint
        oriented = edges.map_batches(
            lambda t: pa.table(
                {
                    "u": pa.compute.max_element_wise(t.column("u"), t.column("v")),
                    "v": pa.compute.min_element_wise(t.column("u"), t.column("v")),
                }
            ),
            batch_format="pyarrow",
        )
        edges = (
            oriented.groupby("u").map_groups(small_star, batch_format="pandas")
            .groupby(["u", "v"]).count().drop_columns(["count()"])
        )
        df = edges.to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
        sig = hash(tuple(map(tuple, df.to_numpy())))
        if sig == prev_sig:
            break
        prev_sig = sig
        import ray.data as rd2

        edges = rd2.from_pandas(df)

    final = edges.to_pandas()
    label = {int(u): int(v) for u, v in zip(final.u, final.v)}
    comp = [label.get(int(n), int(n)) for n in nodes]
    import ray.data as rd3

    return rd3.from_pandas(
        pd.DataFrame({"node": nodes, "component": np.asarray(comp, dtype=np.int64)})
    )


def dup_components(sf_dir: str, threshold: float = 0.4):
    """Near-dup clusters over the embedding pairs: exact pair generation →
    distributed min-label components. Rows-only (recursive closure is not
    single-query SQL)."""
    from .similarity import embedding_dup_exact

    pairs = embedding_dup_exact(sf_dir, threshold=threshold)
    return connected_components(pairs.to_pandas(), col_a="vec_a", col_b="vec_b")


def simhash_fingerprints(sf_dir: str):
    """64-bit SimHash per document (as hex string — int64-overflow-safe)."""
    ds = _read_docs(sf_dir)

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(
                    [f"{simhash64(t):016x}" for t in batch.column("text").to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_groups(sf_dir: str):
    """Exact-SimHash duplicate buckets: fingerprint → groupby → groups with
    >1 member (near-dup at Hamming distance 0; banding over 16-bit chunks
    would extend to distance ≤3 at scale)."""
    from ray.data.aggregate import Count, Min

    return (
        simhash_fingerprints(sf_dir)
        .groupby("simhash")
        .aggregate(Count(alias_name="n_docs"), Min("doc_id", alias_name="rep_doc"))
        .filter(lambda row: row["n_docs"] > 1)
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.9, max_candidates: int = 500_000):
    """Char-trigram Jaccard near-dup: banded MinHash over trigram hashes as
    the blocking key (a single min-gram bucket degenerates on small
    vocabularies — most documents share the minimum trigram — measured
    O(n²) in one bucket), then exact trigram-set Jaccard on the candidate
    pairs. Returns (doc_a, doc_b, jaccard_r).

    NOTE on this synthetic corpus: the ~31-word vocabulary makes trigram
    sets uniformly similar across unrelated documents, so LSH cannot
    separate candidates the way it does on natural text. Candidate volume
    is therefore bounded by ``max_candidates`` (deterministic: lowest
    (doc_a, doc_b) first) and the drop is LOGGED, never silent."""
    import logging

    import pyarrow.compute as pc2
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cand_ds = minhash_candidates(sf_dir, mode="char")
    cand = cand_ds.to_pandas().drop_duplicates() if cand_ds is not None else pd.DataFrame()
    if len(cand) > max_candidates:
        logging.getLogger(__name__).warning(
            "ngram_jaccard_pairs: %d candidate pairs exceed max_candidates=%d; "
            "verifying the first %d by (doc_a, doc_b) — results are a bounded "
            "subset on this corpus",
            len(cand), max_candidates, max_candidates,
        )
        cand = cand.sort_values(["doc_a", "doc_b"]).head(max_candidates)
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "jaccard_r": pd.Series([], dtype=np.float64),
        }
    )
    if len(cand) == 0:
        return empty
    need = set(cand.doc_a) | set(cand.doc_b)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    id2text = {
        d: t
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
        if d in need
    }
    texts_ref = ray.put(id2text)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(texts_ref)
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        jac = [jaccard(char_ngrams(m[x]), char_ngrams(m[y])) for x, y in zip(a, b)]
        t = pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "jaccard_r": pa.array(np.round(jac, 6)),
            }
        )
        return t.filter(pc2.greater_equal(t.column("jaccard_r"), threshold))

    return rd.from_pandas(cand).map_batches(verify, batch_format="pyarrow")
