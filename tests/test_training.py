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
