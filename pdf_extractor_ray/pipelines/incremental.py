"""Incremental ingest against a SHARED MUTABLE INDEX — the one shape in this
engine that genuinely needs raw Ray actors instead of Dataset ops.

Scenario (the reference's incremental re-run semantics — skip work already
ingested — done as a service instead of a filesystem ledger; see
``state/lineage.py`` for the batch-resume variant): a dedup index that
OUTLIVES a single pipeline run. Yesterday's corpus ("day 1") was ingested
into the index; today's stream ("day 2") must drop everything already seen
— without re-reading yesterday's data. A pure Dataset expression of this is
a union + groupby over BOTH days every run; the index service makes the
incremental run touch only the new data.

Design rules that keep it deterministic and scale-safe:

- The index is SHARDED by sha-hash across ``n_shards`` actors — no single
  bottleneck actor; each ``map_batches`` task groups its batch's digests by
  shard and makes ONE call per (batch, shard), so actor round-trips are
  per-batch, not per-row, and only fixed-width digests/ids travel (never
  text).
- Mutation is order-independent: day-2 offers record the MIN doc_id per new
  sha, so the winner set is a pure function of the data regardless of
  block arrival order (the streaming executor guarantees no ordering).
- The final emit is a semi-join of the day-2 stream against the winner ID
  set, broadcast once via ``ray.put`` (ids only — the survivor count is
  bounded by day-2's distinct new docs; above the documented ~1e7-id
  crossover, swap the broadcast for the bucket co-group semi-join used by
  ``dedup._verify_pairs_cogrouped``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_hex
from .relational import _read

N_SHARDS = 8


def _make_shard_cls():
    import ray

    @ray.remote(num_cpus=0.25)
    class ShaIndexShard:
        """One shard of the persistent dedup index: a set of known digests
        (prior ingests) plus, per offer round, the min doc_id seen for each
        NEW digest."""

        def __init__(self) -> None:
            self.known: set[bytes] = set()
            self.pending: dict[bytes, int] = {}

        def ingest(self, shas: list[bytes]) -> int:
            self.known.update(shas)
            return len(self.known)

        def offer(self, shas: list[bytes], doc_ids: list[int]) -> int:
            """Record min doc_id per digest not already known. Min-merge is
            commutative — arrival order cannot change the outcome."""
            n_new = 0
            for s, i in zip(shas, doc_ids):
                if s in self.known:
                    continue
                prev = self.pending.get(s)
                if prev is None:
                    self.pending[s] = i
                    n_new += 1
                elif i < prev:
                    self.pending[s] = i
            return n_new

        def winner_ids(self) -> list[int]:
            return sorted(self.pending.values())

    return ShaIndexShard


def _shard_of(shas: list[bytes], n_shards: int) -> np.ndarray:
    # first digest byte is uniform — cheap shard router
    return np.frombuffer(bytes(s[0] for s in shas), dtype=np.uint8) % n_shards


def incremental_ingest_dedup(sf_dir: str, n_shards: int = N_SHARDS):
    """Two-day incremental dedup: index day 1 (doc_id % 3 != 0), then stream
    day 2 (doc_id % 3 == 0) against the live index, keeping each new text's
    min-doc_id representative. Returns the day-2 survivors
    (doc_id, source, n_chars)."""
    import ray

    cls = _make_shard_cls()
    shards = [cls.remote() for _ in range(n_shards)]

    def _digest_batch(t: pa.Table) -> tuple[list[bytes], np.ndarray]:
        shas = [bytes.fromhex(sha256_hex(v)) for v in t.column("text").to_pylist()]
        return shas, _shard_of(shas, n_shards)

    def ingest_day1(t: pa.Table) -> pa.Table:
        shas, sh = _digest_batch(t)
        calls = []
        for k in range(n_shards):
            idx = np.flatnonzero(sh == k)
            if len(idx):
                calls.append(shards[k].ingest.remote([shas[i] for i in idx]))
        ray.get(calls)
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    def offer_day2(t: pa.Table) -> pa.Table:
        shas, sh = _digest_batch(t)
        ids = t.column("doc_id").to_pylist()
        calls = []
        for k in range(n_shards):
            idx = np.flatnonzero(sh == k)
            if len(idx):
                calls.append(
                    shards[k].offer.remote([shas[i] for i in idx], [ids[i] for i in idx])
                )
        ray.get(calls)
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])

    def day_filter(day2: bool):
        def f(t: pa.Table) -> pa.Table:
            # no pc.mod in this pyarrow (NOTES): x % 3 == x - (x // 3) * 3
            rem = pc.subtract(
                t.column("doc_id"), pc.multiply(pc.divide(t.column("doc_id"), 3), 3)
            )
            keep = pc.equal(rem, 0) if day2 else pc.not_equal(rem, 0)
            return t.filter(keep)

        return f

    try:
        # pass 1: ingest day 1 into the index (consume the stream fully —
        # the count() barrier is what makes the index "yesterday's state")
        docs.map_batches(day_filter(False), batch_format="pyarrow", zero_copy_batch=True).map_batches(
            ingest_day1, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).sum("n")

        # pass 2: stream day 2 against the live index
        day2 = docs.map_batches(day_filter(True), batch_format="pyarrow", zero_copy_batch=True)
        day2.map_batches(
            offer_day2, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).sum("n")

        # winner ids: one small list per shard
        wins = np.array(
            sorted(i for ws in ray.get([s.winner_ids.remote() for s in shards]) for i in ws),
            dtype=np.int64,
        )
    finally:
        for s in shards:
            ray.kill(s)

    ids_ref = ray.put(wins)

    def keep_winners(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        keep = pc.is_in(t.column("doc_id"), value_set=pa.array(ids, type=pa.int64()))
        return t.filter(keep).select(["doc_id", "source", "n_chars"])

    return day2.map_batches(keep_winners, batch_format="pyarrow", zero_copy_batch=True)
