"""Hash kernels: deterministic row hashes, bucket ids, rolling fingerprints.

- ``row_sha256``: the reference's `transaction_hash = sha256(date|amount|
  description|account)` dedup key (/root/reference/dataextractai/parsers/
  normalize_api.py:21-33), generalized to any column tuple.
- ``hash_bucket``: the engine's explicit url-hash partitioning key (Knuth
  multiplicative hash — pure int64 arithmetic so the DuckDB oracle can
  reproduce it exactly).
- ``rolling_fingerprint``: polynomial rolling hash over tokens (document
  fingerprinting for the training-data ops).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FNV_PRIME = 1099511628211
FNV_OFFSET = 14695981039346656037
MERSENNE61 = (1 << 61) - 1
KNUTH = 2654435761


def sha256_hex(value: str) -> str:
    return hashlib.sha256(value.encode("utf-8")).hexdigest()


def row_sha256(batch: pa.Table, columns: list[str], sep: str = "|") -> pa.Array:
    """sha256 over '|'-joined stringified columns. The join is vectorized
    (Arrow); the digest itself is per-row by nature (like the reference).
    A null in any column makes the joined row null → the hash is null (SQL
    sha256(NULL) semantics), never a crashed task."""
    cols = [pc.cast(batch.column(c), pa.string()) for c in columns]
    joined = pc.binary_join_element_wise(*cols, sep)
    return pa.array(
        [sha256_hex(v) if v is not None else None for v in joined.to_pylist()],
        type=pa.string(),
    )


def hash_bucket(col, num_buckets: int) -> pa.Array:
    """(key * 2654435761) % num_buckets — SQL-reproducible int arithmetic.

    numpy int64 is exact for keys < 2^32 (product < 2^63); beyond that the
    bucket fn should switch to a 128-bit-safe formulation like DuckDB's."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(((v * KNUTH) % num_buckets).astype(np.int32))


def fnv1a64(data: bytes) -> int:
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes (fnv1a — no PYTHONHASHSEED dependence)."""
    return np.fromiter(
        (fnv1a64(t.encode("utf-8")) for t in tokens), dtype=np.uint64, count=len(tokens)
    )


def rolling_fingerprint(text: str, base: int = 1_000_003) -> int:
    """Polynomial rolling hash of the token stream mod 2^61−1: a stable whole-
    document fingerprint (order-sensitive, unlike a bag-of-words hash)."""
    h = 0
    for tok in text.split():
        th = fnv1a64(tok.encode("utf-8")) % MERSENNE61
        h = (h * base + th) % MERSENNE61
    return h
