"""Similarity sketches: shingling, MinHash (+LSH banding), SimHash.

Deterministic, dependency-free (numpy only), PYTHONHASHSEED-independent
(fnv1a token hashing). Designed for the Ray-Data dedup pattern
(ray_guide: shingle+minhash per batch → explode (band_id, band_hash, doc_id)
→ groupby(band) → candidate pairs → verify Jaccard).

MinHash uses the standard universal-hash family h_i(x) = (a_i·x + b_i) mod p
with FIXED seeded parameters (derived from splitmix64 of the permutation
index), so sketches are identical across workers and runs.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import fnv1a64

MERSENNE31 = (1 << 31) - 1  # hash universe: a·x+b with a,x,b < 2^31 fits uint64


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array — bit-identical to
    ``_splitmix64`` per element (identity-tested)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.array(
        [(_splitmix64(2 * i + 1) % (MERSENNE31 - 1)) + 1 for i in range(num_perm)],
        dtype=np.uint64,
    )
    b = np.array(
        [_splitmix64(2 * i + 2) % MERSENNE31 for i in range(num_perm)], dtype=np.uint64
    )
    return a, b


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hashes (uint64), deduplicated."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((fnv1a64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams))
    )


def char_ngrams(text: str, n: int = 3) -> set[str]:
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def fnv1a64_batch(data: list[bytes]) -> np.ndarray:
    """Vectorized fnv1a64 over a ragged list of byte strings — bit-identical
    to ``hashing.fnv1a64`` per element. FNV is sequential per BYTE but
    independent per STRING, so the loop runs over byte POSITIONS (≤ max
    length) with all strings advanced at once; strings are processed in
    descending-length order so the active set is a prefix slice."""
    from .hashing import FNV_OFFSET, FNV_PRIME

    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    flat = np.frombuffer(b"".join(data[i] for i in order), dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum(lens_s[:-1])]) if n > 1 else np.array([0])
    h = np.full(n, np.uint64(FNV_OFFSET), dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    maxlen = int(lens_s[0])
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            # active strings are exactly those with len > j — a prefix
            cnt = int(np.searchsorted(-lens_s, -(j + 1), side="right"))
            idx = off[:cnt] + j
            h[:cnt] = (h[:cnt] ^ flat[idx].astype(np.uint64)) * prime
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def _unique_per_segment(hashes: np.ndarray, seg_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate values WITHIN each segment, fully vectorized: lexsort by
    (segment, value), drop adjacent repeats, return (concat sorted-unique
    values, counts per segment). Matches np.unique per segment."""
    n_segs = int(seg_ids.max()) + 1 if len(seg_ids) else 0
    order = np.lexsort((hashes, seg_ids))
    hs, ss = hashes[order], seg_ids[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    hs, ss = hs[keep], ss[keep]
    counts = np.bincount(ss, minlength=n_segs).astype(np.int64)
    return hs, counts


def _segment_hashes(grams: list[bytes], seg: list[int], n_texts: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared tail of the batch gram-hash builders: hash, per-segment dedup,
    pad trailing empty docs, cumsum offsets. ONE implementation so the
    word/char paths cannot silently diverge (the trailing-empty-doc padding
    already bit this code once)."""
    if not grams:
        return np.empty(0, dtype=np.uint64), np.zeros(n_texts + 1, dtype=np.int64)
    hashes = fnv1a64_batch(grams)
    seg_ids = np.asarray(seg, dtype=np.int64)
    uniq, counts = _unique_per_segment(hashes, seg_ids)
    if len(counts) < n_texts:  # trailing empty docs
        counts = np.concatenate([counts, np.zeros(n_texts - len(counts), dtype=np.int64)])
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return uniq, offsets


def doc_shingle_hashes_batch(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch word-shingle hashing: per-doc UNIQUE shingle hashes
    (sorted, same as ``shingles``) concatenated, plus offsets (n_docs+1).
    The gram-string build stays Python (string work); the byte hashing and
    per-doc dedup are vectorized."""
    grams: list[bytes] = []
    seg: list[int] = []
    for d, text in enumerate(texts):
        toks = text.split()
        if len(toks) < k:
            g = [" ".join(toks)] if toks else []
        else:
            g = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        grams.extend(s.encode() for s in g)
        seg.extend([d] * len(g))
    return _segment_hashes(grams, seg, len(texts))


def char_ngram_hashes_batch(texts: list[str], n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch char-trigram hashing (the n-gram-Jaccard blocking key):
    same contract as ``doc_shingle_hashes_batch``."""
    grams: list[bytes] = []
    seg: list[int] = []
    for d, text in enumerate(texts):
        if not text:
            continue
        gs = [text] if len(text) < n else [text[i : i + n] for i in range(len(text) - n + 1)]
        # set() first: duplicates collapse before hashing (identical result,
        # less hash work on repetitive text)
        uniq_gs = set(gs)
        grams.extend(s.encode() for s in uniq_gs)
        seg.extend([d] * len(uniq_gs))
    return _segment_hashes(grams, seg, len(texts))


class MinHasher:
    """num_perm minhash values per document; state (the hash family) is built
    once — use as actor state or module-level singleton."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = minhash_params(num_perm)

    def signature_from_hashes(self, sh: np.ndarray) -> np.ndarray:
        """Signature over an arbitrary uint64 element-hash set (word shingles,
        char n-grams, …)."""
        if sh.size == 0:
            return np.full(self.num_perm, np.uint64(MERSENNE31), dtype=np.uint64)
        x = (sh % np.uint64(MERSENNE31))[None, :]  # (1, n_elems), < 2^31
        # (num_perm, n_elems): a·x+b < 2^62 — exact in uint64
        vals = (self.a[:, None] * x + self.b[:, None]) % np.uint64(MERSENNE31)
        return vals.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        return self.signature_from_hashes(shingles(text, self.shingle_k))

    def band_hashes(self, sig: np.ndarray, num_bands: int) -> list[int]:
        """LSH banding: hash each band of rows to one bucket key."""
        rows = self.num_perm // num_bands
        out = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            h = fnv1a64(chunk.tobytes())
            out.append(h)
        return out

    #: max element-hash rows per universal-hash matrix chunk (ADVICE r2:
    #: the unchunked (N, num_perm) intermediate is num_perm·8 bytes per
    #: shingle — unbounded peak RSS with batch_size=None on large blocks).
    #: 2^18 rows × 64 perms × 8 B = 128 MB per worker, bounded.
    CHUNK_ROWS = 1 << 18

    def signatures_from_concat(self, concat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) signatures over the concatenated per-doc
        element hashes: the universal-hash matrix is built in bounded
        ``CHUNK_ROWS`` slices, each reduced by ``np.minimum.reduceat`` at
        the (clipped) doc offsets and folded into the running per-doc min —
        min is associative, so the result is BIT-equal to the one-pass form
        and to ``signature_from_hashes`` per doc (empty docs → sentinel
        row), pinned by test_batch_kernels_match_scalar."""
        n_docs = len(offsets) - 1
        sigs = np.full((n_docs, self.num_perm), np.uint64(MERSENNE31), dtype=np.uint64)
        if concat.size == 0:
            return sigs
        offsets = np.asarray(offsets, dtype=np.int64)
        for start in range(0, concat.size, self.CHUNK_ROWS):
            end = min(start + self.CHUNK_ROWS, concat.size)
            x = (concat[start:end] % np.uint64(MERSENNE31))[:, None]  # (chunk, 1)
            vals = (x * self.a[None, :] + self.b[None, :]) % np.uint64(MERSENNE31)
            # docs overlapping [start, end): clip their boundaries into the
            # chunk; reduceat over NON-EMPTY clipped segments only (empty
            # segments have start == end — clipping starts instead silently
            # corrupts the last non-empty doc when trailing docs are empty)
            lo = int(np.searchsorted(offsets, start, side="right")) - 1
            hi = int(np.searchsorted(offsets, end, side="left"))
            local = np.clip(offsets[lo : hi + 1], start, end) - start
            nonempty = np.flatnonzero(np.diff(local) > 0)
            if nonempty.size == 0:
                continue
            part = np.minimum.reduceat(vals, local[:-1][nonempty], axis=0)
            idx = lo + nonempty
            sigs[idx] = np.minimum(sigs[idx], part)
        return sigs

    def band_hashes_batch(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(n_docs, num_bands) LSH bucket keys, vectorized: each band's
        fixed-width byte chunk is FNV-hashed with the byte loop running over
        the (rows·8) positions, all docs at once. Bit-equal to
        ``band_hashes`` per doc (chunk.tobytes() is little-endian uint64)."""
        from .hashing import FNV_OFFSET, FNV_PRIME

        n_docs = sigs.shape[0]
        rows = self.num_perm // num_bands
        out = np.empty((n_docs, num_bands), dtype=np.uint64)
        prime = np.uint64(FNV_PRIME)
        with np.errstate(over="ignore"):
            for band in range(num_bands):
                chunk = np.ascontiguousarray(sigs[:, band * rows : (band + 1) * rows])
                bts = chunk.astype("<u8").view(np.uint8).reshape(n_docs, rows * 8)
                h = np.full(n_docs, np.uint64(FNV_OFFSET), dtype=np.uint64)
                for j in range(rows * 8):
                    h = (h ^ bts[:, j].astype(np.uint64)) * prime
                out[:, band] = h
        return out


class HyperLogLog:
    """Mergeable approximate-distinct sketch (standard HLL, 2^p registers).

    The Ray-Data shape (ray_guide "Aggregation at scale"): each batch emits
    ONE serialized sketch; a tiny second stage merges them — registers
    combine by elementwise max, so the estimate is order- and
    partitioning-independent. Deterministic hashing via fnv1a64."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_hash(self, h: int) -> None:
        idx = h >> (64 - self.p)
        # rank = position of the leftmost 1-bit in the remaining 64-p bits
        w = h & ((1 << (64 - self.p)) - 1)
        rank = (64 - self.p) - w.bit_length() + 1 if w else (64 - self.p) + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add(self, value: str) -> None:
        # splitmix64 finalizer: fnv1a's high bits avalanche poorly on short
        # keys, which starves the register index (top-p bits)
        self.add_hash(_splitmix64(fnv1a64(value.encode("utf-8"))))

    def add_batch(self, values: list[str]) -> None:
        """Vectorized add: ragged batch FNV + splitmix finalize + one
        unbuffered register max — bit-identical to per-value ``add``
        (identity-tested). The rank uses frexp's exponent, which equals
        bit_length exactly for integers < 2^53, so this path requires
        64 - p <= 53 (p >= 11); smaller p falls back to the scalar loop."""
        if not values:
            return
        if 64 - self.p > 53:
            for v in values:
                self.add(v)
            return
        h = splitmix64_vec(fnv1a64_batch([v.encode("utf-8") for v in values]))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        exp = np.frexp(w.astype(np.float64))[1]
        rank = np.where(w == 0, 64 - self.p + 1, 64 - self.p - exp + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * self.m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = self.m * math.log(self.m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unweighted)."""
    toks = text.split()
    if not toks:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = fnv1a64(t.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized bit count over a uint64 array (the batch form of
    ``hamming64``'s popcount): bytes → unpackbits → per-word sum."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(x.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1).astype(np.int64)


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Whole-batch SimHash (bit-identical to ``simhash64`` per doc): all
    tokens hashed with the ragged batch FNV, expanded to a ±1 bit matrix,
    summed per doc with ``np.add.reduceat``, sign → 64-bit fingerprint."""
    toks: list[bytes] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for d, t in enumerate(texts):
        tt = t.split()
        toks.extend(s.encode() for s in tt)
        counts[d] = len(tt)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not toks:
        return out
    h = fnv1a64_batch(toks)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    pm = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2) - 1  # (N, 64) ±1
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    # reduceat over non-empty segments only (see signatures_from_concat:
    # clipped starts corrupt the last non-empty doc's sum)
    sums = np.zeros((len(texts), 64), dtype=np.int64)
    nonempty = np.flatnonzero(counts > 0)
    sums[nonempty] = np.add.reduceat(pm, offsets[:-1][nonempty], axis=0)
    bits = (sums > 0).astype(np.uint64)
    out = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return out
