"""Probabilistic membership structures for the seen-set fast path.

The reference's seen set is an exact in-memory Python set
(``Crawler/crawler.py:78,556-559``). At 10^10 URLs the exact set lives in a
distributed table and the anti-join against it is the scheduling round's
dominant shuffle — these structures cut that cost WITHOUT changing results:

- ``BloomFilter64``: built by partial-aggregation over the seen table's hashes
  (numpy bitmap per partition, OR-reduced on the driver), broadcast to
  executors. Candidates the bloom rejects are *definitely new* and bypass the
  anti-join; possible members still go through the exact anti-join, so false
  positives cost time, never correctness (SURVEY.md §5.3 contract).
- ``CuckooFilter``: per-partition membership with deletion support, used as a
  local first-occurrence combiner before the dedup shuffle. Same contract:
  accelerator only, exactness guaranteed by an exact fallback.

Both operate on signed-int64 hashes (Spark ``xxhash64`` output) as numpy arrays
— no per-row Python.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche on uint64 numpy arrays (vectorized)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX1
    x ^= x >> np.uint64(33)
    x *= _MIX2
    x ^= x >> np.uint64(33)
    return x


class BloomFilter64:
    """Bitmap bloom filter over int64 hashes; k derived index functions via
    double hashing (h1 + i*h2). Sized for ~1% fp at the given capacity."""

    def __init__(self, capacity: int, bits_per_key: float = 10.0, k: int = 4):
        n_bits = max(1024, int(capacity * bits_per_key))
        # round up to a power of two so masking replaces modulo
        self.n_bits = 1 << int(np.ceil(np.log2(n_bits)))
        self.k = k
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions for each hash."""
        u = hashes.astype(np.int64).view(np.uint64)
        h1 = _mix64(u)
        h2 = _mix64(u ^ _MIX2) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)
        pos = (h1[:, None] + ks[None, :] * h2[:, None]) & np.uint64(self.n_bits - 1)
        return pos

    def add(self, hashes: np.ndarray) -> None:
        pos = self._positions(np.asarray(hashes, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: False ⇒ definitely not present."""
        pos = self._positions(np.asarray(hashes, dtype=np.int64))
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return bit.all(axis=1)

    def merge(self, other: "BloomFilter64") -> None:
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int) -> "BloomFilter64":
        f = cls.__new__(cls)
        f.bits = np.frombuffer(data, dtype=np.uint8).copy()
        f.n_bits = f.bits.size * 8
        f.k = k
        return f


class CuckooFilter:
    """Bucketized cuckoo filter over int64 hashes (4 slots × 16-bit fingerprints).

    Supports add / contains / delete. ``add`` returns False when an insert
    fails after max kicks — callers must then fall back to an exact structure,
    which keeps the overall dedup exact (the filter is an accelerator, not an
    authority; north_star: per-partition cuckoo-filter URL-seen set).
    """

    SLOTS = 4

    def __init__(self, capacity: int, max_kicks: int = 500, seed: int = 7):
        n_buckets = max(8, int(capacity / self.SLOTS * 1.3))
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        self.max_kicks = max_kicks
        self._rng = np.random.default_rng(seed)
        self.size = 0

    def _fp_and_index(self, h: int) -> tuple[int, int]:
        u = _mix64(np.array([h], dtype=np.int64).view(np.uint64))[0]
        fp = int(u & np.uint64(0xFFFF)) or 1  # fingerprint 0 = empty slot
        i1 = int((u >> np.uint64(16)) & np.uint64(self.n_buckets - 1))
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        u = _mix64(np.array([fp], dtype=np.int64).view(np.uint64))[0]
        return (i ^ int(u)) & (self.n_buckets - 1)

    def add(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        for i in (i1, self._alt_index(i1, fp)):
            empty = np.flatnonzero(self.table[i] == 0)
            if empty.size:
                self.table[i, empty[0]] = fp
                self.size += 1
                return True
        i = i1
        for _ in range(self.max_kicks):
            s = int(self._rng.integers(self.SLOTS))
            fp, self.table[i, s] = int(self.table[i, s]), fp
            i = self._alt_index(i, fp)
            empty = np.flatnonzero(self.table[i] == 0)
            if empty.size:
                self.table[i, empty[0]] = fp
                self.size += 1
                return True
        return False  # full — caller must use exact fallback

    def contains(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i2] == fp).any())

    def add_many(self, hashes: np.ndarray) -> np.ndarray:
        """Bulk insert; returns a boolean array — False entries did NOT fit
        and must be tracked exactly by the caller."""
        return np.array([self.add(int(h)) for h in np.asarray(hashes)], dtype=bool)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (the hot path: candidate filtering).
        False ⇒ definitely not present."""
        hs = np.asarray(hashes, dtype=np.int64)
        if hs.size == 0:
            return np.zeros(0, dtype=bool)
        u = _mix64(hs.view(np.uint64))
        fp = (u & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = ((u >> np.uint64(16)) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        # same bit pattern as the scalar _alt_index (int64 view == uint64 cast
        # for 16-bit fingerprints)
        alt = _mix64(fp.astype(np.uint64))
        i2 = (i1 ^ alt.astype(np.int64)) & (self.n_buckets - 1)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        for i in (i1, self._alt_index(i1, fp)):
            hit = np.flatnonzero(self.table[i] == fp)
            if hit.size:
                self.table[i, hit[0]] = 0
                self.size -= 1
                return True
        return False


def build_bloom_from_partitions(partition_bitmaps: list[bytes], capacity: int, k: int = 4) -> BloomFilter64:
    """OR-reduce per-partition bloom bitmaps (driver side of the 2-phase build)."""
    out: BloomFilter64 | None = None
    for b in partition_bitmaps:
        f = BloomFilter64.from_bytes(b, k)
        if out is None:
            out = f
        else:
            out.merge(f)
    if out is None:
        out = BloomFilter64(capacity, k=k)
    return out
