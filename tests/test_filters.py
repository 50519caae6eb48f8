"""Bloom / cuckoo filter data-structure tests (accelerators for the seen-set)."""

import numpy as np

from web_crawler_spark.functions.filters import BloomFilter64, CuckooFilter, build_bloom_from_partitions


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(42)
    members = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    f = BloomFilter64(capacity=len(members))
    f.add(members)
    assert f.might_contain(members).all()  # zero false negatives — correctness
    fp = f.might_contain(others).mean()
    assert fp < 0.03, fp  # ~1% design point


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(1)
    a = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    b = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    whole = BloomFilter64(capacity=10_000)
    whole.add(a)
    whole.add(b)
    fa = BloomFilter64(capacity=10_000)
    fa.add(a)
    fb = BloomFilter64(capacity=10_000)
    fb.add(b)
    merged = build_bloom_from_partitions([fa.to_bytes(), fb.to_bytes()], 10_000)
    assert np.array_equal(merged.bits, whole.bits)


def test_bloom_serialization_roundtrip():
    f = BloomFilter64(capacity=100)
    f.add(np.array([1, -5, 123456789], dtype=np.int64))
    g = BloomFilter64.from_bytes(f.to_bytes(), f.k)
    assert g.might_contain(np.array([1, -5, 123456789], dtype=np.int64)).all()


def test_cuckoo_add_contains_delete():
    c = CuckooFilter(capacity=5000)
    keys = list(range(-2000, 2000, 3))
    ok = all(c.add(k) for k in keys)
    assert ok
    assert all(c.contains(k) for k in keys)  # no false negatives while resident
    # delete support (the cuckoo advantage over bloom)
    for k in keys[:100]:
        assert c.delete(k)
    # deleted keys *may* still collide via other fingerprints but the common
    # case is gone; size bookkeeping is exact
    assert c.size == len(keys) - 100
    # false positive rate on disjoint keys is small
    probe = [10**9 + i for i in range(5000)]
    fp = sum(c.contains(k) for k in probe) / len(probe)
    assert fp < 0.05, fp


def test_cuckoo_overflow_reports_failure():
    c = CuckooFilter(capacity=64)
    inserted = 0
    failed = False
    for k in range(10_000):
        if c.add(k):
            inserted += 1
        else:
            failed = True
            break
    assert failed  # caller must fall back to exact structure — contract
    assert inserted > 50


def test_cuckoo_vectorized_matches_scalar():
    import numpy as np

    c = CuckooFilter(capacity=4096)
    keys = np.array([(i * 2654435761) % (2**63) - 2**62 for i in range(2000)], dtype=np.int64)
    ok = c.add_many(keys)
    assert ok.all()
    got = c.contains_many(keys)
    assert got.all()  # no false negatives, vectorized path
    probe = np.array([10**9 + i for i in range(4000)], dtype=np.int64)
    vec = c.contains_many(probe)
    scal = np.array([c.contains(int(k)) for k in probe])
    assert (vec == scal).all()  # bit-identical to the scalar path
