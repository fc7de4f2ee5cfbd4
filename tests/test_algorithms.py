"""Algorithm tests (mirror of reference StableBloomFilterTest.scala and the
HLL relative-error contract)."""

from __future__ import annotations

import numpy as np

from flinkrunner_spark.algorithms.hll import estimate, update_registers
from flinkrunner_spark.algorithms.sbf import StableBloomFilter


def test_hll_relative_error():
    b = 12
    m = 1 << b
    M = np.zeros(m, dtype=np.int8)
    n = 20_000
    update_registers(M, (f"item-{i}" for i in range(n)), b)
    est = estimate(M)
    rel_err = 1.04 / (m**0.5)  # HyperLogLog.scala relativeError
    assert abs(est - n) / n < 3 * rel_err


def test_hll_merge_equals_union():
    b = 10
    m = 1 << b
    M1 = np.zeros(m, dtype=np.int8)
    M2 = np.zeros(m, dtype=np.int8)
    Mall = np.zeros(m, dtype=np.int8)
    a = [f"a{i}" for i in range(5000)]
    bb = [f"b{i}" for i in range(5000)]
    update_registers(M1, a, b)
    update_registers(M2, bb, b)
    update_registers(Mall, a + bb, b)
    merged = np.maximum(M1, M2)
    assert estimate(merged) == estimate(Mall)


def test_sbf_detects_duplicates():
    sbf = StableBloomFilter(m=100_000, d=3, fpr=0.01)
    assert sbf.add("x") is False  # first sighting
    assert sbf.add("x") is True  # duplicate detected


def test_sbf_no_false_negatives_recent_window():
    sbf = StableBloomFilter(m=1_000_000, d=3, fpr=0.01)
    items = [f"k{i}" for i in range(2000)]
    for it in items:
        sbf.add(it)
    # recent items must still be present (stability property)
    recent = items[-500:]
    assert all(sbf.might_contain(it) for it in recent)


def test_sbf_bounded_false_positive_rate():
    sbf = StableBloomFilter(m=1_000_000, d=3, fpr=0.01)
    for i in range(5000):
        sbf.add(f"seen{i}")
    fp = sum(sbf.might_contain(f"unseen{i}") for i in range(5000))
    assert fp / 5000 < 0.05


def test_sbf_merge():
    a = StableBloomFilter(m=10_000, d=3, fpr=0.01)
    b = StableBloomFilter(m=10_000, d=3, fpr=0.01)
    a.add("only-a")
    b.add("only-b")
    a.merge(b)
    assert a.might_contain("only-a") and a.might_contain("only-b")


def test_emb_dup_pairs_blas_matches_fold(spark):
    """The BLAS gram-matrix path must find the same near-dup pair set as
    the oracle-exact expression fold."""
    from flinkrunner_spark.llm.similarity import emb_dup_pairs, emb_dup_pairs_blas

    sf = "/root/testdata/sf0.01"
    fold = {
        (r["vec_a"], r["vec_b"]) for r in emb_dup_pairs(spark, sf).collect()
    }
    blas = {
        (r["vec_a"], r["vec_b"])
        for r in emb_dup_pairs_blas(spark, sf).collect()
    }
    assert fold == blas and len(fold) > 0
