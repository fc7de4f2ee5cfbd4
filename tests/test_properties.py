"""Property-based tests (hypothesis) — the analog of the reference's
scalacheck generators (util/test/FlinkRunnerSpec, model/*Spec property
tests): algebraic invariants that must hold for ALL inputs, not just the
fixtures.

These are pure-python/numpy properties (codecs, sketch algorithms, the
EMA recurrence) — no SparkSession, so hypothesis can run hundreds of
cases in seconds.
"""

from __future__ import annotations

import math
import uuid

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flinkrunner_spark.algorithms.hll import estimate, update_registers
from flinkrunner_spark.algorithms.sbf import StableBloomFilter
from flinkrunner_spark.util.ids import (
    d64_decode,
    d64_encode,
    id64_from_uuid,
    id64_to_uuid,
)


@given(st.binary(min_size=0, max_size=64))
def test_d64_roundtrip(data):
    assert d64_decode(d64_encode(data)) == data


uuid_v1s = st.builds(
    lambda tl, tm, th, csh, csl, node: uuid.UUID(
        fields=(tl, tm, th, csh, csl, node), version=1
    ),
    st.integers(0, 2**32 - 1),
    st.integers(0, 2**16 - 1),
    st.integers(0, 2**12 - 1),
    st.integers(0, 2**8 - 1),
    st.integers(0, 2**8 - 1),
    st.integers(0, 2**48 - 1),
)


@given(uuid_v1s)
def test_id64_roundtrip(u):
    assert id64_to_uuid(id64_from_uuid(u)) == u


@given(uuid_v1s)
def test_id64_is_22_alphabet_chars(u):
    from flinkrunner_spark.util.ids import _ALPHABET

    s = id64_from_uuid(u)
    assert len(s) == 22
    assert all(c in _ALPHABET for c in s)


@given(uuid_v1s, uuid_v1s)
def test_id64_sorts_by_timestamp(u1, u2):
    """The byte shuffle puts the v1 high timestamp bytes first and the
    alphabet is sorted, so encoded ids must sort like their timestamps
    (Id64.scala's creation-time-sortable property)."""
    t1, t2 = u1.time, u2.time
    s1, s2 = id64_from_uuid(u1), id64_from_uuid(u2)
    if t1 < t2:
        assert s1 < s2
    elif t1 > t2:
        assert s1 > s2


@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_sbf_no_false_negatives_within_batch(items):
    """Anything just inserted must still test positive immediately after
    (the decrement never clears a cell set by the same insert)."""
    sbf = StableBloomFilter(10_000, 3, 0.01, seed=1)
    for it in items:
        sbf.add(it)
        assert sbf.might_contain(it)


@given(
    st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=100),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_sbf_batch_equals_scalar_sequence(items, seed):
    """add_batch(items) must flag exactly what a scalar add loop flags,
    given the same RNG consumption (batched draws == sequential draws for
    numpy Generator.integers)."""
    a = StableBloomFilter(10_000, 3, 0.01, seed=seed)
    b = StableBloomFilter(10_000, 3, 0.01, seed=seed)
    got = b.add_batch(items)
    want = np.array([a.add(it) for it in items])
    assert (got == want).all()
    assert (a.cells == b.cells).all()


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500))
@settings(max_examples=30, deadline=None)
def test_hll_merge_associative_and_bounded(values):
    """Merging per-partition registers (elementwise max) must equal
    single-pass registers; the estimate must be within the HLL error
    bound of the true cardinality."""
    b = 12
    m = 1 << b
    whole = np.zeros(m, dtype=np.uint8)
    update_registers(whole, [str(v) for v in values], b)

    half = len(values) // 2
    p1 = np.zeros(m, dtype=np.uint8)
    p2 = np.zeros(m, dtype=np.uint8)
    update_registers(p1, [str(v) for v in values[:half]], b)
    update_registers(p2, [str(v) for v in values[half:]], b)
    merged = np.maximum(p1, p2)
    assert (merged == whole).all()

    true_n = len(set(values))
    est = estimate(whole)
    # 1.04/sqrt(m) standard error; allow 6 sigma plus small-n slack
    tol = max(6 * 1.04 / math.sqrt(m) * true_n, 3)
    assert abs(est - true_n) <= tol


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=100,
    )
)
def test_ema_fold_is_convex_combination(values):
    """The EMA fold used by the plans (list_reduce seeded with the first
    element, acc' = 0.3*acc + 0.7*x — ExponentialMovingAverage.scala's
    recurrence with alpha=0.7) is a convex combination of the inputs, so
    it must stay within [min, max] of the values (up to fp rounding)."""
    acc = values[0]
    for x in values[1:]:
        acc = acc * 0.3 + x * 0.7
    lo, hi = min(values), max(values)
    eps = 1e-9 * max(1.0, abs(lo), abs(hi))
    assert lo - eps <= acc <= hi + eps


# --- connected components vs union-find reference --------------------------

def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        ra, rb = find(u), find(v)
        if ra != rb:
            parent[ra] = rb
    # canonical label: min node id in each component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from flinkrunner_spark.operators.graph import connected_components

    nodes = sorted({n for e in edges for n in e} | {99})  # always ≥1 isolate
    edges = [e for e in edges if e[0] != e[1]]
    e_df = (
        spark.createDataFrame(edges, "src int, dst int")
        if edges
        else spark.createDataFrame([], "src int, dst int")
    )
    n_df = spark.createDataFrame([(n,) for n in nodes], "id int")
    got = {
        r["id"]: r["component"]
        for r in connected_components(e_df, n_df).collect()
    }
    assert got == _uf_components(edges, nodes)


# -- kafka wire codec (util/kafka) -------------------------------------------


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_kafka_varint_roundtrip_any_int(v):
    from flinkrunner_spark.util.kafka import dec_varint, enc_varint

    buf = enc_varint(v)
    got, pos = dec_varint(buf, 0)
    assert got == v and pos == len(buf)


@given(st.binary(min_size=0, max_size=256))
def test_crc32c_matches_bytewise_incremental(data):
    from flinkrunner_spark.util.kafka import crc32c

    acc = 0
    for b in data:
        acc = crc32c(bytes([b]), acc)
    assert acc == crc32c(data)


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.binary(max_size=64)),  # key
            st.one_of(st.none(), st.binary(max_size=256)),  # value
            st.lists(
                st.tuples(
                    st.text(
                        alphabet=st.characters(
                            min_codepoint=32, max_codepoint=0x10FFFF,
                            exclude_categories=("Cs",),
                        ),
                        max_size=16,
                    ),
                    st.one_of(st.none(), st.binary(max_size=32)),
                ),
                max_size=4,
            ),
            st.integers(min_value=0, max_value=2**40),  # timestamp
        ),
        min_size=1,
        max_size=32,
    ),
    st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=60, deadline=None)
def test_kafka_record_batch_roundtrip_any_records(recs, base_offset):
    from flinkrunner_spark.util.kafka import (
        KafkaRecord,
        decode_record_batches,
        encode_record_batch,
    )

    records = [
        KafkaRecord(value=v, key=k, headers=list(h), timestamp_ms=ts)
        for k, v, h, ts in recs
    ]
    out = decode_record_batches(encode_record_batch(records, base_offset))
    assert len(out) == len(records)
    for i, (orig, got) in enumerate(zip(records, out)):
        assert got.key == orig.key
        assert got.value == orig.value
        assert got.headers == orig.headers
        assert got.timestamp_ms == orig.timestamp_ms
        assert got.offset == base_offset + i


@given(st.binary(min_size=1, max_size=64), st.integers(2, 64))
def test_kafka_partitioner_in_range(key, n):
    from flinkrunner_spark.util.kafka import partition_for_key

    assert 0 <= partition_for_key(key, n) < n


# -- cql literal rendering (util/cql + loopback parser) ----------------------


@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False),  # NaN breaks == roundtrip; pinned below
        st.binary(max_size=64),
        st.text(max_size=64),
    )
)
def test_cql_literal_parse_roundtrip(v):
    from flinkrunner_spark.testing import _parse_cql_literal
    from flinkrunner_spark.util.cql import cql_literal

    # booleans render before ints (bool is an int subclass) — mirror
    # the renderer's dispatch when comparing
    lit = cql_literal(v)
    # the loopback parser sees the literal exactly as the batch splitter
    # hands it over
    got = _parse_cql_literal(lit)
    if isinstance(v, float) and v in (float("inf"), float("-inf")):
        assert got == v
    elif isinstance(v, float):
        assert got == v or (got == int(v) and float(got) == v)
    elif isinstance(v, bytes):
        assert got == v
    else:
        assert got == v


def test_cql_literal_nonfinite_spellings():
    from flinkrunner_spark.testing import _parse_cql_literal
    from flinkrunner_spark.util.cql import cql_literal

    assert cql_literal(float("inf")) == "Infinity"
    assert cql_literal(float("-inf")) == "-Infinity"
    assert cql_literal(float("nan")) == "NaN"
    assert _parse_cql_literal("Infinity") == float("inf")
    assert _parse_cql_literal("-Infinity") == float("-inf")
    got = _parse_cql_literal("NaN")
    assert got != got  # NaN
