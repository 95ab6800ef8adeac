"""Opaque-bytes keys — the reference's canonical key type
(``Bytes = Array[Byte]`` with unsigned-lexicographic ordering,
``package.scala:39-42`` / Guava ``UnsignedBytes.lexicographicalComparator``).

Property: Spark ``BinaryType`` comparison under ``SortedIndex.gt/lt/range/
in_order`` must agree with Python ``bytes`` ordering, which IS unsigned
lexicographic. The domain deliberately includes the signedness traps: bytes
≥ 0x80 (negative as signed JVM bytes), the empty string, shared prefixes,
and 0x00 (would break NUL-terminated comparisons).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from index_spark.index import SortedIndex

BDOM = [
    b"",
    b"\x00",
    b"\x00\x00",
    b"\x00\x01",
    b"\x01",
    b"\x7f",
    b"\x7f\xff",
    b"\x80",          # signed JVM byte -128: must still sort AFTER 0x7f
    b"\x80\x00",
    b"\xfe",
    b"\xff",
    b"\xff\x00",
    b"\xff\xff",
    b"ab",
    b"abc",           # prefix pair: shorter sorts first
    b"b",
]


@pytest.fixture(scope="module")
def bin_index(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.BinaryType()),
            T.StructField("i", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([(k, i) for i, k in enumerate(BDOM)], schema)
    return SortedIndex(df, ["k"])


def _collected(df):
    return [bytes(r.k) for r in df.collect()]


def test_in_order_matches_unsigned_lex(bin_index):
    assert _collected(bin_index.in_order()) == sorted(BDOM)
    assert _collected(bin_index.in_order(reverse=True)) == sorted(BDOM, reverse=True)


term_st = st.one_of(
    st.sampled_from(BDOM),
    st.binary(min_size=0, max_size=3),
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(term=term_st, inclusive=st.booleans(), op=st.sampled_from(["gt", "lt"]))
def test_seeks_match_bytes_ordering(bin_index, term, inclusive, op):
    if op == "gt":
        got = _collected(bin_index.gt(term, inclusive=inclusive))
        want = sorted(k for k in BDOM if k > term or (inclusive and k == term))
    else:
        got = _collected(bin_index.lt(term, inclusive=inclusive))
        want = sorted(k for k in BDOM if k < term or (inclusive and k == term))
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(lo=term_st, hi=term_st, lo_inc=st.booleans(), hi_inc=st.booleans())
def test_range_matches_bytes_ordering(bin_index, lo, hi, lo_inc, hi_inc):
    got = _collected(bin_index.range(lo, hi, lo_inc, hi_inc))
    want = sorted(
        k
        for k in BDOM
        if (k > lo or (lo_inc and k == lo)) and (k < hi or (hi_inc and k == hi))
    )
    assert got == want


def test_previous_next_key_on_binary(bin_index):
    assert _collected(bin_index.previous_key(b"\x80")) == [b"\x7f\xff"]
    assert _collected(bin_index.next_key(b"\x7f\xff")) == [b"\x80"]
    # probe keys that do not exist still seek correctly
    assert _collected(bin_index.previous_key(b"\x81")) == [b"\x80\x00"]
