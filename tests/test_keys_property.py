"""Property tests: the composite-key predicate expressions must agree with
Python tuple comparison for every operator, term length, and inclusivity —
the algebra every seek/range/prefix in SortedIndex compiles to
(reference custom comparators, QueryableIndex.scala:167,335-368)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from index_spark.keys import key_between, key_eq, key_gt, key_lt

COLS = ["a", "b", "c"]
DOM_INT = [0, 1, 2, 3]
DOM_STR = ["p", "q", "r"]


@pytest.fixture(scope="module")
def keyspace(spark):
    rows = [(a, b, c) for a in DOM_INT for b in DOM_INT for c in DOM_STR]
    df = spark.createDataFrame(rows, "a int, b int, c string")
    return df, rows


term_st = st.tuples(
    st.sampled_from(DOM_INT + [-1, 4]),  # include out-of-domain values
    st.sampled_from(DOM_INT + [-1, 4]),
    st.sampled_from(DOM_STR + ["a", "z"]),
).map(tuple)

len_st = st.integers(min_value=1, max_value=3)


def _py_cmp(row, term):
    """Python lexicographic comparison over the leading len(term) fields."""
    return tuple(row[: len(term)]), tuple(term)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(term=term_st, n=len_st, inclusive=st.booleans(), op=st.sampled_from(["gt", "lt", "eq"]))
def test_predicates_match_tuple_compare(keyspace, term, n, inclusive, op):
    df, rows = keyspace
    t = term[:n]
    if op == "gt":
        cond, keep = key_gt(COLS, t, inclusive), (
            lambda r: (_py_cmp(r, t)[0] > t) or (inclusive and _py_cmp(r, t)[0] == t)
        )
    elif op == "lt":
        cond, keep = key_lt(COLS, t, inclusive), (
            lambda r: (_py_cmp(r, t)[0] < t) or (inclusive and _py_cmp(r, t)[0] == t)
        )
    else:
        cond, keep = key_eq(COLS, t), (lambda r: _py_cmp(r, t)[0] == t)
    got = sorted(map(tuple, df.filter(cond).collect()))
    want = sorted(r for r in rows if keep(r))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lo=term_st, hi=term_st, n=len_st, lo_inc=st.booleans(), hi_inc=st.booleans()
)
def test_range_matches_tuple_compare(keyspace, lo, hi, n, lo_inc, hi_inc):
    df, rows = keyspace
    lo_t, hi_t = lo[:n], hi[:n]
    cond = key_between(COLS, lo_t, hi_t, lo_inc, hi_inc)

    def keep(r):
        p = tuple(r[:n])
        above = p > lo_t or (lo_inc and p == lo_t)
        below = p < hi_t or (hi_inc and p == hi_t)
        return above and below

    got = sorted(map(tuple, df.filter(cond).collect()))
    want = sorted(r for r in rows if keep(r))
    assert got == want


# ---- null-bearing keyspace: the comparators define ONE total order with
# NULL smallest (matching asc-nulls-first), and pagination over it must be
# a partition of the rows (datom-shaped indexes carry NULLs in every key)

NDOM_INT = [None, 0, 1, 2]
NDOM_STR = [None, "p", "q"]


def _null_rank(v):
    return (v is not None, v)


def _py_null_cmp_tuple(t):
    return tuple(_null_rank(v) for v in t)


@pytest.fixture(scope="module")
def null_keyspace(spark):
    rows = [(a, b) for a in NDOM_INT for b in NDOM_STR]
    df = spark.createDataFrame(rows, "a int, b string")
    return df, rows


nterm_st = st.tuples(
    st.sampled_from(NDOM_INT + [3]),
    st.sampled_from(NDOM_STR + ["z"]),
).map(tuple)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(term=nterm_st, n=st.integers(min_value=1, max_value=2),
       inclusive=st.booleans(), op=st.sampled_from(["gt", "lt", "eq"]))
def test_null_safe_comparators_match_python_total_order(
    null_keyspace, term, n, inclusive, op
):
    df, rows = null_keyspace
    t = term[:n]
    cols = ["a", "b"][:len(t)]
    if op == "eq":
        pred = key_eq(["a", "b"], t)
        want = {r for r in rows if tuple(_null_rank(v) for v in r[:n]) == _py_null_cmp_tuple(t)}
    elif op == "gt":
        pred = key_gt(["a", "b"], t, inclusive)
        want = {
            r for r in rows
            if (_py_null_cmp_tuple(r[:n]) > _py_null_cmp_tuple(t))
            or (inclusive and _py_null_cmp_tuple(r[:n]) == _py_null_cmp_tuple(t))
        }
    else:
        pred = key_lt(["a", "b"], t, inclusive)
        want = {
            r for r in rows
            if (_py_null_cmp_tuple(r[:n]) < _py_null_cmp_tuple(t))
            or (inclusive and _py_null_cmp_tuple(r[:n]) == _py_null_cmp_tuple(t))
        }
    got = {tuple(r) for r in df.filter(pred).collect()}
    assert got == want, (t, inclusive, op)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(page_size=st.integers(min_value=1, max_value=5), reverse=st.booleans())
def test_pages_partition_null_keyspace(null_keyspace, page_size, reverse):
    """Seek pagination over a NULL-bearing keyspace yields every row exactly
    once, in the engine's total order."""
    from index_spark.index import SortedIndex

    df, rows = null_keyspace
    idx = SortedIndex(df, ["a", "b"])
    seen = []
    for page in idx.pages(page_size, reverse=reverse):
        seen.extend((r.a, r.b) for r in page)
    assert len(seen) == len(rows)
    assert set(seen) == set(rows)
    ordered = sorted(seen, key=_py_null_cmp_tuple, reverse=reverse)
    assert seen == ordered
