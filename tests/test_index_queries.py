"""SortedIndex query surface vs a plain-Python sorted model.

Mirrors the reference's differential-testing strategy (SURVEY.md §5:
QueriesRandomSpec compares every query against slices of a sorted in-memory
model computed with the same comparators)."""

import random

import pytest
from pyspark.sql import functions as F

from index_spark.index import SortedIndex

SEED = 42


@pytest.fixture(scope="module")
def model(orders):
    rows = orders.select("o_orderkey", "o_totalprice").collect()
    return sorted([(r.o_orderkey, r.o_totalprice) for r in rows])


@pytest.fixture(scope="module")
def idx(orders):
    return SortedIndex(orders, ["o_orderkey"])


def keys_of(df):
    return [r.o_orderkey for r in df.select("o_orderkey").collect()]


def test_in_order_matches_model(idx, model):
    assert keys_of(idx.in_order()) == [k for k, _ in model]


def test_reverse(idx, model):
    assert keys_of(idx.in_order(reverse=True)) == [k for k, _ in reversed(model)]


def test_get_point(idx, model):
    k = model[len(model) // 2][0]
    got = idx.get(k).collect()
    assert len(got) == 1 and got[0].o_orderkey == k


def test_get_missing(idx, model):
    missing = max(k for k, _ in model) + 1
    assert idx.get(missing).count() == 0


def test_get_all_semi_join(idx, model):
    rng = random.Random(SEED)
    want = sorted(rng.sample([k for k, _ in model], 17))
    got = keys_of(idx.get_all(want))
    assert got == want


def test_get_all_must_find_all_raises(idx, model):
    from index_spark.errors import KeyNotFoundError

    missing = max(k for k, _ in model) + 7
    with pytest.raises(KeyNotFoundError) as ei:
        idx.get_all([model[0][0], missing], must_find_all=True)
    assert missing in ei.value.keys


def test_gt_inclusive_exclusive(idx, model):
    ks = [k for k, _ in model]
    term = ks[len(ks) // 3]
    assert keys_of(idx.gt(term)) == [k for k in ks if k > term]
    assert keys_of(idx.gt(term, inclusive=True)) == [k for k in ks if k >= term]


def test_lt_reverse(idx, model):
    ks = [k for k, _ in model]
    term = ks[2 * len(ks) // 3]
    expect = [k for k in ks if k <= term][::-1]
    assert keys_of(idx.lt(term, inclusive=True, reverse=True)) == expect


def test_range_all_inclusivities(idx, model):
    ks = [k for k, _ in model]
    lo, hi = ks[len(ks) // 4], ks[3 * len(ks) // 4]
    for fi in (True, False):
        for ti in (True, False):
            expect = [
                k
                for k in ks
                if (k >= lo if fi else k > lo) and (k <= hi if ti else k < hi)
            ]
            assert keys_of(idx.range(lo, hi, fi, ti)) == expect


def test_head_tail_min_max(idx, model):
    ks = [k for k, _ in model]
    assert keys_of(idx.head(3)) == ks[:3]
    assert keys_of(idx.tail(3)) == ks[-1:-4:-1]
    assert keys_of(idx.min()) == [ks[0]]
    assert keys_of(idx.max()) == [ks[-1]]


def test_previous_next_key_absent_term(idx, model):
    ks = [k for k, _ in model]
    # pick a term that does not exist (between two present keys if possible)
    term = ks[10] + 1 if ks[10] + 1 not in set(ks) else ks[10]
    prev = [k for k in ks if k < term]
    nxt = [k for k in ks if k > term]
    assert keys_of(idx.previous_key(term)) == ([prev[-1]] if prev else [])
    assert keys_of(idx.next_key(term)) == ([nxt[0]] if nxt else [])


def test_limit_topk(idx, model):
    ks = [k for k, _ in model]
    assert keys_of(idx.in_order(reverse=True, limit=5)) == ks[-1:-6:-1]


def test_residual_filter(idx, model):
    flt = idx.where(F.col("o_totalprice") > 100000.0)
    expect = sorted(k for k, p in model if p > 100000.0)
    assert keys_of(flt.in_order()) == expect


def test_split_merge_roundtrip(idx, model):
    ks = [k for k, _ in model]
    left, right = idx.split()
    lk, rk = keys_of(left.in_order()), keys_of(right.in_order())
    assert lk + rk == ks  # disjoint, ordered, complete
    assert lk and rk  # both non-empty (balanced-ish split)
    merged = left.merge(right)
    assert keys_of(merged.in_order()) == ks


class TestCompositeKeys:
    """lineitem keyed by (l_orderkey, l_linenumber) — F2-style prefix+term."""

    @pytest.fixture(scope="class")
    def cidx(self, lineitem):
        return SortedIndex(lineitem, ["l_orderkey", "l_linenumber"])

    @pytest.fixture(scope="class")
    def cmodel(self, lineitem):
        rows = lineitem.select("l_orderkey", "l_linenumber").collect()
        return sorted((r.l_orderkey, r.l_linenumber) for r in rows)

    @staticmethod
    def pairs(df):
        return [(r.l_orderkey, r.l_linenumber) for r in df.select("l_orderkey", "l_linenumber").collect()]

    def test_prefix_scan(self, cidx, cmodel):
        ok = cmodel[len(cmodel) // 2][0]
        expect = [t for t in cmodel if t[0] == ok]
        assert self.pairs(cidx.prefix(ok)) == expect

    def test_prefix_reverse(self, cidx, cmodel):
        ok = cmodel[len(cmodel) // 2][0]
        expect = [t for t in cmodel if t[0] == ok][::-1]
        assert self.pairs(cidx.prefix(ok, reverse=True)) == expect

    def test_prefix_bounded_gt(self, cidx, cmodel):
        ok = cmodel[len(cmodel) // 3][0]
        expect = [t for t in cmodel if t[0] == ok and t > (ok, 2)]
        assert self.pairs(cidx.gt((ok, 2), prefix=ok)) == expect

    def test_prefix_bounded_lt_inclusive(self, cidx, cmodel):
        ok = cmodel[len(cmodel) // 3][0]
        expect = [t for t in cmodel if t[0] == ok and t <= (ok, 3)]
        assert self.pairs(cidx.lt((ok, 3), inclusive=True, prefix=ok)) == expect

    def test_partial_term_gt(self, cidx, cmodel):
        """A term over only the first key column (reference custom termComp)."""
        ok = cmodel[len(cmodel) // 2][0]
        expect = [t for t in cmodel if t[0] > ok]
        assert self.pairs(cidx.gt(ok)) == expect

    def test_composite_range(self, cidx, cmodel):
        lo = cmodel[len(cmodel) // 4]
        hi = cmodel[3 * len(cmodel) // 4]
        expect = [t for t in cmodel if lo <= t < hi]
        assert self.pairs(cidx.range(lo, hi, True, False)) == expect

    def test_composite_get(self, cidx, cmodel):
        t = cmodel[7]
        got = self.pairs(cidx.get(t))
        assert got == [t]

    def test_composite_get_all(self, cidx, cmodel):
        # (l_orderkey, l_linenumber) is not unique in the fixture: get_all
        # must return every row whose key matches (multi-get is a semi-join,
        # not a row sample).
        rng = random.Random(SEED)
        want_keys = set(rng.sample(cmodel, 9))
        expect = [t for t in cmodel if t in want_keys]
        assert self.pairs(cidx.get_all(sorted(want_keys))) == expect


def test_custom_comparator_as_computed_key(spark):
    """Reference per-query comparators (termComp/prefixComp differing from
    the build ordering — QueriesRandomSpec.scala:257-263 suffix comparator)
    map to SortedIndex over computed key columns: here querying by the
    SUFFIX (last 4 chars) of a string key, and by a reversed composite."""
    from pyspark.sql import functions as F

    from index_spark.index import SortedIndex

    rows = [(f"{p}{s:04d}",) for p in ("aa", "bb", "cc") for s in range(20)]
    df = spark.createDataFrame(rows, "key string")

    # suffix comparator: order/query by the last 4 chars
    with_suffix = df.withColumn("suffix", F.substring("key", -4, 4))
    idx = SortedIndex(with_suffix, ["suffix"])
    got = [r.key for r in idx.prefix("0007").collect()]
    assert sorted(got) == ["aa0007", "bb0007", "cc0007"]
    rng = [r.suffix for r in idx.range("0003", "0005").select("suffix").collect()]
    assert rng == sorted(rng) and set(rng) == {"0003", "0004", "0005"}

    # reversed-composite comparator: same rows, opposite column order
    df2 = spark.createDataFrame([(1, 10), (1, 20), (2, 10), (2, 20)], "a int, b int")
    by_ba = SortedIndex(df2, ["b", "a"])
    assert [tuple(r) for r in by_ba.in_order().select("b", "a").collect()] == [
        (10, 1), (10, 2), (20, 1), (20, 2)
    ]


def test_get_all_large_request_shuffle_path(spark, sf_dir):
    """Past GET_ALL_BROADCAST_LIMIT the multi-get must switch to a shuffle
    semi-join (request as data) and still return exactly the sorted hits;
    must_find_all still raises on the missing keys."""
    from index_spark.errors import KeyNotFoundError
    from index_spark.index import SortedIndex
    from index_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    idx = SortedIndex(orders, ["o_orderkey"])
    old = SortedIndex.GET_ALL_BROADCAST_LIMIT
    SortedIndex.GET_ALL_BROADCAST_LIMIT = 50  # force the large-request path
    try:
        req = list(range(1, 200)) + [-7, 10**12]  # hits plus definite misses
        got = [r.o_orderkey for r in idx.get_all(req).select("o_orderkey").collect()]
        want = sorted(
            r.o_orderkey
            for r in orders.filter(F.col("o_orderkey").isin(req)).collect()
        )
        assert got == want and len(got) > 0
        import pytest as _pt

        with _pt.raises(KeyNotFoundError):
            idx.get_all(req, must_find_all=True)  # -7 and 1e12 are absent
        # all-present request passes
        assert idx.get_all(want, must_find_all=True).count() == len(want)
    finally:
        SortedIndex.GET_ALL_BROADCAST_LIMIT = old


def test_pages_seek_pagination(spark, sf_dir):
    """pages() must stream the exact in_order sequence in page_size chunks,
    forward and reverse, resuming from the last key of each page."""
    from index_spark.index import SortedIndex
    from index_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    idx = SortedIndex(orders, ["o_orderkey"])
    want = [r.o_orderkey for r in idx.in_order().select("o_orderkey").collect()]

    got, sizes = [], []
    for rows in idx.pages(40):
        got += [r.o_orderkey for r in rows]
        sizes.append(len(rows))
    assert got == want
    assert all(s == 40 for s in sizes[:-1]) and 0 < sizes[-1] <= 40

    rev = []
    for rows in idx.pages(64, reverse=True):
        rev += [r.o_orderkey for r in rows]
    assert rev == want[::-1]


def test_pages_duplicate_keys_with_tiebreaker(spark, sf_dir):
    """Non-unique seek key: a page boundary inside a tie group would skip
    the remaining tied rows; passing tiebreaker= (here the unique line
    number) restores exactly-once delivery."""
    from index_spark.index import SortedIndex
    from index_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    idx = SortedIndex(orders, ["o_custkey"])  # duplicate keys: many orders/cust
    want = sorted(
        (r.o_custkey, r.o_orderkey)
        for r in orders.select("o_custkey", "o_orderkey").collect()
    )
    got = []
    # page size 7 deliberately lands boundaries inside custkey tie groups
    for rows in idx.pages(7, tiebreaker="o_orderkey"):
        got += [(r.o_custkey, r.o_orderkey) for r in rows]
    assert got == want  # nothing skipped, nothing repeated, in order


def test_pages_edge_cases(spark):
    """page_size 1, exact page-boundary totals, and empty input — the
    off-by-one traps of seek resume."""
    from index_spark.index import SortedIndex

    df = spark.createDataFrame([(i,) for i in range(6)], "k long")
    idx = SortedIndex(df, ["k"])
    # page_size 1: six pages, exact sequence
    assert [r.k for rows in idx.pages(1) for r in rows] == list(range(6))
    # total is an exact multiple of page_size: no phantom empty page fetch
    pages = list(idx.pages(3))
    assert [len(p) for p in pages] == [3, 3]
    # empty input: zero pages from both protocols
    empty = SortedIndex(df.filter("k < 0"), ["k"])
    assert list(empty.pages(10)) == []
    assert list(empty.pages_df(10)) == []
    # all-identical keys: tiebreaker makes every row reachable
    dup = spark.createDataFrame([(1, i) for i in range(5)], "k long, r long")
    got = [
        (row.k, row.r)
        for rows in SortedIndex(dup, ["k"]).pages(2, tiebreaker="r")
        for row in rows
    ]
    assert got == [(1, i) for i in range(5)]


def test_pages_df_distributed_pagination(spark, sf_dir):
    """pages_df() yields DataFrames (not collected rows): same sequence as
    pages(), and each non-first page's plan carries the pushed seek bound
    so already-read ranges are pruned at the scan."""
    from index_spark.index import SortedIndex
    from index_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    idx = SortedIndex(orders, ["o_orderkey"])
    want = [r.o_orderkey for r in idx.in_order().select("o_orderkey").collect()]

    got, n_pages = [], 0
    for page in idx.pages_df(40):
        assert hasattr(page, "collect")  # a DataFrame, not a row list
        if n_pages == 1:  # second page must seek past the first
            plan = page._jdf.queryExecution().executedPlan().toString()
            assert "o_orderkey" in plan
        got += [r.o_orderkey for r in page.collect()]
        n_pages += 1
    assert got == want and n_pages == len(want) // 40 + (1 if len(want) % 40 else 0)

    rev = []
    for page in idx.pages_df(64, reverse=True):
        rev += [r.o_orderkey for r in page.collect()]
    assert rev == want[::-1]
