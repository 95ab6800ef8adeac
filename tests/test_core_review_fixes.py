"""Regression tests for the core-surface review findings (round 4):
null-safe key comparators, NULL-aware split, catalog CAS vs prune,
empty multi-get, datom-layer fixes."""

import json
import os

import pytest
from pyspark.sql import functions as F

from index_spark.catalog import commit, prune, read_latest
from index_spark.errors import CommitConflictError
from index_spark.index import SortedIndex
from index_spark.keys import key_eq, key_gt, key_lt


@pytest.fixture(scope="module")
def nullable_idx(spark):
    """Datom-shaped index: exactly one of (v_text, v_num) is NULL per row —
    the shape DatomStore builds, where EVERY key tuple contains a NULL."""
    rows = [
        ("e1", "a1", "x", None, 1),
        ("e1", "a1", "x", None, 7),
        ("e1", "a1", None, 2.0, 3),
        ("e1", "a1", None, 5.0, 4),
        ("e2", "a1", "y", None, 2),
        ("e2", "a2", None, 1.0, 9),
        ("e3", "a1", "x", None, 5),
    ]
    df = spark.createDataFrame(
        rows, "e string, a string, v_text string, v_num double, t long"
    )
    return SortedIndex(df, ["e", "a", "v_text", "v_num", "t"])


def test_pages_cover_all_rows_with_null_key_columns(nullable_idx):
    """A page boundary landing on a NULL-bearing key must not drop the
    later rows sharing that prefix (key_gt's equality legs were
    null-unsafe, excluding them from every subsequent page)."""
    total = nullable_idx.count()
    seen = []
    for page in nullable_idx.pages(2):
        seen.extend((r.e, r.a, r.v_text, r.v_num, r.t) for r in page)
    assert len(seen) == total
    assert len(set(seen)) == total


def test_pages_reverse_with_nulls(nullable_idx):
    total = nullable_idx.count()
    seen = []
    for page in nullable_idx.pages(3, reverse=True):
        seen.extend((r.e, r.a, r.v_text, r.v_num, r.t) for r in page)
    assert len(seen) == total and len(set(seen)) == total


def test_key_eq_matches_null_components(nullable_idx):
    got = nullable_idx.get(("e1", "a1", None, 2.0, 3))
    assert got.count() == 1
    assert got.collect()[0].t == 3


def test_null_sorts_first_total_order(nullable_idx):
    """key_gt/key_lt and the sort order must agree: NULL is the smallest
    value. gt past a NULL bound includes all non-null values; lt below a
    non-null bound includes NULLs."""
    # within prefix (e1, a1): v_text order is NULL < 'x'
    after_null = nullable_idx.gt(("e1", "a1", None), prefix=("e1", "a1"))
    assert {r.v_text for r in after_null.collect()} == {"x"}
    below_x = nullable_idx.lt(("e1", "a1", "x"), prefix=("e1", "a1"))
    assert {r.v_text for r in below_x.collect()} == {None}


def test_split_handles_null_mixed_keys(nullable_idx):
    """sorted() over sampled tuples with None/str/float mixed used to raise
    TypeError; boundary ties through a NULL column landed in neither half."""
    left, right = nullable_idx.split(sample_size=1000)
    nl, nr = left.count(), right.count()
    assert nl + nr == nullable_idx.count()
    assert nl > 0 and nr > 0
    # disjoint: no tuple appears in both halves
    both = left.df.intersect(right.df)
    assert both.count() == 0


def test_get_all_empty_request_composite_key(spark):
    df = spark.createDataFrame([(1, "a", 10)], "k1 long, k2 string, v long")
    idx = SortedIndex(df, ["k1", "k2"])
    assert idx.get_all([]).count() == 0
    assert idx.get_all([], must_find_all=True).count() == 0


def test_catalog_stale_writer_after_prune_conflicts(tmp_base):
    """A writer whose expected stamp fell below the pruned range must get
    CommitConflictError — not a silently-invisible gap-filling commit."""
    for i in range(6):
        commit(tmp_base, "cat", {"v": i}, i if i else None)
    prune(tmp_base, "cat", keep_latest=2)
    with pytest.raises(CommitConflictError):
        commit(tmp_base, "cat", {"v": "stale"}, 2)  # v3 was pruned away
    obj, stamp = read_latest(tmp_base, "cat")
    assert stamp == 6 and obj == {"v": 5}


def test_catalog_commit_failure_leaves_no_tmp(tmp_base):
    with pytest.raises(TypeError):
        commit(tmp_base, "cat2", {"bad": object()}, None)  # not JSON-serializable
    leftovers = [e for e in os.listdir(tmp_base) if e.endswith(".tmp")]
    assert leftovers == []
    assert read_latest(tmp_base, "cat2") is None


def test_catalog_first_commit_after_full_history_exists(tmp_base):
    """expected=None while a catalog exists must conflict, even when v1
    itself was pruned (the link target would be a stale gap)."""
    commit(tmp_base, "cat3", {"v": 0}, None)
    commit(tmp_base, "cat3", {"v": 1}, 1)
    prune(tmp_base, "cat3", keep_latest=1)  # v1 gone
    with pytest.raises(CommitConflictError):
        commit(tmp_base, "cat3", {"v": "younger"}, None)


def test_datoms_from_table_requires_attrs(spark):
    from index_spark.datoms import datoms_from_table

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no attributes"):
        datoms_from_table(df, "thing", "id")


def test_numeric_avet_lookup_reads_avet_layout(spark, tmp_base):
    """After materialize(), the numeric attribute-value lookup must scan the
    attribute-clustered AVET dataset, not the entity-clustered EAVT copy."""
    from index_spark.datoms import DatomStore, datoms_from_table

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i % 5)) for i in range(100)],
        "id long, name string, score double",
    )
    datoms = datoms_from_table(
        df, "thing", "id", text_attrs=["name"], num_attrs=["score"]
    )
    store = DatomStore(datoms).materialize(tmp_base + "/dstore", rows_per_partition=25)
    got = store.entities_by_attr_value("thing/score", 2.0, is_num=True)
    files = got.inputFiles()
    assert files and all("/avet/" in f for f in files)
    assert got.count() == 20
