"""Round-3 batch-6 store verbs: predicate delete (retention sweeps) and
schema evolution under file-level COW."""

import pytest
from pyspark.sql import functions as F

from index_spark.errors import KeyNotFoundError
from index_spark.snapshots import SnapshotStore


def _mk(spark, tmp_base, rows, sub="s", rpp=100):
    df = spark.createDataFrame(rows, "k long, v double")
    store = SnapshotStore(spark, f"{tmp_base}/{sub}")
    return store, store.create(["k"], df=df, rows_per_partition=rpp)


# ------------------------------------------------------------ delete_where
def test_delete_where_removes_matching_rows(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(i, float(i)) for i in range(20)])
    v0 = store.latest_version()
    h2 = h.delete_where(F.col("v") >= 15.0, version="ttl")
    assert store.latest_version() == v0 + 1
    assert sorted(r.k for r in h2.df.select("k").collect()) == list(range(15))
    # history intact: the old version still reads in full
    assert store.at_version(v0).df.count() == 20


def test_delete_where_no_match_is_empty_commit(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(1, 1.0)], sub="s2")
    h2 = h.delete_where(F.col("v") > 100.0)
    assert h2.df.count() == 1


def test_delete_where_on_empty_store_raises(spark, tmp_base):
    store = SnapshotStore(spark, tmp_base + "/s3")
    h = store.create(["k"])
    with pytest.raises(KeyNotFoundError):
        h.delete_where(F.col("k") > 0)


# ------------------------------------------------------------ schema evolution
def test_upsert_batch_adding_column_evolves_schema(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(i, float(i)) for i in range(10)], sub="e1", rpp=3)
    batch = spark.createDataFrame([(2, 2.0, "vip"), (99, 99.0, "new")], "k long, v double, flag string")
    h2 = h.insert(batch, upsert=True, version="ev", allow_new_columns=True)
    rows = {r.k: (r.v, r.flag) for r in h2.df.select("k", "v", "flag").collect()}
    assert rows[2] == (2.0, "vip") and rows[99] == (99.0, "new")
    # carried old-schema rows read NULL in the added column
    assert rows[0] == (0.0, None) and len(rows) == 11
    # pre-evolution version is untouched and lacks the column
    assert "flag" not in store.at_version(0).df.columns


def test_mutations_after_evolution_keep_working(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(i, float(i)) for i in range(10)], sub="e2", rpp=3)
    h2 = h.insert(
        spark.createDataFrame([(3, 3.5, "x")], "k long, v double, flag string"),
        upsert=True,
        version="ev",
        allow_new_columns=True,
    )
    # a partial update touching an OLD-schema file after evolution
    h3 = h2.update([{"k": 1, "v": 10.0}], version="u2")
    rows = {r.k: (r.v, r.flag) for r in h3.df.select("k", "v", "flag").collect()}
    assert rows[1] == (10.0, None) and rows[3] == (3.5, "x")
    # compaction over mixed-schema files preserves every row
    h4 = h3.compact(target_rows=100)
    assert h4.df.count() == 10
    got = {r.k: r.flag for r in h4.df.select("k", "flag").collect()}
    assert got[3] == "x" and got[1] is None


def test_batch_omitting_value_column_gets_null(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(1, 1.0)], sub="e3")
    h2 = h.insert(spark.createDataFrame([(7,)], "k long"), upsert=True, version="ev")
    rows = {r.k: r.v for r in h2.df.select("k", "v").collect()}
    assert rows == {1: 1.0, 7: None}


def test_diff_spans_schema_evolution(spark, tmp_base):
    store, h = _mk(spark, tmp_base, [(1, 1.0), (2, 2.0)], sub="e4")
    h.insert(
        spark.createDataFrame([(2, 2.5, "y"), (3, 3.0, "z")], "k long, v double, flag string"),
        upsert=True,
        version="ev",
        allow_new_columns=True,
    )
    changes = {
        (r.k, r.change) for r in store.diff(0, store.latest_version()).collect()
    }
    assert changes == {(2, "update"), (3, "insert")}
