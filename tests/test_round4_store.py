"""Round-4 store features: multi-version change feed (table_changes shape)
and manifest Bloom filters for point-get file skipping."""

import pytest
from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore, _bloom_positions_py


def _mk(spark, base, n=30, rpp=10):
    store = SnapshotStore(spark, base + "/idx")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, float(i)) for i in range(n)], "k long, v double"),
        rows_per_partition=rpp,
    )
    return store, h


# ------------------------------------------------------------- change feed
def test_change_feed_stamps_each_step(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h1 = h.insert([{"k": 100, "v": 1.0}, {"k": 5, "v": 5.5}], upsert=True, version="w1")
    h2 = h1.remove([{"k": 7}], version="w2")
    feed = store.change_feed(0, h2.version).collect()
    got = {(r.k, r.change, r.version) for r in feed}
    assert (100, "insert", 1) in got
    assert (5, "update", 1) in got
    assert (7, "delete", 2) in got
    # churn only: carried rows never appear
    assert len(feed) == 3


def test_change_feed_empty_range(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    assert store.change_feed(0, 0).count() == 0


def test_change_feed_spans_mor_delete(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 3, version="mor")
    got = {(r.k, r.change, r.version) for r in store.change_feed(0, h2.version).collect()}
    assert got == {(0, "delete", 1), (1, "delete", 1), (2, "delete", 1)}


# ------------------------------------------------------------------ blooms
def test_bloom_point_get_prunes_and_matches(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=60, rpp=10)
    # interleaved upserts create overlapping file ranges
    h1 = h.upsert_partial([{"k": 5, "v": 5.5}, {"k": 55, "v": 55.5}])
    n = store.build_blooms()
    assert n == len(store._version_row(h1.version)["files"])
    head = store.at_version(h1.version)
    for probe in (5, 17, 55):
        got = head.read_point(probe).select("k", "v").collect()
        want = head.get(probe).select("k", "v").collect()
        assert got == want and len(got) == 1
    # pruning: the probe's plan reads fewer files than the version holds
    n_files = len(store._version_row(h1.version)["files"])
    assert len(head.read_point(17).inputFiles()) < n_files


def test_bloom_absent_key_reads_no_or_few_files(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=40, rpp=10)
    store.build_blooms()
    head = store.latest()
    # a key inside the global range but absent: zone maps alone cannot
    # prune it; the bloom usually can (false positives allowed, never
    # false negatives) — correctness is the empty result either way
    assert head.read_point(17).count() == 1  # present sanity
    df = head.read_point(1_000_000)
    assert df.count() == 0


def test_bloom_positions_parity(spark, tmp_base):
    # the Spark-side expression and the driver-side hash must agree, or
    # pruning would silently drop real rows
    from index_spark.snapshots import _bloom_positions_expr

    df = spark.createDataFrame([(42, "x")], "k long, s string")
    got = df.select(_bloom_positions_expr(["k", "s"], 4096, 3).alias("p")).first().p
    assert got == _bloom_positions_py((42, "x"), 4096, 3)


def test_bloom_rejects_unsafe_key_types(spark, tmp_base):
    store = SnapshotStore(spark, tmp_base + "/f")
    store.create(
        ["k"],
        df=spark.createDataFrame([(1.5, 1.0)], "k double, v double"),
    )
    with pytest.raises(ValueError, match="int/string"):
        store.build_blooms()


def test_bloom_survives_tombstones(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=40, rpp=10)
    h2 = h.delete_where_mor(F.col("k") == 17)
    store.build_blooms(version=h2.version)
    head = store.at_version(h2.version)
    assert head.read_point(17).count() == 0  # bloom hit, tombstone wins
    assert head.read_point(18).count() == 1


def test_vacuum_dry_run_touches_nothing(spark, tmp_base):
    import glob

    store, h = _mk(spark, tmp_base)
    h1 = h.insert([{"k": 100, "v": 1.0}], upsert=True)
    h2 = h1.insert([{"k": 101, "v": 2.0}], upsert=True)
    before = sorted(glob.glob(tmp_base + "/idx/**", recursive=True))
    would = store.vacuum(keep_last=1, dry_run=True)
    assert sorted(would) == [0, 1]
    # nothing moved: same files on disk, every version still readable
    assert sorted(glob.glob(tmp_base + "/idx/**", recursive=True)) == before
    assert store.at_version(0).df.count() == 30
    # the real vacuum then removes exactly what the dry run promised
    assert store.vacuum(keep_last=1) == would


def test_diff_reads_only_changed_files(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=60, rpp=10)  # 6 files
    h1 = h.upsert_partial([{"k": 5, "v": 5.5}])  # touches 1 file
    d = store.diff(0, h1.version)
    assert {(r.k, r.change) for r in d.collect()} == {(5, "update")}
    n_total = len(store._version_row(0)["files"]) + len(
        store._version_row(h1.version)["files"]
    )
    # symmetric-difference pruning: only the replaced + replacement files
    assert 0 < len(d.inputFiles()) < n_total
    assert len(d.inputFiles()) <= 3


def test_diff_pruned_equals_full_after_rollback_and_evolution(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=20, rpp=5)
    h1 = h.insert(
        spark.createDataFrame([(3, 3.5, "x"), (99, 9.9, "y")], "k long, v double, f string"),
        upsert=True,
        version="ev",
        allow_new_columns=True,
    )
    store.rollback(0)
    restored = store.latest_version()
    # diff across the restore reports exactly the undone rows
    got = {(r.k, r.change) for r in store.diff(h1.version, restored).collect()}
    assert got == {(3, "update"), (99, "delete")}
    # and a version diffed against itself is empty
    assert store.diff(restored, restored).count() == 0


# --------------------------------------------------- sharded delete_where
def test_sharded_delete_where_mor_and_cow(spark, tmp_base):
    from index_spark.sharded import ShardedIndex

    sh = ShardedIndex.create(
        spark,
        tmp_base + "/sh",
        ["k"],
        spark.createDataFrame([(i, float(i)) for i in range(40)], "k long, v double"),
        n_shards=3,
        rows_per_partition=10,
    )
    changed = sh.delete_where(F.col("k") % 4 == 0, mor=True)
    assert changed  # at least one shard committed
    got = sorted(r.k for r in sh.in_order().select("k").collect())
    assert got == [i for i in range(40) if i % 4]
    assert sh.count() == len(got)
    # COW path on top of the MOR state
    changed2 = sh.delete_where(F.col("k") > 35)
    got2 = sorted(r.k for r in sh.in_order().select("k").collect())
    assert got2 == [i for i in range(36) if i % 4]
    # predicate matching nothing changes no shard
    assert sh.delete_where(F.col("k") > 1000, mor=True) == {}
    assert sh.delete_where(F.col("k") > 1000) == {}


def test_read_points_equals_get_all_and_prunes(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=60, rpp=10)  # 6 files
    store.build_blooms()
    head = store.latest()
    probes = [3, 17, 17, 44, 999]
    got = sorted(r.k for r in head.read_points(probes).select("k").collect())
    want = sorted(r.k for r in head.get_all(probes).select("k").collect())
    assert got == want == [3, 17, 44]
    n_files = len(store._version_row(head.version)["files"])
    assert 0 < len(head.read_points(probes).inputFiles()) < n_files
    # all-absent probe: zero files in the plan
    assert len(head.read_points([100000, 200000]).inputFiles()) == 0
    assert head.read_points([]).count() == 0


def test_read_points_respects_tombstones(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=30, rpp=10)
    h2 = h.delete_where_mor(F.col("k") == 5)
    store.build_blooms(version=h2.version)
    head = store.at_version(h2.version)
    assert sorted(r.k for r in head.read_points([4, 5, 6]).select("k").collect()) == [4, 6]
