"""Merge-on-read deletes (key-granularity deletion vectors).

``delete_where_mor`` writes doomed KEYS as a tombstone sidecar and commits
a metadata-only version referencing every base data file unchanged — the
Delta deletion-vector / Iceberg merge-on-read shape. Reads subtract the
sidecar with one key anti-join. These tests pin: read correctness, zero
data-file rewrites, O(1) count, read_range == range, time travel, diff,
natural compaction on the next full-rewrite commit, compact() carrying
sidecars, rollback, vacuum retention, and the erase_keys refusal.
"""

import os

import pytest
from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore


def _mk(spark, base, n=20, rpp=5):
    store = SnapshotStore(spark, base + "/idx")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, float(i)) for i in range(n)], "k long, v double"),
        rows_per_partition=rpp,
    )
    return store, h


def _files_of(store, version):
    return sorted(f["path"] for f in store._version_row(version).get("files") or [])


def test_mor_delete_hides_rows_without_rewriting_files(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    base_files = _files_of(store, 0)
    h2 = h.delete_where_mor(F.col("k") % 2 == 0, version="mor1")
    # every base data file carried by reference, byte-identical
    assert _files_of(store, h2.version) == base_files
    assert store._version_row(h2.version).get("tombstones")
    got = sorted(r.k for r in h2.df.select("k").collect())
    assert got == [i for i in range(20) if i % 2 == 1]
    # O(1) manifest count reflects live rows
    assert h2.count() == 10


def test_mor_read_range_equals_range(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor((F.col("k") >= 5) & (F.col("k") < 9))
    rr = sorted(r.k for r in h2.read_range(3, 12).select("k").collect())
    assert rr == sorted(r.k for r in h2.range(3, 12).select("k").collect())
    assert rr == [3, 4, 9, 10, 11, 12]


def test_mor_time_travel_and_diff(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 3)
    # the pre-delete version still shows every row
    assert store.at_version(0).df.count() == 20
    changes = {(r.k, r.change) for r in store.diff(0, h2.version).collect()}
    assert changes == {(0, "delete"), (1, "delete"), (2, "delete")}


def test_mor_stacked_deletes(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 3)
    h3 = h2.delete_where_mor(F.col("k") >= 18)
    assert len(store._version_row(h3.version)["tombstones"]) >= 2
    assert sorted(r.k for r in h3.df.select("k").collect()) == list(range(3, 18))
    assert h3.count() == 15


def test_mor_noop_delete_returns_self(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") > 1000)
    assert h2 is h
    # the handle stays usable: a real mutation still works afterwards
    h3 = h.delete_where_mor(F.col("k") == 0)
    assert h3.count() == 19


def test_mor_next_rewrite_compacts_tombstones(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 5)
    # a full-path mutation (MOR base disables partial COW) folds them away
    h3 = h2.insert([{"k": 100, "v": 100.0}])
    assert not store._version_row(h3.version).get("tombstones")
    got = sorted(r.k for r in h3.df.select("k").collect())
    assert got == list(range(5, 20)) + [100]
    # deleted keys stay deleted, and re-inserting one works
    h4 = h3.insert([{"k": 0, "v": 0.5}])
    assert h4.df.filter(F.col("k") == 0).first().v == 0.5


def test_mor_mutation_validation_sees_filtered_state(spark, tmp_base):
    from index_spark.errors import KeyNotFoundError

    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") == 7)
    # an update of the tombstoned key must fail KEY_NOT_FOUND: the delete
    # is real even though the bytes still sit in the carried file
    with pytest.raises(KeyNotFoundError):
        h2.update([{"k": 7, "v": 9.9}])


def test_mor_compact_carries_tombstones(spark, tmp_base):
    store, h = _mk(spark, tmp_base, n=40, rpp=10)
    # make small files: a partial upsert writes a tiny touched file
    h2 = h.upsert_partial([{"k": 1, "v": 1.5}])
    h3 = h2.delete_where_mor(F.col("k") % 4 == 0)
    live = sorted(r.k for r in h3.df.select("k").collect())
    h4 = h3.compact(target_rows=10)
    if h4 is not h3:  # compaction ran
        assert sorted(r.k for r in h4.df.select("k").collect()) == live
        assert h4.count() == len(live)


def test_mor_rollback_restores_tombstones(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 10)
    h3 = h2.insert([{"k": 500, "v": 5.0}])  # compacts tombstones
    store.rollback(h2.version)
    latest = store.latest()
    assert sorted(r.k for r in latest.df.select("k").collect()) == list(range(10, 20))
    assert latest.count() == 10


def test_mor_vacuum_keeps_live_sidecars(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 10)
    store.vacuum(keep_last=1)
    tombs = store._version_row(h2.version)["tombstones"]
    assert all(os.path.exists(os.path.dirname(t)) for t in tombs)
    assert sorted(r.k for r in store.latest().df.select("k").collect()) == list(
        range(10, 20)
    )


def test_mor_erase_refuses_until_compacted(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") < 5)
    with pytest.raises(ValueError, match="merge-on-read"):
        store.erase_keys([{"k": 7}])
    # recipe from the error: compact the head (any full rewrite), vacuum
    # the MOR versions, then erase succeeds
    h3 = h2.insert([{"k": 100, "v": 1.0}])
    store.vacuum(keep_last=1)
    out = store.erase_keys([{"k": 7}])
    assert out["rows_erased"] >= 1


def test_mor_clone_refuses(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    h2 = h.delete_where_mor(F.col("k") == 0)
    with pytest.raises(ValueError, match="tombstones"):
        store.clone_to(tmp_base + "/clone")
