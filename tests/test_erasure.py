"""GDPR-style hard key erasure across snapshot history: every live
version forgets the keys, shared (COW-carried) files are rewritten once,
original bytes are physically deleted, and time travel cannot resurrect
an erased row."""

import glob
import os

import pytest

from index_spark.snapshots import SnapshotStore


def _mk(spark, tmp_base, n=400, rpp=50):
    store = SnapshotStore(spark, tmp_base)
    store.create(
        ["k"],
        df=spark.createDataFrame(
            [(i, f"val{i}") for i in range(n)], "k int, v string"
        ),
        rows_per_partition=rpp,
    )
    return store


def test_erase_removes_key_from_every_version(spark, tmp_base):
    store = _mk(spark, tmp_base)
    store.latest().update_partial([{"k": 7, "v": "updated"}])
    res = store.erase_keys([{"k": 7}, {"k": 13}])
    assert res["versions_touched"] == [0, 1]
    assert res["rows_erased"] == 4  # two keys x two versions
    for row in store._read_manifest()["versions"]:
        ks = {r.k for r in store.read(row["version"]).collect()}
        assert 7 not in ks and 13 not in ks
        assert row["n_rows"] == len(ks)
    vals = {r.k: r.v for r in store.latest()._current().collect()}
    assert vals[8] == "val8" and len(vals) == 398


def test_erase_rewrites_carried_file_once_and_repoints_all_versions(spark, tmp_base):
    store = _mk(spark, tmp_base)
    # partial upsert touches only the file containing k=390; files holding
    # low keys are CARRIED by reference into version 1
    store.latest().upsert_partial([{"k": 390, "v": "touched"}])
    m = store._read_manifest()
    f0 = {f["path"] for f in m["versions"][0]["files"]}
    f1 = {f["path"] for f in m["versions"][1]["files"]}
    shared = f0 & f1
    assert shared, "precondition: COW carry must share files"
    res = store.erase_keys([{"k": 2}])  # k=2 lives in a shared low file
    assert res["files_rewritten"] == 1  # rewritten ONCE despite two refs
    m2 = store._read_manifest()
    p0 = {f["path"] for f in m2["versions"][0]["files"]}
    p1 = {f["path"] for f in m2["versions"][1]["files"]}
    # both versions point at the same NEW file; the old shared file is gone
    new = (p0 & p1) - shared
    assert new and all(os.path.isfile(p) for p in new)
    for v in (0, 1):
        assert 2 not in {r.k for r in store.read(v).collect()}


def test_erase_physically_deletes_original_bytes(spark, tmp_base):
    store = _mk(spark, tmp_base)
    m = store._read_manifest()
    affected = [
        f["path"] for f in m["versions"][0]["files"] if f["min"][0] <= 3 <= f["max"][0]
    ]
    assert affected and all(os.path.isfile(p) for p in affected)
    store.erase_keys([{"k": 3}])
    assert all(not os.path.exists(p) for p in affected)
    # and no live parquet file under the store still contains the key
    for p in glob.glob(os.path.join(tmp_base, "**", "*.parquet"), recursive=True):
        ks = {r.k for r in spark.read.parquet(p).collect()}
        assert 3 not in ks


def test_erase_untouched_files_not_rewritten(spark, tmp_base):
    store = _mk(spark, tmp_base)
    m = store._read_manifest()
    before = {f["path"] for f in m["versions"][0]["files"]}
    res = store.erase_keys([{"k": 0}])  # lives in exactly one file
    after = {f["path"] for f in store._read_manifest()["versions"][0]["files"]}
    assert res["files_rewritten"] == 1
    assert len(before - after) == 1 and len(after - before) == 1


def test_erase_then_vacuum_keeps_store_consistent(spark, tmp_base):
    store = _mk(spark, tmp_base)
    store.latest().update_partial([{"k": 30, "v": "x"}])
    store.erase_keys([{"k": 30}])
    store.vacuum(keep_last=1)
    ks = {r.k for r in store.latest()._current().collect()}
    assert 30 not in ks and len(ks) == 399


def test_sharded_erase_routes_to_owning_shards_and_history(spark, tmp_base):
    """Erasure routes to the owning shards only, and a pinned logical
    snapshot taken BEFORE the erasure also forgets the key (bytes
    rewritten under unchanged shard version numbers)."""
    from index_spark.sharded import ShardedIndex

    sx = ShardedIndex.create(
        spark,
        tmp_base + "/sh",
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k int, v string"),
        n_shards=4,
        rows_per_partition=20,
    )
    snap = sx.snapshot()  # pin the pre-erasure logical state
    res = sx.erase_keys([{"k": 3}, {"k": 190}])
    assert len(res) == 2  # exactly the two owning shards touched
    assert all(r["rows_erased"] >= 1 for r in res.values())
    ks = {r.k for r in sx.in_order().collect()}
    assert 3 not in ks and 190 not in ks and len(ks) == 198
    ks_past = {r.k for r in sx.as_of(snap).in_order().collect()}
    assert 3 not in ks_past and 190 not in ks_past


def test_erase_on_binary_keyed_store(spark, tmp_base):
    """Binary keys have no JSON-able per-file stats (dir-level versions):
    erasure must still remove the key everywhere and keep exact counts
    (a stats-less rewrite must not record the version as empty)."""
    store = SnapshotStore(spark, tmp_base + "/bin")
    rows = [(bytes([i]), i) for i in range(40)]
    store.create(
        ["k"],
        df=spark.createDataFrame(rows, "k binary, v int"),
        rows_per_partition=10,
    )
    res = store.erase_keys([{"k": bytes([5])}])
    assert res["rows_erased"] == 1
    m = store._read_manifest()
    assert m["versions"][0]["n_rows"] == 39
    ks = {bytes(r.k) for r in store.read(0).collect()}
    assert bytes([5]) not in ks and len(ks) == 39


def test_erase_entire_file_and_entire_version(spark, tmp_base):
    """Erasing every key of one file drops it from the list; erasing a
    version's ONLY content leaves a readable zero-row version."""
    store = _mk(spark, tmp_base + "/f", n=100, rpp=25)  # 4 files of 25
    res = store.erase_keys([{"k": k} for k in range(25)])  # empty file 1
    m = store._read_manifest()
    assert m["versions"][0]["n_rows"] == 75
    assert len(m["versions"][0]["files"]) == 3
    assert {r.k for r in store.read(0).collect()} == set(range(25, 100))

    tiny = SnapshotStore(spark, tmp_base + "/tiny")
    tiny.create(
        ["k"],
        df=spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        rows_per_partition=10,
    )
    tiny.erase_keys([{"k": 1}, {"k": 2}])
    assert tiny.read(0).count() == 0  # readable, zero rows
    assert tiny._read_manifest()["versions"][0]["n_rows"] == 0


def test_sharded_erase_reaches_retired_history_shards(spark, tmp_base):
    """After a split, the pre-split store survives only via pinned
    history — erasure must reach it too, or as_of resurrects the key."""
    from index_spark.sharded import ShardedIndex

    sx = ShardedIndex.create(
        spark,
        tmp_base + "/shh",
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k int, v string"),
        n_shards=2,
        rows_per_partition=20,
    )
    snap = sx.snapshot()  # pins the PRE-split shard list
    assert sx.split_shard(0)
    res = sx.erase_keys([{"k": 3}])
    assert sum(r["rows_erased"] for r in res.values()) >= 2  # retired + live stores
    assert 3 not in {r.k for r in sx.in_order().collect()}
    past = sx.as_of(snap)
    assert 3 not in {r.k for r in past.in_order().collect()}


def test_as_of_view_refuses_erase(spark, tmp_base):
    from index_spark.errors import IndexError_
    from index_spark.sharded import ShardedIndex

    sx = ShardedIndex.create(
        spark,
        tmp_base + "/sr",
        ["k"],
        df=spark.createDataFrame([(1, "a")], "k int, v string"),
        n_shards=1,
        rows_per_partition=10,
    )
    snap = sx.snapshot()
    with pytest.raises(IndexError_):
        sx.as_of(snap).erase_keys([{"k": 1}])


def test_erase_empty_keys_is_noop(spark, tmp_base):
    store = _mk(spark, tmp_base + "/noop", n=20, rpp=10)
    stamp = store._read_manifest()[store._MV]
    res = store.erase_keys([])
    assert res == {"files_rewritten": 0, "versions_touched": [], "rows_erased": 0}
    assert store._read_manifest()[store._MV] == stamp  # no manifest bump


def test_erase_absent_key_writes_nothing(spark, tmp_base):
    store = _mk(spark, tmp_base + "/abs", n=20, rpp=10)
    stamp = store._read_manifest()[store._MV]
    res = store.erase_keys([{"k": 999999}])
    assert res["rows_erased"] == 0 and res["files_rewritten"] == 0
    assert store._read_manifest()[store._MV] == stamp


def test_vacuum_sweeps_erase_dirs_of_dropped_versions(spark, tmp_base):
    """A dir-level (binary-keyed) version relocated into an erase-* dir
    must be reclaimable: vacuum drops the version and its erase-dir data."""
    store = SnapshotStore(spark, tmp_base + "/sw")
    store.create(
        ["k"],
        df=spark.createDataFrame([(bytes([i]), i) for i in range(20)], "k binary, v int"),
        rows_per_partition=10,
    )
    store.latest().insert([{"k": bytes([100]), "v": 100}], upsert=True)
    store.erase_keys([{"k": bytes([2])}])
    import glob as g

    before = g.glob(os.path.join(tmp_base, "sw", "erase-*", "*", "*"))
    assert before  # relocated data exists
    store.vacuum(keep_last=1)
    # version 0's relocated dir-level data is gone; version 1's remains
    m = store._read_manifest()
    live = {os.path.abspath(m["versions"][-1]["data_path"])}
    for p in g.glob(os.path.join(tmp_base, "sw", "erase-*", "*")):
        assert os.path.abspath(p) in live, p
    assert store.latest()._current().count() == 20  # 19 survivors + upserted
