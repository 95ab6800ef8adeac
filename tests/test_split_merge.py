"""Persistent index split/merge + capacity predicates — the PySpark twin of
the reference's SplitAndMergeIndexSpec (fill to capacity → split → two
independent indexes whose union is the whole, original untouched → merge
back == whole, right survives the merge)."""

from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore

N = 400


def _keys(vidx):
    return [r.k for r in vidx.in_order().select("k").collect()]


def test_split_merge_capacity_roundtrip(spark, tmp_base):
    rows = [(i, f"v{i}") for i in range(N)]
    df = spark.createDataFrame(rows, "k int, v string")
    store = SnapshotStore(spark, tmp_base + "/whole")
    whole = store.create(["k"], df=df, rows_per_partition=100, max_n_items=N)

    assert whole.count() == N
    assert whole.is_full()
    assert whole.has_minimum() and whole.has_enough()

    left, right = whole.split_into(tmp_base + "/left", tmp_base + "/right")

    lk, rk = _keys(left), _keys(right)
    assert lk and rk
    assert max(lk) < min(rk)  # key-disjoint, ordered halves
    assert lk + rk == list(range(N))  # union == whole, in order
    assert not left.is_full() and not right.is_full()
    # both halves ~half capacity → hasMinimum boundary behavior
    assert left.has_minimum() or right.has_minimum()

    # original untouched (reference: source index survives the split)
    assert _keys(store.latest()) == list(range(N))

    merged = left.merge_from(right, tmp_base + "/merged")
    assert _keys(merged) == list(range(N))
    assert merged.is_full()

    # right survives the merge unchanged (reference SplitAndMergeIndexSpec)
    assert _keys(SnapshotStore(spark, tmp_base + "/right").latest()) == rk

    # merging beyond capacity refuses (maxNItems gate)
    try:
        merged.merge_from(right, tmp_base + "/overflow")
        raise AssertionError("expected capacity refusal")
    except ValueError:
        pass


def test_tuple_versions_survive_split(spark, tmp_base):
    df = spark.createDataFrame([(i, "x") for i in range(50)], "k int, v string")
    store = SnapshotStore(spark, tmp_base + "/w2")
    whole = store.create(["k"], df=df, rows_per_partition=100)
    h2 = whole.update([{"k": 7, "v": "y"}], version="tx-update")
    left, right = h2.split_into(tmp_base + "/l2", tmp_base + "/r2")
    side = left if 7 in _keys(left) else right
    row = side.get(7).select("v", "__version").first()
    assert row.v == "y" and row["__version"] == "tx-update"


def test_upsert_partial_file_level_cow(spark, tmp_base):
    """File-level COW: a narrow upsert rewrites only the files whose key
    range it touches; every other file is carried into the new version by
    reference, and results equal full-rewrite semantics."""
    from pyspark.sql import functions as F

    rows = [(i, f"v{i}") for i in range(400)]
    store = SnapshotStore(spark, tmp_base + "/cow")
    idx = store.create(
        ["k"],
        df=spark.createDataFrame(rows, "k int, v string"),
        rows_per_partition=50,  # → 8 range-partitioned files
    )
    base_files = {f["path"] for f in store._version_row(0)["files"]}
    assert len(base_files) == 8

    # narrow batch: keys 10..14 (one file's range) + one brand-new key
    batch = [{"k": k, "v": f"new{k}"} for k in range(10, 15)] + [{"k": 1000, "v": "new1000"}]
    idx2 = idx.upsert_partial(batch, version="cow-tx")

    new_meta = store._version_row(idx2.version)
    new_files = {f["path"] for f in new_meta["files"]}
    carried = base_files & new_files
    assert len(carried) >= 6  # most files reused by reference

    # results == full-rewrite semantics
    got = {r.k: r.v for r in idx2.in_order().collect()}
    want = {i: f"v{i}" for i in range(400)} | {k: f"new{k}" for k in range(10, 15)} | {1000: "new1000"}
    assert got == want
    assert idx2.count() == 401  # manifest count exact

    # updated rows carry the batch version; carried rows keep theirs
    vs = {r.k: r["__version"] for r in idx2.in_order().select("k", "__version").collect()}
    assert vs[10] == "cow-tx" and vs[1000] == "cow-tx" and vs[399] != "cow-tx"

    # file-aware vacuum: dropping v0 must keep files v1 still references
    removed = store.vacuum(keep_last=1)
    assert removed == [0]
    assert {r.k for r in store.latest().in_order().collect()} == set(want)


def test_update_and_remove_partial_cow(spark, tmp_base):
    """update_partial / remove_partial: touched-files-only rewrites with the
    reference's existence and expected-version semantics intact."""
    import pytest as _pytest

    from index_spark.errors import KeyNotFoundError, VersionChangedError

    rows = [(i, f"v{i}") for i in range(400)]
    store = SnapshotStore(spark, tmp_base + "/cow2")
    idx = store.create(
        ["k"], df=spark.createDataFrame(rows, "k int, v string"),
        rows_per_partition=50,
    )
    base_files = {f["path"] for f in store._version_row(0)["files"]}

    # update: missing key → KEY_NOT_FOUND, nothing committed
    with _pytest.raises(KeyNotFoundError):
        store.latest().update_partial([{"k": 9999, "v": "x"}])
    assert store.latest_version() == 0

    idx2 = store.latest().update_partial([{"k": 12, "v": "u12"}], version="up-tx")
    meta2 = store._version_row(idx2.version)
    assert len(base_files & {f["path"] for f in meta2["files"]}) >= 6  # carried
    got = {r.k: r.v for r in idx2.in_order().collect()}
    assert got[12] == "u12" and got[13] == "v13" and len(got) == 400

    # stale expected version → VERSION_CHANGED
    with _pytest.raises(VersionChangedError):
        store.latest().update_partial([{"k": 12, "v": "z", "__expected_version": "wrong"}])
    ok = store.latest().update_partial(
        [{"k": 12, "v": "u12b", "__expected_version": "up-tx"}], version="up-tx2"
    )
    assert {r.v for r in ok.get(12).collect()} == {"u12b"}

    # remove: only the touched file rewritten; count drops via manifest
    idx3 = store.latest().remove_partial([{"k": 100}, {"k": 101}])
    assert idx3.count() == 398
    assert idx3.get(100).isEmpty() and not idx3.get(102).isEmpty()
    with _pytest.raises(KeyNotFoundError):
        store.latest().remove_partial([{"k": 100}])  # already gone


def test_compact_bin_packs_small_files(spark, tmp_base):
    """compact(): the OPTIMIZE step for file-level COW. Scattered
    single-row inserts leave a trail of tiny files; compaction rewrites
    only those into ~target-size files, carries full files by reference,
    and preserves data and query results exactly."""
    store = SnapshotStore(spark, tmp_base + "/compact")
    store.create(
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k int, v string"),
        rows_per_partition=100,  # → 2 full files
    )
    for i in range(6):  # each insert lands outside every file's range → tiny file
        store.latest().insert([{"k": 1000 + i * 10, "v": f"n{i}"}])
    before = store._version_row(store.latest_version())["files"]
    assert sum(1 for f in before if f["n_rows"] < 50) >= 6

    compacted = store.latest().compact()
    after = store._version_row(compacted.version)["files"]
    assert len(after) < len(before)
    assert sum(1 for f in after if f["n_rows"] < 50) <= 1  # merged into one
    full_paths = {f["path"] for f in before if f["n_rows"] >= 50}
    assert full_paths <= {f["path"] for f in after}  # full files carried

    assert compacted.count() == 206  # manifest count exact after compaction
    got = {r.k: r.v for r in compacted.in_order().collect()}
    assert len(got) == 206 and got[0] == "v0" and got[1050] == "n5"
    assert [r.k for r in compacted.range(995, 1055).collect()] == [
        1000, 1010, 1020, 1030, 1040, 1050,
    ]

    # idempotent: nothing left to pack → same version, handle not consumed
    again = store.latest().compact()
    assert again.version == compacted.version

    # mutations keep working on the compacted layout
    idx = store.latest().update([{"k": 1000, "v": "N0"}])
    assert {r.v for r in idx.get(1000).collect()} == {"N0"}
