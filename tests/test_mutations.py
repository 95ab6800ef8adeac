"""Versioned mutation semantics vs a plain-dict model.

Mirrors the reference's MainSpec / QueriesRandomSpec methodology
(SURVEY.md §5): random batches incl. deliberate failures; atomicity
(all-or-nothing per execute); final full scan == model."""

import random

import pytest

from index_spark.commands import Insert, Remove, Update
from index_spark.errors import (
    ContextUsedError,
    DuplicatedKeysError,
    KeyNotFoundError,
    VersionChangedError,
)
from index_spark.snapshots import SnapshotStore

SEED = 7


def kv(k, v):
    return {"key": k, "value": v}


@pytest.fixture()
def store(spark, tmp_base):
    return SnapshotStore(spark, tmp_base + "/idx")


def scan(vidx):
    return [(r.key, r.value) for r in vidx.in_order().select("key", "value").collect()]


def versions_of(vidx):
    return {r.key: r["__version"] for r in vidx.in_order().collect()}


def test_insert_and_scan(store):
    idx = store.create(["key"])
    idx = idx.insert([kv("b", "2"), kv("a", "1"), kv("c", "3")])
    assert scan(idx) == [("a", "1"), ("b", "2"), ("c", "3")]


def test_insert_duplicate_in_batch_fails_atomically(store):
    idx = store.create(["key"], df=None)
    idx = idx.insert([kv("a", "1")])
    with pytest.raises(DuplicatedKeysError):
        idx.insert([kv("x", "1"), kv("x", "2")])
    # nothing committed; a fresh handle still sees only "a"
    assert scan(store.latest()) == [("a", "1")]


def test_insert_existing_without_upsert_fails(store):
    idx = store.create(["key"]).insert([kv("a", "1")])
    with pytest.raises(DuplicatedKeysError):
        idx.insert([kv("a", "9")])
    assert scan(store.latest()) == [("a", "1")]


def test_upsert_overwrites(store):
    idx = store.create(["key"]).insert([kv("a", "1"), kv("b", "2")])
    idx = idx.insert([kv("a", "9"), kv("c", "3")], upsert=True)
    assert scan(idx) == [("a", "9"), ("b", "2"), ("c", "3")]


def test_per_row_upsert_flag(store):
    idx = store.create(["key"]).insert([kv("a", "1")])
    rows = [dict(kv("a", "9"), __upsert=True), dict(kv("d", "4"), __upsert=False)]
    idx = idx.insert(rows)
    assert scan(idx) == [("a", "9"), ("d", "4")]


def test_update_missing_key_fails(store):
    idx = store.create(["key"]).insert([kv("a", "1")])
    with pytest.raises(KeyNotFoundError):
        idx.update([kv("nope", "x")])


def test_update_version_check(store):
    idx = store.create(["key"]).insert([kv("a", "1")], version="v1")
    # correct expected version succeeds
    idx2 = idx.update([dict(kv("a", "2"), __expected_version="v1")], version="v2")
    assert scan(idx2) == [("a", "2")]
    assert versions_of(idx2)["a"] == "v2"
    # stale expected version fails
    with pytest.raises(VersionChangedError):
        idx2.update([dict(kv("a", "3"), __expected_version="v1")])


def test_remove_and_version_check(store):
    idx = store.create(["key"]).insert([kv("a", "1"), kv("b", "2")], version="v1")
    with pytest.raises(VersionChangedError):
        idx.remove([{"key": "a", "__expected_version": "wrong"}])
    idx2 = idx.remove([{"key": "a", "__expected_version": "v1"}])
    assert scan(idx2) == [("b", "2")]
    with pytest.raises(KeyNotFoundError):
        idx2.remove([{"key": "zz"}])


def test_execute_multi_command_atomic(store):
    """Batch = insert + update + remove in one tx; a failing later command
    aborts the earlier ones (QueriesRandomSpec.scala:211-239)."""
    idx = store.create(["key"]).insert([kv("a", "1"), kv("b", "2")])
    bad = [
        Insert([kv("c", "3")]),
        Update([kv("a", "10")]),
        Remove([{"key": "does-not-exist"}]),  # fails → whole batch aborted
    ]
    with pytest.raises(KeyNotFoundError):
        idx.execute(bad)
    assert scan(store.latest()) == [("a", "1"), ("b", "2")]

    good = [Insert([kv("c", "3")]), Update([kv("a", "10")]), Remove([{"key": "b"}])]
    idx2 = store.latest().execute(good, version="tx9")
    assert scan(idx2) == [("a", "10"), ("c", "3")]
    vs = versions_of(idx2)
    assert vs["a"] == "tx9" and vs["c"] == "tx9"  # shared batch version


def test_try_execute_returns_result(store):
    idx = store.create(["key"]).insert([kv("a", "1")])
    res = idx.try_execute([Insert([kv("a", "dup")])])
    assert not res.success and res.error == "DUPLICATED_KEYS"


def test_write_handle_single_use(store):
    idx = store.create(["key"])
    idx2 = idx.insert([kv("a", "1")])
    with pytest.raises(ContextUsedError):
        idx.insert([kv("b", "2")])
    assert idx2.count() == 1


def test_count_from_manifest(store):
    idx = store.create(["key"]).insert([kv(c, c) for c in "abcdef"])
    assert idx.count() == 6


def test_randomized_against_model(store):
    """100-ish random mutation batches in lockstep with a dict model
    (MainSpec.scala:184-206 analog, scaled for wall-clock)."""
    rng = random.Random(SEED)
    model: dict[str, tuple[str, str]] = {}  # key -> (value, version)
    idx = store.create(["key"])
    keyspace = [f"k{i:03d}" for i in range(60)]
    for batch_no in range(12):
        version = f"b{batch_no}"
        op = rng.choice(["insert", "upsert", "update", "remove"])
        ks = rng.sample(keyspace, rng.randint(1, 8))
        try:
            if op == "insert":
                rows = [kv(k, f"{k}@{version}") for k in ks]
                idx = idx.insert(rows, version=version)
                for k in ks:
                    assert k not in model
                    model[k] = (f"{k}@{version}", version)
            elif op == "upsert":
                rows = [kv(k, f"{k}@{version}") for k in ks]
                idx = idx.insert(rows, upsert=True, version=version)
                for k in ks:
                    model[k] = (f"{k}@{version}", version)
            elif op == "update":
                rows = [kv(k, f"{k}@{version}") for k in ks]
                idx = idx.update(rows, version=version)
                for k in ks:
                    assert k in model
                    model[k] = (f"{k}@{version}", version)
            else:
                idx = idx.remove([{"key": k} for k in ks])
                for k in ks:
                    assert k in model
                    del model[k]
        except DuplicatedKeysError:
            assert op == "insert" and any(k in model for k in ks)
            idx = store.latest()
        except KeyNotFoundError:
            assert op in ("update", "remove") and any(k not in model for k in ks)
            idx = store.latest()
    expect = sorted((k, v) for k, (v, _) in model.items())
    assert scan(store.latest()) == expect


# ---- DataFrame-native batches (bulk path: rows never touch the driver) ----


def test_df_batch_insert_upsert_update_remove(store, spark):
    idx = store.create(["key"]).insert([kv("a", "1"), kv("b", "2"), kv("c", "3")])
    F = __import__("pyspark.sql.functions", fromlist=["functions"])

    # upsert: overwrite b, add d — as a DataFrame
    up = spark.createDataFrame([kv("b", "2x"), kv("d", "4")])
    idx = idx.insert(up, upsert=True, version="dfv1")
    assert scan(store.latest()) == [("a", "1"), ("b", "2x"), ("c", "3"), ("d", "4")]
    assert versions_of(store.latest())["b"] == "dfv1"
    assert versions_of(store.latest())["a"] != "dfv1"  # untouched rows keep theirs

    # update: existing keys only
    idx = store.latest().update(spark.createDataFrame([kv("a", "1y")]), version="dfv2")
    assert scan(store.latest())[0] == ("a", "1y")

    # remove by key DataFrame
    idx = store.latest().remove(spark.createDataFrame([{"key": "c"}]))
    assert [k for k, _ in scan(store.latest())] == ["a", "b", "d"]


def test_df_batch_validation_errors(store, spark):
    idx = store.create(["key"]).insert([kv("a", "1")])
    # duplicate keys inside the DataFrame batch
    with pytest.raises(DuplicatedKeysError):
        store.latest().insert(spark.createDataFrame([kv("x", "1"), kv("x", "2")]))
    # non-upsert collision with an existing key
    with pytest.raises(DuplicatedKeysError):
        store.latest().insert(spark.createDataFrame([kv("a", "9")]))
    # update of an absent key
    with pytest.raises(KeyNotFoundError):
        store.latest().update(spark.createDataFrame([kv("zz", "9")]))
    # stale expected version
    with pytest.raises(VersionChangedError):
        store.latest().update(
            spark.createDataFrame([{"key": "a", "value": "n", "__expected_version": "stale"}])
        )
    assert scan(store.latest()) == [("a", "1")]


def test_df_batch_partial_cow_touches_bounded_files(store, spark):
    """A key-bounded DataFrame batch must go through file-level COW: files
    outside the batch's [lo, hi] key bounds carry by reference."""
    rows = [kv(f"k{i:03d}", str(i)) for i in range(40)]
    idx = store.create(["key"], df=spark.createDataFrame(rows), rows_per_partition=10)
    before = store._version_row(store.latest().version)["files"]
    batch = spark.createDataFrame([kv("k005", "B")])
    idx2 = idx.insert(batch, upsert=True, version="cow")
    after = store._version_row(idx2.version)["files"]
    carried = {f["path"] for f in before} & {f["path"] for f in after}
    assert len(carried) >= len(before) - 2  # only the touched range rewrote
    assert dict(scan(idx2))["k005"] == "B"


# ---- object-store-safe manifest commits (conditional put, no rename) ----


def test_concurrent_writer_loses_with_commit_conflict(store, spark):
    """Two writers race read→stage→commit on the same store: the second
    commit against a stale manifest stamp must fail with COMMIT_CONFLICT
    and leave the winner's state untouched (the descriptor-CAS semantics
    the reference gets from Cassandra LWTs)."""
    from index_spark.errors import CommitConflictError

    store.create(["key"]).insert([kv("a", "1")])
    # writer 1 and writer 2 both take handles off the same committed version
    w1 = SnapshotStore(spark, store.base_path).latest()
    w2 = SnapshotStore(spark, store.base_path).latest()
    w1.insert([kv("b", "2")], version="w1")  # w1 commits first
    with pytest.raises(CommitConflictError):
        w2.insert([kv("c", "3")], version="w2")
    # winner's commit is intact; loser wrote nothing
    assert scan(store.latest()) == [("a", "1"), ("b", "2")]
    # the loser retries the reference way: reread latest, re-stage, commit
    SnapshotStore(spark, store.base_path).latest().insert([kv("c", "3")], version="w2r")
    assert scan(store.latest()) == [("a", "1"), ("b", "2"), ("c", "3")]


def test_commit_data_dirs_unique_per_commit(store, spark):
    """Every commit writes its data under its own uuid-suffixed directory
    (recorded as data_path in the manifest row): visibility is decided
    solely by the manifest CAS, so a mid-flight concurrent writer can
    never land part-files inside another commit's directory."""
    import re

    store.create(["key"], df=spark.createDataFrame([kv("a", "1")]))
    store.latest().insert([kv("b", "2")])
    store.latest().insert([kv("c", "3")])
    rows = store._read_manifest()["versions"]
    dirs = [r["data_path"] for r in rows]
    assert len(set(dirs)) == 3  # one unique dir per commit
    for d in dirs:
        assert re.fullmatch(r"v\d{6}-[0-9a-f]{8}", d.rsplit("/", 1)[-1])


def test_midflight_concurrent_writers_never_mix_data(store, spark):
    """The mid-flight overlap window: two writers off the same base stamp
    both stage and write data before either's CAS resolves. Exactly one
    manifest commit wins; the final table must contain the base rows plus
    exactly ONE batch — never a silent mix of both writers' files."""
    import threading

    from index_spark.errors import CommitConflictError

    store.create(["key"], df=spark.createDataFrame([kv("a", "1")]))
    w1 = SnapshotStore(spark, store.base_path).latest()
    w2 = SnapshotStore(spark, store.base_path).latest()
    errors: dict[str, BaseException] = {}
    barrier = threading.Barrier(2)

    def run(name, handle, row):
        barrier.wait()
        try:
            handle.insert([row], version=name)
        except CommitConflictError as e:
            errors[name] = e

    t1 = threading.Thread(target=run, args=("wA", w1, kv("b", "fromA")))
    t2 = threading.Thread(target=run, args=("wB", w2, kv("c", "fromB")))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(errors) == 1  # exactly one loser
    got = scan(SnapshotStore(spark, store.base_path).latest())
    winner_row = ("b", "fromA") if "wB" in errors else ("c", "fromB")
    assert got == sorted([("a", "1"), winner_row])
    # loser's orphaned data directory is reclaimable
    store.vacuum(keep_last=10)  # keeps all committed versions
    assert scan(SnapshotStore(spark, store.base_path).latest()) == sorted(
        [("a", "1"), winner_row]
    )


def test_vacuum_reclaims_orphaned_commit_dir(store, spark):
    """A losing writer's data directory (written, never referenced by any
    manifest row) is swept by vacuum without touching live data."""
    import os

    store.create(["key"], df=spark.createDataFrame([kv("a", "1")]))
    store.latest().insert([kv("b", "2")])
    orphan = os.path.join(store.base_path, "v000099-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
        f.write("junk")
    store.vacuum(keep_last=10)
    assert not os.path.exists(orphan)
    assert scan(store.latest()) == [("a", "1"), ("b", "2")]


def test_create_race_rejects_second_writer(store, spark):
    from index_spark.errors import CommitConflictError, IndexAlreadyExistsError

    store.create(["key"])
    with pytest.raises((CommitConflictError, IndexAlreadyExistsError)):
        SnapshotStore(spark, store.base_path).create(["key"])


def test_execute_mixed_list_and_df_payloads(store, spark):
    """One atomic transaction mixing a driver-list command and a DataFrame
    command: shared version string, single commit, partial-COW planner
    falls back to coarse [lo, hi] bounds when any payload is a DataFrame."""
    idx = store.create(["key"]).insert([kv(f"k{i}", str(i)) for i in range(10)])
    batch_df = spark.createDataFrame([kv("k3", "DF"), kv("zz", "NEW")])
    nxt = store.latest().execute(
        [Update([kv("k1", "L")]), Insert(batch_df, upsert=True)], version="mix"
    )
    got = dict(scan(nxt))
    assert got["k1"] == "L" and got["k3"] == "DF" and got["zz"] == "NEW"
    vs = versions_of(nxt)
    assert vs["k1"] == vs["k3"] == vs["zz"] == "mix"  # one shared version
    assert vs["k5"] != "mix"  # untouched rows keep their writer version


def test_snapshot_diff_change_feed(store, spark):
    """diff(v_from, v_to) reports exactly the changed keys with kinds;
    carried files under partial COW produce no false positives."""
    rows = [kv(f"k{i:03d}", str(i)) for i in range(30)]
    idx = store.create(["key"], df=spark.createDataFrame(rows), rows_per_partition=10)
    v0 = idx.version
    idx = store.latest().execute(
        [
            Insert([kv("k005", "UP"), kv("zzz", "NEW")], upsert=True),
            Remove([{"key": "k020"}]),
        ],
        version="feed",
    )
    got = {(r.key, r.change) for r in store.diff(v0, idx.version).collect()}
    assert got == {("k005", "update"), ("zzz", "insert"), ("k020", "delete")}
    # reversed arguments are rejected instead of silently inverting the
    # insert/delete kinds (an accidental swap would corrupt a downstream
    # incremental consumer)
    with pytest.raises(ValueError):
        store.diff(idx.version, v0)
    # an explicit writer-version string is a per-transaction id: reusing
    # one across commits would blind the change feed's writer-version
    # comparison, so the store rejects it
    with pytest.raises(ValueError):
        store.latest().insert([kv("yyy", "again")], version="feed")
    # ... and the used-id set must SURVIVE vacuum pruning the old manifest
    # rows (else a reused id after vacuum silently blinds the feed)
    store.latest().insert([kv("yyy", "1")], version="feed2")
    store.latest().insert([kv("www", "1")], version="feed3")
    store.vacuum(keep_last=1)
    with pytest.raises(ValueError):
        store.latest().insert([kv("xxx", "again")], version="feed")
