"""Sharded logical index — the reference's index-level sharding story
(QueryableIndex.scala:561-679) as a catalog-routed set of physical
snapshot indexes: range routing, cross-shard transactional batches with an
atomic catalog swap, capacity-driven split, and adjacent merge."""

import pytest

from index_spark.commands import Insert, Remove, Update
from index_spark.errors import DuplicatedKeysError, KeyNotFoundError, VersionChangedError
from index_spark.sharded import ShardedIndex

N = 400


@pytest.fixture()
def sharded(spark, tmp_base):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(N)], "k int, v string")
    return ShardedIndex.create(spark, tmp_base + "/sh", ["k"], df, n_shards=4, rows_per_partition=100)


def _keys(df):
    return [r.k for r in df.select("k").collect()]


def test_create_routes_ranges_disjointly(sharded):
    cat = sharded._read_catalog()
    assert len(cat["shards"]) == 4
    assert cat["shards"][-1]["upper"] is None
    assert sharded.count() == N  # O(1) manifest sum
    assert _keys(sharded.in_order()) == list(range(N))


def test_point_and_range_reads_route(sharded):
    assert [r.v for r in sharded.get(123).collect()] == ["v123"]
    assert _keys(sharded.range(90, 310)) == list(range(90, 311))  # spans shards
    assert _keys(sharded.gt(395)) == [396, 397, 398, 399]
    assert _keys(sharded.lt(4, inclusive=True)) == [0, 1, 2, 3, 4]
    assert _keys(sharded.in_order(reverse=True, limit=3)) == [399, 398, 397]


def test_read_pruning_skips_shards(sharded):
    cat = sharded._read_catalog()
    first_upper = tuple(cat["shards"][0]["upper"])
    # a range entirely inside shard 0 prunes to one candidate shard
    cand = sharded._prune(cat["shards"], gt_term=(0,), lt_term=(first_upper[0] - 1,))
    assert len(cand) == 1 and cand[0]["id"] == cat["shards"][0]["id"]
    # gt beyond the last boundary prunes to the last shard only
    last_lower = tuple(cat["shards"][-2]["upper"])
    cand = sharded._prune(cat["shards"], gt_term=(last_lower[0] + 1,))
    assert [s["id"] for s in cand] == [cat["shards"][-1]["id"]]


def test_get_all_routes_and_aggregates_missing(sharded):
    got = sharded.get_all([5, 150, 399])
    assert _keys(got) == [5, 150, 399]
    with pytest.raises(KeyNotFoundError) as e:
        sharded.get_all([5, 5000, 150, 7000], must_find_all=True)
    assert {t[0] for t in e.value.keys} == {5000, 7000}


def test_cross_shard_batch_commits_atomically(sharded):
    # one batch touching three shards: update low, remove mid, insert high
    sharded.execute([
        Update([{"k": 1, "v": "U1"}]),
        Remove([{"k": 200}]),
        Insert([{"k": 10_000, "v": "new"}]),
    ])
    assert [r.v for r in sharded.get(1).collect()] == ["U1"]
    assert sharded.get(200).isEmpty()
    assert [r.v for r in sharded.get(10_000).collect()] == ["new"]
    assert sharded.count() == N  # -1 removed +1 inserted


def test_failed_batch_leaves_catalog_untouched(sharded):
    cat_before = sharded._read_catalog()
    # first command (low shard) succeeds physically, second (missing key) fails
    with pytest.raises(KeyNotFoundError):
        sharded.execute([
            Update([{"k": 1, "v": "SHOULD_NOT_PUBLISH"}]),
            Update([{"k": 99_999, "v": "missing"}]),
        ])
    assert sharded._read_catalog() == cat_before  # logical state unchanged
    assert [r.v for r in sharded.get(1).collect()] == ["v1"]  # orphan invisible
    # a later good batch still works from the pinned versions
    sharded.update([{"k": 1, "v": "U1b"}])
    assert [r.v for r in sharded.get(1).collect()] == ["U1b"]


def test_validation_errors_cross_shard(sharded):
    with pytest.raises(DuplicatedKeysError):
        sharded.insert([{"k": 1, "v": "dup-existing"}])
    with pytest.raises(VersionChangedError):
        sharded.update([{"k": 1, "v": "x", "__expected_version": "stale"}])
    with pytest.raises(KeyNotFoundError):
        sharded.remove([{"k": 123456}])


def test_split_shard_and_routing_after(sharded):
    cat = sharded._read_catalog()
    first = cat["shards"][0]["id"]
    assert sharded.split_shard(first)
    assert sharded.n_shards() == 5
    # data and order preserved; boundaries still route every key
    assert _keys(sharded.in_order()) == list(range(N))
    assert [r.v for r in sharded.get(0).collect()] == ["v0"]
    cat2 = sharded._read_catalog()
    uppers = [tuple(s["upper"]) for s in cat2["shards"][:-1]]
    assert uppers == sorted(uppers)


def test_merge_adjacent_and_capacity_gate(spark, tmp_base):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(N)], "k int, v string")
    sh = ShardedIndex.create(
        spark, tmp_base + "/shm", ["k"], df, n_shards=4,
        rows_per_partition=100, shard_capacity=150,
    )
    cat = sh._read_catalog()
    # two ~100-row shards merge fine only if they fit capacity
    ids = [s["id"] for s in cat["shards"]]
    merged = sh.merge_adjacent(ids[0])
    if merged:
        assert sh.n_shards() == 3
    assert _keys(sh.in_order()) == list(range(N))


def test_auto_split_on_capacity(spark, tmp_base):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k int, v string")
    sh = ShardedIndex.create(
        spark, tmp_base + "/sha", ["k"], df, n_shards=2,
        rows_per_partition=50, shard_capacity=60,
    )
    assert sh.n_shards() == 2
    # push the last shard over capacity → auto split on commit
    sh.insert([{"k": 1000 + i, "v": f"n{i}"} for i in range(15)])
    assert sh.n_shards() == 3
    assert sh.count() == 115
    assert _keys(sh.in_order()) == list(range(100)) + list(range(1000, 1015))


def test_vacuum_reclaims_orphans_and_dead_shards(spark, tmp_base):
    """A failed cross-shard batch leaves committed-but-unpublished shard
    versions; split leaves a replaced shard store. vacuum() reclaims both
    while every catalog-pinned version keeps reading correctly."""
    import os

    df = spark.createDataFrame([(i, f"v{i}") for i in range(N)], "k int, v string")
    sh = ShardedIndex.create(spark, tmp_base + "/shv", ["k"], df, n_shards=3, rows_per_partition=100)

    with pytest.raises(KeyNotFoundError):
        sh.execute([
            Update([{"k": 1, "v": "orphan"}]),   # commits physically to shard 0
            Update([{"k": 99_999, "v": "x"}]),   # fails → catalog not swapped
        ])
    cat = sh._read_catalog()
    s0 = cat["shards"][0]
    from index_spark.snapshots import SnapshotStore
    assert SnapshotStore(spark, s0["path"]).latest_version() > s0["version"]  # orphan ahead

    first = cat["shards"][0]["id"]
    assert sh.split_shard(first)  # old shard 0 store now unreferenced
    out = sh.vacuum()
    assert any(out["versions"].values()) or out["dirs"]
    assert os.path.abspath(s0["path"]) in {os.path.abspath(p) for p in out["dirs"]}

    # logical state intact after reclamation
    assert _keys(sh.in_order()) == list(range(N))
    assert [r.v for r in sh.get(1).collect()] == ["v1"]
    # and mutations still work
    sh.update([{"k": 1, "v": "U1"}])
    assert [r.v for r in sh.get(1).collect()] == ["U1"]


def test_sharded_time_travel(spark, tmp_base):
    """snapshot()/as_of(): the catalog history pins whole shard lists, so
    time travel survives later mutations AND topology changes (split), and
    vacuum keeps everything a history entry still reads."""
    from index_spark.errors import IndexError_

    df = spark.createDataFrame([(i, f"v{i}") for i in range(N)], "k int, v string")
    sh = ShardedIndex.create(spark, tmp_base + "/sht", ["k"], df, n_shards=3, rows_per_partition=100)
    t0 = sh.snapshot()
    sh.update([{"k": 1, "v": "U1"}])
    sh.split_shard(sh._read_catalog()["shards"][0]["id"])  # topology change
    t1 = sh.snapshot()
    sh.remove([{"k": 1}])

    assert sh.as_of(t0 - 1) is None  # before first snapshot
    old = sh.as_of(t0)
    assert [r.v for r in old.get(1).collect()] == ["v1"]
    mid = sh.as_of(t1)
    assert [r.v for r in mid.get(1).collect()] == ["U1"]
    assert sh.get(1).isEmpty()  # latest
    assert _keys(old.range(0, 10)) == list(range(11))

    with pytest.raises(IndexError_):
        old.update([{"k": 2, "v": "x"}])
    with pytest.raises(IndexError_):
        old.split_shard(0)

    # vacuum: history-pinned versions and pre-split stores survive
    sh.vacuum()
    assert [r.v for r in sh.as_of(t0).get(1).collect()] == ["v1"]
    assert [r.v for r in sh.as_of(t1).get(1).collect()] == ["U1"]
    assert sh.get(1).isEmpty()


def test_sharded_randomized_against_model(spark, tmp_base):
    """MainSpec-style randomized differential test at shard granularity:
    random cross-shard batches in lockstep with a dict model, interleaved
    capacity splits, a couple of snapshots replayed at the end
    (TemporalIndexSpec.scala:223-233 analog)."""
    import random

    from index_spark.errors import DuplicatedKeysError as Dup
    from index_spark.errors import KeyNotFoundError as Missing

    rng = random.Random(20260813)
    keyspace = list(range(0, 3000, 7))
    init = sorted(rng.sample(keyspace, 200))
    df = spark.createDataFrame([(k, f"v{k}") for k in init], "k int, v string")
    sh = ShardedIndex.create(spark, tmp_base + "/shr", ["k"], df, n_shards=3, rows_per_partition=100)
    model = {k: f"v{k}" for k in init}
    snaps = {}

    for batch_no in range(8):
        op = rng.choice(["insert", "upsert", "update", "remove", "snapshot", "split"])
        if op == "snapshot":
            snaps[sh.snapshot()] = dict(model)
            continue
        if op == "split":
            cat = sh._read_catalog()
            sh.split_shard(rng.choice(cat["shards"])["id"])
            continue
        ks = rng.sample(keyspace, rng.randint(1, 12))
        rows = [{"k": k, "v": f"{k}@b{batch_no}"} for k in ks]
        try:
            if op == "insert":
                sh.insert(rows)
                for k in ks:
                    assert k not in model
                    model[k] = f"{k}@b{batch_no}"
            elif op == "upsert":
                sh.insert(rows, upsert=True)
                for k in ks:
                    model[k] = f"{k}@b{batch_no}"
            elif op == "update":
                sh.update(rows)
                for k in ks:
                    assert k in model
                    model[k] = f"{k}@b{batch_no}"
            else:
                sh.remove([{"k": k} for k in ks])
                for k in ks:
                    assert k in model
                    del model[k]
        except Dup:
            assert op == "insert" and any(k in model for k in ks)
        except Missing:
            assert op in ("update", "remove") and any(k not in model for k in ks)

    got = [(r.k, r.v) for r in sh.in_order().select("k", "v").collect()]
    assert got == sorted(model.items())
    assert sh.count() == len(model)
    for ts, snap_model in snaps.items():
        view = sh.as_of(ts)
        got = [(r.k, r.v) for r in view.in_order().select("k", "v").collect()]
        assert got == sorted(snap_model.items())


def test_sharded_compact_and_composite_keys(spark, tmp_base):
    """Composite-key routing (tuple-lexicographic boundaries) + per-shard
    compaction behind one catalog swap."""
    rows = [(o, l, f"v{o}.{l}") for o in range(60) for l in range(1, 4)]
    df = spark.createDataFrame(rows, "o int, l int, v string")
    sh = ShardedIndex.create(
        spark, tmp_base + "/shc", ["o", "l"], df, n_shards=3, rows_per_partition=60
    )
    assert sh.count() == 180
    # composite routing: point get, prefix-ish gt, cross-shard range
    assert [r.v for r in sh.get((10, 2)).collect()] == ["v10.2"]
    got = [(r.o, r.l) for r in sh.range((9, 3), (11, 1)).collect()]
    assert got == [(9, 3), (10, 1), (10, 2), (10, 3), (11, 1)]
    # scattered single-row inserts leave small files in several shards
    for o in (100, 101, 102):
        sh.insert([{"o": o, "l": 1, "v": f"n{o}"}])
    changed = sh.compact()
    assert changed  # at least the tail shard packed
    assert sh.count() == 183
    assert [r.v for r in sh.get((101, 1)).collect()] == ["n101"]
    got = [(r.o, r.l) for r in sh.in_order().select("o", "l").collect()]
    assert got == sorted(got)


def test_create_empty_dataframe(spark, tmp_base):
    """Bulk load of an empty source: no staging write, every shard an
    empty store; reads and first inserts work."""
    df = spark.createDataFrame([], "k int, v string")
    sh = ShardedIndex.create(spark, tmp_base + "/she", ["k"], df, n_shards=2, rows_per_partition=10)
    assert sh.count() == 0
    sh.insert([{"k": 1, "v": "a"}])
    assert [r.v for r in sh.get(1).collect()] == ["a"]


def test_create_date_key_rejected_with_clear_error(spark, tmp_base):
    """Date keys can't round-trip the JSON catalog (and ISO strings would
    not compare against date row keys) — rejected up front with guidance,
    instead of a TypeError from deep inside the catalog write."""
    import datetime

    rows = [(datetime.date(2024, 1, 1) + datetime.timedelta(days=i), f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k date, v string")
    with pytest.raises(ValueError, match="JSON-able"):
        ShardedIndex.create(spark, tmp_base + "/shd", ["k"], df, n_shards=2, rows_per_partition=20)
    # casting to epoch days works and routes correctly
    from pyspark.sql import functions as F

    df2 = df.withColumn("k", F.datediff("k", F.lit("1970-01-01")))
    sh = ShardedIndex.create(spark, tmp_base + "/shd2", ["k"], df2, n_shards=2, rows_per_partition=20)
    epoch_day = (datetime.date(2024, 1, 11) - datetime.date(1970, 1, 1)).days
    assert [r.v for r in sh.get(epoch_day).collect()] == ["v10"]


def test_create_retry_after_partial_attempt(spark, tmp_base):
    """A dead create() attempt (staging and/or shard stores but no catalog)
    must not block a retry."""
    import os

    base = tmp_base + "/shp"
    os.makedirs(base + "/_bulk/__shard=0", exist_ok=True)
    os.makedirs(base + "/shard_0000", exist_ok=True)
    with open(base + "/shard_0000/_manifest.json", "w") as f:
        f.write("{}")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k int, v string")
    sh = ShardedIndex.create(spark, base, ["k"], df, n_shards=2, rows_per_partition=10)
    assert sh.count() == 20


def test_vacuum_reclaims_dead_stores_adopted_files(spark, tmp_base):
    """Replacing a bulk-loaded shard (split) then vacuuming must delete the
    dead store's adopted files under _bulk, not just its manifest dir —
    and never touch files other kept versions reference."""
    import glob
    import os

    base = tmp_base + "/shb"
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k int, v string")
    sh = ShardedIndex.create(spark, base, ["k"], df, n_shards=2, rows_per_partition=50)
    bulk_before = set(glob.glob(base + "/_bulk/**/*.parquet", recursive=True))
    assert bulk_before  # adopted layout in effect
    dead_id = sh._read_catalog()["shards"][0]["id"]
    assert sh.split_shard(dead_id)
    sh.vacuum()
    bulk_after = set(glob.glob(base + "/_bulk/**/*.parquet", recursive=True))
    assert bulk_after < bulk_before  # dead shard's adopted files reclaimed
    # the surviving shard still reads its adopted file; all data intact
    assert _keys(sh.in_order()) == list(range(100))
