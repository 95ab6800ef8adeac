"""Round-4 regression tests for the four ADVICE.md findings:

1. ``hourly_anomalies`` zero-variance guard (flat series must not flag
   every hour with z=NaN — Spark sorts NaN above all numbers).
2. ``stream_merge_into`` out-of-order batch screening (a batch carrying
   only older events must never regress a user's stored head state).
3. ``scd2_apply`` duplicate-business-key rejection + optional
   overlapping-interval guard.
4. Insert schema evolution is opt-in (unknown columns raise unless
   ``allow_new_columns=True``).
"""

import pytest
from pyspark.sql import functions as F

from index_spark.errors import DuplicatedKeysError


# ---------------------------------------------------------- 1. anomaly guard
def test_hourly_anomalies_constant_series_not_flagged(spark):
    from index_spark.operators.timeseries import hourly_anomalies

    # 5 hours x exactly 3 events each -> var = 0 -> z must be 0, not NaN
    rows = [(h * 3600_000_000 + i, "flat") for h in range(5) for i in range(3)]
    ev = spark.createDataFrame(rows, "ts_us long, event_type string")
    out = hourly_anomalies(ev, z_min=2.0).collect()
    assert out == []


def test_hourly_anomalies_mixed_series_still_detects(spark):
    from index_spark.operators.timeseries import hourly_anomalies

    # flat series + a spiky series in one frame: only the spike flags
    rows = [(h * 3600_000_000 + i, "flat") for h in range(6) for i in range(3)]
    spiky = [(h * 3600_000_000, "spiky") for h in range(6)] + [
        (5 * 3600_000_000 + i, "spiky") for i in range(1, 40)
    ]
    ev = spark.createDataFrame(rows + spiky, "ts_us long, event_type string")
    out = hourly_anomalies(ev, z_min=2.0).collect()
    assert out and all(r.event_type == "spiky" for r in out)
    assert all(r.z == r.z for r in out)  # no NaN


# ------------------------------------------------- 2. stale-batch screening
def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df.schema


def _stream(spark, path, schema):
    return spark.readStream.schema(schema).parquet(path)


def test_stream_merge_into_ignores_stale_batches(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore
    from index_spark.streaming.events import stream_merge_into

    store = SnapshotStore(spark, tmp_base + "/idx")
    store.create(["user_id"])

    schema = _write_events(
        spark, tmp_base + "/a", [(1, 100, 10, 1.0), (2, 100, 11, 2.0)]
    )
    stream_merge_into(_stream(spark, tmp_base + "/a", schema), store)

    # a later drain carrying ONLY older events must not regress the head
    _write_events(spark, tmp_base + "/b", [(1, 50, 5, 9.9), (3, 40, 4, 3.0)])
    stream_merge_into(_stream(spark, tmp_base + "/b", schema), store)

    state = {
        r.user_id: (r.last_ts_us, r.last_value)
        for r in store.latest().df.collect()
    }
    assert state[1] == (100, 1.0)  # NOT regressed to ts 50
    assert state[3] == (40, 3.0)  # genuinely-new user still inserts


def test_stream_merge_into_event_id_tiebreak(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore
    from index_spark.streaming.events import stream_merge_into

    store = SnapshotStore(spark, tmp_base + "/idx2")
    store.create(["user_id"])
    schema = _write_events(spark, tmp_base + "/a", [(1, 100, 10, 1.0)])
    stream_merge_into(_stream(spark, tmp_base + "/a", schema), store)

    # same ts, LOWER event_id -> stale; HIGHER event_id -> wins
    _write_events(spark, tmp_base + "/b", [(1, 100, 5, 5.0)])
    stream_merge_into(_stream(spark, tmp_base + "/b", schema), store)
    assert store.latest().df.first().last_value == 1.0

    _write_events(spark, tmp_base + "/c", [(1, 100, 20, 7.0)])
    stream_merge_into(_stream(spark, tmp_base + "/c", schema), store)
    assert store.latest().df.first().last_value == 7.0


# --------------------------------------------------------- 3. SCD2 guards
def test_scd2_rejects_duplicate_update_keys(spark):
    from index_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(spark.createDataFrame([(1, "gold")], "k long, seg string"))
    upd = spark.createDataFrame(
        [(1, "plat"), (1, "silver")], "k long, seg string"
    )
    with pytest.raises(DuplicatedKeysError):
        scd2_apply(dim, upd, key=["k"], tracked=["seg"], effective=5)


def test_scd2_strict_intervals_rejects_non_monotonic_effective(spark):
    from index_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(
        spark.createDataFrame([(1, "gold")], "k long, seg string"), valid_from=10
    )
    upd = spark.createDataFrame([(1, "plat")], "k long, seg string")
    with pytest.raises(ValueError, match="overlapping"):
        scd2_apply(
            dim, upd, key=["k"], tracked=["seg"], effective=10, strict_intervals=True
        )
    # strictly-later effective passes
    out = scd2_apply(
        dim, upd, key=["k"], tracked=["seg"], effective=11, strict_intervals=True
    )
    assert out.filter(F.col("valid_to").isNull()).first().seg == "plat"


# ---------------------------------------------- 4. opt-in schema evolution
def test_insert_unknown_column_raises_without_flag(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/s")
    h = store.create(
        ["k"], df=spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    bad = spark.createDataFrame([(2, 2.0, "x")], "k long, vv double, flag string")
    with pytest.raises(ValueError, match="allow_new_columns"):
        h.insert(bad, upsert=True, version="t1")
    # the same batch with the flag evolves the schema
    h2 = h.insert(bad, upsert=True, version="t2", allow_new_columns=True)
    assert {"vv", "flag"} <= set(h2.df.columns)


def test_insert_missing_columns_still_allowed(spark, tmp_base):
    # OMITTING value columns stays legal (rows read NULL there) — the gate
    # only fires on ADDED columns
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/s2")
    h = store.create(
        ["k"], df=spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    h2 = h.insert(spark.createDataFrame([(7,)], "k long"), upsert=True, version="m1")
    assert {r.k: r.v for r in h2.df.collect()} == {1: 1.0, 7: None}


# ------------------------------------ round-4 self-review (code-review) fixes
def test_sharded_insert_schema_evolution_flag_threads_through(spark, tmp_base):
    from index_spark.sharded import ShardedIndex

    sh = ShardedIndex.create(
        spark,
        tmp_base + "/sh",
        ["k"],
        spark.createDataFrame([(i, float(i)) for i in range(20)], "k long, v double"),
        n_shards=2,
        rows_per_partition=10,
    )
    with pytest.raises(ValueError, match="allow_new_columns"):
        sh.insert([{"k": 1, "v": 1.0, "flag": "x"}], upsert=True)
    sh.insert([{"k": 1, "v": 1.0, "flag": "x"}], upsert=True, allow_new_columns=True)
    row = sh.get(1).first()
    assert row.flag == "x"


def test_asof_view_refuses_delete_where(spark, tmp_base):
    from index_spark.errors import IndexError_
    from index_spark.sharded import ShardedIndex

    sh = ShardedIndex.create(
        spark,
        tmp_base + "/sh2",
        ["k"],
        spark.createDataFrame([(i, float(i)) for i in range(10)], "k long, v double"),
        n_shards=2,
        rows_per_partition=5,
    )
    t = sh.snapshot()
    view = sh.as_of(t)
    with pytest.raises(IndexError_):
        view.delete_where(F.col("k") > 0, mor=True)
    # nothing mutated: the live index still reads everything
    assert sh.count() == 10


def test_conjunctive_query_duplicate_terms(spark):
    from index_spark.operators.postings import conjunctive_query

    docs = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    got = sorted(r.doc_id for r in conjunctive_query(docs, ["b", "B", "b"]).collect())
    assert got == [1, 2]


def test_bloom_null_key_component_parity(spark):
    from index_spark.snapshots import _bloom_positions_expr, _bloom_positions_py

    df = spark.createDataFrame([(7, None)], "k long, s string")
    got = df.select(_bloom_positions_expr(["k", "s"], 4096, 3).alias("p")).first().p
    assert got == _bloom_positions_py((7, None), 4096, 3)
    # and differs from the no-null key (the skip-null trap this guards)
    df2 = spark.createDataFrame([(7, "")], "k long, s string")
    other = df2.select(_bloom_positions_expr(["k", "s"], 4096, 3).alias("p")).first().p
    assert got != other


def test_build_blooms_rejects_bad_m_bits(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/b")
    store.create(["k"], df=spark.createDataFrame([(1, 1.0)], "k long, v double"))
    with pytest.raises(ValueError, match="multiple of 8"):
        store.build_blooms(m_bits=4100)


def test_exact_quantiles_rejects_empty_qs(spark):
    from index_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([(1, 1)], "v long, k long")
    with pytest.raises(ValueError, match="at least one q"):
        exact_quantiles(df, "v", "k", [])


# ------------------------------ sharded deep-review (high effort) fixes
def _mk_sharded(spark, base, n=20, shards=2, cap=None):
    from index_spark.sharded import ShardedIndex

    return ShardedIndex.create(
        spark,
        base,
        ["k"],
        spark.createDataFrame([(i, float(i)) for i in range(n)], "k long, v double"),
        n_shards=shards,
        rows_per_partition=10,
        shard_capacity=cap,
    )


def test_sharded_reads_survive_partial_schema_evolution(spark, tmp_base):
    sh = _mk_sharded(spark, tmp_base + "/sh")
    # evolve only the shard owning small keys
    sh.insert([{"k": 0, "v": 0.5, "flag": "x"}], upsert=True, allow_new_columns=True)
    rows = {r.k: r.flag for r in sh.in_order().select("k", "flag").collect()}
    assert rows[0] == "x" and rows[19] is None and len(rows) == 20
    got = sh.get_all([0, 19]).select("k", "flag").collect()
    assert {r.k for r in got} == {0, 19}


def test_sharded_create_rejects_duplicate_keys(spark, tmp_base):
    from index_spark.errors import DuplicatedKeysError
    from index_spark.sharded import ShardedIndex

    with pytest.raises(DuplicatedKeysError):
        ShardedIndex.create(
            spark,
            tmp_base + "/dup",
            ["k"],
            spark.createDataFrame([(7, 1.0), (7, 2.0)], "k long, v double"),
            n_shards=2,
        )


def test_asof_view_refuses_compact(spark, tmp_base):
    from index_spark.errors import IndexError_

    sh = _mk_sharded(spark, tmp_base + "/sh2")
    t = sh.snapshot()
    with pytest.raises(IndexError_):
        sh.as_of(t).compact()


def test_sharded_execute_rejects_dataframe_batches(spark, tmp_base):
    from index_spark.commands import Insert

    sh = _mk_sharded(spark, tmp_base + "/sh3")
    with pytest.raises(TypeError, match="driver-side row lists"):
        sh.execute([Insert(spark.createDataFrame([(99, 9.0)], "k long, v double"))])


def test_auto_split_converges_on_big_batch(spark, tmp_base):
    sh = _mk_sharded(spark, tmp_base + "/sh4", n=10, shards=1, cap=12)
    # one batch quadruples the shard: both halves still exceed capacity;
    # auto-split must keep going until every shard is under it
    sh.insert([{"k": 100 + i, "v": float(i)} for i in range(40)])
    cat = sh._read_catalog()
    from index_spark.snapshots import SnapshotStore

    for s in cat["shards"]:
        if s["version"] is not None:
            assert SnapshotStore(spark, s["path"]).n_rows(s["version"]) < 12 * 2
    assert sh.count() == 50
    assert sh.n_shards() >= 4


def test_sharded_vacuum_reclaims_null_version_orphans(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore

    sh = _mk_sharded(spark, tmp_base + "/sh5")
    cat = sh._read_catalog()
    # simulate a failed cross-shard batch: a committed-but-unpublished
    # version in a store the catalog pins at an OLDER version
    s0 = cat["shards"][0]
    store = SnapshotStore(spark, s0["path"])
    store.latest().insert([{"k": 500, "v": 5.0}], upsert=True)  # orphan commit
    assert store.latest_version() > s0["version"]
    sh.vacuum()
    assert store.latest_version() == s0["version"]  # orphan reclaimed
    assert sh.count() == 20
