"""Structured Streaming surface: a finite stream drained with availableNow
must agree with the equivalent batch plan over the same files (the streaming
twin of the engine's DuckDB-oracle strategy)."""

import uuid

import pytest
from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore
from index_spark.sources import load_table
from index_spark.streaming import (
    hourly_counts,
    read_events_stream,
    run_available_now,
    sessionized,
    sessionized_counts,
    stream_into_snapshots,
    user_running_state,
)


def _name() -> str:
    return "t" + uuid.uuid4().hex[:12]


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_source_matches_batch(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    out = run_available_now(stream, _name(), output_mode="append")
    assert _rows(out, ["event_id", "ts_us"]) == _rows(events_batch, ["event_id", "ts_us"])


def test_hourly_counts_stream_equals_batch(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(hourly_counts(stream), _name(), output_mode="complete")
    want = hourly_counts(events_batch)
    cols = ["hour_us", "event_type", "n", "total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sessionized_stream_equals_batch_and_lag_oracle(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    sessions = run_available_now(sessionized(stream), _name(), output_mode="complete")
    got = sessions.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))
    want = sessionized_counts(events_batch)
    assert _rows(got, ["user_id", "n_sessions"]) == _rows(want, ["user_id", "n_sessions"])

    # and the session_window semantics must match the lag-based definition
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    lag_based = (
        events_batch.select(
            "user_id",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias("new_s"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"))
    )
    assert _rows(want, ["user_id", "n_sessions"]) == _rows(lag_based, ["user_id", "n_sessions"])


def test_user_running_state(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    # timer-armed drains (ProcessingTimeTimeout) never self-terminate, so
    # run_available_now waits the FULL deadline before its completion poll
    # — at the default 120 s this test spent 2 idle minutes. 15 s still
    # exceeds the actual sf0.001 processing time many times over and
    # exercises the same deadline-then-poll completion path.
    out = run_available_now(
        user_running_state(stream), _name(), output_mode="update", timeout_s=15
    )
    # one final (non-closed) update row per user per micro-batch; the last
    # row per user carries the full running count
    last = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("last_ts_us").alias("last_ts_us"))
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts_us").alias("last_ts_us")
    )
    cols = ["user_id", "n_events", "last_ts_us"]
    assert _rows(last, cols) == _rows(want, cols)


def test_stream_into_snapshots_time_travel(spark, sf_dir, tmp_base, events_batch):
    few = events_batch.select("event_id", "user_id", "ts_us").filter(F.col("user_id") < 5)
    store = SnapshotStore(spark, tmp_base + "/ev_idx")
    store.create(["event_id"], df=few.limit(0), rows_per_partition=100_000)

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1).select(
        "event_id", "user_id", "ts_us"
    ).filter(F.col("user_id") < 5)
    n_batches = stream_into_snapshots(stream, store, key=["event_id"])
    assert n_batches >= 1
    assert len(store.history()) == n_batches

    latest = store.latest()
    assert latest.count() == few.count()
    # as-of the first snapshot ts: at most the rows of the first batch
    first_ts = store.history()[0]["ts"]
    v = store.find_as_of(first_ts)
    assert v is not None
    assert store.at_version(v).count() <= few.count()


def test_watermark_drops_late_rows_across_restarts(spark, tmp_base):
    """Real late-data semantics: run 1 processes rows up to t=100s and
    persists watermark 90s in the checkpoint; run 2 (same checkpoint) sees
    a too-late row (t=20s, dropped) and an in-watermark row (t=95s,
    accepted). Also proves watermark/state recovery across restarts —
    availableNow equivalence tests cannot see either behavior."""
    src = tmp_base + "/late_src"
    ckpt = tmp_base + "/late_ckpt"

    def write_rows(rows):
        df = spark.createDataFrame(rows, "id long, ts_us long").withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
        df.coalesce(1).write.mode("append").parquet(src)
        return df.schema

    def run_once(schema):
        got: list = []
        stream = (
            spark.readStream.schema(schema).parquet(src)
            .withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.collect_list("id").alias("ids"))
            .select(F.unix_micros(F.col("w.start")).alias("start_us"), "n", "ids")
        )
        q = (
            stream.writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return got

    schema = write_rows([(1, 0), (2, 100_000_000)])
    run_once(schema)
    write_rows([(3, 20_000_000), (4, 95_000_000)])
    out2 = run_once(schema)

    seen = {r.start_us: sorted(r.ids) for r in out2}
    # in-watermark row accepted into its window
    assert 4 in seen.get(90_000_000, [])
    # too-late row (20s << watermark 90s) dropped — window never materializes
    assert 20_000_000 not in seen
    assert all(3 not in ids for ids in seen.values())


def test_user_running_state_transform_with_state(spark, sf_dir, events_batch):
    """transformWithStateInPandas twin must agree with the GroupState
    operator AND the batch aggregate. Needs the RocksDB state store;
    restore the provider afterward so other tests keep the default.
    The TWS worker protocol needs protobuf, absent from this container —
    skip there (the applyInPandasWithState operator is the tested path)."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState worker protocol needs protobuf"
    )
    from index_spark.streaming.events import user_running_state_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = run_available_now(user_running_state_tws(stream), _name(), output_mode="update")
        last = out.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"), F.max("last_ts_us").alias("last_ts_us")
        )
        want = events_batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.max("ts_us").alias("last_ts_us")
        )
        cols = ["user_id", "n_events", "last_ts_us"]
        assert _rows(last, cols) == _rows(want, cols)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_stream_join_equals_batch(spark, sf_dir, events_batch):
    """The watermarked stream-stream attribution join must emit exactly the
    pairs the same operator computes on batch inputs."""
    from index_spark.streaming import attributed_purchases

    clicks_s = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purch_s = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    got = run_available_now(
        attributed_purchases(clicks_s, purch_s), _name(), output_mode="append",
        shuffle_partitions=8,
    )
    want = attributed_purchases(
        events_batch.filter(F.col("event_type") == "click"),
        events_batch.filter(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "click_id", "purchase_id", "click_us", "purchase_us"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_dedup_collapses_doubled_feed(spark, sf_dir, events_batch):
    """Each event arrives twice (two sources over the same files); exactly
    one copy must survive dropDuplicatesWithinWatermark."""
    from index_spark.streaming import dedup_stream

    doubled = read_events_stream(spark, sf_dir).unionByName(read_events_stream(spark, sf_dir))
    out = run_available_now(dedup_stream(doubled), _name(), output_mode="append",
                            shuffle_partitions=8)
    assert _rows(out, ["event_id"]) == _rows(events_batch, ["event_id"])


def test_run_available_now_restores_shuffle_partitions(spark, sf_dir):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_events_stream(spark, sf_dir)
    run_available_now(stream, _name(), output_mode="append", shuffle_partitions=4)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_funnel_equals_batch_funnel(spark, sf_dir, events_batch):
    """Full drain of the stateful streaming funnel == the batch
    funnel_counts — same step users, same conversions."""
    import pyspark.sql.functions as F

    from index_spark.operators.funnel import funnel_counts
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import user_funnel_state

    out = run_available_now(
        user_funnel_state(read_events_stream(spark, sf_dir)),
        _name(), output_mode="update", shuffle_partitions=8,
    )
    final = out.groupBy("user_id").agg(F.max("stage").alias("stage"))
    got = {
        i: final.where(F.col("stage") >= i).count() for i in (1, 2, 3)
    }
    want = funnel_counts(events_batch, ["view", "click", "purchase"]).collect()[0]
    assert got == {1: want.step1_users, 2: want.step2_users, 3: want.step3_users}


def test_funnel_state_fn_sorts_out_of_order_batch():
    """The state fn must advance in event-time order even when Arrow hands
    it a shuffled batch: a purchase delivered first in the frame must not
    be skipped if its timestamp follows the click's."""
    import pandas as pd

    from index_spark.streaming.events import _make_funnel_fn

    class _FakeState:
        exists = False
        hasTimedOut = False
        def update(self, v): self.value = v
        @property
        def get(self): return self.value

    fn = _make_funnel_fn(("view", "click", "purchase"))
    batch = pd.DataFrame(
        {
            "ts_us": [30, 10, 20],
            "event_id": [3, 1, 2],
            "event_type": ["purchase", "view", "click"],
        }
    )
    st = _FakeState()
    out = list(fn((7,), iter([batch]), st))
    assert out[0].iloc[0]["stage"] == 3
    assert st.value == (10, 20, 30)


def test_funnel_state_fn_sorts_across_chunks():
    """A user's micro-batch may arrive as multiple Arrow chunks in
    arbitrary order: the earliest 'view' living in the SECOND chunk must
    still precede the first chunk's 'click'."""
    import pandas as pd

    from index_spark.streaming.events import _make_funnel_fn

    class _FakeState:
        exists = False
        hasTimedOut = False
        def update(self, v): self.value = v
        @property
        def get(self): return self.value

    fn = _make_funnel_fn(("view", "click", "purchase"))
    chunk1 = pd.DataFrame({"ts_us": [8], "event_id": [2], "event_type": ["click"]})
    chunk2 = pd.DataFrame({"ts_us": [5, 9], "event_id": [1, 3], "event_type": ["view", "purchase"]})
    st = _FakeState()
    out = list(fn((1,), iter([chunk1, chunk2]), st))
    assert st.value == (5, 8, 9) and out[0].iloc[0]["stage"] == 3


def test_stream_into_snapshots_second_run_same_store(spark, sf_dir, tmp_base, events_batch):
    """Checkpoint-less availableNow runs restart batch_id at 0; a second CDC
    feed into the same store must not collide on writer-version strings."""
    few = events_batch.select("event_id", "user_id", "ts_us").filter(F.col("user_id") < 3)
    store = SnapshotStore(spark, tmp_base + "/ev_idx2")
    store.create(["event_id"], df=few.limit(0), rows_per_partition=100_000)

    def feed():
        stream = read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "ts_us"
        ).filter(F.col("user_id") < 3)
        return stream_into_snapshots(stream, store, key=["event_id"])

    n1 = feed()
    n2 = feed()  # upserts the same rows again; must commit, not CommitError
    assert n1 >= 1 and n2 >= 1
    assert len(store.history()) == n1 + n2
    assert store.latest().count() == few.count()


def test_stream_into_snapshots_rejects_wrong_key(spark, sf_dir, tmp_base, events_batch):
    few = events_batch.select("event_id", "user_id", "ts_us").limit(0)
    store = SnapshotStore(spark, tmp_base + "/ev_idx3")
    store.create(["event_id"], df=few, rows_per_partition=100_000)
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts_us")
    with pytest.raises(ValueError, match="store key"):
        stream_into_snapshots(stream, store, key=["user_id"])


def test_run_available_now_start_failure_restores_conf(spark, sf_dir):
    """If start() itself throws (unwatermarked agg in append mode), the
    original error must surface — not an UnboundLocalError from the finally
    block — and the shuffle-partitions override must be rolled back."""
    from pyspark.errors import AnalysisException

    before = spark.conf.get("spark.sql.shuffle.partitions")
    bad = read_events_stream(spark, sf_dir).groupBy("event_type").count()
    with pytest.raises(AnalysisException):
        run_available_now(bad, _name(), output_mode="append", shuffle_partitions=4)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
