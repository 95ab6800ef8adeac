"""Round-3 batch-10: streaming MERGE sink and ANN recall evaluation."""

from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore


def test_stream_merge_into_equals_batch_argmax(spark, sf_dir, tmp_base):
    from index_spark.sources import load_table
    from index_spark.streaming import read_events_stream, stream_merge_into

    store = SnapshotStore(spark, tmp_base + "/sm")
    store.create(["user_id"])
    n = stream_merge_into(read_events_stream(spark, sf_dir), store)
    assert n >= 1
    got = {
        r.user_id: (r.last_ts_us, r.last_value)
        for r in store.latest().df.select("user_id", "last_ts_us", "last_value").collect()
    }
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    expect = {
        r.user_id: (r.ts_us, r.value)
        for r in ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    assert got == expect
    # every micro-batch committed one version; head is time-travelable
    assert store.latest_version() >= 0


def test_stream_merge_second_run_updates_not_duplicates(spark, sf_dir, tmp_base):
    """Replaying the same feed MERGEs (updates) rather than duplicating
    keys — the CDC-apply idempotence property."""
    from index_spark.streaming import read_events_stream, stream_merge_into

    store = SnapshotStore(spark, tmp_base + "/sm2")
    store.create(["user_id"])
    stream_merge_into(read_events_stream(spark, sf_dir), store)
    n_users = store.latest().df.count()
    stream_merge_into(read_events_stream(spark, sf_dir), store)
    assert store.latest().df.count() == n_users


def test_lsh_recall_bounds_and_determinism(spark, sf_dir):
    from index_spark.plans.driver_queries import q_lsh_recall

    r1 = q_lsh_recall(spark, sf_dir).collect()[0]
    r2 = q_lsh_recall(spark, sf_dir).collect()[0]
    assert (r1.n_hit, r1.recall) == (r2.n_hit, r2.recall)
    assert 0 <= r1.n_hit <= 10
    # the query vector itself is always in both top-10s -> recall > 0
    assert r1.n_hit >= 1


def test_stream_dedup_ingest_equals_batch_twin(spark, sf_dir, tmp_base):
    """A full availableNow drain of the streaming ingest-dedup must land
    on the batch incremental_near_dups answer exactly."""
    from index_spark.plans.driver_queries import q_incremental_dedup, q_stream_dedup_ingest

    batch = {
        tuple(r) for r in q_incremental_dedup(spark, sf_dir).collect()
    }
    stream = {
        tuple(r) for r in q_stream_dedup_ingest(spark, sf_dir).collect()
    }
    assert stream == batch and len(stream) > 0
