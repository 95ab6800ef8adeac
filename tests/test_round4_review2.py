"""Regression tests for the second round-4 operator review batch:
probe-duplicate window counts, gapfill observed semantics, SQL literal
escaping, self-consistent repetition flags, split-leakage pre-filter."""

import pytest
from pyspark.sql import functions as F


def test_window_count_join_keeps_duplicate_probe_rows(spark):
    """Two identical probe rows must yield two output rows with each row's
    own count — not one merged row with the counts summed."""
    from index_spark.operators.interval import window_count_join

    probe = spark.createDataFrame(
        [(1, 1000), (1, 1000), (2, 1000)], "user_id int, ts_us long"
    )
    build = spark.createDataFrame(
        [(1, 400), (1, 600), (2, 900)], "user_id int, ts_us long"
    )
    out = window_count_join(probe, build, key="user_id", ts="ts_us", lookback=1000)
    rows = sorted((r.user_id, r.ts_us, r.n_window) for r in out.collect())
    assert rows == [(1, 1000, 2), (1, 1000, 2), (2, 1000, 1)]


def test_gapfill_observed_counts_null_valued_hours(spark):
    """An hour whose latest event carries a NULL value is still observed;
    v_fill carries forward across it."""
    from index_spark.operators.timeseries import US_PER_HOUR, gapfill_forward

    rows = [
        (1, 0 * US_PER_HOUR + 5, 10, 1.5),
        (1, 1 * US_PER_HOUR + 5, 11, None),  # observed, NULL value
        (1, 3 * US_PER_HOUR + 5, 12, 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts_us long, event_id int, value double")
    got = {r.h: (r.observed, r.v_fill) for r in gapfill_forward(ev).collect()}
    assert got[0] == (1, 1.5)
    assert got[1] == (1, 1.5)  # observed despite NULL value; fill carried
    assert got[2] == (0, 1.5)  # genuine gap
    assert got[3] == (1, 4.0)


def test_gapfill_first_hour_null_value(spark):
    from index_spark.operators.timeseries import US_PER_HOUR, gapfill_forward

    rows = [(1, 0 * US_PER_HOUR + 5, 10, None), (1, 1 * US_PER_HOUR + 5, 11, 2.0)]
    ev = spark.createDataFrame(rows, "user_id int, ts_us long, event_id int, value double")
    got = {r.h: (r.observed, r.v_fill) for r in gapfill_forward(ev).collect()}
    assert got[0] == (1, None)  # observed, nothing to fill yet
    assert got[1] == (1, 2.0)


def test_ewma_single_event_key(spark):
    from index_spark.operators.timeseries import ewma_by_key

    ev = spark.createDataFrame(
        [(1, 100, 1, 7.0), (2, 100, 2, 1.0), (2, 200, 3, 3.0)],
        "user_id int, ts_us long, event_id int, value double",
    )
    got = {r.user_id: (r.n_events, r.ewma) for r in ewma_by_key(ev).collect()}
    assert got[1] == (1, 7.0)
    assert got[2] == (2, round(1.0 * 0.75 + 3.0 * 0.25, 6))


def test_sql_bm25_escapes_quotes(spark):
    import duckdb

    from index_spark.operators.ranking import sql_bm25_topk

    sql = sql_bm25_topk(["o'brien", "plain"], table="d")
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 1 AS doc_id, 'the o''brien plain text' AS text")
    out = con.execute(sql).fetchall()
    assert len(out) == 1 and out[0][0] == 1


def test_repetition_passes_consistent_with_emitted_fractions(spark, documents):
    from index_spark.operators.quality import repetition_filter

    out = repetition_filter(documents.limit(300), k=2).collect()
    for r in out:
        expect = (r.top_frac is None or r.top_frac <= 0.18) and (
            r.dup_frac is None or r.dup_frac <= 0.60
        )
        assert bool(r.passes) == expect, r


def test_split_leakage_prefilter_same_result(spark, documents):
    """The cross-split pre-filter must not change results: every surviving
    pair crosses the split and meets the threshold."""
    from index_spark.operators.splits import hash_split, split_leakage

    docs = documents.limit(300)
    out = split_leakage(docs, threshold=0.5)
    tagged = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
    for r in out.collect():
        assert tagged[r.train_id] == "train" and tagged[r.val_id] == "val"
        assert r.jaccard >= 0.5


def test_decontam_short_docs_contribute_nothing(spark):
    from index_spark.operators.decontam import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "tiny doc")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta"), (101, "tiny")],
        "doc_id long, text string",
    )
    hits = ngram_contamination(docs, bench, k=5)
    got = {r.doc_id: r.n_hits for r in hits.collect()}
    assert 1 in got and 2 not in got  # short docs never collide


def test_projection_crash_then_base_advance_no_stale_mapping(spark, tmp_base):
    """The CONFIRMED review repro: refresh applies v1, crashes before the
    state commit, base advances to v2; the next refresh must retire the
    partially-applied v1 mapping, not leave it as a permanent stale hit."""
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/pa/base")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, "a", 0.0) for i in range(6)], "k long, seg string, v double"),
        rows_per_partition=5,
    )
    proj = ProjectionIndex(spark, store, tmp_base + "/pa/idx", "seg").build(rows_per_partition=5)
    v0 = proj.applied_version()

    h.insert([{"k": 2, "seg": "b", "v": 1.0}], upsert=True)  # v1: k=2 -> b
    proj.refresh()
    proj._commit_state(v0)  # crash: store applied, state reverted

    store.latest().insert([{"k": 2, "seg": "c", "v": 2.0}], upsert=True)  # v2: k=2 -> c
    assert proj.refresh() >= 1

    assert {r.k for r in proj.lookup("c").collect()} == {2}
    assert proj.lookup("b").count() == 0  # the stale ('b', 2) must be gone
    assert {r.k for r in proj.lookup("a").collect()} == {0, 1, 3, 4, 5}


def test_frame_sample_skips_empty_videos(spark):
    from index_spark.multimodal import frame_sample

    rows = [
        (1, "video", bytearray(b"x"), 49),
        (2, "video", bytearray(b"y"), 0),
        (3, "image", bytearray(b"z"), 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary, n_frames int")
    got = {(r.doc_id, r.frame_idx) for r in frame_sample(df, every_n=24).collect()}
    assert got == {(1, 0), (1, 24), (1, 48)}  # no phantom frame for doc 2


def test_canonical_events_column_order_stable(spark):
    from index_spark.sources.tables import canonical_events

    micros = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    nanos = spark.createDataFrame([(1, 1_700_000_000_000_000_000)], "event_id long, ts long")
    assert canonical_events(micros).columns == canonical_events(nanos).columns


def test_load_table_restores_nanos_conf(spark, sf_dir):
    from index_spark.sources.tables import load_table

    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    try:
        spark.conf.unset(key)
        load_table(spark, sf_dir, "events")  # micros fixture: conf restored
        assert spark.conf.get(key, None) in (None, "false")
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


def test_lookup_rows_drops_internal_version_column(spark, tmp_base):
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/lr/base")
    store.create(
        ["k"],
        df=spark.createDataFrame([(i, "a", float(i)) for i in range(10)], "k long, seg string, v double"),
        rows_per_partition=5,
    )
    proj = ProjectionIndex(spark, store, tmp_base + "/lr/idx", "seg").build(rows_per_partition=5)
    out = proj.lookup_rows("a")
    assert "__version" not in out.columns
    assert out.count() == 10
