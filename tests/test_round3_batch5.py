"""Round-3 batch-5 operators: keyless band join, MERGE INTO, overlapping
chunking, cogroup as-of — python models, twin equivalence, plan asserts."""

import io
import math
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from index_spark.operators.interval import band_join
from index_spark.operators.segments import chunk_documents


# ------------------------------------------------------------- band join
def test_band_join_model_and_boundaries(spark):
    probe = spark.createDataFrame(
        [(1, 1000), (2, 2500), (3, 9999)], "p_id long, p_ts long"
    )
    build = spark.createDataFrame(
        [(10, 900), (11, 2000), (12, 1500), (13, 5000)], "b_id long, b_ts long"
    )
    tol = 1000
    got = sorted(
        (r.p_id, r.b_id) for r in band_join(probe, build, "p_ts", "b_ts", tol).collect()
    )
    expect = sorted(
        (p, b)
        for p, pt in [(1, 1000), (2, 2500), (3, 9999)]
        for b, bt in [(10, 900), (11, 2000), (12, 1500), (13, 5000)]
        if abs(pt - bt) <= tol
    )
    assert got == expect
    # the |dt| == tolerance boundary is inclusive: (1,1000)x(11,2000)
    assert (1, 11) in got


def test_band_join_no_duplicate_pairs_across_buckets(spark):
    # pairs straddling a bucket edge must appear exactly once
    probe = spark.createDataFrame([(1, 999), (2, 1001)], "p_id long, p_ts long")
    build = spark.createDataFrame([(7, 1000)], "b_id long, b_ts long")
    rows = band_join(probe, build, "p_ts", "b_ts", 1000).collect()
    assert sorted((r.p_id, r.b_id) for r in rows) == [(1, 7), (2, 7)]


def test_band_join_never_nested_loop(spark, sf_dir):
    from index_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").select(F.col("event_id").alias("p_id"), F.col("ts_us").alias("p_ts"))
    s = ev.filter("event_type = 'signup'").select(F.col("ts_us").alias("s_ts"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        band_join(p, s, "p_ts", "s_ts", 60_000_000).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------- MERGE INTO
def _mk_store(spark, tmp_base, rows, sub="m"):
    from index_spark.snapshots import SnapshotStore

    df = spark.createDataFrame(rows, "k long, v double")
    store = SnapshotStore(spark, f"{tmp_base}/{sub}")
    return store, store.create(["k"], df=df, rows_per_partition=100)


def test_merge_into_update_insert_delete_one_commit(spark, tmp_base):
    store, h = _mk_store(spark, tmp_base, [(i, float(i)) for i in range(10)])
    v0 = store.latest_version()
    source = spark.createDataFrame(
        [(2, 200.0), (3, 300.0), (50, 50.0), (7, -1.0)], "k long, v double"
    )
    h2 = h.merge_into(source, delete_condition=F.col("v") < 0, version="mg1")
    assert store.latest_version() == v0 + 1  # ONE commit for all three kinds
    state = {r.k: r.v for r in h2.df.select("k", "v").collect()}
    expect = {i: float(i) for i in range(10)}
    expect.update({2: 200.0, 3: 300.0, 50: 50.0})
    del expect[7]
    assert state == expect


def test_merge_into_without_delete_condition(spark, tmp_base):
    store, h = _mk_store(spark, tmp_base, [(1, 1.0)], sub="m2")
    h2 = h.merge_into(spark.createDataFrame([(1, 9.0), (2, 2.0)], "k long, v double"))
    assert {r.k: r.v for r in h2.df.select("k", "v").collect()} == {1: 9.0, 2: 2.0}


def test_merge_into_empty_store_is_insert_only(spark, tmp_base):
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/m3")
    h = store.create(["k"])
    h2 = h.merge_into(spark.createDataFrame([(5, 5.0)], "k long, v double"))
    assert [(r.k, r.v) for r in h2.df.select("k", "v").collect()] == [(5, 5.0)]


def test_merge_into_delete_of_absent_key_is_noop(spark, tmp_base):
    store, h = _mk_store(spark, tmp_base, [(1, 1.0)], sub="m4")
    src = spark.createDataFrame([(99, -1.0)], "k long, v double")
    h2 = h.merge_into(src, delete_condition=F.col("v") < 0)
    assert {r.k for r in h2.df.select("k").collect()} == {1}


# ------------------------------------------------------------- chunking
def _chunk_model(text, width, stride):
    toks = text.lower().split()
    n = len(toks)
    if n == 0:
        return []
    n_chunks = 1 + math.ceil(max(n - width, 0) / stride)
    return [
        (i, i * stride, min(n - i * stride, width), " ".join(toks[i * stride : i * stride + width]))
        for i in range(n_chunks)
    ]


@pytest.mark.parametrize("n_toks,width,stride", [(100, 64, 48), (64, 64, 48), (65, 64, 48), (10, 64, 48), (1, 4, 2), (9, 4, 4)])
def test_chunk_documents_model(spark, n_toks, width, stride):
    text = " ".join(f"t{i}" for i in range(n_toks))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.chunk_id, r.tok_start, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, width=width, stride=stride).orderBy("chunk_id").collect()
    ]
    assert got == _chunk_model(text, width, stride)
    # coverage: every token appears in at least one chunk
    covered = set()
    for _, start, n, _ in got:
        covered |= set(range(start, start + n))
    assert covered == set(range(n_toks))


def test_chunk_documents_has_no_shuffle(spark, documents):
    buf = io.StringIO()
    with redirect_stdout(buf):
        chunk_documents(documents).explain("formatted")
    assert "Exchange" not in buf.getvalue()


# ------------------------------------------------------------- cogroup asof
def test_cogroup_asof_equals_jvm_asof(spark, sf_dir):
    """The Arrow cogroup escape hatch must land on the identical answer as
    the JVM-side carry-forward asof_join (self-cogroup lineage included)."""
    from index_spark.operators.asof import asof_join, asof_join_cogroup
    from index_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts_us")
    jvm = {
        r.event_id: r.ts_us_right
        for r in asof_join(
            purchases, signups, on=["user_id"], left_ts="ts_us", right_ts="ts_us"
        ).collect()
    }
    py = {
        r.event_id: r.ts_us_right
        for r in asof_join_cogroup(
            purchases,
            signups,
            on=["user_id"],
            left_ts="ts_us",
            right_ts="ts_us",
            value_col="ts_us",
            value_type="bigint",
        ).collect()
    }
    assert jvm == py and len(jvm) > 0
