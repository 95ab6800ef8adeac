"""Round-3 batch-4 operators: BM25 ranking, point-in-time SCD2 joins,
variant JSON extraction, streaming hourly top-k — python-model checks plus
the plan properties (no token explode, equi-join shapes)."""

import io
import math
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from index_spark.operators.ranking import bm25_topk
from index_spark.operators.scd import scd2_apply, scd2_init, scd2_pit_join


# ------------------------------------------------------------- BM25
def _bm25_model(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * ((tf * (k1 + 1.0)) / (tf + (k1 * ((1.0 - b) + (b * (len(v) / avgdl))))))
        if round(s, 6) > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_python_model(spark):
    docs = [
        (1, "spark table scan fast fast fast"),
        (2, "table table table scan slow things and longer document here"),
        (3, "nothing relevant at all in this one"),
        (4, "scan"),
    ]
    terms = ["table", "scan", "fast"]
    got = {r.doc_id: r.score for r in bm25_topk(
        spark.createDataFrame(docs, "doc_id long, text string"), terms, k=10
    ).collect()}
    expect = _bm25_model(docs, terms)
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i], abs=2e-6), i
    # the no-match doc is excluded entirely
    assert 3 not in got


def test_bm25_no_token_explode(spark, documents):
    """tf comes from array filters on the tokenized row — the plan has no
    Generate (explode) and tokens never enter an Exchange."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        bm25_topk(documents, ["table", "scan", "fast"]).explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------- PIT join
def test_scd2_pit_join_model(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, "old"), (2, "stay")], "k long, seg string")
    )
    upd = spark.createDataFrame([(1, "new")], "k long, seg string")
    dim2 = scd2_apply(dim, upd, key=["k"], tracked=["seg"], effective=100)
    facts = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 150), (2, 70), (9, 10)],
        "k long, ts long",
    )
    got = {
        (r.k, r.ts): r.seg
        for r in scd2_pit_join(facts, dim2, "k", "k", "ts").select(
            facts.k, "ts", "seg"
        ).collect()
    }
    # before the flip -> old; at/after the flip boundary -> new (valid_from <= ts)
    assert got == {(1, 50): "old", (1, 100): "new", (1, 150): "new", (2, 70): "stay"}
    # left join keeps unmatched facts with NULL dims
    left = scd2_pit_join(facts, dim2, "k", "k", "ts", how="left")
    assert left.count() == 5
    assert left.filter(facts.k == 9).collect()[0].seg is None


def test_scd2_pit_join_is_equi_join(spark, sf_dir):
    """The interval test must be a residual on an equi hash join, never a
    nested-loop range join."""
    from index_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_init(
        spark.createDataFrame([(i, "s") for i in range(50)], "user_id long, seg string")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        scd2_pit_join(ev, dim, "user_id", "user_id", "ts_us").explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------- variant JSON
def test_variant_extraction_matches_and_handles_missing(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": 42, "x": 1}'), (3, '{"other": 5}'), (4, "{}")],
        "i long, props string",
    )
    kv = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    got = {r.i: r.k for r in df.select("i", kv.alias("k")).collect()}
    assert got == {1: 7, 2: 42, 3: None, 4: None}


# ------------------------------------------------------------- stream top-k
def test_hourly_topk_rank_model(spark):
    """hourly_counts works on batch frames too; the rank step must pick
    the top-3 with (n desc, event_type) determinism."""
    from pyspark.sql import Window

    from index_spark.streaming import hourly_counts

    rows = []
    eid = 0
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 5, 0, 0)
    for etype, cnt in [("a", 5), ("b", 3), ("c", 3), ("d", 1)]:
        for _ in range(cnt):
            rows.append((eid, base, 1, etype, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    h = hourly_counts(ev)
    w = Window.partitionBy("hour_us").orderBy(F.col("n").desc(), F.col("event_type").asc())
    top = (
        h.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk")
        .collect()
    )
    assert [(r.event_type, r.rnk) for r in sorted(top, key=lambda r: r.rnk)] == [
        ("a", 1),
        ("b", 2),  # tie with c broken by event_type
        ("c", 3),
    ]
