"""Regression tests for the third round-4 review batch: as-of payload
atomicity, NULL handling in stats/bloom, skew-proof postings, funnel
broadcast removal."""

import pytest
from pyspark.sql import functions as F


def test_asof_join_carries_whole_right_row(spark):
    """NULL payload cells must not splice values from different right rows:
    the carried row is atomic (pandas merge_asof semantics)."""
    from index_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 1, 5.0, 7.0), (1, 2, None, 9.0)], "k int, ts long, a double, b double"
    )
    left = spark.createDataFrame([(1, 3)], "k int, ts long")
    out = asof_join(left, right, ["k"], "ts", "ts").collect()[0]
    assert out.a_right is None and out.b_right == 9.0  # row ts=2, intact
    assert out.ts_right == 2


def test_asof_join_tolerance_is_row_atomic(spark):
    from index_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 1, 5.0, 7.0), (1, 8, None, 9.0)], "k int, ts long, a double, b double"
    )
    left = spark.createDataFrame([(1, 10)], "k int, ts long")
    out = asof_join(left, right, ["k"], "ts", "ts", tolerance=3).collect()[0]
    # the in-tolerance match is (ts=8): its own NULL a must not be patched
    # from the out-of-tolerance ts=1 row
    assert out.a_right is None and out.b_right == 9.0 and out.ts_right == 8


def test_asof_join_ignores_null_right_ts(spark):
    from index_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, None, 9.0)], "k int, ts long, v double")
    left = spark.createDataFrame([(1, 5)], "k int, ts long")
    out = asof_join(left, right, ["k"], "ts", "ts").collect()[0]
    assert out.v_right is None and out.ts_right is None


def test_asof_join_rejects_column_collision(spark):
    from index_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, 1, 2.0)], "k int, ts long, v double")
    left = spark.createDataFrame([(1, 5, 0.0)], "k int, ts long, v_right double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "ts")


def test_grouped_percentiles_ignore_nulls_and_keep_all_null_groups(spark):
    from index_spark.operators.stats import grouped_percentile_disc

    rows = [("g", float(i)) for i in range(1, 10)] + [("g", None)] * 5 + [("h", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r.p50 for r in grouped_percentile_disc(df, ["g"], "v", [0.5]).collect()}
    assert out["g"] == 5.0  # median of 1..9, NULLs ignored
    assert out["h"] is None  # all-NULL group still present


def test_percentile_alias_collision_raises(spark):
    from index_spark.operators.stats import grouped_percentile_disc

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="collide"):
        grouped_percentile_disc(df, ["g"], "v", [0.5, 0.5])
    cols = grouped_percentile_disc(df, ["g"], "v", [0.5, 0.501]).columns
    assert len(set(cols)) == len(cols)


def test_winsorized_stats_ignore_nulls(spark):
    from index_spark.operators.stats import winsorized_stats

    rows = [("g", float(i), i) for i in range(1, 101)] + [("g", None, 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    out = winsorized_stats(df, ["g"], "v", "id", trim_frac=0.01).collect()[0]
    # NULLs neither trimmed-as-lowest nor counted: trim cut = floor(0.01*100)=1
    assert out.n_kept == 98 and out.min_kept == 2.0 and out.max_kept == 99.0


def test_exact_quantiles_ignore_nulls(spark):
    from index_spark.operators.stats import exact_quantiles

    rows = [(float(i), i) for i in range(1, 101)] + [(None, 1000 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "v double, id long")
    out = {r.p: r.value for r in exact_quantiles(df, "v", "id", [0.1, 0.5]).collect()}
    assert out[0.5] == 50.0 and out[0.1] == 10.0


def test_fixed_histogram_extreme_outlier_clamps_high(spark):
    from index_spark.operators.stats import fixed_histogram

    df = spark.createDataFrame(
        [(5,), (4 * 10**18,), (-(4 * 10**18),)], "v long"
    )
    out = {r.bucket: r.n for r in fixed_histogram(df, F.col("v"), 0, 100, 10).collect()}
    assert out == {0: 2, 9: 1}  # low outlier -> bucket 0, high -> bucket 9, no overflow


def test_bloom_build_tolerates_null_keys(spark):
    from index_spark.operators.bloom import bloom_prune

    build = spark.createDataFrame([(1,), (None,), (7,)], "k int")
    probe = spark.createDataFrame([(1,), (2,), (7,)], "k int")
    kept = {r.k for r in bloom_prune(probe, build, "k", "k").collect()}
    assert {1, 7} <= kept  # never drops true matches; NULL build key ignored


def test_build_postings_matches_window_reference(spark, documents):
    """The salted two-phase payload bound must produce byte-identical
    posting rows to the plain single-window construction."""
    from pyspark.sql import Window

    from index_spark.operators.postings import build_postings, term_doc_freqs

    docs = documents.limit(200)
    got = build_postings(docs, max_postings=5)
    td = term_doc_freqs(docs)
    w = Window.partitionBy("term").orderBy("doc_id")
    want = (
        td.withColumn("__rn", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf_total"),
            F.sort_array(
                F.collect_list(F.when(F.col("__rn") <= 5, F.col("doc_id")))
            ).alias("postings"),
        )
    )
    g = {r.term: (r.df, r.tf_total, tuple(r.postings)) for r in got.collect()}
    e = {r.term: (r.df, r.tf_total, tuple(r.postings)) for r in want.collect()}
    assert g == e


def test_funnel_counts_no_forced_broadcast(spark, sf_dir):
    from index_spark.operators.funnel import funnel_counts
    from index_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    out = funnel_counts(ev, ["view", "click", "purchase"])
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in plan.lower()
    row = out.collect()[0]
    assert row.step1_users >= row.step2_users >= row.step3_users
