"""Regression tests for the round-6 advisor findings fixed in round 7.

1. ``spread_for_cpu`` must not finalize an AQE plan (eagerly running
   upstream shuffle stages) when handed a post-shuffle frame — the probe
   is now guarded to shuffle-free scans.
2. ``exact_quantiles`` / ``exact_quantiles_weighted`` accept q = 0.0
   again (percentile_disc(0) = the minimum), restoring the pre-delegation
   contract.
3. The setjoin rank buckets are spelling-independent (xxhash64, not a
   2-char prefix): an adversarial corpus whose vocabulary shares one
   prefix must still produce exact brute-force-identical pairs.
"""

import pytest
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.operators.setjoin import jaccard_join_bruteforce, jaccard_join_exact
from index_spark.operators.stats import exact_quantiles, exact_quantiles_weighted


# ---------------------------------------------------------------- 1. probe


def test_plan_has_shuffle_classification(spark, documents):
    scan = documents.select("doc_id", "text").filter(F.col("doc_id") > 3)
    assert not TX._plan_has_shuffle(scan)
    agg = documents.groupBy("lang").count()
    assert TX._plan_has_shuffle(agg)
    joined = documents.join(agg, "lang")
    assert TX._plan_has_shuffle(joined)
    # column NAMES containing node words must not false-positive
    aliased = scan.select(F.col("doc_id").alias("window_count_join_sort"))
    assert not TX._plan_has_shuffle(aliased)


def test_spread_for_cpu_runs_no_jobs_on_post_shuffle_frame(spark, documents):
    """Constructing the spread frame over a shuffle-bearing plan must stay
    lazy: the old .rdd probe finalized AQE and ran the upstream stages at
    construction time. Tracked via a dedicated job group — the positive
    control (an actual action) proves the tracker sees jobs in-group."""
    sc = spark.sparkContext
    ids = documents.select("doc_id").distinct()  # shuffle-bearing
    frame = documents.join(ids, "doc_id", "left_semi")
    sc.setJobGroup("r7_probe_guard", "spread_for_cpu laziness check")
    try:
        out = TX.spread_for_cpu(frame)
        jobs_after_construct = sc.statusTracker().getJobIdsForGroup("r7_probe_guard")
        assert jobs_after_construct == [], jobs_after_construct
        n = out.count()  # positive control: the action DOES run jobs
        assert n > 0
        assert sc.statusTracker().getJobIdsForGroup("r7_probe_guard") != []
    finally:
        sc.setJobGroup(None, None)


def test_spread_for_cpu_still_widens_narrow_scans(spark, documents):
    out = TX.spread_for_cpu(documents.select("doc_id", "text"))
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    # and a post-shuffle frame comes back pinned at explicit width
    frame = documents.join(documents.select("doc_id").distinct(), "doc_id", "left_semi")
    spread = TX.spread_for_cpu(frame)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


# ------------------------------------------------------------- 2. q = 0.0


def test_exact_quantiles_accepts_q_zero(spark, lineitem):
    res = {
        r.p: r.value
        for r in exact_quantiles(lineitem, "l_quantity", "l_orderkey", [0.0, 1.0]).collect()
    }
    lo, hi = lineitem.agg(F.min("l_quantity"), F.max("l_quantity")).first()
    assert res[0.0] == lo and res[1.0] == hi


def test_exact_quantiles_weighted_accepts_q_zero(spark):
    df = spark.createDataFrame([(5, 3), (9, 1), (2, 2)], "v int, w int")
    res = {r.p: r.value for r in exact_quantiles_weighted(df, "v", "w", [0.0, 0.5, 1.0]).collect()}
    # expanded multiset: [2,2,5,5,5,9]; rank clamp gives min at q=0
    assert res[0.0] == 2 and res[0.5] == 5 and res[1.0] == 9


def test_exact_quantiles_still_rejects_out_of_range(spark):
    df = spark.createDataFrame([(1, 1)], "v int, w int")
    with pytest.raises(ValueError):
        exact_quantiles_weighted(df, "v", "w", [-0.1])
    with pytest.raises(ValueError):
        exact_quantiles_weighted(df, "v", "w", [1.1])


# ------------------------------------------------- 3. shared-prefix corpus


def test_setjoin_exact_on_shared_prefix_vocabulary(spark):
    """Every token starts with the same two characters (the advisor's
    hapax-URL shape). The hash buckets must spread them; the output must
    equal brute force exactly."""
    base = [
        "httpa httpb httpc httpd",
        "httpa httpb httpc httpe",
        "httpf httpg httph httpi",
        "httpa httpb httpz httpd",
        "httpj httpk",
        "httpj httpk",
    ]
    docs = spark.createDataFrame(list(enumerate(base)), "doc_id long, text string")
    for t in (0.5, 0.75, 1.0):
        got = {(r.id_a, r.id_b, r.jaccard) for r in jaccard_join_exact(docs, t).collect()}
        want = {(r.id_a, r.id_b, r.jaccard) for r in jaccard_join_bruteforce(docs, t).collect()}
        assert got == want, t


def test_plan_has_shuffle_sees_pandas_grouped_map(spark, documents):
    """PySpark grouped-map plans surface as FlatMapGroupsInPandas — the
    guard must classify them as shuffle-bearing or the .rdd probe would
    eagerly run their hash-partition exchange (review finding, round 7)."""
    import pandas as pd

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    gm = documents.select("lang", "doc_id").groupBy("lang").applyInPandas(
        f, schema="lang string, doc_id long"
    )
    assert TX._plan_has_shuffle(gm)
    cg = (
        documents.select("lang", "doc_id")
        .groupBy("lang")
        .cogroup(documents.select("lang", "n_chars").groupBy("lang"))
        .applyInPandas(lambda a, b: a, schema="lang string, doc_id long")
    )
    assert TX._plan_has_shuffle(cg)
