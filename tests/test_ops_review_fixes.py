"""Regression tests for the operator-layer review findings (round 4):
deterministic salts, LSH parameter validation, KMV underfill/merge guards,
multiprobe completeness, metric validation."""

import pytest
from pyspark.sql import functions as F


def test_salted_join_plan_has_no_rand(spark):
    """The salt must be a deterministic row hash: rand() re-assigns rows on
    shuffle-retry recomputation, duplicating/losing them across reducers."""
    from index_spark.operators.skew import salted_join, two_phase_agg

    fact = spark.createDataFrame([(i % 3, i) for i in range(100)], "k int, v long")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    joined = salted_join(fact, dim, ["k"], salt=4)
    agg = two_phase_agg(
        fact, ["k"],
        partial=lambda: [F.count(F.lit(1)).alias("n")],
        final=lambda: [F.sum("n").cast("long").alias("n")],
        salt=4,
    )
    for df in (joined, agg):
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "rand(" not in plan, plan

    # semantics preserved vs the unsalted equivalents
    want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    got = sorted(tuple(r) for r in joined.collect())
    assert got == want
    assert {(r.k, r.n) for r in agg.collect()} == {(0, 34), (1, 33), (2, 33)}


def test_lsh_rows_validation(spark, documents):
    from index_spark.operators.dedup import minhash_candidates

    with pytest.raises(ValueError, match="divisor"):
        minhash_candidates(documents, num_hashes=16, bands=32)
    with pytest.raises(ValueError, match="divisor"):
        minhash_candidates(documents, num_hashes=16, bands=5)


def test_minhash_dedup_single_pass_matches_pairwise(spark, documents):
    """minhash_dedup (now built on the one-UDF-pass near-dup pipeline) must
    drop exactly the id_b side of every confirmed pair."""
    from index_spark.operators.dedup import minhash_dedup, minhash_near_dup_pairs

    docs = documents.limit(200)
    survivors = minhash_dedup(docs, threshold=0.5)
    confirmed = minhash_near_dup_pairs(docs, threshold=0.5)
    losers = {r.id_b for r in confirmed.select("id_b").distinct().collect()}
    kept = {r.doc_id for r in survivors.select("doc_id").collect()}
    alldocs = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept == alldocs - losers


def test_kmv_underfilled_sketch_is_exact(spark):
    from index_spark.operators.sampling import kmv_distinct

    df = spark.createDataFrame([(i % 5,) for i in range(100)], "v int")
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.est_distinct == 5 and row.k == 5


def test_kmv_merge_k_guard(spark):
    from index_spark.operators.sampling import kmv_merge_estimate, kmv_sketch

    df = spark.createDataFrame([(i,) for i in range(1000)], "v int")
    s1 = kmv_sketch(df, "v", k=32)
    s2 = kmv_sketch(df.withColumn("v", F.col("v") + 500), "v", k=32)
    with pytest.raises(ValueError, match="min build k"):
        kmv_merge_estimate([s1, s2], k=64, build_ks=[32, 32])
    est = kmv_merge_estimate([s1, s2], k=32, build_ks=[32, 32]).collect()[0]
    assert est.k == 32 and 800 <= est.est_distinct <= 2500


def test_brute_force_topk_rejects_unknown_metric(spark):
    from index_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="unknown metric"):
        brute_force_topk(df, [1.0, 0.0], metric="Cosine")
    got = brute_force_topk(df, [1.0, 0.0], k=1, metric="dot").collect()
    assert got[0].vec_id == 1


def test_lsh_multiprobe_full_radius_equals_brute_force(spark):
    """With multiprobe_hamming = n_planes every bucket is probed, so the
    LSH top-k must equal the exact brute-force top-k (previously any
    radius >= 2 silently probed only Hamming <= 1)."""
    from index_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucket,
        lsh_topk,
    )

    import math

    rows = [
        (i, [math.cos(i * 0.37 + j) for j in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0] + [0.0] * 7
    bucketed = lsh_bucket(df, dim=8, n_planes=4)
    got = lsh_topk(bucketed, q, dim=8, k=5, n_planes=4, multiprobe_hamming=4)
    want = brute_force_topk(df, q, k=5)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in want.collect()]
