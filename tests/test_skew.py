"""Salted-join / two-phase-agg equivalence: skew mitigation must never
change results, only the shuffle shape."""

from pyspark.sql import functions as F

from index_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # 90% of rows share key 0 (the hot key), the rest spread over 1..9
    rows = [(0, i) for i in range(900)] + [(1 + i % 9, i) for i in range(100)]
    return spark.createDataFrame(rows, "k int, x int")


def test_salted_join_equals_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k int, name string")
    plain = fact.join(dim, "k").select("k", "x", "name")
    salted = salted_join(fact, dim, on=["k"]).select("k", "x", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    fact = _skewed(spark).withColumn("k", F.col("k") + 5)  # keys 5..14, dim has 0..9
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k int, name string")
    plain = fact.join(dim, "k", "left").select("k", "x", "name")
    salted = salted_join(fact, dim, on=["k"], how="left").select("k", "x", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_two_phase_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("long").alias("s")
    )
    twop = two_phase_agg(
        df,
        ["k"],
        partial=lambda: [F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")],
        final=lambda: [F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s")],
    )
    assert sorted(map(tuple, twop.collect())) == sorted(map(tuple, plain.collect()))
