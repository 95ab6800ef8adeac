"""Canonical loaders for the driver fixture tables (TESTDATA.md).

One quirk: ``events.parquet`` stores TIMESTAMP(NANOS), which Spark 4 refuses
to read natively (PARQUET_TYPE_ILLEGAL). The loader flips the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` and exposes BOTH representations:

- ``ts_ns``  LONG   — exact nanosecond epoch (lossless, the sort/compare key)
- ``ts``     TIMESTAMP — microsecond-truncated, for window/date functions

DuckDB reads the same column as TIMESTAMP_NS; oracle SQL uses
``epoch_ns(ts)`` to land on the identical BIGINT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ts_us matches DuckDB's epoch_us(ts): DuckDB truncates the parquet
        # NANOS column to microseconds on read. Integral `div` keeps the
        # division exact — float division drifts by 1µs on ~20% of rows.
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    key: list[str],
    buckets: int,
    path: str,
) -> DataFrame:
    """Co-located join layout: write ``df`` hash-bucketed and sorted by the
    join key. Two tables bucketed the same way sort-merge-join with NO
    shuffle exchange on either side — at 100 TB the recurring fact-fact
    join (e.g. orders x lineitem) pays its shuffle once at write time and
    never again. External table at ``path``; the metastore entry carries
    the bucket metadata (Spark cannot read bucket layout back from bare
    parquet). The moral equivalent of the reference keeping both indexes
    sorted by the same key so a merge walk needs no re-sort."""
    (
        df.write.mode("errorifexists")
        .bucketBy(buckets, *key)
        .sortBy(*key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)
