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
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
