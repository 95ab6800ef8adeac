"""Canonical loaders for the driver fixture tables (TESTDATA.md).

``events.parquet`` stores its ``ts`` column as a parquet timestamp whose
physical unit has differed across fixture generations (TIMESTAMP(NANOS) in
some, timestamp[us] in the current ones — verified via the parquet footer).
:func:`canonical_events` branches on the *loaded* dtype instead of assuming
either, and always exposes the same three columns:

- ``ts``     TIMESTAMP — microsecond precision, for window/date functions
- ``ts_us``  LONG      — exact microsecond epoch (DuckDB ``epoch_us`` twin)
- ``ts_ns``  LONG      — nanosecond epoch (lossless only for NANOS files;
  for micros files it is ``ts_us * 1000``, still a total order)

DuckDB reads the same column natively; oracle SQL uses ``epoch_us(ts)`` /
``epoch_ns(ts)`` to land on the identical BIGINTs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def canonical_events(df: DataFrame) -> DataFrame:
    """Normalize a raw ``events`` DataFrame to the engine's canonical
    projection (``ts`` timestamp, ``ts_us`` bigint, ``ts_ns`` bigint),
    branching on the dtype ``ts`` actually loaded as:

    - LongType: the file stored TIMESTAMP(NANOS) and was read with
      ``spark.sql.legacy.parquet.nanosAsLong`` — the long IS the ns epoch.
      Integral ``div`` keeps the µs truncation exact (float division drifts
      by 1µs on ~20% of rows).
    - Timestamp(NTZ)Type: the file stored timestamp[us] (all current
      fixtures). Under the UTC session timezone the NTZ→TZ cast is
      wall-clock-preserving, so ``unix_micros`` is the exact µs epoch and
      matches DuckDB's ``epoch_us`` on the same file.
    """
    ts_type = df.schema["ts"].dataType
    other = [c for c in df.columns if c != "ts"]
    if isinstance(ts_type, T.LongType):
        out = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    else:
        ts = F.col("ts").cast("timestamp")
        out = (
            df.withColumn("ts", ts)
            .withColumn("ts_us", F.unix_micros(ts))
            .withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
        )
    # one fixed column order for BOTH branches: positional consumers
    # (union, tuple-indexed collects, byte-compared rewrites) must not see
    # a different layout depending on which fixture generation loaded
    return out.select(*other, "ts", "ts_us", "ts_ns")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Tolerate TIMESTAMP(NANOS) fixtures (read as long); a timestamp[us]
        # file is unaffected by this conf and loads as timestamp_ntz.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        df = spark.read.parquet(path)
        if not isinstance(df.schema["ts"].dataType, T.LongType):
            # current-generation micros file: the conf played no role, so
            # restore it — leaving it flipped session-wide would silently
            # change the schema of every later NANOS parquet read. (For a
            # genuine NANOS fixture the conf must stay on: executors
            # consult it again when building the scan.)
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        return canonical_events(df)
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
