"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query at sf0.001 (smoke: >0 rows, stable schema).
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the training-data pipeline operators; each callable (spark, sf_dir) → DataFrame.
- ``oracle_sql()``: the exact ANSI-SQL twin of every query, runnable by
  DuckDB over the same parquet views.

Implementation lives in ``index_spark.plans.driver_queries`` (kept there so
the engine package owns its driver surface; this file stays a thin shim).
Determinism rules for the value-hash gate are documented in that module.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ordered-index range scan (reference §3.2) feeding broadcast
    joins and an exact-cents aggregation — revenue by nation for the order-key
    range (100, 1200], top-priced order per nation attached via window."""
    from pyspark.sql import Window

    from index_spark.index import SortedIndex
    from index_spark.sources import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")

    idx = SortedIndex(orders, ["o_orderkey"])
    scanned = idx.range(100, 1200, from_inclusive=False, to_inclusive=True)

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    joined = (
        scanned.join(F.broadcast(cust), scanned.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    per_nation = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents).cast("double") / 100).alias("revenue"),
        F.max("o_totalprice").alias("max_order_price"),
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("n_name"))
    return per_nation.select(
        "n_name", "n_orders", "revenue", "max_order_price", F.row_number().over(w).alias("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from index_spark.plans import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from index_spark.plans import build_oracles

    return build_oracles()
