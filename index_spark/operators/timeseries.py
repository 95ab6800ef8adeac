"""Time-series operators: gap-fill/resample, EWMA, anomaly scoring.

Event streams are irregular; downstream consumers (feature pipelines,
dashboards, trainers on fixed-step series) want a regular grid. These are
the three standard shapes, each expressed so the whole plan stays JVM-side
and every float is a deterministic fold (the DuckDB-oracle discipline of
this repo):

- **gap-fill** — per-key regular grid (``F.sequence`` + ``explode``) left
  joined to the observed buckets, then forward-fill via
  ``last(ignorenulls)`` over an unbounded-preceding window. The grid is
  integer bucket indices, never timestamps, so the join key is a plain
  BIGINT. Scale: the explode fans out rows but each key's grid lives in
  that key's partition; the window runs inside the same hash partitioning
  the join already established — one shuffle total.
- **EWMA** — exponentially weighted moving average per key. A recursive
  definition (``s_i = a*x_i + (1-a)*s_{i-1}``) is a left fold, so both
  engines compute it as an explicit left-to-right fold over the
  time-sorted value list (Spark ``F.aggregate``, DuckDB ``list_reduce``)
  — bit-identical doubles, no window recursion needed. Scale: one
  groupBy shuffle carrying (key, ts, value); the fold is per-group and
  codegen'd.
- **z-score anomalies** — per-series moments from *integer* sums
  (counts), so mean/std are exact-input IEEE doubles; hours whose count
  deviates ≥ ``z_min`` sigmas are flagged. Two tiny aggregates and a
  broadcast-size join back.

Reference parity: the reference engine exposes ordered scans and as-of
lookups (Index.scala inOrder/find) but no resampler; these operators are
the training-pipeline extension layer (regular-grid features are what a
temporal index feeds at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def hourly_buckets(events: DataFrame, key: str = "user_id", ts_us: str = "ts_us") -> DataFrame:
    """One row per (key, hour-index) with the value of the latest event in
    that hour (deterministic: max by (ts_us, event_id))."""
    h = (F.col(ts_us) / F.lit(US_PER_HOUR)).cast("long").alias("h")
    w = Window.partitionBy(key, "h").orderBy(F.col(ts_us).desc(), F.col("event_id").desc())
    return (
        events.select(key, h, ts_us, "event_id", "value")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, "h", F.col("value").alias("v_obs"))
    )


def gapfill_forward(events: DataFrame, key: str = "user_id", ts_us: str = "ts_us") -> DataFrame:
    """Regular hourly grid per key from the key's first to last event hour,
    forward-filled with the last observed hourly value.

    Returns ``(key, h, v_fill, observed)`` — ``h`` is the BIGINT hour index
    (epoch µs div 3.6e9), ``v_fill`` the carried value (NULL only until the
    key's first non-null observation), ``observed`` 1 if the hour had an
    event — judged by the join hit, not by ``v_obs`` being non-null, so an
    hour whose latest event carries a NULL value still counts as observed.
    Plan: one shuffle on ``key`` (grid agg), the buckets join and
    the forward-fill window reuse that partitioning.
    """
    obs = hourly_buckets(events, key=key, ts_us=ts_us).withColumn("__hit", F.lit(1))
    grid = (
        obs.groupBy(key)
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(key, F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, on=[key, "h"], how="left")
        .select(
            key,
            "h",
            F.last("v_obs", ignorenulls=True).over(w).alias("v_fill"),
            F.coalesce(F.col("__hit"), F.lit(0)).alias("observed"),
        )
    )


def ewma_by_key(
    events: DataFrame,
    alpha: float = 0.25,
    key: str = "user_id",
    ts_us: str = "ts_us",
    value: str = "value",
) -> DataFrame:
    """Final EWMA of ``value`` per key, folding in time order
    (``s_0 = x_0``; ``s_i = (1-alpha)*s_{i-1} + alpha*x_i``).

    The fold is an explicit left-to-right double reduction over the
    time-sorted list — the exact shape DuckDB's ``list_reduce`` computes,
    so the oracle hash-matches bit-for-bit. Returns
    ``(key, n_events, ewma)`` with ewma rounded to 6 decimals.
    """
    a = float(alpha)
    srt = F.array_sort(F.collect_list(F.struct(ts_us, "event_id", value)))
    vals = F.transform(srt, lambda s: s[value].cast("double"))
    # no single-element special case needed: F.aggregate over the empty
    # slice returns the init value (= the sole element) already
    folded = F.aggregate(
        F.slice(vals, F.lit(2), F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a),
    )
    return events.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(folded, 6).alias("ewma"),
    )


def hourly_anomalies(
    events: DataFrame,
    z_min: float = 2.0,
    series: str = "event_type",
    ts_us: str = "ts_us",
) -> DataFrame:
    """Hours whose event count deviates ≥ ``z_min`` population sigmas from
    the series mean.

    Moments come from integer sums (m hours, S = Σn, Q = Σn²), so
    ``mean = S/m`` and ``var = Q/m - mean²`` see exact inputs; the same
    IEEE expression in the oracle lands on the same double. Returns
    ``(series, h, n, z)`` with z rounded to 6 decimals.
    """
    hourly = (
        events.select(series, (F.col(ts_us) / F.lit(US_PER_HOUR)).cast("long").alias("h"))
        .groupBy(series, "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy(series).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("m").cast("double")
    var = F.col("q").cast("double") / F.col("m").cast("double") - mean * mean
    # var == 0 (constant series) must yield z = 0, not NaN: Spark orders
    # NaN above every number, so an unguarded abs(NaN) >= z_min is TRUE
    # and every hour of a flat series would be flagged
    z = F.when(var > 0, (F.col("n").cast("double") - mean) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return (
        hourly.join(F.broadcast(stats), on=series)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) >= F.lit(float(z_min)))
        .select(series, "h", "n", "z")
    )


def ohlc_hourly(
    events: DataFrame,
    value: str = "value",
    ts_us: str = "ts_us",
    tie: str = "event_id",
    series: str = "event_type",
) -> DataFrame:
    """Per-series hourly OHLC resample (open/high/low/close + count) —
    the standard downsample for any metric stream. Open/close are the
    values at the first/last event of the hour by ``(ts, tie)`` — the
    unique tie-break makes both deterministic (and engine-portable; an
    unqualified first_value over equal timestamps is not).

    ONE shuffle: the window partitions by (series, hour) and the groupBy
    reuses that partitioning, so ranking and aggregation share a single
    exchange."""
    h = (F.col(ts_us) / F.lit(US_PER_HOUR)).cast("long")
    wa = Window.partitionBy(series, "h").orderBy(ts_us, tie)
    wd = Window.partitionBy(series, "h").orderBy(
        F.col(ts_us).desc(), F.col(tie).desc()
    )
    return (
        events.select(series, h.alias("h"), F.col(value), F.col(ts_us), F.col(tie))
        .withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rd", F.row_number().over(wd))
        .groupBy(series, "h")
        .agg(
            F.round(F.min(F.when(F.col("__ra") == 1, F.col(value))), 6).alias("open"),
            F.round(F.max(value), 6).alias("high"),
            F.round(F.min(value), 6).alias("low"),
            F.round(F.min(F.when(F.col("__rd") == 1, F.col(value))), 6).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )
