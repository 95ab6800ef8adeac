"""Interval (range) joins and multi-grain time rollups.

The reference's only temporal notion is snapshot versioning
(SURVEY.md §2.5); these are the stream-table analytics the brief's
training-data pipelines need on the ``events`` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_count_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    lookback,
) -> DataFrame:
    """For each probe row, count build rows with the same ``key`` whose ``ts``
    falls in ``[probe.ts - lookback, probe.ts)`` (half-open: the probe row
    itself is excluded even when it appears in ``build``).

    Scale shape: this is an **equi-join on key with a range residual**, not a
    cross range join — Catalyst plans a shuffled/sort-merge join partitioned
    by ``key``, and the time predicate evaluates as a residual inside the
    merge. Skewed keys fall to AQE skew-join splitting. Never express this as
    a pure range join (no equality key): that degenerates to a broadcast
    nested loop.

    Returns probe columns + ``n_window`` (only probes with ≥1 match — inner
    shape; left-join + coalesce(0) for the outer variant).
    """
    b = build.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts")
    )
    cond = (
        (probe[key] == b["__k"])
        & (b["__ts"] >= probe[ts] - lookback)
        & (b["__ts"] < probe[ts])
    )
    joined = probe.join(b, cond)
    return (
        joined.groupBy(*[probe[c] for c in probe.columns])
        .agg(F.count(F.lit(1)).alias("n_window"))
    )


GRAINS = {"hour": "hour", "day": "day"}


def time_rollup(df: DataFrame, ts: str, grains: list[str], *aggs) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one output row set per
    time grain, stacked with a ``grain`` label and the bucket as epoch-µs.

    Scale shape: each grain is a partial-aggregated groupBy (map-side
    combine), and the union is plan-level — Spark runs the grains as
    independent stages over one shared scan (cache the source if the scan
    dominates). Coarser grains could fold from finer ones (hour → day) to
    save a scan; at fixture scale the shared-scan shape is simpler and the
    optimizer already prunes columns once.
    """
    parts = []
    for g in grains:
        if g not in GRAINS:
            raise ValueError(f"unsupported grain {g!r}")
        bucket = F.unix_micros(F.date_trunc(GRAINS[g], F.col(ts)))
        parts.append(
            df.groupBy(bucket.alias("bucket_us"))
            .agg(*aggs)
            .select(F.lit(g).alias("grain"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
