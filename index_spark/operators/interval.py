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
    # Duplicate probe rows must each keep their own output row and count: a
    # plain groupBy over all probe columns would merge identical rows and
    # SUM their window counts. Pre-aggregate the multiplicity, count
    # matches once per distinct row, then re-expand.
    pc = probe.groupBy(*[F.col(c) for c in probe.columns]).agg(
        F.count(F.lit(1)).alias("__dup")
    )
    cond = (
        (pc[key] == b["__k"])
        & (b["__ts"] >= pc[ts] - lookback)
        & (b["__ts"] < pc[ts])
    )
    joined = pc.join(b, cond)
    counts = joined.groupBy(*[pc[c] for c in probe.columns], pc["__dup"]).agg(
        F.count(F.lit(1)).alias("n_window")
    )
    return (
        counts.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__dup"))))
        .drop("__dup", "__i")
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


def band_join(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_ts: str,
    tolerance: int,
) -> DataFrame:
    """Keyless temporal proximity join: all (probe, build) pairs with
    ``|probe_ts - build_ts| <= tolerance`` — WITHOUT a nested-loop plan.

    A pure range join (no equality key) degenerates to a broadcast nested
    loop in Spark; the standard scale-out rewrite (used by every
    interval-join implementation, e.g. Flink's and Spark's own
    stream-stream join internals) is *banding*: bucket both sides by
    ``ts div tolerance``, explode the probe side to its 3 adjacent
    buckets, equi-join on the bucket, then apply the exact residual. Any
    pair within tolerance differs by at most one bucket, and each build
    row owns exactly ONE bucket, so every qualifying pair appears exactly
    once — no dedup needed.

    Plan shape at scale: one shuffle of each side hashed on the bucket
    (time-locality partitioning), probe fanout ×3 of narrow rows, and the
    residual codegen'd inside the join. Skewed hot buckets fall to AQE
    skew splitting. Columns from both inputs are preserved (probe columns
    first); callers project/aggregate downstream.
    """
    assert tolerance > 0
    pb = F.explode(
        F.array(
            F.expr(f"{probe_ts} div {tolerance} - 1"),
            F.expr(f"{probe_ts} div {tolerance}"),
            F.expr(f"{probe_ts} div {tolerance} + 1"),
        )
    ).alias("__band")
    p = probe.select(*probe.columns, pb)
    b = build.select(*build.columns, F.expr(f"{build_ts} div {tolerance}").alias("__band"))
    residual = F.abs(p[probe_ts] - b[build_ts]) <= F.lit(tolerance)
    joined = p.join(b, on=(p["__band"] == b["__band"]) & residual)
    return joined.drop(p["__band"]).drop(b["__band"])


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_width: int,
    a_start: str = "s",
    a_end: str = "e",
    b_start: str = "s",
    b_end: str = "e",
) -> DataFrame:
    """Pure interval overlap join — pairs (a, b) whose half-open intervals
    ``[s, e)`` intersect, with NO shared equi-key. The naive plan for this
    is a broadcast-nested-loop O(n·m) scan; the scalable shape is BIN
    REPLICATION: every interval is exploded to the ``bin_width``-sized
    time bins it touches, the join becomes an EQUI-join on the bin (hash
    partitioned, AQE-skew-splittable), the true overlap predicate runs as
    a residual, and each qualifying pair is emitted exactly once by
    keeping only the FIRST bin both intervals share
    (``bin == max(floor(a.s/w), floor(b.s/w))`` — the dedup trick from
    the spatial-join grid literature, DeWitt et al. 1993 PBSM).

    ``bin_width`` tunes replication: ~the typical interval length keeps
    copies per interval ≈ 2. Cost scales with bins touched, never n·m.
    Intervals must satisfy ``e > s``; rows with NULL bounds are ignored.
    Output: a's columns prefixed ``a_``, b's prefixed ``b_``."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(int(bin_width))

    def fdiv(c: "F.Column") -> "F.Column":
        # exact integer floor-division (pmod keeps it floor, not truncate,
        # for negative bounds): F.floor(c / w) goes through an IEEE double
        # quotient that can round across an integer for µs-scale epochs
        return ((c - F.pmod(c, w)) / w).cast("long")

    def binned(df: DataFrame, s: str, e: str, prefix: str) -> DataFrame:
        cols = [F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        lo = fdiv(F.col(f"{prefix}{s}"))
        # e is exclusive: an interval ending exactly on a bin edge does
        # not touch the next bin
        hi = fdiv(F.col(f"{prefix}{e}") - 1)
        return (
            df.filter(F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) > F.col(s)))
            .select(*cols)
            .withColumn("__bin", F.explode(F.sequence(lo, hi)))
            .withColumn("__lo", lo)
        )

    aa = binned(a, a_start, a_end, "a_")
    bb = binned(b, b_start, b_end, "b_")
    first_shared = F.greatest(aa["__lo"], bb["__lo"])
    pairs = aa.join(
        bb,
        (aa["__bin"] == bb["__bin"])
        & (aa["__bin"] == first_shared)
        & (F.col(f"a_{a_start}") < F.col(f"b_{b_end}"))
        & (F.col(f"b_{b_start}") < F.col(f"a_{a_end}")),
    )
    drop = ["__bin", "__lo"]
    return pairs.drop(*drop)
