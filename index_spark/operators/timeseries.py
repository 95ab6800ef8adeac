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
    # stats is series-count-sized — categorical-small for the default
    # (event_type) and any metric-name-like key, so the broadcast keeps
    # the (series, h)-partitioned hourly table from re-shuffling on
    # series alone. A high-cardinality series (user-keyed anomaly scans)
    # should drop the hint and let AQE pick the join — same convention
    # as setjoin/graph/unigram_nll.
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


def acf_series(
    counts: DataFrame,
    group_cols,
    t_col: str,
    x_col: str,
    lags,
) -> DataFrame:
    """Per-group sample autocorrelation function over a REGULAR integer
    grid: ``counts`` holds one row per observed bucket ``(group…, t, x)``
    with integral ``t`` (hour index, day number) and integral ``x``
    (count, cents); buckets absent between the group's min and max t are
    ZERO — the natural encoding for event-count series, and what makes
    the whole estimator sparse-safe (zero terms vanish from every sum,
    so nothing is ever gap-filled).

    The standard estimator, exact to the last bit: with m = S/n over the
    full n = max−min+1 calendar,

        r(k) = Σ_{t=k+1..n} (x_t − m)(x_{t−k} − m)  /  Σ_t (x_t − m)²

    is assembled from INTEGER sufficient statistics only — multiplying
    both sides by n² clears every fraction:

        n²·num(k) = n²·P(k) − n·S·(Sh(k)+St(k)) + (n−k)·S²
        n²·den    = n²·SS − n·S²

    with P(k) = Σ x_t·x_{t−k} (a lag-k equi self-join of the NONZERO
    buckets), Sh/St the head/tail window sums, all in ``decimal(38,0)``
    (HUGEINT in the oracle twin). The only double is the final division,
    rounded to 6 — an autocorrelogram that hash-matches across engines.

    Plan shape: one hash-agg for the per-group stats, one conditional
    re-aggregation per (group, lag) for Sh/St (the lag list is a literal
    explode — |lags| is a handful), and ONE equi hash join on
    ``(group, t−k)`` for all lags at once. Nothing scales with the
    calendar length except the nonzero buckets themselves.

    Lags with k ≥ n, and groups with zero variance, yield ``acf = NULL``
    (no overlapping pairs / undefined). Returns
    ``(group…, lag INT, n BIGINT, acf DOUBLE)`` — one row per group per
    requested lag.
    """
    group_cols = list(group_cols)
    lags = [int(k) for k in lags]
    if not lags or len(set(lags)) != len(lags) or min(lags) < 1:
        raise ValueError(f"acf_series: lags must be distinct positive ints, got {lags}")
    from index_spark.operators.stats import _require_integral

    _require_integral(counts, [t_col, x_col], "acf_series")
    base = counts.groupBy(*group_cols).agg(
        F.min(t_col).alias("__mn"),
        F.max(t_col).alias("__mx"),
        (F.max(t_col) - F.min(t_col) + F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(F.col(x_col).cast("decimal(38,0)")).alias("__s"),
        F.sum(F.col(x_col).cast("decimal(38,0)") * F.col(x_col)).alias("__ss"),
    )
    # LOUD overflow guard (grouped_linear_trend contract), bounded from
    # RAW inputs — never from the decimal sums themselves, which are the
    # very things that overflow to NULL in non-ANSI Spark and would
    # silently disarm a guard that reads them (review finding). With
    # cnt = nonzero buckets and mx = max|x| (global, conservative per
    # group): SS ≤ cnt·mx², S ≤ cnt·mx, so every product below is within
    # max(n²·cnt·mx², 2·n·cnt²·mx²).
    brow = counts.agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.max(t_col) - F.min(t_col) + F.lit(1)).alias("span"),
        F.max(F.abs(F.col(x_col).cast("decimal(38,0)"))).alias("mx"),
    ).first()
    if brow["cnt"]:
        cnt, n_m = int(brow["cnt"]), int(brow["span"])
        mx = max(int(brow["mx"] or 0), 1)
        if max(n_m * n_m * cnt, 2 * n_m * cnt * cnt) * mx * mx >= 10**38:
            raise ValueError(
                f"acf_series: sufficient statistics could overflow decimal(38,0) "
                f"(calendar length={n_m}, nonzero buckets={cnt}, max |x|={mx}); "
                "coarsen the buckets or rescale x"
            )
    lag_arr = F.array(*[F.lit(k).cast("int") for k in sorted(lags)])
    # Sh/St: one conditional re-aggregation of the nonzero buckets per lag
    headtail = (
        counts.select(*group_cols, F.col(t_col).alias("__t"), F.col(x_col).alias("__x"))
        .join(base.select(*group_cols, "__mn", "__mx"), group_cols)
        .select(*group_cols, "__t", "__x", "__mn", "__mx", F.explode(lag_arr).alias("lag"))
        .groupBy(*group_cols, "lag")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__t") >= F.col("__mn") + F.col("lag"),
                        F.col("__x").cast("decimal(38,0)"),
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__sh"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__t") <= F.col("__mx") - F.col("lag"),
                        F.col("__x").cast("decimal(38,0)"),
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__st"),
        )
    )
    # P(k): lag-k products via ONE equi hash join on (group, t−k)
    probe = counts.select(
        *group_cols,
        F.explode(lag_arr).alias("lag"),
        F.col(t_col).alias("__tp"),
        F.col(x_col).cast("decimal(38,0)").alias("__xp"),
    )
    target = counts.select(
        *group_cols, F.col(t_col).alias("__tt"), F.col(x_col).cast("decimal(38,0)").alias("__xt")
    )
    pk = (
        probe.join(
            target,
            [probe[c] == target[c] for c in group_cols]
            + [probe["__tp"] - probe["lag"] == target["__tt"]],
        )
        .select(*[probe[c] for c in group_cols], probe["lag"], (F.col("__xp") * F.col("__xt")).alias("__prod"))
        .groupBy(*group_cols, "lag")
        .agg(F.sum("__prod").alias("__p"))
    )
    joined = (
        headtail.join(pk, group_cols + ["lag"], "left")
        .join(base, group_cols)
        .select(
            *group_cols,
            "lag",
            F.col("__n"),
            F.coalesce(F.col("__p"), F.lit(0).cast("decimal(38,0)")).alias("__p"),
            "__sh",
            "__st",
            "__s",
            "__ss",
        )
    )
    n = F.col("__n")
    k = F.col("lag").cast("decimal(38,0)")
    num = (
        n * n * F.col("__p")
        - n * F.col("__s") * (F.col("__sh") + F.col("__st"))
        + (n - k) * (F.col("__s") * F.col("__s"))
    )
    den = n * n * F.col("__ss") - n * (F.col("__s") * F.col("__s"))
    return joined.select(
        *group_cols,
        F.col("lag").cast("int").alias("lag"),
        n.cast("long").alias("n"),
        F.when(
            (den == F.lit(0)) | (k >= n), F.lit(None).cast("double")
        ).otherwise(F.round(num.cast("double") / den.cast("double"), 6)).alias("acf"),
    )


def _floor_div_long(col_name: str, divisor: int):
    """Exact floor division of a LONG column by a positive int literal.

    ``F.floor(col / lit(d))`` divides in DOUBLE, so for |col| > 2^53 the
    quotient can land on a neighboring block (the mapping stays monotone —
    prefix sums remain correct — but the ≤ block_size rows-per-window-task
    bound and the span > block_size² superblock-engagement math would
    drift while the docstring promises exactness to spans of 2^60).
    Spark's ``div`` is exact 64-bit integral division truncating toward
    zero; subtracting 1 when the remainder is negative (divisor > 0)
    yields true floor semantics for every long with no intermediate
    overflow (|trunc quotient| ≤ 2^62 for divisor ≥ 2).
    """
    c = F.col(col_name).cast("long")
    tq = F.expr(f"CAST(`{col_name}` AS BIGINT) div {int(divisor)}")
    return F.when((c % F.lit(int(divisor))) < 0, tq - 1).otherwise(tq).cast("long")


def cusum_changepoint(
    counts: DataFrame,
    group_cols,
    t_col: str,
    x_col: str,
    block_size: int = 1 << 20,
) -> DataFrame:
    """Per-group CUSUM change-point scan over the same sparse regular
    grid as :func:`acf_series` (one row per NONZERO bucket, zeros
    implied between min and max t): the statistic is the maximum
    deviation of cumulative mass from the uniform-in-time line,

        stat = max_{1 ≤ p < n} | S_p / S_n − p / n |,   n = max−min+1

    — a KS-style distance between "when the mass actually arrived" and
    "mass spread evenly over the window"; the argmax position is the
    change point (level shift, ramp start, burst boundary). Scaling by
    n·S_n clears every fraction: D_p = n·S_p − p·S_n is exact
    ``decimal(38,0)``, and the only double is the final division.

    Sparse-exactness trick: D is LINEAR in p across a zero gap (each
    empty bucket adds −S_n), so |D| is convex there and its maximum over
    the gap sits at a gap endpoint — evaluating D only AT each nonzero
    bucket and at the position JUST BEFORE each nonzero bucket covers
    every candidate without materializing a single zero row. Nothing
    scales with calendar length.

    Scale shape (the equidepth pre-aggregate precedent, r9): the prefix
    sum is BLOCKED so no window task is unbounded even for SPARSE
    series. Buckets fall into blocks of ``block_size`` consecutive t
    values; per-block sums aggregate map-side and the only row-level
    window is partitioned by (group, block), capping every sort task at
    ``block_size`` nonzero buckets. When the eager guard shows the
    global span exceeds block_size² (beyond which a sparse series could
    put more than block_size nonempty blocks in one group), blocks roll
    into superblocks of ``block_size`` blocks: the superblock-offset
    window holds ≤ span/block_size² rows per group (≤ 2^20 rows for any
    span up to 2^60 at the default) and the block-offset window runs
    WITHIN a superblock (≤ block_size rows); for ordinary spans the
    cheaper single block-offset window is provably bounded and the
    extra level is skipped. Group totals (S_n, min/max t) derive from
    the per-block aggregate — ``counts`` is scanned exactly twice per
    action (the block aggregate and the row-side join) plus the one-row
    eager guard, never per level.

    Ties break to the EARLIEST position. Split positions must leave both
    sides non-empty (p in [1, n−1]), so a group whose calendar has a
    single cell admits no split and is ABSENT from the output; a group
    with zero total mass returns ``stat = NULL``. Values must be integral
    and non-negative (cumulative-mass semantics). Returns
    ``(group…, n BIGINT, t_star BIGINT, stat DOUBLE)`` with ``t_star``
    the absolute bucket index of the split (mass through t_star vs
    after), stat rounded to 6.
    """
    group_cols = list(group_cols)
    from index_spark.operators.stats import _require_integral

    # pure-argument check BEFORE the eager guard aggregate: an invalid
    # block_size must fail instantly, not after a full scan of `counts`
    if block_size < 2:
        raise ValueError(f"cusum_changepoint: block_size must be ≥ 2, got {block_size}")
    _require_integral(counts, [t_col, x_col], "cusum_changepoint")
    brow = counts.agg(
        F.count(F.lit(1)).alias("nz"),
        F.min(x_col).alias("mnx"),
        # global span bounds every group's span — conservative guard
        (F.max(t_col) - F.min(t_col) + F.lit(1)).alias("span"),
        F.max(F.abs(F.col(x_col).cast("decimal(38,0)"))).alias("mx"),
        # the two-level scan joins on (group…, block): equi-joins drop
        # NULL keys where the r8 whole-group window silently grouped
        # them — refuse loudly instead of silently disagreeing (rides
        # the existing eager aggregate, no extra pass)
        F.sum(
            sum(
                (F.when(F.col(c).isNull(), 1).otherwise(0) for c in
                 [t_col, x_col, *group_cols]),
                F.lit(0),
            )
        ).alias("nulls"),
    ).first()
    if brow["nz"]:
        if int(brow["nulls"] or 0) > 0:
            raise ValueError(
                "cusum_changepoint: NULL in t/x/group columns — a "
                "bucketized series must be fully keyed; filter or "
                "fill upstream"
            )
        if int(brow["mnx"]) < 0:
            raise ValueError(
                f"cusum_changepoint: negative values (min={brow['mnx']}) — "
                "cumulative-mass change detection needs non-negative x"
            )
        span, mx = int(brow["span"]), max(int(brow["mx"] or 0), 1)
        # |D| ≤ n·S_n ≤ n²·max(x); span here is global-max, conservative
        if span * span * mx >= 10**38:
            raise ValueError(
                "cusum_changepoint: n·S_n could overflow decimal(38,0) "
                f"(calendar length={span}, max x={mx}); coarsen buckets or rescale"
            )
    d38 = "decimal(38,0)"
    base = counts.select(
        *group_cols,
        F.col(t_col).alias("__t"),
        F.col(x_col).cast(d38).alias("__x"),
        _floor_div_long(t_col, block_size).alias("__blk"),
    )
    # level 1: per-(group, block) mass + t bounds — map-side-combinable
    # hash agg. The t bounds ride along so the GROUP totals derive from
    # this tiny frame instead of a third scan of `counts` (review
    # finding: `counts` lineage is now read twice — here and as the
    # join side below — plus the eager guard; never three times).
    blk = base.groupBy(*group_cols, "__blk").agg(
        F.sum("__x").alias("__bs"),
        F.min("__t").alias("__bmn"),
        F.max("__t").alias("__bmx"),
    )
    # level 1.5: superblocks of block_size consecutive blocks. A SPARSE
    # series (≲1 nonzero bucket per block) has ~nz nonempty blocks, so a
    # single block-offset window per group would re-serialize exactly
    # what the rewrite removed (review finding). Two offset levels bound
    # every window partition instead: the block-offset window runs
    # WITHIN a superblock (≤ block_size rows), and the superblock-offset
    # window holds ≤ span/block_size² rows per group — ≤ 2^20 rows for
    # any span up to 2^60 at the default block_size. The level is
    # ENGAGED only when the already-paid eager guard shows the global
    # span can exceed block_size² nonempty blocks — the common case
    # (hour/day buckets, span ≪ 2^40) keeps the cheaper two-level plan
    # (~0.8 s of constant agg/join overhead at sf0.1 otherwise).
    need_super = bool(brow["nz"]) and int(brow["span"]) > block_size * block_size
    if need_super:
        sblk = blk.withColumn("__sblk", _floor_div_long("__blk", block_size))
        sagg = sblk.groupBy(*group_cols, "__sblk").agg(F.sum("__bs").alias("__ss"))
        w_sup = Window.partitionBy(*group_cols).orderBy("__sblk")
        soffs = sagg.select(
            *group_cols,
            "__sblk",
            F.coalesce(
                F.sum("__ss").over(w_sup.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast(d38),
            ).alias("__soff"),
        )
        # block offset = mass of earlier superblocks + mass of earlier
        # blocks within this superblock (window task ≤ block_size rows)
        w_blk = Window.partitionBy(*group_cols, "__sblk").orderBy("__blk")
        offs = (
            sblk.join(soffs, [*group_cols, "__sblk"])
            .select(
                *group_cols,
                "__blk",
                (
                    F.col("__soff")
                    + F.coalesce(
                        F.sum("__bs").over(w_blk.rowsBetween(Window.unboundedPreceding, -1)),
                        F.lit(0).cast(d38),
                    )
                ).alias("__off"),
            )
        )
    else:
        # span ≤ block_size²: nonempty blocks per group ≤ block_size —
        # one bounded block-offset window suffices
        w_blk = Window.partitionBy(*group_cols).orderBy("__blk")
        offs = blk.select(
            *group_cols,
            "__blk",
            F.coalesce(
                F.sum("__bs").over(w_blk.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast(d38),
            ).alias("__off"),
        )
    # level 2: row prefix WITHIN the block — the only row-level window,
    # partitioned by (group, block) so each sort task holds ≤ block_size
    # nonzero buckets no matter how long one group's series grows
    w_in = Window.partitionBy(*group_cols, "__blk").orderBy("__t")
    pref = base.join(offs, [*group_cols, "__blk"]).select(
        *group_cols,
        "__t",
        "__x",
        (
            F.col("__off")
            + F.sum("__x").over(w_in.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("__sp"),
    )
    # group totals via hash aggregate over the BLOCK frame + join
    # (never an unordered whole-group window, never a re-scan of counts)
    totals = blk.groupBy(*group_cols).agg(
        F.sum("__bs").alias("__sn"),
        F.min("__bmn").alias("__mn"),
        (F.max("__bmx") - F.min("__bmn") + F.lit(1)).cast(d38).alias("__n"),
    )
    if group_cols:
        rows = pref.join(totals, group_cols)
    else:
        # global series: totals is exactly one row — broadcast crossJoin
        rows = pref.crossJoin(F.broadcast(totals))
    p = (F.col("__t") - F.col("__mn") + F.lit(1)).cast(d38)
    n, sn = F.col("__n"), F.col("__sn")
    d_at = n * F.col("__sp") - p * sn  # D at the bucket itself
    d_before = n * (F.col("__sp") - F.col("__x")) - (p - F.lit(1)) * sn
    cands = rows.select(
        *group_cols,
        "__n",
        "__sn",
        "__mn",
        F.explode(
            F.array(
                F.struct(p.alias("p"), d_at.alias("d")),
                F.struct((p - F.lit(1).cast(d38)).alias("p"), d_before.alias("d")),
            )
        ).alias("c"),
    ).select(
        *group_cols, "__n", "__sn", "__mn", F.col("c.p").alias("__p"), F.abs(F.col("c.d")).alias("__ad")
    )
    valid = cands.filter(
        (F.col("__p") >= F.lit(1)) & (F.col("__p") <= F.col("__n") - F.lit(1))
    )
    # argmax with earliest-position tie-break: max over (|D|, −p) structs
    best = valid.groupBy(*group_cols).agg(
        F.max(F.struct(F.col("__ad").alias("ad"), (-F.col("__p")).alias("np"))).alias("__b"),
        F.max("__n").alias("__n2"),
        F.max("__sn").alias("__sn2"),
        F.max("__mn").alias("__mn2"),
    )
    stat = F.col("__b.ad").cast("double") / (F.col("__n2") * F.col("__sn2")).cast("double")
    return best.select(
        *group_cols,
        F.col("__n2").cast("long").alias("n"),
        (F.col("__mn2") + (-F.col("__b.np")).cast("long") - F.lit(1)).cast("long").alias("t_star"),
        F.when(
            (F.col("__sn2") == F.lit(0)) | (F.col("__n2") < F.lit(2)),
            F.lit(None).cast("double"),
        ).otherwise(F.round(stat, 6)).alias("stat"),
    )
