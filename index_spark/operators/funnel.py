"""Ordered-event analytics: funnels and first-seen cumulative counts.

Two event-stream primitives a product/behavioral pipeline runs constantly,
expressed so neither ever materializes per-user event lists:

- :func:`funnel_counts` — strictly-ordered step conversion (step i+1 must
  happen AFTER the user's earliest step i). Each stage is a conditional
  min-aggregate hashed on the user key plus a broadcast join of the
  previous stage's (user, ts) frontier — the frontier is one row per
  surviving user, orders of magnitude smaller than the event table, so
  the big side never re-shuffles after its first stage aggregate.
- :func:`first_seen_cumulative` — running distinct-user counts per day.
  The naive formulation (``count(DISTINCT user) OVER (ORDER BY day)``)
  re-scans every prior day's users per day — O(days · users) state and a
  single-reducer window at scale. The first-seen trick is exact and one
  aggregate: a user contributes to the distinct count of day d iff d is
  their FIRST day, so cumulative-distinct = running sum of first-seen
  counts — a window over one row per (type, day), driver-tiny.

Timestamps compare as ``ts_us`` (bigint epoch-µs, the canonical events
column) so the SQL oracle's ``epoch_us`` comparisons replay exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """One-row funnel summary over ``steps`` (strict temporal order).

    Columns: ``step<i>_users`` for each step (users whose earliest
    qualifying step-i event exists after their step-(i-1) time) and
    ``conv_<i>`` = step<i>/step<i-1> rounded to 6 decimals (an int/int
    double division — deterministic)."""
    assert len(steps) >= 2
    frontier = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    frontiers = [frontier]
    for step in steps[1:]:
        prev = frontiers[-1].withColumnRenamed("__t", "__prev_t")
        # no forced broadcast: the frontier is user-count-sized (every user
        # who completed the previous step) — at scale that exceeds the
        # broadcast limit and driver memory. AQE picks broadcast on its own
        # when the frontier measures small at runtime.
        frontier = (
            events.where(F.col(type_col) == step)
            .join(prev, on=user_col)
            .where(F.col(ts_col) > F.col("__prev_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        frontiers.append(frontier)
    counts = [
        f.agg(F.count(F.lit(1)).alias(f"step{i + 1}_users"))
        for i, f in enumerate(frontiers)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out.select(
        *[f"step{i + 1}_users" for i in range(len(steps))],
        *conversion_cols(len(steps)),
    )


def conversion_cols(n_steps: int) -> list:
    """``conv_<i>`` columns over ``step<i>_users`` counts, shared by the
    batch and streaming funnels (one definition — the two hash-check
    against the same SQL oracle and must never diverge). ANSI mode
    (Spark 4 default) turns x/0 into an error, not null — an empty stage
    must yield a null conversion, not kill the query (found by the
    hypothesis stream test)."""
    return [
        F.when(
            F.col(f"step{i}_users") > 0,
            F.round(
                F.col(f"step{i + 1}_users").cast("double")
                / F.col(f"step{i}_users").cast("double"),
                6,
            ),
        ).alias(f"conv_{i + 1}")
        for i in range(1, n_steps)
    ]


def first_seen_cumulative(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per (event_type, day): the number of users seen for the first time
    that day and the exact cumulative distinct-user count up to and
    including it. Returns ``(event_type, day, new_users, cum_users)`` —
    only days where at least one user debuts appear (days between them
    would repeat the previous cumulative value)."""
    first = events.groupBy(type_col, user_col).agg(
        F.min(F.to_date(ts_col)).alias("__day")
    )
    daily = first.groupBy(type_col, "__day").agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy(type_col)
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # day as ISO string: DATE round-trips through pandas as midnight
    # datetimes on one engine and dates on the other — strings hash alike
    return daily.select(
        type_col,
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period (of
    ``unit_days`` days, epoch-anchored at 1970-01-01) of their FIRST
    event; for each (cohort, offset) the row reports how many cohort
    members were active ``offset`` periods later and the retention rate
    against the cohort's size — the standard growth-analytics view
    (offset 0 is the cohort size itself by construction: every user is
    active in their first period).

    Plan shape, scale-first: raw events collapse to DISTINCT
    (user, period) immediately (one partial-agg shuffle — the only time
    event-cardinality data moves), the per-user first period is a second
    aggregate of THAT (user-cardinality), and the triangle is a
    user-keyed hash join of the two small frames plus one count
    aggregate. Nothing is per-event after the first aggregate; no
    count(DISTINCT) window. The epoch-anchored period index (integer
    ``floor(days_since_epoch / unit)``) keeps the grouping
    data-independent, so two corpora or engines cohort identically.

    Returns ``(cohort_period BIGINT, period_offset BIGINT,
    n_active BIGINT, retention DOUBLE)`` with retention rounded to 6."""
    if unit_days <= 0:
        raise ValueError("cohort_retention: unit_days must be positive")
    period = (
        F.floor(
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date"))
            / F.lit(unit_days)
        )
    ).cast("long")
    active = events.select(F.col(user_col).alias("__u"), period.alias("__p")).distinct()
    first = active.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    tri = (
        active.join(first, "__u")
        .groupBy(F.col("__cohort").alias("cohort_period"), (F.col("__p") - F.col("__cohort")).alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    # cohort size via a window over the TINY triangle (≤ periods² rows):
    # a tri.filter(offset == 0) self-join would re-plan the whole
    # active/first/tri subtree a second time per action (ReuseExchange
    # dedupes the event shuffle files, not the downstream join + agg)
    w = Window.partitionBy("cohort_period")
    size = F.max(F.when(F.col("period_offset") == 0, F.col("n_active"))).over(w)
    return tri.select(
        "cohort_period",
        "period_offset",
        "n_active",
        F.round(F.col("n_active").cast("double") / size.cast("double"), 6).alias(
            "retention"
        ),
    )


def event_cooccurrence_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Pairwise lift between event types at the USER level — the
    market-basket association view of a behavior log (lift > 1: users
    who do A over-index on B; < 1: the types repel):

        lift(A, B) = P(A ∧ B) / (P(A)·P(B)) = (n_ab · U) / (n_a · n_b)

    over the distinct-user universe U. The ratio is ONE exact integer
    fraction assembled in decimal(38,0) (HUGEINT in the oracle), so the
    only double is the final division — the same exact-fraction rule as
    ``corpusstats.pmi_top_pairs`` (its sibling: PMI is the log of this
    lift over token positions; this is user-set association).

    Plan shape: events collapse to distinct (user, type) in the FIRST
    aggregate (nothing downstream is per-event); pairs come from an equi
    self-join on the user key (each user contributes C(k,2) pairs — k is
    the per-user distinct TYPE count, bounded by the type vocabulary,
    so the join never blows up); marginals and the universe are two tiny
    re-aggregations. Type pairs are emitted once, ``type_a < type_b``.

    Returns ``(type_a, type_b, n_a BIGINT, n_b BIGINT, n_ab BIGINT,
    lift DOUBLE)`` rounded to 6; pairs that never co-occur are ABSENT
    (their lift is exactly 0 and the join never materializes them —
    callers wanting the full matrix outer-join the marginals).
    """
    ut = (
        events.filter(F.col(user_col).isNotNull() & F.col(type_col).isNotNull())
        .select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t"))
        .distinct()
    )
    # the distinct (user, type) frame feeds the eager universe count,
    # the marginals, and BOTH self-join sides — persist it for the
    # operator's own lifetime, freeze the type-vocab²-bounded result,
    # and release the cache (the conversion_latency pattern; without it
    # the events-wide distinct ran four times — review finding)
    ut = ut.persist()
    try:
        trow = ut.agg(F.count_distinct("__u").alias("u")).first()
        if not trow["u"]:
            raise ValueError("event_cooccurrence_lift: no (user, type) pairs")
        u_tot = int(trow["u"])
        marg = ut.groupBy("__t").agg(F.count(F.lit(1)).alias("__n"))
        a = ut.select(F.col("__u"), F.col("__t").alias("type_a"))
        b = ut.select(F.col("__u"), F.col("__t").alias("type_b"))
        co = (
            a.join(b, "__u")
            .filter(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("__nab"))
        )
        d38 = "decimal(38,0)"
        rows = (
            co.join(
                marg.select(F.col("__t").alias("type_a"), F.col("__n").alias("__na")),
                "type_a",
            )
            .join(
                marg.select(F.col("__t").alias("type_b"), F.col("__n").alias("__nb")),
                "type_b",
            )
            .select(
                "type_a",
                "type_b",
                F.col("__na").cast("long").alias("n_a"),
                F.col("__nb").cast("long").alias("n_b"),
                F.col("__nab").cast("long").alias("n_ab"),
                F.round(
                    (F.col("__nab").cast(d38) * F.lit(u_tot).cast(d38)).cast("double")
                    / (F.col("__na").cast(d38) * F.col("__nb").cast(d38)).cast("double"),
                    6,
                ).alias("lift"),
            )
            .collect()
        )
    finally:
        ut.unpersist()
    schema = (
        "type_a string, type_b string, n_a long, n_b long, n_ab long, lift double"
    )
    return events.sparkSession.createDataFrame(rows, schema)


def conversion_latency(
    events: DataFrame,
    from_type: str,
    to_type: str,
    ps: Sequence[float] = (0.5, 0.9),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Time-to-convert distribution: for every user whose FIRST
    ``from_type`` event precedes (or ties) their first ``to_type``
    event, the latency between the two firsts — reported as exact
    discrete percentiles (µs) plus the converting-user count. The
    product-analytics twin of the strict-order funnel: the funnel says
    HOW MANY convert, this says HOW FAST.

    Exactness AND scale: first-timestamps are integer MIN aggregates;
    latencies are integer differences; the percentiles are GLOBAL exact
    discrete quantiles, so they ride :func:`.stats.exact_quantiles`' s
    two-level bucket plan — the converting-user set can be billions of
    rows and nothing funnels it through one task (a constant-group
    window formulation here would be the classic single-partition
    WindowExec trap).

    Returns ONE row ``(n_converted BIGINT, p<..> BIGINT …)``; raises if
    no user converts (an empty latency distribution has no percentiles).
    """
    from index_spark.operators.stats import _pct_alias, exact_quantiles

    firsts = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(type_col).isin([from_type, to_type])
        )
        .groupBy(user_col)
        .agg(
            F.min(F.when(F.col(type_col) == from_type, F.col(ts_col))).alias("__f"),
            F.min(F.when(F.col(type_col) == to_type, F.col(ts_col))).alias("__t"),
        )
        .filter(F.col("__f").isNotNull() & F.col("__t").isNotNull())
        .filter(F.col("__f") <= F.col("__t"))
        .select((F.col("__t") - F.col("__f")).alias("__lat"))
    )
    # the latency frame feeds exact_quantiles' eager steps (count +
    # sketch) AND the final rank plan AND the converter count — persist
    # for the operator's own lifetime so the events scan runs once, then
    # freeze the ONE-row report and release the cache (the catalog's
    # documented one-row collect-createDataFrame pattern; measured
    # 7.6 → ~3 s on the sf0.1 catalog query)
    firsts = firsts.persist()
    try:
        try:
            q = exact_quantiles(firsts, "__lat", "__lat", list(ps))
        except ValueError as e:
            if "empty" in str(e):
                raise ValueError(
                    f"conversion_latency: no user has {from_type} before {to_type}"
                ) from e
            raise
        aliases = [_pct_alias(pv) for pv in ps]
        wide = q.agg(
            *[
                F.min(F.when(F.col("p") == F.lit(float(pv)), F.col("value")))
                .cast("long")
                .alias(a)
                for pv, a in zip(ps, aliases)
            ]
        ).first()
        n_conv = firsts.agg(F.count(F.lit(1))).first()[0]
    finally:
        firsts.unpersist()
    spark = events.sparkSession
    schema = "n_converted long, " + ", ".join(f"{a} long" for a in aliases)
    return spark.createDataFrame(
        [(int(n_conv), *[wide[a] for a in aliases])], schema
    )
