"""Exact grouped order statistics without a global sort.

``grouped_percentile_disc`` gives exact discrete percentiles (the
``percentile_disc`` semantic: smallest value whose rank ≥ ⌈p·n⌉) per
group with ONE shuffle hashed on the group key; ordering happens inside
each group's partition via a window, so no stage ever funnels the table
through a single reducer (contrast a naive ``orderBy(value)`` global-sort
median). For a SINGLE global percentile over a huge table, prefer the
two-level bucket-count plan used by ``split_median``
(``driver_queries.q_split_median``) — this module is the grouped case,
where per-group cardinalities are partition-sized.

Exactness over sketches is deliberate: the results are
driver-hash-verifiable against a SQL oracle, which ``approx_percentile``
style sketches can never be.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def grouped_percentile_disc(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
) -> DataFrame:
    """Per-group exact discrete percentiles: for each p in ``ps``, the
    smallest ``value_col`` whose within-group rank ≥ ⌈p·n⌉, returned as a
    ``p<percent>`` column. Ties in the value produce deterministic output
    (equal values are interchangeable at equal ranks). NULL values are
    ignored (``percentile_disc`` semantics — they neither rank nor count);
    a group whose values are ALL NULL still appears, with NULL percentiles.
    """
    group_cols = list(group_cols)
    aliases = [_pct_alias(p) for p in ps]
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"percentile labels collide: {aliases}")
    w_rank = Window.partitionBy(*group_cols).orderBy(value_col)
    w_all = Window.partitionBy(*group_cols)
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    # min(value | rank >= ceil(p*n)) == the value AT rank ceil(p*n),
    # because values are non-decreasing in rank
    aggs = [
        F.min(
            F.when(
                F.col("__rn") >= F.ceil(F.lit(float(p)) * F.col("__n")), F.col(value_col)
            )
        ).alias(a)
        for p, a in zip(ps, aliases)
    ]
    got = ranked.groupBy(*group_cols).agg(*aggs)
    return df.select(*group_cols).distinct().join(got, on=group_cols, how="left")


def _pct_alias(p: float) -> str:
    """Column label for percentile p: p50 for integral percents, p50_5 for
    fractional ones — round()ing alone collides 0.5 with 0.501."""
    pct = float(p) * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"p{round(pct):02d}"
    return "p" + repr(pct).replace(".", "_")


def profile_columns(df: DataFrame, cols: Sequence[tuple[str, "F.Column"]]) -> DataFrame:
    """One-pass data profiling: per listed column its null count, exact
    distinct count, and min/max (stringified). ``cols`` maps output names
    to already-canonicalized expressions (money as integer cents, time as
    epoch-µs) so the stringification is engine-portable — profiling raw
    doubles would hash-diverge on formatting.

    Plan: a SINGLE aggregate over one scan (the multiple exact distincts
    expand the input ``len(cols)``-way map-side — Spark's standard
    multi-distinct Expand — but nothing rescans the source), then the
    one-row result explodes into one row per column. At 100 TB this is
    the cheapest exact profile available: one pass, partial aggregation
    everywhere, output size O(columns)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{name}"),
            F.countDistinct(c).alias(f"__nd_{name}"),
            F.min(c).cast("string").alias(f"__mn_{name}"),
            F.max(c).cast("string").alias(f"__mx_{name}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{name}")).alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            F.col(f"__mn_{name}").alias("min_val"),
            F.col(f"__mx_{name}").alias("max_val"),
        )
        for name, _ in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def fixed_histogram(
    df: DataFrame, value: "F.Column", lo: int, hi: int, nbuckets: int
) -> DataFrame:
    """Equi-width histogram over integer ``value`` with FIXED bounds —
    one shuffle on the (tiny) bucket id, all-integer bucket arithmetic so
    the SQL twin is exact. Values outside [lo, hi) clamp into the edge
    buckets (profiling convention). Returns (bucket, lo_edge, n)."""
    assert hi > lo and nbuckets > 0, "need hi > lo and a positive bucket count"
    span = hi - lo
    # branch on range BEFORE the multiply: computing ((v - lo) * nbuckets)
    # on an extreme outlier overflows long first — ArithmeticException
    # under ANSI, or a silent wrap that lands a high outlier in the LOWEST
    # bucket. Outliers go straight to the edge buckets (the documented
    # clamp), which also keeps nbuckets > span configs honest: v >= hi
    # lands in bucket nbuckets-1, not hi-1's interior bucket.
    b = (
        F.when(F.col("__v") >= F.lit(hi).cast("long"), F.lit(nbuckets - 1).cast("long"))
        .when(F.col("__v") < F.lit(lo).cast("long"), F.lit(0).cast("long"))
        .otherwise(F.expr(f"((__v - {lo}L) * {nbuckets}L) div {span}L"))
    )
    return (
        df.select(value.cast("long").alias("__v"))
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            # exact boundary even when nbuckets doesn't divide the span:
            # bucket b starts at lo + floor(b*span/nbuckets), matching the
            # assignment arithmetic above (lo + b*(span//nbuckets) drifts)
            (F.lit(lo) + F.expr(f"(bucket * {span}L) div {nbuckets}L")).alias("lo_edge"),
            "n",
        )
    )


def expectations(df: DataFrame, rules: Sequence[tuple[str, "F.Column"]]) -> DataFrame:
    """Data-quality expectation check (the dbt-test / Great-Expectations
    shape): each rule is a boolean Column that should hold on every row;
    the report is one row per rule with its violation count (NULL counts
    as a violation — an unknown is not a pass).

    ONE aggregate over one scan regardless of rule count — conditional
    sums, partial aggregation everywhere, output O(rules). Referential
    rules (FK containment) need a join and live in
    :func:`fk_violations`."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((~F.coalesce(c, F.lit(False))).cast("long")).alias(f"__v_{i}")
        for i, (_, c) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{i}").alias("n_violations"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no parent.
    An anti join on the (column-pruned) parent key set — at scale the
    parent side is keys-only and the join shuffles just two key columns.
    Returns a single row (n_child, n_orphans)."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return child.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
    trim_frac: float = 0.01,
) -> DataFrame:
    """Rank-based trimmed (winsorized-style) moments per group: drop the
    lowest and highest ``⌊trim_frac·n⌋`` rows by ``(value, tie)`` rank,
    then aggregate the kept middle — the robust mean a quality-score or
    price column needs when 1% of rows are scraper garbage.

    Rank-based (not quantile-value-based) so the kept set is an exact,
    deterministic row subset in any engine: ``tie_col`` must be unique
    within a group. Same one-shuffle window shape as
    :func:`grouped_percentile_disc`. Returns (group..., n_kept,
    mean_kept, min_kept, max_kept)."""
    group_cols = list(group_cols)
    w_rank = Window.partitionBy(*group_cols).orderBy(value_col, tie_col)
    w_all = Window.partitionBy(*group_cols)
    cut = F.floor(F.lit(float(trim_frac)) * F.col("__n")).cast("long")
    # NULL values neither rank nor count (SQL aggregate semantics): under
    # nulls-first they would consume the low-end trim cut instead of
    # genuine outliers, and inflate the mean's denominator
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    kept = ranked.filter((F.col("__rn") > cut) & (F.col("__rn") <= F.col("__n") - cut))
    # mean as exact-integer-sum / count, not avg(): when value_col is an
    # integer (cents), both engines then perform ONE identical double
    # division — avg()'s internal accumulation order is engine-specific
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum(value_col).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_kept"),
        F.min(value_col).alias("min_kept"),
        F.max(value_col).alias("max_kept"),
    )


# Above this many cut points the bucket key switches from the codegen'd
# CASE tree to the constant-size-codegen binary search (see
# _adaptive_bucket_expr); the tree's generated source grows linearly and
# fails Janino compilation around ~1000 cuts.
_TREE_MAX_CUTS = 128


def _pick_n_cuts(n_rows: int, floor_cuts: int = 16, ceil_cuts: int = 4096) -> int:
    """Cut-point count sized to the data: target ~50k rows per bucket (a
    per-bucket window sort of 50k rows is noise), floor so small inputs
    still exercise the two-level shape, ceiling so the GK sketch pass
    stays cheap (codegen no longer binds: past ``_TREE_MAX_CUTS`` the
    bucket key compiles to a constant-size binary search, so the former
    1024 codegen ceiling is gone). At the ceiling a 1e9-row column gets
    ~250k-row buckets; the 0.002 rel_err floor means buckets can run
    ~8× uneven up there — balance only, never results. Columns beyond
    ~1e11 rows should pre-aggregate to (value, weight) first."""
    return max(floor_cuts, min(ceil_cuts, n_rows // 50_000))


def _adaptive_bucket_expr(
    src: DataFrame,
    value_col: str,
    n_cuts: int,
    rel_err: float | None = None,
    n_rows: int | None = None,
) -> "F.Column":
    """Data-adaptive range-bucket key for two-level exact-rank plans: cut
    points are the ``n_cuts``-quantiles of ``value_col`` from ONE
    distributed Greenwald-Khanna sketch pass (``approxQuantile``), and the
    returned Column maps a value to the count of cut points ≤ it — a
    monotone bucket ordinal in ``[0, n_cuts]``. Monotone-in-value +
    equal-values-share-a-bucket is all downstream rank arithmetic needs;
    cut-point PRECISION only affects bucket balance, never results (hence
    the loose default ``rel_err`` — a rank error of 1/(2·n_cuts) at most
    triples a bucket, and the sketch cost is inverse in the error).

    This replaces the fixed ``floor(value / 4096)`` key, which degenerates
    to ONE bucket (= the global single-task sort the two-level plan
    exists to avoid) whenever the column's domain spans less than the
    width — status codes, ratings, percentages, any double in [0, 1).
    Residual caveat (shared with any value-keyed bucketing): a single
    value holding ≫ 1/n_cuts of the rows concentrates its bucket —
    pre-aggregate such columns to (value, weight) instead."""
    if rel_err is None:
        rel_err = min(0.02, max(0.002, 0.5 / n_cuts))
    # the sketch only needs enough rows for BALANCE, so on large inputs
    # (known via the caller's count) sketch a fixed-size sample: the scan
    # I/O is the same columnar read either way, but the per-row GK insert
    # work drops to a constant ~2M rows. Fixed seed: cut placement only
    # moves bucket boundaries, but a reproducible plan is easier to debug.
    sample_target = 2_000_000
    if n_rows is not None and n_rows > 2 * sample_target:
        src = src.sample(False, sample_target / n_rows, seed=42)
    probs = [i / n_cuts for i in range(1, n_cuts)]
    cuts = sorted(set(src.stat.approxQuantile(value_col, probs, rel_err)))
    if not cuts:
        return F.lit(0).cast("long")
    if len(cuts) > _TREE_MAX_CUTS:
        return _bucket_search_expr(cuts, value_col)
    return _bucket_tree_expr(cuts, value_col)


def _bucket_search_expr(cuts, value_col: str) -> "F.Column":
    """Count of cuts ≤ value as a branchless binary search against ONE
    Literal array: `pos` stays the count of cuts ≤ v as the probe
    distance halves. Codegen size is CONSTANT in len(cuts) (the array is
    a single constant reference and the aggregate lambda is a loop),
    unlike the CASE tree, whose generated source grows linearly and
    FAILS Janino compilation around ~1000 cuts — the whole stage then
    falls back to interpreted eval (measured at 1023 cuts × 5M rows:
    tree 1.66 s w/ compile failure vs 0.75 s here; ordinals verified
    identical across interior, boundary-equality, NaN and ±1e18 inputs —
    Spark orders NaN above all doubles on BOTH paths)."""
    v = F.col(value_col).cast("double")
    n = len(cuts)
    arr = F.lit([float(c) for c in cuts])
    powers = []
    p = 1
    while p <= n:
        powers.append(p)
        p <<= 1
    powers.reverse()
    return F.aggregate(
        F.lit(powers),
        F.lit(0),
        lambda acc, step: F.when(
            (acc + step <= F.lit(n))
            & (F.element_at(arr, (acc + step).cast("int")) <= v),
            acc + step,
        ).otherwise(acc),
    ).cast("long")


def _bucket_tree_expr(cuts, value_col: str) -> "F.Column":
    """Count of cuts ≤ value as a balanced CASE-WHEN tree = binary search
    compiled into codegen'd nested if/else: each row evaluates
    O(log n_cuts) comparisons, not O(n_cuts) (a flat filter/sum over a
    256-element literal array costs ~10× the whole downstream
    aggregation; measured 4.0 s vs 0.3 s on a 150k-row single-partition
    column). Kept for small cut counts where the fully-codegen'd branches
    beat the aggregate's per-row lambda dispatch."""
    v = F.col(value_col).cast("double")

    def tree(lo: int, hi: int, base: int):
        # bucket ordinal for v given cuts[lo:hi] remain, `base` already won
        if lo >= hi:
            return F.lit(base)
        mid = (lo + hi) // 2
        return F.when(
            v >= F.lit(float(cuts[mid])), tree(mid + 1, hi, base + (mid - lo) + 1)
        ).otherwise(tree(lo, mid, base))

    return tree(0, len(cuts), 0).cast("long")


def equidepth_histogram(
    df: DataFrame, value_col: str, tie_col: str, bins: int = 10
) -> DataFrame:
    """Equi-depth (equal-count) histogram with EXACT ``ntile`` semantics
    over ``(value, tie)`` → per-bin count, min, max — the bin boundaries
    a range-partitioner or CBO would derive. ``tie_col`` unique ⇒ the bin
    assignment is deterministic and engine-portable (the row split is
    rank arithmetic, identical in Spark and ANSI SQL).

    NULL values are EXCLUDED: they neither count toward ``n`` nor occupy
    a bin (``ntile`` over a non-null-filtered input). This differs from
    raw SQL ``ntile`` with nulls-first ordering, which would bin NULLs
    into bin 1 — filter-then-bin is the deterministic, engine-portable
    contract (matches :func:`exact_quantiles` / :func:`winsorized_stats`).

    TWO-LEVEL plan over the ``(value, weight)`` PRE-AGGREGATE — no
    row-level window anywhere: rows first collapse to one row per
    distinct value (a partial-agg shuffle, same move as
    :func:`exact_quantiles`), each value's exact global RANK INTERVAL
    ``(before, before + w]`` comes from range-bucketing distinct values
    on DATA-ADAPTIVE sampled cut points (:func:`_adaptive_bucket_expr`)
    plus a bounded per-bucket running weight, and a value contributes to
    exactly the bins its interval intersects (a tiny
    ``sequence(first_bin, last_bin)`` explode — at most
    ``distinct + bins`` rows corpus-wide). Per-bin counts are ntile's
    closed-form split (first ``n % bins`` bins hold ``n div bins + 1``
    rows); lo/hi are min/max over the intersecting values — identical to
    binning every raw row, because a value's rows occupy precisely its
    rank interval regardless of ``tie_col`` order.

    The pre-aggregate is what makes the plan heavy-duplicate-proof at
    100 TB: a value holding 90% of the column is ONE row here (its
    interval just spans ~90% of the bins), where the previous raw-row
    formulation concentrated 90% of the table into one bucket's
    single-task ``row_number`` window (measured: 50M-row probe, round
    8 — see BASELINE.md §(c))."""
    src = df.filter(F.col(value_col).isNotNull())
    n = src.count()
    q, r = divmod(n, bins)
    cut = r * (q + 1)
    # same reuse shape as exact_quantiles_weighted: the (value, count)
    # table feeds the sketch, the bucket totals, and the spanned-bin read —
    # persist so the full-input aggregation runs once
    merged = src.groupBy(value_col).agg(F.count(F.lit(1)).alias("__w")).persist()
    # n (pre-merge) is an upper bound on distinct values; sampling is
    # disabled because the sketch already runs over the aggregated table
    b = _adaptive_bucket_expr(merged, value_col, max(bins, _pick_n_cuts(n)), n_rows=None)
    keyed = merged.select(F.col(value_col), "__w", b.alias("__b"))
    bw = keyed.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    pre = bw.select(
        "__b", F.coalesce(F.sum("__bw").over(wb), F.lit(0)).alias("__bb")
    )
    win = Window.partitionBy("__b").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per distinct value: global rank interval (__before, __before + __w]
    iv = (
        keyed.join(F.broadcast(pre), "__b")
        .withColumn("__before", F.col("__bb") + F.coalesce(F.sum("__w").over(win), F.lit(0)))
    )
    def _idiv(a, d: int):
        # exact integer division for long Columns: double '/' loses
        # exactness once a/d's rounding error exceeds 1/d (~1e9-row ranks)
        # — subtracting the remainder first makes the quotient an exact
        # integer, which double division then returns exactly (< 2^53)
        return ((a - F.pmod(a, F.lit(d))) / F.lit(d)).cast("long")

    if q == 0:
        # fewer rows than bins: ntile gives one row per bin, bin = rank
        def bin_of(rank):
            return rank.cast("int")
    else:
        # exact integer rank→bin arithmetic (ntile's split), no doubles
        def bin_of(rank):
            return (
                F.when(rank <= F.lit(cut), _idiv(rank - 1, q + 1) + 1)
                .otherwise(F.lit(r) + _idiv(rank - F.lit(cut) - 1, q) + 1)
            ).cast("int")

    first_b = bin_of(F.col("__before") + 1)
    last_b = bin_of(F.col("__before") + F.col("__w"))
    spanned = iv.select(
        F.col(value_col),
        F.explode(F.sequence(first_b, last_b)).alias("bin"),
    )
    n_of_bin = F.when(F.col("bin") <= F.lit(r), F.lit(q + 1)).otherwise(F.lit(q))
    if q == 0:
        n_of_bin = F.lit(1)
    return spanned.groupBy("bin").agg(
        F.max(n_of_bin).cast("long").alias("n"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    qs: Sequence[float],
    n_cuts: int | None = None,
) -> DataFrame:
    """Exact discrete quantiles of a huge column WITHOUT a global
    single-reducer sort — the multi-quantile generalization of the
    two-level split-median plan (``driver_queries.q_split_median``):

    1. pre-aggregate to (value, count) — one partial-agg shuffle that
       also collapses heavy-duplicate columns to one row per value;
    2. bucket values on DATA-ADAPTIVE sampled cut points
       (:func:`_adaptive_bucket_expr`, so narrow domains like [0, 100)
       still spread across buckets) — the tiny bucket table's cumulative
       count locates, for EVERY requested rank ``⌈q·n⌉`` at once, the
       one bucket containing it;
    3. a bounded per-bucket running count reads the value at each rank.

    Nothing funnels the full table through one task; cost is one count,
    one sketch pass, one agg shuffle, and one bounded per-bucket sort —
    at 100 TB this is THE way to get exact percentiles
    (``percentile_disc`` semantics: value at rank ``⌈q·n⌉``).
    ``tie_col`` is retained for API compatibility only (a deterministic
    per-row ranking needed it; the value at a global rank is
    tie-invariant — which is exactly why this DELEGATES to
    :func:`exact_quantiles_weighted` over the (value, count) pre-aggregate:
    the value at multiset rank ``⌈q·n⌉`` is a pure function of the value
    multiset, so one rank engine serves both forms (and the groupBy
    shrinks heavy-duplicate columns before any window ever runs).
    Returns (p DOUBLE, value) one row per requested q."""
    if not qs:
        raise ValueError("exact_quantiles needs at least one q")
    # percentile_disc ignores NULLs: they must neither count toward n nor
    # occupy the nulls-first ranks (a NULL-bucket hit would also silently
    # drop its q from the output — the NULL bucket key joins nothing)
    src = df.filter(F.col(value_col).isNotNull())
    # the (value, count) pre-aggregate is the ONLY full-input pass, but the
    # delegate consumes it four times (weight validation, GK sketch, bucket
    # totals, per-bucket rank read) — each a separate action, so nothing
    # reuses the exchange across them. Persist it: every pass after the
    # first reads the distinct-value table from cache instead of re-running
    # the full-input shuffle (measured 10.2 → ~4 s at a 15M-row probe, r12).
    # The cache entry lives with the returned lazy plan (module convention:
    # Spark LRU-evicts; spark.catalog.clearCache() is the escape hatch).
    merged = src.groupBy(value_col).agg(F.count(F.lit(1)).alias("__wq")).persist()
    try:
        return exact_quantiles_weighted(merged, value_col, "__wq", qs, n_cuts)
    except ValueError as e:
        if "empty" in str(e):
            raise ValueError("exact_quantiles of an empty (or all-NULL) column") from e
        raise


def exact_quantiles_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[float],
    n_cuts: int | None = None,
) -> DataFrame:
    """Exact discrete quantiles over a PRE-AGGREGATED ``(value, weight)``
    table: the value at rank ``⌈q·W⌉`` of the expanded multiset, where
    ``W = Σ weight`` — ``percentile_disc`` over the original rows without
    ever materializing them. This is the documented scale path for
    heavy-duplicate columns (:func:`exact_quantiles`'s caveat): a value
    holding 90% of a 100 TB column is ONE row here, so no bucket can
    concentrate.

    Same two-level shape as :func:`exact_quantiles`, with weights in
    place of row counts: duplicate values first combine (one partial-agg
    shuffle), buckets come from the adaptive cut points over the DISTINCT
    value table, the tiny bucket table's cumulative WEIGHT locates each
    target rank's bucket, and a bounded per-bucket running weight reads
    the answering value (first value whose cumulative weight reaches the
    rank). NULL values are ignored; NULL, non-positive, fractional, or
    uncastable weights raise (silently dropping or truncating a weight
    would skew every rank after the bad row).

    Returns ``(p DOUBLE, value)``, one row per requested q."""
    import math

    if not qs:
        raise ValueError("exact_quantiles_weighted needs at least one q")
    bad_q = [q for q in qs if not (0.0 <= float(q) <= 1.0)]
    if bad_q:
        # an out-of-range q would produce a rank beyond W that no row can
        # answer — its output row would just be silently absent. q = 0.0
        # IS accepted: percentile_disc(0) is well-defined (the minimum),
        # realized below by the max(1, ceil(q·W)) rank clamp.
        raise ValueError(f"exact_quantiles_weighted: qs must lie in [0, 1]: {bad_q}")
    w0 = F.col(weight_col)
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col), w0.cast("long").alias("__w")
    )
    # one validation aggregate over the same filtered frame: NULL weights
    # hide from min(), and cast('long') silently truncates fractional or
    # NULLs-out uncastable weights — flag all three by round-tripping the
    # cast against the original column
    w_bad = F.sum(
        F.when(
            w0.isNull()
            | w0.cast("long").isNull()
            | (w0.cast("long").cast(df.schema[weight_col].dataType) != w0),
            1,
        ).otherwise(0)
    )
    tot = df.filter(F.col(value_col).isNotNull()).agg(
        F.sum(w0.cast("long")).alias("W"),
        F.min(w0.cast("long")).alias("wmin"),
        F.count(F.lit(1)).alias("rows"),
        w_bad.alias("n_bad"),
    ).first()
    if tot["rows"] == 0:
        raise ValueError("exact_quantiles_weighted of an empty (or all-NULL) table")
    if tot["n_bad"]:
        raise ValueError(
            f"exact_quantiles_weighted: {tot['n_bad']} weight(s) are NULL, "
            "fractional, or not castable to long — weights must be exact "
            "positive integers"
        )
    if tot["wmin"] is None or tot["wmin"] <= 0:
        raise ValueError(
            f"exact_quantiles_weighted: weights must be positive non-NULL "
            f"(min weight seen: {tot['wmin']!r})"
        )
    W, n_rows = int(tot["W"]), int(tot["rows"])
    rank_of = {float(q): max(1, math.ceil(float(q) * W)) for q in qs}
    targets = sorted(set(rank_of.values()))
    # consumed by three separate actions/branches (the GK sketch, the
    # bucket-totals cumulative, the per-bucket rank read) — persist so only
    # the first evaluates the input aggregation; see exact_quantiles
    merged = src.groupBy(value_col).agg(F.sum("__w").alias("__w")).persist()
    # n_rows (pre-merge) sizes the cut count as an upper bound on the
    # merged row count; sampling is DISABLED (n_rows=None) because the
    # sketch runs over the already-aggregated distinct-value table, whose
    # row count the pre-merge figure can overstate arbitrarily
    b = _adaptive_bucket_expr(
        merged, value_col, int(n_cuts or _pick_n_cuts(n_rows)), n_rows=None
    )
    keyed = merged.select(F.col(value_col), "__w", b.alias("__b"))
    bw = keyed.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    cum = bw.withColumn("__before", F.coalesce(F.sum("__bw").over(wb), F.lit(0)))
    hit_any = None
    for t in targets:
        cond = (F.col("__before") < t) & (F.col("__before") + F.col("__bw") >= t)
        hit_any = cond if hit_any is None else (hit_any | cond)
    hits = cum.filter(hit_any).select("__b", "__before")
    win = Window.partitionBy("__b").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = (
        keyed.join(F.broadcast(hits), "__b")
        .withColumn("__cw", F.col("__before") + F.sum("__w").over(win))
    )
    spark = df.sparkSession
    want = spark.createDataFrame(
        [(p, r) for p, r in rank_of.items()], "p double, __rank long"
    )
    # first value whose cumulative weight reaches the rank: each row covers
    # the rank interval (cw - w, cw], and the target ranks are a small
    # LITERAL array — a per-row array filter + explode reads every
    # answering (rank, value) pair with no join at all (a range join here
    # would plan as a BroadcastNestedLoopJoin). Each rank matches exactly
    # one row: cumulative weight is strictly increasing under positive
    # weights.
    targets_arr = F.array(*[F.lit(t).cast("long") for t in targets])
    at_rank = cw.select(
        F.explode(
            F.filter(
                targets_arr,
                lambda t: (t > F.col("__cw") - F.col("__w")) & (t <= F.col("__cw")),
            )
        ).alias("__rank"),
        F.col(value_col).alias("value"),
    )
    return want.join(F.broadcast(at_rank), "__rank").select("p", "value")


def ks_drift(
    a: DataFrame, b: DataFrame, value_col: str, n_cuts: int | None = None
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between ``a`` and ``b`` on
    ``value_col`` — the standard drift check between two snapshots of a
    table (did the distribution of prices/lengths/scores move?).

    D = max over observed values of |F_a(x) - F_b(x)| with F the empirical
    CDF. Computed relationally and TWO-LEVEL (no global single-task sort):
    per-value counts per side, full-outer merge on the value, then the
    running cumulative counts come from range-bucketing the distinct
    values on DATA-ADAPTIVE cut points (sampled quantiles of side ``a``
    via :func:`_adaptive_bucket_expr`, so a domain packed into [0, 1)
    still spreads across buckets; ``n_cuts`` sizes the cut-point set) —
    a tiny bucket-totals table whose cumulative
    sum gives each bucket's offset, plus a per-bucket window for the
    within-bucket running sums. The only global window is over the bucket
    table (O(n_cuts) rows), so the plan survives an unbounded value
    domain. Cut points come from ``a``'s distribution — in a drift check
    the sides are near-identical by hypothesis, and an adversarial ``b``
    only degrades bucket BALANCE, never the statistic. Integer value
    columns make the CDF fractions exact-input divisions, so the
    statistic replays bit-identically in SQL.

    NULLs are ignored on both sides (they have no place on the real
    line). Returns one row: (n_a, n_b, d_stat rounded to 6). A side with
    ZERO non-null values makes D undefined — guarded EXPLICITLY with a
    ValueError (IEEE double division would otherwise yield a silent NaN
    d_stat, which Spark orders ABOVE all doubles: a `d_stat >= x` alert
    would fire maximal drift instead of erroring)."""
    fa = a.filter(F.col(value_col).isNotNull())
    fb = b.filter(F.col(value_col).isNotNull())
    na_rows = fa.count()
    if na_rows == 0:
        raise ValueError("ks_drift: side 'a' is empty (no non-null values)")
    if fb.limit(1).count() == 0:
        raise ValueError("ks_drift: side 'b' is empty (no non-null values)")
    ca = fa.groupBy(F.col(value_col).alias("v")).agg(F.count(F.lit(1)).alias("na"))
    cb = fb.groupBy(F.col(value_col).alias("v")).agg(F.count(F.lit(1)).alias("nb"))
    # referenced by both the bucket-totals branch and the running-sum
    # branch of the final job; the static subtrees diverge after
    # bucketing, so nothing reuses the two groupBys + full-outer join at
    # runtime — persist the distinct-value merge (A/B at a 15M-row probe:
    # 5.5 → 4.8 s median, faster in every aligned pair; same module
    # cache-lifetime convention as the quantile family)
    merged = ca.join(cb, "v", "full_outer").select(
        "v",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    ).persist()
    cut_expr = _adaptive_bucket_expr(
        fa.select(F.col(value_col).alias("v")), "v",
        int(n_cuts or _pick_n_cuts(na_rows)), n_rows=na_rows,
    )
    bucketed = merged.withColumn("__b", cut_expr)
    bt = bucketed.groupBy("__b").agg(
        F.sum("na").alias("__ba"), F.sum("nb").alias("__bb")
    )
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    wb_all = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # totals ride the SAME tiny bucket table as the offsets (a separate
    # totals aggregate would re-run both groupBys and the full-outer join
    # a second time — the whole upstream plan twice)
    pre = bt.select(
        "__b",
        F.coalesce(F.sum("__ba").over(wb), F.lit(0)).alias("__prev_a"),
        F.coalesce(F.sum("__bb").over(wb), F.lit(0)).alias("__prev_b"),
        F.sum("__ba").over(wb_all).cast("long").alias("n_a"),
        F.sum("__bb").over(wb_all).cast("long").alias("n_b"),
    )
    win = Window.partitionBy("__b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bucketed.join(F.broadcast(pre), "__b").select(
        (F.col("__prev_a") + F.sum("na").over(win)).alias("ca"),
        (F.col("__prev_b") + F.sum("nb").over(win)).alias("cb"),
        "n_a",
        "n_b",
    )
    gaps = cum.select(
        "n_a",
        "n_b",
        F.abs(
            F.col("ca").cast("double") / F.col("n_a")
            - F.col("cb").cast("double") / F.col("n_b")
        ).alias("__g"),
    )
    return gaps.groupBy("n_a", "n_b").agg(F.round(F.max("__g"), 6).alias("d_stat"))


def grouped_linear_trend(
    df: DataFrame,
    group_cols: "Sequence[str]",
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line of ``y`` on ``x`` — the
    trend report a monitoring/curation pipeline runs over every segment
    at once (revenue slope per priority class, volume drift per source)
    — via EXACT integer sufficient statistics: one aggregate computes
    (n, Σx, Σy, Σxy, Σx², Σy²) per group as ``decimal(38,0)`` (DuckDB:
    HUGEINT — both integer-exact, combine-order-independent), and the
    closed-form slope/intercept/r² are derived from those exact integers
    in a fixed double expression identical on both engines. No window,
    no iteration, no float accumulation anywhere: ONE partial-agg
    shuffle regardless of group count or rows — at 100 TB this is the
    cheapest shape a regression can take.

    Both columns must be integral (cents, days, counts) — the exactness
    contract is what lets the oracle hash-match; a double input would
    reintroduce combine-order float sums, so it raises.

    Rows where x or y is NULL are EXCLUDED (a pair is a point or it is
    nothing — counting a row whose sums skip it would corrupt every
    statistic). Groups with zero x-variance (a single distinct x) admit
    no line and are EXCLUDED; constant-y groups get r² = NULL (0/0 in
    the definition).
    Returns ``(group..., n_points BIGINT, slope, intercept, r2)``
    rounded to 6 decimals."""
    _require_integral(df, [x_col, y_col], "grouped_linear_trend")
    # NULL x/y rows are EXCLUDED before anything counts (review finding,
    # round 8): count(1) would tally every row while the sums skip
    # NULLs — mismatched n silently corrupts slope/intercept/r² (and the
    # count(*)-based SQL twin would CONFIRM the wrong answer)
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # LOUD overflow guard (review finding, round 8): a decimal(38,0)
    # overflow in Spark's non-ANSI arithmetic yields NULL, which the
    # den != 0 filter would silently DROP (the DuckDB twin raises on the
    # same input — engine divergence). One cheap global aggregate bounds
    # every downstream product: |num| <= 2·n²·max|x|·max|y|,
    # |den| <= 2·n²·max|x|², |deny| <= 2·n²·max|y|² — all < 10^38 or we
    # refuse with the rescale recipe (days not microseconds, cents not
    # micro-cents). n is the GLOBAL row count — conservative per group.
    bounds = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col(x_col).cast("decimal(38,0)"))).alias("mx"),
        F.max(F.abs(F.col(y_col).cast("decimal(38,0)"))).alias("my"),
    ).first()
    if bounds["n"]:
        n_all = int(bounds["n"])
        mmax = max(int(bounds["mx"] or 0), int(bounds["my"] or 0), 1)
        if 2 * n_all * n_all * mmax * mmax >= 10**38:
            raise ValueError(
                "grouped_linear_trend: sufficient statistics could overflow "
                f"decimal(38,0) (rows={n_all}, max|x|,|y|={mmax}); rescale the "
                "inputs (e.g. days instead of microseconds, cents instead of "
                "micro-cents) or pre-aggregate per x"
            )
    dx = F.col(x_col).cast("decimal(38,0)")
    dy = F.col(y_col).cast("decimal(38,0)")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(dx).alias("__sx"),
        F.sum(dy).alias("__sy"),
        F.sum(dx * dy).alias("__sxy"),
        F.sum(dx * dx).alias("__sxx"),
        F.sum(dy * dy).alias("__syy"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    deny = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    num_d, den_d, deny_d = (c.cast("double") for c in (num, den, deny))
    slope = num_d / den_d
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    r2 = (num_d * num_d) / (den_d * deny_d)
    return (
        stats.filter(den != F.lit(0))
        .select(
            *group_cols,
            F.col("__n").cast("long").alias("n_points"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.when(deny == F.lit(0), F.lit(None).cast("double"))
            .otherwise(F.round(r2, 6))
            .alias("r2"),
        )
    )


def _require_integral(df: DataFrame, cols: Sequence[str], op: str) -> None:
    """Exactness contract shared by the sufficient-statistics operators:
    every input column must be integral (cents, days, counts) so the
    decimal(38,0) sums are exact and combine-order-independent — a double
    input would reintroduce float accumulation and break the oracle
    hash-match."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    for c in cols:
        t = df.schema[c].dataType
        if not isinstance(t, (ByteType, ShortType, IntegerType, LongType)):
            raise ValueError(
                f"{op}: {c} must be integral (got {t.simpleString()}); "
                "pre-convert money to cents / dates to day numbers"
            )


def correlation_matrix(
    df: DataFrame, cols: Sequence[str], *, min_points: int = 2
) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` — the feature-redundancy
    screen a curation pipeline runs before weighting quality signals —
    computed like :func:`grouped_linear_trend`: ONE aggregate collects
    exact ``decimal(38,0)`` sufficient statistics (per pair: n, Σx, Σy,
    Σxy, Σx², Σy² under the pair's both-non-NULL mask — *pairwise-complete*
    observations), and the closed-form correlation is derived from those
    exact integers in a fixed double expression identical on both engines:

        corr = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ₛ)·(n·Σy² − Σy²ₛ))

    Plan shape: one partial-agg shuffle to ONE row regardless of table
    size (k(k−1)/2 · 6 aggregate expressions for k columns — k is a
    handful of curated features, not data-sized), then a map-side explode
    of the literal pair structs. At 100 TB this is the cheapest shape a
    correlation matrix can take; nothing downstream of the aggregate
    touches data.

    Columns must be integral (see ``_require_integral``). Pairs with
    fewer than ``min_points`` complete observations or zero variance on
    either side get ``corr = NULL`` (they admit no correlation).

    Returns ``(col_x, col_y, n_points BIGINT, corr DOUBLE)`` — one row per
    unordered pair, ``col_x`` earlier in ``cols`` than ``col_y``, corr
    rounded to 6 decimals.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"correlation_matrix needs >= 2 columns, got {cols}")
    if len(set(cols)) != len(cols):
        raise ValueError(f"correlation_matrix: duplicate columns in {cols}")
    _require_integral(df, cols, "correlation_matrix")
    # LOUD overflow guard (same contract as grouped_linear_trend): a
    # decimal(38,0) overflow in Spark's non-ANSI arithmetic yields NULL,
    # which would surface as a silently-NULL correlation while the DuckDB
    # twin's HUGEINT either holds or raises — engine divergence. Bound
    # every product: |n·Σxy| ≤ n²·max|x|·max|y| < 10^38 / 2, conservative
    # with the global max magnitude across all columns.
    bounds = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.max(F.abs(F.col(c).cast("decimal(38,0)"))).alias(f"m{i}")
            for i, c in enumerate(cols)
        ],
    ).first()
    if bounds["n"]:
        n_all = int(bounds["n"])
        mmax = max(max(int(bounds[f"m{i}"] or 0) for i in range(len(cols))), 1)
        if 2 * n_all * n_all * mmax * mmax >= 10**38:
            raise ValueError(
                "correlation_matrix: sufficient statistics could overflow "
                f"decimal(38,0) (rows={n_all}, max magnitude={mmax}); rescale "
                "the inputs (e.g. cents not micro-cents) or pre-aggregate"
            )
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    aggs = []
    for i, j in pairs:
        x, y = F.col(cols[i]), F.col(cols[j])
        mask = x.isNotNull() & y.isNotNull()
        dx = F.when(mask, x.cast("decimal(38,0)"))
        dy = F.when(mask, y.cast("decimal(38,0)"))
        p = f"__p{i}_{j}"
        aggs += [
            F.sum(F.when(mask, F.lit(1)).otherwise(F.lit(0)))
            .cast("decimal(38,0)")
            .alias(f"{p}_n"),
            F.sum(dx).alias(f"{p}_sx"),
            F.sum(dy).alias(f"{p}_sy"),
            F.sum(dx * dy).alias(f"{p}_sxy"),
            F.sum(dx * dx).alias(f"{p}_sxx"),
            F.sum(dy * dy).alias(f"{p}_syy"),
        ]
    agg = df.agg(*aggs)
    structs = []
    for i, j in pairs:
        p = f"__p{i}_{j}"
        n = F.col(f"{p}_n")
        num = n * F.col(f"{p}_sxy") - F.col(f"{p}_sx") * F.col(f"{p}_sy")
        denx = n * F.col(f"{p}_sxx") - F.col(f"{p}_sx") * F.col(f"{p}_sx")
        deny = n * F.col(f"{p}_syy") - F.col(f"{p}_sy") * F.col(f"{p}_sy")
        corr = F.when(
            (n < F.lit(min_points)) | (denx == F.lit(0)) | (deny == F.lit(0)),
            F.lit(None).cast("double"),
        ).otherwise(
            F.round(
                num.cast("double")
                / F.sqrt(denx.cast("double") * deny.cast("double")),
                6,
            )
        )
        structs.append(
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                n.cast("long").alias("n_points"),
                corr.alias("corr"),
            )
        )
    return agg.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def mad_outlier_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier summary via the median absolute deviation:
    ``median`` = exact discrete p50 of the values, ``mad`` = exact
    discrete p50 of ``|value − median|``, and a row is an outlier iff
    ``|value − median| > k·mad`` — the standard heavy-tail-safe screen
    where z-scores break (the mean and stddev are themselves dragged by
    the outliers being hunted; cf. ``timeseries.hourly_anomaly`` for the
    z-score form on well-behaved data).

    Exactness: values must be integral (see ``_require_integral``), so
    median, deviations, and MAD are exact integers; the only float is the
    ``k``-threshold compare, one IEEE multiply per row with both operands
    exact — identical on any engine. With ``mad = 0`` (over half the
    group at the median) the rule degenerates to ``deviation > 0``
    exactly as written.

    Plan shape: ONE exchange hashed on the group key carries the whole
    operator — rank/median, deviation rank/MAD are windows over the same
    partitioning (two in-partition sorts, no second shuffle), and the
    final per-group rollup rides the same key. NULL values are excluded
    (``percentile_disc`` semantics; a group of only NULLs disappears).

    Returns ``(group_cols…, n BIGINT, median BIGINT, mad BIGINT,
    n_outliers BIGINT)``.
    """
    group_cols = list(group_cols)
    _require_integral(df, [value_col], "mad_outlier_stats")
    if not (float(k) >= 0):
        raise ValueError(f"mad_outlier_stats: k must be >= 0, got {k}")
    v = F.col(value_col).cast("long")
    w_all = Window.partitionBy(*group_cols)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, v.alias("__v"))
        .select(
            *group_cols,
            "__v",
            F.row_number().over(Window.partitionBy(*group_cols).orderBy("__v")).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("__n"),
        )
    )
    # the value AT rank ceil(0.5·n): row_number is unique, so max(case)
    # over the partition reads exactly one row — the discrete median
    # without a join back
    med = ranked.select(
        *group_cols,
        "__v",
        "__n",
        F.max(
            F.when(F.col("__rn") == F.ceil(F.lit(0.5) * F.col("__n")), F.col("__v"))
        ).over(w_all).alias("__med"),
    )
    dev = med.select(
        *group_cols,
        "__n",
        "__med",
        F.abs(F.col("__v") - F.col("__med")).alias("__dev"),
    )
    dev = dev.select(
        *group_cols,
        "__n",
        "__med",
        "__dev",
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy("__dev"))
        .alias("__rn2"),
    )
    mad = dev.select(
        *group_cols,
        "__med",
        "__dev",
        F.max(
            F.when(F.col("__rn2") == F.ceil(F.lit(0.5) * F.col("__n")), F.col("__dev"))
        ).over(w_all).alias("__mad"),
    )
    flag = F.col("__dev").cast("double") > F.lit(float(k)) * F.col("__mad").cast("double")
    return mad.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("__med").alias("median"),
        F.max("__mad").alias("mad"),
        F.sum(F.when(flag, F.lit(1)).otherwise(F.lit(0))).cast("long").alias("n_outliers"),
    )


def quantize_e12(term: "F.Column") -> "F.Column":
    """THE repo-wide e-12 quantizer for combine-order-independent float
    sums: ``floor(term·1e12 + 0.5)`` — two correctly-rounded IEEE ops
    plus floor, BIT-identical on any engine given the same input double
    (unlike ``round(double, 12)``, which Spark computes in BigDecimal
    HALF_UP and DuckDB in floating point). Sum the result as BIGINT,
    then finish with :func:`dequantize_6dp`. One definition — the
    convention is load-bearing for oracle certification, so every
    consumer (js_divergence, chi2_independence, bigram_cond_entropy,
    psi_drift) must use these helpers, never an inline copy."""
    return F.floor(term * F.lit(1.0e12) + F.lit(0.5))


def dequantize_6dp(sum_col: "F.Column") -> "F.Column":
    """Integer round-half-up of a :func:`quantize_e12` BIGINT sum to 6
    decimals: ``floor((Σ + 5e5)/1e6)/1e6`` — all-integer until the final
    exact division, so no cross-engine double rounding remains."""
    return (
        F.floor((sum_col + F.lit(500000)) / F.lit(1000000.0)).cast("long")
        / F.lit(1.0e6)
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns, plus Cramér's V — the standard association screen a curation
    pipeline runs between metadata facets (source × language, event type
    × hour band): V ≈ 0 says the facets are independent, V → 1 says one
    determines the other (a leakage / confounding signal for sampling).

    Exactness: observed counts, row/column totals, and N are exact
    integers; each cell's contribution ``(O − E)²/E`` (E = R·C/N) is a
    fixed double expression over those integers, quantized to an e-12
    integer via ``floor(t·1e12 + 0.5)`` and summed as BIGINT — the same
    combine-order-independent quantizer as
    :func:`.corpusstats.js_divergence`, because the cell count can exceed
    any single sorted fold. Cramér's V is derived from the ROUNDED chi²
    so both engines read the same 6-decimal input.

    Plan shape: one hash-agg to the contingency cells (|A|·|B| rows —
    categorical by contract), two tiny re-aggregations for the marginals,
    cell-level joins on the marginal keys, one-row output. The grand
    totals are read eagerly and injected as literals (the
    ``js_divergence`` pattern), which also powers the loud BIGINT
    overflow guard: chi² ≤ N·(min(|A|,|B|)−1) must stay under 2^63 after
    the e-12 quantization, else we refuse and say to sample.

    NULL in either column excludes the row (a cell is a pair or it is
    nothing). Returns one row ``(n BIGINT, n_cells BIGINT, dof BIGINT,
    chi2 DOUBLE, cramers_v DOUBLE)``; ``cramers_v`` is NULL when either
    side has a single category (dof = 0).
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    trow = cells.agg(
        F.sum("__o").alias("n"),
        F.count_distinct(F.col(col_a)).alias("ka"),
        F.count_distinct(F.col(col_b)).alias("kb"),
    ).first()
    if not trow["n"]:
        raise ValueError("chi2_independence: no non-NULL (a, b) pairs")
    n_tot, ka, kb = int(trow["n"]), int(trow["ka"]), int(trow["kb"])
    min_dim = min(ka, kb)
    # chi² ≤ N·(min_dim−1); the e-12 quantized sum must fit BIGINT
    if n_tot * max(min_dim - 1, 1) >= 2**63 // 10**12:
        raise ValueError(
            f"chi2_independence: quantized chi-squared could overflow BIGINT "
            f"(n={n_tot}, min_dim={min_dim}); test on a sample — at this scale "
            "any dependence is already significant"
        )
    ra = cells.groupBy(col_a).agg(F.sum("__o").alias("__ra"))
    cb = cells.groupBy(col_b).agg(F.sum("__o").alias("__cb"))
    # the statistic sums over the FULL |A|×|B| grid: a category pair that
    # never co-occurs still contributes (0−E)²/E = E — summing observed
    # cells only would understate chi² exactly where dependence is
    # strongest. The marginal cross product IS the grid and carries both
    # marginals for free; both sides are categorical-small by contract.
    grid = ra.crossJoin(F.broadcast(cb))
    full = grid.join(cells, [col_a, col_b], "left").select(
        "__ra", "__cb", F.coalesce(F.col("__o"), F.lit(0)).alias("__o")
    )
    n_d = F.lit(float(n_tot))
    e = F.col("__ra").cast("double") * F.col("__cb").cast("double") / n_d
    d = F.col("__o").cast("double") - e
    term = d * d / e
    q = full.select(quantize_e12(term).alias("__q"))
    out = q.agg(dequantize_6dp(F.sum("__q")).alias("__chi2")).select(
        F.lit(n_tot).cast("long").alias("n"),
        F.lit(ka * kb).cast("long").alias("n_cells"),
        F.lit((ka - 1) * (kb - 1)).cast("long").alias("dof"),
        F.col("__chi2").alias("chi2"),
        (
            F.lit(None).cast("double")
            if min_dim < 2
            else F.round(
                F.sqrt(F.col("__chi2") / F.lit(float(n_tot * (min_dim - 1)))), 6
            )
        ).alias("cramers_v"),
    )
    return out


def gini_concentration(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integral quantity —
    the concentration screen a curation pipeline runs over source /
    domain / customer mass (G → 0: evenly spread; G → 1: one member
    holds everything, the "is this corpus secretly one domain" signal).

    The rank formulation over values sorted ASCENDING,

        G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)

    is exact in integers: the rank-weighted sum is invariant under tie
    order (equal values at adjacent ranks swap freely), so row_number's
    nondeterminism among ties never reaches the result. One group-key
    exchange: rank window + final aggregate ride the same partitioning.

    Values must be integral and non-negative (Gini is undefined below
    zero — checked eagerly, together with the decimal(38,0) overflow
    guard on n²·max(x)). NULLs are excluded; a group with total 0 gets
    ``gini = NULL``. Returns ``(group…, n BIGINT, total BIGINT,
    gini DOUBLE)`` rounded to 6.
    """
    group_cols = list(group_cols)
    _require_integral(df, [value_col], "gini_concentration")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("long").alias("__v")
    )
    brow = vals.agg(
        F.count(F.lit(1)).alias("n"), F.min("__v").alias("mn"), F.max("__v").alias("mx")
    ).first()
    if brow["n"]:
        if int(brow["mn"]) < 0:
            raise ValueError(
                f"gini_concentration: negative values (min={brow['mn']}) — "
                "Gini is defined for non-negative quantities"
            )
        n_all, mx = int(brow["n"]), max(int(brow["mx"]), 1)
        if 2 * n_all * n_all * mx >= 10**38:
            raise ValueError(
                "gini_concentration: rank-weighted sum could overflow "
                f"decimal(38,0) (rows={n_all}, max={mx}); rescale or pre-aggregate"
            )
        # the `total` output column is BIGINT: a group total past 2^63
        # would NULL out under Spark's non-ANSI decimal→long cast while
        # the DuckDB twin raises on the same cast (review finding) —
        # refuse loudly instead, same contract as the decimal guard
        if n_all * mx >= 2**63:
            raise ValueError(
                "gini_concentration: a group total could overflow the BIGINT "
                f"`total` column (rows={n_all}, max={mx}); rescale the values"
            )
    ranked = vals.select(
        *group_cols,
        "__v",
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy("__v"))
        .cast("decimal(38,0)")
        .alias("__i"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"),
        F.sum(F.col("__i") * F.col("__v")).alias("__iws"),
    )
    n, s = F.col("__n"), F.col("__s")
    num = F.lit(2).cast("decimal(38,0)") * F.col("__iws") - (n + F.lit(1)) * s
    den = n * s
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        s.cast("long").alias("total"),
        F.when(den == F.lit(0), F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6))
        .alias("gini"),
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    fabricated-/synthetic-data smell test for naturally-occurring
    positive quantities (amounts, populations, file sizes): organic
    heavy-tailed data leans log-uniform (digit 1 ≈ 30.1%), templated or
    uniformly-generated data does not.

    Values must be integral; only strictly positive rows count (zero and
    negative have no first significant digit — excluded, like NULL). The
    first digit is the first character of the decimal string — pure
    integer/string ops, identical on any engine. ``share`` is the
    observed fraction, ``benford`` the law's log10(1 + 1/d); both are
    single-expression doubles over exact integer inputs, rounded to 6.

    Plan shape: one projection + one 9-bucket hash-agg over the table,
    then a broadcast of the one-row total onto the literal digit frame —
    output is ALWAYS exactly 9 rows (absent digits appear with n = 0,
    the strongest red flag of all). Raises if no positive values exist.

    Returns ``(digit INT, n BIGINT, share DOUBLE, benford DOUBLE)``.
    """
    _require_integral(df, [value_col], "benford_profile")
    counts = (
        df.filter(F.col(value_col) > 0)
        .select(
            F.substring(F.col(value_col).cast("long").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("__tot"))
    trow = tot.first()
    if not trow["__tot"]:
        raise ValueError("benford_profile: no positive values")
    digits = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    return (
        digits.join(counts, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .select(
            "digit",
            "n",
            F.round(
                F.col("n").cast("double") / F.lit(float(int(trow["__tot"]))), 6
            ).alias("share"),
            F.round(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
            ).alias("benford"),
        )
    )


def theilsen_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    max_points: int = 10_000,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: slope = MEDIAN of all pairwise
    slopes (y_j−y_i)/(x_j−x_i) over x_i < x_j, intercept = median of
    y − slope·x — the estimator that shrugs off up to ~29% arbitrary
    outliers where :func:`grouped_linear_trend`'s OLS line is dragged by
    a single wild point (the robust companion, same way
    :func:`mad_outlier_stats` is the robust companion to z-scores).

    Exactness: x/y must be integral, so every pairwise slope is ONE
    double division of exact integers — identical on any engine — and
    the median is the exact discrete p50 by rank (equal doubles are
    interchangeable at equal ranks). The intercept reuses the UNROUNDED
    median slope, so its residuals are identical-input doubles too.
    Outputs round to 6.

    Scale contract: pairwise slopes are O(n²) per group BY DEFINITION of
    the estimator — this is for pre-aggregated series (daily revenue,
    hourly counts), not raw tables. The eager guard refuses any group
    larger than ``max_points`` (default 10k → ≤ 50M pairs/group) with
    the pre-aggregate recipe, instead of silently planning a
    quadratic-blowup join; the pair join itself is equi on the group key
    and the per-group median windows ride that same partitioning. NOTE
    the exact per-group median means each group's full pair set sorts in
    ONE task (the grouped-percentile contract) — at the default cap
    that's a ~50M-row in-partition sort; size ``max_points`` to executor
    memory, or coarsen the series grain, when groups run long.

    Pairs with x_i = x_j are SKIPPED (vertical slope — standard
    Theil–Sen); a group with no two distinct x values admits no line and
    is ABSENT. NULL x/y rows are excluded. Returns ``(group…,
    n_points BIGINT, n_pairs BIGINT, slope DOUBLE, intercept DOUBLE)``.
    """
    group_cols = list(group_cols)
    _require_integral(df, [x_col, y_col], "theilsen_trend")
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *group_cols, F.col(x_col).cast("long").alias("__x"), F.col(y_col).cast("long").alias("__y")
    )
    sizes = pts.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    brow = sizes.agg(F.max("n").alias("mx")).first()
    if brow["mx"] and int(brow["mx"]) > max_points:
        raise ValueError(
            f"theilsen_trend: a group has {brow['mx']} points (> max_points="
            f"{max_points}) — the pairwise-slope set is O(n²); pre-aggregate "
            "the series (e.g. daily sums) or raise max_points deliberately"
        )
    a = pts.select(*group_cols, F.col("__x").alias("__xa"), F.col("__y").alias("__ya"))
    b = pts.select(*group_cols, F.col("__x").alias("__xb"), F.col("__y").alias("__yb"))
    slopes = a.join(b, group_cols).filter(F.col("__xa") < F.col("__xb")).select(
        *group_cols,
        (
            (F.col("__yb") - F.col("__ya")).cast("double")
            / (F.col("__xb") - F.col("__xa")).cast("double")
        ).alias("__sl"),
    )
    # median slope + pair count in ONE pass over the O(n²) slope set —
    # the rank window and the rollup share the group-key partitioning,
    # so the expensive pair join is evaluated exactly once (the
    # grouped_percentile_disc helper's distinct-join structure would
    # re-embed this pipeline several times; measured 33.8 → ~12 s on the
    # daily-orders catalog query)
    w_all = Window.partitionBy(*group_cols)
    ranked = slopes.select(
        *group_cols,
        "__sl",
        F.row_number().over(Window.partitionBy(*group_cols).orderBy("__sl")).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__m"),
    )
    ms = ranked.groupBy(*group_cols).agg(
        F.min(
            F.when(F.col("__rn") >= F.ceil(F.lit(0.5) * F.col("__m")), F.col("__sl"))
        ).alias("__slope"),
        F.max("__m").cast("long").alias("n_pairs"),
    )
    # residual median: the input is only n points per group — cheap
    resid = pts.join(ms, group_cols).select(
        *group_cols,
        "__slope",
        "n_pairs",
        (F.col("__y").cast("double") - F.col("__slope") * F.col("__x").cast("double")).alias("__r"),
    )
    ranked_r = resid.select(
        *group_cols,
        "__slope",
        "n_pairs",
        "__r",
        F.row_number().over(Window.partitionBy(*group_cols).orderBy("__r")).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    return ranked_r.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n_points"),
        F.max("n_pairs").alias("n_pairs"),
        F.round(F.max("__slope"), 6).alias("slope"),
        F.round(
            F.min(
                F.when(F.col("__rn") >= F.ceil(F.lit(0.5) * F.col("__n")), F.col("__r"))
            ),
            6,
        ).alias("intercept"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of an integral column — the model-monitoring drift metric
    (rule of thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 act):

        PSI = Σ_buckets (cᵢ − rᵢ) · ln(cᵢ / rᵢ)

    over ``n_buckets`` quantile buckets OF THE REFERENCE period (the
    standard construction: buckets are frozen where the baseline put
    its deciles, so drift shows as mass sliding across fixed edges).
    Shares use add-1 smoothing — ``rᵢ = (nrᵢ+1)/(Nr+B)`` — so empty
    buckets (inevitable once data drifts hard) stay finite and EXACT
    instead of needing an ad-hoc epsilon; each term is ≥ 0 and built
    from exact integer counts (two IEEE divisions + ln), quantized with
    the :func:`.corpusstats.js_divergence` e-12 quantizer and summed as
    BIGINT.

    The cut points are exact reference quantiles via
    :func:`exact_quantiles`' two-level bucket plan (no global sort),
    read eagerly (n_buckets−1 values) and embedded as LITERALS — the
    bucket assignment is then a handful of codegen'd comparisons on both
    sides, and the per-side counts are one hash-agg each. Heavy
    duplicates can collapse adjacent cuts; the affected buckets simply
    go empty (add-1 covers them).

    Values must be integral; NULLs are excluded on both sides. Raises if
    the reference is empty (no baseline, no buckets). Returns one row
    ``(n_ref BIGINT, n_cur BIGINT, psi DOUBLE)`` rounded to 6.
    """
    if n_buckets < 2:
        raise ValueError(f"psi_drift: n_buckets must be >= 2, got {n_buckets}")
    _require_integral(ref, [value_col], "psi_drift")
    _require_integral(cur, [value_col], "psi_drift")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    try:
        cut_rows = exact_quantiles(ref, value_col, value_col, qs).collect()
    except ValueError as e:
        if "empty" in str(e):
            raise ValueError("psi_drift: reference side is empty (or all NULL)") from e
        raise
    cuts = sorted(int(r["value"]) for r in cut_rows)
    bucket = None
    for c in cuts:
        t = F.when(F.col(value_col) > F.lit(c), 1).otherwise(0)
        bucket = t if bucket is None else bucket + t
    def side_counts(df, alias):
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(bucket.alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias(alias))
        )
    rc = side_counts(ref, "__nr")
    cc = side_counts(cur, "__nc")
    spark = ref.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    joined = (
        grid.join(rc, "__b", "left")
        .join(cc, "__b", "left")
        .select(
            "__b",
            F.coalesce("__nr", F.lit(0)).cast("long").alias("__nr"),
            F.coalesce("__nc", F.lit(0)).cast("long").alias("__nc"),
        )
    )
    # totals IN-PLAN (the SQL twin's `tot` CTE shape): an eager first()
    # here would re-evaluate `joined` — and so re-scan both sides — once
    # for the totals and again for the quantized sum; as two references
    # in ONE plan, AQE's runtime stage reuse dedupes the identical
    # bucket-count subplan (review finding, round-8 continuation)
    tot = joined.agg(
        F.sum("__nr").cast("long").alias("__tnr"),
        F.sum("__nc").cast("long").alias("__tnc"),
    )
    per = joined.crossJoin(F.broadcast(tot))
    rsh = (F.col("__nr") + F.lit(1)).cast("double") / (
        F.col("__tnr") + F.lit(n_buckets)
    ).cast("double")
    csh = (F.col("__nc") + F.lit(1)).cast("double") / (
        F.col("__tnc") + F.lit(n_buckets)
    ).cast("double")
    term = (csh - rsh) * F.log(csh / rsh)
    q = per.select("__tnr", "__tnc", quantize_e12(term).alias("__q"))
    return q.agg(
        F.max("__tnr").alias("n_ref"),
        F.max("__tnc").alias("n_cur"),
        dequantize_6dp(F.sum("__q")).alias("psi"),
    )


def two_proportion_ztest(
    df: DataFrame, group_col: str, success_col: str
) -> DataFrame:
    """Two-proportion z-test over one row per unit (user, doc, request):
    ``group_col`` must take EXACTLY two distinct non-NULL values (the
    arms), ``success_col`` is a boolean outcome — the A/B-test read-out:

        z = (p_a − p_b) / √( p̂(1−p̂) · (1/n_a + 1/n_b) ),  p̂ pooled

    All counts are exact integers from ONE aggregate; rates, the pooled
    estimate, and z are a fixed double expression over those integers —
    identical on any engine. Arms order lexicographically (a < b), so
    the SIGN of z is deterministic. Degenerate pooled rates (0 or 1 —
    no variance) yield ``z = NULL``; NULL successes count as failures
    (an unknown is not a conversion). Returns one row ``(group_a,
    group_b, n_a, n_b, k_a, k_b, rate_a, rate_b, z)``, rates and z
    rounded to 6.
    """
    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("__g"),
        F.coalesce(F.col(success_col).cast("boolean"), F.lit(False)).alias("__s"),
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("__s"), 1).otherwise(0)).alias("__k"),
    )
    # bounded probe BEFORE collecting: a mistaken high-cardinality group
    # column (user_id…) must fail with a clean ValueError, not stream
    # one row per distinct group into the driver (review finding)
    probe = per.select("__g").take(3)
    if len(probe) != 2:
        raise ValueError(
            f"two_proportion_ztest: need exactly 2 groups, got "
            f"{'>= 3' if len(probe) > 2 else len(probe)} "
            f"(sample: {sorted(r['__g'] for r in probe)})"
        )
    rows = sorted(per.collect(), key=lambda r: r["__g"])
    (ga, na, ka), (gb, nb, kb) = [(r["__g"], int(r["__n"]), int(r["__k"])) for r in rows]
    spark = df.sparkSession
    one = spark.range(1)
    ra = F.lit(float(ka)) / F.lit(float(na))
    rb = F.lit(float(kb)) / F.lit(float(nb))
    pooled = F.lit(float(ka + kb)) / F.lit(float(na + nb))
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.lit(float(na)) + F.lit(1.0) / F.lit(float(nb)))
    )
    degenerate = ka + kb == 0 or ka + kb == na + nb
    z = (
        F.lit(None).cast("double")
        if degenerate
        else F.round((ra - rb) / se, 6)
    )
    return one.select(
        F.lit(ga).alias("group_a"),
        F.lit(gb).alias("group_b"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.lit(ka).cast("long").alias("k_a"),
        F.lit(kb).cast("long").alias("k_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        z.alias("z"),
    )
