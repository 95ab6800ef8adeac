"""2-D skyline (Pareto frontier) as a pure relational plan.

``skyline2d`` returns the rows not DOMINATED on two minimized dimensions:
``a`` dominates ``b`` when ``a.x <= b.x``, ``a.y <= b.y`` and they differ
in at least one — the multi-objective "best tradeoffs" query (Börzsönyi
et al. 2001, "The Skyline Operator"). The general d-dim problem needs a
block-nested loop; the 2-D case — by far the common one (price vs size,
latency vs cost) — decomposes into per-x minima plus a running prefix
min over the DISTINCT x values:

1. ``mins = groupBy(x).min(y)`` — partial-aggregated, one shuffle of the
   big table on x; output is distinct-x-sized.
2. running ``min(y)`` over strictly-smaller x — a window over the tiny
   ``mins`` table (its single-task sort touches distinct-x rows, never
   the data; pre-bucket x if its cardinality ever rivals the table).
3. broadcast ``mins`` back: a row is dominated iff some strictly-smaller
   x reached a ``min(y) <= y``, or its own x's ``min(y) < y``.

Duplicate (x, y) points do not dominate each other (neither is strictly
better), so all copies survive — matching the set-semantics oracle.
NULL in either dimension excludes the row (incomparable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows on the Pareto frontier minimizing (``x``, ``y``). NULL and
    (for float columns) NaN dimensions are incomparable and excluded —
    Spark's total order would otherwise treat NaN as greater than every
    number and silently mark NaN rows dominated."""

    def comparable(c: str) -> "F.Column":
        cond = F.col(c).isNotNull()
        if dict(df.dtypes).get(c) in ("double", "float"):
            cond = cond & ~F.isnan(F.col(c))
        return cond

    src = df.filter(comparable(x) & comparable(y))
    mins = src.groupBy(F.col(x).alias("__x")).agg(F.min(F.col(y)).alias("__my"))
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    table = mins.select(
        "__x", "__my", F.min("__my").over(w).alias("__my_before")
    )
    joined = src.join(F.broadcast(table), on=src[x] == table["__x"])
    dominated = (
        (F.col("__my_before").isNotNull() & (F.col("__my_before") <= F.col(y)))
        | (F.col("__my") < F.col(y))
    )
    return joined.filter(~dominated).drop("__x", "__my", "__my_before")
