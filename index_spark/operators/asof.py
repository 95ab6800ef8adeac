"""As-of (point-in-time) join — the operator Spark lacks natively.

Semantics: for each left row, attach the latest right row with
``right.ts <= left.ts`` within the same key group (the reference's
``TemporalIndex.find(t)`` generalized from one timeline to one-per-key,
``TemporalIndex.scala:31-38``).

Implementation is the union-and-carry-forward trick — pure DataFrame ops,
one shuffle on (key, ts), no Python:

1. tag left rows (side=1) and right rows (side=0), union by (key, ts),
2. window per key ordered by (ts, side): ``last(right payload, ignorenulls)``
   carries the most recent right values forward,
3. keep left rows.

Right rows sort before left rows at equal ts (side 0 < 1) so ties are
inclusive, matching ``<=``. Cost: one shuffle of (keys + carried columns);
contrast a naive range join (O(n·m) per key) or per-group
``applyInPandas``+merge_asof (Arrow transfer of both sides). Skewed keys
ride on AQE skew-join handling of the window shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join. ``right_cols`` defaults to all non-key, non-ts
    columns of ``right``; they appear suffixed on the output.

    ``direction``: "backward" (latest right ≤ left, the default) or
    "forward" (earliest right ≥ left) — forward is the same carry trick
    over a DESCENDING timeline, so it stays one shuffle with no extra
    pass. ``tolerance`` (same units as the ts columns) bounds the match
    distance: carried values farther than it are nulled AFTER the carry,
    so the window shape is unchanged (pandas ``merge_asof`` semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = (
        right.select(
            *on,
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(f"{right_ts}{suffix}"))
    )
    lhs_aligned = lhs
    for c in carried:
        lhs_aligned = lhs_aligned.withColumn(c, F.lit(None))
    rhs_aligned = rhs
    for c in left.columns:
        if c not in rhs_aligned.columns:
            rhs_aligned = rhs_aligned.withColumn(c, F.lit(None))
    both = lhs_aligned.select(*left.columns, "__side", "__ts", *carried).unionByName(
        rhs_aligned.select(*left.columns, "__side", "__ts", *carried)
    )

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.select(
        *left.columns,
        "__side",
        "__ts",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        rts = F.col(f"{right_ts}{suffix}")
        dist = (F.col("__ts") - rts) if direction == "backward" else (rts - F.col("__ts"))
        out = out.select(
            *left.columns,
            "__side",
            "__ts",
            *[
                F.when(dist <= F.lit(tolerance), F.col(c)).alias(c)
                for c in carried
            ],
        )
    return out.drop("__side", "__ts")
