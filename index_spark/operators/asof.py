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
    clash = [c for c in carried if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output columns {clash} collide with existing left "
            f"columns; pass a different suffix"
        )

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # a right row with NULL ts can never satisfy the as-of predicate — and
    # under nulls-first ordering it would sit at the partition head and be
    # carried into EVERY left row as a spurious match
    rhs = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *on,
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(f"{right_ts}{suffix}"))
    )
    # Carry the right payload as ONE struct, not per-column: independent
    # last(ignorenulls) per column would splice values of DIFFERENT right
    # rows into one output row whenever a payload cell is NULL (and, with
    # tolerance, could surface a value whose own right row lies outside
    # the window). The struct is non-null exactly for right rows, so the
    # whole row is carried or none of it — pandas merge_asof semantics.
    rhs2 = rhs.select(*on, "__side", "__ts", F.struct(*carried).alias("__payload"))
    payload_t = rhs2.schema["__payload"].dataType
    lhs2 = lhs.select(
        *left.columns, "__side", "__ts", F.lit(None).cast(payload_t).alias("__payload")
    )
    rhs_aligned = rhs2
    for c in left.columns:
        if c not in rhs_aligned.columns:
            rhs_aligned = rhs_aligned.withColumn(c, F.lit(None))
    both = lhs2.unionByName(rhs_aligned.select(*left.columns, "__side", "__ts", "__payload"))

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
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        rts = F.col("__payload")[f"{right_ts}{suffix}"]
        dist = (F.col("__ts") - rts) if direction == "backward" else (rts - F.col("__ts"))
        out = out.withColumn(
            "__payload",
            F.when(dist <= F.lit(tolerance), F.col("__payload")),
        )
    return out.select(
        *left.columns, *[F.col("__payload")[c].alias(c) for c in carried]
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    suffix: str = "_right",
    value_type: str = "double",
) -> DataFrame:
    """Backward as-of join via ``groupBy().cogroup().applyInPandas`` —
    the Arrow-batched escape hatch for per-key logic the built-in
    operators can't express (here they CAN: :func:`asof_join` is the
    JVM-side fast path and the twin this must agree with — covered by a
    test — but the cogroup shape is the template for genuinely custom
    per-key merges).

    Each key group arrives as two pandas frames; ``pandas.merge_asof``
    resolves greatest-``right_ts <= left_ts``. Cost model vs
    :func:`asof_join`: same single shuffle on the key, PLUS Arrow
    serialization of both sides and a Python worker — use only when the
    merge logic outgrows window expressions.
    """
    import pandas as pd

    on = list(on)
    out_field = f"{value_col}{suffix}"
    lschema = left.schema
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in lschema.fields)
    schema = f"{fields}, {out_field} {value_type}"

    int_out = value_type.lower() in ("bigint", "long", "int", "integer", "smallint")

    # Re-alias every right column: when both sides descend from the SAME
    # source DataFrame (self-cogroup — exactly this events use case), the
    # two children share attribute exprIds and the cogroup Arrow exchange
    # deduplicates them, delivering shared columns only in the LEFT frame.
    # Fresh aliases get fresh exprIds, so the right frame arrives intact.
    rts, rval = f"__r_{right_ts}", f"__r_{value_col}"
    right_aliased = right.select(
        [F.col(c).alias(f"__r_{c}") for c in right.columns]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=list(l.columns) + [out_field])
        l = l.sort_values([left_ts] + on, kind="mergesort")
        if r.empty:
            m = l.copy()
            m[out_field] = None
        else:
            # project the right ts under a non-colliding name: merge_asof
            # suffixes colliding columns, which would orphan the left's ts.
            # value_col may BE the ts column (carry the match ts itself).
            if rval == rts:
                r2 = r[[rts]].rename(columns={rts: "__rts"})
                r2[out_field] = r2["__rts"]
            else:
                r2 = r[[rts, rval]].rename(
                    columns={rts: "__rts", rval: out_field}
                )
            r2 = r2.sort_values("__rts", kind="mergesort")
            m = pd.merge_asof(
                l, r2, left_on=left_ts, right_on="__rts", direction="backward"
            )
        if int_out:
            # unmatched rows make the column float (NaN); nullable Int64
            # round-trips through Arrow as long-with-nulls
            m[out_field] = m[out_field].astype("Int64")
        return m[list(l.columns) + [out_field]]

    return (
        left.groupBy(*on)
        .cogroup(right_aliased.groupBy(*[f"__r_{k}" for k in on]))
        .applyInPandas(merge, schema=schema)
    )
