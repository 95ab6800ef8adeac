"""Slowly-changing-dimension type-2 merge (versioned dimension upsert).

The snapshot store (:mod:`index_spark.snapshots`) versions whole tables;
SCD2 is the row-level analog a warehouse dimension needs: when a tracked
attribute changes, the current row is *closed* (``valid_to`` set) and a
new row opens (``valid_from`` set, ``valid_to`` NULL), preserving history
inside one table (Kimball's type-2 dimension; same effective-interval
shape as the reference's temporal find — SortedMap.scala greatest-≤
lookups — but materialized as rows instead of resolved per query).

Plan shape: one equi-join on the business key between current rows and
the update batch (broadcast when the batch is small — the common case:
daily deltas vs a full dimension), a column-compare to detect real
changes, and a union of {unchanged current, closed, opened, history}.
No window, no global sort; at 100 TB the dimension shuffles once on its
key and the batch rides broadcast.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(df: DataFrame, valid_from: int = 0) -> DataFrame:
    """Wrap a plain dimension as SCD2 current rows."""
    return df.withColumn("valid_from", F.lit(valid_from).cast("long")).withColumn(
        "valid_to", F.lit(None).cast("long")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: Sequence[str],
    tracked: Sequence[str],
    effective: int,
    broadcast_updates: bool = True,
    strict_intervals: bool = False,
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    ``updates`` carries the key plus new values for ``tracked`` columns.
    Rows whose tracked values actually differ from the current row close
    the old version at ``effective`` and open a new one; no-op updates and
    keys absent from the batch pass through untouched. Updates for unknown
    keys are inserted as new current rows. All non-tracked attribute
    columns carry over from the current row (inserts take them from the
    batch when present, else NULL).
    """
    key = list(key)
    tracked = list(tracked)
    attrs = [c for c in dim.columns if c not in key + ["valid_from", "valid_to"]]
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    # Two update rows for one business key would close the current row
    # twice and open two concurrent versions — silent dimension
    # corruption. Reject up front (same contract as the store's _dup_keys
    # guard); the batch is small by this function's contract, so the
    # check is one cheap job.
    from index_spark.errors import DuplicatedKeysError

    dup = (
        updates.groupBy(*key)
        .count()
        .filter(F.col("count") > 1)
        .select(*key)
        .limit(20)
        .collect()
    )
    if dup:
        raise DuplicatedKeysError(
            f"duplicate business keys in SCD2 update batch: {[tuple(r) for r in dup]}"
        )

    # Optional (costs one extra pass over the dimension): an `effective`
    # at or before a touched current row's valid_from would emit an
    # empty/negative closed interval overlapping the opened one.
    if strict_intervals:
        bad_from = (
            cur.join(F.broadcast(updates.select(*key)), on=key, how="left_semi")
            .agg(F.max("valid_from").alias("mx"))
            .first()["mx"]
        )
        if bad_from is not None and bad_from >= effective:
            raise ValueError(
                f"effective={effective} is not after the latest touched "
                f"valid_from={bad_from}: would create overlapping SCD2 intervals"
            )

    upd = updates.select(
        key
        + [F.col(c).alias(f"__u_{c}") for c in updates.columns if c not in key]
        + [F.lit(1).alias("__u_present")]
    )
    # left join (not full outer): a full outer join cannot broadcast its
    # build side, which would force both sides through a shuffle; the
    # insert case is handled by a separate anti-join on the same
    # (broadcast) batch, so the big dimension never shuffles at all when
    # the batch is small.
    bupd = F.broadcast(upd) if broadcast_updates else upd
    j = cur.join(bupd, on=key, how="left")

    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in tracked],
    )
    in_batch = F.col("__u_present").isNotNull()

    untouched = j.filter(~(in_batch & changed)).select(
        *key, *[F.col(c) for c in attrs], "valid_from", "valid_to"
    )
    closed = j.filter(in_batch & changed).select(
        *key,
        *[F.col(c) for c in attrs],
        "valid_from",
        F.lit(effective).cast("long").alias("valid_to"),
    )
    # tracked columns take the update value DIRECTLY — a coalesce here
    # would make NULL unwritable (the change is detected, the old row
    # closes, but the old value would silently reopen)
    opened = j.filter(in_batch & changed).select(
        *key,
        *[
            (F.col(f"__u_{c}") if c in tracked else F.col(c)).alias(c)
            for c in attrs
        ],
        F.lit(effective).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    # inserts: batch keys with no current row. Keys-only projection of the
    # dimension — the one place the dimension enters a shuffle, and it
    # shuffles just the key column (AQE picks the strategy; the small batch
    # side is what lands in memory).
    inserts = upd.join(cur.select(*key), on=key, how="left_anti").select(
        *key,
        *[
            (F.col(f"__u_{c}") if f"__u_{c}" in upd.columns else F.lit(None)).alias(c)
            for c in attrs
        ],
        F.lit(effective).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return (
        hist.unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened)
        .unionByName(inserts, allowMissingColumns=False)
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    return dim.filter(F.col("valid_to").isNull())


def scd2_pit_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time correct join (feature-store semantics): each fact row
    joins the dimension VERSION that was valid at the fact's timestamp —
    ``valid_from <= ts < valid_to`` (current rows are open-ended). Using
    today's dimension values for yesterday's facts is the classic
    training-data leakage bug; this is the non-leaky join.

    Plan shape: an EQUI join on the business key with the interval test as
    a residual filter — Spark hash-partitions both sides on the key (or
    broadcasts the dimension, which carries all versions of each key), so
    this costs the same as a plain dimension join; the residual runs
    post-match, codegen'd. No window, no per-fact sort. Contrast
    :func:`index_spark.operators.asof.asof_join`, which resolves
    greatest-≤ against *event-grain* tables; here version intervals are
    materialized once on the dimension, the cheaper shape when versions
    per key are few.
    """
    ts = facts[ts_col]
    cond = (
        (facts[fact_key] == dim[dim_key])
        & (dim["valid_from"] <= ts)
        & (dim["valid_to"].isNull() | (dim["valid_to"] > ts))
    )
    return facts.join(dim, cond, how)


def scd2_asof(dim: DataFrame, t: int) -> DataFrame:
    """Rows valid at time ``t``: valid_from <= t < valid_to (open-ended
    current rows match any t >= valid_from)."""
    return dim.filter(
        (F.col("valid_from") <= F.lit(t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(t)))
    )
