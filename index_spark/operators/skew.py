"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session) handles sort-merge-join skew at runtime.
These helpers cover the cases AQE does not:

- ``salted_join`` — fact⋈dimension where a handful of hot keys dominate.
  The fact side gets a salt in [0, salt); the dimension side is replicated
  ``salt`` times; both shuffle on (key, salt), spreading each hot key over
  ``salt`` reducers. The salt is a deterministic hash of the whole row —
  NOT ``rand()``: a shuffle-fetch-failure retry recomputes map tasks, and a
  nondeterministic salt would re-assign rows across already-fetched reducer
  inputs, duplicating or losing them. Content-hashing spreads hot keys just
  as uniformly (identical duplicate rows share a bucket, which is harmless)
  while staying stable under recomputation.
- ``two_phase_agg`` — skewed groupBy: partial-aggregate on (key, salt),
  then final-aggregate on key. Each phase's shuffle is bounded by
  ``salt × |keys|`` and no single reducer sees a whole hot key. Only legal
  for algebraic aggregates (sum/count/min/max — anything with a merge
  step); supply partial and final expression builders.

Both are deliberately explicit, plan-visible transformations — at 100 TB
you want the salt factor chosen from key-frequency stats, not guessed by
the engine mid-query.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic salt in [0, salt): hash of every column, so retried
    map tasks re-derive the identical assignment (rand() would not)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join a skewed ``fact`` to a (small-ish, replicable) ``dim`` on ``on``,
    spreading each join key over ``salt`` reducers.

    ``dim`` is replicated ``salt`` times — its shuffled volume grows
    accordingly; use for dimensions too big to broadcast but far smaller
    than the fact. Supported ``how``: inner / left (semantics preserved:
    every fact row keeps exactly its one salt)."""
    assert how in ("inner", "left"), "salted_join preserves semantics for inner/left only"
    f = fact.withColumn(SALT, _row_salt(fact, salt))
    d = dim.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return f.join(d, [*on, SALT], how).drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: Callable[[], Sequence[Column]],
    final: Callable[[], Sequence[Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial()`` builds the phase-1 aggregate columns over raw rows
    (aliased); ``final()`` builds the phase-2 merge over the partial
    columns. Example (count + sum)::

        two_phase_agg(
            df, ["k"],
            partial=lambda: [F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")],
            final=lambda: [F.sum("n").cast("long").alias("n"), F.sum("s").alias("s")],
        )
    """
    salted = df.withColumn(SALT, _row_salt(df, salt))
    part = salted.groupBy(*keys, SALT).agg(*partial())
    return part.groupBy(*keys).agg(*final())
