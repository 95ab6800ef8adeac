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
    (equal values are interchangeable at equal ranks)."""
    group_cols = list(group_cols)
    w_rank = Window.partitionBy(*group_cols).orderBy(value_col)
    w_all = Window.partitionBy(*group_cols)
    ranked = df.select(
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
        ).alias(f"p{round(p * 100):02d}")
        for p in ps
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)
