"""Per-group quotas (domain caps) — the C4/RefinedWeb "at most N documents
per domain" step, and any other keep-the-best-N-per-key rule.

A naive ``row_number() OVER (PARTITION BY domain ORDER BY quality)`` puts
every row of the hottest domain through ONE task's sort — the classic skew
wall at 100 TB, where a single crawl domain can hold 10⁸ rows. The
two-phase shape here is exact and skew-proof:

1. salt phase: rank within ``(group, salt)`` cells (salt = deterministic
   hash of the id), keep each cell's top ``n`` — every task sorts at most
   ``rows/salts`` of the hottest group, and at most ``n × salts`` rows per
   group survive (a guaranteed superset of the true top ``n``);
2. exact phase: rank the survivors within ``group`` alone — now bounded to
   ``n × salts`` rows per group, so the single-task sort is trivial.

Same algebra as the two-phase skew aggregation (``operators/skew.py``),
applied to top-N. Reference analog: none (the reference has no
aggregation); this is pipeline machinery the brief's scale goal requires.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    order_cols: Sequence,
    id_col: str,
    salts: int = 16,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first by ``order_cols``
    (pass Columns, e.g. ``[F.col("n_chars").desc(), F.col("doc_id")]`` —
    include a unique tie-break so the cap is deterministic). Exact: equals
    the single-window top-N for every input. ``keep_rank`` adds the final
    1-based ``rank`` column."""
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts))
    w1 = Window.partitionBy(*group_cols, salt).orderBy(*order_cols)
    survivors = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    capped = survivors.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= n
    )
    if keep_rank:
        return capped.withColumnRenamed("__rn", "rank")
    return capped.drop("__rn")
