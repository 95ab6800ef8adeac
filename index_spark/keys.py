"""Composite-key comparison expressions.

The reference compares opaque keys with pluggable comparators
(``Ordering[K]``, per-query ``termComp``/``prefixComp`` —
``QueryableIndex.scala:167,335-368``). Here keys are typed columns; a
"term" may cover only a *prefix* of the key columns (that is exactly what a
prefix comparator does in the reference: compare only the leading
components). These helpers build the lexicographic tuple-comparison
predicates as plain boolean column expressions, which Catalyst pushes down
to parquet row-group min/max pruning — the moral equivalent of the
B+Tree meta-block descent (``Meta.scala:43-63``).

All builders accept ``values`` shorter than ``cols``; comparison is over
the first ``len(values)`` columns only (inclusive variants therefore admit
every key sharing that prefix).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(v: Any) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def key_eq(cols: Sequence[str], values: Sequence[Any]) -> Column:
    """(c1..cn) == (v1..vn) over the leading len(values) columns —
    this *is* the reference's prefix query (``QueryableIndex.scala:422``)."""
    assert 0 < len(values) <= len(cols), "term longer than key"
    expr = _lit(True)
    for c, v in zip(cols, values):
        expr = expr & (F.col(c) == _lit(v))
    return expr


def key_gt(cols: Sequence[str], values: Sequence[Any], inclusive: bool = False) -> Column:
    """Lexicographic (c1..cn) > (v1..vn); inclusive adds prefix equality.

    Expansion: OR_i ( AND_{j<i} cj = vj  AND  ci > vi ) — each disjunct is a
    conjunction of simple comparisons, so parquet predicate pushdown and
    partition pruning both apply.
    """
    assert 0 < len(values) <= len(cols), "term longer than key"
    disjuncts: list[Column] = []
    for i, v in enumerate(values):
        d = F.col(cols[i]) > _lit(v)
        for j in range(i):
            d = (F.col(cols[j]) == _lit(values[j])) & d
        disjuncts.append(d)
    expr = disjuncts[0]
    for d in disjuncts[1:]:
        expr = expr | d
    if inclusive:
        expr = expr | key_eq(cols, values)
    return expr


def key_lt(cols: Sequence[str], values: Sequence[Any], inclusive: bool = False) -> Column:
    """Lexicographic (c1..cn) < (v1..vn); see key_gt."""
    assert 0 < len(values) <= len(cols), "term longer than key"
    disjuncts: list[Column] = []
    for i, v in enumerate(values):
        d = F.col(cols[i]) < _lit(v)
        for j in range(i):
            d = (F.col(cols[j]) == _lit(values[j])) & d
        disjuncts.append(d)
    expr = disjuncts[0]
    for d in disjuncts[1:]:
        expr = expr | d
    if inclusive:
        expr = expr | key_eq(cols, values)
    return expr


def key_between(
    cols: Sequence[str],
    lo: Sequence[Any],
    hi: Sequence[Any],
    lo_inclusive: bool = True,
    hi_inclusive: bool = True,
) -> Column:
    """Two-sided range (reference ``QueryableIndex.scala:432-454``)."""
    return key_gt(cols, lo, inclusive=lo_inclusive) & key_lt(cols, hi, inclusive=hi_inclusive)


def sort_cols(cols: Sequence[str], reverse: bool = False) -> list[Column]:
    """Order-by columns for ascending (or reverse) key order."""
    return [F.col(c).desc() if reverse else F.col(c).asc() for c in cols]


def as_tuple(v: Any) -> tuple:
    """Normalize a scalar or sequence term to a key tuple."""
    if isinstance(v, tuple):
        return v
    if isinstance(v, list):
        return tuple(v)
    return (v,)
