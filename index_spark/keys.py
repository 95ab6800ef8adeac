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


def _eq_leg(c: str, v: Any) -> Column:
    """Null-safe equality for one key column: NULL matches NULL (a seek
    boundary captured from a row with a NULL key column must resume past
    exactly that row). Plain ``==`` stays for non-null literals — the
    pushdown-friendliest form."""
    if v is None:
        return F.col(c).isNull()
    if isinstance(v, Column):
        return F.col(c).eqNullSafe(v)
    return F.col(c) == F.lit(v)


def _gt_leg(c: str, v: Any) -> Column:
    """c > v under the engine's total key order (NULL sorts FIRST — matching
    :func:`sort_cols`' asc-nulls-first): every non-null value is greater
    than NULL, and a NULL cell is greater than nothing."""
    if v is None:
        return F.col(c).isNotNull()
    if isinstance(v, Column):
        return (F.col(c) > v) | (v.isNull() & F.col(c).isNotNull())
    return F.col(c) > F.lit(v)


def _lt_leg(c: str, v: Any) -> Column:
    """c < v under NULL-sorts-first: a NULL cell is smaller than any
    non-null bound; nothing is smaller than NULL."""
    if v is None:
        return F.lit(False)
    if isinstance(v, Column):
        return (F.col(c) < v) | (F.col(c).isNull() & v.isNotNull())
    return (F.col(c) < F.lit(v)) | F.col(c).isNull()


def key_eq(cols: Sequence[str], values: Sequence[Any]) -> Column:
    """(c1..cn) == (v1..vn) over the leading len(values) columns —
    this *is* the reference's prefix query (``QueryableIndex.scala:422``)."""
    assert 0 < len(values) <= len(cols), "term longer than key"
    expr = _lit(True)
    for c, v in zip(cols, values):
        expr = expr & _eq_leg(c, v)
    return expr


def _key_cmp(
    cols: Sequence[str], values: Sequence[Any], leg, inclusive: bool
) -> Column:
    """Lexicographic comparison via the standard expansion
    OR_i ( AND_{j<i} cj = vj  AND  leg(ci, vi) ) — each disjunct is a
    conjunction of simple comparisons (plus IsNull/IsNotNull for nullable
    bounds), so parquet predicate pushdown and partition pruning both
    apply. All legs honour one total order: NULL sorts first."""
    assert 0 < len(values) <= len(cols), "term longer than key"
    disjuncts: list[Column] = []
    for i, v in enumerate(values):
        d = leg(cols[i], v)
        for j in range(i):
            d = _eq_leg(cols[j], values[j]) & d
        disjuncts.append(d)
    expr = disjuncts[0]
    for d in disjuncts[1:]:
        expr = expr | d
    if inclusive:
        expr = expr | key_eq(cols, values)
    return expr


def key_gt(cols: Sequence[str], values: Sequence[Any], inclusive: bool = False) -> Column:
    """Lexicographic (c1..cn) > (v1..vn); inclusive adds prefix equality."""
    return _key_cmp(cols, values, _gt_leg, inclusive)


def key_lt(cols: Sequence[str], values: Sequence[Any], inclusive: bool = False) -> Column:
    """Lexicographic (c1..cn) < (v1..vn); see key_gt."""
    return _key_cmp(cols, values, _lt_leg, inclusive)


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
