"""Tests for connected-components duplicate-cluster resolution."""

import pytest

from index_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: r.label for r in connected_components(df, "src", "dst", **kw).collect()}


def test_chain_and_island(spark):
    out = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_direction_irrelevant(spark):
    assert _cc(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_deep_chain_converges(spark):
    n = 12
    out = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(out.values()) == {0}


def test_max_iter_raises(spark):
    with pytest.raises(RuntimeError):
        _cc(spark, [(i, i + 1) for i in range(8)], max_iter=1)
