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


def test_star_cc_matches_propagation_on_random_graphs(spark):
    """large-star/small-star must produce the identical (id, min-label)
    map as min-label propagation on random graphs."""
    import random

    from index_spark.operators.graph import connected_components, connected_components_star

    rng = random.Random(11)
    pairs = list({(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(45)})
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "s long, d long")
    a = {(r.id, r.label) for r in connected_components(edges, "s", "d").collect()}
    b = {(r.id, r.label) for r in connected_components_star(edges, "s", "d").collect()}
    assert a == b


def test_star_cc_contracts_a_long_chain(spark):
    """The adversarial case propagation is slow on: one 60-node path must
    resolve to a single component with label 0 — within the star variant's
    logarithmic round budget (max_iter=12 << diameter 60)."""
    from index_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(60)]
    edges = spark.createDataFrame(chain, "s long, d long")
    out = connected_components_star(edges, "s", "d", max_iter=12)
    rows = out.collect()
    assert {r.label for r in rows} == {0}
    assert {r.id for r in rows} == set(range(61))
