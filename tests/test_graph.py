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


def test_triangle_count_known_graphs(spark):
    from index_spark.operators.graph import triangle_count

    # K4 (4 triangles) plus a pendant node hanging off node 0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(0, 9)], "src int, dst int")
    r = triangle_count(edges).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 7, 4)
    # duplicate/reversed edge rows must not change anything
    doubled = edges.union(
        spark.createDataFrame([(b, a) for a, b in k4], "src int, dst int")
    )
    r2 = triangle_count(doubled).collect()[0]
    assert (r2.n_edges, r2.n_triangles) == (7, 4)
    # triangle-free bipartite graph
    bip = spark.createDataFrame(
        [(a, b) for a in (0, 1) for b in (10, 11, 12)], "src int, dst int"
    )
    assert triangle_count(bip).collect()[0].n_triangles == 0
