"""Round-3 batch-7: BFS hop distances and data-quality expectations."""

from collections import deque

from pyspark.sql import functions as F

from index_spark.operators.graph import bfs_hops
from index_spark.operators.stats import expectations, fk_violations


# ------------------------------------------------------------- BFS
def _bfs_model(edges, source, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {source: 0}
    q = deque([source])
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def test_bfs_hops_python_model(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, source=1, max_hops=3).collect()}
    assert got == _bfs_model(edges, 1, 3)
    # the disconnected component (7,8) is absent; node 5 is beyond 3 hops
    assert 7 not in got and 5 not in got


def test_bfs_hops_early_stop_and_undirected(spark):
    # directed edge given as (5 -> 1): BFS must still traverse 1 -> 5
    df = spark.createDataFrame([(5, 1)], "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, source=1, max_hops=6).collect()}
    assert got == {1: 0, 5: 1}


def test_bfs_hops_cycle_takes_min_distance(spark):
    # ring of 6: opposite node at hop 3, never 5
    ring = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(ring, "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, source=0, max_hops=6).collect()}
    assert got == {0: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


# ------------------------------------------------------------- expectations
def test_expectations_counts_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "k long, v double"
    )
    got = {
        r.rule: (r.n_rows, r.n_violations)
        for r in expectations(
            df,
            [
                ("v_positive", F.col("v") > 0),
                ("v_not_null", F.col("v").isNotNull()),
                ("k_unique_range", F.col("k").between(1, 100)),
            ],
        ).collect()
    }
    # NULL comparison result counts as a violation (unknown is not a pass)
    assert got == {
        "v_positive": (4, 2),
        "v_not_null": (4, 1),
        "k_unique_range": (4, 0),
    }


def test_expectations_single_scan(spark, lineitem):
    """All rules fold into ONE aggregate over one scan."""
    import io
    from contextlib import redirect_stdout

    rep = expectations(
        lineitem,
        [("q", F.col("l_quantity") > 0), ("p", F.col("l_extendedprice") > 0)],
    )
    import re

    buf = io.StringIO()
    with redirect_stdout(buf):
        rep.explain("formatted")
    plan = buf.getvalue()
    # formatted output repeats each node in the detail section: count the
    # numbered detail headers, one per physical node
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_fk_violations_model(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_violations(child, parent, "fk", "pk").collect()[0]
    assert (r.n_child, r.n_orphans) == (4, 2)
