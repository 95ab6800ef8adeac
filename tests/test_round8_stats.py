"""Round-8 stats regressions: the heavy-duplicate-proof equidepth
rewrite (rank-interval arithmetic over the (value, weight) pre-aggregate
— no row-level window) must keep EXACT ntile semantics on every shape,
including the adversarial one the raw-row formulation degenerated on
(one value holding 90% of the mass → 90% of rows in one bucket's
single-task row_number window; measured 43.3 s → 7.4 s at 50M rows,
tools/probe_heavy_dup.py, BASELINE.md §(c))."""

import random
from collections import Counter

from pyspark.sql import functions as F

from index_spark.operators.stats import equidepth_histogram


def _ntile_reference(values, bins):
    """Pure-Python ntile over the sorted multiset → {bin: (n, lo, hi)}."""
    s = sorted(values)
    n = len(s)
    q, r = divmod(n, bins)
    out = {}
    i = 0
    for b in range(1, bins + 1):
        size = (q + 1) if b <= r else q
        if size == 0:
            continue
        chunk = s[i : i + size]
        out[b] = (size, chunk[0], chunk[-1])
        i += size
    return out


def _run(spark, values, bins):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id long, v double"
    )
    return {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in equidepth_histogram(df, "v", "id", bins=bins).collect()
    }


def test_equidepth_heavy_atom_exact(spark):
    """90% of the column is ONE value: its rank interval spans 9 of 10
    bins; boundaries and counts must match ntile exactly."""
    values = [42.0] * 9000 + [100.0 + (i % 50) for i in range(1000)]
    got = _run(spark, values, 10)
    assert got == _ntile_reference(values, 10)
    # the heavy value fully owns bins 1..9
    for b in range(1, 10):
        assert got[b] == (1000, 42.0, 42.0)


def test_equidepth_randomized_vs_ntile_reference(spark):
    rng = random.Random(8)
    for trial in range(4):
        n = rng.randrange(5, 400)
        bins = rng.choice([3, 7, 10])
        # mixtures with ties, atoms, and uneven splits
        values = [float(rng.choice([1, 1, 1, 2, 5, 9, 9, 13])) for _ in range(n)]
        assert _run(spark, values, bins) == _ntile_reference(values, bins), (
            trial,
            n,
            bins,
        )


def test_equidepth_fewer_rows_than_bins(spark):
    values = [3.0, 1.0, 2.0]
    got = _run(spark, values, 10)
    assert got == {1: (1, 1.0, 1.0), 2: (1, 2.0, 2.0), 3: (1, 3.0, 3.0)}


def test_equidepth_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(0, None), (1, 4.0), (2, 1.0), (3, None), (4, 2.0), (5, 3.0)],
        "id long, v double",
    )
    got = {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in equidepth_histogram(df, "v", "id", bins=2).collect()
    }
    assert got == {1: (2, 1.0, 2.0), 2: (2, 3.0, 4.0)}


def test_equidepth_no_rowlevel_window(spark):
    """The plan's window functions must run over the (value, weight)
    pre-aggregate, never the raw rows: every Window node in the
    optimized plan sits ABOVE the Aggregate that collapses duplicates."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    plan = (
        equidepth_histogram(df, "v", "id", bins=5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # reading the tree top-down, the LAST Aggregate is the duplicate
    # collapse; no Window may appear after (below) it
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "Window" in l.split("[")[0]]
    agg_idx = [i for i, l in enumerate(lines) if l.lstrip(" :+-").startswith("Aggregate")]
    assert win_idx and agg_idx
    assert max(win_idx) < max(agg_idx), plan
