"""Round-9 scale items: the two-level (block) prefix sum inside
``cusum_changepoint`` — the r8-verdict upgrade that removes the last
whole-group row-level window from the time-series family (the equidepth
(value, weight) precedent applied to a prefix aggregate).

Correctness is pinned against the same brute-force Python model the r8
tests use, with ``block_size`` forced tiny so block-boundary assembly
(offset + within-block prefix) is actually exercised; the plan test locks
the scale property itself: every row-level window is partitioned by
(group, block), never by group alone."""

import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.timeseries import cusum_changepoint

from tests.test_round8b_series import py_cusum_brute


def test_cusum_multiblock_equals_brute(spark):
    # series spanning many tiny blocks, including blocks with no nonzero
    # bucket (the offset prefix must skip them without dropping mass)
    rng = random.Random(91)
    rows, series = [], {}
    for g in ["a", "b", "c"]:
        buckets = {}
        for t in rng.sample(range(0, 500), 120):
            buckets[t] = rng.randrange(0, 7)
        if max(buckets.values()) == 0:
            buckets[max(buckets)] = 3
        series[g] = buckets
        rows += [(g, t, x) for t, x in buckets.items()]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = {
        r["g"]: (r["n"], r["t_star"], r["stat"])
        for r in cusum_changepoint(df, ["g"], "t", "x", block_size=16).collect()
    }
    for g in series:
        n, ts, st = py_cusum_brute(series[g])
        assert got[g][0] == n and got[g][1] == ts, g
        assert got[g][2] == pytest.approx(round(st, 6), abs=1e-6)


def test_cusum_block_boundary_positions(spark):
    # mass exactly AT a block boundary: the candidate just-before the
    # first bucket of a block reads the PREVIOUS block's offset
    buckets = {15: 4, 16: 1, 31: 2, 32: 9, 48: 5}
    df = spark.createDataFrame(
        [("g", t, x) for t, x in buckets.items()], "g string, t long, x long"
    )
    row = cusum_changepoint(df, ["g"], "t", "x", block_size=16).collect()[0]
    n, ts, st = py_cusum_brute(buckets)
    assert (row["n"], row["t_star"]) == (n, ts)
    assert row["stat"] == pytest.approx(round(st, 6), abs=1e-6)


def test_cusum_global_series_no_groups(spark):
    # group_cols=[] is the global-series path (1-row broadcast totals)
    rng = random.Random(92)
    buckets = {t: (1 if t < 300 else 6) for t in rng.sample(range(0, 600), 200)}
    df = spark.createDataFrame(
        [(t, x) for t, x in buckets.items()], "t long, x long"
    )
    row = cusum_changepoint(df, [], "t", "x", block_size=64).collect()[0]
    n, ts, st = py_cusum_brute(buckets)
    assert (row["n"], row["t_star"]) == (n, ts)
    assert row["stat"] == pytest.approx(round(st, 6), abs=1e-6)


def test_cusum_row_window_is_block_partitioned(spark):
    """The scale contract itself: the only window ordered by the bucket
    column must be partitioned by (group, __blk) — a window partitioned
    by the group alone would put a whole 500M-bucket series back into
    one task. The block-offset window (ordered by __blk) runs over the
    per-block AGGREGATE and is allowed."""
    df = spark.createDataFrame([("g", 1, 2), ("g", 99, 3)], "g string, t long, x long")
    p = (
        cusum_changepoint(df, ["g"], "t", "x")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    row_windows = [
        ln for ln in p.splitlines()
        if "Window" in ln and re.search(r"__t#\d+L? ASC", ln)
    ]
    assert row_windows, p  # the within-block prefix window must exist
    for ln in row_windows:
        assert "__blk" in ln, ln


def test_cusum_block_size_guard(spark):
    df = spark.createDataFrame([("g", 1, 2)], "g string, t long, x long")
    with pytest.raises(ValueError, match="block_size"):
        cusum_changepoint(df, ["g"], "t", "x", block_size=1)


def test_cusum_null_keys_refused(spark):
    # equi-joins in the two-level scan drop NULL keys where the old
    # whole-group window grouped them — the contract is a loud refusal
    df = spark.createDataFrame(
        [("g", 1, 2), (None, 3, 5)], "g string, t long, x long"
    )
    with pytest.raises(ValueError, match="NULL"):
        cusum_changepoint(df, ["g"], "t", "x").collect()
    df2 = spark.createDataFrame([("g", None, 2), ("g", 3, 5)], "g string, t long, x long")
    with pytest.raises(ValueError, match="NULL"):
        cusum_changepoint(df2, ["g"], "t", "x").collect()


def test_cusum_sparse_series_one_bucket_per_block(spark):
    # ~1 nonzero bucket per block: the level-1 block frame is as large
    # as the row frame, so correctness must come from the SUPERBLOCK
    # offset level (the review finding: a single block-offset window
    # would re-serialize sparse series)
    rng = random.Random(93)
    buckets = {}
    for i in rng.sample(range(0, 4000), 150):
        buckets[i * 16 + rng.randrange(0, 16)] = rng.randrange(1, 5)
    df = spark.createDataFrame(
        [("g", t, x) for t, x in buckets.items()], "g string, t long, x long"
    )
    row = cusum_changepoint(df, ["g"], "t", "x", block_size=16).collect()[0]
    n, ts, st = py_cusum_brute(buckets)
    assert (row["n"], row["t_star"]) == (n, ts)
    assert row["stat"] == pytest.approx(round(st, 6), abs=1e-6)


def test_cusum_superblock_level_is_adaptive(spark):
    # span ≤ block_size² → the cheaper two-level plan (no __sblk);
    # span > block_size² → the superblock offset level engages
    small = spark.createDataFrame(
        [("g", 1, 2), ("g", 200, 3)], "g string, t long, x long"
    )
    p_small = (
        cusum_changepoint(small, ["g"], "t", "x", block_size=16)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "__sblk" not in p_small
    big = spark.createDataFrame(
        [("g", 1, 2), ("g", 1000, 3)], "g string, t long, x long"
    )
    p_big = (
        cusum_changepoint(big, ["g"], "t", "x", block_size=16)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "__sblk" in p_big
