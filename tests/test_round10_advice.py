"""Round-10 ADVICE closures.

1. ``timeseries._floor_div_long``: block/superblock indexes were computed
   via ``F.floor(col / lit(b))`` — DOUBLE division, so |t| > 2^53 could
   drift block boundaries by up to hundreds of buckets while the
   cusum docstring promises exactness up to spans of 2^60. Now exact
   integral ``div`` with a remainder-sign floor correction.
2. ``quality`` run-boundary guard: ``(i == 1) | (element_at(arr, i) !=
   element_at(arr, i - 1))`` relied on Or short-circuiting inside a HOF
   lambda to avoid ``element_at(arr, 0)``; the guard is now a structural
   ``when/otherwise`` so no evaluation order can reach index 0.
"""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from index_spark.operators.timeseries import _floor_div_long, cusum_changepoint
from index_spark.operators.quality import repetition_stats, token_entropy


def test_floor_div_long_exact_beyond_double_precision(spark):
    """Exact floor semantics for longs on both sides of the 2^53 double
    cliff, negatives included (true floor, not truncation toward zero)."""
    b = 1 << 20
    ts = [
        0, 1, -1, b - 1, b, b + 1, -b, -b - 1, -b + 1,
        (1 << 53) - 1, (1 << 53), (1 << 53) + 1,
        (1 << 60) + 123456789, -(1 << 60) - 123456789,
        (1 << 62) + 7, -(1 << 62) - 7,
        # worst case for double rounding: huge odd values near a boundary
        ((1 << 40) * b) + 1, ((1 << 40) * b) - 1, -((1 << 40) * b) - 1,
    ]
    df = spark.createDataFrame([Row(t=t) for t in ts])
    got = {
        r["t"]: r["q"]
        for r in df.select("t", _floor_div_long("t", b).alias("q")).collect()
    }
    for t in ts:
        assert got[t] == t // b, (t, got[t], t // b)
    # and for a non-power-of-two divisor
    d7 = {
        r["t"]: r["q"]
        for r in df.select("t", _floor_div_long("t", 7).alias("q")).collect()
    }
    for t in ts:
        assert d7[t] == t // 7, (t, d7[t], t // 7)


def test_cusum_exact_with_huge_bucket_indexes(spark):
    """cusum_changepoint over bucket indexes past 2^53: the blocked
    prefix-sum plan must still produce the exact brute-force statistic.
    (Before the fix, double-rounded block boundaries could misplace rows
    between adjacent blocks — monotone, so usually still correct; this
    pins the contract with indexes where floor(t/b) in double actually
    differs from exact floor.)"""
    base = (1 << 57) + 12345  # far past the 2^53 double cliff
    rows = [Row(g="a", t=base + i * 3, x=v) for i, v in enumerate([5, 0, 7, 1, 9, 2])]
    rows = [r for r in rows if r.x > 0]
    df = spark.createDataFrame(rows)
    out = cusum_changepoint(df, ["g"], "t", "x").collect()
    assert len(out) == 1
    row = out[0]
    # brute force: S over the dense calendar [min t, max t]
    xs = {r.t: r.x for r in rows}
    tmin, tmax = min(xs), max(xs)
    n = tmax - tmin + 1
    series = [xs.get(tmin + i, 0) for i in range(n)]
    s_n = sum(series)
    best, best_p = -1.0, None
    run = 0
    for p in range(1, n):
        run += series[p - 1]
        stat = abs(run / s_n - p / n)
        if stat > best + 1e-15:
            best, best_p = stat, p
    assert row["n"] == n
    assert row["t_star"] == tmin + best_p - 1
    assert math.isclose(row["stat"], round(best, 6), abs_tol=1e-9)


def test_quality_run_boundary_guard_is_structural(spark):
    """The structural when/otherwise guard produces the same statistics
    as before (semantically identical predicate) — pin values on a doc
    set with repeated and unique grams, including a single-token doc
    (size-1 array exercises the i == 1 arm alone)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a c"),   # bigrams: ab ba ab ba ac
            Row(doc_id=2, text="x y"),            # one bigram
            Row(doc_id=3, text="w"),               # no bigrams -> absent
        ]
    )
    stats = {r["doc_id"]: r for r in repetition_stats(df, k=2).collect()}
    assert set(stats) == {1, 2}
    r1 = stats[1]
    # 5 bigrams: ab×2, ba×2, ac×1 -> top 2/5, dup 4/5
    assert r1["n_grams"] == 5
    assert math.isclose(r1["top_frac"], 2 / 5)
    assert math.isclose(r1["dup_frac"], 4 / 5)
    r2 = stats[2]
    assert r2["n_grams"] == 1 and r2["top_frac"] == 1.0 and r2["dup_frac"] == 0.0

    ent = {r["doc_id"]: r for r in token_entropy(df).collect()}
    # doc 3: single token, entropy 0
    assert ent[3]["n_tokens"] == 1 and ent[3]["entropy"] == 0.0
    # doc 1: tfs a:3 b:2 c:1, n=6
    tfs = [1, 2, 3]
    n = 6
    expected = round(math.log(n) - sum(v * math.log(v) for v in tfs) / n, 6)
    assert math.isclose(ent[1]["entropy"], expected, abs_tol=1e-9)
