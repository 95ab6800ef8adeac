"""Heavy-duplicate scale probe (round 8, ordered by the r6/r7 verdicts):
50M rows with ONE value holding 90% of the mass, through
exact_quantiles / exact_quantiles_weighted / equidepth_histogram.

Shape: value 42.0 on rows [0, 45M); the other 5M rows spread uniformly
over 100k distinct values (100.0 .. 100099.0, 50 rows each) — the exact
adversarial case where any value-keyed bucketing concentrates: 42's
bucket holds 90% of the raw rows, so a raw-row per-bucket window plans
one 45M-row single-task sort. The (value, weight) pre-aggregate path
collapses 42 to ONE row.

Every expected answer is closed-form; the probe asserts exactness, then
prints timings for BASELINE.md §(c).

Run: python tools/probe_heavy_dup.py  [--rows 50000000]
"""
import argparse
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from index_spark.operators.stats import (
    equidepth_histogram,
    exact_quantiles,
    exact_quantiles_weighted,
)
from index_spark.session import get_spark

HEAVY = 42.0
N_DISTINCT_TAIL = 100_000
TAIL_BASE = 100.0


def expected_quantile(q: float, n: int, heavy_n: int, tail_each: int) -> float:
    rank = max(1, math.ceil(q * n))
    if rank <= heavy_n:
        return HEAVY
    return TAIL_BASE + (rank - heavy_n - 1) // tail_each


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--bins", type=int, default=100)
    args = ap.parse_args()
    n = args.rows
    heavy_n = int(n * 0.9)
    tail_n = n - heavy_n
    tail_each = tail_n // N_DISTINCT_TAIL
    assert tail_each * N_DISTINCT_TAIL == tail_n, "rows must split evenly"

    spark = get_spark(shuffle_partitions=32)
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") < heavy_n, F.lit(HEAVY))
        .otherwise(TAIL_BASE + ((F.col("id") - heavy_n) % N_DISTINCT_TAIL).cast("double"))
        .alias("v"),
    )

    qs = [0.0, 0.25, 0.5, 0.9, 0.91, 0.95, 0.99, 1.0]
    want = {q: expected_quantile(q, n, heavy_n, tail_each) for q in qs}

    t0 = time.time()
    got = {r["p"]: r["value"] for r in exact_quantiles(df, "v", "id", qs).collect()}
    t_eq = time.time() - t0
    assert got == want, (got, want)

    # the documented pre-aggregated scale path: 100,001 (value, weight) rows
    pre = df.groupBy("v").agg(F.count(F.lit(1)).alias("w"))
    t0 = time.time()
    got_w = {r["p"]: r["value"] for r in exact_quantiles_weighted(pre, "v", "w", qs).collect()}
    t_wq = time.time() - t0
    assert got_w == want, (got_w, want)

    t0 = time.time()
    hist = {r["bin"]: (r["n"], r["lo"], r["hi"]) for r in
            equidepth_histogram(df, "v", "id", bins=args.bins).collect()}
    t_hist = time.time() - t0
    # ntile's split: first r bins hold q+1 rows, the rest q — valid for
    # ANY --bins, not just divisors of --rows
    q, r = divmod(n, args.bins)

    def bin_bounds(b):  # rank interval (start, end] of bin b
        if b <= r:
            start = (b - 1) * (q + 1)
            return start, start + q + 1
        start = r * (q + 1) + (b - 1 - r) * q
        return start, start + q

    assert len(hist) == args.bins
    for b, (cnt, lo, hi) in hist.items():
        start, end = bin_bounds(b)
        assert cnt == end - start, (b, cnt, end - start)
        if end <= heavy_n:  # bin fully inside 42's rank interval
            assert lo == HEAVY and hi == HEAVY, (b, lo, hi)
        elif start >= heavy_n:  # fully in the tail
            assert lo >= TAIL_BASE, (b, lo)

    print(
        f"rows={n} heavy_share=0.9 distinct_tail={N_DISTINCT_TAIL} | "
        f"exact_quantiles {t_eq:.1f}s, exact_quantiles_weighted(pre-agg) "
        f"{t_wq:.1f}s, equidepth_histogram(bins={args.bins}) {t_hist:.1f}s "
        f"| all results closed-form-exact"
    )


if __name__ == "__main__":
    main()
