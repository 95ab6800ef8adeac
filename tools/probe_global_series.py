"""Global-series CUSUM scale probe (round 9, ordered by the r8 verdict):
ONE group whose series has tens of millions of nonzero buckets — the
exact case where the r8 implementation's per-group prefix-sum window
planned a single-task sort of the whole series.

Shape: a single series over t in [0, 2·N) keeping every even t (N
nonzero buckets, 50% calendar density), x = 1 before the planted change
point at t = 1.2·N and x = 3 after — so the true split is known in
closed form and the probe asserts exactness, then prints timings for
BASELINE.md §(c).

Two configurations run the SAME operator:
  blocked      block_size = 2^20 (the shipped default): the row-level
               window is partitioned by (group, block), tasks ≤ 2^20
               buckets.
  single-task  block_size = 2^62: one block spans the whole series —
               reproduces the r8 single-task shape for comparison.

Run: python tools/probe_global_series.py  [--buckets 20000000]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from index_spark.operators.timeseries import cusum_changepoint
from index_spark.session import get_spark


def expected(n_buckets: int):
    """Closed-form argmax for the step series: x=1 on even t < shift,
    x=3 on even t >= shift, calendar n = 2·N−1 (t = 0 .. 2N−2).

    D_p = n·S_p − p·S_n is maximized at the change point: before the
    shift S grows slower than the uniform line, so |D| peaks where the
    rate flips — at p = shift (mass through t = shift−1 vs after)."""
    shift_t = 2 * ((6 * n_buckets) // 10)  # even, = 1.2·N in t units
    n = 2 * n_buckets - 1
    n_lo = shift_t // 2  # even buckets below shift_t
    s_n = n_lo * 1 + (n_buckets - n_lo) * 3
    best = None
    # |D| is piecewise-linear with breakpoints only at bucket edges; the
    # true max is at the change point. Scan the operator's own two
    # candidates at the first high bucket (t = shift_t): the position
    # just before it (p = shift_t, mass n_lo) and the bucket itself
    # (p = shift_t + 1, mass n_lo + 3 — review catch: the first draft
    # reused n_lo here, overstating d* by exactly S_n, invisible at 20M
    # buckets only because S_n/d* ≈ 1.9/N sat under the 1e-6 tolerance)
    for p, s_p in ((shift_t, n_lo), (shift_t + 1, n_lo + 3)):
        d = abs(n * s_p - p * s_n)
        if best is None or (d, -p) > (best[0], -best[1]):
            best = (d, p)
    return n, s_n, best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, default=20_000_000)
    args = ap.parse_args()
    n_buckets = args.buckets
    shift_t = 2 * ((6 * n_buckets) // 10)

    spark = get_spark(app_name="probe_global_series")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    series = (
        spark.range(0, n_buckets, 1, 32)
        .select(
            (F.col("id") * 2).alias("t"),
            F.when(F.col("id") * 2 < F.lit(shift_t), F.lit(1))
            .otherwise(F.lit(3))
            .cast("long")
            .alias("x"),
        )
    )

    n_cal, s_n, (d_star, p_star) = expected(n_buckets)
    for label, bs in (("blocked(2^20)", 1 << 20), ("single-task(2^62)", 1 << 62)):
        t0 = time.time()
        row = cusum_changepoint(series, [], "t", "x", block_size=bs).collect()[0]
        dt = time.time() - t0
        stat = round(d_star / (n_cal * s_n), 6)
        assert row["n"] == n_cal, (label, row)
        assert abs(row["stat"] - stat) <= 1e-6, (label, row, stat)
        assert row["t_star"] == p_star - 1, (label, row, p_star)
        print(f"{label:>18}: {dt:6.1f} s  n={row['n']} t_star={row['t_star']} stat={row['stat']}")


if __name__ == "__main__":
    main()
