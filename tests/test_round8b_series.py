"""Round-8 continuation, batch 2: acf_series, gini_concentration,
benford_profile, and the streaming count-min twin — each against a
brute-force Python model (oracle twins check the DuckDB replay)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.stats import benford_profile, gini_concentration
from index_spark.operators.timeseries import acf_series


# ---------------------------------------------------------------- models
def py_acf(buckets, lags):
    # buckets: {t: x}; zero-fill the calendar [min, max]
    mn, mx = min(buckets), max(buckets)
    xs = [buckets.get(t, 0) for t in range(mn, mx + 1)]
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    out = {}
    for k in lags:
        if k >= n or den == 0:
            out[k] = None
            continue
        num = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n))
        out[k] = num / den
    return n, out


def py_gini(vals):
    vals = sorted(v for v in vals if v is not None)
    n, s = len(vals), sum(vals)
    if s == 0:
        return n, 0, None
    iws = sum((i + 1) * x for i, x in enumerate(vals))
    return n, s, (2 * iws - (n + 1) * s) / (n * s)


# ---------------------------------------------------------------- tests
def test_acf_series_vs_python(spark):
    rng = random.Random(85)
    rows, series = [], {}
    for g in ["a", "b"]:
        buckets = {}
        # a seasonal-ish sparse series with gaps
        for t in range(0, 200):
            if rng.random() < 0.7:
                x = 5 + (3 if t % 7 == 0 else 0) + rng.randrange(0, 4)
                buckets[t] = x
        series[g] = buckets
        rows += [(g, t, x) for t, x in buckets.items()]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    lags = [1, 2, 7]
    got = {
        (r["g"], r["lag"]): (r["n"], r["acf"])
        for r in acf_series(df, ["g"], "t", "x", lags).collect()
    }
    for g in series:
        n, exp = py_acf(series[g], lags)
        for k in lags:
            assert got[(g, k)][0] == n
            assert got[(g, k)][1] == pytest.approx(round(exp[k], 6), abs=2e-6)
    # the weekly spike shows at lag 7
    assert got[("a", 7)][1] > got[("a", 1)][1]


def test_acf_series_edge_cases(spark):
    # constant series: zero variance -> NULL; lag >= n -> NULL
    df = spark.createDataFrame([("g", 0, 5), ("g", 1, 5), ("g", 2, 5)], "g string, t long, x long")
    got = {r["lag"]: r["acf"] for r in acf_series(df, ["g"], "t", "x", [1, 5]).collect()}
    assert got == {1: None, 5: None}
    with pytest.raises(ValueError, match="lags"):
        acf_series(df, ["g"], "t", "x", [0, 1])
    with pytest.raises(ValueError, match="integral"):
        acf_series(
            spark.createDataFrame([("g", 0, 5.0)], "g string, t long, x double"),
            ["g"], "t", "x", [1],
        )


def test_acf_series_perfect_alternation(spark):
    # x alternates: lag-1 acf ~ -1, lag-2 ~ +1 (finite-sample estimator)
    rows = [("g", t, 10 if t % 2 == 0 else 0) for t in range(100)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = {r["lag"]: r["acf"] for r in acf_series(df, ["g"], "t", "x", [1, 2]).collect()}
    buckets = {t: x for _, t, x in rows}
    _, exp = py_acf(buckets, [1, 2])
    assert got[1] == pytest.approx(round(exp[1], 6), abs=2e-6)
    assert got[2] == pytest.approx(round(exp[2], 6), abs=2e-6)
    assert got[1] < -0.9 and got[2] > 0.9


def test_gini_concentration_vs_python(spark):
    rng = random.Random(86)
    rows, expected = [], {}
    vals_even = [100] * 50
    vals_skew = [rng.randrange(1, 10) for _ in range(49)] + [100000]
    rows += [("even", v) for v in vals_even] + [("skew", v) for v in vals_skew]
    expected["even"] = py_gini(vals_even)
    expected["skew"] = py_gini(vals_skew)
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_concentration(df, ["g"], "v").collect()
    }
    for g, (n, s, gv) in expected.items():
        assert got[g][0] == n and got[g][1] == s
        assert got[g][2] == pytest.approx(round(gv, 6), abs=1e-6)
    assert got["even"][2] == 0.0
    assert got["skew"][2] > 0.9


def test_gini_concentration_guards(spark):
    df = spark.createDataFrame([("g", -1), ("g", 5)], "g string, v long")
    with pytest.raises(ValueError, match="negative"):
        gini_concentration(df, ["g"], "v")
    # all-zero total -> NULL gini; NULLs excluded
    df2 = spark.createDataFrame([("g", 0), ("g", 0), ("g", None)], "g string, v long")
    [r] = gini_concentration(df2, ["g"], "v").collect()
    assert (r["n"], r["total"], r["gini"]) == (2, 0, None)


def test_benford_profile_vs_python(spark):
    rng = random.Random(87)
    # log-uniform magnitudes: approximately Benford
    vals = [int(math.exp(rng.uniform(0, 12))) + 1 for _ in range(4000)]
    vals += [0, -5, None]  # excluded
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = benford_profile(df, "v").collect()
    assert [r["digit"] for r in rows] != []
    got = {r["digit"]: (r["n"], r["share"], r["benford"]) for r in rows}
    assert set(got) == set(range(1, 10))
    from collections import Counter

    pos = [v for v in vals if v is not None and v > 0]
    cnt = Counter(int(str(v)[0]) for v in pos)
    for d in range(1, 10):
        assert got[d][0] == cnt.get(d, 0)
        assert got[d][1] == pytest.approx(round(cnt.get(d, 0) / len(pos), 6), abs=1e-6)
        assert got[d][2] == pytest.approx(round(math.log10(1 + 1 / d), 6), abs=1e-6)
    # log-uniform data leans Benford: digit 1 ~ 30%
    assert abs(got[1][1] - 0.30103) < 0.05


def test_benford_profile_all_nine_rows_and_guard(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "v long")
    rows = benford_profile(df, "v").collect()
    assert len(rows) == 9
    got = {r["digit"]: r["n"] for r in rows}
    assert got[1] == 2 and got[2] == 1 and got[9] == 0
    with pytest.raises(ValueError, match="no positive"):
        benford_profile(spark.createDataFrame([(0,), (None,)], "v long"), "v")


def test_stream_cms_cells_equal_batch(spark, sf_dir):
    """The streaming count fold drained with availableNow must equal the
    batch sketch cellwise (count is a sum monoid; availableNow replays
    nothing)."""
    import uuid

    from index_spark.operators.sampling import cms_build
    from index_spark.sources import load_table
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import cms_cells_stream

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    got = run_available_now(
        cms_cells_stream(stream, "user_id"), "t8cms" + uuid.uuid4().hex[:8]
    )
    ev = load_table(spark, sf_dir, "events")
    want = cms_build(ev, "user_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ------------------------------------------------------------- cusum
def py_cusum(buckets):
    mn, mx = min(buckets), max(buckets)
    xs = [buckets.get(t, 0) for t in range(mn, mx + 1)]
    n = len(xs)
    sn = sum(xs)
    if n < 2:
        return None
    best = None  # (abs_d, -p) maximized, then earliest p
    sp = 0
    for p0, x in enumerate(xs):
        p = p0 + 1
        sp += x
        for pp, s in ((p, sp), (p - 1, sp - x)):
            if 1 <= pp <= n - 1:
                d = abs(n * s - pp * sn)
                # zero-gap positions are dominated by segment endpoints
                if best is None or (d, -pp) > best:
                    best = (d, -pp)
    if sn == 0:
        return n, mn - best[1] - 1, None
    return n, mn - best[1] - 1, best[0] / (n * sn)


def py_cusum_brute(buckets):
    # full zero-filled scan: every position p in [1, n-1]
    mn, mx = min(buckets), max(buckets)
    xs = [buckets.get(t, 0) for t in range(mn, mx + 1)]
    n, sn = len(xs), sum(xs)
    best, sp = None, 0
    for p in range(1, n):
        sp += xs[p - 1]
        d = abs(n * sp - p * sn)
        if best is None or (d, -p) > best:
            best = (d, -p)
    return n, mn - best[1] - 1, (best[0] / (n * sn) if sn else None)


def test_cusum_endpoint_trick_equals_brute():
    # property: evaluating only segment endpoints finds the true max
    rng = random.Random(88)
    for _ in range(200):
        buckets = {}
        for t in rng.sample(range(0, 50), rng.randrange(2, 12)):
            buckets[t] = rng.randrange(0, 9)
        if max(min(buckets), 0) == max(buckets):
            continue
        assert py_cusum(buckets) == py_cusum_brute(buckets)


def test_cusum_changepoint_vs_python(spark):
    from index_spark.operators.timeseries import cusum_changepoint

    rng = random.Random(89)
    rows, series = [], {}
    for g in ["a", "b"]:
        buckets = {}
        shift = 120 if g == "a" else 60
        for t in range(0, 200):
            if rng.random() < 0.6:
                buckets[t] = (2 if t < shift else 10) + rng.randrange(0, 3)
        series[g] = buckets
        rows += [(g, t, x) for t, x in buckets.items()]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = {
        r["g"]: (r["n"], r["t_star"], r["stat"])
        for r in cusum_changepoint(df, ["g"], "t", "x").collect()
    }
    for g in series:
        n, ts, st = py_cusum_brute(series[g])
        assert got[g][0] == n and got[g][1] == ts
        assert got[g][2] == pytest.approx(round(st, 6), abs=1e-6)
    # the detected change point sits near the planted shift
    assert abs(got["a"][1] - 120) < 15 and abs(got["b"][1] - 60) < 15


def test_cusum_changepoint_edges(spark):
    from index_spark.operators.timeseries import cusum_changepoint

    # zero total mass -> stat NULL; single calendar cell -> absent
    df = spark.createDataFrame(
        [("z", 0, 0), ("z", 5, 0), ("one", 7, 3)], "g string, t long, x long"
    )
    got = {r["g"]: r for r in cusum_changepoint(df, ["g"], "t", "x").collect()}
    assert set(got) == {"z"}
    assert got["z"]["stat"] is None
    with pytest.raises(ValueError, match="negative"):
        cusum_changepoint(
            spark.createDataFrame([("g", 0, -1), ("g", 3, 5)], "g string, t long, x long"),
            ["g"], "t", "x",
        )


def test_acf_guard_not_disarmed_by_decimal_overflow(spark):
    # values whose SUM OF SQUARES overflows decimal(38,0): the guard must
    # bound from raw inputs and raise, never read the (NULL) decimal sum
    from index_spark.operators.timeseries import acf_series

    big = 3 * 10**18
    rows = [("g", t, big) for t in range(12)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    with pytest.raises(ValueError, match="overflow"):
        acf_series(df, ["g"], "t", "x", [1])


def test_gini_total_bigint_overflow_guard(spark):
    # passes the decimal(38,0) product guard but the BIGINT total could
    # overflow -> loud error, not a silent NULL total
    big = 9 * 10**18
    df = spark.createDataFrame([("g", big), ("g", big)], "g string, v long")
    with pytest.raises(ValueError, match="BIGINT"):
        gini_concentration(df, ["g"], "v")


# ------------------------------------------------------- plan shapes
import io
from contextlib import redirect_stdout

import __spark_entry__ as em


def _plan_of(spark, sf_dir, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        em.queries()[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_round8b_plans_no_cartesian(spark, sf_dir):
    """None of the continuation queries may degrade to a row-multiplying
    nested loop: every join is equi (acf/cusum self-joins on (group,
    t−k) / marginal keys; dsir bucket join is an equi broadcast) and the
    only crossJoins are 1×N scalar broadcasts (chi2 grid is |A|×|B| of
    two categorical-small marginal frames — checked separately)."""
    for name in ["corr_lineitem", "mad_outliers", "acf_hourly",
                 "cusum_events", "gini_orders", "benford_prices",
                 "dsir_weights"]:
        p = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_corr_matrix_single_aggregate_plan(spark, sf_dir):
    """The correlation matrix is ONE partial-agg shuffle to one row —
    exactly one Exchange, no joins of any kind."""
    p = _plan_of(spark, sf_dir, "corr_lineitem")
    assert p.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)
    assert "Join" not in p


def test_mad_outliers_single_exchange_plan(spark, sf_dir):
    """Median, MAD, and the rollup all ride ONE group-key exchange: the
    two rank windows and the final aggregate must not re-shuffle."""
    p = _plan_of(spark, sf_dir, "mad_outliers")
    import re

    # count DISTINCT Exchange operator nodes in the formatted plan tree
    n_exch = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exch == 1, p[:2000]
