"""Round-8 continuation operators: correlation_matrix, mad_outlier_stats,
chi2_independence — each checked against a brute-force pure-Python model
(the catalog oracle twins check the DuckDB replay; these pin the math)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.stats import (
    chi2_independence,
    correlation_matrix,
    mad_outlier_stats,
)


# ---------------------------------------------------------------- models
def py_pearson(xs, ys):
    pts = [(x, y) for x, y in zip(xs, ys) if x is not None and y is not None]
    n = len(pts)
    if n < 2:
        return n, None
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx == 0 or deny == 0:
        return n, None
    return n, (n * sxy - sx * sy) / math.sqrt(float(denx) * float(deny))


def py_mad(vals, k):
    vals = sorted(v for v in vals if v is not None)
    n = len(vals)
    med = vals[math.ceil(0.5 * n) - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[math.ceil(0.5 * n) - 1]
    n_out = sum(1 for v in vals if abs(v - med) > k * float(mad))
    return n, med, mad, n_out


def py_chi2(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    from collections import Counter

    obs = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            d = obs.get((a, b), 0) - e
            chi2 += d * d / e
    return n, len(ra), len(cb), chi2


# ---------------------------------------------------------------- tests
def test_correlation_matrix_vs_python(spark):
    rng = random.Random(81)
    rows = []
    for _ in range(400):
        x = rng.randrange(-50, 500)
        y = 3 * x + rng.randrange(-40, 40)  # strongly correlated with x
        z = rng.randrange(0, 1000)  # independent
        rows.append((x, y, z))
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {
        (r["col_x"], r["col_y"]): (r["n_points"], r["corr"])
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    cols = {"x": [r[0] for r in rows], "y": [r[1] for r in rows], "z": [r[2] for r in rows]}
    for (a, b), (n, c) in got.items():
        en, ec = py_pearson(cols[a], cols[b])
        assert n == en
        assert c == pytest.approx(round(ec, 6), abs=1e-6)
    assert got[("x", "y")][1] > 0.95
    assert abs(got[("x", "z")][1]) < 0.2


def test_correlation_matrix_pairwise_nulls_and_degenerate(spark):
    rows = [
        (1, 10, None),
        (2, None, 7),
        (3, 30, 7),
        (None, 40, 7),
        (5, 50, 7),
    ]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {
        (r["col_x"], r["col_y"]): (r["n_points"], r["corr"])
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    # x,y complete pairs: (1,10),(3,30),(5,50) — perfect line
    assert got[("x", "y")] == (3, 1.0)
    # x,z complete pairs: (2,7),(3,7),(5,7) — zero z-variance -> NULL
    assert got[("x", "z")] == (3, None)
    # y,z complete pairs: (30,7),(40,7),(50,7) -> NULL
    assert got[("y", "z")] == (3, None)


def test_correlation_matrix_validation(spark):
    df = spark.createDataFrame([(1, 2.0)], "x long, y double")
    with pytest.raises(ValueError, match="integral"):
        correlation_matrix(df, ["x", "y"])
    with pytest.raises(ValueError, match=">= 2"):
        correlation_matrix(df.select("x"), ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        correlation_matrix(df, ["x", "x"])


def test_correlation_matrix_overflow_guard(spark):
    big = 9 * 10**18  # near LONG max: 2·n²·m² = 6.5e38 > 1e38
    df = spark.createDataFrame([(big, big), (-big, big)], "x long, y long")
    with pytest.raises(ValueError, match="overflow"):
        correlation_matrix(df, ["x", "y"])


def test_mad_outlier_stats_vs_python(spark):
    rng = random.Random(82)
    rows = []
    expected = {}
    for g in ["a", "b", "c"]:
        vals = [rng.randrange(0, 200) for _ in range(137)]
        vals += [5000 + rng.randrange(0, 100) for _ in range(4)]  # planted outliers
        rows += [(g, v) for v in vals]
        expected[g] = py_mad(vals, 3.0)
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["median"], r["mad"], r["n_outliers"])
        for r in mad_outlier_stats(df, ["g"], "v", k=3.0).collect()
    }
    assert got == expected
    for g in expected:
        assert got[g][3] >= 4  # the planted outliers are flagged


def test_mad_outlier_stats_mad_zero_and_nulls(spark):
    # over half the group at one value -> mad = 0 -> outlier iff dev > 0
    rows = [("g", 10)] * 6 + [("g", 11), ("g", 12), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = mad_outlier_stats(df, ["g"], "v", k=3.0).collect()
    assert (r["n"], r["median"], r["mad"], r["n_outliers"]) == (8, 10, 0, 2)
    # all-NULL group disappears
    df2 = spark.createDataFrame([("h", None)], "g string, v long")
    assert mad_outlier_stats(df2, ["g"], "v").collect() == []


def test_chi2_independence_vs_python(spark):
    rng = random.Random(83)
    # dependent: b leans on a
    pairs = []
    for _ in range(600):
        a = rng.choice(["x", "y", "z"])
        if rng.random() < 0.6:
            b = {"x": "p", "y": "q", "z": "r"}[a]
        else:
            b = rng.choice(["p", "q", "r", "s"])
        pairs.append((a, b))
    pairs.append((None, "p"))
    pairs.append(("x", None))
    df = spark.createDataFrame(pairs, "a string, b string")
    [r] = chi2_independence(df, "a", "b").collect()
    n, ka, kb, chi2 = py_chi2(pairs)
    assert r["n"] == n
    assert r["n_cells"] == ka * kb
    assert r["dof"] == (ka - 1) * (kb - 1)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)
    ev = math.sqrt(r["chi2"] / (n * (min(ka, kb) - 1)))
    assert r["cramers_v"] == pytest.approx(ev, abs=1e-5)
    assert r["cramers_v"] > 0.3  # dependence detected


def test_chi2_independence_absent_cell_counts(spark):
    # a grid cell that never co-occurs must still contribute E to chi2
    pairs = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(pairs, "a string, b string")
    [r] = chi2_independence(df, "a", "b").collect()
    _, _, _, chi2 = py_chi2(pairs)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)  # == n = 20 here
    assert r["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_chi2_independence_single_category_side(spark):
    df = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    [r] = chi2_independence(df, "a", "b").collect()
    assert r["dof"] == 0
    assert r["chi2"] == 0.0
    assert r["cramers_v"] is None


def test_chi2_independence_empty_raises(spark):
    df = spark.createDataFrame([(None, "p")], "a string, b string")
    with pytest.raises(ValueError, match="no non-NULL"):
        chi2_independence(df, "a", "b")


def test_two_proportion_ztest_vs_python(spark):
    from index_spark.operators.stats import two_proportion_ztest

    rng = random.Random(96)
    rows = []
    for u in range(400):
        arm = "A" if u % 2 == 0 else "B"
        p = 0.30 if arm == "A" else 0.22
        rows.append((arm, rng.random() < p))
    rows.append((None, True))  # NULL group excluded
    rows.append(("A", None))  # NULL success counts as failure
    df = spark.createDataFrame(rows, "arm string, ok boolean")
    [r] = two_proportion_ztest(df, "arm", "ok").collect()
    na = sum(1 for a, _ in rows if a == "A")
    nb = sum(1 for a, _ in rows if a == "B")
    ka = sum(1 for a, s in rows if a == "A" and s)
    kb = sum(1 for a, s in rows if a == "B" and s)
    assert (r["group_a"], r["group_b"], r["n_a"], r["n_b"], r["k_a"], r["k_b"]) == (
        "A", "B", na, nb, ka, kb,
    )
    pooled = (ka + kb) / (na + nb)
    se = math.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb))
    assert r["z"] == pytest.approx((ka / na - kb / nb) / se, abs=2e-6)


def test_two_proportion_ztest_guards(spark):
    from index_spark.operators.stats import two_proportion_ztest

    with pytest.raises(ValueError, match="exactly 2 groups"):
        two_proportion_ztest(
            spark.createDataFrame([("A", True)], "arm string, ok boolean"), "arm", "ok"
        )
    # all-failure arms: no variance -> z NULL
    df = spark.createDataFrame(
        [("A", False), ("B", False)], "arm string, ok boolean"
    )
    [r] = two_proportion_ztest(df, "arm", "ok").collect()
    assert r["z"] is None and r["rate_a"] == 0.0


def test_two_proportion_ztest_many_groups_bounded_error(spark):
    # a mistaken high-cardinality group column must fail via a bounded
    # probe (take(3)), never a full collect of the per-group aggregate
    from index_spark.operators.stats import two_proportion_ztest

    df = spark.createDataFrame(
        [(g, True) for g in range(50)], "arm long, ok boolean"
    )
    with pytest.raises(ValueError, match=">= 3"):
        two_proportion_ztest(df, "arm", "ok")
