"""Round-8 continuation, batch 3: theilsen_trend and bigram_cond_entropy
vs brute-force Python models."""

import math
import random

import pytest

from index_spark.operators.corpusstats import bigram_cond_entropy
from index_spark.operators.stats import theilsen_trend


def py_theilsen(pts):
    pts = [(x, y) for x, y in pts if x is not None and y is not None]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x1 != x2
    )
    # unordered pairs with distinct x, counted like the operator (xa < xb)
    slopes2 = sorted(
        (y2 - y1) / (x2 - x1)
        for (x1, y1) in pts
        for (x2, y2) in pts
        if x1 < x2
    )
    assert slopes2 == slopes or sorted(slopes) == sorted(slopes2)
    if not slopes:
        return None
    m = len(slopes)
    slope = slopes[math.ceil(0.5 * m) - 1]  # discrete p50 by rank
    resid = sorted(y - slope * x for x, y in pts)
    icept = resid[math.ceil(0.5 * len(resid)) - 1]
    return len(pts), m, round(slope, 6), round(icept, 6)


def py_cond_entropy(texts):
    from collections import Counter

    c12, c1 = Counter(), Counter()
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    n2 = sum(c12.values())
    h = sum((c / n2) * math.log(c1[a] / c) for (a, _), c in c12.items())
    return n2, len(c1), h


def test_theilsen_vs_python_robust_to_outliers(spark):
    rng = random.Random(90)
    rows, expected = [], {}
    for g in ["a", "b"]:
        pts = [(x, 7 * x + 100 + rng.randrange(-5, 6)) for x in range(60)]
        pts += [(70, 10**6), (71, -(10**6))]  # wild outliers
        rows += [(g, x, y) for x, y in pts]
        expected[g] = py_theilsen(pts)
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n_points"], r["n_pairs"], r["slope"], r["intercept"])
        for r in theilsen_trend(df, ["g"], "x", "y").collect()
    }
    assert got == expected
    # robustness: the slope stays ~7 despite the million-scale outliers
    for g in got:
        assert abs(got[g][2] - 7) < 0.5


def test_theilsen_duplicate_x_and_nulls(spark):
    pts = [(1, 10), (1, 999), (2, 20), (3, 30), (None, 5), (4, None)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x long, y long")
    [r] = theilsen_trend(df, ["g"], "x", "y").collect()
    exp = py_theilsen(pts)
    assert (r["n_points"], r["n_pairs"], r["slope"], r["intercept"]) == exp
    # a group with all-equal x admits no slope and is absent
    df2 = spark.createDataFrame([("h", 5, 1), ("h", 5, 2)], "g string, x long, y long")
    assert theilsen_trend(df2, ["g"], "x", "y").collect() == []


def test_theilsen_max_points_guard(spark):
    rows = [("g", x, x) for x in range(30)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    with pytest.raises(ValueError, match="max_points"):
        theilsen_trend(df, ["g"], "x", "y", max_points=29)
    # exactly at the cap is fine
    assert theilsen_trend(df, ["g"], "x", "y", max_points=30).count() == 1


def test_bigram_cond_entropy_vs_python(spark):
    rng = random.Random(91)
    vocab = ["a", "b", "c", "d", "e", "f"]
    texts = [" ".join(rng.choice(vocab) for _ in range(50)) for _ in range(80)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    [r] = bigram_cond_entropy(df).collect()
    n2, v1, h = py_cond_entropy(texts)
    assert r["n_bigrams"] == n2 and r["v_contexts"] == v1
    assert r["cond_entropy"] == pytest.approx(h, abs=2e-6)


def test_bigram_cond_entropy_template_collapse(spark):
    # deterministic successor text: H(W2|W1) = 0 while vocab is diverse
    df = spark.createDataFrame([("x1 x2 x3 x4 x5 x6 x7 x8",)] * 20, "text string")
    [r] = bigram_cond_entropy(df).collect()
    assert r["cond_entropy"] == 0.0
    with pytest.raises(ValueError, match="no bigrams"):
        bigram_cond_entropy(spark.createDataFrame([("one",)], "text string"))


# ---------------------------------------------------------------- PSI
def py_psi(ref, cur, n_buckets=10):
    ref = sorted(v for v in ref if v is not None)
    n = len(ref)
    cuts = sorted(ref[math.ceil(i / n_buckets * n) - 1] for i in range(1, n_buckets))
    def b_of(v):
        return sum(1 for c in cuts if v > c)
    from collections import Counter
    rc, cc = Counter(b_of(v) for v in ref), Counter(b_of(v) for v in cur if v is not None)
    nr, nc = len(ref), sum(cc.values())
    psi = 0.0
    for b in range(n_buckets):
        r = (rc.get(b, 0) + 1) / (nr + n_buckets)
        c = (cc.get(b, 0) + 1) / (nc + n_buckets)
        psi += (c - r) * math.log(c / r)
    return nr, nc, psi


def test_psi_drift_vs_python(spark):
    from index_spark.operators.stats import psi_drift

    rng = random.Random(95)
    ref = [rng.randrange(0, 1000) for _ in range(2000)]
    cur_same = [rng.randrange(0, 1000) for _ in range(1500)]
    cur_shift = [rng.randrange(500, 2000) for _ in range(1500)]
    rdf = spark.createDataFrame([(v,) for v in ref + [None]], "v long")
    for cur in (cur_same, cur_shift):
        cdf = spark.createDataFrame([(v,) for v in cur], "v long")
        [r] = psi_drift(rdf, cdf, "v").collect()
        en, ec, ep = py_psi(ref, cur)
        assert (r["n_ref"], r["n_cur"]) == (en, ec)
        assert r["psi"] == pytest.approx(ep, abs=2e-6)
    # same-distribution PSI is small; shifted is large
    [r1] = psi_drift(rdf, spark.createDataFrame([(v,) for v in cur_same], "v long"), "v").collect()
    [r2] = psi_drift(rdf, spark.createDataFrame([(v,) for v in cur_shift], "v long"), "v").collect()
    assert r1["psi"] < 0.05 < 0.25 < r2["psi"]


def test_psi_drift_guards_and_heavy_dup(spark):
    from index_spark.operators.stats import psi_drift

    # heavy duplicates collapse cuts -> empty buckets stay finite (add-1)
    ref = [5] * 900 + [100] * 100
    cur = [5] * 100 + [100] * 900
    rdf = spark.createDataFrame([(v,) for v in ref], "v long")
    cdf = spark.createDataFrame([(v,) for v in cur], "v long")
    [r] = psi_drift(rdf, cdf, "v").collect()
    en, ec, ep = py_psi(ref, cur)
    assert r["psi"] == pytest.approx(ep, abs=2e-6)
    assert r["psi"] > 0.25
    with pytest.raises(ValueError, match="reference side is empty"):
        psi_drift(
            spark.createDataFrame([(None,)], "v long"), cdf, "v"
        )
    with pytest.raises(ValueError, match="n_buckets"):
        psi_drift(rdf, cdf, "v", n_buckets=1)
