"""Round-8 operators: HyperLogLog sketch, cohort retention, grouped OLS
trend — brute-force/pure-Python twins per the repo's new-operator recipe."""

import hashlib
import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from index_spark.operators.funnel import cohort_retention
from index_spark.operators.sampling import (
    HLL_P,
    _hll_alpha,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from index_spark.operators.stats import grouped_linear_trend


# ------------------------------------------------------------ HyperLogLog


def _py_registers(keys, p=HLL_P):
    m = 1 << p
    reg = defaultdict(int)
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        j = int(h[:3], 16) % m
        w = int(h[3:16], 16)
        bitlen = w.bit_length()
        reg[j] = max(reg[j], 53 - bitlen)
    return dict(reg)


def _py_estimate(reg, p=HLL_P):
    m = 1 << p
    s = sum(1 << (53 - rho) for rho in reg.values()) + (m - len(reg)) * (1 << 53)
    e_raw = _hll_alpha(m) * m * m * float(1 << 53) / float(s)
    if e_raw <= 2.5 * m and len(reg) < m:
        return math.floor(m * math.log(m / float(m - len(reg))) + 0.5)
    return math.floor(e_raw + 0.5)


def test_hll_registers_match_python_model(spark):
    keys = [f"user{i}" for i in range(700)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r["j"], r["rho"]) for r in hll_registers(df, "k").collect()}
    assert got == set(_py_registers(keys).items())


def test_hll_estimate_matches_python_model_and_is_accurate(spark):
    for n in (50, 5000):
        keys = [f"id-{i}" for i in range(n)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        est = hll_estimate(hll_registers(df, "k")).first()["est_distinct"]
        assert est == _py_estimate(_py_registers(keys))
        # standard error ~1.04/sqrt(1024) ≈ 3.3%; allow 4 sigma
        assert abs(est - n) / n < 0.13, (n, est)


def test_hll_duplicates_do_not_move_the_sketch(spark):
    df = spark.createDataFrame([(f"u{i % 40}",) for i in range(4000)], "k string")
    dd = spark.createDataFrame([(f"u{i}",) for i in range(40)], "k string")
    a = sorted((r["j"], r["rho"]) for r in hll_registers(df, "k").collect())
    b = sorted((r["j"], r["rho"]) for r in hll_registers(dd, "k").collect())
    assert a == b


def test_hll_merge_equals_sketch_of_union(spark):
    full = spark.createDataFrame([(f"x{i}",) for i in range(300)], "k string")
    a = full.filter(F.pmod(F.xxhash64("k"), F.lit(2)) == 0)
    b = full.filter(F.pmod(F.xxhash64("k"), F.lit(2)) == 1)
    merged = hll_merge([hll_registers(a, "k"), hll_registers(b, "k")])
    direct = hll_registers(full, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hll_p12_no_overflow(spark):
    """Review finding (round 8): at p=12 the empty-register fill term
    (m - cnt)·2^53 exceeds int64 whenever >1023 registers are empty —
    a long sum silently wrapped while the HUGEINT oracle raised. The
    decimal total must match the arbitrary-precision Python model."""
    keys = [f"v{i}" for i in range(2800)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    est = hll_estimate(hll_registers(df, "k", p=12), p=12).first()["est_distinct"]
    want = _py_estimate(_py_registers(keys, p=12), p=12)
    assert est == want
    assert abs(est - 2800) / 2800 < 0.1, est


def test_hll_p_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=3)
    with pytest.raises(ValueError):
        hll_estimate(df, p=13)


# ------------------------------------------------------- cohort retention


def test_cohort_retention_matches_python_model(spark):
    rng = random.Random(88)
    rows = []
    for u in range(60):
        debut = rng.randrange(0, 20)
        for d in sorted(rng.sample(range(debut, 30), rng.randrange(1, 8))):
            rows.append((u, f"2024-01-{d + 1:02d} 12:00:00"))
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (r["cohort_period"], r["period_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(df, unit_days=1).collect()
    }
    # python model
    active = {(u, (math.floor((19723 + int(ts[8:10]) - 1) / 1))) for u, ts in rows}
    first = {}
    for u, p in active:
        first[u] = min(first.get(u, p), p)
    tri = defaultdict(int)
    for u, p in active:
        tri[(first[u], p - first[u])] += 1
    want = {
        k: (n, round(n / tri[(k[0], 0)], 6)) for k, n in tri.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, k


def test_cohort_retention_offset_zero_is_cohort_size(spark):
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-09 00:00:00"),
            (2, "2024-01-02 00:00:00"), (3, "2024-01-10 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = cohort_retention(df, unit_days=7).collect()
    by = {(r["cohort_period"], r["period_offset"]): r for r in out}
    # users 1,2 debut in the same epoch-week; user 3 the next
    assert by[(2817, 0)]["n_active"] == 2
    assert by[(2817, 1)]["n_active"] == 1
    assert by[(2817, 1)]["retention"] == 0.5
    assert by[(2818, 0)]["retention"] == 1.0
    with pytest.raises(ValueError):
        cohort_retention(df, unit_days=0)


# ----------------------------------------------------- grouped OLS trend


def _py_ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num, den, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    if den == 0:
        return None
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = None if deny == 0 else (float(num) * float(num)) / (float(den) * float(deny))
    return (
        n,
        round(slope, 6),
        round(intercept, 6),
        None if r2 is None else round(r2, 6),
    )


def test_grouped_linear_trend_matches_python(spark):
    rng = random.Random(7)
    rows = []
    pts = defaultdict(list)
    for g in ("a", "b", "c"):
        base = rng.randrange(-50, 50)
        for x in range(rng.randrange(3, 25)):
            y = base + 3 * x + rng.randrange(-5, 6)
            rows.append((g, x, y))
            pts[g].append((x, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n_points"], r["slope"], r["intercept"], r["r2"])
        for r in grouped_linear_trend(df, ["g"], "x", "y").collect()
    }
    for g, p in pts.items():
        assert got[g] == pytest.approx(_py_ols(p)), g


def test_grouped_linear_trend_edge_cases(spark):
    rows = [
        ("one_x", 5, 1), ("one_x", 5, 9),          # zero x-variance: excluded
        ("const_y", 1, 4), ("const_y", 2, 4),      # zero y-variance: r2 NULL
        ("exact", 0, 2), ("exact", 1, 5), ("exact", 2, 8),  # perfect line
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in grouped_linear_trend(df, ["g"], "x", "y").collect()}
    assert "one_x" not in got
    assert got["const_y"]["slope"] == 0.0 and got["const_y"]["r2"] is None
    assert got["exact"]["slope"] == 3.0
    assert got["exact"]["intercept"] == 2.0
    assert got["exact"]["r2"] == 1.0


def test_grouped_linear_trend_rejects_floats(spark):
    df = spark.createDataFrame([("a", 1, 2.5)], "g string, x long, y double")
    with pytest.raises(ValueError, match="integral"):
        grouped_linear_trend(df, ["g"], "x", "y")


# ------------------------------------------- PMI collocations / overlap


def test_pmi_top_pairs_matches_python_model(spark):
    from index_spark.operators.corpusstats import pmi_top_pairs

    texts = [
        "new york is a big city",
        "new york new york big apple",
        "the big city has new york vibes",
        "apple pie in new york",
        "big apple big apple big apple",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [(r.w1, r.w2, r.c12, r.pmi) for r in pmi_top_pairs(df, top_k=5, min_count=2).collect()]

    from collections import Counter

    uni, big = Counter(), Counter()
    for t in texts:
        w = t.lower().split()
        uni.update(w)
        big.update(zip(w, w[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    want = []
    for (w1, w2), c12 in big.items():
        if c12 < 2:
            continue
        pmi = round(math.log((c12 * n1 * n1) / (n2 * uni[w1] * uni[w2])), 6)
        want.append((w1, w2, c12, pmi))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:5]

    with pytest.raises(ValueError):
        pmi_top_pairs(df, min_count=0)


def test_source_ngram_overlap_matches_python_model(spark):
    from index_spark.operators.decontam import source_ngram_overlap

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s1"),
        (1, "beta gamma delta epsilon zeta eta", "s2"),   # shares 2 5-grams w/ s1? no — shifted
        (2, "alpha beta gamma delta epsilon theta", "s2"),  # shares 1 with s1
        (3, "totally different text with no overlap here", "s3"),
        (4, "alpha beta gamma delta epsilon zeta", "s3"),   # exact dup of doc 0
        (5, "tiny", "s1"),                                   # < 5 tokens: no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r.src_a, r.src_b): r.shared_grams for r in source_ngram_overlap(df, k=5).collect()}

    grams = defaultdict(set)
    for _, t, s in rows:
        w = t.lower().split()
        for i in range(len(w) - 4):
            grams[s].add(" ".join(w[i : i + 5]))
    want = {}
    srcs = sorted(grams)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            n = len(grams[a] & grams[b])
            if n:
                want[(a, b)] = n
    assert got == want


# ------------------------------------ round-8 second-review regressions


def test_pmi_survives_tokenless_docs(spark):
    """slice(t, 1, n-1) with n=0 evaluates with length -1 and crashed
    the job before the n >= 2 guard (review finding — fixtures have no
    token-less docs, so only a test can hold this)."""
    from index_spark.operators.corpusstats import pmi_top_pairs

    texts = ["", "   ", "solo", "big apple big apple", "big apple pie"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = pmi_top_pairs(df, top_k=3, min_count=2).collect()
    assert [(r.w1, r.w2) for r in rows][0] == ("big", "apple")


def test_hll_ignores_nulls(spark):
    df = spark.createDataFrame([("a",), (None,), (None,)], "k string")
    est = hll_estimate(hll_registers(df, "k")).first()
    assert est["est_distinct"] == 1 and est["n_registers"] == 1
    # an all-NULL column sketches to an empty register table
    allnull = spark.createDataFrame([(None,), (None,)], "k string")
    assert hll_registers(allnull, "k").count() == 0


def test_grouped_linear_trend_excludes_null_points(spark):
    rows = [("g", 0, 2), ("g", 1, 5), ("g", 2, None), ("g", None, 7), ("g", 2, 8)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = grouped_linear_trend(df, ["g"], "x", "y").first()
    want = _py_ols([(0, 2), (1, 5), (2, 8)])
    assert (got["n_points"], got["slope"], got["intercept"], got["r2"]) == want


def test_stream_hll_registers_equal_batch(spark, sf_dir):
    """The streaming register fold drained with availableNow must be
    BIT-identical to the batch build (max is order/batch-insensitive)."""
    import uuid

    from index_spark.sources import load_table
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import hll_registers_stream

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    got = run_available_now(
        hll_registers_stream(stream), "t8hll" + uuid.uuid4().hex[:8]
    )
    ev = load_table(spark, sf_dir, "events")
    want = hll_registers(ev, "user_id", ("event_type",))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
