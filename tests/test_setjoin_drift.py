"""Exact set-similarity join (prefix filtering) and KS drift tests."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from index_spark.operators.setjoin import jaccard_join_bruteforce, jaccard_join_exact
from index_spark.operators.stats import ks_drift


def _pairs(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_exact_join_equals_bruteforce_on_documents(spark, documents):
    docs = documents.limit(150)
    for t in (0.3, 0.5, 0.8):
        assert _pairs(jaccard_join_exact(docs, t)) == _pairs(
            jaccard_join_bruteforce(docs, t)
        ), t


VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


def _rand_docs(seed: int, n: int, vocab=VOCAB, max_words: int = 6) -> list[str]:
    """Seeded corpus from the same space the old hypothesis strategy drew
    from (1–6 words over an 8-token vocab), plus the adversarial shapes
    shrinking used to converge on: exact duplicates, single-token docs,
    an all-one-token doc, and a full-vocab doc."""
    import random

    rng = random.Random(seed)
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, max_words)))
        for _ in range(n)
    ]
    docs += [docs[0], docs[0], vocab[0], vocab[1], " ".join([vocab[2]] * 5), " ".join(vocab)]
    return docs


def _py_jaccard(texts: list[str], t: float) -> set:
    sets = {i: set(txt.lower().split()) for i, txt in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                ratio = inter / len(sets[a] | sets[b])
                if ratio >= t:
                    out.add((a, b, round(ratio, 6)))
    return out


@pytest.mark.parametrize("t", [0.34, 0.5, 0.75, 1.0])
def test_exact_join_recall_one_randomized(spark, t):
    """Prefix filtering must never miss a pair the brute-force reference
    finds (recall 1.0 is the operator's whole contract). One seeded
    80-doc union corpus per threshold replaces the former 12 hypothesis
    examples of ≤12 docs: same generator space, MORE pairs exercised
    (~3k vs ≤66 per example), and the reference is pure Python — the
    per-example Spark fixed overhead (~15 s × 12) was the entire cost of
    the old form, not the property being checked. (Denominators ≤ 8 keep
    round(·, 6) tie-free, so the Python reference rounds identically to
    Spark's HALF_UP.)"""
    texts = _rand_docs(seed=int(t * 100), n=74)
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    assert _pairs(jaccard_join_exact(docs, t)) == _py_jaccard(texts, t)


def test_exact_join_threshold_validation(spark, documents):
    with pytest.raises(ValueError):
        jaccard_join_exact(documents, 0.0)
    with pytest.raises(ValueError):
        jaccard_join_exact(documents, 1.5)


def test_ks_drift_identical_distributions(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v int")
    row = ks_drift(df, df, "v").collect()[0]
    assert row.d_stat == 0.0 and row.n_a == 100 and row.n_b == 100


def test_ks_drift_disjoint_distributions(spark):
    a = spark.createDataFrame([(i,) for i in range(50)], "v int")
    b = spark.createDataFrame([(100 + i,) for i in range(70)], "v int")
    row = ks_drift(a, b, "v").collect()[0]
    assert row.d_stat == 1.0 and row.n_a == 50 and row.n_b == 70


def test_ks_drift_ignores_nulls_and_matches_scipy_style_reference(spark):
    import itertools

    a_vals = [1, 1, 2, 3, 5, 8, None]
    b_vals = [2, 3, 3, 4, 9, None, None]
    a = spark.createDataFrame([(v,) for v in a_vals], "v int")
    b = spark.createDataFrame([(v,) for v in b_vals], "v int")
    row = ks_drift(a, b, "v").collect()[0]
    av = sorted(v for v in a_vals if v is not None)
    bv = sorted(v for v in b_vals if v is not None)
    grid = sorted(set(av) | set(bv))
    d = max(
        abs(sum(x <= g for x in av) / len(av) - sum(x <= g for x in bv) / len(bv))
        for g in grid
    )
    assert row.n_a == len(av) and row.n_b == len(bv)
    assert row.d_stat == round(d, 6)


# ---- interval overlap join ----


def _bf_overlaps(a_rows, b_rows):
    return {
        (x[0], y[0])
        for x in a_rows
        for y in b_rows
        if x[1] < y[2] and y[1] < x[2]
    }


def test_interval_overlap_matches_bruteforce(spark):
    from index_spark.operators.interval import interval_overlap_join

    a_rows = [(1, 0, 10), (2, 5, 6), (3, 100, 200), (4, 199, 300)]
    b_rows = [(10, 9, 12), (11, 6, 7), (12, 150, 160), (13, 300, 310), (14, 0, 1000)]
    a = spark.createDataFrame(a_rows, "id long, s long, e long")
    b = spark.createDataFrame(b_rows, "id long, s long, e long")
    for w in (1, 3, 50, 1000):
        out = interval_overlap_join(a, b, bin_width=w)
        got = {(r.a_id, r.b_id) for r in out.collect()}
        assert got == _bf_overlaps(a_rows, b_rows), w
        assert out.count() == len(got)  # no duplicate pair from bin fanout


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a_iv=st.lists(st.tuples(st.integers(0, 60), st.integers(1, 25)), min_size=1, max_size=8),
    b_iv=st.lists(st.tuples(st.integers(0, 60), st.integers(1, 25)), min_size=1, max_size=8),
    w=st.sampled_from([1, 4, 16, 100]),
)
def test_interval_overlap_randomized(spark, a_iv, b_iv, w):
    from index_spark.operators.interval import interval_overlap_join

    a_rows = [(i, s, s + d) for i, (s, d) in enumerate(a_iv)]
    b_rows = [(i, s, s + d) for i, (s, d) in enumerate(b_iv)]
    a = spark.createDataFrame(a_rows, "id long, s long, e long")
    b = spark.createDataFrame(b_rows, "id long, s long, e long")
    out = interval_overlap_join(a, b, bin_width=w)
    pairs = [(r.a_id, r.b_id) for r in out.collect()]
    assert sorted(pairs) == sorted(_bf_overlaps(a_rows, b_rows))


def test_interval_overlap_ignores_null_and_empty(spark):
    from index_spark.operators.interval import interval_overlap_join

    a = spark.createDataFrame([(1, None, 10), (2, 5, 5), (3, 0, 4)], "id long, s long, e long")
    b = spark.createDataFrame([(9, 2, 3)], "id long, s long, e long")
    out = interval_overlap_join(a, b, bin_width=2)
    assert [(r.a_id, r.b_id) for r in out.collect()] == [(3, 9)]


# ---- 2-D skyline ----


def _bf_skyline(rows):
    out = []
    for r in rows:
        if r[1] is None or r[2] is None:
            continue
        dominated = any(
            o[1] is not None and o[2] is not None
            and o[1] <= r[1] and o[2] <= r[2] and (o[1] < r[1] or o[2] < r[2])
            for o in rows
        )
        if not dominated:
            out.append(r)
    return sorted(out)


def test_skyline2d_matches_bruteforce(spark):
    from index_spark.operators.skyline import skyline2d

    rows = [
        (1, 5, 5), (2, 3, 7), (3, 7, 3), (4, 3, 7),  # duplicate point survives
        (5, 2, 9), (6, 9, 2), (7, 4, 4), (8, None, 1), (9, 1, None),
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted((r.id, r.x, r.y) for r in skyline2d(df, "x", "y").collect())
    assert got == _bf_skyline(rows)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20))
def test_skyline2d_randomized(spark, pts):
    from index_spark.operators.skyline import skyline2d

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted((r.id, r.x, r.y) for r in skyline2d(df, "x", "y").collect())
    assert got == _bf_skyline(rows)


# ---- edit-distance join ----


def _bf_edits(rows, k):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        d = lev(ta.lower(), tb.lower())
        if d <= k:
            out.add((min(ia, ib), max(ia, ib), d))
    return out


def test_edit_distance_join_basic(spark):
    from index_spark.operators.setjoin import edit_distance_join

    rows = [
        (1, "kitten"), (2, "sitten"), (3, "mitten"), (4, "kittens"),
        (5, "abc"), (6, "xyz"), (7, "ab"), (8, "a"), (9, "b"), (10, ""),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    for k in (0, 1, 2):
        got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, k=k).collect()}
        assert got == _bf_edits(rows, k), k


@pytest.mark.parametrize("k", [0, 1, 2])
def test_edit_distance_join_randomized(spark, k):
    """q-gram count filtering must be exact: every within-distance pair
    the brute-force reference finds, including zero-shared-gram shorts.
    One seeded 60-string corpus per k replaces the former 15 hypothesis
    examples of ≤10 strings (same 'abc'-alphabet ≤6-char space, the empty
    string and length-boundary shorts pinned explicitly, ~1.8k pairs per
    run vs ≤45 per example) — the cost of the old form was 15× the exact
    join's fixed Spark overhead, not the property."""
    import random

    from index_spark.operators.setjoin import edit_distance_join

    rng = random.Random(97 + k)
    seen = {"", "a", "b", "c", "ab", "ba", "abc", "cab", "aaaaaa", "ababab"}
    while len(seen) < 60:
        seen.add("".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
    rows = list(enumerate(sorted(seen)))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, k=k).collect()}
    assert got == _bf_edits(rows, k)


def test_exact_join_float_ceil_threshold(spark):
    """t=0.07 on a 100-token superset: double ceil(0.07*100) = 8 would
    drop the qualifying 7-token subset pair; decimal arithmetic keeps it."""
    from index_spark.operators.setjoin import (
        jaccard_join_bruteforce,
        jaccard_join_exact,
    )

    big = " ".join(f"w{i:03d}" for i in range(100))
    small = " ".join(f"w{i:03d}" for i in range(7))  # J = 7/100 = 0.07
    docs = spark.createDataFrame([(1, small), (2, big)], "doc_id long, text string")
    got = _pairs(jaccard_join_exact(docs, 0.07))
    assert got == _pairs(jaccard_join_bruteforce(docs, 0.07))
    assert got == {(1, 2, 0.07)}


def test_skyline2d_nan_rows_excluded_not_dominated(spark):
    from index_spark.operators.skyline import skyline2d

    rows = [(1, 1.0, 1.0), (2, 2.0, float("nan")), (3, float("nan"), 0.5)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = [r.id for r in skyline2d(df, "x", "y").collect()]
    assert got == [1]


# ------------------------------------------------------- containment join
from index_spark.operators.setjoin import (  # noqa: E402
    containment_join_bruteforce,
    containment_join_exact,
)


def _cpairs(df):
    return {(r.id_a, r.id_b, r.containment) for r in df.collect()}


def test_containment_join_equals_bruteforce_on_documents(spark, documents):
    docs = documents.limit(120)
    for t in (0.6, 0.8, 1.0):
        assert _cpairs(containment_join_exact(docs, t)) == _cpairs(
            containment_join_bruteforce(docs, t)
        ), t


def test_containment_join_asymmetric_quote_case(spark):
    """A short doc embedded in a long one: containment(short→long) = 1.0
    while Jaccard is far below any useful threshold — the case the
    operator exists for."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma " + " ".join(f"w{i}" for i in range(40))),
            (3, "delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    got = _cpairs(containment_join_exact(docs, 0.9))
    assert (1, 2, 1.0) in got
    assert all(p[0] != 3 and p[1] != 3 for p in got)
    from index_spark.operators.setjoin import jaccard_join_exact

    assert _pairs(jaccard_join_exact(docs, 0.5)) == set()


def _py_containment(texts: list[str], t: float) -> set:
    sets = {i: set(txt.lower().split()) for i, txt in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a != b:
                ratio = len(sets[a] & sets[b]) / len(sets[a])
                if ratio >= t:
                    out.add((a, b, round(ratio, 6)))
    return out


@pytest.mark.parametrize("t", [0.5, 0.75, 1.0])
def test_containment_join_recall_one_randomized(spark, t):
    """Same consolidation as the Jaccard twin: one seeded 80-doc union
    corpus per threshold, pure-Python ordered-pair reference (containment
    denominators are |T(a)| ≤ 8, so rounding is tie-free)."""
    texts = _rand_docs(seed=1000 + int(t * 100), n=74)
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    assert _cpairs(containment_join_exact(docs, t)) == _py_containment(texts, t)


def test_containment_join_threshold_validation(spark, documents):
    with pytest.raises(ValueError):
        containment_join_exact(documents, 0.0)
