"""Round-3 pipeline operators: repetition quality, decontamination,
grouped exact percentiles, change-feed-driven incremental maintenance —
each checked against an independent pure-Python model, plus the plan
shapes that make them 100 TB-safe."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from index_spark.operators.decontam import ngram_contamination
from index_spark.operators.quality import repetition_filter, repetition_stats
from index_spark.operators.stats import grouped_percentile_disc


def _bigrams(text):
    toks = text.lower().split()
    return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def test_repetition_stats_match_python_model(spark):
    docs = [
        (1, "a b a b a b a b"),          # one bigram dominates
        (2, "w x y z p q r s"),          # all bigrams unique
        (3, "m m m m m m"),              # single repeated token
        (4, "one"),                      # no bigrams -> absent from stats
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df, k=2).collect()}
    assert set(got) == {1, 2, 3}
    for doc_id, text in docs[:3]:
        cnt = Counter(_bigrams(text))
        n = sum(cnt.values())
        assert got[doc_id].n_grams == n
        assert got[doc_id].top_frac == pytest.approx(max(cnt.values()) / n)
        dup = sum(c for c in cnt.values() if c > 1)
        assert got[doc_id].dup_frac == pytest.approx(dup / n)


def test_repetition_filter_thresholds(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),
            # long enough that a unique top bigram is a small fraction
            (2, "one two three four five six seven eight nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.passes for r in repetition_filter(df, k=2).collect()}
    assert got == {1: False, 2: True}


def test_contamination_flags_copied_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox appears verbatim"),
            (2, "completely unrelated clean document with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_hits, r.n_bench_docs) for r in
           ngram_contamination(corpus, bench, k=3).collect()}
    # doc 1 shares 'the quick brown' and 'quick brown fox'; doc 2 is clean
    assert 1 in got and got[1][0] >= 2 and got[1][1] == 1
    assert 2 not in got


def test_contamination_ignores_short_docs(spark):
    """Docs shorter than k tokens contribute no shingles: a 1-2 word (or
    empty) benchmark row must not flag unrelated short corpus docs via the
    degenerate whole-text/empty-string shingle."""
    bench = spark.createDataFrame(
        [(100, "hi"), (101, ""), (102, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "hi"), (2, ""), (3, "contains alpha beta gamma inside")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in ngram_contamination(corpus, bench, k=3).collect()}
    assert got == {3}  # only the real 3-gram collision; short docs silent


def test_contamination_join_is_broadcast(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    corpus = spark.createDataFrame([(2, "a b c x y")], "doc_id long, text string")
    plan = ngram_contamination(corpus, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side never shuffles the corpus


def test_grouped_percentile_disc_matches_python(spark):
    import random

    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.randrange(0, 10_000)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in grouped_percentile_disc(df, ["g"], "v", [0.5, 0.9, 0.99]).collect()}
    import math

    for g in {"g0", "g1", "g2"}:
        vals = sorted(v for gg, v in rows if gg == g)
        for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            want = vals[math.ceil(p * len(vals)) - 1]  # value at rank ceil(p*n)
            assert got[g][col] == want, (g, col)


def test_grouped_percentiles_no_global_sort(spark, sf_dir):
    """The plan shuffles ONCE on the group key; ordering is within-group
    (window sort), never a rangepartitioning global sort."""
    import __spark_entry__ as em

    df = em.queries()["group_percentiles"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_orderpriority" in plan
    assert "rangepartitioning" not in plan


def test_tfidf_top_terms_matches_python(spark):
    import math

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple apple apple elderberry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from index_spark.operators.quality import tfidf_top_terms

    got = {(r.doc_id, r.rank): (r.t, r.tfidf) for r in tfidf_top_terms(df, top_k=2).collect()}
    # model
    tf = {d: Counter(t.split()) for d, t in docs}
    dfreq = Counter(term for c in tf.values() for term in c)
    n = len(docs)
    for d, c in tf.items():
        scored = sorted(
            ((term, cnt * math.log(n / dfreq[term])) for term, cnt in c.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2]
        for rk, (term, score) in enumerate(scored, start=1):
            t, s = got[(d, rk)]
            assert t == term and s == pytest.approx(score, abs=1e-6), (d, rk)


def test_token_entropy_matches_python(spark):
    import math

    docs = [
        (1, "a a a a"),                      # zero entropy
        (2, "a b c d"),                      # uniform: ln 4
        (3, "a a b"),                        # mixed
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from index_spark.operators.quality import token_entropy

    got = {r.doc_id: (r.n_tokens, r.entropy) for r in token_entropy(df).collect()}
    for d, text in docs:
        cnt = Counter(text.split())
        n = sum(cnt.values())
        h = -sum(c / n * math.log(c / n) for c in cnt.values())
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(h, abs=1e-6), d


def test_weighted_hash_sample_deterministic_and_correct(spark):
    import hashlib

    rows = [(i, i % 7 / 7.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, w double")
    from index_spark.operators.sampling import weighted_hash_sample

    kept1 = {r.k for r in weighted_hash_sample(df, "k", F.col("w")).collect()}
    kept2 = {r.k for r in weighted_hash_sample(df, "k", F.col("w")).collect()}
    assert kept1 == kept2  # reproducible
    want = {
        k
        for k, w in rows
        if int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) / (1 << 28) < w
    }
    assert kept1 == want  # exactly the hash-threshold rule
    # salting decorrelates passes
    salted = {r.k for r in weighted_hash_sample(df, "k", F.col("w"), id_suffix="s2").collect()}
    assert salted != kept1


def test_zorder_key_matches_python_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    from index_spark.operators.layout import zorder_key

    got = {(r.x, r.y): r.z for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    for x, y in rows:
        want = sum((((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)) for i in range(16))
        assert got[(x, y)] == want, (x, y)


def test_zorder_boxes_beat_single_column_sort(spark, sf_dir):
    """The reason Z-order exists: bucketing along the Z-curve keeps BOTH
    dimensions' per-bucket ranges narrow, while a single-column sort
    leaves the second dimension spanning ~the whole domain in every
    bucket — i.e. zero file-skipping for dim-2 predicates."""
    from index_spark.operators.layout import zorder_layout_stats
    from index_spark.sources import load_table

    d = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey").bitwiseAND(F.lit(65535))).alias("ck"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .bitwiseAND(F.lit(65535))
        ).alias("dd"),
    )
    span = d.agg(
        (F.max("ck") - F.min("ck")).alias("ck_span"), (F.max("dd") - F.min("dd")).alias("dd_span")
    ).first()
    zboxes = zorder_layout_stats(d, ["ck", "dd"], n_buckets=8).collect()
    # single-column (ck) sort baseline: same bucketing, ordered by ck only
    from pyspark.sql import Window

    total = d.count()
    per = max(1, -(-total // 8))
    ck_sorted = d.withColumn(
        "__bucket", ((F.row_number().over(Window.orderBy("ck", "dd")) - 1) / per).cast("int")
    )
    cboxes = ck_sorted.groupBy("__bucket").agg(
        F.min("dd").alias("min_dd"), F.max("dd").alias("max_dd")
    ).collect()
    z_dd_frac = sum((r.max_dd - r.min_dd) / span.dd_span for r in zboxes) / len(zboxes)
    c_dd_frac = sum((r.max_dd - r.min_dd) / span.dd_span for r in cboxes) / len(cboxes)
    # ck-sorted buckets span ~100% of the dd domain; z-order buckets must
    # do materially better on dd while staying bounded on ck
    assert c_dd_frac > 0.9
    assert z_dd_frac < 0.8 * c_dd_frac


def test_incremental_maint_matches_recompute(spark, sf_dir):
    """Every maintained row must equal the direct recompute (the matches
    flag the oracle certifies)."""
    import __spark_entry__ as em

    rows = em.queries()["incremental_maint"](spark, sf_dir).collect()
    assert rows and all(r.matches for r in rows)
