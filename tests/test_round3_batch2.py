"""Round-3 batch-2 operators: duplicate spans, Bloom pruning, unigram
NLL, funnels, first-seen cumulative counts, integer PageRank, profiling —
each checked against an independent pure-Python model, plus the plan
properties that make them 100 TB-safe."""

import hashlib
import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.operators.bloom import bloom_prune
from index_spark.operators.funnel import first_seen_cumulative, funnel_counts
from index_spark.operators.graph import pagerank_int
from index_spark.operators.quality import unigram_nll
from index_spark.operators.spans import duplicate_span_stats
from index_spark.operators.stats import fixed_histogram, profile_columns


# ------------------------------------------------------------- dup spans
def _spans(text, k):
    toks = text.lower().split()
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_duplicate_span_stats_python_model(spark):
    docs = [
        (1, "the cat sat on the mat today ok"),
        (2, "prefix words the cat sat on the mat and more"),  # shares a span with 1
        (3, "completely different tokens here right now"),
        (4, "short one"),  # < k tokens -> absent
        (5, "rep rep rep rep rep rep rep rep"),  # self-repeating span
    ]
    k = 5
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicate_span_stats(df, k=k).collect()}
    corpus = Counter()
    per_doc = {}
    for doc_id, text in docs:
        sp = _spans(text, k)
        if sp:
            per_doc[doc_id] = Counter(sp)
            corpus.update(sp)
    assert set(got) == set(per_doc)
    for doc_id, cnt in per_doc.items():
        n = sum(cnt.values())
        dup = sum(c for g, c in cnt.items() if corpus[g] >= 2)
        assert got[doc_id].n_spans == n
        assert got[doc_id].n_dup_spans == dup, doc_id
        assert got[doc_id].dup_frac == pytest.approx(round(dup / n, 6))
    # doc 5's span repeats WITHIN the doc -> counts as duplicated
    assert got[5].dup_frac == 1.0
    # docs 1 and 2 share exactly one 5-gram ("the cat sat on the")
    assert got[1].n_dup_spans >= 1 and got[2].n_dup_spans >= 1


def test_span_text_never_shuffles(spark, documents):
    """The shuffled payload is (id, hash, count) — the span/text strings
    are projected away before any Exchange."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        duplicate_span_stats(documents, k=5).explain("formatted")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "text" not in line and "__g" not in line


# ------------------------------------------------------------- bloom
def _bloom_positions(key: str, m: int, k: int = 3):
    h1 = int(hashlib.md5(key.encode()).hexdigest()[:7], 16)
    h2 = int(hashlib.md5((key + "#").encode()).hexdigest()[:7], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def test_bloom_no_false_negatives_and_model_match(spark):
    build = spark.createDataFrame([(i * 7,) for i in range(40)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(400)], "p long")
    m = 256  # small enough to force some false positives
    got = sorted(r.p for r in bloom_prune(probe, build, "p", "k", m=m).collect())
    bits = set()
    for i in range(40):
        bits.update(_bloom_positions(str(i * 7), m))
    want = [p for p in range(400) if all(x in bits for x in _bloom_positions(str(p), m))]
    assert got == want
    members = {i * 7 for i in range(40) if i * 7 < 400}
    assert members <= set(got)  # no false negatives, ever
    assert len(got) > len(members)  # and this m does produce false positives


def test_bloom_probe_is_pure_codegen_filter(spark, orders, documents):
    """The probe plan is scan → codegen'd Filter with the literal bitset:
    no join, no Exchange anywhere (the build side's tiny aggregates ran
    eagerly at filter-construction time, like a scalar subquery)."""
    import io
    from contextlib import redirect_stdout

    build = documents.select(F.col("doc_id").alias("k")).limit(50)
    out = bloom_prune(orders, build, "o_custkey", "k", m=1024)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "Exchange" not in plan
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        out.explain("codegen")
    assert buf2.getvalue().count("WholeStageCodegen subtree") >= 1


# ------------------------------------------------------------- unigram NLL
def test_unigram_nll_python_model(spark):
    docs = [(1, "a a b"), (2, "b c"), (3, "a b c d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in unigram_nll(df).collect()}
    corpus = Counter()
    for _, t in docs:
        corpus.update(t.split())
    n_total = sum(corpus.values())
    for doc_id, t in docs:
        tf = Counter(t.split())
        n = sum(tf.values())
        contribs = sorted(c * math.log(corpus[w] / n_total) for w, c in tf.items())
        s = 0.0
        for c in contribs:
            s += c
        assert got[doc_id].n_tokens == n
        assert got[doc_id].nll == pytest.approx(round(-s / n, 6), abs=1e-9)


def test_unigram_nll_broadcast_flag_value_preserving(spark):
    """broadcast_vocab=False (the open-web-scale escape hatch for the
    hapax-dominated vocab, r11) only moves the join strategy — the rows
    must be identical, and the default plan must actually carry the
    broadcast while the opt-out must not."""
    docs = [(1, "a a b"), (2, "b c"), (3, "a b c d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    on = {tuple(r) for r in unigram_nll(df).collect()}
    off = {tuple(r) for r in unigram_nll(df, broadcast_vocab=False).collect()}
    assert on == off

    import io
    from contextlib import redirect_stdout

    def _plan(frame):
        buf = io.StringIO()
        with redirect_stdout(buf):
            frame.explain("formatted")
        return buf.getvalue()

    # the vocab join (on term "t") is broadcast by default; opting out
    # leaves NO forced BroadcastHashJoin in the static plan (the one-row
    # corpus-total cross-join is a BroadcastNestedLoopJoin either way;
    # AQE may still pick a broadcast at runtime on real sizes — the
    # point of the flag is that nothing FORCES it)
    assert "BroadcastHashJoin" in _plan(unigram_nll(df))
    assert "BroadcastHashJoin" not in _plan(unigram_nll(df, broadcast_vocab=False))


# ------------------------------------------------------------- funnel
def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes the funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing -> click doesn't count; no purchase
        (2, 10, "click"), (2, 20, "view"),
        # u3 views then purchases without click -> stops at step 1
        (3, 10, "view"), (3, 20, "purchase"),
        # u4 view->click, purchase BEFORE click -> stops at step 2
        (4, 10, "view"), (4, 15, "purchase"), (4, 20, "click"),
        # u5 never views
        (5, 10, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_type string")
    r = funnel_counts(df, ["view", "click", "purchase"]).collect()[0]
    assert (r.step1_users, r.step2_users, r.step3_users) == (4, 2, 1)
    assert r.conv_2 == pytest.approx(0.5)
    assert r.conv_3 == pytest.approx(0.5)


def test_first_seen_cumulative_model(spark):
    rows = [
        (1, "2024-01-01 01:00:00", "view"),
        (1, "2024-01-03 01:00:00", "view"),  # repeat user: not new on day 3
        (2, "2024-01-03 01:00:00", "view"),
        (3, "2024-01-03 02:00:00", "view"),
        (1, "2024-01-02 01:00:00", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    got = {
        (r.event_type, r.day): (r.new_users, r.cum_users)
        for r in first_seen_cumulative(df).collect()
    }
    assert got == {
        ("view", "2024-01-01"): (1, 1),
        ("view", "2024-01-03"): (2, 3),
        ("click", "2024-01-02"): (1, 1),
    }


# ------------------------------------------------------------- pagerank
def _pagerank_model(edges, iters, total=10**12, pct=85):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = Counter(s for s, _ in edges)
    r = {v: total // n for v in nodes}
    base = (total * (100 - pct)) // (100 * n)
    for _ in range(iters):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {v: base + (pct * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_int_matches_model(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r["rank"] for r in pagerank_int(df, iterations=3).collect()}
    assert got == _pagerank_model(edges, 3)
    # d is dangling-in (nothing points at it): keeps only the teleport base
    assert got["d"] == (10**12 * 15) // (100 * 4)


def test_pagerank_mass_roughly_conserved(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    total = sum(r["rank"] for r in pagerank_int(df, iterations=4).collect())
    # truncating division loses at most deg units per node per round
    assert abs(total - 10**12) < 1000


# ------------------------------------------------------------- profiling
def test_profile_columns_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (4, "y")], "id long, s string"
    )
    got = {r["column"]: r for r in profile_columns(df, [("id", F.col("id")), ("s", F.col("s"))]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0 and got["id"].n_distinct == 4
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_val, got["s"].max_val) == ("x", "y")


def test_fixed_histogram_clamps_edges(spark):
    df = spark.createDataFrame([(v,) for v in [-5, 0, 9, 10, 55, 99, 100, 250]], "v long")
    got = {r.bucket: r.n for r in fixed_histogram(df, F.col("v"), 0, 100, 10).collect()}
    # -5 clamps into bucket 0; 100 and 250 clamp into bucket 9
    assert got[0] == 3 and got[9] == 3 and got[5] == 1
    lo = {r.bucket: r.lo_edge for r in fixed_histogram(df, F.col("v"), 0, 100, 10).collect()}
    assert lo[5] == 50


# ------------------------------------------------------------- redaction
def test_redact_and_match_count(spark):
    df = spark.createDataFrame([('{"k": 69, "j": 2}',), ("none",)], "s string")
    out = df.select(
        TX.redact(F.col("s")).alias("r"), TX.match_count(F.col("s")).alias("c")
    ).collect()
    assert out[0].r == '{"k": <NUM>, "j": <NUM>}' and out[0].c == 2
    assert out[1].r == "none" and out[1].c == 0


# ------------------------------------------------------------- product quantization
def _pq_model(vecs, dim, n_sub, k, iters, sample_mod):
    """Pure-Python replay of train_pq_codebooks + pq_encode (left-to-right
    folds, argmin ties -> lowest code, id-ordered means rounded to 6)."""
    w = dim // n_sub
    sample = [(i, v) for i, v in vecs if i % sample_mod == 0]
    seeds = [v for _, v in sorted(sample)[:k]]
    books = [[list(s[j * w : (j + 1) * w]) for s in seeds] for j in range(n_sub)]

    def l2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            d = float(x) - float(y)
            s += d * d
        return s

    def argmin(sub, book):
        best, bi = None, None
        for ci, c in enumerate(book):
            d = l2(sub, c)
            if best is None or d < best:
                best, bi = d, ci
        return bi

    for _ in range(iters):
        for j in range(n_sub):
            groups = {}
            for i, v in sorted(sample):
                sub = v[j * w : (j + 1) * w]
                groups.setdefault(argmin(sub, books[j]), []).append(sub)
            for code in range(k):
                if code in groups:
                    acc = [0.0] * w
                    for sub in groups[code]:
                        for d in range(w):
                            acc[d] += sub[d]
                    n = len(groups[code])
                    books[j][code] = [round(x / n, 6) for x in acc]
    codes = {
        i: [argmin(v[j * w : (j + 1) * w], books[j]) for j in range(n_sub)]
        for i, v in vecs
    }
    return books, codes


def test_pq_codebooks_and_codes_match_model(spark):
    from index_spark.operators.similarity import pq_encode, train_pq_codebooks

    dim, n_sub, k = 8, 2, 4
    vecs = [(i, [float((i * 7 + d * 3) % 11) / 10 for d in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    books = train_pq_codebooks(df, dim=dim, n_sub=n_sub, k=k, iters=2, sample_mod=3)
    mbooks, mcodes = _pq_model(vecs, dim, n_sub, k, 2, 3)
    assert books == mbooks
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books, dim=dim).collect()}
    assert got == mcodes


def test_pq_adc_reranks_to_exact_top1(spark, embeddings):
    """ADC is approximate, but with a 40-wide shortlist the exact re-rank
    must surface the true nearest neighbor (the query itself, score 1)."""
    from index_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from pyspark.sql import functions as F

    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    dim = len(qvec)
    books = train_pq_codebooks(embeddings, dim=dim, n_sub=4, k=8, iters=1, sample_mod=7)
    enc = pq_encode(embeddings, books, dim=dim)
    top = pq_adc_topk(enc, embeddings, books, qvec, dim=dim, k=5, shortlist=40).collect()
    assert top[0].vec_id == 0 and top[0].score == pytest.approx(1.0, abs=1e-6)
    assert all(top[i].score >= top[i + 1].score for i in range(len(top) - 1))


# ------------------------------------------------------------- q21 blame logic
def test_q21_blames_only_sole_late_supplier(spark, sf_dir):
    """Crafted orders: blame requires (a) this supplier late, (b) order
    has >1 supplier, (c) NO other supplier late."""
    from index_spark.plans import driver_queries as DQ

    orders = spark.createDataFrame(
        [(1, "2000-01-01"), (2, "2000-01-01"), (3, "2000-01-01")],
        "o_orderkey long, d string",
    ).select("o_orderkey", F.col("d").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [
            # order 1: supp 10 late, supp 11 on time -> blame 10
            (1, 10, "2000-06-01"), (1, 11, "2000-01-15"),
            # order 2: both late -> blame nobody
            (2, 10, "2000-06-01"), (2, 11, "2000-06-01"),
            # order 3: single supplier late -> not multi-supplier, no blame
            (3, 10, "2000-06-01"),
        ],
        "l_orderkey long, l_suppkey long, s string",
    ).select("l_orderkey", "l_suppkey", F.col("s").cast("timestamp").alias("l_shipdate"))
    supp = spark.createDataFrame(
        [(10, "Supp10"), (11, "Supp11")], "s_suppkey long, s_name string"
    )

    import unittest.mock as mock

    tables = {"orders": orders, "lineitem": li, "supplier": supp}
    with mock.patch.object(DQ, "load_table", lambda sp, sd, name: tables[name]):
        got = DQ.q_q21_waiting_suppliers(spark, sf_dir).collect()
    assert [(r.s_suppkey, r.numwait) for r in got] == [(10, 1)]


# ------------------------------------------------------------- transitions
def test_event_transitions_probabilities(spark, sf_dir):
    from index_spark.plans import driver_queries as DQ

    ev = DQ.load_table(spark, sf_dir, "events")
    got = DQ.q_event_transitions(spark, sf_dir).collect()
    # per-from probabilities sum to 1
    sums = defaultdict(float)
    for r in got:
        sums[r.from_type] += r.prob
    for s in sums.values():
        assert s == pytest.approx(1.0, abs=1e-4)
    # total transitions = total events - number of users (first event has no lag)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in got) == n_events - n_users


# ------------------------------------------------------------- centroids
def test_label_centroids_symmetric_and_bounded(spark, sf_dir):
    from index_spark.plans import driver_queries as DQ

    got = DQ.q_label_centroids(spark, sf_dir).collect()
    n_labels = DQ.load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    assert len(got) == n_labels * (n_labels - 1) // 2
    assert all(-1.0 <= r.cos <= 1.0 for r in got)
    assert all(r.la < r.lb for r in got)


# ------------------------------------------------------------- KMV merge
def test_kmv_merge_equals_sketch_of_union(spark):
    """KMV's defining property: merging two sketches yields EXACTLY the
    sketch the union's raw data would produce (same k smallest hashes),
    so the merged estimate equals the direct union estimate."""
    from index_spark.operators.sampling import kmv_distinct, kmv_merge_estimate, kmv_sketch

    a = spark.createDataFrame([(i,) for i in range(200)], "v long")
    b = spark.createDataFrame([(i,) for i in range(100, 350)], "v long")
    merged = kmv_merge_estimate([kmv_sketch(a, "v", 32), kmv_sketch(b, "v", 32)], 32).collect()[0]
    direct = kmv_distinct(a.union(b), "v", 32).collect()[0]
    assert merged.est_distinct == direct.est_distinct
    assert merged.kth_frac == direct.kth_frac
    # sanity only: k=32 has ~18% std error and this fixed hash set draws
    # high — the property under test is merge-equivalence, not accuracy
    assert 350 / 2 < merged.est_distinct < 350 * 2


# ------------------------------------------------------------- zero vectors
def test_cosine_null_on_zero_vector_not_error(spark):
    """ANSI mode raises on a zero divisor; a zero embedding must score
    NULL, not kill the scan (same hazard class as the funnel conv fix)."""
    from index_spark.functions.vectors import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])], "id long, v array<double>"
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", F.round(cosine(F.col("v"), F.array(F.lit(3.0), F.lit(4.0))), 6).alias("c")
        ).collect()
    }
    assert got[1] is None and got[2] == pytest.approx(1.0)


def test_pq_trainer_handles_sample_smaller_than_k(spark):
    """6 sample vectors with k=8 must train a 6-code book, not crash."""
    from index_spark.operators.similarity import pq_encode, train_pq_codebooks

    dim = 8
    vecs = [(i, [float((i + d) % 5) for d in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(df, dim=dim, n_sub=2, k=8, iters=2, sample_mod=7)
    assert all(len(b) == 6 for b in books)  # 40 // 7 + 1 = 6 sample ids
    codes = pq_encode(df, books, dim=dim).collect()
    assert all(0 <= c < 6 for r in codes for c in r.codes)


def test_fixed_histogram_edges_exact_for_non_divisible_span(spark):
    """span=100, nbuckets=8: bucket 3 covers [37.5, 50) -> first integer
    38; its reported lo_edge must be floor(3*100/8)=37, not 3*12=36."""
    df = spark.createDataFrame([(v,) for v in range(100)], "v long")
    rows = {r.bucket: r for r in fixed_histogram(df, F.col("v"), 0, 100, 8).collect()}
    assert rows[3].lo_edge == 37
    # bucket populations follow the assignment arithmetic exactly
    assert rows[3].n == sum(1 for v in range(100) if (v * 8) // 100 == 3)
    assert sum(r.n for r in rows.values()) == 100
