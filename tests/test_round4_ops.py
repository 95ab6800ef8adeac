"""Round-4 operator units: per-group quotas (two-phase == single window),
inverted postings, hash splits + leakage, winsorized stats, equi-depth
histogram, grouped KMV."""

from pyspark.sql import Window
from pyspark.sql import functions as F


# ------------------------------------------------------------------ quota
def test_cap_per_group_equals_single_window(spark, sf_dir):
    from index_spark.operators.quota import cap_per_group

    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    got = cap_per_group(docs, ["source"], 5, order, id_col="doc_id", salts=4)
    w = Window.partitionBy("source").orderBy(*order)
    want = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == sorted(
        r.doc_id for r in want.select("doc_id").collect()
    )


def test_cap_per_group_respects_cap_with_one_salt_cell_overflow(spark):
    from index_spark.operators.quota import cap_per_group

    # 100 rows, ONE group, cap 3 with 2 salts: phase 1 keeps <= 6, phase 2
    # must land on exactly the global top 3
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "id long, g int")
    got = cap_per_group(
        df, ["g"], 3, [F.col("id").desc()], id_col="id", salts=2, keep_rank=True
    )
    rows = got.collect()
    per_g = {}
    for r in rows:
        per_g.setdefault(r.g, []).append(r.id)
    for g, ids in per_g.items():
        assert sorted(ids, reverse=True) == sorted(
            [i for i in range(100) if i % 7 == g], reverse=True
        )[:3]


# --------------------------------------------------------------- postings
def test_build_postings_counts(spark):
    from index_spark.operators.postings import build_postings, conjunctive_query

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b c"), (3, "a a a")], "doc_id long, text string"
    )
    p = {r.term: r for r in build_postings(docs).collect()}
    assert p["a"].df == 2 and p["a"].tf_total == 5 and p["a"].postings == [1, 3]
    assert p["b"].df == 2 and p["b"].tf_total == 2
    assert p["c"].df == 2
    hits = sorted(r.doc_id for r in conjunctive_query(docs, ["a", "c"]).collect())
    assert hits == [1]


def test_postings_bounded_payload(spark):
    from index_spark.operators.postings import build_postings

    docs = spark.createDataFrame(
        [(i, "common") for i in range(50)], "doc_id long, text string"
    )
    r = build_postings(docs, max_postings=10).first()
    assert r.df == 50 and len(r.postings) == 10 and r.postings == list(range(10))


# ----------------------------------------------------------------- splits
def test_hash_split_stable_and_complete(spark, sf_dir):
    from index_spark.operators.splits import hash_split

    docs = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs, train_frac=0.8).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, train_frac=0.8).collect()}
    assert a == b  # deterministic across runs
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.6 < n_train / len(a) < 0.95  # roughly the asked fraction


def test_split_leakage_detects_planted_dup(spark):
    from index_spark.operators.splits import hash_split, split_leakage

    base = [(i, f"w{i} x{i} y{i} z{i} q{i} r{i} s{i} t{i}") for i in range(40)]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    # plant exact copies under shifted ids; any copy landing across the
    # split from its source must be reported
    dup = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup)
    tagged = {r.doc_id: r.split for r in hash_split(corpus, train_frac=0.5).collect()}
    expected = sum(
        1 for i in range(40) if tagged[i] != tagged[i + 1000]
    )
    got = split_leakage(corpus, train_frac=0.5, threshold=0.9)
    assert got.count() == expected
    for r in got.collect():
        assert tagged[r.train_id] == "train" and tagged[r.val_id] == "val"
        assert r.jaccard == 1.0


# ----------------------------------------------------- winsorized / ntile
def test_winsorized_trims_both_tails(spark):
    from index_spark.operators.stats import winsorized_stats

    rows = [(1, v, i) for i, v in enumerate([1000] + [10] * 98 + [-1000])]
    df = spark.createDataFrame(rows, "g int, v long, k long")
    r = winsorized_stats(df, ["g"], "v", "k", trim_frac=0.01).first()
    assert r.n_kept == 98 and r.min_kept == 10 and r.max_kept == 10
    assert r.mean_kept == 10.0


def test_equidepth_histogram_bins(spark):
    from index_spark.operators.stats import equidepth_histogram

    df = spark.createDataFrame([(i, i) for i in range(100)], "v long, k long")
    bins = {r.bin: r for r in equidepth_histogram(df, "v", "k", bins=10).collect()}
    assert len(bins) == 10
    assert all(bins[b].n == 10 for b in bins)
    assert bins[1].lo == 0 and bins[10].hi == 99


# -------------------------------------------------------------------- kmv
def test_kmv_by_group_exact_below_k(spark):
    from index_spark.operators.sampling import kmv_by_group

    rows = [("a", i % 5) for i in range(100)] + [("b", i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, u long")
    got = {r.g: r for r in kmv_by_group(df, "g", "u", k=32).collect()}
    # group a has 5 distinct (< k): exact
    assert got["a"].est_distinct == 5 and got["a"].k_used == 5
    # group b has 200 distinct: sketch estimate within 40%
    assert got["b"].k_used == 32 and 120 <= got["b"].est_distinct <= 280


def test_exact_quantiles_matches_sorted_model(spark):
    import math

    from index_spark.operators.stats import exact_quantiles

    vals = [((i * 7919) % 1000) - 200 for i in range(500)]
    df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "v long, k long")
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = {r.p: r.value for r in exact_quantiles(df, "v", "k", qs, n_cuts=16).collect()}
    s = sorted(vals)
    want = {q: s[max(1, math.ceil(q * len(s))) - 1] for q in qs}
    assert got == want


def test_exact_quantiles_duplicate_ranks_and_tiny_input(spark):
    from index_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([(5, 0), (7, 1)], "v long, k long")
    got = {r.p: r.value for r in exact_quantiles(df, "v", "k", [0.1, 0.5, 0.9]).collect()}
    # ceil(0.1*2)=1 -> 5; ceil(0.5*2)=1 -> 5; ceil(0.9*2)=2 -> 7
    assert got == {0.1: 5, 0.5: 5, 0.9: 7}


def test_trim_duplicate_spans_matches_model(spark):
    import hashlib

    from index_spark.operators.spans import trim_duplicate_spans

    docs = [
        (1, "the quick brown fox jumps over a lazy dog tonight"),
        (2, "something else entirely here the quick brown fox jumps again now"),
        (3, "totally unique words without any repeats at all ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in trim_duplicate_spans(df, k=5).collect()}

    # python model
    k = 5
    grams = []
    for d, t in docs:
        w = t.lower().split()
        for i in range(max(len(w) - k + 1, 0)):
            h = int(hashlib.md5(" ".join(w[i : i + k]).encode()).hexdigest()[:7], 16)
            grams.append((d, i, h))
    from collections import Counter

    tot = Counter(h for _, _, h in grams)
    covered = {}
    for d, i, h in grams:
        if tot[h] >= 2:
            covered.setdefault(d, set()).update(range(i, i + k))
    for d, t in docs:
        w = t.lower().split()
        keep = [w[j] for j in range(len(w)) if j not in covered.get(d, set())]
        assert got[d].clean_text == " ".join(keep)
        assert got[d].n_kept == len(keep)
        assert got[d].n_removed == len(w) - len(keep)
    # the planted cross-doc span is actually removed
    assert "quick brown fox" not in got[1].clean_text
    assert got[3].n_removed == 0
