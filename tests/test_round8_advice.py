"""Regression tests for the round-7 advisor/verdict findings fixed in
round 8.

1. ``_plan_has_shuffle`` is now an ALLOWLIST (known-narrow nodes only):
   any node it has never classified fails SAFE as shuffle-bearing, so a
   future Spark rename or a new grouped-map variant can no longer
   silently re-enable the eager-AQE ``.rdd`` probe.
2. ``edit_distance_join`` enforces its short-string-fallback contract:
   a degenerate corpus whose strings all fall below the q-gram cutoff
   raises with the escape recipe instead of silently planning a
   quadratic broadcast-nested-loop verify.
3. The ``containment_pairs`` / ``set_join_exact`` oracles exclude
   token-less documents exactly like the operators do (a 0/0 in DuckDB
   is NaN, which compares GREATER than any threshold — phantom pairs).
4. ``js_divergence`` quantizes per-term contributions with
   ``floor(c*1e12 + 0.5)`` — correctly-rounded IEEE ops identical on
   both engines — instead of round(double, 12), which Spark computes in
   BigDecimal HALF_UP and DuckDB in floating point.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from index_spark.functions import text as TX
from index_spark.operators.setjoin import edit_distance_join


# ------------------------------------------------- 1. allowlist fail-safe


def test_plan_classifier_narrow_plans_allow_probe(spark, documents):
    scan = documents.select("doc_id", "text")
    assert not TX._plan_has_shuffle(scan)
    assert not TX._plan_has_shuffle(scan.filter(F.col("doc_id") > 3))
    # Generate (explode) is narrow
    gen = scan.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    assert not TX._plan_has_shuffle(gen)
    # Union of two scans is narrow
    assert not TX._plan_has_shuffle(scan.unionByName(scan))
    # Sample is narrow
    assert not TX._plan_has_shuffle(scan.sample(0.5, seed=1))


def test_plan_classifier_exchange_plans_block_probe(spark, documents):
    scan = documents.select("lang", "doc_id")
    assert TX._plan_has_shuffle(scan.groupBy("lang").count())
    assert TX._plan_has_shuffle(scan.distinct())
    assert TX._plan_has_shuffle(scan.orderBy("doc_id"))
    assert TX._plan_has_shuffle(scan.repartition(4))
    assert TX._plan_has_shuffle(scan.limit(5))  # GlobalLimit collapses
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("doc_id")
    assert TX._plan_has_shuffle(scan.select(F.row_number().over(w).alias("r")))


def test_plan_classifier_unknown_node_fails_safe(spark, documents):
    """mapInPandas is physically NARROW, but its logical node
    (MapInPandas) is deliberately absent from the allowlist — the
    classifier must treat anything unclassified as shuffle-bearing.
    This is the exact property the r7 denylist regex lacked (it missed
    FlatMapGroupsInPandas and re-enabled the eager probe silently)."""
    import pandas as pd

    def f(it):
        for pdf in it:
            yield pdf

    mp = documents.select("doc_id").mapInPandas(f, schema="doc_id long")
    assert TX._plan_has_shuffle(mp)


def test_plan_classifier_allowlist_is_authoritative():
    """Pin the allowlist so an accidental addition of an exchange node
    shows up in review: every entry must be one of the audited narrow
    nodes."""
    audited = {
        "Relation", "RelationV2", "InMemoryRelation", "LogicalRDD",
        "LocalRelation", "OneRowRelation", "Range", "ExternalRDD",
        "Project", "Filter", "Generate", "Sample",
        "SubqueryAlias", "LocalLimit", "SerializeFromObject",
        "DeserializeToObject", "Union",
        # narrow PHYSICAL nodes (InMemoryRelation embeds its cached plan)
        "FileScan", "ColumnarToRow", "InputAdapter", "Scan",
        "WholeStageCodegen",
    }
    assert TX._SPREAD_SAFE_NODES == frozenset(audited)


def test_plan_classifier_cached_frame_allows_probe(spark, documents):
    """A persisted scan plans as InMemoryRelation — narrow; without it on
    the allowlist spread_for_cpu would unconditionally round-robin an
    already-wide cached corpus (the 1.5-2x regression its own docstring
    measures)."""
    cached = documents.select("doc_id", "text").persist()
    try:
        cached.count()
        assert not TX._plan_has_shuffle(cached)
        assert not TX._plan_has_shuffle(cached.filter(F.col("doc_id") > 2))
    finally:
        cached.unpersist()


# ------------------------------------- 2. edit-distance short-class guard


def test_edit_distance_join_rejects_degenerate_short_corpus(spark):
    rows = [(i, f"{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}") for i in range(40)]
    docs = spark.createDataFrame(rows, "id long, name string")
    with pytest.raises(ValueError, match="short_class_cap"):
        edit_distance_join(docs, k=1, q=2, short_class_cap=10)


def test_edit_distance_join_cap_none_still_exact(spark):
    """Opting out of the guard keeps the math exact: brute-force parity
    on an all-short corpus."""
    rows = [(0, "ab"), (1, "ac"), (2, "ab"), (3, "xy"), (4, "a")]
    docs = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(docs, k=1, q=2, short_class_cap=None).collect()
    }
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    }
    assert got == want


def test_edit_distance_join_normal_corpus_unaffected(spark):
    rows = [(0, "johnathan smith"), (1, "jonathan smith"), (2, "mary jones")]
    docs = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(docs, k=1).collect()}
    assert got == {(0, 1, 1)}


# ------------------------------------------- 3. oracle empty-doc guards


def _oracle_rows(sql, docs_rows, tmp_path, spark):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs_rows, "doc_id long, text string, source string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    return con.execute(sql).fetchall()


def test_containment_oracle_excludes_tokenless_docs(spark, tmp_path):
    """doc 10 and doc 20 are whitespace-only and hit the %5 sample: the
    pre-fix oracle emitted (10, 20)-style NaN pairs that the operator
    never produces."""
    rows = [
        (10, "   ", "s", "en"),
        # tab/newline-only: DuckDB trim() strips only spaces, so a
        # len(trim(text)) guard passes this doc and reproduces the NaN
        # phantom pair — the guard must be regexp_matches(text, '\\S')
        (20, "\t\n", "s", "en"),
        (5, "alpha beta gamma", "s", "en"),
        (15, "alpha beta gamma delta", "s", "en"),
    ]
    got = _oracle_rows(em.oracle_sql()["containment_pairs"], rows, tmp_path, spark)
    ids = {r[0] for r in got} | {r[1] for r in got}
    assert 10 not in ids and 20 not in ids
    assert all(r[2] is not None and not math.isnan(r[2]) for r in got)
    assert (5, 15, 1.0) in got


def test_set_join_oracle_excludes_tokenless_docs(spark, tmp_path):
    rows = [
        (0, " ", "s", "en"),
        (3, "\n\t ", "s", "en"),
        (6, "alpha beta", "s", "en"),
        (9, "alpha beta", "s", "en"),
    ]
    got = _oracle_rows(em.oracle_sql()["set_join_exact"], rows, tmp_path, spark)
    ids = {r[0] for r in got} | {r[1] for r in got}
    assert 0 not in ids and 3 not in ids
    assert (6, 9, 1.0) in got


# ---------------------------------------- 4. js_divergence quantization


def test_js_divergence_matches_integer_quantized_reference(spark):
    """The engine's jsd must equal the pure-Python replay of the SAME
    quantizer: floor(c*1e12 + 0.5) per term, integer sum, then
    floor((S + 5e5)/1e6)/1e6 — no double rounding anywhere."""
    from collections import Counter

    from index_spark.operators.corpusstats import js_divergence

    a_texts = ["the cat sat", "the dog sat on the mat", "a cat"]
    b_texts = ["the dog ran", "a dog ran far", "the mat"]
    a = spark.createDataFrame([(i, t) for i, t in enumerate(a_texts)], "doc_id long, text string")
    b = spark.createDataFrame([(i, t) for i, t in enumerate(b_texts)], "doc_id long, text string")
    row = js_divergence(a, b).first()

    ca = Counter(w for t in a_texts for w in t.lower().split())
    cb = Counter(w for t in b_texts for w in t.lower().split())
    ta, tb = sum(ca.values()), sum(cb.values())
    s = 0
    for w in set(ca) | set(cb):
        pa, pb = ca[w] / ta, cb[w] / tb
        m = (pa + pb) / 2.0
        c = (0.5 * pa * math.log(pa / m) if ca[w] else 0.0) + (
            0.5 * pb * math.log(pb / m) if cb[w] else 0.0
        )
        s += math.floor(c * 1.0e12 + 0.5)
    want = math.floor((s + 500000) / 1000000.0) / 1.0e6
    assert row["n_a"] == ta and row["n_b"] == tb
    assert row["jsd"] == want
