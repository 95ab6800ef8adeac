"""Round-10: repetition_annotate — the zero-join inline quality gate.

The composed-pipeline probe showed the quality stage's whole cost is the
stats→corpus semi-join once the stats themselves went shuffle-free (r9):
two corpus-sized exchanges for a PER-DOCUMENT predicate.
``repetition_annotate`` computes the identical verdict as a column on the
corpus row itself — zero shuffle, zero join."""

from __future__ import annotations

import random

from pyspark.sql import Row, functions as F

from index_spark.operators.quality import repetition_annotate, repetition_filter


def _random_doc(rng: random.Random) -> str:
    vocab = [f"w{j}" for j in range(rng.randint(1, 8))]
    n = rng.randint(0, 30)
    return " ".join(rng.choice(vocab) for _ in range(n))


def test_annotate_matches_filter_verdict_exactly(spark):
    """Every document's inline verdict equals repetition_filter's
    ``passes`` bit; documents ABSENT from the stats frame (no k-grams:
    short, empty, whitespace-only) pass vacuously in both."""
    rng = random.Random(1009)
    rows = [Row(doc_id=i, text=_random_doc(rng)) for i in range(200)]
    rows += [
        Row(doc_id=900, text=""),
        Row(doc_id=901, text="   "),
        Row(doc_id=902, text="single"),
        Row(doc_id=903, text="x " * 500),  # long pure-repeat: fails
    ]
    df = spark.createDataFrame(rows)
    stats = {
        r["doc_id"]: r["passes"]
        for r in repetition_filter(df, k=2).collect()
    }
    inline = {
        r["doc_id"]: r["rep_passes"]
        for r in repetition_annotate(df, k=2).collect()
    }
    assert set(inline) == {r.doc_id for r in rows}
    for r in rows:
        expected = stats.get(r.doc_id, True)  # absent = vacuous pass
        assert inline[r.doc_id] == expected, (r.doc_id, r.text[:40])
    # sanity: the planted extremes land where they should
    assert inline[900] and inline[901] and inline[902]
    assert not inline[903]


def test_annotate_null_text_passes_vacuously(spark):
    """NULL text yields no k-grams — vacuous pass, matching
    repetition_filter where such docs are simply absent from the stats."""
    df = spark.createDataFrame(
        [(1, None), (2, "x x x x x x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["rep_passes"] for r in repetition_annotate(df).collect()}
    assert got[1] is True
    assert got[2] is False  # pure repeat fails


def test_annotate_keeps_all_columns_and_rejects_collision(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c", source="web")]
    )
    out = repetition_annotate(df)
    assert out.columns == ["doc_id", "text", "source", "rep_passes"]
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        repetition_annotate(df.withColumn("rep_passes", F.lit(True)))


def test_annotate_plan_is_shuffle_free(spark, sf_dir):
    """The inline gate over an already-wide corpus must plan with ZERO
    exchanges and ZERO joins — that is its whole reason to exist. (The
    input is localCheckpoint'ed first: the sf fixture parquet is a single
    row group, so spread_for_cpu would add its fixture-only widening
    exchange — a no-op on real multi-row-group data.)"""
    width = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(width)
        .localCheckpoint()
    )
    try:
        out = repetition_annotate(docs).filter(F.col("rep_passes"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan
    finally:
        spark.catalog.clearCache()


def test_quality_filters_do_not_reinline_the_chain(spark, sf_dir):
    """Round-10 regression: predicate pushdown has no cost guard, so a
    filter on a derived quality column used to substitute the whole
    sort+hash+tokenize chain into per-element lambda captures inside the
    pushed Filter (270.7 s vs 3.4 s on 500 × 1000-token docs). With the
    pushdown_barrier, no Filter condition may contain the hash chain —
    ``xxhash64`` is its fingerprint: a pushed filter may legitimately
    reference cheap folds OVER the materialized attribute (entropy's
    sort_array of the tf list) or the pre-existing linear
    ``size(__g) > 0`` tokenize re-eval, but never re-derive the hashed
    array itself inside a lambda."""
    from index_spark.operators.quality import token_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    frames = [
        repetition_filter(docs).filter("passes"),
        repetition_annotate(docs).filter("rep_passes"),
        token_entropy(docs).filter("entropy > 1.0"),
    ]
    for fr in frames:
        plan = fr._jdf.queryExecution().executedPlan().toString()
        for seg in plan.split("Filter")[1:]:
            head = seg.split("+-")[0]  # this Filter's condition only
            assert "xxhash64" not in head, head[:500]


def test_annotate_agrees_with_filter_on_real_docs(spark, sf_dir):
    """On the sf0.001 documents table the surviving id set from the
    inline gate equals the semi-join formulation's id set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    keep_join = {
        r["doc_id"]
        for r in docs.join(
            repetition_filter(docs).filter("passes").select("doc_id"),
            "doc_id",
            "left_semi",
        ).collect()
    }
    # absent-from-stats docs pass vacuously in the join formulation too:
    # add them back the way a pipeline caller would (anti-join on stats)
    stats_ids = {
        r["doc_id"] for r in repetition_filter(docs).select("doc_id").collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    keep_join |= all_ids - stats_ids
    keep_inline = {
        r["doc_id"]
        for r in repetition_annotate(docs)
        .filter("rep_passes")
        .select("doc_id")
        .collect()
    }
    assert keep_inline == keep_join
