"""Tests for deterministic sampling / packing / KMV sketch (operators/sampling)
and interval join / time rollup (operators/interval)."""

import os

import pytest
from pyspark.sql import functions as F

from index_spark.operators.interval import time_rollup, window_count_join
from index_spark.operators.sampling import (
    hash_sample,
    kmv_distinct,
    pack_sequences,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from index_spark.sources import load_table

    return load_table(spark, sf_dir, "events")


def test_hash_sample_deterministic_and_partitioning(documents):
    a = {r.doc_id for r in hash_sample(documents, "doc_id", 4).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(documents, "doc_id", 4).select("doc_id").collect()}
    assert a == b  # rerun-stable, unlike rand()-based sampling
    total = documents.count()
    assert 0 < len(a) < total
    # rate-16 keeps everything, rate-0 nothing
    assert hash_sample(documents, "doc_id", 16).count() == total
    assert hash_sample(documents, "doc_id", 0).count() == 0
    # buckets partition the table: 4/16 sample is a subset of the 8/16 sample
    big = {r.doc_id for r in hash_sample(documents, "doc_id", 8).select("doc_id").collect()}
    assert a <= big


def test_hash_sample_rate_roughly_uniform(documents):
    total = documents.count()
    n = hash_sample(documents, "doc_id", 8).count()
    assert abs(n / total - 0.5) < 0.15


def test_stratified_rates(documents):
    out = stratified_hash_sample(
        documents, strata="lang", key="doc_id", rates_16ths={"en": 2}, default_16ths=16
    )
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r.lang: r.n for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # non-en strata kept whole; en cut to ~1/8
    for lang, n in per.items():
        if lang != "en":
            assert n == base[lang]
    assert per.get("en", 0) < base["en"] * 0.45


def test_pack_sequences_budget_invariant(documents):
    budget = 1500
    docs = documents.withColumn(
        "n_tok", F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast("long")
    )
    packed = pack_sequences(docs, "lang", "doc_id", "n_tok", budget).collect()
    by_chunk: dict = {}
    for r in packed:
        by_chunk.setdefault((r.lang, r.chunk_id), []).append((r.doc_id, r.n_tok))
    for (lang, chunk), rows in by_chunk.items():
        assert chunk >= 0
        rows.sort()
        tot = sum(t for _, t in rows)
        # greedy invariant: without its last (straddling) doc the chunk is
        # under budget; every non-final chunk ends at/over budget boundary
        assert tot - rows[-1][1] < budget
    # chunk ids are dense from 0 per stratum
    for lang in {l for l, _ in by_chunk}:
        ids = sorted(c for l, c in by_chunk if l == lang)
        assert ids == list(range(len(ids)))


def test_kmv_estimate_close_to_exact(spark, orders):
    row = kmv_distinct(orders, "o_custkey", k=64).collect()[0]
    exact = orders.select("o_custkey").distinct().count()
    assert row.k == min(64, exact)
    # k=64 → relative stderr ≈ 1/√64 = 12.5%; allow 4σ
    assert abs(row.est_distinct - exact) / exact < 0.5


def test_kmv_small_domain_exact_k(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.k == 10  # fewer distinct values than k: sketch holds them all


def test_window_count_join_matches_bruteforce(events):
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = {
        r.event_id: r.n_window
        for r in window_count_join(
            probe, events.select("user_id", "ts_us"), "user_id", "ts_us", 600_000_000
        ).collect()
    }
    rows = events.select("event_id", "user_id", "ts_us", "event_type").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.ts_us)
    expected = {}
    for r in rows:
        if r.event_type != "purchase":
            continue
        n = sum(1 for t in by_user[r.user_id] if r.ts_us - 600_000_000 <= t < r.ts_us)
        if n:
            expected[r.event_id] = n
    assert out == expected


def test_time_rollup_grains_consistent(events):
    out = time_rollup(
        events, "ts", ["hour", "day"], F.count(F.lit(1)).alias("n")
    ).collect()
    hours = [r for r in out if r.grain == "hour"]
    days = [r for r in out if r.grain == "day"]
    assert sum(r.n for r in hours) == sum(r.n for r in days) == events.count()
    # every hour bucket folds into exactly one day bucket
    day_starts = {r.bucket_us for r in days}
    us_per_day = 86_400_000_000
    assert {(r.bucket_us // us_per_day) * us_per_day for r in hours} <= day_starts


def test_time_rollup_rejects_unknown_grain(events):
    with pytest.raises(ValueError):
        time_rollup(events, "ts", ["fortnight"], F.count(F.lit(1)).alias("n"))
