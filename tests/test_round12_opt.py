"""Round-12 optimization regression tests.

Pins the two behavioral contracts the round-12 changes rely on:

- the streaming state-partition count is DERIVED from expected state rows
  (floor 8, scale-up with volume) and the footer estimator reads the
  fixture's exact row count and hour span with zero Spark jobs;
- the one-UDF-pass fusion of ``incremental_near_dups`` returns the
  identical verdict table with and without a pre-computed corpus
  projection, and the ``sh`` slice of the fused projection equals the old
  separate 1-hash pass (the invariant that made the fusion legal).
"""

import pytest
from pyspark.sql import functions as F


def test_stream_state_partitions_floor_scale_cap():
    from index_spark.streaming.events import stream_state_partitions

    # at-or-below one store's worth → floor
    assert stream_state_partitions(0) == 8
    assert stream_state_partitions(-5) == 8
    assert stream_state_partitions(1) == 8
    assert stream_state_partitions(64_000 * 8) == 8
    # grows with state volume past the floor
    assert stream_state_partitions(64_000 * 9) == 9
    assert stream_state_partitions(64_000 * 100) == 100
    # exact boundary arithmetic: ceil, not floor-divide
    assert stream_state_partitions(64_000 * 9 + 1) == 10
    # capped
    assert stream_state_partitions(10**12) == 2048


def test_events_footer_stats_zero_job_bounds(sf_dir):
    from index_spark.streaming.events import events_footer_stats

    n_rows, span_h = events_footer_stats(sf_dir)
    # sf0.001 fixture: exactly 1000 events across the 30-day January span
    assert n_rows == 1000
    assert 715 <= span_h <= 721  # ~30 days of hours (+1 closing bucket)


def test_sf01_estimates_all_land_on_floor():
    """The sizing change must be bench-neutral at the driver's scale: every
    derived estimate at sf0.1 lands on the measured-fast floor of 8."""
    from index_spark.operators.sampling import CMS_DEPTH, CMS_WIDTH
    from index_spark.streaming.events import (
        EVENT_TYPE_CATALOG_BOUND,
        events_footer_stats,
        stream_state_partitions,
    )

    n_rows, span_h = events_footer_stats("/root/testdata/sf0.1")
    assert n_rows == 100_000 and span_h > 0
    estimates = [
        min(span_h * EVENT_TYPE_CATALOG_BOUND, n_rows),  # hourly, hourly_topk
        n_rows,  # sessionize
        min(EVENT_TYPE_CATALOG_BOUND * (1 << 10), n_rows),  # hll
        CMS_DEPTH * CMS_WIDTH,  # cms
        min(span_h * (1 << 10), n_rows),  # hll_hourly
    ]
    assert all(stream_state_partitions(e) == 8 for e in estimates)


def test_shingle_sig_projection_sh_independent_of_num_hashes(spark):
    """The fusion replaces the old separate 1-hash verify pass with the
    ``sh`` slice of the 16-hash projection — legal only because shingles
    do not depend on the signature width. Pin that."""
    from index_spark.operators.dedup import shingle_minhash_udf, shingle_sig_projection

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, None)],
        "doc_id long, text string",
    )
    fused = {
        r.id: r.sh
        for r in shingle_sig_projection(docs, num_hashes=16).collect()
    }
    old = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", shingle_minhash_udf(1, 3)(F.col("text"))["sh"].alias("sh")
        ).collect()
    }
    assert fused == old


def test_incremental_near_dups_projection_path_identical(spark):
    """Verdicts with a caller-supplied corpus projection (the continuous-
    ingest recipe) must equal the self-computed path row-for-row."""
    from index_spark.operators.dedup import incremental_near_dups, shingle_sig_projection

    corpus = spark.createDataFrame(
        [(i, f"common boilerplate words alpha beta gamma delta {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "common boilerplate words alpha beta gamma delta 0"),
         (101, "entirely unrelated fresh content nothing shared here at all")],
        "doc_id long, text string",
    )
    default_path = sorted(
        tuple(r) for r in incremental_near_dups(corpus, batch).collect()
    )
    proj = shingle_sig_projection(corpus).persist()
    try:
        given_path = sorted(
            tuple(r)
            for r in incremental_near_dups(
                corpus, batch, corpus_projection=proj
            ).collect()
        )
    finally:
        proj.unpersist()
    assert default_path == given_path
    # the planted dup must be flagged, the fresh doc must not
    verdicts = {t[0]: t[3] for t in default_path}
    assert verdicts[100] is True and verdicts[101] is False
