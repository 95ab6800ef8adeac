"""Second randomized property pack for the round-3 continuation operators:
band join, SCD2 sequences, segment dedup, and zone-map range reads — each
against an independent pure-Python model (the reference's randomized-spec
strategy, MainSpec/QueriesRandomSpec)."""

import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from index_spark.operators.interval import band_join
from index_spark.operators.scd import scd2_apply, scd2_current, scd2_init
from index_spark.operators.segments import dedup_segments

SET = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
SMALL = settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))


# ------------------------------------------------------------- band join
@SET
@given(
    probe=st.lists(st.integers(0, 5000), min_size=1, max_size=25, unique=True),
    build=st.lists(st.integers(0, 5000), min_size=1, max_size=25, unique=True),
    tol=st.sampled_from([1, 7, 100, 999]),
)
def test_band_join_equals_brute_force(spark, probe, build, tol):
    p = spark.createDataFrame([(i, t) for i, t in enumerate(probe)], "p_id long, p_ts long")
    b = spark.createDataFrame([(i, t) for i, t in enumerate(build)], "b_id long, b_ts long")
    got = sorted((r.p_id, r.b_id) for r in band_join(p, b, "p_ts", "b_ts", tol).collect())
    want = sorted(
        (i, j)
        for i, tp in enumerate(probe)
        for j, tb in enumerate(build)
        if abs(tp - tb) <= tol
    )
    assert got == want


# ------------------------------------------------------------- SCD2 sequences
@SMALL
@given(
    base=st.dictionaries(st.integers(0, 12), st.sampled_from("abc"), min_size=1, max_size=8),
    batches=st.lists(
        st.dictionaries(st.integers(0, 15), st.sampled_from("abcd"), min_size=1, max_size=5),
        min_size=1,
        max_size=3,
    ),
)
def test_scd2_sequences_match_interval_model(spark, base, batches):
    dim = scd2_init(
        spark.createDataFrame([(k, v) for k, v in base.items()], "k long, seg string")
    )
    model = dict(base)  # current value per key
    history_closed = 0
    for t, batch in enumerate(batches, start=1):
        upd = spark.createDataFrame([(k, v) for k, v in batch.items()], "k long, seg string")
        dim = scd2_apply(dim, upd, key=["k"], tracked=["seg"], effective=t)
        for k, v in batch.items():
            if k in model and model[k] != v:
                history_closed += 1
                model[k] = v
            elif k not in model:
                model[k] = v
    cur = {r.k: r.seg for r in scd2_current(dim).collect()}
    assert cur == model
    closed = dim.filter(F.col("valid_to").isNotNull()).count()
    assert closed == history_closed


# ------------------------------------------------------------- segment dedup
@SMALL
@given(
    n_docs=st.integers(3, 8),
    boiler_every=st.integers(1, 3),
    data=st.data(),
)
def test_segment_dedup_random_corpus(spark, n_docs, boiler_every, data):
    header = "h1 h2 h3 h4"  # one 4-token block at width=4
    docs = []
    for i in range(n_docs):
        body_len = data.draw(st.integers(0, 10))
        body = " ".join(f"w{i}x{j}" for j in range(body_len))  # unique per doc
        text = (header + " " + body).strip() if i % boiler_every == 0 else body
        docs.append((i, text if text else "solo"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_segments(df, min_docs=3, width=4).collect()}
    # model
    freq = defaultdict(set)
    blocks = {}
    for i, text in docs:
        toks = text.lower().split()
        bl = [" ".join(toks[j * 4 : j * 4 + 4]) for j in range(math.ceil(len(toks) / 4))]
        blocks[i] = bl
        for b in set(bl):
            freq[b].add(i)
    boiler = {b for b, d in freq.items() if len(d) >= 3}
    for i, _ in docs:
        kept = [b for b in blocks[i] if b not in boiler]
        assert got[i].clean_text == " ".join(kept), (i, docs)
        assert got[i].n_removed == len(blocks[i]) - len(kept)


# ------------------------------------------------------------- zone-map reads
@SMALL
@given(
    lo=st.integers(0, 1400),
    width=st.integers(0, 400),
    incl=st.tuples(st.booleans(), st.booleans()),
)
def test_read_range_random_bounds_equal_plain_filter(spark, tmp_base, orders, lo, width, incl):
    import uuid

    from index_spark.snapshots import SnapshotStore

    data = orders.select("o_orderkey").filter(F.col("o_orderkey") < 1500)
    store = SnapshotStore(spark, f"{tmp_base}/zr_{uuid.uuid4().hex[:8]}")
    h = store.create(["o_orderkey"], df=data, rows_per_partition=300)
    hi = lo + width
    got = sorted(
        r.o_orderkey
        for r in h.read_range(lo, hi, from_inclusive=incl[0], to_inclusive=incl[1]).collect()
    )
    keys = sorted(r.o_orderkey for r in data.collect())
    want = [
        k
        for k in keys
        if (k >= lo if incl[0] else k > lo) and (k <= hi if incl[1] else k < hi)
    ]
    assert got == want
