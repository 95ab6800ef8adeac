"""Property tests for the round-3 operators — randomized inputs against
independent pure-Python models, mirroring the reference's randomized-spec
strategy (MainSpec/QueriesRandomSpec). Example counts are kept small:
every example pays a handful of local Spark jobs."""

import hashlib
from collections import defaultdict
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from index_spark.operators.bloom import bloom_prune
from index_spark.operators.funnel import funnel_counts
from index_spark.operators.graph import pagerank_int, triangle_count

SET = settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))


# ----------------------------------------------------------------- bloom
def _positions(key: str, m: int, k: int = 3):
    h1 = int(hashlib.md5(key.encode()).hexdigest()[:7], 16)
    h2 = int(hashlib.md5((key + "#").encode()).hexdigest()[:7], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


@SET
@given(
    build=st.sets(st.integers(0, 200), min_size=1, max_size=30),
    probe=st.sets(st.integers(0, 200), min_size=1, max_size=60),
    m=st.sampled_from([64, 256, 1024]),
)
def test_bloom_matches_model_for_any_sets(spark, build, probe, m):
    bdf = spark.createDataFrame([(x,) for x in build], "k long")
    pdf = spark.createDataFrame([(x,) for x in probe], "p long")
    got = sorted(r.p for r in bloom_prune(pdf, bdf, "p", "k", m=m).collect())
    bits = set()
    for x in build:
        bits.update(_positions(str(x), m))
    want = sorted(p for p in probe if all(q in bits for q in _positions(str(p), m)))
    assert got == want
    assert set(got) >= (build & probe)  # no false negatives, ever


# ----------------------------------------------------------------- funnel
def _funnel_model(events, steps):
    by_user = defaultdict(list)
    for u, ts, et in events:
        by_user[u].append((ts, et))
    counts = [0, 0, 0]
    for evs in by_user.values():
        t1 = min((ts for ts, et in evs if et == steps[0]), default=None)
        if t1 is None:
            continue
        counts[0] += 1
        t2 = min((ts for ts, et in evs if et == steps[1] and ts > t1), default=None)
        if t2 is None:
            continue
        counts[1] += 1
        t3 = min((ts for ts, et in evs if et == steps[2] and ts > t2), default=None)
        if t3 is not None:
            counts[2] += 1
    return counts


@SET
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),  # user
            st.integers(0, 20),  # ts (collisions likely — strictness matters)
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_matches_model_for_any_stream(spark, events):
    df = spark.createDataFrame(events, "user_id long, ts_us long, event_type string")
    r = funnel_counts(df, ["a", "b", "c"]).collect()[0]
    assert [r.step1_users, r.step2_users, r.step3_users] == _funnel_model(
        events, ["a", "b", "c"]
    )


# ----------------------------------------------------------------- pagerank
def _pagerank_model(edges, iters, total=10**12, pct=85):
    from collections import Counter

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


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    iters=st.integers(1, 3),
)
def test_pagerank_matches_model_for_any_graph(spark, edges, iters):
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    got = {r.node: r["rank"] for r in pagerank_int(df, iterations=iters).collect()}
    want = _pagerank_model([(f"n{a}", f"n{b}") for a, b in edges], iters)
    assert got == want


# ----------------------------------------------------------------- triangles
@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=25,
    )
)
def test_triangle_count_matches_brute_force(spark, edges):
    undirected = {frozenset(e) for e in edges if e[0] != e[1]}
    if not undirected:
        return
    df = spark.createDataFrame(list({tuple(e) for e in edges}), "src int, dst int")
    r = triangle_count(df).collect()[0]
    nodes = sorted({v for e in undirected for v in e})
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))} <= undirected
    )
    assert r.n_edges == len(undirected)
    assert r.n_triangles == tri


# ----------------------------------------------------------------- spans
@SET
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abc")), min_size=0, max_size=10).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 4),
)
def test_duplicate_spans_match_model_for_any_corpus(spark, docs, k):
    from index_spark.operators.spans import duplicate_span_stats

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans) for r in duplicate_span_stats(df, k=k).collect()}
    corpus = defaultdict(int)
    per_doc = {}
    for i, text in rows:
        toks = text.lower().split()
        spans = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        if spans:
            per_doc[i] = spans
            for s in spans:
                corpus[s] += 1
    want = {
        i: (len(sp), sum(1 for s in sp if corpus[s] >= 2)) for i, sp in per_doc.items()
    }
    assert got == want


# ----------------------------------------------------------------- KMV merge
@SET
@given(
    a=st.sets(st.integers(0, 500), min_size=1, max_size=80),
    b=st.sets(st.integers(0, 500), min_size=1, max_size=80),
    k=st.sampled_from([8, 16, 32]),
)
def test_kmv_merge_equals_union_sketch_for_any_sets(spark, a, b, k):
    from index_spark.operators.sampling import kmv_distinct, kmv_merge_estimate, kmv_sketch

    da = spark.createDataFrame([(x,) for x in a], "v long")
    db = spark.createDataFrame([(x,) for x in b], "v long")
    merged = kmv_merge_estimate([kmv_sketch(da, "v", k), kmv_sketch(db, "v", k)], k).collect()[0]
    direct = kmv_distinct(da.union(db), "v", k).collect()[0]
    assert (merged.est_distinct, merged.kth_frac, merged.k) == (
        direct.est_distinct,
        direct.kth_frac,
        direct.k,
    )


# ----------------------------------------------------------------- erasure
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    erase=st.sets(st.integers(0, 70), min_size=1, max_size=8),
    update=st.sets(st.integers(0, 49), min_size=0, max_size=3),
)
def test_erasure_matches_model_for_any_key_set(spark, tmp_path_factory, erase, update):
    """After erasing an arbitrary key set (some absent), every version's
    content equals the original minus the erased keys, manifest counts
    agree, and survivors keep their values."""
    from index_spark.snapshots import SnapshotStore

    base = str(tmp_path_factory.mktemp("er"))
    store = SnapshotStore(spark, base)
    store.create(
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k int, v string"),
        rows_per_partition=10,
    )
    if update:
        store.latest().update_partial([{"k": k, "v": f"u{k}"} for k in sorted(update)])
    res = store.erase_keys([{"k": k} for k in sorted(erase)])
    versions = store._read_manifest()["versions"]
    present = erase & set(range(50))
    assert res["rows_erased"] == len(present) * len(versions)
    for row in versions:
        got = {r.k: r.v for r in store.read(row["version"]).collect()}
        assert set(got) == set(range(50)) - erase
        assert row["n_rows"] == len(got)
    latest = {r.k: r.v for r in store.latest()._current().collect()}
    for k in set(range(50)) - erase:
        assert latest[k] == (f"u{k}" if k in update else f"v{k}")
