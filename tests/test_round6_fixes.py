"""Round-6 regression tests.

Covers the round-5 verdict's prescribed fixes:
 1. `equidepth_histogram` / `exact_quantiles` / `ks_drift` no longer
    degenerate to a single-task sort on narrow-domain columns — the fixed
    `floor(v / 4096)` bucket key is replaced by sampled-quantile cut points
    (`stats._adaptive_bucket_expr`), verified here by inspecting the actual
    per-bucket row counts on a 1M-row column whose values all lie in
    [0, 100).
 2. ADVICE: `equidepth_histogram` NULL semantics are now explicit — NULL
    values are excluded from both `n` and the bins (previously they were
    dropped from the output but still counted toward `n`, silently
    shortening the tail bins).
 3. `simhash_candidates(materialize_path=...)` — the documented 100 TB
    recipe (projection to storage instead of a session-lifetime persist),
    made callable.
 4. `projection.lookup_rows` no longer `collect()`s key rows through the
    driver (structural assert: the broadcast probe is a lazy rebuild).
"""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from index_spark.operators.stats import (
    _adaptive_bucket_expr,
    equidepth_histogram,
    exact_quantiles,
    exact_quantiles_weighted,
    ks_drift,
)


# ------------------------------------------------- narrow-domain bucketing
def test_adaptive_buckets_spread_narrow_domain(spark):
    # 1M rows, every value in [0, 100): the old floor(v/4096) key put ALL
    # of them in bucket 0 — the per-bucket row_number then ran as ONE task
    # over the whole column. Adaptive cut points must spread the rows so
    # no bucket (= no window task) receives more than a small fraction.
    n = 1_000_000
    df = spark.range(n).select(
        (F.col("id") % 100).cast("long").alias("v"), F.col("id").alias("k")
    )
    b = _adaptive_bucket_expr(df, "v", n_cuts=80)
    sizes = df.select(b.alias("__b")).groupBy("__b").count().collect()
    assert len(sizes) > 10  # not collapsed into one bucket
    # equal values can't split buckets (10k rows per value here), but no
    # bucket may swallow a large slice of the column
    assert max(r["count"] for r in sizes) <= n // 10


def test_equidepth_narrow_domain_exact_ntile(spark):
    # correctness of the ntile rank arithmetic is bucket-independent: on
    # v = id % 100 with 1M rows and 10 bins, bin b holds exactly 100k rows
    # spanning values [(b-1)*10, b*10 - 1].
    n = 1_000_000
    df = spark.range(n).select(
        (F.col("id") % 100).cast("long").alias("v"), F.col("id").alias("k")
    )
    got = {r.bin: (r.n, r.lo, r.hi) for r in equidepth_histogram(df, "v", "k", 10).collect()}
    assert got == {b: (n // 10, (b - 1) * 10, b * 10 - 1) for b in range(1, 11)}


def test_equidepth_excludes_nulls_from_n_and_bins(spark):
    # ADVICE: NULLs used to vanish from the output while still counting
    # toward n (short tail bins). Now they are excluded from both.
    rows = [(float(v), i) for i, v in enumerate(range(50))] + [
        (None, 100 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, k long")
    got = equidepth_histogram(df, "v", "k", bins=5).collect()
    assert sum(r.n for r in got) == 50
    assert sorted((r.bin, r.n) for r in got) == [(b, 10) for b in range(1, 6)]


def test_exact_quantiles_narrow_domain(spark):
    import math

    vals = [i % 7 for i in range(10_000)]  # domain {0..6} — one old bucket
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, k long"
    )
    qs = [0.01, 0.5, 0.99]
    got = {r.p: r.value for r in exact_quantiles(df, "v", "k", qs).collect()}
    s = sorted(vals)
    assert got == {q: s[max(1, math.ceil(q * len(s))) - 1] for q in qs}


def test_ks_drift_subunit_domain(spark):
    # doubles packed into [0, 1): floor(v/4096) was 0 for every value —
    # the per-bucket running-sum window degenerated to one task. The
    # statistic itself must be unchanged: identical dists → D = 0, and a
    # half-shifted uniform → D = 0.5 exactly.
    a = spark.range(1000).select((F.col("id") / 1000.0).alias("v"))
    row = ks_drift(a, a, "v").collect()[0]
    assert (row.n_a, row.n_b, row.d_stat) == (1000, 1000, 0.0)
    b = spark.range(1000).select((0.5 + F.col("id") / 2000.0).alias("v"))
    row = ks_drift(a, b, "v").collect()[0]
    assert (row.n_a, row.n_b, row.d_stat) == (1000, 1000, 0.5)


# ------------------------------------------------------ weighted quantiles
def test_weighted_quantiles_match_expanded_multiset(spark):
    import math
    import random

    random.seed(7)
    rows = [(v, random.randint(1, 50)) for v in random.sample(range(-100, 100), 60)]
    rows += [(rows[0][0], 13), (rows[5][0], 7)]  # duplicate values combine
    df = spark.createDataFrame(rows, "v long, w long")
    expanded = sorted(v for v, w in rows for _ in range(w))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = {r.p: r.value for r in exact_quantiles_weighted(df, "v", "w", qs).collect()}
    want = {q: expanded[max(1, math.ceil(q * len(expanded))) - 1] for q in qs}
    assert got == want


def test_weighted_quantiles_dominant_value(spark):
    # 95% of the mass on one value — the case exact_quantiles' raw-row
    # bucketing cannot spread; here it is a single weighted row
    df = spark.createDataFrame(
        [(5, 950_000), (1, 20_000), (9, 30_000)], "v long, w long"
    )
    got = {
        r.p: r.value
        for r in exact_quantiles_weighted(df, "v", "w", [0.01, 0.5, 0.97, 0.99]).collect()
    }
    assert got == {0.01: 1, 0.5: 5, 0.97: 5, 0.99: 9}


def test_weighted_quantiles_error_paths(spark):
    df = spark.createDataFrame([(1, 3), (2, 4)], "v long, w long")
    with pytest.raises(ValueError, match="positive"):
        exact_quantiles_weighted(df.withColumn("w", F.lit(0)), "v", "w", [0.5]).collect()
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles_weighted(df.filter("v > 99"), "v", "w", [0.5]).collect()
    with pytest.raises(ValueError, match="at least one"):
        exact_quantiles_weighted(df, "v", "w", [])
    # a NULL weight hiding among good ones must raise, not silently drop
    # its row from every rank (min() ignores NULLs, so wmin alone missed it)
    with_null = df.unionByName(
        spark.createDataFrame([(9,)], "v long").select(
            "v", F.lit(None).cast("long").alias("w")
        )
    )
    with pytest.raises(ValueError, match="NULL, fractional"):
        exact_quantiles_weighted(with_null, "v", "w", [0.5]).collect()
    # fractional weights must raise, not silently truncate half the mass
    frac = spark.createDataFrame([(1, 1.9), (2, 2.9)], "v long, w double")
    with pytest.raises(ValueError, match="NULL, fractional"):
        exact_quantiles_weighted(frac, "v", "w", [0.5]).collect()
    # integral doubles are fine (a count exported as double round-trips)
    d = spark.createDataFrame([(1, 2.0), (2, 3.0)], "v long, w double")
    got = {r.p: r.value for r in exact_quantiles_weighted(d, "v", "w", [0.4, 1.0]).collect()}
    assert got == {0.4: 1, 1.0: 2}
    # out-of-range q would yield a silently absent output row — raise
    with pytest.raises(ValueError, match="must lie in"):
        exact_quantiles_weighted(df, "v", "w", [0.5, 1.5])


# --------------------------------------------------- simhash materialization
def _gc_nudge(spark):
    """Kick BOTH garbage collectors: entries in getPersistentRDDs() that
    the SQL cache manager does NOT track (localCheckpoint RDDs from
    earlier tests — graph ops checkpoint eagerly) are reaped by
    ContextCleaner only when the driver/JVM GC collects the dereferenced
    RDD, so a pure time wait can spin the full timeout and still fail
    (the r8-continuation full-run flake: the PRE-condition drain saw a
    leftover entry clearCache cannot remove)."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _untolerated_count(spark, tolerate) -> int:
    if not tolerate:
        return spark.sparkContext._jsc.getPersistentRDDs().size()
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    n = 0
    while it.hasNext():
        if it.next() not in tolerate:
            n += 1
    return n


def _drain_cache(spark, timeout_s: float = 60.0, tolerate=None) -> int:
    """clearCache + wait for the persistent-RDD table to empty:
    Catalog.clearCache() unpersists with blocking=false, so an immediate
    getPersistentRDDs() read can still see entries from EARLIER tests in
    the shared session (observed as a load-dependent flake in the r7 full
    run); GC nudges let ContextCleaner reap untracked localCheckpoint
    leftovers clearCache cannot touch. ``tolerate`` is a set of RDD ids
    to IGNORE in the emptiness check (r10: foreign untracked residue a
    test cannot control — see test_simhash_candidates docstring).
    Returns the count of non-tolerated residual entries."""
    import time

    spark.catalog.clearCache()
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if _untolerated_count(spark, tolerate) == 0:
            return 0
        _gc_nudge(spark)
        time.sleep(0.2)
    return _untolerated_count(spark, tolerate)


def _settle_cache(spark, timeout_s: float = 60.0, tolerate=None) -> int:
    """WAIT-ONLY variant of :func:`_drain_cache` — no clearCache call, so
    an entry the code under test genuinely leaked stays forever and the
    caller's == 0 assert still fails; only Spark's own ASYNC removals
    (clearCache's blocking=false unpersists, ContextCleaner GC-driven
    unpersists of dereferenced frames from earlier tests) get time to
    finish. Returns the settled non-tolerated count."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if _untolerated_count(spark, tolerate) == 0:
            return 0
        _gc_nudge(spark)
        time.sleep(0.2)
    return _untolerated_count(spark, tolerate)


def _persistent_ids(spark) -> set:
    """RDD ids currently in the persistent table (the JVM-truth view)."""
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_simhash_candidates_materialize_path_no_cache(spark, tmp_base):
    """The materialize path must leave NO persistent entry of ITS OWN.

    Asserts are baseline-RELATIVE by RDD id (r10): the absolute
    ``_drain_cache(spark) == 0`` precondition asserted a property of
    EARLIER tests — a dereferenced localCheckpoint RDD from another test
    is untracked by clearCache and reaped only when ContextCleaner's GC
    lag allows, which under full-suite load exceeds any reasonable
    deadline (the recurring one-per-suite flake; the mechanism itself is
    pinned deterministically by the subprocess test below). Tracking ids
    makes the assert about the code under test: entries CREATED HERE
    must appear and then drain; foreign residue is tolerated without
    masking a real leak."""
    from index_spark.operators.dedup import simhash_candidates

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over lazy dog {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    _drain_cache(spark, timeout_s=5.0)  # best-effort sweep; rest tolerated
    foreign = _persistent_ids(spark)
    cached = simhash_candidates(docs).sort("id_a", "id_b").collect()
    assert _persistent_ids(spark) - foreign, "cached path should persist"
    assert _drain_cache(spark, tolerate=foreign) == 0

    mat = (
        simhash_candidates(docs, materialize_path=tmp_base + "/sh")
        .sort("id_a", "id_b")
        .collect()
    )
    # identical candidates, and NO new persistent cache entry (settled:
    # async removals from the shared session get time to finish; a REAL
    # leak by the materialize path never drains and still fails here)
    assert mat == cached
    assert _settle_cache(spark, tolerate=foreign) == 0
    # repeated call with the option set still leaves the cache empty
    simhash_candidates(docs, materialize_path=tmp_base + "/sh2").count()
    assert _settle_cache(spark, tolerate=foreign) == 0


# ------------------------------------------------------- lookup_rows probe
def test_lookup_rows_does_not_collect_keys(spark, tmp_base):
    """The matched-key probe must be a lazy rebuild (broadcast semi-join),
    never rows materialized through the driver: a LocalTableScan of key
    rows in the final plan would mean collect() came back."""
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    base = SnapshotStore(spark, tmp_base + "/base")
    base.create(
        ["k"],
        df=spark.createDataFrame(
            [(i, i % 5, f"p{i}") for i in range(200)], "k long, a long, payload string"
        ),
        rows_per_partition=50,
    )
    proj = ProjectionIndex(spark, base, tmp_base + "/proj", "a")
    proj.build(rows_per_partition=50)
    out = proj.lookup_rows(3)
    rows = out.collect()
    assert sorted(r.k for r in rows) == [i for i in range(200) if i % 5 == 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan


def test_lookup_rows_pins_one_index_version(spark, tmp_base, monkeypatch):
    """Bounds, the broadcast decision, and the probe must all come from ONE
    store.latest() resolution — a second resolution would let a concurrent
    refresh() commit produce a torn mixed-version result (probe keys whose
    base files lie outside the stale zone-map bounds)."""
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    base = SnapshotStore(spark, tmp_base + "/base")
    base.create(
        ["k"],
        df=spark.createDataFrame(
            [(i, i % 3, f"p{i}") for i in range(60)], "k long, a long, payload string"
        ),
        rows_per_partition=20,
    )
    proj = ProjectionIndex(spark, base, tmp_base + "/proj", "a")
    proj.build(rows_per_partition=20)
    calls = []
    orig = proj.store.latest

    def counting_latest():
        calls.append(1)
        return orig()

    monkeypatch.setattr(proj.store, "latest", counting_latest)
    assert proj.lookup_rows(1).count() == 20
    assert len(calls) == 1


def test_drain_cache_reaps_dereferenced_localcheckpoint(tmp_path):
    """Pin the GC-nudge mechanism: a dereferenced localCheckpoint RDD is
    exactly the untracked persistent entry that broke the pre-condition
    drain in a full run — clearCache cannot remove it, only
    ContextCleaner after GC can.

    Runs in its OWN subprocess SparkContext (r10): in the shared session
    under 40-minute-suite load the py4j finalizer / ContextCleaner reap
    demonstrably lags past any reasonable deadline (r8's GC-nudge
    narrowed but did not close the race — one full-run failure per ~2
    suite runs, always passing solo), so in-process the assert measures
    host load, not the mechanism. A fresh context holds exactly one
    persistent RDD and no foreign py4j traffic, making the reap
    deterministic while still exercising the identical code path
    (_drain_cache imported from this module, not a copy)."""
    import subprocess
    import sys

    script = f"""
import sys
sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("drain-reap-isolated")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.driver.memory", "1g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from test_round6_fixes import _drain_cache

df = spark.range(10000).repartition(4).localCheckpoint()
df.count()
assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0, "not persisted"
del df
residual = _drain_cache(spark)
spark.stop()
assert residual == 0, f"residual persistent RDDs: {{residual}}"
print("REAPED_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "REAPED_OK" in proc.stdout
