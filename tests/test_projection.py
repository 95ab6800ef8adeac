"""Secondary-index projection: build / incremental refresh / lookup vs a
dict model, idempotence, multi-commit catch-up; plus the gaps-and-islands
streak model."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from index_spark.projection import ProjectionIndex
from index_spark.snapshots import SnapshotStore


def _mk(spark, tmp_base, rows, sub="p"):
    df = spark.createDataFrame(rows, "k long, seg string, v double")
    store = SnapshotStore(spark, f"{tmp_base}/{sub}/base")
    h = store.create(["k"], df=df, rows_per_partition=5)
    proj = ProjectionIndex(spark, store, f"{tmp_base}/{sub}/idx", "seg").build(
        rows_per_partition=5
    )
    return store, h, proj


def _model(rows):
    m = defaultdict(set)
    for k, seg, _ in rows:
        m[seg].add(k)
    return m


def test_projection_build_and_lookup(spark, tmp_base):
    rows = [(i, "a" if i % 2 else "b", float(i)) for i in range(10)]
    _, _, proj = _mk(spark, tmp_base, rows)
    model = _model(rows)
    for seg in ("a", "b"):
        assert {r.k for r in proj.lookup(seg).collect()} == model[seg]
    assert proj.lookup("zz").count() == 0


def test_projection_refresh_applies_update_insert_delete(spark, tmp_base):
    rows = [(i, "a", float(i)) for i in range(6)]
    store, h, proj = _mk(spark, tmp_base, rows, sub="p2")
    # update attr of 2, insert a new key into 'c', delete key 5
    h2 = h.insert([{"k": 2, "seg": "c", "v": 2.0}, {"k": 99, "seg": "c", "v": 9.0}], upsert=True)
    h2.remove([{"k": 5}])
    assert proj.refresh() >= 1
    assert {r.k for r in proj.lookup("a").collect()} == {0, 1, 3, 4}
    assert {r.k for r in proj.lookup("c").collect()} == {2, 99}
    # and full-row fetch goes through the base head
    got = {r.k: r.v for r in proj.lookup_rows("c").select("k", "v").collect()}
    assert got == {2: 2.0, 99: 9.0}


def test_projection_refresh_is_idempotent_and_catches_up(spark, tmp_base):
    rows = [(i, "a", float(i)) for i in range(4)]
    store, h, proj = _mk(spark, tmp_base, rows, sub="p3")
    assert proj.refresh() == 0  # nothing new
    # two base commits before one refresh
    h2 = h.insert([{"k": 10, "seg": "b", "v": 1.0}], upsert=True)
    h3 = h2.insert([{"k": 11, "seg": "b", "v": 2.0}], upsert=True)
    assert proj.refresh() == 2
    assert {r.k for r in proj.lookup("b").collect()} == {10, 11}
    assert proj.refresh() == 0  # no-op again
    assert proj.applied_version() == store.latest_version()


def test_projection_lookup_prunes_value_columns(spark, tmp_base):
    rows = [(i, "a", float(i)) for i in range(4)]
    _, _, proj = _mk(spark, tmp_base, rows, sub="p4")
    assert set(proj.lookup("a").columns) == {"k"}


# ------------------------------------------------------------ streaks
def test_longest_streak_model(spark):
    seq = ["x", "x", "y", "y", "y", "x", "z", "z"]
    rows = [(i, 1, i * 1000, t) for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long, event_type string")
    from pyspark.sql import Window

    w_all = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    islands = df.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = islands.groupBy("user_id", "event_type", "grp").agg(F.count(F.lit(1)).alias("len"))
    best = runs.orderBy(F.col("len").desc(), F.col("event_type").asc()).first()
    assert (best.event_type, best.len) == ("y", 3)


# ------------------------------------------------- randomized refresh model
def test_projection_tracks_random_mutation_sequences(spark, tmp_base):
    """Deterministic pseudo-random upsert/remove sequences vs a dict
    model; refresh after each batch AND after batches of several commits
    must both converge to the model's inverted map."""
    import hashlib

    store = SnapshotStore(spark, tmp_base + "/rp/base")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, "s0", 0.0) for i in range(8)], "k long, seg string, v double"),
        rows_per_partition=5,
    )
    proj = ProjectionIndex(spark, store, tmp_base + "/rp/idx", "seg").build(rows_per_partition=5)
    model = {i: "s0" for i in range(8)}

    def rnd(round_no, i):
        return int(hashlib.md5(f"{round_no}#{i}".encode()).hexdigest()[:6], 16)

    for rnd_no in range(4):
        ups, rms = [], []
        for i in range(5):
            r = rnd(rnd_no, i)
            k = r % 12
            if r % 3 == 0 and k in model and not any(d["k"] == k for d in rms):
                rms.append({"k": k})
                del model[k]
            elif not any(u["k"] == k for u in ups) and not any(d["k"] == k for d in rms):
                seg = f"s{r % 4}"
                ups.append({"k": k, "seg": seg, "v": float(r % 7)})
                model[k] = seg
        cmds = []
        from index_spark.commands import Insert, Remove

        if ups:
            cmds.append(Insert(ups, upsert=True))
        if rms:
            cmds.append(Remove(rms))
        h = store.latest().execute(cmds)
        if rnd_no % 2 == 1:  # refresh every other round: multi-commit catch-up
            proj.refresh()
    proj.refresh()
    inv = {}
    for k, seg in model.items():
        inv.setdefault(seg, set()).add(k)
    for seg in ["s0", "s1", "s2", "s3"]:
        assert {r.k for r in proj.lookup(seg).collect()} == inv.get(seg, set()), seg


def test_projection_lookup_range_partial_bounds(spark, tmp_base):
    rows = [(i, f"g{i % 3}", float(i * 10)) for i in range(12)]
    df = spark.createDataFrame(rows, "k long, seg string, v double")
    store = SnapshotStore(spark, tmp_base + "/pr/base")
    store.create(["k"], df=df.select("k", "v", "seg"), rows_per_partition=5)
    proj = ProjectionIndex(spark, store, tmp_base + "/pr/idx", "v").build(rows_per_partition=5)
    got = {(r.v, r.k) for r in proj.lookup_range(30.0, 70.0).collect()}
    assert got == {(float(i * 10), i) for i in range(3, 8)}
    # exclusive upper bound drops the boundary attribute's keys entirely
    ex = {r.k for r in proj.lookup_range(30.0, 70.0, hi_inclusive=False).collect()}
    assert ex == {3, 4, 5, 6}


def test_lookup_rows_prunes_base_files_for_clustered_keys(spark, tmp_base):
    """When an attribute correlates with the key (here: seg = key band),
    lookup_rows must open only the base files covering the matched keys."""
    rows = [(i, "lo" if i < 50 else "hi", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, seg string, v double")
    store = SnapshotStore(spark, tmp_base + "/lr/base")
    store.create(["k"], df=df, rows_per_partition=10)  # 10 base files
    proj = ProjectionIndex(spark, store, tmp_base + "/lr/idx", "seg").build(rows_per_partition=10)
    total = len(store._version_row(store.latest_version())["files"])
    out = proj.lookup_rows("lo")
    assert {r.k for r in out.collect()} == set(range(50))
    # inputFiles() spans both join sides; count only the BASE scan's files
    base_files = [f for f in out.inputFiles() if "/lr/base/" in f]
    assert 0 < len(base_files) < total


def test_concurrent_refresh_one_wins(spark, tmp_base):
    """Two threads racing the same refresh: the CAS on the projection
    state (and the store commit CAS under it) guarantees at most one
    applies; the loser raises CommitConflictError or no-ops — never a
    double-applied diff."""
    import threading

    from index_spark.errors import CommitConflictError

    store = SnapshotStore(spark, tmp_base + "/cr/base")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, "a", 0.0) for i in range(6)], "k long, seg string, v double"),
        rows_per_partition=5,
    )
    proj = ProjectionIndex(spark, store, tmp_base + "/cr/idx", "seg").build(rows_per_partition=5)
    h.insert([{"k": 99, "seg": "b", "v": 1.0}], upsert=True)

    errs, applied = [], []

    def run():
        p = ProjectionIndex(spark, store, tmp_base + "/cr/idx", "seg")
        try:
            applied.append(p.refresh())
        except (CommitConflictError, ValueError) as e:
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # exactly one effective application (the other no-ops on the already
    # advanced state or loses the CAS)
    assert sum(1 for a in applied if a > 0) + len(errs) >= 1
    fresh = ProjectionIndex(spark, store, tmp_base + "/cr/idx", "seg")
    fresh.refresh()  # idempotent catch-up regardless of race outcome
    assert {r.k for r in fresh.lookup("b").collect()} == {99}
    assert fresh.applied_version() == store.latest_version()
