"""Property tests for the round-4 operators — randomized inputs against
independent pure-Python models (reference randomized-spec strategy).
Example counts stay small: every example pays local Spark jobs."""

import hashlib
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))


# ------------------------------------------------------------ quota caps
@SET
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    ),
    n=st.integers(1, 5),
    salts=st.sampled_from([1, 2, 4]),
)
def test_cap_per_group_matches_model(spark, rows, n, salts):
    from index_spark.operators.quota import cap_per_group

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g int, v int")
    got = sorted(
        r.id
        for r in cap_per_group(
            df, ["g"], n, [F.col("v").desc(), F.col("id")], id_col="id", salts=salts
        ).collect()
    )
    by_g = defaultdict(list)
    for i, g, v in data:
        by_g[g].append((-v, i))
    want = sorted(i for g, lst in by_g.items() for _, i in sorted(lst)[:n])
    assert got == want


# -------------------------------------------------------- winsorized trim
@SET
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=80),
    trim=st.sampled_from([0.0, 0.01, 0.1, 0.25]),
)
def test_winsorized_matches_model(spark, vals, trim):
    from index_spark.operators.stats import winsorized_stats

    data = [(1, v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "g int, v long, k long")
    r = winsorized_stats(df, ["g"], "v", "k", trim_frac=trim).collect()
    cut = int(trim * len(vals))
    kept = sorted((v, i) for _, v, i in [(1, v, i) for i, v in enumerate(vals)])
    kept = [v for v, _ in kept[cut : len(vals) - cut]]
    if not kept:
        assert r == []
        return
    assert len(r) == 1 and r[0].n_kept == len(kept)
    assert r[0].min_kept == min(kept) and r[0].max_kept == max(kept)
    assert r[0].mean_kept == round(sum(kept) / len(kept), 6)


# --------------------------------------------------------- equi-depth bins
@SET
@given(vals=st.lists(st.integers(-100, 100), min_size=1, max_size=60))
def test_equidepth_matches_ntile_model(spark, vals):
    from index_spark.operators.stats import equidepth_histogram

    bins = 4
    data = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "v long, k long")
    got = {r.bin: (r.n, r.lo, r.hi) for r in equidepth_histogram(df, "v", "k", bins).collect()}
    # ntile model: first (n % bins) tiles get one extra row
    ordered = [v for v, _ in sorted(data)]
    n = len(ordered)
    base, extra = divmod(n, bins)
    want, pos = {}, 0
    for b in range(1, bins + 1):
        size = base + (1 if b <= extra else 0)
        if size == 0:
            continue
        chunk = ordered[pos : pos + size]
        want[b] = (size, min(chunk), max(chunk))
        pos += size
    assert got == want


# ----------------------------------------------------- MOR delete vs model
@SET
@given(
    cuts=st.lists(st.integers(0, 9), min_size=1, max_size=3),
    n=st.integers(10, 25),
)
def test_mor_delete_stacked_matches_model(spark, tmp_base_factory, cuts, n):
    from index_spark.snapshots import SnapshotStore

    base = tmp_base_factory()
    store = SnapshotStore(spark, base + "/idx")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, float(i)) for i in range(n)], "k long, v double"),
        rows_per_partition=7,
    )
    live = set(range(n))
    for c in cuts:
        doomed = {k for k in live if k % 10 == c}
        h2 = h.delete_where_mor(F.col("k") % 10 == c)
        live -= doomed
        if doomed:
            assert h2 is not h
            h = h2
        else:
            assert h2 is h
        assert h.count() == len(live)
    assert sorted(r.k for r in h.df.select("k").collect()) == sorted(live)


# ------------------------------------------------- bloom point-get parity
@SET
@given(
    keys=st.sets(st.integers(0, 500), min_size=5, max_size=40),
    probes=st.sets(st.integers(0, 500), min_size=1, max_size=10),
)
def test_read_point_equals_get_with_blooms(spark, tmp_base_factory, keys, probes):
    from index_spark.snapshots import SnapshotStore

    base = tmp_base_factory()
    store = SnapshotStore(spark, base + "/idx")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(k, float(k)) for k in sorted(keys)], "k long, v double"),
        rows_per_partition=10,
    )
    store.build_blooms()
    head = store.latest()
    for p in probes:
        got = sorted(tuple(r) for r in head.read_point(p).select("k", "v").collect())
        want = sorted(tuple(r) for r in head.get(p).select("k", "v").collect())
        assert got == want
        assert len(got) == (1 if p in keys else 0)


# --------------------------------------- MOR mixed with the other verbs
@SET
@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["mor", "upsert", "remove", "cow_del"]), st.integers(0, 19)),
        min_size=1,
        max_size=5,
    )
)
def test_mor_interleaved_with_mutations_matches_model(spark, tmp_base_factory, ops):
    from index_spark.errors import KeyNotFoundError
    from index_spark.snapshots import SnapshotStore

    base = tmp_base_factory()
    store = SnapshotStore(spark, base + "/idx")
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(i, 0.0) for i in range(20)], "k long, v double"),
        rows_per_partition=6,
    )
    model = {i: 0.0 for i in range(20)}
    for i, (op, x) in enumerate(ops):
        if op == "mor":
            doomed = {k for k in model if k % 5 == x % 5}
            h2 = h.delete_where_mor(F.col("k") % 5 == x % 5)
            for k in doomed:
                del model[k]
            if doomed:
                h = h2
        elif op == "upsert":
            h = h.insert([{"k": x, "v": float(i + 1)}], upsert=True)
            model[x] = float(i + 1)
        elif op == "remove":
            if x in model:
                h = h.remove([{"k": x}])
                del model[x]
            else:
                with pytest.raises(KeyNotFoundError):
                    h.remove([{"k": x}])
        else:  # cow_del
            doomed = {k for k in model if k > 20 - x}
            if doomed:
                h = h.delete_where(F.col("k") > 20 - x)
                for k in doomed:
                    del model[k]
        got = {r.k: r.v for r in h.df.select("k", "v").collect()}
        assert got == model
        assert h.count() == len(model)
