"""Regression tests for the final round-4 store review: partial-COW vs
schema evolution, evolution-safe merges, NULL-key sharded routing, empty
execute, cross-shard retry messaging."""

import os

import pytest
from pyspark.sql import functions as F

from index_spark.errors import CommitConflictError
from index_spark.sharded import ShardedIndex
from index_spark.snapshots import SnapshotStore


def _mk_store(spark, path, n=40, rpp=10):
    rows = [(i, f"v{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "k long, v string")
    store = SnapshotStore(spark, path)
    h = store.create(["k"], df=df, rows_per_partition=rpp)
    return store, h


def test_partial_update_preserves_evolved_column(spark, tmp_base):
    """A partial-COW update touching only pre-evolution files must keep
    the batch's evolved column, not silently drop it."""
    store, h = _mk_store(spark, tmp_base + "/s1")
    # evolve the schema via an upsert that adds column w, touching only
    # the file(s) around k=1000
    h2 = store.latest().insert([{"k": 1000, "v": "new", "w": "W0"}],
                               upsert=True, allow_new_columns=True)
    # update a key living in a PRE-evolution file, carrying w
    h3 = store.latest().update([{"k": 3, "v": "updated", "w": "W3"}])
    got = {r.k: (r.v, r.w) for r in store.latest().df.filter(F.col("k").isin(3, 1000)).collect()}
    assert got[3] == ("updated", "W3")  # evolved value survived the rewrite
    assert got[1000] == ("new", "W0")


def test_merge_from_across_schema_evolution(spark, tmp_base):
    store_a, ha = _mk_store(spark, tmp_base + "/ma", n=10)
    store_b, hb = _mk_store(spark, tmp_base + "/mb", n=10)
    # evolve only the right side; shift its keys to stay disjoint
    hb2 = store_b.latest().insert(
        [{"k": 100 + i, "v": "x", "w": "W"} for i in range(3)],
        upsert=True, allow_new_columns=True,
    )
    store_b.latest().remove([{"k": i} for i in range(10)])
    merged = store_a.latest().merge_from(store_b.latest(), tmp_base + "/mm")
    out = merged.df
    assert "w" in out.columns
    assert out.count() == 13
    assert out.filter(F.col("w").isNotNull()).count() == 3


def test_sharded_merge_adjacent_across_evolution(spark, tmp_base):
    rows = [(i, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v double")
    sh = ShardedIndex.create(spark, tmp_base + "/sh", ["k"], df, n_shards=4,
                             rows_per_partition=10)
    # evolving insert routed to ONE shard only
    sh.insert([{"k": 1, "v": 1.0, "flag": "x"}], upsert=True, allow_new_columns=True)
    first_id = sh._read_catalog()["shards"][0]["id"]
    assert sh.merge_adjacent(first_id)  # must not throw on the union
    assert sh.in_order().count() == 40
    assert sh.get(1).collect()[0].flag == "x"


def test_sharded_null_key_routing(spark, tmp_base):
    rows = [(i, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, v double")
    sh = ShardedIndex.create(spark, tmp_base + "/shn", ["k"], df, n_shards=2,
                             rows_per_partition=10)
    sh.insert([{"k": None, "v": -1.0}])  # NULL sorts first: routes to shard 0
    assert sh.in_order().count() == 21
    got = sh.get(None).collect()
    assert len(got) == 1 and got[0].v == -1.0
    # pruned scans with NULL-bearing terms must not crash
    assert sh.gt((None,)).count() == 20  # everything non-null is > NULL


def test_sharded_empty_execute_no_catalog_bump(spark, tmp_base):
    rows = [(i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, v double")
    sh = ShardedIndex.create(spark, tmp_base + "/she", ["k"], df, n_shards=2,
                             rows_per_partition=10)
    from index_spark import catalog as catalog_io

    before = catalog_io.latest_stamp(tmp_base + "/she", "catalog")
    sh.insert([])
    after = catalog_io.latest_stamp(tmp_base + "/she", "catalog")
    assert after == before


def test_sharded_retry_error_names_the_contract(spark, tmp_base):
    """A burned explicit tx id must explain the fresh-id retry contract."""
    rows = [(i, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, v double")
    sh = ShardedIndex.create(spark, tmp_base + "/shr", ["k"], df, n_shards=2,
                             rows_per_partition=10)
    sh.update([{"k": 1, "v": 10.0}], version="tx1")
    with pytest.raises(ValueError, match="FRESH version"):
        sh.update([{"k": 2, "v": 20.0}], version="tx1")


def test_sharded_point_get_prunes_files(spark, tmp_base):
    """A sharded point get must open only the manifest-pruned candidate
    files of the owning shard, not scan the whole shard."""
    rows = [(i, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v double")
    sh = ShardedIndex.create(spark, tmp_base + "/shp", ["k"], df, n_shards=2,
                             rows_per_partition=10)  # many files per shard
    got = sh.get(7)
    assert [r.v for r in got.collect()] == [7.0]
    cat = sh._read_catalog()
    owner = sh._owner(cat["shards"], (7,))
    total = len(sh._handle(owner, cat).store._version_row(owner["version"])["files"])
    assert total >= 5
    assert 0 < len(got.inputFiles()) < total

    multi = sh.get_all([3, 7, 150])
    assert {r.k for r in multi.collect()} == {3, 7, 150}


# ---- randomized model check: mutation interleavings across schema evolution


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

op_st = st.lists(
    st.tuples(
        st.sampled_from(["insert_w", "update", "update_w", "remove", "upsert"]),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=1,
    max_size=8,
)


# Fast default runs are pinned (derandomize=True) so CI is reproducible,
# but the schema-evolution bug this suite caught in round 4 was only
# exposed by seed variation across runs — HYPOTHESIS_PROFILE=nightly
# re-enables randomized exploration with a bigger example budget.
_NIGHTLY = os.environ.get("HYPOTHESIS_PROFILE") == "nightly"


@settings(max_examples=80 if _NIGHTLY else 10, deadline=None,
          derandomize=not _NIGHTLY,
          suppress_health_check=list(HealthCheck))
@given(ops=op_st)
def test_store_matches_dict_model_across_evolution(spark, tmp_base_factory, ops):
    """Random mutation sequences where schema evolution (adding column w)
    happens mid-stream: the store must agree with a plain dict model on
    every surviving row, including w values written through partial-COW
    updates of pre-evolution files."""
    base = tmp_base_factory()
    store = SnapshotStore(spark, base + "/s")
    store.create(
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(25)], "k long, v string"),
        rows_per_partition=5,
    )
    model = {i: {"v": f"v{i}", "w": None} for i in range(25)}
    evolved = False
    for op, k in ops:
        h = store.latest()
        try:
            if op == "insert_w":
                h.insert([{"k": k, "v": f"n{k}", "w": f"W{k}"}], upsert=True,
                         allow_new_columns=True)
                model[k] = {"v": f"n{k}", "w": f"W{k}"}
                evolved = True
            elif op == "upsert":
                h.insert([{"k": k, "v": f"u{k}"}], upsert=True)
                model[k] = {"v": f"u{k}", "w": None}
            elif op == "update":
                h.update([{"k": k, "v": f"x{k}"}])
                model[k]["v"] = f"x{k}"  # w untouched? full-row: w -> NULL
                if evolved:
                    model[k]["w"] = None  # full-row replacement semantics
            elif op == "update_w":
                if not evolved:
                    continue  # unknown column would (correctly) raise
                h.update([{"k": k, "v": f"y{k}", "w": f"Y{k}"}])
                model[k] = {"v": f"y{k}", "w": f"Y{k}"}
            elif op == "remove":
                h.remove([{"k": k}])
                del model[k]
        except Exception as e:
            # update/remove of an absent key is the expected error path
            assert k not in model, (op, k, e)
    got = {
        r.k: {"v": r.v, "w": getattr(r, "w", None)}
        for r in store.latest().df.collect()
    }
    want = model if evolved else {k: {"v": m["v"], "w": None} for k, m in model.items()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["v"] == want[k]["v"], k
        if evolved:
            assert got[k]["w"] == want[k]["w"], k
