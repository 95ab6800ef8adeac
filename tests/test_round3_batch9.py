"""Round-3 batch-9 store verbs: rollback (RESTORE) and zero-copy clone."""

import pytest
from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore


def _mk(spark, tmp_base, n=20, sub="r"):
    df = spark.createDataFrame([(i, float(i)) for i in range(n)], "k long, v double")
    store = SnapshotStore(spark, f"{tmp_base}/{sub}")
    return store, store.create(["k"], df=df, rows_per_partition=7)


def test_rollback_restores_state_metadata_only(spark, tmp_base):
    store, h = _mk(spark, tmp_base)
    v0 = store.latest_version()
    h.delete_where(F.col("k") >= 10, version="bad")
    v_bad = store.latest_version()
    assert store.latest().df.count() == 10
    v_new = store.rollback(v0)
    assert v_new == v_bad + 1
    assert store.latest().df.count() == 20
    # rolled-back version remains readable (history preserved)
    assert store.at_version(v_bad).df.count() == 10
    # the restore commit carries files by reference: no new data dir contents
    row = store._version_row(v_new)
    assert row["files"] == store._version_row(v0)["files"]


def test_diff_across_rollback_reports_undone_rows(spark, tmp_base):
    store, h = _mk(spark, tmp_base, sub="r2")
    v0 = store.latest_version()
    h.delete_where(F.col("k") < 5, version="bad")
    v_bad = store.latest_version()
    store.rollback(v0)
    undone = store.diff(v_bad, store.latest_version()).collect()
    assert sorted((r.k, r.change) for r in undone) == [(i, "insert") for i in range(5)]


def test_mutations_continue_after_rollback(spark, tmp_base):
    store, h = _mk(spark, tmp_base, sub="r3")
    v0 = store.latest_version()
    h.delete_where(F.col("k") >= 0, version="nuke")
    store.rollback(v0)
    h2 = store.latest().upsert_partial([{"k": 100, "v": 1.5}], version="after")
    assert h2.df.count() == 21


def test_clone_reads_same_data_and_evolves_independently(spark, tmp_base):
    store, h = _mk(spark, tmp_base, sub="c1")
    clone = store.clone_to(tmp_base + "/c1_clone")
    assert clone.df.count() == 20
    assert sorted(r.k for r in clone.df.select("k").collect()) == list(range(20))
    # mutate the clone: the source must not change
    cstore = SnapshotStore(spark, tmp_base + "/c1_clone")
    cstore.latest().upsert_partial([{"k": 999, "v": 9.0}], version="cl")
    assert cstore.latest().df.count() == 21
    assert store.latest().df.count() == 20
    # and vice versa
    store.latest().upsert_partial([{"k": 555, "v": 5.0}], version="src")
    assert store.latest().df.count() == 21
    assert cstore.latest().df.count() == 21
    assert {r.k for r in cstore.latest().df.select("k").collect()} != {
        r.k for r in store.latest().df.select("k").collect()
    }


def test_clone_of_specific_version(spark, tmp_base):
    store, h = _mk(spark, tmp_base, sub="c2")
    v0 = store.latest_version()
    h.delete_where(F.col("k") >= 10, version="trim")
    clone = store.clone_to(tmp_base + "/c2_clone", version=v0)
    assert clone.df.count() == 20  # the pre-trim state


def test_versions_df_describes_history(spark, tmp_base):
    store, h = _mk(spark, tmp_base, sub="vh")
    h2 = h.upsert_partial([{"k": 100, "v": 1.0}], version="w1")
    h2.delete_where(F.col("k") < 5)
    rows = {r.version: r for r in store.versions_df().collect()}
    assert rows[0].n_rows == 20 and rows[1].n_rows == 21 and rows[2].n_rows == 16
    assert rows[1].writer_version == "w1" and rows[0].writer_version is None
    assert all(r.n_files >= 1 for r in rows.values())
