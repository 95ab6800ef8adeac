"""Persistent index split/merge + capacity predicates — the PySpark twin of
the reference's SplitAndMergeIndexSpec (fill to capacity → split → two
independent indexes whose union is the whole, original untouched → merge
back == whole, right survives the merge)."""

from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore

N = 400


def _keys(vidx):
    return [r.k for r in vidx.in_order().select("k").collect()]


def test_split_merge_capacity_roundtrip(spark, tmp_base):
    rows = [(i, f"v{i}") for i in range(N)]
    df = spark.createDataFrame(rows, "k int, v string")
    store = SnapshotStore(spark, tmp_base + "/whole")
    whole = store.create(["k"], df=df, rows_per_partition=100, max_n_items=N)

    assert whole.count() == N
    assert whole.is_full()
    assert whole.has_minimum() and whole.has_enough()

    left, right = whole.split_into(tmp_base + "/left", tmp_base + "/right")

    lk, rk = _keys(left), _keys(right)
    assert lk and rk
    assert max(lk) < min(rk)  # key-disjoint, ordered halves
    assert lk + rk == list(range(N))  # union == whole, in order
    assert not left.is_full() and not right.is_full()
    # both halves ~half capacity → hasMinimum boundary behavior
    assert left.has_minimum() or right.has_minimum()

    # original untouched (reference: source index survives the split)
    assert _keys(store.latest()) == list(range(N))

    merged = left.merge_from(right, tmp_base + "/merged")
    assert _keys(merged) == list(range(N))
    assert merged.is_full()

    # right survives the merge unchanged (reference SplitAndMergeIndexSpec)
    assert _keys(SnapshotStore(spark, tmp_base + "/right").latest()) == rk

    # merging beyond capacity refuses (maxNItems gate)
    try:
        merged.merge_from(right, tmp_base + "/overflow")
        raise AssertionError("expected capacity refusal")
    except ValueError:
        pass


def test_tuple_versions_survive_split(spark, tmp_base):
    df = spark.createDataFrame([(i, "x") for i in range(50)], "k int, v string")
    store = SnapshotStore(spark, tmp_base + "/w2")
    whole = store.create(["k"], df=df, rows_per_partition=100)
    h2 = whole.update([{"k": 7, "v": "y"}], version="tx-update")
    left, right = h2.split_into(tmp_base + "/l2", tmp_base + "/r2")
    side = left if 7 in _keys(left) else right
    row = side.get(7).select("v", "__version").first()
    assert row.v == "y" and row["__version"] == "tx-update"
