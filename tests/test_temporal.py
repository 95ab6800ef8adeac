"""Time-travel semantics: replay every historical snapshot exactly
(TemporalIndexSpec.scala:223-233 analog)."""

import pytest

from index_spark.commands import Insert
from index_spark.snapshots import SnapshotStore, TemporalIndex


def scan(vidx):
    return [(r.key, r.value) for r in vidx.in_order().select("key", "value").collect()]


@pytest.fixture()
def temporal(spark, tmp_base):
    store = SnapshotStore(spark, tmp_base + "/tidx")
    store.create(["key"])
    return TemporalIndex(store)


def test_replay_all_snapshots(temporal):
    expected_states = []  # (ts, sorted kv state)
    state = {}
    for i in range(5):
        batch = [{"key": f"k{i}-{j}", "value": f"v{i}"} for j in range(3)]
        temporal.execute([Insert(batch)], version=f"b{i}")
        for r in batch:
            state[r["key"]] = r["value"]
        ts = temporal.snapshot()
        expected_states.append((ts, sorted(state.items())))

    # as-of at each recorded ts replays the exact state
    for ts, expect in expected_states:
        vidx = temporal.find_index(ts)
        assert scan(vidx) == expect

    # as-of between two snapshots resolves to the earlier one
    t0, t1 = expected_states[0][0], expected_states[1][0]
    mid = (t0 + t1) // 2
    assert mid > t0
    assert scan(temporal.find_index(mid)) == expected_states[0][1]

    # before the first snapshot → None
    assert temporal.find_index(expected_states[0][0] - 10) is None

    # far future → latest
    assert scan(temporal.find_index(expected_states[-1][0] + 10**12)) == expected_states[-1][1]


def test_latest_vs_snapshot_isolation(temporal):
    temporal.execute([Insert([{"key": "a", "value": "1"}])])
    ts = temporal.snapshot()
    temporal.execute([Insert([{"key": "b", "value": "2"}])])
    # history pin still sees only "a"; latest sees both
    assert scan(temporal.find_index(ts)) == [("a", "1")]
    assert scan(temporal.latest()) == [("a", "1"), ("b", "2")]


def test_vacuum_keeps_pinned_and_latest(spark, tmp_base):
    """GC drops unpinned snapshot versions; history-pinned and latest
    survive and remain readable."""
    import os

    import pytest as _pytest

    from index_spark.errors import IndexNotFoundError
    from index_spark.snapshots import SnapshotStore, TemporalIndex

    store = SnapshotStore(spark, tmp_base + "/vac")
    idx = store.create(["k"], df=spark.createDataFrame([(0, "v0")], "k int, v string"))
    ti = TemporalIndex(store)
    pinned_ts = ti.snapshot()  # pins version 0
    for i in range(1, 5):
        idx = store.latest().insert([{"k": i, "v": f"v{i}"}])
    assert store.latest_version() == 4

    removed = store.vacuum(keep_last=1)
    assert sorted(removed) == [1, 2, 3]  # v0 pinned by history, v4 latest
    assert store.latest().count() == 5
    assert ti.find_index(pinned_ts).count() == 1
    assert not os.path.exists(store._version_path(2))
    with _pytest.raises(IndexNotFoundError):
        store.n_rows(2)
