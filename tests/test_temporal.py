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
    survive and remain readable. Upserts rewrite the (single) touched file
    per version, so intermediate versions' files become unreferenced and
    vacuum physically deletes them."""
    import os

    import pytest as _pytest

    from index_spark.errors import IndexNotFoundError
    from index_spark.snapshots import SnapshotStore, TemporalIndex

    store = SnapshotStore(spark, tmp_base + "/vac")
    idx = store.create(
        ["k"],
        df=spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k int, v string"),
    )
    ti = TemporalIndex(store)
    pinned_ts = ti.snapshot()  # pins version 0
    for i in range(1, 5):
        idx = store.latest().insert([{"k": 0, "v": f"rewrite{i}"}], upsert=True)
    assert store.latest_version() == 4
    # capture the doomed version's REAL data dir before vacuum prunes its
    # manifest row (uuid-suffixed data_path, not the legacy _version_path)
    v2_dir = store._version_dir(store._version_row(2))
    assert os.path.exists(v2_dir)

    removed = store.vacuum(keep_last=1)
    assert sorted(removed) == [1, 2, 3]  # v0 pinned by history, v4 latest
    assert store.latest().count() == 5
    assert ti.find_index(pinned_ts).count() == 5
    assert not os.path.exists(v2_dir)  # physical deletion actually happened
    with _pytest.raises(IndexNotFoundError):
        store.n_rows(2)


def test_vacuum_retains_files_carried_by_kept_versions(spark, tmp_base):
    """File-level COW: new-key inserts carry untouched files by reference,
    so a kept version may point into a dropped version's directory. Vacuum
    must delete only unreferenced FILES — the manifest row for a dropped
    version disappears, but its carried files survive and the latest
    version still reads completely."""
    import pytest as _pytest

    from index_spark.errors import IndexNotFoundError
    from index_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, tmp_base + "/vac_carry")
    idx = store.create(["k"], df=spark.createDataFrame([(0, "v0")], "k int, v string"))
    for i in range(1, 5):  # each insert lands in a new file, carries the rest
        idx = store.latest().insert([{"k": i * 10, "v": f"v{i}"}])
    latest_files = {f["path"] for f in store._version_row(4)["files"]}
    assert len(latest_files) == 5  # one carried file per prior version

    removed = store.vacuum(keep_last=1)
    assert sorted(removed) == [0, 1, 2, 3]
    assert store.latest().count() == 5  # carried files all survived
    assert sorted(r.k for r in store.latest().df.collect()) == [0, 10, 20, 30, 40]
    with _pytest.raises(IndexNotFoundError):
        store.n_rows(1)


def test_temporal_missing_store_raises_specific_error(spark, tmp_base):
    """Addressing the temporal surface of an index that does not exist
    raises TEMPORAL_INDEX_NOT_FOUND (Errors.scala), not the generic
    INDEX_NOT_FOUND."""
    from index_spark.errors import TemporalIndexNotFoundError

    ti = TemporalIndex(SnapshotStore(spark, tmp_base + "/absent"))
    for call in (lambda: ti.find(0), lambda: ti.find_index(0), lambda: ti.snapshot(), lambda: ti.latest()):
        with pytest.raises(TemporalIndexNotFoundError):
            call()


def test_vacuum_prunes_stamped_manifests(spark, tmp_base):
    """A long mutation history leaves one immutable stamped manifest per
    commit; vacuum must bound that tail while the latest stamp (what every
    reader resolves) survives and the data stays intact."""
    import glob

    from index_spark import catalog as catalog_io

    store = SnapshotStore(spark, tmp_base + "/pidx")
    idx = store.create(["key"])
    for i in range(6):
        idx = store.latest().insert([{"key": f"k{i}", "value": str(i)}], version=f"v{i}")
    before = len(glob.glob(tmp_base + "/pidx/_manifest.v*.json"))
    assert before >= 7  # create + 6 commits
    store.vacuum(keep_last=1)
    after = glob.glob(tmp_base + "/pidx/_manifest.v*.json")
    # bounded tail, newest stamp kept, store still fully readable
    assert len(after) <= 16
    assert len(scan(store.latest())) == 6
    # explicit aggressive prune keeps only the newest
    catalog_io.prune(tmp_base + "/pidx", "_manifest", keep_latest=1)
    assert len(glob.glob(tmp_base + "/pidx/_manifest.v*.json")) == 1
    assert len(scan(store.latest())) == 6
