"""Property tests for ShardedIndex routing/pruning — pure driver-side
logic, no Spark session. The soundness contract: pruning may only skip a
shard when NO key it owns can satisfy the predicate; the owner of any key
must always survive pruning for predicates that key satisfies. Mirrors the
reference's randomized comparator-driven query testing
(QueriesRandomSpec.scala:265-508) at the catalog level."""

from hypothesis import given, settings
from hypothesis import strategies as st

from index_spark.sharded import ShardedIndex

router = ShardedIndex(None, "/nonexistent")  # _owner/_prune never touch disk


def _mk_shards(boundaries):
    shards = [
        {"id": i, "path": f"s{i}", "version": 0, "upper": list(b)}
        for i, b in enumerate(boundaries)
    ]
    shards.append({"id": len(shards), "path": "last", "version": 0, "upper": None})
    return shards


def _owner_of(shards, kt):
    return ShardedIndex._owner(shards, kt)["id"]


keys2 = st.tuples(st.integers(-50, 50), st.integers(-50, 50))


@given(
    bounds=st.lists(keys2, min_size=0, max_size=6, unique=True),
    keys=st.lists(keys2, min_size=1, max_size=30),
    term=keys2,
    term_len=st.integers(1, 2),
    inclusive=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_gt_prune_never_drops_matching_keys(bounds, keys, term, term_len, inclusive):
    shards = _mk_shards(sorted(bounds))
    t = term[:term_len]
    cand = {s["id"] for s in router._prune(shards, gt_term=t)}
    for k in keys:
        satisfies = k[:term_len] >= t if inclusive else k[:term_len] > t
        if satisfies:
            assert _owner_of(shards, k) in cand


@given(
    bounds=st.lists(keys2, min_size=0, max_size=6, unique=True),
    keys=st.lists(keys2, min_size=1, max_size=30),
    term=keys2,
    term_len=st.integers(1, 2),
    inclusive=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_lt_prune_never_drops_matching_keys(bounds, keys, term, term_len, inclusive):
    shards = _mk_shards(sorted(bounds))
    t = term[:term_len]
    cand = {s["id"] for s in router._prune(shards, lt_term=t)}
    for k in keys:
        satisfies = k[:term_len] <= t if inclusive else k[:term_len] < t
        if satisfies:
            assert _owner_of(shards, k) in cand


@given(
    bounds=st.lists(keys2, min_size=0, max_size=6, unique=True),
    keys=st.lists(keys2, min_size=1, max_size=30),
    lo=keys2,
    hi=keys2,
)
@settings(max_examples=300, deadline=None)
def test_range_prune_never_drops_matching_keys(bounds, keys, lo, hi):
    if hi < lo:
        lo, hi = hi, lo
    shards = _mk_shards(sorted(bounds))
    cand = {s["id"] for s in router._prune(shards, gt_term=lo, lt_term=hi)}
    for k in keys:
        if lo <= k <= hi:
            assert _owner_of(shards, k) in cand


@given(
    bounds=st.lists(keys2, min_size=0, max_size=6, unique=True),
    key=keys2,
)
@settings(max_examples=300, deadline=None)
def test_owner_is_unique_and_covers_keyspace(bounds, key):
    """Every key has exactly one owning shard under the interval scheme
    upper[i-1] < k <= upper[i] (last = +inf)."""
    shards = _mk_shards(sorted(bounds))
    owner = _owner_of(shards, key)
    owning = []
    lower = None
    for s in shards:
        upper = tuple(s["upper"]) if s["upper"] is not None else None
        lo_ok = lower is None or key > lower
        hi_ok = upper is None or key <= upper
        if lo_ok and hi_ok:
            owning.append(s["id"])
        lower = upper
    assert owning == [owner]
