"""Round-11 optimization regression tests.

Pins the two internals the optimization round changed:

- ``_bitlen_53`` (HLL rho): the branchless binary search must agree with
  the old interpreted array-filter form on every boundary value — a drift
  of one anywhere would silently move registers and hash-fail every HLL
  oracle.
- ``VersionedIndex._key_cardinality``: the fused dup-gate + layout-count
  aggregation must report the exact (total rows, max per key), and the
  create() birth gate must still raise ``DuplicatedKeysError`` with the
  key payload.
"""

import pytest
from pyspark.sql import functions as F

from index_spark.errors import DuplicatedKeysError
from index_spark.operators.sampling import _HLL_POWERS, _HLL_WBITS, _bitlen_53
from index_spark.snapshots import VersionedIndex


def test_bitlen_53_matches_filter_form_on_boundaries(spark):
    # every power boundary ±1, the extremes, and zero
    vals = sorted(
        {0, 1, 2, (1 << 52) - 1}
        | {p for p in _HLL_POWERS}
        | {p - 1 for p in _HLL_POWERS}
        | {p + 1 for p in _HLL_POWERS}
    )
    df = spark.createDataFrame([(v,) for v in vals], "w long")
    old = F.size(F.filter(F.lit(_HLL_POWERS), lambda pw: pw <= F.col("w")))
    got = df.select(
        "w", _bitlen_53(F.col("w")).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], f"bitlen drift at w={r['w']}"
        assert r["new"] == max(0, int(r["w"]).bit_length()), f"w={r['w']}"
    assert _HLL_WBITS == 52  # the ladder the search is built over


def test_key_cardinality_counts_and_dup_flag(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d"), (2, "e")], "k long, v string"
    )
    n, mx = VersionedIndex._key_cardinality(df, ["k"])
    assert (n, mx) == (5, 3)
    uniq = df.dropDuplicates(["k"])
    n2, mx2 = VersionedIndex._key_cardinality(uniq, ["k"])
    assert (n2, mx2) == (3, 1)
    # empty input: (0, 0), no crash
    n3, mx3 = VersionedIndex._key_cardinality(df.filter("k < 0"), ["k"])
    assert (n3, mx3) == (0, 0)


def test_create_birth_dup_gate_still_raises_with_payload(spark, tmp_path):
    from index_spark.snapshots import SnapshotStore

    df = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    store = SnapshotStore(spark, str(tmp_path / "idx"))
    with pytest.raises(DuplicatedKeysError) as ei:
        store.create(["k"], df=df)
    assert (1,) in ei.value.details
    # the failed gate must not have poisoned the path (manifest unwritten)
    assert not store.exists()


def test_sharded_create_dup_gate_still_raises(spark, tmp_path):
    from index_spark.sharded import ShardedIndex

    df = spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 3.0)], "k long, v double")
    with pytest.raises(DuplicatedKeysError):
        ShardedIndex.create(spark, str(tmp_path / "sh"), ["k"], df, n_shards=2)
