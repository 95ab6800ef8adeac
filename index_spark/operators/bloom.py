"""Deterministic Bloom-filter semi-join pruning.

The scale problem: a semi-join ``big ⋉ small`` still shuffles the big
side on the join key (or, broadcast, ships the full key set). A Bloom
filter replaces that with an O(m)-bit broadcast and a NARROW filter on
the big side — no shuffle of the probe table at all — at the cost of a
bounded false-positive rate. This is the same idea behind Spark's own
runtime row-group/bloom pushdown (``spark.sql.optimizer.runtime
.bloomFilter.enabled``); this module implements it explicitly so the
filter is *deterministic* and replayable in the SQL oracle (Spark's
built-in ``bloom_filter_agg`` uses an engine-private hash, which a
DuckDB twin could never reproduce bit-for-bit). The built bitset (m/64
longs — the FILTER, never key rows) is pulled to the driver and inlined
as a literal, exactly like Spark's own runtime-filter scalar subquery,
so the probe side is a pure whole-stage-codegen Filter over the scan.

Construction (classic double hashing, Kirsch & Mitzenmacher 2006): for a
key's string form, ``h1 = md5-prefix-28bit(key)``, ``h2 = md5-prefix
(key ∥ '#') | 1`` (forced odd so it is a generator mod the power-of-two
``m``), and the i-th probe position is ``(h1 + i·h2) mod m``. The bitset
is packed into ``m/64`` longs, built distributively (``groupBy(word).agg
(bit_or(mask))`` — each 64-bit word reduced map-side); no key list ever
reaches the driver, only the packed words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOOM_K = 3  # probes per key


def _h(key: Column, salt: str = "") -> Column:
    src = F.concat(key.cast("string"), F.lit(salt)) if salt else key.cast("string")
    return F.conv(F.substring(F.md5(src), 1, 7), 16, 10).cast("long")


def probe_positions(key: Column, m: int, k: int = BLOOM_K) -> Column:
    """Array of the ``k`` Bloom probe positions for ``key`` (each in
    ``[0, m)``). ``m`` must be a power of two (odd ``h2`` is then
    coprime with it, so the k probes never degenerate)."""
    assert m & (m - 1) == 0, "m must be a power of two"
    h1, h2 = _h(key), _h(key, "#").bitwiseOR(F.lit(1))
    return F.array(*[((h1 + F.lit(i) * h2) % m).alias(f"p{i}") for i in range(k)])


def build_bloom(df: DataFrame, key_col: str, m: int = 1 << 16, k: int = BLOOM_K) -> DataFrame:
    """One-row DataFrame ``(bits: array<long>)`` — the packed Bloom bitset
    over ``df``'s keys, ``m/64`` words. Dense (zero-filled) so the probe
    side can test membership with one O(1) ``element_at``."""
    # NULL keys can never match a semi-join probe; hashing them would
    # propagate a NULL word index into map_from_entries ("Cannot use null
    # as map key") and kill the build
    pos = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(probe_positions(F.col(key_col), m, k)).alias("pos")
    ).select(
        F.shiftright("pos", 6).alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
    )
    words = pos.groupBy("w").agg(F.bit_or("mask").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m // 64 - 1)),
            lambda i: F.coalesce(F.element_at("__m", i), F.lit(0).cast("long")),
        ).alias("bits")
    )


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 1 << 16,
    k: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``probe`` whose key passes the Bloom filter built over
    ``build``'s keys. May keep false positives (bounded by
    (set_bits/m)^k); never drops a true match — callers either tolerate
    the FP rate (pre-filter before an exact join) or verify downstream.

    The m/64-long bitset is collected to the driver and inlined as a
    LITERAL array — the same shape as Spark's own runtime bloom/scalar
    subquery pushdown. Collecting it is O(m) bits (the filter itself,
    never key rows), and it keeps the probe side a pure Filter over the
    scan inside whole-stage codegen. An earlier version cross-joined the
    one-row bitset instead; the BroadcastNestedLoopJoin it planned
    disabled whole-stage codegen for the probe stage, running the md5
    member test interpreted — ~8× slower on a 150k-row probe."""
    words = build_bloom(build.select(build_key), build_key, m, k).collect()[0]["bits"]
    bits = F.array(*[F.lit(int(w)).cast("long") for w in words])
    # stage h1/h2 as columns ONCE: referencing the positions array per
    # probe would re-inline its md5 subtree at every use (k terms × 2
    # uses ≈ 6k md5 evals/row without CSE — measured 5× slower)
    staged = probe.withColumns(
        {
            "__bh1": _h(F.col(probe_key)),
            "__bh2": _h(F.col(probe_key), "#").bitwiseOR(F.lit(1)),
        }
    )
    member = None
    for i in range(k):
        p = (F.col("__bh1") + F.lit(i) * F.col("__bh2")) % m
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        t = (
            F.element_at(bits, F.shiftright(p, 6).cast("int") + 1).bitwiseAND(mask)
            != 0
        )
        member = t if member is None else member & t
    return staged.where(member).drop("__bh1", "__bh2")
