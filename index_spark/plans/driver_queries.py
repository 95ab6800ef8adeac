"""Driver-facing query catalog + DuckDB oracle twins.

Every entry exercises one operator from SURVEY.md §2 (reference surface) or
one training-data pipeline operator, over the driver fixtures. Design rules
that keep the value-hash gate deterministic across Spark and DuckDB:

- **money aggregates** use the integer-cents trick: the fixtures carry
  2-decimal money, so ``CAST(round(x*100) AS BIGINT)`` is exact and integer
  sums are order-independent — no floating accumulation anywhere.
- **float scores** (cosine, jaccard, ratios) are computed as *sequential*
  left-to-right double folds in both engines (Spark ``F.aggregate`` /
  DuckDB ``list_sum(list_transform(...))``), then ``round(·, 6)``.
- **hashes**: minhash = one md5 per shingle (7-hex-char prefix → int) +
  universal linear permutations mod a >2^32 prime — every step has the
  identical expression in both engines ('0x…'::BIGINT ↔ F.conv), so the
  whole MinHash+LSH pipeline replays exactly in SQL.
- **timestamps** compare as BIGINT epoch-µs (``ts_us`` column ↔ DuckDB
  ``epoch_us(ts)``); dates as DATE.
- **top-k** always carries a deterministic tie-break key.

Spark callables take (spark, sf_dir) and return a DataFrame; they use the
engine's own operator implementations (SortedIndex, VersionedIndex, datoms,
dedup, similarity, asof) so the gate checks the real code paths.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from index_spark.datoms import DatomStore, datoms_from_table
from index_spark.functions import text as TX
from index_spark.functions.vectors import cosine
from index_spark.index import SortedIndex
from index_spark.operators import dedup as DD
from index_spark.operators import ranking as RANK
from index_spark.operators.asof import asof_join
from index_spark.sources import load_table

# ---------------------------------------------------------------- constants
T_ASOF_US = 1_704_800_000_000_000  # 2024-01-09T09:33:20Z, inside the events range
MINHASH_N, MINHASH_BANDS = 16, 8
HIGH_HEX = ["8", "9", "a", "b", "c", "d", "e", "f"]
LANGS = sorted(TX.LANG_MARKERS)  # de en es fr it nl pt

# training-mixture weights for the mix_corpus query — ONE constant feeds
# both the Spark call and the generated SQL twin
_MIX_WEIGHTS = {f"src{i}": (i % 5) + 1 for i in range(20)}
_MIX_TARGET = 300

# cents helpers (exact integer money)
def _cents(c):
    return F.round(c * 100).cast("long")


def _sum_cents(c, alias):
    return (F.sum(_cents(c)).cast("double") / 100).alias(alias)


SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
SQL_TOKS_LOWER = "regexp_extract_all(lower(text), '\\S+')"


_SQL_BPE_PAT = TX.BPE_PAT.replace("'", "''")  # SQL string-literal escaping
_SQL_NTOK = ("len(regexp_extract_all(text, '\\S+'))", "n")


def _sql_cents(col: str) -> str:
    return f"CAST(round({col}*100) AS BIGINT)"


def _sql_sum_cents(col: str, alias: str) -> str:
    return f"CAST(sum({_sql_cents(col)}) AS DOUBLE)/100 AS {alias}"


# =========================================================================
# Spark query callables
# =========================================================================

def _orders_idx(spark, sf_dir):
    return SortedIndex(load_table(spark, sf_dir, "orders"), ["o_orderkey"])


def _li_idx(spark, sf_dir):
    return SortedIndex(load_table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"])


# ---- §2.1 point reads ----------------------------------------------------
def q_point_get(spark, sf_dir):
    return _orders_idx(spark, sf_dir).get(1000).select("o_orderkey", "o_custkey", "o_totalprice")


def q_multi_get(spark, sf_dir):
    keys = [3, 141, 592, 653, 589, 793, 238, 462]
    return _orders_idx(spark, sf_dir).get_all(keys).select("o_orderkey", "o_totalprice")


def q_get_all_missing(spark, sf_dir):
    """mustFindAll's KEY_NOT_FOUND check. Scale shape: the (tiny, literal)
    request set compiles to a parquet-pushed ``In`` filter on the big scan
    — the request reaches the row-group stats, so non-matching files are
    never opened. The found set (≤ request size) then anti-joins back as a
    broadcast. For a non-literal request DataFrame the same shape holds
    with a broadcast-semi join instead of ``isin`` (see
    ``SortedIndex.get_all``); never ``req.join(orders, anti)``, which
    would build a broadcast of every orders key."""
    orders = load_table(spark, sf_dir, "orders")
    req_keys = [10, 20, 999999999]
    req = spark.createDataFrame([(k,) for k in req_keys], "requested_key long")
    found = (
        orders.select(F.col("o_orderkey").alias("requested_key"))
        .filter(F.col("o_orderkey").isin(req_keys))
        .distinct()
    )
    return req.join(F.broadcast(found), "requested_key", "left_anti")


# ---- §2.3 scans / seeks --------------------------------------------------
def q_range_scan(spark, sf_dir):
    return (
        _orders_idx(spark, sf_dir)
        .range(100, 200, from_inclusive=False, to_inclusive=True)
        .select("o_orderkey", "o_totalprice")
    )


def q_gt_scan(spark, sf_dir):
    return _orders_idx(spark, sf_dir).gt(14900).select("o_orderkey", "o_orderstatus")


def q_lt_scan_reverse(spark, sf_dir):
    return (
        _orders_idx(spark, sf_dir)
        .lt(50, inclusive=False, reverse=True)
        .select("o_orderkey", "o_totalprice")
    )


def q_prefix_scan(spark, sf_dir):
    return _li_idx(spark, sf_dir).prefix(42).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def q_prefix_bounded_gt(spark, sf_dir):
    return (
        _li_idx(spark, sf_dir)
        .gt((42, 2), prefix=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


def q_composite_range(spark, sf_dir):
    return (
        _li_idx(spark, sf_dir)
        .range((100, 2), (105, 3), from_inclusive=True, to_inclusive=False)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


def q_top_k(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_next_key(spark, sf_dir):
    return _orders_idx(spark, sf_dir).next_key(777).select("o_orderkey")


def q_previous_key(spark, sf_dir):
    return _orders_idx(spark, sf_dir).previous_key(777).select("o_orderkey")


def q_min_max_count(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count(F.lit(1)).alias("n"),
    )


def q_binary_key_range(spark, sf_dir):
    """Opaque-bytes keys — the reference's canonical key type (``Bytes =
    Array[Byte]`` with unsigned-lex ordering, ``package.scala:39-42``):
    key the documents by their 16-byte md5 digest (BINARY) and range-scan
    [x'20', x'28') over the digest keyspace. Spark BinaryType comparison is
    unsigned-lexicographic (property-tested in test_binary_keys against
    Python ``bytes`` ordering); DuckDB BLOB comparison agrees, so the
    oracle is a plain BLOB range predicate."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(F.unhex(F.md5("text")).alias("k"), "doc_id")
    idx = SortedIndex(keyed, ["k"])
    out = idx.range(bytes.fromhex("20"), bytes.fromhex("28"), from_inclusive=True, to_inclusive=False)
    return out.select(F.hex("k").alias("k_hex"), "doc_id")


def q_multi_get_large(spark, sf_dir):
    """Large multi-get — the reference's per-leaf request batching
    (Index.scala:820-867) at file scale: a 12k-key request exceeds
    GET_ALL_BROADCAST_LIMIT, so get_all switches from an In() predicate to
    a distributed shuffle semi-join (request-as-data). Aggregated so the
    result stays small; the oracle is the equivalent key-range semi-join."""
    orders = load_table(spark, sf_dir, "orders")
    idx = SortedIndex(orders, ["o_orderkey"])
    out = idx.get_all(list(range(1, 12_001)))
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        _sum_cents(F.col("o_totalprice"), "total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def q_error_codes(spark, sf_dir):
    """The reference error taxonomy (Errors.scala:3-42 / SURVEY §2.7)
    exercised END-TO-END, one probe per engine-visible error, with the
    stable code strings returned as data — which makes the taxonomy
    driver-hash-verifiable (exceptions themselves can't be hash-compared).
    Also covers COMMIT_CONFLICT, this port's descriptor-CAS loser."""
    from index_spark.errors import (
        CommitConflictError,
        ContextUsedError,
        DuplicatedKeysError,
        IndexAlreadyExistsError,
        IndexNotFoundError,
        KeyNotFoundError,
        TemporalIndexNotFoundError,
        VersionChangedError,
    )
    from index_spark.snapshots import SnapshotStore, TemporalIndex

    rows: list[tuple[str, str]] = []

    def probe(name, fn, exc):
        try:
            fn()
            rows.append((name, "NO_ERROR"))
        except exc as e:
            rows.append((name, e.code))

    d = tempfile.mkdtemp(prefix="errq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        probe("latest_before_create", lambda: store.latest(), IndexNotFoundError)
        store.create(["k"]).insert([{"k": 1, "v": "a"}])
        probe(
            "create_twice",
            lambda: SnapshotStore(spark, d + "/idx").create(["k"]),
            IndexAlreadyExistsError,
        )
        probe(
            "dup_keys_in_batch",
            lambda: store.latest().insert([{"k": 2, "v": "x"}, {"k": 2, "v": "y"}]),
            DuplicatedKeysError,
        )
        probe(
            "update_missing_key",
            lambda: store.latest().update([{"k": 99, "v": "z"}]),
            KeyNotFoundError,
        )
        probe(
            "stale_expected_version",
            lambda: store.latest().update(
                [{"k": 1, "v": "z", "__expected_version": "stale"}]
            ),
            VersionChangedError,
        )
        h = store.latest()
        h.insert([{"k": 3, "v": "c"}])
        probe("reused_write_handle", lambda: h.insert([{"k": 4, "v": "d"}]), ContextUsedError)
        w1 = SnapshotStore(spark, d + "/idx").latest()
        w2 = SnapshotStore(spark, d + "/idx").latest()
        w1.insert([{"k": 5, "v": "e"}])
        probe("commit_race_loser", lambda: w2.insert([{"k": 6, "v": "f"}]), CommitConflictError)
        probe(
            "temporal_missing",
            lambda: TemporalIndex(SnapshotStore(spark, d + "/nope")).find(0),
            TemporalIndexNotFoundError,
        )
        return spark.createDataFrame(rows, "probe string, code string")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_compact_files(spark, sf_dir):
    """Compaction (the OPTIMIZE step file-level COW needs at scale): five
    single-key partial upserts leave five tiny files behind; compact()
    bin-packs them and carries full files by reference. The oracle verifies
    the data is untouched; the file-count invariant rides along as a
    boolean column."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="cmpq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=1000)
        # three brand-new keys below every file's range: each partial commit
        # carries all existing files and writes one tiny new file — the
        # small-file debt compaction exists to pay down
        for i in range(3):
            h = store.latest().upsert_partial(
                [{"o_orderkey": -(i + 1), "o_totalprice": 1.0 + i}], version=f"u{i}"
            )
        files_before = len(store._version_row(store.latest_version())["files"])
        compacted = store.latest().compact(target_rows=1000)
        files_after = len(store._version_row(compacted.version)["files"])
        out = compacted.df.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.lit(files_after < files_before).alias("files_shrank"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_seek_pagination(spark, sf_dir):
    """Seek-paginated scan (the reference's async-iterator protocol,
    RichAsyncIndexIterator.scala:13-41): each page is gt(last_key,
    limit=n) — an indexed top-k continuation whose pushed bound prunes
    everything already read, vs OFFSET's read-and-discard. Pages are
    re-assembled with their page number; the oracle reproduces the
    assignment with a rank window."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 600)
    idx = SortedIndex(orders.select("o_orderkey", "o_totalprice"), ["o_orderkey"])
    out = []
    for pno, rows in enumerate(idx.pages(50), start=1):
        out += [{"page": pno, "o_orderkey": r.o_orderkey} for r in rows]
    return spark.createDataFrame(out, "page int, o_orderkey long")


def q_seek_pagination_df(spark, sf_dir):
    """Distributed pagination (``pages_df``): each page stays a DataFrame
    — here every page is aggregated (n, cents total, last key) ENGINE-side
    and only the per-page aggregate rows are unioned, so page row data
    never crosses the driver (contrast ``seek_pagination``, the collected
    row-list protocol). The oracle reproduces the page assignment with a
    rank window."""
    from functools import reduce

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 600)
    idx = SortedIndex(orders.select("o_orderkey", "o_totalprice"), ["o_orderkey"])
    aggs = []
    for pno, page in enumerate(idx.pages_df(150), start=1):
        aggs.append(
            page.agg(
                F.lit(pno).alias("page"),
                F.count(F.lit(1)).alias("n"),
                _sum_cents(F.col("o_totalprice"), "total"),
                F.max("o_orderkey").alias("last_key"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), aggs)


def q_snapshot_diff(spark, sf_dir):
    """Change feed between snapshot versions (the CDF an incremental
    consumer reads instead of re-scanning): v0 = orders(key<=3000);
    tx = upsert(price bump on %211==0) + insert(-1,-2) + remove of two
    known keys; diff(v0, v1) must report exactly those keys with their
    change kinds. Writer-version comparison classifies rows — values are
    never compared. The oracle recomputes the change set from the same
    algebra."""
    from index_spark.commands import Insert, Remove
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="diffq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500_000)
        bumped = orders.filter(F.col("o_orderkey") % 211 == 0).select(
            "o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice")
        )
        fresh = spark.range(1, 3).select(
            (-F.col("id")).alias("o_orderkey"), F.lit(0.0).alias("o_totalprice")
        )
        doomed = [r.o_orderkey for r in orders.orderBy("o_orderkey").limit(2).collect()]
        h2 = h.execute(
            [
                Insert(bumped.unionByName(fresh), upsert=True),
                Remove([{"o_orderkey": k} for k in doomed]),
            ],
            version="tx-diff",
        )
        out = store.diff(0, h2.version).select("o_orderkey", "change")
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_sharded_time_travel(spark, sf_dir):
    """Logical time travel over the SHARDED index: snapshot the 2-shard
    state, run a cross-shard mutation batch, then read the range BOTH ways
    — as_of(snapshot) must show the pre-mutation state, latest the post.
    History pins whole shard lists, so the view survives later splits.
    Returned as (era, n, total) rows; the oracle recomputes both eras from
    the base algebra."""
    from index_spark.commands import Insert, Update
    from index_spark.sharded import ShardedIndex

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="sttq_")
    try:
        sh = ShardedIndex.create(
            spark, d + "/sh", ["o_orderkey"], orders, n_shards=2, rows_per_partition=500_000
        )
        t0 = sh.snapshot()
        sh.execute([
            Update([{"o_orderkey": 7, "o_totalprice": 0.0}]),
            Insert([{"o_orderkey": -5, "o_totalprice": 5.0}]),
        ])
        def era(tag, view):
            return view.range(-100, 3000).agg(
                F.lit(tag).alias("era"),
                F.count(F.lit(1)).alias("n"),
                _sum_cents(F.col("o_totalprice"), "total"),
            )
        out = era("before", sh.as_of(t0)).unionByName(era("after", sh))
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- §2.4 split / merge --------------------------------------------------
def q_split_median(spark, sf_dir):
    """Exact split boundary (lower median) WITHOUT a global single-reducer
    sort. Two-level plan: (1) range-bucket the keys and aggregate per-bucket
    counts — a tiny table (≤ keyspace/width rows) whose cumulative sum
    locates the one bucket containing the target rank; (2) rank only inside
    that bucket (``partitionBy(bucket)``, rows bounded by the bucket width).
    At 100 TB step 1 is one partial-agg shuffle of bucket counts and step 2
    sorts a single bounded bucket — nothing ever funnels the full table
    through one task, unlike ``row_number() OVER (ORDER BY ...)``. The same
    shape is how ``SortedIndex.split`` picks boundaries, here made exact so
    the DuckDB median oracle still hash-matches."""
    width = 4096
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select("o_orderkey", (F.col("o_orderkey") / width).cast("long").alias("b"))
    n = keys.count()
    target = (n + 1) // 2
    counts = keys.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hit = (
        counts.withColumn("before", F.coalesce(F.sum("c").over(wb), F.lit(0)))
        .filter((F.col("before") < target) & (F.col("before") + F.col("c") >= target))
        .select("b", "before")
    )
    win = Window.partitionBy("b").orderBy("o_orderkey")
    return (
        keys.join(F.broadcast(hit), "b")
        .select("o_orderkey", "before", F.row_number().over(win).alias("rn"))
        .filter(F.col("before") + F.col("rn") == target)
        .select(F.col("o_orderkey").alias("median_key"))
    )


def q_merge_halves(spark, sf_dir):
    idx = _orders_idx(spark, sf_dir)
    left = SortedIndex(idx.lt(7500), idx.key)
    right = SortedIndex(idx.gt(7500, inclusive=True), idx.key)
    merged = left.merge(right)
    return merged.df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        _sum_cents(F.col("o_totalprice"), "total"),
    )


def q_bucketed_join(spark, sf_dir):
    """Co-located fact-fact join: both sides written bucketBy+sortBy on the
    join key, so the sort-merge join runs with NO shuffle exchange on
    either side (plan-asserted in test_plans). The recurring-join shape at
    100 TB: pay the shuffle once at layout time, never per query."""
    import uuid as _uuid

    from index_spark.sources.tables import write_bucketed

    suf = _uuid.uuid4().hex[:8]
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    d = tempfile.mkdtemp(prefix="bjq_")
    try:
        bo = write_bucketed(o, spark, f"bq_orders_{suf}", ["o_orderkey"], 8, d + "/o")
        bl = write_bucketed(li, spark, f"bq_li_{suf}", ["o_orderkey"], 8, d + "/l")
        out = (
            bo.hint("merge")
            .join(bl, "o_orderkey")
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                _sum_cents(F.col("l_extendedprice"), "revenue"),
            )
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before cleanup
        return out
    finally:
        spark.sql(f"DROP TABLE IF EXISTS bq_orders_{suf}")
        spark.sql(f"DROP TABLE IF EXISTS bq_li_{suf}")
        shutil.rmtree(d, ignore_errors=True)


def q_sharded_range(spark, sf_dir):
    """Sharded logical index end-to-end (reference index-level sharding,
    QueryableIndex.scala:561-679): bulk-load orders into 4 range-disjoint
    shards, run a cross-shard transactional batch (update + inserts behind
    one atomic catalog swap), then a range read spanning shard boundaries.
    Routing is a driver-side catalog comparison; each shard read prunes via
    parquet min/max. The oracle replays the same algebra in SQL."""
    from index_spark.commands import Insert, Update
    from index_spark.sharded import ShardedIndex

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") < 12_000)  # bounded demo: the cost is
        # catalog machinery (shard writes + commits), not data volume
    )
    d = tempfile.mkdtemp(prefix="shq_")
    try:
        sh = ShardedIndex.create(
            spark, d + "/sh", ["o_orderkey"], orders, n_shards=4, rows_per_partition=500_000
        )
        sh.execute([
            Update([{"o_orderkey": 7, "o_totalprice": 0.0}]),
            Insert([{"o_orderkey": -1, "o_totalprice": 1.0}, {"o_orderkey": 10_000_000, "o_totalprice": 2.0}]),
        ])
        out = sh.range(-10, 2000).select(
            "o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents")
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- §2.2 mutation semantics (through the real VersionedIndex) -----------
def q_upsert_batch(spark, sf_dir):
    """End-to-end COW upsert: snapshot orders into a real store, execute an
    upsert batch (price bump on keys %97==0, five brand-new negative keys),
    read back the final state. The oracle replays the same algebra in SQL."""
    from index_spark.snapshots import SnapshotStore

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = tempfile.mkdtemp(prefix="idxq_")
    try:
        store = SnapshotStore(spark, d + "/orders_idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500_000)
        # the batch is a DataFrame end-to-end — rows never collect to the
        # driver (at 100 TB the mutation source is itself a dataset)
        bumped = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
        )
        fresh = spark.range(1, 6).select(
            (-F.col("id")).alias("o_orderkey"), F.lit(0.0).alias("o_totalprice")
        )
        h2 = h.insert(bumped.unionByName(fresh), upsert=True, version="tx2")
        out = h2.df.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderkey").alias("min_key"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_dup_key_check(spark, sf_dir):
    """DUPLICATED_KEYS validation join: keys occurring >1 in a batch."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def q_version_changed_check(spark, sf_dir):
    """Optimistic-CC conflict join: expected version 'O' vs stored status."""
    orders = load_table(spark, sf_dir, "orders")
    batch = orders.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", F.lit("O").alias("expected_version")
    )
    cur = orders.select("o_orderkey", F.col("o_orderstatus").alias("current_version"))
    return (
        batch.join(cur, "o_orderkey")
        .filter(F.col("expected_version") != F.col("current_version"))
        .select("o_orderkey", "current_version")
    )


# ---- §2.5 temporal -------------------------------------------------------
def _ts_at_most(us: int):
    """Pushdown-friendly event-time bound: compare the PHYSICAL ts column —
    Catalyst inverts the ntz→tz cast under the UTC session zone and pushes
    LessThanOrEqual(ts, …) into the parquet scan, so row groups outside the
    bound never load. A predicate on the computed ts_us reads everything."""
    return F.col("ts") <= F.timestamp_micros(F.lit(us))


def q_asof_lookup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(_ts_at_most(T_ASOF_US)).agg(F.max("ts_us").alias("as_of_ts_us"))


def q_asof_state(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    return (
        ev.filter(_ts_at_most(T_ASOF_US))
        .select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


def q_asof_join_events(spark, sf_dir):
    """Each purchase ← latest signup at-or-before it (per user)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts_us")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts_us")
    out = asof_join(purchases, signups, on=["user_id"], left_ts="ts_us", right_ts="ts_us")
    return out.select("event_id", F.col("ts_us_right").alias("signup_ts_us"))


def q_asof_join_tolerance(spark, sf_dir):
    """As-of join with a match-distance bound (pandas merge_asof
    semantics): each purchase ← latest signup at most 3 days before it;
    farther matches null out. Same one-shuffle carry plan as the unbounded
    as-of; the oracle's correlated subquery carries the same bound."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts_us")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts_us")
    out = asof_join(
        purchases, signups, on=["user_id"], left_ts="ts_us", right_ts="ts_us",
        tolerance=3 * 86_400_000_000,
    )
    return out.select("event_id", F.col("ts_us_right").alias("signup_ts_us"))


def q_window_lag(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.filter(F.col("user_id") < 20)
        .select("event_id", F.lag("ts_us").over(w).alias("prev_ts_us"))
    )


def q_events_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), _sum_cents(F.col("value"), "total"))
    )


def q_sliding_window(spark, sf_dir):
    """2-hour windows sliding by 1 hour: each event lands in exactly two
    windows. The oracle replays it as a UNION ALL of the two shifted
    hour-truncations — same bucket set, same aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _sum_cents(F.col("value"), "total"))
        .select(F.unix_micros(F.col("w.start")).alias("start_us"), "event_type", "n", "total")
    )


def q_sessionize(spark, sf_dir):
    """Session counts per user (30-minute inactivity gap)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias("new_s"),
    )
    return flagged.groupBy("user_id").agg(F.sum("new_s").cast("long").alias("n_sessions"))


# ---- datoms --------------------------------------------------------------
def _part_datoms(spark, sf_dir):
    return datoms_from_table(
        load_table(spark, sf_dir, "part"),
        entity_attr="part",
        id_col="p_partkey",
        text_attrs=["p_name", "p_brand", "p_type"],
        num_attrs=["p_size", "p_retailprice"],
    )


def q_datoms_count_by_attr(spark, sf_dir):
    return _part_datoms(spark, sf_dir).groupBy("a").agg(F.count(F.lit(1)).alias("n"))


def q_datoms_avet_lookup(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    brand = part.agg(F.min("p_brand")).first()[0]
    ds = DatomStore(_part_datoms(spark, sf_dir))
    return ds.entities_by_attr_value("part/p_brand", brand)


def q_datoms_vaet_refchase(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    target = li.agg(F.min("l_partkey")).first()[0]
    li_d = datoms_from_table(
        li.withColumn("li_id", F.monotonically_increasing_id()),
        entity_attr="lineitem",
        id_col="li_id",
        ref_attrs={"l_partkey": "part", "l_suppkey": "supplier"},
    )
    ds = DatomStore(li_d)
    return ds.referencing(f"part:{target}").groupBy("a").agg(F.count(F.lit(1)).alias("n"))


def q_datoms_eavt_entity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    target = li.agg(F.min("l_partkey")).first()[0]
    ds = DatomStore(_part_datoms(spark, sf_dir))
    return ds.entity(f"part:{target}").select("a", "v_text", "v_num")


# ---- analytics (Spark-free categories exercising the fixtures) -----------
def q_q1_pricing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
            _sum_cents(F.col("l_extendedprice"), "sum_base_price"),
            (F.sum(disc_cents).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(F.round("l_quantity").cast("long")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_q3_revenue_topk(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg((F.sum(rev_cents).cast("double") / 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_q5_nation_revenue(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
        )
        .groupBy("n_name")
        .agg((F.sum(rev_cents).cast("double") / 10000).alias("revenue"))
    )


def q_q6_filter_agg(spark, sf_dir):
    """TPC-H Q6 shape: pure pushed-filter scan + single aggregate (exact
    integer-cents revenue: (ext·100)·(disc·100)/10000)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def q_semi_join_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join (orders having a big-quantity line),
    grouped by priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45).select(F.col("l_orderkey").alias("o_orderkey"))
    return (
        orders.join(big, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_anti_join_parts(spark, sf_dir):
    """Anti-join shape (Q16 flavor): parts never ordered, counted by brand."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    ordered = li.filter(F.col("l_quantity") > 49).select(F.col("l_partkey").alias("p_partkey"))
    return (
        part.join(ordered, "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_unordered"))
    )


def q_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: left outer join + two-level aggregation (orders per
    customer → customer count per order count)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_q2_min_price_part(spark, sf_dir):
    """TPC-H Q2 shape: correlated-min subquery — the cheapest part per brand,
    joined back on the (brand, min-cents) pair; min partkey breaks price
    ties. The per-group min is a broadcast side (one row per brand)."""
    part = load_table(spark, sf_dir, "part")
    cents = _cents(F.col("p_retailprice"))
    mn = part.groupBy(F.col("p_brand").alias("b")).agg(F.min(cents).alias("min_cents"))
    return (
        part.join(F.broadcast(mn), (part.p_brand == mn.b) & (cents == F.col("min_cents")))
        .groupBy("p_brand")
        .agg(
            F.min("p_partkey").alias("p_partkey"),
            (F.min("min_cents").cast("double") / 100).alias("min_price"),
        )
    )


def q_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between distinct supplier and customer
    nations by ship year — the same small dim (nation) broadcast onto both
    sides of the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            (F.col("supp_nation") != F.col("cust_nation"))
            & (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(rev_cents).cast("double") / 10000).alias("revenue"))
    )


def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: market share — the revenue fraction supplied by one
    nation among orders from ASIA-region customers, per order year. Exact:
    both numerator and denominator are integer cent sums."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", rev_cents).otherwise(F.lit(0))).cast("double")
                / F.sum(rev_cents).cast("double")
            ).alias("mkt_share")
        )
    )


def q_q9_red_parts_revenue(spark, sf_dir):
    """TPC-H Q9 shape (adapted: fixtures carry no partsupp/supplycost):
    revenue by supplier nation and order year for one part-name family."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").contains("red"))), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(rev_cents).cast("double") / 10000).alias("revenue"))
    )


def q_q10_returned_topk(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer for one quarter,
    top 20 (deterministic tie-break on custkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(rev_cents).cast("double") / 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape: conditional counts — critical- vs low-priority order
    lines per return flag within a ship-date window."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share for one month — a conditional
    cent sum over the total cent sum (exact integers; the division is the
    only float op)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
        )
        .agg(
            (F.sum(promo).cast("double") / 10000).alias("promo_revenue"),
            (F.sum(rev_cents).cast("double") / 10000).alias("total_revenue"),
            (F.sum(promo).cast("double") / F.sum(rev_cents).cast("double")).alias("promo_share"),
        )
    )


def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: scalar-max subquery — supplier(s) achieving the
    maximum quarter revenue; the 1-row max is broadcast, not recomputed
    per row."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    revs = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_cents).alias("rc"))
    )
    mx = revs.agg(F.max("rc").alias("mx"))
    return (
        revs.join(F.broadcast(mx), revs.rc == F.col("mx"))
        .join(F.broadcast(supp), revs.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rc").cast("double") / 10000).alias("total_revenue"),
        )
    )


def q_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-subquery — orders whose summed quantity tops a
    threshold, with the customer attached."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "sum_qty", "o_totalprice")
    )


def q_q19_bracket_filter(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive brackets (brand x size x
    quantity) — the whole OR-tree is pushable/codegen-able; no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_cents = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            (F.sum(rev_cents).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_q22_idle_rich(spark, sf_dir):
    """TPC-H Q22 shape: global-scalar subquery + anti join — customers with
    above-average positive balance and no urgent orders, rolled up by
    nation. The average compare stays integer-exact (cents*n > sum_cents);
    the 1-row scalar is broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = _cents(F.col("c_acctbal"))
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sc"), F.count(F.lit(1)).alias("n")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(cents * F.col("n") > F.col("sc"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _sum_cents(F.col("c_acctbal"), "totacctbal"),
        )
    )


def q_group_topk(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.filter(F.col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_rollup_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _sum_cents(F.col("o_totalprice"), "total")
    )


def q_cube_orders(spark, sf_dir):
    """CUBE over (status, priority) — all four grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _sum_cents(F.col("o_totalprice"), "total")
    )


def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT (reference has only disjoint-union merge, §2.9):
    customers active in 1996 ∩ 1997, minus the BUILDING segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def active(year):
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit(f"{year}-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit(f"{year + 1}-01-01")))
            )
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return active(1996).intersect(active(1997)).exceptAll(building.distinct())


def q_scalar_functions(spark, sf_dir):
    """Scalar-function sampler (§2.9: the reference has no function library;
    Spark's is free): string / date / math expressions with exact twins."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.length("o_orderstatus").alias("st_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.abs(F.col("o_orderkey") - 50).cast("long").alias("dist50"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("mod7"),
        F.greatest(F.col("o_orderkey"), F.lit(42)).alias("gmax"),
        _cents(F.col("o_totalprice")).alias("price_cents"),
    )


def q_median_stats(spark, sf_dir):
    """Exact-median aggregate (interpolating, matches DuckDB's median) by
    order status — percentile-class aggregation coverage."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_array_agg(spark, sf_dir):
    """Array aggregation: per-user sorted event-type list + distinct count
    (sort_array makes collect_list deterministic for the hash gate)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 30)
        .groupBy("user_id")
        .agg(
            # joined string, not a raw array: definitely hashable by the
            # driver's value-hash gate regardless of array serialization
            F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias("types"),
            F.size(F.array_distinct(F.collect_list("event_type"))).alias("n_distinct"),
        )
    )


def q_distinct_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


# ---- dedup / text --------------------------------------------------------
def _docs_with_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(exact)


def _docs_with_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz tail marker")).alias("text"),
    )
    return docs.unionByName(near)


def q_dedup_exact_groups(spark, sf_dir):
    return DD.exact_duplicates(_docs_with_dups(spark, sf_dir))


def q_dedup_survivors(spark, sf_dir):
    return DD.exact_dedup(_docs_with_dups(spark, sf_dir)).agg(F.count(F.lit(1)).alias("n"))


def q_minhash_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    sig = DD.minhash_signature(F.col("text"), MINHASH_N)
    return docs.select("doc_id", sig.getItem(0).alias("sig0"), sig.getItem(5).alias("sig5"))


def q_minhash_lsh_pairs(spark, sf_dir):
    docs = _docs_with_near_dups(spark, sf_dir)
    verified = DD.minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=MINHASH_N, bands=MINHASH_BANDS
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Candidate-then-verify: candidates come from MinHash LSH banding
    (never all-pairs — the same band join the operator library uses at
    scale), then exact shingle-Jaccard verifies each candidate. The oracle
    replicates the banding in SQL, so both sides drop the same
    non-candidate pairs."""
    docs = _docs_with_near_dups(spark, sf_dir).filter(
        (F.col("doc_id") % 200000) < 60
    )
    out = DD.minhash_near_dup_pairs(
        docs, threshold=0.02, num_hashes=MINHASH_N, bands=MINHASH_BANDS
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_near_dedup_survivors(spark, sf_dir):
    """End-to-end near-duplicate REMOVAL (the shape a training-data pipeline
    actually runs): MinHash-LSH candidates → Jaccard ≥ 0.5 verify → drop
    the larger id of each confirmed pair → aggregate the survivors. One
    persisted (shingles, signature) projection feeds candidates and
    verification; text itself is never shuffled."""
    docs = _docs_with_near_dups(spark, sf_dir)
    kept = DD.minhash_dedup(docs, threshold=0.5, num_hashes=MINHASH_N, bands=MINHASH_BANDS)
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
        F.max("doc_id").alias("max_id"),
    )


def q_simhash_block_pairs(spark, sf_dir):
    """Manku-style SimHash blocking end-to-end: 16-bit signature split into
    two 8-bit blocks; candidates agree on ≥1 block (near signatures must —
    pigeonhole); verified by Hamming ≤ 3. The join exchanges only
    (id, block, value); never all-pairs."""
    docs = _docs_with_near_dups(spark, sf_dir).filter((F.col("doc_id") % 200000) < 80)
    toks = TX.tokens(F.lower(F.col("text")))
    n = F.size(toks)

    def bit_hits(j: int):
        # unary lambda only — F.filter treats a two-arg lambda as
        # (element, index), silently replacing j with the array index
        return F.size(F.filter(toks, lambda t: F.substring(F.md5(t), j + 1, 1).isin(HIGH_HEX)))

    sig = F.lit(0)
    for j in range(16):
        hits = bit_hits(j)
        sig = sig + F.when(hits * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    sigs = docs.select("doc_id", sig.cast("long").alias("sig"))
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("blk"),
                F.shiftrightunsigned(F.col("sig"), j * 8).bitwiseAND(F.lit(255)).alias("v"),
            )
            for j in range(2)
        ]
    )
    e = sigs.select("doc_id", "sig", F.explode(blocks).alias("b")).select(
        "doc_id", "sig", F.col("b.blk").alias("blk"), F.col("b.v").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


def q_simhash16(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = TX.tokens(F.lower(F.col("text")))
    n = F.size(toks)
    def bit_hits(j: int):
        # NB: the predicate lambda must be unary — F.filter treats a
        # two-argument lambda as (element, index).
        return F.size(F.filter(toks, lambda t: F.substring(F.md5(t), j + 1, 1).isin(HIGH_HEX)))

    sig = F.lit(0)
    for j in range(16):
        hits = bit_hits(j)
        sig = sig + F.when(hits * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    return docs.select("doc_id", sig.cast("long").alias("sig"))


def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).cast("long").alias("n_tokens"),
        TX.char_count(t).cast("long").alias("n_chars"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.quality_score(t), 6).alias("quality"),
    )


def q_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish token counts (the training-budget estimate) per doc + corpus
    totals via GPT-2-flavor pretokenization."""
    docs = load_table(spark, sf_dir, "documents")
    n = TX.bpe_token_count(F.col("text")).cast("long")
    return docs.agg(
        F.sum(n).alias("total_bpe_tokens"),
        F.max(n).alias("max_doc_tokens"),
        F.round(F.sum(n).cast("double") / F.count(F.lit(1)), 6).alias("avg_bpe_tokens"),
    )


def q_rolling_fingerprint(spark, sf_dir):
    """Order-sensitive rolling polynomial fingerprint per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.rolling_fingerprint(F.col("text")).alias("rfp"))


def q_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count(F.col("text")).cast("long")
    return docs.agg(
        F.sum(n_tok).alias("total_tokens"),
        F.round(F.sum(n_tok).cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
    )


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind rollup/cube): order
    count + revenue by status alone and by priority alone in one pass —
    which null-marked row belongs to which set is disambiguated by the
    other column being null."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _sum_cents(F.col("o_totalprice"), "total"),
    )


def q_jsonl_roundtrip(spark, sf_dir):
    """Source-format coverage: the documents table written as JSON-lines and
    read back with an explicit schema (no inference job — at scale schema
    inference is a full extra pass), then aggregated per lang. The oracle
    reads the original parquet, so the roundtrip must be lossless for the
    projected columns."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = tempfile.mkdtemp(prefix="jlq_")
    try:
        path = d + "/docs_jsonl"
        docs.write.mode("overwrite").json(path)
        back = spark.read.schema(docs.schema).json(path)
        out = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_csv_roundtrip(spark, sf_dir):
    """Source-format coverage: orders written as headered CSV and read back
    with an explicit schema + timestampFormat (inference would be a full
    extra pass AND would lossily re-type). Aggregated per status; the
    oracle reads the original parquet, so the roundtrip must be lossless
    for keys, money (cents-exact), and timestamps (µs-exact)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    d = tempfile.mkdtemp(prefix="csvq_")
    try:
        path = d + "/orders_csv"
        fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        (
            orders.write.mode("overwrite")
            .option("header", True)
            .option("timestampFormat", fmt)
            .csv(path)
        )
        back = (
            spark.read.schema(orders.schema)
            .option("header", True)
            .option("timestampFormat", fmt)
            .csv(path)
        )
        out = back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("first_date_us"),
            F.max("o_orderkey").alias("max_key"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_top_bigrams(spark, sf_dir):
    """Corpus bigram counts, top 50 (tie-break on the bigram itself) — the
    count-table pass an n-gram LM or BPE-merge trainer starts from. Pure
    JVM expressions: tokenize → transform/slice n-grams → explode → count."""
    docs = load_table(spark, sf_dir, "documents")
    bg = TX.spread_for_cpu(docs).select(
        F.explode(TX.word_ngrams_all(F.col("text"), 2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary frequency table with cumulative corpus coverage for the
    top 1000 words — the token-budget curve a tokenizer trainer reads.
    The global scalar (total token count) is broadcast; the running sum
    is a window with a deterministic tie-break. At 100 TB the vocab table
    this windows over is post-aggregation (millions of rows, not the
    corpus), so the single-direction sort is fine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("word"))
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    w = Window.orderBy(F.col("n").desc(), F.col("word")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("cum_frac", F.sum("n").over(w).cast("double") / F.col("tot").cast("double"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(1000)
        .select("word", "n", "cum_frac")
    )


# ---- similarity ----------------------------------------------------------
def q_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.select("vec_id", F.round(cosine(F.col("embedding"), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def q_ivf_label_topk(spark, sf_dir):
    """IVF probe with cells = label column: prune to the query's cell, then
    exact top-k inside (partition-pruned ANN shape)."""
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding", "label").first()
    q = F.array(*[F.lit(float(x)) for x in row.embedding])
    return (
        emb.filter(F.col("label") == row.label)
        .select("vec_id", F.round(cosine(F.col("embedding"), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(5)
    )


def q_embedding_near_dups(spark, sf_dir):
    """Blocked near-dup pairs — the scale path: every vector gets a
    Charikar sign-LSH bucket (8 deterministic hyperplanes, bit-packed
    signs) and the self-join is bucket-local, so the pair count is
    ~n²/2^8 instead of n². Identical directions always land in the same
    bucket, so true duplicates are never blocked away. The oracle embeds
    the same plane literals, so both sides drop the same cross-bucket
    pairs."""
    from index_spark.operators.similarity import lsh_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 100).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    scaled = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * F.lit(1.000001)).alias("embedding"),
    )
    allv = lsh_bucket(base.unionByName(scaled), dim=64, n_planes=8)
    out = DD.embedding_near_dups(
        allv, vec_col="embedding", id_col="vec_id", threshold=0.95, block_col="bucket"
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def q_ivf_trained_topk(spark, sf_dir):
    """Full IVF path: deterministically-trained Lloyd centroids → cell
    assignment → nprobe=2 probe → exact top-k within probed cells. The
    trainer (``train_centroids_deterministic``) samples by id predicate,
    seeds from the smallest sample ids, and rounds each iteration's
    centroids to 6 decimals — which makes the whole pipeline replayable as
    unrolled SQL CTEs, so this query is exact-oracle-checked, not
    rows-only."""
    from index_spark.operators.similarity import (
        assign_cells,
        ivf_topk,
        train_centroids_deterministic,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    dim = len(qvec)
    cents = train_centroids_deterministic(emb, dim=dim, n_cells=8, iters=2, sample_mod=7)
    allv = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    indexed = assign_cells(allv, cents)
    out = ivf_topk(indexed, cents, [float(x) for x in qvec], k=10, nprobe=2)
    return out.select("vec_id", F.round("score", 6).alias("score")).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )


def q_lsh_sign_topk(spark, sf_dir):
    """Random-hyperplane sign-LSH ANN with 1-bit multiprobe. The seeded
    gaussian planes are embedded into the oracle as double literals (the
    same ``_sql_lsh_bucket`` replay ``embedding_near_dups`` uses) and the
    query's own bucket is computed with the identical fold, so the oracle
    is exact, not rows-only."""
    from index_spark.operators.similarity import lsh_bucket, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    dim = len(row.embedding)
    bucketed = lsh_bucket(emb, dim=dim, n_planes=8)
    out = lsh_topk(bucketed, row.embedding, dim=dim, k=10, n_planes=8)
    return out.select("vec_id", F.round("score", 6).alias("score")).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )


# ---- pipeline quality / decontamination / stats (new in round 3) ---------
def q_repetition_quality(spark, sf_dir):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1): top-bigram fraction + duplicated-bigram fraction, with the
    published 2-gram thresholds as a ``passes`` flag. Two-level aggregate —
    only (doc_id, gram, count) triples shuffle, never the text."""
    from index_spark.operators.quality import repetition_filter

    docs = load_table(spark, sf_dir, "documents")
    return repetition_filter(docs, k=2)


def q_contamination_scan(spark, sf_dir):
    """Benchmark decontamination (the 13-gram rule of GPT-3/The Pile, at
    k=3 for this vocabulary): docs with doc_id%97==0 play the benchmark;
    the rest of the corpus is scanned for shingle-hash collisions via a
    broadcast inverted-index join — corpus scanned once, nothing about the
    corpus shuffled. Returns (doc_id, n_hits, n_bench_docs) for colliding
    docs only."""
    from index_spark.operators.decontam import ngram_contamination

    docs_all = load_table(spark, sf_dir, "documents")
    bench = docs_all.filter(F.col("doc_id") % 97 == 0)
    corpus = docs_all.filter(F.col("doc_id") % 97 != 0)
    return ngram_contamination(corpus, bench, k=3)


def q_group_percentiles(spark, sf_dir):
    """Exact per-group discrete percentiles (p50/p90/p99 of order value in
    integer cents) with one group-key shuffle and within-partition ordering
    — no global sort, no approx sketch (exactness keeps it
    driver-hash-verifiable)."""
    from index_spark.operators.stats import grouped_percentile_disc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents")
    )
    return grouped_percentile_disc(orders, ["o_orderpriority"], "cents", [0.5, 0.9, 0.99])


def q_incremental_maint(spark, sf_dir):
    """Incremental view maintenance off the change feed: maintain a
    per-priority (n, total) aggregate across a COW transaction WITHOUT
    re-scanning the snapshot. diff(v0, v1) yields the changed keys; joining
    those keys back to the two snapshots (CDF keys ≪ table — the joins
    prune to touched files) gives +new/−old deltas to apply to the v0
    aggregate. Returns the MAINTAINED aggregate plus a recompute-equality
    flag; the oracle recomputes the final state from base algebra, so a
    hash match certifies maintenance == recompute. At 100 TB this is the
    difference between an incremental refresh and a full rescan."""
    from index_spark.commands import Insert, Remove
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="ivmq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500_000)
        bumped = orders.filter(F.col("o_orderkey") % 211 == 0).select(
            "o_orderkey", "o_orderpriority", (F.col("o_totalprice") + 1.0).alias("o_totalprice")
        )
        fresh = spark.createDataFrame(
            [(-1, "1-URGENT", 10.0), (-2, "1-URGENT", 20.0)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        doomed = [r.o_orderkey for r in orders.orderBy("o_orderkey").limit(2).collect()]
        h2 = h.execute(
            [
                Insert(bumped.unionByName(fresh), upsert=True),
                Remove([{"o_orderkey": k} for k in doomed]),
            ],
            version="tx-ivm",
        )
        v0, v1 = store.read(0), store.read(h2.version)
        cdf = store.diff(0, h2.version).select("o_orderkey", "change")
        plus = (
            cdf.filter(F.col("change").isin("insert", "update"))
            .join(v1, on="o_orderkey")
            .select(
                F.col("o_orderpriority").alias("pr"),
                _cents(F.col("o_totalprice")).alias("dc"),
                F.lit(1).cast("long").alias("dn"),
            )
        )
        minus = (
            cdf.filter(F.col("change").isin("update", "delete"))
            .join(v0, on="o_orderkey")
            .select(
                F.col("o_orderpriority").alias("pr"),
                (-_cents(F.col("o_totalprice"))).alias("dc"),
                F.lit(-1).cast("long").alias("dn"),
            )
        )
        delta = plus.unionByName(minus).groupBy("pr").agg(
            F.sum("dc").alias("dc"), F.sum("dn").alias("dn")
        )
        agg0 = v0.groupBy(F.col("o_orderpriority").alias("pr")).agg(
            F.count(F.lit(1)).alias("n0"), F.sum(_cents(F.col("o_totalprice"))).alias("c0")
        )
        maintained = agg0.join(delta, on="pr", how="full_outer").select(
            "pr",
            (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
            (F.coalesce(F.col("c0"), F.lit(0)) + F.coalesce(F.col("dc"), F.lit(0))).alias("c"),
        )
        recomputed = v1.groupBy(F.col("o_orderpriority").alias("pr")).agg(
            F.count(F.lit(1)).alias("rn"), F.sum(_cents(F.col("o_totalprice"))).alias("rc")
        )
        out = (
            maintained.join(recomputed, on="pr", how="full_outer")
            .select(
                F.col("pr").alias("o_orderpriority"),
                F.col("n"),
                (F.col("c").cast("double") / 100).alias("total"),
                (
                    F.col("n").eqNullSafe(F.col("rn")) & F.col("c").eqNullSafe(F.col("rc"))
                ).alias("matches"),
            )
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton) multi-dimensional clustering: interleave customer
    and order-day bits into one Z-value, bucket along the curve, and
    report each bucket's bounding box in BOTH dimensions — the
    file-skipping evidence (every box narrow in every dim, vs a
    single-column sort leaving the other dim spanning the domain). Pure
    integer bit math, bit-identical in the oracle."""
    from index_spark.operators.layout import zorder_layout_stats

    d = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey").bitwiseAND(F.lit(65535))).alias("ck"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .bitwiseAND(F.lit(65535))
        ).alias("dd"),
    )
    return zorder_layout_stats(d, ["ck", "dd"], n_buckets=8)


def _sql_zorder(n_buckets: int = 8, bits: int = 16) -> str:
    """Exact SQL twin of q_zorder_layout: identical bit interleave, rank
    bucketing, and per-bucket min/max boxes."""
    zterms = " + ".join(
        f"((({c} >> {i}) & 1) << {i * 2 + j})"
        for i in range(bits)
        for j, c in enumerate(("ck", "dd"))
    )
    return (
        "WITH d AS (SELECT o_custkey & 65535 AS ck, "
        "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) & 65535 AS dd "
        "FROM orders), "
        f"z AS (SELECT ck, dd, {zterms} AS z FROM d), "
        "r AS (SELECT ck, dd, row_number() OVER (ORDER BY z, ck, dd) - 1 AS rn, "
        "count(*) OVER () AS total FROM z) "
        "SELECT CAST(floor(rn / ceil(CAST(total AS DOUBLE) / "
        f"{n_buckets})) AS INT) AS __bucket, "
        "CAST(count(*) AS BIGINT) AS n, "
        "min(ck) AS min_ck, max(ck) AS max_ck, min(dd) AS min_dd, max(dd) AS max_dd "
        "FROM r GROUP BY 1"
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 terms by tf·idf (idf = ln(N/df)) — corpus
    keyword/topic reporting. Two aggregates + broadcast corpus size + one
    per-doc window top-k; the text never re-shuffles after the explode.
    Deterministic tie-break (tfidf DESC, term ASC) keeps the hash stable."""
    from index_spark.operators.quality import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_k=3)


def q_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution — the
    gibberish/boilerplate signal complementing the repetition fractions.
    The float Σ tf·ln tf is a left-to-right fold over the SORTED tf list in
    both engines (a plain double sum would be combine-order-dependent and
    break hash determinism)."""
    from index_spark.operators.quality import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs)


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic subsampling (curriculum-style PPS
    sampling): keep each doc with probability least(n_chars/500, 1) using
    the md5-prefix of its id as the uniform draw — reproducible across
    runs, engines, and repartitionings; a pure narrow filter at any scale.
    Aggregated per language for a stable hash."""
    from index_spark.operators.sampling import weighted_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars").cast("double") / F.lit(500.0), F.lit(1.0))
    kept = weighted_hash_sample(docs, "doc_id", w)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("kept_chars")
    )


def q_orc_roundtrip(spark, sf_dir):
    """Source-format coverage: orders written as ORC and read back (types
    survive natively — ORC is Spark's other first-class columnar sink).
    Aggregated per priority; the oracle reads the original parquet, so the
    roundtrip must be lossless for keys, money, and timestamps."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    d = tempfile.mkdtemp(prefix="orcq_")
    try:
        path = d + "/orders_orc"
        orders.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        out = back.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("first_date_us"),
            F.max("o_orderkey").alias("max_key"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- multimodal ----------------------------------------------------------
def q_pipeline_end_to_end(spark, sf_dir):
    """The flagship training-data pipeline composed end-to-end: corpus with
    injected duplicates → exact dedup (min-id survivor) → quality gate
    (length + punctuation) → language breakdown with token budgets. Every
    stage is the engine's own operator; the oracle replays the whole chain
    as SQL CTEs, so the hash match certifies the composition, not just the
    pieces."""
    docs = _docs_with_dups(spark, sf_dir)
    surv = DD.exact_dedup(docs)
    t = F.col("text")
    filtered = surv.filter((TX.token_count(t) >= 20) & (TX.punct_ratio(t) < 0.2))
    return (
        filtered.select(
            TX.lang_id(t).alias("lang_pred"), TX.token_count(t).cast("long").alias("n")
        )
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").cast("long").alias("total_tokens"))
    )


def q_multimodal_meta(spark, sf_dir):
    from index_spark.multimodal import documents_as_media

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


def q_frame_plan(spark, sf_dir):
    from index_spark.multimodal import documents_as_media, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(documents_as_media(docs), every_n=24).select("doc_id", "frame_idx")


def q_multimodal_features(spark, sf_dir):
    """mapInPandas feature extraction over opaque media payloads. The fake
    decode tiles the 16 md5 digest bytes into the (8,8,3) pixel block, so
    every pooled feature is exactly SQL-replicable: channel-0 mean =
    sum(digest)/16 (exact in float32 — integer sums < 2^24, /16 is an
    exponent shift), min/max = min/max digest byte. Full hash gate, not
    rows-only."""
    from index_spark.multimodal import documents_as_media, extract_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feats = extract_features(documents_as_media(docs))
    return feats.select(
        "doc_id",
        "checksum",
        F.element_at("feat", 1).cast("double").alias("f0"),
        F.element_at("feat", 7).cast("long").alias("f_min"),
        F.element_at("feat", 10).cast("long").alias("f_max"),
    )


def q_sql_interface(spark, sf_dir):
    """Plain-SQL entry point: register the fixture tables as views and run a
    join+agg through spark.sql — the engine-level demonstration that SQL
    (parser, planner, the whole §2.9 surface) comes free from Spark. The
    statement is written in the ANSI subset both engines parse, so the
    oracle runs the IDENTICAL string."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_INTERFACE_STMT)


SQL_INTERFACE_STMT = (
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "WHERE o_orderstatus = 'O' GROUP BY c_mktsegment"
)


# ---- streaming (availableNow-drained, same oracles as the batch twins) ---
def q_stream_hourly(spark, sf_dir):
    """Structured Streaming tumbling-window agg over the events file stream;
    drained with availableNow, so the final state must equal the batch/SQL
    answer. Exercises readStream → watermark → window → memory sink."""
    import uuid as _uuid

    from index_spark.streaming import hourly_counts, read_events_stream, run_available_now
    from index_spark.streaming.events import (
        EVENT_TYPE_CATALOG_BOUND,
        events_footer_stats,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir)
    # state partitions track state SIZE (hours × types here), not core
    # count — see run_available_now: every micro-batch commits every state
    # store, so near-empty stores are pure commit constant. The count is
    # DERIVED pre-drain (zero Spark jobs: parquet-footer rows + ts span):
    # state rows ≤ min(span_hours × type catalog, input rows).
    n_rows, span_h = events_footer_stats(sf_dir)
    return run_available_now(
        hourly_counts(stream),
        "sh" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(
            min(span_h * EVENT_TYPE_CATALOG_BOUND, n_rows) if span_h else n_rows
        ),
    )


def q_stream_sessionize(spark, sf_dir):
    """session_window sessions computed on the stream (one stateful agg),
    rolled up to per-user session counts in batch. Must match the lag-based
    ``sessionize`` oracle exactly."""
    import uuid as _uuid

    from index_spark.streaming import read_events_stream, run_available_now, sessionized
    from index_spark.streaming.events import events_footer_stats, stream_state_partitions

    stream = read_events_stream(spark, sf_dir)
    # session_window state is session-cardinality-driven; sessions ≤ input
    # rows, the zero-job footer bound (genuinely data-proportional state,
    # unlike the calendar-bounded hourly drains).
    n_rows, _ = events_footer_stats(sf_dir)
    sessions = run_available_now(
        sessionized(stream),
        "ss" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(n_rows),
    )
    return sessions.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))


def q_stream_user_state(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (event count, last-seen ts) with idle-timeout eviction. Drained
    with availableNow the whole file arrives as one micro-batch, so the
    update-mode output is exactly one open row per user and must equal the
    batch groupBy — which is the SQL oracle. This makes the bespoke-operator
    path (Arrow state, GroupState timeouts) driver-hash-verifiable."""
    import uuid as _uuid

    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import (
        events_footer_stats,
        stream_state_partitions,
        user_running_state,
    )

    stream = read_events_stream(spark, sf_dir)
    # per-user state rows ≤ input rows (zero-job footer bound)
    n_rows, _ = events_footer_stats(sf_dir)
    out = run_available_now(
        user_running_state(stream, timeout_ms=None),
        "su" + _uuid.uuid4().hex[:10],
        output_mode="update",
        shuffle_partitions=stream_state_partitions(n_rows),
    )
    # update mode emits one row per (user, micro-batch) plus a closed row on
    # eviction; counts are monotone, so max() reduces to the final state
    # regardless of how availableNow batched the files
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_ts_us").alias("last_ts_us"),
    )


def q_stream_funnel(spark, sf_dir):
    """Streaming strict-order funnel (second custom stateful operator):
    per-user 3-BIGINT state machine over applyInPandasWithState, batch
    rows replayed in (ts, event_id) order so a full availableNow drain
    reproduces the batch min-chain exactly — the oracle is the SAME
    funnel SQL as the batch ``funnel_steps``, making the stateful
    streaming path hash-verified, not rows-only. Per-user stage is
    monotone, so max() collapses update-mode rows."""
    import uuid as _uuid

    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import (
        events_footer_stats,
        stream_state_partitions,
        user_funnel_state,
    )

    stream = read_events_stream(spark, sf_dir)
    # per-user funnel state rows ≤ input rows (zero-job footer bound)
    n_rows, _ = events_footer_stats(sf_dir)
    out = run_available_now(
        user_funnel_state(stream),
        "sf" + _uuid.uuid4().hex[:10],
        output_mode="update",
        shuffle_partitions=stream_state_partitions(n_rows),
    )
    final = out.groupBy("user_id").agg(F.max("stage").alias("stage"))
    agg = final.agg(
        F.sum((F.col("stage") >= 1).cast("long")).alias("step1_users"),
        F.sum((F.col("stage") >= 2).cast("long")).alias("step2_users"),
        F.sum((F.col("stage") >= 3).cast("long")).alias("step3_users"),
    )
    from index_spark.operators.funnel import conversion_cols

    return agg.select(
        "step1_users", "step2_users", "step3_users", *conversion_cols(3)
    )


def q_stream_join_attrib(spark, sf_dir):
    """Stream-stream inner join with watermarked time-range state eviction:
    purchases attributed to same-user clicks at most 1h earlier, drained in
    append mode and rolled up per user in batch."""
    import uuid as _uuid

    from index_spark.streaming import attributed_purchases, read_events_stream, run_available_now
    from index_spark.streaming.events import events_footer_stats, stream_state_partitions

    clicks = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    # join state buffers both sides within the watermark ≤ input rows
    n_rows, _ = events_footer_stats(sf_dir)
    pairs = run_available_now(
        attributed_purchases(clicks, purchases),
        "sj" + _uuid.uuid4().hex[:10],
        output_mode="append",
        shuffle_partitions=stream_state_partitions(n_rows),
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_attributed"))


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup: the feed read twice (two file sources over the
    same directory → every event arrives exactly twice) and collapsed by
    dropDuplicatesWithinWatermark on event_id; survivors counted per type.
    The oracle is the plain per-type count of the single feed."""
    import uuid as _uuid

    from index_spark.streaming import dedup_stream, read_events_stream, run_available_now
    from index_spark.streaming.events import events_footer_stats, stream_state_partitions

    doubled = read_events_stream(spark, sf_dir).unionByName(read_events_stream(spark, sf_dir))
    # dedup state holds event ids within the watermark ≤ 2× input rows
    n_rows, _ = events_footer_stats(sf_dir)
    survivors = run_available_now(
        dedup_stream(doubled), "sd" + _uuid.uuid4().hex[:10], output_mode="append",
        shuffle_partitions=stream_state_partitions(2 * n_rows),
    )
    return survivors.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ---- dedup clustering / skew -------------------------------------------
def q_dedup_clusters(spark, sf_dir):
    """LSH near-dup pairs resolved to duplicate *clusters* (connected
    components, cluster id = min member) — the survivor-selection step a
    dedup pipeline actually ships."""
    from index_spark.operators.graph import connected_components

    docs = _docs_with_near_dups(spark, sf_dir)
    pairs = DD.minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=MINHASH_N, bands=MINHASH_BANDS
    )
    cc = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    return cc.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def q_dedup_clusters_star(spark, sf_dir):
    """Same cluster resolution through the large-star/small-star alternation
    (Kiveris et al.) — the log-round scale path for adversarial deep
    duplicate graphs. Must produce the identical (doc, cluster-min) map as
    the propagation version, so it shares that query's oracle."""
    from index_spark.operators.graph import connected_components_star

    docs = _docs_with_near_dups(spark, sf_dir)
    pairs = DD.minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=MINHASH_N, bands=MINHASH_BANDS
    )
    cc = connected_components_star(pairs.select("id_a", "id_b"), "id_a", "id_b")
    return cc.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def q_skew_salted_join(spark, sf_dir):
    """Salted fact⋈dim join (lineitem⋈part on partkey, salt=8): results are
    identical to the plain join — the salt only respreads reducers — so the
    oracle is the unsalted SQL."""
    from index_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    joined = salted_join(li, part.select("l_partkey", "p_brand"), ["l_partkey"], salt=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        _sum_cents(F.col("l_extendedprice"), "revenue"),
    )


def q_skew_two_phase_agg(spark, sf_dir):
    """Two-phase (salted partial → final merge) aggregation over the 5-value
    o_orderpriority key — the genuinely-skewed groupBy shape."""
    from index_spark.operators.skew import two_phase_agg

    orders = load_table(spark, sf_dir, "orders")
    return two_phase_agg(
        orders,
        ["o_orderpriority"],
        partial=lambda: [
            F.count(F.lit(1)).alias("pn"),
            F.sum(_cents(F.col("o_totalprice"))).alias("pc"),
        ],
        final=lambda: [
            F.sum("pn").cast("long").alias("n"),
            (F.sum("pc").cast("double") / 100).alias("total"),
        ],
        salt=8,
    )


# ---- sampling / packing / sketch / interval (training-data extensions) --
def q_stratified_sample(spark, sf_dir):
    """Downsample the dominant language (en → 2/16) while keeping the tail
    (8/16) — deterministic md5-bucket filter, no shuffle, no RNG."""
    from index_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs, strata="lang", key="doc_id", rates_16ths={"en": 2}, default_16ths=8
    ).select("doc_id", "lang")


def q_pack_sequences(spark, sf_dir):
    """Fixed-budget training-chunk assignment (2000 whitespace tokens per
    chunk, greedy per language in doc_id order), reported as chunk stats."""
    from index_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", TX.token_count(F.col("text")).cast("long")
    )
    packed = pack_sequences(docs, part="lang", order="doc_id", tokens="n_tok", budget=2000)
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch over orders.o_custkey — a deterministic
    sketch whose estimate itself hash-matches the SQL oracle (HLL can't)."""
    from index_spark.operators.sampling import kmv_distinct

    return kmv_distinct(load_table(spark, sf_dir, "orders"), "o_custkey", k=64)


def q_window_count_join(spark, sf_dir):
    """Interval join: per purchase event, how many same-user events landed in
    the preceding 10 minutes (equi-join on user + time-range residual)."""
    from index_spark.operators.interval import window_count_join

    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    build = ev.select("user_id", "ts_us")
    return window_count_join(probe, build, key="user_id", ts="ts_us", lookback=600_000_000)


def q_time_rollup(spark, sf_dir):
    """Hypertable-style multi-grain rollup of events (hour + day buckets)."""
    from index_spark.operators.interval import time_rollup

    ev = load_table(spark, sf_dir, "events")
    return time_rollup(
        ev,
        "ts",
        ["hour", "day"],
        F.count(F.lit(1)).alias("n"),
        _sum_cents(F.col("value"), "total"),
    )


def q_events_type_summary(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        _sum_cents(F.col("value"), "total"),
    )


def q_dup_span_stats(spark, sf_dir):
    """Substring-level duplicate spans (Lee et al. 2021 semantics via
    5-token k-gram hashes): per-doc duplicated-span counts and fraction.
    Only (id, 60-bit hash, count) triples shuffle — span text is dropped
    map-side, so shuffled bytes are constant per span at any corpus
    size."""
    from index_spark.operators.spans import duplicate_span_stats

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_span_stats(docs, k=5)


def q_bloom_prune_join(spark, sf_dir):
    """Bloom-filter semi-join pruning (Kirsch-Mitzenmacher double
    hashing, m=1024, k=3): the probe table is filtered by an O(m)-bit
    broadcast instead of shuffling on the join key. Deliberately small
    ``m`` so the false-positive arm is exercised — the summary row counts
    passes, true members, and FPs, all replayed exactly by the SQL twin
    (Spark's builtin bloom_filter_agg hash is engine-private and
    unverifiable)."""
    from index_spark.operators.bloom import bloom_prune

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.where(F.col("c_acctbal") > 9000)
    passed = bloom_prune(orders, build, "o_custkey", "c_custkey", m=1024)
    true_m = orders.join(
        build.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    )
    return (
        passed.agg(
            F.count(F.lit(1)).alias("n_pass"), F.sum("o_orderkey").alias("pass_key_sum")
        )
        .crossJoin(true_m.agg(F.count(F.lit(1)).alias("n_true")))
        .select(
            "n_pass",
            "n_true",
            (F.col("n_pass") - F.col("n_true")).alias("n_false_pos"),
            "pass_key_sum",
        )
    )


def q_unigram_nll(spark, sf_dir):
    """Perplexity-proxy quality score: per-doc mean negative
    log-likelihood under the corpus unigram LM (the CCNet-style ranking
    signal). One term shuffle + broadcast vocab join; left-to-right fold
    over the sorted contribution list keeps the float Σ hashable."""
    from index_spark.operators.quality import unigram_nll

    docs = load_table(spark, sf_dir, "documents")
    return unigram_nll(docs)


def q_funnel_steps(spark, sf_dir):
    """Strictly-ordered 3-step funnel (view → click → purchase): each
    stage joins the previous stage's per-user frontier (user-count-sized,
    broadcast) onto the type-filtered events — the event table never
    re-shuffles across stages. Epoch-µs comparisons replay exactly in
    SQL."""
    from index_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


def q_first_seen_users(spark, sf_dir):
    """Exact running distinct users per (event_type, day) via the
    first-seen trick: cumulative-distinct = running sum of per-day debut
    counts — one aggregate + a window over (types × days) rows, instead
    of the O(days·users) count(DISTINCT) OVER formulation that funnels
    through one reducer at scale."""
    from index_spark.operators.funnel import first_seen_cumulative

    ev = load_table(spark, sf_dir, "events")
    return first_seen_cumulative(ev)


def q_pagerank_parts(spark, sf_dir):
    """Fixed-iteration integer PageRank over the part↔supplier bipartite
    graph (distinct lineitem pairs, both directions). Integer mass units
    + truncating division make every round bit-exact under any
    partitioning, so the 3-round power iteration unrolls into an exact
    SQL oracle — float PageRank could never hash-match. Top-10 hubs by
    rank with a node-id tiebreak."""
    from index_spark.operators.graph import pagerank_int

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("a"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
    ).distinct()
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return (
        pagerank_int(edges, iterations=3)
        .orderBy(F.col("rank").desc(), "node")
        .limit(10)
    )


def q_profile_orders(spark, sf_dir):
    """One-pass exact data profiling (null/distinct/min/max per column)
    over orders — money canonicalized to integer cents and dates to
    epoch-µs BEFORE stringification, so min/max formatting is
    engine-portable. Single scan; multi-distinct via Spark's Expand."""
    from index_spark.operators.stats import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        [
            ("o_orderkey", F.col("o_orderkey")),
            ("o_custkey", F.col("o_custkey")),
            ("o_orderstatus", F.col("o_orderstatus")),
            ("o_orderpriority", F.col("o_orderpriority")),
            ("o_totalprice_cents", _cents(F.col("o_totalprice"))),
            ("o_orderdate_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))),
        ],
    )


def q_price_histogram(spark, sf_dir):
    """Equi-width histogram of order totals (10 buckets over [0, 500k),
    integer-cents bucket arithmetic — exact in both engines). One shuffle
    on the 10-value bucket id; the profiling complement to
    profile_orders."""
    from index_spark.operators.stats import fixed_histogram

    orders = load_table(spark, sf_dir, "orders")
    return fixed_histogram(orders, _cents(F.col("o_totalprice")), 0, 50_000_000, 10)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): per-subspace
    deterministic Lloyd codebooks → 4-int codes per vector → ADC
    (asymmetric distance) shortlist via literal lookup tables → exact
    cosine re-rank of the shortlist. The ADC scan touches only the codes
    (4 small ints/vector — the compressed index a 100 TB corpus scans
    instead of raw vectors); the same determinism recipe as the IVF
    trainer (id-predicate sample, smallest-id seeds, id-ordered mean
    folds, 6-decimal rounding, argmin ties → lowest code) lets the whole
    train→encode→search pipeline unroll into an exact SQL oracle."""
    from index_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    dim = len(qvec)
    books = train_pq_codebooks(emb, dim=dim, n_sub=4, k=8, iters=2, sample_mod=7)
    enc = pq_encode(emb, books, dim=dim)
    out = pq_adc_topk(enc, emb, books, qvec, dim=dim, k=10, shortlist=40)
    return out.select("vec_id", F.round("score", 6).alias("score")).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )


def q_kmv_union(spark, sf_dir):
    """Mergeable-sketch union: KMV sketches of orders.o_custkey and
    customer.c_custkey (k-row objects) merged into the union's distinct
    estimate WITHOUT rescanning either table — the
    store-partials-and-merge-later pattern that makes distinct counting
    compose across days/sources at 100 TB. Per-source estimates ride
    along; every hash step replays exactly in the SQL twin."""
    from index_spark.operators.sampling import kmv_merge_estimate, kmv_sketch

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # the sketch IS a k-row artifact: collect each once (its storage
    # contract — per-source sketches live in a catalog, not in cluster
    # cache) and rebuild literal frames; a .persist() here would pin two
    # cached frames per run for the session's lifetime
    sk = {
        name: spark.createDataFrame(
            [(float(r["frac"]),) for r in kmv_sketch(df, col).collect()],
            "frac double",
        )
        for name, df, col in [
            ("orders", orders, "o_custkey"),
            ("customers", cust, "c_custkey"),
        ]
    }

    def est(s, name):
        # same underfill guard as sampling._kmv_est_cols: < 64 distinct
        # hashes means the sketch is exhaustive — exact count, no estimate
        cnt = F.count(F.lit(1))
        return s.agg(
            F.when(cnt < 64, cnt)
            .otherwise(F.round((cnt - 1) / F.max("frac")))
            .cast("long")
            .alias(name)
        )

    out = (
        est(sk["orders"], "est_orders")
        .crossJoin(est(sk["customers"], "est_customers"))
        .crossJoin(
            kmv_merge_estimate([sk["orders"], sk["customers"]]).select(
                F.col("est_distinct").alias("est_union"), "kth_frac", "k"
            )
        )
    )
    return out


def q_triangle_parts(spark, sf_dir):
    """Exact triangle count on the part co-purchase graph (parts sharing
    an order, one 6-month ship window — co-occurrence graphs densify with
    unbounded time, so production runs window them) via degree-ordered orientation — wedges generate only at
    each edge's lower-degree endpoint, bounding per-node wedge work by
    O(√m) (Suri-Vassilvitskii; the naive per-node C(deg,2) blows up on
    hub nodes at scale). Pure integer counting, so the unordered SQL
    replay is exact; clustering = 3·triangles / Σ C(deg,2)."""
    from index_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        l1.join(l2, on="l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return triangle_count(edges)


def q_erase_roundtrip(spark, sf_dir):
    """GDPR-style hard erasure: two keys are erased from EVERY snapshot
    version (file-level rewrite of only the covering files, originals
    physically deleted), then both versions are re-read. The oracle
    replays the surviving state in SQL; the per-version erased-key
    absence rides along as booleans."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="ersq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        store.create(["o_orderkey"], df=orders, rows_per_partition=1000)
        store.latest().update_partial(
            [{"o_orderkey": 500, "o_totalprice": 111.0}], version="e-up"
        )
        store.erase_keys([{"o_orderkey": 500}, {"o_orderkey": 1500}])
        v0, v1 = store.read(0), store.read(store.latest_version())
        gone = F.lit(
            v0.filter(F.col("o_orderkey").isin(500, 1500)).count() == 0
            and v1.filter(F.col("o_orderkey").isin(500, 1500)).count() == 0
        )
        out = v1.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderkey").alias("min_key"),
            gone.alias("erased_everywhere"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_incremental_dedup(spark, sf_dir):
    """Incremental-ingestion dedup: a synthetic new batch (20 near-copies
    of corpus docs + 20 genuinely fresh docs) screened against the full
    documents corpus. Corpus-internal pairs are never generated — the
    banded corpus acts as an LSH index the batch probes, so continuous
    ingestion stays O(batch). Flags + best-match Jaccard per batch doc,
    replayed exactly in SQL."""
    from index_spark.operators.dedup import incremental_near_dups

    docs = load_table(spark, sf_dir, "documents")
    near = (
        docs.where(F.col("doc_id") % 25 == 0)
        .select((F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz tail marker")).alias("text"))
    )
    fresh = (
        docs.where(F.col("doc_id") % 25 == 7)
        .select((F.col("doc_id") + 300000).alias("doc_id"),
                F.concat(F.lit("unique marker doc "), F.col("doc_id")).alias("text"))
    )
    batch = near.unionByName(fresh)
    return incremental_near_dups(docs, batch)


def q_pii_redaction(spark, sf_dir):
    """PII-style scrubbing exemplar: redact digit runs from the event
    props payload, reporting per-type match counts and byte savings.
    Pure codegen'd regex map — no shuffle beyond the 5-group rollup; the
    pattern stays in the RE2-compatible subset so the SQL twin replays
    it verbatim."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(TX.match_count(F.col("props"))).alias("nums_redacted"),
        F.sum(F.length("props") - F.length(TX.redact(F.col("props")))).alias(
            "chars_delta"
        ),
    )


def q_q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS-correlated semi-join + priority rollup),
    adapted to the fixture's columns: count 1996 orders per priority that
    have at least one line shipped more than 60 days after the order
    date. The EXISTS compiles to a LeftSemi hash join on the order key
    with the date comparison as the join residual — one shuffle, no
    row multiplication from multi-line orders."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(o["o_orderdate"].cast("date"), 60).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (group value + scalar-subquery threshold over the
    SAME aggregate), partsupp-free: value per part shipped by NATION_1
    suppliers, keeping parts whose value exceeds 1/500 of the nation
    total. The threshold compare is ``value·500 > total`` in integer
    cents — exact, no float fraction — and the total is a broadcast
    one-row aggregate, not a recomputation."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nation_li = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .where(F.col("n_name") == "NATION_1")
    )
    per_part = nation_li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("__vc")
    )
    total = per_part.agg(F.sum("__vc").alias("__tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__vc") * 500 > F.col("__tc"))
        .select("l_partkey", (F.col("__vc").cast("double") / 100).alias("value"))
    )


def q_q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (NOT-IN anti-join + per-group DISTINCT supplier
    count): suppliers per (brand, size) for non-PROMO parts outside two
    excluded brands, excluding negative-balance suppliers via an
    anti-join (the NOT IN). Distinct count shuffles only (brand, size,
    suppkey) triples."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(
            (F.col("p_type") != "PROMO")
            & (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        )
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape (correlated per-part average threshold): revenue
    of Brand#3 lines whose quantity is below half the part's average
    quantity. The correlated AVG becomes one per-part aggregate joined
    back (broadcast — part-count-sized); the half-average compare is
    ``2·qty·n < sum_qty`` in scaled integers, so the filter is exact in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_li = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).where(
        F.col("p_brand") == "Brand#3"
    )
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    per_part = brand_li.groupBy("p_partkey").agg(
        F.sum(qty).alias("__sq"), F.count(F.lit(1)).alias("__n")
    )
    return (
        brand_li.join(F.broadcast(per_part), on="p_partkey")
        .where(qty * 2 * F.col("__n") < F.col("__sq"))
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / 100).alias(
                "avg_yearly_base"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_q20_volume_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (nested semi-join chain), partsupp-free: suppliers
    who shipped more than half of some part's total 1996 volume. Per
    (part, supplier) and per part aggregates share one shuffle key; the
    share compare is ``2·supp_qty > part_qty`` in scaled integers; the
    top 20 suppliers by dominated-part count get names via a broadcast
    join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    li96 = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    ps = li96.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("__sq"))
    pt = ps.groupBy("l_partkey").agg(F.sum("__sq").alias("__pq"))
    qual = (
        ps.join(pt, on="l_partkey")
        .where(F.col("__sq") * 2 > F.col("__pq"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return (
        supp.join(F.broadcast(qual), supp["s_suppkey"] == qual["l_suppkey"])
        .select("s_suppkey", "s_name", "n_parts")
        .orderBy(F.col("n_parts").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


def q_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (EXISTS + NOT-EXISTS over the same order): count
    per supplier of late lines (shipped >90 days after order) in
    multi-supplier orders where every OTHER supplier shipped on time —
    i.e. this supplier alone kept the order waiting. Both EXISTS arms are
    one per-order window over the (order, supplier) aggregate, so no
    O(lines²) self-join pair blowup and a single lineitem scan; top 20 by count with name
    tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate").cast("date"), 90).cast("timestamp")
        ).alias("__late"),
    )
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("__late").cast("int")).alias("__any_late")
    )
    # both EXISTS arms as ONE window over the per-(order, supplier) rows:
    # a separate per-order aggregate joined back would recompute the
    # lineitem⋈orders subtree (two scans — plan-asserted against)
    w_o = Window.partitionBy("l_orderkey")
    blamed = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "__any_late",
        F.count(F.lit(1)).over(w_o).alias("__n_supps"),
        F.sum("__any_late").over(w_o).alias("__n_late_supps"),
    ).where(
        (F.col("__any_late") == 1)
        & (F.col("__n_supps") > 1)
        & (F.col("__n_late_supps") == 1)
    )
    return (
        blamed.join(F.broadcast(supp), blamed["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


def q_event_transitions(spark, sf_dir):
    """Per-user event-type transition matrix (first-order Markov counts):
    lag the type over each user's time-ordered stream, count (from, to)
    pairs, and attach the per-from transition probability. One window
    shuffle hashed on the user key (state per user is its own event
    count, never global), one 25-cell rollup; event_id tiebreaks equal
    timestamps so the lag is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_from).cast("double"), 6
        ).alias("prob"),
    )


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids + pairwise centroid cosine — the
    corpus-composition report for a labeled embedding space (cluster
    separation audit). Centroid = id-ordered left-to-right element-wise
    mean fold rounded to 6 decimals (the catalog's replayable-float
    recipe); the 10×10/2 centroid pairs are a broadcast self-join of a
    label-count-sized table — the vectors themselves reduce in one
    shuffle."""
    from index_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    dim = len(emb.select("embedding").first()[0])
    zero = F.array(*[F.lit(0.0)] * dim)
    vecs = F.transform(
        F.sort_array(F.collect_list(F.struct("vec_id", F.col("__v").alias("v")))),
        lambda st: st["v"],
    )
    summed = F.aggregate(vecs, zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b))
    cents = (
        emb.select("label", "vec_id", v.alias("__v"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), summed.alias("s"))
        .select(
            "label", F.transform("s", lambda x: F.round(x / F.col("n"), 6)).alias("c")
        )
    )
    a = cents.select(F.col("label").alias("la"), F.col("c").alias("ca"))
    b = cents.select(F.col("label").alias("lb"), F.col("c").alias("cb"))
    return (
        a.join(F.broadcast(b), a["la"] < b["lb"])
        .select("la", "lb", F.round(cosine(F.col("ca"), F.col("cb")), 6).alias("cos"))
    )


# =========================================================================
# DuckDB oracle twins
# =========================================================================

def _sql_lang_pred(src: str = "documents", extra_cols: list[tuple[str, str]] | None = None) -> str:
    """Lang-ID CASE over lowercased-token marker hits; ``extra_cols`` is a
    list of (expression, alias) carried through (e.g. a token count for
    downstream aggregation)."""
    toks = SQL_TOKS_LOWER
    score_exprs = []
    for lang in LANGS:
        markers = ", ".join(f"'{w}'" for w in TX.LANG_MARKERS[lang])
        score_exprs.append(f"len(list_filter({toks}, t -> t IN ({markers}))) AS s_{lang}")
    g = "greatest(" + ", ".join(f"s_{l}" for l in LANGS) + ")"
    case = "CASE WHEN cjk THEN 'zh' WHEN " + g + " = 0 THEN 'und' "
    for lang in sorted(LANGS, reverse=True)[:-1]:
        case += f"WHEN s_{lang} = {g} THEN '{lang}' "
    case += f"ELSE '{LANGS[0]}' END"
    extra_cols = extra_cols or []
    inner_extra = "".join(f", {expr} AS {alias}" for expr, alias in extra_cols)
    outer_extra = "".join(f", {alias}" for _, alias in extra_cols)
    return f"""
    SELECT doc_id, {case} AS lang_pred{outer_extra} FROM (
      SELECT doc_id, {", ".join(score_exprs)},
             len(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 AS cjk{inner_extra}
      FROM {src})
    """


# decontamination source table: the benchmark/corpus split with the
# ≥k-token guard of decontam._shingle_hashes (same normalized tokenizer)
_SQL_DECONTAM_SRC = (
    "(SELECT doc_id, text FROM documents WHERE doc_id % 97 {op} 0 "
    f"AND len(regexp_extract_all({SQL_NORM}, '\\S+')) >= 3)"
)


def _sql_shingles(src: str = "documents") -> str:
    """CTE body producing (doc_id, sh) distinct word-3-gram shingles."""
    return f"""
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(w)-2, 1)+1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
      FROM (SELECT doc_id, regexp_extract_all({SQL_NORM}, '\\S+') AS w FROM {src})
    """


def _sql_minhash_sig() -> str:
    """Exact SQL twin of DD.minhash_signature: per shingle one md5 → 32-bit
    hex-prefix int, then the same (a_i·h + b_i) mod p permutations."""
    h = "(('0x' || substr(md5(s),1,7))::BIGINT)"
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * {h} + {b}) % {DD.MINHASH_PRIME}))"
        for a, b in DD.minhash_ab(MINHASH_N)
    )
    return f"[{mins}]"


def _sql_simhash16_bits() -> str:
    """The 16-bit SimHash signature expression over a token-list column w."""
    high = ", ".join(f"'{h}'" for h in HIGH_HEX)
    return " + ".join(
        f"(CASE WHEN 2*len(list_filter(w, t -> substr(md5(t), {j+1}, 1) IN ({high}))) > len(w) "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )


def _sql_simhash16() -> str:
    return (
        f"SELECT doc_id, CAST({_sql_simhash16_bits()} AS BIGINT) AS sig "
        f"FROM (SELECT doc_id, {SQL_TOKS_LOWER} AS w FROM documents) WHERE doc_id < 50"
    )


def _sql_lsh_bucket(dim: int = 64, n_planes: int = 8, vec: str = "v") -> str:
    """Exact SQL twin of ``similarity.lsh_bucket``: the deterministic
    hyperplanes are embedded as double literals (repr round-trips exactly),
    and both engines fold the dot product left-to-right in double, so the
    sign — and therefore the bucket — is bit-identical."""
    from index_spark.operators.similarity import _hyperplanes

    terms = []
    for j, p in enumerate(_hyperplanes(dim, n_planes)):
        lit = "[" + ",".join(repr(float(x)) for x in p) + "]"
        d = f"list_sum(list_transform(range(1, {dim}+1), i -> {vec}[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _sql_lsh_topk(dim: int = 64, n_planes: int = 8, k: int = 10) -> str:
    """Exact SQL twin of ``q_lsh_sign_topk``: bucket every vector AND the
    query with the embedded plane literals, probe the query's bucket plus
    all Hamming-1 neighbors (xor with each single bit), exact cosine top-k
    within the candidates."""
    bits = ", ".join(str(1 << j) for j in range(n_planes))
    return (
        f"WITH b AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, "
        f"{_sql_lsh_bucket(dim, n_planes, 'list_transform(embedding, x -> CAST(x AS DOUBLE))')} AS bucket "
        f"FROM embeddings), "
        f"q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0), "
        f"top AS (SELECT b.vec_id, {_sql_cosine('b.v', 'q.qv')} AS cos FROM b, q "
        f"WHERE b.bucket = q.qb OR xor(b.bucket, q.qb) IN ({bits}) "
        f"ORDER BY cos DESC, b.vec_id ASC LIMIT {k}) "
        f"SELECT vec_id, round(cos, 6) AS score FROM top ORDER BY score DESC, vec_id ASC"
    )


def _sql_ivf_trained(
    dim: int = 64,
    n_cells: int = 8,
    iters: int = 2,
    sample_mod: int = 7,
    k: int = 10,
    nprobe: int = 2,
) -> str:
    """Exact SQL twin of ``q_ivf_trained_topk``: the deterministic k-means
    (``train_centroids_deterministic``) unrolled as CTEs — sample by id
    predicate, seed from the smallest sample ids, per-iteration argmax
    assignment (ties → lowest cell) and element-wise means whose float
    sums fold LEFT-TO-RIGHT over the cell's vectors in id order (bitwise
    identical to the Spark fold — a plain avg would be
    combine-order-dependent), rounded to 6 decimals, an emptied cell
    keeping its previous centroid via COALESCE — then probe the
    top-``nprobe`` cells by query-centroid dot and exact cosine top-k
    within."""
    mean_list = (
        "["
        + ", ".join(
            f"round(list_sum(list_transform(l, x -> x[{i + 1}])) / n, 6)" for i in range(dim)
        )
        + "]"
    )

    def dotexpr(vexpr: str, cexpr: str) -> str:
        return f"list_sum(list_transform(range(1, {dim}+1), i -> {vexpr}[i] * {cexpr}[i]))"

    sql = (
        f"WITH s AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        f"FROM embeddings WHERE vec_id % {sample_mod} = 0), "
        f"c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS c "
        f"FROM (SELECT id, v FROM s ORDER BY id LIMIT {n_cells})), "
    )
    prev = "c0"
    for it in range(1, iters + 1):
        sql += (
            f"a{it} AS (SELECT id, v, cell FROM ("
            f"SELECT s.id, s.v, p.cell, "
            f"row_number() OVER (PARTITION BY s.id ORDER BY {dotexpr('s.v', 'p.c')} DESC, p.cell ASC) AS rn "
            f"FROM s, {prev} p) WHERE rn = 1), "
            f"c{it} AS (SELECT p.cell, COALESCE(n.c, p.c) AS c FROM {prev} p LEFT JOIN "
            f"(SELECT cell, {mean_list} AS c FROM "
            f"(SELECT cell, list(v ORDER BY id) AS l, count(*) AS n FROM a{it} GROUP BY cell)"
            f") n USING (cell)), "
        )
        prev = f"c{it}"
    sql += (
        f"allv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        f"q AS (SELECT v AS qv FROM allv WHERE vec_id = 0), "
        f"probe AS (SELECT cell FROM {prev}, q ORDER BY {dotexpr('qv', 'c')} DESC, cell ASC LIMIT {nprobe}), "
        f"asg AS (SELECT vec_id, v, cell FROM ("
        f"SELECT allv.vec_id, allv.v, p.cell, "
        f"row_number() OVER (PARTITION BY allv.vec_id ORDER BY {dotexpr('allv.v', 'p.c')} DESC, p.cell ASC) AS rn "
        f"FROM allv, {prev} p) WHERE rn = 1), "
        f"top AS (SELECT vec_id, {_sql_cosine('v', 'qv')} AS cos FROM asg, q "
        f"WHERE cell IN (SELECT cell FROM probe) ORDER BY cos DESC, vec_id ASC LIMIT {k}) "
        f"SELECT vec_id, round(cos, 6) AS score FROM top ORDER BY score DESC, vec_id ASC"
    )
    return sql


def _sql_pq_topk(
    dim: int = 64,
    n_sub: int = 4,
    n_codes: int = 8,
    iters: int = 2,
    sample_mod: int = 7,
    k: int = 10,
    shortlist: int = 40,
) -> str:
    """Exact SQL twin of ``q_pq_topk``: per-subspace deterministic Lloyd
    unrolled as CTEs (the ``_sql_ivf_trained`` recipe with argmin
    squared-L2 assignment), then code assignment for every vector, the
    query's per-subspace distance tables (rounded to 6 decimals exactly
    like the driver-side fold), a fixed-order 4-term ADC sum, shortlist
    by (adc, id), and exact cosine re-rank."""
    w = dim // n_sub

    def l2(vexpr: str, cexpr: str, off: int) -> str:
        # squared L2 of the subvector starting at 1-based offset `off`
        return (
            f"list_sum(list_transform(range(1, {w}+1), "
            f"i -> ({vexpr}[i+{off - 1}] - {cexpr}[i]) * ({vexpr}[i+{off - 1}] - {cexpr}[i])))"
        )

    mean_list = (
        "["
        + ", ".join(
            f"round(list_sum(list_transform(l, x -> x[{i + 1}])) / n, 6)" for i in range(w)
        )
        + "]"
    )
    sql = (
        f"WITH s AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        f"FROM embeddings WHERE vec_id % {sample_mod} = 0), "
        f"allv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        f"q AS (SELECT v AS qv FROM allv WHERE vec_id = 0), "
    )
    for j in range(n_sub):
        off = j * w + 1
        # seeds: smallest-id sample vectors, sliced to this subspace
        sql += (
            f"s{j} AS (SELECT id, v[{off}:{off + w - 1}] AS v FROM s), "
            f"c{j}_0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS code, v AS c "
            f"FROM (SELECT id, v FROM s{j} ORDER BY id LIMIT {n_codes})), "
        )
        prev = f"c{j}_0"
        for it in range(1, iters + 1):
            sql += (
                f"a{j}_{it} AS (SELECT id, v, code FROM ("
                f"SELECT s{j}.id, s{j}.v, p.code, "
                f"row_number() OVER (PARTITION BY s{j}.id ORDER BY {l2(f's{j}.v', 'p.c', 1)} ASC, p.code ASC) AS rn "
                f"FROM s{j}, {prev} p) WHERE rn = 1), "
                f"c{j}_{it} AS (SELECT p.code, COALESCE(n.c, p.c) AS c FROM {prev} p LEFT JOIN "
                f"(SELECT code, {mean_list} AS c FROM "
                f"(SELECT code, list(v ORDER BY id) AS l, count(*) AS n FROM a{j}_{it} GROUP BY code)"
                f") n USING (code)), "
            )
            prev = f"c{j}_{it}"
        sql += (
            # encode every vector in this subspace; distance tables vs the query
            f"e{j} AS (SELECT vec_id, code FROM ("
            f"SELECT allv.vec_id, p.code, "
            f"row_number() OVER (PARTITION BY allv.vec_id ORDER BY {l2('allv.v', 'p.c', off)} ASC, p.code ASC) AS rn "
            f"FROM allv, {prev} p) WHERE rn = 1), "
            f"t{j} AS (SELECT code, round({l2('qv', 'c', off)}, 6) AS d FROM {prev}, q), "
        )
    sql += (
        "adc AS (SELECT e0.vec_id, round("
        + " + ".join(f"t{j}.d" for j in range(n_sub))
        + ", 6) AS adc_dist FROM e0 "
        + " ".join(
            f"JOIN e{j} ON e0.vec_id = e{j}.vec_id" for j in range(1, n_sub)
        )
        + " "
        + " ".join(f"JOIN t{j} ON e{j}.code = t{j}.code" for j in range(n_sub))
        + "), "
        f"short AS (SELECT vec_id FROM adc ORDER BY adc_dist ASC, vec_id ASC LIMIT {shortlist}), "
        f"top AS (SELECT allv.vec_id, {_sql_cosine('allv.v', 'qv')} AS cos FROM allv, q "
        f"WHERE allv.vec_id IN (SELECT vec_id FROM short) "
        f"ORDER BY cos DESC, allv.vec_id ASC LIMIT {k}) "
        f"SELECT vec_id, round(cos, 6) AS score FROM top ORDER BY score DESC, vec_id ASC"
    )
    return sql


# ---- round-3 batch 3: time-series / segment dedup / graph / SCD2 / zone maps
_BOILERPLATE = "terms of service apply to all content here"  # exactly 8 tokens


def _docs_with_boilerplate(spark, sf_dir):
    """Documents with a synthetic 8-token boilerplate header injected into
    every 7th doc — the corpus shape segment-level dedup exists for (the
    raw fixtures are unique word soup with no repeated segments)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(_BOILERPLATE + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )


def q_segment_dedup(spark, sf_dir):
    """Segment-level boilerplate removal (CCNet/RefinedWeb paragraph dedup
    re-expressed over token blocks): hash 8-token segments, drop segments
    recurring in >= 3 distinct docs, re-assemble each document in order.
    Only (doc_id, pos, 60-bit hash) triples shuffle; the cleaned text is
    re-derived doc-locally and compared by md5."""
    from index_spark.operators.segments import dedup_segments

    out = dedup_segments(_docs_with_boilerplate(spark, sf_dir), min_docs=3, width=8)
    return out.select(
        "doc_id", "n_segments", "n_removed", F.md5("clean_text").alias("clean_md5")
    )


def q_gapfill_hourly(spark, sf_dir):
    """Time-series gap-fill: per-user regular hourly grid from first to
    last event hour, forward-filled with the last observed hourly value
    (sequence+explode grid, one shuffle on user_id, window fill inside the
    same partitioning). Users are sampled by id to bound the grid."""
    from index_spark.operators.timeseries import gapfill_forward

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    out = gapfill_forward(ev)
    return out.select("user_id", "h", F.round("v_fill", 6).alias("v_fill"), "observed")


def q_ewma_users(spark, sf_dir):
    """Per-user EWMA of event value (alpha=0.25), computed as an explicit
    left-to-right fold over the time-sorted values — the recursive EWMA
    definition IS a left fold, so Spark F.aggregate and DuckDB list_reduce
    land on bit-identical doubles."""
    from index_spark.operators.timeseries import ewma_by_key

    return ewma_by_key(load_table(spark, sf_dir, "events"), alpha=0.25)


def q_hourly_anomaly(spark, sf_dir):
    """Per-event-type hourly count anomalies: hours deviating >= 2 sigma
    from the series mean. All moments are integer sums (m, S=sum n,
    Q=sum n^2), so the z expression sees exact inputs in both engines."""
    from index_spark.operators.timeseries import hourly_anomalies

    return hourly_anomalies(load_table(spark, sf_dir, "events"), z_min=2.0)


def q_knn_graph(spark, sf_dir):
    """Approximate kNN graph (SemDeDup-style neighbor lists): sign-LSH
    bucket assignment, bucket-local equi self-join (never all-pairs),
    per-source top-3 by exact cosine. The oracle replays the buckets from
    the same embedded hyperplane literals."""
    from index_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, dim=64, k=3, n_planes=8)
    return g.filter(F.col("src") % 10 == 0)


def q_scd2_customer(spark, sf_dir):
    """SCD type-2 dimension merge: high-balance customers move to a
    'PLATINUM' segment at t=1 — their current rows close (valid_to=1) and
    new versions open; everyone else passes through. One key join with the
    (broadcast) update batch, no window. Aggregated per final segment."""
    from index_spark.operators.scd import scd2_apply, scd2_init

    cust = load_table(spark, sf_dir, "customer")
    dim0 = scd2_init(
        cust.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"), valid_from=0
    )
    updates = (
        cust.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", F.lit("PLATINUM").alias("c_mktsegment"))
    )
    dim1 = scd2_apply(
        dim0, updates, key=["c_custkey"], tracked=["c_mktsegment"], effective=1
    )
    cur = F.col("valid_to").isNull()
    return dim1.groupBy("c_mktsegment").agg(
        F.sum(F.when(cur, 1).otherwise(0)).cast("long").alias("n_current"),
        F.sum(F.when(~cur, 1).otherwise(0)).cast("long").alias("n_closed"),
        (
            F.sum(F.when(cur, _cents(F.col("c_acctbal"))).otherwise(F.lit(0))).cast("double")
            / 100
        ).alias("cur_bal"),
    )


def q_zone_map_skip(spark, sf_dir):
    """Read-side zone-map file skipping: a narrow key-range read against a
    multi-file snapshot opens only the files whose manifest [min,max] can
    intersect the probe — the file-level analog of the reference's
    root->leaf descent (Index.scala:62-99). The oracle is the plain range
    aggregate; the file-pruning invariant is plan-asserted in tests."""
    from index_spark.snapshots import SnapshotStore

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = tempfile.mkdtemp(prefix="zmapq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        # 2000 rows/file: ~8 files at sf0.01, ~75 at sf0.1 — enough files
        # for a meaningful skip ratio without paying a many-small-files
        # write at layout time
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=2000)
        scanned = h.read_range(2000, 3500)
        out = scanned.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderkey").alias("k_min"),
            F.max("o_orderkey").alias("k_max"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_curriculum_bins(spark, sf_dir):
    """Per-language quality-curriculum binning: exact within-language
    quartile thresholds (grouped percentile_disc — one shuffle hashed on
    lang, no global sort), then a broadcast threshold join assigns each
    doc its quartile bin. The shape multilingual training pipelines use to
    stage data from low- to high-quality."""
    from index_spark.operators.stats import grouped_percentile_disc

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "n_chars", F.round(TX.quality_score(F.col("text")), 6).alias("q")
    )
    th = grouped_percentile_disc(scored, ["lang"], "q", [0.25, 0.5, 0.75])
    binned = scored.join(F.broadcast(th), on="lang").withColumn(
        "bin",
        F.when(F.col("q") <= F.col("p25"), F.lit(1))
        .when(F.col("q") <= F.col("p50"), F.lit(2))
        .when(F.col("q") <= F.col("p75"), F.lit(3))
        .otherwise(F.lit(4)),
    )
    return binned.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("q").alias("q_lo"),
        F.max("q").alias("q_hi"),
    )


# ---- round-3 batch 4: PIT join / BM25 / variant JSON / stream top-k
T_SCD_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z, mid-events-range
BM25_TERMS = ("table", "scan", "fast")


def q_pit_join(spark, sf_dir):
    """Point-in-time correct fact-dimension join (feature-store
    semantics): events join the customer-segment VERSION valid at event
    time — high-balance customers flip to PLATINUM mid-range, so early
    events attribute to the old segment and late ones to the new. An equi
    key join with a codegen'd interval residual; the non-leaky join shape
    every training pipeline needs."""
    from index_spark.operators.scd import scd2_apply, scd2_init, scd2_pit_join

    cust = load_table(spark, sf_dir, "customer")
    dim0 = scd2_init(cust.select("c_custkey", "c_acctbal", "c_mktsegment"), valid_from=0)
    updates = cust.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.lit("PLATINUM").alias("c_mktsegment")
    )
    dim1 = scd2_apply(
        dim0, updates, key=["c_custkey"], tracked=["c_mktsegment"], effective=T_SCD_US
    )
    ev = load_table(spark, sf_dir, "events")
    j = scd2_pit_join(ev, dim1, "user_id", "c_custkey", "ts_us")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_cents(F.col("value"), "total"),
    )


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 retrieval over the corpus for a fixed 3-term query: tf
    via array filters (no token explode), one broadcast stats row, fixed-
    order IEEE score sum, TakeOrdered top-20. The oracle is the identical
    expression tree in SQL."""
    from index_spark.operators.ranking import bm25_topk

    return bm25_topk(load_table(spark, sf_dir, "documents"), BM25_TERMS, k=20)


def q_json_props(spark, sf_dir):
    """Semi-structured props column parsed with Spark 4 VARIANT
    (parse_json → try_variant_get): per-event-type stats over the
    extracted integer. The oracle extracts the same path with DuckDB's
    JSON operators — both engines must agree on every value."""
    ev = load_table(spark, sf_dir, "events")
    kv = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return ev.select("event_type", kv.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct(F.col("k")).alias("n_k"),
    )


def q_stream_hourly_topk(spark, sf_dir):
    """Trending event types per hour off the stream: the watermarked
    tumbling-window agg runs streaming (availableNow drain), the per-hour
    top-3 rank is the downstream batch step over the sink — the standard
    two-tier shape, since a rank over a streaming agg is not a legal
    single streaming query."""
    import uuid as _uuid

    from index_spark.streaming import hourly_counts, read_events_stream, run_available_now
    from index_spark.streaming.events import (
        EVENT_TYPE_CATALOG_BOUND,
        events_footer_stats,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir)
    # same derived state sizing as q_stream_hourly: hours × type catalog,
    # bounded by input rows, all from parquet footers (zero Spark jobs)
    n_rows, span_h = events_footer_stats(sf_dir)
    drained = run_available_now(
        hourly_counts(stream),
        "st" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(
            min(span_h * EVENT_TYPE_CATALOG_BOUND, n_rows) if span_h else n_rows
        ),
    )
    w = Window.partitionBy("hour_us").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        drained.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("hour_us", "event_type", "n", "rnk")
    )


# ---- round-3 batch 5: band join / MERGE INTO / chunking / cogroup asof
def q_band_join_events(spark, sf_dir):
    """Keyless temporal proximity join: purchases with the count of
    signups (any user) within ±60 s. A pure range join would plan as a
    broadcast nested loop; band_join buckets both sides on ts div 60s,
    explodes the probe to 3 adjacent bands and equi-joins — the
    interval-join rewrite that scales."""
    from index_spark.operators.interval import band_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts_us").alias("p_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("ts_us").alias("s_ts")
    )
    pairs = band_join(purchases, signups, "p_ts", "s_ts", 60_000_000)
    return pairs.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_nearby"))


def q_merge_into_orders(spark, sf_dir):
    """Lakehouse MERGE INTO as one store transaction: a source batch that
    updates 20 rows (price +1000), inserts 5 new keys, and deletes 5
    (marked by a negative price) — classified with semi/anti joins and
    committed atomically via the execute() batch, inheriting file-level
    COW. The oracle recomputes the final state from base algebra."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="mrgq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=1000)
        upd = orders.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 120)).select(
            "o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice")
        )
        ins = spark.range(5).select(
            (F.col("id") + 1_000_000).alias("o_orderkey"),
            (F.col("id") + 10).cast("double").alias("o_totalprice"),
        )
        dele = orders.filter((F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 205)).select(
            "o_orderkey", F.lit(-1.0).alias("o_totalprice")
        )
        source = upd.unionByName(ins).unionByName(dele)
        h2 = h.merge_into(source, delete_condition=F.col("o_totalprice") < 0, version="m1")
        out = h2.df.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderkey").alias("k_min"),
            F.max("o_orderkey").alias("k_max"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_chunk_docs(spark, sf_dir):
    """Overlapping token-window chunking (RAG/context-window prep): width
    64, stride 48 — a narrow per-row explode, zero shuffles; boundary
    chunks may be short but every token is covered."""
    from index_spark.operators.segments import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    c = chunk_documents(docs, width=64, stride=48)
    return c.select(
        "doc_id", "chunk_id", "tok_start", "n_tokens", F.md5("chunk_text").alias("chunk_md5")
    )


def q_asof_cogroup(spark, sf_dir):
    """The cogroup+applyInPandas escape hatch (Arrow-batched per-key
    merge_asof) computing the SAME answer as the JVM-side asof_join —
    hash-gated against the identical correlated-subquery oracle, so the
    custom-operator template is itself correctness-verified."""
    from index_spark.operators.asof import asof_join_cogroup

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts_us")
    out = asof_join_cogroup(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        value_col="ts_us",
        value_type="bigint",
    )
    return out.select("event_id", F.col("ts_us_right").alias("signup_ts_us"))


# ---- round-3 batch 6: retention delete / schema evolution
def q_retention_delete(spark, sf_dir):
    """Predicate delete (retention/TTL sweep): one transaction removes all
    rows older than the cutoff; the key set is computed DataFrame-side and
    file-level COW rewrites only touched files. The oracle recomputes the
    surviving state."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="ttlq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=1000)
        h2 = h.delete_where(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), version="ttl1"
        )
        out = h2.df.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderdate").alias("min_date"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_schema_evolution(spark, sf_dir):
    """Schema evolution under file-level COW: an upsert batch ADDS a
    column; carried old-schema files read back NULL there (parquet
    mergeSchema — a footer-only metadata step), touched keys carry the
    new value. The oracle recomputes flag counts from base algebra."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="evoq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500)
        batch = orders.filter(
            (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 150)
        ).select("o_orderkey", "o_totalprice", F.lit("vip").alias("o_flag"))
        h2 = h.insert(batch, upsert=True, version="ev1", allow_new_columns=True)
        out = h2.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_flag").alias("n_flagged"),
            _sum_cents(F.col("o_totalprice"), "total"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- round-3 batch 7: BFS / data-quality expectations
def q_bfs_hops(spark, sf_dir):
    """Undirected BFS hop distances from the max-degree hub part over the windowed
    co-purchase graph (iterative frontier joins, localCheckpoint lineage
    truncation; rounds = min(eccentricity, 4)). Hop minima are unique, so
    the recursive-CTE oracle replays exactly. Aggregated per hop level."""
    from index_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        l1.join(l2, on="l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    und = edges.select(F.col("src").alias("s")).unionByName(
        edges.select(F.col("dst").alias("s"))
    )
    hub = (
        und.groupBy("s").count().orderBy(F.col("count").desc(), F.col("s").asc()).limit(1)
    ).collect()[0]["s"]
    dist = bfs_hops(edges, source=int(hub), max_hops=4)
    return dist.groupBy("hops").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("node").alias("node_sum")
    )


def q_dq_expectations(spark, sf_dir):
    """Data-quality expectation report (dbt-test shape): four row-level
    rules checked in ONE aggregate over one scan, plus a referential
    check (lineitem.l_orderkey ⊆ orders) as a keys-only anti join —
    one report row per rule with its violation count."""
    from index_spark.operators.stats import expectations, fk_violations

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    report = expectations(
        li,
        [
            ("quantity_range", F.col("l_quantity").between(1, 50)),
            ("price_positive", F.col("l_extendedprice") > 0),
            ("shipdate_not_null", F.col("l_shipdate").isNotNull()),
            ("discount_cap", F.col("l_discount") <= 0.05),
        ],
    )
    fk = fk_violations(li, orders, "l_orderkey", "o_orderkey").select(
        F.lit("fk_orderkey").alias("rule"),
        F.col("n_child").alias("n_rows"),
        F.col("n_orphans").alias("n_violations"),
    )
    return report.unionByName(fk)


# ---- round-3 batch 8: count-min sketch
def q_cms_heavy(spark, sf_dir):
    """Count-min frequency sketch (Cormode-Muthukrishnan): a 3×256 count
    table — mergeable by cellwise sum, the frequency twin of the KMV
    distinct sketch — probed for the top-10 true heavy hitters. The
    estimate is an upper bound (collisions only add); the oracle replays
    every hash, so est_n and overcount are exact, not approximate-ly
    compared."""
    from index_spark.operators.sampling import cms_build, cms_estimate

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("t"))
    )
    true_counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("true_n"))
    probes = true_counts.orderBy(F.col("true_n").desc(), F.col("t").asc()).limit(10)
    sketch = cms_build(toks, "t")
    est = cms_estimate(sketch, probes.select("t"), "t")
    return (
        probes.join(est, on="t")
        .select("t", "true_n", "est_n", (F.col("est_n") - F.col("true_n")).alias("overcount"))
    )


# ---- round-3 batch 9: rollback / shallow clone
def q_rollback_restore(spark, sf_dir):
    """RESTORE after a bad commit: a retention sweep deletes 100 rows,
    rollback() re-heads the store at the pre-delete version with a
    metadata-only commit (zero data I/O — the version row carries the old
    files by reference), and the change feed across the restore reports
    exactly the undone rows. Output: restored state + undo count."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="rbq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500)
        v0 = store.latest_version()
        h.delete_where(F.col("o_orderkey") < 100, version="bad")
        v_bad = store.latest_version()
        store.rollback(v0)
        restored = store.latest()
        undone = store.diff(v_bad, store.latest_version()).filter(
            F.col("change") == "insert"
        )
        out = restored.df.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
        ).crossJoin(undone.agg(F.count(F.lit(1)).alias("n_undone")))
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- round-3 batch 10: streaming MERGE / ANN recall eval
def q_stream_merge_state(spark, sf_dir):
    """Streaming MERGE (CDC-apply): each micro-batch reduces to the
    latest row per user and merges into a versioned store — one COW
    commit per batch, head = exactly-once latest state. The availableNow
    drain of the single events file is one batch, so the final state
    must equal the batch arg-max — which is the oracle."""
    import uuid as _uuid

    from index_spark.snapshots import SnapshotStore
    from index_spark.streaming import read_events_stream, stream_merge_into

    d = tempfile.mkdtemp(prefix="smq_" + _uuid.uuid4().hex[:6])
    try:
        store = SnapshotStore(spark, d + "/idx")
        store.create(["user_id"])
        stream = read_events_stream(spark, sf_dir)
        stream_merge_into(stream, store)
        out = store.latest().df.select(
            "user_id", "last_ts_us", F.round("last_value", 6).alias("last_value")
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_lsh_recall(spark, sf_dir):
    """Recall@10 evaluation of the sign-LSH ANN against the exact
    brute-force top-10 — the measurement every ANN deployment needs
    before trusting the approximate path. Both sides are deterministic,
    so even the recall fraction hash-gates exactly."""
    from index_spark.operators.similarity import brute_force_topk, lsh_bucket, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    dim = len(row.embedding)
    bucketed = lsh_bucket(emb, dim=dim, n_planes=8)
    approx = lsh_topk(bucketed, row.embedding, dim=dim, k=10, n_planes=8)
    exact = brute_force_topk(emb, row.embedding, k=10)
    hits = approx.select("vec_id").join(exact.select("vec_id"), on="vec_id")
    return hits.agg(F.count(F.lit(1)).alias("n_hit")).select(
        "n_hit", F.round(F.col("n_hit").cast("double") / 10, 6).alias("recall")
    )


# ---- round-3 batch 11: pivot / unpivot / rank windows / fuzzy matching
def q_pivot_status(spark, sf_dir):
    """Pivot (long→wide): order counts per priority with one column per
    status — Spark's pivot with an explicit value list compiles to a
    single conditional aggregate (one shuffle, no per-status scans); the
    oracle is the FILTER-clause conditional-count equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


def q_unpivot_metrics(spark, sf_dir):
    """Unpivot/melt (wide→long): per-priority metric columns melted to
    (priority, metric, value) rows with Spark's native unpivot — a
    zero-shuffle Expand over the aggregated frame; the oracle is the
    UNION ALL equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    return wide.unpivot(
        ["o_orderpriority"], ["n_orders", "min_key", "max_key"], "metric", "value"
    )


def q_window_ranks(spark, sf_dir):
    """The rank-function family over one window: dense_rank,
    percent_rank, cume_dist, ntile(4) per market segment ordered by
    (acctbal cents, custkey) — the tie-broken order makes every rank
    value deterministic, and the rank definitions are engine-portable
    rationals (rounded to 6)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    w = Window.partitionBy("c_mktsegment").orderBy(
        _cents(F.col("c_acctbal")).asc(), F.col("c_custkey").asc()
    )
    # rank functions emit IntegerType; cast to long so the value type
    # matches the oracle's BIGINT under the driver's type-sensitive hash
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def q_fuzzy_token_pairs(spark, sf_dir):
    """Typo-pair mining (fuzzy-dedup primitive): docs with id % 13 == 0
    get deterministic OCR noise (a→o), then the DISTINCT token vocabulary
    self-joins under standard blocking (same first char, |len diff| <= 1)
    with a levenshtein <= 1 residual. The vocabulary is tiny relative to
    the corpus (dedup before the quadratic step — the blocking+distinct
    combination is what keeps fuzzy matching tractable at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    noisy = F.when(
        F.col("doc_id") % 13 == 0, F.translate(F.lower(F.col("text")), "a", "o")
    ).otherwise(F.lower(F.col("text")))
    vocab = (
        docs.select(F.explode(F.split(F.trim(noisy), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    a = vocab.select(F.col("t").alias("t1"))
    b = vocab.select(F.col("t").alias("t2"))
    block = (
        (F.substring("t1", 1, 1) == F.substring("t2", 1, 1))
        & (F.abs(F.length("t1") - F.length("t2")) <= 1)
        & (F.col("t1") < F.col("t2"))
    )
    return (
        a.join(b, on=block)
        .withColumn("dist", F.levenshtein("t1", "t2"))
        .filter(F.col("dist") <= 1)
        .select("t1", "t2", "dist")
    )


# ---- round-3 batch 19: full preprocessing pipeline showcase
def q_full_pipeline(spark, sf_dir):
    """The whole preprocessing pipeline as ONE DAG: duplicate-injected
    corpus -> quality filter (>= 0.75) -> exact dedup (min-id survivor per
    fingerprint) -> language rebalancing (target 30/group) -> overlapping
    chunking -> per-language chunk stats. Every stage is an engine
    operator with its own proven oracle; the composed oracle chains the
    same algebra, so a drift in ANY stage hash-fails the whole pipeline.
    Plan shape: narrow maps + one fp shuffle + one group count + a final
    rollup — text enters exactly one exchange (the dedup semi-join's
    build side is id-only)."""
    from index_spark.operators.dedup import exact_dedup
    from index_spark.operators.sampling import rebalance_by_group
    from index_spark.operators.segments import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dup = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    corpus = docs.unionByName(dup)
    kept = corpus.filter(F.round(TX.quality_score(F.col("text")), 6) >= 0.75)
    uniq = exact_dedup(kept)
    counts = {
        r.lang: r.n
        for r in uniq.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rebal = rebalance_by_group(uniq, "lang", "doc_id", counts, target=30)
    chunks = chunk_documents(rebal, width=64, stride=48).join(
        rebal.select("doc_id", "lang"), on="doc_id"
    )
    return chunks.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# ---- round-3 batch 18: Python UDTF (lateral table function)
def q_udtf_tokens(spark, sf_dir):
    """Python UDTF coverage (Spark 4 user-defined TABLE function, called
    LATERAL per input row): positional tokenization of a small doc slice.
    A UDTF is the right tool when the row-expansion logic is genuinely
    imperative — for plain tokenization the JVM explode (used everywhere
    else in this repo) is the fast path, which is why this exemplar is
    bounded to 10 docs. Oracle: UNNEST WITH ORDINALITY."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class SplitTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").lower().split()):
                yield i, t

    spark.udtf.register("split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok FROM __udtf_docs, LATERAL split_tokens(text) t"
    )


# ---- round-3 batch 17: streaming ingestion dedup
def q_stream_dedup_ingest(spark, sf_dir):
    """Streaming ingestion with near-dup screening: the documents file
    streamed, each micro-batch synthesized into the ingest batch (20
    near-copies + 20 fresh docs, same construction as the batch
    ``incremental_dedup``) and screened against the static banded corpus;
    verdicts append to a parquet sink. A full availableNow drain must
    land on the batch twin's exact answer — the SAME oracle gates both."""
    import uuid as _uuid

    from index_spark.streaming import ingest_with_dedup

    docs = load_table(spark, sf_dir, "documents")
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )

    def synthesize(batch):
        near = batch.where(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz tail marker")).alias("text"),
        )
        fresh = batch.where(F.col("doc_id") % 25 == 7).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(F.lit("unique marker doc "), F.col("doc_id")).alias("text"),
        )
        return near.unionByName(fresh)

    d = tempfile.mkdtemp(prefix="sdq_" + _uuid.uuid4().hex[:6])
    try:
        out_path = d + "/verdicts"
        ingest_with_dedup(stream, docs, out_path, transform=synthesize)
        out = spark.read.parquet(out_path)
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- round-3 batch 16: store history introspection
def q_store_history(spark, sf_dir):
    """DESCRIBE HISTORY: per-version row/file counts straight from the
    manifest (zero data I/O) across a create -> upsert -> delete ->
    rollback lifecycle. The oracle recomputes each version's expected row
    count from base algebra, so a mis-recorded manifest row would
    hash-fail."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="histq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500)
        h2 = h.upsert_partial(
            [{"o_orderkey": -1, "o_totalprice": 1.0}, {"o_orderkey": -2, "o_totalprice": 2.0}],
            version="hx-up",
        )
        h2.delete_where(F.col("o_orderkey") < 100, version="hx-del")
        store.rollback(1)  # metadata-only commit, always a new version
        out = store.versions_df().select(
            "version", "n_rows", (F.col("n_files") >= 1).alias("has_files"), "writer_version"
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- round-3 batch 15: range secondary lookup / calendar / analytics windows
def q_projection_range(spark, sf_dir):
    """Ranged secondary-index lookup: an acctbal-band membership query
    answered from a numeric projection with partial-tuple lexicographic
    bounds (all keys under the boundary attribute included) — the AVET
    range read. The oracle recomputes the band from the base."""
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    d = tempfile.mkdtemp(prefix="prjrq_")
    try:
        base = SnapshotStore(spark, d + "/base")
        base.create(["c_custkey"], df=cust, rows_per_partition=5000)
        proj = ProjectionIndex(spark, base, d + "/by_bal", "bal_cents").build(
            rows_per_partition=5000
        )
        band = proj.lookup_range(500_000, 700_000)
        out = band.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("key_sum"),
            F.min("bal_cents").alias("lo_cents"),
            F.max("bal_cents").alias("hi_cents"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_seasonality_profile(spark, sf_dir):
    """Calendar seasonality: event volume by (day-of-week, hour-of-day).
    Day-of-week comes from integer epoch-day arithmetic ((days + 4) % 7,
    0=Sunday) — engine conventions for dayofweek() differ, exact integer
    math does not."""
    ev = load_table(spark, sf_dir, "events")
    days = F.expr("ts_us div 86400000000")
    dow = ((days + 4) % 7).cast("int")
    hour = F.expr("(ts_us div 3600000000) % 24").cast("int")
    return (
        ev.select(dow.alias("dow"), hour.alias("hour"), "value")
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"), _sum_cents(F.col("value"), "total"))
    )


def q_ratio_to_report(spark, sf_dir):
    """Percent-of-total (ratio-to-report): each nation's share of global
    revenue — an unpartitioned window over the 25-row AGGREGATE (never
    over raw rows; the heavy lifting is the groupBy, the window sees one
    row per nation). Integer cents ratio rounded to 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    )
    w = Window.partitionBy()
    return per_nation.select(
        "n_name",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.round(F.col("cents").cast("double") / F.sum("cents").over(w).cast("double"), 6).alias(
            "share"
        ),
    )


def q_window_nth(spark, sf_dir):
    """first/last/nth value windows: per user the first, second, and
    latest event type in time order (frame pinned to the whole partition
    so last/nth are well-defined), deterministic (ts, event_id) order."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


# ---- round-3 batch 14: secondary-index projection / gaps-and-islands
def q_projection_lookup(spark, sf_dir):
    """Materialized secondary index kept in sync off the change feed:
    build a (segment -> custkey) projection, move low-key customers to a
    new segment in the base, refresh (O(changed keys): diff + two key
    semi-joins, one transactional Remove+Insert), then answer membership
    straight from the projection. The oracle recomputes final membership
    from base algebra, so a stale or double-applied sync would hash-fail."""
    from index_spark.projection import ProjectionIndex
    from index_spark.snapshots import SnapshotStore

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = tempfile.mkdtemp(prefix="projq_")
    try:
        base = SnapshotStore(spark, d + "/base")
        h = base.create(["c_custkey"], df=cust, rows_per_partition=5000)
        proj = ProjectionIndex(spark, base, d + "/by_segment", "c_mktsegment").build(
            rows_per_partition=5000
        )
        moved = cust.filter(F.col("c_custkey") < 30).select(
            "c_custkey", F.lit("PLATINUM").alias("c_mktsegment"), "c_acctbal"
        )
        h.insert(moved, upsert=True, version="mv1")
        proj.refresh()
        segs = ["PLATINUM", "BUILDING", "MACHINERY"]
        outs = []
        for s in segs:
            keys = proj.lookup(s)
            outs.append(
                keys.agg(
                    F.lit(s).alias("segment"),
                    F.count(F.lit(1)).alias("n_keys"),
                    F.coalesce(F.sum("c_custkey"), F.lit(0)).alias("key_sum"),
                )
            )
        out = outs[0].unionByName(outs[1]).unionByName(outs[2])
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_longest_streak(spark, sf_dir):
    """Gaps-and-islands: each user's longest consecutive run of one event
    type (island id = global rownum − per-type rownum, both inside the
    same user partitioning — one shuffle total), deterministic tie-break
    on type."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    islands = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = islands.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("event_type").asc()
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("best_type"), F.col("len").alias("streak_len"))
    )


# ---- round-3 batch 13: epoch shuffle / data mixing
def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch corpus shuffle: shard + within-shard
    position from the md5 of (epoch, key) — a reproducible permutation
    that changes every epoch with no RNG state and no stateful shuffle
    service; at scale the shuffle key drives repartitionByRange and this
    IS the epoch's write layout."""
    from index_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, "doc_id", epoch=1, n_shards=8)


def q_lang_rebalance(spark, sf_dir):
    """Data mixing: down-sample over-represented languages to ~40 docs
    each (flattening the distribution before training) with the
    deterministic md5-uniform draw; under-represented languages pass
    through whole. The per-group counts feeding the keep fractions are
    one tiny aggregate."""
    from index_spark.operators.sampling import rebalance_by_group

    docs = load_table(spark, sf_dir, "documents")
    counts = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = rebalance_by_group(docs, "lang", "doc_id", counts, target=40)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("kept_chars")
    )


# ---- round-3 batch 12: Arrow-native kernel
def q_arrow_norms(spark, sf_dir):
    """mapInArrow coverage (the Arrow-native batch API, below even the
    pandas bridge): per-vector L2 norms computed in a pyarrow kernel with
    an explicit sequential fold, hash-matching the SQL fold exactly."""
    from index_spark.functions.vectors import norms_arrow

    return norms_arrow(load_table(spark, sf_dir, "embeddings"))


def _sql_cosine(e1: str, e2: str) -> str:
    d = f"list_sum(list_transform(range(1, len({e1})+1), i -> CAST({e1}[i] AS DOUBLE) * CAST({e2}[i] AS DOUBLE)))"
    n1 = f"sqrt(list_sum(list_transform({e1}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    n2 = f"sqrt(list_sum(list_transform({e2}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"{d} / ({n1} * {n2})"


_SQL_QUALITY_EXPR = f"""round((
      least(length(text) / 500.0, 1.0)
    + (1.0 - least(CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) * 4, 1.0))
    + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) * 4, 1.0))
    + (CASE WHEN (CAST(list_sum(list_transform(regexp_extract_all(text, '\\S+'), t -> length(t))) AS DOUBLE)
               / greatest(len(regexp_extract_all(text, '\\S+')), 1)) BETWEEN 3 AND 12
        THEN 1.0 ELSE 0.4 END)
    + least(CAST(len(list_filter({SQL_TOKS_LOWER},
        t -> t IN ({", ".join("'" + w + "'" for w in TX.STOPWORDS_EN)}))) AS DOUBLE)
        / greatest(len({SQL_TOKS_LOWER}), 1) * 5, 1.0)
  ) / 5, 6)"""

# quality for every document (the curriculum-binning input)
_QUALITY_ALL_SQL = f"SELECT doc_id, lang, n_chars, {_SQL_QUALITY_EXPR} AS quality FROM documents"

_QUALITY_SQL = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  round(CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio,
  round(CAST(len(list_filter({SQL_TOKS_LOWER},
        t -> t IN ({", ".join("'" + w + "'" for w in TX.STOPWORDS_EN)}))) AS DOUBLE)
        / greatest(len({SQL_TOKS_LOWER}), 1), 6) AS stopword_ratio,
  round((
      least(length(text) / 500.0, 1.0)
    + (1.0 - least(CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) * 4, 1.0))
    + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) * 4, 1.0))
    + (CASE WHEN (CAST(list_sum(list_transform(regexp_extract_all(text, '\\S+'), t -> length(t))) AS DOUBLE)
               / greatest(len(regexp_extract_all(text, '\\S+')), 1)) BETWEEN 3 AND 12
        THEN 1.0 ELSE 0.4 END)
    + least(CAST(len(list_filter({SQL_TOKS_LOWER},
        t -> t IN ({", ".join("'" + w + "'" for w in TX.STOPWORDS_EN)}))) AS DOUBLE)
        / greatest(len({SQL_TOKS_LOWER}), 1) * 5, 1.0)
  ) / 5, 6) AS quality
FROM documents WHERE doc_id < 100
"""


# ---- round-4 batch 1: MOR deletes / quotas / postings / splits / robust stats


def q_mor_delete(spark, sf_dir):
    """Merge-on-read delete (deletion-vector shape): doomed keys land in a
    tombstone sidecar, every base data file carries by reference — zero
    data rewritten; reads subtract the sidecar with one key anti-join.
    Returns live-state aggregates plus the tombstoned-row count straight
    from the O(1) manifest bookkeeping. Oracle recomputes both from base
    algebra. Cites reference COW semantics (Context.scala:135-154) —
    re-expressed at file granularity with a sidecar, like Delta deletion
    vectors."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderkey") <= 3000)
    )
    d = tempfile.mkdtemp(prefix="morq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=1000)
        base_files = sorted(
            f["path"] for f in store._version_row(0).get("files") or []
        )
        h2 = h.delete_where_mor(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("date"), version="mor1"
        )
        carried = sorted(
            f["path"] for f in store._version_row(h2.version).get("files") or []
        )
        assert carried == base_files, "MOR delete must not rewrite data files"
        n_deleted = store._version_row(0)["n_rows"] - h2.count()
        out = h2.df.agg(
            F.count(F.lit(1)).alias("n_live"),
            F.lit(n_deleted).cast("long").alias("n_deleted"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderdate").alias("min_date"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_domain_cap(spark, sf_dir):
    """Per-source document quota (C4-style domain cap): keep the best 20
    docs per source by (n_chars desc, doc_id). Two-phase salted top-N —
    exact, and no single task ever sorts a whole hot domain. Aggregated
    per source for the hash gate."""
    from index_spark.operators.quota import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(
        docs,
        ["source"],
        20,
        [F.col("n_chars").desc(), F.col("doc_id")],
        id_col="doc_id",
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("doc_id").alias("min_doc"),
    )


def q_inverted_postings(spark, sf_dir):
    """Inverted-index build: per term (≥5 chars) its document frequency,
    total term count, and the first 10 doc_ids — bounded posting payload,
    exact counts. One shuffle on the term."""
    from index_spark.operators.postings import build_postings

    docs = load_table(spark, sf_dir, "documents")
    p = build_postings(docs, max_postings=10)
    # joined string, not a raw array: the driver's pandas canonicalizer
    # sorts/hashes values and cannot hash a list (same trap q_array_agg
    # documents); postings are already doc_id-sorted by build_postings
    return p.filter(F.length("term") >= 5).select(
        "term", "df", "tf_total",
        F.array_join(F.col("postings"), ",").alias("postings"),
    )


def q_boolean_retrieval(spark, sf_dir):
    """Conjunctive (AND) retrieval over the inverted term-doc edges:
    doc_ids containing every query term. The term filter pushes to the
    scan; only matching edges shuffle."""
    from index_spark.operators.postings import conjunctive_query

    docs = load_table(spark, sf_dir, "documents")
    hits = conjunctive_query(docs, ["vector", "stream", "window"])
    return hits.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def q_split_leakage(spark, sf_dir):
    """Train/val leakage audit: deterministic md5-fraction split, then
    near-dup (banded MinHash → exact Jaccard ≥ 0.5) pairs CROSSING the
    split — the eval-contamination check. Banding + split assignment are
    replayed literally in the oracle."""
    from index_spark.operators.splits import split_leakage

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).unionByName(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    pairs = split_leakage(docs, train_frac=0.9, threshold=0.5)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_leaks"),
        F.count_distinct("val_id").alias("n_val_docs"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
    )


def q_winsorized_stats(spark, sf_dir):
    """Robust per-group price stats: drop each priority class's top and
    bottom 1% by (price, orderkey) rank, aggregate the kept middle —
    rank-based so the kept set is an exact row subset in any engine.
    Prices as integer cents end-to-end (exact sums)."""
    from index_spark.operators.stats import winsorized_stats

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents"), "o_orderkey"
    )
    return winsorized_stats(
        orders, ["o_orderpriority"], "cents", "o_orderkey", trim_frac=0.01
    )


def q_equidepth_hist(spark, sf_dir):
    """Equi-depth 10-bin histogram of order totals (cents): ntile rank
    arithmetic, deterministic via the orderkey tie-break — the boundary
    profile a range partitioner derives."""
    from index_spark.operators.stats import equidepth_histogram

    orders = load_table(spark, sf_dir, "orders").select(
        _cents(F.col("o_totalprice")).alias("cents"), "o_orderkey"
    )
    # ntile emits IntegerType; the oracle's DuckDB ntile is BIGINT — cast
    # so the driver's type-sensitive value hash sees identical types
    return equidepth_histogram(orders, "cents", "o_orderkey", bins=10).withColumn(
        "bin", F.col("bin").cast("long")
    )


def q_kmv_groups(spark, sf_dir):
    """Per-event-type KMV distinct-user estimates (k=32): the grouped
    mergeable-sketch form — groups below k report exact counts. Every
    step is a deterministic expression the oracle replays."""
    from index_spark.operators.sampling import kmv_by_group

    events = load_table(spark, sf_dir, "events")
    return kmv_by_group(events, "event_type", "user_id", k=32)


def q_change_feed(spark, sf_dir):
    """Multi-version CDF (Delta table_changes shape): three commits, then
    one feed of every (key, change, version) step — churn rows only,
    carried files classified by writer-version without value reads. The
    oracle replays the three commits' algebra."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="cfq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=500)
        upd = orders.filter(
            (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 150)
        ).withColumn("o_totalprice", F.col("o_totalprice") + 1)
        ins = orders.filter(F.col("o_orderkey") <= 10).select(
            (F.col("o_orderkey") + 500000).alias("o_orderkey"), "o_totalprice"
        )
        h1 = h.insert(upd.unionByName(ins), upsert=True, version="cf-up")
        h2 = h1.delete_where(
            (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 510), version="cf-del"
        )
        feed = store.change_feed(0, h2.version).select(
            "o_orderkey", "change", "version"
        )
        return spark.createDataFrame(feed.collect(), feed.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_bloom_point(spark, sf_dir):
    """Manifest Bloom file skipping: after interleaved upserts overlap the
    file key ranges, fit per-file key blooms, then point-probe — the plan
    must open fewer files than the version holds (asserted), and results
    equal the plain pushdown get. Probes aggregate for the hash gate."""
    from index_spark.snapshots import SnapshotStore

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    d = tempfile.mkdtemp(prefix="bfq_")
    try:
        store = SnapshotStore(spark, d + "/idx")
        h = store.create(["o_orderkey"], df=orders, rows_per_partition=200)
        h1 = h.upsert_partial(
            [{"o_orderkey": 7, "o_totalprice": 1.0},
             {"o_orderkey": 1999, "o_totalprice": 2.0}]
        )
        store.build_blooms()
        head = store.at_version(h1.version)
        n_files = len(store._version_row(h1.version)["files"])
        probes = [7, 399, 801, 1202, 1603, 1999]
        parts = [head.read_point(p) for p in probes]
        assert all(len(pp.inputFiles()) < n_files for pp in parts), "no pruning"
        out = parts[0]
        for pp in parts[1:]:
            out = out.unionByName(pp)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderkey").alias("min_k"),
            F.max("o_orderkey").alias("max_k"),
        )
        return spark.createDataFrame(agg.collect(), agg.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_exact_quantiles(spark, sf_dir):
    """Exact multi-quantile over order totals WITHOUT a global sort: one
    bucket-count shuffle locates every target rank's bucket, then a
    bounded per-bucket rank reads the values — the multi-quantile
    generalization of the split_median two-level plan. percentile_disc
    semantics (value at rank ceil(q*n)); the oracle ranks the full column
    (fine at oracle scale)."""
    from index_spark.operators.stats import exact_quantiles

    orders = load_table(spark, sf_dir, "orders").select(
        _cents(F.col("o_totalprice")).alias("cents"), "o_orderkey"
    )
    return exact_quantiles(
        orders, "cents", "o_orderkey", [0.25, 0.5, 0.75, 0.95]
    )


def q_weighted_quantiles(spark, sf_dir):
    """Exact quantiles over a PRE-AGGREGATED (value, weight) table — the
    scale path for heavy-duplicate columns (l_quantity has a ~50-value
    domain over the whole lineitem table, so the raw-row two-level plan
    would concentrate whole values into single buckets; here each value
    is ONE weighted row). percentile_disc semantics over the expanded
    multiset; the oracle replays the cumulative-weight rank read."""
    from index_spark.operators.stats import exact_quantiles_weighted

    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").cast("long").alias("qty"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return exact_quantiles_weighted(li, "qty", "w", [0.25, 0.5, 0.9, 0.99]).select(
        "p", F.col("value").cast("long").alias("value")
    )


def q_bigram_nll(spark, sf_dir):
    """Perplexity-proxy one rung above `unigram_nll`: per-doc mean NLL
    under the corpus's add-1 bigram LM (the largest SQL-replayable prefix
    of CCNet's KenLM scorer). Bigrams explode map-side from the tokens
    array (no self-join); probabilities are exact BIGINT ratios inside
    one log; per-doc Σ folds left-to-right over the sorted contribution
    list, so the doubles replay bit-identically in the oracle."""
    from index_spark.operators.corpusstats import bigram_nll

    docs = load_table(spark, sf_dir, "documents")
    return bigram_nll(docs)


def q_zipf_fit(spark, sf_dir):
    """Zipf-law corpus health check: OLS of ln(freq) on ln(rank) over the
    top-1000 vocabulary. Top-N is a distributed TakeOrdered (no global
    vocab sort); the OLS sums fold over the rank-sorted ≤1000-element
    list. One row (n_terms, slope, intercept, r2)."""
    from index_spark.operators.corpusstats import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, top_n=1000)


def q_js_sources(spark, sf_dir):
    """Mixture-drift monitor: Jensen-Shannon divergence between the
    unigram distributions of two document sources. The corpus-wide Σ
    sums decimal(38,12)-rounded per-term contributions — exact integer
    arithmetic, combine-order-independent, no vocabulary-sized fold."""
    from index_spark.operators.corpusstats import js_divergence

    docs = load_table(spark, sf_dir, "documents")
    return js_divergence(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") == "src1"),
    )


def q_vocab_growth(spark, sf_dir):
    """Vocabulary-growth curve over a geometric doc-id ladder — exact
    integer (threshold, n_tokens, v_terms) rows. Per-token min-doc-id and
    per-doc token counts each explode only the ≤16 literal thresholds
    they satisfy (the quantile rank-read pattern: no range join, bounded
    fan-out)."""
    from index_spark.operators.corpusstats import vocab_growth

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth(docs, n_points=16)


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law OLS fit (ln V on ln N) over the vocab-growth curve —
    the vocabulary-exhaustion diagnostic; fold over ≤16 threshold-sorted
    points replays exactly in SQL."""
    from index_spark.operators.corpusstats import heaps_fit

    docs = load_table(spark, sf_dir, "documents")
    return heaps_fit(docs, n_points=16)


def q_ohlc_hourly(spark, sf_dir):
    """Per-event-type hourly OHLC resample: open/close via deterministic
    (ts, event_id) first/last ranks, high/low plain extrema — one
    exchange shared by the window and the groupBy. Filtered to hours with
    >= 3 events to keep the result compact."""
    from index_spark.operators.timeseries import ohlc_hourly

    ev = load_table(spark, sf_dir, "events")
    return ohlc_hourly(ev).filter(F.col("n") >= 3)


def q_span_trim(spark, sf_dir):
    """Duplicate-SPAN REMOVAL (Lee et al. dedup applied, not just
    counted): tokens inside any corpus-duplicated 5-gram are dropped and
    the survivors re-join in order — all relational (positions + 60-bit
    hashes shuffle; no per-doc loops). Clean text verified by md5 so the
    reconstruction itself hash-gates. Sampled to doc_id % 7 == 0."""
    from index_spark.operators.spans import trim_duplicate_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    out = trim_duplicate_spans(corpus, k=5)
    return out.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        "n_kept",
        "n_removed",
    )


def q_sharded_mor_delete(spark, sf_dir):
    """Merge-on-read delete across a SHARDED logical index: every shard
    writes only a key-tombstone sidecar behind one atomic catalog swap —
    a logical predicate delete over N range-disjoint stores with zero
    data files rewritten anywhere. The read path subtracts per-shard
    tombstones; the oracle recomputes survivors from base algebra."""
    from index_spark.sharded import ShardedIndex

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderkey") < 12_000)
    )
    d = tempfile.mkdtemp(prefix="shmq_")
    try:
        sh = ShardedIndex.create(
            spark, d + "/sh", ["o_orderkey"], orders, n_shards=4,
            rows_per_partition=500_000,
        )
        changed = sh.delete_where(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("date"), mor=True
        )
        assert changed, "expected at least one shard to tombstone rows"
        out = sh.in_order().groupBy().agg(
            F.count(F.lit(1)).alias("n_live"),
            _sum_cents(F.col("o_totalprice"), "total"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderkey").alias("max_key"),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-rmtree
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_set_join_exact(spark, sf_dir):
    """EXACT set-similarity join (prefix filtering, PPJoin family): all
    document pairs with token-set Jaccard >= 0.5, recall 1.0 — the exact
    counterpart of the LSH near-dup path for when banding's probabilistic
    misses are unacceptable. Candidates come only from shared RARE-prefix
    tokens under one global (df, token) order; the oracle recomputes every
    pair brute-force, so any prefix-filter miss would hash-mismatch."""
    from index_spark.operators.setjoin import jaccard_join_exact

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return jaccard_join_exact(docs, threshold=0.5)


def q_containment_pairs(spark, sf_dir):
    """EXACT set-containment join (asymmetric near-dup): ordered pairs
    where ≥90% of A's token set lies inside B's — the quoted/embedded-
    document case symmetric Jaccard misses. A-prefix ⋈ B-full-postings
    candidates under the shared rarity-rank substrate; the oracle
    recomputes every ordered pair brute-force, so a prefix-filter recall
    miss hash-mismatches."""
    from index_spark.operators.setjoin import containment_join_exact

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return containment_join_exact(docs, threshold=0.9)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct users per event type — the constant-memory
    mergeable twin of `kmv_groups` (KMV keeps k hashes; HLL keeps 2^p
    register maxima, so sketch size is independent of BOTH data volume
    and cardinality). Registers, harmonic total, and the estimate are
    deterministic md5/integer arithmetic; the oracle replays every
    register and the same double formula (sql_hll_estimate — generated
    from the SAME constants, so the engines cannot drift)."""
    from index_spark.operators.sampling import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    return hll_estimate(hll_registers(ev, "user_id", ("event_type",)), ("event_type",))


def q_cohort_retention(spark, sf_dir):
    """Daily cohort retention triangle over the events table: users
    cohorted by the epoch-anchored day of their first event; each
    (cohort, offset) row counts still-active members and the retention
    rate vs the cohort's size. Events collapse to distinct (user, day)
    in the FIRST aggregate — nothing downstream is per-event — and no
    count(DISTINCT) window appears anywhere. (Daily units give the
    fixtures a real triangle; at corpus scale pass unit_days=7/30.)"""
    from index_spark.operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, unit_days=1)


def q_priority_trend(spark, sf_dir):
    """Per-priority revenue trend: OLS slope/intercept/r² of daily order
    revenue (exact integer cents) on the day number, per order priority —
    ONE aggregate of exact decimal sufficient statistics per group
    (grouped_linear_trend), closed-form doubles only at the very end.
    The day pre-aggregate keeps x/y magnitudes small and point counts
    bounded by the calendar."""
    from index_spark.operators.stats import grouped_linear_trend

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).cast("long").alias("x"),
            _cents(F.col("o_totalprice")).alias("__c"),
        )
        .groupBy("o_orderpriority", "x")
        .agg(F.sum("__c").alias("y"))
    )
    return grouped_linear_trend(daily, ["o_orderpriority"], "x", "y")


def q_stream_hll(spark, sf_dir):
    """Streaming twin of `hll_distinct`: HLL registers maintained as
    streaming max-aggregation state (bounded at groups × 2^p rows
    forever), drained with availableNow, then estimated in batch — the
    SAME oracle as the batch query, so the streaming fold is
    hash-gated against the exact SQL replay."""
    import uuid as _uuid

    from index_spark.operators.sampling import hll_estimate
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import (
        EVENT_TYPE_CATALOG_BOUND,
        events_footer_stats,
        hll_registers_stream,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir)
    # HLL state is bounded at groups × 2^p registers (p=10 default) and,
    # like any grouped agg, by input rows — both known pre-drain.
    n_rows, _ = events_footer_stats(sf_dir)
    regs = run_available_now(
        hll_registers_stream(stream), "sl" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(
            min(EVENT_TYPE_CATALOG_BOUND * (1 << 10), n_rows)
        ),
    )
    return hll_estimate(regs, ("event_type",))


def q_corr_lineitem(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the lineitem numeric
    facets (quantity, price, discount, tax — all as exact integer
    cents/units): ONE aggregate of exact decimal sufficient statistics
    for all 6 pairs, then a map-side explode of the pair structs —
    nothing after the single partial-agg shuffle touches data."""
    from index_spark.operators.stats import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
        _cents(F.col("l_discount")).alias("disc_c"),
        _cents(F.col("l_tax")).alias("tax_c"),
    )
    return correlation_matrix(li, ["qty", "price_c", "disc_c", "tax_c"])


def q_mad_outliers(spark, sf_dir):
    """Per-priority robust outlier screen on order value: exact discrete
    median, exact MAD, and the |v−med| > 3·MAD count — all windows over
    ONE group-key exchange (two in-partition sorts, no joins), values as
    exact integer cents so median/MAD replay exactly in SQL."""
    from index_spark.operators.stats import mad_outlier_stats

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents")
    )
    return mad_outlier_stats(orders, ["o_orderpriority"], "cents", k=3.0)


def q_chi2_events(spark, sf_dir):
    """Chi-squared independence of event type × hour-of-day (epoch-hour
    mod 24 — pure integer arithmetic, timezone-free): contingency cells
    from one hash-agg, the full |A|×|B| grid from the marginal cross
    product (absent cells still contribute E), per-cell contributions
    quantized to e-12 integers and BIGINT-summed (the js_divergence
    quantizer), one-row output with Cramér's V."""
    from index_spark.operators.stats import chi2_independence

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.expr("ts_us div 3600000000"), F.lit(24)).alias("hod"),
    )
    return chi2_independence(ev, "event_type", "hod")


def q_acf_hourly(spark, sf_dir):
    """Per-type autocorrelogram of the hourly event-count series (lags
    1/2/3/24): exact integer sufficient statistics over the zero-filled
    calendar — the n²-scaled estimator clears every fraction, so the
    only double is the final division. One hash-agg, one conditional
    (group, lag) re-aggregation, ONE equi self-join on (type, hour−k)
    for all lags."""
    from index_spark.operators.timeseries import acf_series

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    return acf_series(counts, ["event_type"], "h", "x", [1, 2, 3, 24])


def q_cusum_events(spark, sf_dir):
    """Per-type CUSUM change-point over the hourly event-count series:
    max deviation of cumulative mass from the uniform-in-time line,
    exact n·S_n-scaled integers until the final division; the sparse
    endpoint trick means zero hours never materialize (|D| is convex
    across a gap, so gap maxima sit at observed-bucket boundaries)."""
    from index_spark.operators.timeseries import cusum_changepoint

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    return cusum_changepoint(counts, ["event_type"], "h", "x")


def q_gini_orders(spark, sf_dir):
    """Revenue concentration per order priority: exact-integer Gini over
    order value in cents (rank formulation — tie-order-invariant), one
    group-key exchange for rank window + final aggregate."""
    from index_spark.operators.stats import gini_concentration

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents")
    )
    return gini_concentration(orders, ["o_orderpriority"], "cents")


def q_benford_prices(spark, sf_dir):
    """First-significant-digit profile of extended price (integer cents)
    vs Benford's law — always exactly 9 rows (absent digits at n = 0);
    one projection + one 9-bucket hash-agg over the table."""
    from index_spark.operators.stats import benford_profile

    li = load_table(spark, sf_dir, "lineitem").select(
        _cents(F.col("l_extendedprice")).alias("cents")
    )
    return benford_profile(li, "cents")


def q_stream_cms(spark, sf_dir):
    """Streaming twin of the count-min sketch: cells maintained as
    streaming COUNT state (bounded at depth×width rows forever), drained
    with availableNow, then probed for the top-10 heavy users — the
    estimates hash-gate against the exact SQL hash replay, so the
    streaming fold is bit-verified like the batch build."""
    import uuid as _uuid

    from index_spark.operators.sampling import cms_estimate
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import cms_cells_stream

    from index_spark.streaming.events import stream_state_partitions

    stream = read_events_stream(spark, sf_dir)
    # CMS state is EXACTLY depth × width cells forever — the one drain
    # whose state cardinality is a pure operator constant.
    from index_spark.operators.sampling import CMS_DEPTH, CMS_WIDTH

    cells = run_available_now(
        cms_cells_stream(stream, "user_id"), "sc" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(CMS_DEPTH * CMS_WIDTH),
    )
    ev = load_table(spark, sf_dir, "events")
    true_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    probes = true_counts.orderBy(F.col("true_n").desc(), F.col("user_id").asc()).limit(10)
    est = cms_estimate(cells, probes.select("user_id"), "user_id")
    return probes.join(est, "user_id").select(
        "user_id", "true_n", "est_n", (F.col("est_n") - F.col("true_n")).alias("overcount")
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights of every non-src0 document against the
    src0 target distribution: hashed-bigram (md5-prefix60 mod 256)
    add-1-smoothed bucket distributions, per-doc Σ count·ln(p_t/p_r) as a
    sorted left-to-right fold — the Xie et al. 2023 data-selection scorer
    with every step SQL-replayable."""
    from index_spark.operators.selection import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(docs, "src0", n_buckets=256)


def q_stream_hll_hourly(spark, sf_dir):
    """Windowed streaming HLL: per-HOUR distinct-user sketches
    maintained as streaming max-register state (integer epoch-hour
    grouping — the register fold per (hour, register) is the same
    max-monoid as `stream_hll`, extended to a time dimension), drained
    and estimated in batch against the hour-grouped batch oracle."""
    import uuid as _uuid

    from index_spark.operators.sampling import hll_estimate
    from index_spark.streaming import read_events_stream, run_available_now
    from index_spark.streaming.events import (
        events_footer_stats,
        hll_registers_stream,
        stream_state_partitions,
    )

    stream = read_events_stream(spark, sf_dir).select(
        F.expr("ts_us div 3600000000").alias("hour_idx"), "user_id"
    )
    # per-hour register state ≤ min(span_hours × 2^p, input rows): each
    # input row touches one (hour, register) cell, so sparse hours never
    # materialize their full register file — both bounds from footers.
    n_rows, span_h = events_footer_stats(sf_dir)
    regs = run_available_now(
        hll_registers_stream(stream, "user_id", "hour_idx"),
        "sh" + _uuid.uuid4().hex[:10],
        shuffle_partitions=stream_state_partitions(
            min(span_h * (1 << 10), n_rows) if span_h else n_rows
        ),
    )
    return hll_estimate(regs, ("hour_idx",))


def q_conversion_ab(spark, sf_dir):
    """A/B read-out over a deterministic user split (user_id parity as
    the arm): does arm A purchase more often than arm B? One aggregate
    to exact per-arm (n, k), a fixed double expression for rates and
    the two-proportion z — the experiment-analysis primitive."""
    from index_spark.operators.stats import two_proportion_ztest

    ev = load_table(spark, sf_dir, "events")
    units = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", True).otherwise(False)).alias(
                "converted"
            )
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "arm_even").otherwise("arm_odd").alias("arm"),
            "converted",
        )
    )
    return two_proportion_ztest(units, "arm", "converted")


def q_psi_drift(spark, sf_dir):
    """Population Stability Index of order value between the pre-1997
    baseline and the 1997+ current period: decile buckets FROZEN on the
    reference quantiles (computed scale-safe via the two-level
    exact-quantile plan, embedded as literal edges), add-1-smoothed
    shares, e-12 quantized BIGINT Σ — the standard model-monitoring
    drift number, exactly replayable."""
    from index_spark.operators.stats import psi_drift

    orders = load_table(spark, sf_dir, "orders").select(
        _cents(F.col("o_totalprice")).alias("cents"), "o_orderdate"
    )
    ref = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    cur = orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
    return psi_drift(ref, cur, "cents")


def q_mix_corpus(spark, sf_dir):
    """Training-mixture allocation over the document sources: the
    largest-remainder split of a 300-doc target across 20 weighted
    sources — all integer arithmetic (Σ n_alloc == n_target exactly),
    one data-sized hash-agg then pure small-frame math."""
    from index_spark.operators.sampling import mix_allocate

    docs = load_table(spark, sf_dir, "documents")
    return mix_allocate(docs, "source", _MIX_WEIGHTS, _MIX_TARGET)


def q_reconcile_totals(spark, sf_dir):
    """Cross-table aggregate reconciliation audit — the warehouse
    invariant check that fk_violations (key containment) cannot see:
    does each order's header total equal the sum of its line charges
    (ext·(1−disc)·(1+tax), rounded to cents per line)? One line-level
    aggregate, one left join, one conditional rollup; the report counts
    headers with no lines and with mismatched totals (this synthetic
    fixture reconciles nothing — 257 lineless orders, 100% mismatch —
    which is precisely what the audit is for)."""
    li = load_table(spark, sf_dir, "lineitem")
    chg = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
    ).cast("long")
    per_order = li.groupBy("l_orderkey").agg(F.sum(chg).alias("__chg"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("__tot")
    )
    j = o.join(per_order, o["o_orderkey"] == per_order["l_orderkey"], "left")
    has = F.col("__chg").isNotNull()
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).cast("long").alias("n_no_lines"),
        F.sum(F.when(has & (F.col("__tot") != F.col("__chg")), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatch"),
        F.max(F.when(has, F.abs(F.col("__tot") - F.col("__chg")))).alias("max_abs_diff"),
    )


def q_event_lift(spark, sf_dir):
    """User-level market-basket lift between event types: one exact
    integer fraction (n_ab·U)/(n_a·n_b) per co-occurring pair, distinct
    (user, type) collapsed in the first aggregate, pair generation via
    an equi self-join on the user key (C(k,2) per user, k bounded by
    the type vocabulary)."""
    from index_spark.operators.funnel import event_cooccurrence_lift

    return event_cooccurrence_lift(load_table(spark, sf_dir, "events"))


def q_conversion_latency(spark, sf_dir):
    """Time-to-convert distribution (first view → first purchase):
    integer min-aggregates per user, exact discrete p50/p90 of the
    latency set — the HOW-FAST companion to the funnel's HOW-MANY."""
    from index_spark.operators.funnel import conversion_latency

    return conversion_latency(
        load_table(spark, sf_dir, "events"), "view", "purchase", ps=(0.5, 0.9)
    )


def q_hll_intersect(spark, sf_dir):
    """HLL sketch algebra: distinct-user overlap of two event types by
    inclusion-exclusion over three constant-memory sketches (|A| + |B| −
    |A∪B|, clamped at 0) — the audience-overlap question answered from
    2^p registers per side instead of a distinct-pair join. All three
    estimates replay exactly in SQL (sql_hll_estimate), so even the
    sketch ERROR is deterministic and hash-gated."""
    from index_spark.operators.sampling import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    def est(pred, alias):
        return hll_estimate(hll_registers(ev.filter(pred), "user_id")).select(
            F.col("est_distinct").alias(alias)
        )

    ea = est(F.col("event_type") == "click", "est_a")
    eb = est(F.col("event_type") == "purchase", "est_b")
    eu = est(F.col("event_type").isin("click", "purchase"), "est_union")
    return (
        ea.crossJoin(eb).crossJoin(eu)  # three 1-row frames
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
            ).cast("long").alias("est_intersection"),
        )
    )


def q_cluster_size_hist(spark, sf_dir):
    """Duplicate-cluster size distribution — the dedup health report
    (how much mass sits in big near-dup families vs singletons): LSH
    pairs → connected components → per-cluster size → histogram, with
    docs touching no pair counted as size-1 clusters via an anti-join.
    Everything after the CC is two tiny aggregates."""
    from index_spark.operators.graph import connected_components

    docs = _docs_with_near_dups(spark, sf_dir)
    pairs = DD.minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=MINHASH_N, bands=MINHASH_BANDS
    )
    cc = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    singles = (
        docs.select("doc_id")
        .join(cc.select(F.col("id").alias("doc_id")), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(1).cast("long").alias("cluster_size"), F.col("cnt"))
    )
    return (
        hist.unionByName(singles)
        .filter(F.col("cnt") > 0)
        .groupBy("cluster_size")
        .agg(F.sum("cnt").cast("long").alias("n_clusters"))
    )


def q_theilsen_orders(spark, sf_dir):
    """Theil–Sen robust weekly-revenue trend per priority (the outlier-
    proof companion of `priority_trend`'s OLS): slope = exact discrete
    median of all pairwise week-slopes, intercept = median residual at
    that slope. Weekly grain keeps the O(n²) pairwise set calendar-
    bounded at ~350 points/group (~61k pairs — the estimator's cost
    class, exercised without dominating the bench); the pair join is
    equi on the group key."""
    from index_spark.operators.stats import theilsen_trend

    o = load_table(spark, sf_dir, "orders")
    weekly = (
        o.select(
            F.col("o_orderpriority"),
            F.expr(
                "datediff(to_date(o_orderdate), date'1992-01-01') div 7"
            ).cast("long").alias("x"),
            _cents(F.col("o_totalprice")).alias("__c"),
        )
        .groupBy("o_orderpriority", "x")
        .agg(F.sum("__c").alias("y"))
    )
    return theilsen_trend(weekly, ["o_orderpriority"], "x", "y")


def q_bigram_entropy(spark, sf_dir):
    """Corpus conditional entropy H(W2|W1) in nats — the sequence-level
    redundancy diagnostic (template floods collapse it while unigram
    entropy stays high); vocabulary-sized Σ via the e-12 quantized
    BIGINT sum, one-row output."""
    from index_spark.operators.corpusstats import bigram_cond_entropy

    return bigram_cond_entropy(load_table(spark, sf_dir, "documents"))


def q_pmi_pairs(spark, sf_dir):
    """Top-20 adjacent-word collocations by PMI (min count 5) — exact
    integer fraction (c12·N1²)/(N2·c1·c2) in decimal/HUGEINT, doubles
    only at the final ln; top-k is TakeOrderedAndProject on the rounded
    score with a (w1, w2) tie-break."""
    from index_spark.operators.corpusstats import pmi_top_pairs

    docs = load_table(spark, sf_dir, "documents")
    return pmi_top_pairs(docs, top_k=20, min_count=5)


def q_source_overlap(spark, sf_dir):
    """Cross-source 5-gram overlap matrix: distinct shared word 5-grams
    per source pair (60-bit md5 hashes — the KMV convention, collision-
    free in practice where the 28-bit MinHash prefix would inflate
    counts). The no-reference-set contamination heat map."""
    from index_spark.operators.decontam import source_ngram_overlap

    docs = load_table(spark, sf_dir, "documents")
    return source_ngram_overlap(docs, k=5)


def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic between early and
    late order cohorts on total price (integer cents): the standard
    distribution-shift check between two snapshots of a table. CDF gaps
    are exact-input double divisions, so D replays bit-identically."""
    from index_spark.operators.stats import ks_drift

    orders = load_table(spark, sf_dir, "orders").select(
        _cents(F.col("o_totalprice")).alias("cents"), "o_orderdate"
    )
    early = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    late = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
    return ks_drift(early, late, "cents")


def q_interval_overlap(spark, sf_dir):
    """Pure interval overlap join (no equi-key): per-user click activity
    spans x per-user purchase activity spans, ALL cross-user overlapping
    pairs. Scalable bin-replication shape — explode each interval to the
    time bins it touches, equi-join on the bin, residual overlap check,
    first-shared-bin dedup (PBSM grid trick) — where the naive plan is a
    broadcast nested loop. The oracle recomputes every pair brute-force."""
    from index_spark.operators.interval import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")

    def spans(et, mod):
        return (
            ev.filter((F.col("event_type") == et) & (F.col("user_id") % mod == 0))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias("s"), (F.max("ts_us") + 1).alias("e"))
        )

    out = interval_overlap_join(
        spans("click", 10), spans("purchase", 7), bin_width=7 * 24 * 3_600_000_000
    )
    return out.select(
        F.col("a_user_id").alias("a_user"),
        "a_s",
        "a_e",
        F.col("b_user_id").alias("b_user"),
        "b_s",
        "b_e",
    )


def q_skyline_parts(spark, sf_dir):
    """Pareto frontier of the part table minimizing (retail price cents,
    size): the multi-objective "best tradeoffs" query (Borzsonyi 2001),
    as one shuffle + a distinct-x-sized prefix-min table — no self-join,
    no block-nested loop. The oracle re-derives dominance with the same
    two-minima decomposition in SQL."""
    from index_spark.operators.skyline import skyline2d

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        _cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    return skyline2d(part, "price_c", "size").select("p_partkey", "price_c", "size")


def q_edit_distance_join(spark, sf_dir):
    """Exact Levenshtein<=1 self-join over customer names via q-gram
    count filtering (Gravano 2001): candidates only from shared 2-grams
    within the length filter, never an all-pairs scan; the oracle
    recomputes every pair brute-force with DuckDB's levenshtein()."""
    from index_spark.operators.setjoin import edit_distance_join

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return edit_distance_join(cust, k=1, text_col="c_name", id_col="c_custkey")


def build_oracles() -> dict[str, str]:
    rev_cents = f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})"
    dup_docs = (
        "SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0"
    )
    near_docs = (
        "SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 200000, text || ' zz tail marker' FROM documents WHERE doc_id % 25 = 0"
    )
    fp = f"md5({SQL_NORM})"
    jacc = (
        "round(CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
        " / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1), 6)"
    )
    # bloom double-hash helpers (Kirsch-Mitzenmacher): h1/h2 from md5
    # prefixes of the key's string form, h2 forced odd; replicated from
    # operators/bloom.py so membership (incl. false positives) replays.
    def _sql_bloom_h(key: str) -> str:
        return (
            f"('0x'||substr(md5({key}),1,7))::BIGINT AS h1, "
            f"(('0x'||substr(md5({key}||'#'),1,7))::BIGINT | 1) AS h2"
        )

    out = {
        # --- round-3 batch 2: pipeline + analytics operators
        "dup_span_stats": (
            f"WITH t AS (SELECT doc_id, {SQL_TOKS_LOWER} AS w FROM documents), "
            "g AS (SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS g "
            "  FROM t, UNNEST(range(1, greatest(len(w)-3, 1))) AS r(i) WHERE len(w) >= 5), "
            "h AS (SELECT doc_id, ('0x'||substr(md5(g),1,15))::BIGINT AS h FROM g), "
            "pd AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY 1,2), "
            "corpus AS (SELECT h, CAST(sum(c) AS BIGINT) AS tot FROM pd GROUP BY 1) "
            "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_spans, "
            "CAST(sum(CASE WHEN tot>=2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_spans, "
            "round(CAST(sum(CASE WHEN tot>=2 THEN c ELSE 0 END) AS DOUBLE)"
            "/CAST(sum(c) AS DOUBLE), 6) AS dup_frac "
            "FROM pd JOIN corpus USING(h) GROUP BY 1"
        ),
        "bloom_prune_join": (
            "WITH build AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS bk "
            "  FROM customer WHERE c_acctbal > 9000), "
            f"h AS (SELECT bk, {_sql_bloom_h('bk')} FROM build), "
            "bits AS (SELECT DISTINCT (h1 + i*h2) % 1024 AS pos FROM h, range(0,3) r(i)), "
            f"ph AS (SELECT o_orderkey, {_sql_bloom_h('CAST(o_custkey AS VARCHAR)')} FROM orders), "
            "pp AS (SELECT o_orderkey, (h1 + i*h2) % 1024 AS pos FROM ph, range(0,3) r(i)), "
            "passed AS (SELECT o_orderkey FROM pp JOIN bits USING(pos) "
            "  GROUP BY o_orderkey HAVING count(*) = 3), "
            "tm AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM orders "
            "  JOIN (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000) b "
            "  ON o_custkey = c_custkey), "
            "pa AS (SELECT CAST(count(*) AS BIGINT) AS n_pass, "
            "  CAST(sum(o_orderkey) AS BIGINT) AS pass_key_sum FROM passed) "
            "SELECT n_pass, n_true, CAST(n_pass - n_true AS BIGINT) AS n_false_pos, "
            "pass_key_sum FROM pa, tm"
        ),
        "unigram_nll": (
            f"WITH terms AS (SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS t FROM documents), "
            "tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY 1,2), "
            "vocab AS (SELECT t, CAST(sum(tf) AS BIGINT) AS n_w FROM tf GROUP BY 1), "
            "tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM vocab), "
            "c AS (SELECT doc_id, tf, CAST(tf AS DOUBLE) * "
            "  ln(CAST(n_w AS DOUBLE)/CAST(n_total AS DOUBLE)) AS c "
            "  FROM tf JOIN vocab USING(t), tot) "
            "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
            "round(-list_sum(list(c ORDER BY c)) / CAST(sum(tf) AS DOUBLE), 6) AS nll "
            "FROM c GROUP BY 1"
        ),
        "funnel_steps": (
            "WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
            "  WHERE event_type='view' GROUP BY 1), "
            "t2 AS (SELECT e.user_id, min(epoch_us(ts)) AS t FROM events e JOIN t1 USING(user_id) "
            "  WHERE event_type='click' AND epoch_us(ts) > t1.t GROUP BY 1), "
            "t3 AS (SELECT e.user_id, min(epoch_us(ts)) AS t FROM events e JOIN t2 USING(user_id) "
            "  WHERE event_type='purchase' AND epoch_us(ts) > t2.t GROUP BY 1) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS step1_users, "
            "(SELECT CAST(count(*) AS BIGINT) FROM t2) AS step2_users, "
            "(SELECT CAST(count(*) AS BIGINT) FROM t3) AS step3_users, "
            "CASE WHEN (SELECT count(*) FROM t1) > 0 THEN "
            "round((SELECT CAST(count(*) AS DOUBLE) FROM t2)/(SELECT count(*) FROM t1), 6) END AS conv_2, "
            "CASE WHEN (SELECT count(*) FROM t2) > 0 THEN "
            "round((SELECT CAST(count(*) AS DOUBLE) FROM t3)/(SELECT count(*) FROM t2), 6) END AS conv_3"
        ),
        "first_seen_users": (
            "WITH f AS (SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day "
            "  FROM events GROUP BY 1,2), "
            "d AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1,2) "
            "SELECT event_type, strftime(day, '%Y-%m-%d') AS day, new_users, "
            "CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users "
            "FROM d"
        ),
        "pagerank_parts": (
            "WITH pairs AS (SELECT DISTINCT 'p'||l_partkey AS a, 's'||l_suppkey AS b FROM lineitem), "
            "edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs), "
            "nodes AS (SELECT DISTINCT src AS node FROM edges), "
            "nn AS (SELECT count(*) AS n FROM nodes), "
            "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1), "
            "r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes, nn), "
            + "".join(
                f"i{j} AS (SELECT e.dst AS node, sum(r.rank // d.deg) AS s FROM edges e "
                f"  JOIN r{j - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1), "
                f"r{j} AS (SELECT n.node, (1000000000000 * 15) // (100 * nn.n) "
                f"  + (85 * coalesce(s, 0)) // 100 AS rank "
                f"  FROM nodes n LEFT JOIN i{j} ON n.node = i{j}.node, nn), "
                for j in (1, 2, 3)
            ).rstrip(", ")
            + " SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 "
            "ORDER BY rank DESC, node LIMIT 10"
        ),
        "profile_orders": " UNION ALL ".join(
            f"SELECT '{name}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({expr}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct, "
            f"CAST(min({expr}) AS VARCHAR) AS min_val, "
            f"CAST(max({expr}) AS VARCHAR) AS max_val FROM orders"
            for name, expr in [
                ("o_orderkey", "o_orderkey"),
                ("o_custkey", "o_custkey"),
                ("o_orderstatus", "o_orderstatus"),
                ("o_orderpriority", "o_orderpriority"),
                ("o_totalprice_cents", _sql_cents("o_totalprice")),
                ("o_orderdate_us", "epoch_us(o_orderdate)"),
            ]
        ),
        "price_histogram": (
            f"WITH v AS (SELECT {_sql_cents('o_totalprice')} AS v FROM orders), "
            "b AS (SELECT greatest(0, least(9, (v * 10) // 50000000)) AS bucket FROM v) "
            "SELECT bucket, CAST(bucket * 5000000 AS BIGINT) AS lo_edge, "
            "CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1"
        ),
        "pii_redaction": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS nums_redacted, "
            "CAST(sum(len(props) - len(regexp_replace(props, '[0-9]+', '<NUM>', 'g'))) AS BIGINT) "
            "AS chars_delta FROM events GROUP BY 1"
        ),
        "q4_priority_exists": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01' "
            "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY 1"
        ),
        "q11_important_parts": (
            f"WITH pp AS (SELECT l_partkey, sum({_sql_cents('l_extendedprice')}) AS vc "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_1' GROUP BY 1), "
            "t AS (SELECT sum(vc) AS tc FROM pp) "
            "SELECT l_partkey, CAST(vc AS DOUBLE)/100 AS value "
            "FROM pp, t WHERE vc * 500 > tc"
        ),
        "q16_supplier_counts": (
            "SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_type <> 'PROMO' AND p_brand NOT IN ('Brand#1', 'Brand#2') "
            "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY 1, 2"
        ),
        "q17_small_qty_revenue": (
            "WITH b AS (SELECT p_partkey, CAST(round(l_quantity*100) AS BIGINT) AS q, "
            "l_extendedprice FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand = 'Brand#3'), "
            "pa AS (SELECT p_partkey, sum(q) AS sq, count(*) AS n FROM b GROUP BY 1) "
            f"SELECT CAST(sum({_sql_cents('l_extendedprice')}) AS DOUBLE)/100 AS avg_yearly_base, "
            "CAST(count(*) AS BIGINT) AS n_lines "
            "FROM b JOIN pa USING (p_partkey) WHERE q * 2 * n < sq"
        ),
        "q20_volume_suppliers": (
            "WITH li96 AS (SELECT l_partkey, l_suppkey, "
            "CAST(round(l_quantity*100) AS BIGINT) AS q FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'), "
            "ps AS (SELECT l_partkey, l_suppkey, sum(q) AS sq FROM li96 GROUP BY 1, 2), "
            "pt AS (SELECT l_partkey, sum(sq) AS pq FROM ps GROUP BY 1), "
            "qual AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts "
            "FROM ps JOIN pt USING (l_partkey) WHERE sq * 2 > pq GROUP BY 1) "
            "SELECT s_suppkey, s_name, n_parts FROM supplier "
            "JOIN qual ON s_suppkey = l_suppkey "
            "ORDER BY n_parts DESC, s_suppkey ASC LIMIT 20"
        ),
        "q21_waiting_suppliers": (
            "WITH lo AS (SELECT l_orderkey, l_suppkey, "
            "CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
            "per_os AS (SELECT l_orderkey, l_suppkey, max(late) AS any_late "
            "FROM lo GROUP BY 1, 2), "
            "per_o AS (SELECT l_orderkey, count(*) AS n_supps, sum(any_late) AS n_late "
            "FROM per_os GROUP BY 1) "
            "SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM per_os JOIN per_o USING (l_orderkey) "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE any_late = 1 AND n_supps > 1 AND n_late = 1 "
            "GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey ASC LIMIT 20"
        ),
        "event_transitions": (
            "WITH p AS (SELECT user_id, "
            "lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS from_type, "
            "event_type AS to_type FROM events), "
            "c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n "
            "FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2) "
            "SELECT from_type, to_type, n, "
            "round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob "
            "FROM c"
        ),
        "label_centroids": (
            "WITH e AS (SELECT label, vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "g AS (SELECT label, count(*) AS n, list(v ORDER BY vec_id) AS l FROM e GROUP BY 1), "
            "c AS (SELECT label, ["
            + ", ".join(
                f"round(list_sum(list_transform(l, x -> x[{i + 1}])) / n, 6)"
                for i in range(64)
            )
            + "] AS c FROM g) "
            "SELECT a.label AS la, b.label AS lb, "
            f"round({_sql_cosine('a.c', 'b.c')}, 6) AS cos "
            "FROM c a JOIN c b ON a.label < b.label"
        ),
        "kmv_union": (
            "WITH sa AS (SELECT frac FROM (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) / 1152921504606846976.0 AS frac FROM orders) ORDER BY frac LIMIT 64), "
            "sb AS (SELECT frac FROM (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) / 1152921504606846976.0 AS frac FROM customer) ORDER BY frac LIMIT 64), "
            "mu AS (SELECT frac FROM (SELECT DISTINCT frac FROM (SELECT frac FROM sa UNION ALL SELECT frac FROM sb)) ORDER BY frac LIMIT 64) "
            "SELECT "
            "(SELECT CAST(CASE WHEN count(*) < 64 THEN count(*) ELSE round((count(*) - 1) / max(frac)) END AS BIGINT) FROM sa) AS est_orders, "
            "(SELECT CAST(CASE WHEN count(*) < 64 THEN count(*) ELSE round((count(*) - 1) / max(frac)) END AS BIGINT) FROM sb) AS est_customers, "
            "(SELECT CAST(CASE WHEN count(*) < 64 THEN count(*) ELSE round((count(*) - 1) / max(frac)) END AS BIGINT) FROM mu) AS est_union, "
            "(SELECT round(max(frac), 9) FROM mu) AS kth_frac, "
            "(SELECT CAST(count(*) AS BIGINT) FROM mu) AS k"
        ),
        "triangle_parts": (
            "WITH lw AS (SELECT l_orderkey, l_partkey FROM lineitem "
            "  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'), "
            "e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b "
            "  FROM lw l1 JOIN lw l2 ON l1.l_orderkey = l2.l_orderkey "
            "  AND l1.l_partkey < l2.l_partkey), "
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
            "  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1), "
            "rk AS (SELECT node, deg, row_number() OVER (ORDER BY deg, node) AS rk FROM deg), "
            "er AS (SELECT CASE WHEN ra.rk < rb.rk THEN e.a ELSE e.b END AS u, "
            "  CASE WHEN ra.rk < rb.rk THEN e.b ELSE e.a END AS v, "
            "  CASE WHEN ra.rk < rb.rk THEN rb.rk ELSE ra.rk END AS rv "
            "  FROM e JOIN rk ra ON e.a = ra.node JOIN rk rb ON e.b = rb.node), "
            "w AS (SELECT w1.v AS x, w2.v AS y FROM er w1 JOIN er w2 "
            "  ON w1.u = w2.u AND w1.rv < w2.rv), "
            "t AS (SELECT count(*) AS n_tri FROM w "
            "  WHERE EXISTS (SELECT 1 FROM er WHERE er.u = w.x AND er.v = w.y)), "
            "tp AS (SELECT sum(deg * (deg - 1) // 2) AS triples FROM deg) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes, "
            "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges, "
            "(SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges, "
            "(SELECT CAST(n_tri AS BIGINT) FROM t) AS n_triangles, "
            "(SELECT round(3.0 * (SELECT n_tri FROM t) / triples, 6) FROM tp) AS clustering"
        ),
        "erase_roundtrip": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(o_orderkey) AS min_key, TRUE AS erased_everywhere "
            "FROM orders WHERE o_orderkey <= 3000 AND o_orderkey NOT IN (500, 1500)"
        ),
        "incremental_dedup": (
            "WITH batchdocs AS ("
            "  SELECT doc_id + 200000 AS doc_id, text || ' zz tail marker' AS text "
            "  FROM documents WHERE doc_id % 25 = 0 "
            "  UNION ALL SELECT doc_id + 300000, 'unique marker doc ' || doc_id "
            "  FROM documents WHERE doc_id % 25 = 7), "
            f"shc AS ({_sql_shingles('documents')}), "
            f"shb AS ({_sql_shingles('batchdocs')}), "
            f"sigc AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM shc), "
            f"sigb AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM shb), "
            "bandsc AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "           FROM sigc CROSS JOIN range(0, 8) t(b)), "
            "bandsb AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "           FROM sigb CROSS JOIN range(0, 8) t(b)), "
            "cand AS (SELECT DISTINCT nb.doc_id AS bid, c.doc_id AS cid "
            "         FROM bandsb nb JOIN bandsc c ON nb.b = c.b AND nb.h = c.h), "
            "sc AS (SELECT bid, CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            " / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) AS j "
            "       FROM cand JOIN shb s1 ON s1.doc_id = bid JOIN shc s2 ON s2.doc_id = cid), "
            "per AS (SELECT bid, CAST(count(*) AS BIGINT) AS n_candidates, max(j) AS bj "
            "        FROM sc GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(n_candidates, 0) AS n_candidates, "
            "round(bj, 6) AS best_jaccard, COALESCE(bj >= 0.5, FALSE) AS is_dup "
            "FROM batchdocs d LEFT JOIN per ON d.doc_id = per.bid"
        ),
        # --- reference surface
        "point_get": "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 1000",
        "multi_get": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey IN (3,141,592,653,589,793,238,462)",
        "get_all_missing": (
            "SELECT CAST(k AS BIGINT) AS requested_key FROM (VALUES (10),(20),(999999999)) t(k) "
            "WHERE k NOT IN (SELECT o_orderkey FROM orders)"
        ),
        "range_scan": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 200",
        "multi_get_large": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
            "FROM orders WHERE o_orderkey BETWEEN 1 AND 12000"
        ),
        "error_codes": (
            "SELECT probe, code FROM (VALUES "
            "('latest_before_create', 'INDEX_NOT_FOUND'), "
            "('create_twice', 'INDEX_ALREADY_EXISTS'), "
            "('dup_keys_in_batch', 'DUPLICATED_KEYS'), "
            "('update_missing_key', 'KEY_NOT_FOUND'), "
            "('stale_expected_version', 'VERSION_CHANGED'), "
            "('reused_write_handle', 'TX_NOT_STARTED'), "
            "('commit_race_loser', 'COMMIT_CONFLICT'), "
            "('temporal_missing', 'TEMPORAL_INDEX_NOT_FOUND')"
            ") t(probe, code)"
        ),
        "compact_files": (
            "WITH merged AS ("
            "  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 3000 "
            "  UNION ALL SELECT * FROM (VALUES "
            "    (-1, 1.0), (-2, 2.0), (-3, 3.0)"
            "  ) t(o_orderkey, o_totalprice)) "
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "TRUE AS files_shrank FROM merged"
        ),
        "sharded_time_travel": (
            "WITH base AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 2000), "
            "after AS (SELECT o_orderkey, CASE WHEN o_orderkey = 7 THEN 0.0 ELSE o_totalprice END "
            "          AS o_totalprice FROM base "
            "          UNION ALL SELECT -5, 5.0) "
            "SELECT 'before' AS era, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')} FROM base "
            "UNION ALL "
            "SELECT 'after', CAST(count(*) AS BIGINT), "
            f"{_sql_sum_cents('o_totalprice', 'total')} FROM after"
        ),
        "snapshot_diff": (
            "WITH doomed AS (SELECT o_orderkey FROM orders WHERE o_orderkey <= 3000 "
            "               ORDER BY o_orderkey LIMIT 2) "
            "SELECT o_orderkey, 'update' AS change FROM orders "
            "  WHERE o_orderkey <= 3000 AND o_orderkey % 211 = 0 "
            "  AND o_orderkey NOT IN (SELECT o_orderkey FROM doomed) "
            "UNION ALL SELECT * FROM (VALUES (-1, 'insert'), (-2, 'insert')) t(o_orderkey, change) "
            "UNION ALL SELECT o_orderkey, 'delete' FROM doomed"
        ),
        "seek_pagination": (
            "SELECT CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 50) + 1 AS INTEGER) AS page, "
            "o_orderkey FROM orders WHERE o_orderkey <= 600"
        ),
        "seek_pagination_df": (
            "WITH pg AS (SELECT CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 150) + 1 AS INTEGER) AS page, "
            "o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 600) "
            "SELECT page, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "max(o_orderkey) AS last_key FROM pg GROUP BY 1"
        ),
        "binary_key_range": (
            "SELECT hex(k) AS k_hex, doc_id FROM "
            "(SELECT unhex(md5(text)) AS k, doc_id FROM documents) "
            "WHERE k >= '\\x20'::BLOB AND k < '\\x28'::BLOB"
        ),
        "gt_scan": "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey > 14900",
        "lt_scan_reverse": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 50",
        "prefix_scan": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey = 42"
        ),
        "prefix_bounded_gt": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey = 42 AND l_linenumber > 2"
        ),
        "composite_range": (
            "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem "
            "WHERE (l_orderkey > 100 OR (l_orderkey = 100 AND l_linenumber >= 2)) "
            "AND (l_orderkey < 105 OR (l_orderkey = 105 AND l_linenumber < 3))"
        ),
        "top_k": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
        ),
        "next_key": "SELECT o_orderkey FROM orders WHERE o_orderkey > 777 ORDER BY o_orderkey LIMIT 1",
        "previous_key": "SELECT o_orderkey FROM orders WHERE o_orderkey < 777 ORDER BY o_orderkey DESC LIMIT 1",
        "min_max_count": (
            "SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key, "
            "CAST(count(*) AS BIGINT) AS n FROM orders"
        ),
        "split_median": (
            "SELECT o_orderkey AS median_key FROM "
            "(SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) rn, count(*) OVER () n FROM orders) "
            "WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)"
        ),
        "merge_halves": (
            "SELECT CAST(count(*) AS BIGINT) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key, "
            f"{_sql_sum_cents('o_totalprice', 'total')} FROM orders"
        ),
        "bucketed_join": (
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_items, "
            f"{_sql_sum_cents('l_extendedprice', 'revenue')} "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_custkey"
        ),
        "sharded_range": (
            "WITH final AS ("
            "  SELECT o_orderkey, CASE WHEN o_orderkey = 7 THEN 0.0 ELSE o_totalprice END AS o_totalprice "
            "  FROM orders WHERE o_orderkey < 12000"
            "  UNION ALL SELECT * FROM (VALUES (-1, 1.0), (10000000, 2.0)) t(o_orderkey, o_totalprice))"
            "SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents "
            "FROM final WHERE o_orderkey BETWEEN -10 AND 2000"
        ),
        # --- mutations
        "upsert_batch": (
            "WITH batch AS ("
            "  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice FROM orders WHERE o_orderkey % 97 = 0"
            "  UNION ALL SELECT * FROM (VALUES (-1, 0.0), (-2, 0.0), (-3, 0.0), (-4, 0.0), (-5, 0.0)) t(o_orderkey, o_totalprice)"
            "), final AS ("
            "  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)"
            "  UNION ALL SELECT * FROM batch)"
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, min(o_orderkey) AS min_key FROM final"
        ),
        "dup_key_check": (
            "SELECT l_orderkey, l_linenumber, CAST(count(*) AS BIGINT) AS n FROM lineitem "
            "GROUP BY 1, 2 HAVING count(*) > 1"
        ),
        "version_changed_check": (
            "SELECT o_orderkey, o_orderstatus AS current_version FROM orders "
            "WHERE o_orderkey < 100 AND o_orderstatus <> 'O'"
        ),
        # --- temporal
        "asof_lookup": f"SELECT max(epoch_us(ts)) AS as_of_ts_us FROM events WHERE epoch_us(ts) <= {T_ASOF_US}",
        "asof_state": (
            "SELECT user_id, event_id, value FROM ("
            "  SELECT user_id, event_id, value, row_number() OVER "
            "    (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) rn "
            f"  FROM events WHERE epoch_us(ts) <= {T_ASOF_US}) WHERE rn = 1"
        ),
        "asof_join_tolerance": (
            "SELECT p.event_id, "
            "  (SELECT max(epoch_us(s.ts)) FROM events s WHERE s.event_type = 'signup' "
            "   AND s.user_id = p.user_id AND epoch_us(s.ts) <= epoch_us(p.ts) AND epoch_us(s.ts) >= epoch_us(p.ts) - 259200000000) AS signup_ts_us "
            "FROM events p WHERE p.event_type = 'purchase'"
        ),
        "asof_join_events": (
            "SELECT p.event_id, "
            "  (SELECT max(epoch_us(s.ts)) FROM events s WHERE s.event_type = 'signup' "
            "   AND s.user_id = p.user_id AND epoch_us(s.ts) <= epoch_us(p.ts)) AS signup_ts_us "
            "FROM events p WHERE p.event_type = 'purchase'"
        ),
        "window_lag": (
            "SELECT event_id, lag(epoch_us(ts)) OVER "
            "  (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts_us "
            "FROM events WHERE user_id < 20"
        ),
        "events_hourly": (
            "SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type, "
            f"CAST(count(*) AS BIGINT) AS n, {_sql_sum_cents('value', 'total')} "
            "FROM events GROUP BY 1, 2"
        ),
        "sliding_window": (
            "SELECT start_us, event_type, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('value', 'total')} FROM ("
            "  SELECT epoch_us(date_trunc('hour', ts)) AS start_us, event_type, value FROM events"
            "  UNION ALL"
            "  SELECT epoch_us(date_trunc('hour', ts) - INTERVAL 1 HOUR), event_type, value FROM events"
            ") GROUP BY 1, 2"
        ),
        "sessionize": (
            "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions FROM ("
            "  SELECT user_id, CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000 THEN 1 ELSE 0 END new_s"
            "  FROM (SELECT user_id, ts, lag(epoch_us(ts)) OVER "
            "        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) prev FROM events)"
            ") GROUP BY user_id"
        ),
        # --- datoms
        "datoms_count_by_attr": (
            "SELECT 'part/p_name' AS a, CAST(count(*) AS BIGINT) AS n FROM part WHERE p_name IS NOT NULL "
            "UNION ALL SELECT 'part/p_brand', CAST(count(*) AS BIGINT) FROM part WHERE p_brand IS NOT NULL "
            "UNION ALL SELECT 'part/p_type', CAST(count(*) AS BIGINT) FROM part WHERE p_type IS NOT NULL "
            "UNION ALL SELECT 'part/p_size', CAST(count(*) AS BIGINT) FROM part WHERE p_size IS NOT NULL "
            "UNION ALL SELECT 'part/p_retailprice', CAST(count(*) AS BIGINT) FROM part WHERE p_retailprice IS NOT NULL"
        ),
        "datoms_avet_lookup": (
            "SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS e FROM part "
            "WHERE p_brand = (SELECT min(p_brand) FROM part)"
        ),
        "datoms_vaet_refchase": (
            "SELECT 'lineitem/l_partkey' AS a, CAST(count(*) AS BIGINT) AS n FROM lineitem "
            "WHERE l_partkey = (SELECT min(l_partkey) FROM lineitem)"
        ),
        "datoms_eavt_entity": (
            "WITH k AS (SELECT min(l_partkey) AS pk FROM lineitem), "
            "p AS (SELECT * FROM part, k WHERE p_partkey = k.pk) "
            "SELECT 'part/p_brand' AS a, p_brand AS v_text, CAST(NULL AS DOUBLE) AS v_num FROM p "
            "UNION ALL SELECT 'part/p_name', p_name, CAST(NULL AS DOUBLE) FROM p "
            "UNION ALL SELECT 'part/p_retailprice', CAST(NULL AS VARCHAR), CAST(p_retailprice AS DOUBLE) FROM p "
            "UNION ALL SELECT 'part/p_size', CAST(NULL AS VARCHAR), CAST(p_size AS DOUBLE) FROM p "
            "UNION ALL SELECT 'part/p_type', p_type, CAST(NULL AS DOUBLE) FROM p"
        ),
        # --- analytics
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            f"{_sql_sum_cents('l_extendedprice', 'sum_base_price')}, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS sum_disc_price, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)/count(*) AS avg_qty, "
            "CAST(count(*) AS BIGINT) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' GROUP BY 1, 2"
        ),
        "q3_revenue_topk": (
            "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
        ),
        "q5_nation_revenue": (
            "SELECT n_name, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY 1"
        ),
        "q6_filter_agg": (
            f"SELECT CAST(sum({_sql_cents('l_extendedprice')} * {_sql_cents('l_discount')}) AS DOUBLE)/10000 AS revenue, "
            "CAST(count(*) AS BIGINT) AS n FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
        ),
        "semi_join_priority": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count FROM orders "
            "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
            "GROUP BY 1"
        ),
        "anti_join_parts": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_unordered FROM part "
            "WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49) "
            "GROUP BY 1"
        ),
        "q13_custdist": (
            "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
            "  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
            "  FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1"
            ") GROUP BY 1"
        ),
        "q2_min_price_part": (
            f"WITH mn AS (SELECT p_brand AS b, min({_sql_cents('p_retailprice')}) AS min_cents "
            "FROM part GROUP BY 1) "
            "SELECT p_brand, min(p_partkey) AS p_partkey, "
            "CAST(min(min_cents) AS DOUBLE)/100 AS min_price "
            f"FROM part JOIN mn ON p_brand = b AND {_sql_cents('p_retailprice')} = min_cents "
            "GROUP BY 1"
        ),
        "q7_nation_volume": (
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS INTEGER) AS l_year, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "WHERE sn.n_name <> cn.n_name "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3"
        ),
        "q8_market_share": (
            "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            f"CAST(sum(CASE WHEN sn.n_name = 'NATION_2' THEN {rev_cents} ELSE 0 END) AS DOUBLE)"
            f" / CAST(sum({rev_cents}) AS DOUBLE) AS mkt_share "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN region ON cn.n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "WHERE r_name = 'ASIA' GROUP BY 1"
        ),
        "q9_red_parts_revenue": (
            "SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_name LIKE '%red%' GROUP BY 1, 2"
        ),
        "q10_returned_topk": (
            "SELECT c_custkey, c_name, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
        ),
        "q12_priority_class": (
            "SELECT l_returnflag, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1"
        ),
        "q14_promo_share": (
            f"SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {rev_cents} ELSE 0 END) AS DOUBLE)/10000 AS promo_revenue, "
            f"CAST(sum({rev_cents}) AS DOUBLE)/10000 AS total_revenue, "
            f"CAST(sum(CASE WHEN p_type = 'PROMO' THEN {rev_cents} ELSE 0 END) AS DOUBLE)"
            f" / CAST(sum({rev_cents}) AS DOUBLE) AS promo_share "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'"
        ),
        "q15_top_supplier": (
            f"WITH revs AS (SELECT l_suppkey, sum({rev_cents}) AS rc FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1) "
            "SELECT s_suppkey, s_name, CAST(rc AS DOUBLE)/10000 AS total_revenue "
            "FROM revs JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE rc = (SELECT max(rc) FROM revs)"
        ),
        "q18_large_orders": (
            "WITH big AS (SELECT l_orderkey, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY 1 HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250) "
            "SELECT c_custkey, c_name, o_orderkey, sum_qty, o_totalprice "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "q19_bracket_filter": (
            f"SELECT CAST(sum({rev_cents}) AS DOUBLE)/10000 AS revenue, "
            "CAST(count(*) AS BIGINT) AS n_lines "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30) "
            "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)"
        ),
        "q22_idle_rich": (
            f"WITH s AS (SELECT sum({_sql_cents('c_acctbal')}) AS sc, count(*) AS n "
            "FROM customer WHERE c_acctbal > 0) "
            "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust, "
            f"{_sql_sum_cents('c_acctbal', 'totacctbal')} "
            "FROM customer, s "
            f"WHERE {_sql_cents('c_acctbal')} * n > sc "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY 1"
        ),
        "group_topk": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER "
            "    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn "
            "  FROM orders WHERE o_custkey < 50) WHERE rn <= 2"
        ),
        "rollup_orders": (
            "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')} "
            "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        ),
        "cube_orders": (
            "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')} "
            "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
        ),
        "set_ops": (
            "WITH a96 AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders "
            "  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'), "
            "a97 AS (SELECT DISTINCT o_custkey FROM orders "
            "  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'), "
            "bld AS (SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') "
            "SELECT c_custkey FROM a96 INTERSECT SELECT o_custkey FROM a97 "
            "EXCEPT SELECT c_custkey FROM bld"
        ),
        "scalar_functions": (
            "SELECT o_orderkey, upper(substr(o_orderpriority, 1, 3)) AS prio3, "
            "CAST(length(o_orderstatus) AS INT) AS st_len, "
            "concat_ws('-', o_orderstatus, o_orderpriority) AS tag, "
            "CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo, "
            "CAST(day(o_orderdate) AS INT) AS dom, "
            "abs(o_orderkey - 50) AS dist50, o_orderkey % 7 AS mod7, "
            "greatest(o_orderkey, 42) AS gmax, "
            f"{_sql_cents('o_totalprice')} AS price_cents "
            "FROM orders WHERE o_orderkey <= 100"
        ),
        "median_stats": (
            "SELECT o_orderstatus, round(median(o_totalprice), 6) AS median_price, "
            "CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1"
        ),
        "array_agg": (
            "SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types, "
            "CAST(len(list_distinct(list(event_type))) AS INT) AS n_distinct "
            "FROM events WHERE user_id < 30 GROUP BY 1"
        ),
        "distinct_parts": (
            "SELECT l_orderkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts "
            "FROM lineitem WHERE l_orderkey < 200 GROUP BY 1"
        ),
        # --- dedup / text
        "dedup_exact_groups": (
            f"SELECT {fp} AS fp, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dupes "
            f"FROM ({dup_docs}) GROUP BY 1 HAVING count(*) > 1"
        ),
        "dedup_survivors": (
            f"SELECT CAST(count(*) AS BIGINT) AS n FROM ("
            f"  SELECT min(doc_id) FROM ({dup_docs}) GROUP BY {fp})"
        ),
        "minhash_signatures": (
            f"SELECT doc_id, sig[1] AS sig0, sig[6] AS sig5 FROM ("
            f"  SELECT doc_id, {_sql_minhash_sig()} AS sig FROM ({_sql_shingles()})"
            f") WHERE doc_id < 20"
        ),
        "minhash_lsh_pairs": (
            f"WITH alldocs AS ({near_docs}), "
            f"sh AS ({_sql_shingles('alldocs')}), "
            f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
            "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "          FROM sig CROSS JOIN range(0, 8) t(b)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
            "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id) "
            f"SELECT id_a, id_b, {jacc} AS jaccard "
            "FROM pairs JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b "
            "WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            " / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) >= 0.5"
        ),
        "ngram_jaccard_pairs": (
            f"WITH nd AS ({near_docs}), "
            f"sh AS ({_sql_shingles('(SELECT doc_id, text FROM nd WHERE doc_id % 200000 < 60)')}), "
            f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
            "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "          FROM sig CROSS JOIN range(0, 8) t(b)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
            "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id) "
            f"SELECT id_a, id_b, {jacc} AS jaccard "
            "FROM pairs JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b "
            "WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            " / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) >= 0.02"
        ),
        "simhash16": _sql_simhash16(),
        "stream_user_state": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "max(epoch_us(ts)) AS last_ts_us FROM events GROUP BY user_id"
        ),
        "near_dedup_survivors": (
            f"WITH alldocs AS ({near_docs}), "
            f"sh AS ({_sql_shingles('alldocs')}), "
            f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
            "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "          FROM sig CROSS JOIN range(0, 8) t(b)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
            "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id), "
            "losers AS (SELECT DISTINCT id_b FROM pairs "
            "  JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b "
            "  WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            "   / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) >= 0.5) "
            "SELECT CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(doc_id) AS BIGINT) AS id_sum, max(doc_id) AS max_id "
            "FROM alldocs WHERE doc_id NOT IN (SELECT id_b FROM losers)"
        ),
        "simhash_block_pairs": (
            f"WITH nd AS ({near_docs}), "
            f"s AS (SELECT doc_id, CAST({_sql_simhash16_bits()} AS BIGINT) AS sig "
            f"  FROM (SELECT doc_id, {SQL_TOKS_LOWER} AS w FROM nd WHERE doc_id % 200000 < 80)), "
            "b AS (SELECT doc_id, sig, j AS blk, (sig >> CAST(j*8 AS INTEGER)) & 255 AS v "
            "  FROM s CROSS JOIN range(0, 2) t(j)), "
            "p AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b, "
            "  CAST(bit_count(xor(a.sig, bb.sig)) AS BIGINT) AS hamming "
            "  FROM b a JOIN b bb ON a.blk = bb.blk AND a.v = bb.v AND a.doc_id < bb.doc_id) "
            "SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3"
        ),
        "text_quality": _QUALITY_SQL,
        "lang_id": _sql_lang_pred(),
        "doc_fingerprint": f"SELECT doc_id, {fp} AS fp FROM documents",
        "bpe_token_stats": (
            f"SELECT CAST(sum(n) AS BIGINT) AS total_bpe_tokens, "
            "CAST(max(n) AS BIGINT) AS max_doc_tokens, "
            "round(CAST(sum(n) AS DOUBLE)/count(*), 6) AS avg_bpe_tokens FROM ("
            f"  SELECT len(regexp_extract_all(text, '{_SQL_BPE_PAT}')) AS n FROM documents)"
        ),
        "rolling_fingerprint": (
            "SELECT doc_id, CASE WHEN len(toks) = 0 THEN 0 ELSE "
            "list_reduce(list_transform(toks, t -> ('0x' || substr(md5(t),1,7))::BIGINT), "
            f"(a, b) -> (a * {TX.ROLL_B} + b) % {TX.ROLL_M}) END AS rfp "
            f"FROM (SELECT doc_id, regexp_extract_all(text, '{_SQL_BPE_PAT}') AS toks FROM documents)"
        ),
        "token_stats": (
            "SELECT CAST(sum(n) AS BIGINT) AS total_tokens, "
            "round(CAST(sum(n) AS DOUBLE)/count(*), 6) AS avg_tokens "
            "FROM (SELECT len(regexp_extract_all(text, '\\S+')) AS n FROM documents)"
        ),
        "grouping_sets": (
            "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')} FROM orders "
            "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
        ),
        "csv_roundtrip": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(epoch_us(o_orderdate)) AS first_date_us, "
            "max(o_orderkey) AS max_key "
            "FROM orders GROUP BY o_orderstatus"
        ),
        "jsonl_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(len(text)) AS BIGINT) AS total_chars, min(doc_id) AS min_doc "
            "FROM documents GROUP BY 1"
        ),
        "top_bigrams": (
            "WITH t AS (SELECT regexp_extract_all(lower(text), '\\S+') AS w FROM documents), "
            "g AS (SELECT concat_ws(' ', w[i], w[i+1]) AS bigram "
            "  FROM t, UNNEST(range(1, greatest(len(w), 1))) AS r(i) WHERE len(w) >= 2) "
            "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM g "
            "GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50"
        ),
        "vocab_coverage": (
            "WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word FROM documents), "
            "c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1), "
            "tot AS (SELECT sum(n) AS tot FROM c) "
            "SELECT word, n, CAST(sum(n) OVER (ORDER BY n DESC, word "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
            "  / CAST(tot AS DOUBLE) AS cum_frac "
            "FROM c, tot ORDER BY n DESC, word LIMIT 1000"
        ),
        "pipeline_end_to_end": (
            f"WITH alldocs AS ({dup_docs}), "
            "surv AS (SELECT * FROM alldocs WHERE doc_id IN ("
            f"  SELECT min(doc_id) FROM alldocs GROUP BY {fp})), "
            "filt AS (SELECT doc_id, text FROM surv "
            "  WHERE len(regexp_extract_all(text, '\\S+')) >= 20 "
            "  AND CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)"
            "      / greatest(length(text), 1) < 0.2), "
            f"lang AS ({_sql_lang_pred('filt', extra_cols=[_SQL_NTOK])}) "
            "SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n) AS BIGINT) AS total_tokens FROM lang GROUP BY 1"
        ),
        # --- similarity
        "cosine_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
            f"SELECT vec_id, round({_sql_cosine('embedding', 'qe')}, 6) AS score "
            "FROM embeddings, q ORDER BY score DESC, vec_id ASC LIMIT 10"
        ),
        "ivf_label_topk": (
            "WITH q AS (SELECT embedding AS qe, label AS ql FROM embeddings WHERE vec_id = 0) "
            f"SELECT vec_id, round({_sql_cosine('embedding', 'qe')}, 6) AS score "
            "FROM embeddings, q WHERE label = ql ORDER BY score DESC, vec_id ASC LIMIT 5"
        ),
        "lsh_sign_topk": _sql_lsh_topk(),
        "ivf_trained_topk": _sql_ivf_trained(),
        "pq_topk": _sql_pq_topk(),
        "repetition_quality": (
            "WITH g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN "
            "list_transform(range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1])) "
            "ELSE [] END) AS g "
            f"FROM (SELECT doc_id, {SQL_TOKS_LOWER} AS w FROM documents)), "
            "pg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2), "
            "st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, "
            "CAST(max(c) AS DOUBLE)/sum(c) AS top_frac, "
            "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)/sum(c) AS dup_frac "
            "FROM pg GROUP BY 1) "
            "SELECT doc_id, n_grams, round(top_frac, 6) AS top_frac, "
            "round(dup_frac, 6) AS dup_frac, "
            "round(top_frac, 6) <= 0.18 AND round(dup_frac, 6) <= 0.60 AS passes FROM st"
        ),
        # the len(...)>=3 guard mirrors _shingle_hashes: docs shorter than
        # k tokens contribute no shingles (no degenerate whole-text /
        # empty-string collisions)
        "contamination_scan": (
            f"WITH b AS ({_sql_shingles(_SQL_DECONTAM_SRC.format(op='='))}), "
            f"c AS ({_sql_shingles(_SQL_DECONTAM_SRC.format(op='<>'))}), "
            "bh AS (SELECT doc_id AS bench_id, ('0x' || substr(md5(s),1,15))::BIGINT AS h "
            "FROM (SELECT doc_id, unnest(sh) AS s FROM b)), "
            "ch AS (SELECT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT AS h "
            "FROM (SELECT doc_id, unnest(sh) AS s FROM c)) "
            "SELECT ch.doc_id, CAST(count(DISTINCT ch.h) AS BIGINT) AS n_hits, "
            "CAST(count(DISTINCT bh.bench_id) AS BIGINT) AS n_bench_docs "
            "FROM ch JOIN bh USING (h) GROUP BY 1"
        ),
        "group_percentiles": (
            "WITH r AS (SELECT o_orderpriority, "
            f"{_sql_cents('o_totalprice')} AS cents, "
            f"row_number() OVER (PARTITION BY o_orderpriority ORDER BY {_sql_cents('o_totalprice')}) AS rn, "
            "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) "
            "SELECT o_orderpriority, "
            "min(CASE WHEN rn >= ceil(0.5 * n) THEN cents END) AS p50, "
            "min(CASE WHEN rn >= ceil(0.9 * n) THEN cents END) AS p90, "
            "min(CASE WHEN rn >= ceil(0.99 * n) THEN cents END) AS p99 "
            "FROM r GROUP BY 1"
        ),
        "incremental_maint": (
            "WITH base AS (SELECT o_orderkey, o_orderpriority, o_totalprice "
            "FROM orders WHERE o_orderkey <= 3000), "
            "doomed AS (SELECT o_orderkey FROM base ORDER BY o_orderkey LIMIT 2), "
            "final AS ("
            "SELECT o_orderkey, o_orderpriority, "
            "CASE WHEN o_orderkey % 211 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice "
            "FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM doomed) "
            "UNION ALL SELECT -1, '1-URGENT', 10.0 "
            "UNION ALL SELECT -2, '1-URGENT', 20.0) "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, TRUE AS matches "
            "FROM final GROUP BY 1"
        ),
        "tfidf_top_terms": (
            f"WITH terms AS (SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS t FROM documents), "
            "tf AS (SELECT doc_id, t, count(*) AS tf FROM terms GROUP BY 1, 2), "
            "dfr AS (SELECT t, count(*) AS df FROM tf GROUP BY 1), "
            "nd AS (SELECT count(*) AS n_docs FROM documents), "
            "sc AS (SELECT doc_id, t, CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf "
            "FROM tf JOIN dfr USING (t), nd), "
            "rk AS (SELECT doc_id, t, tfidf, "
            "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t ASC) AS rank FROM sc) "
            "SELECT doc_id, CAST(rank AS INT) AS rank, t, round(tfidf, 6) AS tfidf "
            "FROM rk WHERE rank <= 3"
        ),
        "zorder_layout": _sql_zorder(),
        "token_entropy": (
            f"WITH terms AS (SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS t FROM documents), "
            "tf AS (SELECT doc_id, t, count(*) AS tf FROM terms GROUP BY 1, 2), "
            "ag AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
            "list_sum(list_transform(list(tf ORDER BY tf), v -> CAST(v AS DOUBLE) * ln(CAST(v AS DOUBLE)))) AS s "
            "FROM tf GROUP BY 1) "
            "SELECT doc_id, n_tokens, "
            "round(ln(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE), 6) AS entropy "
            "FROM ag"
        ),
        "weighted_sample": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(n_chars) AS BIGINT) AS kept_chars FROM documents "
            "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT / 268435456.0 "
            "< least(n_chars / 500.0, 1.0) GROUP BY 1"
        ),
        "orc_roundtrip": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS first_date_us, "
            "max(o_orderkey) AS max_key FROM orders GROUP BY 1"
        ),
        "embedding_near_dups": (
            "WITH base AS ("
            "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
            "  FROM embeddings WHERE vec_id < 100 "
            "  UNION ALL "
            "  SELECT vec_id + 1000, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(1.000001 AS DOUBLE)) "
            "  FROM embeddings WHERE vec_id < 10), "
            f"bk AS (SELECT vec_id, v, {_sql_lsh_bucket()} AS bucket FROM base) "
            "SELECT id_a, id_b, round(c, 6) AS cos FROM ("
            f"  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_sql_cosine('a.v', 'b.v')} AS c "
            "   FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND a.bucket = b.bucket) WHERE c >= 0.95"
        ),
        # --- multimodal
        "multimodal_meta": (
            "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' "
            "ELSE 'video' END AS media_type, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS checksum "
            "FROM documents"
        ),
        "frame_plan": (
            "SELECT doc_id, CAST(unnest(generate_series(0, greatest(CAST(doc_id % 240 AS INTEGER) - 1, 0), 24)) AS INTEGER) AS frame_idx "
            "FROM documents WHERE doc_id % 3 = 2"
        ),
        # replays the md5-tiled fake decode exactly: per-channel mean =
        # sum(digest bytes)/16 (exact — /16 is an exponent shift), min/max
        # = min/max digest byte; hex→byte via strpos arithmetic
        "multimodal_features": (
            "WITH b AS (SELECT doc_id, md5(text) AS checksum, "
            "list_transform(range(16), i -> "
            "(strpos('0123456789abcdef', substring(md5(text), 2*i+1, 1))-1)*16 "
            "+ (strpos('0123456789abcdef', substring(md5(text), 2*i+2, 1))-1)) AS bytes "
            "FROM documents WHERE doc_id < 200) "
            "SELECT doc_id, checksum, CAST(list_sum(bytes) AS DOUBLE)/16 AS f0, "
            "CAST(list_min(bytes) AS BIGINT) AS f_min, CAST(list_max(bytes) AS BIGINT) AS f_max "
            "FROM b"
        ),
        # --- dedup clustering / skew
        "dedup_clusters": (
            f"WITH RECURSIVE alldocs AS ({near_docs}), "
            f"sh AS ({_sql_shingles('alldocs')}), "
            f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
            "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "          FROM sig CROSS JOIN range(0, 8) t(b)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
            "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id), "
            "verified AS (SELECT id_a, id_b "
            "  FROM pairs JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b "
            "  WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            "   / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) >= 0.5), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM verified "
            "          UNION SELECT id_b, id_a FROM verified), "
            "reach AS (SELECT a AS id, a AS r FROM edges "
            "          UNION SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id) "
            "SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id"
        ),
        "cluster_size_hist": (
            # the dedup_clusters recursive-CC chain, rolled up to the
            # cluster-size histogram; docs with no verified pair join as
            # size-1 clusters (every CC member has an edge, so CC sizes
            # are >= 2 — the UNION branches cannot collide, but summing
            # keeps it correct either way)
            f"WITH RECURSIVE alldocs AS ({near_docs}), "
            f"sh AS ({_sql_shingles('alldocs')}), "
            f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
            "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
            "          FROM sig CROSS JOIN range(0, 8) t(b)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
            "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id), "
            "verified AS (SELECT id_a, id_b "
            "  FROM pairs JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b "
            "  WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
            "   / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) >= 0.5), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM verified "
            "          UNION SELECT id_b, id_a FROM verified), "
            "reach AS (SELECT a AS id, a AS r FROM edges "
            "          UNION SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id), "
            "cl AS (SELECT id, min(r) AS cid FROM reach GROUP BY id), "
            "sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size FROM cl GROUP BY 1), "
            "hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS cnt FROM sz GROUP BY 1), "
            "sing AS (SELECT CAST(1 AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS cnt "
            "  FROM alldocs WHERE doc_id NOT IN (SELECT id FROM cl)) "
            "SELECT cluster_size, CAST(sum(cnt) AS BIGINT) AS n_clusters "
            "FROM (SELECT * FROM hist UNION ALL SELECT * FROM sing WHERE cnt > 0) "
            "GROUP BY 1"
        ),
        "skew_salted_join": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items, "
            f"{_sql_sum_cents('l_extendedprice', 'revenue')} "
            "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"
        ),
        "skew_two_phase_agg": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')} FROM orders GROUP BY o_orderpriority"
        ),
        # --- sampling / packing / sketch / interval
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::INT "
            "< CASE WHEN lang = 'en' THEN 2 ELSE 8 END"
        ),
        "pack_sequences": (
            "SELECT lang, chunk_id, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_tok) AS BIGINT) AS total_tokens FROM ("
            "  SELECT lang, CAST(floor(coalesce(sum(n_tok) OVER ("
            "    PARTITION BY lang ORDER BY doc_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000) AS BIGINT) AS chunk_id, "
            "    n_tok FROM ("
            "    SELECT lang, doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok "
            "    FROM documents)"
            ") GROUP BY lang, chunk_id"
        ),
        "kmv_distinct": (
            "WITH fr AS ("
            "  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)"
            "         / 1152921504606846976.0 AS frac FROM orders"
            "), kmin AS (SELECT frac FROM fr ORDER BY frac LIMIT 64) "
            "SELECT CAST(CASE WHEN count(*) < 64 THEN count(*) "
            "  ELSE round((count(*) - 1) / max(frac)) END AS BIGINT) AS est_distinct, "
            "round(max(frac), 9) AS kth_frac, CAST(count(*) AS BIGINT) AS k FROM kmin"
        ),
        "window_count_join": (
            "SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, "
            "CAST(count(*) AS BIGINT) AS n_window "
            "FROM events p JOIN events e ON p.user_id = e.user_id "
            " AND epoch_us(e.ts) >= epoch_us(p.ts) - 600000000 "
            " AND epoch_us(e.ts) < epoch_us(p.ts) "
            "WHERE p.event_type = 'purchase' GROUP BY 1, 2, 3"
        ),
        "time_rollup": (
            "SELECT 'hour' AS grain, epoch_us(date_trunc('hour', ts)) AS bucket_us, "
            f"CAST(count(*) AS BIGINT) AS n, {_sql_sum_cents('value', 'total')} FROM events GROUP BY 2 "
            "UNION ALL "
            "SELECT 'day', epoch_us(date_trunc('day', ts)), "
            f"CAST(count(*) AS BIGINT), {_sql_sum_cents('value', 'total')} FROM events GROUP BY 2"
        ),
        "events_type_summary": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            f"{_sql_sum_cents('value', 'total')} FROM events GROUP BY 1"
        ),
        "sql_interface": SQL_INTERFACE_STMT,
        # --- streaming (finite stream drained with availableNow == batch)
        "stream_hourly": (
            "SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type, "
            f"CAST(count(*) AS BIGINT) AS n, {_sql_sum_cents('value', 'total')} "
            "FROM events GROUP BY 1, 2"
        ),
        "stream_join_attrib": (
            "SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_attributed "
            "FROM events c JOIN events p ON c.user_id = p.user_id "
            " AND epoch_us(p.ts) >= epoch_us(c.ts) "
            " AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000 "
            "WHERE c.event_type = 'click' AND p.event_type = 'purchase' "
            "GROUP BY 1"
        ),
        "stream_dedup": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1"
        ),
        "stream_sessionize": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions FROM ("
            "  SELECT user_id, CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000 THEN 1 ELSE 0 END new_s"
            "  FROM (SELECT user_id, ts, lag(epoch_us(ts)) OVER "
            "        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) prev FROM events)"
            ") WHERE new_s = 1 GROUP BY user_id"
        ),
        # --- round-3 batch 3: time-series / segments / graph / SCD2 / zone maps
        "segment_dedup": (
            "WITH src AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
            f"'{_BOILERPLATE} ' || text ELSE text END AS text FROM documents), "
            "t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM src), "
            "segs AS (SELECT doc_id, i AS pos, concat_ws(' ', "
            "  w[i*8+1], w[i*8+2], w[i*8+3], w[i*8+4], w[i*8+5], w[i*8+6], w[i*8+7], w[i*8+8]) AS seg "
            "  FROM t, UNNEST(range(0, CAST(ceil(len(w)/8.0) AS BIGINT))) r(i) WHERE len(w) > 0), "
            "h AS (SELECT doc_id, pos, seg, ('0x'||substr(md5(seg),1,15))::BIGINT AS h FROM segs), "
            "freq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM h GROUP BY 1), "
            "fl AS (SELECT doc_id, pos, seg, CASE WHEN nd >= 3 THEN 1 ELSE 0 END AS dropped "
            "  FROM h JOIN freq USING(h)) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments, "
            "CAST(sum(dropped) AS BIGINT) AS n_removed, "
            "md5(coalesce(array_to_string(list(seg ORDER BY pos) FILTER (WHERE dropped = 0), ' '), '')) "
            "AS clean_md5 FROM fl GROUP BY 1"
        ),
        "gapfill_hourly": (
            "WITH e AS (SELECT user_id, epoch_us(ts)//3600000000 AS h, epoch_us(ts) AS tu, "
            "  event_id, value FROM events WHERE user_id % 10 = 0), "
            "obs AS (SELECT user_id, h, value AS v_obs FROM ("
            "  SELECT user_id, h, value, row_number() OVER "
            "    (PARTITION BY user_id, h ORDER BY tu DESC, event_id DESC) AS rn FROM e) "
            "  WHERE rn = 1), "
            "grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM "
            "  (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1)) "
            "SELECT g.user_id, g.h, round(last_value(o.v_obs IGNORE NULLS) OVER "
            "  (PARTITION BY g.user_id ORDER BY g.h "
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_fill, "
            "CASE WHEN o.user_id IS NOT NULL THEN 1 ELSE 0 END AS observed "
            "FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h"
        ),
        "ewma_users": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "round(list_reduce(list(value ORDER BY epoch_us(ts), event_id), "
            "  (a, b) -> a * 0.75 + b * 0.25), 6) AS ewma "
            "FROM events GROUP BY 1"
        ),
        "hourly_anomaly": (
            "WITH hourly AS (SELECT event_type, epoch_us(ts)//3600000000 AS h, "
            "  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m, "
            "  CAST(sum(n) AS BIGINT) AS s, CAST(sum(n*n) AS BIGINT) AS q "
            "  FROM hourly GROUP BY 1), "
            "z AS (SELECT event_type, h, n, round(CASE WHEN "
            "  CAST(q AS DOUBLE)/CAST(m AS DOUBLE) "
            "     - (CAST(s AS DOUBLE)/CAST(m AS DOUBLE))*(CAST(s AS DOUBLE)/CAST(m AS DOUBLE)) > 0 THEN "
            "  (CAST(n AS DOUBLE) - CAST(s AS DOUBLE)/CAST(m AS DOUBLE)) / "
            "  sqrt(CAST(q AS DOUBLE)/CAST(m AS DOUBLE) "
            "     - (CAST(s AS DOUBLE)/CAST(m AS DOUBLE))*(CAST(s AS DOUBLE)/CAST(m AS DOUBLE))) "
            "  ELSE 0.0 END, 6) AS z "
            "  FROM hourly JOIN st USING(event_type)) "
            "SELECT event_type, h, n, z FROM z WHERE abs(z) >= 2.0"
        ),
        "knn_graph": (
            "WITH b AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, "
            f"{_sql_lsh_bucket(64, 8, 'list_transform(embedding, x -> CAST(x AS DOUBLE))')} AS bucket "
            "FROM embeddings), "
            "p AS (SELECT l.vec_id AS src, r.vec_id AS dst, "
            f"  round({_sql_cosine('l.v', 'r.v')}, 6) AS score "
            "  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id), "
            "rk AS (SELECT src, dst, score, row_number() OVER "
            "  (PARTITION BY src ORDER BY score DESC, dst ASC) AS rn FROM p) "
            "SELECT src, dst, score FROM rk WHERE rn <= 3 AND src % 10 = 0"
        ),
        "scd2_customer": (
            "WITH upd AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000), "
            "final AS ("
            "  SELECT c_mktsegment, c_acctbal, NULL AS valid_to FROM customer "
            "    WHERE c_custkey NOT IN (SELECT c_custkey FROM upd) "
            "  UNION ALL SELECT c_mktsegment, c_acctbal, 1 FROM customer "
            "    WHERE c_custkey IN (SELECT c_custkey FROM upd) "
            "  UNION ALL SELECT 'PLATINUM', c_acctbal, NULL FROM customer "
            "    WHERE c_custkey IN (SELECT c_custkey FROM upd)) "
            "SELECT c_mktsegment, "
            "CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current, "
            "CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_closed, "
            f"CAST(sum(CASE WHEN valid_to IS NULL THEN {_sql_cents('c_acctbal')} ELSE 0 END) AS DOUBLE)/100 "
            "AS cur_bal FROM final GROUP BY 1"
        ),
        "zone_map_skip": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(o_orderkey) AS k_min, max(o_orderkey) AS k_max "
            "FROM orders WHERE o_orderkey BETWEEN 2000 AND 3500"
        ),
        "curriculum_bins": (
            f"WITH scored AS (SELECT doc_id, lang, n_chars, quality AS q FROM ({_QUALITY_ALL_SQL})), "
            "r AS (SELECT lang, q, row_number() OVER (PARTITION BY lang ORDER BY q) AS rn, "
            "  count(*) OVER (PARTITION BY lang) AS n FROM scored), "
            "th AS (SELECT lang, "
            "  min(CASE WHEN rn >= ceil(0.25 * n) THEN q END) AS p25, "
            "  min(CASE WHEN rn >= ceil(0.5 * n) THEN q END) AS p50, "
            "  min(CASE WHEN rn >= ceil(0.75 * n) THEN q END) AS p75 "
            "  FROM r GROUP BY 1), "
            "binned AS (SELECT s.lang, s.n_chars, s.q, "
            "  CASE WHEN s.q <= th.p25 THEN 1 WHEN s.q <= th.p50 THEN 2 "
            "       WHEN s.q <= th.p75 THEN 3 ELSE 4 END AS bin "
            "  FROM scored s JOIN th USING(lang)) "
            "SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "min(q) AS q_lo, max(q) AS q_hi FROM binned GROUP BY 1, 2"
        ),
        # --- round-3 batch 4: PIT join / BM25 / variant JSON / stream top-k
        "pit_join": (
            "WITH upd AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000), "
            "dim AS ("
            "  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS vf, CAST(NULL AS BIGINT) AS vt "
            "    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd) "
            f"  UNION ALL SELECT c_custkey, c_mktsegment, 0, {T_SCD_US} FROM customer "
            "    WHERE c_custkey IN (SELECT c_custkey FROM upd) "
            f"  UNION ALL SELECT c_custkey, 'PLATINUM', {T_SCD_US}, NULL FROM customer "
            "    WHERE c_custkey IN (SELECT c_custkey FROM upd)) "
            "SELECT d.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events, "
            f"{_sql_sum_cents('e.value', 'total')} "
            "FROM events e JOIN dim d ON e.user_id = d.c_custkey "
            "  AND d.vf <= epoch_us(e.ts) AND (d.vt IS NULL OR d.vt > epoch_us(e.ts)) "
            "GROUP BY 1"
        ),
        "bm25_topk": RANK.sql_bm25_topk(BM25_TERMS, k=20),
        "json_props": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, "
            "CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k, "
            "CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k, "
            "CAST(count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_k "
            "FROM events GROUP BY 1"
        ),
        "stream_hourly_topk": (
            "WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type, "
            "  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "r AS (SELECT hour_us, event_type, n, row_number() OVER "
            "  (PARTITION BY hour_us ORDER BY n DESC, event_type ASC) AS rnk FROM h) "
            "SELECT hour_us, event_type, n, rnk FROM r WHERE rnk <= 3"
        ),
        # --- round-3 batch 5: band join / MERGE INTO / chunking / cogroup asof
        "band_join_events": (
            "SELECT p.event_id AS p_id, CAST(count(*) AS BIGINT) AS n_nearby "
            "FROM events p JOIN events s ON p.event_type = 'purchase' "
            "AND s.event_type = 'signup' "
            "AND abs(epoch_us(p.ts) - epoch_us(s.ts)) <= 60000000 GROUP BY 1"
        ),
        "merge_into_orders": (
            "WITH base AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 3000), "
            "final AS ("
            "  SELECT o_orderkey, CASE WHEN o_orderkey BETWEEN 100 AND 119 "
            "    THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice "
            "  FROM base WHERE o_orderkey NOT BETWEEN 200 AND 204 "
            "  UNION ALL SELECT 1000000 + i, CAST(10 + i AS DOUBLE) FROM range(0, 5) r(i)) "
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            f"{_sql_sum_cents('o_totalprice', 'total')}, "
            "min(o_orderkey) AS k_min, max(o_orderkey) AS k_max FROM final"
        ),
        "chunk_docs": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w "
            "  FROM documents WHERE doc_id % 25 = 0), "
            "c AS (SELECT doc_id, i AS chunk_id, i*48 AS tok_start, "
            "  least(len(w) - i*48, 64) AS n_tokens, "
            "  md5(array_to_string(w[i*48+1 : i*48+64], ' ')) AS chunk_md5 "
            "  FROM t, UNNEST(range(0, 1 + CAST(ceil(greatest(len(w) - 64, 0)/48.0) AS BIGINT))) r(i) "
            "  WHERE len(w) > 0) "
            "SELECT doc_id, chunk_id, tok_start, n_tokens, chunk_md5 FROM c"
        ),
        # the Arrow cogroup twin must land on the identical as-of answer
        "asof_cogroup": (
            "SELECT p.event_id, "
            "  (SELECT max(epoch_us(s.ts)) FROM events s WHERE s.event_type = 'signup' "
            "   AND s.user_id = p.user_id AND epoch_us(s.ts) <= epoch_us(p.ts)) AS signup_ts_us "
            "FROM events p WHERE p.event_type = 'purchase'"
        ),
        # --- round-3 batch 6: retention delete / schema evolution
        "retention_delete": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            + _sql_sum_cents('o_totalprice', 'total') + ", "
            "min(o_orderdate) AS min_date FROM orders "
            "WHERE o_orderkey <= 3000 AND o_orderdate >= DATE '1998-01-01'"
        ),
        "schema_evolution": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CASE WHEN o_orderkey BETWEEN 100 AND 149 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_flagged, "
            + _sql_sum_cents('o_totalprice', 'total') + " "
            "FROM orders WHERE o_orderkey <= 2000"
        ),
        # --- round-3 batch 7: BFS / data-quality expectations
        "bfs_hops": (
            "WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem "
            "  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'), "
            "e AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d FROM li a "
            "  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT s, d FROM e UNION ALL SELECT d, s FROM e), "
            "hub AS (SELECT s FROM und GROUP BY s ORDER BY count(*) DESC, s ASC LIMIT 1), "
            "w(node, hops) AS (SELECT CAST(s AS BIGINT), 0 FROM hub "
            "  UNION SELECT u.d, w.hops + 1 FROM w JOIN und u ON u.s = w.node WHERE w.hops < 4), "
            "dist AS (SELECT node, min(hops) AS hops FROM w GROUP BY 1) "
            "SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes, "
            "CAST(sum(node) AS BIGINT) AS node_sum FROM dist GROUP BY 1"
        ),
        "dq_expectations": (
            "SELECT 'quantity_range' AS rule, CAST(count(*) AS BIGINT) AS n_rows, "
            "  CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) "
            "  AS n_violations FROM lineitem "
            "UNION ALL SELECT 'price_positive', CAST(count(*) AS BIGINT), "
            "  CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'shipdate_not_null', CAST(count(*) AS BIGINT), "
            "  CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'discount_cap', CAST(count(*) AS BIGINT), "
            "  CAST(sum(CASE WHEN l_discount <= 0.05 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'fk_orderkey', CAST(count(*) AS BIGINT), "
            "  CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM orders) THEN 0 ELSE 1 END) "
            "  AS BIGINT) FROM lineitem"
        ),
        # --- round-3 batch 8: count-min sketch
        "cms_heavy": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
            "tc AS (SELECT t, CAST(count(*) AS BIGINT) AS true_n FROM toks GROUP BY 1), "
            "probes AS (SELECT t, true_n FROM tc ORDER BY true_n DESC, t ASC LIMIT 10), "
            "cells AS (SELECT rr.i AS row, "
            "  ('0x'||substr(md5(t || '#cms' || rr.i),1,7))::BIGINT % 256 AS pos "
            "  FROM toks, range(0,3) rr(i)), "
            "sk AS (SELECT row, pos, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY 1,2), "
            "pr AS (SELECT p.t, p.true_n, rr.i AS row, "
            "  ('0x'||substr(md5(p.t || '#cms' || rr.i),1,7))::BIGINT % 256 AS pos "
            "  FROM probes p, range(0,3) rr(i)), "
            "est AS (SELECT pr.t, pr.true_n, CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS est_n "
            "  FROM pr LEFT JOIN sk ON sk.row = pr.row AND sk.pos = pr.pos GROUP BY 1,2) "
            "SELECT t, true_n, est_n, CAST(est_n - true_n AS BIGINT) AS overcount FROM est"
        ),
        # --- round-3 batch 9: rollback / shallow clone
        "rollback_restore": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            + _sql_sum_cents('o_totalprice', 'total') + ", "
            "CAST(sum(CASE WHEN o_orderkey < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_undone "
            "FROM orders WHERE o_orderkey <= 2000"
        ),
        # --- round-3 batch 10: streaming MERGE / ANN recall eval
        "stream_merge_state": (
            "WITH r AS (SELECT user_id, epoch_us(ts) AS tu, event_id, value, "
            "  row_number() OVER (PARTITION BY user_id "
            "    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) "
            "SELECT user_id, tu AS last_ts_us, round(value, 6) AS last_value FROM r WHERE rn = 1"
        ),
        "lsh_recall": (
            "WITH b AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, "
            + _sql_lsh_bucket(64, 8, 'list_transform(embedding, x -> CAST(x AS DOUBLE))')
            + " AS bucket FROM embeddings), "
            "q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0), "
            "approx AS (SELECT b.vec_id FROM b, q WHERE b.bucket = q.qb "
            "  OR xor(b.bucket, q.qb) IN (" + ", ".join(str(1 << j) for j in range(8)) + ") "
            "  ORDER BY " + _sql_cosine('b.v', 'q.qv') + " DESC, b.vec_id ASC LIMIT 10), "
            "exact AS (SELECT b.vec_id FROM b, q "
            "  ORDER BY " + _sql_cosine('b.v', 'q.qv') + " DESC, b.vec_id ASC LIMIT 10) "
            "SELECT CAST(count(*) AS BIGINT) AS n_hit, "
            "round(CAST(count(*) AS DOUBLE)/10, 6) AS recall "
            "FROM approx JOIN exact USING(vec_id)"
        ),
        # --- round-3 batch 11: pivot / unpivot / rank windows / fuzzy matching
        "pivot_status": (
            "SELECT o_orderpriority, "
            "CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f, "
            "CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o, "
            "CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p "
            "FROM orders GROUP BY 1"
        ),
        "unpivot_metrics": (
            "WITH wide AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
            "  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders GROUP BY 1) "
            "SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide "
            "UNION ALL SELECT o_orderpriority, 'min_key', min_key FROM wide "
            "UNION ALL SELECT o_orderpriority, 'max_key', max_key FROM wide"
        ),
        "window_ranks": (
            f"WITH c AS (SELECT c_custkey, c_mktsegment, {_sql_cents('c_acctbal')} AS cents "
            "  FROM customer WHERE c_custkey < 200) "
            "SELECT c_custkey, c_mktsegment, "
            "CAST(dense_rank() OVER w AS BIGINT) AS drank, "
            "round(percent_rank() OVER w, 6) AS prank, "
            "round(cume_dist() OVER w, 6) AS cdist, "
            "CAST(ntile(4) OVER w AS BIGINT) AS quartile "
            "FROM c WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents ASC, c_custkey ASC)"
        ),
        "fuzzy_token_pairs": (
            "WITH src AS (SELECT CASE WHEN doc_id % 13 = 0 "
            "  THEN replace(lower(text), 'a', 'o') ELSE lower(text) END AS text FROM documents), "
            "vocab AS (SELECT DISTINCT unnest(regexp_extract_all(text, '\\S+')) AS t FROM src) "
            "SELECT a.t AS t1, b.t AS t2, CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist "
            "FROM vocab a JOIN vocab b ON substr(a.t, 1, 1) = substr(b.t, 1, 1) "
            "  AND abs(length(a.t) - length(b.t)) <= 1 AND a.t < b.t "
            "WHERE levenshtein(a.t, b.t) <= 1"
        ),
        # --- round-3 batch 12: Arrow-native kernel
        "arrow_norms": (
            "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm FROM embeddings"
        ),
        # --- round-3 batch 13: epoch shuffle / data mixing
        "epoch_shuffle": (
            "WITH sk AS (SELECT doc_id, "
            "  ('0x'||substr(md5('ep1#' || CAST(doc_id AS VARCHAR)),1,7))::BIGINT AS sk "
            "  FROM documents), "
            "s AS (SELECT doc_id, sk, CAST(sk % 8 AS INTEGER) AS shard FROM sk) "
            "SELECT doc_id, shard, CAST(row_number() OVER "
            "  (PARTITION BY shard ORDER BY sk, doc_id) AS BIGINT) AS pos FROM s"
        ),
        "lang_rebalance": (
            "WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1), "
            "k AS (SELECT d.doc_id, d.lang, d.n_chars, "
            "  ('0x'||substr(md5('mix#' || CAST(d.doc_id AS VARCHAR)),1,7))::BIGINT "
            "    / 268435456.0 AS u, "
            "  least(1.0, 40.0 / c.n) AS f FROM documents d JOIN c USING(lang)) "
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(n_chars) AS BIGINT) AS kept_chars FROM k WHERE u < f GROUP BY 1"
        ),
        # --- round-3 batch 14: secondary-index projection / gaps-and-islands
        "projection_lookup": (
            "WITH final AS (SELECT c_custkey, "
            "  CASE WHEN c_custkey < 30 THEN 'PLATINUM' ELSE c_mktsegment END AS seg "
            "  FROM customer), "
            "segs AS (SELECT unnest(['PLATINUM', 'BUILDING', 'MACHINERY']) AS segment) "
            "SELECT s.segment, CAST(count(f.c_custkey) AS BIGINT) AS n_keys, "
            "CAST(coalesce(sum(f.c_custkey), 0) AS BIGINT) AS key_sum "
            "FROM segs s LEFT JOIN final f ON f.seg = s.segment GROUP BY 1"
        ),
        "longest_streak": (
            "WITH r AS (SELECT user_id, event_type, "
            "  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) "
            "  - row_number() OVER (PARTITION BY user_id, event_type "
            "      ORDER BY epoch_us(ts), event_id) AS grp FROM events), "
            "runs AS (SELECT user_id, event_type, grp, CAST(count(*) AS BIGINT) AS len "
            "  FROM r GROUP BY 1, 2, 3), "
            "best AS (SELECT user_id, event_type, len, row_number() OVER "
            "  (PARTITION BY user_id ORDER BY len DESC, event_type ASC) AS rn FROM runs) "
            "SELECT user_id, event_type AS best_type, len AS streak_len FROM best WHERE rn = 1"
        ),
        # --- round-3 batch 15: range secondary lookup / calendar / analytics windows
        "projection_range": (
            f"WITH b AS (SELECT c_custkey, {_sql_cents('c_acctbal')} AS bal_cents FROM customer) "
            "SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum, "
            "min(bal_cents) AS lo_cents, max(bal_cents) AS hi_cents "
            "FROM b WHERE bal_cents BETWEEN 500000 AND 700000"
        ),
        "seasonality_profile": (
            "SELECT CAST((epoch_us(ts)//86400000000 + 4) % 7 AS INTEGER) AS dow, "
            "CAST((epoch_us(ts)//3600000000) % 24 AS INTEGER) AS hour, "
            f"CAST(count(*) AS BIGINT) AS n, {_sql_sum_cents('value', 'total')} "
            "FROM events GROUP BY 1, 2"
        ),
        "ratio_to_report": (
            f"WITH pn AS (SELECT n_name, CAST(sum({_sql_cents('o_totalprice')}) AS BIGINT) AS cents "
            "  FROM orders JOIN customer ON o_custkey = c_custkey "
            "  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1) "
            "SELECT n_name, CAST(cents AS DOUBLE)/100 AS revenue, "
            "round(CAST(cents AS DOUBLE) / CAST(sum(cents) OVER () AS DOUBLE), 6) AS share FROM pn"
        ),
        "window_nth": (
            "SELECT DISTINCT user_id, "
            "first_value(event_type) OVER w AS first_type, "
            "nth_value(event_type, 2) OVER w AS second_type, "
            "last_value(event_type) OVER w AS last_type "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ),
        # --- round-3 batch 16: store history introspection
        "store_history": (
            "WITH base AS (SELECT count(*) AS n FROM orders WHERE o_orderkey <= 2000), "
            "v AS ("
            "  SELECT 0 AS version, n AS n_rows, CAST(NULL AS VARCHAR) AS writer_version FROM base "
            "  UNION ALL SELECT 1, n + 2, 'hx-up' FROM base "
            "  UNION ALL SELECT 2, (SELECT count(*) FROM orders WHERE o_orderkey <= 2000 "
            "    AND o_orderkey >= 100), 'hx-del' FROM base "
            "  UNION ALL SELECT 3, n + 2, NULL FROM base) "
            "SELECT CAST(version AS INTEGER) AS version, CAST(n_rows AS BIGINT) AS n_rows, "
            "TRUE AS has_files, writer_version FROM v"
        ),
    }
    # full-pipeline showcase: every stage's proven algebra, chained
    out["full_pipeline"] = (
        "WITH corpus AS (SELECT doc_id, text, lang FROM documents UNION ALL "
        "  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 10 = 0), "
        f"kept AS (SELECT doc_id, text, lang FROM corpus WHERE {_SQL_QUALITY_EXPR} >= 0.75), "
        f"fpd AS (SELECT doc_id, text, lang, md5({SQL_NORM}) AS fp FROM kept), "
        "surv AS (SELECT doc_id, text, lang FROM "
        "  (SELECT fpd.*, min(doc_id) OVER (PARTITION BY fp) AS keep FROM fpd) "
        "  WHERE doc_id = keep), "
        "c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM surv GROUP BY 1), "
        "reb AS (SELECT s.doc_id, s.text, s.lang FROM surv s JOIN c USING(lang) "
        "  WHERE ('0x'||substr(md5('mix#'||CAST(s.doc_id AS VARCHAR)),1,7))::BIGINT "
        "    / 268435456.0 < least(1.0, 30.0/c.n)), "
        "t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '\\S+') AS w FROM reb), "
        "ch AS (SELECT doc_id, lang, least(len(w) - i*48, 64) AS n_tokens "
        "  FROM t, UNNEST(range(0, 1 + CAST(ceil(greatest(len(w)-64, 0)/48.0) AS BIGINT))) r(i) "
        "  WHERE len(w) > 0) "
        "SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens "
        "FROM ch GROUP BY 1"
    )
    # the star-CC variant must produce the identical cluster map
    out["dedup_clusters_star"] = out["dedup_clusters"]
    # full availableNow drain of the streaming ingest-dedup == the batch twin
    out["stream_dedup_ingest"] = out["incremental_dedup"]
    out["udtf_tokens"] = (
        "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS tok "
        "FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ws "
        "      FROM documents WHERE doc_id < 10), "
        "UNNEST(range(1, len(ws) + 1)) r(i)"
    )
    # full in-order drain of the streaming funnel == the batch funnel:
    out["stream_funnel"] = out["funnel_steps"]
    # ---- round-4 batch 1 oracles
    out["mor_delete"] = (
        "SELECT CAST(count(*) FILTER (WHERE o_orderdate >= DATE '1997-01-01') AS BIGINT) AS n_live, "
        "CAST(count(*) FILTER (WHERE o_orderdate < DATE '1997-01-01') AS BIGINT) AS n_deleted, "
        f"CAST(sum({_sql_cents('o_totalprice')}) FILTER (WHERE o_orderdate >= DATE '1997-01-01') AS DOUBLE)/100 AS total, "
        "min(o_orderdate) FILTER (WHERE o_orderdate >= DATE '1997-01-01') AS min_date "
        "FROM orders WHERE o_orderkey <= 3000"
    )
    out["domain_cap"] = (
        "WITH r AS (SELECT source, n_chars, doc_id, row_number() OVER "
        "  (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn FROM documents) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_kept, "
        "CAST(sum(n_chars) AS BIGINT) AS chars_kept, min(doc_id) AS min_doc "
        "FROM r WHERE rn <= 20 GROUP BY 1"
    )
    out["inverted_postings"] = (
        "WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term "
        "  FROM documents), "
        "td AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2) "
        "SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total, "
        "array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings "
        "FROM td WHERE length(term) >= 5 GROUP BY 1"
    )
    out["boolean_retrieval"] = (
        "WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term "
        "  FROM documents), "
        "m AS (SELECT doc_id FROM t WHERE term IN ('vector', 'stream', 'window') "
        "  GROUP BY doc_id HAVING count(DISTINCT term) = 3) "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc, "
        "max(doc_id) AS max_doc FROM m"
    )
    _split_frac = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)"
        " / 1152921504606846976.0"
    )
    out["split_leakage"] = (
        f"WITH alldocs AS ({dup_docs}), "
        f"sh AS ({_sql_shingles('alldocs')}), "
        f"sig AS (SELECT doc_id, {_sql_minhash_sig()} AS sig FROM sh), "
        "bands AS (SELECT doc_id, b, md5(concat_ws('|', sig[2*b+1], sig[2*b+2])) AS h "
        "          FROM sig CROSS JOIN range(0, 8) t(b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b FROM bands a "
        "          JOIN bands bb ON a.b = bb.b AND a.h = bb.h AND a.doc_id < bb.doc_id), "
        "ver AS (SELECT id_a, id_b, CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)"
        " / greatest(len(list_distinct(list_concat(s1.sh, s2.sh))), 1) AS jaccard "
        "  FROM pairs JOIN sh s1 ON s1.doc_id = id_a JOIN sh s2 ON s2.doc_id = id_b), "
        f"spl AS (SELECT doc_id, CASE WHEN {_split_frac} < 0.9 THEN 'train' ELSE 'val' END "
        "  AS split FROM alldocs), "
        "cr AS (SELECT v.jaccard, CASE WHEN sa.split = 'val' THEN v.id_a ELSE v.id_b END AS val_id "
        "  FROM ver v JOIN spl sa ON sa.doc_id = v.id_a JOIN spl sb ON sb.doc_id = v.id_b "
        "  WHERE v.jaccard >= 0.5 AND sa.split <> sb.split) "
        "SELECT CAST(count(*) AS BIGINT) AS n_leaks, "
        "CAST(count(DISTINCT val_id) AS BIGINT) AS n_val_docs, "
        "round(avg(jaccard), 6) AS avg_jaccard FROM cr"
    )
    out["winsorized_stats"] = (
        f"WITH r AS (SELECT o_orderpriority, {_sql_cents('o_totalprice')} AS cents, o_orderkey, "
        f"  row_number() OVER (PARTITION BY o_orderpriority "
        f"    ORDER BY {_sql_cents('o_totalprice')}, o_orderkey) AS rn, "
        "  count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) "
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_kept, "
        "round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS mean_kept, "
        "min(cents) AS min_kept, max(cents) AS max_kept "
        "FROM r WHERE rn > CAST(floor(0.01 * n) AS BIGINT) "
        "  AND rn <= n - CAST(floor(0.01 * n) AS BIGINT) GROUP BY 1"
    )
    out["equidepth_hist"] = (
        f"WITH b AS (SELECT {_sql_cents('o_totalprice')} AS cents, "
        f"  ntile(10) OVER (ORDER BY {_sql_cents('o_totalprice')}, o_orderkey) AS bin "
        "  FROM orders) "
        "SELECT bin, CAST(count(*) AS BIGINT) AS n, min(cents) AS lo, max(cents) AS hi "
        "FROM b GROUP BY 1"
    )
    out["change_feed"] = (
        "WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderkey <= 2000), "
        "f AS ("
        "  SELECT o_orderkey, 'update' AS change, 1 AS version FROM base "
        "    WHERE o_orderkey BETWEEN 100 AND 149 "
        "  UNION ALL SELECT o_orderkey + 500000, 'insert', 1 FROM base WHERE o_orderkey <= 10 "
        "  UNION ALL SELECT o_orderkey, 'delete', 2 FROM base "
        "    WHERE o_orderkey BETWEEN 500 AND 509) "
        "SELECT o_orderkey, change, CAST(version AS INTEGER) AS version FROM f"
    )
    out["bloom_point"] = (
        "WITH live AS ("
        "  SELECT o_orderkey, o_totalprice FROM orders "
        "    WHERE o_orderkey <= 2000 AND o_orderkey NOT IN (7, 1999) "
        "  UNION ALL SELECT 7, 1.0 UNION ALL SELECT 1999, 2.0), "
        "hits AS (SELECT * FROM live WHERE o_orderkey IN (7, 399, 801, 1202, 1603, 1999)) "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        + _sql_sum_cents("o_totalprice", "total")
        + ", min(o_orderkey) AS min_k, max(o_orderkey) AS max_k FROM hits"
    )
    out["exact_quantiles"] = (
        f"WITH v AS (SELECT {_sql_cents('o_totalprice')} AS cents FROM orders), "
        "n AS (SELECT count(*) AS n FROM v), "
        "r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM v), "
        "t AS (SELECT CAST(p AS DOUBLE) AS p, "
        "  greatest(1, CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT)) AS rank "
        "  FROM (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p), n) "
        "SELECT t.p, r.cents AS value FROM t JOIN r ON r.rn = t.rank"
    )
    out["weighted_quantiles"] = (
        "WITH m AS (SELECT CAST(l_quantity AS BIGINT) AS v, "
        "  CAST(count(*) AS BIGINT) AS w FROM lineitem GROUP BY 1), "
        "c AS (SELECT v, w, sum(w) OVER (ORDER BY v) AS cw FROM m), "
        "t AS (SELECT sum(w) AS W FROM m), "
        "r AS (SELECT CAST(p AS DOUBLE) AS p, "
        "  greatest(1, CAST(ceil(CAST(p AS DOUBLE) * W) AS BIGINT)) AS rk "
        "  FROM (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS p), t) "
        "SELECT r.p, min(c.v) AS value FROM r JOIN c ON c.cw >= r.rk GROUP BY 1"
    )
    out["bigram_nll"] = (
        f"WITH toks AS (SELECT doc_id, {SQL_TOKS_LOWER} AS t FROM documents), "
        "idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i "
        "  FROM toks WHERE len(t) >= 2), "
        "pairs AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx), "
        "tf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf "
        "  FROM pairs GROUP BY 1,2,3), "
        "c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1,2), "
        "c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1), "
        "v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v "
        "  FROM (SELECT unnest(t) AS tok FROM toks)), "
        "c AS (SELECT doc_id, tf, CAST(tf AS DOUBLE) * "
        "  ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) AS c "
        "  FROM tf JOIN c12 USING(w1, w2) JOIN c1 USING(w1), v) "
        "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, "
        "round(-list_sum(list(c ORDER BY c)) / CAST(sum(tf) AS DOUBLE), 6) AS nll "
        "FROM c GROUP BY 1"
    )
    out["zipf_fit"] = (
        f"WITH terms AS (SELECT unnest({SQL_TOKS_LOWER}) AS t FROM documents), "
        "counts AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM terms GROUP BY 1), "
        "top AS (SELECT t, cnt FROM counts ORDER BY cnt DESC, t ASC LIMIT 1000), "
        "xy AS (SELECT r AS rank, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y "
        "  FROM (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t ASC) AS r FROM top)), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "  list_sum(list(x ORDER BY rank)) AS sx, "
        "  list_sum(list(y ORDER BY rank)) AS sy, "
        "  list_sum(list(x*x ORDER BY rank)) AS sxx, "
        "  list_sum(list(y*y ORDER BY rank)) AS syy, "
        "  list_sum(list(x*y ORDER BY rank)) AS sxy FROM xy) "
        "SELECT n AS n_terms, "
        "round((sxy - sx*sy/CAST(n AS DOUBLE)) / (sxx - sx*sx/CAST(n AS DOUBLE)), 6) AS slope, "
        "round((sy - ((sxy - sx*sy/CAST(n AS DOUBLE)) / (sxx - sx*sx/CAST(n AS DOUBLE))) * sx) "
        "  / CAST(n AS DOUBLE), 6) AS intercept, "
        "round(((sxy - sx*sy/CAST(n AS DOUBLE)) * (sxy - sx*sy/CAST(n AS DOUBLE))) "
        "  / ((sxx - sx*sx/CAST(n AS DOUBLE)) * (syy - sy*sy/CAST(n AS DOUBLE))), 6) AS r2 "
        "FROM s"
    )
    out["js_sources"] = (
        "WITH ta AS (SELECT doc_id, text FROM documents WHERE source = 'src0'), "
        "tb AS (SELECT doc_id, text FROM documents WHERE source = 'src1'), "
        f"ca AS (SELECT t, CAST(count(*) AS BIGINT) AS na FROM "
        f"  (SELECT unnest({SQL_TOKS_LOWER}) AS t FROM ta) GROUP BY 1), "
        f"cb AS (SELECT t, CAST(count(*) AS BIGINT) AS nb FROM "
        f"  (SELECT unnest({SQL_TOKS_LOWER}) AS t FROM tb) GROUP BY 1), "
        "tot AS (SELECT (SELECT CAST(sum(na) AS BIGINT) FROM ca) AS ta_n, "
        "  (SELECT CAST(sum(nb) AS BIGINT) FROM cb) AS tb_n), "
        "m AS (SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb "
        "  FROM ca FULL OUTER JOIN cb USING(t)), "
        # floor(c*1e12 + 0.5) / floor((Σ+5e5)/1e6): the SAME correctly-
        # rounded IEEE ops the Spark plan uses — bit-identical quantizer
        # on both engines (round(double, 12) is BigDecimal HALF_UP in
        # Spark but floating-point in DuckDB; see js_divergence docstring)
        "c AS (SELECT ta_n, tb_n, CAST(floor(("
        "  CASE WHEN na > 0 THEN 0.5 * (CAST(na AS DOUBLE)/ta_n) * "
        "    ln((CAST(na AS DOUBLE)/ta_n) / ((CAST(na AS DOUBLE)/ta_n + CAST(nb AS DOUBLE)/tb_n)/2.0)) "
        "  ELSE 0.0 END + "
        "  CASE WHEN nb > 0 THEN 0.5 * (CAST(nb AS DOUBLE)/tb_n) * "
        "    ln((CAST(nb AS DOUBLE)/tb_n) / ((CAST(na AS DOUBLE)/ta_n + CAST(nb AS DOUBLE)/tb_n)/2.0)) "
        "  ELSE 0.0 END) * 1e12 + 0.5) AS BIGINT) AS c FROM m, tot) "
        "SELECT ta_n AS n_a, tb_n AS n_b, "
        "CAST(floor((sum(c) + 500000) / 1000000.0) AS BIGINT) / 1000000.0 AS jsd "
        "FROM c GROUP BY 1, 2"
    )
    _growth_powers = ", ".join(str(1 << i) for i in range(16))
    _growth_curve = (
        "m AS (SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents), "
        f"pw AS (SELECT unnest([{_growth_powers}]) AS p), "
        "thr AS (SELECT DISTINCT greatest(1, (max_id + p - 1) // p) AS threshold "
        "  FROM pw, m), "
        f"tk AS (SELECT doc_id, {SQL_TOKS_LOWER} AS t FROM documents), "
        "ptok AS (SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_id FROM "
        "  (SELECT doc_id, unnest(t) AS tok FROM tk) GROUP BY 1), "
        "vg_v AS (SELECT threshold, CAST(count(*) AS BIGINT) AS v_terms "
        "  FROM ptok JOIN thr ON threshold >= first_id GROUP BY 1), "
        "vg_n AS (SELECT threshold, CAST(sum(len(t)) AS BIGINT) AS n_tokens "
        "  FROM tk JOIN thr ON threshold >= doc_id GROUP BY 1), "
        "curve AS (SELECT threshold, n_tokens, v_terms FROM vg_n JOIN vg_v USING(threshold))"
    )
    out["vocab_growth"] = (
        f"WITH {_growth_curve} SELECT threshold, n_tokens, v_terms FROM curve"
    )
    out["heaps_fit"] = (
        f"WITH {_growth_curve}, "
        "xy AS (SELECT threshold, ln(CAST(n_tokens AS DOUBLE)) AS x, "
        "  ln(CAST(v_terms AS DOUBLE)) AS y FROM curve WHERE n_tokens > 0), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "  list_sum(list(x ORDER BY threshold)) AS sx, "
        "  list_sum(list(y ORDER BY threshold)) AS sy, "
        "  list_sum(list(x*x ORDER BY threshold)) AS sxx, "
        "  list_sum(list(y*y ORDER BY threshold)) AS syy, "
        "  list_sum(list(x*y ORDER BY threshold)) AS sxy FROM xy) "
        "SELECT n AS n_points, "
        "round((sxy - sx*sy/CAST(n AS DOUBLE)) / (sxx - sx*sx/CAST(n AS DOUBLE)), 6) AS slope, "
        "round((sy - ((sxy - sx*sy/CAST(n AS DOUBLE)) / (sxx - sx*sx/CAST(n AS DOUBLE))) * sx) "
        "  / CAST(n AS DOUBLE), 6) AS intercept, "
        "round(((sxy - sx*sy/CAST(n AS DOUBLE)) * (sxy - sx*sy/CAST(n AS DOUBLE))) "
        "  / ((sxx - sx*sx/CAST(n AS DOUBLE)) * (syy - sy*sy/CAST(n AS DOUBLE))), 6) AS r2 "
        "FROM s"
    )
    # round-8: the HLL twin is GENERATED from the operator's own
    # constants (alpha literal, power array, hex slicing) — one source of
    # truth for both engines
    from index_spark.operators.sampling import sql_hll_estimate

    out["hll_distinct"] = sql_hll_estimate("events", "user_id", ("event_type",))
    # the streaming twin drains to the SAME register table, so it shares
    # the batch oracle verbatim
    out["stream_hll"] = out["hll_distinct"]

    # sketch algebra: three generated single-sketch replays composed by
    # inclusion-exclusion — the subquery-table form of sql_hll_estimate
    def _hll_sub(pred: str) -> str:
        return sql_hll_estimate(
            f"(SELECT user_id FROM events WHERE {pred})", "user_id"
        )

    _sub_a = _hll_sub("event_type = 'click'")
    _sub_b = _hll_sub("event_type = 'purchase'")
    _sub_u = _hll_sub("event_type IN ('click', 'purchase')")
    out["hll_intersect"] = (
        "SELECT a.est_distinct AS est_a, b.est_distinct AS est_b, "
        "u.est_distinct AS est_union, "
        "greatest(a.est_distinct + b.est_distinct - u.est_distinct, 0) AS est_intersection "
        f"FROM ({_sub_a}) a, ({_sub_b}) b, ({_sub_u}) u"
    )
    # round-8 continuation: correlation matrix — the 6 pair rows are
    # GENERATED from one column list so the SQL twin can't drift from the
    # operator's pair enumeration (same fixed expression tree as
    # priority_trend: HUGEINT sufficient stats, doubles only at the end)
    _CORR_COLS = ["qty", "price_c", "disc_c", "tax_c"]
    _corr_pair_rows = []
    for _i in range(len(_CORR_COLS)):
        for _j in range(_i + 1, len(_CORR_COLS)):
            _a, _b = _CORR_COLS[_i], _CORR_COLS[_j]
            _num = f"n*s_{_a}_{_b} - s_{_a}*s_{_b}"
            _dx = f"n*s_{_a}_{_a} - s_{_a}*s_{_a}"
            _dy = f"n*s_{_b}_{_b} - s_{_b}*s_{_b}"
            _corr_pair_rows.append(
                f"SELECT '{_a}' AS col_x, '{_b}' AS col_y, "
                f"CAST(n AS BIGINT) AS n_points, "
                f"CASE WHEN ({_dx}) = 0 OR ({_dy}) = 0 THEN NULL ELSE "
                f"round(CAST({_num} AS DOUBLE) / sqrt(CAST({_dx} AS DOUBLE) "
                f"* CAST({_dy} AS DOUBLE)), 6) END AS corr FROM s"
            )
    _corr_sums = ", ".join(
        f"sum(CAST({a} AS HUGEINT)) AS s_{a}" for a in _CORR_COLS
    ) + ", " + ", ".join(
        f"sum(CAST({_CORR_COLS[i]} AS HUGEINT)*{_CORR_COLS[j]}) "
        f"AS s_{_CORR_COLS[i]}_{_CORR_COLS[j]}"
        for i in range(len(_CORR_COLS))
        for j in range(i, len(_CORR_COLS))
    )
    out["corr_lineitem"] = (
        "WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty, "
        f"{_sql_cents('l_extendedprice')} AS price_c, "
        f"{_sql_cents('l_discount')} AS disc_c, "
        f"{_sql_cents('l_tax')} AS tax_c FROM lineitem), "
        f"s AS (SELECT count(*) AS n, {_corr_sums} FROM b) "
        + " UNION ALL ".join(_corr_pair_rows)
    )
    out["mad_outliers"] = (
        # same two-window rank formulation as the operator: value at rank
        # ceil(0.5·n) is the discrete median, then the same over |v−med|
        "WITH r AS (SELECT o_orderpriority AS g, "
        f"{_sql_cents('o_totalprice')} AS v, "
        f"row_number() OVER (PARTITION BY o_orderpriority ORDER BY {_sql_cents('o_totalprice')}) AS rn, "
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders), "
        "m AS (SELECT g, v, n, max(CASE WHEN rn = ceil(0.5*n) THEN v END) "
        "  OVER (PARTITION BY g) AS med FROM r), "
        "d AS (SELECT g, n, med, abs(v - med) AS dev, "
        "  row_number() OVER (PARTITION BY g ORDER BY abs(v - med)) AS rn2 FROM m), "
        "md AS (SELECT g, med, dev, max(CASE WHEN rn2 = ceil(0.5*n) THEN dev END) "
        "  OVER (PARTITION BY g) AS mad FROM d) "
        "SELECT g AS o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
        "max(med) AS median, max(mad) AS mad, "
        "CAST(sum(CASE WHEN CAST(dev AS DOUBLE) > 3.0 * CAST(mad AS DOUBLE) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
        "FROM md GROUP BY 1"
    )
    out["chi2_events"] = (
        # full-grid chi²: the marginal cross product supplies the absent
        # cells (they contribute E); per-cell terms quantized to e-12
        # integers (floor(t·1e12 + 0.5)) and summed as BIGINT — the
        # js_divergence quantizer, identical parenthesization to the
        # operator's double expression
        "WITH p AS (SELECT event_type AS a, (epoch_us(ts)//3600000000) % 24 AS b "
        "  FROM events WHERE event_type IS NOT NULL), "
        "cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM p GROUP BY 1, 2), "
        "ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1), "
        "cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1), "
        "tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS ka, "
        "  count(DISTINCT b) AS kb FROM cells), "
        "grid AS (SELECT ra.a, ra.ra, cb.b, cb.cb FROM ra, cb), "
        "fl AS (SELECT g.ra, g.cb, coalesce(c.o, 0) AS o FROM grid g "
        "  LEFT JOIN cells c ON c.a = g.a AND c.b = g.b), "
        # CAST the floor to BIGINT BEFORE summing: DuckDB floor() returns
        # DOUBLE, and a float-accumulated sum(q) past 2^53 drifts off the
        # operator's exact long sum (review finding — the js_divergence
        # twin already casts per term)
        "q AS (SELECT CAST(floor(((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) "
        "  * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) "
        "  / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))) * 1e12 + 0.5) AS BIGINT) AS q "
        "  FROM fl, tot), "
        "x AS (SELECT CAST(floor((sum(q) + 500000) / 1000000.0) AS BIGINT) / 1.0e6 AS chi2 FROM q) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(ka * kb AS BIGINT) AS n_cells, "
        "CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof, chi2, "
        "CASE WHEN least(ka, kb) < 2 THEN NULL ELSE "
        "round(sqrt(chi2 / CAST(n * (least(ka, kb) - 1) AS DOUBLE)), 6) END AS cramers_v "
        "FROM x, tot"
    )
    out["acf_hourly"] = (
        # the n²-scaled exact-integer ACF estimator, HUGEINT end-to-end;
        # the only double is the final division (identical in Spark's
        # decimal(38,0) build)
        "WITH c AS (SELECT event_type AS g, epoch_us(ts)//3600000000 AS t, "
        "  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "b AS (SELECT g, min(t) AS mn, max(t) AS mx, max(t) - min(t) + 1 AS n, "
        "  sum(CAST(x AS HUGEINT)) AS s, sum(CAST(x AS HUGEINT) * x) AS ss "
        "  FROM c GROUP BY 1), "
        "l AS (SELECT unnest([1, 2, 3, 24]) AS lag), "
        "ht AS (SELECT c.g, l.lag, "
        "  coalesce(sum(CASE WHEN c.t >= b.mn + l.lag THEN CAST(c.x AS HUGEINT) END), 0) AS sh, "
        "  coalesce(sum(CASE WHEN c.t <= b.mx - l.lag THEN CAST(c.x AS HUGEINT) END), 0) AS st "
        "  FROM c JOIN b USING (g), l GROUP BY 1, 2), "
        "p AS (SELECT a.g, l.lag, sum(CAST(a.x AS HUGEINT) * t2.x) AS p "
        "  FROM c a, l JOIN c t2 ON t2.g = a.g AND t2.t = a.t - l.lag GROUP BY 1, 2), "
        "j AS (SELECT ht.g, ht.lag, b.n, b.s, b.ss, ht.sh, ht.st, "
        "  coalesce(p.p, 0) AS p FROM ht JOIN b USING (g) "
        "  LEFT JOIN p ON p.g = ht.g AND p.lag = ht.lag) "
        "SELECT g AS event_type, CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n, "
        "CASE WHEN (n*n*ss - n*s*s) = 0 OR lag >= n THEN NULL ELSE "
        "round(CAST(n*n*p - n*s*(sh + st) + (n - lag)*s*s AS DOUBLE) "
        "  / CAST(n*n*ss - n*s*s AS DOUBLE), 6) END AS acf FROM j"
    )
    # windowed streaming HLL: the hour-grouped batch replay IS the twin
    out["stream_hll_hourly"] = sql_hll_estimate(
        # alias must dodge the generated SQL's internal `h` (md5) column
        "(SELECT epoch_us(ts)//3600000000 AS hour_idx, user_id FROM events)",
        "user_id",
        ("hour_idx",),
    )
    _ab_r = "(CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE))"
    _ab_rb = "(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))"
    _ab_p = "(CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))"
    out["conversion_ab"] = (
        "WITH units AS (SELECT user_id, CASE WHEN user_id % 2 = 0 "
        "  THEN 'arm_even' ELSE 'arm_odd' END AS arm, "
        "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv "
        "  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2), "
        "per AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, "
        "  CAST(sum(conv) AS BIGINT) AS k FROM units GROUP BY 1), "
        "a AS (SELECT * FROM per WHERE arm = 'arm_even'), "
        "b AS (SELECT * FROM per WHERE arm = 'arm_odd') "
        "SELECT a.arm AS group_a, b.arm AS group_b, a.n AS n_a, b.n AS n_b, "
        "a.k AS k_a, b.k AS k_b, "
        f"round({_ab_r}, 6) AS rate_a, round({_ab_rb}, 6) AS rate_b, "
        "CASE WHEN a.k + b.k = 0 OR a.k + b.k = a.n + b.n THEN NULL ELSE "
        f"round(({_ab_r} - {_ab_rb}) / sqrt({_ab_p} * (1.0 - {_ab_p}) "
        "  * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))), 6) END AS z "
        "FROM a, b"
    )
    # PSI: rank-derived reference deciles (CAST(q AS DOUBLE) forces the
    # same IEEE ceil(q·n) as the operator's Python rank math — a bare
    # 0.1 literal is DECIMAL in DuckDB and could flip a knife-edge
    # rank), frozen-bucket add-1 shares, e-12 quantized BIGINT sum
    _psi_cuts = ", ".join(
        f"min(CASE WHEN rn >= ceil(CAST(0.{i} AS DOUBLE)*n) THEN v END) AS c{i}"
        for i in range(1, 10)
    )
    _psi_b = "(" + " + ".join(
        f"CASE WHEN v > c{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    ) + ")"
    _psi_rs = "(CAST(nr + 1 AS DOUBLE) / CAST(tnr + 10 AS DOUBLE))"
    _psi_cs = "(CAST(nc + 1 AS DOUBLE) / CAST(tnc + 10 AS DOUBLE))"
    out["psi_drift"] = (
        f"WITH refv AS (SELECT {_sql_cents('o_totalprice')} AS v FROM orders "
        "  WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'), "
        f"curv AS (SELECT {_sql_cents('o_totalprice')} AS v FROM orders "
        "  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'), "
        "r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, "
        "  count(*) OVER () AS n FROM refv), "
        f"cuts AS (SELECT {_psi_cuts} FROM r), "
        f"br AS (SELECT {_psi_b} AS b FROM refv, cuts), "
        f"bc AS (SELECT {_psi_b} AS b FROM curv, cuts), "
        "rc AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM br GROUP BY 1), "
        "cc AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bc GROUP BY 1), "
        "g AS (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS b), "
        "j AS (SELECT g.b, coalesce(rc.n, 0) AS nr, coalesce(cc.n, 0) AS nc "
        "  FROM g LEFT JOIN rc USING (b) LEFT JOIN cc USING (b)), "
        "tot AS (SELECT sum(nr) AS tnr, sum(nc) AS tnc FROM j), "
        f"q AS (SELECT CAST(floor((({_psi_cs} - {_psi_rs}) "
        f"  * ln({_psi_cs} / {_psi_rs})) * 1e12 + 0.5) AS BIGINT) AS q "
        "  FROM j, tot) "
        "SELECT (SELECT CAST(tnr AS BIGINT) FROM tot) AS n_ref, "
        "(SELECT CAST(tnc AS BIGINT) FROM tot) AS n_cur, "
        "CAST(floor((sum(q) + 500000) / 1000000.0) AS BIGINT) / 1.0e6 AS psi FROM q"
    )
    # GENERATED from the same _MIX_WEIGHTS/_MIX_TARGET constants as the
    # Spark call — largest-remainder allocation is all integer arithmetic
    _mix_vals = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))
    _mix_wsum = sum(_MIX_WEIGHTS.values())
    out["mix_corpus"] = (
        "WITH avail AS (SELECT source, CAST(count(*) AS BIGINT) AS n_avail "
        "  FROM documents WHERE source IS NOT NULL GROUP BY 1), "
        f"w(source, w) AS (VALUES {_mix_vals}), "
        "b AS (SELECT coalesce(w.source, a.source) AS source, "
        "  coalesce(a.n_avail, 0) AS n_avail, coalesce(w.w, 0) AS w "
        "  FROM w FULL OUTER JOIN avail a ON a.source = w.source), "
        f"al AS (SELECT source, n_avail, ({_MIX_TARGET} * w) // {_mix_wsum} AS base, "
        f"  ({_MIX_TARGET} * w) % {_mix_wsum} AS rem FROM b), "
        f"l AS (SELECT {_MIX_TARGET} - sum(base) AS lft FROM al), "
        "r AS (SELECT source, n_avail, "
        "  base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source ASC) "
        "    <= (SELECT lft FROM l) THEN 1 ELSE 0 END AS alloc FROM al) "
        "SELECT source, n_avail, CAST(alloc AS BIGINT) AS n_alloc, "
        "CAST(least(alloc, n_avail) AS BIGINT) AS n_take FROM r"
    )
    out["reconcile_totals"] = (
        "WITH li AS (SELECT l_orderkey, sum(CAST(round(l_extendedprice"
        "  * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS chg "
        "  FROM lineitem GROUP BY 1), "
        f"o AS (SELECT o_orderkey, {_sql_cents('o_totalprice')} AS tot FROM orders) "
        "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CASE WHEN chg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines, "
        "CAST(sum(CASE WHEN chg IS NOT NULL AND tot <> chg THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch, "
        "CAST(max(CASE WHEN chg IS NOT NULL THEN abs(tot - chg) END) AS BIGINT) AS max_abs_diff "
        "FROM o LEFT JOIN li ON o_orderkey = l_orderkey"
    )
    out["event_lift"] = (
        "WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events "
        "  WHERE user_id IS NOT NULL AND event_type IS NOT NULL), "
        "un AS (SELECT count(DISTINCT u) AS utot FROM ut), "
        "m AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1), "
        "co AS (SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS nab "
        "  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2) "
        "SELECT type_a, type_b, ma.n AS n_a, mb.n AS n_b, nab AS n_ab, "
        "round(CAST(CAST(nab AS HUGEINT) * utot AS DOUBLE) "
        "  / CAST(CAST(ma.n AS HUGEINT) * mb.n AS DOUBLE), 6) AS lift "
        "FROM co JOIN m ma ON ma.t = type_a JOIN m mb ON mb.t = type_b, un"
    )
    out["conversion_latency"] = (
        "WITH f AS (SELECT user_id, "
        "  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS f, "
        "  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t "
        # the operator excludes NULL users — mirror it, or a regenerated
        # fixture with NULL user_ids makes DuckDB count a pseudo-user
        "  FROM events WHERE user_id IS NOT NULL GROUP BY 1), "
        "l AS (SELECT t - f AS lat FROM f "
        "  WHERE f IS NOT NULL AND t IS NOT NULL AND f <= t), "
        "r AS (SELECT lat, row_number() OVER (ORDER BY lat) AS rn, "
        "  count(*) OVER () AS n FROM l) "
        "SELECT CAST(max(n) AS BIGINT) AS n_converted, "
        "min(CASE WHEN rn >= ceil(0.5*n) THEN lat END) AS p50, "
        "min(CASE WHEN rn >= ceil(0.9*n) THEN lat END) AS p90 FROM r"
    )
    out["theilsen_orders"] = (
        # pairwise slopes as identical one-division doubles over exact
        # integers; discrete medians by the rank-ceil formulation
        "WITH d AS (SELECT o_orderpriority AS g, "
        "  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) // 7 AS x, "
        f"  sum({_sql_cents('o_totalprice')}) AS y FROM orders GROUP BY 1, 2), "
        "p AS (SELECT a.g, CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl "
        "  FROM d a JOIN d b ON a.g = b.g AND a.x < b.x), "
        "rs AS (SELECT g, sl, row_number() OVER (PARTITION BY g ORDER BY sl) AS rn, "
        "  count(*) OVER (PARTITION BY g) AS m FROM p), "
        "ms AS (SELECT g, min(CASE WHEN rn >= ceil(0.5*m) THEN sl END) AS slope, "
        "  max(m) AS n_pairs FROM rs GROUP BY 1), "
        "r AS (SELECT d.g, CAST(d.y AS DOUBLE) - ms.slope * CAST(d.x AS DOUBLE) AS res "
        "  FROM d JOIN ms USING (g)), "
        "rr AS (SELECT g, res, row_number() OVER (PARTITION BY g ORDER BY res) AS rn, "
        "  count(*) OVER (PARTITION BY g) AS n FROM r), "
        "mi AS (SELECT g, min(CASE WHEN rn >= ceil(0.5*n) THEN res END) AS icept, "
        "  max(n) AS n_points FROM rr GROUP BY 1) "
        "SELECT ms.g AS o_orderpriority, CAST(mi.n_points AS BIGINT) AS n_points, "
        "CAST(ms.n_pairs AS BIGINT) AS n_pairs, round(ms.slope, 6) AS slope, "
        "round(mi.icept, 6) AS intercept FROM ms JOIN mi USING (g)"
    )
    out["bigram_entropy"] = (
        f"WITH toks AS (SELECT {SQL_TOKS_LOWER} AS t FROM documents), "
        "idx AS (SELECT t, unnest(generate_series(1, len(t)-1)) AS i "
        "  FROM toks WHERE len(t) >= 2), "
        "c12 AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS c12 "
        "  FROM idx GROUP BY 1, 2), "
        "c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1), "
        "tot AS (SELECT sum(c1) AS n2, count(*) AS v1 FROM c1), "
        "q AS (SELECT CAST(floor(((CAST(c12 AS DOUBLE) / CAST(n2 AS DOUBLE)) "
        "  * ln(CAST(c1 AS DOUBLE) / CAST(c12 AS DOUBLE))) * 1e12 + 0.5) AS BIGINT) AS q "
        "  FROM c12 JOIN c1 USING (w1), tot) "
        "SELECT (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_bigrams, "
        "(SELECT CAST(v1 AS BIGINT) FROM tot) AS v_contexts, "
        "CAST(floor((sum(q) + 500000) / 1000000.0) AS BIGINT) / 1.0e6 AS cond_entropy "
        "FROM q"
    )
    out["cusum_events"] = (
        # exact n·S_n-scaled CUSUM with the two-candidates-per-observed-
        # bucket endpoint enumeration (gap interiors are dominated);
        # argmax via (|D| DESC, p ASC) row_number — earliest-position ties
        "WITH c AS (SELECT event_type AS g, epoch_us(ts)//3600000000 AS t, "
        "  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "r AS (SELECT g, t, CAST(x AS HUGEINT) AS x, "
        "  sum(CAST(x AS HUGEINT)) OVER (PARTITION BY g ORDER BY t "
        "    ROWS UNBOUNDED PRECEDING) AS sp, "
        "  sum(CAST(x AS HUGEINT)) OVER (PARTITION BY g) AS sn, "
        "  min(t) OVER (PARTITION BY g) AS mn, "
        "  max(t) OVER (PARTITION BY g) - min(t) OVER (PARTITION BY g) + 1 AS n "
        "  FROM c), "
        "cand AS (SELECT g, n, sn, mn, t - mn + 1 AS p, "
        "    abs(n*sp - (t - mn + 1)*sn) AS ad FROM r "
        "  UNION ALL SELECT g, n, sn, mn, t - mn AS p, "
        "    abs(n*(sp - x) - (t - mn)*sn) AS ad FROM r), "
        "v AS (SELECT * FROM cand WHERE p >= 1 AND p <= n - 1), "
        "b AS (SELECT g, n, sn, mn, p, ad, row_number() OVER "
        "  (PARTITION BY g ORDER BY ad DESC, p ASC) AS rn FROM v) "
        "SELECT g AS event_type, CAST(n AS BIGINT) AS n, "
        "CAST(mn + p - 1 AS BIGINT) AS t_star, "
        "CASE WHEN sn = 0 OR n < 2 THEN NULL ELSE "
        "round(CAST(ad AS DOUBLE) / CAST(n*sn AS DOUBLE), 6) END AS stat "
        "FROM b WHERE rn = 1"
    )
    out["gini_orders"] = (
        "WITH v AS (SELECT o_orderpriority AS g, "
        f"{_sql_cents('o_totalprice')} AS v FROM orders), "
        "r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS i FROM v), "
        "a AS (SELECT g, count(*) AS n, sum(CAST(v AS HUGEINT)) AS s, "
        "  sum(CAST(i AS HUGEINT) * v) AS iws FROM r GROUP BY 1) "
        "SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS total, "
        "CASE WHEN n*s = 0 THEN NULL ELSE "
        "round(CAST(2*iws - (n + 1)*s AS DOUBLE) / CAST(n*s AS DOUBLE), 6) END AS gini "
        "FROM a"
    )
    out["benford_prices"] = (
        f"WITH v AS (SELECT {_sql_cents('l_extendedprice')} AS v "
        f"  FROM lineitem WHERE {_sql_cents('l_extendedprice')} > 0), "
        "c AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit, "
        "  CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1), "
        "t AS (SELECT sum(n) AS tot FROM c), "
        "d AS (SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit) "
        "SELECT d.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n, "
        "round(CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share, "
        "round(log10(1.0 + 1.0 / CAST(d.digit AS DOUBLE)), 6) AS benford "
        "FROM d LEFT JOIN c USING (digit), t"
    )
    out["stream_cms"] = (
        # the streaming cells drain to the SAME sketch table as a batch
        # cms_build over events.user_id, so the oracle replays every hash
        # (cms_heavy recipe, user_id column)
        "WITH tc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_n "
        "  FROM events GROUP BY 1), "
        "probes AS (SELECT user_id, true_n FROM tc ORDER BY true_n DESC, user_id ASC LIMIT 10), "
        "cells AS (SELECT rr.i AS row, "
        "  ('0x'||substr(md5(CAST(user_id AS VARCHAR) || '#cms' || rr.i),1,7))::BIGINT % 256 AS pos "
        "  FROM events, range(0,3) rr(i)), "
        "sk AS (SELECT row, pos, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY 1, 2), "
        "pr AS (SELECT p.user_id, p.true_n, rr.i AS row, "
        "  ('0x'||substr(md5(CAST(p.user_id AS VARCHAR) || '#cms' || rr.i),1,7))::BIGINT % 256 AS pos "
        "  FROM probes p, range(0,3) rr(i)), "
        "est AS (SELECT pr.user_id, pr.true_n, CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS est_n "
        "  FROM pr LEFT JOIN sk ON sk.row = pr.row AND sk.pos = pr.pos GROUP BY 1, 2) "
        "SELECT user_id, true_n, est_n, CAST(est_n - true_n AS BIGINT) AS overcount FROM est"
    )
    from index_spark.operators.sampling import _KMV_HEX_CHARS as _HEX60

    out["dsir_weights"] = (
        # hashed-bigram DSIR: same md5-prefix60 bucket rule, add-1
        # smoothing over exact BIGINT counts, per-doc sorted fold
        f"WITH toks AS (SELECT doc_id, source, {SQL_TOKS_LOWER} AS t FROM documents), "
        "idx AS (SELECT doc_id, source, t, unnest(generate_series(1, len(t)-1)) AS i "
        "  FROM toks WHERE len(t) >= 2), "
        "pr AS (SELECT doc_id, source = 'src0' AS tgt, "
        f"  ('0x'||substr(md5(t[i]||' '||t[i+1]),1,{_HEX60}))::BIGINT % 256 AS b FROM idx), "
        "tf AS (SELECT doc_id, tgt, b, CAST(count(*) AS BIGINT) AS tf "
        "  FROM pr GROUP BY 1, 2, 3), "
        "bk AS (SELECT b, coalesce(sum(CASE WHEN tgt THEN tf END), 0) AS ct, "
        "  coalesce(sum(CASE WHEN NOT tgt THEN tf END), 0) AS cr FROM tf GROUP BY 1), "
        "tot AS (SELECT sum(ct) AS t_tot, sum(cr) AS r_tot FROM bk), "
        "lam AS (SELECT b, ln((CAST(ct + 1 AS DOUBLE) * CAST(r_tot + 256 AS DOUBLE)) "
        "  / (CAST(cr + 1 AS DOUBLE) * CAST(t_tot + 256 AS DOUBLE))) AS lam "
        "  FROM bk, tot), "
        "c AS (SELECT doc_id, tf, CAST(tf AS DOUBLE) * lam AS c "
        "  FROM tf JOIN lam USING (b) WHERE NOT tgt) "
        "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_grams, "
        "round(list_sum(list(c ORDER BY c)), 6) AS log_w FROM c GROUP BY 1"
    )
    out["cohort_retention"] = (
        "WITH a AS (SELECT DISTINCT user_id AS u, CAST(floor("
        "  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 1.0) "
        "  AS BIGINT) AS p FROM events), "
        "f AS (SELECT u, min(p) AS c FROM a GROUP BY 1), "
        "t AS (SELECT c AS cohort_period, a.p - f.c AS period_offset, "
        "  CAST(count(*) AS BIGINT) AS n_active FROM a JOIN f USING (u) "
        "  GROUP BY 1, 2), "
        "sz AS (SELECT cohort_period, n_active AS s FROM t WHERE period_offset = 0) "
        "SELECT t.cohort_period, t.period_offset, t.n_active, "
        "round(CAST(t.n_active AS DOUBLE) / CAST(sz.s AS DOUBLE), 6) AS retention "
        "FROM t JOIN sz USING (cohort_period)"
    )
    out["pmi_pairs"] = (
        f"WITH toks AS (SELECT doc_id, {SQL_TOKS_LOWER} AS t FROM documents), "
        "idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i "
        "  FROM toks WHERE len(t) >= 2), "
        "pairs AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM idx), "
        "c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 "
        "  FROM pairs GROUP BY 1,2), "
        "uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c "
        "  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1), "
        "n1 AS (SELECT CAST(sum(c) AS HUGEINT) AS n1 FROM uni), "
        "n2 AS (SELECT CAST(sum(c12) AS HUGEINT) AS n2 FROM c12) "
        "SELECT w1, w2, c12, "
        "round(ln(CAST(CAST(c12 AS HUGEINT) * n1 * n1 AS DOUBLE) "
        "  / CAST(n2 * CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) AS DOUBLE)), 6) AS pmi "
        "FROM c12 JOIN uni a ON a.w = c12.w1 JOIN uni b ON b.w = c12.w2, n1, n2 "
        "WHERE c12 >= 5 ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20"
    )
    from index_spark.operators.sampling import _KMV_HEX_CHARS

    out["source_overlap"] = (
        f"WITH t AS (SELECT source, {SQL_TOKS_LOWER} AS w FROM documents), "
        "idx AS (SELECT source, w, unnest(generate_series(1, len(w)-4)) AS i "
        "  FROM t WHERE len(w) >= 5), "
        "g AS (SELECT DISTINCT source, ('0x'||substr(md5(concat_ws(' ', "
        f"  w[i], w[i+1], w[i+2], w[i+3], w[i+4])),1,{_KMV_HEX_CHARS}))::BIGINT "
        "  AS h FROM idx) "
        "SELECT a.source AS src_a, b.source AS src_b, "
        "CAST(count(*) AS BIGINT) AS shared_grams "
        "FROM g a JOIN g b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2"
    )
    out["priority_trend"] = (
        # same fixed expression tree as grouped_linear_trend: exact
        # integer sufficient stats (HUGEINT here, decimal(38,0) in
        # Spark), doubles only in the final closed form, identical
        # parenthesization
        "WITH d AS (SELECT o_orderpriority, "
        "  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x, "
        f"  sum({_sql_cents('o_totalprice')}) AS y FROM orders GROUP BY 1, 2), "
        "s AS (SELECT o_orderpriority, count(*) AS n, sum(x) AS sx, "
        "  sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy "
        "  FROM d GROUP BY 1) "
        "SELECT o_orderpriority, CAST(n AS BIGINT) AS n_points, "
        "round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope, "
        "round((CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) "
        "  / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)) "
        "  / CAST(n AS DOUBLE), 6) AS intercept, "
        "CASE WHEN n*syy - sy*sy = 0 THEN NULL ELSE "
        "round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) "
        "  / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6) "
        "END AS r2 "
        "FROM s WHERE n*sxx - sx*sx <> 0"
    )
    out["ohlc_hourly"] = (
        "WITH e AS (SELECT event_type, epoch_us(ts)//3600000000 AS h, value, "
        "  epoch_us(ts) AS tu, event_id, "
        "  row_number() OVER (PARTITION BY event_type, epoch_us(ts)//3600000000 "
        "    ORDER BY epoch_us(ts), event_id) AS ra, "
        "  row_number() OVER (PARTITION BY event_type, epoch_us(ts)//3600000000 "
        "    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd "
        "  FROM events) "
        "SELECT event_type, h, "
        "round(min(CASE WHEN ra = 1 THEN value END), 6) AS open, "
        "round(max(value), 6) AS high, round(min(value), 6) AS low, "
        "round(min(CASE WHEN rd = 1 THEN value END), 6) AS close, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM e GROUP BY 1, 2 HAVING count(*) >= 3"
    )
    out["span_trim"] = (
        f"WITH corpus AS ({dup_docs}), "
        f"t AS (SELECT doc_id, {SQL_TOKS_LOWER} AS w FROM corpus), "
        "g AS (SELECT doc_id, i - 1 AS i0, "
        "  ('0x'||substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])),1,15))::BIGINT AS h "
        "  FROM t, UNNEST(range(1, greatest(len(w)-3, 1))) r(i) WHERE len(w) >= 5), "
        "dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2), "
        "cov AS (SELECT DISTINCT g.doc_id, i0 + d AS j FROM g JOIN dup USING(h), "
        "  UNNEST(range(0, 5)) rr(d)), "
        "tok AS (SELECT doc_id, i - 1 AS j, w[i] AS tok FROM t, "
        "  UNNEST(range(1, len(w) + 1)) r(i)), "
        "kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, j)), "
        "reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text, "
        "  CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1), "
        "alln AS (SELECT doc_id, len(w) AS n FROM t WHERE len(w) >= 1) "
        "SELECT a.doc_id, md5(coalesce(r.clean_text, '')) AS clean_md5, "
        "CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept, "
        "CAST(a.n - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed "
        "FROM alln a LEFT JOIN reb r USING (doc_id) WHERE a.doc_id % 7 = 0"
    )
    out["sharded_mor_delete"] = (
        "SELECT CAST(count(*) AS BIGINT) AS n_live, "
        + _sql_sum_cents("o_totalprice", "total")
        + ", min(o_orderdate) AS min_date, max(o_orderkey) AS max_key "
        "FROM orders WHERE o_orderkey < 12000 AND o_orderdate >= DATE '1997-01-01'"
    )
    out["kmv_groups"] = (
        "WITH fr AS (SELECT DISTINCT event_type, "
        "  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)"
        "  / 1152921504606846976.0 AS frac FROM events), "
        "r AS (SELECT event_type, frac, row_number() OVER "
        "  (PARTITION BY event_type ORDER BY frac) AS rn FROM fr) "
        "SELECT event_type, CAST(CASE WHEN count(*) < 32 THEN count(*) "
        "  ELSE round((count(*) - 1) / max(frac)) END AS BIGINT) AS est_distinct, "
        "CAST(count(*) AS BIGINT) AS k_used FROM r WHERE rn <= 32 GROUP BY 1"
    )
    out["set_join_exact"] = (
        # same token-less-doc guard as containment_pairs: two empty docs
        # would otherwise yield 0/0 = NaN, which DuckDB compares greater
        # than the threshold (the operator never emits empty docs).
        "WITH d AS (SELECT doc_id, list_sort(list_distinct("
        "  regexp_extract_all(lower(text), '\\S+'))) AS s "
        "  FROM documents WHERE doc_id % 3 = 0 AND regexp_matches(text, '\\S')) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) "
        "  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard "
        "FROM d a JOIN d b ON a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) "
        "  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5"
    )
    out["containment_pairs"] = (
        # regexp_matches(text, '\\S') mirrors the operator's implicit exclusion of
        # token-less docs (they never enter per_doc); without it an
        # empty/whitespace-only doc yields 0/0 here, and DuckDB's NaN
        # compares GREATER than any threshold — phantom pairs.
        "WITH d AS (SELECT doc_id, list_sort(list_distinct("
        "  regexp_extract_all(lower(text), '\\S+'))) AS s "
        "  FROM documents WHERE doc_id % 5 = 0 AND regexp_matches(text, '\\S')) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6) "
        "  AS containment "
        "FROM d a JOIN d b ON a.doc_id <> b.doc_id "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9"
    )
    out["edit_distance_join"] = (
        "WITH c AS (SELECT c_custkey, lower(c_name) AS t FROM customer "
        "  WHERE c_custkey % 5 = 0) "
        "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
        "CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist "
        "FROM c a JOIN c b ON a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.t, b.t) <= 1"
    )
    out["skyline_parts"] = (
        f"WITH src AS (SELECT p_partkey, {_sql_cents('p_retailprice')} AS price_c, "
        "  CAST(p_size AS BIGINT) AS size FROM part), "
        "m AS (SELECT price_c, min(size) AS my FROM src GROUP BY 1), "
        "t AS (SELECT price_c, my, min(my) OVER (ORDER BY price_c "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my_before FROM m) "
        "SELECT s.p_partkey, s.price_c, s.size FROM src s JOIN t "
        "ON s.price_c = t.price_c "
        "WHERE NOT ((t.my_before IS NOT NULL AND t.my_before <= s.size) "
        "  OR t.my < s.size)"
    )
    out["interval_overlap"] = (
        "WITH a AS (SELECT user_id AS a_user, min(epoch_us(ts)) AS a_s, "
        "  max(epoch_us(ts)) + 1 AS a_e FROM events "
        "  WHERE event_type = 'click' AND user_id % 10 = 0 GROUP BY 1), "
        "b AS (SELECT user_id AS b_user, min(epoch_us(ts)) AS b_s, "
        "  max(epoch_us(ts)) + 1 AS b_e FROM events "
        "  WHERE event_type = 'purchase' AND user_id % 7 = 0 GROUP BY 1) "
        "SELECT a_user, a_s, a_e, b_user, b_s, b_e FROM a JOIN b "
        "ON a_s < b_e AND b_s < a_e"
    )
    out["ks_drift"] = (
        f"WITH o AS (SELECT {_sql_cents('o_totalprice')} AS cents, o_orderdate FROM orders), "
        "a AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS na FROM o "
        "  WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1), "
        "b AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS nb FROM o "
        "  WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1), "
        "m AS (SELECT coalesce(a.v, b.v) AS v, coalesce(na, 0) AS na, "
        "  coalesce(nb, 0) AS nb FROM a FULL JOIN b ON a.v = b.v), "
        "c AS (SELECT sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING "
        "  AND CURRENT ROW) AS ca, sum(nb) OVER (ORDER BY v ROWS BETWEEN "
        "  UNBOUNDED PRECEDING AND CURRENT ROW) AS cb FROM m), "
        "t AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b FROM m) "
        "SELECT n_a, n_b, round(max(abs(CAST(ca AS DOUBLE) / n_a "
        "  - CAST(cb AS DOUBLE) / n_b)), 6) AS d_stat FROM c, t GROUP BY 1, 2"
    )
    return out


# Round-9 gate rotation (re-certification, not new coverage): the driver's
# correctness gate verifies only the first ~50 build_queries() entries per
# round.  After the r8 rotation the hard-signal gaps are (1) the 23
# round-8 queries that landed AFTER the r8 gate window was cut — they have
# green local-oracle evidence (the r8 verdict's independent 33/33 run) but
# NO driver row yet — and (2) the 12 queries whose latest green driver row
# is r04 (stream_dedup_ingest … kmv_groups).  Front-load the 23
# driver-pending queries, then the full r04 cohort, then top up with the
# 15 oldest r05-latest queries in catalog order — the cadence that keeps
# all 235 queries' green evidence at most ~4 rounds old under a 50-slot
# gate.  With this rotation every catalog query has a driver row.
# New round-9 queries, if any existed, would go FIRST; round 9
# deliberately adds none (the r8 verdict: consolidate evidence, stop
# growing the catalog).
_GATE_PRIORITY_R9 = [
    # round-8 post-window queries (23): green on the local oracle harness
    # and the r8 verdict's independent run, but never driver-checked.
    "pmi_pairs", "source_overlap", "stream_hll", "corr_lineitem",
    "mad_outliers", "chi2_events", "dsir_weights", "acf_hourly",
    "cusum_events", "gini_orders", "benford_prices", "stream_cms",
    "theilsen_orders", "bigram_entropy", "hll_intersect",
    "cluster_size_hist", "event_lift", "conversion_latency",
    "reconcile_totals", "mix_corpus", "psi_drift", "stream_hll_hourly",
    "conversion_ab",
    # r04-latest (12, per CORRECTNESS_r01–r08: every query whose LATEST
    # green driver row is r04), in catalog order.
    "stream_dedup_ingest", "udtf_tokens", "full_pipeline",
    "erase_roundtrip", "incremental_dedup", "mor_delete", "domain_cap",
    "boolean_retrieval", "split_leakage", "winsorized_stats",
    "equidepth_hist", "kmv_groups",
    # oldest r05-latest fills (15 of 50, catalog order); r10 continues
    # the r05 cohort.
    "change_feed", "bloom_point", "exact_quantiles", "ohlc_hourly",
    "span_trim", "sharded_mor_delete", "set_join_exact", "ks_drift",
    "interval_overlap", "skyline_parts", "edit_distance_join",
    "inverted_postings", "multimodal_features", "gapfill_hourly",
    "ewma_users",
]


# Round-10 gate rotation (re-certification, not new coverage — the catalog
# stays frozen at 235 per six rounds of verdicts).  Order per the r9
# verdict: (a) the 10 queries whose CURRENT implementation has never been
# driver-checked — their latest driver rows (r06–r08) predate the r9
# rewrites (splitmix64 MinHash coefficients changed every minhash-family
# output; the 60-bit md5_prefix60 identity-key migration changed the
# contamination/span/segment outputs; the shuffle-free doc-local rewrite
# changed the repetition/entropy plans) — the r9 verdict's independent
# oracle run passed all 10 on the final tree, but the driver row is the
# hard signal; (b) the full 35-query r05-latest cohort (hourly_anomaly …
# store_history, catalog order); (c) the 5 oldest r06-latest fills in
# catalog order (skipping dedup_clusters, already in cohort a).  The r06
# cohort continues in r11.
_GATE_PRIORITY_R10 = [
    # (a) r9-rewritten, driver row predates the rewrite (10)
    "minhash_signatures", "minhash_lsh_pairs", "near_dedup_survivors",
    "ngram_jaccard_pairs", "dedup_clusters", "contamination_scan",
    "dup_span_stats", "segment_dedup", "repetition_quality",
    "token_entropy",
    # (b) r05-latest cohort (35, catalog order)
    "hourly_anomaly", "knn_graph", "scd2_customer", "zone_map_skip",
    "curriculum_bins", "pit_join", "bm25_topk", "json_props",
    "stream_hourly_topk", "band_join_events", "merge_into_orders",
    "chunk_docs", "asof_cogroup", "retention_delete", "schema_evolution",
    "bfs_hops", "dq_expectations", "cms_heavy", "rollback_restore",
    "stream_merge_state", "lsh_recall", "pivot_status", "unpivot_metrics",
    "window_ranks", "fuzzy_token_pairs", "arrow_norms", "epoch_shuffle",
    "lang_rebalance", "projection_lookup", "longest_streak",
    "projection_range", "seasonality_profile", "ratio_to_report",
    "window_nth", "store_history",
    # (c) oldest r06-latest fills (5, catalog order; dedup_clusters is
    # in cohort a) — r11 continues the r06 cohort.
    "weighted_quantiles", "embedding_near_dups", "binary_key_range",
    "multi_get_large", "error_codes",
]


# Round-11 gate rotation (re-certification, not new coverage — the catalog
# stays frozen at 235 per seven rounds of verdicts).  Order per the r10
# verdict: (a) the full 44-query r06-latest cohort (every query whose
# LATEST green driver row is r06 after the r10 gate — replayed from
# CORRECTNESS_r01–r10 — in catalog order: the point-read/scan/mutation
# core, the datom indexes, and the TPC-H sweep); (b) the 6 oldest
# r07-latest fills in catalog order (the r10 verdict prescribed 5, but
# the driver window and the well-formedness contract are 50 slots —
# 44 + 6 fills the window deliberately rather than letting slot 50 fall
# to an arbitrary catalog entry).  No rewrite-stale cohort exists: r10
# was the first round with zero evidence-vs-implementation skew, and
# round 11's engine diffs (docstrings, a shared shingle helper, an
# opt-out broadcast flag defaulting to the current plan) change no
# query's output.  After this gate the staleness floor moves to r07
# (41 r07-latest remain for r12).
_GATE_PRIORITY_R11 = [
    # (a) r06-latest cohort (44, catalog order)
    "compact_files", "point_get", "multi_get", "get_all_missing",
    "range_scan", "gt_scan", "lt_scan_reverse", "prefix_scan",
    "prefix_bounded_gt", "composite_range", "top_k", "next_key",
    "previous_key", "min_max_count", "split_median", "merge_halves",
    "sharded_range", "bucketed_join", "upsert_batch", "dup_key_check",
    "version_changed_check", "datoms_count_by_attr", "datoms_avet_lookup",
    "datoms_vaet_refchase", "datoms_eavt_entity", "q1_pricing",
    "q3_revenue_topk", "q5_nation_revenue", "q6_filter_agg",
    "semi_join_priority", "anti_join_parts", "q13_custdist",
    "q2_min_price_part", "q7_nation_volume", "q8_market_share",
    "q9_red_parts_revenue", "q10_returned_topk", "q12_priority_class",
    "q14_promo_share", "q15_top_supplier", "q18_large_orders",
    "q19_bracket_filter", "q22_idle_rich", "group_topk",
    # (b) oldest r07-latest fills (6, catalog order) — r12 continues
    # the r07 cohort.
    "bigram_nll", "zipf_fit", "js_sources", "vocab_growth", "heaps_fit",
    "containment_pairs",
]


# Round-12 gate rotation (re-certification, not new coverage — the catalog
# stays frozen at 235 per eight rounds of verdicts). Order per the r11
# verdict's item 1: (a) the 17 r11-optimization-touched queries, whose
# driver rows must postdate the r11 rewrites (only compact_files,
# upsert_batch, sharded_range of them were in the r11 gate); (b) the 11
# r12-optimization-touched queries (derived streaming state partitions
# across all ten drains, the one-UDF-pass incremental-dedup fusion, the
# quantile-family persists, the execute() payload cache behind
# retention_delete's delete_where, the triangle wedge-pass fusion, the
# ks_drift merge persist); (c) 20 fills from the 41-query r07-latest
# cohort in catalog order (snapshot_diff, stream_hourly,
# stream_sessionize, stream_dedup, stream_join_attrib of that cohort
# already sit in (a)/(b)). 16 r07-latest queries remain for r13:
# cosine_topk, ivf_label_topk, pipeline_end_to_end, multimodal_meta,
# frame_plan, skew_salted_join, skew_two_phase_agg, stratified_sample,
# pack_sequences, kmv_distinct, window_count_join, time_rollup,
# events_type_summary, sql_interface, vocab_coverage, top_bigrams.
_GATE_PRIORITY_R12 = [
    # (a) r11-touched (17)
    "split_leakage", "hll_distinct", "hll_intersect", "stream_hll",
    "stream_hll_hourly", "stream_hourly", "stream_sessionize",
    "stream_hourly_topk", "stream_cms", "compact_files", "snapshot_diff",
    "incremental_maint", "erase_roundtrip", "upsert_batch",
    "merge_into_orders", "sharded_range", "projection_lookup",
    # (b) r12-touched (13)
    "stream_dedup_ingest", "incremental_dedup", "exact_quantiles",
    "weighted_quantiles", "equidepth_hist", "conversion_latency",
    "stream_dedup", "stream_user_state", "stream_funnel",
    "stream_join_attrib", "retention_delete", "triangle_parts",
    "ks_drift",
    # (c) oldest r07-latest fills (20, catalog order; vocab_coverage and
    # top_bigrams move to the r13 remainder to make room for the last two
    # touched entries)
    "seek_pagination", "sharded_time_travel", "rollup_orders",
    "cube_orders", "set_ops", "scalar_functions", "median_stats",
    "array_agg", "distinct_parts", "dedup_exact_groups", "dedup_survivors",
    "simhash16", "text_quality", "lang_id", "doc_fingerprint",
    "bpe_token_stats", "rolling_fingerprint", "token_stats",
    "grouping_sets", "jsonl_roundtrip",
]


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _catalog()
    ordered = {k: base[k] for k in _GATE_PRIORITY_R12}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


def _catalog() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The full query catalog (one entry per operator).  Literal order here is the historical
    # (r5) gate order; build_queries() applies the current round's
    # re-certification priority on top.  Functionally identical either way.
    return {
        # --- (a0) round-5 front-load: no green driver row yet — 11 never
        #     gate-checked (the r4 gate window cut at position 50),
        #     inverted_postings (erred r4 on the raw-array column, now
        #     array_join'ed), and multimodal_features (newly hash-gated via
        #     the md5-tiled fake decode). The driver checks the first ~50
        #     entries per round; new round-5 queries slot right after this
        #     block so the whole catalog ends the round driver-verified.
        "change_feed": q_change_feed,
        "bloom_point": q_bloom_point,
        "exact_quantiles": q_exact_quantiles,
        "ohlc_hourly": q_ohlc_hourly,
        "span_trim": q_span_trim,
        "sharded_mor_delete": q_sharded_mor_delete,
        "set_join_exact": q_set_join_exact,
        "ks_drift": q_ks_drift,
        "interval_overlap": q_interval_overlap,
        "skyline_parts": q_skyline_parts,
        "edit_distance_join": q_edit_distance_join,
        "inverted_postings": q_inverted_postings,
        "multimodal_features": q_multimodal_features,
        # --- (a) round-4 front-load (all driver-green in r4; backfill for
        #     the rest of the r5 gate window).
        "gapfill_hourly": q_gapfill_hourly,
        "ewma_users": q_ewma_users,
        "hourly_anomaly": q_hourly_anomaly,
        "knn_graph": q_knn_graph,
        "scd2_customer": q_scd2_customer,
        "zone_map_skip": q_zone_map_skip,
        "curriculum_bins": q_curriculum_bins,
        "pit_join": q_pit_join,
        "bm25_topk": q_bm25_topk,
        "json_props": q_json_props,
        "stream_hourly_topk": q_stream_hourly_topk,
        "band_join_events": q_band_join_events,
        "merge_into_orders": q_merge_into_orders,
        "chunk_docs": q_chunk_docs,
        "asof_cogroup": q_asof_cogroup,
        "retention_delete": q_retention_delete,
        "schema_evolution": q_schema_evolution,
        "bfs_hops": q_bfs_hops,
        "dq_expectations": q_dq_expectations,
        "cms_heavy": q_cms_heavy,
        "rollback_restore": q_rollback_restore,
        "stream_merge_state": q_stream_merge_state,
        "lsh_recall": q_lsh_recall,
        "pivot_status": q_pivot_status,
        "unpivot_metrics": q_unpivot_metrics,
        "window_ranks": q_window_ranks,
        "fuzzy_token_pairs": q_fuzzy_token_pairs,
        "arrow_norms": q_arrow_norms,
        "epoch_shuffle": q_epoch_shuffle,
        "lang_rebalance": q_lang_rebalance,
        "projection_lookup": q_projection_lookup,
        "longest_streak": q_longest_streak,
        "projection_range": q_projection_range,
        "seasonality_profile": q_seasonality_profile,
        "ratio_to_report": q_ratio_to_report,
        "window_nth": q_window_nth,
        "store_history": q_store_history,
        "stream_dedup_ingest": q_stream_dedup_ingest,
        "udtf_tokens": q_udtf_tokens,
        "full_pipeline": q_full_pipeline,
        "erase_roundtrip": q_erase_roundtrip,
        "incremental_dedup": q_incremental_dedup,
        # --- (b) round-4 additions already driver-green in r4 (the rest
        #     moved to block (a0) above) ---
        "mor_delete": q_mor_delete,
        "domain_cap": q_domain_cap,
        "boolean_retrieval": q_boolean_retrieval,
        "split_leakage": q_split_leakage,
        "winsorized_stats": q_winsorized_stats,
        "equidepth_hist": q_equidepth_hist,
        "weighted_quantiles": q_weighted_quantiles,
        # round-7 additions: corpus statistical diagnostics
        "bigram_nll": q_bigram_nll,
        "zipf_fit": q_zipf_fit,
        "js_sources": q_js_sources,
        "vocab_growth": q_vocab_growth,
        "heaps_fit": q_heaps_fit,
        "containment_pairs": q_containment_pairs,
        # round-8 additions: HLL sketch, cohort retention, grouped OLS
        # (gate-fronted), plus two post-window additions whose driver
        # rows land in the r9 gate (the r3/r4 precedent): PMI
        # collocations and the cross-source n-gram overlap matrix
        "hll_distinct": q_hll_distinct,
        "cohort_retention": q_cohort_retention,
        "priority_trend": q_priority_trend,
        "pmi_pairs": q_pmi_pairs,
        "source_overlap": q_source_overlap,
        "stream_hll": q_stream_hll,
        # round-8 continuation: correlation matrix, MAD outliers,
        # chi-squared independence, DSIR importance weights — post-window
        # additions whose driver rows land in the r9 gate
        "corr_lineitem": q_corr_lineitem,
        "mad_outliers": q_mad_outliers,
        "chi2_events": q_chi2_events,
        "dsir_weights": q_dsir_weights,
        "acf_hourly": q_acf_hourly,
        "cusum_events": q_cusum_events,
        "gini_orders": q_gini_orders,
        "benford_prices": q_benford_prices,
        "stream_cms": q_stream_cms,
        "theilsen_orders": q_theilsen_orders,
        "bigram_entropy": q_bigram_entropy,
        "hll_intersect": q_hll_intersect,
        "cluster_size_hist": q_cluster_size_hist,
        "event_lift": q_event_lift,
        "conversion_latency": q_conversion_latency,
        "reconcile_totals": q_reconcile_totals,
        "mix_corpus": q_mix_corpus,
        "psi_drift": q_psi_drift,
        "stream_hll_hourly": q_stream_hll_hourly,
        "conversion_ab": q_conversion_ab,
        "kmv_groups": q_kmv_groups,
        # --- (c) already driver-green in r1/r2/r3 ---
        "near_dedup_survivors": q_near_dedup_survivors,
        "simhash_block_pairs": q_simhash_block_pairs,
        "stream_user_state": q_stream_user_state,
        "csv_roundtrip": q_csv_roundtrip,
        "dedup_clusters_star": q_dedup_clusters_star,
        "seek_pagination": q_seek_pagination,
        "snapshot_diff": q_snapshot_diff,
        "sharded_time_travel": q_sharded_time_travel,
        "asof_join_tolerance": q_asof_join_tolerance,
        "asof_lookup": q_asof_lookup,
        "asof_state": q_asof_state,
        "asof_join_events": q_asof_join_events,
        "window_lag": q_window_lag,
        "events_hourly": q_events_hourly,
        "sliding_window": q_sliding_window,
        "sessionize": q_sessionize,
        "lsh_sign_topk": q_lsh_sign_topk,
        "ivf_trained_topk": q_ivf_trained_topk,
        "repetition_quality": q_repetition_quality,
        "contamination_scan": q_contamination_scan,
        "group_percentiles": q_group_percentiles,
        "incremental_maint": q_incremental_maint,
        "orc_roundtrip": q_orc_roundtrip,
        "tfidf_top_terms": q_tfidf_top_terms,
        "token_entropy": q_token_entropy,
        "weighted_sample": q_weighted_sample,
        "seek_pagination_df": q_seek_pagination_df,
        "zorder_layout": q_zorder_layout,
        "dup_span_stats": q_dup_span_stats,
        "bloom_prune_join": q_bloom_prune_join,
        "unigram_nll": q_unigram_nll,
        "funnel_steps": q_funnel_steps,
        "first_seen_users": q_first_seen_users,
        "pagerank_parts": q_pagerank_parts,
        "profile_orders": q_profile_orders,
        "price_histogram": q_price_histogram,
        "pii_redaction": q_pii_redaction,
        "pq_topk": q_pq_topk,
        "q4_priority_exists": q_q4_priority_exists,
        "q11_important_parts": q_q11_important_parts,
        "q16_supplier_counts": q_q16_supplier_counts,
        "q17_small_qty_revenue": q_q17_small_qty_revenue,
        "q20_volume_suppliers": q_q20_volume_suppliers,
        "q21_waiting_suppliers": q_q21_waiting_suppliers,
        "event_transitions": q_event_transitions,
        "label_centroids": q_label_centroids,
        "kmv_union": q_kmv_union,
        "stream_funnel": q_stream_funnel,
        "triangle_parts": q_triangle_parts,
        "segment_dedup": q_segment_dedup,
        "rollup_orders": q_rollup_orders,
        "cube_orders": q_cube_orders,
        "set_ops": q_set_ops,
        "scalar_functions": q_scalar_functions,
        "median_stats": q_median_stats,
        "array_agg": q_array_agg,
        "distinct_parts": q_distinct_parts,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_survivors": q_dedup_survivors,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash16": q_simhash16,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "bpe_token_stats": q_bpe_token_stats,
        "rolling_fingerprint": q_rolling_fingerprint,
        "token_stats": q_token_stats,
        "grouping_sets": q_grouping_sets,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "top_bigrams": q_top_bigrams,
        "vocab_coverage": q_vocab_coverage,
        "cosine_topk": q_cosine_topk,
        "ivf_label_topk": q_ivf_label_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "pipeline_end_to_end": q_pipeline_end_to_end,
        "multimodal_meta": q_multimodal_meta,
        "frame_plan": q_frame_plan,
        "dedup_clusters": q_dedup_clusters,
        "skew_salted_join": q_skew_salted_join,
        "skew_two_phase_agg": q_skew_two_phase_agg,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "kmv_distinct": q_kmv_distinct,
        "window_count_join": q_window_count_join,
        "time_rollup": q_time_rollup,
        "events_type_summary": q_events_type_summary,
        "sql_interface": q_sql_interface,
        "stream_hourly": q_stream_hourly,
        "stream_sessionize": q_stream_sessionize,
        "stream_join_attrib": q_stream_join_attrib,
        "stream_dedup": q_stream_dedup,
        "binary_key_range": q_binary_key_range,
        "multi_get_large": q_multi_get_large,
        "error_codes": q_error_codes,
        "compact_files": q_compact_files,
        "point_get": q_point_get,
        "multi_get": q_multi_get,
        "get_all_missing": q_get_all_missing,
        "range_scan": q_range_scan,
        "gt_scan": q_gt_scan,
        "lt_scan_reverse": q_lt_scan_reverse,
        "prefix_scan": q_prefix_scan,
        "prefix_bounded_gt": q_prefix_bounded_gt,
        "composite_range": q_composite_range,
        "top_k": q_top_k,
        "next_key": q_next_key,
        "previous_key": q_previous_key,
        "min_max_count": q_min_max_count,
        "split_median": q_split_median,
        "merge_halves": q_merge_halves,
        "sharded_range": q_sharded_range,
        "bucketed_join": q_bucketed_join,
        "upsert_batch": q_upsert_batch,
        "dup_key_check": q_dup_key_check,
        "version_changed_check": q_version_changed_check,
        "datoms_count_by_attr": q_datoms_count_by_attr,
        "datoms_avet_lookup": q_datoms_avet_lookup,
        "datoms_vaet_refchase": q_datoms_vaet_refchase,
        "datoms_eavt_entity": q_datoms_eavt_entity,
        "q1_pricing": q_q1_pricing,
        "q3_revenue_topk": q_q3_revenue_topk,
        "q5_nation_revenue": q_q5_nation_revenue,
        "q6_filter_agg": q_q6_filter_agg,
        "semi_join_priority": q_semi_join_priority,
        "anti_join_parts": q_anti_join_parts,
        "q13_custdist": q_q13_custdist,
        "q2_min_price_part": q_q2_min_price_part,
        "q7_nation_volume": q_q7_nation_volume,
        "q8_market_share": q_q8_market_share,
        "q9_red_parts_revenue": q_q9_red_parts_revenue,
        "q10_returned_topk": q_q10_returned_topk,
        "q12_priority_class": q_q12_priority_class,
        "q14_promo_share": q_q14_promo_share,
        "q15_top_supplier": q_q15_top_supplier,
        "q18_large_orders": q_q18_large_orders,
        "q19_bracket_filter": q_q19_bracket_filter,
        "q22_idle_rich": q_q22_idle_rich,
        "group_topk": q_group_topk,
    }
