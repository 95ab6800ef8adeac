"""Structured Streaming surface of the engine.

The reference has no streaming (SURVEY.md §2.9 — "temporal" there means
snapshot versioning, not stream time). This module is the forward-looking
extension the task calls for, built on idiomatic Structured Streaming:

- ``read_events_stream``  — file-source stream over the driver's events
  parquet (schema pinned from a batch read; ``maxFilesPerTrigger`` bounds
  micro-batch size at scale).
- ``hourly_counts``       — watermarked tumbling-window aggregation. Late
  rows beyond the watermark are dropped; state for closed windows is
  evicted, so executor state is bounded no matter how long the stream runs.
- ``sessionized_counts``  — ``session_window`` (30-min inactivity gap)
  per-user sessions; the streaming twin of the batch ``sessionize`` query.
- ``user_running_state``  — custom stateful operator via
  ``applyInPandasWithState``: per-user running event count + last-seen
  timestamp with an idle-timeout that emits and evicts state (the shape any
  bespoke streaming operator takes when windows/aggs can't express it).
- ``stream_into_snapshots`` — ``foreachBatch`` CDC sink: every micro-batch
  becomes one versioned COW commit in a :class:`~index_spark.snapshots.
  SnapshotStore`, so the streaming path produces exactly the immutable
  snapshot lineage the batch engine reads (time travel over a live feed).

Scale notes: windowed aggregations shuffle on (window, key) — the same
partial-agg + final-agg shape as batch, with AQE coalescing; state-store
size is bounded by watermark eviction; ``foreachBatch`` writes are
per-micro-batch atomic because SnapshotStore commits are all-or-nothing.

All functions accept batch DataFrames too (window/session_window are
batch-legal), which is how the driver's DuckDB oracle checks them: the
streaming plan run with ``availableNow`` over a finite source must equal
the batch plan over the same files.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from index_spark.sources.tables import canonical_events


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """File-source stream over ``events.parquet`` with the engine's canonical
    events projection (``ts`` µs-truncated timestamp + ``ts_us`` bigint,
    matching :func:`index_spark.sources.load_table`)."""
    # schema pinned from a batch read of the same files (file streams
    # require an explicit schema); the canonicalizer then branches on
    # whatever dtype `ts` actually is (long for NANOS fixtures read with
    # nanosAsLong, timestamp_ntz for timestamp[us] fixtures).
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(raw_schema)
    if os.path.isdir(events_path):
        # Spark-style dataset directory: stream the directory itself (its
        # leaves are part-*.parquet, which a name glob on "events.parquet"
        # would silently miss, draining zero rows).
        source = events_path
    else:
        # single file: file streams need a directory source, so stream the
        # scale-factor dir glob-filtered down to this file by leaf name
        reader = reader.option("pathGlobFilter", "events.parquet")
        source = sf_dir
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return canonical_events(reader.parquet(source))


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts + value sum per event_type, late data beyond
    ``watermark`` dropped. Works on stream and batch DataFrames alike."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias("total"),
        )
        .select(F.unix_micros(F.col("w.start")).alias("hour_us"), "event_type", "n", "total")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-(user, session) event counts via ``session_window`` (inactivity
    gap). ONE stateful aggregation — streaming-legal in complete mode; the
    roll-up to per-user session counts is a separate (batch) step because
    chaining a second stateful agg onto a session window is not supported
    in a single streaming query."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch roll-up: number of sessions per user (30-min inactivity gap).
    Matches the lag-based ``sessionize`` driver query exactly — a session
    boundary is a gap strictly greater than ``gap``."""
    return sessionized(events, gap).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


_STATE_SCHEMA = "n_events BIGINT, last_ts_us BIGINT"
_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, last_ts_us BIGINT, closed BOOLEAN"


def _make_user_state_fn(timeout_ms: int):
    def _user_state_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Running per-user (event count, last ts); on idle timeout emit the
        final row flagged closed and evict the state."""
        (user_id,) = key
        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "last_ts_us": last, "closed": True}]
            )
            return
        n, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last = max(last, int(pdf["ts_us"].max()))
        state.update((n, last))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)  # idle → close + evict
        yield pd.DataFrame([{"user_id": user_id, "n_events": n, "last_ts_us": last, "closed": False}])

    return _user_state_fn


def user_running_state(events: DataFrame, timeout_ms: Optional[int] = 60_000) -> DataFrame:
    """Custom stateful operator: per-user running totals with idle eviction
    (``applyInPandasWithState`` — Arrow-batched, update-mode output).

    Update-mode emits one row per (user, micro-batch) plus a closed row on
    eviction — consumers wanting only the FINAL state aggregate with
    ``max`` (counts are monotone), which is what the driver query does.

    ``timeout_ms=None`` disables idle eviction (``NoTimeout``): a finite
    availableNow drain never terminates while processing-time timeouts are
    pending, so batch-equivalence checks use the no-timeout variant; the
    eviction path is exercised by the long-running streaming tests."""
    # 0 and None both mean "no idle eviction": selecting ProcessingTimeTimeout
    # without ever arming a timer (the 0 case) would be a third, undocumented
    # behavior — state never evicted yet the timeout conf carried.
    conf = (
        GroupStateTimeout.NoTimeout
        if not timeout_ms
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_user_state_fn(timeout_ms or 0),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )


def user_running_state_tws(events: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    :func:`user_running_state`: the same per-user running (count, last ts)
    as a ``StatefulProcessor`` with typed ValueState — the
    newer composable-state API (multiple named state variables, timers,
    TTL) that replaces GroupState for bespoke operators. Requires the
    RocksDB state-store provider (caller sets
    ``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package for the worker protocol — environments without
    it should use :func:`user_running_state` (same semantics, tested
    equal)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Running(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", "n_events BIGINT, last_ts_us BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, last = self._st.get() if self._st.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    last = max(last, int(pdf["ts_us"].max()))
            self._st.update((n, last))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_ts_us": [last]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts_us")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Running(),
            outputStructType="user_id BIGINT, n_events BIGINT, last_ts_us BIGINT",
            outputMode="Update",
            timeMode="None",
        )
    )


def attributed_purchases(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to every click by
    the same user at most ``horizon`` before it.

    Scale shape: both sides carry event-time watermarks and the join
    predicate is a bounded time range, so Spark can evict join state once
    the watermark passes ``click_ts + horizon`` — without the range bound
    the state store grows without limit. Works identically on batch inputs
    (the watermarks are skipped)."""
    c = clicks.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("ts_us").alias("click_us"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("ts_us").alias("purchase_us"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", "2 hours")
        p = p.withWatermark("purchase_ts", "2 hours")
    return c.join(
        p,
        (c.user_id == p.p_user)
        & (p.purchase_ts >= c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {horizon}")),
    ).select("user_id", "click_id", "purchase_id", "click_us", "purchase_us")


def hll_registers_stream(
    events: DataFrame, col: str = "user_id", group_col: str = "event_type", p: int = 10
) -> DataFrame:
    """Streaming HyperLogLog register maintenance: fold each micro-batch
    into the per-(group, register) ``max(rho)`` state — max is a
    commutative idempotent monoid, so arrival order, batch boundaries,
    and retries cannot move the drained register table off the batch
    build's (``operators.sampling.hll_registers`` — the identical
    column expressions via ``hll_register_cols``). State size is
    bounded at groups × 2^p rows regardless of stream length: the
    constant-memory distinct-count a metrics pipeline keeps per
    type/day forever. Works on stream and batch frames alike."""
    from index_spark.operators.sampling import hll_register_cols

    j, rho = hll_register_cols(col, p)
    return (
        events.filter(F.col(col).isNotNull())
        .select(F.col(group_col), j, rho)
        .groupBy(group_col, "j")
        .agg(F.max("rho").alias("rho"))
    )


def cms_cells_stream(
    events: DataFrame, col: str = "user_id", depth: int = 3, width: int = 256
) -> DataFrame:
    """Streaming count-min sketch maintenance: fold each micro-batch into
    the per-(row, pos) COUNT state — count is a commutative sum monoid,
    so arrival order and batch boundaries cannot move the drained cell
    table off the batch build (``operators.sampling.cms_build``, whose
    plan this IS: the explode + groupBy-count shape is stream-compatible
    as-is, so the streaming twin delegates rather than re-deriving the
    hash expressions). State is bounded at depth×width rows forever —
    the constant-memory frequency table a metrics pipeline keeps per
    stream. Unlike the HLL twin's max state, count is NOT idempotent:
    replayed inputs double-count, so exactly-once delivery is the
    engine's job (checkpointed sources / availableNow), not the
    sketch's."""
    from index_spark.operators.sampling import cms_build

    return cms_build(events.filter(F.col(col).isNotNull()), col, depth, width)


def dedup_stream(events: DataFrame, delay: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id. ``dropDuplicatesWithinWatermark``
    keeps dedup state only ``delay`` past the watermark — the streaming twin
    of the batch fingerprint dedup, with bounded state instead of a
    forever-growing key set."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


#: Floor for streaming state-store partition counts. Below ~8 partitions
#: the drain loses nothing (every micro-batch commits every state store,
#: so near-empty stores are pure commit overhead), and 8 keeps enough
#: parallelism for the final in-partition aggregation work locally.
STATE_PARTITIONS_FLOOR = 8

#: Target state rows per state store. Stateful-agg state rows are a few
#: dozen bytes each (key + running aggregate), so 64k rows/store keeps a
#: store's working set in the low MB — small enough to commit cheaply,
#: large enough that the per-store commit constant is amortized. This is
#: a sizing default, not a semantic: results are partition-count-
#: independent for aggregations.
STATE_ROWS_PER_PARTITION = 64_000


def stream_state_partitions(
    expected_state_rows: int,
    rows_per_partition: int = STATE_ROWS_PER_PARTITION,
    floor: int = STATE_PARTITIONS_FLOOR,
    cap: int = 2048,
) -> int:
    """State-store partition count derived from expected STATE SIZE (not
    core count): every micro-batch commits every state store, so the
    partition count should track how many state rows the query keeps —
    ``ceil(expected_state_rows / rows_per_partition)``, floored at
    :data:`STATE_PARTITIONS_FLOOR` (near-empty stores only add commit
    constant) and capped to keep task counts sane. Callers estimate
    ``expected_state_rows`` from pre-drain facts: parquet-footer row
    counts and timestamp spans (:func:`events_footer_stats`), sketch
    dimensions (``depth×width``, ``groups × 2^p``), or time-bucket counts
    — each an UPPER bound, since over-estimating costs a few extra
    commits while under-estimating concentrates state. At sf0.1 every
    estimate lands on the floor (the r11 A/B measured the floor ~2×
    faster than core-count partitioning on near-empty state); at real
    scale the same formula raises the knob with state volume."""
    import math

    if expected_state_rows <= 0:
        return floor
    return max(floor, min(cap, math.ceil(expected_state_rows / rows_per_partition)))


def events_footer_stats(sf_dir: str) -> "tuple[int, int]":
    """(n_rows, span_hours) of ``{sf_dir}/events.parquet`` from parquet
    FOOTER metadata only — zero Spark jobs, driver-side, O(files). Used to
    estimate streaming state cardinality before a drain starts: state rows
    for any grouped aggregation are bounded by input rows (each input row
    creates at most one state row), and time-windowed state is bounded by
    the timestamp span in hours × the group-key catalog. Returns
    ``span_hours = 0`` when ts statistics are unavailable (callers fall
    back to the row bound alone)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    paths = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    n_rows = 0
    ts_min = ts_max = None
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            continue
        n_rows += md.num_rows
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = idx.get("ts")
        if i is None:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                continue
            ts_min = st.min if ts_min is None else min(ts_min, st.min)
            ts_max = st.max if ts_max is None else max(ts_max, st.max)
    span_hours = 0
    if ts_min is not None and ts_max is not None:
        try:
            span_hours = int((ts_max - ts_min).total_seconds() // 3600) + 1
        except (TypeError, AttributeError):
            # ts stored as raw int64 (NANOS fixtures read with nanosAsLong)
            span_hours = int((int(ts_max) - int(ts_min)) // 3_600_000_000_000) + 1
    return n_rows, span_hours


#: Upper bound on the event-type catalog (a schema-level fact of the
#: engine's event model, not a data statistic): event_type is a small
#: enum, so time-windowed per-type state is bounded by hours × this.
EVENT_TYPE_CATALOG_BOUND = 32


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
    shuffle_partitions: Optional[int] = None,
) -> DataFrame:
    """Drain a finite stream with the availableNow trigger into a memory
    sink; returns the completed result as a batch DataFrame.

    ``complete`` for aggregations (a finite stream's final windows never
    cross the watermark, so append mode would silently drop them);
    ``update`` for stateful operators; ``append`` for row streams.

    ``shuffle_partitions`` pins the streaming state-partition count for this
    query (a stateful query's state store count is fixed at first start from
    ``spark.sql.shuffle.partitions``). State partitioning should track state
    *size*, not core count: every micro-batch commits every state store, so
    e.g. a stream-stream join (4 stores per partition) at 32 partitions pays
    128 near-empty store commits per batch when the state is small. At real
    scale the same knob goes *up* instead."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    import time

    q = None
    complete = False
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        complete = q.awaitTermination(timeout_s)
        if not complete:
            # Deadline hit. Two distinct cases: (a) the source is exhausted
            # and the query only spins on the pending processing-time state
            # timers (applyInPandasWithState) — the result IS complete; an
            # availableNow drain never self-terminates with timers armed,
            # it loops on 'No new data but cleaning up state' triggers;
            # (b) data is still flowing — stopping now would hand the
            # caller silently truncated aggregates. q.status tells them
            # apart; poll briefly to avoid racing a between-triggers gap.
            for _ in range(10):
                s = q.status
                if not s.get("isDataAvailable") and (
                    not s.get("isTriggerActive")
                    or "cleaning up state" in str(s.get("message", ""))
                ):
                    complete = True
                    break
                time.sleep(0.5)
    finally:
        if q is not None and q.isActive:
            q.stop()
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not complete:
        raise TimeoutError(f"{query_name} did not drain within {timeout_s}s")
    return spark.table(query_name)


def stream_into_snapshots(
    events: DataFrame, store, key: list[str], timeout_s: int = 120
) -> int:
    """CDC sink: each micro-batch upserts into a SnapshotStore as one COW
    commit (version N+1), giving time travel over the live feed. ``key``
    must equal the store's creation-time upsert key (validated — the store
    decides the merge key, this parameter documents the caller's intent).
    Returns the number of committed micro-batches."""
    from index_spark.commands import Insert

    store_key = list(store.latest().key)
    if list(key) != store_key:
        raise ValueError(
            f"stream_into_snapshots key {list(key)} != store key {store_key}; "
            "the store's creation-time key is the upsert key"
        )
    # writer-version strings are per-transaction ids the store rejects on
    # reuse; checkpoint-less availableNow runs restart batch_id at 0, so a
    # second feed into the same store must salt per run (stream_merge_into
    # does the same)
    run_id = uuid.uuid4().hex[:8]
    n_batches = {"n": 0}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the micro-batch DataFrame feeds the staged-commit path directly —
        # rows never collect to the driver, so batch size is bounded by the
        # cluster, not driver memory
        if batch_df.isEmpty():
            return
        handle = store.latest()
        handle.execute(
            [Insert(batch_df, upsert=True)], version=f"stream-batch-{run_id}-{batch_id}"
        )
        store.record_snapshot()
        n_batches["n"] += 1

    q = events.writeStream.foreachBatch(commit_batch).trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_s):
        # returning a partial count while commits keep landing in the
        # background would race every subsequent store.latest()/history()
        q.stop()
        raise TimeoutError(f"stream_into_snapshots did not drain within {timeout_s}s")
    return n_batches["n"]


_FUNNEL_STATE_SCHEMA = "t1 BIGINT, t2 BIGINT, t3 BIGINT"
_FUNNEL_OUT_SCHEMA = "user_id BIGINT, t1 BIGINT, t2 BIGINT, t3 BIGINT, stage INT"


def _make_funnel_fn(steps: tuple[str, str, str]):
    s1, s2, s3 = steps

    def _funnel_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user strict-order funnel state machine. Each micro-batch's
        rows are processed in (ts, event_id) order, so within a batch the
        machine advances exactly like the batch min-chain (first step-1
        event = min ts; first later step-2 event = min ts > t1; ...).
        Cross-batch, in-order delivery preserves equivalence; an event
        arriving after its stage's decision point is ignored (watermark
        semantics — the batch twin is the ground truth the driver query
        hash-checks against on a full drain)."""
        (user_id,) = key
        t1, t2, t3 = state.get if state.exists else (0, 0, 0)
        # a group larger than the Arrow batch size arrives as MULTIPLE
        # chunks in arbitrary row order — sorting per-chunk would advance
        # the order-sensitive machine out of event-time order, so gather
        # the whole micro-batch's rows for this user before the one sort
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            for _, row in batch.sort_values(["ts_us", "event_id"]).iterrows():
                ts, et = int(row["ts_us"]), row["event_type"]
                if t1 == 0:
                    if et == s1:
                        t1 = ts
                elif t2 == 0:
                    if et == s2 and ts > t1:
                        t2 = ts
                elif t3 == 0:
                    if et == s3 and ts > t2:
                        t3 = ts
        state.update((t1, t2, t3))
        stage = 3 if t3 else 2 if t2 else 1 if t1 else 0
        yield pd.DataFrame(
            [{"user_id": user_id, "t1": t1, "t2": t2, "t3": t3, "stage": stage}]
        )

    return _funnel_fn


def user_funnel_state(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Custom stateful streaming operator #2: strict-order funnel progress
    per user (``applyInPandasWithState``, update mode, NoTimeout so a
    finite availableNow drain terminates). State is three BIGINTs per
    live user — bounded, watermark-free; the update stream's per-user MAX
    stage equals the batch funnel's stage assignment on a full in-order
    drain (hash-checked by the driver query against the same SQL oracle
    as the batch ``funnel_steps``)."""
    return (
        events.select("user_id", "ts_us", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_fn(tuple(steps)),
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_merge_into(events: DataFrame, store, timeout_s: int = 120) -> int:
    """Streaming MERGE (the standard CDC-apply): each micro-batch reduces
    to one row per user (latest by (ts, event_id)) and merges into the
    SnapshotStore — existing users update, new users insert, all as ONE
    COW commit per batch via :meth:`VersionedIndex.merge_into`. The
    store's head is therefore always the exactly-once-applied latest
    state with time travel over every batch boundary.

    Micro-batches are NOT event-time ordered (file discovery order under
    ``maxFilesPerTrigger`` is arbitrary), so each batch row is screened
    against the stored row for its user and kept only when its
    ``(last_ts_us, last_event_id)`` exceeds the stored pair — a later
    batch carrying only older events for a user can never regress the
    head to stale state. ``last_event_id`` is persisted for exactly that
    tie-break. Returns the number of committed batches."""
    from pyspark.sql import Window

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_us").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "user_id",
                F.col("ts_us").alias("last_ts_us"),
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
        )
        head = store.latest()
        cur = head._current()
        if cur is not None:
            stored = cur.select(
                "user_id",
                F.col("last_ts_us").alias("__cur_ts"),
                F.col("last_event_id").alias("__cur_eid"),
            )
            latest = (
                latest.join(stored, on="user_id", how="left")
                .filter(
                    F.col("__cur_ts").isNull()
                    | (F.col("last_ts_us") > F.col("__cur_ts"))
                    | (
                        (F.col("last_ts_us") == F.col("__cur_ts"))
                        & (F.col("last_event_id") > F.col("__cur_eid"))
                    )
                )
                .drop("__cur_ts", "__cur_eid")
            )
            if latest.isEmpty():
                return
        head.merge_into(latest, version=f"stream-merge-{run_id}-{batch_id}")
        n_batches["n"] += 1

    # a fresh (checkpoint-less) run restarts batch ids at 0; writer-version
    # strings are per-transaction ids the store rejects on reuse, so salt
    # them per run
    run_id = uuid.uuid4().hex[:8]
    n_batches = {"n": 0}
    q = events.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_s):
        # a partial count with commits still landing would be silent
        # corruption for the caller reading store.latest() next
        q.stop()
        raise TimeoutError(f"stream_merge_into did not drain within {timeout_s}s")
    return n_batches["n"]


def ingest_with_dedup(
    stream_df: DataFrame,
    corpus: DataFrame,
    out_path: str,
    transform=None,
    timeout_s: int = 180,
) -> int:
    """Streaming ingestion with near-dup screening: every micro-batch is
    screened against the (static, banded) corpus LSH index via
    :func:`index_spark.operators.dedup.incremental_near_dups` and the
    per-doc verdicts append to ``out_path`` — the continuous-ingest shape
    where screening stays O(batch) because corpus-internal pairs are
    never generated. The corpus's ``(id, sh, sig)`` projection is computed
    ONCE here, persisted, shared by every micro-batch, and unpersisted
    after the drain — the corpus text crosses the Arrow UDF exactly once
    per ingest run, not once (or twice) per micro-batch. ``transform``
    (optional) maps the raw batch into the (doc_id, text) screening
    input. Returns the number of batches."""
    from index_spark.operators.dedup import incremental_near_dups, shingle_sig_projection

    n = {"n": 0}
    corpus_proj = shingle_sig_projection(corpus).persist()

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = transform(batch_df) if transform is not None else batch_df
        incremental_near_dups(
            corpus, b, corpus_projection=corpus_proj
        ).write.mode("append").parquet(out_path)
        n["n"] += 1

    try:
        q = stream_df.writeStream.foreachBatch(screen).trigger(availableNow=True).start()
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"ingest_with_dedup did not drain within {timeout_s}s")
    finally:
        # the drain is over and every verdict is on disk — unlike the lazy
        # operators (whose result plans still reference their cache), this
        # projection's lifetime ends here
        corpus_proj.unpersist()
    return n["n"]
