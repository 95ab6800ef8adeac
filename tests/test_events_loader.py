"""The events canonicalizer must serve BOTH fixture generations: parquet
timestamp[us] (current driver fixtures, read as timestamp_ntz) and
TIMESTAMP(NANOS) (legacy fixtures, readable only via nanosAsLong). Round 1
shipped a loader that assumed NANOS and broke 15 queries — these tests pin
the dtype-branching behavior of ``canonical_events``."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest

from index_spark.sources import load_table
from index_spark.sources.tables import canonical_events

CANON_COLS = {"ts", "ts_us", "ts_ns"}


def test_current_fixture_micros(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert CANON_COLS <= set(ev.columns)
    types = dict(ev.dtypes)
    assert types["ts"] == "timestamp" and types["ts_us"] == "bigint" and types["ts_ns"] == "bigint"
    r = ev.selectExpr(
        "max(CAST(ts_ns != ts_us * 1000 AS INT)) AS bad_ns",
        "max(CAST(unix_micros(ts) != ts_us AS INT)) AS bad_ts",
    ).collect()[0]
    assert r.bad_ns == 0 and r.bad_ts == 0


def test_legacy_nanos_fixture(spark, tmp_base):
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00.123456789", "2024-01-01 01:02:03.999999999"]
    )
    t = pa.table(
        {
            "event_id": [1, 2],
            "ts": pa.array(ts, type=pa.timestamp("ns")),
            "user_id": [10, 11],
            "event_type": ["a", "b"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    d = os.path.join(tmp_base, "nanos_events")
    os.makedirs(d)
    # store_schema=False drops the arrow schema so Spark sees raw
    # TIMESTAMP(NANOS) — exactly the round-1 fixture shape
    pq.write_table(t, os.path.join(d, "events.parquet"), store_schema=False)
    ev = load_table(spark, d, "events")
    rows = {r.event_id: r for r in ev.collect()}
    # lossless ns epoch, exact integral µs truncation (not float division)
    assert rows[1].ts_ns == 1704067200123456789
    assert rows[1].ts_us == 1704067200123456
    assert rows[2].ts_ns == 1704070923999999999
    assert rows[2].ts_us == 1704070923999999
    assert rows[1].ts.microsecond == 123456
