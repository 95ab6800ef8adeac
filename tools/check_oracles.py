#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR), then
compares row count, column-name set, and order-insensitive values.

Value comparison is strict-by-string after canonicalization (floats via
``repr(round(x, 9))``, timestamps/dates via isoformat) — stricter than a
tolerance compare, because the driver hashes values; if strings differ the
driver hash likely differs.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from index_spark.session import get_spark
from index_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon_cell(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if v is None or v != v:  # None / NaN
        return "NULL"
    if isinstance(v, float):
        # + 0.0 collapses -0.0 to 0.0: engine noise below the rounding
        # tolerance must not flip the sign of a rounded zero
        return repr(round(v, 9) + 0.0)
    if hasattr(v, "isoformat"):
        # a DATE column arrives as datetime.date from Spark but as a
        # midnight Timestamp from DuckDB's fetchdf — compare as the date
        if getattr(v, "hour", 0) == 0 and getattr(v, "minute", 0) == 0 and \
                getattr(v, "second", 0) == 0 and getattr(v, "microsecond", 0) == 0 \
                and hasattr(v, "date") and callable(getattr(v, "date")):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canon_df(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    only = set(sys.argv[1:])
    known = set(entrymod.queries())
    unknown = only - known
    if unknown:
        # a typo'd / renamed query must not read as a green gate with zero
        # checks run
        print(f"ERROR: unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle, rows-only check) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            a, b = canon_df(sdf), canon_df(odf)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
