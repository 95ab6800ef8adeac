#!/usr/bin/env python
"""Benchmark harness: times every driver-facing query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion through a ``noop``-format write: every
output column is computed and serialized executor-side with zero driver-side
row transfer. (``count()`` is NOT enough: Catalyst prunes projection-only
plans down to a bare row-count scan, so expression-heavy queries like the
document fingerprints would be timed as parquet counts.)

A warmup pass on sf0.001 primes the JVM/codegen so per-query numbers reflect
steady-state execution, not first-query JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> None:
    """Materialize every output column executor-side (no driver transfer)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    import __spark_entry__ as entrymod
    from index_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # Warmup at sf0.001: scan, join+agg, text expression, and one Pandas-UDF
    # query (spins up the Python worker pool + Arrow once, so per-query
    # numbers reflect steady state, not first-UDF startup)
    for wname in ("range_scan", "q5_nation_revenue", "doc_fingerprint", "minhash_lsh_pairs"):
        if wname in queries and os.path.isdir(WARMUP_DIR):
            try:
                _force(queries[wname](spark, WARMUP_DIR))
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            _force(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"# bench error in {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    out = {
        "metric": "catalog_total_wall",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "n_queries": len(timings),
        "n_errors": len(timings) - len(ok),
    }
    print(json.dumps(out))
    # a crashing query must not read as a speedup (it vanishes from the
    # wall total otherwise) — surface it through the exit status
    return 1 if out["n_errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
