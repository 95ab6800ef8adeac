#!/usr/bin/env python
"""Spark-job-count probe for the store commit-ladder queries.

Per guide §1.2 ("don't compute things you throw away"), the unit of audit
for the store-machinery queries is the JOB: each commit/validation/read in
the ladder launches a bounded number of local jobs, so a non-semantic job
(manifest re-read, double-evaluated validation) shows up as a count that
exceeds the ladder's semantic steps. This probe runs each query isolated
under its own job group and reports (n_jobs, wall seconds) — the evidence
row 12's verdict asked for (`OPTIMIZATION_r12.md`).

Usage: python tools/probe_job_counts.py [query ...]   (default: the audit set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDIT_SET = [
    "bloom_point",
    "projection_lookup",
    "change_feed",
    "compact_files",
    "merge_into_orders",
    "sharded_range",
    "upsert_batch",
    "snapshot_diff",
    "incremental_maint",
    "erase_roundtrip",
]


def main() -> int:
    import __spark_entry__ as entrymod
    from index_spark.session import get_spark

    spark = get_spark(app_name="probe_job_counts")
    sc = spark.sparkContext
    queries = entrymod.queries()
    names = sys.argv[1:] or AUDIT_SET

    # warm the session so the first probe doesn't absorb JVM/codegen startup
    queries["range_scan"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name:24s} jobs={len(jobs):3d} wall={dt:6.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
