#!/usr/bin/env python
"""sf1 core-scaling spot-bench (VERDICT r11, item 7).

At sf0.1 the catalog is fixed-overhead-bound: 101/235 queries scale ≈1.0
between 8 and 32 cores and none reaches 2× (PERF_r11), so sf0.1 cannot
produce core-scaling evidence. This probe runs the heaviest DATA-BOUND
queries against the 10× dataset from ``tools/gen_scale_data.py`` at the
caller's core count and prints one JSON line per query. Run twice
(SPARK_GRAFT_CPUS=32, then 8) and compare.

Excluded by design: the exact unigram-set joins (set_join_exact,
containment_pairs) — their OUTPUT is quadratic in corpus size on the
word-salad fixture family (72% of all pairs qualify at t=0.5), so a 10×
corpus means a 100× answer and the probe would measure the fixture, not
the engine — and the fixed-input store ladders (o_orderkey ≤ 2000
filters), which are sf-invariant by construction.

Usage:
  python tools/gen_scale_data.py /tmp/sf1 10
  SPARK_GRAFT_CPUS=32 python tools/probe_scaling_sf1.py /tmp/sf1
  SPARK_GRAFT_CPUS=8  python tools/probe_scaling_sf1.py /tmp/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_SET = [
    "pagerank_parts",
    "triangle_parts",
    "exact_quantiles",
    "corr_lineitem",
    "profile_orders",
    "bigram_nll",
    "dsir_weights",
    "pq_topk",
    "span_trim",
    "full_pipeline",
    "hll_distinct",
    "stream_hourly",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import __spark_entry__ as entrymod
    from index_spark.session import get_spark

    spark = get_spark(app_name="probe_scaling_sf1")
    queries = entrymod.queries()
    # warm codegen + the Python worker pool
    for w in ("range_scan", "minhash_lsh_pairs"):
        queries[w](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out = {}
    for name in PROBE_SET:
        spark.sparkContext.setJobDescription(f"sf1probe:{name}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        print(json.dumps({"query": name, "sec": out[name],
                          "cpus": os.environ.get("SPARK_GRAFT_CPUS")}))
    print(json.dumps({"total": round(sum(out.values()), 2), "per_query": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
