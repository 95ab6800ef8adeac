#!/usr/bin/env python
"""Generate an sf1-shaped scaling dataset from the sf0.1 fixtures.

The driver's testdata stops at sf0.1, where 101/235 queries are
fixed-overhead-bound and 8 cores beat 32 (PERF_r11 scaling block) — so
core-scaling claims need a bigger input. This tool builds a 10× dataset
in a caller-chosen OUTPUT dir (never under the read-only /root/testdata)
by deterministic replication with key offsets:

- star tables (orders, lineitem, customer, supplier, part, events):
  10 replicas, every key column offset by replica × (max_key+1), so FK
  joins keep exactly the same per-key fan-out as sf0.1;
- documents: REGENERATED (50k docs) from the fixture's own vocabulary
  with a seeded RNG — replicating text verbatim would plant 10-way
  near-dup clusters and quadratic LSH/pair blow-ups that say nothing
  about the engine; lengths are resampled from the fixture's observed
  word-count distribution;
- embeddings: replicas with deterministic per-replica jitter (±30%
  relative) so cross-replica cosine stays below near-dup thresholds;
- nation/region: copied (dimension tables).

This data has NO DuckDB-oracle contract — it exists solely for scaling
probes (8 vs 32 cores on the heaviest queries), not correctness.

Usage: python tools/gen_scale_data.py /tmp/sf1 [replicas=10]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 65_536  # scan tasks split on row groups; keep plenty per table

OFFSETS = {
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}


def replicate(table: pa.Table, offsets: dict[str, int], replicas: int) -> pa.Table:
    parts = []
    for k in range(replicas):
        t = table
        for col, step in offsets.items():
            i = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(k * step, t.schema.field(col).type))
            t = t.set_column(i, t.schema.field(col), shifted)
        parts.append(t)
    return pa.concat_tables(parts)


def gen_documents(replicas: int, seed: int = 412) -> pa.Table:
    src = pq.read_table(f"{SRC}/documents.parquet")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    vocab = sorted({w for t in texts for w in re.findall(r"\S+", t)})
    lens = np.array([len(re.findall(r"\S+", t)) for t in texts])
    rng = np.random.default_rng(seed)
    n = len(texts) * replicas
    out_lens = rng.choice(lens, size=n, replace=True)
    # empirical unigram distribution keeps token stats fixture-like
    counts = {}
    for t in texts:
        for w in re.findall(r"\S+", t):
            counts[w] = counts.get(w, 0) + 1
    probs = np.array([counts[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()
    docs = []
    for ln in out_lens:
        words = rng.choice(vocab, size=int(ln), p=probs)
        docs.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array([langs[i % len(langs)] for i in range(n)], pa.string()),
            "source": pa.array([sources[i % len(sources)] for i in range(n)], pa.string()),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )


def gen_embeddings(replicas: int, seed: int = 413) -> pa.Table:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    labels = src.column("label").to_pylist()
    rng = np.random.default_rng(seed)
    parts = []
    base_n = len(labels)
    for k in range(replicas):
        jitter = 1.0 + 0.3 * rng.standard_normal(vecs.shape).astype(np.float32) if k else 1.0
        v = vecs * jitter
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(range(k * base_n, (k + 1) * base_n), pa.int64()),
                    "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    return pa.concat_tables(parts)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    assert not out_dir.startswith("/root/testdata"), "testdata is read-only"
    os.makedirs(out_dir, exist_ok=True)
    for name, offs in OFFSETS.items():
        t = replicate(pq.read_table(f"{SRC}/{name}.parquet"), offs, replicas)
        pq.write_table(t, f"{out_dir}/{name}.parquet", row_group_size=ROW_GROUP,
                       compression="zstd")
        print(name, t.num_rows)
    for name in ("nation", "region"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet", compression="zstd")
        print(name, t.num_rows)
    d = gen_documents(replicas)
    pq.write_table(d, f"{out_dir}/documents.parquet", row_group_size=8192,
                   compression="zstd")
    print("documents", d.num_rows)
    e = gen_embeddings(replicas)
    pq.write_table(e, f"{out_dir}/embeddings.parquet", row_group_size=4096,
                   compression="zstd")
    print("embeddings", e.num_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
