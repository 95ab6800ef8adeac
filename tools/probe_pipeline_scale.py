"""End-to-end pipeline scale probe (round 9, ordered by the r8 verdict):
the composed dedup → quality → decontam → mix chain on a ≥10M-doc
synthetic corpus — per-operator probes exist for every stage; this one
measures the COMPOSITION, staged through parquet like a real pipeline
(each stage reads the previous stage's output, so the reported wall is
per-stage compute + IO, not a re-derivation of the whole upstream DAG
per action).

Corpus (deterministic, closed-form): N base docs of 48 md5-derived
7-char words, all words id-specific so unrelated docs share NO shingle.
Planted, by id arithmetic:
  id % 7 == 3              spam: one word repeated 48× (unique per id —
                           survives both dedups, FAILS the Gopher
                           repetition gate: top_frac = 1.0)
  id % 10 == 0             exact clone at id+N (same text → exact dedup
                           drops the clone, min-id survivor)
  id % 20 == 5             near clone at id+2N (text + ' neartail' →
                           Jaccard 46/47 ≥ 0.8 → MinHash dedup drops
                           it; the SPAM near clone is Jaccard 1/2 and
                           deliberately survives to be caught by the
                           quality gate instead)
  id % 9973 == 1           benchmark member: the decontam stage must
                           flag exactly the surviving (non-spam) ones
                           via 8-gram collision
  id % 100 → 70/20/10      source split web/code/books for the
                           largest-remainder mixture take

Every stage's expected row count is exact integer arithmetic (numpy
mask counts) and the probe asserts it — a wrong count anywhere fails
loudly. The one probabilistic edge: a planted near-dup pair misses all
8 LSH bands with p ≈ 1e-11 (Jaccard 46/47, 16 hashes / 8 bands), so
exact equality is asserted; ~5e-6 expected misses corpus-wide at 10M.

Run: python tools/probe_pipeline_scale.py  [--docs 10000000]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from index_spark.operators.dedup import exact_dedup, minhash_dedup
from index_spark.operators.decontam import ngram_contamination
from index_spark.operators.quality import repetition_annotate
from index_spark.operators.quota import cap_per_group
from index_spark.operators.sampling import md5_frac, mix_allocate
from index_spark.session import get_spark

WEIGHTS = {"web": 70, "code": 20, "books": 10}


def expected_counts(n: int, target: int):
    ids = np.arange(n, dtype=np.int64)
    spam = ids % 7 == 3
    exact_src = ids % 10 == 0
    near_src = ids % 20 == 5
    bench = ids % 9973 == 1
    src = ids % 100
    corpus = n + int(exact_src.sum()) + int(near_src.sum())
    after_exact = corpus - int(exact_src.sum())
    after_near = after_exact - int((near_src & ~spam).sum())
    # quality drops base spam AND the surviving spam near clones
    after_quality = int((~spam).sum())
    flagged = int((bench & ~spam).sum())
    clean = after_quality - flagged
    keep = ~spam & ~bench
    avail = {
        "web": int((keep & (src < 70)).sum()),
        "code": int((keep & (src >= 70) & (src < 90)).sum()),
        "books": int((keep & (src >= 90)).sum()),
    }
    # largest-remainder (Hamilton) replay, ties to lexicographic source
    wsum = sum(WEIGHTS.values())
    base = {s: (target * w) // wsum for s, w in WEIGHTS.items()}
    rem = {s: (target * w) % wsum for s, w in WEIGHTS.items()}
    left = target - sum(base.values())
    for s in sorted(WEIGHTS, key=lambda s: (-rem[s], s))[:left]:
        base[s] += 1
    return corpus, after_exact, after_near, after_quality, flagged, clean, avail, base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--target", type=int, default=1_000_000)
    args = ap.parse_args()

    # local mode = ONE JVM: driver memory is executor memory. The engine
    # default (8g, sized for the sf0.1 bench) cannot hold the 11.5M-doc
    # band shuffle across 32 concurrent tasks (observed: GCLocker storms,
    # then a crashed Python UDF worker). A real cluster would spread this
    # over executors; locally, give the one JVM real memory and start the
    # band/shingle shuffles finer-grained (AQE coalesces what's small).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="probe_pipeline_scale", shuffle_partitions=256)
    # quiet the CLI run only — run_probe must NOT touch log levels, it
    # is also called on the suite-shared session (r10 advice: a
    # setLogLevel inside run_probe leaked ERROR onto every later test)
    spark.sparkContext.setLogLevel("ERROR")
    timings = run_probe(spark, args.docs, args.target)
    total = sum(dt for _, dt, _ in timings)
    for label, dt, rows in timings:
        print(f"{label:>14}: {dt:7.1f} s  rows={rows}")
    print(f"{'TOTAL':>14}: {total:7.1f} s  ({args.docs} base docs)")


def run_probe(spark, n: int, target: int):
    """Run the composed pipeline at ``n`` base docs, asserting the
    closed-form row count at every stage boundary; returns the
    ``(label, seconds, rows)`` stage timings. Raises AssertionError on
    any boundary mismatch — callable from the test suite as the 200k-doc
    composition smoke (the per-operator fixtures structurally cannot see
    cross-stage interactions; this probe caught the correlated-MinHash
    and 28-bit-identity-key bugs in r9)."""
    (exp_corpus, exp_exact, exp_near, exp_quality, exp_flagged, exp_clean,
     exp_avail, exp_alloc) = expected_counts(n, target)

    work = tempfile.mkdtemp(prefix="probe_pipe_")
    timings = []

    def stage(label, df, path):
        t0 = time.time()
        df.write.mode("overwrite").parquet(f"{work}/{path}")
        out = spark.read.parquet(f"{work}/{path}")
        got = out.count()
        timings.append((label, time.time() - t0, got))
        return out, got

    try:
        did = F.col("id")
        word = lambda tag, i: F.substring(
            F.md5(F.concat(F.lit(tag), did.cast("string"), F.lit("_"), i)), 1, 7
        )
        normal = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(47)), lambda i: word("w", i.cast("string"))
            ),
        )
        # 12 hex chars (48 bits), NOT 7: the spam doc's identity is ONE
        # word, so a word-prefix birthday collision makes two spam docs
        # byte-identical and breaks the closed-form dedup count (~3800
        # colliding pairs at 10M docs with 28-bit words — observed at
        # 200k). 48-bit words: ~0.004 expected pairs at 10M.
        spam = F.concat_ws(
            " ",
            F.array_repeat(
                F.substring(
                    F.md5(F.concat(F.lit("s"), did.cast("string"), F.lit("_0"))), 1, 12
                ),
                48,
            ),
        )
        base = spark.range(0, n, 1, 64).select(
            did.alias("doc_id"),
            F.when(did % 7 == 3, spam).otherwise(normal).alias("text"),
        )
        t = F.col("text")
        corpus = (
            base.unionByName(
                base.filter(F.col("doc_id") % 10 == 0).select(
                    (F.col("doc_id") + n).alias("doc_id"), t
                )
            ).unionByName(
                base.filter(F.col("doc_id") % 20 == 5).select(
                    (F.col("doc_id") + 2 * n).alias("doc_id"),
                    F.concat(t, F.lit(" neartail")).alias("text"),
                )
            )
        )
        cur, got = stage("generate", corpus, "corpus")
        assert got == exp_corpus, (got, exp_corpus)

        cur, got = stage("exact_dedup", exact_dedup(cur), "exact")
        assert got == exp_exact, (got, exp_exact)

        cur, got = stage("minhash_dedup", minhash_dedup(cur, threshold=0.8), "near")
        assert got == exp_near, (got, exp_near)

        # r10: the inline gate — the semi-join formulation paid two
        # corpus-sized exchanges for a per-document predicate (the whole
        # post-r9 cost of this stage); repetition_annotate rides the
        # corpus row with zero shuffle and zero join
        gated = repetition_annotate(cur).filter(F.col("rep_passes")).select(
            "doc_id", "text"
        )
        cur, got = stage("quality", gated, "quality")
        assert got == exp_quality, (got, exp_quality)

        bench = base.filter(F.col("doc_id") % 9973 == 1)
        hits = ngram_contamination(cur, bench, k=8).select("doc_id")
        cur, got = stage("decontam", cur.join(hits, "doc_id", "left_anti"), "clean")
        assert got == exp_clean, (got, exp_clean)

        src = F.col("doc_id") % 100
        sourced = cur.select(
            "doc_id",
            F.when(src < 70, "web").when(src < 90, "code").otherwise("books").alias("source"),
        )
        t0 = time.time()
        alloc = {
            r["source"]: (r["n_avail"], r["n_alloc"], r["n_take"])
            for r in mix_allocate(sourced, "source", WEIGHTS, target).collect()
        }
        for s in WEIGHTS:
            assert alloc[s][0] == exp_avail[s], (s, alloc[s], exp_avail[s])
            assert alloc[s][1] == alloc[s][2] == exp_alloc[s], (s, alloc[s], exp_alloc[s])
        adf = spark.createDataFrame(
            [(s, alloc[s][2]) for s in WEIGHTS], "source string, n_take long"
        )
        capped = cap_per_group(
            sourced,
            ["source"],
            max(exp_alloc.values()),
            [md5_frac(F.col("doc_id")), F.col("doc_id")],
            "doc_id",
            keep_rank=True,
        )
        take = capped.join(F.broadcast(adf), "source").filter(
            F.col("rank") <= F.col("n_take")
        )
        got = {r["source"]: r["n"] for r in
               take.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        timings.append(("mix_take", time.time() - t0, sum(got.values())))
        assert got == exp_alloc, (got, exp_alloc)
        return timings
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
