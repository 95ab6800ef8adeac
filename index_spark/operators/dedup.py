"""Deduplication operators for training-data pipelines.

Four families, each a first-class scale citizen:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on the
  16-byte hash, never on the document text.
- **MinHash + LSH**: shingle → per-seed min-hash → band → bucket join.
  Candidate generation never compares all pairs: documents meet only inside
  an LSH bucket (Broder 1997 / Leskovec-Rajaraman-Ullman ch.3 construction).
- **SimHash**: 64-bit signature + banded prefix blocking for Hamming-radius
  candidate pairs (Charikar 2002; Manku et al. 2007 blocking).
- **n-gram Jaccard**: verification metric on candidate pairs (set ops over
  distinct shingles).

Scale notes (100 TB): every self-join here is bucket-blocked — the shuffle
key is a short hash, the text column is dropped before any wide exchange,
and verification joins re-attach shingle sets by doc id. Banding parameters
(b bands × r rows) tune the similarity threshold s ≈ (1/b)^(1/r).

MinHash hashes each shingle ONCE (md5 → 32-bit int) and derives the k
signature slots with a universal linear hash family (a_i·h + b_i mod p) —
and, deliberately, every step exists verbatim in DuckDB SQL ('0x…'::BIGINT
hex parse, integer mod), so the correctness oracle replays the whole
pipeline exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.functions.text import fingerprint, normalize_text, simhash64, word_shingles
from index_spark.functions.vectors import cosine


# --------------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (fp, keep_id, n_dupes) for groups of size > 1 — ``keep_id`` is
    the smallest id (deterministic survivor policy)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
        .filter(F.col("n_dupes") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivors after exact dedup (min-id per fingerprint group).

    One shuffle on the md5 fingerprint; the full row is recovered via a
    semi-join on id, so wide text columns never enter the aggregation."""
    keep = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ------------------------------------------------------------------- minhash
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def _mix64(x: int) -> int:
    """splitmix64 finalizer (Steele et al., public domain reference
    constants) — a full-avalanche 64-bit mixer, evaluated in PYTHON at
    plan-build time only; the mixed values are embedded as literals into
    both the Spark expression and the DuckDB oracle SQL."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def minhash_ab(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficients for the universal hash family
    h_i(x) = (a_i·x + b_i) mod p. Shared by the Spark expression and the
    DuckDB oracle SQL so both engines evaluate the identical function.

    Each pair is drawn through the splitmix64 finalizer so the hash
    functions behave as INDEPENDENT draws. The r1–r8 family used
    arithmetic progressions (a_i = (2i+1)·K mod p) whose pairwise linear
    structure correlated the permutations: the round-9 pipeline probe
    caught a Jaccard-46/47 planted near-dup pair whose one extra shingle
    won the min under ALL EIGHT even-indexed hashes simultaneously —
    i.e. every band missed — at an observed ~1.2e-4 miss rate per pair
    where independent hashes give ~1e-11. At 100 TB that is ~10^5
    spuriously missed near-identical documents; with mixed coefficients
    the banding guarantee holds (probe re-run: 0 misses)."""
    out = []
    for i in range(num_hashes):
        a = _mix64(2 * i) % (MINHASH_PRIME - 1) + 1  # a ∈ [1, p)
        b = _mix64(2 * i + 1) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signature(col: Column, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hash values (int64) over word shingles.

    One md5 per shingle (its first 7 hex chars parsed as a 28-bit int), then
    ``num_hashes`` universal-hash permutations ``(a_i·h + b_i) mod p`` —
    the standard one-strong-hash + linear-permutation MinHash family
    (Broder 1997 §4; Leskovec-Rajaraman-Ullman ch.3.3.5). 16× fewer md5
    evaluations than seed-prefixed hashing at identical collision behavior.

    Shape notes, learned the hard way:
    - ONE ``aggregate`` fold over the shingle array, so the (expensive)
      shingle pipeline is referenced exactly once. The naive ``F.array`` of
      per-seed ``array_min(transform(...))`` re-evaluates it per seed —
      higher-order-function bodies get no common-subexpression elimination
      (measured 60×+ slowdown once banding re-inlined the signature too).
    - The md5-derived ``h`` is bound via a single-element ``transform``
      (poor man's `let`) so it too is computed once per shingle, not once
      per permutation.
    - p > 2^32 > any residue makes ``array_repeat(p)`` the fold identity;
      a_i < p < 2^32.01 and h < 2^28 keep a_i·h + b_i < 2^61 (no int64
      overflow — with 8 hex chars the product can exceed 2^63 and Spark's
      ANSI mode throws ARITHMETIC_OVERFLOW).
    """
    sh = word_shingles(col, shingle_k)
    ab = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in minhash_ab(num_hashes)
        ]
    )
    prime = F.lit(MINHASH_PRIME).cast("long")

    def perms_of(s: Column) -> Column:
        from index_spark.functions.text import md5_prefix28

        h = md5_prefix28(s)
        return F.element_at(
            F.transform(
                F.array(h),
                lambda hv: F.transform(ab, lambda x: (x["a"] * hv + x["b"]) % prime),
            ),
            1,
        )

    return F.aggregate(
        sh,
        F.array_repeat(prime, num_hashes),
        lambda acc, s: F.zip_with(acc, perms_of(s), lambda x, y: F.least(x, y)),
    )


def _lsh_rows(num_hashes: int, bands: int) -> int:
    """Rows-per-band, validated: bands must divide num_hashes exactly.
    Silent truncation would change the effective similarity threshold,
    and bands > num_hashes would give rows=0 — every band hash becomes
    md5('') and the in-bucket self-join degenerates to all-pairs."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must be a positive divisor of num_hashes={num_hashes}"
        )
    return num_hashes // bands


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """Band the signature: band_j = md5('|'-join of its r member values).
    Returns array<struct<band:int, h:string>> for exploding into buckets.
    Same single-``transform`` construction as :func:`minhash_signature` so
    ``sig`` is referenced once, not once per band."""
    idx = F.array(*[F.lit(j) for j in range(bands)])
    sig_str = F.transform(sig, lambda v: v.cast("string"))
    return F.transform(
        idx,
        lambda j: F.struct(
            j.alias("band"),
            F.md5(F.array_join(F.slice(sig_str, j * rows + 1, rows), "|")).alias("h"),
        ),
    )


def shingle_minhash_udf(num_hashes: int = 16, shingle_k: int = 3):
    """Arrow-vectorized Pandas UDF: text → struct(sh: array<string>,
    sig: array<long>) — shingles AND minhash signature in ONE pass.

    This is the hot path. The pure-expression pipeline
    (:func:`minhash_signature` over :func:`word_shingles`) evaluates
    interpreted higher-order functions per shingle (~1.5 ms/doc measured);
    this UDF does the same math in numpy (the k permutations are one
    broadcasted (k×n) multiply-mod) at ~0.05 ms/doc, and one call serves
    both candidate generation (sig) and Jaccard verification (sh).

    Semantics are bit-identical to the expression path and the DuckDB
    oracle: ASCII-flag regexes mirror Java/RE2 ``\\s`` (corpus is ASCII;
    non-ASCII whitespace would diverge between the three engines), md5-hex
    prefix parse and integer mod are exact in all three."""
    ab = minhash_ab(num_hashes)
    A = np.array([a for a, _ in ab], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in ab], dtype=np.uint64)[:, None]
    P = np.uint64(MINHASH_PRIME)

    def one(s):
        if s is None:
            return None, None
        norm = re.sub(r"\s+", " ", s.lower(), flags=re.ASCII).strip()
        w = re.findall(r"\S+", norm, flags=re.ASCII)
        m = max(len(w) - (shingle_k - 1), 1)
        sh = list(dict.fromkeys(" ".join(w[i : i + shingle_k]) for i in range(m)))
        h = np.array(
            [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in sh], dtype=np.uint64
        )[None, :]
        sig = ((A * h + B) % P).min(axis=1).astype(np.int64)
        return sh, sig

    @F.pandas_udf(f"struct<sh: array<string>, sig: array<long>>")
    def f(text: pd.Series) -> pd.DataFrame:
        out = [one(s) for s in text]
        return pd.DataFrame({"sh": [o[0] for o in out], "sig": [o[1] for o in out]})

    return f


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: "int | None" = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) that share ≥1 LSH band.

    Plan shape: project → explode bands → shuffle on (band, h) → in-bucket
    self-join → distinct pairs. The only exchanged payload is
    (id, band, 32-char hash).

    ``max_bucket`` is the hot-bucket guard for adversarial corpora: one
    common band value (e.g. thousands of identical boilerplate docs)
    makes the in-bucket self-join quadratic. Buckets larger than the cap
    emit a sorted CHAIN of consecutive pairs instead of all pairs — O(n)
    edges that keep the bucket CONNECTED (connected-components clustering
    recovers the full duplicate group), trading some direct-pair recall
    for a hard bound on join fan-out. Default None preserves exact
    all-pairs semantics (the hash-gated oracle shape)."""
    rows = _lsh_rows(num_hashes, bands)
    # Two steps on purpose: the signature must be a materialized attribute
    # BEFORE the explode. Inlining it into the generator expression makes
    # Spark re-evaluate the whole shingle+md5 pipeline per emitted band —
    # O(bands × seeds) re-evaluation per row (measured 60×+ slowdown).
    with_sig = TX.spread_for_cpu(df).select(
        F.col(id_col).alias("id"),
        shingle_minhash_udf(num_hashes, shingle_k)(F.col(text_col))["sig"].alias("sig"),
    )
    sigs = with_sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))

    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "h")
        sized = sigs.withColumn("__n", F.count(F.lit(1)).over(w))
        small = sized.filter(F.col("__n") <= max_bucket).drop("__n")
        big = sized.filter(F.col("__n") > max_bucket).drop("__n")
        chain_w = Window.partitionBy("band", "h").orderBy("id")
        chained = (
            big.withColumn("__prev", F.lag("id").over(chain_w))
            .filter(F.col("__prev").isNotNull())
            .select(F.col("__prev").alias("id_a"), F.col("id").alias("id_b"))
        )
        a = small.alias("a")
        b = small.alias("b")
        dense = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.h") == F.col("b.h"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        return dense.unionByName(chained).distinct()

    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    The classic candidate-then-verify LSH shape: the corpus is first
    semi-join-pruned to ids that appear in some candidate pair, and only
    the pruned side is shingled — verify cost follows the candidate count,
    not the corpus size. Shingles come from the vectorized UDF (same
    values as :func:`word_shingles`, ~30× faster); the set ops stay
    JVM-side."""
    wanted = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        TX.spread_for_cpu(
            df.select(F.col(id_col).alias("id"), F.col(text_col))
            .join(wanted, "id", "left_semi")
        )
        .select(
            "id",
            shingle_minhash_udf(1, shingle_k)(F.col(text_col))["sh"].alias("sh"),
        )
    )
    out = (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        (inter.cast("double") / F.greatest(union, F.lit(1))).alias("jaccard"),
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end LSH near-dup pairs with ONE UDF pass over the corpus.

    The (shingles, signature) projection is computed once and persisted;
    both self-join sides of candidate generation and both sides of Jaccard
    verification read it from cache — vs. four UDF evaluations when the
    stages are composed independently. The cache entry lives with the
    returned plan (Spark LRU-evicts under pressure); at 100 TB you'd
    materialize the projection to storage instead (same shape)."""
    rows = _lsh_rows(num_hashes, bands)
    enriched = (
        df.select(
            F.col(id_col).alias("id"),
            shingle_minhash_udf(num_hashes, shingle_k)(F.col(text_col)).alias("ss"),
        )
        .select("id", F.col("ss.sh").alias("sh"), F.col("ss.sig").alias("sig"))
        .persist()
    )
    banded = enriched.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = enriched.select("id", "sh")
    joined = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / F.greatest(union, F.lit(1))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates → Jaccard ≥ threshold →
    drop the larger id of each confirmed pair (greedy min-id survivor).
    Built on :func:`minhash_near_dup_pairs`, so the (shingles, signature)
    projection is computed in ONE UDF pass and reused by both candidate
    generation and verification — not re-derived per stage."""
    confirmed = minhash_near_dup_pairs(
        df, text_col, id_col, threshold, num_hashes, bands, shingle_k
    )
    losers = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ------------------------------------------------------------------- simhash
def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_bits: int = 16,
    materialize_path: str | None = None,
) -> DataFrame:
    """Candidate pairs sharing a 16-bit SimHash block (Manku-style blocking:
    near signatures agree on at least one of the 4 blocks). Returns pairs
    with their Hamming distance for thresholding by the caller.

    The (id, simhash) projection is computed ONCE and reused by both sides
    of the in-block self-join (same discipline as
    :func:`minhash_near_dup_pairs`). Two reuse modes:

    - default (``materialize_path=None``): the projection is persisted;
      the cache entry deliberately lives with the returned lazy plan —
      unpersisting here would force a recompute per join side; Spark
      LRU-evicts it under storage pressure, and a caller done with the
      result can drop it via ``spark.catalog.clearCache()``.
    - ``materialize_path=...``: the 100 TB recipe — the projection is
      written to parquet at that path and both join sides read it back,
      so NO session-lifetime cache entry is created and the projection
      survives for downstream reuse (a 100 TB corpus's simhash column
      does not fit executor storage anyway).
    """
    proj = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    if materialize_path is not None:
        proj.write.mode("overwrite").parquet(materialize_path)
        sh = df.sparkSession.read.parquet(materialize_path)
    else:
        sh = proj.persist()
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("blk"),
                F.shiftrightunsigned(F.col("sh"), j * block_bits).bitwiseAND(F.lit((1 << block_bits) - 1)).alias("v"),
            )
            for j in range(64 // block_bits)
        ]
    )
    e = sh.select("id", "sh", F.explode(blocks).alias("b")).select(
        "id", "sh", F.col("b.blk").alias("blk"), F.col("b.v").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
    )


# ----------------------------------------------------------------- embedding
def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    With ``block_col`` (e.g. a coarse cluster / LSH sign-bucket), the
    self-join is bucket-local — the scale path. Without it this is the
    exact O(n²) baseline for small n (verification / recall measurement)."""
    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                    *([F.col(block_col).alias("blk")] if block_col else []))
    a, b = sel.alias("a"), sel.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def shingle_sig_projection(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """ONE Arrow-UDF pass → ``(id, sh, sig)``: the shared substrate every
    LSH consumer slices from (banding reads ``sig``, Jaccard verification
    reads ``sh``). Callers that reuse it across jobs persist it
    (:func:`minhash_near_dup_pairs`) or materialize it to storage — the
    100 TB recipe (:func:`build_lsh_index` is the banded form)."""
    return df.select(
        F.col(id_col).alias("id"),
        shingle_minhash_udf(num_hashes, shingle_k)(F.col(text_col)).alias("ss"),
    ).select("id", F.col("ss.sh").alias("sh"), F.col("ss.sig").alias("sig"))


def _banded_from_proj(proj: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, band, h) banding over a (id, sh, sig) projection."""
    return proj.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


def incremental_near_dups(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
    corpus_projection: "DataFrame | None" = None,
) -> DataFrame:
    """Incremental-ingestion near-dup check: screen a NEW batch against an
    existing corpus without ever generating corpus-internal pairs — the
    shape that keeps continuous ingestion O(batch), not O(corpus²).

    ONE UDF pass per side (the :func:`minhash_near_dup_pairs` discipline):
    a persisted ``(id, sh, sig)`` projection feeds banding AND shingle
    verification — the earlier composition shingled the corpus twice per
    call (16-hash pass for banding + 1-hash pass for candidate shingles).
    ``corpus_projection`` accepts a pre-computed (persisted or
    storage-materialized) :func:`shingle_sig_projection` of the corpus —
    the continuous-ingest recipe: compute it once, reuse it across every
    micro-batch (:func:`index_spark.streaming.events.ingest_with_dedup`
    does exactly this), so the corpus is never re-shingled per batch. The
    per-call persists live with the returned plan (Spark LRU-evicts under
    pressure; ``spark.catalog.clearCache()`` is the escape hatch), matching
    the module's other fused operators.

    Candidates probe the banded corpus with an equi-join on (band, hash);
    verification joins shingle sets only for candidate ids — the corpus
    shingle side is semi-join-pruned to candidates, so verify cost follows
    the candidate count, not the corpus size.

    Returns one row per batch document:
    ``(id_col, n_candidates, best_jaccard, is_dup)`` — ``is_dup`` true
    iff some corpus candidate's exact shingle Jaccard ≥ ``threshold``;
    documents with no band collision report (0, null, false).
    """
    rows = _lsh_rows(num_hashes, bands)
    cp = (
        corpus_projection
        if corpus_projection is not None
        else shingle_sig_projection(corpus, text_col, id_col, num_hashes, shingle_k).persist()
    )
    bp = shingle_sig_projection(batch, text_col, id_col, num_hashes, shingle_k).persist()
    cb = _banded_from_proj(cp, bands, rows).alias("c")
    bb = _banded_from_proj(bp, bands, rows).alias("n")
    cand = (
        bb.join(cb, (F.col("n.band") == F.col("c.band")) & (F.col("n.h") == F.col("c.h")))
        .select(F.col("n.id").alias("bid"), F.col("c.id").alias("cid"))
        .distinct()
    )
    sh_b = bp.select(F.col("id").alias("bid"), F.col("sh").alias("sh_b"))
    sh_c = cp.select(F.col("id").alias("cid"), F.col("sh").alias("sh_c")).join(
        cand.select("cid").distinct(), "cid", "left_semi"
    )
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size(F.array_union("sh_b", "sh_c"))
    scored = (
        cand.join(sh_b, "bid")
        .join(sh_c, "cid")
        .select(
            "bid", (inter.cast("double") / F.greatest(union, F.lit(1))).alias("__j")
        )
    )
    per = scored.groupBy("bid").agg(
        F.count(F.lit(1)).alias("n_candidates"), F.max("__j").alias("__bj")
    )
    return (
        bp.select(F.col("id").alias("bid"))
        .join(per, "bid", "left")
        .select(
            F.col("bid").alias(id_col),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.round("__bj", 6).alias("best_jaccard"),
            F.coalesce(F.col("__bj") >= threshold, F.lit(False)).alias("is_dup"),
        )
    )


def build_lsh_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Materialize the corpus LSH band index: (id, band, h) written
    ``partitionBy(band)`` so an incremental-ingest probe prunes to the
    bands it actually collides on and NEVER re-shingles the corpus — the
    persisted artifact :func:`incremental_near_dups` assumes at scale.
    Returns the re-read (partition-pruned-capable) DataFrame."""
    rows = _lsh_rows(num_hashes, bands)
    with_sig = df.select(
        F.col(id_col).alias("id"),
        shingle_minhash_udf(num_hashes, shingle_k)(F.col(text_col))["sig"].alias("sig"),
    )
    banded = with_sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    banded.write.partitionBy("band").parquet(path)
    return df.sparkSession.read.parquet(path)


def incremental_near_dups_indexed(
    index_df: DataFrame,
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """:func:`incremental_near_dups` against a PRE-BUILT band index
    (:func:`build_lsh_index` output): only the new batch is shingled and
    signed — in ONE UDF pass (a persisted (id, sh, sig) projection feeds
    banding and verification, same discipline as the un-indexed form); the
    corpus is touched just to fetch candidate shingle sets (an id
    semi-join — at scale, point lookups into the document store)."""
    rows = _lsh_rows(num_hashes, bands)
    bp = shingle_sig_projection(batch, text_col, id_col, num_hashes, shingle_k).persist()
    bb = _banded_from_proj(bp, bands, rows).alias("n")
    cb = index_df.alias("c")
    cand = (
        bb.join(cb, (F.col("n.band") == F.col("c.band")) & (F.col("n.h") == F.col("c.h")))
        .select(F.col("n.id").alias("bid"), F.col("c.id").alias("cid"))
        .distinct()
    )
    sh_b = bp.select(F.col("id").alias("bid"), F.col("sh").alias("sh_b"))
    sh_c = corpus.select(
        F.col(id_col).alias("cid"),
        shingle_minhash_udf(1, shingle_k)(F.col(text_col))["sh"].alias("sh_c"),
    ).join(cand.select("cid").distinct(), "cid", "left_semi")
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size(F.array_union("sh_b", "sh_c"))
    scored = (
        cand.join(sh_b, "bid")
        .join(sh_c, "cid")
        .select("bid", (inter.cast("double") / F.greatest(union, F.lit(1))).alias("__j"))
    )
    per = scored.groupBy("bid").agg(
        F.count(F.lit(1)).alias("n_candidates"), F.max("__j").alias("__bj")
    )
    return (
        bp.select(F.col("id").alias("bid"))
        .join(per, "bid", "left")
        .select(
            F.col("bid").alias(id_col),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.round("__bj", 6).alias("best_jaccard"),
            F.coalesce(F.col("__bj") >= threshold, F.lit(False)).alias("is_dup"),
        )
    )
