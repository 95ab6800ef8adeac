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

MinHash uses *lexicographic min over md5 hex strings* as the hash family:
md5 is uniform, the min over a random permutation argument carries over,
and — deliberately — the same expression exists verbatim in DuckDB SQL, so
the correctness oracle can replay the whole pipeline exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
def minhash_signature(col: Column, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hash values (md5-hex strings) over word
    shingles. seed_i is mixed in by prefixing the shingle.

    Built as ONE ``aggregate`` fold over the shingle array: for each shingle
    compute its ``num_hashes`` seed-md5s, element-wise ``least`` into the
    accumulator. The shingle subexpression is referenced exactly once, so
    the (expensive) shingle pipeline runs once per row. The obvious
    spelling — ``F.array`` of per-seed ``array_min(transform(sh, md5))`` —
    re-evaluates the shingle pipeline per seed (higher-order-function bodies
    get no common-subexpression elimination), a measured 60×+ slowdown once
    banding re-inlines the signature again.

    '|' never appears in md5 hex and 'g' sorts after every hex digit, so
    the "g" init is an identity for ``least`` and banding's '|' join is
    unambiguous. Values equal the oracle's per-seed
    ``list_min(list_transform(sh, md5))`` — same set, same min."""
    sh = word_shingles(col, shingle_k)
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    return F.aggregate(
        sh,
        F.array_repeat(F.lit("g"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.md5(F.concat(F.lit("s"), i.cast("string"), F.lit(":"), s))),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """Band the signature: band_j = md5('|'-join of its r member hashes).
    Returns array<struct<band:int, h:string>> for exploding into buckets.
    Same single-``transform`` construction as :func:`minhash_signature` so
    ``sig`` is referenced once, not once per band."""
    idx = F.array(*[F.lit(j) for j in range(bands)])
    return F.transform(
        idx,
        lambda j: F.struct(
            j.alias("band"),
            F.md5(F.array_join(F.slice(sig, j * rows + 1, rows), "|")).alias("h"),
        ),
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) that share ≥1 LSH band.

    Plan shape: project → explode bands → shuffle on (band, h) → in-bucket
    self-join → distinct pairs. The only exchanged payload is
    (id, band, 32-char hash)."""
    rows = num_hashes // bands
    # Two steps on purpose: the signature must be a materialized attribute
    # BEFORE the explode. Inlining it into the generator expression makes
    # Spark re-evaluate the whole shingle+md5 pipeline per emitted band —
    # O(bands × seeds) re-evaluation per row (measured 60×+ slowdown).
    with_sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_k).alias("sig"),
    )
    sigs = with_sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
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

    Broadcast-joins shingle sets onto the (small) candidate set — the
    classic candidate-then-verify LSH shape."""
    sh = df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("sh"))
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


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates → Jaccard ≥ threshold →
    drop the larger id of each confirmed pair (greedy min-id survivor)."""
    cands = minhash_candidates(df, text_col, id_col, num_hashes, bands)
    confirmed = jaccard_pairs(df, cands, text_col, id_col).filter(F.col("jaccard") >= threshold)
    losers = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ------------------------------------------------------------------- simhash
def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_bits: int = 16,
) -> DataFrame:
    """Candidate pairs sharing a 16-bit SimHash block (Manku-style blocking:
    near signatures agree on at least one of the 4 blocks). Returns pairs
    with their Hamming distance for thresholding by the caller."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
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
