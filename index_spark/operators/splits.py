"""Deterministic train/validation splits + cross-split leakage audit.

Splitting by ``rand()`` is the classic irreproducibility bug (a re-run
reassigns rows); splitting by a hash of the id is stable across runs,
machines, and engines. The fraction comes from the same md5-prefix
uniform-fraction trick the KMV sketch uses (``operators/sampling.py``) —
a pure expression both Spark and ANSI SQL evaluate identically, so the
assignment itself is oracle-checkable.

``split_leakage`` is the audit every eval set needs before anyone trusts
a number: near-duplicate pairs that CROSS the split (a val doc whose
near-dup sits in train leaks the answer). Reuses the banded MinHash
candidate machinery (``operators/dedup.py``) — band-bucket join, never
all-pairs — and keeps only train×val pairs above the Jaccard threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_spark.operators.sampling import md5_frac


def hash_frac(col: Column) -> Column:
    """Deterministic uniform fraction in [0, 1) from any id column (the
    shared :func:`index_spark.operators.sampling.md5_frac` expression —
    one definition keeps every SQL-oracle twin in lockstep)."""
    return md5_frac(col)


def hash_split(
    df: DataFrame, id_col: str = "doc_id", train_frac: float = 0.9
) -> DataFrame:
    """Adds ``split ∈ {'train','val'}`` — stable across runs/engines."""
    return df.withColumn(
        "split",
        F.when(hash_frac(F.col(id_col)) < F.lit(train_frac), F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def split_leakage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.9,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup (Jaccard ≥ threshold) pairs crossing the train/val split:
    ``(train_id, val_id, jaccard)``. Empty result = no leakage at this
    threshold. Candidate generation is the banded LSH join — the split
    filter applies AFTER banding so a pair is surfaced regardless of
    which side each doc landed on, but BEFORE the exact-Jaccard verify:
    at train_frac=0.9 most candidates are same-split, and verifying them
    only to drop them would multiply the expensive stage ~5x."""
    from index_spark.operators.dedup import jaccard_pairs, minhash_candidates

    tagged = hash_split(docs, id_col, train_frac)
    cand = minhash_candidates(tagged, text_col, id_col, num_hashes, bands, shingle_k)
    side = tagged.select(
        F.col(id_col).alias("__sid"), F.col("split").alias("__split")
    )
    a = side.withColumnRenamed("__sid", "id_a").withColumnRenamed("__split", "split_a")
    b = side.withColumnRenamed("__sid", "id_b").withColumnRenamed("__split", "split_b")
    cross_cand = (
        cand.join(a, on="id_a")
        .join(b, on="id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    crossing = (
        jaccard_pairs(
            tagged, cross_cand.select("id_a", "id_b"), text_col, id_col, shingle_k
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .join(a, on="id_a")
        .join(b, on="id_b")
    )
    train_id = F.when(F.col("split_a") == "train", F.col("id_a")).otherwise(
        F.col("id_b")
    )
    val_id = F.when(F.col("split_a") == "val", F.col("id_a")).otherwise(F.col("id_b"))
    return crossing.select(
        train_id.alias("train_id"), val_id.alias("val_id"), F.col("jaccard")
    )
