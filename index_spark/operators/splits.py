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
    filter applies AS a self-join predicate, so a pair is surfaced
    regardless of which side each doc landed on, but BEFORE the
    exact-Jaccard verify: at train_frac=0.9 most candidates are
    same-split, and verifying them only to drop them would multiply the
    expensive stage ~5x.

    Plan shape follows ``minhash_near_dup_pairs``' fused one-UDF-pass
    design: ONE (id, split, shingles, signature) projection is computed
    and persisted; banding, both self-join sides, and both verify sides
    read it back. The earlier composition of ``minhash_candidates`` +
    ``jaccard_pairs`` + two split side-joins re-derived the UDF subtree
    throughout the plan (40 Python-eval nodes / 140 Exchanges statically)
    and measured ~3x slower same-session (3.0 s vs 1.0 s at sf0.1's
    550-doc dup-injected corpus, identical 184-pair output). Carrying
    ``split`` through banding also deletes the two id→split broadcast
    joins the old shape paid after candidate generation. The docs scan is
    spread to ``defaultParallelism`` before the UDF (``TX.spread_for_cpu``,
    as ``minhash_candidates`` does): a single-row-group source would
    otherwise run the hot shingle+minhash pass on one core, and the spread
    frame feeds exactly one consumption (the persist materialization).

    Cache lifetime: the persisted projection deliberately lives with the
    returned lazy plan — unpersisting here would force a recompute per
    join side. Spark LRU-evicts it under storage pressure; a caller done
    with the result can drop it via ``spark.catalog.clearCache()``. At
    100 TB, materialize the corpus projection to storage instead and run
    this audit over the re-read (the ``simhash_candidates``
    ``materialize_path`` recipe)."""
    from index_spark.functions import text as TX
    from index_spark.operators.dedup import (
        _lsh_rows,
        minhash_bands,
        shingle_minhash_udf,
    )

    rows = _lsh_rows(num_hashes, bands)
    enriched = (
        hash_split(TX.spread_for_cpu(docs), id_col, train_frac)
        .select(
            F.col(id_col).alias("id"),
            "split",
            shingle_minhash_udf(num_hashes, shingle_k)(F.col(text_col)).alias("ss"),
        )
        .select("id", "split", F.col("ss.sh").alias("sh"), F.col("ss.sig").alias("sig"))
        .persist()
    )
    banded = enriched.select(
        "id", "split", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("id", "split", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a, b = banded.alias("a"), banded.alias("b")
    cross_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.split") != F.col("b.split")),
        )
        # split_a is functionally dependent on id_a, so carrying it through
        # the distinct leaves the pair set untouched — and the other side's
        # split is by construction the opposite, so split_b is never needed
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.split").alias("split_a"),
            F.col("b.id").alias("id_b"),
        )
        .distinct()
    )
    sh = enriched.select("id", "sh")
    joined = (
        cross_cand.join(
            sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
        ).join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    crossing = joined.select(
        "id_a",
        "id_b",
        "split_a",
        (inter.cast("double") / F.greatest(union, F.lit(1))).alias("jaccard"),
    ).filter(F.col("jaccard") >= F.lit(threshold))
    train_id = F.when(F.col("split_a") == "train", F.col("id_a")).otherwise(
        F.col("id_b")
    )
    val_id = F.when(F.col("split_a") == "val", F.col("id_a")).otherwise(F.col("id_b"))
    return crossing.select(
        train_id.alias("train_id"), val_id.alias("val_id"), F.col("jaccard")
    )
