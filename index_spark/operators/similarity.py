"""Similarity search over embedding columns.

Three tiers, matching how ANN actually scales out:

- **brute-force top-k** — exact cosine against every row; the recall
  baseline. One narrow projection + ``TakeOrderedAndProject`` (no global
  sort, no shuffle of the vectors beyond the scan).
- **IVF (inverted-file)** — partition vectors by nearest centroid at build
  time; probe only ``nprobe`` nearest cells at query time. The 100 TB path:
  cells are range/hash-partitioned parquet, a probe prunes ~(1 - nprobe/k)
  of the data before any arithmetic.
- **sign-LSH** — random-hyperplane sign buckets (deterministic seeded
  planes); bucket equality join for candidates.

Centroid training here is a lightweight Lloyd's iteration expressed in
DataFrame ops (good enough for cell assignment; k-means quality is not the
point of the operator contract).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_spark.functions.vectors import cosine, dot


def _query_lit(qvec) -> Column:
    return F.array(*[F.lit(float(x)) for x in qvec])


def brute_force_topk(
    df: DataFrame,
    qvec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k by cosine (or dot). Deterministic tie-break on id.
    Compiles to scan → project → TakeOrderedAndProject: at any scale this
    is one pass over the vectors with a k-row reduction per partition."""
    q = _query_lit(qvec)
    score = cosine(F.col(vec_col), q) if metric == "cosine" else dot(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ----------------------------------------------------------------------- IVF
def train_centroids(
    df: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    sample_limit: int = 100_000,
) -> list[list[float]]:
    """Lloyd's k-means on a bounded sample (driver-side numpy refinement —
    the sample is fixed-size regardless of table size)."""
    n = df.count()
    frac = min(1.0, sample_limit / max(n, 1))
    sample = np.array(
        [r[0] for r in df.select(vec_col).sample(fraction=frac, seed=seed).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def _fold_dot(a, b) -> float:
    """Driver-side dot product as a LEFT-TO-RIGHT double fold — bit-identical
    to the engine-side :func:`index_spark.functions.vectors.dot` (an
    F.aggregate fold) and to the SQL oracle's list_sum fold. numpy's
    np.dot uses blocked/pairwise summation, which can differ in the last
    ulp and flip a sign/argmax near a boundary — never use it where a
    driver-side score must agree with an engine-side one."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def train_centroids_deterministic(
    df: DataFrame,
    dim: int,
    n_cells: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 7,
) -> list[list[float]]:
    """Lloyd's k-means made cross-engine REPLAYABLE (exact-oracle-able):

    - the training sample is a deterministic id predicate
      (``id % sample_mod == 0``), not an RNG sample — still a bounded
      fraction of the table at any scale;
    - init = the ``n_cells`` sample vectors with the smallest ids;
    - each iteration assigns by argmax fold-dot (ties → lowest cell) and
      recomputes centroids as the per-cell element-wise mean, where the
      float sum is a LEFT-TO-RIGHT fold over the cell's vectors in id
      order (a plain ``F.avg`` would be combine-order-dependent — the
      floating-accumulation hazard the catalog bans), then ROUNDED to 6
      decimals; an unrolled SQL twin replaying the same id-ordered fold
      reproduces the exact same centroids bit-for-bit;
    - an emptied cell keeps its previous centroid.

    Each iteration is one shuffle of (cell, vector) at sample size; the
    per-cell vector list is bounded by the sample, not the table."""
    s = df.filter((F.col(id_col) % sample_mod) == 0).select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    seeds = s.orderBy("__id").limit(n_cells).collect()
    cents = [[float(x) for x in r["__v"]] for r in seeds]
    zero = F.array(*[F.lit(0.0)] * dim)
    for _ in range(iters):
        assigned = assign_cells(s, cents, vec_col="__v")
        # id-sorted struct list -> element-wise left-to-right vector fold
        vecs = F.transform(
            F.sort_array(F.collect_list(F.struct("__id", "__v"))), lambda st: st["__v"]
        )
        summed = F.aggregate(vecs, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b))
        rows = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"), summed.alias("s"))
            .select(
                "cell",
                F.transform("s", lambda x: F.round(x / F.col("n"), 6)).alias("c"),
            )
            .collect()
        )
        new = {r["cell"]: [float(x) for x in r["c"]] for r in rows}
        cents = [new.get(c, cents[c]) for c in range(len(cents))]
    return cents


def assign_cells(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Add a ``cell`` column = argmax-dot centroid (JVM-side: the centroid
    matrix is a literal array of arrays, folded with zip_with/aggregate)."""
    cent_arr = F.array(*[_query_lit(c) for c in centroids])
    scored = F.transform(cent_arr, lambda c: dot(F.col(vec_col), c))
    pairs = F.zip_with(
        scored,
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda s, i: F.struct(s.alias("score"), (-i).alias("negidx")),
    )
    best = F.array_max(pairs)
    return df.withColumn("cell", -best.getField("negidx"))


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    qvec,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` cells nearest the query, exact top-k within.

    ``indexed`` must carry the ``cell`` column (from :func:`assign_cells`);
    at scale it is written partitioned by cell so the probe is partition
    pruning, not a filter scan."""
    cell_scores = [(i, _fold_dot(qvec, c)) for i, c in enumerate(centroids)]
    # ties → lowest cell id, matching the SQL twin's (score DESC, cell ASC)
    probe = [i for i, _ in sorted(cell_scores, key=lambda t: (-t[1], t[0]))[:nprobe]]
    q = _query_lit(qvec)
    return (
        indexed.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def build_ivf_index(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the IVF index: vectors written ``partitionBy(cell)`` so a
    probe is *partition pruning* (directory-level skip), not a filter scan.
    This is the 100 TB shape — ``ivf_topk`` against the returned DataFrame
    shows ``PartitionFilters: [cell IN (...)]`` in the physical plan and
    never opens non-probed cells' files."""
    assign_cells(df, centroids, vec_col).write.partitionBy("cell").parquet(path)
    return df.sparkSession.read.parquet(path)


# ------------------------------------------------------------------ sign-LSH
def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Random-hyperplane sign bucket (Charikar 2002): bucket = bit-packed
    signs of <v, h_j>. Deterministic planes from the seed; the dot products
    run JVM-side against literal plane arrays."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        bit = F.when(dot(F.col(vec_col), _query_lit(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << j))
    return df.withColumn("bucket", bucket)


def lsh_topk(
    bucketed: DataFrame,
    qvec,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k within the query's bucket (± multiprobe neighbors at
    Hamming ≤ d over bucket bits — recall knob)."""
    planes = _hyperplanes(dim, n_planes, seed)
    # fold-dot (not np.dot): the query's bucket must be bit-identical to
    # the bucket the engine-side fold would assign the same vector
    qbits = int(sum((1 << j) for j, p in enumerate(planes) if _fold_dot(qvec, p) >= 0))
    probes = {qbits}
    if multiprobe_hamming >= 1:
        probes |= {qbits ^ (1 << j) for j in range(n_planes)}
    q = _query_lit(qvec)
    return (
        bucketed.filter(F.col("bucket").isin(list(probes)))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
