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
    if metric not in ("cosine", "dot"):
        raise ValueError(f"unknown metric {metric!r}: expected 'cosine' or 'dot'")
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
    Hamming ≤ ``multiprobe_hamming`` over bucket bits — recall knob)."""
    from itertools import combinations

    planes = _hyperplanes(dim, n_planes, seed)
    # fold-dot (not np.dot): the query's bucket must be bit-identical to
    # the bucket the engine-side fold would assign the same vector
    qbits = int(sum((1 << j) for j, p in enumerate(planes) if _fold_dot(qvec, p) >= 0))
    probes = {qbits}
    for d in range(1, multiprobe_hamming + 1):
        for flip in combinations(range(n_planes), d):
            mask = 0
            for j in flip:
                mask |= 1 << j
            probes.add(qbits ^ mask)
    q = _query_lit(qvec)
    return (
        bucketed.filter(F.col("bucket").isin(list(probes)))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ------------------------------------------------------------ product quantization
def _sub_slices(dim: int, n_sub: int) -> list[tuple[int, int]]:
    """(1-based start, length) per subspace; dim must divide evenly."""
    assert dim % n_sub == 0
    w = dim // n_sub
    return [(j * w + 1, w) for j in range(n_sub)]


def _fold_l2sq(a, b) -> float:
    """Driver-side squared L2 as a left-to-right fold (same discipline as
    :func:`_fold_dot` — never numpy, whose pairwise summation can flip an
    argmin near a tie boundary vs the engine-side fold)."""
    s = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += d * d
    return s


def train_pq_codebooks(
    df: DataFrame,
    dim: int,
    n_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 7,
) -> list[list[list[float]]]:
    """Deterministic per-subspace Lloyd codebooks for product quantization
    (Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
    Neighbor Search"). Same replayability recipe as
    :func:`train_centroids_deterministic` — id-predicate sample, smallest-id
    seeds, per-iteration 6-decimal rounding, id-ordered left-to-right mean
    folds, emptied codes keep their previous centroid — but assignment is
    argmin squared-L2 (ties → lowest code), the PQ metric.

    All ``n_sub`` trainings run over ONE cached sample projection; each
    iteration is one job per subspace at sample size (cluster cost is
    independent of the full table — the 100 TB story is that training
    touches only the id-predicate sample)."""
    slices = _sub_slices(dim, n_sub)
    width = dim // n_sub
    s = df.filter((F.col(id_col) % sample_mod) == 0).select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    s = s.persist()
    try:
        seeds = s.orderBy("__id").limit(k).collect()
        # a sample smaller than k simply yields fewer codes per subspace
        # (mirrors train_centroids_deterministic and the SQL twin's LIMIT)
        k = min(k, len(seeds))
        books = [
            [[float(x) for x in r["__v"][start - 1 : start - 1 + width]] for r in seeds]
            for start, _ in slices
        ]
        zero = F.array(*[F.lit(0.0)] * width)
        vecs = F.transform(
            F.sort_array(F.collect_list(F.struct("__id", "__v"))), lambda st: st["__v"]
        )
        summed = F.aggregate(vecs, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b))
        for _ in range(iters):
            # ONE job updates all subspaces: explode (sub, code, subvec)
            # structs, aggregate per (sub, code) — the sample is scanned
            # once per iteration regardless of n_sub
            parts = F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        _argmin_code(
                            books[j], None, vec=F.slice("__v", start, width)
                        ).alias("code"),
                        F.slice("__v", start, width).alias("__v"),
                    )
                    for j, (start, _) in enumerate(slices)
                ]
            )
            assigned = s.select("__id", F.explode(parts).alias("p")).select(
                "__id", F.col("p.sub").alias("sub"), F.col("p.code").alias("code"),
                F.col("p.__v").alias("__v"),
            )
            rows = (
                assigned.groupBy("sub", "code")
                .agg(F.count(F.lit(1)).alias("n"), summed.alias("s"))
                .select(
                    "sub",
                    "code",
                    F.transform("s", lambda x: F.round(x / F.col("n"), 6)).alias("c"),
                )
                .collect()
            )
            new = {(r["sub"], r["code"]): [float(x) for x in r["c"]] for r in rows}
            books = [
                [new.get((j, c), books[j][c]) for c in range(k)] for j in range(n_sub)
            ]
        return books
    finally:
        s.unpersist()


def _argmin_code(centroids: list[list[float]], vec_col, vec=None):
    """Column: index of the squared-L2-nearest centroid (ties → lowest
    code). JVM-side fold over a literal centroid matrix. Pass either a
    column name (``vec_col``) or a ready Column (``vec=``)."""
    v = vec if vec is not None else F.col(vec_col)
    cent_arr = F.array(*[_query_lit(c) for c in centroids])
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    pairs = F.zip_with(
        dists,
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda d, i: F.struct((-d).alias("negd"), (-i).alias("negidx")),
    )
    return -F.array_max(pairs).getField("negidx")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — the compressed index. At 64 dims / 4
    subspaces / 8 codes this is 4 small ints per vector instead of 64
    floats: the representation that lets a 100 TB corpus's index fit in
    a fraction of the raw size and scan without touching the vectors."""
    n_sub = len(codebooks)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    code_cols = []
    tmp = df.select(F.col(id_col), v.alias("__v"))
    for j, (start, width) in enumerate(_sub_slices(dim, n_sub)):
        tmp = tmp.withColumn(f"__c{j}", F.slice("__v", start, width))
        code_cols.append(_argmin_code(codebooks[j], f"__c{j}").alias(f"code{j}"))
    return tmp.select(F.col(id_col), *code_cols).select(
        id_col, F.array(*[f"code{j}" for j in range(n_sub)]).alias("codes")
    )


def pq_adc_topk(
    encoded: DataFrame,
    df: DataFrame,
    codebooks: list[list[list[float]]],
    qvec,
    dim: int,
    k: int = 10,
    shortlist: int = 40,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) search + exact re-rank: the query's
    per-subspace distance tables (n_sub × n_codes doubles, computed
    driver-side with the deterministic fold and ROUNDED to 6 decimals)
    become literal lookup arrays; approximate distance = fixed-order sum
    of ``n_sub`` table lookups — a pure codegen'd expression over the
    4-int codes, never touching the vectors. The ``shortlist`` nearest by
    ADC (ties → lowest id) are re-ranked by exact cosine against the raw
    vectors (an id semi-join — at scale, a point-lookup into the vector
    store), returning the exact-scored top ``k``."""
    n_sub = len(codebooks)
    tables = []
    for j, (start, width) in enumerate(_sub_slices(dim, n_sub)):
        qsub = [float(x) for x in qvec[start - 1 : start - 1 + width]]
        tables.append([round(_fold_l2sq(qsub, c), 6) for c in codebooks[j]])
    adc = None
    for j in range(n_sub):
        term = F.element_at(
            F.array(*[F.lit(d) for d in tables[j]]),
            F.col("codes").getItem(j).cast("int") + 1,
        )
        adc = term if adc is None else adc + term
    short = (
        encoded.select(id_col, F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    q = _query_lit(qvec)
    return (
        df.join(short, on=id_col, how="left_semi")
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ------------------------------------------------------------------ kNN graph
def knn_graph(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN graph: per vector, its ``k`` nearest neighbors
    *within the same sign-LSH bucket* (SemDeDup / semantic-clustering
    pipelines build exactly this edge list before pruning or clustering;
    Abbas et al. 2023 use cluster-local neighbor search for the same
    reason — the all-pairs graph is quadratic and the bucket-local one
    is not).

    Plan shape at 100 TB: bucket assignment is one codegen'd projection;
    the self-join is EQUI on ``bucket`` — Spark shuffles both sides on the
    bucket hash and compares only within buckets, never all-pairs. The
    per-source top-k is a window inside the same bucket partitioning.
    Recall is tunable by ``n_planes`` (fewer planes → bigger buckets) or
    by unioning a second seed's buckets.

    Returns ``(src, dst, score)`` — cosine rounded to 6, deterministic
    tie-break on dst id.
    """
    from pyspark.sql import Window

    b = lsh_bucket(df, dim, n_planes=n_planes, vec_col=vec_col, seed=seed)
    left = b.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("__lv"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("__rv"), "bucket"
    )
    pairs = (
        left.join(right, on="bucket")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(cosine(F.col("__lv"), F.col("__rv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("dst").asc())
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("src", "dst", "score")
    )
