"""Vector column functions (embedding similarity) — JVM-side only.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; accumulation is an explicit left-to-right DOUBLE fold, which makes
results bit-identical to a sequential sum (and therefore to the DuckDB
oracle's ``list_sum(list_transform(range(...)))`` form). No Python, no UDF,
no Arrow transfer in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (ANSI
    mode raises on the 0-divisor instead of yielding NaN/inf — a zero
    embedding must not kill a whole similarity scan). The SQL oracles
    omit the guard: fixture vectors are non-zero, so the twins agree on
    every gated row."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def norms_arrow(df, vec_col: str = "embedding", id_col: str = "vec_id"):
    """L2 norms via ``mapInArrow`` — the Arrow-native batch API (no pandas
    conversion layer): each partition arrives as pyarrow RecordBatches and
    returns RecordBatches.

    This is the template for Arrow-level kernels (tokenizers, codecs,
    ANN distance kernels) where even the pandas bridge is overhead. The
    accumulation here is an explicit per-row left-to-right double fold so
    the result is bit-identical to the JVM :func:`norm` fold and the SQL
    oracle — a production kernel would vectorize (numpy/pyarrow.compute
    use pairwise summation) and compare under a tolerance instead.
    """
    import pyarrow as pa

    def batches(it):
        for rb in it:
            ids = rb.column(rb.schema.get_field_index(id_col))
            vecs = rb.column(rb.schema.get_field_index(vec_col)).to_pylist()
            out = []
            for v in vecs:
                acc = 0.0
                for x in v:
                    acc += float(x) * float(x)
                out.append(round(acc ** 0.5, 6))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())], [id_col, "norm"]
            )

    return df.select(id_col, vec_col).mapInArrow(batches, f"{id_col} long, norm double")
