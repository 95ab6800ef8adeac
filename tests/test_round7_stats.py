"""Round-7: constant-codegen binary-search bucket key for the two-level
rank plans. Above ``_TREE_MAX_CUTS`` the CASE tree (whose generated source
grows linearly and fails Janino around ~1000 cuts, degrading the whole
stage to interpreted eval) is replaced by a branchless binary search over
one Literal cuts array. The two paths must produce IDENTICAL bucket
ordinals — monotone count-of-cuts-≤-v — on interior values, boundary
equality, NaN (Spark orders it above all doubles) and extreme inputs."""

import random

from pyspark.sql import functions as F

from index_spark.operators import stats as S
from index_spark.operators.stats import exact_quantiles, exact_quantiles_weighted


# the equivalence test binds to the SHIPPED builders — a drift in the
# production search lambda must fail here, not just in coarser
# end-to-end quantile tests
_tree_expr = S._bucket_tree_expr
_search_expr = S._bucket_search_expr


def test_search_and_tree_buckets_agree(spark):
    rng = random.Random(7)
    for n_cuts in (1, 2, 3, 7, 130, 257):
        cuts = sorted(rng.uniform(-50, 50) for _ in range(n_cuts))
        vals = (
            [(c,) for c in cuts]  # boundary equality
            + [(rng.uniform(-80, 80),) for _ in range(500)]
            + [(float("nan"),), (float("-inf"),), (float("inf"),), (-1e18,), (1e18,)]
        )
        df = spark.createDataFrame(vals, "v double")
        bad = (
            df.select(
                _tree_expr(cuts, "v").alias("a"), _search_expr(cuts, "v").alias("b")
            )
            .filter("a <> b")
            .count()
        )
        assert bad == 0, n_cuts


def test_exact_quantiles_through_search_path(spark, lineitem):
    """Force n_cuts past _TREE_MAX_CUTS so the production plan runs the
    binary-search key end-to-end; results must equal percentile_disc."""
    n_cuts = S._TREE_MAX_CUTS + 50
    qs = [0.1, 0.5, 0.9, 1.0]
    got = {
        r.p: r.value
        for r in exact_quantiles(lineitem, "l_extendedprice", "l_orderkey", qs, n_cuts=n_cuts).collect()
    }
    want = {
        q: lineitem.selectExpr(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY l_extendedprice) AS v"
        ).first().v
        for q in qs
    }
    assert got == want


def test_weighted_quantiles_through_search_path(spark):
    rng = random.Random(3)
    rows = [(rng.randint(0, 10_000), rng.randint(1, 5)) for _ in range(4_000)]
    df = spark.createDataFrame(rows, "v int, w int")
    n_cuts = S._TREE_MAX_CUTS + 20
    got = {
        r.p: r.value
        for r in exact_quantiles_weighted(df, "v", "w", [0.25, 0.75], n_cuts=n_cuts).collect()
    }
    # brute-force expansion oracle
    expanded = sorted(v for v, w in rows for _ in range(w))
    import math

    want = {q: expanded[max(1, math.ceil(q * len(expanded))) - 1] for q in (0.25, 0.75)}
    assert got == want


def test_round7_corpus_queries_plan_shapes(spark, sf_dir):
    """The three round-7 corpus queries must keep their scale shapes: no
    row-multiplying nested loops (single-row broadcast crossJoins for the
    corpus totals are fine and appear as BroadcastNestedLoopJoin with a
    one-row side — assert instead on CartesianProduct and on column
    pruning at the documents scan: only text/doc_id/source are read."""
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as em

    qs = em.queries()
    for name, allowed_cols in [
        ("bigram_nll", {"doc_id", "text"}),
        ("zipf_fit", {"text"}),
        ("js_sources", {"text", "source"}),
    ]:
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        p = buf.getvalue()
        assert "CartesianProduct" not in p, name
        import re

        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
            cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            assert cols <= allowed_cols, (name, cols)
