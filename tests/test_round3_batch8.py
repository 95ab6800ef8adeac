"""Round-3 batch-8: count-min sketch (build / estimate / merge) and the
WindowGroupLimit pushdown property of the group-top-k shape."""

import hashlib
import io
from collections import Counter
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from index_spark.operators.sampling import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _cms_pos(v: str, row: int, width: int = CMS_WIDTH) -> int:
    return int(hashlib.md5(f"{v}#cms{row}".encode()).hexdigest()[:7], 16) % width


def _cms_model(values, depth=CMS_DEPTH, width=CMS_WIDTH):
    table = Counter()
    for v in values:
        for i in range(depth):
            table[(i, _cms_pos(v, i, width))] += 1
    return table


def _est_model(table, v, depth=CMS_DEPTH, width=CMS_WIDTH):
    return min(table.get((i, _cms_pos(v, i, width)), 0) for i in range(depth))


def test_cms_build_matches_python_model(spark):
    values = [f"w{i % 7}" for i in range(100)] + ["rare"]
    df = spark.createDataFrame([(v,) for v in values], "t string")
    got = {(r.row, r.pos): r.n for r in cms_build(df, "t").collect()}
    assert got == dict(_cms_model(values))


def test_cms_estimate_is_exact_upper_bound(spark):
    values = [f"w{i % 7}" for i in range(100)] + ["rare"]
    df = spark.createDataFrame([(v,) for v in values], "t string")
    sketch = cms_build(df, "t")
    probes = spark.createDataFrame([(v,) for v in {"w0", "rare", "absent"}], "t string")
    got = {r.t: r.est_n for r in cms_estimate(sketch, probes, "t").collect()}
    table = _cms_model(values)
    true = Counter(values)
    for v in ("w0", "rare", "absent"):
        assert got[v] == _est_model(table, v)
        assert got[v] >= true.get(v, 0)  # never undercounts


def test_cms_merge_equals_sketch_of_union(spark):
    a = [f"x{i % 5}" for i in range(40)]
    b = [f"x{i % 9}" for i in range(50)]
    da = spark.createDataFrame([(v,) for v in a], "t string")
    db = spark.createDataFrame([(v,) for v in b], "t string")
    dub = spark.createDataFrame([(v,) for v in a + b], "t string")
    merged = {(r.row, r.pos): r.n for r in cms_merge([cms_build(da, "t"), cms_build(db, "t")]).collect()}
    union = {(r.row, r.pos): r.n for r in cms_build(dub, "t").collect()}
    assert merged == union


def test_group_topk_uses_window_group_limit(spark, sf_dir):
    """Spark 3.5+ pushes rank<=k through the window as WindowGroupLimit —
    per-partition top-k retention before the shuffle, the property that
    makes group-top-k scale. Assert the optimization actually fires."""
    from index_spark.plans.driver_queries import q_group_topk

    df = q_group_topk(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()
