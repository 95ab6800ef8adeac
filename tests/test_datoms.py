"""DatomStore reproduces the three DatomsSpec access patterns over the
TPC-H-ish fixtures (part / lineitem as entity sources)."""

import pytest
from pyspark.sql import functions as F

from index_spark.datoms import REF, DatomStore, datoms_from_table


@pytest.fixture(scope="module")
def part_datoms(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return datoms_from_table(
        part,
        entity_attr="part",
        id_col="p_partkey",
        text_attrs=["p_name", "p_brand", "p_type"],
        num_attrs=["p_size", "p_retailprice"],
    )


@pytest.fixture(scope="module")
def li_datoms(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "li_id",
        F.concat_ws("-", "l_orderkey", "l_linenumber", F.monotonically_increasing_id()),
    )
    return datoms_from_table(
        li,
        entity_attr="lineitem",
        id_col="li_id",
        num_attrs=["l_quantity"],
        ref_attrs={"l_partkey": "part", "l_suppkey": "supplier"},
    )


def test_flattening_counts(spark, sf_dir, part_datoms):
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    # 5 non-null attributes per part
    assert part_datoms.count() == 5 * n_parts


def test_avet_point_lookup(spark, sf_dir, part_datoms):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    brand = part.select("p_brand").first().p_brand
    expect = {f"part:{r.p_partkey}" for r in part.filter(F.col("p_brand") == brand).collect()}
    ds = DatomStore(part_datoms)
    got = {r.e for r in ds.entities_by_attr_value("part/p_brand", brand).collect()}
    assert got == expect and got


def test_avet_numeric_lookup(spark, sf_dir, part_datoms):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    size = part.select("p_size").first().p_size
    expect = {f"part:{r.p_partkey}" for r in part.filter(F.col("p_size") == size).collect()}
    ds = DatomStore(part_datoms)
    got = {r.e for r in ds.entities_by_attr_value("part/p_size", size, is_num=True).collect()}
    assert got == expect and got


def test_vaet_ref_chase(spark, sf_dir, li_datoms):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pk = li.select("l_partkey").first().l_partkey
    n_expect = li.filter(F.col("l_partkey") == pk).count()
    ds = DatomStore(li_datoms)
    got = ds.referencing(f"part:{pk}").collect()
    assert len(got) == n_expect
    assert all(r.a == "lineitem/l_partkey" for r in got)


def test_eavt_entity_prefix_scan(part_datoms):
    ds = DatomStore(part_datoms)
    e = part_datoms.select("e").first().e
    rows = ds.entity(e).collect()
    assert {r.a for r in rows} == {
        "part/p_name", "part/p_brand", "part/p_type", "part/p_size", "part/p_retailprice"
    }
    one = ds.entity(e, "part/p_brand").collect()
    assert len(one) == 1 and one[0].value_tpe == 1


def test_ref_datoms_shape(li_datoms):
    refs = li_datoms.filter(F.col("value_tpe") == REF)
    r = refs.first()
    assert r.v_text.startswith(("part:", "supplier:")) and r.v_num is None


def test_materialized_covering_orders(spark, tmp_base, sf_dir):
    """materialize() writes three clustered copies; every access pattern
    must return the same rows as the in-memory store, and the AVET probe
    must reach the scan as a pushed filter on its leading sort key."""
    from index_spark.datoms import DatomStore, datoms_from_table
    from index_spark.sources import load_table

    part = load_table(spark, sf_dir, "part")
    datoms = datoms_from_table(
        part, entity_attr="part", id_col="p_partkey",
        text_attrs=["p_brand"], num_attrs=["p_size"],
    )
    mem = DatomStore(datoms)
    mat = mem.materialize(tmp_base + "/datoms", rows_per_partition=1000)

    brand = part.agg({"p_brand": "min"}).first()[0]
    q_mem = sorted(r.e for r in mem.entities_by_attr_value("part/p_brand", brand).collect())
    q_mat = sorted(r.e for r in mat.entities_by_attr_value("part/p_brand", brand).collect())
    assert q_mem == q_mat and q_mat

    e = q_mat[0]
    cols = ["e", "a", "v_text", "v_num", "t", "value_tpe"]  # materialized copies add __version
    assert sorted(map(tuple, mem.entity(e).select(*cols).collect())) == sorted(
        map(tuple, mat.entity(e).select(*cols).collect())
    )

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        mat.avet.prefix(("part/p_brand", brand)).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "EqualTo(a,part/p_brand)" in plan
