"""Round-3 batch-11: pivot/unpivot/rank-window coverage checks, fuzzy
token matching, and a randomized MERGE INTO property test against a dict
model (the reference's randomized-spec strategy applied to the lakehouse
verb)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from index_spark.snapshots import SnapshotStore

SET = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))


# ------------------------------------------------------------ merge model
@SET
@given(
    base=st.dictionaries(st.integers(0, 30), st.integers(0, 99), min_size=1, max_size=15),
    updates=st.dictionaries(st.integers(0, 40), st.integers(0, 99), max_size=10),
    deletes=st.sets(st.integers(0, 40), max_size=6),
)
def test_merge_into_matches_dict_model(spark, tmp_path_factory, base, updates, deletes):
    # delete wins over update for the same key (the source row carries the
    # delete marker); model accordingly
    updates = {k: v for k, v in updates.items() if k not in deletes}
    src_rows = [(k, float(v)) for k, v in updates.items()] + [
        (k, -1.0) for k in deletes
    ]
    if not src_rows:
        return
    d = tmp_path_factory.mktemp("mrg")
    store = SnapshotStore(spark, str(d / "s"))
    h = store.create(
        ["k"],
        df=spark.createDataFrame([(k, float(v)) for k, v in base.items()], "k long, v double"),
        rows_per_partition=7,
    )
    h2 = h.merge_into(
        spark.createDataFrame(src_rows, "k long, v double"),
        delete_condition=F.col("v") < 0,
    )
    got = {r.k: r.v for r in h2.df.select("k", "v").collect()}
    model = dict(base)
    for k in deletes:
        model.pop(k, None)  # absent-key delete is a no-op
    for k, v in updates.items():
        model[k] = v
    assert got == {k: float(v) for k, v in model.items()}


# ------------------------------------------------------------ pivot/unpivot
def test_pivot_unpivot_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "g string, s string, n long"
    )
    wide = (
        df.groupBy("g")
        .pivot("s", ["x", "y"])
        .agg(F.sum("n"))
        .select("g", F.coalesce("x", F.lit(0)).alias("x"), F.coalesce("y", F.lit(0)).alias("y"))
    )
    back = wide.unpivot(["g"], ["x", "y"], "s", "n")
    got = {(r.g, r.s): r.n for r in back.collect()}
    assert got == {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 3, ("b", "y"): 0}


def test_window_ranks_definitions(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame([(i,) for i in range(1, 5)], "x long")
    w = Window.orderBy("x")
    rows = df.select(
        "x",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(2).over(w).alias("nt"),
    ).collect()
    by_x = {r.x: r for r in rows}
    assert by_x[1].pr == 0.0 and by_x[4].pr == 1.0
    assert by_x[2].cd == pytest.approx(0.5)
    assert [by_x[i].nt for i in range(1, 5)] == [1, 1, 2, 2]


# ------------------------------------------------------------ fuzzy pairs
def test_fuzzy_token_pairs_finds_injected_typos(spark, sf_dir):
    from index_spark.plans.driver_queries import q_fuzzy_token_pairs

    pairs = {(r.t1, r.t2) for r in q_fuzzy_token_pairs(spark, sf_dir).collect()}
    # the a->o noise guarantees these vocabulary typo pairs exist
    assert ("fast", "fost") in pairs or ("part", "port") in pairs
    for t1, t2 in pairs:
        assert t1[0] == t2[0] and abs(len(t1) - len(t2)) <= 1


# ------------------------------------------------------------ mapInArrow
def test_arrow_norms_matches_jvm_fold(spark, embeddings):
    from index_spark.functions.vectors import norm, norms_arrow

    arrow = {r.vec_id: r.norm for r in norms_arrow(embeddings).collect()}
    jvm = {
        r.vec_id: r.n
        for r in embeddings.select(
            "vec_id", F.round(norm(F.col("embedding")), 6).alias("n")
        ).collect()
    }
    assert arrow == jvm and len(arrow) > 0


# ------------------------------------------------------------ epoch shuffle
def test_epoch_shuffle_is_permutation_and_epoch_varied(spark):
    from index_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    e1 = epoch_shuffle(df, "doc_id", epoch=1, n_shards=4)
    rows = e1.collect()
    # a permutation: every key exactly once, positions 1..n_in_shard per shard
    assert sorted(r.doc_id for r in rows) == list(range(100))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # epoch 2 produces a DIFFERENT order, deterministically
    e2a = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, "doc_id", 2, 4).collect()}
    e2b = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, "doc_id", 2, 4).collect()}
    assert e2a == e2b
    assert e2a != {(r.doc_id, r.shard, r.pos) for r in rows}


def test_rebalance_flattens_groups(spark):
    from index_spark.operators.sampling import rebalance_by_group

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "k long, g string")
    counts = {"big": 400, "small": 20}
    kept = rebalance_by_group(df, "g", "k", counts, target=50)
    got = {r.g: r.n for r in kept.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    # under-target group passes through whole; big group lands near target
    assert got["small"] == 20
    assert 25 <= got["big"] <= 75  # hash-uniform draw around 50
    # deterministic across runs
    again = {r.g: r.n for r in rebalance_by_group(df, "g", "k", counts, target=50)
             .groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == got
