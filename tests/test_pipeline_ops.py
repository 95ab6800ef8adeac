"""Dedup / similarity / text / as-of / multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.functions.vectors import cosine, dot
from index_spark.multimodal import documents_as_media, extract_features, frame_sample
from index_spark.operators import dedup as DD
from index_spark.operators import similarity as SIM
from index_spark.operators.asof import asof_join


# ----------------------------------------------------------------------- text
def test_token_count_and_ratios(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog."), (2, "  A  B  "), (3, "!!!")], ["id", "t"]
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            TX.token_count(F.col("t")).alias("n"),
            TX.punct_ratio(F.col("t")).alias("p"),
            TX.stopword_ratio(F.col("t")).alias("s"),
        ).collect()
    }
    assert rows[1].n == 5 and rows[2].n == 2 and rows[3].n == 1
    assert rows[3].p == 1.0
    assert rows[1].s == pytest.approx(3 / 5)  # the, and, the ('dog.' not a stopword)


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick fox is happy with the dog that runs"),
            (2, "der hund ist nicht da und der mann"),
            (3, "le chat est dans la maison et les arbres"),
            (4, "zzz qqq"),
        ],
        ["id", "t"],
    )
    got = {r.id: r.lang for r in df.select("id", TX.lang_id(F.col("t")).alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([(1, "Hello   World"), (2, "hello world"), (3, "bye")], ["id", "t"])
    fps = [r.fp for r in df.select(TX.fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_simhash_near_vs_far(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra token"), (3, "completely different words entirely unrelated content")],
        ["id", "t"],
    )
    sh = {r.id: r.s for r in df.select("id", TX.simhash64(F.col("t")).alias("s")).collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])


# -------------------------------------------------------------------- vectors
def test_dot_cosine_exactness(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["id", "a", "b"])
    r = df.select(dot(F.col("a"), F.col("b")).alias("d"), cosine(F.col("a"), F.col("b")).alias("c")).first()
    assert r.d == pytest.approx(32.0)
    assert r.c == pytest.approx(32.0 / (np.sqrt(14) * np.sqrt(77)))


# ---------------------------------------------------------------------- dedup
@pytest.fixture(scope="module")
def docs_with_dups(spark, documents):
    """Real documents + injected exact and near duplicates."""
    base = documents.limit(50)
    exact = base.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tweak")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(exact).unionByName(near)


def test_exact_dedup(docs_with_dups):
    n = docs_with_dups.count()
    groups = DD.exact_duplicates(docs_with_dups).collect()
    assert len(groups) == 5 and all(g.n_dupes == 2 and g.keep_id < 100000 for g in groups)
    survivors = DD.exact_dedup(docs_with_dups)
    assert survivors.count() == n - 5
    assert survivors.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_minhash_lsh_finds_near_dups(docs_with_dups):
    cands = DD.minhash_candidates(docs_with_dups, num_hashes=16, bands=8)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    # all 5 exact pairs and most near pairs must be candidates
    exact_pairs = {(i, i + 100000) for i in range(5)}
    near_pairs = {(i, i + 200000) for i in range(5)}
    assert exact_pairs <= pairs
    assert len(near_pairs & pairs) >= 4
    verified = DD.jaccard_pairs(docs_with_dups, cands).filter(F.col("jaccard") >= 0.5)
    vp = {(r.id_a, r.id_b) for r in verified.collect()}
    assert exact_pairs <= vp
    # dedup drops one of each confirmed pair
    kept = DD.minhash_dedup(docs_with_dups, threshold=0.99)
    assert kept.filter((F.col("doc_id") >= 100000) & (F.col("doc_id") < 200000)).count() == 0


def test_simhash_blocking(docs_with_dups):
    cands = DD.simhash_candidates(docs_with_dups)
    pairs = {(r.id_a, r.id_b): r.hamming for r in cands.collect()}
    for i in range(5):
        assert pairs.get((i, i + 100000)) == 0  # exact dup → identical simhash


def test_embedding_near_dups(spark, embeddings):
    # duplicate 3 vectors with tiny noise → cosine ≈ 1
    base = embeddings.limit(20)
    dup = base.limit(3).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.000001)).alias("embedding"),
        "label",
    )
    allv = base.unionByName(dup)
    got = DD.embedding_near_dups(allv, threshold=0.9999)
    found = {(r.id_a, r.id_b) for r in got.collect()}
    assert {(i, i + 1000) for i in range(3)} <= found


# ----------------------------------------------------------------- similarity
def test_brute_force_topk_matches_numpy(spark, embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    q = mat[0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids))[:10]
    expect = [int(i) for _, i in order]
    got = [r.vec_id for r in SIM.brute_force_topk(embeddings, list(q), k=10).collect()]
    assert got == expect


def test_ivf_probe_recall(spark, embeddings):
    dim = len(embeddings.select("embedding").first()[0])
    cents = SIM.train_centroids(embeddings, n_cells=4, iters=2)
    indexed = SIM.assign_cells(embeddings, cents)
    assert indexed.select("cell").distinct().count() <= 4
    q = embeddings.select("embedding").first()[0]
    exact = [r.vec_id for r in SIM.brute_force_topk(embeddings, q, k=5).collect()]
    approx = [r.vec_id for r in SIM.ivf_topk(indexed, cents, q, k=5, nprobe=2).collect()]
    # query vector itself must be found; decent overlap expected
    assert exact[0] == approx[0]
    assert len(set(exact) & set(approx)) >= 3


def test_lsh_topk_contains_self(spark, embeddings):
    dim = len(embeddings.select("embedding").first()[0])
    b = SIM.lsh_bucket(embeddings, dim, n_planes=6)
    q = embeddings.select("embedding").first()[0]
    got = [r.vec_id for r in SIM.lsh_topk(b, q, dim, k=5, n_planes=6).collect()]
    assert got and got[0] == embeddings.select("vec_id").first()[0]


# ----------------------------------------------------------------------- asof
def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10), ("u1", 25), ("u2", 5), ("u2", 20)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 21, "c")], ["k", "ts", "val"]
    )
    out = {
        (r.k, r.ts): (r.val_right, r.ts_right)
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    assert out[("u1", 10)] == ("a", 10)   # tie at equal ts is inclusive
    assert out[("u1", 25)] == ("b", 20)
    assert out[("u2", 5)] == (None, None)  # nothing at-or-before
    assert out[("u2", 20)] == (None, None)


def test_asof_join_on_events(spark, sf_dir, orders):
    """Realistic shape: latest event value at-or-before each order date."""
    from index_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    left = orders.select(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ts")).limit(200)
    out = asof_join(left, events.select("user_id", "ts", "value"), ["user_id"], "ts", "ts")
    assert out.count() == 200
    # spot-check one row against a direct computation
    row = out.filter(F.col("value_right").isNotNull()).first()
    if row:
        direct = (
            events.filter((F.col("user_id") == row.user_id) & (F.col("ts") <= row.ts))
            .orderBy(F.col("ts").desc())
            .select("value")
            .first()
        )
        assert direct.value == row.value_right


# ----------------------------------------------------------------- multimodal
def test_multimodal_pipeline(documents):
    media = documents_as_media(documents.limit(30))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feat) == 12 and len(r.checksum) == 32 for r in rows)
    # deterministic: re-running yields identical features
    again = {r.doc_id: r.feat for r in extract_features(media).collect()}
    assert all(again[r.doc_id] == list(r.feat) for r in rows)


def test_frame_sampling(documents):
    media = documents_as_media(documents.limit(30))
    fs = frame_sample(media, every_n=24)
    r = fs.groupBy("doc_id").count().orderBy("doc_id").first()
    assert r is not None and r["count"] >= 1


def test_decode_stub_raises_without_fake():
    from index_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_bpe_tokens_and_rolling_fingerprint(spark):
    from pyspark.sql import functions as F

    from index_spark.functions.text import bpe_token_count, bpe_tokens, rolling_fingerprint

    df = spark.createDataFrame(
        [("don't panic, 42 times!",), ("panic don't, 42 times!",), ("",)],
        "text string",
    )
    rows = df.select(
        bpe_tokens(F.col("text")).alias("t"),
        bpe_token_count(F.col("text")).alias("n"),
        rolling_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    # contraction split + punctuation runs as their own tokens
    assert rows[0].t == ["don", "'t", "panic", ",", "42", "times", "!"]
    assert rows[0].n == 7
    # order-sensitive: same bag of tokens, different order => different hash
    assert sorted(rows[0].t) == sorted(rows[1].t)
    assert rows[0].fp != rows[1].fp
    # empty text folds to the init value
    assert rows[2].fp == 0


def test_ivf_partitioned_index_prunes(spark, embeddings, tmp_base):
    """The materialized IVF index must answer probes via partition pruning:
    the scan's PartitionFilters carries the cell predicate, so non-probed
    cells' files are never opened."""
    import io
    from contextlib import redirect_stdout

    cents = SIM.train_centroids(embeddings, n_cells=4, iters=2)
    indexed = SIM.build_ivf_index(embeddings, cents, tmp_base + "/ivf")
    q = embeddings.select("embedding").first()[0]

    exact = [r.vec_id for r in SIM.brute_force_topk(embeddings, q, k=5).collect()]
    approx_df = SIM.ivf_topk(indexed, cents, q, k=5, nprobe=2)
    approx = [r.vec_id for r in approx_df.collect()]
    assert exact[0] == approx[0]
    assert len(set(exact) & set(approx)) >= 3

    buf = io.StringIO()
    with redirect_stdout(buf):
        approx_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [cell" in plan


def test_word_ngrams_all_multiplicity_and_short_docs(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("one",), ("",), ("X Y",)], ["text"]
    )
    got = [
        r[0]
        for r in df.select(TX.word_ngrams_all(F.col("text"), 2).alias("g")).collect()
    ]
    assert got[0] == ["a b", "b a", "a b"]  # multiplicity preserved
    assert got[1] == [] and got[2] == []  # sub-k docs contribute nothing
    assert got[3] == ["x y"]  # lowercased


def test_asof_join_forward_and_tolerance(spark):
    """direction=forward → earliest right >= left (ties inclusive);
    tolerance nulls matches farther than the bound, like pandas
    merge_asof. Checked against a brute-force Python model."""
    from index_spark.operators.asof import asof_join

    left = [(1, 10), (1, 25), (1, 40), (2, 5), (2, 100)]
    right = [(1, 8, "a"), (1, 25, "b"), (1, 60, "c"), (2, 50, "d")]
    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(right, "k long, ts long, val string")

    def model(direction, tol):
        out = {}
        for lk, lts in left:
            cands = [
                (rts, v)
                for rk, rts, v in right
                if rk == lk
                and (rts <= lts if direction == "backward" else rts >= lts)
                and (tol is None or abs(rts - lts) <= tol)
            ]
            if cands:
                best = min(cands, key=lambda t: abs(t[0] - lts))
                out[(lk, lts)] = best[1]
            else:
                out[(lk, lts)] = None
        return out

    for direction, tol in [("backward", None), ("forward", None), ("backward", 10), ("forward", 20)]:
        got = {
            (r.k, r.ts): r.val_right
            for r in asof_join(
                ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
                direction=direction, tolerance=tol,
            ).collect()
        }
        assert got == model(direction, tol), (direction, tol)


def test_incremental_near_dups_flags_only_corpus_matches(spark):
    """Batch screening against a corpus: near-copies flag as dups with
    their match's Jaccard; fresh docs report zero candidates. Batch docs
    that duplicate EACH OTHER but nothing in the corpus must NOT flag —
    corpus-internal and batch-internal pairs are out of scope."""
    from pyspark.sql import functions as F

    from index_spark.operators.dedup import incremental_near_dups

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i} eta theta iota kappa") for i in range(20)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-copy of corpus doc 3
            (100, "alpha beta gamma delta epsilon zeta doc 3 eta theta iota kappa zz"),
            # fresh content, unlike anything in the corpus
            (101, "totally different words nothing shared here one two three four five"),
            # two batch docs identical to each other but not the corpus
            (102, "batch only duplicate text spanning several shingle windows right here"),
            (103, "batch only duplicate text spanning several shingle windows right here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in incremental_near_dups(corpus, batch).collect()}
    assert got[100].is_dup and got[100].n_candidates >= 1 and got[100].best_jaccard > 0.5
    assert not got[101].is_dup and got[101].n_candidates == 0
    assert not got[102].is_dup and not got[103].is_dup  # batch-internal ignored


def test_lsh_index_persisted_probe_equals_direct(spark, documents, tmp_base):
    """Probing a persisted band index must give exactly the direct
    corpus-banding results, and the index read must be partition-pruned
    by band (PartitionFilters in the scan when filtering one band)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from index_spark.operators.dedup import (
        build_lsh_index,
        incremental_near_dups,
        incremental_near_dups_indexed,
    )

    corpus = documents.select("doc_id", "text").limit(200)
    batch = corpus.where(F.col("doc_id") % 30 == 0).select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    idx = build_lsh_index(corpus, tmp_base + "/lsh")
    direct = {
        (r.doc_id, r.n_candidates, r.best_jaccard, r.is_dup)
        for r in incremental_near_dups(corpus, batch).collect()
    }
    via_index = {
        (r.doc_id, r.n_candidates, r.best_jaccard, r.is_dup)
        for r in incremental_near_dups_indexed(idx, corpus, batch).collect()
    }
    assert direct == via_index and any(t[3] for t in direct)
    buf = io.StringIO()
    with redirect_stdout(buf):
        idx.where(F.col("band") == 3).explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_lsh_hot_bucket_cap_bounds_fanout_and_keeps_connectivity(spark):
    """Adversarial corpus: 60 identical docs put every band in one hot
    bucket. With max_bucket, candidate pairs are O(n) (a chain), not
    O(n^2) — and connected components over the chain still recover the
    full duplicate group."""
    from index_spark.operators.dedup import minhash_candidates
    from index_spark.operators.graph import connected_components_star

    docs = [(i, "the exact same boilerplate text repeated for every single doc here") for i in range(60)]
    docs += [(100, "a completely different document with its own words entirely"),
             (101, "another unique document that matches nothing else at all")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = minhash_candidates(df, max_bucket=10)
    n_capped = capped.count()
    assert n_capped <= 8 * 60  # <= bands * chain length, never C(60,2)=1770
    # connectivity survives: one cluster containing all 60 duplicates
    # chained buckets produce DEEP graphs (diameter ~ bucket size):
    # pair the cap with the star CC variant (log rounds), not min-label
    cc = connected_components_star(capped, "id_a", "id_b")
    lab = [c for c in cc.columns if c != "id"][0]
    groups = cc.groupBy(lab).count().collect()
    assert max(r["count"] for r in groups) == 60
    # uncapped semantics unchanged
    uncapped = minhash_candidates(df)
    assert uncapped.count() >= n_capped
