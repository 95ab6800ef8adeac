"""DSIR importance-weight operator vs a brute-force Python model that
replays the full pipeline (tokenize, bigram, md5-prefix bucket, add-1
smoothing, sorted-fold sum) — the same math the DuckDB oracle twin runs."""

import hashlib
import math
import random

import pytest

from index_spark.operators.selection import dsir_log_weights, dsir_select_top

B = 64  # small bucket space so collisions are exercised


def bucket(bg: str) -> int:
    return int(hashlib.md5(bg.encode()).hexdigest()[:15], 16) % B


def py_dsir(docs, target_source, n_buckets=B):
    # docs: list of (doc_id, source, text)
    ct, cr = {}, {}
    per_doc = {}
    for did, src, text in docs:
        toks = text.lower().split()
        tgt = src == target_source
        for a, b in zip(toks, toks[1:]):
            h = bucket(f"{a} {b}")
            (ct if tgt else cr)[h] = (ct if tgt else cr).get(h, 0) + 1
            if not tgt:
                per_doc.setdefault(did, {})
                per_doc[did][h] = per_doc[did].get(h, 0) + 1
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    out = {}
    for did, counts in per_doc.items():
        contribs = []
        for h, c in counts.items():
            lam = math.log(
                (float(ct.get(h, 0) + 1) * float(r_tot + n_buckets))
                / (float(cr.get(h, 0) + 1) * float(t_tot + n_buckets))
            )
            contribs.append(float(c) * lam)
        acc = 0.0
        for v in sorted(contribs):
            acc += v
        out[did] = (sum(counts.values()), round(acc, 6))
    return out


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
         "iota", "kappa", "the", "of", "and", "quick", "brown", "fox"]
TGT_WORDS = ["neural", "network", "training", "gradient", "descent", "loss",
             "the", "of", "and"]


def make_docs():
    rng = random.Random(84)
    docs = []
    for i in range(30):
        docs.append((i, "tgt", " ".join(rng.choice(TGT_WORDS) for _ in range(40))))
    for i in range(30, 110):
        # raw pool: mostly generic, a few target-like plants
        pool = TGT_WORDS if i % 17 == 0 else WORDS
        docs.append((i, f"raw{i % 3}", " ".join(rng.choice(pool) for _ in range(40))))
    docs.append((999, "raw0", "single"))  # <2 tokens: absent from output
    return docs


def test_dsir_log_weights_vs_python(spark):
    docs = make_docs()
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_log_weights(df, "tgt", n_buckets=B).collect()
    }
    exp = py_dsir(docs, "tgt")
    assert set(got) == set(exp)  # no target docs, no tokenless docs
    assert 999 not in got
    for did in exp:
        assert got[did][0] == exp[did][0]
        assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)
    # the target-like plants outrank the generic pool
    plants = [d for d in range(30, 110) if d % 17 == 0]
    generic = [d for d in range(30, 110) if d % 17 != 0]
    assert min(got[d][1] for d in plants) > max(got[d][1] for d in generic)


def test_dsir_select_top_deterministic(spark):
    docs = make_docs()
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    top = dsir_select_top(df, "tgt", 5, n_buckets=B).collect()
    exp = py_dsir(docs, "tgt")
    want = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:5]
    assert [r["doc_id"] for r in top] == [k for k, _ in want]


def test_dsir_validation(spark):
    df = spark.createDataFrame(
        [(1, "tgt", "a b c"), (2, "raw", "x")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="raw side has no bigrams"):
        dsir_log_weights(df, "tgt", n_buckets=B)
    df2 = spark.createDataFrame(
        [(1, "tgt", "a"), (2, "raw", "x y")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="target side has no bigrams"):
        dsir_log_weights(df2, "tgt", n_buckets=B)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_log_weights(df, "tgt", n_buckets=1)
    with pytest.raises(ValueError, match="m must be"):
        dsir_select_top(df, "tgt", 0)
