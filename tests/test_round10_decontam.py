"""Round-10: ngram_contamination's corpus side sheds its md5.

The 10M-doc composed-pipeline probe showed decontam as the largest
remaining stage; its corpus-side cost was one md5 per corpus gram purely
to probe the broadcast benchmark index. The probe only needs a
superset-then-verify: cheap ``xxhash64`` probe, exact gram-string
confirm, md5 computed on the (tiny) bench side only."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Row

from index_spark.operators.decontam import ngram_contamination


def _tokens(text: str) -> list[str]:
    import re

    return re.findall(r"\S+", text.lower())


def _kgrams(text: str, k: int) -> set[str]:
    t = _tokens(text)
    return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def _expected(docs, bench, k):
    bench_grams = {}
    for bid, text in bench:
        for g in _kgrams(text, k):
            bench_grams.setdefault(g, set()).add(bid)
    out = {}
    for did, text in docs:
        shared = _kgrams(text, k) & set(bench_grams)
        if shared:
            out[did] = (len(shared), len({b for g in shared for b in bench_grams[g]}))
    return out


def test_contamination_matches_python_model_random(spark):
    """Random corpus with planted bench overlaps: engine == pure-Python
    model on (n_hits, n_bench_docs) for every flagged doc, and clean docs
    are absent."""
    rng = random.Random(271828)
    vocab = [f"tok{j}" for j in range(40)]
    bench = [(i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(6)]
    docs = []
    for i in range(120):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if i % 5 == 0 and bench:
            # plant a verbatim bench 5-gram at a random position
            src = _tokens(bench[i % len(bench)][1])
            pos = rng.randint(0, len(src) - 5)
            ins = rng.randint(0, len(words))
            words[ins:ins] = src[pos : pos + 5]
        docs.append((i, " ".join(words)))
    exp = _expected(docs, bench, k=5)
    docs_df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    bench_df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in bench])
    got = {
        r["doc_id"]: (r["n_hits"], r["n_bench_docs"])
        for r in ngram_contamination(docs_df, bench_df, k=5).collect()
    }
    assert got == exp


def test_contamination_corpus_side_pays_no_md5(spark):
    """The streamed (corpus) side probes on xxhash64; md5 appears only in
    the broadcast (bench) subtree of the plan."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta {i}") for i in range(30)]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta epsilon zeta 7")]
    )
    plan = (
        ngram_contamination(docs, bench, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "xxhash64" in plan
    # every md5 mention must sit below the BroadcastExchange (bench side)
    pre_broadcast = plan.split("BroadcastExchange")[0]
    assert "md5" not in pre_broadcast, pre_broadcast


def test_shingle_grams_contract(spark):
    """Pin the shared shingling contract (r11: `_shingle_grams` is THE
    one definition every decontam path builds on — bench side, corpus
    side, cross-source overlap). A change to normalization or short-doc
    handling must be deliberate: it silently shifts contamination and
    overlap results everywhere at once.

    Contract: (1) docs with fewer than k tokens contribute NO shingles
    (no whole-text or empty-string degenerate); (2) exactly-k-token docs
    contribute exactly one; (3) within-doc duplicates collapse
    (distinct); (4) tokenization is lowercase \\S+ — case and run-length
    whitespace do not distinguish grams."""
    from index_spark.operators.decontam import _shingle_grams

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b"),                    # k-1 tokens: none
            Row(doc_id=2, text="a b c"),                  # exactly k: one
            Row(doc_id=3, text="a b c a b c a b c"),      # dup grams collapse
            Row(doc_id=4, text="A   b\tC"),               # case/ws normalize
            Row(doc_id=5, text=""),                       # empty: none
        ]
    )
    rows = _shingle_grams(docs, 3, "doc_id", "text").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.s)
    assert 1 not in by_doc and 5 not in by_doc
    assert by_doc[2] == ["a b c"]
    assert sorted(by_doc[3]) == ["a b c", "b c a", "c a b"]
    assert by_doc[4] == ["a b c"]
