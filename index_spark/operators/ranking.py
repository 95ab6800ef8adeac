"""Lexical relevance ranking (BM25) over the document corpus.

The retrieval side of a training-data pipeline: given query terms, rank
documents by Okapi BM25 (Robertson & Walker 1994; the Robertson–Spärck
Jones idf with the standard +1 smoothing). tf·idf keyword extraction
(:mod:`.quality`) scores a doc's own terms; BM25 scores docs *against a
query*, with document-length normalization — the missing piece for
dedup-by-retrieval and decontamination-by-search workflows.

Determinism/scale contract (the repo's oracle discipline):

- per-term tf is ``size(filter(tokens, t == term))`` — an array filter on
  the already-tokenized row, NO explode and NO shuffle of tokens;
- corpus stats (N, Σdl, per-term df) are ONE tiny aggregate broadcast
  back via a literal cross join (a single row — Spark turns it into a
  BroadcastNestedLoopJoin over one row, constant cost);
- the score is a fixed-order sum over the query terms of IEEE-exact
  expressions whose inputs are integers (tf, dl, df, N), so the SQL twin
  lands on bit-identical doubles;
- top-k is TakeOrderedAndProject on (rounded score desc, id) — no global
  sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions import text as TX


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 for the given query ``terms``.

    Returns ``(id_col, score)`` with score rounded to 6 decimals and a
    deterministic id tie-break. Documents matching no term score 0 and
    are excluded.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    toks = TX.tokens(F.lower(F.col(text_col)))

    def _tf(term: str):
        # closure helper, NOT a defaulted 2-arg lambda: F.filter treats a
        # two-parameter lambda as (element, index)
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [_tf(term).alias(f"tf_{i}") for i, term in enumerate(terms)]
    per_doc = docs.select(F.col(id_col), F.size(toks).alias("dl"), *tf_cols)

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))

    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df_ = F.col(f"df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))
        term_score = idf * (
            (tf * F.lit(k1 + 1.0))
            / (tf + (F.lit(k1) * ((F.lit(1.0 - b)) + (F.lit(b) * (F.col("dl").cast("double") / avgdl)))))
        )
        score = term_score if score is None else score + term_score
    return (
        joined.select(F.col(id_col), F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sql_bm25_topk(
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """Exact DuckDB twin of :func:`bm25_topk` — identical expression tree
    (same parenthesization, same fixed term order), so the doubles match
    bit-for-bit before the final round."""
    terms = list(terms)
    if not terms:
        raise ValueError("sql_bm25_topk requires at least one query term")
    tf_defs = ", ".join(
        # double embedded single quotes: a term like "o'brien" must become
        # a valid SQL literal, not a parser error (the Spark twin takes the
        # term through F.lit and needs no escaping)
        "len(list_filter(toks, t -> t = '{0}')) AS tf_{1}".format(
            term.replace("'", "''"), i
        )
        for i, term in enumerate(terms)
    )
    df_defs = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        denom = (
            f"(CAST(tf_{i} AS DOUBLE) + ({k1!r} * ((1.0 - {b!r}) + "
            f"({b!r} * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))"
        )
        parts.append(f"({idf} * ((CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r}) / {denom}))")
    score = " + ".join(parts)
    return (
        f"WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks FROM {table}), "
        f"pd AS (SELECT doc_id, len(toks) AS dl, {tf_defs} FROM t), "
        f"st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, {df_defs} FROM pd), "
        f"sc AS (SELECT doc_id, round({score}, 6) AS score FROM pd, st) "
        f"SELECT doc_id, score FROM sc WHERE score > 0 "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )
