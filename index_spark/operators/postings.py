"""Inverted-index construction (term → posting list) over the documents
table — the retrieval-side structure a dedup/decontamination pipeline
builds once and probes many times (BM25 already consumes the df/tf
statistics; this materializes the index itself).

Plan shape: lowercase-whitespace tokenize (JVM ``regexp_extract_all``,
codegen'd — same tokenizer as ``functions/text.py``), explode, ONE shuffle
on the term for the groupBy. The posting payload kept per term is bounded
(``max_postings`` smallest doc_ids via ``slice(sort_array(...))``), so a
stop-word's posting row stays small even when its docs number 10⁹ — the
full list for such terms is useless anyway (every retrieval system
truncates or drops them). df/tf counts are exact regardless of truncation.

Reference analog: none (the reference indexes opaque keys, not text);
SURVEY §2.9 extension machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions.text import tokens


def term_doc_freqs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (term, doc): term frequency within the doc. The
    exploded edge list every downstream postings/BM25/tf-idf consumer
    aggregates from."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 10,
) -> DataFrame:
    """Posting lists: per term, document frequency ``df``, total term
    count ``tf_total``, and the first ``max_postings`` doc_ids ascending
    (bounded payload; counts stay exact)."""
    from pyspark.sql import Window

    td = term_doc_freqs(docs, text_col, id_col)
    # the posting payload must be bounded BEFORE aggregation: a bare
    # collect_list would buffer a stop-word's 10⁹ doc_ids in one task.
    # The rank filter inside the conditional collect keeps the aggregation
    # buffer at max_postings entries; df/tf stay exact over all rows.
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = td.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.sort_array(
            F.collect_list(F.when(F.col("__rn") <= max_postings, F.col("doc_id")))
        ).alias("postings"),
    )


def conjunctive_query(
    postings_src: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """AND-retrieval straight from documents: doc_ids containing EVERY
    query term. Filters the exploded term-doc edges to the |terms|-sized
    term set FIRST (predicate pushdown to the scan), so only matching
    edges shuffle; a doc qualifies when its distinct matched-term count
    equals |terms|."""
    # dedupe the query: ['a', 'a'] must mean 'a', not an unsatisfiable
    # distinct-count-of-2 requirement
    t = sorted({x.lower() for x in terms})
    td = term_doc_freqs(postings_src, text_col, id_col)
    return (
        td.filter(F.col("term").isin(t))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_terms"))
        .filter(F.col("n_terms") == len(t))
        .select("doc_id")
    )
