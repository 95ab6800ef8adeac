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
    (bounded payload; counts stay exact).

    Skew shape: a plain ``row_number() OVER (PARTITION BY term)`` would
    funnel a stop-word's every (term, doc) row through ONE task's sort —
    the wall :mod:`.quota` documents. The exact df/tf counts come from a
    plain partial-aggregated groupBy (no skew exposure), and the bounded
    posting payload from the salted two-phase top-N
    (:func:`~index_spark.operators.quota.cap_per_group`), so no task ever
    sorts more than ``rows/salts`` of the hottest term."""
    from index_spark.operators.quota import cap_per_group

    td = term_doc_freqs(docs, text_col, id_col)
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
    )
    head = cap_per_group(
        td.select("term", "doc_id"),
        ["term"],
        max_postings,
        [F.col("doc_id").asc()],
        id_col="doc_id",
    )
    lists = head.groupBy("term").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings")
    )
    return stats.join(lists, on="term")


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
