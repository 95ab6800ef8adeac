"""Substring-level duplicate-span detection (training-data dedup).

Document-level near-dedup (MinHash/SimHash, :mod:`.dedup`) misses the
common failure mode where *parts* of documents repeat across the corpus —
boilerplate headers, license blocks, templated paragraphs. The public
remedy (Lee et al. 2021, *Deduplicating Training Data Makes Language
Models Better*) finds token spans that occur more than once anywhere in
the corpus. The exact suffix-array construction there is a single-machine
algorithm; the Spark-native equivalent used by public pipelines is
fixed-length token k-gram spans + a corpus-wide frequency join, which
finds every duplicated substring of length ≥ k (any longer duplicate
contains a duplicated k-gram).

Plan shape (the 100 TB story): explode k-gram spans → hash each span to a
15-hex md5 prefix (60-bit int, r9) → two-level aggregate: ``groupBy(doc,
hash)`` then ``groupBy(hash)`` for corpus totals → join back → per-doc
rollup. Only (id, hash, count) triples ever enter a shuffle; span TEXT is
dropped at the map side, so shuffled bytes are ~12/span regardless of
span length. Both shuffles hash-partition with map-side partial
aggregation; no window, no sort, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from index_spark.functions import text as TX
from index_spark.functions.text import md5_prefix60


def span_hashes(df: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per token k-gram span occurrence: ``(id_col, h)`` with
    ``h`` the 60-bit md5-prefix hash of the span text (``md5_prefix60``,
    r9 — span identity is a corpus-wide join key, and the 28-bit MinHash
    prefix birthday-collides at corpus scale, marking unrelated spans
    duplicated; the SQL oracle replays the same 15-hex-char prefix). Documents shorter than ``k`` tokens contribute nothing."""
    return TX.spread_for_cpu(df).select(
        F.col(id_col),
        F.explode(TX.word_ngrams_all(F.col(text_col), k)).alias("__g"),
    ).select(id_col, md5_prefix60(F.col("__g")).alias("h"))


def duplicate_span_stats(
    df: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-span statistics.

    A span is *duplicated* when its hash occurs ≥ 2 times corpus-wide
    (across documents or repeated within one — both are verbatim
    repetition a dedup pass wants to know about, matching the
    "substring repeated anywhere" semantics of Lee et al. 2021 §3).

    Returns ``(id_col, n_spans, n_dup_spans, dup_frac)`` for every
    document with at least one span; ``dup_frac`` is the fraction of this
    document's span occurrences that are duplicated, rounded to 6
    decimals (an int/int division — deterministic across engines).
    """
    spans = span_hashes(df, k=k, id_col=id_col, text_col=text_col)
    per_doc = spans.groupBy(id_col, "h").agg(F.count(F.lit(1)).alias("c"))
    corpus = per_doc.groupBy("h").agg(F.sum("c").alias("tot"))
    return (
        per_doc.join(corpus, on="h")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_spans"),
            F.sum(F.when(F.col("tot") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "n_dup_spans"
            ),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            F.round(
                F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


def trim_duplicate_spans(
    df: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Remove corpus-duplicated spans from every document (the actual
    dedup step of Lee et al. 2021, not just the statistics): a token is
    dropped when it lies inside ANY k-gram whose hash occurs ≥ 2 times
    corpus-wide; the survivors re-join in order. Operates on lowercased
    whitespace tokens (the dedup pipeline's canonical form).

    Relational shape end-to-end — no per-doc quadratic work: positional
    k-grams join the (hash → duplicated) table on the hash giving the
    duplicated START positions; a token at position j is covered iff some
    duplicated gram starts within the last k positions, which one
    per-doc ``rangeBetween(-(k-1), 0)`` running-max window answers
    directly — no k-way explode of covered positions, no corpus-sized
    ``distinct``, no anti-join (all three were measured costs at sf0.1:
    the explode alone quintupled the shuffled rows). Shuffles carry
    (id, position) pairs and 60-bit hashes only; the text rides one
    final per-doc rebuild.

    Returns ``(id_col, clean_text, n_kept, n_removed)`` for every doc
    with ≥ 1 token."""
    src = TX.spread_for_cpu(df)
    toks = src.select(
        F.col(id_col),
        F.posexplode(TX.tokens(F.lower(F.col(text_col)))).alias("j", "tok"),
    )
    grams = src.select(
        F.col(id_col),
        F.posexplode(TX.word_ngrams_all(F.lower(F.col(text_col)), k)).alias(
            "i", "__g"
        ),
    ).select(id_col, "i", md5_prefix60(F.col("__g")).alias("h"))
    dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("tot"))
        .filter(F.col("tot") >= 2)
        .select("h")
    )
    # duplicated START positions per doc (at most one row per k-gram)
    starts = grams.join(dup, on="h").select(id_col, F.col("i").alias("j"), F.lit(1).alias("__s"))
    # token j is covered iff a duplicated gram starts in [j-k+1, j]:
    # a running max over the last k positions, one bounded per-doc window
    w_cov = (
        Window.partitionBy(id_col).orderBy("j").rangeBetween(-(k - 1), 0)
    )
    flagged = toks.join(starts, on=[id_col, "j"], how="left").select(
        id_col, "j", "tok", F.max("__s").over(w_cov).alias("__cov")
    )
    kept = flagged.filter(F.col("__cov").isNull())
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "tok"))), lambda s: s["tok"]
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # n_removed = n_tokens - n_kept: the per-doc token count rides the
    # all-docs aggregate, so no second corpus-wide join over the exploded
    # token table is needed (the SQL oracle derives it the same way)
    all_docs = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_tok"))
    return (
        all_docs.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("__n_tok") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
