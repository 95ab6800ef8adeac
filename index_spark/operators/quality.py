"""Repetition-based document quality signals (training-data filtering).

The repetition family of quality filters — "drop documents dominated by a
few repeated n-grams" — is standard in public LM data pipelines (Rae et
al. 2021, *Scaling Language Models: Methods, Analysis & Insights from
Training Gopher*, appendix A1.1; also C4/MassiveText-style cleanup). This
module computes the per-document signals as plain columnar aggregations:

- ``top_frac``: share of the document's k-grams taken by its single most
  frequent k-gram;
- ``dup_frac``: share of k-gram OCCURRENCES belonging to k-grams that
  occur more than once.

Plan shape (the 100 TB story): explode k-grams → two-level aggregate —
``groupBy(doc, gram).count`` then ``groupBy(doc)`` — both shuffles hash on
``(doc_id[, gram])`` with map-side partial aggregation, and only (id,
gram, count) triples ever move; the document text itself is never
shuffled. No UDFs, no per-doc quadratic array scans (an
``F.transform``-over-distinct-grams formulation would be O(len²) per doc
— fine at 60 tokens, pathological at 10k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from index_spark.functions import text as TX


def repetition_stats(
    df: DataFrame, k: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document k-gram repetition signals.

    Returns one row per document that has at least one k-gram:
    ``(id_col, n_grams, top_frac, dup_frac)`` — fractions as doubles.
    Documents shorter than ``k`` tokens contribute no k-grams and are
    absent (callers treat absence as "passes": nothing to repeat).
    """
    grams = TX.spread_for_cpu(df).select(
        F.col(id_col),
        F.explode(TX.word_ngrams_all(F.col(text_col), k)).alias("g"),
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c")
        ).alias("dup_frac"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the gibberish/boilerplate detector complementing the repetition
    fractions: near-zero entropy means one token dominates; an unusually
    high value for the length means random noise. −Σ p·ln p computed from
    the same (doc, term, tf) aggregate tf·idf uses; the left-to-right SQL
    replay is exact after round(·, 6)."""
    terms = df.select(
        F.col(id_col), F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("t")
    )
    tf = terms.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    # H = ln N − (Σ tf·ln tf)/N. The float Σ is computed as a LEFT-TO-RIGHT
    # fold over the SORTED tf list — a plain F.sum over doubles is
    # combine-order-dependent and would break the catalog's "no floating
    # accumulation" hash-determinism rule. Integer sums (N) stay exact.
    tf_sorted = F.sort_array(F.collect_list("tf"))
    s = F.aggregate(
        tf_sorted,
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * F.log(v.cast("double")),
    )
    return (
        tf.groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), s.alias("__s"))
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("__s") / F.col("n_tokens").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, top_k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-k terms by tf·idf (idf = ln(N/df), the classic
    unsmoothed form) — the keyword/topic signal a curation pipeline uses
    for corpus composition reports.

    Plan shape: explode tokens → (doc, term, tf) aggregate → document
    frequency aggregate on the term → broadcast-joined corpus size → one
    window top-k per document. Shuffles hash on (doc, term) then (term);
    the text never re-shuffles after the explode, and df/N are tiny
    relative to the term-frequency table at any scale."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col), F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("t")
    )
    tf = terms.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, on="t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("t").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= top_k)
        .select(id_col, F.col("__rk").alias("rank"), "t", F.round("tfidf", 6).alias("tfidf"))
    )


def repetition_filter(
    df: DataFrame,
    k: int = 2,
    max_top_frac: float = 0.18,
    max_dup_frac: float = 0.60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Annotate documents with their repetition signals and a ``passes``
    flag (defaults echo Gopher's published 2-gram thresholds). Documents
    with no k-grams pass vacuously. One broadcast-sized join back onto the
    corpus is avoided: the stats carry the id, so callers semi-join on it
    when they want the surviving text."""
    stats = repetition_stats(df, k=k, id_col=id_col, text_col=text_col)
    # `passes` is derived from the ROUNDED fractions so the emitted row is
    # self-consistent: a consumer re-checking the thresholds against the
    # emitted columns must reach the same verdict
    top_r = F.round("top_frac", 6)
    dup_r = F.round("dup_frac", 6)
    return stats.select(
        id_col,
        "n_grams",
        top_r.alias("top_frac"),
        dup_r.alias("dup_frac"),
        ((top_r <= max_top_frac) & (dup_r <= max_dup_frac)).alias("passes"),
    )


def unigram_nll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram language model — the cheap perplexity proxy public pipelines
    use to rank documents by "typicality" before an expensive LM scorer
    (CCNet-style; Wenzek et al. 2020 train a KenLM, the unigram variant
    is its one-shuffle degenerate case). Low NLL = stopword-ish; high =
    rare-token-heavy (non-language or misfiled content).

    Model: p(w) = n_w / N over the whole corpus (no smoothing — every
    scored token is in-vocabulary by construction). Score = −Σ tf·ln
    p(w) / n_tokens, in nats.

    Plan shape: one (doc, term, tf) aggregate, one (term) aggregate for
    the vocab, a broadcast join of vocab + corpus size back onto the tf
    table, then a per-doc rollup — term strings shuffle once, text never
    does. The float Σ is a left-to-right fold over the SORTED per-term
    contribution list (catalog hash-determinism rule; a plain double sum
    is combine-order-dependent).
    """
    terms = df.select(
        F.col(id_col), F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("t")
    )
    tf = terms.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("t").agg(F.sum("tf").alias("n_w"))
    total = vocab.agg(F.sum("n_w").alias("n_total"))
    contrib = (
        tf.join(F.broadcast(vocab), on="t")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "tf",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_w").cast("double") / F.col("n_total").cast("double"))
            ).alias("c"),
        )
    )
    s = F.aggregate(
        F.sort_array(F.collect_list("c")), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), s.alias("__s"))
        .select(
            id_col,
            "n_tokens",
            F.round(-F.col("__s") / F.col("n_tokens").cast("double"), 6).alias("nll"),
        )
    )
