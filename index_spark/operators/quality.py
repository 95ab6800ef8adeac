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

Plan shape (the 100 TB story, r9): these statistics are PER-DOCUMENT —
no corpus-wide interaction — so they are computed doc-locally with ZERO
shuffle: sort the doc's gram array and fold run lengths in one O(g log g)
pass (a run of equal grams == that gram's count). The r1–r8 formulation
exploded every gram into a corpus-of-grams-sized ``groupBy(doc, gram)``
exchange plus a second ``groupBy(doc)`` exchange — measured 174 s of the
626 s 10M-doc pipeline probe for values each doc already held. No UDFs,
no per-doc quadratic array scans (an ``F.transform``-over-distinct-grams
formulation would be O(len²) per doc — fine at 60 tokens, pathological
at 10k; the sorted-run fold is O(len log len)).
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

    Scope the input BEFORE calling (``repetition_stats(df.filter(...))``,
    not ``repetition_stats(df).filter(...)``): the plan carries a
    ``pushdown_barrier`` on the materialized gram array — required to
    stop predicate pushdown from re-inlining the sort+hash+tokenize
    chain into per-element lambda captures (270.7 s vs 3.4 s at 500 ×
    1000-token docs, r10) — and the barrier also stops predicates on
    pass-through columns (e.g. a post-hoc ``doc_id`` filter) from
    reaching the parquet scan.
    """
    # The statistic is PER-DOC only — no corpus-wide interaction — so
    # nothing needs to shuffle (r9: the previous explode → groupBy(doc,
    # gram) → groupBy(doc) pushed two corpus-of-grams-sized exchanges
    # through the cluster for a value each doc can compute locally).
    # Sort the doc's gram array and fold run lengths in one pass:
    # run-of-equal-grams length == that gram's count. The gram array is
    # materialized in its own projection so the fold lambda captures a
    # cheap attribute, never the tokenize/k-gram pipeline (the r7
    # lambda-CSE trap). Incremental state: top = longest run so far;
    # dup = occurrences inside runs of length ≥ 2 (+2 when a run reaches
    # 2, +1 for each further repeat).
    g = TX.spread_for_cpu(df).select(
        F.col(id_col), TX.word_ngrams_all(F.col(text_col), k).alias("__g")
    ).filter(F.size("__g") > 0)
    # gram IDENTITY is all the fold needs, and only COUNTS surface in
    # the result — so sort cheap xxhash64 longs, not 20+-char gram
    # strings (within-session A/B: string sort measured ~2× SLOWER than
    # the old explode plan on 1000-token docs; long sort beats it).
    # Within-doc 64-bit collisions (~g²/2^65 per doc) are the same
    # exact-in-practice call the 60-bit identity keys make.
    # pushdown_barrier: a caller's .filter(top_frac/dup_frac/passes)
    # would otherwise be predicate-pushed through this projection,
    # re-inlining the sort+hash+tokenize chain into per-element lambda
    # captures (r10: 270.7 s vs 3.4 s on 500 × 1000-token docs)
    sg = g.select(
        F.col(id_col),
        TX.pushdown_barrier(
            F.sort_array(F.transform(F.col("__g"), lambda x: F.xxhash64(x)))
        ).alias("__sg"),
    )
    # run lengths via boundary positions + one zip_with — measured ~5×
    # faster than a per-element struct-fold (struct construction per
    # element dominates interpreted HOF cost); top = longest run,
    # dup occurrences = n − (runs of length exactly 1)
    n = F.size("__sg")
    # Guard is STRUCTURAL (when/otherwise), not `(i==1) | ...`: Or gives no
    # evaluation-order guarantee inside a HOF lambda, so element_at(arr, 0)
    # could throw INVALID_ARRAY_INDEX if Catalyst ever evaluated both arms.
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(F.col("__sg"), i) != F.element_at(F.col("__sg"), i - 1)
        ),
    )
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1))
    tfs = F.zip_with(starts, ends, lambda s, e: (e - s).cast("long"))
    singles = F.size(F.filter(tfs, lambda t: t == 1))
    return sg.select(
        F.col(id_col),
        n.cast("long").alias("n_grams"),
        (F.array_max(tfs).cast("double") / n).alias("top_frac"),
        ((n - singles).cast("double") / n).alias("dup_frac"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the gibberish/boilerplate detector complementing the repetition
    fractions: near-zero entropy means one token dominates; an unusually
    high value for the length means random noise.

    Per-doc only, so computed doc-locally with ZERO shuffle (r9 — the
    previous explode → groupBy(doc, t) → groupBy(doc) moved two
    corpus-of-tokens exchanges for a value each doc already held): sort
    the token array, find run boundaries (a run of equal tokens == that
    token's tf), take run-length diffs via one ``zip_with``, and fold
    −Σ p·ln p. The fold still runs LEFT-TO-RIGHT over the NUMERICALLY
    SORTED tf list — the identical float-accumulation order as the r8
    formulation and the SQL oracle, so the rounded value is
    hash-identical (a plain F.sum over doubles is combine-order-
    dependent and would break the "no floating accumulation" rule).

    Scope the input BEFORE calling: like :func:`repetition_stats`, the
    plan carries a ``pushdown_barrier`` on the materialized token-hash
    array (an entropy-threshold filter above would otherwise re-inline
    the chain per element), so post-hoc predicates — including on
    pass-through columns like ``doc_id`` — do not reach the scan."""
    toks = TX.materialize_tokens(
        TX.spread_for_cpu(df), text_col, [id_col]
    ).filter(F.size("__toks") > 0)
    # token IDENTITY only (counts surface, not tokens): sort xxhash64
    # longs, not strings — same rationale as repetition_stats
    # pushdown_barrier: same hazard as repetition_stats — an entropy
    # threshold filter above would re-inline the chain per element
    st = toks.select(
        F.col(id_col),
        TX.pushdown_barrier(
            F.sort_array(F.transform(F.col("__toks"), lambda x: F.xxhash64(x)))
        ).alias("__st"),
    )
    n = F.size("__st")
    # 1-based positions where a new run starts; element_at is O(1).
    # Structural when/otherwise guard — same rationale as repetition_stats
    # (no evaluation-order guarantee for Or inside a HOF lambda).
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(F.col("__st"), i) != F.element_at(F.col("__st"), i - 1)
        ),
    )
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1))
    tfs = F.sort_array(F.zip_with(starts, ends, lambda s, e: (e - s).cast("long")))
    ssum = F.aggregate(
        tfs,
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * F.log(v.cast("double")),
    )
    return st.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(
            F.log(n.cast("double")) - ssum / n.cast("double"), 6
        ).alias("entropy"),
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
    when they want the surviving text.

    ``.filter("passes")`` on the result is safe and cheap — the
    underlying ``pushdown_barrier`` (see :func:`repetition_stats`) is
    exactly what keeps that filter from re-deriving the gram chain per
    element. The flip side: scope the CORPUS before calling; a post-hoc
    predicate on pass-through columns (``doc_id`` ranges etc.) stops at
    the barrier instead of pruning the parquet scan."""
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


def repetition_annotate(
    df: DataFrame,
    k: int = 2,
    max_top_frac: float = 0.18,
    max_dup_frac: float = 0.60,
    text_col: str = "text",
    out_col: str = "rep_passes",
) -> DataFrame:
    """Annotate the corpus IN PLACE with the repetition-gate verdict —
    the zero-join twin of :func:`repetition_filter` for pipeline use.

    :func:`repetition_filter` returns a stats FRAME keyed by doc id, so a
    pipeline keeping the surviving text pays a corpus×corpus semi-join —
    two corpus-sized exchanges for a PER-DOCUMENT predicate (measured in
    the 10M-doc composed-pipeline probe as the whole cost of the quality
    stage once the stats themselves went shuffle-free in r9). Since the
    statistic is doc-local, the verdict can ride the corpus row itself:
    this returns ``df`` with one added boolean ``out_col`` (True =
    passes; docs with no k-grams pass vacuously), computed in the same
    sorted-run fold with ZERO shuffle and ZERO join — callers just
    ``.filter(out_col)``.

    The verdict matches :func:`repetition_filter`'s ``passes`` bit
    exactly: thresholds compare the ROUNDED fractions (round 6), so a
    consumer re-deriving the flag from the stats frame agrees with the
    inline gate on every document.

    Projections are staged so each lambda captures a materialized
    attribute, never the tokenize/k-gram pipeline (the r7 lambda-CSE
    trap: expressions inside array lambdas are re-evaluated per element).
    As with :func:`repetition_stats`, scope the corpus BEFORE calling:
    the internal ``pushdown_barrier`` (what makes ``.filter(out_col)``
    cheap) also stops pass-through-column predicates from reaching the
    parquet scan.
    """
    cols = df.columns
    if out_col in cols:
        raise ValueError(f"repetition_annotate: column {out_col!r} already exists")
    # spread_for_cpu is a no-op on data already as wide as the
    # parallelism (any real multi-row-group table); it only widens the
    # single-row-group sf fixtures so the CPU-bound gram fold isn't
    # serialized on one core
    g = TX.spread_for_cpu(df).withColumn(
        "__g", TX.word_ngrams_all(F.col(text_col), k)
    )
    # pushdown_barrier: the whole point of this operator is
    # `.filter(out_col)` — without the barrier that filter is
    # predicate-pushed below these projections, re-inlining the
    # sort+hash+tokenize chain into per-element lambda captures
    sg = g.withColumn(
        "__sg",
        TX.pushdown_barrier(
            F.when(
                F.size("__g") > 0,
                F.sort_array(F.transform(F.col("__g"), lambda x: F.xxhash64(x))),
            )
        ),
    )
    n = F.size("__sg")
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(F.col("__sg"), i) != F.element_at(F.col("__sg"), i - 1)
        ),
    )
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1))
    tfs = F.zip_with(starts, ends, lambda s, e: (e - s).cast("long"))
    # second barrier: without it the caller's filter substitutes the
    # verdict and re-derives the WHOLE tfs chain (starts appears ~4×
    # inside one tfs evaluation, and the verdict references tfs 3×) —
    # with it the pushed filter reads the materialized run-length array
    # and pays only the cheap attribute-level folds
    st = sg.withColumn("__tfs", TX.pushdown_barrier(F.when(n > 0, tfs)))
    nn = F.size("__sg")
    singles = F.size(F.filter(F.col("__tfs"), lambda t: t == 1))
    top_r = F.round(F.array_max("__tfs").cast("double") / nn, 6)
    dup_r = F.round((nn - singles).cast("double") / nn, 6)
    verdict = F.when(F.col("__tfs").isNull(), F.lit(True)).otherwise(
        (top_r <= max_top_frac) & (dup_r <= max_dup_frac)
    )
    return st.withColumn(out_col, verdict).select(*cols, out_col)


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
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

    Broadcast bound — UNLIKE the vocabulary broadcasts in setjoin/graph,
    this vocab is NOT naturally small: it is the corpus's full unigram
    vocabulary, and at open-web scale that distribution is
    hapax-dominated (Heaps' law: 10⁸–10⁹ distinct tokens at 100 TB is
    plausible), where a FORCED broadcast OOMs the executors rather than
    degrading. At curated-corpus vocab sizes (≲10⁷ terms) the broadcast
    is right — it keeps the corpus-sized tf table from shuffling by
    term. Past that, pass ``broadcast_vocab=False``: the tf table and
    vocab then equi-join on the term under AQE, and the tf table is
    already hash-partitioned by (doc, term) from its own aggregate so
    the extra exchange is term-keyed tf rows (8-byte counts + the term),
    never the document text. Same answer either way — the flag only
    moves the join strategy.
    """
    terms = df.select(
        F.col(id_col), F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("t")
    )
    tf = terms.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("t").agg(F.sum("tf").alias("n_w"))
    total = vocab.agg(F.sum("n_w").alias("n_total"))
    # see docstring: hint is deliberate at bounded vocab sizes, and
    # deliberately droppable (broadcast_vocab=False) at open-web scale
    # where the hapax-dominated vocab would OOM a forced broadcast
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    contrib = (
        tf.join(vocab_side, on="t")
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
