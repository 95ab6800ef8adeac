"""Corpus-level statistical diagnostics for training-data curation.

Three standard signals a large-scale pipeline tracks per corpus snapshot,
complementing the per-document quality family (:mod:`.quality`):

- :func:`bigram_nll` — per-document mean NLL under the corpus's own
  add-k-smoothed bigram LM: the next step up the CCNet perplexity-proxy
  ladder from :func:`.quality.unigram_nll` (Wenzek et al. 2020 use a
  5-gram KenLM; the bigram form is its largest SQL-replayable prefix).
- :func:`zipf_fit` — OLS fit of ln(frequency) on ln(rank) over the top-N
  vocabulary: a healthy natural-language corpus shows slope ≈ −1
  (Zipf's law); a collapsed slope flags boilerplate/template floods, a
  too-steep one flags vocabulary collapse after over-aggressive dedup.
- :func:`js_divergence` — Jensen-Shannon divergence between two corpora's
  unigram distributions: the bounded, symmetric drift measure used to
  monitor mixture composition between snapshots or sources.
- :func:`vocab_growth` / :func:`heaps_fit` — vocabulary-growth curve over
  a geometric doc-id ladder and its Heaps'-law OLS fit (V ≈ k·N^β):
  whether the corpus tail still contributes new vocabulary or is
  template/near-duplicate mass.

Scale shapes (100 TB): every operator is explode → hash-agg → hash-join;
text shuffles once at the token explode, never again. Float determinism
follows the catalog's hash rules: per-document sums fold left-to-right
over SORTED contribution lists (bounded by document length);
the CORPUS-WIDE JSD sum — where a collect-and-fold would not scale —
instead rounds each per-term contribution to 12 decimals and sums
EXACT decimals (decimal(38,12) addition is integer arithmetic:
combine-order-independent on any engine, no single-task fold, no
vocabulary-sized array on one executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from index_spark.functions import text as TX


def _tok_col(text_col: str) -> "F.Column":
    """The module's single corpus-tokenization rule (lowercase whitespace
    tokens): every operator here shares one vocabulary definition, so a
    future normalization change lands in exactly one place."""
    return TX.tokens(F.lower(F.col(text_col)))


def bigram_nll(
    df: DataFrame, k: int = 1, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus bigram
    LM with add-``k`` (Laplace for k=1) smoothing:

        p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)

    with V = corpus distinct-token count and c(w1 ·) the count of bigrams
    starting with w1. ``k`` is an INTEGER so numerator and denominator
    stay exact BIGINT arithmetic — the per-bigram probability is one
    exact integer division, which replays bit-identically in SQL.

    Documents with fewer than 2 tokens have no bigrams and are ABSENT
    from the output (scoring them would divide by zero; callers wanting
    them use a left join against the input ids).

    Plan shape: the bigram explode is map-side (adjacent-token zip inside
    the tokens array — no self-join); (doc, w1, w2, tf) aggregates once,
    corpus bigram counts and context counts are two further hash aggs of
    that table, joined back by (w1, w2) hash join (bigram vocabulary is
    NOT broadcast — it grows with the corpus). The w1 context-count join
    is DELIBERATELY unhinted: the unigram vocabulary of a web-scale
    corpus (~1e8+ tokens) is past broadcast reach, so the scale plan is a
    hash join on w1; AQE upgrades it to broadcast exactly when the vocab
    fits the threshold. Per-doc Σ folds left-to-right over the sorted
    contribution list (bounded by doc length).

    Returns ``(id_col, n_bigrams, nll)``, nll in nats rounded to 6.
    """
    if k < 1:
        raise ValueError(f"add-k smoothing needs integer k >= 1, got {k}")
    # materialize the token array in its OWN projection before the
    # adjacent-pair zip: expressions inside array lambdas are not
    # common-subexpression-eliminated, so an element_at(tokens(text), i)
    # formulation re-ran the regexp tokenization PER ELEMENT ACCESS —
    # O(n²) regex work per document (measured: the explode stage alone
    # cost 32 s on a 400k-doc × 80-token corpus; with the materialized
    # column + two O(n) slices it is ~2 s). zip_with pairs t[i] with
    # t[i+1] in one pass over the materialized array.
    tokd = TX.materialize_tokens(
        TX.spread_for_cpu(df.select(F.col(id_col), F.col(text_col))),
        text_col,
        [id_col],
        tok_expr=_tok_col(text_col),  # the module's single tokenization rule
    )
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        tokd.select(F.col(id_col), F.explode(F.when(n >= 2, bigrams)).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    tf = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V from the SAME materialized-token frame as the bigrams (not a
    # fresh tokenization of df): the shared spread/scan subplan lets
    # AQE's runtime stage reuse serve both branches. (Static explain
    # shows the tokenize pipeline referenced by several branches with no
    # ReusedExchange node — at runtime AQE dedupes identical stages;
    # measured on a 400k-doc × 80-token corpus: 64 s with the old
    # per-element re-tokenization, 23 s with the materialized array, and
    # an explicitly persisted tf buys only 18 s — the 1.25× is not worth
    # an operator-held cache entry.)
    vocab_n = tokd.select(F.explode(t).alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    contrib = (
        tf.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            id_col,
            "tf",
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.col("c12") + F.lit(k)).cast("double")
                    / (F.col("c1") + F.lit(k) * F.col("v")).cast("double")
                )
            ).alias("c"),
        )
    )
    s = F.aggregate(
        F.sort_array(F.collect_list("c")), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("tf").alias("n_bigrams"), s.alias("__s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("__s") / F.col("n_bigrams").cast("double"), 6).alias("nll"),
        )
    )


def zipf_fit(
    df: DataFrame, top_n: int = 1000, text_col: str = "text"
) -> DataFrame:
    """OLS fit of ``ln(frequency)`` on ``ln(rank)`` over the ``top_n``
    most frequent tokens — the Zipf-law health check of a corpus
    (natural language: slope ≈ −1).

    The top-N selection is a distributed ``TakeOrderedAndProject`` (per-
    partition heaps, no vocabulary-sized sort); ranks are then assigned
    by a window over the ≤``top_n``-row result — a bounded single task by
    construction. The OLS sums fold left-to-right over the rank-sorted
    (x, y) list (≤ ``top_n`` elements), so the doubles are
    combine-order-deterministic and replay in SQL.

    Ties in frequency break by token ASC — rank assignment is
    deterministic on any engine.

    Returns one row: ``(n_terms, slope, intercept, r2)`` rounded to 6.
    """
    counts = (
        df.select(F.explode(_tok_col(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("t").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("t").asc())
    xy = top.select(
        F.row_number().over(w).alias("rank"), F.col("cnt")
    ).select(
        "rank",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    return _ols_loglog_fit(xy, order_col="rank", n_alias="n_terms")


def _ols_loglog_fit(xy: DataFrame, order_col: str, n_alias: str) -> DataFrame:
    """One-row OLS fit of ``y`` on ``x`` over a BOUNDED (x, y) frame
    (≤ a few thousand points by construction at every call site). The
    sums (Σx, Σy, Σxx, Σyy, Σxy) fold left-to-right over the
    ``order_col``-sorted struct list, so the doubles are
    combine-order-deterministic and replay in SQL via
    ``list_sum(list(expr ORDER BY order_col))``.

    Returns ``(n_alias, slope, intercept, r2)`` rounded to 6."""
    arr = F.sort_array(F.collect_list(F.struct(order_col, "x", "y")))
    folded = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["x"]).alias("sx"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["y"]).alias("sy"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["x"] * s["x"]).alias("sxx"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["y"] * s["y"]).alias("syy"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["x"] * s["y"]).alias("sxy"),
    )
    nD = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / nD
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / nD
    vary = F.col("syy") - F.col("sy") * F.col("sy") / nD
    slope = cov / varx
    intercept = (F.col("sy") - slope * F.col("sx")) / nD
    r2 = (cov * cov) / (varx * vary)
    return folded.select(
        F.col("n").alias(n_alias),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def _growth_thresholds(max_id: int, n_points: int) -> list:
    """Geometric doc-id thresholds (exact integer ceil-division, so the
    SQL twin reproduces them bit-for-bit): ceil(max_id / 2^i) for
    i = 0..n_points-1, deduplicated ascending, floored at 1."""
    ts = {max(1, (max_id + (1 << i) - 1) // (1 << i)) for i in range(n_points)}
    return sorted(ts)


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_points: int = 16,
) -> DataFrame:
    """Vocabulary-growth curve: for a geometric ladder of doc-id
    thresholds T, the total token count and distinct-term count of the
    corpus prefix ``id_col <= T`` — the raw material of a Heaps'-law
    check (V ≈ k·N^β) and the standard way to see whether a corpus keeps
    contributing NEW vocabulary as it grows (a flattening curve says the
    tail is near-duplicate or template mass).

    EXACT integer outputs (count + distinct-count per threshold) — the
    strongest oracle form. Scale shape: one (token → min doc id)
    aggregate and one per-doc token count; each row then explodes only
    the ≤``n_points`` LITERAL thresholds it satisfies (the same
    literal-array pattern as the quantile rank read — no range join, no
    per-threshold rescan, fan-out bounded by n_points). The doc-id
    maximum is ONE eager O(1)-row aggregate used to place the literal
    thresholds.

    Returns ascending ``(threshold, n_tokens, v_terms)``."""
    max_id = df.agg(F.max(F.col(id_col)).alias("m")).first()["m"]
    if max_id is None:
        raise ValueError("vocab_growth: input has no rows (or all-NULL ids)")
    ts = _growth_thresholds(int(max_id), n_points)
    tarr = F.array(*[F.lit(int(t)).cast("long") for t in ts])
    toks = _tok_col(text_col)
    per_tok = (
        df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.min("__id").alias("first_id"))
    )
    v_terms = (
        per_tok.select(
            F.explode(F.filter(tarr, lambda t: t >= F.col("first_id"))).alias(
                "threshold"
            )
        )
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("v_terms"))
    )
    n_tokens = (
        df.select(F.col(id_col).alias("__id"), F.size(toks).alias("__n"))
        .select(
            "__n",
            F.explode(F.filter(tarr, lambda t: t >= F.col("__id"))).alias("threshold"),
        )
        .groupBy("threshold")
        .agg(F.sum("__n").alias("n_tokens"))
    )
    return n_tokens.join(v_terms, "threshold").select(
        "threshold", "n_tokens", "v_terms"
    )


def heaps_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_points: int = 16,
) -> DataFrame:
    """Heaps'-law fit over the :func:`vocab_growth` curve: OLS of
    ``ln(v_terms)`` on ``ln(n_tokens)`` — slope β (natural corpora:
    ~0.4-0.6; β → 0 flags a vocabulary-exhausted / template-flooded
    corpus, β → 1 random noise), intercept ln k. The fold runs over
    ≤ ``n_points`` points sorted by threshold — bounded and
    SQL-replayable like :func:`zipf_fit`.

    Returns one row: ``(n_points, slope, intercept, r2)`` rounded to 6.
    """
    curve = vocab_growth(df, id_col=id_col, text_col=text_col, n_points=n_points)
    xy = curve.filter(F.col("n_tokens") > 0).select(
        F.col("threshold"),
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("v_terms").cast("double")).alias("y"),
    )
    return _ols_loglog_fit(xy, order_col="threshold", n_alias="n_points")


def js_divergence(
    a: DataFrame, b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between the unigram distributions
    of two corpora: ``JSD = ½·KL(P‖M) + ½·KL(Q‖M)``, ``M = (P+Q)/2``.
    Symmetric, bounded by ln 2, defined even where supports differ —
    the standard mixture-composition drift monitor between two corpus
    snapshots, sources, or epochs.

    Determinism at scale: the Σ runs over the UNION VOCABULARY, which at
    corpus scale cannot be collected into a single sorted fold — instead
    each term's contribution (a double) is quantized to an e-12 integer
    via ``floor(c·1e12 + 0.5)`` and summed as BIGINT: integer addition is
    combine-order-independent, and the quantizer itself is two correctly-
    rounded IEEE-754 ops plus floor — BIT-IDENTICAL on any engine given
    the same input double (unlike round(double, 12), which Spark computes
    in exact BigDecimal HALF_UP and DuckDB in floating point — a
    knife-edge tie could flip the 12th digit between engines).  The
    6-decimal output is likewise derived by integer arithmetic
    (``floor((Σ+5e5)/1e6)/1e6``), so no cross-engine double rounding
    remains anywhere in the plan.  Residual cross-engine risk is only the
    transcendental itself: ``ln`` may differ by an ulp between the JVM
    and libm, which the e-12 quantization absorbs except on its own
    boundary (same residual class as the repo's other float rules; the
    per-term quantization error stays invisible at 6 decimals for any
    vocabulary below ~1e6 distinct terms per output ulp).

    A side with zero tokens makes the distribution undefined — explicit
    ValueError (double division would silently yield NaN, which Spark
    orders above every number, firing drift alerts instead of erroring).

    Returns one row: ``(n_a, n_b, jsd)``, token totals and the rounded
    divergence."""
    ca = (
        a.select(F.explode(_tok_col(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    cb = (
        b.select(F.explode(_tok_col(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    # the totals are read EAGERLY for the empty-side guard, then injected
    # back as LITERALS: re-embedding the `tot` subplan (the previous
    # crossJoin form) would re-run both corpus-wide tokenize+aggregate
    # pipelines a second time at action time — the same
    # eager-read-becomes-literal pattern vocab_growth uses for max_id
    trow = (
        ca.agg(F.sum("na").alias("ta"))
        .crossJoin(cb.agg(F.sum("nb").alias("tb")))
        .first()
    )
    if trow["ta"] is None or trow["tb"] is None:
        raise ValueError("js_divergence: a side has no tokens")
    merged = ca.join(cb, "t", "full_outer").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.lit(int(trow["ta"])).cast("long").alias("ta"),
        F.lit(int(trow["tb"])).cast("long").alias("tb"),
    )
    pa = F.col("na").cast("double") / F.col("ta").cast("double")
    pb = F.col("nb").cast("double") / F.col("tb").cast("double")
    m = (pa + pb) / F.lit(2.0)
    term = (
        F.when(F.col("na") > 0, F.lit(0.5) * pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(F.col("nb") > 0, F.lit(0.5) * pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    # per-term JS contribution is ≥ 0 (log-sum inequality), so the
    # quantized BIGINT sum is ≥ 0 and floor((Σ+5e5)/1e6) is the plain
    # round-half-up of Σ at 6 decimals
    from index_spark.operators.stats import dequantize_6dp, quantize_e12

    return merged.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        quantize_e12(term).alias("__c"),
    ).groupBy("n_a", "n_b").agg(dequantize_6dp(F.sum("__c")).alias("jsd"))


def pmi_top_pairs(
    df: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` adjacent-word collocations by pointwise mutual
    information — the corpus-health view of its multiword units (strong
    natural collocations like proper names rank high; a template flood
    shows as a wall of near-identical boilerplate pairs):

        pmi(w1, w2) = ln( (c12/N2) / ((c1/N1)·(c2/N1)) )

    with c12 the corpus count of the adjacent pair, N2 total bigrams, c1/c2
    unigram counts, N1 total tokens. The ratio is assembled as ONE exact
    integer fraction — ``(c12·N1·N1) / (N2·c1·c2)`` in decimal(38,0)
    (HUGEINT in the oracle) — so the only doubles are the final division
    and ``ln``, identical-input IEEE ops on both engines. ``min_count``
    floors c12 (hapax pairs have wildly inflated PMI — the standard
    Church & Hanks 1990 guard).

    Plan shape: the same map-side adjacent-pair zip as
    :func:`bigram_nll` (materialized token array, no self-join, no
    re-tokenize-per-element), one (w1, w2) hash agg, one (token) hash
    agg, two unhinted hash joins on the unigram vocabulary (broadcast
    only when AQE measures it small — a web-scale vocabulary is not),
    and a TakeOrderedAndProject top-k on (rounded pmi desc, w1, w2) —
    no global sort.

    Returns ``(w1, w2, c12 BIGINT, pmi DOUBLE)`` rounded to 6."""
    if min_count < 1:
        raise ValueError("pmi_top_pairs: min_count must be >= 1")
    tokd = TX.materialize_tokens(
        TX.spread_for_cpu(df.select(F.col(id_col), F.col(text_col))),
        text_col,
        [id_col],
        tok_expr=_tok_col(text_col),
    )
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # the n >= 2 guard mirrors bigram_nll: slice(t, 1, n-1) on a
    # zero-token doc evaluates with length -1 and CRASHES the job
    # (review finding, round 8 — invisible on the fixtures, which have
    # no token-less docs); explode(NULL) drops the doc instead
    pair_rows = tokd.select(
        F.explode(F.when(n >= 2, bigrams)).alias("p")
    ).select("p.w1", "p.w2")
    c12 = pair_rows.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = tokd.select(F.explode(t).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    # totals read EAGERLY and re-injected as literals (the js_divergence
    # pattern): re-embedding the aggregate subplans would re-run both
    # corpus-wide pipelines at action time
    tot = uni.agg(F.sum("c").alias("n1")).crossJoin(
        c12.agg(F.sum("c12").alias("n2"))
    ).first()
    if not tot["n2"]:
        raise ValueError("pmi_top_pairs: corpus has no bigrams")
    n1, n2 = int(tot["n1"]), int(tot["n2"])
    # loud overflow guard (same rule as grouped_linear_trend): every
    # product below is bounded by n2·n1² (c12 <= n2, c1·c2 <= n1²), so
    # one check keeps decimal(38,0) exact — past it, ANSI mode would
    # kill the job and non-ANSI would silently NULL pairs out of the
    # top-k while the HUGEINT oracle raises
    if n2 * n1 * n1 >= 10**38:
        raise ValueError(
            f"pmi_top_pairs: corpus too large for exact decimal(38,0) PMI "
            f"(n_tokens={n1}, n_bigrams={n2}); shard the corpus or "
            "pre-aggregate counts and rescale"
        )
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
    )
    num = (
        F.col("c12").cast("decimal(38,0)")
        * F.lit(n1).cast("decimal(38,0)")
        * F.lit(n1).cast("decimal(38,0)")
    )
    den = (
        F.lit(n2).cast("decimal(38,0)")
        * F.col("c1").cast("decimal(38,0)")
        * F.col("c2").cast("decimal(38,0)")
    )
    pmi = F.round(F.log(num.cast("double") / den.cast("double")), 6)
    return (
        scored.select("w1", "w2", F.col("c12").cast("long").alias("c12"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
    )


def bigram_cond_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus conditional entropy H(W₂|W₁) of the next word given the
    previous one, in nats — the sequence-level redundancy diagnostic that
    the unigram entropy cannot see: a template/boilerplate flood keeps
    unigram entropy high while H(W₂|W₁) collapses (every word determines
    its successor), so the PAIR (unigram H, conditional H) separates
    "diverse vocabulary" from "diverse text".

        H(W₂|W₁) = Σ_{w₁,w₂} (c₁₂/N₂) · ln(c₁/c₁₂)

    with c₁₂ the corpus bigram count, c₁ = Σ_{w₂} c₁₂ the context count,
    N₂ total bigrams. Every per-pair term is ≥ 0 and built from exact
    BIGINT counts (the only doubles are one division by the eager-literal
    N₂ and one ln of an exact integer ratio); terms are quantized with
    the :func:`js_divergence` e-12 quantizer and summed as BIGINT — the
    vocabulary-sized Σ stays combine-order-independent with no
    single-task fold.

    Plan shape: the same map-side adjacent-pair zip as
    :func:`bigram_nll` (materialized token array), one (w₁, w₂) hash
    agg, one w₁ re-aggregation, an unhinted hash join on w₁ (the context
    vocabulary grows with the corpus — AQE broadcasts when it fits), one
    one-row output. Raises if the corpus has no bigrams.

    Returns one row ``(n_bigrams BIGINT, v_contexts BIGINT,
    cond_entropy DOUBLE)`` rounded to 6.
    """
    tokd = TX.materialize_tokens(
        TX.spread_for_cpu(df.select(F.col(text_col))),
        text_col,
        [],
        tok_expr=_tok_col(text_col),
    )
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    c12 = (
        tokd.select(F.explode(F.when(n >= 2, bigrams)).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    trow = c1.agg(F.sum("c1").alias("n2"), F.count(F.lit(1)).alias("v1")).first()
    if not trow["n2"]:
        raise ValueError("bigram_cond_entropy: the corpus has no bigrams")
    n2, v1 = int(trow["n2"]), int(trow["v1"])
    term = (
        F.col("c12").cast("double") / F.lit(float(n2))
    ) * F.log(F.col("c1").cast("double") / F.col("c12").cast("double"))
    from index_spark.operators.stats import dequantize_6dp, quantize_e12

    q = c12.join(c1, "w1").select(quantize_e12(term).alias("__q"))
    return q.agg(dequantize_6dp(F.sum("__q")).alias("__h")).select(
        F.lit(n2).cast("long").alias("n_bigrams"),
        F.lit(v1).cast("long").alias("v_contexts"),
        F.col("__h").alias("cond_entropy"),
    )
