"""Exact set-similarity join via prefix filtering (PPJoin-family).

The LSH path (:mod:`.dedup`) is probabilistic: banding can miss a pair
above the threshold. This operator is the EXACT counterpart used when
recall must be 1.0 — the prefix-filtering principle of Chaudhuri et al.
2006 ("A Primitive Operator for Similarity Joins") and Xiao et al. 2008
(PPJoin): order every document's distinct tokens by one GLOBAL rarity
order; then two sets with Jaccard ≥ t must share at least one token in
each other's first ``p = n - ceil(t*n) + 1`` tokens. Candidates therefore
come from an equi-join on PREFIX tokens only — rare tokens, tiny posting
lists — never an all-pairs product, and the exact verify runs on the
candidate pairs alone.

Scale shape: one groupBy for token document-frequencies, a DISTRIBUTED
dense rank over the vocabulary (deterministic uniform buckets on
(df, xxhash64(tok) mod 1024): within-bucket row_number plus cumulative
bucket offsets — no vocabulary-sized single-task window, no sampled
boundaries, no spelling-dependent skew), one window-free sort inside ``array_sort`` per doc, explode
of ~(1-t)·n prefix tokens per doc, an equi-join on the (rare) prefix
token RANK, then array_intersect verification on the pruned pairs. The
shuffled payload is (token_rank, id) integer pairs — token strings never
leave the vocabulary table; full rank arrays re-attach by id for
candidates only — the same candidates-then-verify discipline as the LSH
pipeline. Every step is deterministic; the oracle twin verifies the
OUTPUT brute-force (all-pairs intersect over the same sample), so any
prefix-filter recall miss hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from index_spark.functions.text import tokens


def _token_sets(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) distinct edges over lowercase whitespace tokens."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    ).distinct()


def jaccard_join_exact(
    docs: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ ``threshold`` —
    EXACT (recall 1.0), no LSH randomness. Returns
    ``(id_a, id_b, jaccard)`` with jaccard rounded to 6 decimals.

    Prefix principle: under one global token order, a pair with
    ``|X ∩ Y| / |X ∪ Y| ≥ t`` must share a token within the first
    ``|X| - ceil(t·|X|) + 1`` tokens of X (and likewise Y) — otherwise
    too few tokens remain to reach the required overlap. The global order
    is (document frequency ASC, hash bucket ASC, token ASC): rare-first,
    so prefix posting lists are the SHORTEST ones, and deterministic.
    The within-df tie-break is internal — ANY fixed total order sorted by
    df first yields recall 1.0 and the identical output pair set, which
    the brute-force oracle twin verifies independently of rank order.
    """
    t, ceil_tn, per_doc, n_part = _exact_join_body(docs, text_col, id_col, threshold)
    return _jaccard_candidates(per_doc, ceil_tn, n_part, t)


def _ranked_doc_sets(docs: DataFrame, text_col: str, id_col: str):
    """Shared candidate-generation substrate for the exact set joins:
    per-document SORTED dense-integer token-rank arrays under the global
    (df, hash-bucket, token) rarity order, plus the pinned shuffle width.
    Returns ``(per_doc, n_part)`` with ``per_doc = (id, rks, n)``."""
    edges = _token_sets(docs, text_col, id_col)
    # global rarity order as DENSE INTEGER ranks, derived WITHOUT a
    # vocabulary-sized single-task window: bucket the vocabulary by the
    # DETERMINISTIC key (df, pmod(xxhash64(tok), B)) and define the global
    # token order as (df, bucket, tok) — df-ascending primarily, which is
    # all the prefix-filter principle needs (ANY fixed total order that
    # sorts rarer df first yields recall 1.0 and the identical output
    # pair set; the within-df tie-break is internal). Global rank =
    # cumulative bucket offset + within-bucket row_number. Deterministic
    # buckets (xxhash64 is a pure function of the token — no sampled
    # range boundaries, no spark_partition_id) mean the offset table and
    # the within-bucket ranks CANNOT disagree across independent
    # re-evaluations of the plan — a sampled RangePartitioner could pick
    # different boundaries per evaluation if the exchange is not reused.
    # Hash buckets are UNIFORM BY CONSTRUCTION: the earlier 2-char-prefix
    # key skewed adversarially (a corpus whose hapax tokens are mostly
    # URLs funnels the 'ht' slice of the vocabulary through one
    # row_number task); with B=1024 the largest per-df bucket is
    # ~|df-class|/1024 regardless of token spelling. Integer ranks
    # (not the earlier (df, tok) struct values) keep the per-doc arrays,
    # the candidate equi-join key and the verify intersections free of
    # token STRINGS — at corpus scale the strings dominate the shuffled
    # bytes and make array_intersect compare structs instead of longs.
    dfs = edges.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    try:
        n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. "auto" under externally-managed AQE
        n_part = docs.sparkSession.sparkContext.defaultParallelism
    n_rank_buckets = 1024
    bkt = dfs.select(
        "tok", "df", F.pmod(F.xxhash64("tok"), F.lit(n_rank_buckets)).alias("__b")
    )
    w_off = Window.orderBy("df", "__b").rowsBetween(Window.unboundedPreceding, -1)
    # size bound for the offsets table: one row per OCCUPIED (df, bucket)
    # pair ≤ min(vocabulary, distinct-df × 1024). Document frequency
    # is zipfian, so distinct df values grow ~√(corpus tokens) — the
    # cumulative window below runs one task over GROUPED rows (three int
    # columns), ~1M rows even for web-scale vocabularies (~100 ms), and
    # the broadcast stays tens of MB.
    offsets = (
        bkt.groupBy("df", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "df", "__b",
            F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    w_in = Window.partitionBy("df", "__b").orderBy("tok")
    rank_tbl = bkt.join(F.broadcast(offsets), ["df", "__b"]).select(
        "tok", (F.col("__off") + F.row_number().over(w_in)).alias("rk")
    )
    # the rank table is vocabulary-sized; broadcast keeps the corpus-sized
    # edges relation from shuffling its token strings by tok (the whole
    # point of integer ranks). A vocabulary too large to broadcast should
    # drop the hint and let AQE pick the join — corpus >> vocabulary makes
    # broadcast the right default.
    ranked = edges.join(F.broadcast(rank_tbl), "tok").select("id", "rk")
    # per-doc sorted rank vector + size + prefix length
    per_doc = ranked.groupBy("id").agg(
        F.array_sort(F.collect_list("rk")).alias("rks"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_doc, n_part


def _exact_join_body(docs, text_col, id_col, threshold):
    """Common prologue for the exact set joins: threshold validation,
    the exact decimal ceil(t·n) (the double product overshoots for
    thresholds whose binary repr exceeds the decimal — 0.07·100 =
    7.000000000000001 → ceil 8, silently dropping qualifying pairs;
    DECIMAL multiplication uses t's shortest decimal repr, so the
    ceiling is exact), and the shared ranked-doc-set substrate."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    t_dec = F.lit(t).cast("decimal(18,12)")

    def ceil_tn(n):
        return F.ceil(t_dec * n).cast("long")

    per_doc, n_part = _ranked_doc_sets(docs, text_col, id_col)
    return t, ceil_tn, per_doc, n_part


def _jaccard_candidates(per_doc, ceil_tn, n_part, t):
    prefix_len = (F.col("n") - ceil_tn(F.col("n")) + 1).cast("int")
    pre = per_doc.select(
        "id", "n", F.explode(F.slice("rks", 1, prefix_len)).alias("rk")
    )
    a, b = pre.alias("a"), pre.alias("b")
    # candidates: shared prefix token + id order + the length filter
    # (|Y| >= t*|X| is necessary for J >= t when |X| <= |Y|)
    cand = (
        a.join(
            b,
            (F.col("a.rk") == F.col("b.rk"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") >= ceil_tn(F.col("a.n")))
            & (F.col("a.n") >= ceil_tn(F.col("b.n"))),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verification is CPU-bound (one array_intersect per candidate pair),
    # but AQE's coalescing is BYTES-based: a few MB of (id_a, id_b) pairs
    # gets squeezed into one partition and the whole verify runs on one
    # core (measured 75 s single-task vs ~3 s spread on a 1.2M-candidate
    # corpus). Pin the parallelism with an explicit-width repartition,
    # which AQE does not coalesce.
    cand = cand.repartition(n_part, "id_a", "id_b")
    sets = per_doc.select("id", "rks")
    joined = (
        cand.join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("rks", "ra"), "id_a")
        .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("rks", "rb"), "id_b")
    )
    inter = F.size(F.array_intersect("ra", "rb"))
    union = F.size("ra") + F.size("rb") - inter
    # threshold on the UNROUNDED ratio (rounding first would admit pairs
    # whose true Jaccard sits within half an ulp-of-6-decimals below t);
    # round only the displayed value
    ratio = inter.cast("double") / union
    return (
        joined.filter(ratio >= t)
        .select("id_a", "id_b", F.round(ratio, 6).alias("jaccard"))
    )


def jaccard_join_bruteforce(
    docs: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """O(n²) reference implementation for recall testing ONLY (tests at
    fixture scale assert jaccard_join_exact ≡ this on every input)."""
    s = docs.select(
        F.col(id_col).alias("id"),
        F.array_sort(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("s"),
    )
    a, b = s.alias("a"), s.alias("b")
    inter = F.size(F.array_intersect("a.s", "b.s"))
    union = F.size("a.s") + F.size("b.s") - inter
    ratio = inter.cast("double") / union
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(ratio >= F.lit(float(threshold)))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(ratio, 6).alias("jaccard"),
        )
    )


def containment_join_exact(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All ORDERED pairs (id_a ≠ id_b) with token-set CONTAINMENT
    ``|T(a) ∩ T(b)| / |T(a)| ≥ threshold`` — EXACT, recall 1.0. The
    asymmetric near-dup check symmetric Jaccard misses: a short document
    quoted or embedded inside a much longer one has tiny Jaccard but
    containment ≈ 1. Returns ``(id_a, id_b, containment)`` rounded to 6:
    ``id_a`` is the (near-)contained side.

    Prefix principle, containment form: a qualifying pair needs overlap
    ``o = ceil(t·|A|)``, so A must contribute a match from its first
    ``|A| − o + 1`` tokens under the global rarity order — the SAME
    probe-prefix bound as the Jaccard join. The CONTAINING side B,
    however, has no symmetric prefix: any of A's probe tokens may sit
    anywhere in B, so B posts its FULL rank list. Candidates =
    A-prefix ⋈ B-postings on the integer token rank, pruned by the
    necessary size bound ``|B| ≥ ceil(t·|A|)``; the exact verify then
    intersects the two rank arrays.

    Scale shape: the probed posting lists are only those of tokens
    appearing in some A-prefix — the rarest-first order keeps them the
    SHORT lists; B's full postings are the corpus token table the rank
    substrate already materializes. Degradation bound: on a corpus whose
    documents all share one tiny vocabulary, the candidate set
    approaches all-pairs — but so does the TRUE OUTPUT of any exact
    containment join there (quadratically many qualifying pairs), so the
    blow-up is inherent to the answer, not the plan. Same verify-width
    pinning as the Jaccard join (AQE would bytes-coalesce the CPU-bound
    intersect stage onto one core).
    """
    t, ceil_tn, per_doc, n_part = _exact_join_body(docs, text_col, id_col, threshold)
    # Self-corpus = cross-corpus with both sides the same frame (the
    # shared body's id_a != id_b guard already excludes self-pairs);
    # keeping ONE copy of the candidate+verify plan prevents drift.
    return _containment_candidates_verify(per_doc, per_doc, ceil_tn, n_part, t)


def containment_join_exact_ab(
    a_docs: DataFrame,
    b_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CROSS-CORPUS exact containment: pairs ``(id_a from a_docs, id_b
    from b_docs)`` with ``|T(a) ∩ T(b)| / |T(a)| ≥ threshold`` — the
    exact decontamination check ("is this held-out document's content
    inside some training document?"), complementing the probabilistic
    n-gram `contamination_scan`. Ids must be unique ACROSS both frames
    (same contract as a union); a doc present in both sides never pairs
    with itself.

    Same machinery as :func:`containment_join_exact` with the rarity
    ranks computed over the UNION vocabulary (any consistent rarity
    order is valid for the bound) — but candidates explode only A-side
    probe prefixes against only B-side postings, skipping the A×A and
    B×B work a self-join-then-filter would pay."""
    union = a_docs.select(F.col(id_col), F.col(text_col)).unionByName(
        b_docs.select(F.col(id_col), F.col(text_col))
    )
    t, ceil_tn, per_doc, n_part = _exact_join_body(union, text_col, id_col, threshold)
    per_a = per_doc.join(
        a_docs.select(F.col(id_col).alias("id")).distinct(), "id", "left_semi"
    )
    per_b = per_doc.join(
        b_docs.select(F.col(id_col).alias("id")).distinct(), "id", "left_semi"
    )
    return _containment_candidates_verify(per_a, per_b, ceil_tn, n_part, t)


def _containment_candidates_verify(per_a, per_b, ceil_tn, n_part, t):
    """A-prefix ⋈ B-full-postings candidates + exact rank-array verify
    (shared by the self- and cross-corpus containment joins)."""
    prefix_len = (F.col("n") - ceil_tn(F.col("n")) + 1).cast("int")
    pre = per_a.select(
        "id", "n", F.explode(F.slice("rks", 1, prefix_len)).alias("rk")
    )
    allb = per_b.select("id", "n", F.explode("rks").alias("rk"))
    a, b = pre.alias("a"), allb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.rk") == F.col("b.rk"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.n") >= ceil_tn(F.col("a.n"))),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    cand = cand.repartition(n_part, "id_a", "id_b")
    sa = per_a.select("id", "rks")
    sb = per_b.select("id", "rks")
    joined = (
        cand.join(sa.withColumnRenamed("id", "id_a").withColumnRenamed("rks", "ra"), "id_a")
        .join(sb.withColumnRenamed("id", "id_b").withColumnRenamed("rks", "rb"), "id_b")
    )
    inter = F.size(F.array_intersect("ra", "rb"))
    # threshold on the UNROUNDED ratio; round only the displayed value
    ratio = inter.cast("double") / F.size("ra")
    return (
        joined.filter(ratio >= t)
        .select("id_a", "id_b", F.round(ratio, 6).alias("containment"))
    )


def containment_join_bruteforce(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """O(n²) reference implementation for recall testing ONLY."""
    s = docs.select(
        F.col(id_col).alias("id"),
        F.array_sort(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("s"),
    )
    a, b = s.alias("a"), s.alias("b")
    inter = F.size(F.array_intersect("a.s", "b.s"))
    ratio = inter.cast("double") / F.size("a.s")
    return (
        a.join(b, F.col("a.id") != F.col("b.id"))
        .filter(ratio >= F.lit(float(threshold)))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(ratio, 6).alias("containment"),
        )
    )


def edit_distance_join(
    df: DataFrame,
    k: int = 1,
    text_col: str = "name",
    id_col: str = "id",
    q: int = 2,
    short_class_cap: int | None = 10_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with Levenshtein distance ≤ ``k`` — exact,
    via rare-prefix q-gram filtering (Ed-Join, Xiao et al. 2008; count
    bound from Gravano et al. 2001):

    - one edit destroys at most ``q`` gram occurrences, so two strings
      within distance k share all but ``k·q`` of the shorter bag — by the
      prefix-filter lemma they must then share an occurrence among the
      ``k·q + 1`` RAREST gram occurrences of EACH side (rarity = global
      gram document frequency, one total order on (df, gram, occurrence));
    - candidates therefore come from an equi-join of those tiny rare
      prefixes (NOT all grams: on uniform corpora — fixed-format names,
      URLs — every pair shares most common grams and an all-gram join is
      quadratic), plus the ``| |a|-|b| | <= k`` length filter;
    - verify: ``F.levenshtein`` on the candidates only.

    Strings short enough that the bound collapses (``n <= q - 1 + k·q`` —
    a within-distance pair may share NO gram occurrence) are compared
    directly against every length-compatible string. That fallback is a
    broadcast nested loop — the RIGHT plan only while the short class is
    genuinely tiny, so its size is an ENFORCED contract, not an
    assumption: the operator counts the class eagerly (one cheap
    pruned-scan job) and raises past ``short_class_cap`` with the
    escape recipes (a degenerate corpus of two-char strings must not
    silently go quadratic). Lowering ``q`` moves the cutoff down — at
    ``q=1`` the class is strings of length ≤ k — or pass
    ``short_class_cap=None``/a larger cap to accept the quadratic
    verify knowingly. Returns (id_a, id_b, dist)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    s = df.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(text_col)).alias("t"),
        F.length(F.lower(F.col(text_col))).alias("n"),
    ).filter(F.col("t").isNotNull())
    # below this length the prefix filter cannot guarantee a shared gram
    t_short = q - 1 + k * q
    long_s = s.filter(F.col("n") > t_short)
    grams = long_s.select(
        "id",
        "n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (q - 1)),
                lambda i: F.col("t").substr(i, F.lit(q)),
            )
        ).alias("pos", "g"),
    )
    # global rarity ORDER per gram (vocabulary-sized, broadcast) and an
    # occurrence index per (string, gram) — duplicate occurrences are
    # distinct bag elements under the prefix-filter lemma. The (gdf, g)
    # struct IS the rank here: the lemma needs a total order, not dense
    # integers, so no global single-task row_number window over the gram
    # vocabulary. (jaccard_join_exact used this struct trick too until
    # its candidate volume made struct payloads the bottleneck — it now
    # carries dense integer ranks; here the q-grams are short fixed-width
    # strings and candidate counts are edit-distance-bounded, so the
    # struct payload stays cheap and the simpler form wins.)
    rarity = grams.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    occ_w = Window.partitionBy("id", "g").orderBy("pos")
    occd = (
        grams.join(F.broadcast(rarity), "g")
        .withColumn("occ", F.row_number().over(occ_w).cast("long"))
        .select("id", "n", F.struct(F.col("gdf"), F.col("g")).alias("grk"), "occ")
    )
    # per string: the k*q+1 rarest occurrences under the (grk, occ) order
    plen = k * q + 1
    pre = (
        occd.groupBy("id", "n")
        .agg(F.array_sort(F.collect_list(F.struct("grk", "occ"))).alias("all_o"))
        .select(
            "id", "n", F.explode(F.slice("all_o", 1, plen)).alias("o")
        )
        .select("id", "n", F.col("o.grk").alias("grk"), F.col("o.occ").alias("occ"))
    )
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.grk") == F.col("b.grk"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.n") - F.col("b.n")) <= k),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    texts = s.select("id", "t")
    verified = (
        cand.join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "ta"), "id_a")
        .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "tb"), "id_b")
        .select("id_a", "id_b", F.levenshtein("ta", "tb").alias("dist"))
        .filter(F.col("dist") <= k)
    )
    # short class x everything within the length filter (covers
    # short-short and short-long pairs the gram path cannot claim)
    sa = s.filter(F.col("n") <= t_short).select(
        F.col("id").alias("id_s"), F.col("t").alias("ts"), F.col("n").alias("ns")
    )
    if short_class_cap is not None:
        n_short = sa.count()
        if n_short > short_class_cap:
            raise ValueError(
                f"edit_distance_join: {n_short} strings have length <= "
                f"{t_short} (= q-1+k*q, where the q-gram prefix filter "
                f"cannot prune) — every length-compatible pair would be "
                f"verified directly, quadratic in the short class. Lower q "
                f"(q=1 moves the cutoff to length <= {k}), pre-filter the "
                f"corpus, or raise short_class_cap "
                f"(currently {short_class_cap}) to accept the cost."
            )
    extra = (
        sa.join(
            s,
            (F.col("id_s") != F.col("id")) & (F.abs(F.col("ns") - F.col("n")) <= k),
        )
        .select(
            F.least("id_s", "id").alias("id_a"),
            F.greatest("id_s", "id").alias("id_b"),
            F.levenshtein("ts", "t").alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .distinct()
    )
    return verified.unionByName(extra).distinct()
