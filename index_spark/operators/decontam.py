"""Benchmark decontamination: n-gram collision scan.

Public LM training pipelines remove (or at least flag) training documents
sharing long word n-grams with evaluation benchmarks — the 13-gram rule of
GPT-2/GPT-3 and The Pile (Brown et al. 2020 appendix C; Gao et al. 2020).
The engine-side shape is a probe-then-verify inverted-index join (r10):

1. shingle the (small) benchmark side into distinct word k-grams; each
   broadcast row carries the raw gram STRING (``__bs``, for the exact
   verify), its cheap JVM ``xxhash64`` (the probe key), and its 60-bit
   md5 prefix (``md5_prefix60`` — the shared compact-key convention
   used only for the ``n_hits`` DISTINCT count; the 28-bit MinHash
   prefix birthday-collides at corpus scale: the round-9 pipeline probe
   measured ~22 spurious contamination flags at just 200k docs × 21
   bench docs, growing as corpus-grams × bench-grams / 2^28 — ~65k
   false flags at 10M docs);
2. shingle the corpus the same way but hash ONLY with ``xxhash64`` —
   the corpus never pays an md5 (r10: md5 was 36% of the 2M-doc hash
   stage, 25.0 → 21.6 s median within-session A/B);
3. equi-join on the xxhash64 — with the benchmark side broadcast this
   is a map-side hash probe: the corpus is scanned ONCE and nothing
   about the corpus is shuffled — then CONFIRM each candidate by exact
   gram-string equality, strictly tighter than any hash-equality join.

Broadcast envelope: the payload is gram strings + two 8-byte hashes per
distinct benchmark gram — ~(k·avg_word + 16) bytes/gram, i.e. tens of
MB for thousands of benchmark docs at k=5..13 — comfortably within
broadcast reach at 100 TB corpus scale, because it scales with the
BENCHMARK, not the corpus. If the bench side ever outgrew that,
dropping the hint degrades to a shuffle join whose payload now includes
the gram strings (heavier than the pre-r10 8-byte-hash shuffle — the
price of the exact verify; at that point hash-only join plus a second
verify pass against a re-shingled bench side is the better rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from index_spark.functions import text as TX
from index_spark.functions.text import md5_prefix60


def _shingle_grams(
    df: DataFrame, k: int, id_col: str, text_col: str, alias: str = "s"
) -> DataFrame:
    """(id, gram): one row per DISTINCT word-k-gram of the normalized
    text — THE shared shingling contract for every decontamination path
    (bench side, corpus side, cross-source overlap); a normalization or
    short-doc-handling change lands here exactly once, so the join sides
    can never silently desynchronize (r11, per r10 advice).

    Documents with fewer than ``k`` tokens contribute NO shingles: the
    contract is "shares a long word n-gram" — ``word_ngrams_all`` already
    yields the empty array for short docs (no degenerate whole-text or
    empty-string shingle), and ``array_distinct`` of it produces the same
    shingle set as ``word_shingles`` in ONE tokenization pass instead of
    tokenizing once for a length filter and again for the shingles
    (``\\S+`` extraction makes lower vs normalize_text token-identical)."""
    return TX.spread_for_cpu(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(TX.word_ngrams_all(F.col(text_col), k))).alias(
            alias
        ),
    )


def _shingle_hashes(
    df: DataFrame, k: int, id_col: str, text_col: str, keep_gram: bool = False
) -> DataFrame:
    """(id, h): :func:`_shingle_grams` hashed md5-prefix → 60-bit int
    (``md5_prefix60``, r9 — was the 28-bit MinHash prefix, which
    birthday-collided into spurious contamination flags at corpus scale;
    see module docstring)."""
    sh = _shingle_grams(df, k, id_col, text_col)
    if keep_gram:
        return sh.select(id_col, "s", md5_prefix60(F.col("s")).alias("h"))
    return sh.select(id_col, md5_prefix60(F.col("s")).alias("h"))


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus documents colliding with the benchmark on ≥1 word
    k-gram. Returns ``(doc_id, n_hits, n_bench_docs)`` — distinct
    colliding shingle hashes and distinct benchmark documents hit —
    sorted client-side by the caller. Documents with zero collisions are
    absent (the common case; callers anti-join to get the clean set).

    Corpus-side cost (r10): the corpus NEVER pays an md5. The old plan
    md5-hashed every corpus gram to probe the broadcast; since the probe
    only needs a superset-then-verify, the corpus side now computes the
    cheap JVM ``xxhash64`` per gram, probes the (tiny) benchmark index
    on it, and candidate pairs are confirmed by exact GRAM STRING
    equality — strictly tighter than the old 60-bit-hash-equality join
    (a cross-string md5_prefix60 collision, p ≈ 2^-60, counted as a hit
    before and is rejected now; the SQL oracle keeps the hash-join
    formulation — same accepted-risk class as the 60-bit identity keys).
    ``n_hits`` counts distinct md5 hashes computed on the BENCH side
    only (hit grams are string-equal, so bench-side md5 == corpus-side
    md5). 10M-doc probe: decontam stage 165.8 → see BASELINE.md §(c)."""
    doc_g = _shingle_grams(docs, k, id_col, text_col, alias="__s")
    doc_sh = doc_g.select(id_col, "__s", F.xxhash64("__s").alias("__xx"))
    bench_sh = (
        _shingle_hashes(bench, k, bench_id_col, text_col, keep_gram=True)
        .select(
            F.col(bench_id_col).alias("__bench_id"),
            F.col("s").alias("__bs"),
            F.xxhash64("s").alias("__xx"),
            "h",
        )
    )
    hits = doc_sh.join(F.broadcast(bench_sh), on="__xx", how="inner").filter(
        F.col("__s") == F.col("__bs")
    )
    return hits.groupBy(id_col).agg(
        F.countDistinct("h").alias("n_hits"),
        F.countDistinct("__bench_id").alias("n_bench_docs"),
    )


def source_ngram_overlap(
    df: DataFrame, k: int = 5, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Cross-source k-gram overlap matrix: for every source pair, how many
    DISTINCT word k-grams they share — the inter-source contamination /
    syndication heat map (a benchmark leak shows up as one source pair
    lighting up; boilerplate floods as a whole hot row). Complements
    :func:`ngram_contamination`, which scans the corpus against a known
    benchmark; this one needs no reference set.

    Hashes are 60-bit md5 prefixes (the KMV convention, not the 28-bit
    MinHash one): overlap COUNTS would be inflated by birthday collisions
    at 2^28 once the corpus holds billions of grams, while 60 bits keep
    the count exact in practice and the shuffle payload at 8 bytes.

    Plan shape: explode distinct-per-doc grams → DISTINCT (source, hash)
    — gram-cardinality rows, the only big shuffle — then a self
    equi-join on the hash (both sides the same exchange, reused) whose
    per-hash fan-out is bounded by the SOURCE count, and one pair
    aggregate. Returns ``(src_a, src_b, shared_grams)`` for src_a <
    src_b, pairs sharing nothing omitted."""

    g = _shingle_grams(
        df.select(F.col(source_col).alias("__src"), F.col(text_col)),
        k,
        "__src",
        text_col,
        alias="__g",
    )
    h = g.select("__src", md5_prefix60(F.col("__g")).alias("__h")).distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__h") == F.col("b.__h")) & (F.col("a.__src") < F.col("b.__src")),
        )
        .groupBy(F.col("a.__src").alias("src_a"), F.col("b.__src").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
