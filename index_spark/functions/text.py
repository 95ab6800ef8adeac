"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path functions are pure `pyspark.sql.functions` compositions —
JVM-side, whole-stage-codegen'd, no Python in the loop. Each has an exact
ANSI-SQL twin used by the DuckDB oracle (see ``__spark_entry__.py``), which
pins the semantics: tokenization is ``regexp_extract_all(text, '\\S+')`` in
both engines (split-based tokenizers disagree about boundary empties across
engines, extract-based ones cannot).

SimHash is the one Pandas-UDF (Arrow-vectorized) function here: 64 per-bit
majority counters do not express well as column ops, and a numpy
implementation processes a whole Arrow batch per call.
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small multilingual stopword markers (public knowledge). Used for both
# quality scoring and the language-ID heuristic.
STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "los", "las", "es", "una", "por", "para"],
    "it": ["il", "che", "di", "non", "per", "una", "sono"],
    "pt": ["o", "que", "de", "em", "para", "uma", "com"],
    "nl": ["de", "het", "een", "van", "niet", "met", "ik"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens via regexp extraction (never yields empties)."""
    return F.regexp_extract_all(col, F.lit(r"\S+"), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    kept = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return kept / F.greatest(F.length(col), F.lit(1))


def upper_ratio(col: Column) -> Column:
    kept = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    return kept / F.greatest(F.length(col), F.lit(1))


def digit_ratio(col: Column) -> Column:
    kept = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return kept / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, stopwords: Sequence[str] = tuple(STOPWORDS_EN)) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = tokens(F.lower(col))
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation/digit
    noise, sane mean token length, some stopwords (prose-likeness).
    Weights are public-folklore heuristics (C4/Gopher-style rules)."""
    len_ok = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    digit_pen = F.lit(1.0) - F.least(digit_ratio(col) * 4, F.lit(1.0))
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 12), F.lit(1.0)).otherwise(F.lit(0.4))
    sw_ok = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return (len_ok + punct_pen + digit_pen + mtl_ok + sw_ok) / 5


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-stopword hit count per language over lowercased tokens."""
    toks = tokens(F.lower(col))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        m = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(m, t)))
    return out


def lang_id(col: Column) -> Column:
    """Argmax language by marker hits ('und' if nothing matched).
    CJK scripts have no space-separated stopwords — a character-class check
    routes them to 'zh' first. Deterministic tie-break: on equal scores the
    lexicographically GREATEST language name wins (array_max over
    (score, lang) structs — the SQL oracle's reverse-order CASE encodes the
    same rule, so the engines agree)."""
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    best = F.array_max(pairs)
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", "")) > 0
    return (
        F.when(cjk, F.lit("zh"))
        .when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
    )


# GPT-2-flavor pretokenizer (Radford et al. 2019 pattern, simplified:
# contractions | letter runs | digit runs | punctuation runs). \p{L}/\p{N}
# classes behave identically in Java regex (Spark) and RE2 (DuckDB) —
# verified on the fixtures — so the oracle replays it exactly.
BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pretokenization (the unit a BPE vocab would merge over) —
    the serious token-count estimate for training-data budgeting, vs the
    whitespace :func:`tokens`."""
    return F.regexp_extract_all(col, F.lit(BPE_PAT), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


ROLL_B = 1_000_003  # polynomial base
ROLL_M = 4_294_967_311  # prime > 2^32; acc·B + h < 2^53 — no int64 overflow


def md5_prefix28(col: Column) -> Column:
    """The corpus-standard 28-bit string hash: first 7 hex chars of md5,
    parsed as an integer. ONE definition for every operator (MinHash
    permutation input, rolling fingerprint, weighted-sampling uniform
    draw; decontamination moved to the 60-bit ``md5_prefix60`` in r9 —
    28 bits birthday-collide on corpus-scale join keys) — its SQL twin is
    ``('0x' || substr(md5(x), 1, 7))::BIGINT``; drifting any copy would
    silently break that engine↔oracle parity for just that operator."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


# 15 hex chars < 2^60: exact as BIGINT in both engines, and the BIGINT →
# DOUBLE conversion is the same IEEE round-to-nearest on both sides.
HEX60_CHARS = 15


def md5_prefix60(col: Column) -> Column:
    """Deterministic 60-bit BIGINT hash from any column — the wide
    sibling of :func:`md5_prefix28`, kept in the same module so the
    repo has ONE hashing home (r9 review finding). For consumers that
    need a near-collision-free compact key (corpus-wide identity join
    keys, overlap counts) where the 28-bit prefix would
    birthday-collide; one definition so the SQL twins'
    ``('0x'||substr(md5(x),1,15))::BIGINT`` stay in lockstep."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, HEX60_CHARS), 16, 10)
        .cast("long")
    )


def rolling_fingerprint(col: Column) -> Column:
    """Rabin-Karp-style rolling polynomial fingerprint over BPE-ish tokens:
    h = fold((acc·B + md5_28bit(token)) mod M). Order-sensitive (unlike a
    bag-of-tokens hash) and incrementally extendable — the classic
    content-defined fingerprint family. One md5 per token; the fold is a
    single ``aggregate``, and DuckDB's ``list_reduce`` replays it exactly
    (fold-from-zero and reduce-from-first coincide: (0·B + h1) mod M = h1)."""
    return F.aggregate(
        bpe_tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_B) + md5_prefix28(t)) % F.lit(ROLL_M),
    )


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text."""
    return F.md5(normalize_text(col))


def _kgram_chain(toks: Column, k: int) -> Column:
    """Sliding word k-grams as a chain of ``zip_with`` over ``k``
    top-level slices of the token array — NEVER a lambda that captures
    the tokenization expression: expressions inside array lambdas are not
    common-subexpression-eliminated, so the previous
    ``transform(sequence(...), i -> slice(tokens(text), i, k))`` form
    re-ran the regexp tokenization PER GRAM — O(n²) regex work per
    document (measured on 20k docs × 1000 tokens: 94.2 s vs 1.4 s for
    this materialized-column formulation, identical gram multisets).
    Here the tokenization appears k+1 times at TOP level (k slices +
    size) — O(k·n) per row — and the zip lambdas bind only their element
    variables. Measured figures for the same fixture: the shipped
    raw-text `word_ngrams_all` (k+1 top-level tokenizations) runs 4.8 s
    — the BASELINE.md record; handing the chain a PRE-MATERIALIZED token
    column (one tokenization, see :func:`materialize_tokens`) measures
    1.4 s.

    Length semantics: every slice has length ``max(n-k+1, 1)``; for
    ``n < k`` the trailing slices run past the end and come back shorter,
    ``zip_with`` null-pads them, and ``concat_ws`` skips nulls — so the
    n < k result is ONE gram holding all n tokens (callers layer their
    own short-doc contracts on top)."""
    from functools import reduce

    n = F.size(toks)
    g = F.greatest(n - (k - 1), F.lit(1))
    parts = [F.slice(toks, i + 1, g) for i in range(k)]
    return reduce(
        lambda acc, p: F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b)),
        parts,
    )


def materialize_tokens(df, text_col: str, keep, alias: str = "__toks", tok_expr=None):
    """Project ``keep`` columns plus the token array of ``text_col`` as
    ``alias`` — the shared tokenize-and-materialize idiom for operators
    whose array lambdas need the tokens: a lambda must capture a CHEAP
    ATTRIBUTE, never the tokenization expression (lambda bodies are
    excluded from common-subexpression elimination, so a captured
    ``tokens(lower(text))`` re-runs the regexp per element — the O(n²)
    round-7 trap). The multi-reference alias survives CollapseProject,
    so downstream lambdas genuinely read the materialized array.

    ``tok_expr`` overrides the tokenization Column (default
    lowercase-whitespace tokens) — pass the caller module's own rule
    (e.g. corpusstats' ``_tok_col``) so one definition governs both its
    expression-level and materialized paths."""
    if tok_expr is None:
        tok_expr = tokens(F.lower(F.col(text_col)))
    return df.select(*[F.col(c) for c in keep], tok_expr.alias(alias))


def pushdown_barrier(col: Column) -> Column:
    """Value-preserving wrapper that stops Catalyst from substituting the
    wrapped expression into downstream predicates or collapsed projections.

    CollapseProject has a cost guard (an expensive multi-referenced alias
    is NOT inlined — what :func:`materialize_tokens` relies on), but
    predicate pushdown has NONE: a ``.filter()`` on a derived column is
    pushed through every deterministic projection, substituting the whole
    alias chain into the predicate — and a HOF lambda that captured a
    materialized ATTRIBUTE now captures the full expression, re-evaluating
    it PER ELEMENT. That resurrects the round-7 lambda-CSE quadratic at
    the optimizer level: ``repetition_filter(df).filter("passes")``
    measured 270.7 s vs 3.4 s for the stats alone on 500 × 1000-token
    docs (round 10), with the tokenize+sort chain re-run inside the
    pushed Filter's per-element lambdas.

    The wrapper is ``when(spark_partition_id() >= 0, col)``: the
    predicate is always true so the VALUE is untouched, but
    ``spark_partition_id()`` is flagged non-deterministic and Catalyst
    must not push predicates through, collapse, or duplicate projections
    containing non-deterministic expressions — the projection computing
    the wrapped column stays a hard optimizer boundary. Cost: one integer
    read per row; no shuffle, no codegen break. Use it on the EXPENSIVE
    materialized array in any doc-local chain whose consumers filter on
    derived columns (no aggregation/window/exchange between the chain and
    the filter to act as a natural boundary).

    Trade-off: the boundary stops ALL predicate pushdown, including
    predicates on PASS-THROUGH columns (a post-hoc ``.filter(doc_id <
    …)`` no longer reaches the parquet scan) — scope the input BEFORE
    the operator instead (every catalog caller already does; the
    operator computes over whatever frame it is given)."""
    return F.when(F.spark_partition_id() >= 0, col)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of the normalized text (the MinHash
    input). Empty/short docs yield their full token string as one shingle
    (the empty doc's shingle is ``""``)."""
    toks = tokens(normalize_text(col))
    n = F.size(toks)
    grams = F.when(n >= 1, _kgram_chain(toks, k)).otherwise(
        F.array(F.lit(""))  # empty doc: one empty-string shingle (legacy contract)
    )
    return F.array_distinct(grams)


def word_ngrams_all(col: Column, k: int = 2) -> Column:
    """All word k-grams of the lowercased text, WITH multiplicity — the
    corpus n-gram-counting input. Contrast :func:`word_shingles`, which is
    distinct + normalized (the MinHash input). Docs shorter than ``k``
    tokens contribute nothing."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    return F.when(n >= k, _kgram_chain(toks, k)).otherwise(
        F.array().cast("array<string>")
    )


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-based token hashes).

    Pandas UDF: Arrow batches in, numpy bit-count majority per batch.
    Cited semantics: Charikar (2002) random-hyperplane sketch, the standard
    near-dup signature. Output is a signed int64 (Spark LongType)."""

    def one(s: str) -> int:
        if not s:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok in s.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            acc += np.where(bits.astype(np.int64) > 0, 1, -1)
        out = np.uint64(0)
        for i, v in enumerate(acc):
            if v > 0:
                out |= np.uint64(1) << np.uint64(63 - i)
        return int(out.astype(np.int64))

    return text.map(one)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 SimHash values (JVM-side bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------- redaction
# PII scrubbing is regex-class work the JVM does in whole-stage codegen —
# a narrow map, no shuffle, trivially scale-free. Patterns stay in the
# RE2-compatible common subset (no backrefs/lookaround) so the SQL oracle
# replays them verbatim.
NUMBER_PAT = "[0-9]+"
EMAIL_PAT = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def redact(col: Column, pattern: str = NUMBER_PAT, token: str = "<NUM>") -> Column:
    """Replace every match of ``pattern`` with ``token``."""
    return F.regexp_replace(col, pattern, token)


def match_count(col: Column, pattern: str = NUMBER_PAT) -> Column:
    """Number of non-overlapping matches of ``pattern``."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def spread_for_cpu(df):
    """Widen a narrow scan before per-row CPU-heavy map work (tokenize /
    explode / md5): a single-row-group parquet file scans as ONE task no
    matter how many cores exist — parquet cannot split inside a row
    group — so the expensive map side of a text pipeline serializes on
    one core while 31 idle. When the input has fewer partitions than
    ``defaultParallelism``, repartition up to it: the raw text bytes are
    tiny next to the downstream k-gram expansion, and AQE cannot help
    (its coalescing/skew handling acts on SHUFFLE boundaries, never the
    scan's map side). At real scale inputs carry many row groups and
    this is a no-op.

    Aggregate results are partitioning-invariant, so callers' outputs
    are unchanged (Spark sorts round-robin repartition inputs for
    deterministic retries).

    WHEN NOT TO USE (measured): the round-robin exchange local-sorts the
    full rows (text included) and re-runs on EVERY job that consumes the
    frame — so it only pays when the downstream per-row work (k-gram
    explode, md5 per shingle, Arrow UDF) clearly exceeds a text sort and
    the spread frame feeds ONE consumption. A cheap map (one fingerprint
    per doc) or a multi-action DAG (collect + reuse) gets SLOWER:
    exact_dedup and the full-pipeline corpus regressed 1.5-2× with this
    applied and deliberately do not use it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if _plan_has_shuffle(df):
        # The probe below converts to an RDD, and under AQE that
        # FINALIZES the adaptive plan — for a frame containing shuffles
        # (e.g. the semi-join-pruned corpus in jaccard_pairs' verify)
        # the upstream shuffle stages RUN EAGERLY at construction time
        # of a nominally lazy frame, and those shuffle files are NOT
        # reused by the later real action (exchange reuse is
        # per-plan-instance). Post-shuffle width is also exactly what
        # AQE's bytes-based coalescing shrinks before CPU-heavy maps
        # (the measured 75 s single-core verify), so for these frames
        # skip the probe and pin the width outright: an explicit-width
        # round-robin repartition, which AQE never coalesces. Callers
        # opted in because the downstream per-row work dominates a text
        # shuffle, and here the shuffle moves only the (usually pruned)
        # frame the caller chose to spread.
        return df.repartition(target)
    # Shuffle-free scan: .rdd is genuinely lazy (no adaptive stages to
    # materialize), so probing the scan's split count runs no jobs.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Logical-plan nodes that are PROVABLY narrow (scan / per-row map /
# lateral expand — never an exchange, never a single-task collapse): only
# a plan built ENTIRELY of these may take the spread_for_cpu .rdd probe.
# This is an ALLOWLIST, not a shuffle-node denylist, so that any node we
# have never classified — a future Spark rename, a new grouped-map
# variant like FlatMapGroupsInPandasWithState — fails SAFE (treated as
# shuffle-bearing, probe skipped): the r7 denylist regex silently missed
# the PySpark grouped-map nodes once, and that failure mode reintroduced
# the eager-AQE-execution bug with no test signal.
_SPREAD_SAFE_NODES = frozenset(
    {
        # leaves (RelationV2 = any DSv2 scan; InMemoryRelation = a cached
        # frame — both provably narrow, and missing them costs callers an
        # unconditional repartition of already-wide frames)
        "Relation", "RelationV2", "InMemoryRelation", "LogicalRDD",
        "LocalRelation", "OneRowRelation", "Range", "ExternalRDD",
        # per-row / narrow unary ops
        "Project", "Filter", "Generate", "Sample", "SubqueryAlias",
        "LocalLimit", "SerializeFromObject", "DeserializeToObject",
        # Union is narrow (concatenation of children's partitions)
        "Union",
        # PHYSICAL nodes: InMemoryRelation prints its cached physical
        # plan as child lines — allow the narrow ones (a cached frame
        # whose plan holds an Exchange/AQEShuffleRead still fails safe:
        # those names are absent here)
        "FileScan", "ColumnarToRow", "InputAdapter", "Scan",
        "WholeStageCodegen",
    }
)
# tree art may include the WholeStageCodegen star marker `*(n) `
_NODE_NAME_RE = re.compile(r"^[\s:+|\-*()0-9]*'?([A-Za-z][A-Za-z0-9]*)")


def _plan_has_shuffle(df) -> bool:
    """True unless EVERY node of ``df``'s optimized logical plan is a
    known-narrow node (``_SPREAD_SAFE_NODES``) — i.e. unknown nodes count
    as shuffles by construction. Plan ANALYSIS/optimization is
    driver-side and lazy-safe — unlike ``.rdd``/
    ``.queryExecution().executedPlan()``, which finalize AQE and eagerly
    execute upstream query stages."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = _NODE_NAME_RE.match(line)
        # a line we cannot even parse a node name from (wrapped
        # continuation, future tree art) also fails safe
        if m is None or m.group(1) not in _SPREAD_SAFE_NODES:
            return True
    return False
