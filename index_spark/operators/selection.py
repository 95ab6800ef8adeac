"""Targeted data selection: DSIR-style importance weights.

Data Selection via Importance Resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling") scores every candidate
document by how target-like its hashed n-gram profile is:

    log w(doc) = Σ_features  count(doc, f) · ln( p_target(f) / p_raw(f) )

with the two distributions estimated over a FIXED hashed feature space
(bigrams hashed into ``n_buckets`` buckets, add-1 smoothed) — the hashing
is what keeps the estimator's state O(n_buckets), not O(vocabulary), so
the whole selection pass is two corpus scans regardless of corpus size.
Selection then keeps the top-weighted (or Gumbel-resampled) candidates;
this module exposes the weights and a deterministic top-k.

Scale shape (100 TB): tokenize → map-side bigram zip (the
``corpusstats.bigram_nll`` idiom: materialized token array, never a
re-tokenize-per-element lambda) → ONE hash-agg to (doc, bucket) counts →
ONE ``n_buckets``-row aggregate for the two bucket distributions → a
broadcast join of that bounded table back onto the per-doc counts. The
bucket table is broadcast BY CONSTRUCTION-SIZE (``n_buckets`` is a
parameter, not corpus-growing — the one case where a broadcast hint is
always safe). Text shuffles once, at the (doc, bucket) aggregate.

Float determinism follows the catalog hash rules: the per-bucket
log-ratio is ``ln`` of a fixed 3-op double expression over exact BIGINT
counts; per-doc sums fold left-to-right over the SORTED contribution list
(bounded by min(doc length, n_buckets) terms), then round to 6 — the
``bigram_nll`` recipe, replayed verbatim by the DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.functions.text import md5_prefix60


def _tok_col(text_col: str) -> "F.Column":
    """Same corpus-tokenization rule as :mod:`.corpusstats` (lowercase
    whitespace tokens): importance weights and corpus diagnostics must
    share one vocabulary definition."""
    return TX.tokens(F.lower(F.col(text_col)))


def dsir_log_weights(
    df: DataFrame,
    target_source: str,
    *,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document DSIR importance log-weight of every NON-target
    document, scoring how target-like its hashed-bigram profile is.

    ``p_target`` is estimated from rows where ``source_col ==
    target_source``, ``p_raw`` from all other rows (the candidate pool
    being scored). Both are add-1-smoothed over the ``n_buckets`` hashed
    feature space:

        p(b) = (c(b) + 1) / (total + n_buckets)

    so the per-bucket log-ratio is

        λ(b) = ln( (c_t(b)+1)·(R+B)  /  ((c_r(b)+1)·(T+B)) )

    assembled as exact-integer-input doubles: ``(CAST(c_t+1 AS DOUBLE) ·
    litRB) / (CAST(c_r+1 AS DOUBLE) · litTB)`` — three correctly-rounded
    IEEE ops plus one ``ln``, identical on any engine (the totals are read
    eagerly and injected as literals, the ``js_divergence`` pattern).
    Buckets come from :func:`..operators.sampling.md5_prefix60` mod
    ``n_buckets`` — the repo's single md5-prefix definition, so the SQL
    twin replays the hashing verbatim.

    Documents with fewer than 2 tokens have no bigram features and are
    ABSENT from the output (they carry no evidence either way; callers
    wanting them use a left join). Raises if either side has no bigrams —
    a distribution over zero events is undefined.

    Returns ``(id_col, n_grams BIGINT, log_w DOUBLE)`` — one row per
    non-target document, ``log_w`` rounded to 6 (higher = more
    target-like).
    """
    if n_buckets < 2:
        raise ValueError(f"dsir_log_weights: n_buckets must be >= 2, got {n_buckets}")
    tokd = TX.materialize_tokens(
        TX.spread_for_cpu(df.select(F.col(id_col), F.col(source_col), F.col(text_col))),
        text_col,
        [id_col, source_col],
        tok_expr=_tok_col(text_col),
    )
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = tokd.select(
        F.col(id_col),
        (F.col(source_col) == F.lit(target_source)).alias("__tgt"),
        F.explode(F.when(n >= 2, bigrams)).alias("__bg"),
    ).select(
        id_col,
        "__tgt",
        F.pmod(md5_prefix60(F.col("__bg")), F.lit(n_buckets)).alias("__b"),
    )
    tf = pairs.groupBy(id_col, "__tgt", "__b").agg(F.count(F.lit(1)).alias("__tf"))
    buckets = tf.groupBy("__b").agg(
        F.coalesce(F.sum(F.when(F.col("__tgt"), F.col("__tf"))), F.lit(0)).alias("__ct"),
        F.coalesce(F.sum(F.when(~F.col("__tgt"), F.col("__tf"))), F.lit(0)).alias("__cr"),
    )
    # totals eagerly -> literals: re-embedding the aggregate subplan would
    # re-run the corpus tokenize pipeline at action time (js_divergence /
    # vocab_growth pattern), and the guard needs the numbers anyway
    trow = buckets.agg(F.sum("__ct").alias("t"), F.sum("__cr").alias("r")).first()
    if not trow["t"] or not trow["r"]:
        side = "target" if not trow["t"] else "raw"
        raise ValueError(f"dsir_log_weights: the {side} side has no bigrams")
    lit_tb = F.lit(float(int(trow["t"]) + n_buckets))
    lit_rb = F.lit(float(int(trow["r"]) + n_buckets))
    lam = F.log(
        ((F.col("__ct") + F.lit(1)).cast("double") * lit_rb)
        / ((F.col("__cr") + F.lit(1)).cast("double") * lit_tb)
    )
    contrib = (
        tf.filter(~F.col("__tgt"))
        .join(F.broadcast(buckets.select("__b", lam.alias("__lam"))), "__b")
        .select(
            id_col,
            "__tf",
            (F.col("__tf").cast("double") * F.col("__lam")).alias("__c"),
        )
    )
    s = F.aggregate(
        F.sort_array(F.collect_list("__c")), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("__tf").alias("n_grams"), s.alias("__s"))
        .select(id_col, "n_grams", F.round(F.col("__s"), 6).alias("log_w"))
    )


def dsir_select_top(
    df: DataFrame,
    target_source: str,
    m: int,
    *,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The selection step: the ``m`` highest-weighted non-target documents
    by :func:`dsir_log_weights`, deterministic tie-break on ``id_col`` —
    a distributed TakeOrdered (per-partition top-m, then merge m·p rows),
    never a global sort."""
    if m < 1:
        raise ValueError(f"dsir_select_top: m must be >= 1, got {m}")
    w = dsir_log_weights(
        df,
        target_source,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        source_col=source_col,
    )
    return w.orderBy(F.col("log_w").desc(), F.col(id_col).asc()).limit(m)
