"""Segment-level dedup / boilerplate removal (CCNet-style).

Document-level dedup (:mod:`.dedup`) and span *statistics* (:mod:`.spans`)
leave a third standard pipeline stage: actually REMOVING repeated segments
from otherwise-unique documents and re-assembling the cleaned text. Public
pipelines (CCNet, Wenzek et al. 2020; RefinedWeb, Penedo et al. 2023) do
this at paragraph/line granularity: hash each segment, drop segments whose
hash recurs across ≥ K distinct documents (boilerplate: headers, license
blocks, nav text), keep the rest in original order.

The driver fixtures carry no line structure, so the segmenter here is
fixed-width non-overlapping token blocks — the same operator shape
(segment → hash → corpus-frequency join → ordered reassembly) with a
pluggable segmenter; a newline splitter drops in for real corpora.

Plan shape at 100 TB: segments explode map-side; only ``(doc_id, pos,
60-bit hash)`` triples enter the shuffle (segment TEXT is dropped before
any exchange and re-derived at reassembly, which is partitioned by doc —
the same partitioning the explode's groupBy established). Corpus counts
are a second partial-agg shuffle on the hash. No UDF, no window over the
corpus, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions import text as TX
from index_spark.functions.text import md5_prefix60


def token_blocks_of(toks, width: int = 8):
    """Array of non-overlapping ``width``-token blocks of a
    PRE-MATERIALIZED token-array column, in order; the final block may be
    short. Empty array → empty array.

    The strided slice runs inside a ``transform`` lambda, so ``toks``
    MUST be a plain column reference (an attribute read is free per
    element) — never the tokenization expression itself: lambda bodies
    are excluded from common-subexpression elimination, and a captured
    ``tokens(lower(text))`` would re-run the regexp PER BLOCK — O(n²/w)
    regex work per document (the round-7 bigram/k-gram lesson, measured
    67× on 1000-token docs)."""
    n = F.size(toks)
    n_blocks = F.ceil(n.cast("double") / F.lit(float(width))).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
    )
    return F.when(n > 0, blocks).otherwise(F.array().cast("array<string>"))


def segment_hashes(df: DataFrame, width: int = 8, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, position) with the segment's 60-bit md5-prefix
    hash (``md5_prefix60``, r9 — segment identity is a corpus-wide join
    key; 28 bits birthday-collide into false boilerplate at scale). The segment
    TEXT is deliberately absent: this is the shuffled projection. The
    token array materializes in its own projection first so the block
    lambda captures a cheap attribute, not the regexp."""
    tokd = TX.materialize_tokens(TX.spread_for_cpu(df), text_col, [id_col])
    return tokd.select(
        F.col(id_col),
        F.posexplode(token_blocks_of(F.col("__toks"), width)).alias("pos", "__seg"),
    ).select(id_col, "pos", md5_prefix60(F.col("__seg")).alias("h"))


def dedup_segments(
    df: DataFrame,
    min_docs: int = 3,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove boilerplate segments (those whose hash appears in ≥
    ``min_docs`` distinct documents) and re-assemble each document.

    Returns ``(id_col, n_segments, n_removed, clean_text)`` — segments
    kept in original position order, joined by single spaces. Documents
    made entirely of boilerplate come back with empty ``clean_text``.

    Text never enters an exchange: the two aggregation shuffles carry
    ``(doc, pos, 60-bit hash)`` and ``(doc, [dropped pos])`` only, and the
    final join back to the documents keeps the text on its original
    partitions (the dropped-positions side is the small one — AQE
    broadcasts it). Reassembly recomputes the token blocks doc-locally
    and filters by position — a narrow projection.
    """
    segs = segment_hashes(df, width=width, id_col=id_col, text_col=text_col)
    freq = segs.groupBy("h").agg(F.count_distinct(id_col).alias("n_docs"))
    flagged = freq.filter(F.col("n_docs") >= F.lit(min_docs)).select("h")
    dropped = (
        segs.join(flagged, on="h", how="left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__drop_pos"))
    )
    # token array materialized BEFORE the block/filter lambdas capture it
    # (the O(n²) regexp-in-lambda trap — see token_blocks_of)
    joined = TX.materialize_tokens(
        df.join(dropped, on=id_col, how="left"), text_col, [id_col, "__drop_pos"]
    )
    blocks = token_blocks_of(F.col("__toks"), width)
    drop_pos = F.coalesce(F.col("__drop_pos"), F.array().cast("array<int>"))
    kept = F.filter(blocks, lambda b, i: ~F.array_contains(drop_pos, i.cast("int")))
    return joined.select(
        id_col,
        F.size(blocks).cast("long").alias("n_segments"),
        F.size(drop_pos).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def chunk_documents(
    df: DataFrame,
    width: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / context-window prep
    step: fixed-width chunks with ``width - stride`` tokens of overlap so
    no boundary context is lost). Chunk starts are ``0, stride, 2*stride,
    ...`` while a full-or-partial window remains; every token lands in at
    least one chunk and the final chunk may be short. A doc shorter than
    ``width`` yields exactly one chunk.

    Returns one row per chunk: ``(id_col, chunk_id, tok_start, n_tokens,
    chunk_text)`` — a narrow per-row explode, no shuffle at all; the
    downstream consumer (embedding UDF, parquet sink) decides the
    partitioning.
    """
    assert 0 < stride <= width
    # token array materialized BEFORE the chunk lambda captures it (the
    # O(n²) regexp-in-lambda trap — see token_blocks_of)
    tokd = TX.materialize_tokens(df, text_col, [id_col]).filter(F.size("__toks") > 0)
    toks = F.col("__toks")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - width, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - width, F.lit(0)).cast("double") / F.lit(float(stride))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            (i * stride).cast("long").alias("tok_start"),
            F.least(n - i * stride, F.lit(width)).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, width)).alias("chunk_text"),
        ),
    )
    return (
        tokd.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.tok_start", "c.n_tokens", "c.chunk_text")
    )
