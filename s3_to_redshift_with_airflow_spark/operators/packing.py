"""Sequence packing: lay documents end-to-end into fixed-capacity token
windows (training examples) — the batching step of an LLM pretraining
pipeline (concat-and-chunk packing, as in GPT/T5 data loaders).

Semantics: within each shard, documents are concatenated in a deterministic
order (by id) into one token stream; the stream is cut every `capacity`
tokens. A document therefore occupies the half-open token interval
[cum - tokens, cum) of its shard's stream and overlaps every sequence
window [s*capacity, (s+1)*capacity) that intersects it — long documents
straddle window boundaries (they are split), short documents share windows
(they are packed). This is exact integer arithmetic end-to-end, so the
result is bit-reproducible on any engine and any partitioning.

Scale shape: ONE window (running sum) partitioned by the shard column and a
JVM-side `sequence`+`explode` — no shuffle beyond the window's hash
exchange, no Python. The shard column bounds the window partition: at 100 TB
you shard by (source, date_bucket) so no single ordering partition exceeds
executor memory; packing quality is unaffected because windows never span
shards (the same contract as a real pretraining sharder: files are packed
independently). A global unsharded ordering would funnel the corpus through
one task — deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    token_count_col: Column,
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Assign each document to the training-sequence windows it occupies.

    Args:
        docs: one row per document.
        capacity: tokens per packed sequence (context length), > 0.
        token_count_col: Column expression giving the document's token count
            (callers pick the tokenizer — whitespace, BPE-ish regex, …).
        id_col: deterministic within-shard packing order.
        shard_col: packing never crosses shards (bounds window-partition
            size; see module docstring).

    Returns one row per (document, sequence window) overlap:
        shard, seq_id (0-based within shard), doc_id, doc_tokens,
        seq_tokens (tokens this document contributes to this window),
        doc_offset (where in the document this window's slice starts).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        docs.select(
            F.col(shard_col).alias("shard"),
            F.col(id_col).alias("doc_id"),
            token_count_col.cast("bigint").alias("doc_tokens"),
        )
        .withColumn("cum", F.sum("doc_tokens").over(w))
        # first/last window the doc's [cum - doc_tokens, cum) interval hits;
        # integer `div` (not float floor-division) keeps this exact at any
        # stream length.
        .withColumn("first_seq", F.expr(f"(cum - doc_tokens) div {capacity}"))
        .withColumn("last_seq", F.expr(f"(cum - 1) div {capacity}"))
    )
    seq = F.col("seq_id")
    lo = F.greatest(F.col("cum") - F.col("doc_tokens"), seq * capacity)
    hi = F.least(F.col("cum"), (seq + 1) * capacity)
    return (
        c.withColumn(
            "seq_id", F.explode(F.sequence(F.col("first_seq"), F.col("last_seq")))
        )
        .select(
            "shard",
            seq.cast("bigint").alias("seq_id"),
            "doc_id",
            "doc_tokens",
            (hi - lo).cast("bigint").alias("seq_tokens"),
            (lo - (F.col("cum") - F.col("doc_tokens"))).cast("bigint").alias(
                "doc_offset"
            ),
        )
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: windows used, fill ratio of the last
    (only possibly-partial) window, docs per window. Diagnostic companion
    to pack_sequences — all integer aggregates."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("seq_tokens").alias("fill"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return per_seq.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum(F.when(F.col("fill") == capacity, 1).otherwise(0))
        .cast("bigint")
        .alias("full_windows"),
        F.sum("fill").cast("bigint").alias("total_tokens"),
        F.sum("n_docs").cast("bigint").alias("doc_slices"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    overlapping token-window chunks (the retrieval/RAG indexing step that
    precedes embedding — fixed-size windows with `chunk_tokens - stride`
    tokens of overlap so no sentence is stranded on a boundary).

    Output: (id_col, chunk_idx: bigint, chunk_text, chunk_n_tokens: bigint).
    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) of the
    whitespace tokenization (functions/text.tokens — normalized text); the
    final chunk may be shorter. A chunk is generated only while it extends
    coverage (start ≤ n_tokens - chunk_tokens + stride - 1), so no trailing
    chunk is a subset of its predecessor; every document yields at least
    one chunk.

    Scale shape: tokenize → `sequence` of starts → `posexplode` → `slice`,
    all whole-stage-codegen JVM expressions with zero shuffles — the row
    multiplication is the output's own ~n_tokens/stride fan-out. Exact
    integer index arithmetic end-to-end, so chunk boundaries are
    bit-reproducible on any engine (exact DuckDB oracle in
    plans/training.py: doc_chunking).
    """
    from ..functions.text import tokens

    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError(
            f"stride {stride} > chunk_tokens {chunk_tokens} would skip "
            "tokens between consecutive chunks — coverage requires "
            "stride <= chunk_tokens"
        )
    n = F.size(F.col("__toks"))
    last_start = F.greatest(
        n - F.lit(chunk_tokens) + F.lit(stride - 1), F.lit(0)
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    t = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col, "__toks", F.posexplode(starts).alias("chunk_idx", "start")
    )
    piece = F.slice(F.col("__toks"), F.col("start") + 1, chunk_tokens)
    return t.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("chunk_n_tokens"),
    )
