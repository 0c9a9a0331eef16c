"""Hashed linear text classifier — the fastText-style quality gate shape.

Production pretraining pipelines gate documents with a cheap linear
classifier over hashed bag-of-words features (fastText supervised models:
Joulin et al. 2016, arXiv:1607.01759 — the filter used by CCNet and the
LLaMA/RedPajama data recipes). The engine-relevant part is the EXECUTION
shape, which this reproduces exactly Spark-first:

  * tokenize (the shared whitespace tokenizer, functions/text.tokens);
  * hash each token into one of `n_buckets` weight slots — the hashing
    trick (Weinberger et al., ICML'09), so the model is a fixed-size
    table no matter the vocabulary;
  * BROADCAST-join the tiny weight table to the exploded token stream
    (the table is n_buckets rows — KBs to a few MB — so the corpus-side
    stream never shuffles for the lookup);
  * one groupBy(doc) integer sum = the margin; sign of the margin is the
    label. Margins are INTEGER (weights are integer-quantized, the usual
    deployment trick) so the aggregation is exact and order-independent —
    bit-identical across engines and partitionings, which is what lets a
    CLASSIFIER carry an exact DuckDB value oracle.

Weights: pass a trained `(bucket: bigint, weight: bigint)` DataFrame. When
none is given, a deterministic md5-derived stand-in table is generated
(the container ships no trained model; the stand-in exercises the identical
plan and is reproducible in SQL — same honest-stub posture as
operators/multimodal.py's fake decode).

Scale shape (100 TB): explode is JVM-side; the weight join is broadcast;
the only shuffle is the final groupBy(doc_id) of pre-aggregated partial
sums. No Python touches the hot path.

Reference parity: the reference engine has no classifier — this is
BASELINE.json training-pipeline extension surface (quality gating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _md5_int60(col) -> F.Column:
    """First 15 md5 hex nibbles as a non-negative 60-bit bigint — the
    engine-portable hash used across the registry (DuckDB twin:
    ('0x' || substr(md5(x), 1, 15))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def standin_weights(
    spark, n_buckets: int = 4096, seed: int = 7, w_max: int = 500
) -> DataFrame:
    """Deterministic stand-in weight table (bucket, weight) with integer
    weights in [-w_max, w_max], derived from md5 so the oracle can rebuild
    it bit-for-bit. Swap in a trained table with the same schema for real
    gating — the plan shape is identical."""
    span = 2 * w_max + 1
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            _md5_int60(F.concat(F.lit(f"w:{seed}:"), F.col("id").cast("string")))
            % span
            - w_max
        ).alias("weight"),
    )


def hashed_linear_classify(
    docs: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = 4096,
    seed: int = 7,
    bias: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the hashed linear model; returns
    (id_col, n_tokens: bigint, margin: bigint, label: string) where
    margin = bias + Σ_tokens weight[hash(token) % n_buckets] and
    label = 'keep' iff margin ≥ 0.

    Documents with zero (non-empty) tokens are excluded — they have no
    features to score (gate them upstream with a length rule instead).
    """
    if weights is None:
        weights = standin_weights(docs.sparkSession, n_buckets, seed)
    tok = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn(
            "bucket",
            _md5_int60(F.concat(F.lit(f"t:{seed}:"), F.col("tok"))) % n_buckets,
        )
    )
    scored = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("weight") + F.lit(bias)).cast("bigint").alias("margin"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "margin",
        F.when(F.col("margin") >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "label"
        ),
    )
