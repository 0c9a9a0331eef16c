"""Skew mitigation: salted joins.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit variant
for the cases AQE can't fix — a *single* join key so hot that even a split
partition is one task's worth of one key (power-law user_ids, null-heavy
keys), or a broadcast-ineligible dimension joined on a skewed key.

`salted_join` replicates the small side `salt` times and scatters the big
side's hot keys across `salt` sub-keys: the shuffle key becomes
(key, salt_i), so one hot key fans out over `salt` reducers. Replication
multiplies the small side by `salt` — keep salt modest (8-32) and the small
side genuinely smaller.

Results are identical to the plain join for `how` in {"inner", "left"} (each
big-side row meets exactly one replica of each matching small-side row).
Right/full-outer would emit each *unmatched* small-side row once per salt
replica, and semi/anti change the output schema — those modes are rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `big` ⨝ `small` on `on` with the shuffle key salted `salt` ways.

    big rows get a deterministic pseudo-random salt from their full row hash;
    small rows are replicated once per salt value. Output columns match
    `big.join(small, on, how)` (salt columns are internal).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r}: "
            "right/full outer would duplicate unmatched small-side rows "
            "(one per salt replica) and semi/anti drop the small columns"
        )
    big_cols = [c for c in big.columns]
    small_cols = [c for c in small.columns if c != on]

    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return out.select(*big_cols, *small_cols)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Raise the partition count to the session's default parallelism before
    CPU-heavy per-row work (shingling, hash signatures, vector math).

    A small single-file scan arrives as ONE partition, which pins all
    downstream map work to one core no matter how many the cluster has —
    at sf0.1 that made MinHash signatures run 1/32-parallel. At real scale
    the scan is already wider than the target and this is a no-op: it never
    scales DOWN and never moves data that is already spread."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def skew_report(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the measurement that tells
    you whether `salted_join` (and how many salts) is warranted BEFORE a
    100 TB shuffle straggles: the top_k heaviest keys, each row carrying
    the global distribution stats.

    Columns (one row per heavy key, rank by (key_rows desc, key asc)):
      key          — the key value (cast to string for schema stability)
      key_rows     — rows carrying it
      share_bp     — key_rows·10000 div n_rows (basis points of the table)
      n_rows / n_keys / mean_rows — table size, distinct keys, n_rows div
                     n_keys (the mean a uniform key would have)
      skew_factor  — key_rows div mean_rows: how many average keys this
                     one weighs. A shuffle partition holding this key does
                     ~skew_factor× the average partition's work, so it is
                     ALSO the natural salt count for salted_join (split
                     the key skew_factor ways → each shard ≈ mean-sized).
      rnk          — 1-based heaviness rank.

    NULL keys are excluded (they never join; count them in
    validation_report's null metrics instead). All quantities are exact
    integers (floor divisions), so the report carries an exact oracle.

    Plan (100 TB): ONE groupBy(key) shuffle with map-side combine — the
    per-key count table is the only corpus-sized intermediate; the global
    stats re-aggregate that table into one broadcast row and the top-k is
    sort+limit (TakeOrderedAndProject, never a global sort).
    """
    from pyspark.sql import Window

    if top_k <= 0:
        raise ValueError("top_k must be positive")
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("key_rows"))
    )
    stats = counts.agg(
        F.sum("key_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top = (
        counts.orderBy(F.col("key_rows").desc(), F.col("key").asc())
        .limit(top_k)
        .join(F.broadcast(stats))
    )
    w = Window.orderBy(F.col("key_rows").desc(), F.col("key").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .withColumn("share_bp", F.expr("key_rows * 10000 div n_rows"))
        .withColumn("mean_rows", F.expr("n_rows div n_keys"))
        .withColumn("skew_factor", F.expr("key_rows div (n_rows div n_keys)"))
        .select(
            "key",
            "key_rows",
            "share_bp",
            "n_rows",
            "n_keys",
            "mean_rows",
            "skew_factor",
            "rnk",
        )
    )
