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
