"""Time-series operators: as-of join.

The reference has no time-series joins (SURVEY §2.4: inner equi-joins only);
as-of is the canonical missing-from-Spark operator for event/state alignment
("for each left row, the most recent right row at or before its timestamp,
per key") — standard in kdb/Pandas (`merge_asof`)/DuckDB (ASOF JOIN).

Implementation is the union trick, NOT a join: tag both inputs, union them,
sort within each key partition by (time, side) and carry the right-side row
forward with `last(ignoreNulls=True)` over a running window, then keep only
left rows. One shuffle on the key, O(n log n) partition-local sort, zero
pair explosion — versus the join-filter-rank formulation whose intermediate
is |left|×|matching right| rows. This is exactly the plan a 1000-executor
cluster wants: both sides co-partitioned by key, no skewed range join.

The right-side row travels as ONE struct column, so `last(ignoreNulls)`
picks an entire row atomically — per-column carries would tear rows when a
payload value is legitimately NULL in the newest matching row.

Determinism: at equal timestamps the right row sorts before the left row
(inclusive "at or before"); ties among right rows at the same (key, time)
are broken by `right_tiebreaker` (max wins), so output is stable across
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    right_tiebreaker: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of left join.

    Every `left` row gains `prefix + right_time` and `prefix + c` for each
    payload column — values from the most recent `right` row of the same
    `on` key with right_time <= left_time (NULLs when no such row).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    carried = [right_time] + payload_cols

    r_struct = F.struct(*[F.col(c).alias(c) for c in carried])
    l_tagged = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            "struct<"
            + ", ".join(f"{c}: {right.schema[c].dataType.simpleString()}" for c in carried)
            + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    # align schemas: right rows carry NULL for left's own columns
    for c in left.columns:
        if c != on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(l_tagged.columns)

    order = [F.col("__t").asc(), F.col("__side").asc()]
    if right_tiebreaker is not None:
        order.append(F.col("__r").getField(right_tiebreaker).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    for c in carried:
        out = out.withColumn(f"{prefix}{c}", F.col("__last_r").getField(c))
    return out.drop("__t", "__side", "__r", "__last_r")
