"""Persistable HLL sketch tables (Spark 4 native DataSketches).

The 100 TB rollup pattern: build per-(grain) sketches ONCE from the raw
data, persist them as an ordinary parquet table (the sketch is a ~KB
binary column regardless of cardinality), and serve every coarser-grain
distinct-count rollup by MERGING stored sketches — the raw data is never
re-scanned, and may even be deleted/archived. DataSketches HLL union is
associative and the estimate is a pure function of the hashed value set,
so rollups built from the stored table are bit-identical to rollups built
directly from the raw rows (pinned in tests/test_scale_ops.py, including
a delete-the-raw-data test).

Split into two composable plans so the persistence seam is real:
`daily_user_sketches` produces the storable table; `rollup_user_sketches`
consumes EITHER that live DataFrame or a parquet read of it.

Reference parity: the reference has no sketch surface — BASELINE.json
extension (approximate distinct rollups), same family as
plans/scale_ops.q_sketch_rollup which composes these two stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(
    events: DataFrame,
    value_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (event_type, day) HLL sketch of distinct `value_col` —
    (event_type, day, sk: binary). One pass, one groupBy shuffle of
    partial sketches (hll_sketch_agg merges map-side); the output is
    ~KB·(types×days) however large the input. Write it to parquet and
    every future rollup reads THIS table instead of the raw events."""
    return events.groupBy(
        F.col(type_col).alias("event_type"), F.to_date(ts_col).alias("day")
    ).agg(F.expr(f"hll_sketch_agg({value_col})").alias("sk"))


def rollup_user_sketches(daily: DataFrame) -> DataFrame:
    """Merge per-day sketches to the event_type grain —
    (event_type, n_days, est_users). `daily` may be the live
    daily_user_sketches plan or `spark.read.parquet(<sketch table>)`:
    hll_union_agg is associative, so the result is identical either way
    and the raw data is never touched."""
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("bigint")
            .alias("est_users"),
        )
        .orderBy("event_type")
    )
