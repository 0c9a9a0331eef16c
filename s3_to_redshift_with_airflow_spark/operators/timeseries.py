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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(col: Column) -> Column:
    # unix_micros rejects TIMESTAMP_NTZ (the type Spark infers for tz-naive
    # parquet timestamps); casting to TIMESTAMP first accepts both flavors —
    # a no-op for LTZ, session-tz interpretation for NTZ. All uses here are
    # differences or shared bucket boundaries, so any single consistent
    # interpretation yields identical results.
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    right_tiebreaker: str | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of left join.

    Every `left` row gains `prefix + right_time` and `prefix + c` for each
    payload column — values from the most recent `right` row of the same
    `on` key with right_time <= left_time (NULLs when no such row).

    `tolerance_seconds` bounds the lookback (pandas merge_asof's
    `tolerance`): a match older than left_time - tolerance is dropped (all
    carried columns NULL). Applied to the already-selected most-recent row —
    if the newest match is too old, every match is, so this is a cheap
    post-predicate, not a different join."""
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
    if tolerance_seconds is not None:
        within = _epoch_us(F.col("__last_r").getField(right_time)) >= (
            _epoch_us(F.col(left_time)) - int(tolerance_seconds * 1_000_000)
        )
        out = out.withColumn("__last_r", F.when(within, F.col("__last_r")))
    for c in carried:
        out = out.withColumn(f"{prefix}{c}", F.col("__last_r").getField(c))
    return out.drop("__t", "__side", "__r", "__last_r")


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Inactivity-gap sessionization (gaps-and-islands): a new session starts
    when a key's event arrives more than `gap_minutes` after its previous
    one. Returns per-session rows: (key, session_id, session_start,
    session_end, n_events) with session_id numbered 1..n per key in time
    order (deterministic when (key, time) is unique).

    Plan: one shuffle on the key; lag + running sum + aggregate all reuse the
    same partitioning, so Catalyst plans a single Exchange. The streaming
    twin is `F.session_window(time_col, gap)` (state bounded by watermark);
    this batch form is its oracle-checkable equivalent.
    """
    w = Window.partitionBy(key).orderBy(time_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(time_col).over(w)
    # >= not >: matches F.session_window's [t, t+gap) semantics — an event
    # exactly `gap` after the previous one starts a NEW session (the two
    # half-open windows don't overlap), keeping batch and streaming twins
    # bit-equivalent.
    new_session = F.when(
        prev.isNull()
        | ((_epoch_us(F.col(time_col)) - _epoch_us(prev)) >= gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("__new", new_session)
        .withColumn("session_id", F.sum("__new").over(run).cast("bigint"))
        .groupBy(key, "session_id")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join, bucketed (the operator Spark lacks:
    a plain `t BETWEEN start AND end` join plans as a nested-loop join —
    O(|points|·|intervals|)).

    The banded plan: each interval is exploded onto the fixed time buckets
    it covers; each point maps to exactly one bucket; an EQUI-join on
    (keys…, bucket) finds candidates and the exact containment predicate
    filters them. Cost is O(collisions within buckets) with one hash
    shuffle — the same banding idea as the LSH joins, with zero recall
    loss (a point's bucket always lies inside its interval's bucket span).

    `bucket_seconds` trades replication for selectivity: ~the typical
    interval length is right (each interval lands in ~2 buckets).
    Output: all point columns + all interval columns (minus join keys).

    `how` is 'inner' or 'left' (points-preserving). The containment
    predicate lives INSIDE the join condition, so under 'left' a point with
    no containing interval is null-extended rather than silently dropped by
    a post-join filter. Right/full-outer are rejected: an unmatched interval
    would surface once per bucket replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"range_join supports how='inner' or 'left', got {how!r}"
        )
    keys = keys or []
    us = bucket_seconds * 1_000_000

    p = points.withColumn(
        "__bkt", (_epoch_us(F.col(point_col)) / us).cast("long")
    ).alias("__p")
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (_epoch_us(F.col(start_col)) / us).cast("long"),
                (_epoch_us(F.col(end_col)) / us).cast("long"),
            )
        ),
    ).alias("__i")
    cond = F.col("__p.__bkt") == F.col("__i.__bkt")
    for k in keys:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    # Equi-part (keys, __bkt) still drives the hash join; the containment
    # predicate rides along as the join's residual condition, preserving
    # left-outer semantics without degrading the bucketed plan.
    cond = cond & (
        (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{point_col}") <= F.col(f"__i.{end_col}"))
    )
    joined = p.join(i, on=cond, how=how)
    ival_cols = [c for c in intervals.columns if c not in keys]
    return joined.select(
        *[F.col(f"__p.{c}") for c in points.columns],
        *[F.col(f"__i.{c}").alias(c) for c in ival_cols],
    )


def gap_fill(
    series: DataFrame,
    key: str,
    time_col: str,
    value_cols: dict[str, str],
    step_seconds: int = 3600,
) -> DataFrame:
    """Densify a per-key time series onto a regular grid and fill the gaps —
    the missing-bucket repair every downstream window/trend computation
    assumes has already happened (pandas `resample().ffill()` twin,
    Spark-first).

    `series` must hold ONE row per (key, bucket) with `time_col` already
    bucket-aligned (aggregate first); `value_cols` maps each value column
    to its fill policy: 'zero' (additive metrics — a missing bucket means
    nothing happened) or 'ffill' (level/state metrics — carry the last
    observation forward; leading gaps stay NULL). Adds `observed`
    (boolean) so filled rows stay distinguishable.

    Plan: per-key min/max (one aggregate) → `sequence()` grid explode →
    left join observations on (key, bucket) → `last(ignoreNulls)` window
    per key for the ffill columns. The grid aggregate partitions by key
    and the ffill window reuses that partitioning (verified: no exchange
    between join and Window when the observation side broadcasts, the
    common case since the input is an already-aggregated series). When
    the series is too big to broadcast the join becomes a (key, bucket)
    SMJ and the window adds one key-only exchange — still three shuffles
    of the AGGREGATED series, never the raw events. Scale note: grid size
    per key is span/step — bound the span upstream for keys with years of
    sparse history, or the explode IS the data you asked for."""
    if not value_cols or any(p not in ("zero", "ffill") for p in value_cols.values()):
        raise ValueError("value_cols must map columns to 'zero' or 'ffill'")
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    step = F.expr(f"INTERVAL {int(step_seconds)} SECOND")
    grid = (
        series.groupBy(key)
        .agg(F.min(time_col).alias("__mn"), F.max(time_col).alias("__mx"))
        .select(
            key,
            F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias(time_col),
        )
    )
    joined = grid.join(series, [key, time_col], "left")
    observed = F.greatest(
        *[F.col(c).isNotNull() for c in value_cols]
    ) if len(value_cols) > 1 else F.col(next(iter(value_cols))).isNotNull()
    out_cols = [F.col(key), F.col(time_col), observed.alias("observed")]
    w = (
        Window.partitionBy(key)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c, policy in value_cols.items():
        if policy == "zero":
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        else:
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
    return joined.select(*out_cols)


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    bucket: str = "hour",
    seq_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close bars — the canonical time-series downsample
    (market bars, sensor rollups, metric dashboards): per (group, bucket),
    the first value, max, min, last value and row count.

    Open/close are selected with min_by/max_by over the (ts, seq) struct —
    pass `seq_col` (a unique tiebreaker, e.g. event_id) whenever two rows
    can share a timestamp, or first/last are nondeterministic and the
    result would hash-flap across partitionings. With the tiebreaker the
    whole bar table is an exact, engine-portable value (values pass
    through untouched; no accumulation-order float math anywhere).

    Plan (100 TB): ONE groupBy(group, bucket) shuffle with full map-side
    combine — min_by/max_by carry a single (ord, value) pair per partial,
    so the shuffle volume is O(groups), never O(rows). This is the
    aggregate-then-window discipline's degenerate case: no window at all.
    """
    gcols = group_cols or []
    ordc = (
        F.struct(F.col(ts_col), F.col(seq_col))
        if seq_col
        else F.struct(F.col(ts_col))
    )
    v = F.col(value_col)
    return (
        df.groupBy(
            *gcols, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")
        )
        .agg(
            F.min_by(v, ordc).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordc).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def interval_coalesce(
    intervals: DataFrame,
    key_cols: list[str],
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Merge overlapping or touching intervals per key into maximal
    disjoint 'islands' — the classic gaps-and-islands problem (downtime
    windows, validity ranges, sensor coverage): an interval starts a new
    island iff its start exceeds the running max end of everything
    before it (strictly — touching intervals merge), islands are
    numbered by a running sum of those flags, and each island aggregates
    to (key..., island_start=min(s), island_end=max(e), n_merged).

    Exactness: start/end comparisons only (no arithmetic), deterministic
    under the (start asc, end asc) window order even with duplicate
    starts — engine-exact for timestamps and integers alike.

    Scale shape: ONE window pass per key (running max end + running
    island sum share the same ordered frame) and one island aggregate —
    the aggregate-then-window discipline does not apply here (islands
    are inherently order-defined), but per-key ordering is bounded by
    that key's interval count, and AQE splits hot keys."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.select(
        *key_cols,
        start_col,
        end_col,
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        )
        .otherwise(0)
        .alias("__new_island"),
    )
    islands = flagged.select(
        *key_cols,
        start_col,
        end_col,
        F.sum("__new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__island"),
    )
    return (
        islands.groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        )
        .drop("__island")
    )
