"""Stream-stream LEFT OUTER interval join semantics pinned on controlled
inputs: the null-emission watermark boundary (strict-<, ms granularity)
and the multipleWatermarkPolicy=min rule the streaming_outer_join oracle
encodes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _run_outer(spark, src_dir, schema, name):
    def side(et, ida, tsa, ua):
        s = spark.readStream.schema(schema).parquet(src_dir)
        return (
            s.filter(F.col("event_type") == et)
            .select(
                F.col("event_id").alias(ida),
                F.col("user_id").alias(ua),
                F.col("ts").alias(tsa),
            )
            .withWatermark(tsa, "0 seconds")
        )

    joined = side("click", "click_id", "click_ts", "user_id").join(
        side("purchase", "purchase_id", "purchase_ts", "p_user"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("click_id", "purchase_id")
    (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return sorted(
        (r["click_id"], r["purchase_id"]) for r in spark.table(name).collect()
    )


def _write(spark, tmp_path, rows):
    p = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, user_id long"
    ).coalesce(1).write.parquet(p)
    return p, spark.read.parquet(p).schema


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_outer_join_null_row_held_at_exact_bound(spark, tmp_path):
    """Watermark == click_ts + 1h (and +1µs, which ms-floors to the bound):
    the unmatched click's null row is NOT emitted — the boundary is
    strictly greater-than at millisecond granularity."""
    wm = dt.datetime(2024, 1, 1, 1, 0, 0, 1)  # +1µs past bound, ms-floors to it
    p, schema = _write(
        spark,
        tmp_path,
        [(1, "click", T0, 10), (2, "purchase", wm, 99), (3, "click", wm, 99)],
    )
    got = _run_outer(spark, p, schema, "oj_held")
    assert got == [(3, 2)]  # inner part only; no (1, None)


def test_outer_join_null_row_emits_past_bound(spark, tmp_path):
    """Watermark 1 ms past click_ts + 1h: the null-extended row emits."""
    wm = dt.datetime(2024, 1, 1, 1, 0, 0, 1000)
    p, schema = _write(
        spark,
        tmp_path,
        [(1, "click", T0, 10), (2, "purchase", wm, 99), (3, "click", wm, 99)],
    )
    got = _run_outer(spark, p, schema, "oj_emits")
    assert got == [(1, None), (3, 2)]


def test_outer_join_empty_side_pins_watermark(spark, tmp_path):
    """multipleWatermarkPolicy=min: a side that never sees a row keeps its
    watermark at epoch, so the GLOBAL watermark never advances and NO
    null-extended rows emit — the pitfall the oracle's least(...) of both
    sides' max event times encodes."""
    far = dt.datetime(2024, 6, 1, 0, 0, 0)
    p, schema = _write(
        spark,
        tmp_path,
        [(1, "click", T0, 10), (3, "click", far, 99)],  # zero purchases
    )
    got = _run_outer(spark, p, schema, "oj_pinned")
    assert got == []
