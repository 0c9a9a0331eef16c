"""Stream-stream LEFT OUTER interval join semantics pinned on controlled
inputs: the null-emission watermark boundary (strict-<, ms granularity)
and the multipleWatermarkPolicy=min rule the streaming_outer_join oracle
encodes."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


def test_outer_join_empty_side_oracle_parity(spark, tmp_path):
    """Run the REGISTERED streaming_outer_join query AND its DuckDB oracle
    SQL on a corpus with ZERO purchase events. Spark's min-policy watermark
    stays at epoch, so no null-extended rows emit; the oracle's
    NULL-propagating CASE over least() must agree (DuckDB's plain least()
    would ignore the empty side's NULL max and wrongly emit null rows —
    the ADVICE-r4 pitfall this test pins)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    # Single-file events.parquet (FileStreamSource glob expects a file).
    far = dt.datetime(2024, 6, 1, 0, 0, 0)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 3], pa.int64()),
            "ts": pa.array([T0, far], pa.timestamp("us")),
            "user_id": pa.array([10, 99], pa.int64()),
            "event_type": pa.array(["click", "click"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(tbl, path)

    spec = REGISTRY["streaming_outer_join"]
    got = spec.fn(spark, str(tmp_path)).collect()
    assert got == []  # watermark pinned at epoch: nothing emits

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle_rows = con.execute(spec.oracle).fetchall()
    assert oracle_rows == []  # NULL watermark drops every unmatched row


def _run_full_outer(spark, src_dir, schema, name):
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
        "full_outer",
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
        ((r["click_id"] or -1), (r["purchase_id"] or -1))
        for r in spark.table(name).collect()
    )


def test_full_outer_purchase_null_row_held_at_exact_bound(spark, tmp_path):
    """Right-side (purchase) unmatched rows need watermark strictly past
    purchase_ts: at watermark == purchase_ts the null row is held."""
    p, schema = _write(
        spark,
        tmp_path,
        [
            (1, "purchase", T0, 10),  # unmatched; w == T0 -> held
            (2, "click", T0, 99),
            (3, "purchase", T0, 99),  # matched pair, drives both watermarks
        ],
    )
    got = _run_full_outer(spark, p, schema, "foj_held")
    assert got == [(2, 3)]


def test_full_outer_purchase_null_row_emits_past_bound(spark, tmp_path):
    """1 ms past purchase_ts the purchase's null row emits — a full hour
    EARLIER than a click's null row would (asymmetric bounds from the
    interval condition), which the companion asymmetry test pins."""
    wm = dt.datetime(2024, 1, 1, 0, 0, 0, 1000)  # T0 + 1 ms
    p, schema = _write(
        spark,
        tmp_path,
        [
            (1, "purchase", T0, 10),  # unmatched; w = T0+1ms > T0 -> emits
            (2, "click", wm, 99),
            (3, "purchase", wm, 99),  # matched pair, drives w to T0+1ms
        ],
    )
    got = _run_full_outer(spark, p, schema, "foj_emits")
    assert got == [(-1, 1), (2, 3)]


def test_full_outer_asymmetric_bounds(spark, tmp_path):
    """With w = T0+1ms: an unmatched purchase at T0 emits (bound
    purchase_ts < w) while an unmatched click at T0 is held (bound
    click_ts + 1h < w) — the asymmetry the oracle encodes."""
    wm = dt.datetime(2024, 1, 1, 0, 0, 0, 1000)
    p, schema = _write(
        spark,
        tmp_path,
        [
            (1, "click", T0, 10),  # unmatched, held
            (2, "purchase", T0, 20),  # unmatched, emits
            (6, "click", wm, 99),
            (7, "purchase", wm, 99),  # matched, drives w
        ],
    )
    got = _run_full_outer(spark, p, schema, "foj_asym")
    assert got == [(-1, 2), (6, 7)]


def test_full_outer_empty_side_oracle_parity(spark, tmp_path):
    """Click-only corpus: min-policy watermark stays at epoch, so NEITHER
    side emits null rows; the registered oracle's NULL-propagating
    watermark must agree."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    far = dt.datetime(2024, 6, 1, 0, 0, 0)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 3], pa.int64()),
            "ts": pa.array([T0, far], pa.timestamp("us")),
            "user_id": pa.array([10, 99], pa.int64()),
            "event_type": pa.array(["click", "click"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(tbl, path)

    spec = REGISTRY["streaming_full_outer_join"]
    assert spec.fn(spark, str(tmp_path)).collect() == []
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    assert con.execute(spec.oracle).fetchall() == []


def _run_join_window(spark, src_dir, schema, name):
    j = _side_pair(spark, src_dir, schema)
    agg = (
        j.groupBy(F.window("click_ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return sorted((str(r["ws"]), r["n"]) for r in spark.table(name).collect())


def _side_pair(spark, src_dir, schema):
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

    return side("click", "click_id", "click_ts", "user_id").join(
        side("purchase", "purchase_id", "purchase_ts", "p_user"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )


def test_chained_window_held_at_join_state_bound(spark, tmp_path):
    """Chained stateful ops: the join retains clicks until watermark >
    click_ts + 1h, so the downstream window [00:00, 01:00) does NOT
    finalize at watermark == 02:00 (window_end + 1h exactly)."""
    t_in = dt.datetime(2024, 1, 1, 0, 30, 0)
    w_drv = dt.datetime(2024, 1, 1, 2, 0, 0)
    p, schema = _write(
        spark,
        tmp_path,
        [(1, "click", t_in, 10), (2, "purchase", t_in, 10),
         (3, "click", w_drv, 99), (4, "purchase", w_drv, 99)],
    )
    got = _run_join_window(spark, p, schema, "jw_held")
    assert got == []


def test_chained_window_emits_past_join_state_bound(spark, tmp_path):
    """1 ms past window_end + 1h the window finalizes — the strict-< bound
    the streaming_join_window_agg oracle encodes."""
    t_in = dt.datetime(2024, 1, 1, 0, 30, 0)
    w_drv = dt.datetime(2024, 1, 1, 2, 0, 0, 1000)
    p, schema = _write(
        spark,
        tmp_path,
        [(1, "click", t_in, 10), (2, "purchase", t_in, 10),
         (3, "click", w_drv, 99), (4, "purchase", w_drv, 99)],
    )
    got = _run_join_window(spark, p, schema, "jw_emits")
    assert got == [("2024-01-01 00:00:00", 1)]
