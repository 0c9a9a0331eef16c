"""Streaming session-window semantics pinned on controlled inputs:
watermark emission boundary (probed empirically, encoded in the
streaming_session_agg oracle) and cross-micro-batch session merging."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _run_sessions(spark, src, gap="30 minutes", name="sess_mem"):
    agg = (
        src.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).collect()


def test_session_emits_at_exact_watermark_boundary(spark, tmp_path):
    """session_end == watermark → emitted (the `<=` boundary the
    streaming_session_agg oracle encodes)."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),  # session end 00:30:00
        (2, dt.datetime(2024, 1, 1, 0, 30, 0)),  # watermark → 00:30:00
    ]
    p = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(p)
    schema = spark.read.parquet(p).schema
    src = spark.readStream.schema(schema).parquet(p).withWatermark(
        "ts", "0 seconds"
    )
    got = _run_sessions(spark, src, name="sess_bound")
    assert [(r["user_id"], r["n_events"]) for r in got] == [(1, 1)]
    assert got[0]["session_end"] == dt.datetime(2024, 1, 1, 0, 30, 0)


def test_session_held_when_end_is_microseconds_past_watermark(spark, tmp_path):
    """Emission compares at full µs precision while the watermark itself is
    max-event-time FLOORED TO MILLISECONDS minus the delay — a session
    ending 500µs past the watermark stays in state (nothing emitted)."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0, 500)),  # end 00:30:00.000500
        (2, dt.datetime(2024, 1, 1, 0, 30, 0)),  # watermark 00:30:00.000000
    ]
    p = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(p)
    schema = spark.read.parquet(p).schema
    src = spark.readStream.schema(schema).parquet(p).withWatermark(
        "ts", "0 seconds"
    )
    assert _run_sessions(spark, src, name="sess_held") == []


def test_sessions_merge_across_micro_batches(spark, tmp_path):
    """A session split across two micro-batches (maxFilesPerTrigger=1) must
    merge into ONE window and be emitted exactly once, once the watermark
    passes its end — the stateful merge that distinguishes streaming session
    windows from per-batch sessionization."""
    base = str(tmp_path / "ev")
    f1 = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 10, 0)),
    ]
    f2 = [
        (1, dt.datetime(2024, 1, 1, 0, 20, 0)),  # extends the same session
        (99, dt.datetime(2024, 1, 1, 6, 0, 0)),  # advances the watermark
    ]
    import glob as _glob
    import os

    spark.createDataFrame(f1, "user_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(base)
    first = set(_glob.glob(base + "/*.parquet"))
    spark.createDataFrame(f2, "user_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(base)
    # FileStreamSource orders files by modification time — pin distinct
    # mtimes so batch 1 is deterministically f1 (else f2's 06:00 event could
    # advance the watermark first and drop f1's rows as late data)
    for f in first:
        os.utime(f, (1_700_000_000, 1_700_000_000))
    for f in set(_glob.glob(base + "/*.parquet")) - first:
        os.utime(f, (1_700_000_100, 1_700_000_100))
    schema = spark.read.parquet(base).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .withWatermark("ts", "0 seconds")
    )
    got = _run_sessions(spark, src, name="sess_merge")
    assert [(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in got] == [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), dt.datetime(2024, 1, 1, 0, 50, 0), 3)
    ]
