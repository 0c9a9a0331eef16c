"""Structured Streaming pipeline: windowed aggregation parity with batch,
stateful dedup, foreachBatch upsert idempotency.

Append-mode semantics: a window is emitted only once the watermark (2 h
behind max event time) passes its end — so the trailing ~3 hourly windows of
a finite stream remain open and unemitted. Tests compare the emitted set
against the batch plan restricted to closed windows.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_to_redshift_with_airflow_spark.sources.readers import load_tables
from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
    dedup_events,
    foreach_batch_upsert,
    run_to_memory,
    stream_source,
    windowed_kpis,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

WATERMARK = timedelta(hours=2)


@pytest.fixture(scope="module")
def events_dir(spark):
    """Materialize sf0.001 events as a parquet dir (normalized timestamps)."""
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    (events,) = load_tables(spark, "/root/testdata/sf0.001", "events")
    events.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
        "overwrite"
    ).parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def closed_window_batch(spark, events_dir):
    """Batch twin of the streaming aggregation, restricted to windows whose
    end precedes the final watermark (max_ts - 2h)."""
    events = spark.read.parquet(events_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - WATERMARK  # window_end <= watermark ⇒ emitted
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("v"),
        )
        .filter(F.col("h") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
        .collect()
    )


def test_windowed_kpis_matches_batch(spark, events_dir):
    stream = stream_source(spark, events_dir, EVENTS_SCHEMA)
    run_to_memory(windowed_kpis(stream), "win_out")
    got = {
        r["window_start"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    expected = {r["h"]: (r["n"], r["v"]) for r in closed_window_batch(spark, events_dir)}
    assert expected  # sanity: there must be closed windows to compare
    assert got == expected


def test_streaming_dedup(spark, events_dir):
    # duplicate the source twice → stateful dedup must collapse the copies
    dup_dir = tempfile.mkdtemp(prefix="stream_dup_")
    src = spark.read.parquet(events_dir)
    src.unionByName(src).write.mode("overwrite").parquet(dup_dir)
    try:
        stream = stream_source(spark, dup_dir, EVENTS_SCHEMA)
        deduped = dedup_events(stream, ["event_id"])
        run_to_memory(windowed_kpis(deduped), "dedup_out")
        got = {
            r["window_start"]: r["n_events"]
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        expected = {r["h"]: r["n"] for r in closed_window_batch(spark, events_dir)}
        assert got == expected  # duplicates removed, not double-counted
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_foreach_batch_upsert_idempotent(spark, events_dir):
    target = tempfile.mkdtemp(prefix="stream_tgt_") + "/t"
    stream = stream_source(spark, events_dir, EVENTS_SCHEMA)
    agg = windowed_kpis(stream)
    sink = foreach_batch_upsert(target, keys=["window_start"])
    for _ in range(2):  # second run replays the same data → same result
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .start()
        )
        q.awaitTermination()
    out = spark.read.parquet(target)
    assert out.count() == out.select("window_start").distinct().count()
    expected = {r["h"]: r["n"] for r in closed_window_batch(spark, events_dir)}
    got = {r["window_start"]: r["n_events"] for r in out.collect()}
    assert got == expected


def test_streaming_session_window_equals_batch_sessionize(spark, tmp_path):
    """F.session_window (streaming, stateful) must agree with the batch
    sessionize operator — same 30-min gap, same sessions.

    A sentinel file one year in the future is streamed as a second
    micro-batch so the watermark passes every real session and append mode
    emits them all."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.timeseries import sessionize
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        load_tables,
        with_ts_from_nanos,
    )

    (events,) = load_tables(spark, "/root/testdata/sf0.001", "events")
    events = events.select("user_id", "ts")

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "a_events.parquet")
    # Sentinel must match the RAW file schema (nanosecond longs or plain
    # timestamps, depending on how the driver generated the data) or the
    # declared stream schema misparses it and the watermark never advances.
    raw = spark.read.parquet(str(src_dir / "a_events.parquet"))
    from pyspark.sql import types as T

    if isinstance(raw.schema["ts"].dataType, T.LongType):
        year_later = F.col("ts") + F.lit(365 * 86_400 * 10**9)
    else:
        year_later = F.col("ts") + F.expr("INTERVAL 365 DAYS")
    sentinel = raw.limit(1).select(
        F.col("event_id"),
        year_later.alias("ts"),
        F.lit(999_999).cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    # write to a scratch dir, then surface the part file at the TOP level:
    # the file stream source ignores non-partition subdirectories.
    scratch = tmp_path / "sentinel_scratch"
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(scratch))
    part = next(scratch.glob("part-*.parquet"))
    shutil.move(str(part), str(src_dir / "z_sentinel.parquet"))

    schema = raw.schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    stream = with_ts_from_nanos(stream, "ts").select("user_id", "ts")
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("session_mem")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    streamed = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("session_mem").collect()
        if r["user_id"] != 999_999
    }

    batch = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessionize(events, key="user_id", time_col="ts", gap_minutes=30).collect()
    }
    assert streamed == batch


def test_apply_in_pandas_with_state_running_stats(spark, tmp_path):
    """Custom stateful operator: per-user running totals must survive across
    micro-batches (two files, maxFilesPerTrigger=1) and end equal to the
    batch aggregate."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.sources.readers import (
        load_tables,
        with_ts_from_nanos,
    )
    from s3_to_redshift_with_airflow_spark.streaming.stateful import (
        run_stateful_to_memory,
        running_user_stats,
    )

    src_dir = tmp_path / "stateful_src"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "a.parquet")
    raw = spark.read.parquet(str(src_dir / "a.parquet"))
    # second batch: the same events with shifted ids/values (forces every
    # user's state to be read back and updated in batch 2)
    scratch = tmp_path / "b_scratch"
    raw.withColumn("value", F.col("value") * 2).coalesce(1).write.parquet(str(scratch))
    shutil.move(str(next(scratch.glob("part-*.parquet"))), str(src_dir / "b.parquet"))

    stream = (
        spark.readStream.format("parquet")
        .schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    stream = with_ts_from_nanos(stream, "ts").select("user_id", "value")
    run_stateful_to_memory(running_user_stats(stream), "running_stats_mem")

    # memory sink in update mode appends one row per (key, batch) — the row
    # with the max n_events per user is the final state
    out = spark.table("running_stats_mem")
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.orderBy("user_id", "n_events").collect()
    }

    both = spark.read.parquet(str(src_dir / "a.parquet"), str(src_dir / "b.parquet"))
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in both.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, total) in expected.items():
        fn, ftotal = final[uid]
        assert fn == n
        assert ftotal == pytest.approx(total, rel=1e-9)


def test_streaming_session_window_matches_batch(spark, events_dir):
    """F.session_window runs the same plan under Structured Streaming with
    watermark-bounded session state. A session is emitted once the watermark
    passes its close (last event + gap); compare against the batch
    session_window restricted to sessions closed before the final
    watermark."""
    gap = "30 minutes"
    stream = stream_source(spark, events_dir, EVENTS_SCHEMA)
    agg = (
        stream  # stream_source already applies the 2-hour watermark
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n_events",
        )
    )
    run_to_memory(agg, "sess_out")
    got = {
        (r["user_id"], r["s"], r["e"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    events = spark.read.parquet(events_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - WATERMARK
    expected = {
        (r["user_id"], r["s"], r["e"]): r["n_events"]
        for r in events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n_events",
        )
        .filter(F.col("e") <= F.lit(cutoff))
        .collect()
    }
    assert expected  # sanity: closed sessions must exist
    assert got == expected


def test_watermark_drops_beyond_late_rows(spark, tmp_path):
    """Late-data contract of the 2-hour watermark (§2.10; the reference's
    2-hour lookback, extract_stream_data.py:168): once the watermark has
    advanced to max(ts) - 2h, rows arriving BEFORE it are dropped from the
    windowed aggregate, while late rows still inside the watermark land in
    their window.

    Deterministic two-batch construction: two availableNow runs over the
    same checkpoint — run 1 sees only file A (sets the watermark, which the
    checkpoint persists and the restarted query recovers), run 2 sees only
    the late file B. An update-mode foreachBatch sink (checkpoint-
    recoverable, unlike the memory sink) exposes exactly which windows each
    run touched."""
    from datetime import datetime

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")

    def t(h, m):
        return datetime(2024, 1, 1, h, m)

    def run():
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        stream = stream_source(spark, str(src), EVENTS_SCHEMA, watermark="2 hours")
        (
            windowed_kpis(stream, value_col=None)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return {r["window_start"].hour: r["n_events"] for r in rows}

    batch_a = [
        (1, t(0, 10), 1, "play", 1.0),
        (2, t(0, 20), 2, "play", 1.0),
        (3, t(1, 10), 1, "play", 1.0),
        (4, t(4, 10), 3, "play", 1.0),
        (5, t(5, 30), 4, "play", 1.0),  # max ts → watermark 03:30 after run 1
    ]
    spark.createDataFrame(batch_a, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    assert run() == {0: 2, 1: 1, 4: 1, 5: 1}

    batch_b = [
        (6, t(1, 20), 5, "play", 1.0),  # 01:20 < 03:30 → beyond watermark
        (7, t(4, 20), 6, "play", 1.0),  # 04:20 ≥ 03:30 → late but admitted
    ]
    spark.createDataFrame(batch_b, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    updated = run()
    assert updated.get(4) == 2, "in-watermark late row must land in its window"
    assert 1 not in updated, "beyond-watermark late row must be dropped"


def test_transform_with_state_running_stats(spark, tmp_path):
    """Spark 4 transformWithStateInPandas twin of the applyInPandasWithState
    operator: ValueState-backed per-user running totals across two
    micro-batches (RocksDB state store, the provider the API requires) must
    end equal to the batch aggregate."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.sources.readers import (
        with_ts_from_nanos,
    )
    from s3_to_redshift_with_airflow_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        has_tws_runtime,
        run_stateful_to_memory,
        running_user_stats_tws,
    )

    if not has_tws_runtime():
        import pytest

        pytest.skip(
            "transformWithStateInPandas runtime unavailable (API or "
            "protobuf missing in this environment)"
        )

    src_dir = tmp_path / "tws_src"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "a.parquet")
    raw = spark.read.parquet(str(src_dir / "a.parquet"))
    scratch = tmp_path / "tws_scratch"
    raw.withColumn("value", F.col("value") * 2).coalesce(1).write.parquet(str(scratch))
    shutil.move(str(next(scratch.glob("part-*.parquet"))), str(src_dir / "b.parquet"))

    stream = (
        spark.readStream.format("parquet")
        .schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    stream = with_ts_from_nanos(stream, "ts").select("user_id", "value")

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, ROCKSDB_PROVIDER)
    try:
        run_stateful_to_memory(running_user_stats_tws(stream), "tws_mem")
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)

    out = spark.table("tws_mem")
    final = {}
    for r in out.orderBy("user_id", "n_events").collect():
        final[r["user_id"]] = (r["n_events"], r["total_value"])

    both = spark.read.parquet(str(src_dir / "a.parquet"), str(src_dir / "b.parquet"))
    expected = {
        r["user_id"]: (r["n"], float(r["total"]))
        for r in both.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, total) in expected.items():
        fn, ftotal = final[uid]
        assert fn == n
        assert abs(ftotal - total) < 1e-6


def test_transform_with_state_plan_builds(spark, tmp_path):
    """Plumbing check that needs no protobuf runtime: the
    transformWithStateInPandas plan must build and carry the declared
    output schema (execution itself is gated by has_tws_runtime)."""
    from s3_to_redshift_with_airflow_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        running_user_stats_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        import pytest

        pytest.skip("pyspark without transformWithStateInPandas")

    spark.createDataFrame(
        [(1, 1.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(str(tmp_path / "ev"))
    schema = spark.read.parquet(str(tmp_path / "ev")).schema
    src = spark.readStream.schema(schema).parquet(str(tmp_path / "ev"))
    out = running_user_stats_tws(src)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "total_value",
    ]


def test_sized_state_partitions_sizing_and_restore(spark):
    """State-partition sizing: floor with no/empty input, byte-proportional
    with a real file, clamped to the session ceiling; session conf is
    restored on exit (streaming has no AQE, so this knob is deliberate)."""
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        sized_state_partitions,
    )

    from .conftest import SF_SMOKE

    before = spark.conf.get("spark.sql.shuffle.partitions")
    ev = f"{SF_SMOKE}/events.parquet"
    with sized_state_partitions(spark) as n:
        assert n == 4  # no paths -> floor
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # 1 byte per partition -> want = file bytes -> clamped to session ceiling
    with sized_state_partitions(spark, ev, bytes_per_partition=1) as n:
        assert n == int(before)
    # a missing path contributes zero bytes
    with sized_state_partitions(spark, "/nonexistent/nope.parquet") as n:
        assert n == 4
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


@pytest.mark.slow
def test_foreach_batch_cdc_scd2_multi_epoch_versions(spark):
    """Streaming CDC→SCD2 across TWO epochs (maxFilesPerTrigger=1): a key
    updated in both epochs records one version per epoch (the batch
    pipeline, compacting globally, would record only the final one — the
    documented cross-batch semantics), deletes close without a successor,
    and each epoch stamps its own deterministic effective timestamp."""
    import os
    import time

    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_cdc_scd2,
    )

    base = tempfile.mkdtemp(prefix="cdc_scd2_stream_")
    ops_dir = f"{base}/ops"
    target = f"{base}/dim"
    os.makedirs(ops_dir)
    schema = (
        "user_id long, ts string, event_id long, state_value double,"
        " op string"
    )
    t = lambda d, h: f"2024-01-{d:02d} {h:02d}:00:00"  # noqa: E731
    def _write_batch(rows, name):
        # FileStreamSource wants bare files (nested non-partition dirs are
        # ignored): write to scratch, move the single part file in.
        import glob as _glob

        scratch = f"{base}/scratch_{name}"
        spark.createDataFrame(rows, schema).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_id", "state_value", "op",
        ).coalesce(1).write.parquet(scratch)
        part = _glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, f"{ops_dir}/{name}.parquet")

    _write_batch([(1, t(10, 1), 1, 2.0, "U"), (3, t(10, 2), 2, 30.0, "I")], "b1")
    time.sleep(1.2)  # distinct mtimes -> deterministic file order
    _write_batch([(1, t(20, 1), 3, 3.0, "U"), (2, t(20, 2), 4, 0.0, "D")], "b2")

    dim_schema = (
        "user_id long, state_value double, valid_from string, valid_to string"
    )
    spark.createDataFrame(
        [(1, 1.0, "2024-01-01", None), (2, 20.0, "2024-01-01", None)],
        dim_schema,
    ).select(
        "user_id", "state_value",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    ).write.parquet(target)

    ops_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("state_value", T.DoubleType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = (
        spark.readStream.format("parquet")
        .schema(ops_schema)
        .option("maxFilesPerTrigger", "1")
        .load(ops_dir)
    )
    sink = foreach_batch_cdc_scd2(
        target,
        keys=["user_id"],
        attrs=["state_value"],
        order_cols=["ts", "event_id"],
        effective_for=lambda e: f"2024-06-{e + 1:02d}",
    )
    (
        src.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
        .awaitTermination()
    )
    rows = {
        (r["user_id"], r["state_value"], str(r["valid_from"])[:10]): (
            str(r["valid_to"])[:10] if r["valid_to"] is not None else None
        )
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {
        (1, 1.0, "2024-01-01"): "2024-06-01",  # epoch-1 close
        (1, 2.0, "2024-06-01"): "2024-06-02",  # epoch-1 version, epoch-2 close
        (1, 3.0, "2024-06-02"): None,          # epoch-2 version, open
        (2, 20.0, "2024-01-01"): "2024-06-02", # delete-exit in epoch 2
        (3, 30.0, "2024-06-01"): None,         # new key from epoch 1
    }
    shutil.rmtree(base, ignore_errors=True)


def test_foreach_batch_kmv_multi_epoch_equals_batch_build(spark, tmp_path):
    """Streaming KMV maintenance across TWO micro-batches (two files,
    maxFilesPerTrigger=1) must leave the stored sketch bit-identical to a
    batch build over all rows — the mergeability contract under real
    epoch partitioning, not just the single-epoch case the registry query
    exercises."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_sketch_table,
    )
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_kmv_maintain,
    )

    src_dir = tmp_path / "kmv_src"
    src_dir.mkdir()
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    half_a = raw.filter(F.col("user_id") % 2 == 0)
    half_b = raw.filter(F.col("user_id") % 2 == 1)
    for name, df in [("a", half_a), ("b", half_b)]:
        scratch = tmp_path / f"{name}_scratch"
        df.coalesce(1).write.parquet(str(scratch))
        shutil.move(
            str(next(scratch.glob("part-*.parquet"))),
            str(src_dir / f"{name}.parquet"),
        )

    target = str(tmp_path / "sketch")
    spark.createDataFrame(
        [], "g string, hs array<bigint>, n_kept bigint"
    ).write.parquet(target)

    stream = (
        spark.readStream.format("parquet")
        .schema(half_a.schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    (
        stream.writeStream.foreachBatch(
            foreach_batch_kmv_maintain(
                target, key_col="user_id", group_col="event_type", k=32
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_kmv_t_"))
        .start()
        .awaitTermination()
    )

    got = sorted(
        (r.g, tuple(r.hs), r.n_kept)
        for r in spark.read.parquet(target).collect()
    )
    want = sorted(
        (r.g, tuple(r.hs), r.n_kept)
        for r in kmv_sketch_table(raw, "user_id", "event_type", k=32).collect()
    )
    assert got == want


def test_foreach_batch_mg_multi_epoch_guarantee(spark, tmp_path):
    """Streaming MG across TWO micro-batches: the stored summary is a
    VALID MG summary of everything seen — underestimate-only and the
    planted heavy key (35% of the stream >> n/(k+1)) survives with the
    summed-offset bound — though not necessarily bit-equal to the batch
    build (unlike KMV, whose merge is lossless; the single-epoch
    registry oracle pins bit-equality there)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_mg_maintain,
    )

    n, k = 8_000, 9
    rows = spark.range(n).select(
        F.when(F.col("id") % 20 < 7, F.lit(0))
        .otherwise((F.col("id") % 300) + 10)
        .alias("key"),
        (F.col("id") % 2).alias("half"),
    )
    src_dir = tmp_path / "mg_src"
    src_dir.mkdir()
    for h in (0, 1):
        scratch = tmp_path / f"h{h}_scratch"
        rows.filter(F.col("half") == h).drop("half").coalesce(1).write.parquet(
            str(scratch)
        )
        shutil.move(
            str(next(scratch.glob("part-*.parquet"))),
            str(src_dir / f"h{h}.parquet"),
        )

    target = str(tmp_path / "summary")
    spark.createDataFrame([], "key bigint, counter bigint").write.parquet(target)
    stream = (
        spark.readStream.format("parquet")
        .schema("key bigint")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    (
        stream.writeStream.foreachBatch(
            foreach_batch_mg_maintain(target, key_col="key", k=k)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_mg_t_"))
        .start()
        .awaitTermination()
    )
    got = {r.key: r.counter for r in spark.read.parquet(target).collect()}
    exact = {
        r.key: r.cnt
        for r in rows.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert 0 in got  # 2800 of 8000 >> n/(k+1) = 800: must survive
    for key, est in got.items():
        assert est <= exact[key]
        # 2 part offsets + 1 merge offset, each <= n/(k+1)
        assert exact[key] - est <= 3 * (n // (k + 1))


def test_streaming_semi_join_no_fanout(spark, tmp_path):
    """A click matched by TWO purchases in its window must appear exactly
    once (the semi join's whole point vs inner-join fan-out), an
    unconverted click not at all."""
    import datetime
    import os

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid, typ):
        return (
            eid,
            t0 + datetime.timedelta(minutes=minutes),
            uid,
            typ,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 0, 1, "click"),        # converts twice -> ONE output row
        ev(2, 10, 1, "purchase"),
        ev(3, 20, 1, "purchase"),
        ev(4, 0, 2, "click"),        # no purchase -> absent
        ev(5, 0, 3, "click"),        # purchase outside the hour -> absent
        ev(6, 90, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path)
    # the file stream's glob expects events.parquet to be a FILE
    import glob
    import shutil

    scratch = os.path.join(d, "scratch")
    df.coalesce(1).write.parquet(scratch)
    shutil.move(
        glob.glob(os.path.join(scratch, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    got = [
        (r.click_id, r.user_id)
        for r in REGISTRY["streaming_semi_join"].fn(spark, d).collect()
    ]
    assert got == [(1, 1)]


def test_foreach_batch_histogram_multi_epoch_bit_equal(spark, tmp_path):
    """Streaming histogram maintenance across TWO micro-batches must be
    BIT-IDENTICAL to the batch build (merge is pure addition — the
    strongest multi-epoch contract of the four stored-artifact
    consumers)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        value_histogram,
    )
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        with_ts_from_nanos,
    )
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_histogram_maintain,
    )

    src_dir = tmp_path / "hist_src"
    src_dir.mkdir()
    raw = with_ts_from_nanos(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"), "ts"
    ).select("event_type", "ts", "value", "event_id")
    for h in (0, 1):
        scratch = tmp_path / f"h{h}_scratch"
        raw.filter(F.col("event_id") % 2 == h).coalesce(1).write.parquet(
            str(scratch)
        )
        shutil.move(
            str(next(scratch.glob("part-*.parquet"))),
            str(src_dir / f"h{h}.parquet"),
        )

    target = str(tmp_path / "hist")
    spark.createDataFrame(
        [], "event_type string, day date, bucket bigint, n bigint"
    ).write.parquet(target)
    stream = (
        spark.readStream.format("parquet")
        .schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    (
        stream.writeStream.foreachBatch(
            foreach_batch_histogram_maintain(
                target, grain_cols=["event_type"], width=8.0
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_hist_t_"))
        .start()
        .awaitTermination()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    want = sorted(
        tuple(r)
        for r in value_histogram(
            raw, "value", ["event_type"], "ts", 8.0
        ).collect()
    )
    assert got == want
