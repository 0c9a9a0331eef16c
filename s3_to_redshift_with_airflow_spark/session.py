"""SparkSession factory.

The reference pipeline runs eager single-threaded pandas per Airflow task
(reference: dags/etl/kpi_processor.py:54-96); our engine replaces that with a
single lazy Spark plan per pipeline run. This module centralizes the session
configuration that makes the engine behave well both on local[N] (tests/bench)
and on a large cluster (AQE, skew handling, partial aggregation).

Scale notes (100 TB design):
  - AQE is always on: runtime partition coalescing, skew-join splitting, and
    dynamic broadcast decisions replace hand-tuned shuffle partition counts.
  - `spark.sql.shuffle.partitions` here is only the *initial* number; AQE
    coalesces. On a real cluster set it ~2-3x total cores.
  - Session timezone is pinned to UTC so event-time bucketing (hour()) is
    deterministic and oracle-comparable regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "s3_to_redshift_with_airflow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    Args:
        app_name: Spark application name.
        master: cluster master; defaults to ``local[$SPARK_GRAFT_CPUS]``.
        shuffle_partitions: initial shuffle partition count (AQE coalesces).
        extra_conf: additional config key/values (override defaults).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] / cluster → a safe default AQE will fix up.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = int(inner) if inner.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 16g: measured on the bench box (local[32], 128 GiB) — the heavy
        # LSH/dedup plans run 2-3× slower under an 8g heap from GC pressure
        # alone (bench total 57-62 s at 8g vs 41 s at 16g, same code).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin session settings required for deterministic, engine-comparable
    results (idempotent; safe on a live session).

    - UTC session timezone: event-time bucketing (hour(), date_trunc) must not
      depend on host TZ.
    - nanosAsLong: the driver testdata writes TIMESTAMP(NANOS) parquet, which
      Spark's reader rejects by default; with this legacy flag nanos arrive as
      LongType and sources.readers.with_ts_from_nanos() rebuilds a proper
      timestamp column (floor-division to micros — same truncation DuckDB
      applies when it reads NANOS).
    """
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
