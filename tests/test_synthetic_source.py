"""Spark 4 Python DataSource: the deterministic synthetic-events generator
(sources/synthetic.py). Registry query synthetic_source_agg carries the
exact md5-regeneration oracle; here we pin the source-level contracts."""

from __future__ import annotations

import pytest

from s3_to_redshift_with_airflow_spark.sources.synthetic import register


def _load(spark, rows=200, parts=3, **opts):
    register(spark)
    r = (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", rows)
        .option("num_partitions", parts)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_parallelism(spark):
    df = _load(spark, rows=200, parts=3)
    assert df.count() == 600
    assert df.rdd.getNumPartitions() == 3
    assert df.select("event_id").distinct().count() == 600


def test_deterministic_across_reads_and_reregistration(spark):
    a = sorted(map(tuple, _load(spark, rows=100, parts=2).collect()))
    b = sorted(map(tuple, _load(spark, rows=100, parts=2).collect()))
    assert a == b
    assert len(a) == 200


def test_seed_changes_data(spark):
    a = {t for t in map(tuple, _load(spark, rows=50, parts=1).collect())}
    b = {t for t in map(tuple, _load(spark, rows=50, parts=1, seed=7).collect())}
    assert a != b


def test_feeds_event_time_pipeline(spark):
    """Generated ts is a real timestamp: the windowed-aggregation operators
    accept the synthetic stream directly (the load-gen contract)."""
    from pyspark.sql import functions as F

    df = _load(spark, rows=300, parts=2)
    out = (
        df.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in out) == 600
    assert all(r["window"]["start"] is not None for r in out)


@pytest.mark.slow
def test_stream_reader_trigger_once_and_replay(spark, tmp_path):
    """Streaming half of the DataSource: trigger-once processes exactly one
    batch; a fresh checkpoint replays batch 0 byte-identically (the
    replayable-source property exactly-once sinks rely on)."""
    register(spark)

    def one_batch(ck, out):
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 40)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(map(tuple, spark.read.parquet(str(out)).collect()))

    a = one_batch(tmp_path / "ck_a", tmp_path / "out_a")
    assert len(a) == 40
    b = one_batch(tmp_path / "ck_b", tmp_path / "out_b")
    assert a == b  # fresh checkpoint ⇒ identical batch 0

    # same checkpoint again ⇒ recovery appends the NEXT batch, disjoint ids
    both = one_batch(tmp_path / "ck_a", tmp_path / "out_a")
    ids = [r[0] for r in both]
    assert len(ids) == len(set(ids)) == 80
    assert set(r[0] for r in a) < set(ids)
