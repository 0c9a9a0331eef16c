"""Loader warehouse shaping (P6/P7/P8) + file archive ops (S11/S12)."""

from __future__ import annotations

import datetime as dt
import os

from s3_to_redshift_with_airflow_spark.operators.kpi import prepare_hourly_for_warehouse
from s3_to_redshift_with_airflow_spark.sources.writers import archive_files


def test_prepare_hourly_defaults_and_anchor(spark):
    hourly = spark.createDataFrame(
        [(0, 10, "t1", 0.5), (23, 4, "t2", 1.0)],
        "hour bigint, unique_listeners bigint, top_artists string, track_diversity_index double",
    )
    out = prepare_hourly_for_warehouse(hourly, anchor_date="2024-06-25")
    rows = {r["hour"]: r for r in out.collect()}
    # P6: total_streams = unique_listeners * 2 when absent
    assert rows[0]["total_streams"] == 20
    assert rows[23]["total_streams"] == 8
    # P8: absent expected columns default-filled
    assert rows[0]["unique_songs"] == 0
    assert rows[0]["avg_stream_duration"] == 0
    # P7: int hour re-anchored onto the calendar day
    assert rows[0]["hour_ts"] == dt.datetime(2024, 6, 25, 0, 0)
    assert rows[23]["hour_ts"] == dt.datetime(2024, 6, 25, 23, 0)


def test_prepare_hourly_keeps_existing_total_streams(spark):
    hourly = spark.createDataFrame(
        [(1, 10, 77)], "hour bigint, unique_listeners bigint, total_streams bigint"
    )
    out = prepare_hourly_for_warehouse(hourly, anchor_date="2024-06-25")
    assert out.collect()[0]["total_streams"] == 77


def test_archive_files_moves_and_is_idempotent(spark, tmp_path):
    staging = tmp_path / "staging"
    staging.mkdir()
    for i in range(3):
        (staging / f"f{i}.csv").write_text("a,b\n1,2\n")
    (staging / "keep.txt").write_text("x")

    moved = archive_files(spark, str(staging), str(tmp_path / "processed"))
    assert len(moved) == 3
    assert sorted(os.listdir(staging)) == ["keep.txt"]
    assert sorted(os.listdir(tmp_path / "processed")) == ["f0.csv", "f1.csv", "f2.csv"]

    # re-run with a fresh file of the same name: replaces the archive copy
    (staging / "f0.csv").write_text("a,b\n9,9\n")
    moved2 = archive_files(spark, str(staging), str(tmp_path / "processed"))
    assert len(moved2) == 1
    assert (tmp_path / "processed" / "f0.csv").read_text() == "a,b\n9,9\n"

    # missing source dir is tolerated like the reference's 404 path
    assert archive_files(spark, str(tmp_path / "nope"), str(tmp_path / "processed")) == []
