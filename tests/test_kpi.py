"""KPI pipeline semantics on music-domain fixtures (FIXTURES.md F1-F4).

Pins the reference's semantic traps (SURVEY §7.4): inner joins drop orphans,
modal track tie-break = smallest value, hour is hour-of-day, dedup key
includes listen_time.
"""

from __future__ import annotations

import pytest

from s3_to_redshift_with_airflow_spark.operators.kpi import (
    enrich_streams,
    genre_kpis,
    hourly_kpis,
)
from s3_to_redshift_with_airflow_spark.operators.relational import (
    dedup_subset_deterministic,
    drop_null_keys,
)


@pytest.fixture(scope="module")
def music(spark):
    users = spark.createDataFrame(
        [(1, "Ann"), (2, "Bob"), (3, "Cat")], "user_id long, user_name string"
    )
    songs = spark.createDataFrame(
        [
            ("t1", "rock", 200000),
            ("t2", "rock", 100000),
            ("t3", "jazz", 300000),
        ],
        "track_id string, track_genre string, duration_ms long",
    )
    streams = spark.createDataFrame(
        [
            (1, "t1", "2024-06-25 00:01:00"),
            (1, "t2", "2024-06-25 00:02:00"),
            (2, "t2", "2024-06-25 00:03:00"),
            (2, "t3", "2024-06-25 01:00:00"),
            (3, "t3", "2024-06-25 01:30:00"),
            (9, "t1", "2024-06-25 02:00:00"),  # orphan user → dropped by inner join
            (1, "tX", "2024-06-25 02:00:00"),  # orphan track → dropped
        ],
        "user_id long, track_id string, listen_time string",
    )
    return users, songs, streams


def test_enrich_drops_orphans(music):
    users, songs, streams = music
    enriched = enrich_streams(streams, songs, users)
    assert enriched.count() == 5  # 7 events - 2 orphans


def test_genre_kpis_values(music):
    users, songs, streams = music
    rows = {
        r["track_genre"]: r
        for r in genre_kpis(enrich_streams(streams, songs, users)).collect()
    }
    assert rows["rock"]["listen_count"] == 3
    assert rows["rock"]["avg_duration"] == pytest.approx((200000 + 100000 + 100000) / 3)
    assert rows["jazz"]["listen_count"] == 2
    assert rows["jazz"]["avg_duration"] == 300000.0


def test_hourly_kpis_mode_tiebreak_and_diversity(music):
    users, songs, streams = music
    rows = {r["hour"]: r for r in hourly_kpis(enrich_streams(streams, songs, users)).collect()}
    # hour 0: tracks t1,t2,t2 → mode t2; 2 distinct / 3 events
    assert rows[0]["unique_listeners"] == 2
    assert rows[0]["top_artists"] == "t2"
    assert rows[0]["track_diversity_index"] == pytest.approx(2 / 3)
    # hour 1: t3,t3 from two users → tie impossible; mode t3, diversity 1/2
    assert rows[1]["unique_listeners"] == 2
    assert rows[1]["top_artists"] == "t3"
    assert rows[1]["track_diversity_index"] == pytest.approx(0.5)


def test_hourly_mode_tie_prefers_smallest(spark):
    # equal counts → pandas mode() tie-break = smallest value (kpi_processor.py:90)
    streams = spark.createDataFrame(
        [(1, "b", "2024-06-25 03:00:00"), (2, "a", "2024-06-25 03:30:00")],
        "user_id long, track_id string, listen_time string",
    )
    users = spark.createDataFrame([(1, "x"), (2, "y")], "user_id long, user_name string")
    songs = spark.createDataFrame(
        [("a", "rock", 1), ("b", "rock", 1)],
        "track_id string, track_genre string, duration_ms long",
    )
    rows = hourly_kpis(enrich_streams(streams, songs, users)).collect()
    assert rows[0]["top_artists"] == "a"


def test_stream_dedup_key_includes_listen_time(spark):
    # same user+track at different seconds are distinct events (SURVEY §7.4)
    streams = spark.createDataFrame(
        [
            (1, "t1", "2024-06-25 00:01:00"),
            (1, "t1", "2024-06-25 00:01:00"),  # exact dup → removed
            (1, "t1", "2024-06-25 00:02:00"),  # different second → kept
        ],
        "user_id long, track_id string, listen_time string",
    )
    out = dedup_subset_deterministic(streams, ["user_id", "track_id", "listen_time"])
    assert out.count() == 2


def test_drop_null_keys(spark):
    users = spark.createDataFrame(
        [(1, "a"), (None, "b")], "user_id long, user_name string"
    )
    assert drop_null_keys(users, ["user_id"]).count() == 1
