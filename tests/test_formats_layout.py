"""Source/sink format parity (JSONL, ORC) and the range-partitioned
data-skipping layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.sources.readers import (
    load_tables,
    read_jsonl,
    read_orc,
)
from s3_to_redshift_with_airflow_spark.sources.writers import (
    write_jsonl,
    write_orc,
    write_range_partitioned,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    (ev,) = load_tables(spark, SF_SMOKE, "events")
    return ev


def _sorted_rows(df, cols):
    return df.select(*cols).orderBy(*cols).collect()


def test_jsonl_roundtrip(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    write_jsonl(events.select(*cols), path)
    back = read_jsonl(
        spark, path, "event_id long, user_id long, event_type string, value double"
    )
    assert _sorted_rows(back, cols) == _sorted_rows(events, cols)


def test_orc_roundtrip_and_pushdown(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "events")
    write_orc(events, path)
    back = read_orc(spark, path)
    cols = ["event_id", "user_id", "event_type", "value"]
    assert _sorted_rows(back, cols) == _sorted_rows(events, cols)
    # predicate reaches the ORC scan (PushedFilters), like parquet
    plan = (
        back.filter(F.col("user_id") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in plan


def test_range_partitioned_files_are_disjoint(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("range") / "events")
    write_range_partitioned(events, path, sort_col="event_id", n_files=8)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    # each file owns a disjoint event_id interval → min/max stats prune
    for (_, prev_hi), (lo, _) in zip(spans, spans[1:]):
        assert prev_hi < lo
    # row count preserved
    assert spark.read.parquet(path).count() == events.count()
