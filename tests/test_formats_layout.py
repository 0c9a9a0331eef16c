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


def test_dynamic_partition_overwrite_rerun(spark, tmp_path_factory):
    """Day-scoped rerun at the file layout level: a dynamic overwrite of one
    day's partition must replace exactly that day and leave other days'
    files untouched (the static default would truncate the whole table)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.sources.writers import (
        write_date_partitioned,
    )

    path = str(tmp_path_factory.mktemp("dyn") / "t")
    schema = "event_id long, ts timestamp, value double"
    full = spark.createDataFrame(
        [
            (1, datetime(2024, 6, 25, 8), 1.0),
            (2, datetime(2024, 6, 25, 9), 2.0),
            (3, datetime(2024, 6, 26, 8), 3.0),
        ],
        schema,
    )
    write_date_partitioned(full, path)

    rerun = spark.createDataFrame(
        [(2, datetime(2024, 6, 25, 9), 20.0)], schema
    )
    write_date_partitioned(rerun, path, dynamic=True)

    out = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(path).collect()
    }
    # day 25 fully replaced by the rerun frame; day 26 untouched
    assert out == {2: 20.0, 3: 3.0}
    # and the pruned read only lists the one partition directory
    one_day = spark.read.parquet(path).filter(
        F.col("event_date") == "2024-06-26"
    )
    assert one_day.count() == 1
