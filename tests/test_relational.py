from __future__ import annotations

from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.relational import (
    dedup_full,
    default_fill_missing,
    mode_per_group,
    topk_per_group,
    upsert_dataframe,
)


def test_mode_per_group_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g2", "z")],
        "g string, v string",
    )
    rows = {r["g"]: r["v_mode"] for r in mode_per_group(df, ["g"], "v").collect()}
    assert rows == {"g1": "a", "g2": "z"}  # tie 2-2 → smallest value


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g", 3, 1), ("g", 2, 2), ("g", 2, 3), ("g", 1, 4)], "g string, v long, id long"
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=2).collect()
    assert [(r["v"], r["id"]) for r in out] == [(3, 1), (2, 2)]


def test_dedup_full(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k long, v string")
    assert dedup_full(df).count() == 2


def test_default_fill_missing(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = default_fill_missing(df, {"k": 9, "n": 0, "s": ""})
    row = out.collect()[0]
    assert row["k"] == 1 and row["n"] == 0 and row["s"] == ""


def test_upsert_dataframe(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame([(2, 99), (3, 30)], "k long, v long")
    out = {r["k"]: r["v"] for r in upsert_dataframe(target, source, ["k"]).collect()}
    assert out == {1: 10, 2: 99, 3: 30}


def test_scd2_apply_idempotent_and_null_safe(spark):
    from s3_to_redshift_with_airflow_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, 10.0, "2024-01-01 00:00:00", None),
            (2, None, "2024-01-01 00:00:00", None),  # open row with NULL attr
            (1, 5.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),  # history
        ],
        "k long, v double, valid_from string, valid_to string",
    ).select(
        "k", "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, 20.0), (2, 2.0), (3, 30.0)], "k long, v double"
    )

    def snap(df):
        return {
            (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]))
            for r in df.collect()
        }

    once = scd2_apply(dim, updates, ["k"], ["v"], "2024-06-01 00:00:00")
    got = snap(once)
    assert got == {
        (1, 5.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),   # history kept
        (1, 10.0, "2024-01-01 00:00:00", "2024-06-01 00:00:00"),  # closed
        (1, 20.0, "2024-06-01 00:00:00", "None"),                 # new version
        (2, None, "2024-01-01 00:00:00", "2024-06-01 00:00:00"),  # NULL->2.0 closes
        (2, 2.0, "2024-06-01 00:00:00", "None"),
        (3, 30.0, "2024-06-01 00:00:00", "None"),                 # brand-new key
    }
    # idempotency: the same delta applied to the merged result is a no-op
    twice = scd2_apply(once, updates, ["k"], ["v"], "2024-07-01 00:00:00")
    assert snap(twice) == got
