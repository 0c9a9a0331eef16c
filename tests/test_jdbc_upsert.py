"""JDBC upsert sink, end-to-end against embedded Derby (bundled with Spark).

Exercises the full protocol: parallel staging write → transactional
DELETE+INSERT → read-back — the reference's warehouse load
(load_to_redshift.py:158-315) without a warehouse."""

from __future__ import annotations

import pytest

from s3_to_redshift_with_airflow_spark.sinks.jdbc_upsert import (
    copy_sql,
    read_table,
    upsert_sql,
    write_upsert,
)

URL = "jdbc:derby:memory:upsert_test;create=true"
STAGING_TYPES = "genre VARCHAR(255), day VARCHAR(10)"
DDL = (
    "CREATE TABLE genre_kpis ("
    '"genre" VARCHAR(255), "day" VARCHAR(10), "total_streams" BIGINT)'
)


def test_upsert_sql_shape():
    stmts = upsert_sql("t", "s", ["k1", "k2"], ["k1", "k2", "v"])
    assert stmts[0] == (
        "DELETE FROM t WHERE EXISTS "
        '(SELECT 1 FROM s WHERE t."k1" = s."k1" AND t."k2" = s."k2")'
    )
    assert stmts[1] == 'INSERT INTO t ("k1", "k2", "v") SELECT "k1", "k2", "v" FROM s'


def test_write_upsert_roundtrip_and_idempotency(spark):
    day1 = spark.createDataFrame(
        [("rock", "2024-06-25", 10), ("jazz", "2024-06-25", 5)],
        '`genre` string, `day` string, `total_streams` long',
    )
    write_upsert(day1, URL, "genre_kpis", keys=["genre", "day"], create_target_ddl=DDL,
                 staging_column_types=STAGING_TYPES)
    out = {
        (r["genre"], r["day"]): r["total_streams"]
        for r in read_table(spark, URL, "genre_kpis").collect()
    }
    assert out == {("rock", "2024-06-25"): 10, ("jazz", "2024-06-25"): 5}

    # rerun with updated values + a new key: updates replace, others survive
    day1b = spark.createDataFrame(
        [("rock", "2024-06-25", 12), ("pop", "2024-06-25", 7)],
        '`genre` string, `day` string, `total_streams` long',
    )
    write_upsert(day1b, URL, "genre_kpis", keys=["genre", "day"],
                 staging_column_types=STAGING_TYPES)
    out = {
        (r["genre"], r["day"]): r["total_streams"]
        for r in read_table(spark, URL, "genre_kpis").collect()
    }
    assert out == {
        ("rock", "2024-06-25"): 12,
        ("jazz", "2024-06-25"): 5,
        ("pop", "2024-06-25"): 7,
    }

    # a second day's load never touches day 1 (day-scoped idempotency)
    day2 = spark.createDataFrame(
        [("rock", "2024-06-26", 3)], '`genre` string, `day` string, `total_streams` long'
    )
    write_upsert(day2, URL, "genre_kpis", keys=["genre", "day"],
                 staging_column_types=STAGING_TYPES)
    assert read_table(spark, URL, "genre_kpis").count() == 4


def test_upsert_sql_day_scope_clause():
    stmts = upsert_sql("t", "s", ["genre"], ["genre", "v"], scope_date_col="date_processed")
    assert stmts[0] == (
        "DELETE FROM t WHERE EXISTS "
        '(SELECT 1 FROM s WHERE t."genre" = s."genre" AND '
        'CAST(t."date_processed" AS DATE) = CAST(s."date_processed" AS DATE))'
    )


def test_warehouse_table_ddl_layout_clauses():
    from s3_to_redshift_with_airflow_spark.sinks.jdbc_upsert import warehouse_table_ddl

    ddl = warehouse_table_ddl(
        "genre_kpis",
        {"genre": "VARCHAR(255)", "total_streams": "BIGINT", "date_processed": "TIMESTAMP"},
        primary_key=["genre", "date_processed"],
        distkey="genre",
        sortkey=["date_processed"],
    )
    # the reference's physical layout (load_to_redshift.py:81-104)
    assert 'DISTSTYLE KEY DISTKEY ("genre")' in ddl
    assert 'SORTKEY ("date_processed")' in ddl
    assert 'PRIMARY KEY ("genre", "date_processed")' in ddl
    # plain ANSI when no layout is requested (Derby-compatible)
    plain = warehouse_table_ddl("t", {"a": "BIGINT"})
    assert plain == 'CREATE TABLE t ("a" BIGINT)'


def test_write_upsert_day_scoped_rerun(spark):
    """The reference's actual rerun contract (load_to_redshift.py:187-201):
    same-day rerun replaces that day's rows per key; other days' rows for the
    SAME key survive (key alone is not the delete scope)."""
    url = "jdbc:derby:memory:dayscope_test;create=true"
    ddl = (
        "CREATE TABLE genre_kpis ("
        '"genre" VARCHAR(255), "date_processed" TIMESTAMP, "total_streams" BIGINT)'
    )
    types = "genre VARCHAR(255), date_processed TIMESTAMP"
    schema = "`genre` string, `date_processed` timestamp, `total_streams` long"
    from datetime import datetime

    d1a = datetime(2024, 6, 25, 8, 0, 0)
    d1b = datetime(2024, 6, 25, 17, 30, 0)  # same day, later run
    d2 = datetime(2024, 6, 26, 8, 0, 0)

    first = spark.createDataFrame([("rock", d1a, 10), ("jazz", d1a, 5)], schema)
    write_upsert(first, url, "genre_kpis", keys=["genre"], create_target_ddl=ddl,
                 staging_column_types=types, scope_date_col="date_processed")

    nextday = spark.createDataFrame([("rock", d2, 3)], schema)
    write_upsert(nextday, url, "genre_kpis", keys=["genre"],
                 staging_column_types=types, scope_date_col="date_processed")

    # rerun day 1 at a different time-of-day: replaces day-1 rock, keeps day-2 rock
    rerun = spark.createDataFrame([("rock", d1b, 12)], schema)
    write_upsert(rerun, url, "genre_kpis", keys=["genre"],
                 staging_column_types=types, scope_date_col="date_processed")

    out = {
        (r["genre"], r["date_processed"].date().isoformat()): r["total_streams"]
        for r in read_table(spark, url, "genre_kpis").collect()
    }
    assert out == {
        ("rock", "2024-06-25"): 12,
        ("jazz", "2024-06-25"): 5,
        ("rock", "2024-06-26"): 3,
    }


def test_post_load_quality_checks(spark):
    from s3_to_redshift_with_airflow_spark.sinks.jdbc_upsert import (
        post_load_quality_checks,
    )

    url = "jdbc:derby:memory:quality_test;create=true"
    ddl = (
        "CREATE TABLE kpis ("
        '"genre" VARCHAR(255), "day" VARCHAR(10), "total_streams" BIGINT)'
    )
    df = spark.createDataFrame(
        [("rock", "2024-06-25", 10), ("jazz", "2024-06-24", 7)],
        "`genre` string, `day` string, `total_streams` long",
    )
    write_upsert(df, url, "kpis", keys=["genre", "day"], create_target_ddl=ddl,
                 staging_column_types="genre VARCHAR(255), day VARCHAR(10)")
    # Inject a null-critical row via plain SQL (Derby's JDBC dialect cannot
    # stage NULL StringType — it setNulls as CLOB; warehouse nulls themselves
    # read back fine, which is what V11 checks).
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("INSERT INTO kpis VALUES (NULL, '2024-06-25', 5)")
    st.close()
    conn.close()

    res = post_load_quality_checks(
        spark, url, "kpis", ["genre"], scope_col="day", scope_value="2024-06-25"
    )
    assert res == {"row_count": 2, "null_criticals": 1, "passed": False}

    res_ok = post_load_quality_checks(
        spark, url, "kpis", ["genre"], scope_col="day", scope_value="2024-06-24"
    )
    assert res_ok == {"row_count": 1, "null_criticals": 0, "passed": True}


def test_copy_sql_reference_shape():
    """The key-pair form reproduces the reference's COPY statement clauses
    (load_to_redshift.py:133-156): CSV, IGNOREHEADER 1, DATEFORMAT/TIMEFORMAT
    'auto', credentials inline."""
    sql = copy_sql(
        "music_kpis",
        "s3://bucket/staging/run1/",
        access_key_id="AKIA_TEST",
        secret_access_key="SECRET_TEST",
    )
    assert sql.startswith("COPY music_kpis")
    assert "FROM 's3://bucket/staging/run1/'" in sql
    assert "ACCESS_KEY_ID 'AKIA_TEST'" in sql
    assert "SECRET_ACCESS_KEY 'SECRET_TEST'" in sql
    assert "CSV" in sql and "IGNOREHEADER 1" in sql
    assert "DATEFORMAT 'auto'" in sql and "TIMEFORMAT 'auto'" in sql


def test_copy_sql_iam_role_and_options():
    sql = copy_sql(
        "t",
        "s3://b/p",
        iam_role="arn:aws:iam::123:role/load",
        region="us-east-1",
        extra_options="MAXERROR 10",
    )
    assert "IAM_ROLE 'arn:aws:iam::123:role/load'" in sql
    assert "ACCESS_KEY_ID" not in sql
    assert "REGION 'us-east-1'" in sql and "MAXERROR 10" in sql


def test_copy_sql_requires_exactly_one_credential_form():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        copy_sql("t", "s3://b")
    with _pytest.raises(ValueError):
        copy_sql(
            "t", "s3://b", iam_role="r", access_key_id="a", secret_access_key="s"
        )


def test_write_upsert_copy_path_requires_staging_ddl(spark):
    from s3_to_redshift_with_airflow_spark.sinks.jdbc_upsert import write_upsert

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="staging_create_ddl"):
        write_upsert(
            df,
            url="jdbc:derby:memory:nope;create=true",
            target_table="t",
            keys=["id"],
            staging_s3_path="/tmp/does-not-matter",
        )


def test_unload_sql_shape():
    from s3_to_redshift_with_airflow_spark.sinks.jdbc_upsert import unload_sql

    sql = unload_sql(
        "SELECT genre, total_plays FROM genre_kpis WHERE day = '2024-01-01'",
        "s3://bucket/export/kpis_",
        iam_role="arn:aws:iam::123:role/unload",
    )
    assert sql.startswith("UNLOAD ('SELECT genre")
    assert "TO 's3://bucket/export/kpis_'" in sql
    assert "FORMAT AS PARQUET" in sql and "PARALLEL ON" in sql
    # embedded quotes in the query must be doubled, not raw
    quoted = unload_sql(
        "SELECT * FROM t WHERE d = 'x'", "s3://b/p", iam_role="r"
    )
    assert "d = ''x''" in quoted
    with pytest.raises(ValueError):
        unload_sql("SELECT 1", "s3://b/p")
