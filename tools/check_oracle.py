"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB against the
same parquet tables, then compares row count, schema (column names), and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage:
    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes a driver-shaped artifact: one record per registry
query with {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err} — the exact shape of the driver's CORRECTNESS_r*.json, so every
registry query (not just the driver's fixed panel) has a committed
correctness record each round (VERDICT r2 "Next round" #1).
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402
from s3_to_redshift_with_airflow_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
    table_path,
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = build_session(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    failures = []
    records: dict[str, dict] = {}

    def record(name, *, rows=None, schema=None, hashm=None, s_rows=None,
               o_rows=None, err=None):
        records[name] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": hashm,
            "spark_rows": s_rows,
            "oracle_rows": o_rows,
            "err": err,
        }

    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, err=f"spark error: {e}"[:500])
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            record(name, s_rows=len(spark_pdf), err="no_oracle")
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, s_rows=len(spark_pdf), err=f"duckdb error: {e}"[:500])
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        a, b = normalize(spark_pdf), normalize(oracle_pdf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            record(name, rows=len(a) == len(b), schema=False, hashm=False,
                   s_rows=len(a), o_rows=len(b))
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            record(name, rows=False, schema=True, hashm=False,
                   s_rows=len(a), o_rows=len(b))
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            continue
        try:
            # Dtype-strict on purpose: the driver's value hash is dtype-
            # sensitive, so a dtype-lenient local gate lets HUGEINT-vs-BIGINT
            # style mismatches escape to the round scoring (VERDICT r1 #2).
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
        except AssertionError as e:
            failures.append(name)
            record(name, rows=True, schema=True, hashm=False,
                   s_rows=len(a), o_rows=len(b))
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            continue
        record(name, rows=True, schema=True, hashm=True,
               s_rows=len(a), o_rows=len(b))
        print(f"ok   {name}: {len(a)} rows exact-match ({time.time()-t0:.1f}s)")

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} queries pass")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
