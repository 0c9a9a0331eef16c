"""Sinks: Parquet/CSV/JSON writers.

Reference behaviors re-expressed:
  - S2 CSV sink (reference: dags/etl/extract_stream_data.py:79-100): pandas
    `to_csv` → one S3 object. Spark writes a directory of part files; for
    byte-level parity with single-object consumers we offer
    `write_csv_single` (coalesce(1) + rename). At scale the directory form is
    the right default — `coalesce(1)` serializes the final stage.
  - S3 JSON report sink (reference: dags/etl/schema_check.py:229-256).
  - Parquet with `partitionBy` is the engine-native staging format, replacing
    the reference's CSV staging area (`data/staging/`): columnar, splittable,
    schema-carrying, and partition-prunable.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-native sink. At 100 TB, partition by a low-cardinality
    time/date column so downstream reads get partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Directory-of-part-files CSV sink (the scalable default)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_csv_single(df: DataFrame, dest_file: str) -> None:
    """Single-file CSV sink for parity with the reference's one-object-per-
    table staging contract (extract_stream_data.py:79-100).

    coalesce(1) forces the final stage onto one task — acceptable for small
    derived tables (KPI outputs are 10s-100s of rows), wrong for big data;
    use `write_csv` for anything large.
    """
    tmp = tempfile.mkdtemp(prefix="csv_single_")
    try:
        df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
        shutil.move(part, dest_file)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_json_report(report: dict, dest_file: str) -> None:
    """Validation-report sink (driver-side dict → one JSON document), mirroring
    the reference's S3 JSON report (schema_check.py:229-256). Reports are tiny
    aggregates; a driver-side write is correct at any scale."""
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    with open(dest_file, "w") as f:
        json.dump(report, f, indent=2, default=str)
