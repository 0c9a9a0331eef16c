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


def archive_files(
    spark,
    src_dir: str,
    archive_dir: str,
    glob_pattern: str = "*.csv",
    missing_ok: bool = True,
) -> list[tuple[str, str]]:
    """Move processed files into an archive prefix (reference S11/S12:
    load_to_redshift.py:350-388 copy+delete to `processed/`;
    archive_files.py:11-36 local `shutil.move`).

    Uses the Hadoop FileSystem API through the session's JVM, so the same
    call works on file:// and s3a:// URIs (on S3, rename = server-side
    copy + delete — exactly the reference's move). 404-tolerant like the
    reference (missing_ok). Returns (src, dest) pairs actually moved.

    Scale note: this is an O(#files) metadata operation on the driver — fine
    for the reference's ≤100-files-per-run contract; at millions of objects
    prefer bucket lifecycle policies outside the engine.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = src_path.getFileSystem(conf)
    if not fs.exists(src_path):
        if missing_ok:
            return []
        raise FileNotFoundError(src_dir)
    dst_root = jvm.org.apache.hadoop.fs.Path(archive_dir)
    fs.mkdirs(dst_root)
    moved: list[tuple[str, str]] = []
    for status in fs.globStatus(
        jvm.org.apache.hadoop.fs.Path(f"{src_dir.rstrip('/')}/{glob_pattern}")
    ):
        src = status.getPath()
        dest = jvm.org.apache.hadoop.fs.Path(dst_root, src.getName())
        if fs.exists(dest):  # idempotent re-runs: replace stale archive copy
            fs.delete(dest, False)
        if fs.rename(src, dest):
            moved.append((str(src), str(dest)))
        elif not missing_ok:
            raise IOError(f"rename failed: {src} -> {dest}")
    return moved


def write_bucketed_table(
    df,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed parquet table.

    Bucketing is the 100 TB lever for repeated fact⨝fact joins: two tables
    bucketed on the join key into the same bucket count join with NO
    Exchange — the shuffle is paid once at write time instead of per query.
    (Spark bucketing requires the catalog `saveAsTable` path; plain
    `.parquet()` files can't carry bucket metadata.)
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_date_partitioned(
    df,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Date-partitioned parquet layout (`.../event_date=YYYY-MM-DD/...`) —
    the canonical 100 TB fact-table layout: date-range predicates become
    partition pruning (directories never listed), and day-scoped reruns
    (the reference's upsert idempotency window) become partition overwrites.

    `dynamic=True` sets `partitionOverwriteMode=dynamic` on the write, so an
    overwrite replaces ONLY the partitions present in `df` and leaves every
    other day's files untouched — the file-layout twin of the JDBC sink's
    `scope_date_col` rerun idempotency. The default static overwrite
    truncates the whole table first (Spark's default), which is almost never
    what a day-scoped rerun wants at scale."""
    from pyspark.sql import functions as F

    writer = df.withColumn("event_date", F.to_date(F.col(ts_col))).write.mode(mode)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("event_date").parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
) -> int:
    """Compact a small-files parquet directory in place: read, coalesce to
    ceil(bytes / target), rewrite. Returns the new file count.

    The small-files problem is the silent killer of 100 TB scans (per-file
    open/footer cost dominates); streaming sinks and per-batch upserts
    produce exactly this debris. In production pair with a transactional
    format (Delta OPTIMIZE / Iceberg rewrite); this is the dependency-free
    equivalent: write to a scratch dir, swap, so readers never see a
    half-compacted table.
    """
    import math

    # Two-rename crash-safe install (shared protocol with the streaming
    # stored-artifact sinks): at every instant a complete copy exists at
    # `path` or `path__prev` — the old delete+rename had a window where the
    # table lived only at the scratch path. _store_path resolves a table
    # parked at __prev by a crash inside a previous swap window.
    from ..streaming.pipeline import _install, _store_path

    live = _store_path(spark, path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(live)
    fs = p.getFileSystem(conf)
    total_bytes = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(live)
    tmp = path.rstrip("/") + "__compacting"
    # the live table's scan happens during this write — before any rename
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    _install(spark, tmp, path)
    return n_files


def write_range_partitioned(
    df,
    path: str,
    sort_col: str,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet: the data-SKIPPING
    layout (a one-dimensional Z-order). `repartitionByRange` gives each
    output file a disjoint `sort_col` interval and the within-partition sort
    tightens every row group's min/max, so a range predicate prunes to the
    few files/row-groups whose stats overlap it — the scan cost of a
    100 TB time-range query drops to the selected range's share.

    The range exchange samples the column to pick balanced boundaries
    (skew-robust, unlike hash partitioning on a monotone column). Combine
    with `write_date_partitioned` for the two-level layout: directory
    pruning by day, stats pruning within day.
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_jsonl(df, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one JSON object per row) — the interchange format of
    text-corpus pipelines. Compressed splittable ingest is parquet's job;
    JSONL is the export/exchange surface."""
    df.write.mode(mode).json(path)


def write_orc(df, path: str, mode: str = "overwrite") -> None:
    """ORC sink (predicate-pushdown-capable columnar alternative; same
    writer surface as parquet so pipelines can switch formats per table)."""
    df.write.mode(mode).orc(path)


def _count_part_files(spark, dir_uri: str) -> int:
    """Number of part-* data files under a directory (scheme-agnostic)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    pat = jvm.org.apache.hadoop.fs.Path(f"{dir_uri.rstrip('/')}/part-*")
    fs = jvm.org.apache.hadoop.fs.Path(dir_uri).getFileSystem(conf)
    statuses = fs.globStatus(pat)
    return 0 if statuses is None else len(statuses)


def compact_parquet_dir(
    spark,
    src_dir: str,
    dest_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the table-maintenance op every 100 TB lake
    needs (streaming sinks and over-parallel writers fragment tables into
    KB-sized files; scan throughput then dies on open/seek overhead and
    footer reads, and the NameNode/listing cost grows per file): rewrite a
    parquet directory into ceil(n_rows / target) evenly-sized files.

    Uses round-robin `repartition(p)` (not coalesce: coalesce merges
    without a shuffle but inherits input skew and caps parallelism at the
    output file count during the READ too). One shuffle of the data, p
    output files, each within one input-partition's worth of the even
    split. Returns {n_rows, n_files_in, n_files_out, target_rows_per_file}
    — n_files_out == ceil(n_rows/target) for any NON-EMPTY input (each
    output partition is non-empty when n_rows >= p, which ceil
    guarantees), so the report carries an exact oracle; an empty input
    still writes one (empty) file, reported as what the filesystem
    actually holds. Scheme-agnostic (file:// and s3a://), same
    FS discipline as archive_files."""
    if target_rows_per_file < 1:
        raise ValueError(f"target_rows_per_file must be >= 1, got {target_rows_per_file}")
    df = spark.read.parquet(src_dir)
    n_rows = df.count()
    n_in = _count_part_files(spark, src_dir)
    p = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(p).write.mode("overwrite").parquet(dest_dir)
    n_out = _count_part_files(spark, dest_dir)
    return {
        "n_rows": n_rows,
        "n_files_in": n_in,
        "n_files_out": n_out,
        "target_rows_per_file": target_rows_per_file,
    }
