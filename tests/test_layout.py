"""Z-order layout: bit-interleave parity with a Python reference, key
edge cases, and the actual data-skipping win (Z-order files prune on the
SECOND column where lexicographic sorting cannot)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.layout import (
    interleave_bits,
    zorder_key,
    zorder_layout,
)

from .conftest import SF_SMOKE


def _py_interleave(vals: list[int], bits: int) -> int:
    k = len(vals)
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 2)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b")], 16).alias("z")
        ).collect()
    ]
    assert got == [_py_interleave(list(r), 16) for r in rows]


def test_zorder_key_normalizes_and_handles_constant_column(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 20, 5), (3, 30, 5)], "id long, a long, c long"
    )
    out = {r["id"]: r["zkey"] for r in zorder_key(df, ["a", "c"]).collect()}
    # c is constant -> contributes 0 bits; a normalizes to 0 / 32767 / 65535
    assert out[1] == _py_interleave([0, 0], 16)
    assert out[2] == _py_interleave([32767, 0], 16)
    assert out[3] == _py_interleave([65535, 0], 16)


def test_zorder_key_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    for cols, bits in (([], 16), (["a", "b"], 32), (["a"], 0)):
        try:
            zorder_key(df, cols, bits=bits)
            raise AssertionError(f"accepted {cols} bits={bits}")
        except ValueError:
            pass


def _files_scanned(layout, col, probes):
    """Given (file_id, min, max) rows, how many files survive min/max
    pruning for each point probe on `col`, on average."""
    boxes = [(r["mn"], r["mx"]) for r in layout]
    return sum(
        sum(1 for mn, mx in boxes if mn <= v <= mx) for v in probes
    ) / len(probes)


def test_zorder_prunes_second_column_where_lex_sort_cannot(spark):
    """The point of the layout: range-partition lineitem into 16 'files'
    under (a) Z-order on (l_partkey, l_suppkey) and (b) lexicographic
    sort, then min/max-prune point queries on the SECOND column. Lex sort
    leaves l_suppkey unsorted within nearly every file (all 16 survive);
    Z-order keeps both dimensions compact (a small fraction survives)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    probes = [r["l_suppkey"] for r in li.select("l_suppkey").distinct().limit(8).collect()]

    z = (
        zorder_layout(li, ["l_partkey", "l_suppkey"], num_files=16)
        .withColumn("f", F.spark_partition_id())
        .groupBy("f")
        .agg(F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx"))
        .collect()
    )
    lex = (
        li.repartitionByRange(16, "l_partkey", "l_suppkey")
        .sortWithinPartitions("l_partkey", "l_suppkey")
        .withColumn("f", F.spark_partition_id())
        .groupBy("f")
        .agg(F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx"))
        .collect()
    )
    z_scan, lex_scan = _files_scanned(z, "l_suppkey", probes), _files_scanned(
        lex, "l_suppkey", probes
    )
    # lex sort on (partkey, suppkey) gives suppkey no locality at all
    assert z_scan * 2 <= lex_scan, (z_scan, lex_scan)
