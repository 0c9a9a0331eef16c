"""Round-12 sidecar formats and their legacy fallbacks.

Round 12 moved per-segment metadata (`_covers` epoch coverage, BM25
`_stats` prefix totals, the summary's `_smeta` meta twin) from 1-row
parquet dirs / per-serve aggregate jobs to driver-side text files.
Stores written BEFORE round 12 carry the parquet `_covers` (and no
`_stats`/`_smeta` at all), so every reader keeps a fallback; these tests
pin that a legacy-shaped store serves bit-identically to the text-shaped
one the current writers produce.
"""

import shutil

from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.retrieval import bm25_index_build
from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
    _hadoop_fs,
    foreach_batch_bm25_maintain_segmented,
    read_bm25_index_segmented,
    read_bm25_index_segmented_at,
    seed_bm25_index_segmented,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _snap(p, l, s):
    return (
        sorted(tuple(r) for r in p.collect()),
        sorted(tuple(r) for r in l.collect()),
        [tuple(r) for r in s.collect()],
    )


def _build_store(spark, idx):
    seed_bm25_index_segmented(
        _docs(spark, [(1, "spark shuffles data"), (2, "data moves in shuffles")]),
        idx,
    )
    sink = foreach_batch_bm25_maintain_segmented(idx)
    sink(_docs(spark, [(3, "broadcast joins move no data")]), 0)
    sink(_docs(spark, [(4, "sorted postings skip row groups")]), 1)


def _legacyize_covers(spark, idx):
    """Rewrite every segment's `_covers` text file as the pre-round-12
    1-column parquet dir with the same epoch list."""
    segs = f"{idx}/segs"
    fs, P = _hadoop_fs(spark, segs)
    for st in fs.listStatus(P(segs)):
        name = st.getPath().getName()
        if name.startswith("_") or not st.isDirectory():
            continue
        cpath = f"{segs}/{name}/_covers"
        if not fs.exists(P(cpath)) or not fs.getFileStatus(P(cpath)).isFile():
            continue
        epochs = [
            int(ln)
            for ln in open(cpath).read().splitlines()
            if ln.strip()
        ]
        fs.delete(P(cpath), True)
        spark.createDataFrame(
            [(e,) for e in epochs], "epoch bigint"
        ).coalesce(1).write.mode("overwrite").parquet(cpath)


def _strip_stats_and_smeta(spark, idx):
    segs = f"{idx}/segs"
    fs, P = _hadoop_fs(spark, segs)
    for st in fs.listStatus(P(segs)):
        name = st.getPath().getName()
        spath = f"{segs}/{name}/_stats"
        if fs.exists(P(spath)):
            fs.delete(P(spath), True)
    smeta = f"{segs}/_summary/_smeta"
    if fs.exists(P(smeta)):
        fs.delete(P(smeta), True)


def test_legacy_parquet_covers_serves_identically(spark, tmp_path):
    idx_new, idx_old = str(tmp_path / "new"), str(tmp_path / "old")
    _build_store(spark, idx_new)
    shutil.copytree(idx_new, idx_old)
    _legacyize_covers(spark, idx_old)
    for epoch in (-1, 0, 1, 5):
        assert _snap(*read_bm25_index_segmented_at(spark, idx_old, epoch)) == _snap(
            *read_bm25_index_segmented_at(spark, idx_new, epoch)
        )


def test_missing_stats_sidecar_falls_back_to_aggregate(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build_store(spark, idx)
    with_sidecar = _snap(*read_bm25_index_segmented(spark, idx))
    at_with = _snap(*read_bm25_index_segmented_at(spark, idx, 0))
    _strip_stats_and_smeta(spark, idx)
    assert _snap(*read_bm25_index_segmented(spark, idx)) == with_sidecar
    assert _snap(*read_bm25_index_segmented_at(spark, idx, 0)) == at_with
    # and the store still MAINTAINS without the sidecars (legacy stores
    # keep accepting epochs; disjointness probe falls back to aggregates)
    sink = foreach_batch_bm25_maintain_segmented(idx)
    sink(_docs(spark, [(9, "fresh epoch after sidecar loss")]), 2)
    _, doclens, _ = read_bm25_index_segmented(spark, idx)
    assert doclens.filter(F.col("doc_id") == 9).count() == 1


def test_sidecar_stats_equal_union_aggregate(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build_store(spark, idx)
    _, doclens, stats = read_bm25_index_segmented(spark, idx)
    agg = doclens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(len) div count(1)").cast("bigint").alias("avgl"),
    )
    assert [tuple(r) for r in stats.collect()] == [tuple(r) for r in agg.collect()]
    # serve == monolithic rebuild, the segmented contract
    docs = _docs(
        spark,
        [
            (1, "spark shuffles data"),
            (2, "data moves in shuffles"),
            (3, "broadcast joins move no data"),
            (4, "sorted postings skip row groups"),
        ],
    )
    assert _snap(*read_bm25_index_segmented(spark, idx)) == _snap(
        *bm25_index_build(docs)
    )
