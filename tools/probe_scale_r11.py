"""Round-11 scale evidence (VERDICT r10 next #3 "done" criterion, plus
the new relation store's LSM claims).

Part A — the sharded summary PAST the former saturation cliff: the r10
single-bloom tier refused above ~8.4M covered ids (SCALE_r10's final
sweep row: 64 segments x 150k ids -> summary_present=false, 64-file
per-segment fallback, 56 MB). The same store now publishes a SHARDED
summary; per point this records

  - fetch_files_new:  touched summary shards (+ uncovered per-segment
                      bitmaps, here none) — bounded by the delta's id
                      spread, never by segment count
  - new_tier_bytes:   bytes of exactly those touched shards
  - covered_case_bytes: the hypothetical uncapped single bloom for the
                      same id mass (32 bits/key) — the "covered-case
                      cost" the done-criterion bounds against (<= ~2x)

  Two delta shapes per store: WIDE (interleaved across the whole id
  domain — touches every shard; the r10 cliff shape) and NARROW (a
  localized id range — touches one shard; the O(shards-touched) claim).

Part B — the weighted relation store's per-epoch append cost vs store
size: the sink never reads standing bucket bytes (epoch-subdir append),
so a fixed-size epoch should cost ~flat across a 20x store-size sweep —
the LSM claim behind foreach_batch_join_relation_retract_maintain.
Also: physical churn cancellation at compaction (store rows before ==
live + churn pairs; after == live rows exactly).

Usage:  python tools/probe_scale_r11.py
Emits one JSON line per point; SCALE_r11.jsonl is this script's output.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402
from s3_to_redshift_with_airflow_spark.streaming.pipeline import (  # noqa: E402
    _SEG_BLOOM_BITS_PER_KEY,
    _bloom_suspect_segments,
    _hadoop_fs,
    _live_segments,
    _path_bytes,
    _store_path,
    _write_manifest,
    _write_segment_bloom,
    _write_segment_summary,
    compact_weighted_relation_store,
    foreach_batch_join_relation_retract_maintain,
    read_weighted_relation_store,
    seed_weighted_relation_store,
)

DELTA_IDS = 500


def fabricate_store(spark, segs, n_segments, ids_per_segment):
    """The r10 sweep's fabrication verbatim (probe_scale_r10.py): even
    ids only, every segment's range spans the whole id space so tier-1
    range pruning can never help — the summary carries the whole probe."""
    names = [f"seg_{i}" for i in range(n_segments)]
    for i, name in enumerate(names):
        ids = spark.range(ids_per_segment).select(
            (F.col("id") * 2 * n_segments + 2 * i).alias("doc_id")
        )
        _write_segment_bloom(ids, "doc_id", f"{segs}/{name}")
    _write_manifest(spark, segs, names)
    union = spark.range(n_segments * ids_per_segment).select(
        (F.col("id") * 2).alias("doc_id")
    )
    _write_segment_summary(spark, segs, union, "doc_id", names)


def summary_probe_cost(spark, segs, delta):
    """(touched_shards, shard_bytes, n_shards_total, summary_total_bytes):
    the sharded tier's actual fetch for this delta."""
    fs, P = _hadoop_fs(spark, segs)
    path = _store_path(spark, f"{segs}/_summary")
    meta = spark.read.parquet(f"{path}/_meta").collect()[0]
    lo, width, n_shards = int(meta["lo"]), int(meta["width"]), int(meta["n_shards"])
    touched = sorted(
        r["s"]
        for r in delta.select(
            F.floor((F.col("doc_id") - F.lit(lo)) / F.lit(width))
            .cast("int")
            .alias("s")
        )
        .distinct()
        .collect()
        if 0 <= r["s"] < n_shards
    )
    existing = [
        f"{path}/shard={s}" for s in touched if fs.exists(P(f"{path}/shard={s}"))
    ]
    return (
        len(existing),
        sum(_path_bytes(spark, p) for p in existing),
        n_shards,
        _path_bytes(spark, path),
    )


def part_a(spark, rows):
    for n_seg, per_seg in [(64, 150_000), (64, 300_000)]:
        segs = tempfile.mkdtemp(prefix=f"probe_shsum_{per_seg}_") + "/segs"
        fabricate_store(spark, segs, n_seg, per_seg)
        total_ids = n_seg * per_seg
        span = 2 * n_seg * per_seg
        covered_case_bytes = total_ids * _SEG_BLOOM_BITS_PER_KEY // 8
        old_fallback_bytes = sum(
            _path_bytes(spark, f"{segs}/{n}/idbloom")
            for n in _live_segments(spark, segs)
        )
        step = max(2, (span // DELTA_IDS) // 2 * 2)
        deltas = {
            "wide": spark.range(DELTA_IDS).select(
                (F.col("id") * step + 1).alias("doc_id")
            ),
            "narrow": spark.range(DELTA_IDS).select(
                (F.col("id") * 2 + 1).alias("doc_id")
            ),
        }
        for shape, delta in deltas.items():
            t0 = time.time()
            suspects = _bloom_suspect_segments(spark, segs, delta, "doc_id")
            probe_sec = round(time.time() - t0, 3)
            f_new, b_new, n_shards, total_b = summary_probe_cost(
                spark, segs, delta
            )
            row = {
                "family": "sharded_summary_past_saturation",
                "n_segments": n_seg,
                "ids_per_segment": per_seg,
                "total_ids": total_ids,
                "delta_shape": shape,
                "suspects": suspects,
                "probe_sec": probe_sec,
                "n_summary_shards": n_shards,
                "fetch_files_new": f_new,
                "new_tier_bytes": b_new,
                "covered_case_bytes": covered_case_bytes,
                "bytes_vs_covered_case": round(b_new / covered_case_bytes, 3),
                "fetch_files_old_fallback": n_seg,
                "old_fallback_bytes": old_fallback_bytes,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)


def _dim(spark):
    return spark.range(1024).select(
        F.col("id").alias("d_k"),
        F.concat(F.lit("seg"), (F.col("id") % 8).cast("string")).alias("seg"),
    )


def part_b(spark, rows):
    dim_path = tempfile.mkdtemp(prefix="probe_rel_dim_") + "/dim"
    _dim(spark).write.parquet(dim_path)
    for n_rows, nb in [(100_000, 64), (500_000, 320), (2_000_000, 1280)]:
        target = tempfile.mkdtemp(prefix=f"probe_rel_{n_rows}_") + "/store"
        seed = spark.range(n_rows).select(
            (F.col("id") % 1024).alias("f_k"),
            F.col("id").alias("pay"),
            F.concat(F.lit("seg"), ((F.col("id") % 1024) % 8).cast("string")).alias(
                "seg"
            ),
            F.lit(1).cast("bigint").alias("w"),
        )
        seed_weighted_relation_store(seed, target, ["f_k"], nb)
        sink = foreach_batch_join_relation_retract_maintain(
            target,
            dim_path,
            fact_key="f_k",
            dim_key="d_k",
            dim_cols=["seg"],
            bucket_keys=["f_k"],
            n_buckets=nb,
        )
        delta = (
            spark.range(50)
            .select(
                (F.col("id") % 1024).alias("f_k"),
                (F.col("id") + n_rows).alias("pay"),
                F.lit(1).cast("int").alias("w"),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        sink(delta, 0)
        epoch_sec = round(time.time() - t0, 3)
        served = read_weighted_relation_store(spark, target).count()
        row = {
            "family": "relation_store_epoch_cost",
            "store_rows": n_rows,
            "n_buckets": nb,
            "delta_rows": 50,
            "epoch_sec": epoch_sec,
            "served_rows": served,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # churn cancellation: 200k live rows + 6 epochs of pure insert->retract
    # churn over 50k rows -> compaction removes the pairs physically
    target = tempfile.mkdtemp(prefix="probe_rel_churn_") + "/store"
    nb = 64
    seed = spark.range(200_000).select(
        (F.col("id") % 1024).alias("f_k"),
        F.col("id").alias("pay"),
        F.concat(F.lit("seg"), ((F.col("id") % 1024) % 8).cast("string")).alias(
            "seg"
        ),
        F.lit(1).cast("bigint").alias("w"),
    )
    seed_weighted_relation_store(seed, target, ["f_k"], nb)
    sink = foreach_batch_join_relation_retract_maintain(
        target, dim_path, "f_k", "d_k", ["seg"], ["f_k"], n_buckets=nb
    )
    for e in range(6):
        w = 1 if e % 2 == 0 else -1
        churn = (
            spark.range(50_000)
            .select(
                (F.col("id") % 1024).alias("f_k"),
                (F.col("id") + 10_000_000).alias("pay"),
                F.lit(w).cast("int").alias("w"),
            )
            .localCheckpoint()
        )
        sink(churn, e)
    raw_before = spark.read.parquet(target).count()
    live = read_weighted_relation_store(spark, target).count()
    t0 = time.time()
    compact_weighted_relation_store(spark, target)
    compact_sec = round(time.time() - t0, 3)
    raw_after = spark.read.parquet(target).count()
    row = {
        "family": "relation_store_churn_compaction",
        "live_rows": live,
        "physical_rows_before": raw_before,
        "physical_rows_after": raw_after,
        "churn_pairs_cancelled": raw_before - raw_after,
        "compact_sec": compact_sec,
        "store_tracks_live_rows": raw_after == live,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)


def main() -> None:
    spark = build_session(app_name="probe_scale_r11")
    rows: list[dict] = []
    part_a(spark, rows)
    part_b(spark, rows)
    with open("SCALE_r11.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
