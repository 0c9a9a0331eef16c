"""Round-10 scale evidence for the store-wide summary bloom (VERDICT r9
next-round #5's "done" criterion): probe-bloom read volume for an
INTERLEAVED disjoint delta as the segment count grows.

Part A — segment-count sweep (fabricated bloom-only stores: the
disjointness probe reads ONLY `segs/<n>/idbloom` + `_summary`, so the
sweep fabricates exactly those artifacts and nothing else; per-segment
cardinality fixed at 30k ids):

  - old_tier_bytes   what the r9 probe fetched: every live segment's
                     bitmap (grows linearly with segment count)
  - new_tier_bytes   what the summary tier fetches: ONE store-wide
                     bitmap for the covered mass + the bitmaps of
                     post-summary segments only (here: none)
  - fetch_files      file opens per probe (the object-storage cost
                     driver): N -> 1

  HONESTY NOTE: Bloom bits are proportional to member count on BOTH
  tiers (32 bits/key), so below the 8 MB summary cap the BYTE totals
  are similar — the wins are (1) the N->1 fetch collapse, (2) the cap:
  past 2M covered ids the summary stays 8 MB while the per-segment sum
  keeps growing, (3) the saturation guard: past ~8M ids the writer
  refuses a useless summary and the probe falls back to per-segment
  bitmaps (the final sweep row records exactly that residual).

Part B — the real BM25 production loop at one size: seed, stream
epochs, tiered-compact (summary refresh rides the compaction trigger),
stream one more epoch, probe — the steady-state read is the summary
plus only the post-compaction segment's bitmap.

Usage:  python tools/probe_scale_r10.py
Emits one JSON line per point; SCALE_r10.jsonl is this script's output.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402
from s3_to_redshift_with_airflow_spark.sources.synthetic import (  # noqa: E402
    synthetic_documents,
)
from s3_to_redshift_with_airflow_spark.streaming.pipeline import (  # noqa: E402
    _bloom_suspect_segments,
    _hadoop_fs,
    _live_segments,
    _path_bytes,
    _store_path,
    _write_manifest,
    _write_segment_bloom,
    _write_segment_summary,
    compact_bm25_segments,
    foreach_batch_bm25_maintain_segmented,
    seed_bm25_index_segmented,
)

PER_SEGMENT_IDS = 30_000
DELTA_IDS = 500


def _summary_covers(spark, segs):
    fs, P = _hadoop_fs(spark, segs)
    path = _store_path(spark, f"{segs}/_summary")
    if not fs.exists(P(path)):
        return None
    rows = spark.read.parquet(path).select("covers").collect()
    return sorted(rows[0]["covers"]) if len(rows) == 1 else None


def probe_bytes(spark, segs):
    """(old_tier_bytes, new_tier_bytes, fetch_old, fetch_new): the bitmap
    volume each tier spans for a range-overlapping delta — old = every
    live bitmap; new = summary (if present) + bitmaps of uncovered
    segments only."""
    live = _live_segments(spark, segs)
    per_seg = {n: _path_bytes(spark, f"{segs}/{n}/idbloom") for n in live}
    covers = _summary_covers(spark, segs)
    old_b = sum(per_seg.values())
    if covers is None:
        return old_b, old_b, len(live), len(live)
    uncovered = [n for n in live if n not in covers]
    new_b = _path_bytes(spark, _store_path(spark, f"{segs}/_summary")) + sum(
        per_seg[n] for n in uncovered
    )
    return old_b, new_b, len(live), 1 + len(uncovered)


def fabricate_store(spark, segs, n_segments, ids_per_segment):
    """Exactly the artifacts the probe reads: per-segment idbloom dirs, a
    manifest, and the summary a compaction refresh would leave. Even ids
    only (odd ids are interleaved-but-absent); every segment's range
    spans the whole id space, so tier-1 range pruning can never help —
    the bloom tiers carry the whole probe, the worst case for them."""
    names = [f"seg_{i}" for i in range(n_segments)]
    for i, name in enumerate(names):
        # segment i holds ids congruent to 2i mod 2*n: full-span ranges
        ids = spark.range(ids_per_segment).select(
            (F.col("id") * 2 * n_segments + 2 * i).alias("doc_id")
        )
        _write_segment_bloom(ids, "doc_id", f"{segs}/{name}")
    _write_manifest(spark, segs, names)
    union = spark.range(n_segments * ids_per_segment).select(
        (F.col("id") * 2).alias("doc_id")
    )
    _write_segment_summary(spark, segs, union, "doc_id", names)


def main() -> None:
    spark = build_session(app_name="probe_scale_r10")
    rows = []

    # ---- part A: segment-count sweep over fabricated stores ----
    for n_seg, per_seg in [(4, PER_SEGMENT_IDS), (16, PER_SEGMENT_IDS),
                           (64, PER_SEGMENT_IDS), (64, 60_000),
                           (64, 150_000)]:
        segs = tempfile.mkdtemp(prefix=f"probe_sum_{n_seg}_{per_seg}_") + "/segs"
        fabricate_store(spark, segs, n_seg, per_seg)
        total_ids = n_seg * per_seg
        span = 2 * n_seg * per_seg
        step = max(2, (span // DELTA_IDS) // 2 * 2)
        odd = spark.range(DELTA_IDS).select(
            (F.col("id") * step + 1).alias("doc_id")
        )
        t0 = time.time()
        suspects = _bloom_suspect_segments(spark, segs, odd, "doc_id")
        probe_sec = round(time.time() - t0, 3)
        old_b, new_b, f_old, f_new = probe_bytes(spark, segs)
        row = {
            "family": "summary_bloom_segment_count_sweep",
            "n_segments": n_seg,
            "ids_per_segment": per_seg,
            "total_ids": total_ids,
            "summary_present": _summary_covers(spark, segs) is not None,
            "suspects": suspects,
            "probe_sec": probe_sec,
            "old_tier_bytes": old_b,
            "new_tier_bytes": new_b,
            "fetch_files_old": f_old,
            "fetch_files_new": f_new,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- part B: the real BM25 production loop ----
    idx = tempfile.mkdtemp(prefix="probe_sum_bm25_") + "/index"
    corpus = synthetic_documents(spark, 50_000 + 4 * 500, group=1).select(
        (F.col("doc_id") * 2).alias("doc_id"), "text"
    )
    seed_bm25_index_segmented(
        corpus.filter(F.col("doc_id") < 100_000).localCheckpoint(), idx
    )
    sink = foreach_batch_bm25_maintain_segmented(idx)
    for e in range(3):
        lo, hi = 100_000 + e * 1000, 100_000 + (e + 1) * 1000
        sink(
            corpus.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).localCheckpoint(),
            e,
        )
    merged = compact_bm25_segments(spark, idx, tiered=True)
    sink(corpus.filter(F.col("doc_id") >= 103_000).localCheckpoint(), 3)
    segs = f"{idx}/segs"
    odd = spark.range(DELTA_IDS).select((F.col("id") * 400 + 1).alias("doc_id"))
    t0 = time.time()
    suspects = _bloom_suspect_segments(spark, segs, odd, "doc_id")
    probe_sec = round(time.time() - t0, 3)
    old_b, new_b, f_old, f_new = probe_bytes(spark, segs)
    row = {
        "family": "summary_bloom_bm25_production_loop",
        "index_docs": 50_000,
        "merged_segments": merged,
        "live_segments": _live_segments(spark, segs),
        "summary_covers": _summary_covers(spark, segs),
        "suspects": suspects,
        "probe_sec": probe_sec,
        "old_tier_bytes": old_b,
        "new_tier_bytes": new_b,
        "fetch_files_old": f_old,
        "fetch_files_new": f_new,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # ---- part C: the streaming dedup gate's per-epoch cost vs store size.
    # Bounded-rewrite arithmetic: per-epoch fold I/O = touched_buckets x
    # bucket_rows ~ |batch| x bucket_rows once n_buckets >> |batch| (each
    # batch fingerprint lands in its own bucket) — a deployment sizes
    # n_buckets to BOTH keep bucket_rows ~constant (store/n_buckets ~ 315
    # here) and dwarf the epoch size. The sweep grows the seeded store 25x
    # with n_buckets scaled to match and times one fixed 50-doc epoch
    # (half exact dups of the store, half fresh): flat epoch_sec is the
    # claim.
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_dedup_gate,
        read_dedup_gate_corpus,
    )

    for n_docs, nb in [(20_000, 64), (100_000, 320), (500_000, 1600)]:
        store = tempfile.mkdtemp(prefix=f"probe_gate_{n_docs}_") + "/store"
        sink = foreach_batch_dedup_gate(store, n_buckets=nb)
        corpus = synthetic_documents(spark, n_docs + 25, group=1).localCheckpoint()
        sink(corpus.filter(F.col("doc_id") < n_docs), 0)  # seed epoch
        delta = corpus.filter(F.col("doc_id") < 25).unionByName(
            corpus.filter(F.col("doc_id") >= n_docs)
        ).localCheckpoint()  # 25 dups + 25 fresh
        t0 = time.time()
        sink(delta, 1)
        epoch_sec = round(time.time() - t0, 3)
        accepted = read_dedup_gate_corpus(spark, store).count()
        row = {
            "family": "dedup_gate_epoch_cost",
            "index_docs": n_docs,
            "n_buckets": nb,
            "delta_docs": 50,
            "epoch_sec": epoch_sec,
            "accepted_total": accepted,
            "dups_rejected": accepted == n_docs + 25,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = all(
        r["suspects"] == []
        for r in rows
        if r.get("summary_present", True) is not False and "suspects" in r
    )
    print(
        json.dumps(
            {
                "family": "summary_bloom_sweep_summary",
                "all_disjoint_proven": ok,
                "bytes_ratio_at_64x30k": round(
                    rows[2]["old_tier_bytes"] / rows[2]["new_tier_bytes"], 2
                ),
                "fetch_collapse_at_64x30k": f"{rows[2]['fetch_files_old']}->"
                f"{rows[2]['fetch_files_new']}",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
