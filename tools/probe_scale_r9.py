"""Round-9 scale evidence for the segmented maintainers' O(delta)
disjointness probe (VERDICT r8 next-round #1's "done" criterion): at
growing index sizes with a FIXED 500-doc delta, measure

  - epoch_sec           one full maintain epoch through the real sink
                        (probe + delta tokenize + segment publish)
  - probe_range_sec     tier 1: a MONOTONE delta proven disjoint from
                        segment (id_min, id_max) metadata alone — the
                        production-norm path; reads a handful of
                        metadata rows at ANY index size
  - probe_bloom_sec     tier 2: an INTERLEAVED (odd-id) delta proven
                        disjoint by the per-segment bitmaps
  - probe_bloom_bytes   the bitmap bytes tier 2 spans (~4 B/indexed id,
                        capped per segment)
  - probe_exact_sec     the pre-fix probe: exact left-semi join of the
                        delta ids against the union doclens
  - probe_exact_bytes   bytes that probe's input spans (doclens files)

Expected shape: the disjoint delta is proven with ZERO suspect segments
at every size (no id-table bytes read at all — the steady-state path),
epoch_sec stays flat in index size, and probe_bloom_bytes grow only at
the bitmap's ~4 bytes per indexed id (capped per segment) while the
pre-fix exact probe spanned the full doclens. A bloom hit would pay the
exact semi-join against ONLY the suspect segment.

Usage:  python tools/probe_scale_r9.py [--sizes 20000,100000,500000]
Emits one JSON line per size plus a summary line; the round artifact
SCALE_r9.jsonl is this script's output.
"""

from __future__ import annotations

import argparse
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
    _live_segments,
    _path_bytes,
    foreach_batch_bm25_maintain_segmented,
    read_bm25_index_segmented,
    seed_bm25_index_segmented,
)

DELTA_DOCS = 500


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20000,100000,500000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    spark = build_session(app_name="probe_scale_r9")

    rows = []
    for n in sizes:
        idx = tempfile.mkdtemp(prefix=f"probe_bm25_{n}_") + "/index"
        # EVEN doc ids, so an interleaved-but-absent (odd-id) delta exists
        corpus = synthetic_documents(spark, n + DELTA_DOCS, group=1).select(
            (F.col("doc_id") * 2).alias("doc_id"), "text"
        )
        base = corpus.filter(F.col("doc_id") < 2 * n).localCheckpoint()
        delta = corpus.filter(F.col("doc_id") >= 2 * n).localCheckpoint()
        seed_bm25_index_segmented(base, idx)
        segs = f"{idx}/segs"

        # tier 1: monotone delta — range metadata alone proves disjoint
        mono_ids = delta.select("doc_id").distinct()
        t0 = time.time()
        assert _bloom_suspect_segments(spark, segs, mono_ids, "doc_id") == []
        probe_range_sec = round(time.time() - t0, 3)

        # tier 2: interleaved (odd) delta — bitmaps prove disjoint
        odd_ids = spark.range(DELTA_DOCS).select(
            (F.col("id") * 2 + 1).alias("doc_id")
        )
        t0 = time.time()
        assert _bloom_suspect_segments(spark, segs, odd_ids, "doc_id") == []
        probe_bloom_sec = round(time.time() - t0, 3)
        probe_bloom_bytes = sum(
            _path_bytes(spark, f"{segs}/{s}/idbloom")
            for s in _live_segments(spark, segs)
        )

        # tier 3 / pre-fix cost: the exact semi-join over the union
        _, doclens, _ = read_bm25_index_segmented(spark, idx)
        t0 = time.time()
        dup = (
            doclens.join(F.broadcast(odd_ids), "doc_id", "left_semi")
            .limit(1)
            .collect()
        )
        assert not dup
        probe_exact_sec = round(time.time() - t0, 3)
        probe_exact_bytes = sum(
            _path_bytes(spark, f"{segs}/{s}/doclens")
            for s in _live_segments(spark, segs)
        )

        sink = foreach_batch_bm25_maintain_segmented(idx)
        t0 = time.time()
        sink(delta, 0)
        epoch_sec = round(time.time() - t0, 3)

        row = {
            "family": "bm25_segmented_maintain_probe",
            "index_docs": n,
            "delta_docs": DELTA_DOCS,
            "epoch_sec": epoch_sec,
            "probe_range_sec": probe_range_sec,
            "probe_bloom_sec": probe_bloom_sec,
            "probe_bloom_bytes": probe_bloom_bytes,
            "probe_exact_sec": probe_exact_sec,
            "probe_exact_bytes": probe_exact_bytes,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- tiered vs all-merge compaction: amortized maintenance cost ----
    # A fixed epoch stream over a big base, auto-compacting every 3
    # epochs. All-merge rewrites the WHOLE index each trigger; tiered
    # merges only the small tier and never touches the base — the
    # difference is the amortized per-epoch maintenance cost at scale.
    base_docs, n_epochs, epoch_docs = 100_000, 9, 500
    for mode, tiered in (("all_merge", False), ("tiered", True)):
        idx = tempfile.mkdtemp(prefix=f"probe_cmp_{mode}_") + "/index"
        corpus = synthetic_documents(
            spark, base_docs + n_epochs * epoch_docs, group=1
        ).localCheckpoint()
        seed_bm25_index_segmented(
            corpus.filter(F.col("doc_id") < base_docs), idx
        )
        base_bytes = _path_bytes(spark, f"{idx}/segs/seg_base")
        from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
            compact_bm25_segments,
        )

        t0 = time.time()
        compact_sec = 0.0
        compact_bytes_written = 0
        n_compactions = 0
        for e in range(n_epochs):
            lo_id = base_docs + e * epoch_docs
            delta = corpus.filter(
                (F.col("doc_id") >= lo_id) & (F.col("doc_id") < lo_id + epoch_docs)
            )
            foreach_batch_bm25_maintain_segmented(idx)(delta, e)
            if len(_live_segments(spark, f"{idx}/segs")) >= 3:
                before = {
                    s: _path_bytes(spark, f"{idx}/segs/{s}")
                    for s in _live_segments(spark, f"{idx}/segs")
                }
                c0 = time.time()
                compact_bm25_segments(spark, idx, tiered=tiered)
                compact_sec += time.time() - c0
                n_compactions += 1
                # compaction write volume = segments it created or replaced
                # (all-merge replaces seg_base IN PLACE — name diff alone
                # would miss it)
                after = {
                    s: _path_bytes(spark, f"{idx}/segs/{s}")
                    for s in _live_segments(spark, f"{idx}/segs")
                }
                compact_bytes_written += sum(
                    b for s, b in after.items() if before.get(s) != b
                )
        total_sec = round(time.time() - t0, 3)
        base_now = _path_bytes(spark, f"{idx}/segs/seg_base")
        print(
            json.dumps(
                {
                    "family": "tiered_vs_all_compaction",
                    "mode": mode,
                    "index_docs": base_docs,
                    "epochs": n_epochs,
                    "epoch_docs": epoch_docs,
                    "total_sec": total_sec,
                    "compact_sec": round(compact_sec, 3),
                    "n_compactions": n_compactions,
                    "compact_bytes_written": compact_bytes_written,
                    "base_segment_untouched": base_now == base_bytes,
                }
            ),
            flush=True,
        )

    lo, hi = rows[0], rows[-1]
    print(
        json.dumps(
            {
                "family": "bm25_segmented_maintain_probe",
                "summary": {
                    "size_ratio": hi["index_docs"] / lo["index_docs"],
                    "epoch_sec_ratio": round(hi["epoch_sec"] / lo["epoch_sec"], 2),
                    "range_sec_ratio": round(
                        hi["probe_range_sec"] / max(lo["probe_range_sec"], 1e-9), 2
                    ),
                    "bloom_bytes_ratio": round(
                        hi["probe_bloom_bytes"] / lo["probe_bloom_bytes"], 2
                    ),
                    "exact_bytes_ratio": round(
                        hi["probe_exact_bytes"] / lo["probe_exact_bytes"], 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
