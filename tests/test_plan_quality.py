"""Plan-quality regression tests: the physical plans we designed for stay
designed-for (broadcasts stay broadcasts, pushdown reaches the scan, codegen
stays on). A correctness-preserving refactor that silently turns a broadcast
star join into a sort-merge join or drops filter pushdown is a 100 TB
regression that row-count tests can't see."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_genre_kpis_broadcasts_dims_and_prunes_columns(spark):
    plan = _plan(spark, "genre_kpis")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact table
    # column pruning: the lineitem scan must read only the join keys
    df = REGISTRY["genre_kpis"].fn(spark, SF_SMOKE)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    lineitem_scans = [
        block
        for block in formatted.split("\n\n")
        if "lineitem.parquet" in block and "Scan parquet" in block
    ]
    assert lineitem_scans, formatted
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in lineitem_scans[0]


def test_filters_push_down_to_parquet_scan(spark):
    df = REGISTRY["filters"].fn(spark, SF_SMOKE)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters:" in formatted
    # the range + threshold predicates must reach the scan, not sit in a
    # post-scan Filter only
    assert "GreaterThanOrEqual(l_shipdate" in formatted
    assert "LessThan(l_quantity,24.0)" in formatted


def test_star_join_agg_broadcasts_all_dims(spark):
    plan = _plan(spark, "star_join_agg")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier-leg, customer, orders path
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_projections_stay_in_wholestage_codegen(spark):
    plan = _plan(spark, "projections")
    # "*(n)" prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in the path


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(spark, "asof_join")
    # one Exchange for the key-partitioned window; no join operator at all
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_sessionize_shares_one_shuffle(spark):
    plan = _plan(spark, "sessionize")
    # lag, running sum, and the aggregate all reuse the user_id partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_salted_join_matches_plain_join(spark):
    from s3_to_redshift_with_airflow_spark.operators.skew import salted_join

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    users = (
        events.groupBy("user_id").count().withColumnRenamed("count", "n")
    )
    plain = events.join(users, "user_id")
    salted = salted_join(events, users, on="user_id", salt=8)
    assert salted.columns == plain.select(*salted.columns).columns
    a = {tuple(r) for r in plain.select("event_id", "user_id", "value", "n").collect()}
    b = {tuple(r) for r in salted.select("event_id", "user_id", "value", "n").collect()}
    assert a == b
    # the join key really is salted: shuffle key includes __salt
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    from s3_to_redshift_with_airflow_spark.sources.writers import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed_table(lineitem, "li_b", "l_orderkey", 8, sort_col="l_orderkey")
        write_bucketed_table(orders, "ord_b", "o_orderkey", 8, sort_col="o_orderkey")
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the join runs with ZERO shuffles
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    from s3_to_redshift_with_airflow_spark.sources.readers import load_tables
    from s3_to_redshift_with_airflow_spark.sources.writers import (
        write_date_partitioned,
    )

    (events,) = load_tables(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path)

    pruned = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-15")
    formatted = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in formatted
    # the date predicate must be a partition filter, not a data filter
    assert "isnotnull(event_date" in formatted
    n_days = events.select(F.to_date("ts").alias("d")).distinct().count()
    assert pruned.count() == events.filter(F.to_date("ts") == "2024-01-15").count()
    assert n_days > 1  # pruning actually skipped something


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from s3_to_redshift_with_airflow_spark.sources.writers import compact_parquet

    path = str(tmp_path / "fragmented")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    events.repartition(40).write.parquet(path)  # simulate streaming debris
    import glob as g

    before = len(g.glob(f"{path}/part-*.parquet"))
    assert before >= 30
    n = compact_parquet(spark, path, target_file_mb=256)
    after = len(g.glob(f"{path}/part-*.parquet"))
    assert after == n == 1
    assert spark.read.parquet(path).count() == events.count()


def test_range_join_is_hash_not_nested_loop(spark):
    plan = _plan(spark, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_tpch_q6_predicates_reach_parquet_scan(spark):
    """Q6 is the pushdown benchmark: every predicate must reach the reader
    so row-group statistics can skip data at scale."""
    df = REGISTRY["tpch_q6"].fn(spark, SF_SMOKE)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters:" in formatted
    assert "GreaterThanOrEqual(l_shipdate" in formatted
    assert "GreaterThanOrEqual(l_discount,0.05)" in formatted
    assert "LessThan(l_quantity,24.0)" in formatted


def test_tpch_q18_aggregates_before_join(spark):
    """Q18's scale discipline: the lineitem rollup + >300 filter runs BEFORE
    any join, so the join inputs are surviving orderkeys, not the fact
    table. In the plan string, the HashAggregate over l_quantity must appear
    below (after, textually) the joins that consume it — equivalently, no
    join output feeds the quantity aggregate's child."""
    plan = _plan(spark, "tpch_q18")
    # the aggregate's child is a plain scan/shuffle of lineitem: between the
    # first HashAggregate mentioning l_quantity and the end of plan there
    # must be no join node (joins sit ABOVE the rollup in this tree)
    agg_at = plan.find("l_quantity")
    assert agg_at != -1
    below = plan[agg_at:]
    assert "Join" not in below, below


def test_tpch_q3_broadcasts_customer_slice(spark):
    plan = _plan(spark, "tpch_q3")
    assert "BroadcastHashJoin" in plan
    # top-10 must run as TakeOrderedAndProject, not a global Sort+Limit
    assert "TakeOrderedAndProject" in plan


def test_semantic_neardup_has_no_cartesian(spark):
    """The first-class embedding dedup must stay a bucketed shuffle join;
    only the sanctioned brute-force oracle (embedding_neardup) may cross."""
    plan = _plan(spark, "semantic_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow
def test_registry_wide_plan_audit(spark):
    """Whole-registry guard: no Python evaluation and no Cartesian product
    may appear in ANY registered plan except the documented sanctions
    (multimodal Arrow decode; the three brute-force similarity oracles).
    This is the UDF-policy (§2.11) and scale-smell audit as a test, so a
    regression fails CI instead of waiting for a human to read plan_report.

    Queries that execute eagerly inside their builder (streaming lifecycle,
    iterative components) are skipped — plan_report covers them; everything
    else is planned without execution."""
    PY_OK = {
        "multimodal_features", "video_frame_sample", "audio_chunk_features",
        # Arrow mapInPandas BLAS partials, held to the JVM twin's exact
        # oracle — the sanctioned fast path of gram_matrix_int8
        "gram_matrix_int8_fast",
    }
    # tpch_q11 / tpch_q22 / tfidf_topk nested loops are 1-row scalar-aggregate
    # broadcasts (decorrelated scalar subqueries) — O(N), not cross products.
    # ann_topk / quantized_ann_topk broadcast a FIXED 5-row query side over
    # one corpus scan — O(N·|queries|), the sanctioned brute-force baseline.
    CART_OK = {
        "ann_topk", "embedding_neardup", "ivf_ann_topk", "quantized_ann_topk",
        "tpch_q11", "tpch_q22", "tfidf_topk",
        # composes the three sanctioned broadcast-query ANN retrievers
        "ann_recall_report",
        # the IVF run scored against the brute-force graded truth —
        # composes ann_topk's broadcast-query sanction; the metric
        # itself is a broadcast qrels join
        "ann_ranking_eval",
        # broadcast 5 anchors × one corpus scan with a residual label
        # inequality — O(N·|anchors|), same sanction as ann_topk
        "hard_negatives",
        # 1-row totals broadcast onto the k-row class table — same
        # scalar-threshold sanction as tpch_q11
        "class_weights",
        # fuses the two sanctioned broadcast-anchor retrievers
        "rank_fusion",
        # 1-row total broadcast onto the 20-row heavy-key table
        "heavy_hitters",
        # k-means assignment: a ONE-row broadcast of the packed k-centroid
        # array folded per corpus row — O(N·k) codegen, not a cross product
        "kmeans_clusters", "semdedup_pairs", "semdedup_survivors",
        "ivf_int8_ann_topk",
        # five 1-row stage aggregates joined by broadcast — scalar
        # composition, same sanction as class_weights/heavy_hitters
        "curation_funnel",
        # the funnel's 1-row accounting crossJoined with the span-trim
        # stage's 1-row aggregate — the same scalar composition
        "curation_funnel_trimmed",
        # 1-row (pos_tot, neg_tot) totals broadcast onto the 4096-row
        # bucket table — same scalar-threshold sanction as tpch_q11
        "quality_classifier_train",
        # composes the trainer above, so it carries the same 1-row
        # totals broadcast
        "quality_classifier_trained",
        # 1-row min/max stats broadcast for the Z-order normalization —
        # same scalar sanction
        "zorder_layout",
        # 1-row corpus-total broadcast onto the aggregated bigram table —
        # same scalar sanction as heavy_hitters
        "token_pmi",
        # 1-row (target_tot, raw_tot) totals broadcast onto the 4096-row
        # bucket table — same scalar-threshold sanction as the trainer
        "dsir_weights",
        # S-row per-source totals crossed with the aggregated vocab (V×S
        # vocab-granularity frame, never the corpus) + the 1-row (N, V)
        # broadcast — bounded-side composition, not a corpus cross product
        "corpus_divergence",
        # k-means assignment broadcast (same sanction as kmeans_clusters)
        # plus the tfidf-style 1-row n_clusters broadcast
        "cluster_keywords",
        # HITS max-normalization: one 1-row MAX broadcast per half-step —
        # same scalar sanction as tpch_q11/heavy_hitters
        "hits_scores",
        # 1-row n_docs broadcast onto the query-term tf frame — same
        # scalar sanction as tfidf_topk
        "keyword_search",
        # 1-row (n_docs, avgl) corpus-stats broadcast onto the query-term
        # tf frame — same scalar sanction as keyword_search
        "bm25_search",
        # the stored-index serving and append paths of the same scorer —
        # identical 1-row stats broadcast, postings read from parquet
        "bm25_index_search", "bm25_index_append",
        # 1-row (n_rows, n_keys) stats broadcast onto the top-k heavy-key
        # table — same scalar sanction as heavy_hitters
        "skew_report",
        # 1-row n_users broadcast onto the aggregated pair table — same
        # scalar sanction as heavy_hitters/token_pmi
        "basket_lift",
        # ONE-row packed-bitmap broadcast folded per probe row plus the
        # 1-row n_keys scalar — the Bloom prefilter's whole point is that
        # the probe side never shuffles; same sanction as kmeans_clusters
        "bloom_prefilter_join",
        # the production shape of the same operator: the identical ONE-row
        # bitmap broadcast, minus the audit scalars
        "bloom_semijoin",
        # IVFADC: coarse probe selection is ivf_int8_ann_topk's ONE-row
        # packed-centroid broadcast folded per query row — same sanction
        "ivf_pq_ann_topk",
        # the stored-index serving path of the same composition — identical
        # probe broadcast, tables read from parquet
        "ivf_pq_index_search",
        # the build slot: the coarse k-means assignment's ONE-row
        # packed-centroid broadcast — same sanction as kmeans_clusters
        "ivf_pq_index_build",
        # the append slot: frozen-centroid routing + frozen-codebook
        # encode, each a ONE-row packed broadcast folded per NEW row —
        # same sanction as pq_index_append/kmeans_clusters
        "ivf_pq_index_append",
        # hybrid retrieval: the BM25 half's 1-row (n_docs, avgl) stats
        # broadcast — same scalar sanction as bm25_index_search
        "hybrid_search",
        # metadata-filtered brute-force baseline: the FIXED 5-row query
        # broadcast over one (pre-filtered) corpus scan — same sanction
        # as ann_topk
        "filtered_ann_topk",
        # 1-row margin-cutpoint broadcast (exact decile boundaries WITHOUT
        # a global NTILE sort) — same scalar sanction as tpch_q11
        "classifier_calibration",
        # KMV set ops: the G-row group list crossed to G·(G-1)/2 pairs —
        # a bounded group-granularity frame fed by equi broadcast joins of
        # the ≤k·G sketch rows, never the corpus (corpus_divergence's
        # sanction)
        "kmv_set_ops",
        # two 1-row aggregates (exact count, sketch min) composed by
        # broadcast — same scalar sanction as curation_funnel
        "join_size_estimate",
        # the streaming twins of bm25_index_search: the serve they return
        # carries the identical 1-row (n_docs, avgl) stats broadcast
        "streaming_bm25_maintain", "streaming_bm25_maintain_segmented",
        # the time-travel serve of the segmented index: the same 1-row
        # stats broadcast, recomputed over the PREFIX doclens
        "bm25_index_read_at",
        # filtered IVFADC: the ONE-row packed-centroid probe broadcast
        # (same sanction as ivf_pq_index_search) — the allowed-set prune
        # itself is an id-only left-semi equi join
        "filtered_ivf_pq_ann_topk",
        # composes the sanctioned filtered searches with the sanctioned
        # brute-force filtered baseline (filtered_ann_topk's sanction)
        "filtered_ann_recall_report",
        # a FIXED 2-row quantile frame broadcast onto the bucket-
        # granularity histogram — same scalar-threshold sanction as
        # tpch_q11/heavy_hitters
        "histogram_quantiles",
    }
    SKIP = {
        "streaming_window_agg", "streaming_join", "streaming_dedup",
        "streaming_enrich_join", "streaming_synthetic_agg",
        # the iterative connected-components builder runs driver-loop jobs
        # (count + localCheckpoint) at plan-build time — executing, not
        # planning — so these can't be audited as plans
        "doc_dedup_clusters", "neardup_survivors", "dedup_rate_report",
        "leakage_safe_split", "kfold_split",
        # iterative BPE trainer: per-merge argmax collects at build time
        "bpe_train_merges", "bpe_tokenize_stats",
        # PCA fit collects the bounded moment/Gram model state (64 + 2080
        # rows) at build time — same sanction as the BPE vocab collect
        "pca_project",
    }
    offenders = []
    for name, spec in REGISTRY.items():
        if name in SKIP:
            continue
        plan = spec.fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        has_py = ("EvalPython" in plan) or ("MapInPandas" in plan) or (
            "FlatMapGroupsInPandas" in plan
        )
        has_cart = ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)
        if has_py and name not in PY_OK:
            offenders.append(f"{name}: python eval")
        if has_cart and name not in CART_OK:
            offenders.append(f"{name}: cartesian")
    assert not offenders, offenders


def test_quality_classifier_broadcasts_weight_table(spark):
    """The 4096-row weight table must broadcast — a shuffled lookup join
    would move the whole exploded token stream at 100 TB."""
    plan = _plan(spark, "quality_classifier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_no_cartesian_and_partial_aggregation(spark):
    """Each power iteration is one shuffle of PARTIAL contribution sums —
    no Cartesian product, and map-side combine before the exchange."""
    plan = _plan(spark, "pagerank_centrality")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_pivot_is_single_scan_conditional_agg(spark):
    """pivot with an explicit value list must compile to one scan +
    conditional aggregation — no value-discovery scan, no join."""
    df = REGISTRY["pivot_kpis"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan


def test_rollup_is_single_scan(spark):
    """ROLLUP grains expand map-side from ONE scan — three grains must not
    mean three scans."""
    df = REGISTRY["rollup_kpis"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan  # the grouping-sets operator


def test_zorder_layout_is_one_range_shuffle(spark):
    """The Z-order write layout costs exactly one range shuffle of the
    keyed data (plus the 1-row stats broadcast) — the same as any global
    sort."""
    from s3_to_redshift_with_airflow_spark.operators.layout import zorder_layout

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = zorder_layout(li, ["l_partkey", "l_suppkey"], num_files=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_star_joins_are_runtime_bloom_filter_eligible(spark):
    """At 100 TB a selective dimension can exceed the broadcast threshold;
    Spark then protects the fact-side scan by injecting a bloom runtime
    filter built from the dim side (on by default,
    spark.sql.optimizer.runtime.bloomFilter.enabled). The default size
    thresholds (10 GB application side) never trip at test scale, so this
    pins the PLAN SHAPE: with thresholds lowered and broadcast disabled,
    the optimizer must find an injection site in our star joins — i.e.
    the filters sit where the rewrite can see them. A plan that stops
    being eligible (e.g. a filter pushed above the join, or a
    non-equi-join rewrite) regresses the 100 TB scan story silently."""
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("tpch_q17", "star_join_agg"):
            plan = (
                REGISTRY[name]
                .fn(spark, SF_SMOKE)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, (
                f"{name}: no bloom runtime filter injected — join no longer "
                "runtime-filter-eligible"
            )
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
