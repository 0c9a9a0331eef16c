"""Empirical scale curves for the headline operator families (VERDICT r4
next-round #2): drive each family at x1 / x10 / x50 of the sf0.1 row count
with the engine's synthetic load generators — the Python DataSource for
events (sources/synthetic.py) and the JVM whole-stage-codegen document
generator (synthetic_documents) — and measure time-vs-rows curvature.

Inputs are MATERIALIZED (eager localCheckpoint) before the timed window,
so the measurement is the operator, not the generator; the generation
time is reported separately (gen_sec), which also refreshes the Python
DataSource throughput number. Each measurement is best-of-2 full
executions (JIT warm-up in run 1, same policy as bench.py; per-run values
are emitted).

Usage:
    python tools/scale_study.py [--scales x1,x10,x50] [--families a,b,...]

Prints one JSON line per (family, scale) with rows/sec/rows_per_sec plus a
final summary line with per-family linearity ratios
    lin_10_50 = (t_x50 / t_x10) / (rows_x50 / rows_x10)
(1.0 = perfectly linear; > 1 = super-linear growth — the scale smell).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from s3_to_redshift_with_airflow_spark.operators.classify import (  # noqa: E402
    hashed_linear_classify,
)
from s3_to_redshift_with_airflow_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    release_shingle_cache,
)
from s3_to_redshift_with_airflow_spark.operators.graph import (  # noqa: E402
    pagerank_scaled,
)
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402
from s3_to_redshift_with_airflow_spark.sources.synthetic import (  # noqa: E402
    register,
    synthetic_documents,
)

SCALES = {"x1": 1, "x10": 10, "x50": 50, "x100": 100, "x200": 200}
BASE_EVENTS = 100_000  # sf0.1 events rows
BASE_DOCS = 5_000  # sf0.1 documents rows
BASE_LINEITEM = 600_000  # sf0.1 lineitem rows


def _events(spark, n):
    """Python-DataSource events, scaled id spaces so distinct (user, track)
    edges grow ~linearly with n (fixed spaces would saturate)."""
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", n // 32)
        .option("num_partitions", 32)
        .option("n_users", max(1000, n // 100))
        .option("n_tracks", max(200, n // 500))
        .load()
    )


def _lineitem(spark, n):
    """JVM-generated TPC-H q1-shaped lineitem (codegen, no storage)."""
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return spark.range(n).select(
        (h("pk") % 200_000).alias("l_partkey"),
        (h("sk") % 10_000).alias("l_suppkey"),
        (h("q") % 50 + 1).cast("decimal(12,2)").alias("l_quantity"),
        ((h("p") % 10_000_000) / 100).cast("decimal(12,2)").alias("l_extendedprice"),
        ((h("d") % 11) / 100).cast("decimal(12,2)").alias("l_discount"),
        ((h("t") % 9) / 100).cast("decimal(12,2)").alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (h("r") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (h("s") % 2 + 1).cast("int")).alias("l_linestatus"),
    )


def fam_hourly_agg(spark, mult):
    inp = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        return (
            inp.groupBy(F.hour("ts").alias("hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                    "cents"
                ),
                F.approx_count_distinct("user_id").alias("approx_users"),
            )
            .collect()
        )

    return inp, BASE_EVENTS * mult, run


def fam_pagerank(spark, mult):
    ev = _events(spark, BASE_EVENTS * mult)
    # bipartite user->track edges, symmetrized like the registry entry
    # (track ids offset into their own id space)
    e = ev.select(
        F.col("user_id").alias("u"), (F.col("track_id") + 10_000_000_000).alias("v")
    )
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    n_edges = edges.count()

    def run():
        return pagerank_scaled(edges, n_iter=3, src="u", dst="v").count()

    return edges, n_edges, run


def fam_minhash(spark, mult):
    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        release_shingle_cache()  # measure the full pipeline, not a warm cache
        return minhash_lsh_pairs(docs, threshold=0.8).count()

    return docs, BASE_DOCS * mult, run


def fam_classifier(spark, mult):
    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        return hashed_linear_classify(docs).count()

    return docs, BASE_DOCS * mult, run


def fam_tpch_q1(spark, mult):
    inp = _lineitem(spark, BASE_LINEITEM * mult).localCheckpoint()

    def run():
        return (
            inp.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.sum(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                ).alias("sum_disc_price"),
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                ).alias("sum_charge"),
                F.avg("l_quantity").alias("avg_qty"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .collect()
        )

    return inp, BASE_LINEITEM * mult, run


def fam_zorder(spark, mult):
    """Range-shuffle family: Z-order keying + repartitionByRange +
    within-partition sort, forced to full execution with the noop sink."""
    from s3_to_redshift_with_airflow_spark.operators.layout import zorder_layout

    inp = _lineitem(spark, BASE_LINEITEM * mult).select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).localCheckpoint()

    def run():
        zorder_layout(inp, ["l_partkey", "l_suppkey"], num_files=64).write.format(
            "noop"
        ).mode("overwrite").save()
        return None

    return inp, BASE_LINEITEM * mult, run


def fam_triangles(spark, mult):
    """Degree-ordered triangle counting over a synthetic random graph with
    scale-stable average degree (~8): nodes = m/4, so wedge work should
    grow near-linearly with edges when orientation is doing its job."""
    from s3_to_redshift_with_airflow_spark.operators.graph import triangle_counts

    m = BASE_EVENTS * mult  # edge rows before dedup
    n_nodes = max(1000, m // 4)
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    edges = (
        spark.range(m)
        .select((h("a") % n_nodes).alias("u1"), (h("b") % n_nodes).alias("u2"))
        .filter(F.col("u1") < F.col("u2"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()

    def run():
        return triangle_counts(edges).count()

    return edges, n_edges, run


def fam_pmi(spark, mult):
    """Adjacent-bigram PMI mining over synthetic documents — explode +
    combined count shuffle + marginal windows over the aggregated table."""
    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        from s3_to_redshift_with_airflow_spark.plans.registry import REGISTRY

        # registry fn reads parquet; replicate its plan over the synthetic
        # docs via a temp view + the same builder internals is overkill —
        # the bigram pipeline below IS the registry plan minus the scan.
        from s3_to_redshift_with_airflow_spark.functions.text import tokens
        from s3_to_redshift_with_airflow_spark.operators.classify import (
            log2_fp_sql,
        )
        from pyspark.sql import Window

        bigrams = (
            docs.select(tokens(F.col("text")).alias("tk"))
            .filter(F.size("tk") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(tk) - 1),"
                        " i -> array(element_at(tk, i), element_at(tk, i + 1)))"
                    )
                ).alias("bg")
            )
            .select(
                F.col("bg").getItem(0).alias("w1"),
                F.col("bg").getItem(1).alias("w2"),
            )
            .filter((F.col("w1") != "") & (F.col("w2") != ""))
        )
        counted = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
        win = counted.withColumn(
            "c_left", F.sum("c_xy").over(Window.partitionBy("w1"))
        ).withColumn("c_right", F.sum("c_xy").over(Window.partitionBy("w2")))
        total = counted.agg(F.sum("c_xy").cast("bigint").alias("n_total"))
        lg = lambda x: F.expr(log2_fp_sql(x, dialect="spark"))  # noqa: E731
        return (
            win.join(F.broadcast(total))
            .filter(F.col("c_xy") >= 5)
            .select(
                "w1", "w2",
                (lg("c_xy") + lg("n_total") - lg("c_left") - lg("c_right")).alias(
                    "pmi_fp"
                ),
            )
            .count()
        )

    return docs, BASE_DOCS * mult, run


def fam_gram(spark, mult):
    """int8 Gram matrix over synthetic 64-d embeddings — the O(n·d²)
    map-side explode into a fixed 2080-group shuffle; time should be
    linear in rows with a constant-size shuffle."""
    from s3_to_redshift_with_airflow_spark.functions.vectors import quantize_int8

    n = BASE_DOCS * mult
    emb = (
        spark.range(n)
        .select(
            F.expr(
                "transform(sequence(0, 63), d -> cast("
                " (conv(substring(md5(concat(cast(id as string), ':', d)), 1, 15),"
                "  16, 10) % 2001 - 1000) / 1000.0 as float))"
            ).alias("embedding")
        )
        .localCheckpoint()
    )

    def run():
        qv = quantize_int8(F.col("embedding"))
        cells = emb.select(qv.alias("__gram_qv")).select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(sequence(0, size(__gram_qv) - 1), i ->"
                        " transform(sequence(i, size(__gram_qv) - 1), j ->"
                        "  struct(cast(i as bigint) as i, cast(j as bigint)"
                        "   as j, __gram_qv[i] * __gram_qv[j] as p)))"
                    )
                )
            ).alias("c")
        )
        return (
            cells.groupBy(F.col("c.i"), F.col("c.j"))
            .agg(F.sum("c.p").cast("bigint").alias("g"))
            .count()
        )

    return emb, n, run


def fam_gram_fast(spark, mult):
    """Arrow/numpy fast path of the Gram kernel over the same synthetic
    embeddings as fam_gram — measures the BLAS-vs-codegen gap at volume."""
    from s3_to_redshift_with_airflow_spark.operators.clustering import (
        gram_int8_arrow,
    )

    n = BASE_DOCS * mult
    emb = (
        spark.range(n)
        .select(
            F.expr(
                "transform(sequence(0, 63), d -> cast("
                " (conv(substring(md5(concat(cast(id as string), ':', d)), 1, 15),"
                "  16, 10) % 2001 - 1000) / 1000.0 as float))"
            ).alias("embedding")
        )
        .localCheckpoint()
    )

    def run():
        return gram_int8_arrow(emb).count()

    return emb, n, run


def fam_dsir(spark, mult):
    """DSIR importance weights over synthetic documents (target = the
    deterministic 20% slice): one gram explode, one <=4096-group count
    shuffle, broadcast ratio join, one groupBy(doc) — should track the
    classifier family's linearity."""
    from s3_to_redshift_with_airflow_spark.operators.classify import (
        dsir_importance,
    )

    docs = (
        synthetic_documents(spark, BASE_DOCS * mult)
        .withColumn("tgt", F.expr("doc_id % 10 < 2"))
        .localCheckpoint()
    )

    def run():
        return dsir_importance(docs, "tgt").count()

    return docs, BASE_DOCS * mult, run


def fam_divergence(spark, mult):
    """Per-source corpus KL divergence over synthetic documents split into
    20 synthetic sources: the corpus reduces to vocab-granularity
    aggregates in one scan, so time should be near-linear in rows with a
    vocab-bounded tail."""
    from s3_to_redshift_with_airflow_spark.operators.classify import (
        corpus_kl_divergence,
    )

    docs = (
        synthetic_documents(spark, BASE_DOCS * mult)
        .withColumn("source", F.concat(F.lit("src"), (F.col("doc_id") % 20)))
        .localCheckpoint()
    )

    def run():
        return corpus_kl_divergence(docs).count()

    return docs, BASE_DOCS * mult, run


def fam_pq(spark, mult):
    """Product-quantization ANN over synthetic 64-d embeddings (same
    generator as fam_gram): training shuffles m*N rows into m*k groups per
    iteration, encoding + ADC search are broadcast joins — near-linear in
    corpus size with a constant-size codebook."""
    from s3_to_redshift_with_airflow_spark.operators.clustering import pq_topk

    n = BASE_DOCS * mult
    emb = (
        spark.range(n)
        .select(
            F.col("id").cast("bigint").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> cast("
                " (conv(substring(md5(concat(cast(id as string), ':', d)), 1, 15),"
                "  16, 10) % 2001 - 1000) / 1000.0 as float))"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )

    def run():
        owned = []
        got = pq_topk(
            emb, emb.filter(F.col("vec_id") < 5), unpersist_with=owned
        ).count()
        for df in owned:
            df.unpersist()
        return got

    return emb, n, run


def _random_graph(spark, mult, avg_deg=8):
    """Synthetic random graph with scale-stable average degree (~avg_deg):
    shared input builder for the iterative graph families."""
    m = BASE_EVENTS * mult
    n_nodes = max(1000, m // (avg_deg // 2))
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    edges = (
        spark.range(m)
        .select((h("a") % n_nodes).alias("u1"), (h("b") % n_nodes).alias("u2"))
        .filter(F.col("u1") < F.col("u2"))
        .distinct()
        .localCheckpoint()
    )
    return edges, edges.count()


def fam_kcore(spark, mult):
    """Fixed-round k-core peel: per round one degree aggregation + two
    semi-joins over a re-materialized edge table — time should track the
    (shrinking) surviving edge set, i.e. sub-linear once peeling bites."""
    from s3_to_redshift_with_airflow_spark.operators.graph import kcore_peel

    edges, n_edges = _random_graph(spark, mult)

    def run():
        return kcore_peel(edges, k=5, n_iter=3).count()

    return edges, n_edges, run


def fam_lpa(spark, mult):
    """Synchronous deterministic LPA: per round one label join onto the
    materialized adjacency + two integer aggregations — linear in edges."""
    from s3_to_redshift_with_airflow_spark.operators.graph import label_propagation

    edges, n_edges = _random_graph(spark, mult)

    def run():
        return label_propagation(edges, n_iter=3).count()

    return edges, n_edges, run


def fam_hits(spark, mult):
    """Integer HITS over a synthetic bipartite user→item graph with
    scale-stable item fan-in: per half-step one join-sum + a 1-row max
    broadcast — the same fixed iterative shape as pagerank."""
    from s3_to_redshift_with_airflow_spark.operators.graph import hits_scaled

    m = BASE_EVENTS * mult
    n_users, n_items = max(1000, m // 8), max(200, m // 40)
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    edges = (
        spark.range(m)
        .select((h("u") % n_users).alias("u"), (h("i") % n_items).alias("i"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()

    def run():
        return hits_scaled(edges, n_iter=2).count()

    return edges, n_edges, run




def fam_proximity(spark, mult):
    """Positional proximity search (registry: proximity_search): posexplode
    + filter to 2 query terms BEFORE any shuffle, one doc-partitioned
    window, one groupBy — linear in corpus tokens, tiny shuffled volume.
    Small vocab (500) so the query terms hit ~9% of docs."""
    docs = synthetic_documents(spark, BASE_DOCS * mult, vocab=500).localCheckpoint()
    from s3_to_redshift_with_airflow_spark.functions.text import tokens as _tok
    from pyspark.sql import Window

    def run():
        occ = docs.select(
            "doc_id", F.posexplode(_tok(F.col("text"))).alias("pos", "term")
        ).filter(F.col("term").isin(["w1", "w2"]))
        w = Window.partitionBy("doc_id").orderBy("pos")
        lagged = occ.withColumn("pt", F.lag("term").over(w)).withColumn(
            "pp", F.lag("pos").over(w)
        )
        return (
            lagged.groupBy("doc_id")
            .agg(
                F.min(
                    F.when(F.col("pt") != F.col("term"), F.col("pos") - F.col("pp"))
                ).alias("min_gap")
            )
            .filter(F.col("min_gap").isNotNull())
            .count()
        )

    return docs, BASE_DOCS * mult, run


def fam_containment(spark, mult):
    """Asymmetric containment pairs (registry: containment_neardup): the
    near-dup groups give ~group²·n_docs/group true pairs, so candidate and
    verify volume grow linearly with the corpus; the asymmetric prefix
    filter keeps the candidate join on rare shingles."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        containment_pairs,
        release_shingle_cache,
    )

    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        release_shingle_cache()
        return containment_pairs(docs, threshold=0.8).count()

    return docs, BASE_DOCS * mult, run


def fam_bfs(spark, mult):
    """Bounded multi-source BFS (registry: bfs_reach): symmetrized
    adjacency materialized once; each round joins only the new frontier —
    on a random graph with avg degree 8 the 3-hop ball saturates fast, so
    late rounds join a frontier much smaller than the graph."""
    from s3_to_redshift_with_airflow_spark.operators.graph import bfs_hops

    edges, n_edges = _random_graph(spark, mult)
    seeds = spark.range(100).select(F.col("id").alias("node")).localCheckpoint()

    def run():
        return bfs_hops(edges, seeds, n_rounds=3).count()

    return edges, n_edges, run


def fam_skyline(spark, mult):
    """2-D skyline (registry: skyline_frontier): rows reduce to a fixed
    20k-price-point table in one map-side-combinable aggregation; the
    only ordered window runs over price points, never rows — time should
    be pure scan+partial-agg, i.e. linear with a constant window tail."""
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    n = BASE_LINEITEM * mult
    inp = (
        spark.range(n)
        .select(
            ((h("p") % 2_000_000) / 100.0).alias("price"),
            (h("s") % 50 + 1).alias("size"),
        )
        .localCheckpoint()
    )
    from pyspark.sql import Window

    def run():
        g = inp.groupBy("price").agg(
            F.max("size").alias("best_size"), F.count(F.lit(1)).alias("n_at_price")
        )
        w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
        return (
            g.withColumn("pb", F.max("best_size").over(w))
            .filter(F.col("pb").isNull() | (F.col("best_size") > F.col("pb")))
            .count()
        )

    return inp, n, run


def fam_cusum(spark, mult):
    """CUSUM changepoint (registry: cusum_changepoint): events reduce to
    (type, hour) buckets before any window; the per-type windows run over
    bucket cardinality, so time is scan-dominated — linear."""
    from pyspark.sql import Window

    inp = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        hb = inp.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        wo = Window.partitionBy("event_type").orderBy("h")
        wa = Window.partitionBy("event_type")
        s = (
            hb.withColumn("t", F.row_number().over(wo).cast("bigint"))
            .withColumn(
                "cum",
                F.sum("c")
                .over(wo.rowsBetween(Window.unboundedPreceding, 0))
                .cast("bigint"),
            )
            .withColumn("total", F.sum("c").over(wa).cast("bigint"))
            .withColumn("nb", F.count(F.lit(1)).over(wa).cast("bigint"))
            .withColumn(
                "s_abs", F.abs(F.col("nb") * F.col("cum") - F.col("t") * F.col("total"))
            )
        )
        pick = Window.partitionBy("event_type").orderBy(
            F.col("s_abs").desc(), F.col("t").asc()
        )
        return (
            s.withColumn("pk", F.row_number().over(pick))
            .filter(F.col("pk") == 1)
            .count()
        )

    return inp, BASE_EVENTS * mult, run


def fam_basket(spark, mult):
    """Market-basket lift (registry: basket_lift) over (user, item-bucket)
    baskets: the 60-key basket cap bounds the per-user pair join at
    C(60,2), so pair volume — and time — grows linearly with users."""
    inp = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        uk = inp.select(
            F.col("user_id").alias("u"), (F.col("track_id") % 500).alias("k")
        ).distinct()
        bs = uk.groupBy("u").agg(F.count(F.lit(1)).alias("bs"))
        ukc = uk.join(bs.filter(F.col("bs") <= 60).select("u"), "u")
        nk = ukc.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
        nu = ukc.agg(F.countDistinct("u").cast("bigint").alias("n_users"))
        pairs = (
            ukc.select("u", F.col("k").alias("x"))
            .join(ukc.select("u", F.col("k").alias("y")), "u")
            .filter(F.col("x") < F.col("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
            .filter(F.col("n_xy") >= 5)
        )
        return (
            pairs.join(F.broadcast(nk.select(F.col("k").alias("x"), F.col("n_k").alias("nx"))), "x")
            .join(F.broadcast(nk.select(F.col("k").alias("y"), F.col("n_k").alias("ny"))), "y")
            .join(F.broadcast(nu))
            .withColumn("lift", F.expr("(n_xy * n_users * 1000) div (nx * ny)"))
            .orderBy(F.col("lift").desc(), "x", "y")
            .limit(20)
            .count()
        )

    return inp, BASE_EVENTS * mult, run


def fam_entropy(spark, mult):
    """Character-entropy gate (registry: char_entropy_filter): chars
    explode JVM-side and collapse map-side to (doc, char) counts, so
    shuffled volume is |alphabet| rows per doc regardless of doc length —
    time should track corpus characters linearly."""
    from s3_to_redshift_with_airflow_spark.operators.classify import char_entropy

    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        return char_entropy(docs).count()

    return docs, BASE_DOCS * mult, run


def fam_bloom(spark, mult):
    """Bloom-prefiltered semi-join audit (registry: bloom_prefilter_join):
    filter sized 8 bits/key (rounded to a power of two) so the FP rate is
    scale-constant; the probe side is map-side only, so time should be
    linear in probe rows with a small key-build term."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        bloom_semijoin_stats,
    )

    n = BASE_LINEITEM * mult
    h = lambda f: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f + ":"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    key_space = n // 4
    probe = spark.range(n).select((h("pk") % key_space).alias("pk")).localCheckpoint()
    keys = (
        spark.range(n // 20)
        .select((h("kk") % key_space).alias("k"))
        .distinct()
        .localCheckpoint()
    )
    n_keys = keys.count()
    n_bits = 1 << max(14, (8 * n_keys - 1).bit_length())

    def run():
        return bloom_semijoin_stats(
            probe, "pk", keys, key_col="k", n_bits=n_bits, k_hashes=3
        ).collect()

    return probe, n, run


def fam_cdc(spark, mult):
    """CDC changelog compaction (registry: cdc_compact): one shuffle on the
    key; row_number and the per-key op count share the window exchange —
    linear in changelog rows with per-key state bounded by AQE splitting."""
    from pyspark.sql import Window

    ev = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        log = ev.select(
            "user_id", "ts", "event_id", "value",
            F.when(F.col("event_type") == "error", "D")
            .when(F.col("event_type") == "signup", "I")
            .otherwise("U")
            .alias("op"),
        )
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            log.select(
                "user_id", "value", "op",
                F.row_number().over(w).alias("rn"),
            )
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .count()
        )

    return ev, BASE_EVENTS * mult, run


def fam_robust(spark, mult):
    """Robust MAD outliers (registry: robust_outliers): two exact per-group
    median passes + one counting pass with 5-row broadcast joins — each
    pass is one groupBy(type) whose sort is bounded by the largest group."""
    ev = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        med = ev.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("med")
        )
        j1 = ev.select("event_type", "value").join(F.broadcast(med), "event_type")
        mad = (
            j1.select("event_type", F.abs(F.col("value") - F.col("med")).alias("d"))
            .groupBy("event_type")
            .agg(F.expr("percentile(d, 0.5)").alias("mad"))
        )
        return (
            j1.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(
                F.sum(
                    F.when(
                        F.abs(F.col("value") - F.col("med"))
                        > F.lit(4.4478) * F.col("mad"),
                        1,
                    ).otherwise(0)
                ).alias("n_out")
            )
            .count()
        )

    return ev, BASE_EVENTS * mult, run


def fam_containment_cap(spark, mult):
    """fam_containment with the round-6 max_df stop-shingle cap (64): drops
    boilerplate-hot shingles from candidate generation, bounding the one
    family that is honestly near-linear. Compare against `containment` at
    the same scale for the measured reduction; the candidate-count delta
    is recorded by tools/containment_cap_report.py."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        containment_pairs,
        release_shingle_cache,
    )

    docs = synthetic_documents(spark, BASE_DOCS * mult).localCheckpoint()

    def run():
        release_shingle_cache()
        return containment_pairs(docs, threshold=0.8, max_df=64).count()

    return docs, BASE_DOCS * mult, run


def _synthetic_embeddings(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").cast("bigint").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> cast("
                " (conv(substring(md5(concat(cast(id as string), ':', d)), 1, 15),"
                "  16, 10) % 2001 - 1000) / 1000.0 as float))"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )


def fam_ivfpq(spark, mult):
    """IVF-PQ with exact refine (registry: ivf_pq_ann_topk): coarse
    routing to 12/32 lists, ADC over only the probed codes, exact-cosine
    re-rank of the top-100. Training dominates at small scale; search work
    is ~n_probe/km_k of the corpus plus a constant |q|·R refine join."""
    from s3_to_redshift_with_airflow_spark.operators.clustering import (
        ivf_pq_topk,
    )

    n = BASE_DOCS * mult
    emb = _synthetic_embeddings(spark, n)

    def run():
        owned = []
        got = ivf_pq_topk(
            emb,
            emb.filter(F.col("vec_id") < 5),
            n_probe=12,
            m_subspaces=16,
            refine=100,
            unpersist_with=owned,
        ).count()
        for df in owned:
            df.unpersist()
        return got

    return emb, n, run


def fam_pq_search(spark, mult):
    """Stored-index PQ search (registry: pq_index_search): the index
    (codes + codebook) is built and MATERIALIZED outside the timed window —
    the timed run is ONLY the ADC scan + top-k, i.e. the amortized
    production cost the full-rebuild families over-state. Expect time
    linear in the code-table size with a tiny constant."""
    from s3_to_redshift_with_airflow_spark.operators.clustering import (
        pq_index_build,
        pq_index_search,
    )

    n = BASE_DOCS * mult
    emb = _synthetic_embeddings(spark, n)
    owned = []
    codes, codebook = pq_index_build(emb, unpersist_with=owned)
    codes = codes.localCheckpoint()
    codebook = codebook.localCheckpoint()
    for df in owned:
        df.unpersist()
    queries = emb.filter(F.col("vec_id") < 5).localCheckpoint()
    emb.unpersist()

    def run():
        return pq_index_search(codes, codebook, queries).count()

    return codes, n, run


def fam_cdc_scd2(spark, mult):
    """Changelog→SCD2 pipeline (registry: cdc_scd2_pipeline): events as an
    I/U/D op log, first half builds the dimension, second half compacts
    and merges — two key shuffles and a broadcast delete-close in one lazy
    plan; expect near-linear."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        cdc_to_scd2,
    )

    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()
    log = events.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("state_value"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
    )
    cut = F.expr("percentile_approx(ts, 0.5)")
    t0 = log.agg(cut.alias("t")).collect()[0]["t"]

    def run():
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        dim = (
            log.filter(F.col("ts") < F.lit(t0))
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select(
                "user_id",
                "state_value",
                F.lit(t0).alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
            )
        )
        return cdc_to_scd2(
            log.filter(F.col("ts") >= F.lit(t0)),
            dim,
            keys=["user_id"],
            attrs=["state_value"],
            effective="2030-01-01",
            order_cols=["ts", "event_id"],
        ).count()

    return events, n, run


def fam_bm25(spark, mult):
    """Fixed-point BM25 (registry: bm25_search) over synthetic docs with
    in-vocabulary query terms: posting lists built only for the 3 query
    terms before any shuffle; doc lengths are a narrow projection; the
    1-row corpus stats broadcast. Expect linear in the corpus scan."""
    from s3_to_redshift_with_airflow_spark.functions.text import tokens as _tok
    from s3_to_redshift_with_airflow_spark.operators.classify import log2_fp_sql
    from pyspark.sql import Window as W

    n = BASE_DOCS * mult
    docs = synthetic_documents(spark, n).localCheckpoint()
    terms = ["w1", "w42", "w777"]
    k1s, bs, scale = 1200, 750, 1_000_000

    def run():
        lens = docs.select(
            "doc_id", F.size(_tok(F.col("text"))).cast("bigint").alias("len")
        )
        stats = lens.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("sum(len) div count(1)").cast("bigint").alias("avgl"),
        )
        toks = docs.select(
            "doc_id", F.explode(_tok(F.col("text"))).alias("term")
        ).filter(F.col("term").isin(terms))
        tf = toks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("bigint").alias("tf")
        )
        dfr = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("bigint").alias("df")
        )
        lg = lambda x: log2_fp_sql(x, dialect="spark")  # noqa: E731
        num = f"(tf * {k1s + 1000} * 1000 * avgl)"
        den = (
            f"(tf * {scale} * avgl + {k1s * (1000 - bs)} * avgl"
            f" + {k1s * bs} * len)"
        )
        hits = (
            tf.join(F.broadcast(dfr), "term")
            .join(lens, "doc_id")
            .join(F.broadcast(stats))
            .withColumn(
                "c",
                F.expr(
                    f"({lg('2 * n_docs + 2')} - {lg('2 * df + 1')})"
                    f" * (({num} * {scale}) div {den})"
                ),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").cast("bigint").alias("score"))
        )
        top = hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(20)
        rw = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return top.withColumn("rnk", F.row_number().over(rw)).count()

    return docs, n, run


def fam_ohlc(spark, mult):
    """OHLC bars (registry: ohlc_bars): one map-side-combined groupBy whose
    shuffle volume is O(buckets); expect flat sub-linear time."""
    from s3_to_redshift_with_airflow_spark.operators.timeseries import (
        ohlc_bars,
    )

    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()

    def run():
        return ohlc_bars(
            events, group_cols=["event_type"], seq_col="event_id"
        ).count()

    return events, n, run


def fam_histogram(spark, mult):
    """Value-histogram quantile sketch (registry: value_histogram_daily +
    histogram_quantile_rollup): build + merge + quantile pick; bucket
    granularity keeps everything past the first aggregate constant-size."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )

    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()

    def run():
        hist = value_histogram(events, grain_cols=["event_type"], width=8.0)
        return histogram_quantiles(
            hist, grain_cols=["event_type"], width=8.0
        ).count()

    return events, n, run


def fam_skew_report(spark, mult):
    """Shuffle-key skew diagnostic (registry: skew_report): one groupBy(key)
    pass + a 1-row stats broadcast; the measurement you run BEFORE a big
    join, so it must stay cheap at any scale."""
    from s3_to_redshift_with_airflow_spark.operators.skew import skew_report

    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()

    def run():
        return skew_report(events, "user_id", top_k=10).count()

    return events, n, run


def fam_kmv(spark, mult):
    """KMV sketch build + pairwise set ops (registry: kmv_set_ops): one
    distinct shuffle on (type, hash) + a per-group bottom-k window over
    DISTINCT hashes, then group-granularity set algebra — the distinct
    pass should dominate and stay linear; the set-op tail is constant."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_pair_ops,
        kmv_sketch_table,
    )

    ev = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        sk = kmv_sketch_table(ev, "user_id", "event_type", k=256)
        return kmv_pair_ops(sk, k=256).collect()

    return ev, BASE_EVENTS * mult, run


def fam_join_size(spark, mult):
    """CMS join-size estimation (registry: join_size_estimate), WITHOUT
    the exact-audit join: two d=4 sketch builds (each one linear scan +
    a <=4*16384-group aggregate) + a constant-size inner product — the
    whole point is that cost is two scans regardless of how big the join
    output would be."""
    from s3_to_redshift_with_airflow_spark.operators.classify import _md5_int60

    n = BASE_EVENTS * mult
    a = _events(spark, n).select("user_id").localCheckpoint()
    b = (
        spark.range(n // 2)
        .select((F.col("id") % (n // 20)).alias("o_custkey"))
        .localCheckpoint()
    )
    d_, w_ = 4, 16384

    def cms(df, key):
        hashes = F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        _md5_int60(
                            F.concat(F.lit(f"cms:{d}:"), F.col(key).cast("string"))
                        )
                        % w_
                    ).alias("bucket"),
                )
                for d in range(d_)
            ]
        )
        return (
            df.select(F.explode(hashes).alias("h"))
            .select("h.d", "h.bucket")
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )

    def run():
        ca = cms(a, "user_id")
        cb = cms(b, "o_custkey").withColumnRenamed("cnt", "cnt_b")
        return (
            ca.join(F.broadcast(cb), ["d", "bucket"])
            .groupBy("d")
            .agg(F.sum(F.col("cnt") * F.col("cnt_b")).cast("bigint").alias("est"))
            .agg(F.min("est"))
            .collect()
        )

    return a, n, run


def fam_bm25_index(spark, mult):
    """BM25 served from the STORED inverted index (registry:
    bm25_index_search), build cost excluded: the timed window is the
    parquet postings probe (term filter pushed to the scan) + scoring —
    the amortized serving cost, the retrieval twin of fam_pq_search."""
    import tempfile

    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_search,
        read_bm25_index,
        write_bm25_index,
    )

    n = BASE_DOCS * mult
    docs = synthetic_documents(spark, n).localCheckpoint()
    idx = tempfile.mkdtemp(prefix="bm25_scale_")
    write_bm25_index(*bm25_index_build(docs), idx)
    postings, doclens, stats = read_bm25_index(spark, idx)

    def run():
        return bm25_index_search(
            postings, doclens, stats, ["w1", "w42", "w777"]
        ).collect()

    return docs, n, run


def fam_ppr(spark, mult):
    """Personalized PageRank (registry: personalized_pagerank) on the same
    random graph family as fam_pagerank, seeded at 3 nodes: the first
    frontier carries |S| rows, so early iterations cost less than global
    PageRank's dense start — compare directly against the pagerank family
    at equal scale."""
    from s3_to_redshift_with_airflow_spark.operators.graph import (
        personalized_pagerank,
    )

    und, n_edges = _random_graph(spark, mult)
    edges = und.select(
        F.col("u1").alias("src"), F.col("u2").alias("dst")
    ).unionByName(
        und.select(F.col("u2").alias("src"), F.col("u1").alias("dst"))
    ).localCheckpoint()
    seeds = [r.src for r in edges.select("src").limit(3).collect()]

    def run():
        return personalized_pagerank(
            edges, seeds, n_iter=3
        ).agg(F.sum("rank")).collect()

    return edges, n_edges, run


def fam_mg(spark, mult):
    """Misra-Gries summary + merge (registry: mg_heavy_hitters): one
    groupBy(day, key) + a window over the per-day KEY frame (never rows)
    + the k-way merge over <= k*days stored rows — the skew_report cost
    family; expect strongly sub-linear."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    ev = _events(spark, BASE_EVENTS * mult).localCheckpoint()

    def run():
        daily = mg_summary(
            ev.select("user_id", F.to_date("ts").alias("day")),
            "user_id",
            k=20,
            grain_cols=["day"],
        )
        return mg_merge(daily, k=20, grain_cols=["day"]).collect()

    return ev, BASE_EVENTS * mult, run


def fam_cms_merge(spark, mult):
    """Per-day CMS build + merge + probe (registry: cms_merge_rollup):
    the build is one d-exploded scan into <= days*d*w groups; merge and
    probe are sketch-granularity — linear scan cost, constant tail."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        cms_merge,
        cms_point_estimate,
        cms_sketch_table,
    )

    ev = (
        _events(spark, BASE_EVENTS * mult)
        .select("user_id", F.to_date("ts").alias("day"))
        .localCheckpoint()
    )
    probes = ev.select("user_id").distinct().limit(20).localCheckpoint()

    def run():
        daily = cms_sketch_table(ev, "user_id", d=4, w=1024, grain_cols=["day"])
        merged = cms_merge(daily, grain_cols=["day"])
        return cms_point_estimate(merged, probes, "user_id", d=4, w=1024).collect()

    return ev, BASE_EVENTS * mult, run


def fam_sssp(spark, mult):
    """Weighted SSSP (registry: sssp_weighted): 4 Bellman-Ford rounds with
    changed-frontier relaxation over the random graph family, md5-derived
    integer weights — per round one adjacency equi-join + one min
    aggregate; compare against ppr/pagerank at equal scale."""
    from s3_to_redshift_with_airflow_spark.operators.graph import sssp_weighted

    und, n_edges = _random_graph(spark, mult)
    h = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit("sw:"), c)), 1, 15), 16, 10
    ).cast("bigint")
    ew = und.select(
        F.col("u1").alias("u"), F.col("u2").alias("v"),
        (h(F.concat(F.col("u1").cast("string"), F.lit("|"),
                    F.col("u2").cast("string"))) % 9 + 1).alias("w"),
    )
    edges = ew.unionByName(
        ew.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).localCheckpoint()
    seeds = edges.select(F.col("u").alias("node")).limit(3)
    seed_rows = [(r.node,) for r in seeds.collect()]
    seed_df = spark.createDataFrame(seed_rows, "node bigint")

    def run():
        return (
            sssp_weighted(edges, seed_df, n_rounds=4, src="u", dst="v",
                          weight_col="w")
            .agg(F.sum("dist"))
            .collect()
        )

    return edges, n_edges, run


def fam_hybrid(spark, mult):
    """Hybrid BM25+PQ retrieval from the two STORED indexes (registry:
    hybrid_search), builds excluded: the timed window is the batched
    postings probe + the ADC code scan + the RRF fusion of two
    |queries|·10-row rank tables — the amortized serving cost of the
    composed stack. Expect ~the sum of fam_bm25_index and fam_pq_search
    with a negligible fusion constant."""
    import tempfile

    from s3_to_redshift_with_airflow_spark.functions.text import tokens as _tok
    from s3_to_redshift_with_airflow_spark.operators.clustering import (
        pq_index_build,
        pq_index_search,
    )
    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_search_batch,
        read_bm25_index,
        write_bm25_index,
    )
    from pyspark.sql import Window as W

    n = BASE_DOCS * mult
    docs = synthetic_documents(spark, n).localCheckpoint()
    idx = tempfile.mkdtemp(prefix="hybrid_scale_")
    write_bm25_index(*bm25_index_build(docs), idx)
    postings, doclens, stats = read_bm25_index(spark, idx)
    emb = _synthetic_embeddings(spark, n)
    owned = []
    codes, codebook = pq_index_build(emb, unpersist_with=owned)
    codes = codes.localCheckpoint()
    codebook = codebook.localCheckpoint()
    for df in owned:
        df.unpersist()
    queries = emb.filter(F.col("vec_id") < 5).localCheckpoint()
    emb.unpersist()
    qt = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(_tok(F.col("text"))).alias("term"),
        )
        .distinct()
        .localCheckpoint()
    )

    def run():
        lex = bm25_index_search_batch(postings, doclens, stats, qt).select(
            "query_id", "doc_id", F.col("rnk").alias("rk_lex")
        )
        sem = pq_index_search(codes, codebook, queries).select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.col("rk").cast("bigint").alias("rk_sem"),
        )
        fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
            "query_id",
            "doc_id",
            (
                F.coalesce(1.0 / (F.lit(60.0) + F.col("rk_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(60.0) + F.col("rk_sem")), F.lit(0.0))
            ).alias("rrf"),
        )
        wf = W.partitionBy("query_id").orderBy(
            F.col("rrf").desc(), F.col("doc_id").asc()
        )
        return (
            fused.withColumn("rk", F.row_number().over(wf))
            .filter(F.col("rk") <= 5)
            .count()
        )

    return docs, n, run


def fam_auto_join(spark, mult):
    """Sketch-driven join-strategy pre-flight (registry:
    auto_join_strategy), decision half only: two CMS builds + the AMS
    inner product + the KMV distinct estimate + the decision row — the
    cost of CHOOSING the strategy without running the join. Expect linear
    in the two input scans with a sketch-granularity tail; compare
    against the join it guards (fam_hourly_agg-class cost)."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import kmv_hash40
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import (
        _AJS_KMV_K,
        _jse_cms,
    )

    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()
    orders = (
        spark.range(n // 2)
        .select((F.col("id") % max(1000, n // 100)).alias("o_custkey"))
        .localCheckpoint()
    )

    def run():
        ca = _jse_cms(events, "user_id")
        cb = _jse_cms(orders, "o_custkey").withColumnRenamed("cnt", "cnt_b")
        est = (
            ca.join(F.broadcast(cb), ["d", "bucket"])
            .groupBy("d")
            .agg(F.sum(F.col("cnt") * F.col("cnt_b")).cast("bigint").alias("e"))
            .agg(F.min("e").alias("est_join_n"))
        )
        kk = (
            orders.select(kmv_hash40(F.col("o_custkey")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(_AJS_KMV_K)
            .agg(F.count(F.lit(1)).alias("kp"), F.max("h").alias("hk"))
        )
        return est.join(F.broadcast(kk)).collect()

    return events, n, run


def fam_psi(spark, mult):
    """PSI drift gate (registry: histogram_drift_psi): the raw scan
    builds the histogram once; the PSI itself runs at bucket granularity
    (two window merges + one bucket-keyed join + one aggregate), so the
    curve should track the single histogram aggregate — near-linear in
    the scan, constant in the sketch algebra."""
    from s3_to_redshift_with_airflow_spark.operators.classify import (
        log2_fp_sql,
    )
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        value_histogram,
    )
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import histogram_psi

    lg = lambda x: log2_fp_sql(x, dialect="spark")  # noqa: E731
    n = BASE_EVENTS * mult
    events = _events(spark, n).localCheckpoint()

    def run():
        hist = value_histogram(events, "value", ["event_type"], "ts", 8.0)
        return histogram_psi(
            hist, ("2024-01-01", "2024-01-07"), ("2024-01-22", "2024-01-28"), lg
        ).collect()

    return events, n, run


def fam_bucketed_cdc(spark, mult):
    """Bucketed CDC-SCD2 consumer (registry: streaming_cdc_scd2_bucketed):
    per-epoch sink cost as the STORED DIMENSION grows at a FIXED 100-key
    delta — the bounded-rewrite claim. The plain consumer's epoch cost is
    O(|dimension|) (read + rewrite everything); the bucketed consumer
    reads and rewrites only the delta's touched buckets (≤100 of 256
    here), so the curve should stay near-FLAT in dimension size (the
    touched buckets themselves grow ∝ dimension/n_buckets — sublinear
    until bucket size dominates). Each run applies a fresh epoch (new
    keys, same delta size) so the ledger gate never skips."""
    import tempfile

    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_cdc_scd2_bucketed,
        write_bucketed_store,
    )

    n = BASE_EVENTS * mult
    dim = spark.range(n).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 1.0).alias("state_value"),
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    target = tempfile.mkdtemp(prefix=f"sc_cdcb_{mult}_") + "/dim"
    write_bucketed_store(dim, target, ["user_id"], 256)
    sink = foreach_batch_cdc_scd2_bucketed(
        target,
        keys=["user_id"],
        attrs=["state_value"],
        order_cols=["ts", "event_id"],
        n_buckets=256,
    )
    epoch = {"i": 0}

    def run():
        e = epoch["i"]
        epoch["i"] += 1
        ops = spark.range(100).select(
            (F.col("id") * 99991 + e).alias("user_id"),
            F.lit("2024-03-01 10:00:00").cast("timestamp").alias("ts"),
            F.col("id").alias("event_id"),
            F.lit(-1.0 - e).alias("state_value"),
            F.lit("U").alias("op"),
        )
        sink(ops, e)
        return 100

    return dim, n, run


FAMILIES = {
    "hourly_agg": fam_hourly_agg,
    "pagerank": fam_pagerank,
    "minhash": fam_minhash,
    "classifier": fam_classifier,
    "tpch_q1": fam_tpch_q1,
    "zorder": fam_zorder,
    "triangles": fam_triangles,
    "pmi": fam_pmi,
    "gram": fam_gram,
    "gram_fast": fam_gram_fast,
    "dsir": fam_dsir,
    "divergence": fam_divergence,
    "pq": fam_pq,
    "kcore": fam_kcore,
    "lpa": fam_lpa,
    "hits": fam_hits,
    "proximity": fam_proximity,
    "containment": fam_containment,
    "bfs": fam_bfs,
    "skyline": fam_skyline,
    "cusum": fam_cusum,
    "basket": fam_basket,
    "entropy": fam_entropy,
    "bloom": fam_bloom,
    "cdc": fam_cdc,
    "robust": fam_robust,
    "containment_cap": fam_containment_cap,
    "ivfpq": fam_ivfpq,
    "pq_search": fam_pq_search,
    "cdc_scd2": fam_cdc_scd2,
    "bm25": fam_bm25,
    "ohlc": fam_ohlc,
    "histogram": fam_histogram,
    "skew_report": fam_skew_report,
    "kmv": fam_kmv,
    "join_size": fam_join_size,
    "bm25_index": fam_bm25_index,
    "ppr": fam_ppr,
    "mg": fam_mg,
    "cms_merge": fam_cms_merge,
    "sssp": fam_sssp,
    "hybrid": fam_hybrid,
    "auto_join": fam_auto_join,
    "psi": fam_psi,
    "bucketed_cdc": fam_bucketed_cdc,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="x1,x10,x50")
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    spark = build_session(app_name="scale_study")
    results: dict[str, dict[str, dict]] = {}
    for fam in args.families.split(","):
        results[fam] = {}
        for scale in args.scales.split(","):
            mult = SCALES[scale]
            t0 = time.time()
            inp, rows, run = FAMILIES[fam](spark, mult)
            gen_sec = round(time.time() - t0, 3)
            runs = []
            for _ in range(args.runs):
                t0 = time.time()
                run()
                runs.append(round(time.time() - t0, 3))
            inp.unpersist()
            rec = {
                "family": fam,
                "scale": scale,
                "rows": rows,
                "gen_sec": gen_sec,
                "sec": min(runs),
                "runs": runs,
                "rows_per_sec": int(rows / min(runs)),
            }
            results[fam][scale] = rec
            print(json.dumps(rec), flush=True)
    summary = {}
    for fam, recs in results.items():
        if "x10" in recs and "x50" in recs:
            t_ratio = recs["x50"]["sec"] / recs["x10"]["sec"]
            n_ratio = recs["x50"]["rows"] / recs["x10"]["rows"]
            summary[fam] = round(t_ratio / n_ratio, 3)
    print(json.dumps({"lin_10_50": summary}), flush=True)


if __name__ == "__main__":
    main()
