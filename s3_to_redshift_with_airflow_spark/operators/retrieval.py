"""Persisted BM25 inverted index — build / search / append.

The text-retrieval twin of the PQ index persistence seam
(operators/clustering.pq_index_build/_search/_append): plans/extensions'
bm25_search builds posting lists inline per query, which is right for
ad-hoc analytics but wrong for a serving path — at 100 TB you tokenize
the corpus ONCE, persist the inverted index as ordinary parquet tables,
and answer every query batch by reading only the queried terms' postings.
Three tables, all parquet-safe scalar types:

    postings — (term, doc_id, tf): the full-vocabulary inverted index.
               Written sorted by term (range-partitioned + sorted within
               partitions), so a `term IN (...)` probe prunes parquet row
               groups by min/max stats and the scan touches ~the queried
               postings, not the corpus;
    doclens  — (doc_id, len): the BM25 length normalization;
    stats    — (n_docs, avgl): one row, avgl the floored integer mean
               (bm25_search's overflow-bounded formulation).

Scoring arithmetic is bit-identical to the live bm25_search (same
fixed-point k1/b saturation, same integer-log2 idf), so the stored-index
search shares bm25_search's exact DuckDB oracle, and `bm25_index_append`
— new documents tokenized against the frozen tokenizer, postings simply
unioned (per-doc rows are disjoint), stats recomputed from doclens — is
bit-identical to a full rebuild (pinned in tests).

Reference parity: the reference has no retrieval surface (BASELINE.json
extension); this closes the build-once/serve-many seam for the whole
keyword/proximity/phrase/BM25 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_K1, _B, _SCALE, _TOPK = 1200, 750, 1_000_000, 20


def bm25_index_build(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tokenize once, return (postings, doclens, stats) — see module doc.
    One corpus scan feeds both outputs; postings is one groupBy(term, doc)
    shuffle of the exploded token stream (map-side combined), doclens a
    narrow projection, stats a 1-row aggregate of doclens."""
    from ..functions.text import tokens as _tok

    toked = docs.select(
        F.col(id_col).alias("doc_id"), _tok(F.col(text_col)).alias("toks")
    )
    doclens = toked.select(
        "doc_id", F.size("toks").cast("bigint").alias("len")
    )
    postings = (
        toked.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    stats = doclens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(len) div count(1)").cast("bigint").alias("avgl"),
    )
    return postings, doclens, stats


def write_bm25_index(
    postings: DataFrame, doclens: DataFrame, stats: DataFrame, index_dir: str
) -> None:
    """Persist the three index tables under index_dir. Postings land
    range-partitioned and sorted by term, so every file's row groups carry
    tight term min/max stats and a term-probe scan skips all but the
    queried slices — the parquet-native equivalent of per-term posting
    files."""
    (
        postings.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/postings")
    )
    doclens.write.mode("overwrite").parquet(f"{index_dir}/doclens")
    stats.write.mode("overwrite").parquet(f"{index_dir}/stats")


def read_bm25_index(
    spark, index_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{index_dir}/postings"),
        spark.read.parquet(f"{index_dir}/doclens"),
        spark.read.parquet(f"{index_dir}/stats"),
    )


def bm25_index_search(
    postings: DataFrame,
    doclens: DataFrame,
    stats: DataFrame,
    terms: list[str],
    top_k: int = _TOPK,
) -> DataFrame:
    """Serve a disjunctive BM25 query from the STORED index — raw text is
    never touched. Output (doc_id, score, n_terms, rnk), bit-identical to
    the live plans/extensions bm25_search on the same corpus (shared exact
    oracle). The term filter lands in the postings scan (PushedFilters:
    In(term, ...)), so with the sorted layout the read is ~the queried
    posting lists; df re-aggregates those rows; stats is a 1-row
    broadcast; the only doc-keyed join moves (doc_id, len) pairs."""
    from .classify import log2_fp_sql

    tf = postings.filter(F.col("term").isin(terms))
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    lg = lambda x: log2_fp_sql(x, dialect="spark")  # noqa: E731
    num = f"(tf * {_K1 + 1000} * 1000 * avgl)"
    den = (
        f"(tf * {_SCALE} * avgl"
        f" + {_K1 * (1000 - _B)} * avgl"
        f" + {_K1 * _B} * len)"
    )
    contrib = (
        tf.join(F.broadcast(dfr), "term")
        .join(doclens, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "c",
            F.expr(
                f"({lg('2 * n_docs + 2')} - {lg('2 * df + 1')})"
                f" * (({num} * {_SCALE}) div {den})"
            ),
        )
    )
    hits = contrib.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    top = hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        top_k
    )
    rw = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn(
        "rnk", F.row_number().over(rw).cast("bigint")
    ).select("doc_id", "score", "n_terms", "rnk")


def bm25_index_search_batch(
    postings: DataFrame,
    doclens: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    top_k: int = _TOPK,
    push_terms_limit: int = 10_000,
) -> DataFrame:
    """Serve a BATCH of BM25 queries from the stored index in ONE lazy
    plan: `query_terms` is (query_id, term) — one row per distinct term
    per query (dedupe upstream; repeated query terms would double-count
    their contribution). Output (query_id, doc_id, score, n_terms, rnk
    ≤ top_k per query), the same fixed-point arithmetic as
    bm25_index_search so each query's ranking is bit-identical to running
    it alone.

    Plan (100 TB): the DISTINCT term set across the whole batch probes
    the sorted postings once. A semi-join probe CANNOT reach parquet
    row-group stats (the term set is data, not a literal), so when the
    batch's distinct terms number ≤ `push_terms_limit` they are collected
    (bounded by the batch itself — a query batch's vocabulary, KBs) and
    pushed as a literal In(term, ...) filter: the scan then skips all but
    the queried lists' row groups, the whole point of the sorted layout
    (measured 68.8% row-group skipping, SKIPPING_r6.jsonl). Past the
    limit it degrades to the broadcast semi-join (post-scan pruning).
    df aggregates the probed frame per term, independent of which queries
    share a term; attaching query_id is a broadcast join of the (small)
    query_terms table; per-query ranking is a window over the
    ≤ batch·candidates hit frame. Amortization is the point: a query
    batch costs one postings probe, not |batch| probes."""
    from .classify import log2_fp_sql

    qt = query_terms.select("query_id", "term")
    terms = qt.select("term").distinct()
    pushed = terms.limit(push_terms_limit + 1).collect()
    if len(pushed) <= push_terms_limit:
        tf = postings.filter(F.col("term").isin([r["term"] for r in pushed]))
    else:
        tf = postings.join(F.broadcast(terms), "term", "left_semi")
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    lg = lambda x: log2_fp_sql(x, dialect="spark")  # noqa: E731
    num = f"(tf * {_K1 + 1000} * 1000 * avgl)"
    den = (
        f"(tf * {_SCALE} * avgl"
        f" + {_K1 * (1000 - _B)} * avgl"
        f" + {_K1 * _B} * len)"
    )
    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(doclens, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "c",
            F.expr(
                f"({lg('2 * n_docs + 2')} - {lg('2 * df + 1')})"
                f" * (({num} * {_SCALE}) div {den})"
            ),
        )
    )
    hits = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "doc_id", "score", "n_terms", "rnk")
    )


def bm25_index_append(
    postings: DataFrame,
    doclens: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    check_disjoint: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold new documents into a stored index WITHOUT re-tokenizing the
    base corpus: per-doc posting rows are disjoint across docs, so the
    merged postings are a plain union of stored rows + the delta build,
    and stats recompute from the merged doclens — bit-identical to a full
    rebuild over base ∪ new (pinned in tests; same frozen-preprocessing
    contract as pq_index_append's frozen codebook). Cost: tokenize only
    the delta, one union, one 1-row aggregate.

    The rebuild identity REQUIRES new doc_ids disjoint from the stored
    index — re-appending an already-indexed doc would double-count its
    postings and doclens, corrupting df/avgl/n_docs. `check_disjoint`
    (default on) enforces it with a cheap probe: the delta's ≤-batch-size
    distinct ids broadcast-semi-join the stored doclens, limit 1 — one
    id-column scan, no tokenization, raises ValueError on overlap. Turn
    off only when the caller proves disjointness upstream (e.g. a
    monotonically-increasing id assigner)."""
    if check_disjoint:
        dup = (
            doclens.join(
                F.broadcast(new_docs.select(F.col(id_col).alias("doc_id")).distinct()),
                "doc_id",
                "left_semi",
            )
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"bm25_index_append: doc_id {dup[0]['doc_id']!r} is already "
                "indexed; appends must be disjoint from the stored index "
                "(pass check_disjoint=False only if disjointness is "
                "guaranteed upstream)"
            )
    p_new, l_new, _ = bm25_index_build(new_docs, id_col, text_col)
    postings2 = postings.unionByName(p_new)
    doclens2 = doclens.unionByName(l_new)
    stats2 = doclens2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(len) div count(1)").cast("bigint").alias("avgl"),
    )
    return postings2, doclens2, stats2


def dcg_discounts(k: int, fp: int = 10**9) -> dict[int, int]:
    """Fixed-point DCG rank discounts: floor(fp / log2(rank+1)) for rank
    1..k, computed DRIVER-SIDE with python math.log2 and injected as
    integer literals into BOTH the Spark plan and the DuckDB oracle — so
    neither engine's log2 ULP behavior can enter the result (the Shannon
    -entropy fixed-point-log2 discipline applied to ranking metrics)."""
    import math

    return {r: int(fp / math.log2(r + 1)) for r in range(1, k + 1)}


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rk",
    rel_col: str = "rel",
    fp: int = 10**9,
) -> DataFrame:
    """Retrieval RANKING evaluation — MRR, precision@k, nDCG@k per query,
    bit-deterministic across engines: `results` is a ranked run
    (query_col, id_col, rank_col with rank 1 best), `truth` carries
    graded relevance (query_col, id_col, rel_col ≥ 1; documents absent
    from truth are irrelevant). All accumulation is exact-integer —
    DCG folds rel · floor(fp/log2(rank+1)) as bigints (discounts
    precomputed driver-side, see dcg_discounts), IDCG re-ranks the
    query's OWN truth ideally (rel desc, id asc — handles ties and
    short truths, no uniform-grade assumption), and every float in the
    output is ONE division of exact integers:

      (query_id, n_hits, precision_at_k, mrr, ndcg)

    mrr = 1/rank of the first relevant result (0.0 when none);
    ndcg = dcg_fp / idcg_fp.

    Plan (100 TB): run⋈truth is an equi-join on (query, id) — broadcast
    the truth (qrels are small by nature); the metric is one
    query-granularity aggregate. Nothing here scans a corpus."""
    from pyspark.sql import Window

    disc = dcg_discounts(k, fp)
    disc_of = F.create_map(
        *[F.lit(x) for r, d in disc.items() for x in (r, d)]
    )

    run = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).cast("int").alias("__rk"),
    )
    t = truth.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("__id"),
        F.col(rel_col).cast("bigint").alias("__rel"),
    )
    j = run.join(F.broadcast(t), ["query_id", "__id"], "left").select(
        "query_id",
        "__rk",
        F.coalesce("__rel", F.lit(0)).alias("__rel"),
    )
    hit = F.col("__rel") > 0
    per_q = j.groupBy("query_id").agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_hits"),
        (
            F.sum(F.when(hit, 1).otherwise(0)).cast("double")
            / F.lit(float(k))
        ).alias("precision_at_k"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(hit, F.col("__rk"))).cast("double"),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(F.col("__rel") * disc_of[F.col("__rk")])
        .cast("bigint")
        .alias("__dcg_fp"),
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    ideal = (
        t.withColumn("__irk", F.row_number().over(iw).cast("int"))
        .filter(F.col("__irk") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(F.col("__rel") * disc_of[F.col("__irk")])
            .cast("bigint")
            .alias("__idcg_fp")
        )
    )
    return per_q.join(ideal, "query_id").select(
        "query_id",
        "n_hits",
        "precision_at_k",
        "mrr",
        (F.col("__dcg_fp").cast("double") / F.col("__idcg_fp").cast("double"))
        .alias("ndcg"),
    )
