"""Hybrid lexical+semantic retrieval over the two PERSISTED indexes
(VERDICT r6 next-round #4): one registry query that serves a query batch
from the STORED BM25 inverted index (plans/extensions.ensure_bm25_index →
operators/retrieval.bm25_index_search_batch) and the STORED PQ index
(plans/clustering.ensure_pq_index → operators/clustering.pq_index_search)
and reciprocal-rank-fuses the two rankings in ONE lazy plan — the standard
lexical+semantic search stack (Elasticsearch+vector-store, Vespa,
Weaviate's hybrid mode), composed from this engine's own stored artifacts.

Queries are the first five documents themselves (doc_id < 5), used
"more-like-this" style: the lexical half ranks by BM25 over each query
doc's distinct tokens; the semantic half ranks by PQ ADC distance from
the query doc's embedding (doc_id ≡ vec_id in the testdata — the
embedding OF the document). Each half's arithmetic is its family's exact
fixed-point/strict-fold pipeline and RRF adds AT MOST two 1/(60+rank)
doubles (two-operand IEEE addition — no accumulation-order hazard), so
the whole composition carries one exact DuckDB value oracle.

Reference parity: the reference has no retrieval surface
(/root/reference/dags/etl/kpi_processor.py:40-101 is flat CSV ETL);
this is the BASELINE.json training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .clustering import (
    _DIM,
    _PQ_ITER,
    _PQ_M,
    _pq_serve_ctes,
    _pq_train_ctes,
    _SQL_QF_CTE,
    ensure_pq_index,
)
from .extensions import _BM25_B, _BM25_K1, _BM25_SCALE, _TOKS, ensure_bm25_index
from .registry import _t, query

_RRF_K = 60
_HY_TOPK_EACH = 10  # per-retriever depth fed into the fusion
_HY_TOPK = 5  # fused output depth per query


def _hybrid_sql() -> str:
    from ..operators.classify import log2_fp_sql

    lg = lambda x: log2_fp_sql(x, dialect="duck")  # noqa: E731
    num = f"(tf * {_BM25_K1 + 1000} * 1000 * avgl)"
    den = (
        f"(tf * {_BM25_SCALE} * avgl"
        f" + {_BM25_K1 * (1000 - _BM25_B)} * avgl"
        f" + {_BM25_K1 * _BM25_B} * len)"
    )
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),"
        + _SQL_QF_CTE
        + ","
        + _pq_train_ctes("")
        + _pq_serve_ctes(_PQ_ITER, _HY_TOPK_EACH)
        + f""",
    d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM d),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avgl
      FROM lens
    ),
    toks AS (SELECT doc_id, unnest(toks) AS term FROM d),
    qt AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT doc_id AS query_id, unnest(toks) AS term
        FROM d WHERE doc_id < 5)
    ),
    tfq AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks JOIN (SELECT DISTINCT term FROM qt) USING (term)
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term),
    contrib AS (
      SELECT qt.query_id, tfq.doc_id,
             ({lg("2 * n_docs + 2")} - {lg("2 * df + 1")})
               * (({num} * {_BM25_SCALE}) // {den}) AS c
      FROM tfq
      JOIN qt USING (term)
      JOIN dfq USING (term)
      JOIN lens ON lens.doc_id = tfq.doc_id, stats
    ),
    lex AS (
      SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score
      FROM contrib GROUP BY query_id, doc_id
    ),
    lex_top AS (
      SELECT query_id, doc_id, rk_lex FROM (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk_lex
        FROM lex) WHERE rk_lex <= {_HY_TOPK_EACH}
    ),
    u AS (
      SELECT COALESCE(l.query_id, s.query_id) AS query_id,
             COALESCE(l.doc_id, s.vec_id) AS doc_id,
             l.rk_lex, s.rk AS rk_sem
      FROM lex_top l FULL OUTER JOIN pq_top s
        ON l.query_id = s.query_id AND l.doc_id = s.vec_id
    ),
    rrf_s AS (
      SELECT query_id, doc_id,
             COALESCE(1.0 / ({_RRF_K}.0 + CAST(rk_lex AS DOUBLE)), 0.0)
               + COALESCE(1.0 / ({_RRF_K}.0 + CAST(rk_sem AS DOUBLE)), 0.0)
               AS rrf
      FROM u
    )
    SELECT query_id, doc_id, rrf, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rk
      FROM rrf_s) WHERE rk <= {_HY_TOPK}
    """
    )


@query("hybrid_search", oracle=_hybrid_sql())
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval from the two stored indexes (module doc): BM25
    more-like-this top-10 per query from the parquet inverted index +
    PQ ADC top-10 per query from the parquet code/codebook tables,
    RRF-fused (k=60) to a top-5 per query — raw text and raw vectors are
    never rescanned on the serve path (the PQ half reads only codes; the
    lexical half reads only the queried posting lists).

    Plan (100 TB): the batch's distinct term set probes the sorted
    postings ONCE (row-group pruning keeps the read ~the queried lists);
    the PQ half broadcasts codebook + query subvectors over one code-table
    scan; the fusion joins two |queries|·10-row rank tables — negligible.
    A self-hit (the query doc itself) tops both rankings by construction;
    production drops it with one post-fusion filter, kept here so both
    halves stay verbatim their oracle-pinned single-index shapes."""
    from ..functions.text import tokens as _tok
    from ..operators.clustering import pq_index_search
    from ..operators.retrieval import bm25_index_search_batch

    docs, emb = _t(spark, sf_dir, "documents", "embeddings")
    postings, doclens, stats = ensure_bm25_index(spark, sf_dir)
    codes, codebook = ensure_pq_index(spark, sf_dir)

    qt = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(_tok(F.col("text"))).alias("term"),
        )
        .distinct()
    )
    lex = bm25_index_search_batch(
        postings, doclens, stats, qt, top_k=_HY_TOPK_EACH
    ).select("query_id", "doc_id", F.col("rnk").alias("rk_lex"))
    sem = pq_index_search(
        codes,
        codebook,
        emb.filter(F.col("vec_id") < 5),
        k=_HY_TOPK_EACH,
        m_subspaces=_PQ_M,
        dim=_DIM,
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("rk").cast("bigint").alias("rk_sem"),
    )

    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rk_lex").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rk_sem").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rk") <= _HY_TOPK)
        .select("query_id", "doc_id", "rrf", "rk")
    )


# --- metadata-filtered vector search -------------------------------------------

# The filtered-ANN mode every production vector store ships (Qdrant/Vespa/
# Milvus "pre-filtering"): restrict the search to vectors whose DOCUMENT
# satisfies a metadata predicate, then rank only those. doc_id ≡ vec_id in
# the testdata, so the documents table IS the metadata sidecar.

_FILTER_LANG = "en"  # ~44% selectivity at sf0.01 — the filter does real work

_DOT = "list_sum(list_transform(list_zip(cv, qv), x -> x[1]*x[2]))"
_NORM_CV = "sqrt(list_sum(list_transform(cv, x -> x*x)))"
_NORM_QV = "sqrt(list_sum(list_transform(qv, x -> x*x)))"

_SQL_FILTERED_ANN = f"""
    WITH allowed AS (
      SELECT doc_id AS vec_id FROM documents WHERE lang = '{_FILTER_LANG}'
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    c AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS cv
      FROM embeddings e JOIN allowed USING (vec_id)
    ),
    s AS (
      SELECT query_id, vec_id, {_DOT} / ({_NORM_CV} * {_NORM_QV}) AS cos_sim
      FROM c, q WHERE vec_id <> query_id
    ),
    r AS (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rk
      FROM s
    )
    SELECT query_id, vec_id, cos_sim, rk FROM r WHERE rk <= 10
"""


@query("filtered_ann_topk", oracle=_SQL_FILTERED_ANN)
def q_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact vector search: top-10 cosine neighbors per
    anchor query restricted to documents with lang = 'en' — the
    correctness baseline for the filtered-ANN mode (PRE-filtering: the
    allowed id set constrains candidates BEFORE ranking, so a query
    always gets k results from the allowed set; post-filtering an
    unfiltered top-k can starve). Plan: the metadata predicate reduces to
    an id set (a narrow documents projection, broadcast), one left-semi
    prune of the corpus, then ann_topk's broadcast-query scan + window
    top-k over ~44% of the rows. At 100 TB the allowed set stays an
    id-only semi-join (never a wide join) and the predicate pushes into
    the documents scan."""
    from ..operators.similarity import brute_force_topk

    docs, emb = _t(spark, sf_dir, "documents", "embeddings")
    allowed = docs.filter(F.col("lang") == _FILTER_LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(F.broadcast(allowed), "vec_id", "left_semi")
    out = brute_force_topk(corpus, emb.filter(F.col("vec_id") < 5), k=10)
    return out.withColumn("rk", F.col("rk").cast("bigint"))


_SQL_FILTERED_PQ = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),"
    + _SQL_QF_CTE
    + ","
    + _pq_train_ctes("")
    + f""",
    allowed AS (
      SELECT doc_id AS vec_id FROM documents WHERE lang = '{_FILTER_LANG}'
    ),
    fcodes AS (
      SELECT a.* FROM a{_PQ_ITER} a JOIN allowed USING (vec_id)
    )"""
    + _pq_serve_ctes(_PQ_ITER, 10, codes_src="fcodes")
    + """
    SELECT query_id, vec_id, adc_d2, rk FROM pq_top
    """
)


@query("filtered_pq_ann_topk", oracle=_SQL_FILTERED_PQ)
def q_filtered_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN over the STORED PQ index — the scale path of
    filtered_ann_topk: the metadata predicate reduces to an id-only
    allowed set that left-semi prunes the parquet CODE table (8 bytes per
    vector, never the raw corpus), then the standard broadcast-codebook
    ADC scan ranks only allowed candidates. Pre-filtering composes with
    the compressed index for free BECAUSE the code table is an ordinary
    keyed table — this is the practical argument for codes-as-a-table
    over opaque index blobs. Same exact oracle discipline as pq_ann_topk
    with the code CTE filtered."""
    from ..operators.clustering import pq_index_search

    docs, emb = _t(spark, sf_dir, "documents", "embeddings")
    codes, codebook = ensure_pq_index(spark, sf_dir)
    allowed = docs.filter(F.col("lang") == _FILTER_LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    fcodes = codes.join(F.broadcast(allowed), "vec_id", "left_semi")
    out = pq_index_search(
        codes=fcodes,
        codebook=codebook,
        queries=emb.filter(F.col("vec_id") < 5),
        k=10,
        m_subspaces=_PQ_M,
        dim=_DIM,
    )
    return out.select(
        "query_id", "vec_id", "adc_d2", F.col("rk").cast("bigint").alias("rk")
    )
