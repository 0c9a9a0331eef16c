"""Training-data assembly registry entries: sequence packing into
fixed-capacity context windows, domain mixture sampling, int8 embedding
quantization + quantized similarity search, and the remaining relational
set/grouping surface (GROUPING SETS, INTERSECT/EXCEPT).

Everything here is exact integer / pinned-hash arithmetic — bit-reproducible
across engines — so every query carries a full DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..functions.vectors import quantize_int8
from ..operators.packing import pack_sequences, packing_stats
from .extensions import _TOKS
from .registry import _t, query

# --- sequence packing ------------------------------------------------------

_CAPACITY = 512

_PACK_CTE = f"""
    WITH t AS (
      SELECT source AS shard, doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS doc_tokens
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, doc_tokens,
             CAST(SUM(doc_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM t
    ),
    e AS (
      SELECT shard, doc_id, doc_tokens, cum,
             unnest(range((cum - doc_tokens) // {_CAPACITY},
                          (cum - 1) // {_CAPACITY} + 1)) AS seq_id
      FROM c
    ),
    p AS (
      SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, doc_id, doc_tokens,
             CAST(least(cum, (seq_id + 1) * {_CAPACITY})
                  - greatest(cum - doc_tokens, seq_id * {_CAPACITY})
                  AS BIGINT) AS seq_tokens,
             CAST(greatest(cum - doc_tokens, seq_id * {_CAPACITY})
                  - (cum - doc_tokens) AS BIGINT) AS doc_offset
      FROM e
    )
"""


@query(
    "sequence_packing",
    oracle=_PACK_CTE
    + """
    SELECT shard, seq_id, doc_id, doc_tokens, seq_tokens, doc_offset FROM p
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.py): documents
    laid end-to-end per source shard, cut every 512 tokens — one row per
    (document, context window) overlap, with the token slice each window
    takes. One shard-partitioned window + JVM explode; exact integers, so
    the DuckDB oracle reproduces the packing bit-for-bit."""
    (docs,) = _t(spark, sf_dir, "documents")
    return pack_sequences(
        docs,
        capacity=_CAPACITY,
        token_count_col=token_count(F.col("text")),
        id_col="doc_id",
        shard_col="source",
    )


@query(
    "packing_stats",
    oracle=_PACK_CTE
    + f"""
    , per_seq AS (
      SELECT shard, seq_id, SUM(seq_tokens) AS fill,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM p GROUP BY shard, seq_id
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN fill = {_CAPACITY} THEN 1 ELSE 0 END) AS BIGINT)
             AS full_windows,
           CAST(SUM(fill) AS BIGINT) AS total_tokens,
           CAST(SUM(n_docs) AS BIGINT) AS doc_slices
    FROM per_seq GROUP BY shard
    """,
)
def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency per shard: every window except possibly the last
    is exactly full (concat-and-chunk never wastes tokens), so full_windows
    = n_windows - 1 and total_tokens = shard token count — the oracle proves
    both invariants hold."""
    (docs,) = _t(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs,
        capacity=_CAPACITY,
        token_count_col=token_count(F.col("text")),
        id_col="doc_id",
        shard_col="source",
    )
    return packing_stats(packed, capacity=_CAPACITY)


# --- domain mixture sampling -----------------------------------------------

# Per-source keep rates in 16ths (md5 first-nibble thresholds): the static
# domain-reweighting step of corpus assembly (upsample curated sources,
# downsample crawl). Membership is a pure function of doc_id — stable under
# corpus growth, engine-exact (same md5 both sides), granularity 1/16.
_MIX_RATES = {f"src{i}": (16, 8, 4, 2)[i % 4] for i in range(20)}
_HEX = "0123456789abcdef"


@query(
    "domain_mixture_sample",
    oracle="""
    SELECT doc_id, source,
           CAST(CASE {cases} END AS DOUBLE) / 16.0 AS keep_rate
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
          substring('0123456789abcdefg', CASE {cases} END + 1, 1)
    """.format(
        cases=" ".join(
            f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items()
        )
    ),
)
def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: each source keeps a configured
    fraction (16ths) of its documents, membership decided by the first md5
    nibble of doc_id — the reproducible downsampling step that rebalances a
    crawl-heavy corpus toward a target mixture. A doc never migrates in or
    out as the corpus grows, and reruns are idempotent."""
    (docs,) = _t(spark, sf_dir, "documents")
    rate = F.lit(None).cast("int")
    expr = None
    for s, r in _MIX_RATES.items():
        cond = F.col("source") == s
        expr = F.when(cond, r) if expr is None else expr.when(cond, r)
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    # nibble < k-th hex char ⇔ nibble index < k  (rate 16 keeps everything:
    # the sentinel 'g' sorts after every hex digit).
    threshold = F.substring(F.lit(_HEX + "g"), expr + 1, 1)
    return docs.filter(nibble < threshold).select(
        "doc_id",
        "source",
        (expr.cast("double") / 16.0).alias("keep_rate"),
    )


# --- int8 embedding quantization -------------------------------------------

_SQL_QUANT = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
      FROM e
    ),
    s AS (
      SELECT vec_id, v,
             CASE WHEN maxabs > 0 AND NOT isinf(127.0 / maxabs)
                  THEN 127.0 / maxabs ELSE 0.0 END AS scale
      FROM m
    ),
    q AS (
      SELECT vec_id, scale, CAST(len(v) AS BIGINT) AS n_dims,
             list_transform(
               v, x -> least(greatest(CAST(floor(x * scale + 0.5) AS BIGINT),
                                      -127), 127)) AS qv
      FROM s
    )
"""


@query(
    "embedding_quantize",
    oracle=_SQL_QUANT
    + """
    SELECT vec_id, n_dims, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)
             AS q_norm_sq
    FROM q
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column
    (functions/vectors.py:quantize_int8 — the faiss-SQ8 storage scheme: 4×
    smaller, integer-SIMD scan). Codes are floor(x*scale+0.5) clamped to
    ±127 with a per-vector scale, all engine-exact arithmetic — the oracle
    verifies the integer code sums and the float32→double scale itself."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from ..functions.vectors import quant_scale

    qv = quantize_int8(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        quant_scale(F.col("embedding")).alias("scale"),
        F.aggregate(qv, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            F.transform(qv, lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("q_norm_sq"),
    )


@query("bpe_train_merges", oracle=None)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 learned BPE merges over the documents corpus
    (operators/bpe.py — one corpus pass to the word-frequency table, then
    per-merge pair counts on |vocab| rows only). Inherently iterative
    (each merge decision conditions the next), so rows-only here; the
    algorithm is pinned against a pure-Python reference implementation in
    tests/test_text.py, and the output is a pure function of the corpus
    (deterministic tie-breaks)."""
    from ..operators.bpe import bpe_train_df

    (docs,) = _t(spark, sf_dir, "documents")
    return bpe_train_df(docs, n_merges=8)


def _jl_planes(n_planes: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    from ..operators.similarity import _hyperplane

    return [_hyperplane(dim, k, seed) for k in range(n_planes)]


def _jl_oracle(n_planes: int = 8) -> str:
    """UNION-ALL twin of the projection: one SELECT per output component,
    plane constants inlined from the SAME generator as the Spark side (repr
    round-trips doubles exactly, so both engines parse identical planes).

    Two bit-determinism traps, both measured as real 1-ulp divergences:
      * the sum MUST be `list_reduce` (a strict left fold, matching Spark's
        `aggregate` expression bit-for-bit), not `list_sum` — with
        full-mantissa plane constants the products round, so summation
        ORDER changes the last ulp (list_sum is safe elsewhere in this
        registry only because those dots multiply float32-mantissa values
        whose products are exact);
      * the constants MUST be parsed as STRING→DOUBLE — a bare numeric
        literal goes through DECIMAL(17,16) first, which loses the last
        ulp on 57 of these 512 constants."""
    parts = []
    for k, plane in enumerate(_jl_planes(n_planes)):
        consts = "[" + ", ".join(f"'{c!r}'" for c in plane) + "]"
        parts.append(
            f"SELECT vec_id, CAST({k} AS BIGINT) AS k, "
            f"list_reduce(list_prepend(0.0, "
            f"list_transform(list_zip(embedding::DOUBLE[], {consts}::DOUBLE[]), "
            f"x -> x[1]*x[2])), (acc, x) -> acc + x) AS proj FROM embeddings"
        )
    return "\nUNION ALL\n".join(parts)


@query("embedding_project", oracle=_jl_oracle(8))
def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the embedding column onto
    8 deterministic pseudo-random hyperplanes (the same seeded generator as
    hyperplane-LSH) — the cheap dimensionality reduction applied before
    clustering/ANN when 64 dims are more than the distance structure needs.
    Map-side only: 8 dot products per row inside codegen, no shuffle; the
    dot is the engine-exact left-fold shared with ann_topk, so this carries
    an exact oracle. Emits (vec_id, k, proj) rows."""
    from ..functions.vectors import as_double, dot

    (emb,) = _t(spark, sf_dir, "embeddings")
    dots = [
        dot(as_double(F.col("embedding")), F.array(*[F.lit(c) for c in plane]))
        for plane in _jl_planes(8)
    ]
    return emb.select(
        "vec_id", F.posexplode(F.array(*dots)).alias("k", "proj")
    ).select("vec_id", F.col("k").cast("bigint").alias("k"), "proj")


@query("bpe_tokenize_stats", oracle=None)
def q_bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE: segment every document under the merge table
    learned by bpe_train (8 merges, inlined as literals into one codegen'd
    expression — operators/bpe.py bpe_segment) and report per-document
    piece statistics: total pieces and multi-character pieces (how much the
    learned merges compress). rows-only (depends on the iteratively learned
    merges); segmentation is pinned against a pure-Python reference in
    tests/test_text.py."""
    from ..operators.bpe import bpe_segment, bpe_train

    (docs,) = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8)
    pieces = bpe_segment(F.col("text"), merges)
    return docs.select(
        "doc_id",
        F.size(pieces).cast("bigint").alias("n_pieces"),
        F.size(F.filter(pieces, lambda p: F.length(p) > 1))
        .cast("bigint")
        .alias("n_multichar_pieces"),
    )


@query(
    "embedding_standardize",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding::DOUBLE[], 1) - 1 AS BIGINT) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ),
    m AS (
      SELECT dim,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx
      FROM ex GROUP BY dim
    )
    SELECT e.vec_id, e.dim,
           CASE WHEN sxx / n - (sx / n) * (sx / n) > 0
                THEN (CAST(CAST(x AS DECIMAL(18,6)) AS DOUBLE) - sx / n)
                       / sqrt(sxx / n - (sx / n) * (sx / n))
                END AS z
    FROM ex e JOIN m ON e.dim = m.dim
    """,
)
def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding column — the
    feature-normalization pass run before clustering / IVF training so no
    dimension dominates the distance metric. Bit-deterministic by the
    corr_stats discipline: moments accumulate as EXACT decimals
    (order-independent partial sums), floats appear only in one final
    scalar expression evaluated identically by both engines; constant
    dimensions (zero variance) yield NULL in both.

    Scale: the exploded frame feeds two plan branches — the 64-group moment
    aggregate (fully map-side combined; the shuffle moves 64×n_partitions
    partial rows) and the standardize pass the 64-row moment table
    broadcast-joins onto — so the source is scanned twice; at 100 TB stage
    the explode (or the moments) to parquet once instead. Emits
    (vec_id, dim, z) rows; reassemble with collect_list if an array column
    is needed downstream."""
    from ..functions.vectors import as_double

    (emb,) = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(as_double(F.col("embedding"))).alias("dim", "x"),
    ).select("vec_id", F.col("dim").cast("bigint").alias("dim"), "x")
    x6 = F.col("x").cast("decimal(18,6)")
    m = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x6).cast("double").alias("sx"),
        F.sum(x6 * x6).cast("double").alias("sxx"),
    )
    j = ex.join(F.broadcast(m), "dim")
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    z = (x6.cast("double") - mean) / F.sqrt(var)
    return j.select("vec_id", "dim", F.when(var > 0, z).alias("z"))


@query(
    "quantized_ann_topk",
    oracle=_SQL_QUANT
    + """
    , qq AS (SELECT vec_id AS query_id, qv AS qa FROM q WHERE vec_id < 5),
    d AS (
      SELECT query_id, c.vec_id,
             CAST(list_sum(list_transform(list_zip(qa, c.qv),
                                          x -> x[1] * x[2])) AS BIGINT)
               AS qdot
      FROM q c, qq WHERE c.vec_id <> query_id
    ),
    r AS (
      SELECT query_id, vec_id, qdot,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qdot DESC, vec_id ASC) AS rk
      FROM d
    )
    SELECT query_id, vec_id, qdot, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 10
    """,
)
def q_quantized_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors by EXACT integer dot product over int8-quantized
    codes: the scan arithmetic of an SQ8 index. Broadcast query side, one
    corpus scan, window top-k — same plan shape as ann_topk but the score
    is a bigint fold, so ranking (incl. ties, pinned by vec_id) is
    bit-reproducible on any engine; no float accumulation anywhere."""
    from ..operators.similarity import quantized_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", "vec_id", "qdot", "rk"
    )


# --- grouping sets / set operators -----------------------------------------

_GS_SQL = """
    SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(GROUPING(source) AS BIGINT) AS g_source,
           CAST(GROUPING(lang) AS BIGINT) AS g_lang
    FROM documents
    GROUP BY GROUPING SETS ((source, lang), (source), ())
"""


@query("grouping_sets", oracle=_GS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-(source, lang) counts, per-source subtotals, and a grand total in
    ONE pass — Spark plans a single Expand + hash aggregate, not three
    scans. GROUPING() markers disambiguate subtotal rows from genuine
    NULL group values."""
    (docs,) = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gs_documents")
    return spark.sql(_GS_SQL.replace("FROM documents", "FROM gs_documents"))


@query(
    "intersect_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 200
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 330
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: users with a high-value purchase AND a high-value
    click but no severe error. INTERSECT binds tighter than EXCEPT (ANSI
    precedence, same in Spark and DuckDB); Spark plans these as left-semi /
    left-anti hash joins over the distinct sets — no sort, no cross
    product."""
    (events,) = _t(spark, sf_dir, "events")

    def by_type(t: str, min_value: float) -> DataFrame:
        return events.filter(
            (F.col("event_type") == t) & (F.col("value") > min_value)
        ).select("user_id")

    return (
        by_type("purchase", 200)
        .intersect(by_type("click", 200))
        .subtract(by_type("error", 330))
    )


@query(
    "rank_fusion",
    oracle=_SQL_QUANT
    + """
    , qq AS (SELECT vec_id AS query_id, qv AS qa FROM q WHERE vec_id < 5),
    dq AS (
      SELECT query_id, c.vec_id,
             CAST(list_sum(list_transform(list_zip(qa, c.qv),
                                          x -> x[1] * x[2])) AS BIGINT)
               AS qdot
      FROM q c, qq WHERE c.vec_id <> query_id
    ),
    rq AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qdot DESC, vec_id ASC) AS rk
      FROM dq
    ),
    tq AS (SELECT query_id, vec_id, rk FROM rq WHERE rk <= 10),
    fe AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                               x -> x * x))) AS nrm
           FROM embeddings),
    fq AS (SELECT vec_id AS query_id, v AS qv2, nrm AS qn
           FROM fe WHERE vec_id < 5),
    dc AS (
      SELECT query_id, fe.vec_id,
             list_sum(list_transform(list_zip(fe.v, qv2), x -> x[1] * x[2]))
               / (fe.nrm * qn) AS cos
      FROM fe, fq WHERE fe.vec_id <> query_id
    ),
    rc AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rk
      FROM dc
    ),
    tc AS (SELECT query_id, vec_id, rk FROM rc WHERE rk <= 10),
    u AS (
      SELECT COALESCE(tc.query_id, tq.query_id) AS query_id,
             COALESCE(tc.vec_id, tq.vec_id) AS vec_id,
             tc.rk AS rk_cos, tq.rk AS rk_q
      FROM tc FULL OUTER JOIN tq
        ON tc.query_id = tq.query_id AND tc.vec_id = tq.vec_id
    ),
    rrf_s AS (
      SELECT query_id, vec_id,
             COALESCE(1.0 / (60.0 + CAST(rk_cos AS DOUBLE)), 0.0)
               + COALESCE(1.0 / (60.0 + CAST(rk_q AS DOUBLE)), 0.0) AS rrf
      FROM u
    ),
    fin AS (
      SELECT query_id, vec_id, rrf,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, vec_id ASC) AS rk
      FROM rrf_s
    )
    SELECT query_id, vec_id, rrf, CAST(rk AS BIGINT) AS rk
    FROM fin WHERE rk <= 5
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, k=60) of two retrievers — exact float
    cosine and int8-quantized dot product — into one top-5 per query: how a
    retrieval stack combines rankings whose scores aren't comparable. Each
    doc's fused score sums AT MOST two 1/(60+rank) terms in one scalar
    expression (IEEE addition of two operands is commutative, so no
    accumulation-order hazard), and ranks themselves are integers — the
    fusion is bit-deterministic end to end.

    Scale: both retrievers are the established broadcast-anchor scans; the
    fusion joins two top-k tables (|queries|·k rows each) — negligible next
    to retrieval. Swap either input for its LSH/IVF variant at scale, same
    fusion."""
    from ..operators.similarity import brute_force_topk, quantized_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 5)

    cos_t = brute_force_topk(emb, anchors, k=10).select(
        "query_id", "vec_id", F.col("rk").cast("bigint").alias("rk_cos")
    )
    q_t = quantized_topk(emb, anchors, k=10).select(
        "query_id", "vec_id", F.col("rk").alias("rk_q")
    )

    fused = cos_t.join(q_t, ["query_id", "vec_id"], "full_outer").select(
        "query_id",
        "vec_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(60.0) + F.col("rk_cos").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(60.0) + F.col("rk_q").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("vec_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "rrf", "rk")
    )


# --- sliding-window document chunking (RAG indexing prep) -------------------

_CHUNK_W, _CHUNK_STRIDE = 32, 16

_SQL_CHUNK = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(
               0, greatest(n - {_CHUNK_W} + {_CHUNK_STRIDE - 1}, 0),
               {_CHUNK_STRIDE})) AS start
      FROM n
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           array_to_string(toks[start + 1 : start + {_CHUNK_W}], ' ')
             AS chunk_text,
           CAST(len(toks[start + 1 : start + {_CHUNK_W}]) AS BIGINT)
             AS chunk_n_tokens
    FROM c
"""


@query("doc_chunking", oracle=_SQL_CHUNK)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of the documents corpus (32-token windows,
    stride 16 — the RAG/retrieval indexing step that precedes embedding;
    operators/packing.py:chunk_documents). Tokenize → sequence of starts →
    posexplode → slice: all codegen'd JVM expressions, zero shuffles, exact
    integer chunk boundaries so both engines cut identical chunks."""
    from ..operators.packing import chunk_documents

    (docs,) = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=_CHUNK_W, stride=_CHUNK_STRIDE)


# --- int8 Gram matrix (the distributed half of quantized PCA) ---------------


_SQL_GRAM = (
    _SQL_QUANT
    + """
    , dims AS (SELECT CAST(range AS BIGINT) AS i FROM range(64))
    SELECT d1.i AS i, d2.i AS j,
           CAST(SUM(qv[d1.i + 1] * qv[d2.i + 1]) AS BIGINT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM q, dims d1, dims d2 WHERE d1.i <= d2.i GROUP BY 1, 2
    """
)


@query("gram_matrix_int8", oracle=_SQL_GRAM)
def q_gram_matrix_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular Gram matrix X'X over the int8-quantized embedding
    codes — the distributed step of PCA / whitening / SemDeDup's spectral
    variants (MLlib RowMatrix.computePrincipalComponents has the same
    shape: accumulate the d×d Gram in one pass, eigendecompose the tiny
    result driver-side). d=64 → 2080 (i ≤ j) cells; each row contributes
    its local products map-side, partial aggregation combines them before
    the single 2080-group shuffle — the shuffle volume is O(partitions·d²)
    regardless of corpus size, which is what makes one-pass PCA viable at
    100 TB. Pair products are generated by a nested JVM transform + one
    explode (no posexplode self-join — the corpus is never joined to
    itself).

    Exactness: codes are bigints in ±127, so products ≤ 16129 and the sum
    stays within bigint up to ~5.7e14 vectors — every cell is an exact
    integer on both engines, giving a linear-algebra kernel a bit-exact
    value oracle (the same int8-first discipline as kmeans_int8; centering
    to a covariance uses embedding_quantize's q_sum means downstream)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    qv = quantize_int8(F.col("embedding"))
    # Name the code array so the SQL lambda can index it (Spark brackets
    # are 0-based; the DuckDB oracle's are 1-based, hence its qv[i + 1]).
    cells = (
        emb.select(qv.alias("__gram_qv"))
        .select(
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
    )
    return cells.groupBy(
        F.col("c.i").alias("i"), F.col("c.j").alias("j")
    ).agg(
        F.sum("c.p").cast("bigint").alias("g"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@query("gram_matrix_int8_fast", oracle=_SQL_GRAM)
def q_gram_matrix_int8_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy fast path of gram_matrix_int8 — identical cells, BLAS
    throughput (operators/clustering.gram_int8_arrow: one int64 matmul
    partial per partition, d(d+1)/2 rows emitted per partition, constant
    shuffle). Shares the JVM twin's exact oracle, so the sanctioned Python
    path is held to the same bit-for-bit bar; measured 4-6x the JVM
    explode plan at sf0.1 and the gap widens with volume (matmul vs
    per-element codegen). The JVM twin remains the zero-Python fallback
    for clusters that forbid Python workers."""
    from ..operators.clustering import gram_int8_arrow

    (emb,) = _t(spark, sf_dir, "embeddings")
    return gram_int8_arrow(emb)


# --- token-budget corpus selection ------------------------------------------

_TB_BUDGET = 10_000
_TB_SCALE = 1000

_TB_SQL = f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             CAST(len(list_distinct({_TOKS})) * {_TB_SCALE}
                  // len({_TOKS}) AS BIGINT) AS score
      FROM documents WHERE len({_TOKS}) > 0
    ),
    b AS (
      SELECT score, CAST(SUM(n_tok) AS BIGINT) AS btok
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score, btok,
             CAST(SUM(btok) OVER (ORDER BY score DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS cum
      FROM b
    ),
    full_docs AS (
      SELECT s.doc_id, s.score, s.n_tok
      FROM s JOIN c USING (score) WHERE c.cum <= {_TB_BUDGET}
    ),
    boundary AS (
      SELECT score, {_TB_BUDGET} - (cum - btok) AS rem
      FROM c WHERE cum - btok < {_TB_BUDGET} AND cum > {_TB_BUDGET}
    ),
    bdocs AS (
      SELECT doc_id, score, n_tok
      FROM (
        SELECT s.doc_id, s.score, s.n_tok, boundary.rem,
               CAST(SUM(s.n_tok) OVER (PARTITION BY s.score
                                       ORDER BY s.doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS running
        FROM s JOIN boundary USING (score)
      ) WHERE running <= rem
    )
    SELECT doc_id, score, n_tok FROM full_docs
    UNION ALL
    SELECT doc_id, score, n_tok FROM bdocs
"""


@query("token_budget_select", oracle=_TB_SQL)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: greedily keep the highest-quality
    documents until a 10k-token training budget is spent — the "we can
    afford B tokens, which docs make the cut?" decision every
    pretraining data mix ends with. Quality here is the integer
    distinct-token fraction (repetition penalty, score = n_distinct·1000
    div n_tok); any integer score (a trained classifier margin, a DSIR
    weight) slots into the identical plan.

    The naive plan global-sorts every document by score and runs one
    cumulative window over the corpus — a single-partition sort at 100 TB.
    This plan never orders documents globally: per-score token totals
    aggregate to BUCKET granularity (≤ 1001 rows at scale 1000 — the
    only ordered window runs there), the full-inclusion threshold and
    the boundary bucket's remaining budget fall out of the bucket
    cumsum, and only the ONE boundary bucket's documents (1/|buckets| of
    the corpus, partitioned by score) need a doc-ordered prefix window.
    Selection contract: buckets strictly above the threshold are taken
    whole; inside the boundary bucket docs are taken in doc_id order
    while the running token sum fits (a strict prefix — a too-big doc
    ends the bucket, no skip-ahead), so the result is deterministic and
    all-integer on both engines."""
    from ..functions.text import tokens as _tok
    from ..operators.skew import fan_out

    (docs,) = _t(spark, sf_dir, "documents")
    # the tokenizer runs (once per consumer of `s`) above this exchange
    # (1-partition single-file scan at bench SF; no-op at real scale)
    toked = fan_out(docs).select("doc_id", _tok(F.col("text")).alias("tk"))
    s = (
        toked.select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tok"),
            F.expr(f"size(array_distinct(tk)) * {_TB_SCALE} div size(tk)")
            .cast("bigint")
            .alias("score"),
        )
        .filter(F.col("n_tok") > 0)
    )
    b = s.groupBy("score").agg(F.sum("n_tok").cast("bigint").alias("btok"))
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = b.withColumn("cum", F.sum("btok").over(wc).cast("bigint"))
    full_docs = s.join(
        F.broadcast(c.filter(F.col("cum") <= _TB_BUDGET).select("score")), "score"
    ).select("doc_id", "score", "n_tok")
    boundary = c.filter(
        ((F.col("cum") - F.col("btok")) < _TB_BUDGET)
        & (F.col("cum") > _TB_BUDGET)
    ).select("score", (F.lit(_TB_BUDGET) - (F.col("cum") - F.col("btok"))).alias("rem"))
    wr = (
        Window.partitionBy("score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bdocs = (
        s.join(F.broadcast(boundary), "score")
        .withColumn("running", F.sum("n_tok").over(wr).cast("bigint"))
        .filter(F.col("running") <= F.col("rem"))
        .select("doc_id", "score", "n_tok")
    )
    return full_docs.unionAll(bdocs)
