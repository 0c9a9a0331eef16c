"""Registry entries for the hashed linear classifier
(operators/classify.py) and integer PageRank (operators/graph.py) —
both deterministic-by-construction so they carry EXACT DuckDB value
oracles, like the kmeans_int8 family in plans/clustering.py.

Reference parity: the reference engine has neither — this is
BASELINE.json training-pipeline extension surface (quality gating and
graph centrality over behavioral/near-dup graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS, gopher_rules, tokens
from ..operators.classify import (
    hashed_linear_classify,
    log2_fp_sql,
    train_hashed_weights,
)
from ..operators.graph import pagerank_scaled, triangle_counts
from .extensions import _NORM, _TOKS, _sql_count_in
from .registry import _t, query

_N_BUCKETS, _SEED, _W_MAX = 4096, 7, 500

_SQL_CLASSIFIER = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('t:{_SEED}:' || tok), 1, 15))::UBIGINT
                  % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM tok WHERE tok <> ''
    ),
    w AS (
      SELECT CAST(range AS BIGINT) AS bucket,
             CAST(('0x' || substr(md5('w:{_SEED}:' || range::VARCHAR), 1, 15))
                  ::UBIGINT % {2 * _W_MAX + 1} AS BIGINT) - {_W_MAX} AS weight
      FROM range({_N_BUCKETS})
    ),
    s AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(weight) AS BIGINT) AS margin
      FROM b JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, margin,
           CASE WHEN margin >= 0 THEN 'keep' ELSE 'drop' END AS label
    FROM s
"""


@query("quality_classifier", oracle=_SQL_CLASSIFIER)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality gate (the CCNet/RedPajama
    filter shape): tokens hashed into a 4096-slot integer weight table
    (hashing trick), weight lookup via BROADCAST join against the exploded
    token stream, one groupBy(doc) integer sum = the margin, sign = the
    keep/drop label. Integer weights make the margin exact and
    order-independent — a classifier with a bit-exact value oracle. The
    weight table here is the deterministic md5-derived stand-in (no trained
    model ships in the container); a trained (bucket, weight) table slots
    into the identical plan."""
    from ..operators.skew import fan_out

    (docs,) = _t(spark, sf_dir, "documents")
    # single-file corpus scan = ONE partition; the tokenize/md5 explode is
    # the row's whole cost, so spread the scan first (no-op at real scale)
    return hashed_linear_classify(fan_out(docs), n_buckets=_N_BUCKETS, seed=_SEED)


# --- Naive-Bayes training for the hashed linear classifier -----------------

_LG = lambda x: log2_fp_sql(x, dialect="duck")  # noqa: E731

_SQL_TRAIN = f"""
    WITH lab AS (
      SELECT text,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
             CAST(length(regexp_replace({_NORM}, ' ', '', 'g')) AS DOUBLE)
               AS n_nonspace,
             CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]')))
               AS DOUBLE) AS n_alpha,
             CAST({_sql_count_in(EN_STOPWORDS)} AS DOUBLE) AS n_stop,
             CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_distinct
      FROM documents
    ),
    y AS (
      SELECT text,
             (n_tok >= 10 AND n_tok <= 100000
              AND n_nonspace / greatest(n_tok, 1.0) >= 3.0
              AND n_nonspace / greatest(n_tok, 1.0) <= 10.0
              AND n_alpha / greatest(n_tok, 1.0) >= 0.8
              AND n_stop >= 2
              AND n_distinct / greatest(n_tok, 1.0) >= 0.3) AS y
      FROM lab
    ),
    tok AS (
      SELECT y, unnest({_TOKS}) AS tok FROM y WHERE y IS NOT NULL
    ),
    b AS (
      SELECT y,
             CAST(('0x' || substr(md5('t:{_SEED}:' || tok), 1, 15))::UBIGINT
                  % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM tok WHERE tok <> ''
    ),
    c AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
      FROM b GROUP BY bucket
    ),
    f AS (
      SELECT CAST(range AS BIGINT) AS bucket,
             COALESCE(n_pos, 0::BIGINT) AS n_pos,
             COALESCE(n_neg, 0::BIGINT) AS n_neg
      FROM range({_N_BUCKETS}) r LEFT JOIN c ON c.bucket = CAST(range AS BIGINT)
    ),
    t AS (
      SELECT CAST(SUM(n_pos) AS BIGINT) AS pt, CAST(SUM(n_neg) AS BIGINT) AS nt
      FROM f
    )
    SELECT bucket, n_pos, n_neg,
           CAST(({_LG('n_pos + 1')} - {_LG(f'pt + {_N_BUCKETS}')})
              - ({_LG('n_neg + 1')} - {_LG(f'nt + {_N_BUCKETS}')}) AS BIGINT)
             AS weight
    FROM f, t
"""


@query("quality_classifier_train", oracle=_SQL_TRAIN)
def q_quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed linear quality gate (operators/classify.
    train_hashed_weights): distill the Gopher hard-rule conjunction
    (functions/text.gopher_rules — the auditable heuristic gate) into the
    4096-bucket fastText-shape model via one-pass per-class token counts →
    integer-quantized Naive-Bayes log-odds weights. The fixed-point
    piecewise-linear log2 (log2_fp_sql: bin()-length exponent + one integer
    interpolation, all non-negative bigint div) is what lets a TRAINER
    carry a bit-exact DuckDB value oracle — the same determinism discipline
    as the margin it feeds. Single corpus scan, label computed inline (no
    label join), one groupBy(bucket) shuffle of map-side-combined partial
    counts, 1-row totals broadcast; the trained table slots straight into
    `hashed_linear_classify(weights=)` (pinned in tests)."""
    import functools

    from ..operators.skew import fan_out

    (docs,) = _t(spark, sf_dir, "documents")
    passes = functools.reduce(
        lambda a, b: a & b, gopher_rules(F.col("text")).values()
    )
    # fan the RAW scan: the gopher label + tokenize/md5 explode all sit
    # above this exchange, so they parallelize (no-op at real scale)
    return train_hashed_weights(
        fan_out(docs).withColumn("__label", passes),
        "__label",
        n_buckets=_N_BUCKETS,
        seed=_SEED,
    )


# --- integer PageRank over the user↔prop-key bipartite graph ---------------

_PR_ITER, _PR_SCALE, _PR_DAMP = 3, 1_000_000, 850_000


def _pagerank_sql(n_iter: int = _PR_ITER) -> str:
    """Unrolled power iterations as CTEs — same integer arithmetic as
    operators/graph.pagerank_scaled (floor division on non-negative
    bigints, so Spark's `div` and DuckDB's `//` agree bit-for-bit)."""
    ctes = [
        f"""
    WITH ev AS (
      -- null guard: a missing/unparseable key must not create NULL edges
      -- (NULL equi-join and DISTINCT semantics are where engines could
      -- diverge; both sides drop them explicitly instead)
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
             'k:' || json_extract_string(props, '$.k') AS v
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    e AS (
      SELECT u, v FROM ev UNION SELECT v AS u, u AS v FROM ev
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY u),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
    ),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    base = _PR_SCALE - _PR_DAMP
    for it in range(n_iter):
        ctes.append(f"""
    c{it + 1} AS (
      SELECT e.v, SUM(r.rank // deg.outdeg) AS in_sum
      FROM e JOIN r{it} r ON r.node = e.u JOIN deg ON deg.u = e.u
      GROUP BY e.v
    ),
    r{it + 1} AS (
      SELECT node,
             CAST({base} + ({_PR_DAMP} * COALESCE(in_sum, 0)) // {_PR_SCALE}
                  AS BIGINT) AS rank
      FROM nodes LEFT JOIN c{it + 1} ON c{it + 1}.v = node
    )""")
    return ",".join(ctes) + f"\n    SELECT node, rank FROM r{n_iter}"


@query("pagerank_centrality", oracle=_pagerank_sql())
def q_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-scaled PageRank (3 power iterations, d=0.85 in ppm) over the
    symmetrized user↔prop-key bipartite graph from events — behavioral
    centrality, the graph twin of connected_components. All-bigint floor
    division makes every iteration engine-exact (see
    operators/graph.pagerank_scaled), so a PAGERANK carries a value oracle.
    Per iteration: one groupBy(dst) shuffle of partial contribution sums;
    the outdegree table joins broadcast-size."""
    (events,) = _t(spark, sf_dir, "events")
    ev = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("k:"), F.get_json_object("props", "$.k")).alias("v"),
        )
        .distinct()
    )
    edges = ev.unionByName(
        ev.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return pagerank_scaled(
        edges,
        n_iter=_PR_ITER,
        src="u",
        dst="v",
        scale=_PR_SCALE,
        damping_ppm=_PR_DAMP,
    ).select(F.col("node"), F.col("rank"))


_SQL_TRAINED_CLASSIFIER = f"""
    WITH tw AS ({_SQL_TRAIN}),
    tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('t:{_SEED}:' || tok), 1, 15))::UBIGINT
                  % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM tok WHERE tok <> ''
    ),
    s AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(weight) AS BIGINT) AS margin
      FROM b JOIN tw USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, margin,
           CASE WHEN margin >= 0 THEN 'keep' ELSE 'drop' END AS label
    FROM s
"""


@query("quality_classifier_trained", oracle=_SQL_TRAINED_CLASSIFIER)
def q_quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END learned gate: train the Naive-Bayes weights
    (quality_classifier_train's plan) and score every document with them
    through the SAME broadcast-lookup classify plan, in one lazy DAG — the
    full distill-then-gate pipeline with a single exact oracle (the train
    SQL composes as a CTE into the classify SQL). On this synthetic corpus
    the pure-likelihood margin is keep-heavy (drop labels here are driven
    by length, which bag-of-words margins encode only weakly — measured
    honestly, threshold tuning belongs to the caller via `bias`); the
    engine contract being pinned is bit-exact trained margins at corpus
    scale."""
    import functools

    (docs,) = _t(spark, sf_dir, "documents")
    passes = functools.reduce(
        lambda a, b: a & b, gopher_rules(F.col("text")).values()
    )
    weights = train_hashed_weights(
        docs.withColumn("__label", passes),
        "__label",
        n_buckets=_N_BUCKETS,
        seed=_SEED,
    ).select("bucket", "weight")
    return hashed_linear_classify(
        docs, weights=weights, n_buckets=_N_BUCKETS, seed=_SEED
    )


# --- triangle counting over the hour-scoped co-occurrence graph ------------

_TRI_DF_CAP = 50

_SQL_TRIANGLES = f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k,
             date_trunc('hour', ts) AS h
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND ts IS NOT NULL
    ),
    kdf AS (
      SELECT k, h, CAST(COUNT(*) AS BIGINT) AS df FROM uk GROUP BY k, h
    ),
    ukc AS (
      SELECT u, uk.k, uk.h FROM uk JOIN kdf USING (k, h)
      WHERE df <= {_TRI_DF_CAP}
    ),
    e AS (
      SELECT DISTINCT a.u AS u1, b.u AS u2
      FROM ukc a JOIN ukc b USING (k, h) WHERE a.u < b.u
    ),
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u1 AS u FROM e UNION ALL SELECT u2 AS u FROM e)
      GROUP BY u
    ),
    o AS (
      SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u1 < e.u2)
                  THEN e.u1 ELSE e.u2 END AS a,
             CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u1 < e.u2)
                  THEN e.u2 ELSE e.u1 END AS b
      FROM e JOIN deg d1 ON d1.u = e.u1 JOIN deg d2 ON d2.u = e.u2
    ),
    wedge AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
    ),
    tri AS (
      SELECT x, y, z FROM wedge
      JOIN (SELECT least(a, b) AS y2, greatest(a, b) AS z2 FROM o) c
        ON c.y2 = wedge.y AND c.z2 = wedge.z
    ),
    corner AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM corner GROUP BY node
"""


@query("triangle_count", oracle=_SQL_TRIANGLES)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the hour-scoped user co-occurrence
    graph (two users linked iff they emitted the same prop-key within the
    same hour) — the community-density / clustering-coefficient numerator,
    third member of the graph family after components and PageRank.

    Graph construction is posting-list discipline end-to-end: the
    co-occurrence self-join runs per (key, hour) posting list with a df
    cap (same hot-key rule as decontamination — an unbounded hot key would
    emit df² pairs), and triangle counting uses degree-ordered orientation
    so wedge generation is O(m^1.5) worst-case instead of hub-quadratic
    (see operators/graph.triangle_counts). Counts are partition-invariant
    integers with a unique oriented edge set (degree ties break by node
    id), so a structurally combinatorial query still carries an exact
    value oracle."""
    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .distinct()
    )
    kdf = uk.groupBy("k", "h").agg(F.count(F.lit(1)).alias("df"))
    ukc = uk.join(kdf.filter(F.col("df") <= _TRI_DF_CAP), ["k", "h"]).select(
        "u", "k", "h"
    )
    edges = (
        ukc.select("k", "h", F.col("u").alias("u1"))
        .join(ukc.select("k", "h", F.col("u").alias("u2")), ["k", "h"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    return triangle_counts(edges)


_SQL_LCC = f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k,
             date_trunc('hour', ts) AS h
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND ts IS NOT NULL
    ),
    kdf AS (
      SELECT k, h, CAST(COUNT(*) AS BIGINT) AS df FROM uk GROUP BY k, h
    ),
    ukc AS (
      SELECT u, uk.k, uk.h FROM uk JOIN kdf USING (k, h)
      WHERE df <= {_TRI_DF_CAP}
    ),
    e AS (
      SELECT DISTINCT a.u AS u1, b.u AS u2
      FROM ukc a JOIN ukc b USING (k, h) WHERE a.u < b.u
    ),
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u1 AS u FROM e UNION ALL SELECT u2 AS u FROM e)
      GROUP BY u
    ),
    o AS (
      SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u1 < e.u2)
                  THEN e.u1 ELSE e.u2 END AS a,
             CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u1 < e.u2)
                  THEN e.u2 ELSE e.u1 END AS b
      FROM e JOIN deg d1 ON d1.u = e.u1 JOIN deg d2 ON d2.u = e.u2
    ),
    wedge AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
    ),
    tri AS (
      SELECT x, y, z FROM wedge
      JOIN (SELECT least(a, b) AS y2, greatest(a, b) AS z2 FROM o) c
        ON c.y2 = wedge.y AND c.z2 = wedge.z
    ),
    corner AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    nt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM corner GROUP BY node)
    SELECT deg.u AS node, COALESCE(nt.n_tri, 0) AS n_tri, deg.d AS degree,
           CASE WHEN deg.d >= 2
                THEN (2 * COALESCE(nt.n_tri, 0) * 65536) // (deg.d * (deg.d - 1))
                ELSE 0 END AS lcc_fp
    FROM deg LEFT JOIN nt ON nt.node = deg.u
"""


@query("clustering_coefficient", oracle=_SQL_LCC)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — 2·triangles / (deg·(deg−1))
    in 1/65536 fixed point over the same df-capped co-occurrence graph as
    triangle_count, completing the community-structure metric (Watts &
    Strogatz '98). Degree-2+ nodes with zero triangles and isolated-edge
    nodes both report honestly (0), via a left join from the degree table.
    All-integer floor division on non-negative bigints, so Spark's `div`
    and DuckDB's `//` agree bit-for-bit — one more combinatorial metric
    with an exact value oracle. Plan adds exactly one broadcast-size left
    join over triangle_count's plan (the degree table is |V|, tiny
    relative to edges at any scale)."""
    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .distinct()
    )
    kdf = uk.groupBy("k", "h").agg(F.count(F.lit(1)).alias("df"))
    ukc = uk.join(kdf.filter(F.col("df") <= _TRI_DF_CAP), ["k", "h"]).select(
        "u", "k", "h"
    )
    edges = (
        ukc.select("k", "h", F.col("u").alias("u1"))
        .join(ukc.select("k", "h", F.col("u").alias("u2")), ["k", "h"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    deg = (
        edges.select(F.col("u1").alias("u"))
        .unionAll(edges.select(F.col("u2").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    nt = triangle_counts(edges)
    joined = deg.join(nt, deg.u == nt.node, "left").select(
        F.col("u").alias("node"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
        F.col("degree").cast("bigint").alias("degree"),
    )
    return joined.withColumn(
        "lcc_fp",
        F.when(
            F.col("degree") >= 2,
            F.expr("(2 * n_tri * 65536) div (degree * (degree - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


# --- DSIR importance resampling weights -------------------------------------

# Target slice: the deterministic 20% split (doc_id % 10 < 2) stands in for
# the curated corpus (any predicate or joined flag slots into the same
# plan); SF-independent so the oracle holds at every test scale.
_DSIR_TGT = "doc_id % 10 < 2"

_SQL_DSIR = f"""
    WITH d AS (
      SELECT doc_id, ({_DSIR_TGT}) AS y,
             list_filter({_TOKS}, t -> t <> '') AS ftk
      FROM documents
    ),
    g AS (
      SELECT doc_id, y,
             unnest(list_concat(ftk,
               list_transform(range(1, greatest(len(ftk) - 1, 0) + 1),
                              i -> ftk[i] || ' ' || ftk[i + 1]))) AS gram
      FROM d
    ),
    b AS (
      SELECT doc_id, y,
             CAST(('0x' || substr(md5('g:{_SEED}:' || gram), 1, 15))::UBIGINT
                  % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM g
    ),
    c AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt,
             CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_raw
      FROM b GROUP BY bucket
    ),
    f AS (
      SELECT CAST(range AS BIGINT) AS bucket,
             COALESCE(n_tgt, 0::BIGINT) AS n_tgt,
             COALESCE(n_raw, 0::BIGINT) AS n_raw
      FROM range({_N_BUCKETS}) r LEFT JOIN c ON c.bucket = CAST(range AS BIGINT)
    ),
    t AS (
      SELECT CAST(SUM(n_tgt) AS BIGINT) AS tt, CAST(SUM(n_raw) AS BIGINT) AS rt
      FROM f
    ),
    w AS (
      SELECT bucket,
             CAST(({_LG('n_tgt + 1')} - {_LG(f'tt + {_N_BUCKETS}')})
                - ({_LG('n_raw + 1')} - {_LG(f'rt + {_N_BUCKETS}')}) AS BIGINT)
               AS logr_fp
      FROM f, t
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(logr_fp) AS BIGINT) AS logw_fp,
           CAST(SUM(logr_fp) AS BIGINT) >= 0 AS target_like
    FROM b JOIN w USING (bucket)
    WHERE NOT y
    GROUP BY doc_id
"""


@query("dsir_weights", oracle=_SQL_DSIR)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. NeurIPS'23,
    arXiv:2302.03169 — the data-selection recipe behind domain-tilted
    pretraining mixes): every raw document scored by the log-likelihood
    ratio of its hashed unigram+bigram profile under the target vs raw
    distributions (Laplace-smoothed 4096-bucket hashed n-gram models,
    estimated in the SAME single pass that scores — operators/classify.
    dsir_importance). All-integer fixed-point log2 arithmetic makes a
    statistical data-selection policy carry a bit-exact DuckDB oracle.
    Scale: one corpus scan, one ≤4096-group count shuffle, broadcast
    ratio-table join, one groupBy(doc) — hashed_linear_classify's exact
    execution shape."""
    from ..operators.classify import dsir_importance

    (docs,) = _t(spark, sf_dir, "documents")
    return dsir_importance(
        docs.withColumn("__tgt", F.expr(_DSIR_TGT)),
        "__tgt",
        n_buckets=_N_BUCKETS,
        seed=_SEED,
    )


# --- per-source corpus divergence (smoothed KL vs rest) ---------------------

_SQL_DIVERGENCE = f"""
    WITH tk AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    cst AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tk WHERE tok <> '' GROUP BY 1, 2
    ),
    ct AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY 1),
    ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS n_tot, CAST(COUNT(*) AS BIGINT) AS v
      FROM ct
    ),
    pairs AS (SELECT ns.source, ns.n_s, ct.tok, ct.c_t FROM ct CROSS JOIN ns),
    f AS (
      SELECT p.source, p.n_s, p.c_t, COALESCE(c.c_st, 0::BIGINT) AS c_st
      FROM pairs p LEFT JOIN cst c ON c.source = p.source AND c.tok = p.tok
    ),
    contrib AS (
      SELECT source, n_s, v,
             CAST((c_st + 1) * ({_LG('c_st + 1')} - {_LG('n_s + v')}
                - {_LG('c_t - c_st + 1')} + {_LG('n_tot - n_s + v')})
               AS BIGINT) AS contrib_fp
      FROM f, tot
    )
    SELECT source, n_s AS n_tokens, CAST(SUM(contrib_fp) AS BIGINT) AS kl_fp,
           CAST(CAST(SUM(contrib_fp) AS BIGINT) AS DOUBLE)
             / CAST((n_s + v) * 65536 AS DOUBLE) AS kl_bits
    FROM contrib GROUP BY source, n_s, v
"""


@query("corpus_divergence", oracle=_SQL_DIVERGENCE)
def q_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: add-1-smoothed KL divergence (bits)
    of each source's token distribution against the REST of the corpus,
    over the shared global vocabulary — the mixture-monitoring number a
    pretraining pipeline watches to catch a source whose content shifted
    (crawl drift, a scraper bug, an injected spam burst).

        KL(s ‖ rest) = Σ_vocab p_i · (log2 p_i − log2 q_i),
        p_i = (c_si + 1)/(N_s + V),  q_i = (c_ti − c_si + 1)/(N − N_s + V)

    Exactness: contributions are (c_si + 1) · [four fixed-point log2
    terms] — all-bigint (log2_fp_sql), so the per-source sum is exact and
    order-independent; kl_bits is ONE double division of two exactly
    determined bigints. The ±0.086-bit/term interpolation error means
    near-identical distributions can score slightly negative — this ranks
    drift, it is not a calibrated entropy estimate. Overflow: |contrib| <
    (c_si+1)·4·63·65536 ≈ 1.65e7·(c_si+1), so the bigint sum is safe to
    ~5.6e11 tokens per source; beyond that drop the fp scale or move to
    hashed buckets (dsir_weights' model) — ANSI mode fails loudly either
    way.

    Scale shape (100 TB): the corpus is scanned ONCE and reduced to
    vocab-granularity aggregates (one (source, token) count shuffle);
    everything after runs on V·S rows — the S-row per-source totals and
    the 1-row (N, V) aggregate are broadcast, the dense frame joins the
    sparse counts on (source, token). No corpus-sized window, no second
    scan."""
    from ..operators.classify import corpus_kl_divergence

    (docs,) = _t(spark, sf_dir, "documents")
    return corpus_kl_divergence(docs)


# --- k-core decomposition ---------------------------------------------------

_KCORE_K, _KCORE_ITER = 3, 3


def _kcore_sql(k: int = _KCORE_K, n_iter: int = _KCORE_ITER) -> str:
    """Unrolled peeling replay over the same co-occurrence edge CTEs as
    the triangle oracle — round t's degree table feeds round t's survivor
    set feeds round t's restricted edge set (the pagerank-oracle
    bounded-unroll contract)."""
    parts = [
        f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k,
             date_trunc('hour', ts) AS h
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND ts IS NOT NULL
    ),
    kdf AS (
      SELECT k, h, CAST(COUNT(*) AS BIGINT) AS df FROM uk GROUP BY k, h
    ),
    ukc AS (
      SELECT u, uk.k, uk.h FROM uk JOIN kdf USING (k, h)
      WHERE df <= {_TRI_DF_CAP}
    ),
    e0 AS (
      SELECT DISTINCT a.u AS u1, b.u AS u2
      FROM ukc a JOIN ukc b USING (k, h) WHERE a.u < b.u
    )"""
    ]
    for t in range(n_iter):
        parts.append(f"""
    d{t + 1} AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u1 AS node FROM e{t} UNION ALL SELECT u2 FROM e{t})
      GROUP BY node
    )""")
        if t < n_iter - 1:
            parts.append(f"""
    s{t + 1} AS (SELECT node FROM d{t + 1} WHERE degree >= {k}),
    e{t + 1} AS (
      SELECT u1, u2 FROM e{t}
      WHERE u1 IN (SELECT node FROM s{t + 1})
        AND u2 IN (SELECT node FROM s{t + 1})
    )""")
    return (
        ",".join(parts)
        + f"""
    SELECT node, degree FROM d{n_iter} WHERE degree >= {k}
    """
    )


@query("kcore_nodes", oracle=_kcore_sql())
def q_kcore_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core density filter (operators/graph.kcore_peel) over the
    hour-scoped user co-occurrence graph: 3 fixed peeling rounds at k=3
    keep the community kernel and shed weakly-connected tail nodes —
    the standard pre-filter before per-node analytics. Each round is one
    degree shuffle + two semi-joins over a freshly materialized edge
    table; all-integer and partition-invariant, so the iterative peel
    carries an exact unrolled-CTE oracle like pagerank_centrality."""
    from ..operators.graph import kcore_peel

    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .distinct()
    )
    kdf = uk.groupBy("k", "h").agg(F.count(F.lit(1)).alias("df"))
    ukc = uk.join(kdf.filter(F.col("df") <= _TRI_DF_CAP), ["k", "h"]).select(
        "u", "k", "h"
    )
    edges = (
        ukc.select("k", "h", F.col("u").alias("u1"))
        .join(ukc.select("k", "h", F.col("u").alias("u2")), ["k", "h"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    return kcore_peel(edges, k=_KCORE_K, n_iter=_KCORE_ITER)


# --- label-propagation communities ------------------------------------------

_LPA_ITER = 3


def _lpa_sql(n_iter: int = _LPA_ITER) -> str:
    """Unrolled synchronous-LPA replay over the same co-occurrence edge
    CTEs as the triangle/k-core oracles: round t counts previous-round
    neighbor labels per node and keeps the (count DESC, label ASC)
    winner — the bounded-unroll contract shared with pagerank/kcore."""
    parts = [
        f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k,
             date_trunc('hour', ts) AS h
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND ts IS NOT NULL
    ),
    kdf AS (
      SELECT k, h, CAST(COUNT(*) AS BIGINT) AS df FROM uk GROUP BY k, h
    ),
    ukc AS (
      SELECT u, uk.k, uk.h FROM uk JOIN kdf USING (k, h)
      WHERE df <= {_TRI_DF_CAP}
    ),
    e0 AS (
      SELECT DISTINCT a.u AS u1, b.u AS u2
      FROM ukc a JOIN ukc b USING (k, h) WHERE a.u < b.u
    ),
    adj AS (
      SELECT u1 AS a, u2 AS b FROM e0 UNION ALL SELECT u2, u1 FROM e0
    ),
    l0 AS (
      SELECT node, node AS label
      FROM (SELECT u1 AS node FROM e0 UNION SELECT u2 FROM e0)
    )"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(f"""
    c{t} AS (
      SELECT adj.a AS node, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM adj JOIN l{t - 1} l ON l.node = adj.b
      GROUP BY 1, 2
    ),
    l{t} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (
                 PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
        FROM c{t}
      ) WHERE rn = 1
    )""")
    return (
        ",".join(parts)
        + f"""
    SELECT node, label FROM l{n_iter}
    """
    )


@query("lpa_communities", oracle=_lpa_sql())
def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation
    (operators/graph.label_propagation) over the hour-scoped user
    co-occurrence graph: 3 fixed rounds of adopt-the-most-frequent-
    neighbor-label (ties to the smallest label) yield community labels —
    the lightweight community detector that needs no edge weights or
    modularity optimization. Per round: one co-hashed equi-join of the
    label table onto the materialized adjacency plus two integer
    aggregations; deterministic and partition-invariant, so the
    iterative plan carries an exact unrolled-CTE oracle like
    pagerank_centrality and kcore_nodes."""
    from ..operators.graph import label_propagation

    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .distinct()
    )
    kdf = uk.groupBy("k", "h").agg(F.count(F.lit(1)).alias("df"))
    ukc = uk.join(kdf.filter(F.col("df") <= _TRI_DF_CAP), ["k", "h"]).select(
        "u", "k", "h"
    )
    edges = (
        ukc.select("k", "h", F.col("u").alias("u1"))
        .join(ukc.select("k", "h", F.col("u").alias("u2")), ["k", "h"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    return label_propagation(edges, n_iter=_LPA_ITER)


# --- HITS hubs & authorities -------------------------------------------------

_HITS_ITER, _HITS_SCALE = 2, 65_536


def _hits_sql(n_iter: int = _HITS_ITER, scale: int = _HITS_SCALE) -> str:
    """Unrolled integer-HITS replay: each half-step is one join-sum plus a
    max-normalizing floor division (DuckDB `//` == Spark `div` on the
    non-negative bigints used here) — the pagerank/kcore/lpa
    bounded-unroll contract."""
    parts = [
        f"""
    WITH ue AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS i
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    h0 AS (
      SELECT u, CAST({scale} AS BIGINT) AS s
      FROM (SELECT DISTINCT u FROM ue)
    )"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(f"""
    a{t}r AS (
      SELECT i, CAST(SUM(h.s) AS BIGINT) AS s
      FROM ue JOIN h{t - 1} h USING (u) GROUP BY i
    ),
    a{t} AS (
      SELECT i, s * CAST({scale} AS BIGINT) // mx AS s
      FROM a{t}r, (SELECT MAX(s) AS mx FROM a{t}r)
    ),
    h{t}r AS (
      SELECT u, CAST(SUM(a.s) AS BIGINT) AS s
      FROM ue JOIN a{t} a USING (i) GROUP BY u
    ),
    h{t} AS (
      SELECT u, s * CAST({scale} AS BIGINT) // mx AS s
      FROM h{t}r, (SELECT MAX(s) AS mx FROM h{t}r)
    )""")
    return (
        ",".join(parts)
        + f"""
    SELECT 'authority' AS side, CAST(i AS VARCHAR) AS node, s AS score FROM a{n_iter}
    UNION ALL
    SELECT 'hub' AS side, CAST(u AS VARCHAR) AS node, s AS score FROM h{n_iter}
    """
    )


@query("hits_scores", oracle=_hits_sql())
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities (operators/graph.hits_scaled) over the
    DIRECTED bipartite user→prop-key graph: authorities are the keys the
    best-connected users touch, hubs the users who touch authoritative
    keys — the mutually-recursive centrality PageRank can't express.
    Two max-normalized integer power iterations; every half-step is one
    co-hashed join-sum plus a 1-row max broadcast, all bigint, so the
    directed link-analysis pair (PageRank + HITS) both carry exact
    unrolled-CTE oracles."""
    from ..operators.graph import hits_scaled

    (events,) = _t(spark, sf_dir, "events")
    ue = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("i"),
        )
        .distinct()
    )
    return hits_scaled(ue, n_iter=_HITS_ITER, scale=_HITS_SCALE)


# --- market-basket lift (association-rule mining) ---------------------------

_BL_CAP, _BL_MINSUP, _BL_SCALE, _BL_K = 60, 5, 1000, 20

_SQL_BASKET_LIFT = f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    bsize AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS bs FROM uk GROUP BY u
    ),
    ukc AS (
      SELECT uk.u, uk.k FROM uk JOIN bsize USING (u) WHERE bs <= {_BL_CAP}
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users FROM ukc),
    nk AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k FROM ukc GROUP BY k
    ),
    pairs AS (
      SELECT a.k AS x, b.k AS y, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM ukc a JOIN ukc b ON a.u = b.u AND a.k < b.k
      GROUP BY a.k, b.k
      HAVING COUNT(*) >= {_BL_MINSUP}
    ),
    scored AS (
      SELECT x, y, n_xy,
             n_xy * n_users * {_BL_SCALE} // (nx.n_k * ny.n_k)
               AS lift_scaled
      FROM pairs
      JOIN nk nx ON nx.k = pairs.x
      JOIN nk ny ON ny.k = pairs.y, nu
    )
    SELECT x, y, n_xy, lift_scaled,
           CAST(ROW_NUMBER() OVER (
             ORDER BY lift_scaled DESC, x ASC, y ASC) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= {_BL_K}
"""


@query("basket_lift", oracle=_SQL_BASKET_LIFT)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining: top-20 prop-key pairs by LIFT over
    per-user key baskets — "users who touch X disproportionately touch
    Y", the market-basket co-visitation signal behind every
    related-items/recommendation heuristic. lift(x,y) =
    P(x,y)/(P(x)P(y)) computed as (n_xy·n_users·1000) div (n_x·n_y) in
    exact bigint — one floor division, so both engines rank identically
    (ties by pair id). int64 bound: n_xy·n_users·1000 < 2^63 holds to
    ~10⁸ capped users at scale 1000; drop the scale (or pre-aggregate
    per-segment) beyond that, same documented-knob policy as
    pagerank_scaled.

    Plan (100 TB): baskets are capped at 60 keys BEFORE the pair
    self-join (the per-user posting-list join is bounded at C(cap,2)
    pairs/user — the same hot-entity rule as the df-capped co-occurrence
    graph and decontamination); per-key supports aggregate to catalog
    granularity and broadcast back onto the aggregated pair table;
    n_users is a 1-row broadcast; top-20 via sort+limit, never a global
    sort. Corpus rows shuffle exactly twice (basket-size semi-filter,
    pair count)."""
    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
        )
        .distinct()
    )
    bsize = uk.groupBy("u").agg(F.count(F.lit(1)).alias("bs"))
    ukc = uk.join(bsize.filter(F.col("bs") <= _BL_CAP).select("u"), "u")
    nu = ukc.agg(F.countDistinct("u").cast("bigint").alias("n_users"))
    nk = ukc.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
    pairs = (
        ukc.select("u", F.col("k").alias("x"))
        .join(ukc.select("u", F.col("k").alias("y")), "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .filter(F.col("n_xy") >= _BL_MINSUP)
    )
    scored = (
        pairs.join(
            F.broadcast(nk.select(F.col("k").alias("x"), F.col("n_k").alias("nx"))),
            "x",
        )
        .join(
            F.broadcast(nk.select(F.col("k").alias("y"), F.col("n_k").alias("ny"))),
            "y",
        )
        .join(F.broadcast(nu))
        .withColumn(
            "lift_scaled",
            F.expr(f"(n_xy * n_users * {_BL_SCALE}) div (nx * ny)"),
        )
    )
    top = scored.orderBy(
        F.col("lift_scaled").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(_BL_K)
    rw = Window.orderBy(
        F.col("lift_scaled").desc(), F.col("x").asc(), F.col("y").asc()
    )
    return top.withColumn("rnk", F.row_number().over(rw).cast("bigint")).select(
        "x", "y", "n_xy", "lift_scaled", "rnk"
    )


# --- multi-source BFS reachability ------------------------------------------

_BFS_ROUNDS = 3


def _bfs_sql(n_rounds: int = _BFS_ROUNDS) -> str:
    """Unrolled frontier-BFS replay over the same co-occurrence edge CTEs
    as the triangle/k-core/LPA oracles: round t joins the dist-t frontier
    through the symmetric adjacency and min-folds the candidates — the
    bounded-unroll contract shared by every iterative graph oracle."""
    parts = [
        f"""
    WITH uk AS (
      SELECT DISTINCT user_id AS u,
             json_extract_string(props, '$.k') AS k,
             date_trunc('hour', ts) AS h
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND ts IS NOT NULL
    ),
    kdf AS (
      SELECT k, h, CAST(COUNT(*) AS BIGINT) AS df FROM uk GROUP BY k, h
    ),
    ukc AS (
      SELECT u, uk.k, uk.h FROM uk JOIN kdf USING (k, h)
      WHERE df <= {_TRI_DF_CAP}
    ),
    e0 AS (
      SELECT DISTINCT a.u AS u1, b.u AS u2
      FROM ukc a JOIN ukc b USING (k, h) WHERE a.u < b.u
    ),
    gnodes AS (SELECT u1 AS node FROM e0 UNION SELECT u2 FROM e0),
    d0 AS (
      SELECT DISTINCT user_id AS node, CAST(0 AS BIGINT) AS dist
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND user_id IN (SELECT node FROM gnodes)
    )"""
    ]
    for t in range(n_rounds):
        parts.append(f"""
    f{t} AS (SELECT node FROM d{t} WHERE dist = {t}),
    c{t} AS (
      SELECT u2 AS node FROM e0 JOIN f{t} ON u1 = f{t}.node
      UNION ALL
      SELECT u1 AS node FROM e0 JOIN f{t} ON u2 = f{t}.node
    ),
    d{t + 1} AS (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{t}
        UNION ALL
        SELECT node, CAST({t + 1} AS BIGINT) AS dist FROM c{t}
      ) GROUP BY node
    )""")
    return ",".join(parts) + f"""
    SELECT node, dist FROM d{n_rounds}
    """


@query("bfs_reach", oracle=_bfs_sql())
def q_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence radius via multi-source BFS (operators/graph.bfs_hops):
    exact minimum hop distance from the CONVERTER set (users with a
    purchase event) to every user within 3 hops on the hour-scoped
    co-occurrence graph — the behavioral-distance feature ("how close is
    this user to a converter?") a growth/targeting pipeline joins back
    onto the user table. Frontier expansion: round t joins only the
    newly-settled dist-t nodes through the materialized symmetric
    adjacency, then one min fold — equal to full relaxation, join input
    shrinks geometrically. All-integer and partition-invariant, so the
    bounded-depth BFS carries an exact unrolled-CTE oracle like
    pagerank/kcore/lpa."""
    from ..operators.graph import bfs_hops

    (events,) = _t(spark, sf_dir, "events")
    uk = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .distinct()
    )
    kdf = uk.groupBy("k", "h").agg(F.count(F.lit(1)).alias("df"))
    ukc = uk.join(kdf.filter(F.col("df") <= _TRI_DF_CAP), ["k", "h"]).select(
        "u", "k", "h"
    )
    edges = (
        ukc.select("k", "h", F.col("u").alias("u1"))
        .join(ukc.select("k", "h", F.col("u").alias("u2")), ["k", "h"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    seeds = (
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .select(F.col("user_id").alias("node"))
        .distinct()
    )
    return bfs_hops(edges, seeds, n_rounds=_BFS_ROUNDS)


# --- character-entropy gibberish gate ----------------------------------------

_ENT_SCALE = 65536
_ENT_LOW = 3 * _ENT_SCALE  # H < 3.0 bits => 'low' (normal prose runs ~4.1)
_LG_DUCK_N = log2_fp_sql("tot", dialect="duck")
_LG_DUCK_C = log2_fp_sql("n_c", dialect="duck")

_SQL_CHAR_ENTROPY = f"""
    WITH d AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
      WHERE text IS NOT NULL AND length({_NORM}) > 0
    ),
    ch AS (
      SELECT doc_id, substr(norm, CAST(i AS INTEGER), 1) AS c
      FROM d, unnest(range(1, length(norm) + 1)) AS t(i)
    ),
    cnt AS (
      SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n_c
      FROM ch GROUP BY doc_id, c
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(n_c) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_alphabet
      FROM cnt GROUP BY doc_id
    ),
    ent AS (
      SELECT cnt.doc_id, tot.tot AS n_chars_used, tot.n_alphabet,
             CAST(SUM(n_c * ({_LG_DUCK_N} - {_LG_DUCK_C})) AS BIGINT)
               // tot.tot AS entropy_fp
      FROM cnt JOIN tot USING (doc_id)
      GROUP BY cnt.doc_id, tot.tot, tot.n_alphabet
    )
    SELECT doc_id, n_chars_used, n_alphabet, entropy_fp,
           CASE WHEN entropy_fp < {_ENT_LOW} THEN 'low' ELSE 'ok' END AS label
    FROM ent
"""


@query("char_entropy_filter", oracle=_SQL_CHAR_ENTROPY)
def q_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document in fixed point — the
    gibberish/boilerplate gate (low-entropy docs are repeated-char spam,
    padding, or template residue; ordinary prose sits near 4.1 bits/char)
    that complements the token-level quality_score family with a
    sub-token signal. H = Σ (n_c/N)·log2(N/n_c) is irrational, but
    multiplying through by N gives N·H = Σ n_c·(log2(N) − log2(n_c)),
    which log2_fp_sql (the classifier-training primitive) evaluates in
    exact integer arithmetic — entropy_fp = that sum div N at scale
    2^16, bit-identical on both engines, all operands non-negative so
    the div/// portability rule holds. Overflow: the sum is ≤ N·lg_fp(N)
    < 2^63 to N ~ 2e12 chars/doc — unreachable.

    Plan (100 TB): chars explode via sequence+substring (JVM codegen,
    zero Python) and immediately collapse to (doc, char) granularity in
    a map-side-combinable count — the shuffle carries at most
    |alphabet| rows per document, not characters. The per-doc total
    joins back co-partitioned on doc_id (same key as the count's
    exchange), and the entropy sum reuses that partitioning: one
    char-granularity map stage, two doc-keyed bucket-granularity
    shuffles, nothing else. Implementation: operators/classify.char_entropy
    (shared with the scale study)."""
    from ..operators.classify import char_entropy

    (docs,) = _t(spark, sf_dir, "documents")
    return char_entropy(docs, low_fp=_ENT_LOW)


# --- classifier calibration vs the independent rule gate ----------------------

_CAL_CUTS = [i / 10 for i in range(1, 10)]

_SQL_GOPHER_PASS = f"""
      SELECT doc_id,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
             CAST(length(regexp_replace({_NORM}, ' ', '', 'g')) AS DOUBLE)
               AS n_nonspace,
             CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]')))
               AS DOUBLE) AS n_alpha,
             CAST({_sql_count_in(EN_STOPWORDS)} AS DOUBLE) AS n_stop,
             CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_distinct
      FROM documents
"""

_SQL_CALIBRATION = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('t:{_SEED}:' || tok), 1, 15))::UBIGINT
                  % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM tok WHERE tok <> ''
    ),
    w AS (
      SELECT CAST(range AS BIGINT) AS bucket,
             CAST(('0x' || substr(md5('w:{_SEED}:' || range::VARCHAR), 1, 15))
                  ::UBIGINT % {2 * _W_MAX + 1} AS BIGINT) - {_W_MAX} AS weight
      FROM range({_N_BUCKETS})
    ),
    s AS (
      SELECT doc_id, CAST(SUM(weight) AS BIGINT) AS margin
      FROM b JOIN w USING (bucket) GROUP BY doc_id
    ),
    c AS ({_SQL_GOPHER_PASS}),
    g AS (
      SELECT doc_id,
             (n_tok >= 10 AND n_tok <= 100000)
               AND (n_nonspace / greatest(n_tok, 1.0) >= 3.0
                    AND n_nonspace / greatest(n_tok, 1.0) <= 10.0)
               AND (n_alpha / greatest(n_tok, 1.0) >= 0.8)
               AND (n_stop >= 2)
               AND (n_distinct / greatest(n_tok, 1.0) >= 0.3) AS passes
      FROM c
    ),
    cut AS (
      SELECT {', '.join(f"quantile_cont(margin, {q}) AS c{i}"
                        for i, q in enumerate(_CAL_CUTS, start=1))}
      FROM s
    ),
    d AS (
      SELECT s.doc_id, s.margin, g.passes,
             CAST(1 + {' + '.join(f"(CASE WHEN s.margin > cut.c{i} THEN 1 ELSE 0 END)"
                                  for i in range(1, 10))} AS BIGINT) AS decile
      FROM s JOIN g USING (doc_id) CROSS JOIN cut
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(margin) AS BIGINT) AS margin_lo,
           CAST(MAX(margin) AS BIGINT) AS margin_hi,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) * 10000
             // CAST(COUNT(*) AS BIGINT) AS pass_bp
    FROM d GROUP BY decile
"""


@query("classifier_calibration", oracle=_SQL_CALIBRATION)
def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration table — the EVAL step of the quality-gate
    loop: margin deciles of the hashed linear classifier crossed with the
    INDEPENDENT Gopher rule gate (pass rate per decile in basis points).
    A well-calibrated quality classifier shows pass_bp rising with the
    margin decile; a flat table means the model learned nothing the rules
    can see. With the md5 stand-in weights the table IS flat — that's the
    honest null baseline; swap in train_hashed_weights output and the
    same query audits the real model (the trained twin is
    quality_classifier_trained).

    Deciles come from exact VALUE cutpoints (percentile at 0.1..0.9 — one
    1-row aggregate broadcast, the scalar sanction) rather than a global
    NTILE window, so no single-partition sort exists at any scale; bucket
    = 1 + Σ (margin > c_k) is integer-vs-double comparison under the
    verified percentile == quantile_cont interpolation contract, so
    assignment is bit-identical on both engines.

    Plan (100 TB): classifier margins (broadcast weight join + one
    groupBy(doc)), gopher booleans (single scan, codegen), one doc-keyed
    join, one 1-row cutpoint broadcast, one 10-group aggregate."""
    import functools

    (docs,) = _t(spark, sf_dir, "documents")
    scored = hashed_linear_classify(docs).select("doc_id", "margin")
    rules = gopher_rules(F.col("text"))
    passes = functools.reduce(lambda a, b: a & b, rules.values())
    gq = docs.select("doc_id", passes.alias("passes"))
    cuts = scored.agg(
        *[
            F.expr(f"percentile(margin, {q})").alias(f"c{i}")
            for i, q in enumerate(_CAL_CUTS, start=1)
        ]
    )
    decile = functools.reduce(
        lambda a, b: a + b,
        [
            F.when(F.col("margin") > F.col(f"c{i}"), 1).otherwise(0)
            for i in range(1, 10)
        ],
    )
    d = (
        scored.join(gq, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .select("margin", "passes", (F.lit(1) + decile).cast("bigint").alias("decile"))
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("margin").cast("bigint").alias("margin_lo"),
        F.max("margin").cast("bigint").alias("margin_hi"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.expr(
            "cast(sum(case when passes then 1 else 0 end) as bigint) * 10000"
            " div count(1)"
        ).alias("pass_bp"),
    )


# --- personalized (seed-anchored) PageRank ----------------------------------

_PPR_SEEDS = ["u:1", "u:2", "u:3"]


def _ppr_sql(n_iter: int = _PR_ITER) -> str:
    """Unrolled personalized-PageRank iterations — pagerank_centrality's
    CTE oracle with the teleport restricted to the seed set (rank_0 and
    the per-iteration base term are nonzero only at seeds)."""
    seeds = ", ".join(f"'{s}'" for s in _PPR_SEEDS)
    ctes = [f"""
    WITH ev AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
             'k:' || json_extract_string(props, '$.k') AS v
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    e AS (
      SELECT u, v FROM ev UNION SELECT v AS u, u AS v FROM ev
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY u),
    nodes AS (
      SELECT DISTINCT node, CASE WHEN node IN ({seeds}) THEN 1 ELSE 0 END
               AS is_seed
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
    ),
    r0 AS (
      SELECT node, CAST(is_seed * {_PR_SCALE} AS BIGINT) AS rank FROM nodes
    )"""]
    base = _PR_SCALE - _PR_DAMP
    for it in range(n_iter):
        ctes.append(f"""
    c{it + 1} AS (
      SELECT e.v, SUM(r.rank // deg.outdeg) AS in_sum
      FROM e JOIN r{it} r ON r.node = e.u JOIN deg ON deg.u = e.u
      GROUP BY e.v
    ),
    r{it + 1} AS (
      SELECT node,
             CAST(is_seed * {base}
                  + ({_PR_DAMP} * COALESCE(in_sum, 0)) // {_PR_SCALE}
                  AS BIGINT) AS rank
      FROM nodes LEFT JOIN c{it + 1} ON c{it + 1}.v = node
    )""")
    return ",".join(ctes) + f"\n    SELECT node, rank FROM r{n_iter}"


@query("personalized_pagerank", oracle=_ppr_sql())
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at three user nodes over the same
    symmetrized user↔prop-key bipartite graph as pagerank_centrality —
    rank as PROXIMITY TO THE SEEDS rather than global centrality: the
    similar-items / who-to-follow recommender primitive (rank the 'k:'
    nodes for users u:1-u:3 and you have their joint behavioral
    neighborhood). Teleport mass returns only to seeds; everything else
    is the base operator's exact-bigint floor-division discipline, so the
    PPR carries the same unrolled-CTE value oracle. Sparsity win: rank_0
    is nonzero only at the seeds, so iteration 1's contribution join
    carries |S| rows, not N (operators/graph.personalized_pagerank
    filters the zero-rank frontier explicitly)."""
    from ..operators.graph import personalized_pagerank

    (events,) = _t(spark, sf_dir, "events")
    ev = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("k:"), F.get_json_object("props", "$.k")).alias("v"),
        )
        .distinct()
    )
    edges = ev.unionByName(
        ev.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return personalized_pagerank(
        edges,
        _PPR_SEEDS,
        n_iter=_PR_ITER,
        src="u",
        dst="v",
        scale=_PR_SCALE,
        damping_ppm=_PR_DAMP,
    )


# --- weighted single-source shortest paths -----------------------------------

_SSSP_ROUNDS = 4
_SSSP_SEED = "u:1"

_SSSP_EDGE_CTE = """
    WITH ev AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
             'k:' || json_extract_string(props, '$.k') AS v
      FROM events
      WHERE user_id IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    ew AS (
      SELECT u, v,
             CAST(('0x' || substr(md5('sw:' || u || '|' || v), 1, 15))
               ::UBIGINT % 9 + 1 AS BIGINT) AS w
      FROM ev
    ),
    e AS (
      SELECT u AS a, v AS b, w FROM ew
      UNION ALL SELECT v AS a, u AS b, w FROM ew
    )"""


def _sssp_sql(n_rounds: int = _SSSP_ROUNDS) -> str:
    """Unrolled FULL Bellman-Ford relaxations — the operator's frontier
    propagation must agree bit-for-bit (an unchanged node's contribution
    was already folded the round after it last changed)."""
    ctes = [
        _SSSP_EDGE_CTE,
        f"""
    d0 AS (SELECT '{_SSSP_SEED}' AS node, CAST(0 AS BIGINT) AS dist)""",
    ]
    for t in range(n_rounds):
        ctes.append(f"""
    c{t + 1} AS (
      SELECT e.b AS node, MIN(d.dist + e.w) AS dist
      FROM e JOIN d{t} d ON d.node = e.a GROUP BY e.b
    ),
    d{t + 1} AS (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{t}
        UNION ALL SELECT node, dist FROM c{t + 1}
      ) GROUP BY node
    )""")
    return ",".join(ctes) + f"\n    SELECT node, dist FROM d{n_rounds}"


@query("sssp_weighted", oracle=_sssp_sql())
def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (bounded Bellman-Ford, 4
    rounds) over the symmetrized user↔prop-key bipartite graph with
    deterministic md5-derived integer edge weights in [1, 9] — the ninth
    iterative graph operator, completing hop-based BFS with true weighted
    distances (latency-weighted reachability, cost-to-influence). The
    operator relaxes only the CHANGED frontier per round
    (operators/graph.sssp_weighted); the oracle replays FULL relaxation —
    their bit-equality is itself the frontier-optimization proof. Exact
    bigint min-merges throughout, one adjacency equi-join + one
    map-side-combinable min per round."""
    from ..operators.graph import sssp_weighted

    (events,) = _t(spark, sf_dir, "events")
    ev = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("k:"), F.get_json_object("props", "$.k")).alias("v"),
        )
        .distinct()
    )
    ew = ev.select(
        "u",
        "v",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sw:"), F.col("u"), F.lit("|"), F.col("v"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 9
            + 1
        ).alias("w"),
    )
    edges = ew.unionByName(
        ew.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    seeds = spark.createDataFrame([(_SSSP_SEED,)], "node string")
    return sssp_weighted(
        edges, seeds, n_rounds=_SSSP_ROUNDS, src="u", dst="v", weight_col="w"
    )
