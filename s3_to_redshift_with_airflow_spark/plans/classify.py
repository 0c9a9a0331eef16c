"""Registry entries for the hashed linear classifier
(operators/classify.py) and integer PageRank (operators/graph.py) —
both deterministic-by-construction so they carry EXACT DuckDB value
oracles, like the kmeans_int8 family in plans/clustering.py.

Reference parity: the reference engine has neither — this is
BASELINE.json training-pipeline extension surface (quality gating and
graph centrality over behavioral/near-dup graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classify import hashed_linear_classify
from ..operators.graph import pagerank_scaled
from .extensions import _TOKS
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
    (docs,) = _t(spark, sf_dir, "documents")
    return hashed_linear_classify(docs, n_buckets=_N_BUCKETS, seed=_SEED)


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
