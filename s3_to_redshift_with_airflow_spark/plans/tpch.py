"""TPC-H-derived deep-join registry entries (beyond-reference OLAP surface).

The testdata star schema is a trimmed TPC-H (no partsupp, no
commit/receipt dates, synthetic NATION_i names), so the queries here are the
published TPC-H shapes re-targeted at the columns that exist; where a spec
column is missing the docstring states the substitution. The point of each
entry is the PLAN SHAPE — every one is a pattern a 100 TB warehouse workload
hits daily:

  q7   two-role dimension join (same dim joined twice under different keys)
  q8   market-share: conditional aggregate ratio over a multi-dim slice
  q9   profit rollup: computed measure over part-filtered fact, 2-level dims
  q10  returned-item top-k: fact-side filter, agg-then-dim-join, top 20
  q14  promo share: single-row conditional ratio, month-sliced scan
  q16  distinct-supplier census with NOT-IN exclusion (anti-join pushdown)
  q21  only-late-supplier: double-correlated EXISTS/NOT EXISTS, decorrelated
       into one co-partitioned profile join
  q2   min-cost supplier per part: group-min + equality-join-back (the
       decorrelated form of TPC-H's correlated scalar subquery)
  q12  shipping-priority census: conditional counts over a late-line slice
  q11  value concentration: HAVING vs a global scalar (1-row broadcast)
  q20  excess-share supplier: two-level aggregate ratio + semi-join

Determinism discipline (registry contract): every float output is a single
double operation over exact DECIMAL(27,6) partial sums, so values are
bit-identical across partitionings and engines; every LIMIT carries a
unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import _t, query
from .scale_ops import _dec


def _nation_slice(nation: DataFrame, *names: str) -> DataFrame:
    return nation.filter(F.col("n_name").isin(*names))


@query(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between two trading nations by
    supplier-nation × customer-nation × year. The same `nation` dim plays two
    roles (supplier leg, customer leg) — the classic two-role dimension join.

    Scale plan: both nation filters collapse each leg to 2/25 of its dim
    BEFORE touching the fact — the supplier slice broadcasts (supplier is the
    smallest non-nation dim, SF×10k rows), the customer slice joins through
    orders on the orders⨝lineitem orderkey shuffle. The date range pushes
    into the lineitem scan. Only the final 2×2×years-cell aggregate shuffles
    on the tiny group key."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = ("NATION_1", "NATION_2")
    n1 = _nation_slice(nation, *pair).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _nation_slice(nation, *pair).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    fact = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    volume = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return fact.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(volume).cast("double").alias("revenue"))


@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume
                         ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_6's share of AMERICA-region
    ECONOMY-part revenue per year. Conditional-aggregate ratio — numerator
    and denominator in ONE pass over the joined slice, no second scan.

    Scale plan: part slice (1/6 of part) and supplier⨝nation (dim) broadcast;
    region→nation collapses the customer leg to 1/5 of customers before the
    fact join; the order-date range pushes into the orders scan. mkt_share is
    one double division of two exact decimal sums — bit-deterministic."""
    part, lineitem, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    econ = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    amer_keys = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("amer_key"))
    )
    cust = customer.join(
        F.broadcast(amer_keys), F.col("c_nationkey") == F.col("amer_key")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    volume = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(27,6)")
    fact = (
        lineitem.join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return fact.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_6", volume).otherwise(zero)).cast("double")
            / F.sum(volume).cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.4 * p_retailprice * l_quantity AS DECIMAL(27,6)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%small%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on '%small%' parts by supplier
    nation × order year. The schema has no partsupp/ps_supplycost, so cost is
    the deterministic proxy 0.4 × p_retailprice × l_quantity (stated
    substitution; the plan shape — substring part filter, fact ⨝ 2 dims ⨝
    orders, computed measure — is the spec's).

    Scale plan: the LIKE filter runs in the part scan and the surviving slice
    broadcasts with p_retailprice carried for the measure; supplier⨝nation
    broadcasts; orders joins on the orderkey shuffle. Amount is computed
    per-row into DECIMAL before the sum — exact partials."""
    part, lineitem, supplier, orders, nation = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    pslice = part.filter(F.col("p_name").like("%small%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    amount = _dec(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    )
    fact = (
        lineitem.join(F.broadcast(pslice), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return fact.groupBy(
        "nation", F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(amount).cast("double").alias("sum_profit"))


@query(
    "tpch_q10",
    oracle="""
    WITH agg AS (
      SELECT o_custkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                  AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment
    FROM agg JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue lost
    to returns in 1996Q4 (c_mktsegment stands in for the schema-absent
    c_phone/c_address/c_comment).

    Scale plan: aggregate FIRST (fact collapses to ≤|customer| rows on the
    orderkey shuffle), join the customer dim AFTER — the agg-then-join
    ordering that keeps the wide dim out of the fact shuffle. Both filters
    push into their scans; top-20 runs as TakeOrderedAndProject (never a
    global sort)."""
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    agg = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    return (
        agg.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                         ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE) * 100
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                    AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of September-1996 revenue from
    PROMO parts. Single-row conditional ratio — numerator and denominator in
    one aggregate over one month-sliced scan.

    Scale plan: the month predicate prunes the lineitem scan; the part dim
    broadcasts carrying only (p_partkey, p_type); the global aggregate is a
    2-value partial per partition then one 1-row reduce. promo_revenue =
    (double × 100) / double over exact decimal sums — bit-deterministic."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(27,6)")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                * F.lit(100)
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship census): distinct suppliers per
    (brand, type, size) cell, excluding flagged suppliers. The lineitem
    part↔supplier pairs stand in for the schema-absent partsupp; negative
    account balance stands in for the spec's complaint-comment filter.

    Scale plan: the three part predicates prune the broadcast part slice; the
    NOT IN compiles to a broadcast left-anti join (never a shuffle); distinct
    suppliers per cell is one partial-distinct shuffle on the 3-column group
    key."""
    part, lineitem, supplier = _t(spark, sf_dir, "part", "lineitem", "supplier")
    pslice = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pslice), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lo l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND l1.late
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): NATION_3 suppliers who
    were the ONLY late shipper on a multi-supplier order. "Late" is
    l_shipdate > o_orderdate + 60 days (the schema has no
    commit/receipt dates; stated substitution).

    The spec's double-correlated EXISTS / NOT EXISTS decorrelates into ONE
    per-order profile — distinct suppliers and distinct LATE suppliers
    aggregated in a single pass — joined back to the late lines on the same
    orderkey shuffle partitioning (co-partitioned, no extra exchange). An
    order qualifies iff n_supp ≥ 2 ∧ n_late = 1, and l1 late then implies l1
    IS the unique late supplier. The oracle keeps the correlated-subquery
    form, so the comparison also proves the decorrelation equivalent."""
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    lo = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    lo = lo.select("l_orderkey", "l_suppkey", late.alias("late"))
    profile = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    nation3 = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    l1 = (
        lo.filter(F.col("late"))
        .join(F.broadcast(nation3), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumnRenamed("l_orderkey", "lo_orderkey")
    )
    qualified = l1.join(
        profile.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
        F.col("lo_orderkey") == F.col("l_orderkey"),
    )
    return (
        qualified.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@query(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    m AS (
      SELECT ps.partkey, ps.supplycost, eu.s_name, eu.s_acctbal, eu.n_name
      FROM ps JOIN eu ON ps.suppkey = eu.s_suppkey
    ),
    best AS (SELECT partkey, MIN(supplycost) AS best_cost FROM m GROUP BY 1)
    SELECT m.s_acctbal, m.s_name, m.n_name,
           m.partkey AS p_partkey, m.supplycost
    FROM m
    JOIN best ON m.partkey = best.partkey AND m.supplycost = best.best_cost
    JOIN part ON m.partkey = p_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 5
    ORDER BY m.s_acctbal DESC, m.n_name, m.s_name, p_partkey LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each small STANDARD part, the
    EUROPE supplier(s) offering the minimum unit cost. partsupp doesn't
    exist, so the observed (part, supplier) unit cost is MIN(l_extendedprice
    / l_quantity) over lineitem — same correlated-minimum shape.

    The spec's correlated scalar subquery (cost = MIN over the part's
    suppliers) decorrelates into group-min + equality-join-back: both sides
    compute the same double min over the same set, so the equality is exact.
    Scale plan: part/region/nation slices broadcast; the (part, supplier)
    aggregate is one shuffle on the composite key; no window over the full
    fact (a per-part window would shuffle everything on partkey alone —
    skew-prone); top-100 is TakeOrderedAndProject."""
    lineitem, supplier, nation, region, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    ps = lineitem.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    eu = (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    m = ps.join(F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey")).select(
        "partkey", "supplycost", "s_name", "s_acctbal", "n_name"
    )
    best = m.groupBy("partkey").agg(F.min("supplycost").alias("best_cost"))
    best = best.withColumnRenamed("partkey", "b_partkey")
    pslice = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    return (
        m.join(
            best,
            (F.col("partkey") == F.col("b_partkey"))
            & (F.col("supplycost") == F.col("best_cost")),
        )
        .join(F.broadcast(pslice), F.col("partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("partkey").alias("p_partkey"), "supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@query(
    "tpch_q11",
    oracle="""
    WITH g AS (
      SELECT l_partkey,
             CAST(l_extendedprice * l_quantity AS DECIMAL(27,6)) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey AS ps_partkey, CAST(SUM(val) AS DOUBLE) AS value
    FROM g GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE) >
           (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM g)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose NATION_7 supply value exceeds
    0.1% of that nation's total (l_extendedprice × l_quantity over lineitem
    stands in for ps_supplycost × ps_availqty over the absent partsupp).

    The HAVING-vs-global-scalar decorrelates into a 1-row broadcast
    nested-loop join (the sanctioned q22 pattern) — NOT a window over a
    single partition, which would serialize the whole aggregate. The
    per-part and global sums reuse one shared slice; both are exact decimal
    sums so the threshold comparison is bit-deterministic."""
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    supp7 = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    g = lineitem.join(
        F.broadcast(supp7), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_partkey",
        _dec(F.col("l_extendedprice") * F.col("l_quantity")).alias("val"),
    )
    per_part = g.groupBy("l_partkey").agg(F.sum("val").cast("double").alias("value"))
    threshold = g.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("ps_partkey"), "value")
    )


@query(
    "tpch_q20",
    oracle="""
    WITH q AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(27,6))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    t AS (SELECT l_partkey, SUM(sq) AS total_q FROM q GROUP BY 1),
    excess AS (
      SELECT DISTINCT q.l_suppkey
      FROM q
      JOIN t ON q.l_partkey = t.l_partkey
      JOIN part ON q.l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND CAST(q.sq AS DOUBLE) > 0.5 * CAST(t.total_q AS DOUBLE)
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN excess ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): NATION_5 suppliers who shipped
    more than half of some 'small%' part's total 1996 volume (the spec's
    availqty > ½·yearly-demand test re-expressed over lineitem, partsupp
    being absent).

    Scale plan: the year predicate prunes the scan; the two-level aggregate
    — (part, supplier) then part — reuses the first shuffle's output; the
    share test joins the two aggregates on partkey (co-partitioned). The
    qualifying-supplier set collapses through DISTINCT before touching the
    supplier dim (semi-join shape). Both sums are exact decimals; the share
    comparison is one double multiply per side."""
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    q = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sq"))
    )
    t = q.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("sq").alias("total_q")
    )
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    excess = (
        q.join(t, F.col("l_partkey") == F.col("t_partkey"))
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("sq").cast("double") > F.lit(0.5) * F.col("total_q").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(excess, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): per line status, how
    many late-shipped 1996 lines carried high- vs low-priority orders. The
    schema has no l_shipmode or receipt/commit dates, so l_linestatus stands
    in for the mode grouping and "late" is l_shipdate > o_orderdate + 30 days
    (stated substitutions; the shape — fact⨝fact slice, two conditional
    counts in one pass — is the spec's).

    Scale plan: the year predicate prunes the lineitem scan to 1/7 of the
    fact before the orderkey join; the lateness predicate needs both sides so
    it runs right after the join, before any aggregation state builds; both
    priority counts come out of ONE aggregate over the joined slice (no
    second scan). Integer counts, so the result is exact by construction."""
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume), spec-faithful columns and ordering.
    The plan is star_join_agg's (scale_ops.py) — region/nation/supplier
    broadcast, date filter pushed into the orders scan — minus the lineitem
    count, plus the spec's revenue-descending total order."""
    from .registry import REGISTRY

    out = REGISTRY["star_join_agg"].fn(spark, sf_dir)
    return out.select("n_name", "revenue").orderBy(
        F.col("revenue").desc(), F.col("n_name")
    )
