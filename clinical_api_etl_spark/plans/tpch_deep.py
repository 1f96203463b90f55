"""Deep TPC-H J4 coverage: the remaining classic query shapes. [EXT]

Rounds out the relational surface with the TPC-H shapes q1–q7/q10/q14/
q18/q19 (in ``plans/relational.py``) don't cover: two-level ratio
aggregation (q8), LIKE-filtered profit roll-up (q9), HAVING against a
global scalar (q11), conditional two-way counters over a date-arithmetic
band (q12), left-join count distribution (q13), scalar-max view join
(q15), NOT-IN + COUNT(DISTINCT) (q16), correlated per-group average
(q17), double-correlated EXISTS / NOT EXISTS (q21), and anti-join +
scalar-average gate (q22).

The driver's schema is TPC-H-ish, not TPC-H: no ``partsupp``, ship modes,
commit/receipt dates, phones, or comments. Queries whose canonical
predicates need those columns are re-targeted at available ones (noted
per query) — the point is the operator shape, not the spec literal.

Scale posture: true dims (region/nation/supplier/part/customer) broadcast
explicitly; ``lineitem ⋈ orders`` and lineitem self-joins are left to the
planner so AQE picks BHJ at bench scale and sort-merge on co-partitioned
keys at cluster scale — an explicit broadcast there would be a lie at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clinical_api_etl_spark.functions.numeric import money
from clinical_api_etl_spark.plans.base import MON, QuerySet
from clinical_api_etl_spark.plans.relational import _DISC_PRICE, _ts
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

_ZERO_MONEY = "CAST(0 AS DECIMAL(18,4))"


def _disc_price() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return (money("l_extendedprice") * (one - money("l_discount"))).cast(
        "decimal(18,4)"
    )


@QS.add(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN dp
                         ELSE {_ZERO_MONEY} END) AS DOUBLE)
             / CAST(SUM(dp) AS DOUBLE) AS mkt_share,
           CAST(SUM(dp) AS DOUBLE) AS total_volume
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             {_DISC_PRICE} AS dp, n1.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ) GROUP BY o_year
    """,
    doc="J4 (TPC-H q8 shape): nation's market share inside a region's "
    "PROMO market by year — eight-way join feeding a conditional-over-"
    "total ratio aggregate. Part/supplier/nation/region/customer all "
    "broadcast; lineitem⋈orders is the single fact shuffle.",
    headline=True,
    tags=("join", "J4", "agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = cust.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).join(F.broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        # part/supplier/customer scale with SF — only the 25-row nations
        # keep hints (inside cust_in_region); AQE decides the rest
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            dp.alias("dp"),
            F.col("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("dp")).otherwise(zero))
            .cast("double")
            / F.sum("dp").cast("double")
        ).alias("mkt_share"),
        F.sum("dp").cast("double").alias("total_volume"),
    )


@QS.add(
    "tpch_q9_profit_proxy",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST({MON('l_extendedprice')} * (1 - {MON('l_discount')})
                  - {MON('l_extendedprice')} * {MON('l_tax')}
                  AS DECIMAL(18,4)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
    doc="J4 (TPC-H q9 shape): profit by supplier nation and year over "
    "LIKE-filtered parts. The schema has no partsupp/ps_supplycost, so "
    "profit is proxied as disc price minus tax amount — same join tree "
    "and roll-up, decimal-exact.",
    tags=("join", "J4", "agg"),
)
def tpch_q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    amount = (
        money("l_extendedprice") * (one - money("l_discount"))
        - money("l_extendedprice") * money("l_tax")
    ).cast("decimal(18,4)")
    return (
        # part/supplier scale with SF — unhinted; nation (25 rows) hinted
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@QS.add(
    "tpch_q11_important_parts",
    f"""
    SELECT l_partkey AS partkey, CAST(SUM({MON('l_extendedprice')}) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING CAST(SUM({MON('l_extendedprice')}) AS DOUBLE) > 0.001 * (
      SELECT CAST(SUM({MON('l_extendedprice')}) AS DOUBLE)
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    """,
    doc="A-family (TPC-H q11 shape): per-part value restricted to one "
    "nation's suppliers, kept only when above a fraction of the global "
    "total — HAVING against a scalar subquery. No partsupp in the schema, "
    "so value is lineitem revenue. The global total is a second pass over "
    "the same broadcast-filtered join, reduced to one row and broadcast "
    "into the filter.",
    tags=("agg", "A10", "subquery"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    # supplier scales with SF — the composite is unhinted (nation inside
    # stays a 25-row hint); AQE decides
    filtered = li.join(
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(money("l_extendedprice")).cast("double").alias("value")
    )
    total = filtered.agg(
        F.sum(money("l_extendedprice")).cast("double").alias("_total")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.001) * F.col("_total"))
        .select("partkey", "value")
    )


@QS.add(
    "tpch_q12_late_priority",
    """
    SELECT late,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             l_shipdate >= o_orderdate + INTERVAL 60 DAY AS late
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ) GROUP BY late
    """,
    doc="A3-analogue (TPC-H q12 shape): conditional two-way counters over "
    "a date-arithmetic band. The schema has no ship modes or commit/"
    "receipt dates, so the band is ship-lag ≥ 60 days vs the order date. "
    "Single fact-fact shuffle, then a 2-group hash aggregate.",
    tags=("join", "agg", "A3"),
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
            high.alias("_high"),
        )
        .groupBy("late")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@QS.add(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    doc="J-family (TPC-H q13 shape): distribution of per-customer order "
    "counts — left outer join with an extra join-side predicate, count "
    "that treats no-match as 0, then a second aggregation over the "
    "counts. The first group-by reuses the join's c_custkey partitioning "
    "(no extra shuffle); only the tiny c_count roll-up re-shuffles.",
    headline=True,
    tags=("join", "J4", "agg"),
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


@QS.add(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="J4+subquery (TPC-H q15 shape): quarterly revenue per supplier "
    "(a view in the spec), equi-joined to the supplier dim and filtered "
    "to the scalar MAX of the same view — ties all surface. The revenue "
    "aggregate is computed once per branch; MAX over exact-decimal-"
    "derived doubles is order-independent.",
    tags=("join", "agg", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@QS.add(
    "tpch_q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 23, 45, 50)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="A2/J1 (TPC-H q16 shape): distinct-supplier counts per part "
    "attribute triple, excluding a supplier denylist via NOT IN. The "
    "schema has no partsupp, so lineitem serves as the part↔supplier "
    "relation, and no s_comment, so the denylist is low-balance "
    "suppliers. NOT IN = broadcast anti-join (s_suppkey is never null).",
    tags=("join", "J1", "agg"),
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 50)
    )
    denylist = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 100.0
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        # part and the LIKE-filtered supplier denylist scale with SF —
        # unhinted (AQE decides)
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            denylist,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@QS.add(
    "tpch_q17_small_qty_revenue",
    f"""
    SELECT CAST(SUM({MON('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    doc="Subquery (TPC-H q17 shape): revenue from small-quantity orders "
    "of one brand's SMALL parts, gated per part by a correlated 20%-of-"
    "average threshold. Spark decorrelates explicitly: per-part averages "
    "via one groupBy over the semi-filtered fact, broadcast back. "
    "l_quantity is integer-valued, so AVG is exact in both engines.",
    tags=("agg", "subquery"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = load(spark, sf_dir, "lineitem")
    # The correlated subquery averages over ALL lineitems of the matched
    # part — brand/type are functionally determined by partkey, so
    # semi-joining the fact to the filtered part dim first is equivalent
    # and prunes before the aggregate.
    # the brand/container-filtered part slice and its per-part thresholds
    # scale with SF — unhinted (AQE decides)
    matched = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    thresholds = matched.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_cap")
    )
    return (
        matched.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@QS.add(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="J3/J1 (TPC-H q21 shape): suppliers who were the last to ship in "
    "a multi-supplier finalized order they shipped late — a correlated "
    "EXISTS (another supplier on the order) plus NOT EXISTS (any later "
    "shipper). Spark: left-semi and left-anti self-joins of lineitem, "
    "both shuffling on the same l_orderkey so the exchange is reused; "
    "no commit/receipt dates in the schema, so 'late' is ship-lag > 30 "
    "days and the last-ship comparison uses l_shipdate.",
    headline=True,
    tags=("join", "J1", "J3", "topk"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("ship3") > F.col("l_shipdate")),
            "left_anti",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .join(
            # supplier scales with SF — composite unhinted (nation inside
            # stays a 25-row hint)
            supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@QS.add(
    "tpch_q22_dormant_customers",
    f"""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM({MON('c_acctbal')}) AS DOUBLE) AS totacctbal
    FROM (
      SELECT RIGHT(c_name, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE RIGHT(c_name, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        AND c_acctbal > (
          SELECT CAST(SUM({MON('c_acctbal')}) AS DOUBLE)
                 / CAST(COUNT(c_acctbal) AS DOUBLE)
          FROM customer
          WHERE c_acctbal > 0.0
            AND RIGHT(c_name, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        )
    ) GROUP BY cntrycode
    """,
    doc="J1+subquery (TPC-H q22 shape): above-average-balance customers "
    "dormant since 2000, grouped by country code. The schema has no "
    "c_phone (code = customer-name suffix) and every customer has SOME "
    "order, so the anti-join target is recent orders — same shape, "
    "non-empty result. Pieces: scalar decimal-exact average (broadcast), "
    "anti-join against the date-filtered orders scan, tiny final roll-up.",
    tags=("join", "J1", "agg", "subquery"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ("13", "31", "23", "29", "30", "18", "17")
    cust = (
        load(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.expr("right(c_name, 2)"))
        .filter(F.col("cntrycode").isin(*codes))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(money("c_acctbal")).cast("double")
            / F.count("c_acctbal").cast("double")
        ).alias("_avg_bal")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@QS.add(
    "tpch_q2_min_cost_supplier",
    """
    WITH eligible AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost,
             ANY_VALUE(1) AS _dummy
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
      SELECT l_partkey, l_suppkey, unit_cost, s_name, s_acctbal, n_name
      FROM eligible
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name,
           p_partkey AS partkey, p_name, unit_cost
    FROM regional r
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'LARGE' AND p_size <= 25
      AND unit_cost = (SELECT MIN(unit_cost) FROM regional r2
                       WHERE r2.l_partkey = r.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, partkey
    LIMIT 100
    """,
    doc="J4 (TPC-H q2 shape): for each qualifying part, the EUROPE "
    "supplier(s) offering the minimum unit cost — a correlated scalar-MIN "
    "subquery. No partsupp, so a supplier's offer price for a part is "
    "MIN(l_extendedprice / l_quantity) over its lineitems (double IEEE "
    "division — bit-identical across engines, and MIN is order-free). "
    "Decorrelated Spark-side as MIN OVER (PARTITION BY part) on the "
    "already-reduced (part, supplier) table: one fact shuffle for the "
    "pair aggregate, one narrow shuffle for the window, no self-join and "
    "no broadcast-the-aggregate assumption. Dims broadcast; top-100 via "
    "TakeOrderedAndProject on a total order (acctbal DESC, nation, "
    "supplier, part) so the LIMIT boundary is deterministic.",
    tags=("join", "J4", "subquery", "window"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    supp_region = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pair_cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # supplier scales with SF — unhinted (AQE decides)
    regional = pair_cost.join(
        supp_region, F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").alias("partkey"),
            "p_name",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "partkey"
        )
        .limit(100)
    )


@QS.add(
    "tpch_q20_dominant_suppliers",
    """
    SELECT s_suppkey AS suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
                 SUM(SUM(CAST(l_quantity AS DECIMAL(18,2))))
                   OVER (PARTITION BY l_partkey) AS total
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%bolt%')
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_partkey, l_suppkey
        ) WHERE qty * 5 > total
      )
    """,
    doc="J1/J4 (TPC-H q20 shape): suppliers in one nation who are "
    "'dominant' for some name-filtered part — shipped more than 20% of "
    "that part's total quantity in a two-year window. The canonical "
    "availqty-vs-half-of-shipped threshold needs partsupp; the re-target "
    "keeps the exact operator nest: IN over an aggregate-threshold "
    "subquery that itself has an IN over a LIKE-filtered part set. "
    "Spark side: broadcast semi-join the part filter into the fact scan, "
    "one shuffle for the (part, supplier) quantity aggregate, per-part "
    "totals as SUM OVER (PARTITION BY part) on the reduced table (no "
    "broadcast-the-aggregate), `qty * 5 > total` in exact decimals "
    "(never 0.2 * total — fp multiply differs across engines), then a "
    "left-semi join back to the nation-filtered supplier dim.",
    tags=("join", "J1", "J4", "subquery", "window"),
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    bolt_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    grp = (
        # the name-filtered part slice scales with SF — unhinted
        li.join(bolt_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        grp.withColumn("total", F.sum("qty").over(w))
        .filter(F.col("qty") * F.lit(5) > F.col("total"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "n_name")
    )
