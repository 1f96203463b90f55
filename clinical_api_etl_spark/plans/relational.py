"""Relational query inventory over the driver's TPC-H-ish star schema.

Covers the SURVEY.md §2 operator families on the testdata tables:
projections/filters (P1-P8), joins (J1-J4), aggregations (A1-A11),
reshaping (R1-R2), windows/sorts/set-ops (§2.6), and scalar functions
(F6-F14). Each query is the *Spark primitive* the reference capability maps
to, exercised on data large enough to be meaningfully distributed.

Scale notes (100 TB posture):
* Dim joins (`region`/`nation`/`customer`/`supplier`/`part`) broadcast —
  the fact-side scan never shuffles for them.
* Fact-fact joins (`orders` ⋈ `lineitem`) shuffle on the join key once;
  AQE handles skew splitting.
* All aggregations are partial+final hash aggregates (Catalyst default);
  conditional counters (A3-A5 analogues) are single-pass `sum(when)` —
  never per-rule rescans like the reference's Python loops
  (reference `etl-service/src/etl.py:163-194`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.numeric import davg, dsum, money
from clinical_api_etl_spark.plans.base import DAVG, DSUM, MON, QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

_TS = "timestamp"  # testdata parquet carries naive timestamps


def _ts(lit: str):
    return F.lit(lit).cast(_TS)


# ---------------------------------------------------------------------------
# Headline aggregate: TPC-H Q1-style pricing summary (A1 grouped roll-up).
# ---------------------------------------------------------------------------

_DISC_PRICE = f"CAST({MON('l_extendedprice')} * (1 - {MON('l_discount')}) AS DECIMAL(18,4))"


@QS.add(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity', 'sum_qty')},
           {DSUM('l_extendedprice', 'sum_base_price')},
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_DISC_PRICE} * (1 + {MON('l_tax')})) AS DOUBLE) AS sum_charge,
           {DAVG('l_quantity', 'avg_qty')},
           {DAVG('l_extendedprice', 'avg_price')},
           {DAVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1/A6: grouped roll-up with cnt/avg/min-max-family aggregates "
    "(reference gold roll-up etl.py:200-227 re-expressed at TPC-H shape).",
    headline=True,
    tags=("agg", "A1"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = (money("l_extendedprice") * (one - money("l_discount"))).cast(
        "decimal(18,4)"
    )
    charge = disc_price * (one + money("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J4: dim-broadcast + fact-fact shuffle joins (TPC-H Q3/Q5/Q6 shapes).
# ---------------------------------------------------------------------------


@QS.add(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="J4+P2: broadcast dim join, fact-fact equi-join, top-K with "
    "deterministic tie-break (TakeOrderedAndProject, no full sort).",
    headline=True,
    tags=("join", "J4", "P2"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1997-06-30 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1997-06-30 00:00:00")
    )
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = (money("l_extendedprice") * (one - money("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        # orders/customer scale with SF — no broadcast hint (AQE decides)
        li.join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@QS.add(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="J4: five-way star join; every dim side broadcasts, the single "
    "shuffle is orders⋈lineitem on orderkey.",
    headline=True,
    tags=("join", "J4"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = (money("l_extendedprice") * (one - money("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        # orders/customer/supplier scale with SF — unhinted (AQE decides)
        li.join(orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


@QS.add(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT CAST(SUM({MON('l_extendedprice')} * {MON('l_discount')}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    doc="P1/P5-style conjunctive predicate pushdown + scalar aggregate; "
    "the whole query is one parquet scan with pushed filters.",
    headline=True,
    tags=("filter", "agg", "P1"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(money("l_extendedprice") * money("l_discount"))
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# J1/J2: anti / semi / full-outer joins (the reference's ON CONFLICT family,
# db.py:41-127, re-expressed as set-based joins).
# ---------------------------------------------------------------------------


@QS.add(
    "j1_customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="J1 anti-join: the reference's `ON CONFLICT DO NOTHING` insert is "
    "semantically new LEFT ANTI JOIN existing (db.py:56,75,98).",
    tags=("join", "J1"),
)
def j1_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@QS.add(
    "j1_parts_with_lineitems_by_brand",
    """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """,
    doc="J1 semi-join (EXISTS) + count by group.",
    tags=("join", "J1"),
)
def j1_parts_with_lineitems_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@QS.add(
    "j2_nation_balance_full_outer",
    f"""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.cust_bal, CAST(0 AS DOUBLE)) AS cust_bal,
           COALESCE(s.supp_bal, CAST(0 AS DOUBLE)) AS supp_bal
    FROM (SELECT c_nationkey AS nk, {DSUM('c_acctbal', 'cust_bal')}
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, {DSUM('s_acctbal', 'supp_bal')}
          FROM supplier GROUP BY s_nationkey) s
    ON c.nk = s.nk
    """,
    doc="J2 upsert-join: `ON CONFLICT DO UPDATE` is a full-outer merge on "
    "the key with per-column coalesce (db.py:83-85,120-126).",
    tags=("join", "J2"),
)
def j2_nation_balance_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(dsum("c_acctbal", "cust_bal"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(dsum("s_acctbal", "supp_bal"))
    )
    return cust.join(supp, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )


# ---------------------------------------------------------------------------
# P1/P2/P4: the reference's query surface (dynamic filters + top-N).
# ---------------------------------------------------------------------------


@QS.add(
    "p1_dynamic_filter_events",
    """
    SELECT event_id, user_id, value, ts
    FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY ts DESC, event_id DESC
    LIMIT 1000
    """,
    doc="P1+P2: the reference's parameterized slice query "
    "(database.service.ts:94-150): optional equality + time-range "
    "predicates, ORDER BY time DESC LIMIT 1000 — with a unique tie-break "
    "key so the limit is deterministic.",
    tags=("filter", "P1", "P2"),
)
def p1_dynamic_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "click")
            & (F.col("ts") >= _ts("2024-01-05 00:00:00"))
            & (F.col("ts") <= _ts("2024-01-20 00:00:00"))
        )
        .select("event_id", "user_id", "value", "ts")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1000)
    )


@QS.add(
    "p2_topn_recent_events",
    """
    SELECT event_id, ts, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    doc="P2 top-N by time: Spark plans TakeOrderedAndProject (true top-K, "
    "no full sort) — the scalable form of ORDER BY ... LIMIT.",
    tags=("P2",),
)
def p2_topn_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@QS.add(
    "p4_membership_filter_brands",
    f"""
    SELECT p_brand, COUNT(*) AS n_parts, {DSUM('p_retailprice', 'total_price')}
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    GROUP BY p_brand
    """,
    doc="P4 membership filter (isin) — reference REQ_UNIT membership "
    "rule shape (etl.py:17,164).",
    tags=("filter", "P4"),
)
def p4_membership_filter_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"), dsum("p_retailprice", "total_price"))
    )


# ---------------------------------------------------------------------------
# P8 + A3-A5: rule-based data-quality counters (bounds join + one-pass
# conditional counts — replaces the reference's per-rule Python rescans).
# ---------------------------------------------------------------------------

_BOUNDS = [
    ("click", 0.0, 100.0),
    ("view", 0.0, 200.0),
    ("purchase", 10.0, 400.0),
    ("signup", 0.0, 50.0),
    ("error", 0.0, 30.0),
]
_BOUNDS_SQL = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _BOUNDS)


@QS.add(
    "p8_out_of_range_by_type",
    f"""
    WITH bounds(event_type, lo, hi) AS (VALUES {_BOUNDS_SQL})
    SELECT e.event_type,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS oor_cnt,
           COUNT(*) AS total_cnt
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type
    """,
    doc="P8/A5: per-type range rule via a broadcast bounds dim + single-pass "
    "sum(when) — one shuffle instead of the reference's per-type rescan loop "
    "(etl.py:181-194).",
    tags=("quality", "P8", "A5"),
)
def p8_out_of_range_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = spark.createDataFrame(_BOUNDS, "event_type string, lo double, hi double")
    oor = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(oor, 1).otherwise(0)).cast("long").alias("oor_cnt"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
    )


@QS.add(
    "a3_conditional_counters",
    """
    SELECT CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN value >= 450 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 0 AND 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_night,
           COUNT(*) AS n_total
    FROM events
    """,
    doc="A3/A4: multiple rule counters in ONE pass over the fact table "
    "(sum(when) fusion) — the Spark-native form of the reference's "
    "quality counting (etl.py:155-195).",
    tags=("quality", "A3"),
)
def a3_conditional_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
        F.sum(F.when(F.col("value") >= 450, 1).otherwise(0))
        .cast("long")
        .alias("n_high_value"),
        F.sum(F.when(F.hour("ts").between(0, 5), 1).otherwise(0))
        .cast("long")
        .alias("n_night"),
        F.count(F.lit(1)).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# A2/A6-A9: distinct projections and the reference's six-views family.
# ---------------------------------------------------------------------------


@QS.add(
    "a2_distinct_projection",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    doc="A2 dimension extraction: SELECT DISTINCT over grouping keys "
    "(reference dim upsert source, db.py:69-86).",
    tags=("agg", "A2"),
)
def a2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@QS.add(
    "a6_avg_by_group",
    f"""
    SELECT event_type, {DAVG('value', 'avg_value')} FROM events GROUP BY event_type
    """,
    doc="A6: v_study_quality shape — AVG by group (08_views.sql:1-4).",
    tags=("agg", "A6", "views"),
)
def a6_avg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").groupBy("event_type").agg(davg("value", "avg_value"))


@QS.add(
    "a7_daily_avg_trend",
    f"""
    SELECT event_type, date_trunc('day', ts) AS day, {DAVG('value', 'avg_value')},
           COUNT(*) AS n_events
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type, date_trunc('day', ts)
    """,
    doc="A7: v_glucose_trend shape — filtered daily average, day bucketing "
    "via to_date (08_views.sql:6-10, etl.py:210).",
    tags=("agg", "A7", "views"),
)
def a7_daily_avg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(davg("value", "avg_value"), F.count(F.lit(1)).alias("n_events"))
    )


@QS.add(
    "a8_counts_by_group",
    """
    SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY lang, source
    """,
    doc="A8: v_counts_by_site shape — COUNT(*) by composite key "
    "(08_views.sql:12-15).",
    tags=("agg", "A8", "views"),
)
def a8_counts_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# A10/A11: multi-grain roll-ups and distinct aggregates. [EXT]
# ---------------------------------------------------------------------------


@QS.add(
    "a10_rollup_lineitem",
    f"""
    SELECT l_returnflag, l_linestatus, {DSUM('l_quantity', 'sum_qty')},
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="[EXT] A10: rollup over the agg grain — the coarser roll-ups the "
    "reference's agg table schema hints at but never implements "
    "(07_measurement_agg.sql:4-5).",
    tags=("agg", "A10"),
)
def a10_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("cnt"))
    )


@QS.add(
    "a10_cube_orders",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           {DSUM('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="[EXT] A10: cube over order dimensions.",
    tags=("agg", "A10"),
)
def a10_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", "total_price"))
    )


@QS.add(
    "a11_count_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="[EXT] A11: exact multi-column distinct aggregates (Spark expands "
    "to partial aggregates per distinct column).",
    tags=("agg", "A11"),
)
def a11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
    )


@QS.add(
    "a11_approx_count_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS within_rsd
    FROM events GROUP BY event_type
    """,
    doc="[EXT] A11: approx_count_distinct — the 100 TB-scale form of "
    "distinct user counting (HLL sketch, no shuffle of raw values). "
    "Hash-gated bounded formulation: the output carries the exact count "
    "plus a per-group boolean asserting the HLL estimate is within 15% "
    "relative error (3x the default 5% rsd); the raw engine-specific "
    "estimate stays under a11_approx_count_distinct_raw. The HLL merge is "
    "register-wise max — order-independent, so the gate is run-stable. "
    "TRIAGE NOTE: the oracle hard-codes within_rsd=TRUE, so a hash "
    "mismatch here means the sketch landed OUTSIDE the padded 15% "
    "tolerance (a bound breach, not an engine bug) — inspect "
    "a11_approx_count_distinct_raw for the violating group/margin.",
    tags=("agg", "A11", "approx", "gate"),
)
def a11_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    both = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    rel_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    ) <= 0.15
    return both.select(
        "event_type", "exact_users", "n_events", rel_ok.alias("within_rsd")
    )


@QS.add(
    "a11_approx_count_distinct_raw",
    None,  # HLL sketch values are implementation-specific — rows-only check.
    doc="[EXT] A11: the raw approx_count_distinct estimates (engine-specific "
    "HLL values; bounded twin a11_approx_count_distinct is hash-gated).",
    tags=("agg", "A11", "approx"),
)
def a11_approx_count_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# §2.6: windows, set ops.  [EXT] beyond the reference's indexes-only hints.
# ---------------------------------------------------------------------------


@QS.add(
    "w1_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
    doc="[EXT] window ranking: latest-observation-per-entity — the query "
    "the reference's (participant, time DESC) indexes are designed for "
    "(02_staging_clinical_trials.sql:31-34).",
    tags=("window",),
)
def w1_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@QS.add(
    "w2_running_quantity_by_supplier",
    f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM({MON('l_quantity')}) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
    doc="[EXT] frame-based window aggregate: running total per partition "
    "with a unique ordering key (decimal-exact, order-independent).",
    tags=("window",),
)
def w2_running_quantity_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(money("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@QS.add(
    "w3_rank_parts_by_price",
    """
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
    FROM part
    """,
    doc="[EXT] rank/dense_rank (deterministic under ties by construction).",
    tags=("window",),
)
def w3_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@QS.add(
    "w4_daily_revenue_lag",
    f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, {DSUM('value', 'daily_value')}
      FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day, daily_value,
           LAG(daily_value) OVER (PARTITION BY event_type ORDER BY day) AS prev_value,
           daily_value - COALESCE(LAG(daily_value) OVER (PARTITION BY event_type ORDER BY day),
                                  CAST(0 AS DOUBLE)) AS delta
    FROM daily
    """,
    doc="[EXT] lag over a pre-aggregated daily series (agg + analytic window "
    "composition).",
    tags=("window",),
)
def w4_daily_revenue_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", "daily_value"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("daily_value").over(w)
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        prev.alias("prev_value"),
        (F.col("daily_value") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


@QS.add(
    "setop_nations_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="[EXT] INTERSECT set op.",
    tags=("setop",),
)
def setop_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@QS.add(
    "setop_nations_except",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="[EXT] EXCEPT set op: nations with no suppliers.",
    tags=("setop",),
)
def setop_nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return nation.subtract(supp)


# ---------------------------------------------------------------------------
# R1/R2 + F14: reshaping and semi-structured extraction.
# ---------------------------------------------------------------------------


@QS.add(
    "r1_explode_part_words",
    """
    SELECT word, COUNT(*) AS cnt,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
    FROM (SELECT p_brand, UNNEST(string_split(p_name, ' ')) AS word FROM part) t
    GROUP BY word
    """,
    doc="R1: 1→N row explosion via split+explode — the Spark-native form of "
    "the reference's blood-pressure row doubling (etl.py:103-135).",
    tags=("reshape", "R1"),
)
def r1_explode_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select("p_brand", F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("p_brand").cast("long").alias("n_brands"),
        )
    )


@QS.add(
    "r2_typed_split_json",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_num,
           CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
                THEN props END AS k_text
    FROM events
    """,
    doc="R2+F14: typed split (num XOR text) via try_cast on a JSON-extracted "
    "field — the reference's value_num/value_text discipline "
    "(etl.py:119,136-149) over semi-structured input.",
    tags=("reshape", "R2", "F14"),
)
def r2_typed_split_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    k_num = k.try_cast("int")
    return ev.select(
        "event_id",
        k_num.alias("k_num"),
        F.when(k_num.isNull(), F.col("props")).alias("k_text"),
    )


@QS.add(
    "f14_json_stats_by_type",
    """
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_cnt
    FROM events GROUP BY event_type
    """,
    doc="F14: JSON field extraction feeding integral aggregates "
    "(events.props exercises get_json_object).",
    tags=("functions", "F14"),
)
def f14_json_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_sum"),
        F.count(k).cast("long").alias("k_cnt"),
    )


# ---------------------------------------------------------------------------
# F9/F11: interval arithmetic, least/greatest.
# ---------------------------------------------------------------------------


@QS.add(
    "f9_recent_window_counts",
    """
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY event_type
    """,
    doc="F9: interval arithmetic anchored at max(ts) (deterministic analogue "
    "of the reference's now()-relative v_recent_30d, 08_views.sql:22-25). "
    "The scalar max broadcasts to every task.",
    tags=("functions", "F9", "P7"),
)
def f9_recent_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@QS.add(
    "f11_least_greatest",
    f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(LEAST(l_discount, l_tax) AS DECIMAL(18,2))) AS DOUBLE) AS sum_min_rate,
           CAST(SUM(CAST(GREATEST(l_discount, l_tax) AS DECIMAL(18,2))) AS DOUBLE) AS sum_max_rate
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="F11: LEAST/GREATEST — the reference's min/max merge functions in "
    "the agg upsert (db.py:124-125).",
    tags=("functions", "F11"),
)
def f11_least_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(money(F.least("l_discount", "l_tax")))
        .cast("double")
        .alias("sum_min_rate"),
        F.sum(money(F.greatest("l_discount", "l_tax")))
        .cast("double")
        .alias("sum_max_rate"),
    )


@QS.add(
    "w5_sessionization",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 21600000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    doc="[EXT] gap-based sessionization (6h gap): lag + running-sum session "
    "ids + per-session roll-up. Same semantics as the streaming "
    "applyInPandasWithState operator (streaming/windows.py) — this batch "
    "form is the oracle-checkable one.",
    headline=True,
    tags=("window", "streaming"),
)
def w5_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.streaming.windows import sessionize_batch

    ev = load(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=360)


# ---------------------------------------------------------------------------
# Streaming-shaped (batch-equivalent) hourly windows; the same transform is
# reused by streaming/windows.py under readStream.
# ---------------------------------------------------------------------------


@QS.add(
    "stream_window_hourly_counts",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS cnt, {DSUM('value', 'total_value')}
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="[EXT] tumbling event-time window (F.window 1 hour) — batch "
    "equivalent of the streaming hourly roll-up; window.start == "
    "date_trunc('hour') for epoch-aligned tumbling windows.",
    headline=True,
    tags=("streaming", "window"),
)
def stream_window_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.streaming.windows import hourly_rollup

    # Same transform runs under readStream with a watermark
    # (streaming/windows.py) — batch/stream unification.
    return hourly_rollup(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Coverage completions: A9/P7 view shapes, UNION set op, J3 semi-join
# integrity, S8 asymmetric merge-upsert.
# ---------------------------------------------------------------------------


@QS.add(
    "a9_participants_per_study",
    """
    SELECT c_nationkey AS study_key, COUNT(*) AS participants
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) p
    GROUP BY c_nationkey
    """,
    doc="A9: v_participants_per_study shape (08_views.sql:27-30, column "
    "named `participants` to match the reference view contract) — count "
    "over the A2-extracted dimension, composing the reference's dim-upsert "
    "chain (db.py:69-86) with its count view.",
    tags=("agg", "A9", "views"),
)
def a9_participants_per_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = (
        load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    )
    return dims.groupBy(F.col("c_nationkey").alias("study_key")).agg(
        F.count(F.lit(1)).alias("participants")
    )


@QS.add(
    "p7_low_quality_filter",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE value IS NOT NULL AND value < 5.0
    """,
    doc="P7: v_low_quality shape (08_views.sql:17-20) — partial predicate "
    "IS NOT NULL AND < bound; pushes to the parquet scan.",
    tags=("filter", "P7", "views"),
)
def p7_low_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value").isNotNull() & (F.col("value") < 5.0)).select(
        "event_id", "user_id", "value"
    )


@QS.add(
    "setop_nations_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="[EXT] UNION (distinct) set op.",
    tags=("setop",),
)
def setop_nations_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@QS.add(
    "j3_semi_join_integrity",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """,
    doc="J3 referential validation as LEFT SEMI join (reference enforces "
    "via FK, 05_processed_measurements.sql:4,15-16; Spark validates with "
    "left_semi before the fact write).",
    tags=("join", "J3"),
)
def j3_semi_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


_S8_STATS = """
  SELECT l_suppkey,
         COUNT(*) AS cnt,
         {davg},
         CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
  FROM lineitem WHERE l_shipdate {op} TIMESTAMP '1995-06-01 00:00:00'
  GROUP BY l_suppkey
"""


@QS.add(
    "s8_asymmetric_merge",
    f"""
    WITH old AS ({_S8_STATS.format(davg=DAVG('l_quantity', 'avg_qty'), op='<')}),
         new AS ({_S8_STATS.format(davg=DAVG('l_quantity', 'avg_qty'), op='>=')})
    SELECT COALESCE(new.l_suppkey, old.l_suppkey) AS suppkey,
           COALESCE(new.cnt, old.cnt) AS cnt,
           COALESCE(new.avg_qty, old.avg_qty) AS avg_qty,
           LEAST(old.min_qty, new.min_qty) AS min_qty,
           GREATEST(old.max_qty, new.max_qty) AS max_qty
    FROM old FULL OUTER JOIN new ON old.l_suppkey = new.l_suppkey
    """,
    doc="S8: the reference's asymmetric agg upsert (db.py:110-127 — cnt/avg "
    "REPLACED by the new job, min/max MERGED via LEAST/GREATEST across "
    "history; quirk SURVEY §2.9.3) as a full-outer merge. Two 'jobs' are "
    "simulated by splitting lineitem on ship date. Delta MERGE expresses "
    "the same thing against a stored table (sources/sinks.py).",
    tags=("join", "S8", "agg"),
)
def s8_asymmetric_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cut = _ts("1995-06-01 00:00:00")

    def stats(side: DataFrame) -> DataFrame:
        return side.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("cnt"),
            davg("l_quantity", "avg_qty"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
        )

    old = stats(li.filter(F.col("l_shipdate") < cut)).alias("old")
    new = stats(li.filter(F.col("l_shipdate") >= cut)).alias("new")
    return old.join(new, F.col("old.l_suppkey") == F.col("new.l_suppkey"), "full_outer").select(
        F.coalesce(F.col("new.l_suppkey"), F.col("old.l_suppkey")).alias("suppkey"),
        F.coalesce(F.col("new.cnt"), F.col("old.cnt")).alias("cnt"),
        F.coalesce(F.col("new.avg_qty"), F.col("old.avg_qty")).alias("avg_qty"),
        F.least(F.col("old.min_qty"), F.col("new.min_qty")).alias("min_qty"),
        F.greatest(F.col("old.max_qty"), F.col("new.max_qty")).alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Temporal joins [EXT]: as-of (point-in-time) and range joins — see
# operators/temporal.py for the scale rationale.
# ---------------------------------------------------------------------------


@QS.add(
    "asof_purchase_attribution",
    """
    WITH c AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts,
           COALESCE(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS ts_matched,
           COALESCE(c.click_id, -1) AS click_id_matched
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="[EXT] as-of join: each purchase attributed to the user's latest "
    "click at-or-before it (backward point-in-time join). Spark build: "
    "union + keyed sort + last_value(ignorenulls) running window — one "
    "shuffle, linear per key; the DuckDB oracle uses its native ASOF JOIN, "
    "so two independent formulations must agree exactly. Right side "
    "deduped per (user, ts) for tie determinism.",
    headline=True,
    tags=("join", "temporal", "window"),
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id"],
    )
    # Null-free projection (no-match → epoch/-1): NaT compares NaN-like in
    # pandas, which would defeat the oracle's exact-equality check.
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.coalesce(F.col("ts_matched"), F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("ts_matched"),
        F.coalesce(F.col("click_id_matched"), F.lit(-1)).alias("click_id_matched"),
    )


@QS.add(
    "range_join_click_burst",
    """
    SELECT p.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_1h
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    doc="[EXT] keyed range join: clicks in the hour before each purchase "
    "(the range predicate rides on the user_id equi-join — hash join, "
    "never a nested loop).",
    tags=("join", "temporal"),
)
def range_join_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import range_join_bucketed

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = range_join_bucketed(
        purchases, clicks, left_ts="ts", right_ts="ts", window_seconds=3600,
        on=["user_id"],
    )
    return (
        purchases.join(
            joined.groupBy("event_id").agg(F.count("event_id_r").alias("n")),
            "event_id",
            "left",
        )
        .select("event_id", F.coalesce(F.col("n"), F.lit(0)).alias("n_clicks_1h"))
    )


@QS.add(
    "range_join_global_burst",
    """
    SELECT l.event_id, CAST(COUNT(r.event_id) AS BIGINT) AS n_preceding_5m
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') l
    LEFT JOIN (SELECT event_id, ts FROM events) r
      ON r.ts >= l.ts - INTERVAL 5 MINUTES AND r.ts < l.ts
    GROUP BY l.event_id
    """,
    doc="[EXT] keyless range join via time bucketing: events in the 5 "
    "minutes before each purchase, across ALL users. A raw inequality "
    "join plans as a nested-loop cross product; bucketing ts to the window "
    "length and equi-joining (bucket, bucket+1) makes it a hash join with "
    "bounded fan-out — the IEJoin-class rewrite for streams.",
    headline=True,
    tags=("join", "temporal"),
)
def range_join_global_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import range_join_bucketed

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    allev = ev.select("event_id", "ts")
    joined = range_join_bucketed(
        purchases, allev, left_ts="ts", right_ts="ts", window_seconds=300
    )
    return (
        purchases.join(
            joined.groupBy("event_id").agg(F.count("event_id_r").alias("n")),
            "event_id",
            "left",
        )
        .select("event_id", F.coalesce(F.col("n"), F.lit(0)).alias("n_preceding_5m"))
    )


@QS.add(
    "skew_count_distinct_spread",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
    doc="[EXT] hot-key-proof exact COUNT(DISTINCT): dedup on the wider "
    "(key, value) pair first — a hot key spreads over its value domain — "
    "then count (operators/skew.py:count_distinct_spread). Same result as "
    "the direct distinct aggregate, different physical behavior under "
    "skew.",
    tags=("agg", "A11", "skew"),
)
def skew_count_distinct_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.skew import count_distinct_spread

    ev = load(spark, sf_dir, "events")
    return count_distinct_spread(ev, ["event_type"], "user_id")


@QS.add(
    "f_percentile_exact",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type
    """,
    doc="[EXT] exact interpolated percentiles (SQL `percentile`): Spark and "
    "DuckDB share the linear-interpolation definition, so values match "
    "bit-exactly. The approximate twin below is the 100 TB path.",
    tags=("agg", "A11", "functions"),
)
def f_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )


@QS.add(
    "f_percentile_approx",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok
    FROM events GROUP BY event_type
    """,
    doc="[EXT] approx_percentile via the Greenwald-Khanna sketch — "
    "mergeable, bounded-memory, the percentile that scales (exact "
    "percentile materializes each group's values). Hash-gated bounded "
    "formulation: per group, the rank of each returned percentile value "
    "must lie within the GK accuracy bound (1e-4 of n, padded to 2% for "
    "merge slack) of its target rank — the sketch's contract, checked "
    "without comparing engine-specific sketch internals (those stay under "
    "f_percentile_approx_raw). Rank counting is merge-order-independent. "
    "TRIAGE NOTE: the oracle hard-codes the rank-ok booleans TRUE, so a "
    "hash mismatch here means the GK sketch breached its padded rank "
    "bound (tolerance breach, not an engine bug) — inspect "
    "f_percentile_approx_raw for the violating group/margin.",
    tags=("agg", "A11", "approx", "gate"),
)
def f_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.95, 10000).alias("p95"),
    )
    joined = ev.select("event_type", "value").join(F.broadcast(approx), "event_type")
    ranks = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") <= F.col("p50"), 1).otherwise(0)).alias("r50"),
        F.sum(F.when(F.col("value") <= F.col("p95"), 1).otherwise(0)).alias("r95"),
    )
    tol = 0.02
    ok50 = (F.col("r50") >= (0.5 - tol) * F.col("n")) & (
        F.col("r50") <= (0.5 + tol) * F.col("n") + 1
    )
    ok95 = (F.col("r95") >= (0.95 - tol) * F.col("n")) & (
        F.col("r95") <= (0.95 + tol) * F.col("n") + 1
    )
    return ranks.select(
        "event_type", "n", ok50.alias("p50_rank_ok"), ok95.alias("p95_rank_ok")
    )


@QS.add(
    "f_percentile_approx_raw",
    None,
    doc="[EXT] the raw approx_percentile estimates (engine-specific GK "
    "sketch values; bounded twin f_percentile_approx is hash-gated).",
    tags=("agg", "A11", "approx"),
)
def f_percentile_approx_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.95, 10000).alias("p95"),
    )


@QS.add(
    "w6_range_frame_moving_avg",
    f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, {DSUM('value', 'daily_value')}
      FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day, daily_value,
           AVG(daily_value) OVER (
             PARTITION BY event_type ORDER BY epoch(day)
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
           ) AS ma_7d
    FROM daily
    """,
    doc="[EXT] RANGE-framed window: 7-day moving average over daily revenue "
    "— rangeBetween on epoch seconds (value-based frame, robust to gap "
    "days, unlike a ROWS frame).",
    tags=("window",),
)
def w6_range_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dsum("value", "daily_value"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp("day"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "event_type", "day", "daily_value", F.avg("daily_value").over(w).alias("ma_7d")
    )


@QS.add(
    "w7_ranking_family",
    """
    SELECT p_brand, p_partkey,
           CAST(DENSE_RANK()  OVER w AS BIGINT) AS drank,
           CAST(NTILE(4)      OVER w AS BIGINT) AS quartile,
           PERCENT_RANK()     OVER w AS prank,
           CUME_DIST()        OVER w AS cdist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    doc="[EXT] the full ranking-function family in one pass over a single "
    "window definition (dense_rank / ntile / percent_rank / cume_dist).",
    tags=("window",),
)
def w7_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@QS.add(
    "a10_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
    doc="A10 [EXT]: explicit GROUPING SETS with grouping_id disambiguation "
    "(the agg table's nullable coarse keys, 07_measurement_agg.sql:4-5, "
    "generalized).",
    tags=("agg", "A10"),
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        """
    )


@QS.add(
    "p_like_filter",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%ring%' AND p_type LIKE 'ECO%'
    """,
    doc="[EXT] LIKE predicates (leading-wildcard contains + prefix match); "
    "the prefix pattern compiles to a StartsWith pushed to the scan.",
    tags=("filter",),
)
def p_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%ring%") & F.col("p_type").like("ECO%")
    ).select("p_partkey", "p_name")


@QS.add(
    "subq_above_avg_balance",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    doc="[EXT] scalar subquery in a predicate — Catalyst plans the subquery "
    "once (Subquery reuse) and broadcasts the scalar. AVG on DOUBLE is "
    "safe here because it only gates a comparison of exact inputs, and "
    "the output columns are raw table values.",
    tags=("filter", "subquery"),
)
def subq_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("__cust_subq")
    return spark.sql(
        """SELECT c_custkey, c_acctbal FROM __cust_subq
           WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM __cust_subq)"""
    )


@QS.add(
    "a12_pivot_event_counts",
    """
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    doc="[EXT] pivot: long→wide counts per user via df.groupBy().pivot() "
    "with explicit values (no extra distinct pass); oracle uses portable "
    "FILTER aggregation — same result, two formulations.",
    tags=("agg", "reshape"),
)
def a12_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .count()
        .select(
            "user_id",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("click", "purchase", "view")],
        )
    )


@QS.add(
    "r5_unpivot_part_measures",
    """
    SELECT p_partkey, 'retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    """,
    doc="[EXT] unpivot/melt: wide→long via DataFrame.unpivot (SQL stack); "
    "oracle is the portable UNION ALL formulation.",
    tags=("reshape",),
)
def r5_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        "p_partkey", ["retailprice", "size"], "measure", "value"
    )


@QS.add(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="J4 [EXT]: TPC-H Q4 shape — correlated EXISTS (late-shipment: any "
    "line shipped >60 days after the order date, referencing the OUTER "
    "o_orderdate inside the subquery); Catalyst decorrelates it into a "
    "left-semi join (SURVEY §4.2), so the predicate costs one semi-join, "
    "not a per-row probe.",
    tags=("join", "J4", "subquery"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("__q4_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM __q4_orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM __q4_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@QS.add(
    "tpch_q18_big_orders",
    f"""
    SELECT o_orderkey, o_orderdate, {DSUM('l_quantity', 'total_qty')}
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    """,
    doc="J4 [EXT]: TPC-H Q18 core — join + group + HAVING on the aggregate "
    "(threshold tuned to this data's quantity distribution).",
    headline=True,
    tags=("join", "J4", "agg"),
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        # orders scales with SF — unhinted equi-join (AQE decides)
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum("l_quantity", "total_qty"),
            F.sum(money("l_quantity")).alias("_exact"),
        )
        .filter(F.col("_exact") > 150)
        .drop("_exact")
    )


# ---------------------------------------------------------------------------
# J4 widening (round 2): the remaining classic TPC-H join/agg shapes the
# schema supports — cross-nation volume (q7), returned-item top-N (q10),
# promo ratio (q14), disjunctive multi-band predicate (q19). Values adapted
# to the testdata's simplified domains (NATION_n names, plain 'PROMO' type).
# ---------------------------------------------------------------------------


@QS.add(
    "tpch_q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(dp) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             {_DISC_PRICE} AS dp
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="J4 (TPC-H q7 shape): six-way join with a symmetric cross-nation "
    "disjunction and per-year roll-up. Both nation sides broadcast twice "
    "under different aliases; the only shuffles are lineitem⋈orders and "
    "the final group-by.",
    tags=("join", "J4", "agg"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast("decimal(3,2)")
    dp = (money("l_extendedprice") * (one - money("l_discount"))).cast("decimal(18,4)")
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        # supplier/orders/customer scale with SF — only the 25-row nations
        # stay hinted
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
                  .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(pair_ok)
        .select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), dp.alias("dp"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("dp").cast("double").alias("revenue"))
    )


@QS.add(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="J4 (TPC-H q10 shape): returned-item revenue per customer over a "
    "half-year window, top-20 with a deterministic custkey tie-break "
    "(TakeOrderedAndProject — never a global sort). The returnflag filter "
    "pushes to the lineitem scan.",
    tags=("join", "J4", "agg", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    one = F.lit(1).cast("decimal(3,2)")
    dp = (money("l_extendedprice") * (one - money("l_discount"))).cast("decimal(18,4)")
    return (
        # orders/customer scale with SF — only the 25-row nation is hinted
        li.join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(dp).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@QS.add(
    "tpch_q14_promo_revenue",
    f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_ratio
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
    doc="J4 (TPC-H q14 shape): conditional revenue ratio over a month "
    "(testdata p_type domain is the plain 'PROMO' literal). Both "
    "conditional sums stay decimal-exact; only the final ratio divides "
    "as DOUBLE, so the fp result is engine-identical.",
    tags=("join", "J4", "agg", "F10"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-02-01 00:00:00"))
    )
    part = load(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    dp = (money("l_extendedprice") * (one - money("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", dp).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    # part scales with SF — unhinted (AQE decides)
    agg = li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(dp).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_ratio"),
    )


@QS.add(
    "tpch_q19_brand_bands",
    f"""
    SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="J4 (TPC-H q19 shape): disjunction of brand/size/quantity bands "
    "across both join sides. Catalyst splits the OR into per-side "
    "implied filters (p_brand IN (...) pushes to the part scan, "
    "l_quantity range to lineitem) before evaluating the residual "
    "condition post-join — the classic pushdown-through-disjunction test.",
    tags=("join", "J4", "filter"),
)
def tpch_q19_brand_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    dp = (money("l_extendedprice") * (one - money("l_discount"))).cast("decimal(18,4)")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        # part scales with SF — unhinted (AQE decides)
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(F.sum(dp).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Hash-checked gates for the approximate aggregates: each asserts the
# ALGORITHM'S guarantee (rank error / relative error / partition sanity)
# rather than sketch-internal values, turning rows-only queries into
# driver-enforced invariants. All three are deterministic: the HLL merge is
# register-wise max (order-independent), the GK rank property holds for any
# merge order, and the k-means checks are structural.
# ---------------------------------------------------------------------------


@QS.add(
    "f_percentile_approx_gate",
    "SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups, TRUE AS p50_ok, TRUE AS p95_ok FROM events",
    doc="[EXT] rank-error gate for f_percentile_approx: for each group, "
    "the rank of the returned p50/p95 value must lie within the "
    "Greenwald-Khanna accuracy bound (1/accuracy = 1e-4 of n, padded to "
    "2% for merge slack) of the target rank — the sketch's contract, "
    "merge-order-independent, checked without comparing sketch internals.",
    tags=("agg", "A11", "approx", "gate"),
)
def f_percentile_approx_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.95, 10000).alias("p95"),
    )
    joined = ev.select("event_type", "value").join(F.broadcast(approx), "event_type")
    ranks = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") <= F.col("p50"), 1).otherwise(0)).alias("r50"),
        F.sum(F.when(F.col("value") <= F.col("p95"), 1).otherwise(0)).alias("r95"),
    )
    tol = 0.02
    ok50 = (F.col("r50") >= (0.5 - tol) * F.col("n")) & (
        F.col("r50") <= (0.5 + tol) * F.col("n") + 1
    )
    ok95 = (F.col("r95") >= (0.95 - tol) * F.col("n")) & (
        F.col("r95") <= (0.95 + tol) * F.col("n") + 1
    )
    return ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min(ok50).alias("p50_ok"),
        F.min(ok95).alias("p95_ok"),
    )


@QS.add(
    "a11_approx_distinct_gate",
    "SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups, TRUE AS within_rsd FROM events",
    doc="[EXT] relative-error gate for a11_approx_count_distinct: per "
    "group, |approx − exact| / exact ≤ 15% (3× the default 5% rsd). The "
    "HLL merge is register-wise max — order-independent, so the gate is "
    "stable across partitionings and runs.",
    tags=("agg", "A11", "approx", "gate"),
)
def a11_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    both = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= 0.15
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min(rel_ok).alias("within_rsd"),
    )


@QS.add(
    "emb_kmeans_gate",
    "SELECT CAST(4 AS BIGINT) AS n_clusters_used, TRUE AS all_assigned, "
    "TRUE AS improves_on_single_cluster",
    doc="[EXT] structural gate for emb_kmeans_clusters: every vector gets "
    "exactly one cluster in [0,k), all k clusters are non-empty on this "
    "corpus, and the clustering's within-cluster squared distance beats "
    "the single-centroid baseline (it must — Lloyd monotonically "
    "decreases WCSS from any init).",
    tags=("similarity", "approx", "gate"),
)
def emb_kmeans_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.vectors import as_double
    from clinical_api_etl_spark.operators.clustering import kmeans_fit

    emb = load(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fit(emb, k=4, iterations=5)
    v = as_double(F.col("embedding"))
    pts = emb.select(F.col("vec_id").alias("id"), v.alias("v")).join(assign, "id")

    def sqdist(cent):
        return F.aggregate(
            F.zip_with(
                F.col("v"),
                F.array(*[F.lit(x) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # WCSS under the fitted model vs the global-mean single cluster.
    dim = len(cents[0])
    gm = emb.select(*[F.avg(F.element_at(v, i + 1)).alias(f"m{i}") for i in range(dim)]).collect()[0]
    gmean = [float(gm[f"m{i}"]) for i in range(dim)]
    wcss_expr = None
    for ci, cent in enumerate(cents):
        d = F.when(F.col("cluster") == ci, sqdist(cent))
        wcss_expr = d if wcss_expr is None else F.coalesce(wcss_expr, d)
    stats = pts.agg(
        F.countDistinct("cluster").cast("long").alias("n_clusters_used"),
        F.min(F.col("cluster").between(0, 3)).alias("in_range"),
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum(wcss_expr).alias("wcss"),
        F.sum(sqdist(gmean)).alias("sst"),
    )
    n_vecs = emb.count()
    return stats.select(
        "n_clusters_used",
        (F.col("in_range") & (F.col("n_assigned") == n_vecs)).alias("all_assigned"),
        (F.col("wcss") < F.col("sst")).alias("improves_on_single_cluster"),
    )


# ---------------------------------------------------------------------------
# A13 [EXT]: heavy hitters — exact roll-up + one-pass frequent-items sketch.
# ---------------------------------------------------------------------------


@QS.add(
    "a13_heavy_hitters_exact",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 0.008 * (SELECT COUNT(*) FROM events)
    """,
    doc="[EXT] exact heavy hitters: users emitting > 0.8% of all events — "
    "grouped count HAVING against a broadcast global scalar. The exact "
    "baseline the frequent-items sketch is gated against.",
    tags=("agg", "A13", "subquery"),
)
def a13_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .join(F.broadcast(total))
        .filter(F.col("n_events") > F.lit(0.008) * F.col("_n"))
        .select("user_id", "n_events")
    )


@QS.add(
    "a13_freq_items_gate",
    """
    SELECT TRUE AS all_heavy_hitters_found,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
              SELECT user_id FROM events GROUP BY user_id
              HAVING COUNT(*) > 0.008 * (SELECT COUNT(*) FROM events)
           ) t) AS n_heavy
    """,
    doc="[EXT] containment gate for the one-pass frequent-items sketch "
    "(Karp-Shenker-Papadimitriou via df.stat.freqItems): every exact "
    "heavy hitter (> 0.8% of events) MUST appear in the sketch output — "
    "the algorithm guarantee; false positives are allowed, misses are "
    "not. The sketch is single-pass with O(1/support) state per "
    "partition — the 100 TB path when an exact per-key count is too "
    "expensive.",
    tags=("agg", "A13", "approx", "gate"),
)
def a13_freq_items_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(F.broadcast(ev.agg(F.count(F.lit(1)).alias("_n"))))
        .filter(F.col("_cnt") > F.lit(0.008) * F.col("_n"))
        .select("user_id")
    )
    sketch_ids = (
        ev.stat.freqItems(["user_id"], 0.008)
        .select(F.explode("user_id_freqItems").alias("user_id"))
    )
    n_missing = exact.join(sketch_ids, "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("_miss")
    )
    n_heavy = exact.agg(F.count(F.lit(1)).cast("long").alias("n_heavy"))
    return n_missing.join(n_heavy).select(
        (F.col("_miss") == 0).alias("all_heavy_hitters_found"), "n_heavy"
    )


@QS.add(
    "sql_scripting_quantile_bisect",
    """
    WITH t AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((9 * COUNT(*) + 9) // 10 AS BIGINT) AS k
          FROM t)
    SELECT s.n, s.k,
           (SELECT cents FROM t ORDER BY cents
            LIMIT 1 OFFSET ((SELECT k FROM s) - 1)) AS p90_cents,
           CAST(26 AS BIGINT) AS iters
    FROM s
    """,
    doc="[EXT] Spark 4 SQL SCRIPTING parity (BEGIN/DECLARE/WHILE/IF — "
    "spark.sql.scripting.enabled): the exact type-1 p90 computed by "
    "BISECTION entirely inside one SQL script — 26 WHILE iterations "
    "halve [0, 2^26) cents, each testing ONE map-side-combinable "
    "COUNT(<= mid) aggregate; k = ceil(0.9n) in pure integer form "
    "((9n+9) DIV 10, the stat_percentile_bands convention). This is "
    "the scripting-shaped access path: no sort, no window, no shuffle "
    "of the data — 26 scans with a pushable predicate, the right "
    "trade when the corpus is huge and sorted access is expensive "
    "(the oracle's ORDER BY...OFFSET twin proves the same value the "
    "direct order-statistic way). The iteration count is a structural "
    "constant (interval length 2^26 halves exactly 26 times), so the "
    "whole row is hash-gated. Follows rec_* precedent: the NEW Spark 4 "
    "SQL surface gets a declared-semantics query with a classic-SQL "
    "oracle.",
    tags=("sql", "iterative"),
)
def sql_scripting_quantile_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.scripting.enabled", "true")
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ev.select(
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    ).createOrReplaceTempView("_ssq_cents")
    return spark.sql(
        """
        BEGIN
          DECLARE n BIGINT;
          DECLARE k BIGINT;
          DECLARE lo BIGINT = 0;
          DECLARE hi BIGINT = 67108863;
          DECLARE mid BIGINT;
          DECLARE cnt BIGINT;
          DECLARE iters BIGINT = 0;
          SET n = (SELECT COUNT(*) FROM _ssq_cents);
          SET k = (9 * n + 9) DIV 10;
          WHILE lo < hi DO
            SET mid = (lo + hi) DIV 2;
            SET cnt = (SELECT COUNT(*) FROM _ssq_cents WHERE cents <= mid);
            IF cnt >= k THEN
              SET hi = mid;
            ELSE
              SET lo = mid + 1;
            END IF;
            SET iters = iters + 1;
          END WHILE;
          SELECT n, k, lo AS p90_cents, iters;
        END
        """
    )
