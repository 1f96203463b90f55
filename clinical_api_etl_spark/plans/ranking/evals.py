"""Evaluation / experimentation / audit family (split from the former
plans/ranking.py): retrieval + Markov eval, Naive Bayes, survival (KM,
log-rank), DiD/CUPED/stratified ATE, DQ contracts, privacy audits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _N_QUERY_DOCS, _TOKS, _TOP_K, _tf

QS = QuerySet()


# ---------------------------------------------------------------------------
# Declarative data-quality suite (dbt-tests analogue).
# ---------------------------------------------------------------------------


@QS.add(
    "dq_contract_checks",
    """
    SELECT 'customer_pk_dup' AS check_name,
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey) WHERE cnt > 1
    UNION ALL
    SELECT 'orders_pk_dup',
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey) WHERE cnt > 1
    UNION ALL
    SELECT 'events_pk_dup',
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY event_id) WHERE cnt > 1
    UNION ALL
    SELECT 'orders_cust_orphans', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_order_orphans', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'events_user_orphans', CAST(COUNT(*) AS BIGINT)
    FROM events e WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
    doc="[EXT] declarative data-contract suite in one summary table — the "
    "dbt-tests / Great-Expectations staple: primary-key uniqueness "
    "(excess-row counts per duplicated key, 0 when clean) for customer/"
    "orders/events, plus referential orphans (orders->customer, "
    "lineitem->orders, events.user_id->customer) via anti-joins. Each "
    "check is one aggregate or one broadcast/shuffled anti-join; the six "
    "single-row results union into a (check_name, n_violations) table a "
    "scheduler can alert on. Exact BIGINTs, full hash. At 100 TB every "
    "check stays one pass; the union is of 1-row frames.",
    tags=("quality",),
)
def dq_contract_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    def pk_dup(df: DataFrame, key: str, name: str) -> DataFrame:
        cnt = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).filter(
            F.col("cnt") > 1
        )
        return cnt.agg(
            F.lit(name).alias("check_name"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                name: str) -> DataFrame:
        n = child.join(
            parent.select(F.col(pkey).alias(ckey)).distinct(), ckey, "left_anti"
        )
        return n.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
        )

    parts = [
        pk_dup(cust, "c_custkey", "customer_pk_dup"),
        pk_dup(orders, "o_orderkey", "orders_pk_dup"),
        pk_dup(ev, "event_id", "events_pk_dup"),
        orphans(orders, "o_custkey", cust, "c_custkey", "orders_cust_orphans"),
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem_order_orphans"),
        orphans(ev, "user_id", cust, "c_custkey", "events_user_orphans"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Privacy release audit: k-anonymity + l-diversity over quasi-identifiers.
# ---------------------------------------------------------------------------


@QS.add(
    "privacy_k_anonymity",
    """
    WITH q AS (
      SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
      FROM events GROUP BY event_type, dow
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(MIN(k) AS BIGINT) AS k_anonymity,
           CAST(MIN(l) AS BIGINT) AS l_diversity,
           CAST(COUNT(*) FILTER (k < 5) AS BIGINT) AS groups_below_k5,
           CAST(COALESCE(SUM(k) FILTER (k < 5), 0) AS BIGINT)
             AS rows_below_k5,
           CAST(COUNT(*) FILTER (l < 2) AS BIGINT) AS groups_below_l2
    FROM q
    """,
    doc="[EXT] release-readiness privacy audit over the quasi-identifier "
    "pair (event_type, day-of-week): k-anonymity = the smallest "
    "equivalence-class size (an attacker knowing a target's QI values "
    "can narrow them to >= k rows), l-diversity = the smallest count of "
    "distinct sensitive values (user_id) within any class — the two "
    "numbers a data-release checklist gates on, plus the below-threshold "
    "class/row tallies that size the suppression work. One "
    "map-side-combinable aggregate to |QI-combinations| rows, one 1-row "
    "summary; all exact BIGINTs. Epoch-day mod 7 keeps the derived QI "
    "calendar-free and engine-portable.",
    tags=("quality", "privacy"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = ev.groupBy(
        "event_type", F.expr("(unix_millis(ts) div 86400000) % 7").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.count_distinct("user_id").cast("long").alias("l"),
    )
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("k_anonymity"),
        F.min("l").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_k5"),
        F.coalesce(F.sum(F.when(F.col("k") < 5, F.col("k"))), F.lit(0))
        .cast("long")
        .alias("rows_below_k5"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_l2"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve: first view -> first purchase, censored.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_kaplan_meier_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             MAX(ts) AS tend
      FROM events GROUP BY user_id
      HAVING MIN(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
    ),
    conv AS (
      SELECT u.user_id, u.t0, u.tend, MIN(e.ts) AS tp
      FROM per_user u LEFT JOIN events e
        ON e.user_id = u.user_id AND e.event_type = 'purchase'
       AND e.ts >= u.t0
      GROUP BY u.user_id, u.t0, u.tend
    ),
    durations AS (
      SELECT user_id,
             CASE WHEN tp IS NOT NULL
                  THEN (epoch_ms(tp) - epoch_ms(t0)) // 86400000
                  ELSE (epoch_ms(tend) - epoch_ms(t0)) // 86400000
             END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM conv
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects FROM durations),
    km AS (
      SELECT dur AS t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c,
             CAST(
               (SELECT COUNT(*) FROM durations d2 WHERE d2.dur >= d1.dur)
               AS BIGINT) AS n_risk
      FROM durations d1
      GROUP BY dur
      HAVING SUM(ev) >= 1
    ),
    arr AS (
      SELECT list({'d': d, 'n': n_risk} ORDER BY t) AS a FROM km
    ),
    idx AS (
      SELECT t, d, c, n_risk,
             CAST(ROW_NUMBER() OVER (ORDER BY t) AS INT) AS rn
      FROM km
    )
    SELECT idx.t, idx.d, idx.c, idx.n_risk, tot.n_subjects,
           list_reduce(
             list_prepend(CAST(1 AS DOUBLE),
               list_transform(arr.a[1:idx.rn],
                 x -> 1 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (x, y) -> x * y) AS survival
    FROM idx CROSS JOIN arr CROSS JOIN tot
    """,
    doc="[EXT] Kaplan-Meier survival curve for view->purchase conversion "
    "with right-censoring (a user's clock starts at their first view; "
    "no purchase by their last observed event = censored) — THE "
    "estimator for time-to-event questions where naive conversion "
    "rates are biased by observation windows. Every curve component is "
    "exact: day-grain durations by floor-div, d_i / censored_i / "
    "n_risk_i as BIGINTs (risk set counts subjects with duration >= t, "
    "the censored-after-events convention). S(t) is the prefix product "
    "of (1 - d_i/n_i) evaluated by the PINNED-ORDER fold (cf. "
    "stat_chisq_independence — products pin the same way sums do), so "
    "even the survival floats hash-match. The curve table is "
    "|distinct event days| rows; the per-row prefix fold is quadratic "
    "only in that tiny table.",
    tags=("stats", "temporal"),
)
def stat_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
            F.max("ts").alias("tend"),
        )
        .filter(F.col("t0").isNotNull())
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        per_user.join(
            purch,
            (per_user.user_id == purch.user_id) & (F.col("pts") >= F.col("t0")),
            "left",
        )
        .groupBy(per_user.user_id, "t0", "tend")
        .agg(F.min("pts").alias("tp"))
    )
    durations = conv.select(
        F.when(
            F.col("tp").isNotNull(),
            F.expr("(unix_millis(tp) - unix_millis(t0)) div 86400000"),
        )
        .otherwise(F.expr("(unix_millis(tend) - unix_millis(t0)) div 86400000"))
        .alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    ).coalesce(1).persist()
    tot = durations.agg(F.count(F.lit(1)).cast("long").alias("n_subjects"))
    by_t = durations.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("c_all"),
    )
    # n_risk via a reverse running sum over ALL duration rows (incl.
    # censored-only times), then keep event times
    w = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c_all")).over(w).cast("long")
    )
    km = risk.filter(F.col("d") >= 1).select(
        F.col("dur").alias("t"), "d", F.col("c_all").alias("c"), "n_risk"
    )
    arr = km.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n_risk"))).alias("a")
    )
    wrn = Window.orderBy("t")
    idx = km.withColumn("rn", F.row_number().over(wrn))
    return (
        idx.crossJoin(F.broadcast(arr))
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            "c",
            "n_risk",
            "n_subjects",
            F.aggregate(
                F.slice(F.col("a"), 1, F.col("rn")),
                F.lit(1.0),
                lambda acc, x: acc
                * (
                    F.lit(1.0)
                    - x["d"].cast("double") / x["n_risk"].cast("double")
                ),
            ).alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# Log-rank test: do two cohorts' conversion survival curves differ?
# ---------------------------------------------------------------------------


@QS.add(
    "stat_logrank_cohorts",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS grp,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             MAX(ts) AS tend
      FROM events GROUP BY user_id
      HAVING MIN(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
    ),
    conv AS (
      SELECT u.user_id, u.grp, u.t0, u.tend, MIN(e.ts) AS tp
      FROM per_user u LEFT JOIN events e
        ON e.user_id = u.user_id AND e.event_type = 'purchase'
       AND e.ts >= u.t0
      GROUP BY u.user_id, u.grp, u.t0, u.tend
    ),
    durations AS (
      SELECT grp,
             CASE WHEN tp IS NOT NULL
                  THEN (epoch_ms(tp) - epoch_ms(t0)) // 86400000
                  ELSE (epoch_ms(tend) - epoch_ms(t0)) // 86400000
             END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM conv
    ),
    km AS (
      SELECT dur AS t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST((SELECT COUNT(*) FROM durations x WHERE x.dur >= d0.dur)
                  AS BIGINT) AS n,
             CAST((SELECT COUNT(*) FROM durations x
                   WHERE x.dur >= d0.dur AND x.grp = 1) AS BIGINT) AS n1
      FROM durations d0
      GROUP BY dur
      HAVING SUM(ev) >= 1
    ),
    terms AS (
      SELECT t, d, d1, n, n1,
             CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
             CASE WHEN n <= 1 THEN CAST(0 AS DOUBLE)
                  ELSE (CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * CAST(n - d AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
             END AS v
      FROM km
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
             CAST(SUM(d1) AS BIGINT) AS o1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(e1 ORDER BY t)), (x, y) -> x + y) AS e1_sum,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(v ORDER BY t)), (x, y) -> x + y) AS v_sum
      FROM terms
    )
    SELECT n_times, o1, e1_sum, v_sum,
           CASE WHEN v_sum = 0 THEN NULL
                ELSE (CAST(o1 AS DOUBLE) - e1_sum) / sqrt(v_sum) END AS z
    FROM folded
    """,
    doc="[EXT] log-rank (Mantel-Cox) test comparing conversion survival "
    "between the even/odd user cohorts — the significance companion to "
    "stat_kaplan_meier_conversion (do the two curves differ beyond "
    "chance?). Per event time: observed group-1 events d1 (exact "
    "BIGINT), expected e1 = d*n1/n under the null, and the "
    "hypergeometric variance term — each ONE fixed IEEE expression over "
    "exact risk-set integers; both series sum via the pinned-order fold "
    "and z finishes with a correctly-rounded sqrt + division, so the "
    "whole statistic hash-matches. Risk sets per group come from the "
    "same reverse running-sum trick as the KM curve.",
    tags=("stats", "temporal"),
)
def stat_logrank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
            F.max("ts").alias("tend"),
        )
        .filter(F.col("t0").isNotNull())
        .withColumn("grp", F.col("user_id") % 2)
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        per_user.join(
            purch,
            (per_user.user_id == purch.user_id) & (F.col("pts") >= F.col("t0")),
            "left",
        )
        .groupBy(per_user.user_id, "grp", "t0", "tend")
        .agg(F.min("pts").alias("tp"))
    )
    durations = conv.select(
        "grp",
        F.when(
            F.col("tp").isNotNull(),
            F.expr("(unix_millis(tp) - unix_millis(t0)) div 86400000"),
        )
        .otherwise(F.expr("(unix_millis(tend) - unix_millis(t0)) div 86400000"))
        .alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    ).coalesce(1).persist()
    by_t = durations.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.count(F.lit(1)).cast("long").alias("all_t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("all1_t"),
    )
    w = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.withColumn("n", F.sum("all_t").over(w).cast("long")).withColumn(
        "n1", F.sum("all1_t").over(w).cast("long")
    )
    km = risk.filter(F.col("d") >= 1)
    d_d = F.col("d").cast("double")
    n_d = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / n_d
    terms = km.select(
        F.col("dur").alias("t"),
        "d",
        "d1",
        "n",
        "n1",
        (d_d * F.col("n1").cast("double") / n_d).alias("e1"),
        F.when(F.col("n") <= 1, F.lit(0.0))
        .otherwise(
            (d_d * p1 * (F.lit(1.0) - p1) * (F.col("n") - F.col("d")).cast("double"))
            / (F.col("n") - 1).cast("double")
        )
        .alias("v"),
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", "e1"))),
            F.lit(0.0),
            lambda acc, x: acc + x["e1"],
        ).alias("e1_sum"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", "v"))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("v_sum"),
    )
    return folded.select(
        "n_times",
        "o1",
        "e1_sum",
        "v_sum",
        F.when(F.col("v_sum") == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("o1").cast("double") - F.col("e1_sum")) / F.sqrt(F.col("v_sum"))
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences over the calendar midpoint.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_diff_in_diff",
    """
    WITH bounds AS (
      SELECT MIN(epoch_ms(ts) // 86400000) AS d0,
             MAX(epoch_ms(ts) // 86400000) AS d1
      FROM events
    ),
    t AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN epoch_ms(ts) // 86400000
                       >= (bounds.d0 + bounds.d1 + 1) // 2
                  THEN 1 ELSE 0 END AS post,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events CROSS JOIN bounds
      WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT grp, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM t GROUP BY grp, post
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN grp = 1 AND post = 1 THEN s END) AS s11,
        MAX(CASE WHEN grp = 1 AND post = 1 THEN n END) AS n11,
        MAX(CASE WHEN grp = 1 AND post = 0 THEN s END) AS s10,
        MAX(CASE WHEN grp = 1 AND post = 0 THEN n END) AS n10,
        MAX(CASE WHEN grp = 0 AND post = 1 THEN s END) AS s01,
        MAX(CASE WHEN grp = 0 AND post = 1 THEN n END) AS n01,
        MAX(CASE WHEN grp = 0 AND post = 0 THEN s END) AS s00,
        MAX(CASE WHEN grp = 0 AND post = 0 THEN n END) AS n00
      FROM cells
    )
    SELECT CAST(s11 AS BIGINT) AS s11, CAST(n11 AS BIGINT) AS n11,
           CAST(s10 AS BIGINT) AS s10, CAST(n10 AS BIGINT) AS n10,
           CAST(s01 AS BIGINT) AS s01, CAST(n01 AS BIGINT) AS n01,
           CAST(s00 AS BIGINT) AS s00, CAST(n00 AS BIGINT) AS n00,
           (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
            - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
           - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
              - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) AS did_cents
    FROM wide
    """,
    doc="[EXT] difference-in-differences estimator: the treatment cohort's "
    "pre/post mean-value change minus the control cohort's — the "
    "causal-inference workhorse that removes shared time trends from "
    "an uncontrolled rollout comparison. Cohorts = user parity; the "
    "pre/post split is the calendar midpoint DERIVED FROM DATA (exact "
    "integer day arithmetic, no wall clock). All four cells are exact "
    "(count, cents-sum) BIGINT pairs — one map-side-combinable "
    "aggregate — and the estimate is a fixed IEEE tree of four "
    "divisions and three subtractions, so the float hash-matches.",
    tags=("stats",),
)
def stat_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.agg(
        F.expr("MIN(unix_millis(ts) div 86400000)").alias("d0"),
        F.expr("MAX(unix_millis(ts) div 86400000)").alias("d1"),
    )
    t = ev.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.expr("unix_millis(ts) div 86400000") >= F.expr("(d0 + d1 + 1) div 2"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    cells = t.groupBy("grp", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )

    def cell(g: int, p: int, col: str):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("post") == p), F.col(col))
        )

    wide = cells.agg(
        cell(1, 1, "s").cast("long").alias("s11"),
        cell(1, 1, "n").cast("long").alias("n11"),
        cell(1, 0, "s").cast("long").alias("s10"),
        cell(1, 0, "n").cast("long").alias("n10"),
        cell(0, 1, "s").cast("long").alias("s01"),
        cell(0, 1, "n").cast("long").alias("n01"),
        cell(0, 0, "s").cast("long").alias("s00"),
        cell(0, 0, "n").cast("long").alias("n00"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return wide.select(
        "s11", "n11", "s10", "n10", "s01", "n01", "s00", "n00",
        ((m("s11", "n11") - m("s10", "n10")) - (m("s01", "n01") - m("s00", "n00")))
        .alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B comparison.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_cuped_adjusted_lift",
    """
    WITH bounds AS (
      SELECT MIN(epoch_ms(ts) // 86400000) AS d0,
             MAX(epoch_ms(ts) // 86400000) AS d1
      FROM events
    ),
    t AS (
      SELECT user_id, user_id % 2 AS grp,
             CASE WHEN epoch_ms(ts) // 86400000
                       >= (bounds.d0 + bounds.d1 + 1) // 2
                  THEN 1 ELSE 0 END AS post,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events CROSS JOIN bounds
      WHERE value IS NOT NULL
    ),
    per_user AS (
      SELECT user_id, MAX(grp) AS grp,
             CAST(SUM(CASE WHEN post = 0 THEN cents END) AS BIGINT) AS pre_s,
             CAST(COUNT(*) FILTER (post = 0) AS BIGINT) AS pre_n,
             CAST(SUM(CASE WHEN post = 1 THEN cents END) AS BIGINT) AS post_s,
             CAST(COUNT(*) FILTER (post = 1) AS BIGINT) AS post_n
      FROM t GROUP BY user_id
      HAVING COUNT(*) FILTER (post = 0) > 0 AND COUNT(*) FILTER (post = 1) > 0
    ),
    xy AS (
      SELECT user_id, grp,
             CAST(pre_s AS DOUBLE) / CAST(pre_n AS DOUBLE) AS x,
             CAST(post_s AS DOUBLE) / CAST(post_n AS DOUBLE) AS y
      FROM per_user
    ),
    folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x ORDER BY user_id)), (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(y ORDER BY user_id)), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x * y ORDER BY user_id)), (a, b) -> a + b) AS sxy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x * x ORDER BY user_id)), (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CASE WHEN grp = 1 THEN y END ORDER BY user_id)
                 FILTER (grp = 1)), (a, b) -> a + b) AS sy1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CASE WHEN grp = 1 THEN x END ORDER BY user_id)
                 FILTER (grp = 1)), (a, b) -> a + b) AS sx1,
             CAST(COUNT(*) FILTER (grp = 1) AS BIGINT) AS n1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CASE WHEN grp = 0 THEN y END ORDER BY user_id)
                 FILTER (grp = 0)), (a, b) -> a + b) AS sy0,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CASE WHEN grp = 0 THEN x END ORDER BY user_id)
                 FILTER (grp = 0)), (a, b) -> a + b) AS sx0,
             CAST(COUNT(*) FILTER (grp = 0) AS BIGINT) AS n0
      FROM xy
    )
    SELECT n, n1, n0,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx) AS theta,
           (sy1 / CAST(n1 AS DOUBLE) - sy0 / CAST(n0 AS DOUBLE))
           - ((CAST(n AS DOUBLE) * sxy - sx * sy)
              / (CAST(n AS DOUBLE) * sxx - sx * sx))
             * (sx1 / CAST(n1 AS DOUBLE) - sx0 / CAST(n0 AS DOUBLE))
             AS adj_lift_cents,
           (sy1 / CAST(n1 AS DOUBLE) - sy0 / CAST(n0 AS DOUBLE))
             AS raw_lift_cents
    FROM folds
    """,
    doc="[EXT] CUPED variance reduction for the even/odd cohort "
    "comparison: each user's PRE-period mean value is the covariate, "
    "theta = cov(x,y)/var(x) fitted on all users, and the adjusted lift "
    "subtracts theta times the cohorts' pre-period imbalance from the "
    "raw post-period lift — the industry-standard way to shrink A/B "
    "confidence intervals with historical data. Per-user x/y means are "
    "single divisions of exact BIGINTs; every cross-user sum (Σx, Σxy, "
    "per-arm Σ) runs through the pinned-order fold keyed by user_id, so "
    "theta and both lifts hash-match bit-for-bit. Only users observed "
    "in BOTH periods enter (the CUPED requirement).",
    tags=("stats",),
)
def stat_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.agg(
        F.expr("MIN(unix_millis(ts) div 86400000)").alias("d0"),
        F.expr("MAX(unix_millis(ts) div 86400000)").alias("d1"),
    )
    t = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.expr("unix_millis(ts) div 86400000") >= F.expr("(d0 + d1 + 1) div 2"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    per_user = (
        t.groupBy("user_id")
        .agg(
            F.max("grp").alias("grp"),
            F.sum(F.when(F.col("post") == 0, F.col("cents")))
            .cast("long")
            .alias("pre_s"),
            F.sum(F.when(F.col("post") == 0, 1).otherwise(0))
            .cast("long")
            .alias("pre_n"),
            F.sum(F.when(F.col("post") == 1, F.col("cents")))
            .cast("long")
            .alias("post_s"),
            F.sum(F.when(F.col("post") == 1, 1).otherwise(0))
            .cast("long")
            .alias("post_n"),
        )
        .filter((F.col("pre_n") > 0) & (F.col("post_n") > 0))
    )
    xy = per_user.select(
        "user_id",
        "grp",
        (F.col("pre_s").cast("double") / F.col("pre_n").cast("double")).alias("x"),
        (F.col("post_s").cast("double") / F.col("post_n").cast("double")).alias(
            "y"
        ),
    )

    def fold(term: F.Column, flt: F.Column | None = None) -> F.Column:
        struct = F.struct(F.col("user_id"), term.alias("term"))
        collected = (
            F.collect_list(F.when(flt, struct)) if flt is not None
            else F.collect_list(struct)
        )
        return F.aggregate(
            F.sort_array(collected), F.lit(0.0), lambda acc, s: acc + s["term"]
        )

    folds = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
        fold(F.col("y"), F.col("grp") == 1).alias("sy1"),
        fold(F.col("x"), F.col("grp") == 1).alias("sx1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        fold(F.col("y"), F.col("grp") == 0).alias("sy0"),
        fold(F.col("x"), F.col("grp") == 0).alias("sx0"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    n_d = F.col("n").cast("double")
    theta = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    raw = F.col("sy1") / F.col("n1").cast("double") - F.col("sy0") / F.col(
        "n0"
    ).cast("double")
    xdiff = F.col("sx1") / F.col("n1").cast("double") - F.col("sx0") / F.col(
        "n0"
    ).cast("double")
    return folds.select(
        "n",
        "n1",
        "n0",
        theta.alias("theta"),
        (raw - theta * xdiff).alias("adj_lift_cents"),
        raw.alias("raw_lift_cents"),
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation: NDCG@5 / MRR / recall@5 of impact vs exact ranking.
# ---------------------------------------------------------------------------

#: 1/log2(pos+1) for pos 1..5 — literal doubles, identical decimal text on
#: both engines, so the discounts are bit-identical without evaluating any
#: logarithm at query time. The DuckDB side MUST carry an exponent suffix
#: (``e0``): a plain 17-digit decimal literal parses as DECIMAL first and
#: silently truncates the final digit before the DOUBLE cast (found when
#: 164 * 0.38685280723454163 came back 1 ulp low).
_DCG_W = ("1.0", "0.6309297535714575", "0.5",
          "0.43067655807339306", "0.38685280723454163")


def _eval_dcg_sql(rel: str, rnk: str) -> str:
    terms = " + ".join(
        f"COALESCE(MAX(CASE WHEN {rnk} = {i + 1} THEN CAST({rel} AS DOUBLE)"
        f" END), 0) * {w}e0"
        for i, w in enumerate(_DCG_W)
    )
    return f"({terms})"


@QS.add(
    "eval_retrieval_ndcg",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    idf AS (SELECT tok,
                   CAST(1 AS BIGINT) << (length(bin(n.n_docs // CAST(COUNT(*) AS BIGINT))) - 1)
                     AS impact
            FROM tf CROSS JOIN n GROUP BY tok, n.n_docs),
    q AS (SELECT doc_id AS q_id, tok, c AS qc FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    s AS (SELECT q.q_id, tf.doc_id,
                 CAST(SUM(tf.c * q.qc) AS BIGINT) AS rel,
                 CAST(SUM(tf.c * idf.impact) AS BIGINT) AS iscore
          FROM tf JOIN q USING (tok) JOIN idf ON tf.tok = idf.tok
          WHERE tf.doc_id <> q.q_id
          GROUP BY q.q_id, tf.doc_id),
    ranked AS (
      SELECT q_id, doc_id, rel,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY iscore DESC, doc_id) AS sys_rnk,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY rel DESC, doc_id) AS ideal_rnk
      FROM s
    ),
    per_q AS (
      SELECT q_id,
             {_eval_dcg_sql('CASE WHEN sys_rnk <= 5 THEN rel END', 'sys_rnk')}
               AS dcg,
             {_eval_dcg_sql('CASE WHEN ideal_rnk <= 5 THEN rel END', 'ideal_rnk')}
               AS idcg,
             CAST(COUNT(*) FILTER (sys_rnk <= 5 AND ideal_rnk <= 5) AS BIGINT)
               AS hits,
             MIN(CASE WHEN sys_rnk <= 5 AND ideal_rnk <= 5
                      THEN sys_rnk END) AS first_hit
      FROM ranked GROUP BY q_id
    )
    SELECT q_id, hits,
           CAST(hits AS DOUBLE) / 5 AS recall5,
           CASE WHEN first_hit IS NULL THEN CAST(0 AS DOUBLE)
                ELSE CAST(1 AS DOUBLE) / CAST(first_hit AS DOUBLE) END AS mrr,
           CASE WHEN idcg = 0 THEN CAST(0 AS DOUBLE)
                ELSE dcg / idcg END AS ndcg5
    FROM per_q
    """,
    doc="[EXT] retrieval-quality evaluation of the quantized-impact "
    "ranking against exact dot-product relevance — NDCG@5, MRR and "
    "recall@5 per query, the metrics an IR/RAG stack reports before "
    "swapping ranking functions. Zero logs at query time: the DCG "
    "discounts 1/log2(pos+1) are literal decimal doubles (identical "
    "text parses to identical bits on both engines); DCG/IDCG are "
    "fixed 5-term weighted sums of exact BIGINT gains, and "
    "recall/MRR/NDCG are single divisions. Both rankings derive from "
    "ONE posting-join pass (rel and iscore aggregate together); ties "
    "pinned by doc_id throughout.",
    tags=("text", "retrieval"),
    headline=True,
)
def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    n = tf.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(n))
        .withColumn("m", F.expr("n_docs div df"))
        .withColumn(
            "e", F.length(F.conv(F.col("m").cast("string"), 10, 2)) - F.lit(1)
        )
        .select(
            "tok",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) AS BIGINT)")
            .alias("impact"),
        )
    )
    q = tf.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_id"), "tok", F.col("c").alias("qc")
    )
    s = (
        # q is the bounded probe set; idf is vocabulary-scale — unhinted
        tf.join(F.broadcast(q), "tok")
        .join(idf, "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(F.col("c") * F.col("qc")).cast("long").alias("rel"),
            F.sum(F.col("c") * F.col("impact")).cast("long").alias("iscore"),
        )
    )
    w_sys = Window.partitionBy("q_id").orderBy(F.desc("iscore"), F.asc("doc_id"))
    w_ideal = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ranked = s.select(
        "q_id",
        "doc_id",
        "rel",
        F.row_number().over(w_sys).alias("sys_rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )

    def dcg(rnk: str) -> F.Column:
        out = F.lit(0.0)
        for i, w in enumerate(_DCG_W):
            gain = F.coalesce(
                F.max(
                    F.when(F.col(rnk) == i + 1, F.col("rel").cast("double"))
                ),
                F.lit(0.0),
            )
            out = out + gain * F.lit(float(w))
        return out

    per_q = ranked.groupBy("q_id").agg(
        dcg("sys_rnk").alias("dcg"),
        dcg("ideal_rnk").alias("idcg"),
        F.sum(
            F.when((F.col("sys_rnk") <= 5) & (F.col("ideal_rnk") <= 5), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("hits"),
        F.min(
            F.when(
                (F.col("sys_rnk") <= 5) & (F.col("ideal_rnk") <= 5),
                F.col("sys_rnk"),
            )
        ).alias("first_hit"),
    )
    return per_q.select(
        "q_id",
        "hits",
        (F.col("hits").cast("double") / F.lit(5.0)).alias("recall5"),
        F.when(F.col("first_hit").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("first_hit").cast("double"))
        .alias("mrr"),
        F.when(F.col("idcg") == 0, F.lit(0.0))
        .otherwise(F.col("dcg") / F.col("idcg"))
        .alias("ndcg5"),
    )


# ---------------------------------------------------------------------------
# Markov next-event model evaluation (train == test corpus, exact).
# ---------------------------------------------------------------------------


@QS.add(
    "eval_markov_next_event",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    trans AS (
      SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    ),
    pred AS (
      SELECT prev, next AS predicted FROM (
        SELECT prev, next,
               ROW_NUMBER() OVER (PARTITION BY prev
                                  ORDER BY cnt DESC, next) AS rk
        FROM trans
      ) WHERE rk = 1
    )
    SELECT t.prev,
           p.predicted,
           CAST(SUM(t.cnt) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN t.next = p.predicted THEN t.cnt ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN t.next = p.predicted THEN t.cnt ELSE 0 END)
                AS DOUBLE) / CAST(SUM(t.cnt) AS DOUBLE) AS accuracy
    FROM trans t JOIN pred p ON t.prev = p.prev
    GROUP BY t.prev, p.predicted
    """,
    doc="[EXT] next-event prediction accuracy of the first-order Markov "
    "model (seq_transition_matrix's argmax row as the predictor): per "
    "source state, the majority-class baseline accuracy — the sanity "
    "bar any sequence model must beat, and the replay-evaluation shape "
    "(train on the corpus, score every transition) used before "
    "shipping behavioral models. Deterministic argmax (count DESC, "
    "label ASC); counts exact BIGINTs; accuracy one division. The "
    "evaluation aggregates the TRANSITION table (k^2 rows), never "
    "rescans events.",
    tags=("analytics", "sequence", "markov"),
)
def eval_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    trans = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).coalesce(1).persist()
    rk = Window.partitionBy("prev").orderBy(F.desc("cnt"), F.asc("next"))
    pred = (
        trans.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("prev", F.col("next").alias("predicted"))
    )
    correct = F.sum(
        F.when(F.col("next") == F.col("predicted"), F.col("cnt")).otherwise(0)
    )
    return (
        trans.join(F.broadcast(pred), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.sum("cnt").cast("long").alias("n_transitions"),
            correct.cast("long").alias("n_correct"),
            (correct.cast("double") / F.sum("cnt").cast("double")).alias(
                "accuracy"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes: train + predict + confusion, all hash-gated.
# ---------------------------------------------------------------------------


@QS.add(
    "ml_naive_bayes_lang",
    f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
    ),
    classes AS MATERIALIZED (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM t GROUP BY lang
    ),
    corpus AS MATERIALIZED (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM t) AS v
      FROM classes
    ),
    cls_tok AS MATERIALIZED (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY lang, tok
    ),
    cls_tot AS MATERIALIZED (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cls_tok GROUP BY lang
    ),
    vocab AS MATERIALIZED (SELECT DISTINCT tok FROM t),
    p AS MATERIALIZED (
      -- add-one smoothed p(tok | class) as ONE correctly-rounded division
      SELECT cl.lang, vb.tok,
             CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
               / CAST(tt.tot + corpus.v AS DOUBLE) AS pr
      FROM classes cl
      CROSS JOIN vocab vb
      CROSS JOIN corpus
      JOIN cls_tot tt ON tt.lang = cl.lang
      LEFT JOIN cls_tok ct ON ct.lang = cl.lang AND ct.tok = vb.tok
    ),
    scored AS MATERIALIZED (
      SELECT d.doc_id, d.lang AS actual, p.lang AS cls,
             (CAST(cl.n_docs AS DOUBLE) / CAST(corpus.total_docs AS DOUBLE))
             * list_reduce(
                 list_prepend(CAST(1 AS DOUBLE),
                              list(p.pr ORDER BY d.tok, d.occ)),
                 (a, b) -> a * b) AS score
      FROM (SELECT doc_id, lang, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, tok) AS occ
            FROM t) d
      JOIN p ON p.tok = d.tok
      JOIN classes cl ON cl.lang = p.lang
      CROSS JOIN corpus
      GROUP BY d.doc_id, d.lang, p.lang, cl.n_docs, corpus.total_docs
    ),
    pred AS MATERIALIZED (
      SELECT doc_id, actual, cls AS predicted FROM (
        SELECT doc_id, actual, cls,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cls) AS rk
        FROM scored) WHERE rk = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY actual, predicted
    """,
    doc="[EXT] multinomial Naive Bayes language classifier — trained on "
    "the corpus (lang labels), every document scored against every "
    "class, confusion matrix out; the classic supervised text baseline, "
    "end-to-end in relational ops. NO logarithms (JVM/libm ln diverge): "
    "the posterior is the RAW probability product — each add-one "
    "smoothed p(tok|class) is one correctly-rounded division, and the "
    "per-document product folds in pinned (token, occurrence) order, so "
    "scores are bit-identical across engines (54-token docs bottom out "
    "around 1e-90, far above double underflow; at longer docs switch to "
    "per-128-token rescaling, documented). Argmax ties pin on class "
    "label. Train tables are (class x vocab)-sized aggregates; scoring "
    "joins the exploded corpus once.",
    tags=("text", "ml"),
    headline=True,
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = (
        docs.select(
            "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .coalesce(8)
        .persist()
    )
    classes = t.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    corpus = classes.agg(
        F.sum("n_docs").cast("long").alias("total_docs")
    ).crossJoin(
        t.agg(F.count_distinct("tok").cast("long").alias("v"))
    )
    cls_tok = t.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cls_tot = cls_tok.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    vocab = t.select("tok").distinct()
    p = (
        classes.crossJoin(vocab)
        .crossJoin(F.broadcast(corpus))
        .join(cls_tot, "lang")
        .join(cls_tok, ["lang", "tok"], "left")
        .select(
            "lang",
            "tok",
            (
                (F.coalesce("c", F.lit(0)) + 1).cast("double")
                / (F.col("tot") + F.col("v")).cast("double")
            ).alias("pr"),
        )
        .coalesce(8)
        .persist()
    )
    wocc = Window.partitionBy("doc_id", "tok").orderBy(F.lit(1))
    d = t.withColumn("occ", F.row_number().over(wocc))
    scored = (
        d.join(
            p.select(F.col("lang").alias("cls"), "tok", "pr"), "tok"
        )
        .groupBy("doc_id", F.col("lang").alias("actual"), "cls")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("tok", "occ", "pr"))),
                F.lit(1.0),
                lambda acc, x: acc * x["pr"],
            ).alias("fold")
        )
        .join(
            F.broadcast(
                classes.crossJoin(corpus).select(
                    F.col("lang").alias("cls"),
                    (
                        F.col("n_docs").cast("double")
                        / F.col("total_docs").cast("double")
                    ).alias("prior"),
                )
            ),
            "cls",
        )
        .select(
            "doc_id", "actual", "cls", (F.col("prior") * F.col("fold")).alias("score")
        )
    )
    wp = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = (
        scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cls").alias("predicted"))
    )
    return pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# Naive Bayes with a held-out split: per-class precision/recall/F1.
# ---------------------------------------------------------------------------


@QS.add(
    "ml_naive_bayes_holdout",
    f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, lang, unnest({_TOKS}) AS tok,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000' AS is_train
      FROM documents
    ),
    classes AS MATERIALIZED (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM t WHERE is_train GROUP BY lang
    ),
    corpus AS MATERIALIZED (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
              FROM t WHERE is_train) AS v
      FROM classes
    ),
    cls_tok AS MATERIALIZED (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM t WHERE is_train GROUP BY lang, tok
    ),
    cls_tot AS MATERIALIZED (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cls_tok GROUP BY lang
    ),
    scored AS MATERIALIZED (
      SELECT d.doc_id, d.lang AS actual, cl.lang AS cls,
             (CAST(cl.n_docs AS DOUBLE) / CAST(corpus.total_docs AS DOUBLE))
             * list_reduce(
                 list_prepend(CAST(1 AS DOUBLE),
                   list(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                        / CAST(tt.tot + corpus.v AS DOUBLE)
                        ORDER BY d.tok, d.occ)),
                 (a, b) -> a * b) AS score
      FROM (SELECT doc_id, lang, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, tok) AS occ
            FROM t WHERE NOT is_train) d
      CROSS JOIN classes cl
      CROSS JOIN corpus
      JOIN cls_tot tt ON tt.lang = cl.lang
      LEFT JOIN cls_tok ct ON ct.lang = cl.lang AND ct.tok = d.tok
      GROUP BY d.doc_id, d.lang, cl.lang, cl.n_docs, corpus.total_docs
    ),
    pred AS MATERIALIZED (
      SELECT doc_id, actual, cls AS predicted FROM (
        SELECT doc_id, actual, cls,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cls) AS rk
        FROM scored) WHERE rk = 1
    ),
    per_class AS (
      SELECT c.lang,
             CAST(COALESCE(SUM(CASE WHEN p.actual = c.lang
                        AND p.predicted = c.lang THEN 1 END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(SUM(CASE WHEN p.actual <> c.lang
                        AND p.predicted = c.lang THEN 1 END), 0) AS BIGINT) AS fp,
             CAST(COALESCE(SUM(CASE WHEN p.actual = c.lang
                        AND p.predicted <> c.lang THEN 1 END), 0) AS BIGINT) AS fn
      FROM classes c CROSS JOIN pred p
      GROUP BY c.lang
    )
    SELECT lang, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision_,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
             AS recall_,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE CAST(2 * tp AS DOUBLE)
                     / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
    FROM per_class
    """,
    doc="[EXT] Naive Bayes under a PROPER held-out evaluation: a "
    "deterministic md5 split (hex-prefix < '8000', the engine's "
    "portable-sampling convention) trains on ~half the corpus and "
    "scores the unseen half — tokens absent from training smooth to "
    "1/(tot_c+V) through the same add-one path, so out-of-vocabulary "
    "mass is handled, not dropped. Output is the per-class "
    "precision/recall/F1 table (exact TP/FP/FN BIGINTs; F1 computed as "
    "2TP/(2TP+FP+FN) — ONE division, algebraically identical to the "
    "harmonic mean but with no intermediate rounding). Scores fold in "
    "pinned order as in ml_naive_bayes_lang.",
    tags=("text", "ml"),
)
def ml_naive_bayes_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(tokens(F.col("text"))).alias("tok"),
            (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
                < "8000"
            ).alias("is_train"),
        )
        .coalesce(8)
        .persist()
    )
    train = t.filter(F.col("is_train"))
    classes = train.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    corpus = classes.agg(
        F.sum("n_docs").cast("long").alias("total_docs")
    ).crossJoin(train.agg(F.count_distinct("tok").cast("long").alias("v")))
    cls_tok = train.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cls_tot = cls_tok.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    wocc = Window.partitionBy("doc_id", "tok").orderBy(F.lit(1))
    d = (
        t.filter(~F.col("is_train"))
        .withColumn("occ", F.row_number().over(wocc))
        .select("doc_id", F.col("lang").alias("actual"), "tok", "occ")
    )
    scored = (
        d.crossJoin(F.broadcast(classes.select(F.col("lang").alias("cls"), "n_docs")))
        .crossJoin(F.broadcast(corpus))
        .join(
            F.broadcast(cls_tot.select(F.col("lang").alias("cls"), "tot")), "cls"
        )
        .join(
            # class-conditional token counts are vocabulary-scale — unhinted
            cls_tok.select(F.col("lang").alias("cls"), "tok", "c"),
            ["cls", "tok"],
            "left",
        )
        .withColumn(
            "pr",
            (F.coalesce("c", F.lit(0)) + 1).cast("double")
            / (F.col("tot") + F.col("v")).cast("double"),
        )
        .groupBy("doc_id", "actual", "cls", "n_docs", "total_docs")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("tok", "occ", "pr"))),
                F.lit(1.0),
                lambda acc, x: acc * x["pr"],
            ).alias("fold")
        )
        .select(
            "doc_id",
            "actual",
            "cls",
            (
                (F.col("n_docs").cast("double") / F.col("total_docs").cast("double"))
                * F.col("fold")
            ).alias("score"),
        )
    )
    wp = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = (
        scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cls").alias("predicted"))
    ).coalesce(1).persist()
    per_class = (
        classes.select("lang")
        .crossJoin(pred)
        .groupBy("lang")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("actual") == F.col("lang"))
                        & (F.col("predicted") == F.col("lang")),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("actual") != F.col("lang"))
                        & (F.col("predicted") == F.col("lang")),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("actual") == F.col("lang"))
                        & (F.col("predicted") != F.col("lang")),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fn"),
        )
    )
    return per_class.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
        )
        .alias("precision_"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double")
        )
        .alias("recall_"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
        )
        .alias("f1"),
    )


# ---------------------------------------------------------------------------
# Financial reconciliation: order headers vs line-item rollup.
# ---------------------------------------------------------------------------


@QS.add(
    "dq_order_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                               AS BIGINT))) AS BIGINT) AS line_e4
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderstatus,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * 100 AS head_e4,
             li.line_e4
      FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (head_e4 = line_e4) AS BIGINT) AS n_exact,
           CAST(SUM(ABS(head_e4 - line_e4)) AS BIGINT) AS abs_diff_e4,
           CAST(MAX(ABS(head_e4 - line_e4)) AS BIGINT) AS max_diff_e4
    FROM j GROUP BY o_orderstatus
    """,
    doc="[EXT] header-vs-detail reconciliation — the finance-closing "
    "staple: every order's header total compared against the discounted "
    "line-item rollup, reported per status as exact-match counts and "
    "absolute drift. All arithmetic in ten-thousandth units (cents x "
    "(100 - discount-hundredths)) so the comparison is EXACT integers — "
    "a float recon would flag fp dust as drift. One grouped rollup + "
    "one key join; the report aggregates to |statuses| rows. (This "
    "synthetic generator draws headers independently of lines, so the "
    "report correctly shows ~zero exact matches — the shape, not the "
    "verdict, is the deliverable.)",
    tags=("quality",),
)
def dq_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ext_c = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    disc_h = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rolled = li.groupBy("l_orderkey").agg(
        F.sum(ext_c * (F.lit(100) - disc_h)).cast("long").alias("line_e4")
    )
    head_e4 = (
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long") * 100
    )
    j = orders.join(rolled, orders.o_orderkey == rolled.l_orderkey).select(
        "o_orderstatus", head_e4.alias("head_e4"), "line_e4"
    )
    diff = F.abs(F.col("head_e4") - F.col("line_e4"))
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("head_e4") == F.col("line_e4"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(diff).cast("long").alias("abs_diff_e4"),
        F.max(diff).cast("long").alias("max_diff_e4"),
    )


@QS.add(
    "privacy_t_closeness",
    """
    WITH e AS (
      SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow,
             LEAST(5, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      // 10000) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    gb AS (SELECT event_type, dow, bin, CAST(COUNT(*) AS BIGINT) AS c
           FROM e GROUP BY event_type, dow, bin),
    g AS (SELECT event_type, dow, CAST(SUM(c) AS BIGINT) AS n_g
          FROM gb GROUP BY event_type, dow),
    b AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS cb FROM gb GROUP BY bin),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gb),
    x AS (
      SELECT g.event_type, g.dow, g.n_g, b.bin, b.cb,
             CAST(COALESCE(gb.c, 0) AS BIGINT) AS c
      FROM g CROSS JOIN b
      LEFT JOIN gb ON gb.event_type = g.event_type AND gb.dow = g.dow
                  AND gb.bin = b.bin
    ),
    t AS (
      SELECT event_type, dow, CAST(MAX(n_g) AS BIGINT) AS n_g,
             CAST(SUM(ABS(c * (SELECT n FROM nn) - cb * n_g)) AS BIGINT)
               AS num
      FROM x GROUP BY event_type, dow
    )
    SELECT event_type, dow, n_g, num,
           CAST(num AS DOUBLE)
             / CAST(2 * n_g * (SELECT n FROM nn) AS DOUBLE) AS t_closeness
    FROM t
    """,
    doc="[EXT] t-closeness release audit (Li et al. 2007, the "
    "total-variation-distance variant for categorical sensitive "
    "attributes) — the escalation past k-anonymity/l-diversity: a "
    "quasi-identifier class can be large AND diverse yet still leak if "
    "its sensitive-value DISTRIBUTION diverges from the corpus's. Per "
    "QI class (event_type, epoch-dow): TV(p_class, p_global) = "
    "Σ_bins |c_b/n_g − C_b/N| / 2, computed as the exact BIGINT "
    "cross-multiplication Σ|c_b·N − C_b·n_g| with ONE final division "
    "by 2·n_g·N — zero float accumulation, hash-gated. Sensitive bins "
    "are fixed $100 value bands (floor-div on non-negative cents — "
    "engine-portable). Missing class/bin pairs enter via the "
    "class×bin frame (c=0 contributes its full global mass). "
    "Cross-multiply headroom: n_g·N <= N² — fine through ~3e9 events "
    "per partition-scoped audit; shard the audit by date partition "
    "before N² approaches BIGINT range.",
    tags=("quality", "privacy"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        F.expr("(unix_millis(ts) div 86400000) % 7").alias("dow"),
        F.least(
            F.lit(5),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 10000"
            ),
        ).alias("bin"),
    )
    gb = e.groupBy("event_type", "dow", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    g = gb.groupBy("event_type", "dow").agg(
        F.sum("c").cast("long").alias("n_g")
    )
    b = gb.groupBy("bin").agg(F.sum("c").cast("long").alias("cb"))
    nn = gb.agg(F.sum("c").cast("long").alias("n"))
    x = (
        g.crossJoin(F.broadcast(b))
        .join(gb, ["event_type", "dow", "bin"], "left")
        .select(
            "event_type",
            "dow",
            "n_g",
            "cb",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    t = (
        x.crossJoin(F.broadcast(nn))
        .groupBy("event_type", "dow")
        .agg(
            F.max("n_g").cast("long").alias("n_g"),
            F.sum(
                F.abs(F.col("c") * F.col("n") - F.col("cb") * F.col("n_g"))
            )
            .cast("long")
            .alias("num"),
            F.max("n").alias("_n"),
        )
    )
    return t.select(
        "event_type",
        "dow",
        "n_g",
        "num",
        (
            F.col("num").cast("double")
            / (F.lit(2) * F.col("n_g") * F.col("_n")).cast("double")
        ).alias("t_closeness"),
    )


@QS.add(
    "causal_stratified_ate",
    """
    WITH e AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             (substr(md5(CAST(event_id AS VARCHAR)), 1, 1) <
              CASE event_type WHEN 'view' THEN '4' WHEN 'click' THEN '6'
                   WHEN 'purchase' THEN '8' WHEN 'signup' THEN 'a'
                   ELSE 'c' END) AS treated
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(COUNT(*) FILTER (treated) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (NOT treated) AS BIGINT) AS n0,
             CAST(SUM(cents) FILTER (treated) AS BIGINT) AS y1,
             CAST(SUM(cents) FILTER (NOT treated) AS BIGINT) AS y0
      FROM e GROUP BY event_type
    ),
    nn AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
                  CAST(SUM(n1) AS BIGINT) AS t1,
                  CAST(SUM(n0) AS BIGINT) AS t0,
                  CAST(SUM(y1) AS BIGINT) AS sy1,
                  CAST(SUM(y0) AS BIGINT) AS sy0
           FROM s),
    terms AS (
      SELECT event_type, n_s, n1, n0,
             CAST(n1 AS DOUBLE) / CAST(n_s AS DOUBLE) AS p_hat,
             (CAST(n_s AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE))
             * (CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS term
      FROM s WHERE n1 > 0 AND n0 > 0
    )
    SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST((SELECT sy1 AS BIGINT FROM nn) AS DOUBLE)
             / CAST((SELECT t1 FROM nn) AS DOUBLE)
           - CAST((SELECT sy0 FROM nn) AS DOUBLE)
             / CAST((SELECT t0 FROM nn) AS DOUBLE) AS naive_diff_cents,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(term ORDER BY event_type)), (x, y) -> x + y)
             AS ate_cents
    FROM terms
    """,
    doc="[EXT] stratified (exact-subclassification) average treatment "
    "effect — Rosenbaum & Rubin's propensity-stratification posture "
    "with the covariate cell AS the stratum: treatment assignment is "
    "md5-deterministic with a DIFFERENT rate per event_type (planted "
    "confounding — treatment probability and outcome both depend on "
    "type), so the NAIVE treated-vs-control difference is biased and "
    "the stratified estimator Σ_s (n_s/N)(ȳ₁ₛ−ȳ₀ₛ) removes exactly "
    "the between-stratum component. Completes the causal family next "
    "to diff-in-diff (time confounding) and CUPED (variance "
    "reduction). Every mean is one division over exact BIGINT cents, "
    "each stratum term a fixed IEEE tree, the ATE a pinned "
    "stratum-order fold; empty arms drop their stratum (standard "
    "positivity filter) — fully hash-gated.",
    tags=("stats", "causal"),
)
def causal_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    thr = (
        F.when(F.col("event_type") == "view", "4")
        .when(F.col("event_type") == "click", "6")
        .when(F.col("event_type") == "purchase", "8")
        .when(F.col("event_type") == "signup", "a")
        .otherwise("c")
    )
    e = ev.select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        (
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < thr
        ).alias("treated"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("treated"), F.col("cents"))).cast("long").alias("y1"),
        F.sum(F.when(~F.col("treated"), F.col("cents")))
        .cast("long")
        .alias("y0"),
    ).persist()
    nn = s.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum("n1").cast("long").alias("t1"),
        F.sum("n0").cast("long").alias("t0"),
        F.sum("y1").cast("long").alias("sy1"),
        F.sum("y0").cast("long").alias("sy0"),
    )
    terms = (
        s.filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .crossJoin(F.broadcast(nn))
        .select(
            "event_type",
            (
                (F.col("n_s").cast("double") / F.col("n").cast("double"))
                * (
                    F.col("y1").cast("double") / F.col("n1").cast("double")
                    - F.col("y0").cast("double") / F.col("n0").cast("double")
                )
            ).alias("term"),
            "n",
            "t1",
            "t0",
            "sy1",
            "sy0",
        )
    )
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        (
            F.max("sy1").cast("double") / F.max("t1").cast("double")
            - F.max("sy0").cast("double") / F.max("t0").cast("double")
        ).alias("naive_diff_cents"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("ate_cents"),
    )


# ---------------------------------------------------------------------------
# Multiclass Matthews correlation over the NB confusion matrix.
# ---------------------------------------------------------------------------

#: Composed oracle: the registered NB oracle becomes a CTE, so the two
#: can never drift (the corpus_data_card composition lesson).
_MCC_ORACLE = f"""
    WITH conf AS MATERIALIZED (
      {{nb}}
    ),
    cls AS (
      SELECT cls, CAST(COALESCE(SUM(t_n), 0) AS BIGINT) AS t_k,
             CAST(COALESCE(SUM(p_n), 0) AS BIGINT) AS p_k
      FROM (
        SELECT actual AS cls, n AS t_n, NULL AS p_n FROM conf
        UNION ALL
        SELECT predicted AS cls, NULL AS t_n, n AS p_n FROM conf
      ) m GROUP BY cls
    ),
    scal AS (
      SELECT CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
                  AS BIGINT) AS c
      FROM conf
    ),
    sums AS (
      SELECT CAST(SUM(p_k * t_k) AS BIGINT) AS ptsum,
             CAST(SUM(p_k * p_k) AS BIGINT) AS ppsum,
             CAST(SUM(t_k * t_k) AS BIGINT) AS ttsum
      FROM cls
    )
    SELECT scal.s AS n_total, scal.c AS n_correct,
           CAST(scal.c * scal.s - sums.ptsum AS BIGINT) AS mcc_num,
           CAST(scal.s * scal.s - sums.ppsum AS BIGINT) AS den_p,
           CAST(scal.s * scal.s - sums.ttsum AS BIGINT) AS den_t,
           CASE WHEN scal.s * scal.s - sums.ppsum = 0
                  OR scal.s * scal.s - sums.ttsum = 0 THEN NULL
                ELSE CAST(scal.c * scal.s - sums.ptsum AS DOUBLE)
                     / (sqrt(CAST(scal.s * scal.s - sums.ppsum AS DOUBLE))
                        * sqrt(CAST(scal.s * scal.s - sums.ttsum AS DOUBLE)))
           END AS mcc
    FROM scal, sums
"""


@QS.add(
    "ml_mcc_multiclass",
    _MCC_ORACLE.format(nb=QS.queries["ml_naive_bayes_lang"].oracle),
    doc="[EXT] multiclass Matthews correlation coefficient (Gorodkin R_K) "
    "of the Naive Bayes classifier — the single-number quality score "
    "robust to class imbalance where accuracy and per-class F1 mislead: "
    "R_K = (c·s − Σp_k t_k) / (√(s²−Σp²)·√(s²−Σt²)) with every "
    "component an exact BIGINT from the confusion matrix, two "
    "correctly-rounded sqrts and one division (NULL when a margin is "
    "degenerate — one predicted or actual class — never NaN). The "
    "oracle embeds the REGISTERED NB oracle as a CTE, so classifier "
    "and metric can never drift apart (the composition lesson).",
    tags=("ml", "stats"),
)
def ml_mcc_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = ml_naive_bayes_lang(spark, sf_dir).localCheckpoint(eager=True)
    t_k = conf.groupBy(F.col("actual").alias("cls")).agg(
        F.sum("n").cast("long").alias("t_k")
    )
    p_k = conf.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").cast("long").alias("p_k")
    )
    cls = (
        t_k.join(p_k, "cls", "full_outer")
        .select(
            "cls",
            F.coalesce("t_k", F.lit(0)).cast("long").alias("t_k"),
            F.coalesce("p_k", F.lit(0)).cast("long").alias("p_k"),
        )
    )
    scal = conf.agg(
        F.sum("n").cast("long").alias("s"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    sums = cls.agg(
        F.sum(F.col("p_k") * F.col("t_k")).cast("long").alias("ptsum"),
        F.sum(F.col("p_k") * F.col("p_k")).cast("long").alias("ppsum"),
        F.sum(F.col("t_k") * F.col("t_k")).cast("long").alias("ttsum"),
    )
    j = scal.crossJoin(F.broadcast(sums))
    den_p = F.col("s") * F.col("s") - F.col("ppsum")
    den_t = F.col("s") * F.col("s") - F.col("ttsum")
    num = F.col("c") * F.col("s") - F.col("ptsum")
    return j.select(
        F.col("s").alias("n_total"),
        F.col("c").alias("n_correct"),
        num.cast("long").alias("mcc_num"),
        den_p.cast("long").alias("den_p"),
        den_t.cast("long").alias("den_t"),
        F.when((den_p == 0) | (den_t == 0), F.lit(None).cast("double"))
        .otherwise(
            num.cast("double")
            / (F.sqrt(den_p.cast("double")) * F.sqrt(den_t.cast("double")))
        )
        .alias("mcc"),
    )


@QS.add(
    "privacy_recursive_cl_diversity",
    """
    WITH e AS (
      SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow,
             LEAST(5, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      // 2000) AS sens
      FROM events WHERE value IS NOT NULL
    ),
    bins AS (
      SELECT event_type, dow, sens, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM e GROUP BY event_type, dow, sens
    ),
    ranked AS (
      SELECT event_type, dow, sens, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type, dow
                                ORDER BY cnt DESC, sens) AS rk
      FROM bins
    )
    SELECT event_type, dow,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS BIGINT) AS r1,
           CAST(SUM(CASE WHEN rk >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS tail_l2,
           CAST(SUM(CASE WHEN rk >= 3 THEN cnt ELSE 0 END) AS BIGINT)
             AS tail_l3,
           MAX(CASE WHEN rk = 1 THEN cnt END)
             < 3 * SUM(CASE WHEN rk >= 2 THEN cnt ELSE 0 END) AS ok_c3_l2,
           MAX(CASE WHEN rk = 1 THEN cnt END)
             < 3 * SUM(CASE WHEN rk >= 3 THEN cnt ELSE 0 END) AS ok_c3_l3
    FROM ranked GROUP BY event_type, dow
    """,
    doc="[EXT] recursive (c,l)-diversity audit (Machanavajjhala et al. "
    "2007) per QI class (event_type, day-of-week) over the bounded "
    "sensitive domain (value quintile bins, the t-closeness setup): a "
    "class passes (c,l) iff the most common sensitive value is rarer "
    "than c times the tail from rank l — the escalation past plain "
    "l-diversity that catches skewed classes where one value dominates "
    "despite l distinct values existing. Both (3,2) and (3,3) emitted; "
    "everything exact BIGINT counts + integer cross-multiplied "
    "booleans (tail sums depend only on the sorted count multiset, so "
    "rank ties cannot perturb them).",
    tags=("quality", "privacy"),
)
def privacy_recursive_cl_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        F.expr("(unix_millis(ts) div 86400000) % 7").alias("dow"),
        F.least(
            F.lit(5),
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 2000"),
        ).alias("sens"),
    )
    bins = e.groupBy("event_type", "dow", "sens").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type", "dow").orderBy(
        F.desc("cnt"), F.asc("sens")
    )
    ranked = bins.withColumn("rk", F.row_number().over(w))
    r1 = F.max(F.when(F.col("rk") == 1, F.col("cnt")))
    tail2 = F.sum(F.when(F.col("rk") >= 2, F.col("cnt")).otherwise(0))
    tail3 = F.sum(F.when(F.col("rk") >= 3, F.col("cnt")).otherwise(0))
    return ranked.groupBy("event_type", "dow").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        r1.cast("long").alias("r1"),
        tail2.cast("long").alias("tail_l2"),
        tail3.cast("long").alias("tail_l3"),
        (r1 < 3 * tail2).alias("ok_c3_l2"),
        (r1 < 3 * tail3).alias("ok_c3_l3"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa over the NB confusion matrix (chance-corrected accuracy).
# ---------------------------------------------------------------------------

#: Same composed-oracle discipline as ml_mcc_multiclass: the registered
#: NB oracle is the CTE, so classifier and metric can never drift.
_KAPPA_ORACLE = """
    WITH conf AS MATERIALIZED (
      {nb}
    ),
    cls AS (
      SELECT cls, CAST(COALESCE(SUM(t_n), 0) AS BIGINT) AS t_k,
             CAST(COALESCE(SUM(p_n), 0) AS BIGINT) AS p_k
      FROM (
        SELECT actual AS cls, n AS t_n, NULL AS p_n FROM conf
        UNION ALL
        SELECT predicted AS cls, NULL AS t_n, n AS p_n FROM conf
      ) m GROUP BY cls
    ),
    scal AS (
      SELECT CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
                  AS BIGINT) AS c
      FROM conf
    ),
    sums AS (
      SELECT CAST(SUM(p_k * t_k) AS BIGINT) AS ptsum FROM cls
    )
    SELECT scal.s AS n_total, scal.c AS n_correct,
           CAST(scal.s * scal.c - sums.ptsum AS BIGINT) AS kappa_num,
           CAST(scal.s * scal.s - sums.ptsum AS BIGINT) AS kappa_den,
           CASE WHEN scal.s * scal.s - sums.ptsum = 0 THEN NULL
                ELSE CAST(scal.s * scal.c - sums.ptsum AS DOUBLE)
                     / CAST(scal.s * scal.s - sums.ptsum AS DOUBLE)
           END AS kappa
    FROM scal, sums
"""


@QS.add(
    "ml_cohen_kappa",
    _KAPPA_ORACLE.format(nb=QS.queries["ml_naive_bayes_lang"].oracle),
    doc="[EXT] Cohen's kappa of the Naive Bayes classifier -- "
    "chance-corrected agreement between predicted and actual labels: "
    "kappa = (s*c - Sum p_k t_k) / (s^2 - Sum p_k t_k), the multiply-"
    "through-by-s^2 form where observed agreement c/s and expected "
    "agreement Sum(p_k t_k)/s^2 share a denominator, so numerator and "
    "denominator are exact BIGINTs and kappa is ONE division. The "
    "complement to ml_mcc_multiclass: kappa penalizes marginal-"
    "distribution luck, MCC penalizes per-class imbalance -- a model "
    "card reports both. Oracle embeds the REGISTERED NB oracle as a "
    "CTE (composition discipline).",
    tags=("ml", "stats"),
)
def ml_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = ml_naive_bayes_lang(spark, sf_dir).localCheckpoint(eager=True)
    t_k = conf.groupBy(F.col("actual").alias("cls")).agg(
        F.sum("n").cast("long").alias("t_k")
    )
    p_k = conf.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").cast("long").alias("p_k")
    )
    cls = t_k.join(p_k, "cls", "full_outer").select(
        "cls",
        F.coalesce("t_k", F.lit(0)).cast("long").alias("t_k"),
        F.coalesce("p_k", F.lit(0)).cast("long").alias("p_k"),
    )
    scal = conf.agg(
        F.sum("n").cast("long").alias("s"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    sums = cls.agg(F.sum(F.col("p_k") * F.col("t_k")).cast("long").alias("ptsum"))
    j = scal.crossJoin(F.broadcast(sums))
    num = F.col("s") * F.col("c") - F.col("ptsum")
    den = F.col("s") * F.col("s") - F.col("ptsum")
    return j.select(
        F.col("s").alias("n_total"),
        F.col("c").alias("n_correct"),
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Average precision per query (AP / MAP building block) for the
# quantized-impact ranking, relevance = true (exact dot-product) top-5.
# ---------------------------------------------------------------------------


@QS.add(
    "eval_average_precision",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    idf AS (SELECT tok,
                   CAST(1 AS BIGINT) << (length(bin(n.n_docs // CAST(COUNT(*) AS BIGINT))) - 1)
                     AS impact
            FROM tf CROSS JOIN n GROUP BY tok, n.n_docs),
    q AS (SELECT doc_id AS q_id, tok, c AS qc FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    s AS (SELECT q.q_id, tf.doc_id,
                 CAST(SUM(tf.c * q.qc) AS BIGINT) AS rel,
                 CAST(SUM(tf.c * idf.impact) AS BIGINT) AS iscore
          FROM tf JOIN q USING (tok) JOIN idf ON tf.tok = idf.tok
          WHERE tf.doc_id <> q.q_id
          GROUP BY q.q_id, tf.doc_id),
    ranked AS (
      SELECT q_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY iscore DESC, doc_id) AS sys_rnk,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY rel DESC, doc_id) AS ideal_rnk
      FROM s
    ),
    walk AS (
      SELECT q_id, sys_rnk, ideal_rnk,
             CAST(SUM(CASE WHEN ideal_rnk <= 5 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY q_id ORDER BY sys_rnk) AS BIGINT) AS cum
      FROM ranked
    ),
    terms AS (
      SELECT q_id, sys_rnk,
             CAST(cum AS DOUBLE) / CAST(sys_rnk AS DOUBLE) AS term
      FROM walk WHERE ideal_rnk <= 5
    )
    SELECT q_id,
           CAST(MAX(sys_rnk) AS BIGINT) AS last_rel_rank,
           list_reduce(list_prepend(0.0e0, list(term ORDER BY sys_rnk)),
                       (x, y) -> x + y) / 5e0 AS ap
    FROM terms GROUP BY q_id
    """,
    doc="[EXT] average precision per query of the quantized-impact "
    "ranking, relevance = membership in the exact dot-product top-5 "
    "(same setup as eval_retrieval_ndcg): AP = (1/5) * "
    "Sum_{{relevant at system rank k}} cum_rel(k)/k. Each precision "
    "term is ONE division of exact BIGINTs (cumulative relevant count "
    "over rank), summed in pinned ascending-rank order -- bit-identical "
    "both engines. The rank-sensitive retrieval metric that, unlike "
    "NDCG@5, rewards putting ALL relevant docs early, not just the "
    "cut; windows are per-query partitions, never global.",
    tags=("text", "retrieval", "ml"),
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    n = tf.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(n))
        .withColumn("m", F.expr("n_docs div df"))
        .withColumn(
            "e", F.length(F.conv(F.col("m").cast("string"), 10, 2)) - F.lit(1)
        )
        .select(
            "tok",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) AS BIGINT)")
            .alias("impact"),
        )
    )
    q = tf.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_id"), "tok", F.col("c").alias("qc")
    )
    s = (
        # q is the bounded probe set; idf is vocabulary-scale — unhinted
        tf.join(F.broadcast(q), "tok")
        .join(idf, "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(F.col("c") * F.col("qc")).cast("long").alias("rel"),
            F.sum(F.col("c") * F.col("impact")).cast("long").alias("iscore"),
        )
    )
    w_sys = Window.partitionBy("q_id").orderBy(F.desc("iscore"), F.asc("doc_id"))
    w_ideal = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ranked = s.select(
        "q_id",
        F.row_number().over(w_sys).alias("sys_rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )
    w_cum = Window.partitionBy("q_id").orderBy("sys_rnk")
    walk = ranked.select(
        "q_id",
        "sys_rnk",
        "ideal_rnk",
        F.sum(F.when(F.col("ideal_rnk") <= 5, 1).otherwise(0))
        .over(w_cum)
        .cast("long")
        .alias("cum"),
    )
    terms = walk.filter(F.col("ideal_rnk") <= 5).select(
        "q_id",
        "sys_rnk",
        (F.col("cum").cast("double") / F.col("sys_rnk").cast("double")).alias("term"),
    )
    return terms.groupBy("q_id").agg(
        F.max("sys_rnk").cast("long").alias("last_rel_rank"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("sys_rnk", "term"))),
                F.lit(0.0),
                lambda acc, s_: acc + s_["term"],
            )
            / F.lit(5.0)
        ).alias("ap"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (the KM curve's additive-hazard twin).
# ---------------------------------------------------------------------------


@QS.add(
    "surv_nelson_aalen",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             MAX(ts) AS tend
      FROM events GROUP BY user_id
      HAVING MIN(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
    ),
    conv AS (
      SELECT u.user_id, u.t0, u.tend, MIN(e.ts) AS tp
      FROM per_user u LEFT JOIN events e
        ON e.user_id = u.user_id AND e.event_type = 'purchase'
       AND e.ts >= u.t0
      GROUP BY u.user_id, u.t0, u.tend
    ),
    durations AS (
      SELECT user_id,
             CASE WHEN tp IS NOT NULL
                  THEN (epoch_ms(tp) - epoch_ms(t0)) // 86400000
                  ELSE (epoch_ms(tend) - epoch_ms(t0)) // 86400000
             END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM conv
    ),
    km AS (
      SELECT dur AS t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c,
             CAST(
               (SELECT COUNT(*) FROM durations d2 WHERE d2.dur >= d1.dur)
               AS BIGINT) AS n_risk
      FROM durations d1
      GROUP BY dur
      HAVING SUM(ev) >= 1
    ),
    arr AS (
      SELECT list({'d': d, 'n': n_risk} ORDER BY t) AS a FROM km
    ),
    idx AS (
      SELECT t, d, c, n_risk,
             CAST(ROW_NUMBER() OVER (ORDER BY t) AS INT) AS rn
      FROM km
    )
    SELECT idx.t, idx.d, idx.c, idx.n_risk,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(arr.a[1:idx.rn],
                 x -> CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (x, y) -> x + y) AS cum_hazard,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(arr.a[1:idx.rn],
                 x -> CAST(x.d * (x.n - x.d) AS DOUBLE)
                      / CAST(x.n AS DOUBLE) / CAST(x.n AS DOUBLE)
                      / CAST(x.n AS DOUBLE))),
             (x, y) -> x + y) AS var_hazard
    FROM idx CROSS JOIN arr
    """,
    doc="[EXT] Nelson-Aalen cumulative hazard for view->purchase "
    "conversion — the additive twin of stat_kaplan_meier_conversion "
    "(same durations, censoring convention and risk sets): "
    "H(t) = SUM_{t_i<=t} d_i/n_i, preferred over -log(KM) for small "
    "risk sets and the base quantity of Cox/Aalen modeling. Each "
    "hazard increment is ONE division of exact BIGINTs and the prefix "
    "is the PINNED-ORDER fold (sums pin exactly like KM's products), "
    "so every float hash-matches. The Aalen variance term "
    "d(n-d)/n^3 is three chained divisions — a fixed IEEE tree with "
    "no n^3 BIGINT overflow at any n. Curve table bounded by "
    "|distinct event days|; the per-row prefix fold is quadratic only "
    "in that tiny table.",
    tags=("stats", "temporal"),
)
def surv_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
            F.max("ts").alias("tend"),
        )
        .filter(F.col("t0").isNotNull())
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        per_user.join(
            purch,
            (per_user.user_id == purch.user_id) & (F.col("pts") >= F.col("t0")),
            "left",
        )
        .groupBy(per_user.user_id, "t0", "tend")
        .agg(F.min("pts").alias("tp"))
    )
    durations = conv.select(
        F.when(
            F.col("tp").isNotNull(),
            F.expr("(unix_millis(tp) - unix_millis(t0)) div 86400000"),
        )
        .otherwise(F.expr("(unix_millis(tend) - unix_millis(t0)) div 86400000"))
        .alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    ).coalesce(1).persist()
    by_t = durations.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("c_all"),
    )
    w = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c_all")).over(w).cast("long")
    )
    km = risk.filter(F.col("d") >= 1).select(
        F.col("dur").alias("t"), "d", F.col("c_all").alias("c"), "n_risk"
    )
    arr = km.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n_risk"))).alias("a")
    )
    wrn = Window.orderBy("t")
    idx = km.withColumn("rn", F.row_number().over(wrn))
    return (
        idx.crossJoin(F.broadcast(arr))
        .select(
            "t",
            "d",
            "c",
            "n_risk",
            F.aggregate(
                F.slice(F.col("a"), 1, F.col("rn")),
                F.lit(0.0),
                lambda acc, x: acc
                + x["d"].cast("double") / x["n_risk"].cast("double"),
            ).alias("cum_hazard"),
            F.aggregate(
                F.slice(F.col("a"), 1, F.col("rn")),
                F.lit(0.0),
                lambda acc, x: acc
                + (x["d"] * (x["n_risk"] - x["d"])).cast("double")
                / x["n_risk"].cast("double")
                / x["n_risk"].cast("double")
                / x["n_risk"].cast("double"),
            ).alias("var_hazard"),
        )
    )
