"""Clinical-reference parity queries expressed over the driver testdata.

The reference's scalar/reshaping semantics (to_decimal, parse_bp, the
blood-pressure 1→2 explosion, normalization) are exercised here on derived
string columns of the TPC-H-ish tables so the DuckDB oracle can check them at
sf0.01. The *actual* clinical pipeline (CSV → bronze → silver → gold on the
reference's own fixture files) lives in
:mod:`clinical_api_etl_spark.operators.clinical` with golden pytest coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.clinical import (
    bp_diastolic,
    bp_is_valid,
    bp_systolic,
    to_decimal_expr,
)
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

# A derived "S/D"-shaped string column over lineitem: mixes valid BP strings,
# out-of-range pairs, and (for l_linenumber % 7 == 0) slash-less numerics —
# reproducing the reference's input domain (etl.py:42-55, fixture
# sample_bad_bp.csv).
_BP_SQL = """
CASE WHEN l_linenumber % 7 = 0 THEN CAST(l_orderkey % 300 AS VARCHAR)
     ELSE CAST(l_orderkey % 300 AS VARCHAR) || '/' || CAST(l_partkey % 250 AS VARCHAR)
END
"""


def _bp_col() -> F.Column:
    return F.when(
        F.col("l_linenumber") % 7 == 0, (F.col("l_orderkey") % 300).cast("string")
    ).otherwise(
        F.concat_ws(
            "/",
            (F.col("l_orderkey") % 300).cast("string"),
            (F.col("l_partkey") % 250).cast("string"),
        )
    )


@QS.add(
    "f2_parse_bp_domain",
    f"""
    WITH v AS (SELECT l_orderkey, l_linenumber, {_BP_SQL} AS bp FROM lineitem)
    SELECT
      CAST(SUM(CASE WHEN sys IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      CAST(SUM(CASE WHEN sys IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
      CAST(SUM(sys) AS BIGINT) AS sum_sys,
      CAST(SUM(dia) AS BIGINT) AS sum_dia
    FROM (
      SELECT CASE WHEN len(string_split(bp, '/')) = 2
                   AND TRY_CAST(trim(string_split(bp, '/')[1]) AS INTEGER) BETWEEN 50 AND 250
                   AND TRY_CAST(trim(string_split(bp, '/')[2]) AS INTEGER) BETWEEN 30 AND 200
                  THEN TRY_CAST(trim(string_split(bp, '/')[1]) AS INTEGER) END AS sys,
             CASE WHEN len(string_split(bp, '/')) = 2
                   AND TRY_CAST(trim(string_split(bp, '/')[1]) AS INTEGER) BETWEEN 50 AND 250
                   AND TRY_CAST(trim(string_split(bp, '/')[2]) AS INTEGER) BETWEEN 30 AND 200
                  THEN TRY_CAST(trim(string_split(bp, '/')[2]) AS INTEGER) END AS dia
      FROM v
    ) p
    """,
    doc="F2 parse_bp as pure column expressions (split + try_cast + range "
    "check, no UDF) — semantics of reference etl.py:42-55 including the "
    "both-or-neither validity rule.",
    tags=("functions", "F2"),
)
def f2_parse_bp_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(_bp_col().alias("bp"))
    valid = bp_is_valid(F.col("bp"))
    sys = F.when(valid, bp_systolic(F.col("bp")))
    dia = F.when(valid, bp_diastolic(F.col("bp")))
    return li.select(sys.alias("sys"), dia.alias("dia")).agg(
        F.sum(F.when(F.col("sys").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum(F.when(F.col("sys").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_invalid"),
        F.sum("sys").cast("long").alias("sum_sys"),
        F.sum("dia").cast("long").alias("sum_dia"),
    )


@QS.add(
    "r1_bp_explode_rows",
    f"""
    WITH v AS (
      SELECT l_orderkey, l_linenumber, {_BP_SQL} AS bp FROM lineitem
      WHERE l_orderkey % 100 = 0
    ),
    p AS (
      SELECT l_orderkey, l_linenumber, bp,
             TRY_CAST(trim(string_split(bp, '/')[1]) AS INTEGER) AS s1,
             TRY_CAST(trim(string_split(bp, '/')[2]) AS INTEGER) AS s2,
             len(string_split(bp, '/')) AS np
      FROM v
    ),
    valid AS (
      SELECT * FROM p
      WHERE np = 2 AND s1 BETWEEN 50 AND 250 AND s2 BETWEEN 30 AND 200
    )
    SELECT l_orderkey, l_linenumber, 'systolic' AS component,
           CAST(s1 AS DOUBLE) AS reading, 'mmHg' AS unit FROM valid
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'diastolic' AS component,
           CAST(s2 AS DOUBLE) AS reading, 'mmHg' AS unit FROM valid
    """,
    doc="R1: the 1→2 blood-pressure row explosion (etl.py:120-135) as "
    "array(struct)+explode — each valid 'S/D' row yields a systolic and a "
    "diastolic observation with unit forced to mmHg (F12).",
    tags=("reshape", "R1", "F12"),
)
def r1_bp_explode_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", _bp_col().alias("bp"))
    )
    valid = li.filter(bp_is_valid(F.col("bp")))
    pair = F.array(
        F.struct(
            F.lit("systolic").alias("component"),
            bp_systolic(F.col("bp")).cast("double").alias("reading"),
        ),
        F.struct(
            F.lit("diastolic").alias("component"),
            bp_diastolic(F.col("bp")).cast("double").alias("reading"),
        ),
    )
    return valid.select(
        "l_orderkey", "l_linenumber", F.explode(pair).alias("obs")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("obs.component").alias("component"),
        F.col("obs.reading").alias("reading"),
        F.lit("mmHg").alias("unit"),
    )


@QS.add(
    "f1_to_decimal_try_cast",
    """
    WITH v AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 5 = 0 THEN '  ' || CAST(p_size AS VARCHAR) || '.25 '
                  WHEN p_partkey % 5 = 1 THEN ''
                  WHEN p_partkey % 5 = 2 THEN p_name
                  ELSE CAST(p_size AS VARCHAR) END AS raw
      FROM part
    )
    SELECT CAST(COUNT(num) AS BIGINT) AS n_numeric,
           CAST(SUM(CASE WHEN num IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(num) AS DOUBLE) AS total
    FROM (SELECT TRY_CAST(NULLIF(trim(raw), '') AS DECIMAL(14,4)) AS num FROM v) t
    """,
    doc="F1 to_decimal: strip → ''/None → NULL → try_cast decimal(14,4) "
    "(reference etl.py:31-40; identical null-on-failure semantics).",
    tags=("functions", "F1"),
)
def f1_to_decimal_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    raw = (
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.concat(F.lit("  "), F.col("p_size").cast("string"), F.lit(".25 ")),
        )
        .when(F.col("p_partkey") % 5 == 1, F.lit(""))
        .when(F.col("p_partkey") % 5 == 2, F.col("p_name"))
        .otherwise(F.col("p_size").cast("string"))
    )
    num = to_decimal_expr(raw)
    return part.select(num.alias("num")).agg(
        F.count("num").cast("long").alias("n_numeric"),
        F.sum(F.when(F.col("num").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.sum("num").cast("double").alias("total"),
    )


@QS.add(
    "r4_normalize_sentinels",
    """
    WITH v AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 4 = 0 THEN '  ' || c_mktsegment || ' '
                  WHEN c_custkey % 4 = 1 THEN ''
                  WHEN c_custkey % 4 = 2 THEN 'null'
                  ELSE c_mktsegment END AS raw
      FROM customer
    )
    SELECT COALESCE(CASE WHEN trim(raw) IN ('', 'null') THEN NULL
                         ELSE trim(raw) END, '<missing>') AS segment,
           COUNT(*) AS cnt
    FROM v GROUP BY 1
    """,
    doc="R4/F3/F4: trim + blank/'null'-sentinel → NULL normalization "
    "(reference etl.py:67,90-93,115-116) + COALESCE defaulting.",
    tags=("functions", "R4", "F3", "F4"),
)
def r4_normalize_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    raw = (
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" ")),
        )
        .when(F.col("c_custkey") % 4 == 1, F.lit(""))
        .when(F.col("c_custkey") % 4 == 2, F.lit("null"))
        .otherwise(F.col("c_mktsegment"))
    )
    trimmed = F.trim(raw)
    normalized = F.when(trimmed.isin("", "null"), F.lit(None)).otherwise(trimmed)
    return (
        cust.select(F.coalesce(normalized, F.lit("<missing>")).alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
