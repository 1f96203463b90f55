"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`clinical_api_etl_spark`; this module only
adapts the engine's query registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q1-style pricing summary — the
    engine's headline grouped roll-up (SURVEY §2 A1) with decimal-exact
    money arithmetic."""
    from clinical_api_etl_spark.plans.relational import tpch_q1_pricing_summary

    return tpch_q1_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clinical_api_etl_spark.plans.registry import all_queries

    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from clinical_api_etl_spark.plans.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
