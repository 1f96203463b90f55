"""Constants and helpers shared across the inference family modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load


_HOUR_MS = 3600000


_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents() -> F.Column:
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")


_EDF_SRC = f"""
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    """


_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


_DAY_MS_I = 86400000

_DAY_MS = 86_400_000
