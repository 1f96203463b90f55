"""Helpers shared across the ranking package's family modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.sources.catalog import load

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

#: Query set for the retrieval queries: a fixed, deterministic handful of
#: documents. Small-Q is the honest shape — at 100 TB the query side is
#: the broadcast side, the corpus side streams through the posting join.
_N_QUERY_DOCS = 10
_TOP_K = 5


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, c) term-frequency triples, one explode pass."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
