"""Text-analysis operators over a documents table. [EXT]

Language-ID, quality scoring, token statistics, canonical fingerprinting —
thin DataFrame wrappers over the expression library in
``functions/text.py``. One projection + one aggregate each; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import (
    distinct_token_count,
    fingerprint,
    predict_lang,
    quality_score,
    stopword_ratio,
    token_count,
)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document predicted language + stopword density."""
    return df.withColumn("predicted_lang", predict_lang(F.col(text_col))).withColumn(
        "stop_ratio", stopword_ratio(F.col(text_col))
    )


def score_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("quality", quality_score(F.col(text_col)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        token_count(F.col(text_col)).alias("n_tokens"),
        distinct_token_count(F.col(text_col)).alias("n_distinct_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
