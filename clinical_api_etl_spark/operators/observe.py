"""In-flight data-quality metrics via ``DataFrame.observe``. [EXT]

The reference computes its quality counters as a separate aggregation
pass over staged rows (``etl.py`` quality report); Spark can ALSO attach
named aggregate observations to any DataFrame so the SAME job that writes
a table reports its quality counters — zero extra scans, exactly-once
semantics per action, and identical expressions to the batch quality
query (``sum(when(...))`` counters, SURVEY §2 A3–A5).

Batch: read ``Observation.get`` after the action. Streaming: the same
``observe`` call surfaces per-micro-batch metrics through
``StreamingQueryProgress.observedMetrics`` — the monitoring hook a
100 TB pipeline hangs alerts on, priced at nothing because the counters
ride the write job's existing pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_silver_quality(
    silver: DataFrame, *, name: str = "silver_quality"
) -> tuple[DataFrame, Observation]:
    """Attach the clinical quality counters as observed metrics.

    Returns ``(df, observation)`` — run any action on ``df``, then
    ``observation.get`` yields the counters for exactly the rows that
    action processed.
    """
    obs = Observation(name)
    observed = silver.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value_num").isNull(), 1).otherwise(0)).alias(
            "n_non_numeric"
        ),
        F.sum(F.when(F.col("unit").isNull(), 1).otherwise(0)).alias(
            "n_missing_unit"
        ),
        F.sum(
            F.when(
                F.col("quality_score").isNotNull() & (F.col("quality_score") < 0.8),
                1,
            ).otherwise(0)
        ).alias("n_low_quality"),
    )
    return observed, obs


def observe_stream(df: DataFrame, name: str, *exprs) -> DataFrame:
    """Streaming form: attach named observations to a streaming DataFrame;
    metrics arrive in each ``StreamingQueryProgress.observedMetrics[name]``.
    (Streaming observe takes a name, not an Observation handle.)"""
    return df.observe(name, *exprs)
