"""Theil-Sen robust trend estimation — grouped-map Arrow kernel. [EXT]

The per-entity model-fitting pattern: ``groupBy(key).applyInPandas`` hands
each group to a numpy kernel (here: median of pairwise slopes — the classic
outlier-robust regressor, up to 29% contamination breakdown). This is the
repo's canonical PLAIN grouped-map example (``applyInPandasWithState``
covers the stateful variant in streaming/windows.py); genuinely imperative
per-group math — O(n²) pairwise slopes + medians — that no fixed SQL shape
expresses efficiently.

Determinism + portability: each group is capped to a deterministic sample
(lowest ``cap`` rows by md5(event_id) — the kmeans sample-train convention),
slopes are float64 divisions of exact integers, and medians interpolate the
two middles — all correctly-rounded IEEE, so a DuckDB pairwise-join twin
reproduces the floats bit-for-bit and the operator is FULL value-hash-gated
despite being an Arrow kernel.

Scale: one shuffle on the group key; kernel cost O(cap²) per group
regardless of group size (the cap is the contract — Theil-Sen on billions
of rows per key is done on samples everywhere, cf. sklearn's n_subsamples).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator  # noqa: F401  (signature parity with peers)

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TREND_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_sampled", T.LongType(), False),
        T.StructField("slope_cents_per_day", T.DoubleType(), True),
        T.StructField("intercept_cents", T.DoubleType(), True),
    ]
)


def theil_sen_trend(df: DataFrame, *, cap: int = 1500) -> DataFrame:
    """Per event_type: robust slope/intercept of exact cents vs day index.

    Input columns: event_type, event_id, x (day index, long), y (cents,
    long). Output one row per group.
    """
    import numpy as np

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(
            _h=[hashlib.md5(str(e).encode()).hexdigest() for e in pdf["event_id"]]
        ).sort_values(["_h", "event_id"])
        s = pdf.head(cap)
        x = s["x"].to_numpy(dtype=np.int64)
        y = s["y"].to_numpy(dtype=np.int64)
        n = len(s)
        i, j = np.triu_indices(n, k=1)
        dx = x[j] - x[i]
        mask = dx != 0
        slope = float("nan")
        intercept = float("nan")
        if mask.any():
            slopes = (y[j] - y[i])[mask].astype(np.float64) / dx[mask].astype(
                np.float64
            )
            slope = float(np.median(slopes))
            intercept = float(
                np.median(y.astype(np.float64) - slope * x.astype(np.float64))
            )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_sampled": [n],
                "slope_cents_per_day": [slope],
                "intercept_cents": [intercept],
            }
        )

    return df.groupBy("event_type").applyInPandas(fit, schema=TREND_SCHEMA)
