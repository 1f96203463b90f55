"""Vector column expressions over ``array<float>`` embeddings.

All arithmetic is promoted to DOUBLE and folded strictly left-to-right
(``zip_with`` + ``aggregate``), which makes dot products bit-deterministic
— the property the DuckDB oracle comparison relies on — and keeps the hot
path JVM-side (no UDF, no Python round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with sequential left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    return dot(da, db) / (norm(da) * norm(db))
