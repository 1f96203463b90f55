"""Clinical CSV source (SURVEY §2 S1-S4).

Reproduces the reference's validated-on-read contract
(`etl-service/src/etl.py:57-70`):

* all columns read as strings, never inferred (`dtype=str`),
* empty CSV fields are empty *strings*, not NULLs (`keep_default_na=False`)
  — Spark's CSV reader yields NULL for empty fields, so we coalesce back,
* hard failure if any required column is missing,
* hard failure if any ``study_id`` is blank after trim,
* optional ``quality_score`` column added as ``""`` when absent,
* ``unit`` trimmed on read.

Scale: schema is fixed (8 string fields) so the scan never pays inference;
the two validation guards are cheap short-circuit actions (``limit(1)``)
that run before any downstream work is scheduled.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CSV_COLUMNS = (
    "study_id",
    "participant_id",
    "measurement_type",
    "value",
    "unit",
    "timestamp",
    "site_id",
    "quality_score",
)

#: Required-column set (reference etl.py:29).
REQUIRED = frozenset(CSV_COLUMNS) - {"quality_score"}


class ClinicalCsvError(ValueError):
    """Schema/content validation failure — the whole job fails (S2/S3)."""


def validate_path(path: str, root: str | None = None) -> Path:
    """S4: resolve and confine the input path (reference main.py:30-34's
    path-traversal guard, generalized to a configurable root)."""
    p = Path(path).resolve()
    if root is not None:
        rootp = Path(root).resolve()
        if not p.is_relative_to(rootp):
            raise ClinicalCsvError(f"path {path!r} escapes data root {root!r}")
    if not p.is_file():
        raise ClinicalCsvError(f"no such file: {path!r}")
    return p


def read_clinical_csv(spark: SparkSession, path: str, *, root: str | None = None) -> DataFrame:
    """S1-S3: all-string CSV read with required-column and blank-key guards."""
    validate_path(path, root)
    df = spark.read.option("header", True).csv(path)  # header=True, no inference: all strings

    missing = sorted(REQUIRED - set(df.columns))
    if missing:
        raise ClinicalCsvError(f"missing columns: {missing}")

    if "quality_score" not in df.columns:
        df = df.withColumn("quality_score", F.lit(""))

    # pandas keep_default_na=False parity: empty field == empty string.
    df = df.select([F.coalesce(F.col(c), F.lit("")).alias(c) for c in CSV_COLUMNS])
    df = df.withColumn("unit", F.trim("unit"))

    if df.filter(F.trim("study_id") == "").limit(1).count() > 0:
        raise ClinicalCsvError("study_id is required for all rows and cannot be blank")
    return df
