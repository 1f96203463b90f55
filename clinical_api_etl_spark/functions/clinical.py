"""Clinical scalar functions as pure column expressions (zero UDFs).

Re-expresses the reference's Python scalar helpers
(`etl-service/src/etl.py:31-55`) as Catalyst column expressions so they run
JVM-side inside whole-stage codegen — the reference applies them row-at-a-time
in Python loops (`etl.py:109-150`), which is exactly the anti-pattern this
engine leaves behind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Silver-layer numeric carrier — NUMERIC(14,4) in the reference DDL
#: (database/05_processed_measurements.sql:10).
VALUE_DECIMAL = "decimal(14,4)"

#: Types for which a blank unit raises quality rule 1 (etl.py:17).
REQ_UNIT = ("glucose", "cholesterol", "weight", "height", "blood_pressure")

#: Per-type numeric validity ranges for quality rule 3 (etl.py:18-26).
#: blood_pressure_1/_2 never match a bronze measurement_type (they are the
#: *component* bounds used inside parse_bp) — kept verbatim for quirk parity
#: (SURVEY §2.9.5).
RANGES = {
    "glucose": (40.0, 400.0),
    "cholesterol": (50.0, 400.0),
    "weight": (1.0, 400.0),
    "height": (30.0, 300.0),
    "heart_rate": (20.0, 240.0),
    "blood_pressure_1": (50.0, 250.0),
    "blood_pressure_2": (30.0, 200.0),
}


def to_decimal_expr(c: Column, target: str = VALUE_DECIMAL) -> Column:
    """``to_decimal`` (etl.py:31-40): strip; ``''``/NULL → NULL; parse
    failure → NULL (try_cast mirrors ``InvalidOperation`` → None)."""
    trimmed = F.trim(c)
    return F.nullif(trimmed, F.lit("")).try_cast(target)


def _int_part(c: Column, idx: int) -> Column:
    """Strict-integer parse of slash-part ``idx`` (1-based), matching
    Python ``int(part.strip())``: whitespace tolerated, sign allowed,
    anything else (decimals included) → NULL."""
    part = F.trim(F.get(F.split(c, "/", -1), idx - 1))
    ok = part.rlike(r"^[+-]?[0-9]+$")
    return F.when(ok, part.try_cast("int"))


def bp_parts_count(c: Column) -> Column:
    return F.size(F.split(c, "/", -1))


def bp_is_valid(c: Column) -> Column:
    """``parse_bp`` validity (etl.py:42-55): exactly two slash-separated
    integer parts with 50<=sys<=250 and 30<=dia<=200; both-or-neither."""
    sys_raw, dia_raw = _int_part(c, 1), _int_part(c, 2)
    return (
        c.isNotNull()
        & (c != "")
        & (bp_parts_count(c) == 2)
        & sys_raw.between(50, 250)
        & dia_raw.between(30, 200)
    )


def bp_systolic(c: Column) -> Column:
    """Systolic component, NULL unless the whole reading is valid."""
    return F.when(bp_is_valid(c), _int_part(c, 1))


def bp_diastolic(c: Column) -> Column:
    return F.when(bp_is_valid(c), _int_part(c, 2))


def normalize_blank(c: Column) -> Column:
    """Unit normalization (etl.py:67,90): trim, ``''`` → NULL."""
    return F.nullif(F.trim(c), F.lit(""))


def normalize_quality_score(c: Column) -> Column:
    """quality_score normalization (etl.py:93,116): ``''``/``'null'`` → NULL
    else float — carried as DECIMAL(3,2) per DDL
    (database/02_staging_clinical_trials.sql:13)."""
    return F.when(c.isin("", "null") | c.isNull(), F.lit(None)).otherwise(
        c.try_cast("double")
    )
