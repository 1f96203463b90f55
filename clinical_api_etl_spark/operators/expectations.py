"""Declarative data-quality expectations — one-pass validate + quarantine.

Generalizes the reference's three hardcoded quality rules
(``etl.py:163-194``: missing unit, malformed BP, out-of-range) into a
rule VOCABULARY (Great-Expectations / Delta-constraints-lite): callers
declare per-column expectations; the engine compiles them to flag
columns and evaluates everything in ONE scan — violation counts come
from a single ``sum(when(...))`` aggregate (the A3-A5 pattern), and the
pass/quarantine split reuses the same flags, so a full validate +
split costs two passes total (or one with ``df.observe``).

Rules are plain column-expression builders — zero UDFs, so every rule
is codegen'd, pushdown-friendly, and ORACLE-EXPRESSIBLE (the registry
query hash-checks the whole vocabulary against DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named rule: ``flag(df_col) -> Column<bool>`` is TRUE on violation."""

    name: str
    column: str
    flag: Callable[[Column], Column]


def not_null(column: str) -> Expectation:
    return Expectation(f"{column}__not_null", column, lambda c: c.isNull())


def non_blank(column: str) -> Expectation:
    return Expectation(
        f"{column}__non_blank", column, lambda c: c.isNull() | (F.trim(c) == "")
    )


def in_range(column: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        f"{column}__in_range",
        column,
        lambda c: c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def in_set(column: str, allowed: list) -> Expectation:
    return Expectation(
        f"{column}__in_set",
        column,
        lambda c: c.isNotNull() & ~c.isin(*allowed),
    )


def matches(column: str, pattern: str) -> Expectation:
    return Expectation(
        f"{column}__matches",
        column,
        lambda c: c.isNotNull() & ~c.rlike(pattern),
    )


def _flags(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    out = df
    for r in rules:
        out = out.withColumn(f"__viol_{r.name}", r.flag(F.col(r.column)))
    return out


def violation_counts(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """(rule, n_violations, n_rows) — ONE aggregate over one scan."""
    flagged = _flags(df, rules)
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        F.sum(F.when(F.col(f"__viol_{r.name}"), 1).otherwise(0))
        .cast("long")
        .alias(r.name)
        for r in rules
    ]
    wide = flagged.agg(*aggs)
    stack = ", ".join(f"'{r.name}', {r.name}" for r in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        "n_rows",
    )


def quarantine_split(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): a row quarantines if ANY rule flags it. The
    same flag expressions drive both outputs, so semantics can't drift
    from :func:`violation_counts`."""
    flagged = _flags(df, rules)
    any_viol = None
    for r in rules:
        c = F.col(f"__viol_{r.name}")
        any_viol = c if any_viol is None else (any_viol | c)
    drop = [f"__viol_{r.name}" for r in rules]
    clean = flagged.filter(~F.coalesce(any_viol, F.lit(False))).drop(*drop)
    bad = flagged.filter(F.coalesce(any_viol, F.lit(False))).drop(*drop)
    return clean, bad
