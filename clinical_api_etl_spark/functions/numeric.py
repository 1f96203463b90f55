"""Oracle-deterministic numeric helpers.

Floating-point SUM is order-dependent, and Spark's partial aggregation order
is nondeterministic across partitions — so a naive ``sum(double)`` can never
hash-match a single-threaded DuckDB oracle bit-for-bit. The driver's
testdata stores all money-like doubles with exactly 2 decimal digits, so the
engine's contract is:

1. cast measure columns to DECIMAL before any sum/product (lossless for
   2-decimal data; decimal arithmetic is exact and associative, so shuffle
   order cannot change the result),
2. keep products inside DECIMAL(38,_) by bounding intermediate precision,
3. cast the final aggregate to DOUBLE (same IEEE value in any engine).

This also mirrors the reference's own decimal discipline: it runs all
measurement arithmetic through ``decimal.Decimal`` to avoid float drift
(reference ``etl-service/src/etl.py:1,31-40``).

At scale this costs nothing extra: decimal sums still do partial (map-side)
aggregation; only the final cast differs from the double path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Lossless carrier for the testdata's 2-decimal money doubles.
MONEY = "decimal(18,2)"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: str | Column) -> Column:
    """Exact decimal view of a 2-decimal double column."""
    return _col(c).cast(MONEY)


def dsum(c: str | Column, alias: str) -> Column:
    """Order-independent SUM of a money column, surfaced as DOUBLE."""
    return F.sum(money(c)).cast("double").alias(alias)


def davg(c: str | Column, alias: str) -> Column:
    """AVG as exact-decimal sum / count, divided in DOUBLE.

    Spark's decimal division and DuckDB's produce different result scales;
    dividing two identical doubles is IEEE-deterministic in both.
    """
    col = _col(c)
    return (F.sum(money(col)).cast("double") / F.count(col).cast("double")).alias(alias)


def lsum(c: str | Column, alias: str) -> Column:
    """SUM of an integral column as BIGINT (DuckDB widens int sums to
    HUGEINT; pin both engines to int64)."""
    return F.sum(_col(c)).cast("long").alias(alias)
