"""Local replica of the driver's correctness gate.

Runs every registered query in Spark AND its DuckDB oracle on the same
parquet tables, then compares: row count, column names, and values
(column-name-sorted, row-order-insensitive, exact equality — floats must be
bit-identical, which the engine's decimal-exact aggregate discipline
guarantees).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

from clinical_api_etl_spark.session import get_spark
from clinical_api_etl_spark.sources.catalog import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: float(v)
                if hasattr(v, "as_tuple")  # decimal.Decimal
                else (str(v) if isinstance(v, (bytes, bytearray)) else v)
            )
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.astype(object).where(~s.isna(), None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        na_a = a is None or (isinstance(a, float) and math.isnan(a))
        na_b = b is None or (isinstance(b, float) and math.isnan(b))
        return na_a == na_b
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a_cols, b_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if a_cols != b_cols:
        return f"columns {a_cols} vs {b_cols}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return f"col {c!r} row {i}: spark={x!r} duck={y!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from clinical_api_etl_spark.plans.registry import all_queries

    spark = get_spark("oracle-check")
    con = _duck(sf_dir)
    failures: list[str] = []
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.builder(spark, sf_dir).toPandas()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            continue
        finally:
            # Operators may persist() internals; keep queries independent.
            spark.catalog.clearCache()
        if q.oracle is None:
            n = len(spark_pdf)
            status = "ok" if n >= 0 else "??"
            print(f"ROWS  {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(q.oracle).fetchdf()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            continue
        diff = compare(spark_pdf, duck_pdf)
        if diff:
            failures.append(name)
            print(f"FAIL  {name}: {diff} [{time.time()-t0:.1f}s]")
        else:
            print(f"PASS  {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
