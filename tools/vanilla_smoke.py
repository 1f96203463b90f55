"""Vanilla-session sweep: every registered query under the DRIVER's session.

The driver contract (``__spark_entry__``) runs builders in a plain
``SparkSession.builder.master(...)`` session — none of ``session.py``'s
confs (UTC timezone, NTZ inference, broadcast threshold) exist there
unless a loader sets them at runtime. Round 3 died on exactly this class
of failure: a testdata re-encode surfaced TIMESTAMP_NTZ in the driver's
session and ``unix_millis`` raised. This sweep executes EVERY builder
(count only) at sf0.001 in a deliberately vanilla session and reports
builders that raise.

Usage: python tools/vanilla_smoke.py [sf_dir]   — exit 1 on any failure.
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vanilla-smoke")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clinical_api_etl_spark.plans.registry import all_queries

    failures = 0
    for name, q in all_queries().items():
        try:
            n = q.builder(spark, sf_dir).count()
            print(f"ok    {name}: {n} rows")
        except Exception:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}")
            traceback.print_exc(limit=3)
        finally:
            # Builders persist() branch-shared intermediates and do not
            # unpersist (the registry contract documents this: EVERY
            # long-session runner must clearCache between queries, as
            # check_oracle.py and bench.py do — ADVICE r07).
            spark.catalog.clearCache()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
