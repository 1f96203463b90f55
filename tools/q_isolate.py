"""Isolated per-query timing + plan capture (optimization-round tooling).

Usage::

    PYTHONPATH=. python tools/q_isolate.py [--explain plans/r11/before] \
        [--runs N] [--sf DIR] [--noop] <query> [<query> ...]

For each named registry query: reset the session memo, clear the cache,
build + ``count()`` (the bench methodology) ``--runs`` times (default 2)
and print each attempt plus the min. With ``--explain plans/r11/before``
the ``.explain("formatted")`` text is written to
``plans/r11/<query>_before.txt`` (captured once before the timing runs,
so plan capture cost never pollutes the timings).

Timing is bench-identical (count on a fresh builder) so numbers are
comparable to bench_history.jsonl; ``--noop`` times the noop sink instead
(guide §1.4 — computes every column; NOT comparable to bench history).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    explain_prefix = None
    runs = 2
    sf_dir = "/root/testdata/sf0.1"
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--explain":
            explain_prefix = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    from clinical_api_etl_spark.functions import memo
    from clinical_api_etl_spark.plans.registry import all_queries
    from clinical_api_etl_spark.session import get_spark

    reg = all_queries()
    spark = get_spark("q_isolate")
    sc = spark.sparkContext
    # warm-up (bench parity)
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in names:
        q = reg[name]
        if explain_prefix:
            memo.reset()
            spark.catalog.clearCache()
            df = q.builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            d = os.path.dirname(explain_prefix) or "."
            os.makedirs(d, exist_ok=True)
            path = f"{d}/{name}_{os.path.basename(explain_prefix)}.txt"
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"# wrote {path}", file=sys.stderr)
        best = None
        for r in range(runs):
            memo.reset()
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name} attempt {r}")
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count() if "limit" not in name else len(df.collect())
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            best = dt if best is None else min(best, dt)
            print(f"{name} run{r}: {dt:.3f}s ({n} rows)")
        print(f"{name} BEST: {best:.3f}s")


if __name__ == "__main__":
    main()
