"""Evidence the output-bound scaling law for the pair-generating operators.

``scale_probe.json`` showed ``fuzzy_name_matches`` at 8.56x and
``dedup_ngram_jaccard`` at 5.83x wall-clock for 10x data — above the data
ratio. VERDICT r04 task 7: show this is the OUTPUT growing (the synthetic
corpus multiplies true near-dup pairs super-linearly — every copy of a
document is a near-dup of its other copies), not the algorithm going
super-linear. The falsifiable form: wall-clock should track CANDIDATE
count (each operator's unit of work — one signature/prefix bucket
co-occurrence each), i.e. seconds-per-million-candidates should stay
~flat across factors while time/data ratios explode.

For factors 1, 3, 10 this probe synthesizes the scaled corpus (same
recipe as tools/scale_probe.py), then records for each operator: rows in,
candidate pairs (via the operators' exposed *_candidates stages), true
pairs out, best-of-2 wall-clock, and the derived per-candidate cost.
Writes output_bound_probe.json; the table is summarized in PERF.md.

Usage: python tools/output_bound_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FACTORS = [1, 3, 10]


def synthesize_subset(spark, factor: int, dest: str) -> None:
    """customer + documents only (the two operators' inputs), same
    disjoint-id/perturbed-content recipe as scale_probe.synthesize."""
    from pyspark.sql import functions as F

    from clinical_api_etl_spark.sources.catalog import load

    os.makedirs(dest, exist_ok=True)
    cust = load(spark, BASE, "customer")
    n_c = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    ccopies = []
    for k in range(factor):
        key = F.col("c_custkey") + k * n_c
        ccopies.append(
            cust.select(
                key.alias("c_custkey"),
                F.concat(
                    F.lit("Customer#"), F.lpad(key.cast("string"), 9, "0")
                ).alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    out = ccopies[0]
    for c in ccopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/customer.parquet")

    docs = load(spark, BASE, "documents")
    n_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dcopies = []
    for k in range(factor):
        dcopies.append(
            docs.select(
                (F.col("doc_id") + k * n_d).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" variant{k}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" variant{k}"))).alias("n_chars"),
            )
        )
    out = dcopies[0]
    for c in dcopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/documents.parquet")


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "output_bound_probe.json",
        )
    )
    from clinical_api_etl_spark.operators.dedup import (
        ngram_jaccard_candidates,
        ngram_jaccard_pairs,
    )
    from clinical_api_etl_spark.operators.fuzzy import (
        edit_distance_candidates,
        edit_distance_self_join,
    )
    from clinical_api_etl_spark.session import get_spark
    from clinical_api_etl_spark.sources.catalog import load

    spark = get_spark("output-bound-probe")

    def probe_factor(factor: int) -> dict:
        dest = tempfile.mkdtemp(prefix=f"obp_x{factor}_")
        try:
            synthesize_subset(spark, factor, dest)
            res = {}
            cust = load(spark, dest, "customer").select("c_custkey", "c_name")
            docs = load(spark, dest, "documents")
            for name, rows_in, cand_df, full_df in (
                (
                    "fuzzy_name_matches",
                    cust.count(),
                    edit_distance_candidates(cust, "c_custkey", "c_name", 1),
                    edit_distance_self_join(cust, "c_custkey", "c_name", 1),
                ),
                (
                    "dedup_ngram_jaccard",
                    docs.count(),
                    ngram_jaccard_candidates(
                        docs, "doc_id", "text", n=3, threshold=0.8
                    ),
                    ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8),
                ),
            ):
                candidates = cand_df.count()
                best, true_pairs = None, None
                for _ in range(2):
                    t0 = time.time()
                    true_pairs = full_df.count()
                    dt = time.time() - t0
                    spark.catalog.clearCache()
                    best = dt if best is None else min(best, dt)
                res[name] = {
                    "rows_in": rows_in,
                    "candidates": candidates,
                    "true_pairs": true_pairs,
                    "sec": round(best, 3),
                    "us_per_candidate": round(1e6 * best / max(candidates, 1), 2),
                }
                print(f"# x{factor} {name}: {json.dumps(res[name])}", file=sys.stderr)
            return res
        finally:
            shutil.rmtree(dest, ignore_errors=True)

    payload = {"base": BASE, "factors": {}}
    for f in FACTORS:
        payload["factors"][str(f)] = probe_factor(f)
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    print(json.dumps({"wrote": out_path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
