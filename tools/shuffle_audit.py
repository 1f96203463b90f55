"""Per-query shuffle/input/spill metrics — measured, not guessed.

Runs every headline query at ``sf_dir`` with a per-query job group, then
reads the Spark UI REST API (enabled just for this tool) and attributes
each job's stages to its query. The output is the evidence behind the
repo's shuffle-efficiency claims: input bytes actually scanned (pushdown
+ pruning), shuffle read/write volume (the scale-out cost driver), spill,
and task counts per query.

Usage: python tools/shuffle_audit.py [sf_dir]
Writes ``shuffle_audit.json`` next to this file's parent (repo root) and
prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from clinical_api_etl_spark.plans.registry import headline_queries
    from clinical_api_etl_spark.session import get_spark

    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # The default retention (1000 jobs/stages) evicts early
            # queries' stages once the headline set passed ~50 queries —
            # the audit then silently under-reports (34 of 81 captured).
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    for name, q in headline_queries().items():
        sc.setJobGroup(name, name)
        try:
            q.builder(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
    sc.setJobGroup("", "")

    jobs = _get(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
    stages = {
        (s["stageId"], s["attemptId"]): s
        for s in _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    }
    per_query: dict[str, dict[str, float]] = {}
    seen_stages: dict[str, set[int]] = {}
    for job in jobs:
        group = job.get("jobGroup")
        if not group:
            continue
        acc = per_query.setdefault(
            group,
            {
                "input_mb": 0.0,
                "shuffle_read_mb": 0.0,
                "shuffle_write_mb": 0.0,
                "spill_mb": 0.0,
                "tasks": 0,
            },
        )
        seen = seen_stages.setdefault(group, set())
        for sid in job.get("stageIds", []):
            if sid in seen:  # stages shared across jobs (reused exchanges)
                continue
            seen.add(sid)
            s = stages.get((sid, 0))
            if s is None:
                continue
            acc["input_mb"] += s.get("inputBytes", 0) / 1e6
            acc["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
            acc["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
            acc["spill_mb"] += (
                s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            ) / 1e6
            acc["tasks"] += s.get("numTasks", 0)

    print(
        f"{'query':34s} {'input_mb':>9s} {'shuf_rd':>8s} {'shuf_wr':>8s} "
        f"{'spill':>6s} {'tasks':>6s}"
    )
    for name in headline_queries():
        m = per_query.get(name)
        if not m:
            continue
        print(
            f"{name:34s} {m['input_mb']:9.1f} {m['shuffle_read_mb']:8.1f} "
            f"{m['shuffle_write_mb']:8.1f} {m['spill_mb']:6.1f} {m['tasks']:6d}"
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shuffle_audit.json",
    )
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": per_query}, f, indent=1)
    print(f"\nwrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
