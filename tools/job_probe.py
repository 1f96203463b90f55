"""Per-query Spark JOB COUNT probe for the iterative graph family.

Queries that launch dozens of blocking jobs (per-round checkpoints,
isEmpty probes, trim fixpoints) amplify scheduler latency linearly in
job count — the BENCH_r08 contention cohort was exactly this family at
3-11x its floors. This tool makes the job count a measured, regression-
gated quantity.

Usage:
    PYTHONPATH=. python tools/job_probe.py [sf_dir] [query ...]

Prints one JSON line: {"sf_dir": ..., "queries": {name: {"jobs": N,
"sec": S, "rows": R}}}. Job counts include AQE stage-submission jobs
(statusTracker counts them), so they are comparable run-to-run on the
same Spark version, not an absolute "blocking actions" figure.
"""
import json
import sys
import time

DEFAULT_QUERIES = [
    "graph_scc_components",
    "graph_condensation_layers",
    "graph_bowtie_regions",
    "graph_bfs_hops",
    "graph_betweenness_probe",
    "graph_harmonic_centrality",
    "graph_path_counts",
    "graph_weighted_shortest_paths",
    "graph_temporal_reachability",
    "rec_reachability_hops",
]


_ACTIONS = {"n": 0}


def _install_action_counter() -> None:
    """Count BLOCKING driver-side actions (Py4J round-trips the scheduler
    latency amplifies): count/collect/toPandas/isEmpty/first/take and
    EAGER localCheckpoints. AQE stage-submission jobs are excluded — they
    pipeline inside one action without a Python round-trip, and their
    number equals the shuffle count (irreducible without removing
    shuffles)."""
    # Spark 4: pyspark.sql.DataFrame is an ABC facade; instances are the
    # classic implementation class — patch that.
    from pyspark.sql.classic.dataframe import DataFrame

    def wrap(fn_name):
        orig = getattr(DataFrame, fn_name)

        def wrapped(self, *a, **k):
            _ACTIONS["n"] += 1
            return orig(self, *a, **k)

        setattr(DataFrame, fn_name, wrapped)

    for n in ("count", "collect", "toPandas", "isEmpty", "first", "take", "head"):
        wrap(n)
    orig_lc = DataFrame.localCheckpoint

    def lc(self, eager=True, *a, **k):
        # signature-transparent: pass through Spark 4's storageLevel (and
        # any future positional/keyword extras) unchanged (ADVICE r09)
        if eager:
            _ACTIONS["n"] += 1
        return orig_lc(self, eager, *a, **k)

    DataFrame.localCheckpoint = lc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES
    from clinical_api_etl_spark.plans.registry import all_queries
    from clinical_api_etl_spark.session import get_spark

    _install_action_counter()
    spark = get_spark("job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = all_queries()
    out = {}
    for name in names:
        q = qs[name]
        sc.setJobGroup(name, name)
        before_actions = _ACTIONS["n"]
        t0 = time.time()
        rows = q.builder(spark, sf_dir).count()
        dt = time.time() - t0
        actions = _ACTIONS["n"] - before_actions
        jobs = len(sc.statusTracker().getJobIdsForGroup(name))
        spark.catalog.clearCache()
        out[name] = {
            "jobs": jobs,
            "actions": actions,
            "sec": round(dt, 2),
            "rows": rows,
        }
        print(
            f"# {name}: jobs={jobs} actions={actions} {dt:.1f}s rows={rows}",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
