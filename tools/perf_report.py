"""Render PERF.md: latest bench timings joined with shuffle-audit metrics.

One table per headline query: best-of-2 wall-time (bench_history.jsonl's
last entry) alongside measured input/shuffle/spill volume
(shuffle_audit.json) — the round's performance evidence in one place.

Usage: python tools/perf_report.py   (pure file transform, no Spark)
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(ROOT, "bench_history.jsonl")) as f:
        bench = json.loads(f.readlines()[-1].strip())
    try:
        with open(os.path.join(ROOT, "shuffle_audit.json")) as f:
            shuffle = json.load(f)["queries"]
    except FileNotFoundError:
        shuffle = {}

    lines = [
        "# PERF — headline queries at sf0.1 (local[32])",
        "",
        f"Bench run: {bench.get('ts', '?')} — total {bench['value']}s over "
        f"{len(bench['queries'])} queries (per-query best-of-2; see bench.py "
        "for methodology). Shuffle columns from tools/shuffle_audit.py "
        "(Spark UI REST stage metrics; single-run).",
        "",
        "| query | sec | input MB | shuffle r/w MB | spill MB | tasks |",
        "|---|---:|---:|---:|---:|---:|",
    ]
    for name, sec in sorted(bench["queries"].items(), key=lambda kv: -kv[1]):
        m = shuffle.get(name)
        if m:
            lines.append(
                f"| {name} | {sec:.2f} | {m['input_mb']:.1f} | "
                f"{m['shuffle_read_mb']:.1f}/{m['shuffle_write_mb']:.1f} | "
                f"{m['spill_mb']:.1f} | {m['tasks']} |"
            )
        else:
            lines.append(f"| {name} | {sec:.2f} | — | — | — | — |")
    lines += [
        "",
        "Zero spill across the set; shuffle volume tracks operator "
        "semantics (fact-fact self-joins and multi-distinct profiling "
        "highest; map-side-combined aggregations near zero). Model-building "
        "queries (ivfpq, semantic dedup, ivf) are fixed-overhead-bound at "
        "this scale — their cost is sample-train + a constant number of "
        "distributed passes, the posture that amortizes at 100 TB.",
        "",
    ]

    try:
        with open(os.path.join(ROOT, "scale_probe.json")) as f:
            probe = json.load(f)
    except FileNotFoundError:
        probe = None
    if probe:
        factor = probe["factor"]
        lines += [
            f"## Scaling check: sf0.1 vs synthetic {factor}x "
            "(tools/scale_probe.py)",
            "",
            f"Wall-time ratio at {factor}x the data (disjoint id ranges, "
            "regenerated keys, perturbed documents). Ratio << data ratio "
            "= fixed overheads still dominate (headroom on 32 cores); "
            "ratio tracking OUTPUT growth (dedup: planted variant cliques "
            "multiply true pairs) is output-bound, not super-linear.",
            "",
            "| query | sf0.1 s | x%d s | time ratio | rows sf0.1 | rows x%d |"
            % (factor, factor),
            "|---|---:|---:|---:|---:|---:|",
        ]
        key = f"x{factor}"
        for name, v in sorted(
            probe["queries"].items(), key=lambda kv: -kv[1]["time_ratio"]
        ):
            lines.append(
                f"| {name} | {v['base']['sec']:.2f} | {v[key]['sec']:.2f} | "
                f"x{v['time_ratio']} | {v['base']['rows']} | {v[key]['rows']} |"
            )
        lines.append("")
    out = os.path.join(ROOT, "PERF.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys_exit = main()
    raise SystemExit(sys_exit)
