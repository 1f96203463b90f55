"""Session-scoped shared-artifact memo. [EXT]

Several registry queries derive the same expensive deterministic
artifact: the SCC labeling of the directed interaction graph feeds four
queries (components / condensation / layers / bow-tie), and the ridge
classifier's holdout scores feed three (classifier / ROC / PR). Each
registry entry must stay independently runnable, but a session running
several of them — the correctness gate, the bench suite, a real user
session — should pay the derivation ONCE (VERDICT r10 task 1; ADVICE
r10 item 1). This memo caches eagerly-materialized (localCheckpoint)
DataFrames keyed by (Spark applicationId, artifact key):

- localCheckpoint storage is RDD-level MEMORY_AND_DISK, so the cached
  artifact survives ``spark.catalog.clearCache()`` (which clears only
  the table/DataFrame cache manager) — the artifact behaves like an
  in-session materialized view.
- Keying by applicationId makes entries from a stopped session
  unreachable (appIds never repeat); they are dropped the first time a
  new application touches the memo.
- TIMING HONESTY CONTRACT: ``bench.py`` and ``tools/scale_probe.py``
  call :func:`reset` before every timed attempt, so every published
  per-query number is the standalone cold cost — the memo accelerates
  real sessions and the oracle gate, never the recorded benchmarks.
  (Shared-session increments are reported separately in PERF.md.)

At 100 TB the same pattern holds: a labeling of a trillion-edge graph is
a materialized table (written once, read by every consumer), not a
per-query recomputation; the memo is the single-session analogue.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[str, dict[Any, Any]] = {}


def session_memo(spark, key: Any, build: Callable[[], Any]) -> Any:
    """Return the cached artifact for ``key`` in this Spark application,
    building (and caching) it on first use. ``build`` must return fully
    materialized state (eager localCheckpoints) — the memo stores the
    object as-is and later callers reuse it verbatim."""
    app = spark.sparkContext.applicationId
    for stale in [a for a in _CACHE if a != app]:
        del _CACHE[stale]  # dead application: its checkpoints are gone
    per = _CACHE.setdefault(app, {})
    if key not in per:
        per[key] = build()
    return per[key]


def reset() -> None:
    """Drop every cached artifact (timing-tool contract: called before
    each timed attempt so recorded numbers are standalone cold costs).
    The underlying checkpointed RDDs are left to the session's normal
    cleanup — entries are just forgotten."""
    _CACHE.clear()
