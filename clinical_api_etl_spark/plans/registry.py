"""Aggregated query registry.

Collects every :class:`~clinical_api_etl_spark.plans.base.Query` declared by
the plans submodules into one ordered dict consumed by ``__spark_entry__.py``
(driver contract), ``bench.py`` (headline queries), and the differential
tests.

Runner contract (ADVICE r07): builders may ``persist()`` intermediates
that feed ≥2 branches of their own plan and do NOT unpersist — the
returned DataFrame still references the cached table, so an in-builder
unpersist would defeat the sharing. Any runner executing MANY queries in
one session must therefore ``spark.catalog.clearCache()`` between queries
(check_oracle.py, bench.py, and vanilla_smoke.py all do) or cached
intermediates accumulate for the session's lifetime.
"""

from __future__ import annotations

from clinical_api_etl_spark.plans.base import Query


def all_queries() -> dict[str, Query]:
    # Imports are local so a syntax error in one family surfaces at call
    # time with a clean traceback, and to avoid import cycles.
    from clinical_api_etl_spark.plans import (
        analytics,
        clinical_parity,
        extensions,
        inference,
        mining,
        mlmodels,
        mlprep,
        modeling,
        ranking,
        recursive,
        relational,
        sketches,
        tpch_deep,
    )

    merged: dict[str, Query] = {}
    for mod in (
        relational,
        tpch_deep,
        clinical_parity,
        extensions,
        analytics,
        mlprep,
        mining,
        inference,
        ranking,
        modeling,
        mlmodels,
        sketches,
        recursive,
    ):
        for name, q in mod.QS.queries.items():
            if name in merged:
                raise ValueError(f"duplicate query {name!r} across plan modules")
            merged[name] = q
    # Oracle-gated queries first (stable within each group): external
    # samplers that take a prefix of the registry in iteration order see
    # only hash-checkable queries; the rows-only diagnostics (raw sketch
    # outputs, recall-gated approximate families) sit at the end, each
    # covered by a hash-gated twin registered above it.
    ordered = {n: q for n, q in merged.items() if q.oracle is not None}
    ordered.update({n: q for n, q in merged.items() if q.oracle is None})
    return ordered


def headline_queries() -> dict[str, Query]:
    return {n: q for n, q in all_queries().items() if q.headline}
