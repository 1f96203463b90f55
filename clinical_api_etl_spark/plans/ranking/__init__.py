"""Ranking package — the former 5,100-line plans/ranking.py split along
its four families (VERDICT r07 task 8): retrieval, graphrank, evals,
stats. Mechanical split, zero behavior change: the merged ``QS`` below is
what the registry consumes, and every top-level name of every family
module (builders AND private helpers the tests import) is re-exported
here so ``from clinical_api_etl_spark.plans.ranking import X`` keeps
working unchanged."""

from __future__ import annotations

from clinical_api_etl_spark.plans.base import QuerySet

from . import _shared, communities, evals, graphrank, retrieval, stats

for _mod in (retrieval, graphrank, communities, evals, stats, _shared):
    globals().update(
        {k: v for k, v in vars(_mod).items() if not k.startswith("__")}
    )

QS = QuerySet()
for _mod in (retrieval, graphrank, communities, evals, stats):
    for _name, _q in _mod.QS.queries.items():
        if _name in QS._queries:
            raise ValueError(f"duplicate query {_name!r} across ranking modules")
        QS._queries[_name] = _q
