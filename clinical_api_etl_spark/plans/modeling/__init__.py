"""Modeling package — the former 3,160-line plans/modeling.py split
along its families (VERDICT r09 task 8): tsmisc, graphs, mlevals.
Mechanical split, zero behavior change: the merged ``QS`` is what the
registry consumes, and every top-level name of every family module
(builders AND private helpers that tests import) is re-exported here so
``from clinical_api_etl_spark.plans.modeling import X`` keeps working
unchanged."""

from __future__ import annotations

from clinical_api_etl_spark.plans.base import QuerySet

from . import graphs, mlevals, tsmisc

for _mod in (tsmisc, mlevals, graphs):
    globals().update(
        {k: v for k, v in vars(_mod).items() if not k.startswith("__")}
    )

QS = QuerySet()
for _mod in (tsmisc, mlevals, graphs):
    for _name, _q in _mod.QS.queries.items():
        if _name in QS._queries:
            raise ValueError(f"duplicate query {_name!r} across modeling modules")
        QS._queries[_name] = _q
