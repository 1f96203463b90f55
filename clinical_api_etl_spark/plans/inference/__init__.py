"""Inference package — the former 4,878-line plans/inference.py split
along its families (VERDICT r08 task 8): ranks (rank-sum + EDF trio),
parametric (moments/contingency/effect sizes), tokenizers (LM + BPE +
WordPiece), misc (SQL surfaces, ER, media kernels). Mechanical split,
zero behavior change: the merged ``QS`` is what the registry consumes,
and every top-level name of every family module (builders AND private
helpers that tests and mlprep import) is re-exported here so
``from clinical_api_etl_spark.plans.inference import X`` keeps working
unchanged."""

from __future__ import annotations

from clinical_api_etl_spark.plans.base import QuerySet

from . import _shared, misc, parametric, ranks, tokenizers

for _mod in (ranks, parametric, tokenizers, misc, _shared):
    globals().update(
        {k: v for k, v in vars(_mod).items() if not k.startswith("__")}
    )

QS = QuerySet()
for _mod in (ranks, parametric, tokenizers, misc):
    for _name, _q in _mod.QS.queries.items():
        if _name in QS._queries:
            raise ValueError(f"duplicate query {_name!r} across inference modules")
        QS._queries[_name] = _q
