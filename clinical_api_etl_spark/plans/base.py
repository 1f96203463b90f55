"""Query registry primitives.

Each declared operator from SURVEY.md §2 is a :class:`Query`: a Spark
DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics
are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string. The driver
hash-compares the two at sf0.01 (order-insensitive, column-name-sorted), so
every computed column is aliased identically on both sides, and all float
aggregates follow the decimal-exact discipline in
:mod:`clinical_api_etl_spark.functions.numeric`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One declared query/operator.

    ``oracle`` is ``None`` only for genuinely non-SQL-expressible ops
    (approximate sketches, LSH candidate generation, custom stateful
    streaming) — the driver then records a weaker rows-only check.
    ``headline`` marks queries included in ``bench.py``.
    """

    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    headline: bool = False
    tags: tuple[str, ...] = field(default=())


class QuerySet:
    """Ordered collection of queries, one per plans submodule."""

    def __init__(self) -> None:
        self._queries: dict[str, Query] = {}

    def add(
        self,
        name: str,
        oracle: str | None,
        *,
        doc: str = "",
        headline: bool = False,
        tags: tuple[str, ...] = (),
    ) -> Callable[[Builder], Builder]:
        def deco(fn: Builder) -> Builder:
            if name in self._queries:
                raise ValueError(f"duplicate query name {name!r}")
            # Guard against helper-between-decorator-and-def slips: a
            # helper inserted between @QS.add(...) and the builder def
            # silently registers the WRONG function (bit twice in round
            # 18 — _condensed_edges_l and _louvain_shared both got
            # registered as query builders). Builders are named after
            # their query by convention, so enforce it at import time.
            if fn.__name__ != name:
                raise ValueError(
                    f"query {name!r} decorates function {fn.__name__!r} — "
                    "a helper def likely slipped between @QS.add and the "
                    "builder"
                )
            self._queries[name] = Query(
                name=name,
                builder=fn,
                oracle=oracle,
                doc=doc or (fn.__doc__ or ""),
                headline=headline,
                tags=tags,
            )
            return fn

        return deco

    @property
    def queries(self) -> dict[str, Query]:
        return dict(self._queries)


# Shared DuckDB SQL fragments (mirror functions/numeric.py exactly).
def MON(c: str) -> str:
    """Lossless decimal view of a 2-decimal double column (DuckDB side)."""
    return f"CAST({c} AS DECIMAL(18,2))"


def DSUM(c: str, alias: str) -> str:
    return f"CAST(SUM({MON(c)}) AS DOUBLE) AS {alias}"


def DAVG(c: str, alias: str) -> str:
    return f"CAST(SUM({MON(c)}) AS DOUBLE) / CAST(COUNT({c}) AS DOUBLE) AS {alias}"
