"""Python UDTF surface (Spark 4 user-defined table functions).

The reference defines no UDF/UDAF/UDTF (SURVEY §2.8) — every hot-path
transformation here is built-in column expressions. This module exists as
the documented ESCAPE HATCH for genuinely one-to-many Python logic that
no builtin composition can express (e.g. a bespoke parser emitting a
variable number of rows per input). It is deliberately NOT used by any
registry query: the chunker below reproduces ``text_chunk_dedup``'s
expression-based chunking exactly, and the parity test in
``tests/test_tablefuncs.py`` proves the two paths agree — demonstrating
the API without putting Python on a hot path (plan-audit discipline:
zero BatchEvalPython in registry plans).

At scale, a UDTF runs one Python worker per task: fine for low-volume
side tables, wrong for 100 TB facts — use expressions or Arrow-batched
``mapInPandas`` there.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf
from pyspark.sql.types import IntegerType, StringType, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


@udtf(returnType="chunk_idx int, chunk string")
class ChunkDocUDTF:
    """Split whitespace-tokenized text into non-overlapping ``chunk_size``-
    token chunks; documents shorter than one chunk yield one row. Mirrors
    the expression pipeline in plans/mlprep.py:text_chunk_dedup (tokens =
    lower(trim(text)) split on whitespace)."""

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        toks = (text or "").lower().strip().split()
        n = max(-(-len(toks) // chunk_size), 1)
        for c in range(n):
            yield c, " ".join(toks[c * chunk_size : (c + 1) * chunk_size])


@udtf
class TokenColumnsUDTF:
    """POLYMORPHIC table function (Spark 4 ``analyze`` API): emit the
    first N tokens of a text as N separate columns ``tok0..tok{N-1}`` —
    the output SCHEMA depends on the constant argument, which a plain
    ``returnType`` cannot express. ``analyze`` runs at plan time on the
    driver with the literal argument value and returns the concrete
    schema; ``eval`` then produces matching tuples. The fixed-width
    token-prefix shape is the feature-column layout tabular trainers
    expect (pad with NULLs, never ragged rows)."""

    @staticmethod
    def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
        if not isinstance(n.value, int) or n.value < 1:
            raise ValueError("n must be a positive integer literal")
        schema = StructType().add("n_tokens", IntegerType())
        for i in range(n.value):
            schema = schema.add(f"tok{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        toks = (text or "").lower().strip().split()
        yield (len(toks), *[toks[i] if i < len(toks) else None for i in range(n)])


def register_table_functions(spark) -> None:
    """Register all table functions on a session (SQL name → class)."""
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    spark.udtf.register("token_columns", TokenColumnsUDTF)


__all__ = [
    "ChunkDocUDTF",
    "TokenColumnsUDTF",
    "register_table_functions",
    "lit",
]
