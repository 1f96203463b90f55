"""JSONL (newline-delimited JSON) document source. [EXT]

The landing format of most LLM training corpora (one JSON object per
line: id, text, metadata). The reference only ingests CSV
(`etl-service/src/etl.py:57-70`); this source extends the same
validated-on-read contract to JSONL for the documents pipeline:

* explicit schema, never inferred — at 100 TB a schema-inference pass
  reads the corpus twice, and drifting inferred types break downstream
  plans;
* malformed lines NEVER fail the scan: PERMISSIVE mode captures the raw
  line in a ``_corrupt_record`` column, and :func:`split_corrupt`
  separates clean rows from a quarantine DataFrame (row-level dead-letter
  queue — the batch analogue of the pipeline's quality-report sink);
* hard failure only for *structural* problems (required field entirely
  absent from the schema contract), mirroring the CSV source's S2 guard;
* multi-file directory reads parallelize per file split like any text
  source — no per-file driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Contract schema for document corpora: matches the testdata
#: ``documents`` table's core columns plus free-form metadata.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_CORRUPT = "_corrupt_record"


class JsonlError(ValueError):
    """Structural contract violation — the whole job fails."""


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOCUMENT_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> DataFrame:
    """Schema-enforced JSONL read with corrupt-line capture.

    Returns all rows; lines that failed to parse have NULL data fields
    and the raw line in ``_corrupt_record``. Use :func:`split_corrupt`
    to quarantine them.
    """
    missing = sorted(set(required) - {f.name for f in schema.fields})
    if missing:
        raise JsonlError(f"required fields absent from schema: {missing}")
    full = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, *, required: tuple[str, ...] = ("doc_id", "text")
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): quarantine = unparseable lines plus parsed
    rows missing a required field. Clean rows drop the corrupt column.

    One scan feeds both sides (the filters are complementary predicates
    over the same columnar read — Spark prunes to the needed columns in
    each branch)."""
    bad = F.col(_CORRUPT).isNotNull()
    for c in required:
        bad = bad | F.col(c).isNull()
    clean = df.filter(~bad).drop(_CORRUPT)
    quarantine = df.filter(bad).withColumn(
        "reason",
        F.when(F.col(_CORRUPT).isNotNull(), F.lit("unparseable")).otherwise(
            F.lit("missing_required")
        ),
    )
    return clean, quarantine
