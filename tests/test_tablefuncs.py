"""Python UDTF surface: lateral-join chunker parity with the expression
path (functions/tablefuncs.py is an escape-hatch demo, not a hot path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.tablefuncs import register_table_functions
from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"
CHUNK = 16


def _expression_chunks(docs):
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK))).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)).cast("int") - 1),
        lambda c: F.concat_ws(" ", F.slice(toks, c * CHUNK + 1, CHUNK)),
    )
    return docs.select(
        "doc_id", F.posexplode_outer(chunks).alias("chunk_idx", "chunk")
    )


class TestChunkUDTF:
    def test_lateral_udtf_matches_expression_chunker(self, spark):
        register_table_functions(spark)
        docs = load(spark, SF, "documents").limit(50)
        got = spark.sql(
            f"SELECT d.doc_id, c.chunk_idx, c.chunk "
            f"FROM {{d}} d, LATERAL chunk_doc(d.text, {CHUNK}) c",
            d=docs,
        )
        want = _expression_chunks(docs)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_short_doc_yields_single_chunk(self, spark):
        register_table_functions(spark)
        df = spark.sql(
            "SELECT * FROM chunk_doc('  Tiny DOC  ', 16)"
        ).collect()
        assert [(r["chunk_idx"], r["chunk"]) for r in df] == [(0, "tiny doc")]
