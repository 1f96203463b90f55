"""Python UDTF surface: lateral-join chunker parity with the expression
path (functions/tablefuncs.py is an escape-hatch demo, not a hot path)."""

from __future__ import annotations

import pytest

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


class TestPolymorphicUdtf:
    def test_schema_follows_literal_argument(self, spark):
        from clinical_api_etl_spark.functions.tablefuncs import (
            register_table_functions,
        )

        register_table_functions(spark)
        three = spark.sql(
            "SELECT * FROM token_columns('Alpha beta GAMMA delta', 3)"
        )
        assert three.columns == ["n_tokens", "tok0", "tok1", "tok2"]
        assert three.collect()[0].asDict() == {
            "n_tokens": 4, "tok0": "alpha", "tok1": "beta", "tok2": "gamma",
        }
        five = spark.sql("SELECT * FROM token_columns('one two', 5)")
        assert five.columns == ["n_tokens"] + [f"tok{i}" for i in range(5)]
        row = five.collect()[0]
        assert (row.tok0, row.tok1, row.tok2) == ("one", "two", None)

    def test_lateral_join_over_documents(self, spark):
        from clinical_api_etl_spark.functions.tablefuncs import (
            register_table_functions,
        )
        from clinical_api_etl_spark.sources.catalog import load

        register_table_functions(spark)
        load(spark, "/root/testdata/sf0.001", "documents").limit(
            20
        ).createOrReplaceTempView("udtf_docs")
        out = spark.sql(
            """
            SELECT d.doc_id, t.n_tokens, t.tok0, t.tok1
            FROM udtf_docs d, LATERAL token_columns(d.text, 2) t
            """
        )
        rows = out.collect()
        assert len(rows) == 20
        assert all(r.n_tokens > 0 and r.tok0 is not None for r in rows)

    def test_invalid_literal_rejected(self, spark):
        from clinical_api_etl_spark.functions.tablefuncs import (
            register_table_functions,
        )

        register_table_functions(spark)
        with pytest.raises(Exception, match="positive integer"):
            spark.sql("SELECT * FROM token_columns('x', 0)").collect()
