"""JSONL source: schema enforcement, corrupt-line quarantine, and the
whole-file degenerate case Spark's PERMISSIVE mode is known to trip on."""

from __future__ import annotations

import pytest

from clinical_api_etl_spark.sources.jsonl import (
    JsonlError,
    read_jsonl,
    split_corrupt,
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "meta": {"k": "v"}}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}',
]
BAD_PARSE = '{"doc_id": 3, "text": "broken'
BAD_MISSING = '{"doc_id": 4, "lang": "en"}'


@pytest.fixture()
def corpus(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([GOOD[0], BAD_PARSE, GOOD[1], BAD_MISSING]) + "\n")
    return str(p)


class TestReadJsonl:
    def test_clean_and_quarantine_split(self, spark, corpus):
        clean, quarantine = split_corrupt(read_jsonl(spark, corpus))
        rows = {r["doc_id"]: r for r in clean.collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["meta"] == {"k": "v"}
        assert rows[2]["lang"] == "fr"

        q = {r["reason"] for r in quarantine.collect()}
        assert quarantine.count() == 2
        assert q == {"unparseable", "missing_required"}

    def test_schema_never_inferred(self, spark, corpus):
        df = read_jsonl(spark, corpus)
        assert [f.name for f in df.schema.fields] == [
            "doc_id", "text", "lang", "source", "meta", "_corrupt_record",
        ]
        assert df.schema["doc_id"].dataType.typeName() == "long"

    def test_structural_violation_fails_fast(self, spark, corpus):
        with pytest.raises(JsonlError, match="required fields absent"):
            read_jsonl(spark, corpus, required=("doc_id", "nonexistent_col"))

    def test_all_good_file_quarantines_nothing(self, spark, tmp_path):
        p = tmp_path / "ok.jsonl"
        p.write_text("\n".join(GOOD) + "\n")
        clean, quarantine = split_corrupt(read_jsonl(spark, str(p)))
        assert clean.count() == 2
        assert quarantine.count() == 0
