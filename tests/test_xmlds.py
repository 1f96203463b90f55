"""XML table DataSource (sources/xmlds.py): exact round-trips incl.
escaping/unicode/NULLs/timestamps, file-granular parallel reads,
overwrite commit semantics, empty-dir scans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.xmlds import XmlTableDataSource

SCHEMA = "id long, name string, score double, ok boolean, ts timestamp"

ROWS = [
    (1, "plain", 1.5, True, "2024-01-01 10:00:00.123456"),
    (2, "esc <&> \"quotes\" 'apos'", -0.25, False, "2024-06-30 23:59:59.5"),
    (3, "unicode δ言葉 ünïcodé", 0.0, None, None),
    (4, None, None, True, "2023-12-31 00:00:00"),
    (5, "multi\nline\ttabbed", 2.0, False, "2024-03-01 12:00:00"),
    (6, "", 3.75, True, "2024-03-01 12:00:01"),  # empty string != NULL
]


@pytest.fixture()
def xml_ready(spark):
    spark.dataSource.register(XmlTableDataSource)
    return spark


def _df(spark):
    return spark.createDataFrame(
        [
            (i, n, s, b, None if t is None else __import__("datetime").datetime.fromisoformat(t))
            for (i, n, s, b, t) in ROWS
        ],
        SCHEMA,
    )


class TestXmlRoundTrip:
    def test_exact_round_trip(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t1")
        _df(spark).write.format("xmltable").option("path", path).mode("append").save()
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        got = sorted([tuple(r) for r in back.collect()])
        want = sorted([tuple(r) for r in _df(spark).collect()])
        assert got == want  # exact: escaping, unicode, NULL vs '', ts µs

    def test_null_vs_empty_string_distinct(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t2")
        _df(spark).write.format("xmltable").option("path", path).mode("append").save()
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        by_id = {r["id"]: r for r in back.collect()}
        assert by_id[4]["name"] is None
        assert by_id[6]["name"] == ""

    def test_round_trip_under_nonutc_session_tz(self, xml_ready, tmp_path):
        spark = xml_ready
        old = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            path = str(tmp_path / "t3")
            df = _df(spark).select("id", "ts")
            df.write.format("xmltable").option("path", path).mode("append").save()
            back = (
                spark.read.format("xmltable")
                .schema("id long, ts timestamp")
                .option("path", path)
                .load()
            )
            got = {r["id"]: r["ts"] for r in back.collect()}
            want = {r["id"]: r["ts"] for r in df.collect()}
            assert got == want
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)


class TestXmlLayout:
    def test_parallel_files_one_partition_each(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t4")
        big = spark.range(0, 1000).select(
            F.col("id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            (F.col("id") * 0.5).alias("score"),
            (F.col("id") % 2 == 0).alias("ok"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
        big.repartition(6).write.format("xmltable").option("path", path).mode("append").save()
        files = [n for n in os.listdir(path) if n.startswith("part-")]
        assert len(files) == 6
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        assert back.rdd.getNumPartitions() == 6  # one task per file
        assert back.count() == 1000
        assert back.agg(F.sum("id")).collect()[0][0] == 499500

    def test_overwrite_replaces(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t5")
        _df(spark).write.format("xmltable").option("path", path).mode("append").save()
        spark.createDataFrame(
            [(99, "only", 9.9, True, None)], SCHEMA
        ).write.format("xmltable").option("path", path).mode("overwrite").save()
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        rows = back.collect()
        assert len(rows) == 1 and rows[0]["id"] == 99
        assert not [n for n in os.listdir(path) if n.startswith("_tmp-")]

    def test_append_accumulates(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t6")
        _df(spark).write.format("xmltable").option("path", path).mode("append").save()
        _df(spark).write.format("xmltable").option("path", path).mode(
            "append"
        ).save()
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        assert back.count() == 2 * len(ROWS)

    def test_empty_dir_reads_as_empty_scan(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t7")
        os.makedirs(path)
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        assert back.count() == 0

    def test_empty_partitions_leave_no_files(self, xml_ready, tmp_path):
        spark = xml_ready
        path = str(tmp_path / "t8")
        _df(spark).repartition(16).write.format("xmltable").option(
            "path", path
        ).mode("append").save()
        files = [n for n in os.listdir(path) if n.startswith("part-")]
        # 6 rows over 16 partitions: empty partitions commit no file
        assert 0 < len(files) <= 6
        back = (
            spark.read.format("xmltable").schema(SCHEMA).option("path", path).load()
        )
        assert back.count() == len(ROWS)


class TestXmlStreaming:
    """Drop-folder tail: incremental files across two availableNow runs
    on one checkpoint — exactly-once, no re-emission."""

    def _run(self, spark, src, out, ckpt):
        q = (
            spark.readStream.format("xmltable")
            .schema("id long, name string")
            .option("path", src)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_incremental_exactly_once(self, xml_ready, tmp_path):
        spark = xml_ready
        src = str(tmp_path / "drop"); os.makedirs(src)
        out = str(tmp_path / "out"); ckpt = str(tmp_path / "ckpt")

        def drop(name, lo, hi):
            spark.createDataFrame(
                [(i, f"n{i}") for i in range(lo, hi)], "id long, name string"
            ).coalesce(1).write.format("xmltable").option("path", src).mode(
                "append"
            ).save()

        drop("a", 0, 5)
        self._run(spark, src, out, ckpt)
        got1 = {r["id"] for r in spark.read.parquet(out).collect()}
        assert got1 == set(range(5))
        drop("b", 5, 9)
        self._run(spark, src, out, ckpt)
        back = spark.read.parquet(out).collect()
        assert sorted(r["id"] for r in back) == list(range(9))  # no dupes
        # a third run with nothing new emits nothing
        self._run(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == 9


class TestXmlPropertyRoundTrip:
    """Hypothesis gate: ARBITRARY python strings (control chars, \r,
    surrogate-adjacent codepoints, whitespace edges) survive the
    write→read cycle exactly — the base64 fallback must catch every
    XML-1.0-unrepresentable case."""

    def test_arbitrary_strings_roundtrip(self, xml_ready, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        spark = xml_ready
        case = [0]

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(
            st.lists(
                st.text(
                    alphabet=st.characters(
                        codec="utf-8", categories=None
                    ),
                    max_size=40,
                ),
                min_size=1,
                max_size=8,
            )
        )
        def run(texts):
            case[0] += 1
            path = str(tmp_path / f"p{case[0]}")
            rows = [(i, t) for i, t in enumerate(texts)]
            spark.createDataFrame(rows, "id long, name string").coalesce(
                1
            ).write.format("xmltable").option("path", path).mode(
                "append"
            ).save()
            back = (
                spark.read.format("xmltable")
                .schema("id long, name string")
                .option("path", path)
                .load()
                .collect()
            )
            assert sorted((r["id"], r["name"]) for r in back) == sorted(rows)

        run()
