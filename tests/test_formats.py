"""ORC format-interop invariants (sources/formats.py)."""

from __future__ import annotations

from clinical_api_etl_spark.sources.formats import orc_roundtrip, write_orc, read_orc

SF = "/root/testdata/sf0.001"


class TestOrcRoundtrip:
    def test_lineitem_survives_with_timestamps(self, spark, tmp_path):
        src = spark.read.parquet(f"{SF}/lineitem.parquet")
        back = orc_roundtrip(spark, src, str(tmp_path / "li_orc"))
        assert back.schema == src.schema
        assert back.count() == src.count()
        assert back.exceptAll(src).count() == 0
        assert src.exceptAll(back).count() == 0

    def test_partitioned_orc_prunes_directories(self, spark, tmp_path):
        src = spark.read.parquet(f"{SF}/orders.parquet")
        path = str(tmp_path / "orders_orc")
        write_orc(src, path, partition_by=["o_orderpriority"])
        back = read_orc(spark, path)
        one = back.filter(back["o_orderpriority"] == "1-URGENT")
        plan = one._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        # partition pruning: the scan must not enumerate other priorities
        assert one.count() == src.filter(src["o_orderpriority"] == "1-URGENT").count()
        assert "PartitionFilters" in plan
