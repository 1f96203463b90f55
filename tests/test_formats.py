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


class TestFederatedUnion:
    def test_union_across_formats_aggregates_once(self, spark, tmp_path):
        """Federation shape: the same logical table served from parquet, ORC
        and JSONL unioned into ONE plan — per-format scan nodes, one shared
        aggregate. Totals equal 3x the single-source result (format
        transparency: the DataFrame layer doesn't care where rows come
        from)."""
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.sources.catalog import load

        nat = load(spark, "/root/testdata/sf0.001", "nation")
        pq_dir = str(tmp_path / "n_pq")
        orc_dir = str(tmp_path / "n_orc")
        jl_dir = str(tmp_path / "n_jl")
        nat.write.parquet(pq_dir)
        nat.write.orc(orc_dir)
        nat.write.json(jl_dir)

        a = spark.read.parquet(pq_dir)
        b = spark.read.orc(orc_dir)
        c = spark.read.schema(nat.schema).json(jl_dir)
        fed = a.unionByName(b).unionByName(c)
        got = fed.groupBy("n_regionkey").agg(
            F.count("*").alias("n"), F.sum("n_nationkey").alias("s")
        )
        single = nat.groupBy("n_regionkey").agg(
            F.count("*").alias("n"), F.sum("n_nationkey").alias("s")
        )
        g = {r.n_regionkey: (r.n, r.s) for r in got.collect()}
        s = {r.n_regionkey: (r.n, r.s) for r in single.collect()}
        assert g == {k: (3 * n, 3 * t) for k, (n, t) in s.items()}
