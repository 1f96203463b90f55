"""Idempotent parquet warehouse — the reference's ON CONFLICT family
(SURVEY §2 S5-S11) without a database.

The reference leans on Postgres unique constraints for retry-safe re-runs:
``DO NOTHING`` appends (staging db.py:41-58, processed db.py:88-100), the
asymmetric ``DO UPDATE`` aggregation merge (db.py:110-127), and job-ledger
upserts (db.py:60-67). Here each becomes a set-based join:

* ``append_if_absent`` — incoming LEFT ANTI JOIN existing on the key, then
  a plain parquet append (new files only; safe and atomic-enough for a
  single writer).
* ``merge_aggregations`` — full-outer merge with the reference's declared
  asymmetry (§2.9.3): cnt/avg replaced by the new job's values,
  min/max merged across history via LEAST/GREATEST.
* ``upsert`` — last-write-wins full-outer merge (job ledger, participants).

Merges rewrite the table via write-to-temp + atomic directory swap (parquet
cannot be overwritten in place while being read). On a real deployment this
module is the one swap-out point: Delta/Iceberg ``MERGE`` gives the same
semantics transactionally with file-level pruning instead of full rewrites;
the operator layer above is unchanged. The anti-join itself broadcasts the
*incoming* batch (a single job's rows — small) against the big existing
table, so no shuffle of the warehouse side.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The SURVEY §4/§7 blueprint layout: bronze partitioned by ingestion job
#: (per-job pruning for re-ingest anti-joins and the data API's job reads),
#: silver by study (the reference's leading index column).
CLINICAL_PARTITIONING = {
    "staging_clinical_measurements": ["job_id"],
    "processed_measurements": ["study_id"],
}


def clinical_warehouse(spark: SparkSession, root: str) -> "ParquetWarehouse":
    """Warehouse with the blueprint partition layout."""
    return ParquetWarehouse(spark, root, partitioning=CLINICAL_PARTITIONING)


class ParquetWarehouse:
    """Directory-of-parquet-tables with idempotent write paths.

    ``partitioning`` maps table name → partition columns (hive-style
    directory layout). Partitioned tables get partition *pruning* on every
    read that filters the partition column — the Spark analogue of the
    reference's leading-index-column design (study/job-keyed indexes,
    02_staging_clinical_trials.sql:26-34) — and per-partition appends
    instead of whole-directory growth.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        partitioning: dict[str, list[str]] | None = None,
    ) -> None:
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.partitioning = dict(partitioning or {})

    def _path(self, table: str) -> Path:
        return self.root / table

    def reset(self) -> None:
        """S12: drop every table (the reference's test-reset endpoint,
        main.py:40-45 — broken as shipped since its reset.sql is absent
        from the repo; corrected semantics implemented here)."""
        shutil.rmtree(self.root, ignore_errors=True)
        self.root.mkdir(parents=True, exist_ok=True)

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return p.exists() and any(p.rglob("*.parquet"))

    def read(self, table: str) -> DataFrame | None:
        """Read a table, tolerating a concurrent merge's directory swap.

        The warehouse is single-writer / many-reader; ``_rewrite`` swaps
        the table directory, so a reader can momentarily see a vanishing
        file listing (e.g. a status poller during a background job's
        ledger update). A short bounded retry rides out the swap window —
        the Delta/Iceberg swap-out removes this entirely via snapshot
        isolation.
        """
        import time

        last: Exception | None = None
        for _ in range(4):
            if not self.exists(table):
                return None
            try:
                df = self.spark.read.parquet(str(self._path(table)))
                df.schema  # force file-listing/analysis now, inside the retry
                return df
            except Exception as e:  # noqa: BLE001 — transient listing race
                last = e
                time.sleep(0.25)
        raise last

    def append(self, table: str, df: DataFrame) -> None:
        """S7-style plain append."""
        w = df.write.mode("append")
        if table in self.partitioning:
            w = w.partitionBy(*self.partitioning[table])
        w.parquet(str(self._path(table)))

    def append_if_absent(self, table: str, df: DataFrame, key: list[str]) -> None:
        """S5/S6: INSERT ... ON CONFLICT DO NOTHING == anti-join + append.

        Also dedups the incoming batch on the key (first wins — matching a
        unique-constraint insert where later conflicting rows are dropped).
        """
        incoming = df.dropDuplicates(key)
        existing = self.read(table)
        if existing is not None:
            incoming = incoming.join(
                existing.select(*key), on=key, how="left_anti"
            )
        self.append(table, incoming)

    def _rewrite(self, table: str, df: DataFrame) -> None:
        tmp = self.root / f"{table}.tmp-{uuid.uuid4().hex}"
        w = df.write.mode("overwrite")
        if table in self.partitioning:
            w = w.partitionBy(*self.partitioning[table])
        w.parquet(str(tmp))
        final = self._path(table)
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)

    def upsert(self, table: str, df: DataFrame, key: list[str]) -> None:
        """S9/J2: last-write-wins merge on the key (new rows replace old)."""
        existing = self.read(table)
        if existing is None:
            self._rewrite(table, df)
            return
        keep = existing.join(df.select(*key), on=key, how="left_anti")
        merged = keep.unionByName(df, allowMissingColumns=True)
        self._rewrite(table, merged)

    def merge_aggregations(self, table: str, df: DataFrame, key: list[str]) -> None:
        """S8: the reference's asymmetric agg upsert (db.py:120-126):

        ``cnt``/``avg_num``/``job_id`` take the new job's values;
        ``min_num = LEAST(old, new)``, ``max_num = GREATEST(old, new)`` —
        so after re-ingest avg reflects only the latest job while min/max
        are historical (§2.9.3, replicated deliberately).
        """
        existing = self.read(table)
        if existing is None:
            self._rewrite(table, df)
            return
        new = df.select(
            *key,
            F.col("cnt").alias("_new_cnt"),
            F.col("avg_num").alias("_new_avg"),
            F.col("min_num").alias("_new_min"),
            F.col("max_num").alias("_new_max"),
            F.col("job_id").alias("_new_job"),
        )
        merged = existing.join(new, on=key, how="full_outer").select(
            *key,
            F.coalesce("_new_cnt", "cnt").alias("cnt"),
            F.coalesce("_new_avg", "avg_num").alias("avg_num"),
            F.when(
                F.col("_new_min").isNotNull(),
                F.least(F.coalesce("min_num", "_new_min"), F.col("_new_min")),
            )
            .otherwise(F.col("min_num"))
            .alias("min_num"),
            F.when(
                F.col("_new_max").isNotNull(),
                F.greatest(F.coalesce("max_num", "_new_max"), F.col("_new_max")),
            )
            .otherwise(F.col("max_num"))
            .alias("max_num"),
            F.coalesce("_new_job", "job_id").alias("job_id"),
        )
        self._rewrite(table, merged)
