"""Job ledger (SURVEY §2 S9-S11) — single source of truth.

The reference keeps job state in two stores that can disagree (in-memory
dict ``state.py:5`` vs Postgres ``db.py:31-39``; the HTTP endpoint prefers
memory, ``main.py:76-82``) and its DB read-back is dead code
(``db.py:24-29`` lacks a ``return`` — §2.9.1). This engine implements the
*corrected* semantics the SURVEY declares: one ledger table, reads return
rows, ``completed_at`` stamped only on terminal transitions
(``CASE WHEN status IN ('completed','failed') THEN NOW()`` — db.py:35, F10).

Progress maps to the reference's fixed checkpoints (etl.py:236-263) and,
for streaming jobs, to ``StreamingQuery.lastProgress``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinical_api_etl_spark.sources.sinks import ParquetWarehouse

JOBS_TABLE = "etl_jobs"

TERMINAL = ("completed", "failed")

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("filename", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("progress", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)


class JobLedger:
    def __init__(self, warehouse: ParquetWarehouse) -> None:
        self.wh = warehouse

    def submit(self, filename: str, job_id: str | None = None) -> str:
        """S9: create the job row in ``pending`` (etl.service.ts:28-43)."""
        jid = job_id or str(uuid.uuid4())
        row = self.wh.spark.createDataFrame(
            [Row(id=jid, filename=filename, status="pending", message=None, progress=0)],
            T.StructType(_SCHEMA.fields[:5]),
        ).select(
            "*",
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
            F.lit(None).cast("timestamp").alias("completed_at"),
        )
        self.wh.upsert(JOBS_TABLE, row, ["id"])
        return jid

    def mark(self, job_id: str, status: str, message: str | None = None, progress: int | None = None) -> None:
        """S10: status update with conditional completed_at stamping."""
        jobs = self.wh.read(JOBS_TABLE)
        if jobs is None:
            raise KeyError(f"no jobs table; submit first (job {job_id})")
        updated = (
            jobs.filter(F.col("id") == job_id)
            .withColumn("status", F.lit(status))
            .withColumn("message", F.lit(message).cast("string"))
            .withColumn(
                "progress",
                F.lit(progress).cast("int") if progress is not None else F.col("progress"),
            )
            .withColumn("updated_at", F.current_timestamp())
            .withColumn(
                "completed_at",
                F.when(F.lit(status).isin(*TERMINAL), F.current_timestamp()).otherwise(
                    F.col("completed_at")
                ),
            )
        )
        self.wh.upsert(JOBS_TABLE, updated, ["id"])

    def fetch(self, job_id: str) -> Row | None:
        """S11 corrected: actually returns the row (§2.9.1).

        Retries across the warehouse's directory-swap window: this is the
        polling path, typically read concurrently with a background job's
        own ledger updates (single-writer/many-reader posture — see
        ``ParquetWarehouse.read``)."""
        import time

        last: Exception | None = None
        for _ in range(4):
            try:
                jobs = self.wh.read(JOBS_TABLE)
                if jobs is None:
                    return None
                rows = jobs.filter(F.col("id") == job_id).limit(1).collect()
                return rows[0] if rows else None
            except Exception as e:  # noqa: BLE001 — transient swap race
                last = e
                time.sleep(0.25)
        raise last

    def all_jobs(self) -> DataFrame | None:
        return self.wh.read(JOBS_TABLE)
