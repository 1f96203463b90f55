"""clinical_api_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference system
``arthurmosley/clinical-api-etl`` (a pandas/FastAPI/Postgres clinical-trial
ETL pipeline) as an idiomatic Apache Spark engine:

* declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling),
* medallion pipeline bronze -> silver -> quality/gold expressed as pure
  DataFrame -> DataFrame functions (testable without I/O),
* Structured Streaming ingestion with ``availableNow`` per-job triggers,
* zero Python UDFs on the reference-parity hot path (every reference
  transformation maps to built-in column expressions),
* [EXT] large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search over embeddings, text
  statistics, multimodal binary-column plumbing.

Scale posture: every operator is written for a 1000-executor cluster reading
~100 TB — broadcast joins for dims, partial aggregation, partition-pruned
scans — and only *verified* on ``local[N]`` test data.
"""

__version__ = "0.1.0"

from clinical_api_etl_spark.session import get_spark  # noqa: F401
