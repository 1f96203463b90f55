"""[EXT] LLM-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — declared queries over ``documents`` / ``embeddings``.

Filled in family by family; each entry pairs the Spark implementation in
``operators/`` with a DuckDB oracle where the algorithm is exactly
SQL-expressible (exact dedup, n-gram Jaccard, brute-force cosine top-k,
text statistics). Sketch/LSH-based variants are rows-only checks.
"""

from __future__ import annotations

from clinical_api_etl_spark.plans.base import QuerySet

QS = QuerySet()
