"""Declared query inventory: Spark builders paired with DuckDB oracle SQL."""
