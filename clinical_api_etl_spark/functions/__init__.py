"""Column-expression libraries (no Python UDFs on the hot path)."""
