"""Operator implementations: clinical medallion transforms + [EXT] LLM-data ops."""
