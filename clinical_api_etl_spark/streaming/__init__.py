"""Structured Streaming: drop-folder ingestion, event-time windows, stateful ops."""
