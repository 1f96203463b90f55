"""Job lifecycle: ledger table + batch/streaming pipeline runner."""
