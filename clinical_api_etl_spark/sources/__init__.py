"""Sources and sinks: testdata catalog, clinical CSV source, idempotent sinks."""
