"""Custom PySpark DataSources (ingest plane)."""
