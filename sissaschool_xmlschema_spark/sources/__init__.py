"""Sources: deterministic synthetic transcript tables and parquet/Iceberg readers."""
