"""State persistence: snapshot-table catalog (Iceberg-style on parquet)."""
