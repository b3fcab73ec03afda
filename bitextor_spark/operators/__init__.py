"""Relational + pipeline operators re-expressed Spark-first."""
