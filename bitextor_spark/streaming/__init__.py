"""Structured Streaming variants of the batch operators (SURVEY §2.10)."""
