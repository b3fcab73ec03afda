"""Reusable logical-plan fragments (scope rules, sharding)."""
