"""Sinks: partitioned parquet / CSV writers."""
