"""Structured Streaming slices over the events table."""
