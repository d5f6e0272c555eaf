"""Structured Streaming ingest path (SURVEY.md §2.6)."""
