"""Structured Streaming surface (optional ingest path; SURVEY §2.12)."""
