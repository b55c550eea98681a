"""Structured Streaming wrappers for continuous incremental ingestion."""
