"""Structured Streaming surface: continuous ingestion of the raw zone."""
