"""Composed plans: multi-stage pipelines as single Spark applications."""
