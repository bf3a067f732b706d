"""Shared scale-probe data generation.

The replica machinery lives in the package (etl_olho_vivo_spark/
replicate.py) since bench.py's scale tier uses it too; this module
re-exports it for the test suite.
"""

from __future__ import annotations

from etl_olho_vivo_spark.replicate import (  # noqa: F401
    OFF,
    replicate_documents,
    replicate_embeddings,
    replicate_events,
    replicate_tpch_facts,
)
