"""etl_olho_vivo_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of JonasMarma/etl-olho-vivo.

The reference is a three-stage AWS-Lambda/pandas pipeline over São Paulo
bus-position (GPS ping) data.  This engine re-expresses the same data model,
cleaning rules, and analytics as lazy Spark DataFrame plans (Catalyst
optimizes; Tungsten executes), designed to run unchanged from a laptop
`local[*]` to a 1000-executor cluster over ~100 TB.

Layout:
    session     — SparkSession factory (UTC, AQE, Arrow)
    schemas     — explicit schemas (no inference anywhere)
    functions/  — scalar Column-expression libraries (geo, time, text, vector)
    sources/    — readers: raw nested JSON zone, parquet fact table, adapters
    operators/  — relational + domain operators (speed pipeline, dedup, knn …)
    plans/      — composed end-to-end daily pipeline
    streaming/  — Structured Streaming surface (stateful per-vehicle lag)
    io/         — writers (partitioned parquet, csv datasets)
"""

__version__ = "0.1.0"
