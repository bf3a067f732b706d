"""SparkSession factory.

The reference runs single-threaded pandas inside AWS Lambda with an
implicitly-UTC timezone (naive ``strptime().timestamp()`` — see
``etl-olho-vivo-ingestao-posicoes.py:58``).  The engine makes UTC explicit
(``spark.sql.session.timeZone=UTC``) so interval bucketing
(``etl-olho-vivo-velocidades-medias.py:26-31``) is reproducible anywhere.

Scale posture (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- shuffle.partitions sized to local cores here; on a real cluster AQE
  re-plans from ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
- Arrow enabled for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-olho-vivo-spark",
    cpus: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Round 13: ContextCleaner only reclaims unreferenced
        # broadcasts/shuffles when a DRIVER GC runs, and a big-heap JVM
        # can go a long time without one — measured consequence: a query
        # benched hours into a session read up to 18x its fresh-session
        # floor (doc_kneser_ney 5→91 s, BASELINE.md r13) from the
        # accumulated backlog.  A 5-minute periodic System.gc() (Spark's
        # own knob for exactly this; default 30min) bounds the backlog
        # for long-lived sessions — the streaming admit loops are the
        # production case.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
