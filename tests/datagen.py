"""Shared scale-probe data generation.

One definition of "replicate the events table N× with perturbed keys"
used by both the 10× plan probe and the starved-JVM memory probe — the
two must scale the same shape or their evidence diverges silently.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: key offset larger than any base id at these scale factors
OFF = 10_000_000


def replicate_events(
    spark: SparkSession, src: str, out: str, replicas: int
) -> None:
    """Write ``replicas``× copies of the events parquet at ``src`` to
    ``out``, each replica under fresh event/user ids so key cardinality
    scales with the data (duplicating under the same keys would shrink
    relative group counts instead of simulating growth).

    Derived-parquet gotchas (see .claude/skills/verify/SKILL.md): pin
    instant semantics before writing and cast ``ts`` explicitly, or the
    copy silently becomes TIMESTAMP_NTZ and breaks ``unix_millis``.
    """
    from etl_olho_vivo_spark.sources.tables import pin_parquet_instant_confs

    pin_parquet_instant_confs(spark)
    rep = F.explode(
        F.array(*[F.lit(i) for i in range(replicas)])
    ).alias("rep")
    ev = spark.read.parquet(src)
    ev.select("*", rep).select(
        (F.col("event_id") + F.col("rep") * F.lit(OFF)).alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        (F.col("user_id") + F.col("rep") * F.lit(OFF)).alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(out)
