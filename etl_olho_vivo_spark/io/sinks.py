"""Sinks: date-partitioned Parquet for the fact table, header CSV for the
derived datasets (reference S7/S9).

The reference hand-builds one object per day (``raw/YYYY-MM/pos-….parquet``,
``etl-olho-vivo-ingestao-posicoes.py:30-31``) and one CSV per dataset per day
(``etl-olho-vivo-velocidades-medias.py:72-81``).  The engine replaces the
path convention with native partitioned layout:

- Parquet ``partitionBy("data")`` → partition pruning on day predicates,
  true parallel writes, and append-only daily increments
  (``mode=overwrite`` + ``partitionOverwriteMode=dynamic`` replays a day
  idempotently without touching the rest of the history);
- CSV keeps ``header=true``; ``single_file`` coalesces to one file only
  when a downstream consumer needs the reference's one-file-per-day shape
  (the default leaves one file per partition — at 100 TB a single file is
  a driver-side bottleneck by design, not a default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_olho_vivo_spark.functions.timeops import interval_30min_date


def write_posicoes_parquet(df: DataFrame, path: str) -> None:
    """S7: fact table → Parquet, Hive-partitioned by UTC day."""
    out = df.withColumn(
        "data", interval_30min_date(F.col("timestamp"))
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("data")
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9: derived dataset → CSV with header (ref ``:20-24``)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
