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


def write_posicoes_parquet(
    df: DataFrame,
    path: str,
    cluster: bool = True,
    writer_options: dict | None = None,
    fmt: str = "parquet",
) -> None:
    """S7: fact table → Parquet, Hive-partitioned by UTC day.

    ``cluster=True`` additionally sorts rows *within* each write task by
    ``(codigo_linha, prefixo_veiculo, timestamp)`` before the write.
    Day-partitioning prunes whole directories; the within-file sort is
    what prunes *inside* a file: parquet stores per-row-group min/max
    statistics, and clustered rows give each row group a tight key range,
    so the common access patterns ("one line's day", "one vehicle's
    trace", "a time slice") skip row groups instead of decoding them.
    At 100 TB this is the difference between reading a partition and
    reading ~1/row_groups of it — paid once at ingest with a per-task
    in-memory sort (spillable, no extra shuffle: ``sortWithinPartitions``
    adds only a local Sort node under the write).

    ``fmt`` ∈ {"parquet", "orc"}: both columnar formats carry the same
    partition layout, clustering benefit (ORC keeps stripe/row-index
    min-max stats that prune exactly like parquet row groups), dynamic
    overwrite, and predicate pushdown — pick per ecosystem."""
    out = df.withColumn(
        "data", interval_30min_date(F.col("timestamp"))
    )
    if cluster:
        out = out.sortWithinPartitions(
            "data", "codigo_linha", "prefixo_veiculo", "timestamp"
        )
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"fmt must be parquet|orc, got {fmt!r}")
    w = (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("data")
        .format(fmt)
    )
    # e.g. {"parquet.block.size": N} to tune row-group granularity —
    # smaller groups = finer stats pruning, more footer overhead
    for k, v in (writer_options or {}).items():
        w = w.option(k, v)
    w.save(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9: derived dataset → CSV with header (ref ``:20-24``)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_raw_json(
    df: DataFrame, path: str, poll_epoch=None, mode: str = "overwrite"
) -> None:
    """S3: raw landing zone — ``year=/month=/day=/hour=`` JSON objects.

    The engine twin of the reference poller's S3 put
    (``get-bus-data.py:26-49,64-65``: one JSON document per poll under
    ``posicoes/year=YYYY/month=MM/day=DD/hour=HH/``).  Deviation: the
    reference derives the partition from ``utcnow()`` at write time, so
    replaying a poll lands it in a *different* partition; here the
    partition time defaults to the document's own newest capture instant
    (max vehicle ``ta``), making re-writes idempotent — same input, same
    layout, forever.  Pass ``poll_epoch`` (epoch-seconds Column) to
    override, e.g. with an ingestion-time column from the stream source.

    All partition math is TZ-free epoch/calendar arithmetic; values are
    zero-padded to match the reference's lexicographic key layout.
    ``mode="overwrite"`` (batch replay: dynamic overwrite of only the
    partitions present); ``mode="append"`` for the streaming ingestion
    loop (foreachBatch), where consecutive micro-batches share an hour
    partition and must accumulate.
    """
    from etl_olho_vivo_spark.io.flatten import iso8601_to_epoch

    if poll_epoch is None:
        poll_epoch = F.array_max(
            F.transform(
                F.flatten(F.col("l.vs")), lambda v: iso8601_to_epoch(v["ta"])
            )
        )
    days = poll_epoch.cast("long") / F.lit(86400)
    d = F.date_add(F.lit("1970-01-01").cast("date"), F.floor(days).cast("int"))
    out = (
        df.withColumn("__e", poll_epoch.cast("long"))
        .withColumn("year", F.format_string("%04d", F.year(d)))
        .withColumn("month", F.format_string("%02d", F.month(d)))
        .withColumn("day", F.format_string("%02d", F.dayofmonth(d)))
        .withColumn(
            "hour",
            F.format_string(
                "%02d", ((F.col("__e") % 86400) / 3600).cast("int")
            ),
        )
        .drop("__e")
    )
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("year", "month", "day", "hour")
        .json(path)
    )
