"""Raw JSON zone → ``posicoes`` fact table (reference stage 2).

Re-expresses ``etl-olho-vivo-ingestao-posicoes.py`` as one declarative plan:

- S5 JSON source: one ``spark.read.json`` with the explicit nested schema
  replaces the reference's list-objects + per-file ``json.loads`` loop
  (``etl-olho-vivo-ingestao-posicoes.py:33-45``).  At 100 TB the scan is
  task-parallel and partition-pruned (Hive-style ``year=/month=/day=/hour=``
  directories are discovered natively — S4).
- S6 error tolerance: PERMISSIVE mode + ``_corrupt_record`` quarantines a
  malformed file's rows instead of skipping the file in a try/except
  (``:41-65``) — same tolerance, but the bad payloads stay queryable.
- P1 flatten: two ``explode``s re-express the nested for-loop (``:47-62``).
- P2 rename + P3 null propagation: struct-field access with ``.get()``
  semantics (missing key → NULL, row kept) (``:50-61``).
- F1 timestamp: ISO-8601 ``ta`` → unix seconds by **pure date/int
  arithmetic** — no session-TZ-dependent parse (the reference's naive
  ``strptime().timestamp()`` at ``:58`` is only correct because Lambda runs
  UTC; SURVEY §4.3.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_olho_vivo_spark.schemas import POSICOES_COLUMNS, RAW_POSICAO_SCHEMA


def iso8601_to_epoch(ta: Column) -> Column:
    """``"YYYY-MM-DDTHH:MM:SSZ"`` → unix seconds, timezone-free.

    ``to_date`` on the date substring is pure calendar arithmetic
    (DateType has no timezone) and the time-of-day fields are integer
    substrings — the session timezone never enters.  NULL/malformed
    input → NULL (``.get()`` parity, ref ``:58``) — via the ``try_``
    variants: under Spark's default ANSI mode a plain cast/to_date
    RAISES on garbage, so one malformed ``ta`` string (schema-valid,
    therefore not quarantined by PERMISSIVE) would abort a whole batch
    or streaming job instead of yielding a NULL-timestamp row.
    """
    day = F.datediff(
        F.try_to_date(F.substring(ta, 1, 10)), F.lit("1970-01-01")
    )
    hh = F.substring(ta, 12, 2).try_cast("long")
    mm = F.substring(ta, 15, 2).try_cast("long")
    ss = F.substring(ta, 18, 2).try_cast("long")
    return day.cast("long") * 86400 + hh * 3600 + mm * 60 + ss


def read_raw_posicoes(spark: SparkSession, path: str) -> DataFrame:
    """S5+S6: schema-first PERMISSIVE read of the raw JSON zone."""
    return (
        spark.read.schema(RAW_POSICAO_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def corrupt_records(raw: DataFrame) -> DataFrame:
    """The quarantine: raw payloads that failed the schema (S6).

    A data column (``hr``) is projected alongside because Spark refuses
    scans whose only referenced column is the internal corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — this also avoids caching
    the full scan, which the error message suggests but a 100 TB zone
    forbids.
    """
    return raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "hr", "_corrupt_record"
    )


def flatten_posicoes(raw: DataFrame) -> DataFrame:
    """P1+P2+P3+F1: nested ``{l: [{vs: [...]}]}`` → flat fact rows.

    Column-for-column the projection of
    ``etl-olho-vivo-ingestao-posicoes.py:50-61`` with explicit types
    (POSICOES_SCHEMA).  ``explode`` drops documents with NULL/empty ``l``
    and lines with NULL/empty ``vs`` — exactly the rows the reference's
    for-loops never visit.
    """
    if "_corrupt_record" in raw.columns:
        raw = raw.filter(F.col("_corrupt_record").isNull())
    return (
        raw.select(F.explode("l").alias("line"))
        .select("line.*", F.explode("line.vs").alias("v"))
        .select(
            F.col("c").alias("letreiro"),
            F.col("cl").alias("codigo_linha"),
            F.col("sl").alias("sentido_linha"),
            F.col("lt0").alias("destino_linha"),
            F.col("lt1").alias("origem_linha"),
            F.col("v.p").alias("prefixo_veiculo"),
            F.col("v.a").alias("acessibilidade"),
            iso8601_to_epoch(F.col("v.ta")).alias("timestamp"),
            F.col("v.py").alias("py"),
            F.col("v.px").alias("px"),
        )
    )


def ingest_posicoes(spark: SparkSession, raw_path: str) -> DataFrame:
    """Stage-2 composition: raw JSON path/glob → typed posicoes frame."""
    df = flatten_posicoes(read_raw_posicoes(spark, raw_path))
    if df.columns != POSICOES_COLUMNS:  # if/raise: asserts vanish under -O
        raise RuntimeError(
            f"flatten produced columns {df.columns}, expected "
            f"{POSICOES_COLUMNS}"
        )
    return df
