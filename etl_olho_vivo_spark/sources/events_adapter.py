"""Deterministic ``events`` → ``posicoes`` adapter.

The driver's synthetic tables (TESTDATA.md) have no bus-position table, so
the engine's domain pipeline is exercised on ``events`` (``event_id BIGINT,
ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props
STRING``) mapped *deterministically* into the posicoes shape
(FIXTURES.md §4): users are vehicles, event times are (compressed) ping
times, and coordinates are integer-arithmetic pseudo-positions inside the
São Paulo bounding box.

Every mapping below is pure integer/exact-double arithmetic, so the
identical expression in ANSI SQL (``POSICOES_FROM_EVENTS_SQL``) produces
bit-identical values in DuckDB — that is what makes the oracle hash-check
of the full pipeline possible.

Time is compressed by ``TIME_DIV = 50`` so that consecutive per-user gaps
(median ≈ 27 000 s in the synthetic stream) land around the pipeline's
600 s acquisition-gap threshold — both sides of every cleaning filter get
real traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_olho_vivo_spark.sources.tables import read_table

TIME_DIV = 50
COORD_MOD = 30000          # 0.30 degrees of span at 1e-5 deg per step
COORD_STEP = 1e-5
LON_PRIME = 7919           # decorrelates px from py


def posicoes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the ``events`` parquet at ``sf_dir`` into a posicoes DataFrame."""
    return posicoes_project(read_table(spark, sf_dir, "events"))


def posicoes_project(e: DataFrame) -> DataFrame:
    """The adapter projection on any events-shaped frame (batch or stream).

    Streaming-safe: every column is a pure per-row expression, so the same
    plan fragment runs under ``readStream`` for the streaming parity
    queries.
    """
    cl = (F.col("user_id") % 20).cast("long")
    return e.select(
        F.concat(
            (cl + 1000).cast("string"), F.lit("-"), ((cl % 90) + 10).cast("string")
        ).alias("letreiro"),
        cl.alias("codigo_linha"),
        ((F.col("user_id") % 2) + 1).cast("int").alias("sentido_linha"),
        F.concat(F.lit("DEST_"), cl.cast("string")).alias("destino_linha"),
        F.concat(F.lit("ORIG_"), cl.cast("string")).alias("origem_linha"),
        F.col("user_id").alias("prefixo_veiculo"),
        ((F.col("user_id") % 10) < 7).alias("acessibilidade"),
        F.expr(f"unix_millis(ts) div 1000 div {TIME_DIV}").alias("timestamp"),
        (F.lit(-23.8) + (F.col("event_id") % COORD_MOD) * COORD_STEP).alias("py"),
        (
            F.lit(-46.85)
            + ((F.col("event_id") * LON_PRIME) % COORD_MOD) * COORD_STEP
        ).alias("px"),
        # carried through as the deterministic window-order tiebreaker
        F.col("event_id"),
    )


# DuckDB view of the SAME mapping (epoch_ms // 1000 // 50 is integer
# division in both engines; all coordinate math is exact-rounded IEEE754,
# identical across engines).
POSICOES_FROM_EVENTS_SQL = f"""
SELECT
  CAST((user_id % 20) + 1000 AS VARCHAR) || '-' ||
    CAST(((user_id % 20) % 90) + 10 AS VARCHAR)      AS letreiro,
  user_id % 20                                       AS codigo_linha,
  CAST((user_id % 2) + 1 AS INT)                     AS sentido_linha,
  'DEST_' || CAST(user_id % 20 AS VARCHAR)           AS destino_linha,
  'ORIG_' || CAST(user_id % 20 AS VARCHAR)           AS origem_linha,
  user_id                                            AS prefixo_veiculo,
  (user_id % 10) < 7                                 AS acessibilidade,
  epoch_ms(ts) // 1000 // {TIME_DIV}                 AS "timestamp",
  -23.8 + (event_id % {COORD_MOD}) * {COORD_STEP}    AS py,
  -46.85 + ((event_id * {LON_PRIME}) % {COORD_MOD}) * {COORD_STEP} AS px,
  event_id
FROM events
"""
