"""Query registry — the driver-contract surface.

Each entry pairs a Spark DataFrame implementation with the equivalent ANSI
SQL that DuckDB runs on the same parquet tables (driver views: ``region
nation customer supplier part orders lineitem events documents
embeddings``).  The driver compares row-count + schema + order-insensitive
value-hash at sf0.01 — so both sides must agree *bit-for-bit* after the
declared rounding.

Determinism rules used throughout (why the hashes match):
- integer arithmetic everywhere possible (exact in both engines);
- ``+ - * /`` on doubles are IEEE-754 exact-rounded → identical across
  engines given identical inputs;
- transcendentals (sin/cos/atan2) may differ by 1 ulp across libm
  implementations → any value derived from them is rounded (the pipeline's
  own ``round(distancia, 2)`` — reference F4 — already does this);
- aggregates over doubles are order-dependent in the last ulps → every
  aggregated double output is rounded (4-6 dp) on BOTH sides;
- window orderings always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import speed
from etl_olho_vivo_spark.sources.events_adapter import (
    POSICOES_FROM_EVENTS_SQL,
    posicoes_from_events,
)
from etl_olho_vivo_spark.sources.tables import read_table


@dataclass(frozen=True)
class Query:
    """One driver-contract query: Spark impl + optional DuckDB oracle.

    ``driver=False`` keeps a query in REGISTRY (benchmarked by bench.py,
    usable by tests) but outside the driver's correctness window — the
    harness records rows for the first 50 registered queries only, so
    a pattern already oracle-checked by a sibling query can yield its
    slot to a new operator without losing its own oracle coverage
    (tests still compare it against ``Query.oracle`` directly).

    ``bench=False`` (round 15) additionally exempts a row from the
    bench.py warm sweep, for rows whose warm time would carry no plan
    signal: a PERF-TWIN whose post-setup plan is identical to a
    sibling's (audio_containment reruns video_frame_containment's
    store-probe plan on a different surrogate fold — timing it twice
    measures the same plan twice), or a MEASUREMENT-FREE fixture
    whose wall is dominated by scratch I/O rather than a query plan
    (orc_roundtrip times tmpfs write speed).  Either way the exempt
    row costs no sweep wall and no 2000-char tail-window budget.  A
    bench-exempt row MUST carry an oracle (enforced below): its value
    is parity, so losing the perf row without the parity row would
    make it dead weight."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    driver: bool = True
    bench: bool = True


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    driver: bool = True,
    bench: bool = True,
):
    if not bench and oracle is None:
        raise ValueError(
            f"{name}: bench=False requires an oracle — a row exempt "
            f"from the perf sweep must still be parity-verified"
        )

    def deco(fn):
        REGISTRY[name] = Query(
            fn=fn, oracle=oracle, doc=doc, driver=driver, bench=bench
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared SQL fragments (mirror the Column expressions in functions/ exactly —
# same operation order, so doubles match bit-for-bit).
# ---------------------------------------------------------------------------

# interval_30min_label / interval_30min_date (functions/timeops.py)
_SQL_BUCKET = '(("timestamp" // 1800) * 1800)'


def _sql_hhmm(epoch: str) -> str:
    return (
        f"lpad(CAST((({epoch}) % 86400) // 3600 AS VARCHAR), 2, '0') || ':' || "
        f"lpad(CAST(((({epoch}) % 86400) % 3600) // 60 AS VARCHAR), 2, '0')"
    )


_SQL_INTERVALO = f"{_sql_hhmm(_SQL_BUCKET)} || '-' || {_sql_hhmm(_SQL_BUCKET + ' + 1800')}"
_SQL_DATA = (
    f"CAST(DATE '1970-01-01' + CAST({_SQL_BUCKET} // 86400 AS INT) AS VARCHAR)"
)

# haversine_m (functions/geo.py) — same association order as the Column expr.
_SQL_HAVERSINE = (
    "6371000.0 * (2 * atan2("
    "sqrt("
    "  sin((radians(py) - radians(py_anterior)) / 2)"
    "  * sin((radians(py) - radians(py_anterior)) / 2)"
    "  + cos(radians(py_anterior)) * cos(radians(py))"
    "    * sin((radians(px) - radians(px_anterior)) / 2)"
    "    * sin((radians(px) - radians(px_anterior)) / 2)"
    "), "
    "sqrt(1 - ("
    "  sin((radians(py) - radians(py_anterior)) / 2)"
    "  * sin((radians(py) - radians(py_anterior)) / 2)"
    "  + cos(radians(py_anterior)) * cos(radians(py))"
    "    * sin((radians(px) - radians(px_anterior)) / 2)"
    "    * sin((radians(px) - radians(px_anterior)) / 2)"
    "))))"
)

# The cleaned per-pair speed frame (operators/speed.py:cleaned_speeds) as a
# DuckDB CTE chain over the events→posicoes adapter.
_SQL_CLEANED = f"""
WITH pos AS ({POSICOES_FROM_EVENTS_SQL}),
labeled AS (
  SELECT *, {_SQL_INTERVALO} AS intervalo, {_SQL_DATA} AS data FROM pos
),
lagged AS (
  SELECT *,
    lag(px) OVER w AS px_anterior,
    lag(py) OVER w AS py_anterior,
    lag("timestamp") OVER w AS timestamp_anterior
  FROM labeled
  WINDOW w AS (PARTITION BY prefixo_veiculo ORDER BY "timestamp", event_id)
),
paired AS (
  SELECT *, "timestamp" - timestamp_anterior AS tempo
  FROM lagged WHERE px_anterior IS NOT NULL
),
gap_ok AS (
  SELECT * FROM paired WHERE tempo <= 600 AND tempo > 0
),
dist AS (
  SELECT *, round({_SQL_HAVERSINE}, 2) AS distancia FROM gap_ok
),
speed AS (
  SELECT *, distancia / tempo AS velocidade_media FROM dist
),
cleaned AS (
  SELECT * FROM speed WHERE velocidade_media <= 33
)
"""


def _cleaned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = posicoes_from_events(spark, sf_dir)
    return speed.cleaned_speeds(pos, tiebreakers=("event_id",))


def _agg_exact(cleaned: DataFrame) -> DataFrame:
    """The A1+A2 rollup with order-independent (integer-quantized) sums.

    The adapter's coordinates lie exactly on a 1e-5-degree grid and
    ``distancia`` has exactly 2 dp (reference F4 rounding), so quantizing to
    integers before summing is lossless — and integer sums are bit-exact
    regardless of partial-aggregation order, at any scale factor.  Mirrors
    the ``_SQL_AGG_EXACT`` fragment below operation-for-operation.
    """
    from etl_olho_vivo_spark.schemas import AGG_KEYS

    pxk = F.round((F.col("px") + 46.85) * 100000.0, 0).cast("long")
    pyk = F.round((F.col("py") + 23.8) * 100000.0, 0).cast("long")
    dc = F.round(F.col("distancia") * 100.0, 0).cast("long")
    n = F.count(F.lit(1))
    return cleaned.groupBy(*AGG_KEYS).agg(
        (F.lit(-46.85) + (F.sum(pxk) / n) * F.lit(1e-5)).alias("px"),
        (F.lit(-23.8) + (F.sum(pyk) / n) * F.lit(1e-5)).alias("py"),
        # inputs are exact integers on both engines → the two divisions are
        # IEEE exact-rounded on identical values: no rounding needed (and
        # round() here would *create* cross-engine half-way mismatches)
        ((F.sum(dc) / 100.0) / F.sum("tempo")).alias("velocidade_media"),
        F.sum("tempo").alias("tempo"),
        (F.sum(dc) / 100.0).alias("distancia"),
    )


_SQL_AGG_EXACT_MEASURES = """
       -46.85 + (sum(CAST(round((px + 46.85) * 100000.0, 0) AS BIGINT))
                 / count(*)) * 1e-5                       AS px,
       -23.8 + (sum(CAST(round((py + 23.8) * 100000.0, 0) AS BIGINT))
                / count(*)) * 1e-5                        AS py,
       (sum(CAST(round(distancia * 100.0, 0) AS BIGINT)) / 100.0)
             / sum(tempo)                                 AS velocidade_media,
       CAST(sum(tempo) AS BIGINT)                         AS tempo,
       sum(CAST(round(distancia * 100.0, 0) AS BIGINT)) / 100.0 AS distancia
"""


# ---------------------------------------------------------------------------
# Domain pipeline queries (SURVEY §2.2-§2.8 on the events stand-in)
# ---------------------------------------------------------------------------


@register(
    "velocidades_agregadas",
    f"""{_SQL_CLEANED}
SELECT data, intervalo, letreiro, codigo_linha, sentido_linha, origem_linha,
       destino_linha, prefixo_veiculo,
       {_SQL_AGG_EXACT_MEASURES}
FROM cleaned
GROUP BY data, intervalo, letreiro, codigo_linha, sentido_linha,
         destino_linha, origem_linha, prefixo_veiculo, acessibilidade
""",
    doc="Flagship: full stage-3 pipeline → 9-key agg with Σd/Σt speed "
    "(ref etl-olho-vivo-velocidades-medias.py:89-158; A1+A2).",
)
def q_velocidades_agregadas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_olho_vivo_spark.schemas import VELOCIDADES_COLUMNS

    agg = _agg_exact(_cleaned_events(spark, sf_dir))
    return agg.select(*VELOCIDADES_COLUMNS)


@register(
    "lentidao",
    f"""{_SQL_CLEANED}
SELECT data, intervalo, letreiro, codigo_linha, sentido_linha, origem_linha,
       destino_linha, prefixo_veiculo, px, py, velocidade_media, tempo,
       distancia
FROM cleaned WHERE velocidade_media < 1.4
""",
    doc="Slow points < 1.4 m/s, un-aggregated (ref :137-140; P7+P8).",
)
def q_lentidao(spark: SparkSession, sf_dir: str) -> DataFrame:
    return speed.lentidao(_cleaned_events(spark, sf_dir))


@register(
    "acessiveis",
    f"""{_SQL_CLEANED}
SELECT data, intervalo, letreiro, codigo_linha, sentido_linha, origem_linha,
       destino_linha, prefixo_veiculo,
       -46.85 + (sum(CAST(round((px + 46.85) * 100000.0, 0) AS BIGINT))
                 / count(*)) * 1e-5 AS px,
       -23.8 + (sum(CAST(round((py + 23.8) * 100000.0, 0) AS BIGINT))
                / count(*)) * 1e-5  AS py,
       acessibilidade
FROM cleaned
GROUP BY data, intervalo, letreiro, codigo_linha, sentido_linha,
         destino_linha, origem_linha, prefixo_veiculo, acessibilidade
""",
    doc="Mean position per interval with accessibility flag (ref :166; P8).",
)
def q_acessiveis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_olho_vivo_spark.schemas import ACESSIVEIS_COLUMNS

    agg = _agg_exact(_cleaned_events(spark, sf_dir))
    return agg.select(*ACESSIVEIS_COLUMNS)


@register(
    "lag_window",
    """
SELECT event_id, user_id, value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS delta_value,
       epoch_ms(ts) // 1000
         - lag(epoch_ms(ts) // 1000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_s
FROM events
""",
    doc="W1: lag(1) partitioned by entity with deterministic tiebreaker "
    "(ref :101-103).",
)
def q_lag_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = F.expr("unix_millis(ts) div 1000")
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta_value"),
        (s - F.lag(s, 1).over(w)).alias("delta_s"),
    )


@register(
    "interval_30min",
    f"""
WITH t AS (SELECT epoch_ms(ts) // 1000 AS "timestamp", user_id FROM events)
SELECT {_SQL_DATA} AS data, {_SQL_INTERVALO} AS intervalo,
       count(*) AS n_pings, count(DISTINCT user_id) AS n_users
FROM t GROUP BY 1, 2
""",
    doc="F2: 30-min tumbling bucket labels, byte-parity with "
    "get_30min_interval (ref :26-31).",
)
def q_interval_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_olho_vivo_spark.functions.timeops import (
        interval_30min_date,
        interval_30min_label,
    )

    e = read_table(spark, sf_dir, "events")
    ts = F.expr("unix_millis(ts) div 1000")
    return (
        e.select(
            interval_30min_date(ts).alias("data"),
            interval_30min_label(ts).alias("intervalo"),
            "user_id",
        )
        .groupBy("data", "intervalo")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "haversine_pairs",
    f"""
WITH pos AS ({POSICOES_FROM_EVENTS_SQL}),
lagged AS (
  SELECT *,
    lag(px) OVER w AS px_anterior,
    lag(py) OVER w AS py_anterior,
    lag("timestamp") OVER w AS timestamp_anterior
  FROM pos
  WINDOW w AS (PARTITION BY prefixo_veiculo ORDER BY "timestamp", event_id)
)
SELECT event_id, prefixo_veiculo,
       "timestamp" - timestamp_anterior AS tempo,
       round({_SQL_HAVERSINE}, 2) AS distancia
FROM lagged WHERE px_anterior IS NOT NULL
""",
    doc="F3+F4: haversine as a pure Column expression, rounded to 2 dp "
    "(ref :34-58,115-121). No UDF — whole-stage codegen.",
)
def q_haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_olho_vivo_spark.functions.geo import haversine_m

    pos = posicoes_from_events(spark, sf_dir)
    lagged = speed.with_lag(pos, tiebreakers=("event_id",))
    return lagged.filter(F.col("px_anterior").isNotNull()).select(
        "event_id",
        "prefixo_veiculo",
        (F.col("timestamp") - F.col("timestamp_anterior")).alias("tempo"),
        F.round(
            haversine_m(
                F.col("py_anterior"), F.col("px_anterior"), F.col("py"), F.col("px")
            ),
            2,
        ).alias("distancia"),
    )


@register(
    "flatten_roundtrip",
    "SELECT user_id, event_type, event_id, value FROM events",
    doc="P1: two-level nest → double explode (UNNEST×2) reproduces the "
    "flatten of ref etl-olho-vivo-ingestao-posicoes.py:47-62; oracle is the "
    "flat identity, proving losslessness.",
)
def q_flatten_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    # nest: user → lines(event_type) → vehicles(event rows), like {l:[{vs:[…]}]}
    lvl1 = e.groupBy("user_id", "event_type").agg(
        F.sort_array(F.collect_list(F.struct("event_id", "value"))).alias("vs")
    )
    lvl2 = lvl1.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "vs"))).alias("l")
    )
    # flatten: explode ×2 + projection (the Spark restatement of the
    # reference's nested for-loop)
    return (
        lvl2.select("user_id", F.explode("l").alias("line"))
        .select("user_id", "line.event_type", F.explode("line.vs").alias("v"))
        .select("user_id", "event_type", "v.event_id", "v.value")
    )


# ---------------------------------------------------------------------------
# Public API used by __spark_entry__
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_plugins()
    return {name: q.fn for name, q in REGISTRY.items() if q.driver}


def oracle_sql() -> dict[str, str]:
    _load_plugins()
    return {
        name: q.oracle
        for name, q in REGISTRY.items()
        if q.driver and q.oracle is not None
    }


def _load_plugins() -> None:
    """Import the sibling registry modules (they self-register)."""
    import etl_olho_vivo_spark.registry_data  # noqa: F401
    import etl_olho_vivo_spark.registry_extra  # noqa: F401
    import etl_olho_vivo_spark.registry_ingest  # noqa: F401
    import etl_olho_vivo_spark.registry_relational  # noqa: F401
    import etl_olho_vivo_spark.registry_scale  # noqa: F401
