"""Explicit schemas for every dataset the engine touches.

The reference infers everything (pandas dtype inference,
``etl-olho-vivo-ingestao-posicoes.py:68``); the engine declares schemas so
scans prune columns, corrupt records are quarantined instead of crashing a
file loop, and 100 TB reads never pay an inference pass.

Sources of truth:
- raw nested API shape: access pattern ``etl-olho-vivo-ingestao-posicoes.py:48-60``
- flat fact table: flatten projection ``etl-olho-vivo-ingestao-posicoes.py:50-61``
  + data-dictionary PDF page 1 (``posicoes_onibus_raw``)
- output column orders: ``etl-olho-vivo-velocidades-medias.py:140,158,166``
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw zone: one JSON document per API poll — {hr, l: [{c, cl, sl, lt0, lt1,
# qv, vs: [{p, a, ta, py, px}]}]} (two-level nesting: lines -> vehicles).
# ---------------------------------------------------------------------------
VEHICLE_SCHEMA = T.StructType(
    [
        T.StructField("p", T.LongType()),        # vehicle prefix (unique id)
        T.StructField("a", T.BooleanType()),     # wheelchair accessible
        T.StructField("ta", T.StringType()),     # ISO-8601 UTC capture time
        T.StructField("py", T.DoubleType()),     # latitude
        T.StructField("px", T.DoubleType()),     # longitude
    ]
)

LINE_SCHEMA = T.StructType(
    [
        T.StructField("c", T.StringType()),      # display sign e.g. "5015-10"
        T.StructField("cl", T.LongType()),       # line id
        T.StructField("sl", T.IntegerType()),    # direction 1|2
        T.StructField("lt0", T.StringType()),    # secondary terminal
        T.StructField("lt1", T.StringType()),    # primary terminal
        T.StructField("qv", T.IntegerType()),    # vehicle count
        T.StructField("vs", T.ArrayType(VEHICLE_SCHEMA)),
    ]
)

RAW_POSICAO_SCHEMA = T.StructType(
    [
        T.StructField("hr", T.StringType()),     # poll wall-clock "HH:MM"
        T.StructField("l", T.ArrayType(LINE_SCHEMA)),
        # PERMISSIVE-mode quarantine column (SURVEY §2.1 S6)
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Flat fact table (one row per vehicle ping).
# ---------------------------------------------------------------------------
POSICOES_SCHEMA = T.StructType(
    [
        T.StructField("letreiro", T.StringType()),
        T.StructField("codigo_linha", T.LongType()),
        T.StructField("sentido_linha", T.IntegerType()),
        T.StructField("destino_linha", T.StringType()),
        T.StructField("origem_linha", T.StringType()),
        T.StructField("prefixo_veiculo", T.LongType()),
        T.StructField("acessibilidade", T.BooleanType()),
        T.StructField("timestamp", T.LongType()),  # unix seconds, UTC
        T.StructField("py", T.DoubleType()),       # latitude
        T.StructField("px", T.DoubleType()),       # longitude
    ]
)

POSICOES_COLUMNS = [f.name for f in POSICOES_SCHEMA.fields]

# Output column orders (exact, from the reference projections).
# velocidades_agregadas / lentidao: etl-olho-vivo-velocidades-medias.py:140,158
VELOCIDADES_COLUMNS = [
    "data", "intervalo", "letreiro", "codigo_linha", "sentido_linha",
    "origem_linha", "destino_linha", "prefixo_veiculo", "px", "py",
    "velocidade_media", "tempo", "distancia",
]
LENTIDAO_COLUMNS = list(VELOCIDADES_COLUMNS)
# acessiveis: etl-olho-vivo-velocidades-medias.py:166
ACESSIVEIS_COLUMNS = [
    "data", "intervalo", "letreiro", "codigo_linha", "sentido_linha",
    "origem_linha", "destino_linha", "prefixo_veiculo", "px", "py",
    "acessibilidade",
]

# The 9 aggregation keys of the velocidades rollup
# (etl-olho-vivo-velocidades-medias.py:146).
AGG_KEYS = [
    "data", "intervalo", "letreiro", "codigo_linha", "sentido_linha",
    "destino_linha", "origem_linha", "prefixo_veiculo", "acessibilidade",
]
