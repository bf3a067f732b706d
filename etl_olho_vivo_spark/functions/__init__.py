"""Scalar function library — pure Column expressions (JVM-side, codegen'd).

The reference's two scalar "functions" are row-at-a-time Python
(``haversine`` via ``df.apply(axis=1)`` and ``get_30min_interval`` via
``Series.map`` — ``etl-olho-vivo-velocidades-medias.py:90,115-118``).  Here
they are Catalyst expressions: no Python boundary in the hot path, fully
inside whole-stage codegen.
"""

from etl_olho_vivo_spark.functions.geo import haversine_m
from etl_olho_vivo_spark.functions.timeops import (
    interval_30min_date,
    interval_30min_label,
    interval_bucket,
)

__all__ = [
    "haversine_m",
    "interval_bucket",
    "interval_30min_label",
    "interval_30min_date",
]
