"""Geospatial Column expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0  # reference constant, etl-olho-vivo-velocidades-medias.py:40


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) points.

    Semantics-parity with the reference's ``haversine``
    (``etl-olho-vivo-velocidades-medias.py:34-58``):
    - R = 6 371 000 m,
    - ``a = sin²(Δlat/2) + cos(lat1)·cos(lat2)·sin²(Δlon/2)``,
      ``d = 2·R·atan2(√a, √(1−a))``,
    - any NULL input → NULL output (the reference returns ``None`` on any
      null, ``:36-37``; Spark's null propagation gives this for free).

    Implemented as a pure Column expression — no UDF, stays inside
    whole-stage codegen; at 100 TB this is the difference between a
    JVM-vectorized scan stage and an Arrow round-trip per batch.
    """
    # sin²/cos² via multiplication (not pow): x*x is IEEE exact-rounded and
    # bit-identical across engines, Math.pow(x, 2) is not guaranteed to be.
    dlat_half = (F.radians(lat2) - F.radians(lat1)) / 2
    dlon_half = (F.radians(lon2) - F.radians(lon1)) / 2
    a = (
        F.sin(dlat_half) * F.sin(dlat_half)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon_half) * F.sin(dlon_half)
    )
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(F.lit(1) - a))
    return F.lit(EARTH_RADIUS_M) * c
