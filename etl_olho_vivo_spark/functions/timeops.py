"""Time-bucketing Column expressions.

Reference: ``get_30min_interval`` (``etl-olho-vivo-velocidades-medias.py:
26-31``) floors a unix timestamp to its 30-minute bucket **in UTC**
(``utcfromtimestamp``) and emits two labels:

- ``intervalo`` — ``"HH:MM-HH:MM"`` (zero-padded, hyphen, end may be
  ``"00:00"`` for the 23:30 bucket),
- ``data`` — ``"YYYY-MM-DD"`` of the bucket start.

These are implemented with *pure integer arithmetic on the epoch* (no
session-timezone-dependent functions like ``from_unixtime``), so results are
identical regardless of the Spark session timezone and trivially match an
ANSI-SQL oracle.  All expressions are codegen'd JVM Column math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUCKET_S = 1800  # 30 minutes


def interval_bucket(ts_seconds: Column) -> Column:
    """Floor unix-seconds to its 30-minute bucket start (unix seconds)."""
    return (F.floor(ts_seconds / BUCKET_S) * BUCKET_S).cast("long")


def _hhmm(epoch_s: Column) -> Column:
    """``"HH:MM"`` of a UTC epoch, by integer arithmetic (TZ-independent).

    ``pmod``, not ``%``: Spark's ``%`` keeps the dividend's sign, so a
    pre-1970 epoch (schema-valid year-typo ta strings produce them)
    would yield a negative seconds-of-day and garbage labels like
    ``-1:00--1:-3``; pmod wraps exactly like the reference's
    ``utcfromtimestamp`` clock.
    """
    secs_of_day = F.pmod(epoch_s, F.lit(86400))
    hh = F.floor(secs_of_day / 3600).cast("int")
    mm = F.floor((secs_of_day % 3600) / 60).cast("int")
    return F.concat(
        F.lpad(hh.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(mm.cast("string"), 2, "0"),
    )


def interval_30min_label(ts_seconds: Column) -> Column:
    """``"HH:MM-HH:MM"`` label of the 30-minute bucket containing the ping.

    Byte-parity with the reference label format
    (``etl-olho-vivo-velocidades-medias.py:29``): zero-padded 24h clock,
    hyphen separator, end label wraps to ``00:00`` at midnight.
    """
    start = interval_bucket(ts_seconds)
    return F.concat(_hhmm(start), F.lit("-"), _hhmm(start + BUCKET_S))


def interval_30min_date(ts_seconds: Column) -> Column:
    """``"YYYY-MM-DD"`` (UTC) of the bucket start
    (``etl-olho-vivo-velocidades-medias.py:30``).

    ``date_add('1970-01-01', epoch_days)`` is timezone-free (pure date
    arithmetic), unlike ``from_unixtime``.
    """
    start = interval_bucket(ts_seconds)
    epoch_days = F.floor(start / 86400).cast("int")
    return F.date_add(F.to_date(F.lit("1970-01-01")), epoch_days).cast("string")
