"""Multi-dimensional (Z-order) file clustering for two-column row-group
pruning.

``io/sinks.py``'s within-partition sort gives parquet row groups tight
min/max ranges on ONE leading key; a predicate on any other column still
qualifies every row group.  Z-ordering interleaves the bits of two
normalized dimensions into one sort key, so row groups become tight
RECTANGLES in (c1, c2) space — a selective predicate on EITHER column
prunes most groups (the layout trick behind Delta's OPTIMIZE ZORDER BY
and ClickHouse/Databricks multi-dim clustering; public technique,
Morton 1966).

Scale notes (100 TB):
- the z-value is pure Column bit math (whole-stage codegen, no UDF);
- normalization needs each dimension's global min/max — ONE tiny agg
  scan (or pass precomputed bounds, e.g. from table profiles, to make
  the write single-pass);
- ``repartitionByRange`` on the z-value gives GLOBAL clustering: range
  sampling is one lightweight pass, then each task sorts its slice
  (spillable) — no full global sort materialization;
- pruning works through ordinary parquet min/max stats on the ORIGINAL
  columns — readers need no knowledge of the layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two NON-NEGATIVE ints < 2**bits.

    Bit i of c1 lands at position 2i, bit i of c2 at 2i+1; the result
    fits a signed 64-bit long for ``bits`` ≤ 31.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(one), 2 * i + 1
            )
        )
    return z


def _normalize(col: Column, lo, hi, bits: int) -> Column:
    """Min-max scale an orderable numeric column onto [0, 2**bits).

    Clamped: on the precomputed-``bounds`` path the profile is stale the
    moment new data lands, and an out-of-range value would otherwise
    alias across the z-range (zvalue reads only the low bits — the
    NEWEST rows would sort next to the oldest and silently destroy the
    clustering).  Clamping pins stragglers to the curve's edge instead.
    """
    top = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(top / (float(hi) - float(lo)))
    ).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(top).cast("long"), scaled))


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    n_files: int | None = None,
    bounds: dict | None = None,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet globally clustered on the Z-order curve of
    (``c1``, ``c2``).

    ``bounds``: optional ``{col: (min, max)}`` to skip the bounds scan
    (pass profiler output at scale; values outside stale bounds clamp
    to the curve's edge rather than aliasing).  ``n_files`` sizes the
    range partitioning (default: current shuffle partitions).
    """
    if c1 == c2:
        raise ValueError(
            "write_zordered needs two DISTINCT columns — interleaving a "
            "column with itself is just a 1-D sort sold as 2-D clustering"
        )
    if "__z" in df.columns:
        raise ValueError(
            "input already has a __z column — rename it; the writer uses "
            "that name for the sort key and would silently drop yours"
        )
    need = [c for c in (c1, c2) if not bounds or c not in bounds]
    got = dict(bounds or {})
    if need:
        (row,) = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in need],
            *[F.max(c).alias(f"hi_{c}") for c in need],
        ).collect()
        for c in need:
            got[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    z = zvalue(
        _normalize(F.col(c1), *got[c1], bits),
        _normalize(F.col(c2), *got[c2], bits),
        bits,
    )
    spark = df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)
