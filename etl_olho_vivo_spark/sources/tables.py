"""Central reader for the driver's synthetic parquet tables.

The driver generated its parquet with nanosecond timestamps
(``TIMESTAMP(NANOS)``), which Spark's parquet reader rejects by default.
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) reads them as
nanos-since-epoch LongType; we then rebuild a proper ``TimestampType`` at
microsecond precision via ``timestamp_micros`` — exactly the truncation
DuckDB applies when it reads TIMESTAMP_NS into its microsecond TIMESTAMP,
so both engines see identical values.

``timestamp_micros`` is timezone-free (epoch arithmetic), keeping query
results independent of the session timezone the driver happens to use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# timestamp-typed columns per table (everything else is int/double/string)
_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def pin_parquet_instant_confs(spark: SparkSession) -> None:
    """The ONE definition of the parquet instant-semantics policy.

    - ``nanosAsLong``: TIMESTAMP(NANOS) columns read as raw BIGINT nanos
      (Spark has no nanos timestamp; the reader raises without this),
      converted explicitly by callers after a dtype check;
    - ``inferTimestampNTZ=false``: µs-timestamp columns resolve as
      TIMESTAMP instants (stored micros = UTC epoch, same as DuckDB's
      epoch_ms), not TIMESTAMP_NTZ — keeps every epoch extraction
      session-TZ-free, and keeps parquet WRITTEN from such frames
      instant-typed too.

    Call before any parquet read or derived-parquet write outside
    ``read_table`` (which pins it itself).  A policy change edits this
    function only.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_ms_filter: tuple[str, str, int] | None = None,
) -> DataFrame:
    """Read one synthetic table with a normalized schema.

    ``ts_ms_filter=(col, op, epoch_ms)`` (op ∈ ``<=``/``>=``) applies a
    time-range predicate **on the raw nanos BIGINT column before the
    timestamp conversion** — a comparison on the converted column is a
    function of the scan column and can never reach the parquet reader,
    while the raw-column comparison shows up in ``PushedFilters`` and
    skips whole row groups via column statistics.  Millisecond semantics
    match ``unix_millis(converted) op epoch_ms`` exactly:
    ``ms <= C  ⇔  ns <= C·10⁶ + 999999`` and ``ms >= C  ⇔  ns >= C·10⁶``.
    """
    pin_parquet_instant_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    is_ns = {
        c: dict(df.dtypes).get(c) == "bigint" for c in _TS_COLS.get(name, [])
    }
    if ts_ms_filter is not None:
        c, op, ms = ts_ms_filter
        if op not in ("<=", ">="):
            raise ValueError(
                f"ts_ms_filter op must be '<=' or '>=', got {op!r} "
                "(anything else would silently apply the wrong bound)"
            )
        if is_ns.get(c):
            bound = ms * 1_000_000 + (999_999 if op == "<=" else 0)
            df = df.filter(F.col(c) <= bound if op == "<=" else F.col(c) >= bound)
        else:
            expr = F.unix_millis(F.col(c))
            df = df.filter(expr <= ms if op == "<=" else expr >= ms)
    for c, ns in is_ns.items():
        if ns:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
