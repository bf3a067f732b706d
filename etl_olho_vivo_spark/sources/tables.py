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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table with a normalized schema."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # µs-timestamp columns (orders/lineitem) must resolve as TIMESTAMP
    # instants (stored micros = UTC epoch, same as DuckDB's epoch_ms), not
    # TIMESTAMP_NTZ — keeps every epoch extraction session-TZ-free.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
