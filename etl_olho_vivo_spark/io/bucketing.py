"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides.  Bucketing pays that shuffle ONCE at write time — rows are hash-
distributed into a fixed number of buckets on the join key and each bucket
is sorted — so every subsequent join/groupBy on that key reads co-located,
pre-sorted buckets and plans a SortMergeJoin with **zero Exchange** (and,
with matching sort order, zero Sort).  This is the storage-level analogue
of the salted/broadcast strategies in ``operators/skew.py``: broadcast for
small dims, salting for skewed shuffles, bucketing for repeated big-big
joins on a stable key.

The reference has no analogue (single-file-per-day pandas, SURVEY §1.3);
this is pure engine capability, exercised by ``tests/test_plans.py``.

Notes for a real cluster:
- bucket count is a layout contract: pick ``n_buckets`` ≈ total data /
  target partition size (128-512 MB) and keep it identical on both join
  sides — mismatched counts fall back to a shuffle on one side;
- bucketed tables must go through the catalog (``saveAsTable``) — a plain
  ``.parquet(path)`` write silently drops bucketing metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``keys``."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)
