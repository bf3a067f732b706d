"""Keyed upsert into partitioned parquet (io/upsert.py): MERGE semantics,
partition pruning, and idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.io.upsert import upsert_partitioned


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [
            # (key, value, version, day)
            (1, "a0", 1, "d1"),
            (2, "b0", 1, "d1"),
            (3, "c0", 1, "d2"),
            (4, "x0", 1, "d3"),   # partition untouched by updates
        ],
        ["k", "v", "ver", "day"],
    )
    (
        base.write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return path


def _snapshot(spark, path):
    return {
        r["k"]: (r["v"], r["ver"], r["day"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_merges_and_prunes(spark, table):
    updates = spark.createDataFrame(
        [
            (1, "a1", 2, "d1"),   # update existing key
            (5, "n1", 1, "d2"),   # insert new key
            (3, "c_old", 0, "d2"),  # STALE version — must not win
        ],
        ["k", "v", "ver", "day"],
    )
    upsert_partitioned(
        spark, table, updates, keys=["k"], version_col="ver",
        partition_col="day",
    )
    got = _snapshot(spark, table)
    assert got[1] == ("a1", 2, "d1")      # updated
    assert got[2] == ("b0", 1, "d1")      # untouched key in touched part
    assert got[3] == ("c0", 1, "d2")      # stale update rejected
    assert got[4] == ("x0", 1, "d3")      # untouched partition intact
    assert got[5] == ("n1", 1, "d2")      # inserted


def test_upsert_ties_prefer_update_and_idempotent(spark, table):
    updates = spark.createDataFrame(
        [(2, "b_new", 1, "d1")], ["k", "v", "ver", "day"]  # same version
    )
    upsert_partitioned(
        spark, table, updates, keys=["k"], version_col="ver",
        partition_col="day",
    )
    first = _snapshot(spark, table)
    assert first[2] == ("b_new", 1, "d1")  # tie → update wins
    # idempotent: replaying the same batch changes nothing
    upsert_partitioned(
        spark, table, updates, keys=["k"], version_col="ver",
        partition_col="day",
    )
    assert _snapshot(spark, table) == first


def test_upsert_schema_drift_raises_not_wipes(spark, table):
    """An update frame with a column the table lacks must surface the
    analysis error — NOT be treated as a first write (which would
    replace touched partitions with only the update rows)."""
    from pyspark.errors import AnalysisException

    updates = spark.createDataFrame(
        [(1, "a1", 2, "d1", "extra")], ["k", "v", "ver", "day", "new_col"]
    )
    before = _snapshot(spark, table)
    with pytest.raises(AnalysisException):
        upsert_partitioned(
            spark, table, updates, keys=["k"], version_col="ver",
            partition_col="day",
        )
    assert _snapshot(spark, table) == before  # untouched


def test_upsert_into_empty_path(spark, tmp_path):
    path = str(tmp_path / "fresh")
    updates = spark.createDataFrame(
        [(1, "a", 1, "d1")], ["k", "v", "ver", "day"]
    )
    upsert_partitioned(
        spark, path, updates, keys=["k"], version_col="ver",
        partition_col="day",
    )
    assert _snapshot(spark, path) == {1: ("a", 1, "d1")}
