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


def test_upsert_missing_column_raises_not_erases(spark, tmp_path):
    """Updates LACKING a column the table has must raise — merging would
    silently erase that column from every rewritten partition."""
    path = str(tmp_path / "wide")
    spark.createDataFrame(
        [(1, "a", "keep-me", 1, "d1")], ["k", "v", "note", "ver", "day"]
    ).write.partitionBy("day").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a1", 2, "d1")], ["k", "v", "ver", "day"]  # no 'note'
    )
    with pytest.raises(ValueError, match="note"):
        upsert_partitioned(
            spark, path, updates, keys=["k"], version_col="ver",
            partition_col="day",
        )
    assert spark.read.parquet(path).collect()[0]["note"] == "keep-me"


def test_upsert_into_empty_directory_self_heals(spark, tmp_path):
    """An existing-but-empty target dir (a first write that died before
    committing files) must behave like a first write, not fail forever."""
    path = tmp_path / "emptydir"
    path.mkdir()
    updates = spark.createDataFrame(
        [(1, "a", 1, "d1")], ["k", "v", "ver", "day"]
    )
    upsert_partitioned(
        spark, str(path), updates, keys=["k"], version_col="ver",
        partition_col="day",
    )
    assert _snapshot(spark, str(path)) == {1: ("a", 1, "d1")}


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


def test_null_partition_rows_survive_merge(spark, tmp_path):
    """isin() is three-valued: a NULL partition value in the updates
    must not silently delete the existing null-partition rows (the
    pre-fix filter excluded them from the merge while dynamic overwrite
    still rewrote the partition)."""
    from etl_olho_vivo_spark.io.upsert import upsert_partitioned

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 1, None), (2, 1, None), (3, 1, "d1")],
        "k long, version long, day string",
    )
    upsert_partitioned(spark, path, base, ["k"], "version", "day")
    upd = spark.createDataFrame(
        [(1, 2, None)], "k long, version long, day string"
    )
    upsert_partitioned(spark, path, upd, ["k"], "version", "day")
    back = sorted(
        (r["k"], r["version"]) for r in spark.read.parquet(path).collect()
    )
    # k=1 upgraded, k=2 (same null partition) SURVIVES, k=3 untouched
    assert back == [(1, 2), (2, 1), (3, 1)]


def test_type_drift_fails_loudly(spark, tmp_path):
    from etl_olho_vivo_spark.io.upsert import upsert_partitioned

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 1, "d1")], "k long, version long, day string"
    )
    upsert_partitioned(spark, path, base, ["k"], "version", "day")
    drifted = spark.createDataFrame(
        [(1, "9", "d1")], "k long, version string, day string"
    )
    with pytest.raises(ValueError, match="drifted"):
        upsert_partitioned(spark, path, drifted, ["k"], "version", "day")
