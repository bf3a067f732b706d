"""Hot-key skew probe — correctness under real skew, oracle-checked.

The driver's synthetic events table is uniform; skew handling
(`operators/skew.py` salting, the flagship's per-vehicle window, AQE
skew-join splitting) is therefore only ever exercised on benign keys.
This module rebuilds sf0.01 events with **one user owning ~half of all
rows** (every even event_id remapped to a single hot key) and re-runs
the events-backed canary queries against their own DuckDB oracles over
the SAME skewed parquet: values must stay exact when a key is hot —
salting must recombine exactly, the lag window must order the fat
vehicle partition correctly, session/gap logic must survive a
many-thousand-row group.

This is a correctness probe, not a perf probe: at 100 TB a hot key is a
straggler problem the salted operators address; here we pin that the
answers they (and the unsalted engine paths) produce on skewed data are
the same answers an independent engine computes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark import registry

BASE = "/root/testdata/sf0.01"
HOT_USER = 7

# events-backed queries with oracles, covering the skew-relevant shapes:
# per-key windows (lag/sessionize), salted agg + salted join, CDC max_by
CANARIES = [
    "velocidades_agregadas",
    "lag_window",
    "session_window_stats",
    "sessionize_events",
    "salted_event_type_stats",
    "salted_skew_join_events",
    "latest_event_per_user",
    "approx_distinct_users",
]


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    registry.queries()
    d = str(tmp_path_factory.mktemp("skew"))
    # derived-parquet gotchas (see .claude/skills/verify/SKILL.md): pin
    # instant semantics before writing, cast ts explicitly
    from etl_olho_vivo_spark.sources.tables import pin_parquet_instant_confs

    pin_parquet_instant_confs(spark)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    # single parquet FILE (not a Spark directory): DuckDB's oracle views
    # read the same path the driver layout uses
    import glob
    import shutil

    staging = str(tmp_path_factory.mktemp("skew_staging"))
    ev.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_id") % 2 == 0, F.lit(HOT_USER))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{d}/events.parquet")
    # the oracle connection creates views for every table name
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        os.symlink(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.slow
@pytest.mark.parametrize("name", CANARIES)
def test_oracle_parity_on_hot_key(spark, skew_dir, name):
    from tests.oracle_check import compare, duck_connection

    con = duck_connection(skew_dir)
    try:
        sdf = registry.REGISTRY[name].fn(spark, skew_dir)
        # REGISTRY, not entry_mod.oracle_sql(): canaries demoted out of
        # the driver's 50-row window (driver=False) keep their oracles
        oracle = registry.REGISTRY[name].oracle
        problems = compare(sdf, con.execute(oracle).df())
        assert not problems, problems
    finally:
        con.close()


def test_skew_is_real(spark, skew_dir):
    """The probe input genuinely is skewed: the hot user owns ~half."""
    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    total = ev.count()
    hot = ev.filter(F.col("user_id") == HOT_USER).count()
    assert hot >= total * 0.45, (hot, total)
