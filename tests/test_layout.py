"""Fact-table file layout — within-partition clustering for row-group
pruning.

Day-partitioning prunes directories; what prunes INSIDE a file is the
within-file sort: parquet keeps per-row-group min/max stats, and
clustered rows give each row group a tight key range.  These tests write
the same posicoes fact with and without clustering at a tiny forced
row-group size, then read the parquet footers: a single-line predicate
must qualify only a small fraction of the clustered row groups, while
the unclustered layout leaves (nearly) every row group qualifying —
i.e. stats exist but prune nothing.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from etl_olho_vivo_spark.io.sinks import write_posicoes_parquet
from etl_olho_vivo_spark.sources.events_adapter import posicoes_from_events

SF = "/root/testdata/sf0.01"
TINY_GROUPS = {"parquet.block.size": 16 * 1024}


def _rowgroup_ranges(path: str, col: str, pattern: str = "data=*/*.parquet"):
    out = []
    for f in glob.glob(f"{path}/{pattern}"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            out.append((st.min, st.max))
    return out


@pytest.fixture(scope="module")
def pos(spark):
    return posicoes_from_events(spark, SF)


def test_clustered_rowgroups_prune_line_predicates(spark, pos, tmp_path):
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_posicoes_parquet(pos, clustered, writer_options=TINY_GROUPS)
    write_posicoes_parquet(
        pos, plain, cluster=False, writer_options=TINY_GROUPS
    )

    rc = _rowgroup_ranges(clustered, "codigo_linha")
    rp = _rowgroup_ranges(plain, "codigo_linha")
    assert len(rc) > 5, "forced row groups too coarse for the probe"

    target = 7  # one of the 20 adapter lines
    hit_c = sum(1 for lo, hi in rc if lo <= target <= hi)
    hit_p = sum(1 for lo, hi in rp if lo <= target <= hi)
    # unclustered: the uniform line column makes ~every group span the
    # full range, so the predicate qualifies (almost) all of them
    assert hit_p >= len(rp) * 0.9, (hit_p, len(rp))
    # clustered: only the row groups actually holding the line qualify
    assert hit_c <= len(rc) * 0.5, (hit_c, len(rc))
    assert hit_c < hit_p


def test_clustered_write_roundtrips_identically(spark, pos, tmp_path):
    """Clustering is layout-only: same rows, same values, same schema."""
    clustered = str(tmp_path / "c")
    plain = str(tmp_path / "p")
    write_posicoes_parquet(pos, clustered)
    write_posicoes_parquet(pos, plain, cluster=False)
    a = spark.read.parquet(clustered)
    b = spark.read.parquet(plain)
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


# ---------------------------------------------------------------------------
# Z-order (two-dimensional) clustering — io/layout.py
# ---------------------------------------------------------------------------


def test_zvalue_is_morton_interleave(spark):
    """Known Morton codes: bit i of c1 → position 2i, of c2 → 2i+1."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.io.layout import zvalue

    cases = [(0, 0, 0), (3, 0, 5), (0, 1, 2), (3, 1, 7),
             (5, 3, 0b011011), (2**15, 2**15, 0b11 << 30)]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in cases], "a long, b long"
    ).withColumn("z", zvalue(F.col("a"), F.col("b"), bits=16))
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for a, b, want in cases:
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)

    import pytest

    with pytest.raises(ValueError, match="bits"):
        zvalue(F.col("a"), F.col("b"), bits=40)


@pytest.fixture(scope="module")
def zlayouts(spark, tmp_path_factory):
    """events (user_id, ts_ms) written z-ordered vs 1-D ts-sorted, with
    forced-tiny row groups."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.io.layout import write_zordered
    from etl_olho_vivo_spark.sources.tables import read_table

    ev = read_table(spark, SF, "events")
    df = ev.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    base = tmp_path_factory.mktemp("zorder")
    zdir, pdir = str(base / "z"), str(base / "plain")
    write_zordered(
        df, zdir, "user_id", "ts_ms",
        writer_options={"parquet.block.size": str(16 * 1024)},
    )
    (
        df.repartitionByRange(8, "ts_ms")
        .sortWithinPartitions("ts_ms")
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024)
        .parquet(pdir)
    )
    (row,) = df.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("ts_ms").alias("tlo"), F.max("ts_ms").alias("thi"),
    ).collect()
    return {"df": df, "z": zdir, "plain": pdir, "bounds": row}


def _flat_ranges(path: str, col: str):
    return _rowgroup_ranges(path, col, pattern="*.parquet")


def test_zorder_prunes_both_dimensions(spark, zlayouts):
    """The point of the layout: a ~2%-wide predicate on EITHER column
    skips most z-ordered row groups, while the 1-D ts-sort leaves every
    group qualifying for the user predicate (stats exist, prune nothing).
    Measured at calibration: z 10/32 user hits + 6/32 ts hits vs plain
    16/16 user hits — margins set well off the observed values."""
    b = zlayouts["bounds"]
    uw = (b["uhi"] - b["ulo"]) // 50
    tw = (b["thi"] - b["tlo"]) // 50
    u0, t0 = b["ulo"] + 3 * uw, b["tlo"] + 3 * tw

    def hits(path, col, lo, hi):
        r = _flat_ranges(path, col)
        return sum(1 for glo, ghi in r if not (ghi < lo or glo > hi)), len(r)

    zu, zn = hits(zlayouts["z"], "user_id", u0, u0 + uw)
    zt, _ = hits(zlayouts["z"], "ts_ms", t0, t0 + tw)
    pu, pn = hits(zlayouts["plain"], "user_id", u0, u0 + uw)
    pt, _ = hits(zlayouts["plain"], "ts_ms", t0, t0 + tw)
    assert zn > 5, "forced row groups too coarse for the probe"
    # z: BOTH dimensions prune
    assert zu <= zn * 0.6, (zu, zn)
    assert zt <= zn * 0.6, (zt, zn)
    # 1-D: only the sort key prunes; user predicate qualifies everything
    assert pu >= pn * 0.9, (pu, pn)
    assert pt <= pn * 0.5, (pt, pn)


def test_zorder_write_roundtrips_identically(spark, zlayouts):
    """Z-ordering is layout-only: same rows, same values; the helper
    column never leaks into the file."""
    a = spark.read.parquet(zlayouts["z"])
    assert sorted(a.columns) == ["event_id", "ts_ms", "user_id"]
    cols = ["event_id", "ts_ms", "user_id"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, zlayouts["df"].select(*cols).collect())
    )


def test_zorder_precomputed_bounds_single_pass(spark, zlayouts):
    """The scale path: pass profiler-derived bounds and the write skips
    its bounds scan yet clusters equivalently — both dimensions still
    prune (row-group BOUNDARIES may shift slightly: repartitionByRange
    samples, so exact layout equality is not the contract)."""
    from etl_olho_vivo_spark.io.layout import write_zordered

    b = zlayouts["bounds"]
    out = zlayouts["z"] + "_bounded"
    write_zordered(
        zlayouts["df"], out, "user_id", "ts_ms",
        bounds={
            "user_id": (b["ulo"], b["uhi"]),
            "ts_ms": (b["tlo"], b["thi"]),
        },
        writer_options={"parquet.block.size": str(16 * 1024)},
    )
    uw = (b["uhi"] - b["ulo"]) // 50
    tw = (b["thi"] - b["tlo"]) // 50
    u0, t0 = b["ulo"] + 3 * uw, b["tlo"] + 3 * tw
    ru = _flat_ranges(out, "user_id")
    rt = _flat_ranges(out, "ts_ms")
    hu = sum(1 for lo, hi in ru if not (hi < u0 or lo > u0 + uw))
    ht = sum(1 for lo, hi in rt if not (hi < t0 or lo > t0 + tw))
    assert hu <= len(ru) * 0.6, (hu, len(ru))
    assert ht <= len(rt) * 0.6, (ht, len(rt))
    # and it is the same data
    assert spark.read.parquet(out).count() == zlayouts["df"].count()


def test_zorder_constant_column_degenerates_safely(spark, tmp_path):
    """A constant dimension (hi == lo) must not divide by zero — the
    z-value collapses to the other dimension's interleave."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.io.layout import write_zordered

    df = spark.range(100).select(
        F.col("id"), F.lit(7).alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "const")
    write_zordered(df, out, "k", "v", n_files=2)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_zorder_rejects_same_column_and_z_collision(spark):
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.io.layout import write_zordered

    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    with pytest.raises(ValueError, match="DISTINCT"):
        write_zordered(df, "/tmp/never", "id", "id")
    clash = df.withColumn("__z", F.lit(1))
    with pytest.raises(ValueError, match="__z"):
        write_zordered(clash, "/tmp/never", "id", "v")


def test_zorder_stale_bounds_clamp_not_alias(spark, tmp_path):
    """A value beyond stale precomputed bounds must pin to the curve's
    edge (sorts last), not wrap to the low bits and land among the
    smallest keys."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.io.layout import _normalize, zvalue

    df = spark.createDataFrame(
        [(0,), (50,), (100,), (150,), (-10,)], "v long"
    )
    z = zvalue(
        _normalize(F.col("v"), 0, 100, 8),
        F.lit(0).cast("long"),
        bits=8,
    )
    got = {r["v"]: r["z"] for r in df.select("v", z.alias("z")).collect()}
    # in-range keeps order; out-of-range clamps to the curve's extremes
    # (low → 0, high → the all-even-bits top code), never wrapping below
    # an in-range value
    top_code = sum(1 << (2 * i) for i in range(8))
    assert got[-10] == got[0] == 0
    assert got[150] == top_code
    assert got[0] < got[50] < got[100] <= got[150]
