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


def _rowgroup_ranges(path: str, col: str):
    out = []
    for f in glob.glob(f"{path}/data=*/*.parquet"):
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
