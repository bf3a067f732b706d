"""The bench's scale tier is manual tooling (SPARK_GRAFT_SCALE=1) — this
guards its machinery from rot at a toy size: 2 replicas of sf0.001,
full replicate → time-at-1× → time-at-N× → ratio pipeline, one JSON
line with every expected query present."""

from __future__ import annotations

import json


def test_scale_tier_emits_complete_ratio_line(spark, capsys, monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SCALE_REPLICAS", "2")
    bench.scale_tier(spark, "/root/testdata/sf0.001")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    line = json.loads(out)
    assert line["metric"] == "scale_ratio_detail"
    assert line["replicas"] == 2
    assert "errors" not in line, line.get("errors")
    assert set(line["queries"]) == set(
        bench.HEADLINE + bench.PAIR_HEAVY + bench.SCALE_EXTRA
        + ["dedup_lines"]
    )
    for name, rec in line["queries"].items():
        assert rec["t1"] > 0 and rec["t2"] > 0, (name, rec)
        assert rec["ratio"] is not None


def test_scale_env_zero_means_off(monkeypatch):
    """SPARK_GRAFT_SCALE=0/false must run the NORMAL sweep (regression
    for the truthy-string env trap) — exercised through the SAME
    bench.scale_enabled() gate main() calls."""
    import bench

    for off in ("", "0", "false"):
        monkeypatch.setenv("SPARK_GRAFT_SCALE", off)
        assert not bench.scale_enabled(), off
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("SPARK_GRAFT_SCALE", on)
        assert bench.scale_enabled(), on
    monkeypatch.delenv("SPARK_GRAFT_SCALE")
    assert not bench.scale_enabled()
