"""The bench's scale tier is manual tooling (SPARK_GRAFT_SCALE=1) — this
guards its machinery from rot at a toy size: 2 replicas of sf0.001,
full replicate → time-at-1× → time-at-N× → ratio pipeline, one JSON
line with every expected query present."""

from __future__ import annotations

import json

import pytest


@pytest.mark.sweep
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


def test_warm_lines_survive_2000_char_tail_capture():
    """The driver keeps only the LAST 2000 chars of bench stdout
    (len(tail)==2000 in BENCH_r07/r08) and a straddled JSON line is
    wholly unparseable.  Every warm per-query time must be recoverable
    from that window: parts 1..k + the headline line must fit whole, and
    the straddler (if any) must be part 0, whose keys the headline
    line's "queries" dict duplicates.  Simulated with the real round-8
    registry names + headroom for several future registrations."""
    import bench

    names = [
        "velocidades_agregadas", "lentidao", "acessiveis", "lag_window",
        "interval_30min", "haversine_pairs", "flatten_roundtrip",
    ] + [f"operator_query_{i:02d}" for i in range(52)]
    timings = {n: round(0.5 + i * 0.01, 3) for i, n in enumerate(names)}
    load = [1.1, 1.2, 1.3]
    lines = bench._warm_lines(timings, "0.1", load)
    for ln in lines:
        assert len(ln) <= bench.WARM_CHUNK_CHARS, len(ln)
    headline = json.dumps({
        "metric": "headline_total_wall", "value": 3.7, "unit": "sec",
        "queries": {n: timings[n] for n in bench.HEADLINE},
        "sf": "0.1", "loadavg_start": load,
    })
    stream = "\n".join(["x" * 5000] + lines + [headline]) + "\n"
    recovered: dict[str, float] = {}
    for ln in stream[-2000:].splitlines():
        try:
            d = json.loads(ln)
        except ValueError:
            continue
        recovered.update(d.get("queries", {}))
    assert recovered == timings


def test_warm_lines_clip_cheapest_first():
    """When the registry grows past the window, the chunk that straddles
    (= is lost) must hold the CHEAPEST non-headline queries: expensive
    operators are the regression signal the artifact exists for.
    (Each part's first entry is the redundant headline pad key — skip
    it when checking the cheapest-first ordering.)"""
    import bench

    names = bench.HEADLINE + [f"q{i:03d}" for i in range(60)]
    timings = {n: round(0.1 + i * 0.05, 3) for i, n in enumerate(names)}
    lines = bench._warm_lines(timings, "0.1", [1.0, 1.0, 1.0])
    seen: list[float] = []
    for ln in lines[1:]:
        q = json.loads(ln)["queries"]
        assert next(iter(q)) in bench.HEADLINE
        seen.extend(v for k, v in q.items() if k not in bench.HEADLINE)
    assert seen == sorted(seen)


def test_warm_lines_lead_every_part_with_redundant_headline_key():
    """Round 10: BENCH_r09's capture boundary clipped warm part 1's
    first key.  Every part >= 1 must now LEAD with a headline key
    (already guaranteed on the tail summary line), so a front clip of
    any chunk destroys only redundant data — and the pad must not push
    any line over the chunk budget."""
    import bench

    names = bench.HEADLINE + [f"q{i:03d}" for i in range(60)]
    timings = {n: round(0.1 + i * 0.05, 3) for i, n in enumerate(names)}
    lines = bench._warm_lines(timings, "0.1", [1.0, 1.0, 1.0])
    assert len(lines) >= 3
    for ln in lines:
        assert len(ln) <= bench.WARM_CHUNK_CHARS, len(ln)
    for ln in lines[1:]:
        q = json.loads(ln)["queries"]
        first = next(iter(q))
        assert first in bench.HEADLINE
        assert q[first] == timings[first]
    # simulate a clip eating each part's first key: all non-headline
    # data must still be recoverable
    recovered: set[str] = set()
    for ln in lines[1:]:
        q = json.loads(ln)["queries"]
        recovered.update(list(q)[1:])
    assert recovered == {n for n in timings if n not in bench.HEADLINE}


def test_wait_for_idle_disabled_and_bounded(monkeypatch):
    """SPARK_GRAFT_BENCH_MAX_LOAD=0 disables the gate; a huge threshold
    passes immediately without sleeping."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD", "0")
    load, ok = bench._wait_for_idle()
    assert ok and len(load) == 3
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD", "1e9")
    load, ok = bench._wait_for_idle()
    assert ok


def test_wait_for_idle_gates_on_loadavg5_too(monkeypatch):
    """Round 10: the gate must consider loadavg5, not just loadavg1 —
    BENCH_r09 slipped through at loadavg1 1.86 / loadavg5 3.60 and read
    ~20% hot.  With a fake loadavg of (1.0, 5.0, 5.0) and a threshold
    of 2.0 the gate must NOT pass."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 5.0, 5.0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, ok = bench._wait_for_idle()
    assert not ok
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 1.5, 5.0))
    load, ok = bench._wait_for_idle()
    assert ok


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


def test_warm_lines_carry_taint_on_every_line():
    """The module contract: a load-tainted bench marks EVERY output
    line, because the artifact is read tail-truncated and whichever
    line survives must carry the marker."""
    import json as _json

    import bench

    timings = {f"q{i}": 0.1 * i for i in range(40)}
    timings.update({n: 0.5 for n in bench.HEADLINE})
    tainted = bench._warm_lines(timings, "0.1", [9.0, 9.0, 9.0],
                                gate_ok=False)
    assert len(tainted) >= 2
    for line in tainted:
        assert _json.loads(line)["load_gate"] == "exceeded"
    clean = bench._warm_lines(timings, "0.1", [0.1, 0.1, 0.1], gate_ok=True)
    for line in clean:
        assert "load_gate" not in _json.loads(line)
