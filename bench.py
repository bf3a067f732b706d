#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints JSON lines, least valuable first — the driver's tail-capture keeps
only the last 2000 chars of stdout (measured: len(tail) == 2000 in both
BENCH_r07 and BENCH_r08), so anything that must survive goes LAST
(BENCH_r{3,4} lost their headline, BENCH_r07 the entire WARM per-query
dict, BENCH_r08 the warm dict's first key, all to front-truncation):
    {"metric": "all_queries_detail", "queries_cold": {...},
     "queries_fn": {...}, "calib_headline": {...}, ...}           # may
        lose its front; cold times, per-query fn() construction walls
        (the setup work the noop sink never times — round 16) and the
        per-headline-query steal stamps are the sacrificial detail
    {"metric": "warm", "queries": {...}}                           # ALL
        non-headline warm entries (2-dp), chunked CHEAPEST-FIRST so a
        front truncation costs the cheapest chunk, never the expensive
        regression signals.  Round 13: the "part" counter and the
        "_detail" suffix were dropped and loadavg_start moved to the
        sacrificial cold line — the 67-query registry plus the new
        calib stamp outgrew the 2000-char window — and the round-9
        part-1 "straddle pad" (a redundant headline key leading chunk
        1) was REMOVED as dead weight: a front-clipped JSON line never
        parses at all, pad or no pad, so the pad could not save a
        single byte of chunk 1 — it only displaced a real key into the
        shared budget (the r13 bench measured the real block 25 chars
        over the window while the padded-format budget test passed at
        1995).  The degradation contract is now explicit in
        tests/test_bench_scale.py: the whole block SHOULD fit (asserted
        at realistic value widths against the live registry), the
        summary plus the most-expensive chunk MUST fit, and (round 14,
        after the 68th registry row reached the window's capacity)
        growth past the window clips the CHEAPEST rows one at a time,
        LOUDLY — "warm_clipped": N on the tail-guaranteed summary, the
        clipped names + full values on the sacrificial cold line —
        never a silent chunk straddle.  The summary also serializes
        compact (",", ":") since round 14: the default separators
        spent ~70 chars of the shared window on whitespace.
    {"metric": "headline_total_wall", "value": <total sec>, "unit": "sec",
     "queries": {<headline 7, 3-dp>}, "calib_s": [b, a],
     "calib_py_s": p, "gate_margin": m, "sf": <sf>}                # LAST
        — the summary is the artifact's final <=400 chars, so it ALWAYS
        survives the 2000-char tail: the calibration pair lives here
        (and on the cold line), not on every warm chunk, where it paid
        ~25 chars x k chunks of the shared window for no extra
        survivability.

Round 11 (round-10 verdict "What's wrong" #1): the warm parts plus the
summary are BUDGETED to fit the 2000-char window TOGETHER — headline
warm times live only on the summary line (the old part 0 duplicated
them and pushed 8 cheap keys out of the window in BENCH_r10),
non-headline values are 2-dp (10 ms granularity; the headline keeps
3-dp), only part 1 carries the redundant lead key, and the part lines
drop every byte that isn't load-bearing (short metric name, no "of"
counter — with the whole block fitting the window, part integrity is
the budget test's job, not the artifact's).
tests/test_bench_scale.py pins the budget against the LIVE registry
with every value at its realistic ceiling (<10 s warm), so a future
registration that would overflow the window fails the suite instead of
silently clipping the artifact.

Load gate (round 9): r7 AND r8 benched at loadavg 4-5, leaving three
sub-100 ms headline upticks unattributable (round-8 verdict "What's
wrong" #1).  main() now WAITS for the effective load
max(loadavg1, loadavg5, 0.75*loadavg15) to drop under
$SPARK_GRAFT_BENCH_MAX_LOAD (default 2.0; "0" disables the gate) before
starting the JVM, retrying for up to ~20 minutes.  If the machine never
settles the bench still runs — numbers beat no numbers — but every line
is stamped "load_gate": "exceeded" and the process exits rc=3 so the
driver records the artifact as load-tainted.  Round 13: loadavg15
joined the gate (damped 0.75 — it decays slowest and overlaps l5's
signal) because BENCH_r12 started at l15 = 2.85 under the l1/l5-only
gate and read ~2x hot; the comfort target dropped to 0.6*threshold so
a wait that succeeds at comfort yields gate_margin >= 0.75 (the
round-11 ask BENCH_r12 missed at 0.53).

Host-speed calibration (round 13, r12 verdict "Next round" #1): two
same-day r12 benches of IDENTICAL code differed 2x and both sat
1.5-3x above r11 on untouched queries — guest loadavg cannot see host
contention (steal), so every artifact now carries a fixed-work,
data-independent probe: "calib_s" = [before, after] min-of-3 wall
times of a pinned 200M-row in-JVM xxhash64 aggregate over
spark.range (32 pinned partitions, 1-row collect), measured before
and after the sweep.  The summary line adds "calib_py_s" (a pinned
pure-Python loop) to separate JVM-side from interpreter-side drift.
BASELINE.md records the idle-host calibration baseline; a future
reader divides headline by (calib_s / baseline_calib) to normalize
out host drift before calling anything a plan regression.

The HEADLINE set is frozen (BASELINE comparability across rounds); newer
registry queries are benchmarked too but only reported in "queries", not in
"value".  Results are materialized with the noop sink — full execution, no
driver collect cost.  Since round 3 each query runs twice with session
caches released in between; "queries" holds min(cold, warm) so one-time
codegen/JIT compile doesn't read as plan regression (BASELINE.md
documents the change), "queries_cold" the first-run times.

Scale tier (SPARK_GRAFT_SCALE=1, round 6): instead of the registry
sweep, replicate every scale-probe input 10× from the bench sf dir
(events + documents + embeddings, key-perturbed — the same replica
shapes tests/test_scale_probe.py pins plans on) and time the headline
7 plus the four pair-heavy dedup/similarity queries at 1× and 10×,
reporting per-query scaling ratios.  A linear operator shows ≈10×;
the verbatim document/embedding replicas make near-dup candidate
structure ~10× DENSER per block (≈100× candidate pairs), so the pair
queries' EXPECTED ratio is super-linear in wall time while staying
linear in work-per-candidate — BASELINE.md records the measured curve
and the justification per query.  The 1× base must be sf0.1: at
sf0.01 the pair queries are sub-second fixed-overhead jobs and the
ratio is pure noise (measured 0.5-2× scatter).  Pair queries run
min-of-3 (their caches + GC make two runs noisy; observed 136 s vs
13 s first-vs-warm on minhash at 10×).  One JSON line:
{"metric": "scale_ratio_detail", "replicas": N, "queries":
{name: {"t1": s, "t10": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Frozen at round 1 — do not change (BASELINE.md comparability).
HEADLINE = [
    "velocidades_agregadas",
    "lentidao",
    "acessiveis",
    "lag_window",
    "interval_30min",
    "haversine_pairs",
    "flatten_roundtrip",
]

# The four pair-heavy dedup/similarity queries whose scaling curve the
# 10× tier measures (banded/blocked pair stages — the operators whose
# cost could silently grow super-linearly in the candidate structure).
PAIR_HEAVY = [
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "doc_editdist_near_dup",
]

# Corpus operators whose curve the tier also records:
# eval_decontamination — broadcast gram probe, expected ≈linear after
# the explode_outer fix (and the tier would catch the O(tokens²)
# inferred-filter regression loudly); repeated_span_dedup — gram
# aggregate + join + anti join, replicas densify removable occurrences
# with the data; doc_bigram_cross_entropy — count aggregates + scoring
# joins, expected ≈linear.  (dedup_lines stays ad-hoc below: its
# newline-separator operator shape has no registry row — the driver row
# dedup_corpus_lines uses the space separator.  embedding_near_dup_dial
# is ad-hoc too — round 11: the fixed-cell registry query re-run with
# n_cells ∝ corpus rows, so the tier SHOWS the near-linear wall the
# dial buys next to the oracle-pinned fixed-16-cell row.)  doc_stupid_backoff
# (round 9) — per-order count aggregates + broadcast-join scoring,
# expected ≈linear like the other count-relation LM row.
SCALE_EXTRA = [
    "eval_decontamination",
    "repeated_span_dedup",
    "doc_bigram_cross_entropy",
    "doc_stupid_backoff",
    # round-10 additions (round-9 verdict "What's missing" #4): the
    # operators whose 10x behavior was plan-PINNED but not wall-clock
    # MEASURED — bloom overlap (bitmap relation ∝ distinct grams),
    # keep-best (component propagation over a denser pair graph),
    # pq/ivfpq top-k (ADC scan ∝ corpus; replicas densify nothing —
    # expected ≈linear), and the KN scorer (count relations + broadcast
    # scoring joins, expected ≈linear like the other LM rows)
    "bloom_gram_overlap",
    "dedup_cluster_keep_best",
    "pq_topk",
    "ivfpq_topk",
    "doc_kneser_ney",
    # round-13 addition: the new driver row — persisted-fingerprint
    # store read + 4-band pigeonhole pairing; replicas densify the
    # 16-bit-segment bands ~10x like the other pair rows, expected
    # sub-linear wall (store build is once per (sf_dir, pid), so the
    # min-of-3 times the read+pair path the row exists to measure)
    "media_fp_pairs",
    # round-14 addition: sub-clip containment — frame-granular
    # pigeonhole pairing + matched-frame-fraction rollup over the
    # persisted frame store.  The verbatim document replicas multiply
    # frame rows ~Nx AND true cross-replica frame matches ~N²x (every
    # replica family shares identical gram frames), so like
    # media_fp_pairs the expected wall is super-linear in DATA while
    # staying linear in verified output pairs
    "video_frame_containment",
    # round-15 addition: the 2D grid radius self-join.  Replicated
    # events add new vehicles at NEW pseudo-positions (px/py derive
    # from the shifted event_id), so per-bucket ping density rises
    # ~10x and TRUE close pairs grow ~quadratically in density —
    # expected wall super-linear in data, linear in output pairs,
    # while the naive all-pairs formulation (the oracle) would grow
    # 100x in candidates regardless of output
    "geo_pairs",
]


# Keep every warm-detail line comfortably under the driver's 2000-char
# tail window so a front-truncation boundary clips at most ONE chunk.
# The REAL budget is the whole-tail one (warm parts + summary <= 2000,
# pinned by tests/test_bench_scale.py against the live registry); the
# per-chunk cap only bounds straddle loss IF the registry ever outgrows
# the window again — and per-part overhead (~45 chars) counts against
# the whole-tail budget, so chunks are sized large (round 11: 450-char
# chunks × 5 parts was part of why BENCH_r10's block overflowed; round
# 14: 900-char chunks made THREE of them at 68 rows and the third
# chunk's overhead pushed the block past the window — two ~1250-char
# chunks carry the same rows with one overhead fewer, and tier 2
# (chunk + summary co-fit) still clears 2000 by ~400 chars).
WARM_CHUNK_CHARS = 1250
TAIL_WINDOW_CHARS = 2000


# loadavg15 decays slowest and half its signal is already in l5; the
# damping keeps a long-finished burst from blocking forever while still
# rejecting the BENCH_r12 condition (l15 = 2.85 -> effective 2.14 > 2.0).
LOAD15_DAMP = 0.75


def _effective_load(load: list[float]) -> float:
    """The gate's scalar: max(l1, l5, LOAD15_DAMP * l15)."""
    return max(load[0], load[1], LOAD15_DAMP * load[2])


def _wait_for_idle() -> tuple[list[float], bool]:
    """Block until _effective_load() < $SPARK_GRAFT_BENCH_MAX_LOAD
    (default 2.0), polling every 10 s for up to 120 tries (~20 min).
    Returns the final loadavg triple and whether the gate was satisfied.
    "0" disables.

    Round 10: the gate now includes loadavg5 — BENCH_r09 started at
    loadavg1 1.86 (under the old 1-minute-only gate) but loadavg5 3.60,
    and the artifact read ~20% above the same-round idle measurement
    (round-9 verdict "What's wrong" #1).  The 5-minute average decays
    with a 5-min time constant, hence the longer wait ceiling.

    Round 11: the r9 AND r10 official artifacts both started within 2%
    of the threshold (1.86, 1.97) — technically under the wire, zero
    margin.  The wait loop now targets a COMFORT level and only falls
    back to the bare threshold when the ceiling expires; the summary
    line carries "gate_margin" = threshold − effective_load so a
    marginal run is visible in the artifact itself.

    Round 13 (r12 verdict "Next round" #2): loadavg15 joined the gate
    (damped — module docstring) after BENCH_r12 passed at l15 = 2.85
    and read ~2x hot; comfort dropped 0.75→0.6 of the threshold so a
    comfort-satisfied start records gate_margin >= 0.75 (the missed
    r11 ask).  Ceiling extended 15→20 min: l15 needs ~3x l5's decay
    time."""
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    load = list(os.getloadavg())
    if max_load <= 0:
        return load, True
    comfort = 0.6 * max_load
    for _ in range(120):
        if _effective_load(load) < comfort:
            return load, True
        time.sleep(10)
        load = list(os.getloadavg())
    return load, _effective_load(load) < max_load


# Pinned calibration work sizes — NEVER change (cross-round
# comparability of calib_s is the whole point; a resize would need a
# new BASELINE.md calibration baseline and a name bump to calib2_s).
CALIB_RANGE_ROWS = 200_000_000
CALIB_RANGE_PARTITIONS = 32
CALIB_PY_LOOP = 3_000_000


def _calibrate_jvm(spark, runs: int = 3) -> float:
    """Fixed-work host-speed probe: min-of-``runs`` wall time of a
    pinned 200M-row xxhash64 sum over spark.range — data-independent
    (no I/O, no shuffle: range scan + partial agg + 32-row final agg),
    saturates all executor threads, 1-row collect.  TWO untimed runs
    first: whole-stage-codegen compile and the first JIT tier both
    land outside the minimum (measured: one warmup leaves the first
    timed pass ~25% above steady state; two leave repeated calls
    within ~5% — 0.194-0.212 s across back-to-back passes on the
    round-13 idle host).  The 20-bit mask keeps the sum ~2e14 <<
    LONG_MAX: the session runs ANSI mode, where an unmasked 200M-term
    xxhash64 sum overflows."""
    def run() -> None:
        spark.range(
            0, CALIB_RANGE_ROWS, 1, CALIB_RANGE_PARTITIONS
        ).selectExpr("sum(xxhash64(id) & 1048575) AS h").collect()

    run()
    run()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        out.append(time.perf_counter() - t0)
    return min(out)


def _calib_probe(spark) -> float:
    """ONE unwarmed pass of the calibration job — the per-headline-
    query steal probe (round 16, additions-only).  The full
    ``_calibrate_jvm`` pays 2 warmups + min-of-3 (~1 s) for a stable
    FLOOR; interleaved between headline queries we want the opposite:
    a cheap instantaneous reading whose EXCURSIONS over the session
    floor expose steal landing on a specific query's window.  JIT/
    codegen for this exact plan is already steady after the sweep-
    start ``_calibrate_jvm``."""
    t0 = time.perf_counter()
    spark.range(
        0, CALIB_RANGE_ROWS, 1, CALIB_RANGE_PARTITIONS
    ).selectExpr("sum(xxhash64(id) & 1048575) AS h").collect()
    return time.perf_counter() - t0


def _calibrate_py(runs: int = 3) -> float:
    """Single-core pure-Python spin (pinned loop): separates
    interpreter/host drift from JVM-side drift in the artifact."""
    def run() -> None:
        s = 0
        for i in range(CALIB_PY_LOOP):
            s += i * i & 1023

    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        out.append(time.perf_counter() - t0)
    return min(out)


def _warm_lines(
    timings: dict[str, float],
    gate_ok: bool = True,
    block_budget: int | None = None,
) -> tuple[list[str], list[str]]:
    """Serialize warm per-query times as chunked JSON lines (module
    docstring): the chunks carry ALL non-headline entries at 2-dp —
    headline warm times live only on the summary line, so nothing is
    duplicated into the budget twice.  Chunks are ordered (and filled)
    cheapest-first, so a front truncation of the tail window costs the
    cheapest chunk.

    ``block_budget`` (round 14 — the 68-row registry reached the
    2000-char window's capacity): the caller passes how many chars the
    whole warm block (chunks + separating newlines) may occupy beside
    the already-serialized summary.  When the entries exceed it, the
    CHEAPEST rows are dropped one at a time and returned in the second
    element so the caller can stamp ``warm_clipped`` on the
    tail-guaranteed summary — registry growth now costs one cheap row
    at a time, LOUDLY, instead of a whole chunk silently straddling
    the truncation boundary."""
    compact = {"separators": (",", ":")}
    # cheapest-first: if the tail window ever overflows, the clipped
    # chunk is the one holding the CHEAPEST queries — regressions on
    # the expensive operators are what the artifact is for.  2-dp
    # values: 10 ms granularity is within idle-run noise for the
    # non-headline rows and buys ~60 chars of window headroom.
    rest = sorted(
        ((n, round(t, 2)) for n, t in timings.items() if n not in HEADLINE),
        key=lambda nt: nt[1],
    )
    base_overhead = len(json.dumps(
        {"metric": "warm", "queries": {}}, **compact,
    )) + (len('"load_gate":"exceeded",') if not gate_ok else 0)

    def pack(entries):
        chunks: list[dict[str, float]] = []
        cur: dict[str, float] = {}
        budget = WARM_CHUNK_CHARS - base_overhead
        used = 0
        for n, t in entries:
            cost = len(json.dumps({n: t}, **compact)) + 1
            if cur and used + cost > budget:
                chunks.append(cur)
                cur, used = {}, 0
            cur[n] = t
            used += cost
        if cur:
            chunks.append(cur)
        return chunks

    # taint marker on EVERY line (module contract): the artifact is read
    # in tail-truncated form, so a consumer must see the taint on
    # whichever line survives, not only on the summary.  (The calib
    # stamp does NOT get the same treatment: taint is one short token,
    # calib is ~25 chars/chunk, and the tail-guaranteed summary already
    # carries the pair — module docstring.)
    taint = {} if gate_ok else {"load_gate": "exceeded"}

    def render(entries):
        return [
            json.dumps(
                {"metric": "warm", "queries": q, **taint}, **compact,
            )
            for q in pack(entries)
        ]

    clipped: list[str] = []
    lines = render(rest)
    if block_budget is not None:
        while rest and sum(len(ln) + 1 for ln in lines) > block_budget:
            clipped.append(rest.pop(0)[0])  # cheapest first
            lines = render(rest)
    return lines, clipped


def scale_enabled() -> bool:
    """True iff the scaling-curve tier should replace the normal sweep
    ("0"/"false" mean OFF — not the truthy-string trap)."""
    return os.environ.get("SPARK_GRAFT_SCALE", "") not in ("", "0", "false")


def _time_query(spark, fn, sf_dir: str, release, runs: int = 2) -> float:
    """min-of-``runs`` noop-sink wall time, caches released between runs."""
    out = []
    for _ in range(runs):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.perf_counter() - t0)
        release()
    return min(out)


def scale_tier(spark, sf_dir: str) -> None:
    """Time headline + pair-heavy queries at 1× and at ``replicas``×,
    print one scale_ratio_detail JSON line (LAST — tail-survivable)."""
    import shutil
    import tempfile

    from etl_olho_vivo_spark import registry
    from etl_olho_vivo_spark.caching import release_session_caches
    from etl_olho_vivo_spark.replicate import (
        replicate_documents,
        replicate_embeddings,
        replicate_events,
    )

    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
    registry.queries()
    calib_before = round(_calibrate_jvm(spark), 3)
    dN = tempfile.mkdtemp(prefix="bench_scale_")
    try:
        replicate_events(
            spark, f"{sf_dir}/events.parquet",
            f"{dN}/events.parquet", replicas,
        )
        replicate_documents(
            spark, f"{sf_dir}/documents.parquet",
            f"{dN}/documents.parquet", replicas,
        )
        replicate_embeddings(
            spark, f"{sf_dir}/embeddings.parquet",
            f"{dN}/embeddings.parquet", replicas,
        )
        def _dedup_lines_fn(spark, d):
            from etl_olho_vivo_spark.operators.dedup import dedup_lines
            from etl_olho_vivo_spark.sources.tables import read_table

            return dedup_lines(read_table(spark, d, "documents"))

        # the embedding near-dup DEFAULT row (round 15, formerly the
        # explicit "dial" row): the operator's own no-argument default
        # now derives n_cells ∝ corpus from DEFAULT_CELL_OCCUPANCY, so
        # this row measures exactly what a caller gets without passing
        # a grid — next to the fixed-16-cell registry row that
        # documents the density effect (that row's pin is the DuckDB
        # oracle's).
        def _embedding_default_fn(spark, d):
            from etl_olho_vivo_spark.registry_extra import (
                embedding_near_dup_frame,
            )

            return embedding_near_dup_frame(spark, d)

        adhoc = {
            "dedup_lines": _dedup_lines_fn,
            "embedding_near_dup_default": _embedding_default_fn,
        }
        out: dict[str, dict] = {}
        errors: dict[str, str] = {}
        for name in HEADLINE + PAIR_HEAVY + SCALE_EXTRA + list(adhoc):
            fn = adhoc.get(name) or registry.REGISTRY[name].fn
            runs = 2 if name in HEADLINE else 3
            try:
                t1 = _time_query(spark, fn, sf_dir,
                                 release_session_caches, runs)
                tN = _time_query(spark, fn, dN,
                                 release_session_caches, runs)
            except Exception as e:  # noqa: BLE001 — keep measuring
                errors[name] = repr(e)[:300]
                release_session_caches()
                continue
            out[name] = {
                "t1": round(t1, 3),
                f"t{replicas}": round(tN, 3),
                "ratio": round(tN / t1, 2) if t1 > 0 else None,
            }
        line = {
            "metric": "scale_ratio_detail",
            "replicas": replicas,
            "queries": out,
            "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "calib_s": [calib_before, round(_calibrate_jvm(spark), 3)],
        }
        if errors:
            line["errors"] = errors
        print(json.dumps(line))
    finally:
        shutil.rmtree(dN, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Enforce (not merely stamp) the idle-bench standard BEFORE the JVM
    # spins up: concurrent load corrupted the r6 non-headline warm times
    # ~2× and left three r8 headline deltas unattributable (round-8
    # verdict "What's wrong" #1).  The recorded loadavg is the post-wait
    # value — the load the measured jobs actually ran under.
    load, gate_ok = _wait_for_idle()

    from etl_olho_vivo_spark import registry
    from etl_olho_vivo_spark.session import get_spark

    spark = get_spark(app_name="etl-olho-vivo-bench")

    # Warm up the JVM / parquet footers / noop-write machinery so per-query
    # times measure the queries, not session or first-job bootstrap.
    from etl_olho_vivo_spark.sources.tables import read_table

    read_table(spark, sf_dir, "events").count()
    read_table(spark, sf_dir, "events").limit(10).write.format(
        "noop"
    ).mode("overwrite").save()
    # Warm the Python-DataSource path too (package zip ship + Python worker
    # spin-up is one-time session bootstrap, not per-query cost).
    from etl_olho_vivo_spark.sources.olhovivo_api import register as _reg_ov

    _reg_ov(spark)
    spark.read.format("olhovivo").options(
        polls=1, lines=1, vehicles=1
    ).load().write.format("noop").mode("overwrite").save()

    if scale_enabled():
        # scaling-curve mode (manual / BASELINE evidence) — replaces the
        # registry sweep; its one JSON line is the last line of stdout
        scale_tier(spark, sf_dir)
        return

    # Host-speed calibration AROUND the sweep (module docstring): a
    # before/after pair also shows drift DURING the run, which a single
    # sample can't.
    calib_before = round(_calibrate_jvm(spark), 3)

    registry.queries()  # loads the plugin registries into REGISTRY
    from etl_olho_vivo_spark.caching import release_session_caches

    # Each query runs TWICE and reports min: the first run pays one-time
    # whole-stage-codegen/JIT compile of the query's expression trees
    # (measured up to 1.4 s on the widest projection, round-2 verdict),
    # which is fixed session cost, not per-query execution at scale.
    # Session caches a query registered (signature stores etc.) are
    # released between runs, so the warm run re-executes ALL data work —
    # only compile artifacts carry over.  Cold times are reported too.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    fn_wall: dict[str, float] = {}
    calib_headline: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in registry.REGISTRY.items():
        if not q.bench:
            # perf-twin rows (registry.Query.bench docstring): parity
            # runs in the oracle sweep; the plan is already timed
            # under its sibling's name
            continue
        runs = []
        fns = []
        try:
            for _ in range(2):
                t_fn = time.perf_counter()
                df = q.fn(spark, sf_dir)
                # fn() wall = query CONSTRUCTION, incl. any eager
                # driver-side actions (model-count collects, iterative
                # label propagation) the noop sink never times — the
                # round-15 verdict's bench blind spot (round 16,
                # additions-only)
                fns.append(time.perf_counter() - t_fn)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                release_session_caches()
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # wipe the whole artifact; record it and keep benchmarking
            errors[name] = repr(e)[:300]
            release_session_caches()
            continue
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)
        fn_wall[name] = round(min(fns), 3)
        if name in HEADLINE:
            # steal-aware stamp: one cheap calib pass right after each
            # headline query's window — an excursion over the session
            # floor attributes a per-query uptick to host steal instead
            # of leaving it unexplainable (round-15 verdict #8)
            calib_headline[name] = round(_calib_probe(spark), 3)

    calib_after = round(_calibrate_jvm(spark), 3)
    calib = [calib_before, calib_after]
    calib_py = round(_calibrate_py(), 3)

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    # Lines least valuable first (module docstring): cold detail is
    # sacrificial; warm times go out in chunked lines so whole chunks
    # survive the 2000-char tail window; headline is LAST.
    detail = {
        "metric": "all_queries_detail",
        "queries_cold": cold,
        # construction wall per query (min-of-2): the fn() phase the
        # noop sink never times — eager collects, iterative-loop
        # actions, cache materializations (round 16, additions-only)
        "queries_fn": fn_wall,
        # one-shot calib reading taken right after each headline
        # query: excursions over calib_s attribute per-query upticks
        # to host steal (round 16, additions-only)
        "calib_headline": calib_headline,
        "errors": errors,
        "sf": sf,
        "loadavg_start": load,
        "calib_s": calib,
        "calib_py_s": calib_py,
    }
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    summary = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf,
        # loadavg_start lives on the (sacrificial) cold line since
        # round 13 — gate_margin below is its tail-surviving digest
        "calib_s": calib,
        "calib_py_s": calib_py,
        # how far under the gate this run started — a squeaked-under
        # artifact (margin near 0) is visible without cross-referencing
        "gate_margin": round(max_load - _effective_load(load), 2),
    }
    if not gate_ok:
        summary["load_gate"] = "exceeded"
    if errors:
        # full tracebacks live on the (sacrificial) cold line; the
        # tail-guaranteed summary at least names the failing queries
        summary["error_queries"] = sorted(errors)
    missing = [n for n in HEADLINE if n not in timings]
    if missing:
        # a partial total would read as a speedup — flag it loudly
        summary["headline_errors"] = missing
    # the warm block and the summary share the 2000-char tail window:
    # budget the block against the ACTUAL summary (round 14 — at 68
    # registry rows the window reached capacity).  Two-pass (round 15,
    # the 69th row's rebalance): the warm_clipped stamp costs 18 chars
    # of window, but it is only EMITTED when clipping occurs — so the
    # first pass budgets without the reserve (the healthy state keeps
    # those 18 chars as row capacity), and only an overflow re-clips
    # with the stamp's room reserved.  The stamp can therefore never
    # be squeezed out by the very rows it announces.
    warm_budget = (
        TAIL_WINDOW_CHARS
        - len(json.dumps(summary, separators=(",", ":")))
        - 1  # the newline before the summary line
    )
    warm_lines, clipped = _warm_lines(
        timings, gate_ok=gate_ok, block_budget=warm_budget
    )
    if clipped:
        warm_lines, clipped = _warm_lines(
            timings, gate_ok=gate_ok,
            block_budget=warm_budget - len('"warm_clipped":99,'),
        )
        # clipped rows' full values remain on the sacrificial cold
        # line; the tail-guaranteed summary carries the loud count
        summary["warm_clipped"] = len(clipped)
        detail["warm_clipped_queries"] = clipped
    if not gate_ok:
        detail["load_gate"] = "exceeded"
    print(json.dumps(detail))
    sys.stdout.flush()
    for line in warm_lines:
        print(line)
        sys.stdout.flush()
    print(json.dumps(summary, separators=(",", ":")))
    sys.stdout.flush()
    if not gate_ok:
        # distinct rc: the driver records the artifact as load-tainted
        sys.exit(3)


if __name__ == "__main__":
    main()
