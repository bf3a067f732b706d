#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints TWO JSON lines — a full per-query detail line, then a compact
headline summary as the LAST line (the driver's tail-capture keeps the
end of stdout, so the parseable record must come last):
    {"metric": "all_queries_detail", "queries": {...},
     "queries_cold": {...}, "sf": <sf>}
    {"metric": "headline_total_wall", "value": <total sec>, "unit": "sec",
     "queries": {<headline 7 only>}, "sf": <sf>}

The HEADLINE set is frozen (BASELINE comparability across rounds); newer
registry queries are benchmarked too but only reported in "queries", not in
"value".  Results are materialized with the noop sink — full execution, no
driver collect cost.  Since round 3 each query runs twice with session
caches released in between; "queries" holds min(cold, warm) so one-time
codegen/JIT compile doesn't read as plan regression (BASELINE.md
documents the change), "queries_cold" the first-run times.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

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
    errors: dict[str, str] = {}
    for name, q in registry.REGISTRY.items():
        runs = []
        try:
            for _ in range(2):
                df = q.fn(spark, sf_dir)
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

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    # Full per-query dump first (diagnostic; large), then a COMPACT
    # summary as the LAST line: the driver's tail-capture keeps only the
    # end of stdout, so the parseable headline record must come last
    # (BENCH_r{3,4}.json lost their headline to front-truncation).
    print(
        json.dumps(
            {
                "metric": "all_queries_detail",
                "queries": timings,
                "queries_cold": cold,
                "errors": errors,
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    summary = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf,
    }
    missing = [n for n in HEADLINE if n not in timings]
    if missing:
        # a partial total would read as a speedup — flag it loudly
        summary["headline_errors"] = missing
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
