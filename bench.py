#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

The HEADLINE set is frozen (BASELINE comparability across rounds); newer
registry queries are benchmarked too but only reported in "queries", not in
"value".  Results are materialized with the noop sink — full execution, no
driver collect cost.
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
    timings: dict[str, float] = {}
    for name, q in registry.REGISTRY.items():
        df = q.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
