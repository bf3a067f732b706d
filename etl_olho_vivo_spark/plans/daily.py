"""The composed daily pipeline — reference stages 2+3 as ONE Spark DAG.

The reference couples its stages by clock offset (6:00 flatten, 6:30
analytics, ``README.md:13,22``) with no completion signal — a silent race
if stage 2 overruns.  Here the dependency is explicit dataflow
(SURVEY §3.4):

    raw JSON ─ flatten ─┬─ posicoes parquet (S7)
                        └─ cleaned speeds ──(persist)──┬─ lentidao CSV
                                                       ├─ velocidades CSV
                                                       └─ acessiveis CSV

Scale notes:
- the cleaned frame is persisted once and feeds all three sinks (SURVEY
  §3.3: one DAG, three actions) — without it each sink would re-run the
  scan + window;
- at 100 TB persistence spills to disk (MEMORY_AND_DISK) rather than
  recomputing two extra scans; the agg outputs are tiny next to the scan;
- exactly two shuffles total (lag window, 9-key agg) regardless of sink
  count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from etl_olho_vivo_spark.io.flatten import ingest_posicoes
from etl_olho_vivo_spark.io.sinks import write_csv, write_posicoes_parquet
from etl_olho_vivo_spark.operators import speed


def run_daily(
    spark: SparkSession,
    raw_path: str,
    out_dir: str,
    write_fact: bool = True,
) -> dict[str, int]:
    """Raw JSON → fact parquet + three derived CSVs.  Returns row counts."""
    pos = ingest_posicoes(spark, raw_path)
    if write_fact:
        write_posicoes_parquet(pos, f"{out_dir}/posicoes")

    # Deterministic lag ordering on duplicate (vehicle, timestamp) pings:
    # tiebreak on natural columns so re-runs and retries produce identical
    # pairs regardless of file/split order (speed.py determinism note).
    cleaned = speed.cleaned_speeds(
        pos, tiebreakers=("codigo_linha", "py", "px")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        datasets: dict[str, DataFrame] = {
            "lentidao": speed.lentidao(cleaned),
            "velocidades_agregadas": speed.velocidades_agregadas(cleaned),
            "acessiveis": speed.acessiveis(cleaned),
        }
        counts: dict[str, int] = {}
        for name, df in datasets.items():
            write_csv(df, f"{out_dir}/{name}")
            counts[name] = df.count()
        return counts
    finally:
        cleaned.unpersist()
