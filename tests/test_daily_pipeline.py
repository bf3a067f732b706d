"""The composed daily plan (stages 2+3 as one DAG): raw JSON in, fact
parquet + three CSV datasets out, with CSV headers and exact column orders
(SURVEY §3.4, reference README.md:13,22 clock coupling replaced)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from etl_olho_vivo_spark.plans.daily import run_daily
from etl_olho_vivo_spark.schemas import (
    ACESSIVEIS_COLUMNS,
    LENTIDAO_COLUMNS,
    VELOCIDADES_COLUMNS,
)

T0 = 1715311800


def _iso(ts):
    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


@pytest.fixture()
def day_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    for i in range(4):
        doc = {
            "hr": "03:30",
            "l": [
                {
                    "c": "10-X", "cl": 10, "sl": 1, "lt0": "D", "lt1": "O",
                    "qv": 2,
                    "vs": [
                        {"p": 1, "a": True, "ta": _iso(T0 + 60 * i),
                         "py": -23.60 - 0.001 * i, "px": -46.60},
                        {"p": 2, "a": False, "ta": _iso(T0 + 60 * i),
                         "py": -23.70 - 0.00001 * i, "px": -46.70},
                    ],
                }
            ],
        }
        (d / f"data_{i}.json").write_text(json.dumps(doc))
    return str(d)


def test_run_daily_outputs(spark, tmp_path, day_dir):
    out = str(tmp_path / "out")
    counts = run_daily(spark, day_dir, out)
    # veh1 ≈1.85 m/s ×3 pairs → agg only; veh2 ≈0.019 m/s ×3 → slow too
    assert counts["lentidao"] == 3
    assert counts["velocidades_agregadas"] == 2  # one group per vehicle
    assert counts["acessiveis"] == 2

    fact = spark.read.parquet(f"{out}/posicoes")
    assert fact.count() == 8
    assert "data" in fact.columns  # day-partitioned

    vel = spark.read.option("header", True).csv(f"{out}/velocidades_agregadas")
    assert vel.columns == VELOCIDADES_COLUMNS
    slow = spark.read.option("header", True).csv(f"{out}/lentidao")
    assert slow.columns == LENTIDAO_COLUMNS
    ac = spark.read.option("header", True).csv(f"{out}/acessiveis")
    assert ac.columns == ACESSIVEIS_COLUMNS
    assert set(r["acessibilidade"] for r in ac.collect()) == {"true", "false"}


def test_run_daily_write_pairs_flag(spark, tmp_path, day_dir):
    """S10 closure: ``write_pairs=True`` emits the cleaned per-pair frame
    as a fourth CSV (the reference's commented-out granular output,
    ``etl-olho-vivo-velocidades-medias.py:129-131``); default stays off,
    like the reference."""
    out = str(tmp_path / "out")
    counts = run_daily(
        spark, day_dir, out, write_fact=False, write_pairs=True
    )
    assert counts["velocidades"] == 6  # 3 pairs per vehicle x 2 vehicles
    pairs = spark.read.option("header", True).csv(f"{out}/velocidades")
    # the granular frame carries the full cleaned-pair column set
    for col in ("prefixo_veiculo", "px_anterior", "py_anterior",
                "timestamp_anterior", "tempo", "distancia",
                "velocidade_media", "intervalo", "data"):
        assert col in pairs.columns, col
    assert pairs.count() == 6
    # default off: no fourth dataset directory
    out2 = str(tmp_path / "out2")
    c2 = run_daily(spark, day_dir, out2, write_fact=False)
    assert "velocidades" not in c2
    import os

    assert not os.path.exists(f"{out2}/velocidades")


def test_run_daily_counts_ride_the_write_jobs(
    spark, tmp_path, day_dir, monkeypatch
):
    """The 100 TB telemetry contract: row counts come from an
    Observation inside each sink's write job — the plan runs ONE action
    per CSV sink, not write-then-recount.  Proof by prohibition: with
    DataFrame.count and DataFrame.collect forbidden for the duration,
    the plan must still complete AND return correct per-sink counts
    (AQE shreds job/stage names, so structural accounting would lie —
    this asserts the contract itself)."""
    import pyspark.sql.dataframe as df_mod

    def forbidden(self, *a, **k):
        raise AssertionError(
            "run_daily issued a driver action besides the sink writes"
        )

    monkeypatch.setattr(df_mod.DataFrame, "count", forbidden)
    monkeypatch.setattr(df_mod.DataFrame, "collect", forbidden)
    out = str(tmp_path / "out")
    counts = run_daily(spark, day_dir, out, write_fact=False)
    assert counts == {
        "lentidao": 3, "velocidades_agregadas": 2, "acessiveis": 2,
    }
