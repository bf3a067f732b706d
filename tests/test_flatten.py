"""Stage-2 ingestion: nested JSON → posicoes (SURVEY §2.1 S5/S6, §2.2 P1-P3,
§2.8 F1) — including the malformed-file tolerance the reference implements
with a per-file try/except (etl-olho-vivo-ingestao-posicoes.py:41-65)."""

from __future__ import annotations

import json

import pytest

from etl_olho_vivo_spark.io.flatten import (
    corrupt_records,
    flatten_posicoes,
    ingest_posicoes,
    iso8601_to_epoch,
    read_raw_posicoes,
)
from etl_olho_vivo_spark.io.sinks import write_posicoes_parquet
from etl_olho_vivo_spark.schemas import POSICOES_COLUMNS

GOOD_DOC = {
    "hr": "11:30",
    "l": [
        {
            "c": "5015-10", "cl": 33887, "sl": 1,
            "lt0": "METRÔ JABAQUARA", "lt1": "JD. SÃO JORGE", "qv": 2,
            "vs": [
                {"p": 68546, "a": True, "ta": "2024-05-10T14:30:25Z",
                 "py": -23.6787125, "px": -46.65674},
                {"p": 68547, "a": False, "ta": "2024-05-10T14:30:31Z",
                 "py": -23.679, "px": -46.657},
            ],
        },
        {
            "c": "7021-21", "cl": 1234, "sl": 2,
            "lt0": "TERM. LAPA", "lt1": "CID. UNIVERSITÁRIA", "qv": 1,
            "vs": [
                {"p": 12001, "a": True, "ta": "2024-05-10T14:30:40Z",
                 "py": -23.55, "px": -46.73},
            ],
        },
    ],
}

# missing keys everywhere → .get() null-propagation parity (P3)
SPARSE_DOC = {
    "hr": "11:31",
    "l": [
        {"cl": 99, "vs": [{"p": 1, "py": -23.5}]},  # no c/sl/lt0/lt1/a/ta/px
        {"c": "X", "cl": 100, "vs": []},            # empty vehicle list
        {"c": "Y", "cl": 101},                      # missing vs entirely
    ],
}


@pytest.fixture()
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "data_1.json").write_text(json.dumps(GOOD_DOC))
    (d / "data_2.json").write_text(json.dumps(SPARSE_DOC))
    (d / "data_bad.json").write_text('{"hr": "11:32", "l": [ CORRUPT')
    return str(d)


def test_flatten_shape_and_values(spark, raw_dir):
    df = ingest_posicoes(spark, raw_dir)
    assert df.columns == POSICOES_COLUMNS
    rows = {r["prefixo_veiculo"]: r for r in df.collect()}
    # 3 vehicles from GOOD_DOC + 1 from SPARSE_DOC; empty/missing vs emit none
    assert set(rows) == {68546, 68547, 12001, 1}
    r = rows[68546]
    assert r["letreiro"] == "5015-10"
    assert r["codigo_linha"] == 33887
    assert r["sentido_linha"] == 1
    assert r["destino_linha"] == "METRÔ JABAQUARA"
    assert r["origem_linha"] == "JD. SÃO JORGE"
    assert r["acessibilidade"] is True
    # 2024-05-10T14:30:25Z == 1715351425 (UTC instant, TZ-free parse)
    assert r["timestamp"] == 1715351425
    assert r["py"] == -23.6787125 and r["px"] == -46.65674


def test_missing_keys_null_propagate(spark, raw_dir):
    df = ingest_posicoes(spark, raw_dir)
    r = df.filter("prefixo_veiculo = 1").collect()[0]
    assert r["letreiro"] is None
    assert r["codigo_linha"] == 99
    assert r["sentido_linha"] is None
    assert r["acessibilidade"] is None
    assert r["timestamp"] is None  # ta missing → NULL, row kept
    assert r["px"] is None and r["py"] == -23.5


def test_corrupt_file_quarantined_not_fatal(spark, raw_dir):
    raw = read_raw_posicoes(spark, raw_dir)
    bad = corrupt_records(raw).collect()
    assert len(bad) == 1 and "CORRUPT" in bad[0]["_corrupt_record"]
    # the corrupt file contributes no fact rows but the batch succeeds
    assert flatten_posicoes(raw).count() == 4


def test_iso8601_epoch_is_tz_free(spark):
    # boundary instants: midnight, end of year, leap day
    cases = {
        "1970-01-01T00:00:00Z": 0,
        "2024-02-29T23:59:59Z": 1709251199,
        "2024-12-31T23:30:00Z": 1735687800,
    }
    df = spark.createDataFrame([(s,) for s in cases], ["ta"])
    got = {r["ta"]: r["e"] for r in
           df.select("ta", iso8601_to_epoch("ta").alias("e")).collect()}
    assert got == cases


def test_posicoes_parquet_partitioned_by_day(spark, tmp_path, raw_dir):
    pos = ingest_posicoes(spark, raw_dir).filter("timestamp IS NOT NULL")
    path = str(tmp_path / "fact")
    write_posicoes_parquet(pos, path)
    assert (tmp_path / "fact" / "data=2024-05-10").exists()
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning predicate resolves on the partition column
    assert back.filter("data = '2024-05-10'").count() == 3


def test_malformed_ta_yields_null_not_crash(spark):
    """A schema-valid but garbage ta string must produce a NULL epoch
    (the reference's .get() tolerance), not an ANSI cast error that
    aborts the batch/stream."""
    from etl_olho_vivo_spark.io.flatten import iso8601_to_epoch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2024-05-10T03:30:00Z",), ("2024-05-10Tgarbage",),
         ("not a timestamp",), (None,)],
        "ta string",
    )
    got = [r[0] for r in df.select(iso8601_to_epoch(F.col("ta"))).collect()]
    assert got[0] == 1715311800
    assert got[1:] == [None, None, None]
