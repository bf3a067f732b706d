"""The ``olhovivo`` custom data source (SURVEY §2.1 S1) — batch + stream."""

from __future__ import annotations

import time

import pytest

from etl_olho_vivo_spark.io.flatten import flatten_posicoes
from etl_olho_vivo_spark.schemas import POSICOES_COLUMNS
from etl_olho_vivo_spark.sources.olhovivo_api import OlhoVivoDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(OlhoVivoDataSource)


def test_batch_read_shape_and_determinism(spark):
    df = (
        spark.read.format("olhovivo")
        .options(polls=3, lines=4, vehicles=5)
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["hr", "l"]
    rows = df.collect()
    assert len(rows) == 3  # one document per poll partition
    assert all(len(r["l"]) == 4 for r in rows)
    assert all(len(line["vs"]) == 5 for r in rows for line in r["l"])
    # deterministic: a second read is bit-identical (retry idempotency)
    again = (
        spark.read.format("olhovivo")
        .options(polls=3, lines=4, vehicles=5)
        .load()
        .collect()
    )
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_batch_flattens_through_stage2(spark):
    raw = (
        spark.read.format("olhovivo").options(polls=2, lines=3, vehicles=4).load()
    )
    pos = flatten_posicoes(raw)
    assert pos.columns == POSICOES_COLUMNS
    out = pos.collect()
    assert len(out) == 2 * 3 * 4
    # typed epoch seconds, plausible São Paulo coordinates
    assert all(isinstance(r["timestamp"], int) for r in out)
    assert all(-24.0 < r["py"] < -23.0 for r in out)
    assert all(-47.0 < r["px"] < -46.0 for r in out)


def test_raw_json_sink_roundtrip(spark, tmp_path):
    """S3 write side: poll source → raw landing zone → stage-2 flatten
    must equal flattening the source directly (the poller-replacement
    loop is closed end-to-end)."""
    import os

    from etl_olho_vivo_spark.io.flatten import read_raw_posicoes
    from etl_olho_vivo_spark.io.sinks import write_raw_json

    raw = (
        spark.read.format("olhovivo").options(polls=3, lines=2, vehicles=4).load()
    )
    zone = str(tmp_path / "raw_zone")
    write_raw_json(raw, zone)

    # reference layout: year=/month=/day=/hour= zero-padded partitions
    parts = []
    for root, _dirs, files in os.walk(zone):
        parts += [os.path.join(root, f) for f in files if f.endswith(".json")]
    assert parts, "no JSON objects written"
    rel = os.path.relpath(parts[0], zone).split(os.sep)
    assert rel[0].startswith("year=") and rel[1].startswith("month=")
    assert rel[2].startswith("day=") and rel[3].startswith("hour=")
    assert len(rel[1]) == len("month=") + 2  # zero-padded

    back = flatten_posicoes(read_raw_posicoes(spark, zone))
    direct = flatten_posicoes(raw)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # idempotent replay: partition time derives from the data, not the
    # wall clock, so a second write lands in the same layout
    write_raw_json(raw, zone)
    back2 = flatten_posicoes(read_raw_posicoes(spark, zone))
    assert back2.count() == direct.count()


def test_live_mode_is_gated_not_broken(spark):
    df = spark.read.format("olhovivo").options(mode="live", api_token="x").load()
    with pytest.raises(Exception) as exc_info:
        df.collect()
    # surfaced from the executor: either the explicit NotImplementedError
    # (no requests package) or a network failure — never a silent fake.
    msg = str(exc_info.value)
    assert "mode=live" in msg or "olhovivo auth failed" in msg or "requests" in msg


def test_stream_to_raw_zone_ingestion_loop(spark, tmp_path):
    """The full continuous-ingestion replacement for the reference's
    EventBridge+Lambda poller: olhovivo readStream → foreachBatch raw
    JSON sink (append) → schema-first read → flatten.  Every polled ping
    lands in the zone exactly once."""
    from etl_olho_vivo_spark.io.flatten import read_raw_posicoes
    from etl_olho_vivo_spark.io.sinks import write_raw_json

    zone = str(tmp_path / "zone")
    q = (
        spark.readStream.format("olhovivo")
        .options(lines=2, vehicles=3, max_polls=3)
        .load()
        .writeStream.foreachBatch(
            lambda batch, _id: write_raw_json(batch, zone, mode="append")
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        pos = None
        while time.time() < deadline:
            try:
                pos = flatten_posicoes(read_raw_posicoes(spark, zone))
                if pos.count() >= 3 * 2 * 3:
                    break
            except Exception:
                pass  # zone not created yet
            time.sleep(0.5)
    finally:
        q.stop()
    pos = flatten_posicoes(read_raw_posicoes(spark, zone))
    assert pos.count() == 3 * 2 * 3
    # one ping per (poll, line, vehicle) — nothing duplicated by the sink
    assert pos.select("prefixo_veiculo", "timestamp").distinct().count() == 3 * 2 * 3


def test_stream_reads_polls_in_order(spark, tmp_path):
    q = (
        spark.readStream.format("olhovivo")
        .options(lines=2, vehicles=3, max_polls=3)
        .load()
        .writeStream.format("memory")
        .queryName("olhovivo_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM olhovivo_stream_test").first()[0]
            if n >= 3:
                break
            time.sleep(0.5)
        rows = spark.sql(
            "SELECT hr FROM olhovivo_stream_test ORDER BY hr"
        ).collect()
        assert len(rows) >= 3
        # polls are 30 s apart from the fixed t0 → minute ticks every 2nd
        assert [r["hr"] for r in rows[:3]] == ["00:00", "00:00", "00:01"]
    finally:
        q.stop()
