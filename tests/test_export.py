"""io breadth: ORC as the second columnar fact format, JSONL as the
training hand-off export."""

from __future__ import annotations

import glob
import gzip
import json

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.io.export import export_jsonl
from etl_olho_vivo_spark.io.sinks import write_posicoes_parquet
from etl_olho_vivo_spark.sources.events_adapter import posicoes_from_events

SF = "/root/testdata/sf0.01"


def test_orc_fact_roundtrip_and_pushdown(spark, tmp_path):
    pos = posicoes_from_events(spark, SF)
    out = str(tmp_path / "fact_orc")
    write_posicoes_parquet(pos, out, fmt="orc")
    back = spark.read.orc(out)
    assert back.count() == pos.count()
    # predicate pushdown reaches the ORC scan exactly like parquet
    plan = (
        back.filter(F.col("codigo_linha") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "codigo_linha" in pushed, pushed
    # same values through either format
    pq = str(tmp_path / "fact_pq")
    write_posicoes_parquet(pos, pq)
    cols = sorted(back.columns)
    a = sorted(map(tuple, back.select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(pq).select(*cols).collect()))
    assert a == b

    with pytest.raises(ValueError):
        write_posicoes_parquet(pos, str(tmp_path / "x"), fmt="avro")


def test_jsonl_export_sharded_gzip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "hallo welt", "de"),
         (3, "more english text", "en")],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "shards")
    export_jsonl(docs, out, by="lang")
    files = glob.glob(f"{out}/lang=*/part-*.json.gz")
    assert files, glob.glob(f"{out}/**", recursive=True)
    rows = []
    for f in files:
        lang = f.split("lang=")[1].split("/")[0]
        with gzip.open(f, "rt") as fh:
            for line in fh:
                obj = json.loads(line)  # every line is a JSON object
                rows.append((obj["doc_id"], obj["text"], lang))
    assert sorted(rows) == [
        (1, "hello world", "en"), (2, "hallo welt", "de"),
        (3, "more english text", "en"),
    ]
    # round-trips through Spark's own reader too
    assert spark.read.json(out).count() == 3


def test_jsonl_export_rejects_binary(spark, tmp_path):
    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01"))], "doc_id long, media binary"
    )
    with pytest.raises(ValueError, match="binary"):
        export_jsonl(media, str(tmp_path / "nope"))


def test_jsonl_export_rejects_nested_binary(spark, tmp_path):
    nested = spark.createDataFrame(
        [(1, (bytearray(b"\x00"),)), ],
        "doc_id long, media struct<payload: binary>",
    )
    with pytest.raises(ValueError, match="binary"):
        export_jsonl(nested, str(tmp_path / "n1"))
    arr = spark.createDataFrame(
        [(1, [bytearray(b"\x00")])], "doc_id long, chunks array<binary>"
    )
    with pytest.raises(ValueError, match="binary"):
        export_jsonl(arr, str(tmp_path / "n2"))
