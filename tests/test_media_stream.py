"""Streaming media ingestion (streaming/media_stream.py): micro-batches
of binary media admitted through in-batch + against-store perceptual
near-dedup, idempotently — the media sibling of the corpus stream."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

SCHEMA = "doc_id long, media binary"


def _p5(rows):
    return (b"P5\n%d %d\n255\n" % (len(rows[0]), len(rows))
            + b"".join(bytes(r) for r in rows))


def _img(seed, tweak=0):
    """16x16 pseudo-random gray P5; same seed → identical bytes,
    ``tweak`` nudges a sparse pixel grid (a re-encode-grade
    perturbation: measured dHash distance ≤ 4, still a near-dup,
    while distinct seeds measure 26-41 bits apart).  Content must be
    non-gradient: dHash is brightness-invariant, so any linear-ramp
    family would fingerprint identically across seeds."""
    s = seed * 2654435761 % (1 << 31)
    rows = []
    for _ in range(16):
        row = []
        for _ in range(16):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            row.append(s % 256)
        rows.append(row)
    if tweak:
        for r in range(0, 16, 3):
            for c in range(0, 16, 4):
                rows[r][c] = (rows[r][c] + tweak) % 256
    return bytearray(_p5(rows))


def _write_batch(spark, stage, name, rows):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    tmp = f"{stage}__{name}"
    df.write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(f"{tmp}/part-*.parquet")
    shutil.move(part, os.path.join(stage, f"{name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture()
def dirs(tmp_path):
    stage = str(tmp_path / "landing")
    os.makedirs(stage)
    return {
        "stage": stage,
        "corpus": str(tmp_path / "corpus"),
        "store": str(tmp_path / "store"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _ids(spark, path, col="doc_id"):
    return sorted(r[col] for r in spark.read.parquet(path).collect())


def test_admit_media_batch_in_batch_dedup(spark, dirs):
    """The fast-tier representative: ONE admit call end to end —
    fingerprint decode, in-batch pigeonhole pairing (greedy keeps the
    smaller id of an exact-dup pair), opaque media admitted but kept
    OUT of the store."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
    )

    b0 = spark.createDataFrame(
        [(1, _img(5)), (2, _img(40)), (3, _img(5)),
         (4, bytearray(b"not an image at all"))],
        SCHEMA,
    )
    admit_media_batch(spark, b0, 0, dirs["corpus"], dirs["store"])
    assert _ids(spark, dirs["corpus"]) == [1, 2, 4]
    assert _ids(spark, dirs["store"]) == [1, 2]


@pytest.mark.sweep
def test_admit_media_batches_cross_batch_and_replay(spark, dirs):
    """Two direct admit calls + an at-least-once replay: cross-batch
    near-dup dropped vs the store, replay idempotent (own partition
    excluded from the comparison frame)."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
    )

    b0 = spark.createDataFrame(
        [(1, _img(5)), (2, _img(40))], SCHEMA
    )
    admit_media_batch(spark, b0, 0, dirs["corpus"], dirs["store"])

    # batch 1: near-dup of doc 1 (tweaked pixels) + a fresh image
    b1 = spark.createDataFrame(
        [(10, _img(5, tweak=9)), (11, _img(77))], SCHEMA
    )
    admit_media_batch(spark, b1, 1, dirs["corpus"], dirs["store"])
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11]
    assert _ids(spark, dirs["store"]) == [1, 2, 11]

    # replay batch 1: own partition excluded from the store frame, so
    # the batch does not delete itself; results unchanged
    admit_media_batch(spark, b1, 1, dirs["corpus"], dirs["store"])
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11]
    assert _ids(spark, dirs["store"]) == [1, 2, 11]


@pytest.mark.sweep
def test_media_store_compaction_then_dedup_vs_base(spark, dirs):
    """compact_media_store folds the per-batch partitions into the -1
    base; a later batch still dedups against the folded fingerprints
    (and a replayed batch relies on the identity guard, not partition
    exclusion, once its rows are in the base)."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
        compact_media_store,
    )

    admit_media_batch(
        spark, spark.createDataFrame([(1, _img(5))], SCHEMA),
        0, dirs["corpus"], dirs["store"],
    )
    admit_media_batch(
        spark, spark.createDataFrame([(2, _img(40))], SCHEMA),
        1, dirs["corpus"], dirs["store"],
    )
    assert compact_media_store(spark, dirs["store"]) == 2
    store = spark.read.parquet(dirs["store"])
    assert [r["ingest_batch_id"] for r in
            store.select("ingest_batch_id").distinct().collect()] == [-1]

    # new batch vs the compacted base
    admit_media_batch(
        spark, spark.createDataFrame(
            [(5, _img(5, tweak=9)), (6, _img(90))], SCHEMA
        ),
        2, dirs["corpus"], dirs["store"],
    )
    assert _ids(spark, dirs["corpus"]) == [1, 2, 6]

    # replay batch 2 AFTER its rows were folded by a second compaction:
    # partition exclusion can no longer see them — the doc_new !=
    # doc_old identity guard must keep the batch from dropping itself
    assert compact_media_store(spark, dirs["store"]) == 3
    admit_media_batch(
        spark, spark.createDataFrame(
            [(5, _img(5, tweak=9)), (6, _img(90))], SCHEMA
        ),
        2, dirs["corpus"], dirs["store"],
    )
    assert _ids(spark, dirs["corpus"]) == [1, 2, 6]


def test_media_store_stats_telemetry(spark, dirs):
    """The compaction dial: zeros before the first batch, then one
    occupied partition per admitted batch with the fingerprint total
    (opaque rows contribute none), skew over partition sizes."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
        media_store_stats,
    )

    assert media_store_stats(spark, dirs["store"]) == {
        "n_partitions": 0, "fingerprints": 0, "max_partition": 0,
        "mean_partition": 0.0, "skew_ratio": None,
    }
    admit_media_batch(
        spark, spark.createDataFrame(
            [(1, _img(5)), (2, _img(40)),
             (3, bytearray(b"opaque media"))], SCHEMA
        ),
        0, dirs["corpus"], dirs["store"],
    )
    admit_media_batch(
        spark, spark.createDataFrame([(4, _img(77))], SCHEMA),
        1, dirs["corpus"], dirs["store"],
    )
    got = media_store_stats(spark, dirs["store"])
    assert got == {
        "n_partitions": 2, "fingerprints": 3, "max_partition": 2,
        "mean_partition": 1.5, "skew_ratio": 1.33,
    }


def test_run_media_stream_validates_at_startup(spark, dirs):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["stage"])
    )
    from etl_olho_vivo_spark.streaming.media_stream import run_media_stream

    with pytest.raises(ValueError, match="kind"):
        run_media_stream(stream, dirs["corpus"], dirs["store"],
                         dirs["ckpt"], kind="video")
    with pytest.raises(ValueError, match="n_bands"):
        run_media_stream(stream, dirs["corpus"], dirs["store"],
                         dirs["ckpt"], max_hamming=8, n_bands=8)


@pytest.mark.sweep
def test_incremental_pairing_broadcasts_batch_not_store(spark, tmp_path):
    """The 100 TB contract of the unhinted batch-vs-store join: with a
    store 2000x the batch, AQE must pick broadcast joins (the slim
    batch side ships) — a SortMergeJoin in the final plan would mean
    the corpus-sized store gets shuffled+sorted EVERY micro-batch."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.operators.dedup import (
        hamming_near_dups_incremental,
    )

    store_path = str(tmp_path / "fpstore")
    spark.range(20_000).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        # xxhash64 spreads ids over the full 64-bit space — realistic
        # fingerprint entropy so banding produces few collisions
        F.xxhash64("id").alias("fp"),
    ).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    batch = spark.range(10).select(
        F.col("id").alias("doc_id"), F.xxhash64("id", "id").alias("fp")
    )
    out = hamming_near_dups_incremental(
        batch, store, hash_col="fp", bits=64, max_hamming=6, n_bands=8
    )
    out.collect()  # finalize the adaptive plan
    final = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


@pytest.mark.sweep
def test_media_stream_end_to_end(spark, dirs):
    """Full readStream → foreachBatch drain across three single-file
    micro-batches, image kind: in-batch dup, cross-batch near-dup, and
    opaque rows all resolve exactly as the direct-call test pins."""
    from etl_olho_vivo_spark.streaming.media_stream import run_media_stream

    _write_batch(spark, dirs["stage"], "b0",
                 [(1, _img(5)), (2, _img(40)), (3, _img(5))])
    _write_batch(spark, dirs["stage"], "b1",
                 [(10, _img(5, tweak=9)), (11, _img(77))])
    _write_batch(spark, dirs["stage"], "b2",
                 [(20, _img(77, tweak=9)), (21, bytearray(b"opaque"))])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["stage"])
    )
    q = run_media_stream(
        stream, dirs["corpus"], dirs["store"], dirs["ckpt"]
    )
    q.awaitTermination(180)

    assert _ids(spark, dirs["corpus"]) == [1, 2, 11, 21]
    assert _ids(spark, dirs["store"]) == [1, 2, 11]
