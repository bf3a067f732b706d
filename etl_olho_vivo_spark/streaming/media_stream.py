"""Streaming MEDIA ingestion with perceptual dedup — the media sibling
of ``corpus_stream``: fingerprint each micro-batch's binary media
(image dHash or audio spectral fingerprint), drop in-batch near-dups,
drop near-dups of anything already admitted (banded Hamming join
against a persisted fingerprint store), append the survivors.

Per micro-batch (``admit_media_batch``):

    1. fingerprint       — ONE Arrow decode pass (the costly stage; the
                           frame is persisted so its three consumers
                           never re-decode)
    2. in-batch near-dup — pigeonhole Hamming self-join over the batch
                           fingerprints; edge-greedy resolution (keep
                           ``doc_a``, drop ``doc_b`` — the same greedy
                           convention as the corpus pipeline)
    3. store near-dup    — ``hamming_near_dups_incremental`` vs the
                           fingerprint STORE (cost ∝ batch: AQE
                           broadcasts the batch band keys, the
                           corpus-sized store is only scanned)
    4. append survivors  → corpus (batch_id partition)
       append fingerprints → fingerprint store (batch_id partition)

Contracts carried over from the corpus stream, same rationale:

- the store is the ONLY state that grows with the corpus; it holds one
  slim (doc_id, fp) 64-bit row per fingerprintable admitted doc and
  MIRRORS the admitted corpus exactly — opaque/undecodable media (NULL
  fingerprint) are admitted but contribute no store row because they
  can never pair;
- at-least-once replay is idempotent: the batch's own store partition
  is excluded from the comparison frame, the ``doc_new != doc_old``
  identity guard covers rows already folded into the compacted base,
  and both writes are per-partition overwrites;
- ``compact_media_store`` folds the per-batch partitions into the
  ``ingest_batch_id = -1`` base through the same marker-protected
  side-directory swap (io/fsutil) the signature store uses, and
  ``admit_media_batch`` refuses to write while a swap is pending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators.dedup import (
    _hamming_validate,
    hamming_near_dups,
    hamming_near_dups_incremental,
)

FP_BITS = 64


def _fingerprints(batch: DataFrame, kind: str) -> DataFrame:
    """(doc_id, fp) for one batch — dHash for images, spectral
    fingerprint for audio.  NULL fp = opaque/undecodable media."""
    from etl_olho_vivo_spark.operators import multimodal

    if kind == "image":
        fps = multimodal.image_dhash(batch).select(
            "doc_id", F.col("dhash").alias("fp")
        )
    elif kind == "audio":
        fps = multimodal.audio_fingerprint(batch).select(
            "doc_id", F.col("afp").alias("fp")
        )
    else:
        raise ValueError(f"kind must be image|audio, got {kind!r}")
    return fps


def _fp_store_frame(
    spark: SparkSession, store_dir: str, exclude_batch_id: int | None = None
) -> DataFrame | None:
    """The accumulated fingerprint store, or None before the first
    batch.  Same existence/exclusion discipline as the signature
    store's ``_store_frame`` (probed through Spark's reader so object
    storage works; ONLY the two "not there yet" error classes mean "no
    store"; the batch's own partition is pruned for replay safety)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(store_dir)
    except AnalysisException as e:
        if e.getCondition() in (
            "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
        ):
            return None
        raise
    if exclude_batch_id is not None and "ingest_batch_id" in df.columns:
        df = df.filter(F.col("ingest_batch_id") != exclude_batch_id)
    return df.select("doc_id", "fp")


def admit_media_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    store_dir: str,
    *,
    kind: str = "image",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> None:
    """Admit one micro-batch of (doc_id, media, ...) rows: perceptual
    dedup in-batch + vs store, append survivors.  See the module
    docstring for the step/contract inventory."""
    from etl_olho_vivo_spark.io.fsutil import assert_no_pending_swap

    _hamming_validate(FP_BITS, max_hamming, n_bands)
    assert_no_pending_swap(spark, store_dir)

    # one decode pass, three consumers (self-join, store join, store
    # append) — persist the slim fingerprint frame, never the media
    fps = _fingerprints(batch.select("doc_id", "media"), kind).persist()
    try:
        printable = fps.filter(F.col("fp").isNotNull())

        # in-batch: doc_a < doc_b by construction → greedy keeps doc_a
        in_pairs = hamming_near_dups(
            printable, hash_col="fp", bits=FP_BITS,
            max_hamming=max_hamming, n_bands=n_bands,
        )
        losers = in_pairs.select(F.col("doc_b").alias("doc_id"))

        surv_fps = printable.join(
            losers.dropDuplicates(["doc_id"]), "doc_id", "left_anti"
        )
        store = _fp_store_frame(spark, store_dir, exclude_batch_id=batch_id)
        if store is not None:
            cross = hamming_near_dups_incremental(
                surv_fps, store, hash_col="fp", bits=FP_BITS,
                max_hamming=max_hamming, n_bands=n_bands,
            )
            cross_losers = cross.select(F.col("doc_new").alias("doc_id"))
            losers = losers.unionByName(cross_losers)
            surv_fps = surv_fps.join(
                cross_losers.dropDuplicates(["doc_id"]),
                "doc_id", "left_anti",
            )

        # NULL-fp rows are never losers (they never entered a pairing),
        # so the anti-join admits them alongside the fingerprint
        # survivors — the store, not the corpus, excludes them
        survivors = batch.join(
            losers.dropDuplicates(["doc_id"]).hint("merge"),
            "doc_id", "left_anti",
        )

        # per-partition overwrites: idempotent under at-least-once
        # replay even when this attempt admits zero rows
        survivors.write.mode("overwrite").parquet(
            f"{corpus_dir}/ingest_batch_id={batch_id}"
        )
        surv_fps.write.mode("overwrite").parquet(
            f"{store_dir}/ingest_batch_id={batch_id}"
        )
    finally:
        fps.unpersist()


def media_store_stats(spark: SparkSession, store_dir: str) -> dict:
    """Fingerprint-store telemetry — the compaction dial, mirroring
    the ANN index's ``cell_stats``.  The store's cost driver is its
    PARTITION COUNT, not its row count: every micro-batch's banded
    join re-lists and re-opens one parquet directory per accumulated
    batch, so thousands of tiny partitions tax every admit with
    per-file open cost long before data volume matters.  One bounded
    aggregation (one result row per batch partition); the skew summary
    reuses ``io.ann_index.occupancy_stats`` so the formula can never
    drift between the two artifacts.  Run ``compact_media_store`` when
    ``n_partitions`` grows past a few dozen — the ``media-stream`` CLI
    emits this dict after every drain so the drift is visible in job
    artifacts."""
    from etl_olho_vivo_spark.io.ann_index import occupancy_stats

    df = _fp_store_frame(spark, store_dir)
    if df is None:
        return {"n_partitions": 0, "fingerprints": 0,
                "max_partition": 0, "mean_partition": 0.0,
                "skew_ratio": None}
    raw = spark.read.parquet(store_dir)
    key = "ingest_batch_id" if "ingest_batch_id" in raw.columns \
        else F.lit(-1)
    counts = [
        int(r["n"])
        for r in raw.groupBy(key).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()  # bounded: one row per batch partition
    ]
    s = occupancy_stats(counts)
    return {
        "n_partitions": s["n"],
        "fingerprints": sum(counts),
        "max_partition": s["max"],
        "mean_partition": s["mean"],
        "skew_ratio": s["skew_ratio"],
    }


def compact_media_store(spark: SparkSession, store_dir: str) -> int:
    """Fold the per-batch fingerprint partitions into ONE base
    partition (``ingest_batch_id = -1``), in place, through the
    marker-protected side-directory swap — same durability story as
    ``compact_append_store`` (a complete copy of the store exists on
    storage at every instant; a crash in the window is repaired on the
    next call).  Returns the compacted row count."""
    from etl_olho_vivo_spark.io.fsutil import (
        recover_pending_swap,
        swap_dir,
    )

    tmp_dir = store_dir.rstrip("/") + "_compacting"
    if recover_pending_swap(spark, tmp_dir, store_dir):
        return spark.read.parquet(store_dir).count()
    fp = spark.read.parquet(store_dir).select("doc_id", "fp")
    (
        fp.withColumn("ingest_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("ingest_batch_id")
        .parquet(tmp_dir)
    )
    swap_dir(spark, tmp_dir, store_dir)
    return spark.read.parquet(store_dir).count()


def run_media_stream(
    media_stream: DataFrame,
    corpus_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    kind: str = "image",
    max_hamming: int = 6,
    n_bands: int = 8,
    available_now: bool = True,
):
    """Start the continuous media-ingestion query over a streaming
    frame with (doc_id, media) columns.  Config errors (unknown kind,
    an unsatisfiable banding) fail HERE at start-up, not inside the
    first foreachBatch."""
    _hamming_validate(FP_BITS, max_hamming, n_bands)
    if kind not in ("image", "audio"):
        raise ValueError(f"kind must be image|audio, got {kind!r}")
    spark = media_stream.sparkSession

    def _admit(batch: DataFrame, batch_id: int) -> None:
        admit_media_batch(
            spark, batch, batch_id, corpus_dir, store_dir,
            kind=kind, max_hamming=max_hamming, n_bands=n_bands,
        )

    writer = (
        media_stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
