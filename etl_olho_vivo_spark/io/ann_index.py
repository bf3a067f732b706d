"""Persisted IVF ANN index — the build-once/query-many serving layout.

``operators/similarity.py`` provides the IVF machinery (coarse
quantizer, exact-integer assignment, multi-probe top-k); this module
gives it the lifecycle a production vector store needs, mirroring the
signature-store pattern the dedup family uses:

    build_ivf_index    corpus scan once → centroids + cell-partitioned
                       assignment parquet
    append_to_ivf_index  new vectors assigned against the PERSISTED
                       centroids and appended to their cell partitions
                       (cost ∝ batch, centroids never retrained mid-index)
    query_ivf_index    external query vector → probe cells → top-k

Layout:

    <path>/centroids/   cell_id, qc (quantized), stamped with n_cells +
                        the quantization grid (validated at load — an
                        index built under a different grid would rank
                        garbage silently)
    <path>/cells/ingest_batch_id=<id>/cell_id=<c>/
                        vec_id, label, qv — the build lands in batch
                        -1; every append overwrites its OWN batch
                        partition tree, so an at-least-once replay
                        (streaming foreachBatch, retried jobs) replaces
                        its prior attempt instead of duplicating it —
                        the same idempotency design as the dedup
                        signature store.  ``compact_ivf_index`` folds
                        accumulated batch partitions back into -1.

The cell partitioning is the serving contract at 100 TB: a query with
``n_probe`` cells reads ONLY those cell partition directories (Spark
partition pruning — asserted in tests; pruning works on any partition
column, so the extra batch level costs queries nothing).  Appends add
partition directories; resident data is never rewritten.  Vector ids
must be unique ACROSS batches — the index stores vectors, it does not
near-dedup them (that is the corpus pipeline's job upstream).

Driver-side state is bounded by ``n_cells`` (the centroid table — the
same bounded-collect posture as kmeans' candidate pool): probe-cell
selection for an external vector is pure Python over that tiny list.

Relation to the reference (JonasMarma/etl-olho-vivo): none — part of
the beyond-reference similarity-search surface (SURVEY §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_olho_vivo_spark.io.fsutil import assert_no_pending_swap
from etl_olho_vivo_spark.operators.similarity import (
    DEFAULT_CELL_OCCUPANCY,
    QUANT,
    _default_centroids,
    _dot_int,
    _ivfpq_adc_case,
    _l2sq_int,
    _sql_bigint_array,
    ivf_assign,
    ivfpq_codebooks,
    ivfpq_encode,
    kmeans_centroids,
)


@dataclass
class IvfIndex:
    """A loaded index: the tiny centroid table (collected — bounded by
    n_cells) plus the lazy cell-partitioned assignment frame."""

    centroids: list[tuple[int, list[int]]]  # (cell_id, quantized centroid)
    cells: DataFrame  # vec_id, label, qv, cell_id (partition column)
    path: str


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 8,
    use_kmeans: bool = True,
    **kmeans_kwargs,
) -> int:
    """Build the index: quantizer (k-means|| by default, the
    deterministic first-vectors seeding with ``use_kmeans=False`` for
    oracle-replicable demos) → exact integer assignment → persisted
    layout.  Returns the number of indexed vectors."""
    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1, got {n_cells}")
    spark = emb.sparkSession
    # index type must be unambiguous from the tree: the rebuild trigger
    # and the load/append guards all key off pq_codebooks' existence, so
    # rebuilding a former IVF-PQ path as plain IVF must remove the stale
    # codebook table (else the next skew rebuild silently converts the
    # index back to IVF-PQ against cells that carry no codes)
    from etl_olho_vivo_spark.io.fsutil import hadoop_fs

    fs, pq_p = hadoop_fs(spark, f"{path}/{_PQ_DIR}")
    if fs.exists(pq_p):
        fs.delete(pq_p, True)
    cents = (
        kmeans_centroids(emb, n_cells, **kmeans_kwargs)
        if use_kmeans
        else _default_centroids(emb, n_cells)
    )
    (
        cents.withColumn("n_cells", F.lit(n_cells))
        .withColumn("quant", F.lit(QUANT))
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )
    assigned = ivf_assign(emb, n_cells, _centroid_frame(spark, path))
    # static overwrite of the WHOLE cells tree: a rebuild over a
    # previously-appended index must also clear the old batch
    # partitions — they were assigned under the OLD centroids, and
    # surviving the rebuild they would route queries to wrong cells
    # (and duplicate any re-indexed vec_ids)
    (
        assigned.withColumn("ingest_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("ingest_batch_id", "cell_id")
        .parquet(f"{path}/cells")
    )
    # a rebuild starts the batch lifecycle over — clear any compaction
    # watermark left by the previous index generation
    _write_watermark(spark, path, -1)
    return spark.read.parquet(f"{path}/cells").count()


_WATERMARK = "compacted_through"


def _write_watermark(spark: SparkSession, path: str, batch_id: int) -> None:
    """Single small text file.  A value must survive a crash at ANY
    instant: a lost watermark reads as -1 and a replayed already-folded
    batch would duplicate its vectors.  A bare delete-then-rename has a
    window where no file exists, so the old value is parked as ``.bak``
    until the new one is in place (the rename-only protocol):

        write tmp → (rename live → .bak) → rename tmp → live → drop .bak

    ``_read_watermark`` falls back to ``.bak`` when the live file is
    missing — at every instant one durable copy is readable, and the
    stalest it can be is the previous watermark, which is conservative
    in the same direction as compaction's own crash ordering (an old
    value only makes appends SKIP less, and the batch partitions those
    appends rewrite still exist until the compaction swap completes)."""
    from etl_olho_vivo_spark.io.fsutil import checked_rename, hadoop_fs

    final = f"{path}/{_WATERMARK}"
    fs, final_p = hadoop_fs(spark, final)
    _, tmp_p = hadoop_fs(spark, final + "._tmp")
    _, bak_p = hadoop_fs(spark, final + ".bak")
    out = fs.create(tmp_p, True)
    out.write(str(int(batch_id)).encode("ascii"))
    out.close()
    if fs.exists(final_p):
        # a stale .bak may only be discarded while the LIVE file exists
        # — in the crash-recovery path (live missing, .bak the only
        # durable copy) deleting it first would leave just the
        # unreadable tmp, and a second crash there reads as -1 and
        # replays folded batches as duplicates
        if fs.exists(bak_p):
            fs.delete(bak_p, False)
        checked_rename(fs, final_p, bak_p)
    checked_rename(fs, tmp_p, final_p)
    fs.delete(bak_p, False)


def _read_watermark(spark: SparkSession, path: str) -> int:
    """Highest batch id folded into the base by compaction (-1 = none).
    Indexes created before watermarking existed read as -1; a crash
    inside ``_write_watermark``'s rename window is covered by the
    ``.bak`` fallback; an unreadable value is a LOUD error (guessing
    low would duplicate folded batches, guessing high would drop new
    ones)."""
    from etl_olho_vivo_spark.io.fsutil import hadoop_fs

    final = f"{path}/{_WATERMARK}"
    fs, final_p = hadoop_fs(spark, final)
    read_p = final_p
    if not fs.exists(final_p):
        _, bak_p = hadoop_fs(spark, final + ".bak")
        if not fs.exists(bak_p):
            return -1
        read_p = bak_p
    stream = fs.open(read_p)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    try:
        return int(data.strip())
    except ValueError:
        raise IOError(
            f"unreadable compaction watermark at {read_p} "
            f"({data!r}); restore it to the highest folded batch id "
            f"before appending"
        )


def next_batch_id(spark: SparkSession, path: str) -> int:
    """The smallest batch id a fresh append can actually land under.

    ``max(ingest_batch_id) + 1`` alone is WRONG right after a
    compaction: the fold collapses every batch into -1, so the max
    reads -1 and the "next" id becomes 0 — at or below the compaction
    watermark, which ``append_to_ivf_index`` must skip (its rows would
    otherwise duplicate the folded base on a genuine replay).  The
    watermark therefore participates: next = max(live max, watermark)
    + 1.  Streaming ingestion never needs this — its ids come from the
    checkpoint's monotonic batch counter — but ad-hoc CLI appends do.
    """
    cells_max = (
        spark.read.parquet(f"{path}/cells")
        .agg(F.max("ingest_batch_id"))
        .first()[0]
    )
    base = max(
        cells_max if cells_max is not None else -1,
        _read_watermark(spark, path),
    )
    return base + 1


def _centroid_frame(spark: SparkSession, path: str) -> DataFrame:
    """The persisted centroid relation, grid-validated.

    The quantization grid is stamped at build time: loading an index
    whose grid differs from this module's ``QUANT`` would compare
    incommensurate integers and return confidently wrong neighbors —
    loud error instead.
    """
    df = spark.read.parquet(f"{path}/centroids")
    row = df.select("quant").first()
    if row is None:
        raise ValueError(f"IVF index at {path} has an empty centroid table")
    if row["quant"] != QUANT:
        raise ValueError(
            f"IVF index at {path} was built on quantization grid "
            f"{row['quant']}, engine uses {QUANT}; rebuild the index"
        )
    return df.select("cell_id", "qc")


def load_ivf_index(spark: SparkSession, path: str) -> IvfIndex:
    """Load centroids (collected — n_cells rows) + the lazy cell frame.

    Refuses while a crashed compaction swap is pending — the cells
    directory is absent or ambiguous in that state; running the
    compaction again repairs it (clearer than a PATH_NOT_FOUND
    from the parquet reader)."""
    assert_no_pending_swap(spark, f"{path}/cells")
    cents = [
        (r["cell_id"], list(r["qc"]))
        for r in _centroid_frame(spark, path).collect()
    ]
    cells = spark.read.parquet(f"{path}/cells")
    return IvfIndex(centroids=cents, cells=cells, path=path)


def append_to_ivf_index(
    emb_batch: DataFrame, path: str, batch_id: int
) -> bool:
    """Assign a batch of new vectors against the persisted centroids and
    land them under the batch's OWN partition tree.

    The quantizer is frozen at build time on purpose: retraining
    centroids per batch would silently re-shape every existing cell's
    meaning without reassigning its residents.  Rebuild the index when
    the corpus distribution drifts (standard IVF practice).

    Idempotent per ``batch_id``: the write overwrites
    ``cells/ingest_batch_id=<id>`` wholesale, so a replay (streaming
    at-least-once, retried orchestrator job) replaces its earlier
    attempt instead of appending duplicates.  ``-1`` is reserved for
    the build/compacted base.  A batch id at or below the compaction
    watermark is a NO-OP: parquet batch writes are job-transactional,
    so a folded batch was COMPLETE when compaction read it — its rows
    already live in the base in full, and skipping the replay keeps
    at-least-once restarts safe even across a compaction (rewriting
    the partition would duplicate every vector instead).  Caveat, as
    for the corpus stream: a replay must carry the same content as the
    original attempt — don't change assignment-relevant config across
    a restart with uncommitted batches.

    Returns True when the batch was written, False when it was skipped
    as already-folded — callers issuing NEW (non-replay) data must
    treat False as a loud signal to re-derive the id (``next_batch_id``
    exists for exactly that), never as success.
    """
    if batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0 (-1 is the build partition), "
            f"got {batch_id}"
        )
    spark = emb_batch.sparkSession
    assert_no_pending_swap(spark, f"{path}/cells")
    # refuse to append codes-less rows into an IVF-PQ tree: ADC would
    # compute NULL adc_dist for them and ascending orderBy sorts NULLs
    # first, silently crowding real candidates out of the bounded
    # rerank pool — the same loud-error discipline as the load paths
    from etl_olho_vivo_spark.io.fsutil import hadoop_fs

    fs, pq_p = hadoop_fs(spark, f"{path}/{_PQ_DIR}")
    if fs.exists(pq_p):
        raise ValueError(
            f"{path} is an IVF-PQ index (codebook table present) — "
            f"append with append_to_ivfpq_index so batch rows carry "
            f"codes; plain-IVF appends would serve NULL adc_dist"
        )
    wm = _read_watermark(spark, path)
    if batch_id <= wm:
        return False
    cents = _centroid_frame(spark, path)
    n_cells = cents.count()
    assigned = ivf_assign(emb_batch, n_cells, cents)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{path}/cells/ingest_batch_id={batch_id}"
    )
    return True


def compact_ivf_index(
    spark: SparkSession,
    path: str,
    auto_rebuild: bool = True,
    max_skew: float = 4.0,
    max_occupancy: float | None = None,
    use_kmeans: bool = True,
) -> int:
    """Fold accumulated per-batch partitions into the single base
    partition (``ingest_batch_id = -1``) — the append-then-compact
    lifecycle of the dedup signature store.  Assignment-sized job;
    embeddings are never re-quantized by the fold itself.

    ``auto_rebuild`` (round 15, r14 verdict #4 — the DEFAULT posture):
    after the fold, the occupancy telemetry is CHECKED, not merely
    emitted — a skew breach (hot cells, ``max_skew``) or a density
    breach (uniform growth past ``max_occupancy``, default
    ``DEFAULT_CELL_OCCUPANCY``) triggers ``maybe_rebuild_ivf_index``'s
    retrain/re-quantize right here, at the one lifecycle point that
    already pays a full-index rewrite.  A healthy index pays one
    bounded per-cell count — no retrain, centroids untouched.  Opt out
    (``auto_rebuild=False``) for pipelines that schedule rebuilds
    explicitly; the fixed-grid degradation the 10× scale tier measured
    is then the caller's documented responsibility.

    Generation interaction: a triggered rebuild resets the watermark
    to -1 (fresh index generation — ``maybe_rebuild_ivf_index``'s
    long-standing contract, same as the explicit CLI
    ``--compact --rebuild-if-skewed`` sequence), so pre-rebuild batch
    ids must not be replayed afterward; their rows already live in the
    rebuilt base.  Callers needing the fold's watermark semantics in
    isolation pass ``auto_rebuild=False``.

    Durability: the merged rows are first written to a SIDE directory
    (``cells_compacting``), then swapped in under a persistent marker
    (io/fsutil.py: marker → delete → rename → clear) — at every
    instant a complete durable copy of the index exists on storage,
    unlike an in-place overwrite backed only by executor-local
    checkpoint blocks (one lost executor mid-write would otherwise
    destroy the index).  A crash in the destructive window is repaired
    here on the next call; writers refuse while the marker exists, so
    an intervening append can never recreate the directory and trick
    recovery into overwriting the only complete copy.  The compaction
    WATERMARK (highest folded batch id) is recorded before the swap,
    so a batch replayed after its rows were folded is skipped by
    ``append_to_ivf_index`` instead of duplicating vectors —
    conservatively: a crash after the watermark but before the swap
    only SKIPS those replays (their data is still in the pre-swap
    directory), never duplicates.

    Returns the compacted vector count.
    """
    from etl_olho_vivo_spark.io.fsutil import recover_pending_swap, swap_dir

    cells_dir = f"{path}/cells"
    tmp_dir = f"{path}/cells_compacting"
    if recover_pending_swap(spark, tmp_dir, cells_dir):
        # the crashed compaction's result is now live — done
        return spark.read.parquet(cells_dir).count()
    cells = spark.read.parquet(cells_dir)
    max_id = cells.agg(F.max("ingest_batch_id")).first()[0]
    # constant batch -1 keeps the two-level ingest_batch_id/cell_id
    # layout UNIFORM — a flat cell_id-only rewrite would leave mixed
    # directory depths once the next append lands, breaking partition
    # discovery for the whole table.  Column-preserving (drop/re-add the
    # batch column instead of naming data columns) so an IVF-PQ index's
    # ``codes`` column survives compaction.
    (
        cells.drop("ingest_batch_id")
        .withColumn("ingest_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("ingest_batch_id", "cell_id")
        .parquet(tmp_dir)
    )
    if max_id is not None and max_id > _read_watermark(spark, path):
        _write_watermark(spark, path, int(max_id))
    swap_dir(spark, tmp_dir, cells_dir)
    n = spark.read.parquet(cells_dir).count()
    if auto_rebuild:
        if max_occupancy is None:
            max_occupancy = DEFAULT_CELL_OCCUPANCY
        # row count is invariant under the rebuild (every resident
        # survives — the rebuild test pins it), so n stays correct
        maybe_rebuild_ivf_index(
            spark, path, max_skew=max_skew,
            max_occupancy=max_occupancy, use_kmeans=use_kmeans,
        )
    return n


def occupancy_stats(counts: list[int]) -> dict:
    """max/mean/skew summary of a bounded bucket-size list — shared by
    ``cell_stats`` and the Z-order ``optimize`` CLI telemetry so the
    skew formula/rounding can never drift between the two artifacts."""
    if not counts:
        return {"n": 0, "max": 0, "mean": 0.0, "skew_ratio": None}
    mean = sum(counts) / len(counts)
    return {
        "n": len(counts),
        "max": max(counts),
        "mean": round(mean, 1),
        "skew_ratio": round(max(counts) / mean, 2),
    }


def cell_stats(spark: SparkSession, path: str) -> dict:
    """Per-cell occupancy telemetry — the serving-skew dial.

    A hot cell (boilerplate-adjacent embeddings piling into one
    centroid) turns every probe that selects it into a straggler scan:
    probed-cell cost is the cell's row count, so serving latency is
    governed by ``max_cell``, not ``mean_cell``.  One bounded
    aggregation (n_cells result rows); emitted by the ``ann-build``
    CLI at build/append/compact time so occupancy drift is visible in
    the job artifacts.

    Rebuild trigger: when ``skew_ratio`` = max_cell/mean_cell exceeds
    ~4, rebuild with re-trained centroids (and at corpus growth, more
    cells — n_cells ∝ corpus keeps per-cell density constant); appends
    never retrain, so a drifting corpus degrades here FIRST, long
    before recall visibly drops.  ``maybe_rebuild_ivf_index`` (or
    ``ann-build --rebuild-if-skewed``) executes exactly this contract.
    """
    counts = [
        int(r["n"])
        for r in (
            spark.read.parquet(f"{path}/cells")
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: one row per cell
        )
    ]
    s = occupancy_stats(counts)
    return {
        "n_cells_occupied": s["n"],
        "max_cell": s["max"],
        "mean_cell": s["mean"],
        "skew_ratio": s["skew_ratio"],
        # exact resident count (sum of the same per-cell counts, no
        # extra job) — the density trigger's n_cells ∝ corpus input;
        # the rounded mean is too coarse to reconstruct it
        "total_vectors": sum(counts),
    }


def dequantized_cells(spark: SparkSession, path: str) -> DataFrame:
    """The resident vectors reconstructed from the stored quantized
    components — ``(vec_id, label, embedding)`` with ``embedding =
    qv / QUANT`` — the self-contained rebuild source.

    Losslessness: every downstream index computation consumes the
    QUANTIZED components only, and requantizing the reconstruction
    reproduces them exactly — ``round((q/QUANT)·QUANT) == q`` for any
    ``|q| < 2^51`` (one double divide + multiply perturbs by ≪ 0.5) —
    so an index rebuilt from this frame is bit-identical to one rebuilt
    from the original float embeddings."""
    return spark.read.parquet(f"{path}/cells").select(
        "vec_id",
        "label",
        F.expr(
            f"transform(qv, x -> CAST(x AS DOUBLE) / {QUANT})"
        ).alias("embedding"),
    )


_REBUILD_SRC = "rebuild_src"


def maybe_rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    max_skew: float = 4.0,
    n_cells: int | None = None,
    use_kmeans: bool = True,
    max_occupancy: float | None = None,
    **kmeans_kwargs,
) -> dict:
    """The occupancy rebuild trigger — ``cell_stats``'s documented
    contract, executable: when ``skew_ratio`` (max_cell/mean_cell)
    exceeds ``max_skew``, rebuild the index with RE-TRAINED centroids
    over every resident vector (base + all batch partitions), restoring
    balanced cells and the recall the frozen quantizer has drifted away
    from.  Appends never retrain (their docstring says why), so this is
    the one sanctioned retraining path.

    ``max_occupancy`` (round 15, r14 verdict #4) adds the DENSITY
    trigger the skew ratio is blind to: a corpus that grows uniformly
    keeps skew ≈ 1 while every cell — and so every probe, and the
    near-dup stage's within-cell quadratic work — fattens toward the
    density wall the 10× scale tier measured on the fixed grid.  When
    ``mean_cell`` exceeds the bound, the rebuild RE-QUANTIZES with
    ``n_cells = ceil(total / (max_occupancy/2))`` (hysteresis: density
    lands at half the bound, so steady growth re-triggers only per
    corpus doubling, not per compaction) — n_cells ∝ corpus, per-cell
    density constant.  ``compact_ivf_index`` passes
    ``DEFAULT_CELL_OCCUPANCY`` by default, making
    re-quantization-on-density-breach the maintenance path's default
    posture rather than an operator argument.

    ``n_cells=None`` keeps the stamped cell count (unless the density
    trigger grows it); pass a larger value as the corpus grows
    (n_cells ∝ corpus keeps per-cell density — and probe cost —
    constant).

    Crash safety (snapshot-then-rebuild): residents are first exported
    to ``<path>/rebuild_src`` (dequantized — see ``dequantized_cells``),
    and the rebuild consumes ONLY that snapshot — never the cells tree
    it is overwriting (Spark cannot overwrite a path a job is reading).
    A crash mid-rebuild leaves the snapshot (with parquet's _SUCCESS
    marker) in place; the next call detects it and resumes the rebuild
    from the snapshot REGARDLESS of current skew — the cells tree may be
    half-overwritten at that point, so the snapshot is the authoritative
    corpus and re-running the build from it is idempotent.  The snapshot
    is deleted only after the rebuild (centroids + cells + watermark
    reset) completes.  Single-writer assumption, as for compaction.

    Returns ``{"rebuilt": False, "stats": ...}`` when under threshold,
    else ``{"rebuilt": True, "stats_before": ... | None (crash resume),
    "stats_after": ..., "n_cells": N}``.
    """
    from etl_olho_vivo_spark.io.fsutil import hadoop_fs

    if max_skew <= 0:
        raise ValueError(f"max_skew must be > 0, got {max_skew}")
    snap = f"{path}/{_REBUILD_SRC}"
    fs, success_p = hadoop_fs(spark, f"{snap}/_SUCCESS")
    resuming = fs.exists(success_p)
    before = None
    if not resuming:
        assert_no_pending_swap(spark, f"{path}/cells")
        before = cell_stats(spark, path)
        skew_breach = (
            before["skew_ratio"] is not None
            and before["skew_ratio"] > max_skew
        )
        dens_breach = (
            max_occupancy is not None
            and before["mean_cell"] > max_occupancy
        )
        if not (skew_breach or dens_breach):
            return {"rebuilt": False, "stats": before}
        # stamp the cell count INTO the snapshot so a crash-resume does
        # not depend on the (possibly half-overwritten) centroid table.
        # An IVF-PQ index stamps its codebook shape too — the rebuild
        # must go through build_ivfpq_index or the codes column (and
        # the ADC serving path with it) would silently vanish.
        stamped = n_cells if n_cells is not None else int(
            spark.read.parquet(f"{path}/centroids")
            .select("n_cells").first()["n_cells"]
        )
        if n_cells is None and dens_breach:
            # density growth path: re-quantize to half the bound
            # (hysteresis), never shrink below the stamped grid
            import math

            stamped = max(stamped, math.ceil(
                before["total_vectors"] / (max_occupancy / 2)
            ))
        m_sub, k_codes = -1, -1
        _, pq_p = hadoop_fs(spark, f"{path}/{_PQ_DIR}")
        if fs.exists(pq_p):
            meta = (
                spark.read.parquet(f"{path}/{_PQ_DIR}")
                .select("m_sub", "k_codes").first()
            )
            m_sub, k_codes = int(meta["m_sub"]), int(meta["k_codes"])
        (
            dequantized_cells(spark, path)
            .withColumn("__n_cells__", F.lit(stamped))
            .withColumn("__m_sub__", F.lit(m_sub))
            .withColumn("__k_codes__", F.lit(k_codes))
            .write.mode("overwrite")
            .parquet(snap)
        )
    emb = spark.read.parquet(snap)
    if n_cells is None:
        n_cells = int(emb.select("__n_cells__").first()["__n_cells__"])
    if "__m_sub__" not in emb.columns:
        # snapshot written before the IVF-PQ stamp existed — plain IVF
        emb = emb.withColumn("__m_sub__", F.lit(-1)).withColumn(
            "__k_codes__", F.lit(-1)
        )
    shape = emb.select("__m_sub__", "__k_codes__").first()
    src = emb.drop("__n_cells__", "__m_sub__", "__k_codes__")
    if int(shape["__m_sub__"]) > 0:
        build_ivfpq_index(
            src, path, n_cells=n_cells,
            m_sub=int(shape["__m_sub__"]),
            k_codes=int(shape["__k_codes__"]),
            use_kmeans=use_kmeans, **kmeans_kwargs,
        )
    else:
        build_ivf_index(
            src, path, n_cells=n_cells,
            use_kmeans=use_kmeans, **kmeans_kwargs,
        )
    _, snap_p = hadoop_fs(spark, snap)
    fs.delete(snap_p, True)
    after = cell_stats(spark, path)
    return {
        "rebuilt": True,
        "stats_before": before,
        "stats_after": after,
        "n_cells": n_cells,
    }


def run_embedding_stream(
    emb_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous index ingestion: each micro-batch of new embedding
    rows is assigned against the frozen centroids and lands in its own
    batch partition — idempotent under at-least-once replay by the
    ``append_to_ivf_index`` contract (replay overwrites its own
    partition; a replay of a batch already folded by compaction is a
    no-op, since its rows live in the base in full).  The index must
    exist (``build_ivf_index`` / ``build_ivfpq_index``) before the
    stream starts; centroid load is validated once per batch through
    the stamped grid.  The appender is chosen per batch from the tree's
    own type marker (the codebook table), so an IVF-PQ index ingests
    residual-encoded rows — never codes-less ones that would serve
    NULL adc_dist."""

    def _append(batch: DataFrame, batch_id: int) -> None:
        from etl_olho_vivo_spark.io.fsutil import hadoop_fs

        fs, pq_p = hadoop_fs(batch.sparkSession, f"{path}/{_PQ_DIR}")
        if fs.exists(pq_p):
            append_to_ivfpq_index(batch, path, int(batch_id))
        else:
            append_to_ivf_index(batch, path, int(batch_id))

    writer = emb_stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _quantize_py(vector: list[float]) -> list[int]:
    """Driver-side quantization of an EXTERNAL query vector.  Spark's
    round() is HALF_UP (away from zero); Python's round() is banker's —
    a component landing exactly on the grid midpoint (e.g. 2.5e-06)
    would quantize differently on the two sides and can flip the probe
    cell / break ranking parity with the stored assignment.  Replicate
    HALF_UP explicitly — shared by the IVF and IVF-PQ query paths so
    the two grids can never drift."""
    import math

    def _q(x: float) -> int:
        d = float(x) * QUANT
        return (
            int(math.floor(d + 0.5))
            if d >= 0
            else -int(math.floor(-d + 0.5))
        )

    return [_q(x) for x in vector]


def query_ivf_index(
    index: IvfIndex,
    vector: list[float],
    k: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """Top-k (by exact integer inner product) for an EXTERNAL query
    vector — the serving path: probe-cell selection is pure Python over
    the collected centroids, and the candidate scan reads only the
    probed cell partitions (partition pruning).

    Returns ``(vec_id, label, cell_id, dot_q)`` ordered by descending
    dot product with vec_id tiebreak — same ranking contract as
    ``similarity.ivf_topk``.
    """
    if not index.centroids:
        raise ValueError("empty centroid table")
    dim = len(index.centroids[0][1])
    if len(vector) != dim:
        raise ValueError(
            f"query vector has dim {len(vector)}, index has dim {dim}"
        )
    q = _quantize_py(vector)
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qc, q)), cell_id)
        for cell_id, qc in index.centroids
    )
    probe = [cell_id for _, cell_id in ranked[: max(1, n_probe)]]
    qcol = F.array(*[F.lit(x) for x in q])
    return (
        index.cells.filter(F.col("cell_id").isin(probe))
        .withColumn("q_qv", qcol)
        .select(
            "vec_id",
            "label",
            "cell_id",
            F.expr(_dot_int("qv", "q_qv")).alias("dot_q"),
        )
        .orderBy(F.col("dot_q").desc(), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed index (coarse cells + residual PQ codes) — the
# standard two-level serving architecture (Jégou et al. 2011 §IVFADC)
# ---------------------------------------------------------------------------

_PQ_DIR = "pq_codebooks"


@dataclass
class IvfPqIndex:
    """A loaded IVF-PQ index: bounded driver-side centroids + residual
    codebooks, plus the lazy cell-partitioned code frame."""

    centroids: list[tuple[int, list[int]]]  # (cell_id, quantized centroid)
    codebooks: list[list[list[int]]]  # [sub][code] -> residual subvector
    cells: DataFrame  # vec_id, label, qv, codes (+ partition columns)
    path: str


def _write_pq_codebooks(
    spark: SparkSession, path: str, codebooks: list[list[list[int]]]
) -> None:
    """Persist the bounded codebook structure as one small parquet
    relation (``m_sub · k_codes`` rows), stamped with its shape and the
    quantization grid — same validate-at-load contract as the centroid
    table."""
    rows = [
        (s, j, list(map(int, cb)))
        for s, subs in enumerate(codebooks)
        for j, cb in enumerate(subs)
    ]
    (
        spark.createDataFrame(
            rows, "sub_id int, code_id int, qc array<bigint>"
        )
        .withColumn("m_sub", F.lit(len(codebooks)))
        .withColumn("k_codes", F.lit(len(codebooks[0])))
        .withColumn("quant", F.lit(QUANT))
        .write.mode("overwrite")
        .parquet(f"{path}/{_PQ_DIR}")
    )


def _load_pq_codebooks(
    spark: SparkSession, path: str
) -> list[list[list[int]]]:
    """Load + validate the persisted residual codebooks (bounded
    collect).  A grid or shape mismatch is a loud error — ADC over
    incommensurate integers would rank garbage silently."""
    from etl_olho_vivo_spark.io.fsutil import hadoop_fs

    fs, pq_p = hadoop_fs(spark, f"{path}/{_PQ_DIR}")
    if not fs.exists(pq_p):
        raise ValueError(
            f"{path} has no codebook table — a plain IVF index; build "
            f"with build_ivfpq_index (or query via query_ivf_index)"
        )
    df = spark.read.parquet(f"{path}/{_PQ_DIR}")
    meta = df.select("m_sub", "k_codes", "quant").first()
    if meta is None:
        raise ValueError(f"IVF-PQ index at {path} has an empty codebook table")
    if meta["quant"] != QUANT:
        raise ValueError(
            f"IVF-PQ index at {path} was built on quantization grid "
            f"{meta['quant']}, engine uses {QUANT}; rebuild the index"
        )
    m_sub, k_codes = int(meta["m_sub"]), int(meta["k_codes"])
    books: list[list[list[int] | None]] = [
        [None] * k_codes for _ in range(m_sub)
    ]
    for r in df.select("sub_id", "code_id", "qc").collect():
        books[int(r["sub_id"])][int(r["code_id"])] = list(r["qc"])
    if any(c is None for sub in books for c in sub):
        raise ValueError(
            f"IVF-PQ codebook table at {path} is incomplete "
            f"(expected {m_sub}x{k_codes} entries)"
        )
    return books  # type: ignore[return-value]


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 8,
    m_sub: int = 8,
    k_codes: int = 16,
    use_kmeans: bool = True,
    **kmeans_kwargs,
) -> int:
    """Build the composed index: coarse quantizer → residual codebooks →
    per-vector (cell_id, codes) — the cells tree carries BOTH the
    quantized vector (for exact re-rank / rebuilds) and the slim code
    array (what the ADC stage scans; parquet columnar layout means an
    ADC scan never reads the qv bytes).  Same partition layout,
    watermark, and overwrite discipline as ``build_ivf_index``."""
    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1, got {n_cells}")
    cents = (
        kmeans_centroids(emb, n_cells, **kmeans_kwargs)
        if use_kmeans
        else _default_centroids(emb, n_cells)
    )
    spark = emb.sparkSession
    (
        cents.withColumn("n_cells", F.lit(n_cells))
        .withColumn("quant", F.lit(QUANT))
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )
    cent_frame = _centroid_frame(spark, path)
    books = ivfpq_codebooks(
        emb, cent_frame, n_cells=n_cells, m_sub=m_sub, k_codes=k_codes
    )
    _write_pq_codebooks(spark, path, books)
    encoded = ivfpq_encode(emb, cent_frame, books, n_cells=n_cells)
    (
        encoded.withColumn("ingest_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("ingest_batch_id", "cell_id")
        .parquet(f"{path}/cells")
    )
    _write_watermark(spark, path, -1)
    return spark.read.parquet(f"{path}/cells").count()


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    """Load centroids + codebooks (collected — both bounded) and the
    lazy cell frame; refuses plain-IVF trees and pending swaps."""
    assert_no_pending_swap(spark, f"{path}/cells")
    cents = [
        (r["cell_id"], list(r["qc"]))
        for r in _centroid_frame(spark, path).collect()
    ]
    books = _load_pq_codebooks(spark, path)
    cells = spark.read.parquet(f"{path}/cells")
    if "codes" not in cells.columns:
        raise ValueError(
            f"{path} has no codes column — a plain IVF index; build "
            f"with build_ivfpq_index (or query via query_ivf_index)"
        )
    return IvfPqIndex(centroids=cents, codebooks=books, cells=cells,
                      path=path)


def append_to_ivfpq_index(
    emb_batch: DataFrame, path: str, batch_id: int
) -> bool:
    """Assign + residual-encode a batch against the PERSISTED centroids
    and codebooks and land it under its own partition tree — the same
    frozen-quantizer, idempotent-per-batch contract as
    ``append_to_ivf_index`` (whose docstring carries the full replay /
    watermark reasoning)."""
    if batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0 (-1 is the build partition), "
            f"got {batch_id}"
        )
    spark = emb_batch.sparkSession
    assert_no_pending_swap(spark, f"{path}/cells")
    if batch_id <= _read_watermark(spark, path):
        return False
    cents = _centroid_frame(spark, path)
    n_cells = cents.count()
    books = _load_pq_codebooks(spark, path)
    encoded = ivfpq_encode(emb_batch, cents, books, n_cells=n_cells)
    encoded.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{path}/cells/ingest_batch_id={batch_id}"
    )
    return True


def query_ivfpq_index(
    index: IvfPqIndex,
    vector: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
) -> DataFrame:
    """Serve an EXTERNAL query vector through the composed stack: probe
    the ``n_probe`` nearest cells (pure Python over the collected
    centroids), ADC-score ONLY those cells' codes with per-cell residual
    LUTs (the scan prunes to the probed cell partitions and reads the
    slim codes column), exact-integer re-rank the ``rerank``-best pool
    (its qv fetch reads the same pruned partitions).

    Returns ``(vec_id, label, cell_id, adc_dist, l2_exact)`` ordered by
    ascending exact distance with vec_id tiebreak — distance semantics
    (for the unit-norm corpora real retrieval uses, the ranking matches
    ``query_ivf_index``'s descending dot)."""
    if rerank < k:
        raise ValueError(f"rerank pool {rerank} smaller than k {k}")
    if not index.centroids:
        raise ValueError("empty centroid table")
    dim = len(index.centroids[0][1])
    if len(vector) != dim:
        raise ValueError(
            f"query vector has dim {len(vector)}, index has dim {dim}"
        )
    m_sub = len(index.codebooks)
    sub_len = len(index.codebooks[0][0])
    if dim != m_sub * sub_len:
        raise ValueError(
            f"index dim {dim} != codebook dim {m_sub * sub_len}"
        )
    q = _quantize_py(vector)
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qc, q)), cid)
        for cid, qc in index.centroids
    )
    probes = [cid for _, cid in ranked[: max(1, n_probe)]]
    cents = dict(index.centroids)
    luts = {}
    for cid in probes:
        rq = [a - b for a, b in zip(q, cents[cid])]
        luts[cid] = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(rq[s * sub_len:(s + 1) * sub_len], cb_j)
                )
                for cb_j in index.codebooks[s]
            ]
            for s in range(m_sub)
        ]
    pool = (
        index.cells.filter(F.col("cell_id").isin(probes))
        .select(
            "vec_id",
            "label",
            "cell_id",
            F.expr(_ivfpq_adc_case(probes, luts)).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(rerank)
    )
    # qv fetch for the bounded pool — same pruned partitions, and the
    # pool side broadcasts into the scan (rerank rows)
    qv_rel = index.cells.filter(F.col("cell_id").isin(probes)).select(
        "vec_id", "qv"
    )
    return (
        pool.join(qv_rel, "vec_id")
        .select(
            "vec_id",
            "label",
            "cell_id",
            "adc_dist",
            F.expr(
                _l2sq_int("qv", _sql_bigint_array(q))
            ).alias("l2_exact"),
        )
        .orderBy("l2_exact", "vec_id")
        .limit(k)
    )
