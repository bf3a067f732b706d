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
    <path>/cells/       vec_id, label, qv, partitioned BY cell_id

The cell partitioning is the serving contract at 100 TB: a query with
``n_probe`` cells reads ONLY those partition directories (Spark
partition pruning — asserted in tests), so query cost is the probed
fraction of the corpus, not a full scan.  Appends add files to existing
cell directories; no rewrite of resident data.

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

from etl_olho_vivo_spark.operators.similarity import (
    QUANT,
    _default_centroids,
    _dot_int,
    ivf_assign,
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
    spark = emb.sparkSession
    assigned = ivf_assign(emb, n_cells, _centroid_frame(spark, path))
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{path}/cells"
    )
    return spark.read.parquet(f"{path}/cells").count()


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
    """Load centroids (collected — n_cells rows) + the lazy cell frame."""
    cents = [
        (r["cell_id"], list(r["qc"]))
        for r in _centroid_frame(spark, path).collect()
    ]
    cells = spark.read.parquet(f"{path}/cells")
    return IvfIndex(centroids=cents, cells=cells, path=path)


def append_to_ivf_index(emb_batch: DataFrame, path: str) -> None:
    """Assign a batch of new vectors against the persisted centroids and
    append them to their cell partitions.

    The quantizer is frozen at build time on purpose: retraining
    centroids per batch would silently re-shape every existing cell's
    meaning without reassigning its residents.  Rebuild the index when
    the corpus distribution drifts (standard IVF practice).
    """
    spark = emb_batch.sparkSession
    cents = _centroid_frame(spark, path)
    n_cells = cents.count()
    assigned = ivf_assign(emb_batch, n_cells, cents)
    assigned.write.mode("append").partitionBy("cell_id").parquet(
        f"{path}/cells"
    )


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
    q = [int(round(float(x) * QUANT)) for x in vector]
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
