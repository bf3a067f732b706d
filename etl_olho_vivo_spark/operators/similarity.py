"""Similarity search over embedding columns (``array<float>``).

Two strategies (SURVEY §2.11):
- **brute-force cosine top-k** — the correctness baseline; a broadcast of
  the query vector + one JVM-side fold per row, then TakeOrdered(k).
  O(n·d) scan, no shuffle: at 100 TB this is a single pass.
- **IVF (inverted-file) top-k** — the scale path: rows are bucketed to
  their nearest centroid (coarse quantizer) once at ingest; a query probes
  only its own cell(s), cutting the scan by the number of cells.  Distances
  for cell assignment use **integer-quantized components** (round(x·1e6))
  so assignment is exact integer math — deterministic across engines and
  across partial-aggregation orders, the same trick scalar-quantized IVF
  indexes use.

All vector math is ``zip_with``/``aggregate`` higher-order Column
expressions — JVM-side, Arrow-free, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000000.0  # 1e-6 component grid for exact integer distances


def _dot_double(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )


def _quantize(a: str) -> str:
    return (
        f"transform({a}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}, 0) "
        f"AS BIGINT))"
    )


def _dot_int(a: str, b: str) -> str:
    """Exact integer dot product of two quantized vectors."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (s, v) -> s + v)"
    )


def _l2sq_int(a: str, b: str) -> str:
    """Exact integer squared L2 distance of two quantized vectors."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (s, v) -> s + v)"
    )


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, round_dp: int = 6
) -> DataFrame:
    """Brute-force cosine top-k against the embedding of ``query_vec_id``.

    cos is rounded (transcendental-free but summation-order-sensitive in
    the last ulps); ordering uses the rounded value + vec_id tiebreak so
    the top-k set is deterministic.
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    cand = emb.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    dot = F.expr(_dot_double("embedding", "qe"))
    na = F.expr(_dot_double("embedding", "embedding"))
    nb = F.expr(_dot_double("qe", "qe"))
    cos = F.round(dot / (F.sqrt(na) * F.sqrt(nb)), round_dp)
    return (
        cand.select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def ivf_assign(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """Assign every vector to its nearest coarse centroid.

    Centroids are the first ``n_cells`` vectors (deterministic seeding — a
    production build would run k-means||; the assignment machinery is
    identical).  Exact integer distances + (dist, cell_id) ordering make
    the argmin fully deterministic.
    """
    cents = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.expr(_quantize("embedding")).alias("qc"),
    )
    vecs = emb.select(
        "vec_id", "label", F.expr(_quantize("embedding")).alias("qv")
    )
    dist = F.expr(_l2sq_int("qv", "qc"))
    w = Window.partitionBy("vec_id").orderBy("dist", "cell_id")
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "qv", "cell_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "cell_id", "qv")
    )


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 10, n_cells: int = 8) -> DataFrame:
    """ANN top-k: probe only the query's IVF cell, rank by exact integer
    dot product (descending), vec_id tiebreak."""
    assigned = ivf_assign(emb, n_cells)
    qcell = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("cell_id").alias("q_cell"), F.col("qv").alias("q_qv")
    )
    cand = (
        assigned.filter(F.col("vec_id") != query_vec_id)
        .join(
            F.broadcast(qcell),
            F.col("cell_id") == F.col("q_cell"),
        )
    )
    dot = F.expr(_dot_int("qv", "q_qv"))
    return (
        cand.select("vec_id", "label", "cell_id", dot.alias("dot_q"))
        .orderBy(F.col("dot_q").desc(), "vec_id")
        .limit(k)
    )
