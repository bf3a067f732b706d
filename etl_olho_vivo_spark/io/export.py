"""JSONL export — the corpus's hand-off format to training stacks.

LLM training pipelines overwhelmingly consume newline-delimited JSON
shards (one document object per line, gzip'd, sharded by some grouping
key).  The engine's corpus artifacts are parquet (typed, prunable,
compact); this is the one-way bridge OUT: distributed `write.json`
keeps the export a parallel task-per-shard job — no driver
serialization, no collect — and gzip'd JSONL shards stream straight
into tokenizer workers.

Lossiness is inherent to the format and deliberate: JSON has no
int64-vs-float distinction, no binary, no timestamp type.  Binary
columns are rejected loudly rather than silently base64'd — a caller
who wants media in the export must encode it intentionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_olho_vivo_spark.functions.hashing import seeded_key_expr


def _has_binary(dt: T.DataType) -> bool:
    """Recursive binary detection — a top-level-only check would let
    struct/array/map-nested binary slip through to silent base64."""
    if isinstance(dt, T.BinaryType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_binary(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_binary(dt.keyType) or _has_binary(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_has_binary(f.dataType) for f in dt.fields)
    return False


def global_shuffle(
    df: DataFrame,
    *,
    seed: int = 0,
    by: str = "doc_id",
    n_shards: int = 32,
    shard_col: str = "shard",
    split_col: str | None = None,
) -> DataFrame:
    """Deterministic seeded global shuffle into ``n_shards`` shards.

    Training wants documents decorrelated from ingest order (a shard
    that is one crawl host or one day of data skews every batch drawn
    from it).  ``orderBy(rand())`` is nondeterministic under retries and
    a full global sort besides; this instead derives both the shard and
    the within-shard order from ``md5(key ‖ seed)``:

    - shard = hash % n_shards — exact, independent of input
      partitioning, stable across runs and engine versions;
    - within-shard order = (hash, key) — a deterministic permutation,
      so re-exports are byte-identical and resumable.

    Cost is ONE hash-partitioned exchange on the shard id plus a
    per-partition sort (spillable) — no global sort, no sampling pass.
    Every row of a shard lands in a single task, so a downstream
    ``export_jsonl(by=shard_col)`` writes one ordered file per shard.
    A different ``seed`` yields an independent permutation (epoch
    reshuffles without rewriting the corpus).

    When the frame carries a train/val/test label, pass it as
    ``split_col``: the within-partition order then LEADS with the split,
    so an export partitioned by ``[split_col, shard_col]`` writes one
    ordered file per (split, shard) with no writer-side re-sort — and
    train/val/test rows never share a shard file (a loader reading
    mixed-split shards silently trains on validation data).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # domain-separated seed: the WITHIN-SHARD ORDER is the key's
    # magnitude, and cap_per_group/sample_mixture select by magnitude
    # too — on a shared raw seed a capped domain's survivors (all
    # low-key) would sort to the FRONT of every shard, re-correlating
    # exactly what this shuffle exists to decorrelate
    h = F.expr(seeded_key_expr(by, f"shuffle-{seed}"))
    order = ([split_col] if split_col is not None else []) + [
        shard_col, "__h__", by
    ]
    return (
        df.withColumn("__h__", h)
        .withColumn(shard_col, (F.col("__h__") % n_shards).cast("int"))
        .repartition(n_shards, shard_col)
        .sortWithinPartitions(*order)
        .drop("__h__")
    )


def export_jsonl(
    df: DataFrame,
    path: str,
    by: str | list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write ``df`` as (optionally sharded, optionally gzip'd) JSONL.

    ``by`` Hive-partitions the export (one directory of shards per
    value — e.g. ``lang_guess`` for per-language training mixes, or
    ``["split", "shard"]`` so train/val/test never share a shard file).
    """
    binary_cols = [
        f.name for f in df.schema.fields if _has_binary(f.dataType)
    ]
    if binary_cols:
        raise ValueError(
            f"refusing to JSONL-export binary column(s) {binary_cols}; "
            "encode them explicitly (e.g. base64) if they must ship"
        )
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if by is not None:
        w = w.partitionBy(*([by] if isinstance(by, str) else by))
    w.json(path)
