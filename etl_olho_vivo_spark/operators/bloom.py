"""Distributed Bloom-filter membership — Dolma-style snapshot dedup.

Large-scale corpus pipelines (Dolma's paragraph dedup, CCNet's
inter-snapshot dedup) flag units of a NEW crawl whose content already
appears in a reference set too large to broadcast: at 100 TB the
reference gram/paragraph set is billions of keys, so neither a broadcast
hash set (driver/executor OOM) nor a plain shuffled semi-join of the
full corpus against the full reference (two corpus-scale exchanges) is
the plan you want.

The Bloom filter here is a *DataFrame relation* ``(word, bits)`` — a
sparse 64-bit-word bitmap of at most ``num_bits / 64`` rows:

- **build**: one projection over the reference keys (k positions per
  key, JVM-side xxhash64) + one uniform shuffle on ``word`` with
  map-side partial ``bit_or`` — never a driver-side bitmap, never a
  Python loop.
- **probe**: an equi-join on ``word`` (uniform by hash construction —
  no skew regardless of key skew) + one aggregate back on the key.
  When the filter is small enough the join side is broadcast and the
  probe costs ZERO shuffles beyond the key aggregate.
- **no false negatives** by construction; false positives bounded by
  the sizing formula (``bloom_parameters``).  ``mark_members`` offers
  both the FP-tolerant pure-Bloom decision (the 100 TB fast path — the
  exact join never happens) and an exact mode where only the
  Bloom-passing minority reaches a verify semi-join, shrinking the
  expensive exchange to true-members + fpp·rest.

The filter bits are engine-internal (Spark xxhash64): no output of the
``verify=True`` path depends on them, which is what lets the registry
row ``bloom_gram_overlap`` be oracle-checked by plain SQL membership.

Reference scope: the reference repo has no membership-at-scale surface
(5 files, ~328 LoC); this operator is part of the beyond-reference
training-data tier (SURVEY §2.11).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# Filters at or under this many bits (= 2 MiB of bitmap, ≤ 256k relation
# rows) are broadcast on the probe side by default.
_BROADCAST_BITS_DEFAULT = 1 << 24


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic Bloom sizing: bits ``m`` (rounded up to a multiple of 64)
    and hash count ``k`` for ``n_items`` keys at false-positive rate
    ``fpp``.  m = -n·ln(p)/ln(2)²,  k = round(m/n·ln 2), both clamped
    to sane minima so degenerate inputs still build a valid filter."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _position_cols(key: str, num_bits: int, num_hashes: int) -> list[Column]:
    # Seeded family: xxhash64(seed_i, key) — the seed literal is mixed
    # into the 64-bit state, giving k independent positions per key.
    # pmod keeps positions in [0, num_bits) for negative hash values.
    return [
        F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _word_and_bit() -> tuple[Column, Column]:
    # Expressions over a previously-selected ``pos`` column.  pos >= 0
    # always (pmod), so DIV truncation == floor.  shiftleft goes through
    # F.expr: the classic-API F.shiftleft only takes a Python-int shift.
    word = F.expr("pos DIV 64")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
    return word, bit


def build_bloom_filter(
    keys: DataFrame, key: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """Reference keys → Bloom bitmap relation ``(word: long, bits: long)``.

    One shuffle total: the ``groupBy(word)`` partial-aggregates the
    per-key bit contributions map-side (``bit_or`` is associative and
    commutative), and ``word`` is uniform by hash construction so the
    exchange cannot skew.  Relation size ≤ num_bits/64 rows regardless
    of reference cardinality.  Duplicate reference keys are harmless
    (idempotent OR), so callers need not pre-distinct."""
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    pos = F.explode(F.array(*_position_cols(key, num_bits, num_hashes)))
    word, bit = _word_and_bit()
    return (
        keys.select(pos.alias("pos"))
        .select(word.alias("word"), bit.alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def probe_bloom(
    keys: DataFrame,
    bloom: DataFrame,
    key: str,
    num_bits: int,
    num_hashes: int,
    out: str = "bloom_maybe",
    broadcast: bool | None = None,
) -> DataFrame:
    """Per distinct probe key: ``out`` = true iff ALL k filter bits are
    set (the standard no-false-negative Bloom test).

    Plan shape: explode to k ``(key, word, bit)`` rows → equi-join the
    bitmap on ``word`` (broadcast when the filter fits — default
    num_bits ≤ 2^24 ⇒ ≤ 2 MiB — else a uniform shuffled join) →
    ``bool_and`` back on the key.  A word absent from the bitmap
    relation means no reference key ever touched it ⇒ miss."""
    if broadcast is None:
        broadcast = num_bits <= _BROADCAST_BITS_DEFAULT
    filt = F.broadcast(bloom) if broadcast else bloom
    pos = F.explode(F.array(*_position_cols(key, num_bits, num_hashes)))
    word, bit = _word_and_bit()
    probe = keys.select(F.col(key), pos.alias("pos")).select(
        key, word.alias("word"), bit.alias("bit")
    )
    hit = F.coalesce(F.col("bits").bitwiseAND(F.col("bit")) != 0, F.lit(False))
    return (
        probe.join(filt, "word", "left")
        .select(key, hit.alias("hit"))
        .groupBy(key)
        .agg(F.bool_and("hit").alias(out))
    )


def gram_overlap_vs_filter(
    df: DataFrame,
    filt: DataFrame,
    num_bits: int,
    num_hashes: int,
    id_col: str = "doc_id",
    text: str = "text",
    out: str = "snapshot_overlap",
    caches=None,
) -> DataFrame:
    """Per-document fraction of distinct 3-gram shingles present in a
    persisted Bloom filter — the pure-Bloom (verify-free) snapshot-dedup
    gate: the reference corpus is represented ONLY by its filter, so
    the per-gram decision carries the filter's FP rate (overlap can
    read high by ≤ ~fpp, never low — no false negatives).

    Adds ``out`` (double in [0,1]; 0.0 for docs too short to shingle)
    to ``df``.  The shingle arrays are persisted BEFORE the explode
    (the Generate-inlining hazard — see ``bloom_gram_overlap``'s
    registry doc) and the filter is probed once per distinct gram, not
    per occurrence."""
    from etl_olho_vivo_spark.operators.dedup import _persist, with_shingles

    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    sh_docs = _persist(
        # spread=False: the bitmap aggregate re-exchanges immediately —
        # the adaptive spread's extra exchange measured +0.1 s here and
        # buys nothing (see with_shingles)
        with_shingles(df, text, spread=False).select(id_col, "sh"), caches
    )
    grams = sh_docs.select(
        id_col, F.explode_outer("sh").alias("gh")
    )
    keys = grams.filter(F.col("gh").isNotNull()).select("gh").distinct()
    hits = (
        probe_bloom(keys, filt, "gh", num_bits, num_hashes)
        .filter(F.col("bloom_maybe"))
        .drop("bloom_maybe")
        .withColumn("hit", F.lit(1).cast("long"))
    )
    per_doc = (
        grams.join(hits, "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count("gh").alias("__n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0).cast("long")).alias("__n_hit"),
        )
        .select(
            id_col,
            F.when(
                F.col("__n_grams") > 0,
                F.col("__n_hit") / F.col("__n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias(out),
        )
    )
    return df.join(per_doc, id_col, "left").fillna({out: 0.0})


def merge_bloom_filters(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two bitmap relations of the SAME geometry (num_bits,
    num_hashes) into one — the incremental-snapshot path: build a
    filter per crawl batch, fold them instead of re-hashing history.
    Union + one uniform ``bit_or`` shuffle; associative and idempotent,
    so replayed batches cannot corrupt the filter.  Callers own the
    geometry contract (persisted filters carry it in their manifest,
    see ``write_bloom_filter``)."""
    return (
        a.select("word", "bits")
        .unionByName(b.select("word", "bits"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def write_bloom_filter(
    filt: DataFrame, path: str, num_bits: int, num_hashes: int
) -> None:
    """Persist a bitmap relation + its geometry manifest.

    The manifest (a 1-row parquet beside the bitmap) pins (num_bits,
    num_hashes): probing with the wrong geometry returns silently
    wrong membership, so ``read_bloom_filter`` returns the stored
    geometry and refuses mismatched merges at the caller's check."""
    spark = filt.sparkSession
    filt.select("word", "bits").write.mode("overwrite").parquet(
        f"{path}/bitmap"
    )
    spark.createDataFrame(
        [(int(num_bits), int(num_hashes))], "num_bits long, num_hashes int"
    ).write.mode("overwrite").parquet(f"{path}/manifest")


def read_bloom_filter(spark, path: str) -> tuple[DataFrame, int, int]:
    """Load a persisted filter → (bitmap relation, num_bits, num_hashes)."""
    m = spark.read.parquet(f"{path}/manifest").collect()[0]
    return (
        spark.read.parquet(f"{path}/bitmap"),
        int(m["num_bits"]),
        int(m["num_hashes"]),
    )


def mark_members(
    df: DataFrame,
    reference_keys: DataFrame,
    key: str,
    out: str = "is_member",
    fpp: float = 0.01,
    n_items: int | None = None,
    verify: bool = True,
    broadcast: bool | None = None,
    caches=None,
) -> DataFrame:
    """Add boolean ``out``: does ``df[key]`` appear in ``reference_keys``?

    ``verify=True`` (exact — the oracle-checkable mode): the Bloom
    filter prefilters, then only Bloom-passing keys reach a verify
    semi-join against the reference — the corpus-scale exchange carries
    true members + fpp·rest instead of every probe key.  The result is
    bit-exact set membership: Bloom FPs are removed by the verify join
    and FNs are impossible, so the hash family never surfaces.

    ``verify=False`` (FP-tolerant — the pure-Bloom fast path): the
    verify join never happens; ``out`` is the raw Bloom decision with
    false-positive rate ≤ ~fpp.  This is Dolma's actual production
    trade — at 100 TB the reference set is never re-joined at all.

    ``n_items``: reference cardinality for sizing.  When omitted it is
    counted (one aggregate over the distinct reference keys — the same
    relation the build then consumes, see caching below); pass it when
    the caller already knows (e.g. from a persisted corpus manifest) to
    skip that job.

    Caching: the distinct reference-key relation is consumed up to
    three times (sizing count, filter build, verify join) — it is
    persisted through ``caches`` (``caching.CacheBag``; falls back to
    the session bag) so the upstream scan that produced the keys runs
    ONCE, not per consumer.  The caller still owns ``df``'s lifetime:
    pre-persist it when its lineage is expensive, since it is consumed
    twice (distinct probe keys + the final mark join)."""
    from etl_olho_vivo_spark.operators.dedup import _persist

    if out in df.columns:
        # fail at the call site — the final left join would otherwise
        # produce two identically-named columns and die much later in
        # an AMBIGUOUS_REFERENCE deep inside the plan
        raise ValueError(f"output column {out!r} already exists")
    ref = _persist(reference_keys.select(key).distinct(), caches)
    if n_items is None:
        n_items = ref.count()
    num_bits, num_hashes = bloom_parameters(max(1, n_items), fpp)
    bloom = build_bloom_filter(ref, key, num_bits, num_hashes)
    probed = probe_bloom(
        df.select(key).distinct(), bloom, key, num_bits, num_hashes,
        out="bloom_maybe", broadcast=broadcast,
    )
    cand = probed.filter(F.col("bloom_maybe")).drop("bloom_maybe")
    if verify:
        present = cand.join(ref, key, "left_semi")
    else:
        present = cand
    present = present.withColumn(out, F.lit(True))
    return df.join(present, key, "left").fillna({out: False})
