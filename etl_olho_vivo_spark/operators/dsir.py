"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The standard pre-training recipe for "pick raw-corpus documents that
look like a trusted target corpus" without training a classifier:

1. **Features**: every document is reduced to a bag of hashed n-grams —
   unigrams and bigrams hashed into ``n_buckets`` buckets (the paper
   uses 10,000).  Collisions are the point: the bucket histogram is a
   fixed-dimension sketch of the text distribution.
2. **Two bucket distributions**: ``p_target`` fit on the target corpus,
   ``p_raw`` fit on the raw pool, both add-1 smoothed over the bucket
   vocabulary.
3. **Importance weight** per document: ``log w_i = Σ_feat
   (log p_target[b] − log p_raw[b])`` summed over the document's
   feature OCCURRENCES (not distinct buckets).
4. **Resampling**: k documents drawn with probability ∝ ``w_i`` without
   replacement via the Gumbel top-k trick — add an i.i.d. Gumbel
   perturbation to each ``log w_i`` and keep the k largest keys.

Cross-engine determinism (the DuckDB-oracle discipline):

- all hashing is md5-derived (``functions/hashing.py``) — bucket ids
  are exact BIGINTs, identical in Spark and DuckDB;
- bucket counts and totals are exact integers;
- ``log`` and the per-doc sum are the only doubles, rounded ``round_dp``
  (6) per the engine-wide transcendental rule before they are emitted
  OR compared — the Gumbel key ranks by its ROUNDED value with the doc
  id as tiebreaker, so the selected set is bit-stable across engines,
  partitionings, and libm implementations;
- the Gumbel uniform comes from the shared seeded md5 key
  (``seeded_key_expr``) under the ``"dsir-"`` domain-separation salt
  (its magnitude feeds a ranking, so per hashing.py's rule it must not
  reuse another magnitude-sensitive operator's stream).

Scale shape (what survives 100 TB):

- one token-hash scan per corpus; features explode map-side
  (``posexplode_outer`` for the InferFiltersFromGenerate reason
  documented in decontam.py);
- both bucket distributions are ≤ ``n_buckets`` rows — broadcast to the
  scoring join, so the raw corpus crosses exactly ONE exchange (the
  per-doc sum, keyed on the unique doc id — skew-free by construction);
- the two normalization totals ride along as 1-row broadcast frames
  (no eager driver action at construction — the lesson from lm.py's
  ``unigram.count()``);
- selection is ``TakeOrderedAndProject`` (top-k), never a global sort.

Documents with ZERO features (empty/whitespace text) are absent from
the output: they have no evidence under either distribution, and the
paper's estimator is undefined for them — callers wanting them must
union them back with an explicit default weight.

Relation to the reference (JonasMarma/etl-olho-vivo): none — part of
the beyond-reference training-data tier (SURVEY §2.11), alongside the
LM perplexity gate (operators/lm.py) and token-budget mixture
(operators/mix.py): the LM gate scores fluency, DSIR scores
distributional similarity to a target, mix enforces budgets downstream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_olho_vivo_spark.functions.hashing import (
    ngram_hash_expr,
    seeded_key_expr,
)
from etl_olho_vivo_spark.operators.dedup import with_token_hashes

if TYPE_CHECKING:
    from etl_olho_vivo_spark.caching import CacheBag

# The paper's operating point (Xie et al. 2023 §3: 10k hash buckets).
N_BUCKETS = 10_000


def feature_expr(n_buckets: int, h1: str = "wh[i]", h2: str = "wh[i + 1]") -> str:
    """The bigram→bucket hash (engine-neutral ``* + %`` arithmetic over
    two md5 token hashes) — exposed so the DuckDB oracle derives its
    expression from the SAME definition and cannot drift."""
    return f"(({ngram_hash_expr([h1, h2])}) % {n_buckets})"


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket) — one slim row per feature OCCURRENCE: every unigram
    (``h % n_buckets``) and every adjacent bigram (rolling hash %
    n_buckets).  Pure map-side explode; rows ∝ 2·tokens per document."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    uni = f"transform(wh, h -> h % {n_buckets})"
    big = (
        f"CASE WHEN size(wh) >= 2 THEN "
        f"transform(sequence(0, size(wh) - 2), i -> {feature_expr(n_buckets)}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return (
        with_token_hashes(docs.select(id_col, text), text)
        .withColumn("__f__", F.expr(f"{uni} || {big}"))
        .select(id_col, F.posexplode_outer("__f__").alias("__i__", "bucket"))
        .filter(F.col("bucket").isNotNull())
        .select(id_col, "bucket")
    )


def dsir_histograms(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    text: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """The FIT of the DSIR model as one persistable relation:
    ``(bucket, t_n, r_n, n_buckets)`` — target and raw bucket counts
    full-outer-merged (absent side = 0), every row stamped with the
    bucket count so a consumer can refuse a grid mismatch loudly.

    This is the fit-once hand-off (round-11 structural fix): persist
    this relation beside the ``dsir-cuts`` cut points and feed it to
    ``dsir_log_weights(hist=...)`` in the corpus gate, so the
    calibrated floor is applied to EXACTLY the weight definition it
    was derived on — the paper's design — instead of weights refit on
    whatever pool reaches the gate."""
    t_rel = (
        hashed_features(
            target_docs.select(text).withColumn("__tid__", F.lit(0)),
            id_col="__tid__",
            text=text,
            n_buckets=n_buckets,
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_n"))
    )
    r_rel = (
        hashed_features(
            raw_docs.select(text).withColumn("__rid__", F.lit(0)),
            id_col="__rid__",
            text=text,
            n_buckets=n_buckets,
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("r_n"))
    )
    return (
        t_rel.join(r_rel, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_n", F.lit(0)).cast("bigint").alias("t_n"),
            F.coalesce("r_n", F.lit(0)).cast("bigint").alias("r_n"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        )
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame | None,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = N_BUCKETS,
    round_dp: int = 6,
    hist: DataFrame | None = None,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Per-document log importance weight under the hashed-n-gram
    bag-of-buckets model: ``(id, n_feats, log_w)`` with

        log_w = Σ_feat [ ln(t_b + 1) − ln(T + B)
                        − ln(r_b + 1) + ln(R + B) ]

    (t/r = target/raw bucket counts, T/R their totals, B = n_buckets —
    add-1 smoothing on both sides).  Exact-integer counts; the log sum
    is rounded ``round_dp`` before emit.

    The raw corpus' feature frame feeds BOTH the ``p_raw`` histogram and
    the scoring join, so it is persisted (``caches`` or the module-level
    SESSION_BAG) — one corpus scan, not two.

    **Fit-once (round 11)**: pass ``hist`` (a ``dsir_histograms``
    relation, typically read back from the parquet the ``dsir-cuts``
    run persisted) to score against FROZEN distributions instead of
    refitting ``p_target``/``p_raw`` on the inputs — the weight of a
    given document is then identical between the calibration run and
    the gate, whatever subset reaches the gate.  With ``hist`` set,
    ``target_docs`` is unused (pass None) and a stamped-bucket-count
    mismatch raises.
    """
    from etl_olho_vivo_spark.caching import SESSION_BAG

    bag = caches if caches is not None else SESSION_BAG
    feats = bag.add(
        hashed_features(
            raw_docs, id_col=id_col, text=text, n_buckets=n_buckets
        )
    )
    if hist is not None:
        stamped = hist.select("n_buckets").first()
        if stamped is None:
            raise ValueError(
                "DSIR histogram relation is empty — refusing to score "
                "against a vacuous model"
            )
        if int(stamped["n_buckets"]) != n_buckets:
            raise ValueError(
                f"DSIR histogram was fit with n_buckets="
                f"{int(stamped['n_buckets'])}, scoring requested "
                f"{n_buckets} — the bucket grids are incommensurate; "
                f"re-run dsir-cuts or match the flag"
            )
        t_rel = hist.select("bucket", "t_n").filter(F.col("t_n") > 0)
        r_rel = hist.select("bucket", "r_n").filter(F.col("r_n") > 0)
    else:
        if target_docs is None:
            raise ValueError(
                "dsir_log_weights needs target_docs (to fit) or hist "
                "(fit-once) — got neither"
            )
        t_rel = (
            hashed_features(
                target_docs.select(text).withColumn("__tid__", F.lit(0)),
                id_col="__tid__",
                text=text,
                n_buckets=n_buckets,
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("t_n"))
        )
        r_rel = feats.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("r_n")
        )
    # 1-row total frames, broadcast-cross-joined: the normalization
    # constants stay INSIDE the lazy plan (no eager .count() at
    # construction) and the oracle SQL mirrors the same CROSS JOIN.
    # A feature-less target (empty corpus or all-empty texts) makes the
    # sum NULL, which would NULL-out every log_w and let a downstream
    # `key < floor` gate silently keep the whole corpus — fail loudly
    # instead, still lazily (the CASE evaluates when the 1-row frame
    # does, no extra job).
    t_tot = t_rel.agg(F.sum("t_n").alias("t_tot")).select(
        F.when(F.col("t_tot").isNotNull(), F.col("t_tot"))
        .otherwise(
            F.raise_error(
                "DSIR target corpus has no features (empty corpus or "
                "all-empty texts) — every importance weight would be "
                "NULL and a threshold gate would silently keep "
                "everything; fix the target input"
            ).cast("bigint")
        )
        .alias("t_tot")
    )
    r_tot = r_rel.agg(F.sum("r_n").alias("r_tot"))
    # Same textual operation order as the oracle SQL — left-associated
    # ((a − b) − c) + d — so both engines round the same double.
    ll = (
        F.log(F.coalesce(F.col("t_n"), F.lit(0)) + F.lit(1.0))
        - F.log(F.col("t_tot") + F.lit(n_buckets))
        - F.log(F.coalesce(F.col("r_n"), F.lit(0)) + F.lit(1.0))
        + F.log(F.col("r_tot") + F.lit(n_buckets))
    )
    return (
        feats.join(F.broadcast(t_rel), "bucket", "left")
        .join(F.broadcast(r_rel), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(id_col, ll.alias("ll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("ll"), round_dp).alias("log_w"),
        )
    )


def gumbel_expr(id_col: str, seed: int | str) -> str:
    """Spark SQL for the seeded Gumbel(0,1) perturbation: ``u`` from the
    shared md5 row key under the ``dsir-`` salt, mapped by the standard
    inverse CDF ``−ln(−ln(u))``.  ``u = (key + 1) / (2^32 + 1)`` lies in
    the OPEN interval (0, 1) for every key in [0, 2^32) — neither log
    can hit its pole."""
    u = f"(({seeded_key_expr(id_col, f'dsir-{seed}')}) + 1.0) / 4294967297.0"
    return f"-ln(-ln({u}))"


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = N_BUCKETS,
    seed: int | str = 0,
    round_dp: int = 6,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Gumbel top-k importance resampling: ``(id, n_feats, log_w,
    sel_key)`` — the k documents with the largest ``log_w + Gumbel``
    keys, i.e. a sample ∝ ``w_i`` WITHOUT replacement (Vieira 2014's
    Gumbel-max coupling, the paper's sampler made deterministic by the
    seeded hash).

    Ranking uses the ROUNDED key with ``id_col`` as tiebreaker, so the
    selected set is identical across engines and partitionings; top-k
    compiles to ``TakeOrderedAndProject``, never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_log_weights(
        raw_docs,
        target_docs,
        id_col=id_col,
        text=text,
        n_buckets=n_buckets,
        round_dp=round_dp,
        caches=caches,
    )
    key = F.round(
        F.col("log_w") + F.expr(gumbel_expr(id_col, seed)), round_dp
    )
    return (
        w.withColumn("sel_key", key)
        .orderBy(F.col("sel_key").desc(), id_col)
        .limit(k)
    )
