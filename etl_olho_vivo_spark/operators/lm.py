"""Statistical LM scoring for corpus quality filtering — the CCNet
perplexity gate, Spark-native.

CCNet (Wenzek et al. 2019) ranks crawl documents by the perplexity of a
KenLM 5-gram model trained on a trusted corpus and keeps the head/middle
buckets; the same shape filters gibberish, boilerplate soup, and
non-linguistic text that per-row heuristics (quality_score) miss.  This
module implements the distributed statistics core with an add-k-smoothed
BIGRAM model — the order is a dial, not a design change (a production
deployment would raise it or plug a trained KenLM binary into a
mapInPandas scorer, the same posture as the multimodal codec).

Two phases, both bounded:

1. ``bigram_counts`` — ONE scan over the REFERENCE corpus: unigram and
   bigram counts (map-side partial aggregation; a hot bigram — "of the"
   corpus-wide — flattens into one row per key, never a window).
   ``top_k`` truncation bounds both relations the way word_histogram
   bounds BPE training: at 100 TB raw bigram cardinality is unbounded,
   and tail bigrams contribute k-smoothed estimates anyway.
2. ``cross_entropy_scores`` — score TARGET docs against those counts:
   explode each doc's bigrams (slim md5-hash rows), join the two count
   relations (broadcast when they fit, shuffle otherwise — both joins
   are aggregate-first so skew is already flattened), and aggregate the
   mean negative log-likelihood per document:

       H(doc) = -(1/n) Σ log  (B(w1,w2) + k) / (U(w1) + k·V)

   in nats; ``exp(H)`` is the familiar perplexity.  Determinism: counts
   are exact BIGINTs; log/÷/mean are the only doubles, so the emitted
   score is ROUNDED (6 dp) per the engine-wide rule for
   transcendental/order-sensitive output (registry.py preamble).

Token identity is the md5-derived 32-bit word hash shared with every
other text operator (functions/hashing.py) — the DuckDB oracle
reproduces the whole computation bit-for-bit up to the documented
rounding.

Relation to the reference (JonasMarma/etl-olho-vivo): none — part of
the beyond-reference text-analysis surface (SURVEY §2.11).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators.dedup import with_token_hashes

if TYPE_CHECKING:
    from etl_olho_vivo_spark.caching import CacheBag


def _doc_bigrams(docs: DataFrame, id_col: str, text: str) -> DataFrame:
    """(id, w1h, w2h) — one slim row per in-doc bigram.

    ``posexplode_outer`` for the InferFiltersFromGenerate reason
    documented in decontam.py: a plain explode of the pair array would
    re-inline the token-hash transform O(tokens²) per row.
    """
    pairs = (
        "CASE WHEN size(wh) >= 2 THEN "
        "transform(sequence(0, size(wh) - 2), "
        "i -> struct(wh[i] AS w1h, wh[i + 1] AS w2h)) "
        "ELSE CAST(array() AS ARRAY<STRUCT<w1h: BIGINT, w2h: BIGINT>>) END"
    )
    return (
        with_token_hashes(docs.select(id_col, text), text)
        .withColumn("__bg__", F.expr(pairs))
        .select(id_col, F.posexplode_outer("__bg__").alias("__i__", "bg"))
        .filter(F.col("bg").isNotNull())
        .select(id_col, "bg.w1h", "bg.w2h")
    )


def bigram_counts(
    ref_docs: DataFrame,
    *,
    text: str = "text",
    top_k: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """(unigram, bigram) count relations from the reference corpus.

    unigram: (w1h, u_n);  bigram: (w1h, w2h, b_n) — exact integer
    counts, each truncated to its ``top_k`` most frequent entries
    (deterministic hash tiebreak) so the model relations are bounded
    regardless of corpus size.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # counts never group by document — a constant id keeps the helper shared
    bg = _doc_bigrams(
        ref_docs.select(text).withColumn("__rid__", F.lit(0)),
        "__rid__",
        text,
    )
    uni = (
        with_token_hashes(ref_docs.select(text), text)
        .select(F.explode_outer("wh").alias("w1h"))
        .filter(F.col("w1h").isNotNull())
        .groupBy("w1h")
        .agg(F.count(F.lit(1)).alias("u_n"))
        .orderBy(F.desc("u_n"), "w1h")
        .limit(top_k)
    )
    big = (
        bg.groupBy("w1h", "w2h")
        .agg(F.count(F.lit(1)).alias("b_n"))
        .orderBy(F.desc("b_n"), "w1h", "w2h")
        .limit(top_k)
    )
    return uni, big


def cross_entropy_scores(
    docs: DataFrame,
    unigram: DataFrame,
    bigram: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    k_smooth: float = 0.5,
    round_dp: int = 6,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood (nats) under the add-k
    bigram model — ``(id, n_bigrams, cross_entropy)``.  Lower is more
    reference-like; bucket the distribution (CCNet keeps head/middle)
    or threshold directly.  Documents with fewer than 2 tokens have no
    bigrams and are omitted (no evidence either way — filter upstream
    by length, as the corpus pipeline already does).

    Out-of-vocabulary smoothing: an unseen bigram contributes
    ``log(k / (U(w1) + k·V))`` and an unseen w1 ``log(k / (k·V))`` —
    the standard add-k backstop, so scores are finite everywhere.

    ``caches``: V (the vocabulary size) needs one action on the
    unigram relation before the scoring joins consume it again — pass
    a CacheBag so the count materializes the (top_k-bounded) relation
    once instead of re-running the reference-corpus scan per consumer
    (the registry query and the pipeline gate both do).  Without it
    the computation is still correct, just re-derived.
    """
    if k_smooth <= 0:
        raise ValueError(f"k_smooth must be > 0, got {k_smooth}")
    if caches is not None:
        unigram = caches.add(unigram)
        bigram = caches.add(bigram)
    v = unigram.count()  # vocabulary size — one scalar, bounded by top_k
    bg = _doc_bigrams(docs, id_col, text)
    joined = (
        bg.join(bigram, ["w1h", "w2h"], "left")
        .join(unigram, "w1h", "left")
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("b_n"), F.lit(0)) + F.lit(k_smooth))
                    / (
                        F.coalesce(F.col("u_n"), F.lit(0))
                        + F.lit(k_smooth) * F.lit(v)
                    )
                )
            ).alias("ll"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("ll"), round_dp).alias("cross_entropy"),
    )
