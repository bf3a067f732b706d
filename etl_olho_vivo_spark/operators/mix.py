"""Deterministic corpus mixture sampling — domain reweighting to a
token budget.

A cleaned corpus almost never has the domain proportions a training run
wants: web crawl dominates, code/books/reference are scarce.  The
published practice (The Pile, Gopher's §A2 mixture table, DoReMi's
static final weights) is to SAMPLE each domain at its own rate so the
delivered mix hits target proportions — here by tokens, since training
budgets are token budgets, not document counts.

Semantics
---------
Given target weights ``w_g`` (sum 1) over a ``group`` column and the
corpus's available tokens ``T_g`` per group, the largest achievable
mixture size is ``S* = min_g T_g / w_g`` (the scarcest domain binds —
without repetition you cannot up-sample past what exists).  With an
optional ``budget`` the mixture size is ``S = min(budget, S*)``, and
every group is down-sampled at ``rate_g = w_g · S / T_g ∈ (0, 1]``.

Sampling is a seeded deterministic Bernoulli per document: keep iff
``seeded_key(doc_id) < rate_g · 2^32`` (functions/hashing.py — the same
md5 key the split/shuffle/cap operators use), so the delivered mix is

- exactly reproducible (same corpus + seed ⇒ same documents, on any
  cluster, any partitioning, any retry — no ``sample()`` re-roll);
- unbiased w.r.t. ingest order and document length within a group;
- binomially concentrated around the target: achieved group tokens are
  ``w_g·S`` in expectation with relative s.d. ~ ``1/sqrt(n_g·rate_g)``
  — negligible at corpus scale (this is exactly how published mixes
  are drawn; exact-to-the-token knapsack selection is not).

Scale shape (100 TB): one ``groupBy(group).sum(tokens)`` over the
corpus (tiny result — one row per domain), a one-row global reduction
for ``S``, then a broadcast join of the domain-sized rate table and a
map-side hash filter.  The corpus shuffles ZERO times.

Relation to the reference (JonasMarma/etl-olho-vivo): none — this is
part of the beyond-reference training-data surface (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_olho_vivo_spark.functions.hashing import seeded_key_expr

_KEY_SPACE = float(2**32)


def _check_weights(weights: dict[str, float]) -> None:
    if not weights:
        raise ValueError("weights must name at least one group")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")


def mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    *,
    group: str = "source",
    token_col: str = "n_tokens",
    budget: int | None = None,
) -> DataFrame:
    """Per-group sampling rates: ``(group, available, target, rate)``.

    ``available`` is the group's token supply, ``target = w_g·S`` the
    tokens the mixture wants from it, ``rate`` the per-document keep
    probability.  A weight group absent from the corpus (or present
    with zero tokens) is an error — its target is unmeetable and every
    other group would silently shrink to S = 0 with it.

    Groups in the corpus but NOT in ``weights`` get no row — they are
    excluded from the mixture entirely (the C4-style "drop unlisted
    domains" posture; give them an explicit small weight to keep them).
    """
    _check_weights(weights)
    if budget is not None and budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    spark = df.sparkSession
    avail = df.groupBy(group).agg(
        F.sum(token_col).cast("double").alias("available")
    )
    w = spark.createDataFrame(
        [(g, float(wt)) for g, wt in weights.items()],
        f"{group} string, weight double",
    )
    # domain-sized join: weights ⋈ availability (broadcast both ways is
    # irrelevant — rows == number of domains)
    j = w.join(avail, group, "left")
    missing = [
        r[group]
        for r in j.filter(
            F.col("available").isNull() | (F.col("available") <= 0)
        ).collect()  # bounded: one row per REQUESTED domain
    ]
    if missing:
        raise ValueError(
            f"weight group(s) with no tokens in the corpus: "
            f"{sorted(missing)}; remove them from the mixture or fix "
            f"the corpus"
        )
    # S* = min_g T_g / w_g; the scarcest domain binds
    s_star = j.select(
        F.min(F.col("available") / F.col("weight")).alias("s")
    ).first()["s"]
    s = min(float(budget), s_star) if budget is not None else s_star
    return j.select(
        group,
        "available",
        (F.col("weight") * F.lit(s)).alias("target"),
        F.least(
            F.lit(1.0), F.col("weight") * F.lit(s) / F.col("available")
        ).alias("rate"),
    )


def sample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    *,
    group: str = "source",
    token_col: str = "n_tokens",
    budget: int | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """The mixed corpus: rows of ``df`` surviving their group's rate.

    Columns pass through unchanged.  Deterministic in (corpus, weights,
    budget, seed); a new ``seed`` draws an independent mix from the
    same corpus (epoch-level resampling without rewriting anything).
    """
    rates = mixture_rates(
        df, weights, group=group, token_col=token_col, budget=budget
    ).select(group, "rate")
    # domain-separated seed ("mix-<seed>"): the Bernoulli keep rule is
    # MAGNITUDE-based (key < rate·2^32), and cap_per_group's rank
    # selection keeps the N LOWEST keys — on the raw shared seed the
    # two are fully correlated (every cap survivor has a tiny key, so
    # a capped domain would pass the mixture filter at ~100% instead
    # of rate), silently breaking the target proportions
    key = F.expr(seeded_key_expr(id_col, f"mix-{seed}"))
    return (
        df.join(F.broadcast(rates), group)
        .filter(key < F.col("rate") * F.lit(_KEY_SPACE))
        .drop("rate")
        .select(*df.columns)
    )
