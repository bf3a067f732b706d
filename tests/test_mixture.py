"""Mixture sampling (operators/mix.py): exact rate math, Python
brute-force membership parity, determinism, budget semantics, and the
zero-corpus-shuffle plan contract.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import mix

# 70/20/10 token supply; equal-thirds target → scarcest (books) binds
WEIGHTS = {"web": 1 / 3, "code": 1 / 3, "books": 1 / 3}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2100, "web")
        .when(F.col("id") < 2700, "code")
        .otherwise("books")
        .alias("source"),
        F.lit(100).alias("n_tokens"),
    )


def _py_key(doc_id, seed):
    # mix's domain-separated seed: "mix-<seed>" (see operators/mix.py)
    h = hashlib.md5(f"{doc_id}:mix-{seed}".encode()).hexdigest()
    return int(h[:8], 16)


def test_rates_exact(spark, corpus):
    rates = {
        r["source"]: r
        for r in mix.mixture_rates(corpus, WEIGHTS).collect()
    }
    # T = web 210k / code 60k / books 30k; S* = 3·30k = 90k
    assert rates["books"]["available"] == 30_000.0
    assert rates["books"]["rate"] == pytest.approx(1.0)
    assert rates["code"]["rate"] == pytest.approx(30_000 / 60_000)
    assert rates["web"]["rate"] == pytest.approx(30_000 / 210_000)
    for r in rates.values():
        assert r["target"] == pytest.approx(30_000.0)


def test_membership_matches_python_brute_force(spark, corpus):
    """The kept document set is EXACTLY the md5-threshold rule — no
    engine sampling nondeterminism anywhere."""
    rates = {
        r["source"]: r["rate"]
        for r in mix.mixture_rates(corpus, WEIGHTS).collect()
    }
    got = sorted(
        r["doc_id"]
        for r in mix.sample_mixture(corpus, WEIGHTS, seed=9).collect()
    )
    src = lambda i: "web" if i < 2100 else ("code" if i < 2700 else "books")
    want = sorted(
        i
        for i in range(3000)
        if _py_key(i, 9) < rates[src(i)] * 2**32
    )
    assert got == want
    # rate-1.0 group survives whole (key space is [0, 2^32))
    assert all(i in got for i in range(2700, 3000))


def test_proportions_and_determinism(spark, corpus):
    mixed = mix.sample_mixture(corpus, WEIGHTS, seed=0)
    by_src = {
        r["source"]: r["toks"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    for g in WEIGHTS:
        assert by_src[g] == pytest.approx(30_000, rel=0.12), by_src
    # partitioning-independent, seed-sensitive
    a = sorted(r["doc_id"] for r in mixed.collect())
    b = sorted(
        r["doc_id"]
        for r in mix.sample_mixture(
            corpus.repartition(13), WEIGHTS, seed=0
        ).collect()
    )
    assert a == b
    c = sorted(
        r["doc_id"]
        for r in mix.sample_mixture(corpus, WEIGHTS, seed=1).collect()
    )
    assert a != c
    # schema passes through unchanged
    assert mixed.columns == corpus.columns


@pytest.mark.sweep
def test_budget_caps_the_mix(spark, corpus):
    mixed = mix.sample_mixture(corpus, WEIGHTS, budget=30_000, seed=0)
    total = mixed.agg(F.sum("n_tokens")).first()[0]
    assert total == pytest.approx(30_000, rel=0.15)
    by_src = {
        r["source"]: r["toks"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    for g in WEIGHTS:
        assert by_src[g] == pytest.approx(10_000, rel=0.25), by_src
    # a budget above S* changes nothing — supply binds
    big = mix.sample_mixture(corpus, WEIGHTS, budget=10**9, seed=0)
    assert big.count() == mix.sample_mixture(corpus, WEIGHTS, seed=0).count()


def test_mixture_independent_of_domain_cap(spark, corpus):
    """Regression: cap_per_group keeps the N LOWEST seeded keys per
    group and the mixture keeps keys under a threshold — on a shared
    raw seed every cap survivor would pass the Bernoulli filter (~100%
    instead of rate), inflating capped domains ~1/rate×.  The mix's
    domain-separated seed must keep the two selections independent."""
    from etl_olho_vivo_spark.operators import split as splitops

    capped = splitops.cap_per_group(corpus, "source", 700, seed=0)
    # web 2100→700 docs (70k tokens); code 600, books 300 pass whole.
    # S* = 3·min(70k, 60k, 30k) = 90k → 30k target per source.
    mixed = mix.sample_mixture(capped, WEIGHTS, seed=0)
    by_src = {
        r["source"]: r["toks"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    # correlated selection would deliver ~70k for web; independent
    # sampling delivers ~30k
    assert by_src["web"] == pytest.approx(30_000, rel=0.15), by_src


def test_unlisted_domains_dropped_and_errors(spark, corpus):
    # only web+code requested → no books row survives
    two = {"web": 0.5, "code": 0.5}
    mixed = mix.sample_mixture(corpus, two, seed=0)
    assert mixed.filter(F.col("source") == "books").count() == 0
    with pytest.raises(ValueError, match="no tokens in the corpus"):
        mix.mixture_rates(corpus, {"web": 0.5, "nope": 0.5})
    with pytest.raises(ValueError, match="sum to 1"):
        mix.mixture_rates(corpus, {"web": 0.5, "code": 0.2})
    with pytest.raises(ValueError, match="positive"):
        mix.mixture_rates(corpus, {"web": 1.5, "code": -0.5})
    with pytest.raises(ValueError, match="budget"):
        mix.mixture_rates(corpus, WEIGHTS, budget=0)


def test_plan_never_shuffles_the_corpus(spark, corpus):
    """100 TB posture: one tiny rates join (broadcast), the corpus side
    is map-side only — its lineage must contain no Exchange between the
    scan and the filter."""
    mixed = mix.sample_mixture(corpus, WEIGHTS, seed=0)
    mixed.collect()  # finalize AQE
    plan = (
        mixed._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
