"""Bigram LM scoring (operators/lm.py): hand-computed cross-entropy,
OOV smoothing, reference-vs-target separation, and top_k truncation
determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import lm


def _score_map(df):
    return {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in df.collect()
    }


def test_hand_computed_self_entropy(spark):
    # corpus: one doc "a b a b" → unigrams a:2 b:2 (V=2);
    # bigrams (a,b):2 (b,a):1
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    uni, big = lm.bigram_counts(docs)
    out = _score_map(lm.cross_entropy_scores(docs, uni, big))
    k, v = 0.5, 2
    ll = [
        math.log((2 + k) / (2 + k * v)),  # a→b
        math.log((1 + k) / (2 + k * v)),  # b→a
        math.log((2 + k) / (2 + k * v)),  # a→b
    ]
    want = round(-sum(ll) / 3, 6)
    assert out == {1: (3, want)}


def test_oov_words_are_smoothed_not_infinite(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zzz qqq www")],
        "doc_id long, text string",
    )
    uni, big = lm.bigram_counts(ref)
    out = _score_map(lm.cross_entropy_scores(target, uni, big))
    seen_h = out[10][1]
    oov_h = out[11][1]
    assert math.isfinite(seen_h) and math.isfinite(oov_h)
    # an all-OOV doc must score strictly worse than a reference-like doc
    assert oov_h > seen_h
    # fully-unseen bigram with unseen w1: -log(k / (k*V)) = log(V)
    v = uni.count()
    assert out[11] == (2, round(math.log(v), 6))


def test_short_docs_have_no_evidence(spark):
    docs = spark.createDataFrame(
        [(1, "word"), (2, "two words")], "doc_id long, text string"
    )
    uni, big = lm.bigram_counts(docs)
    out = _score_map(lm.cross_entropy_scores(docs, uni, big))
    assert 1 not in out and 2 in out
    with pytest.raises(ValueError, match="k_smooth"):
        lm.cross_entropy_scores(docs, uni, big, k_smooth=0)
    with pytest.raises(ValueError, match="top_k"):
        lm.bigram_counts(docs, top_k=0)


def test_top_k_truncation_is_deterministic_and_frequency_ranked(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y y z")], "doc_id long, text string"
    )
    uni, _ = lm.bigram_counts(docs, top_k=2)
    kept = {r["w1h"]: r["u_n"] for r in uni.collect()}
    assert sorted(kept.values(), reverse=True) == [3, 2]  # x and y survive
    # same truncation again — deterministic hash tiebreak
    uni2, _ = lm.bigram_counts(docs, top_k=2)
    assert {r["w1h"]: r["u_n"] for r in uni2.collect()} == kept


def test_plan_is_aggregate_and_join_shaped(spark):
    """The scoring plan must stay in the skew-safe family: count
    aggregates + joins, no Python, no cartesian product, no window."""
    from etl_olho_vivo_spark.sources.tables import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    uni, big = lm.bigram_counts(d)
    out = lm.cross_entropy_scores(d, uni, big)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    for bad in ("PythonUDF", "BatchEvalPython", "CartesianProduct", "Window"):
        assert bad not in final, final[:2000]
    assert "HashAggregate" in final or "SortAggregate" in final
