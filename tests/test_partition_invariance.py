"""Partition-count / AQE invariance of value-sensitive aggregations.

The engine's determinism discipline (README: integer-cents money sums,
1e-5°-grid coordinate sums, rounded-before-emit doubles, unique window
tiebreakers) claims results are BIT-IDENTICAL under any partitioning —
the property that makes the DuckDB hash-oracle meaningful and makes a
1000-executor run reproduce the local[8] answer.  These tests prove it
mechanically: each query is executed under the normal session plan and
again with AQE disabled and a hostile shuffle-partition count (5 — prime,
far from the session's 8), and the collected results must match exactly.

A full 50-query × DuckDB sweep under the hostile configs was run green
at round 5; this suite keeps the cheap canary subset (the queries whose
outputs contain double-typed aggregates over many rows — where a
naive float sum would first betray partial-aggregation order).
"""

from __future__ import annotations

import pytest

from etl_olho_vivo_spark import registry

SF = "/root/testdata/sf0.01"

CANARIES = [
    "velocidades_agregadas",   # Σd/Σt over quantized integers
    "pricing_summary",         # money sums + rounded averages
    "revenue_by_nation",       # per-order pre-agg + 4-dp cents sums
    "tfidf_top_terms",         # idf doubles + per-doc ranking
    "session_window_stats",    # session_window agg over doubles
    # round-7 driver rows: placement/survivorship must not depend on
    # partition layout (the whole point of the md5 discipline)
    "dedup_corpus_lines",      # corpus-wide min(struct) survivor choice
    "assign_splits",           # md5 bucket banding
    "lapsed_customers",        # anti join over a date-sliced fact
    "repeated_span_dedup",     # gram-first survivor + span coverage
    "doc_bigram_cross_entropy",  # rounded log-mean over exact counts
    # round-9 driver rows: the Bloom overlap ratio must not see a
    # partition-dependent gram set, and the cluster argmax (min-label
    # fixpoint + max(struct)) must be layout-independent
    "bloom_gram_overlap",
    "dedup_cluster_keep_best",
    # the backoff CASE chain picks a branch per window from exact
    # counts — layout must not change which branch (or the rounded
    # mean) any document sees
    "doc_stupid_backoff",
    # round-10: the KN interpolation picks branches from exact counts
    # via left joins — layout must not change any branch or the
    # rounded mean
    "doc_kneser_ney",
    # two chained TakeOrdered cuts (ADC pool, exact top-k) — the pool
    # boundary must not depend on which partition saw a row first
    "pq_topk",
    # round-10: the composed stack adds the probe-cell filter and the
    # per-cell LUT CASE in front of the same two cuts
    "ivfpq_topk",
    # rounded log-weight sum + rounded Gumbel key ranking — the selected
    # SET must not depend on partial-aggregation order
    "dsir_select",
    # round-10 exact-dup collapse: gid = min(doc_id) per fingerprint and
    # first(text) over IDENTICAL texts must make the representative —
    # and therefore every expanded member pair — layout-independent
    "doc_editdist_near_dup",
]


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.queries()


def _rows(spark, name):
    df = registry.REGISTRY[name].fn(spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.sweep
@pytest.mark.parametrize("name", CANARIES)
def test_result_invariant_under_hostile_partitioning(spark, name):
    base = _rows(spark, name)
    assert base  # non-trivial input
    before = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        hostile = _rows(spark, name)
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)
    assert hostile == base
