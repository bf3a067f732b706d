"""Bloom-filter membership (operators/bloom.py) — sizing math, the
no-false-negative guarantee, the measured FP bound of the pure-Bloom
fast path, exactness of the verify mode, and the plan shapes (broadcast
vs shuffled probe join; relation-sized bitmap)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import bloom, dedup


def _keys(spark, vals):
    return spark.createDataFrame([Row(k=v) for v in vals])


# ---------------------------------------------------------------------------
# sizing
# ---------------------------------------------------------------------------


def test_bloom_parameters_classic_point():
    # n=1000 @ 1%: textbook ≈ 9585 bits / k=7
    m, k = bloom.bloom_parameters(1000, 0.01)
    assert m % 64 == 0 and 9585 <= m <= 9664
    assert k == 7


def test_bloom_parameters_monotone_and_clamped():
    m1, _ = bloom.bloom_parameters(100, 0.01)
    m2, _ = bloom.bloom_parameters(100, 0.001)
    assert m2 > m1  # tighter fpp ⇒ more bits
    m, k = bloom.bloom_parameters(1, 0.5)
    assert m >= 64 and m % 64 == 0 and k >= 1


def test_bloom_parameters_rejects_bad_input():
    with pytest.raises(ValueError):
        bloom.bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom.bloom_parameters(10, 0.0)
    with pytest.raises(ValueError):
        bloom.bloom_parameters(10, 1.0)


def test_build_rejects_bad_geometry(spark):
    df = _keys(spark, ["a"])
    with pytest.raises(ValueError):
        bloom.build_bloom_filter(df, "k", num_bits=63, num_hashes=2)
    with pytest.raises(ValueError):
        bloom.build_bloom_filter(df, "k", num_bits=100, num_hashes=2)
    with pytest.raises(ValueError):
        bloom.build_bloom_filter(df, "k", num_bits=128, num_hashes=0)


# ---------------------------------------------------------------------------
# membership semantics
# ---------------------------------------------------------------------------


def test_no_false_negatives(spark):
    """Every inserted key MUST probe positive — the Bloom invariant."""
    ref = [f"ref-{i}" for i in range(500)]
    m, k = bloom.bloom_parameters(len(ref), 0.01)
    filt = bloom.build_bloom_filter(_keys(spark, ref), "k", m, k)
    probed = bloom.probe_bloom(_keys(spark, ref), filt, "k", m, k)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_false_positive_rate_bounded(spark):
    """Pure-Bloom decisions on a disjoint probe set: FP fraction within
    a loose multiple of the design fpp.  Deterministic — fixed keys,
    fixed hash family — so this cannot flake."""
    ref = [f"ref-{i}" for i in range(2000)]
    other = [f"other-{i}" for i in range(2000)]
    m, k = bloom.bloom_parameters(len(ref), 0.01)
    filt = bloom.build_bloom_filter(_keys(spark, ref), "k", m, k)
    probed = bloom.probe_bloom(_keys(spark, other), filt, "k", m, k)
    fp = probed.filter(F.col("bloom_maybe")).count()
    assert fp / len(other) <= 0.03  # 3× design headroom


def test_mark_members_verify_is_exact(spark):
    """verify=True == brute-force set membership, bit for bit — the
    property that lets bloom_gram_overlap be oracle-checked."""
    ref_vals = [f"k-{i}" for i in range(0, 300, 2)]
    probe_vals = [f"k-{i}" for i in range(300)]  # half members
    df = _keys(spark, probe_vals)
    marked = bloom.mark_members(
        df, _keys(spark, ref_vals), "k", fpp=0.2, verify=True
    )
    got = {r["k"]: r["is_member"] for r in marked.collect()}
    want = {v: v in set(ref_vals) for v in probe_vals}
    assert got == want


def test_mark_members_preserves_rows_and_duplicates(spark):
    df = _keys(spark, ["a", "a", "b", "c", "c", "c"])
    marked = bloom.mark_members(df, _keys(spark, ["a", "c"]), "k", fpp=0.1)
    rows = [(r["k"], r["is_member"]) for r in marked.collect()]
    assert sorted(rows) == [
        ("a", True), ("a", True), ("b", False),
        ("c", True), ("c", True), ("c", True),
    ]


def test_bitmap_relation_bounded(spark):
    """The filter is ≤ num_bits/64 rows no matter the key cardinality."""
    ref = [f"x-{i}" for i in range(5000)]
    m, k = 64 * 100, 3  # deliberately tiny: 100 words max
    filt = bloom.build_bloom_filter(_keys(spark, ref), "k", m, k)
    assert filt.count() <= 100


def test_merge_equals_joint_build(spark):
    """Folding per-batch filters == building one filter over the union —
    the incremental-snapshot invariant (and its idempotence)."""
    m, k = 64 * 32, 4
    batch1 = [f"a-{i}" for i in range(200)]
    batch2 = [f"b-{i}" for i in range(200)]
    f1 = bloom.build_bloom_filter(_keys(spark, batch1), "k", m, k)
    f2 = bloom.build_bloom_filter(_keys(spark, batch2), "k", m, k)
    merged = bloom.merge_bloom_filters(f1, f2)
    joint = bloom.build_bloom_filter(_keys(spark, batch1 + batch2), "k", m, k)
    assert {(r["word"], r["bits"]) for r in merged.collect()} == {
        (r["word"], r["bits"]) for r in joint.collect()
    }
    # replay: merging a batch twice changes nothing
    again = bloom.merge_bloom_filters(merged, f2)
    assert {(r["word"], r["bits"]) for r in again.collect()} == {
        (r["word"], r["bits"]) for r in merged.collect()
    }


def test_write_read_roundtrip(spark, tmp_path):
    ref = [f"r-{i}" for i in range(300)]
    m, k = bloom.bloom_parameters(len(ref), 0.05)
    filt = bloom.build_bloom_filter(_keys(spark, ref), "k", m, k)
    bloom.write_bloom_filter(filt, str(tmp_path / "bf"), m, k)
    loaded, m2, k2 = bloom.read_bloom_filter(spark, str(tmp_path / "bf"))
    assert (m2, k2) == (m, k)
    probed = bloom.probe_bloom(_keys(spark, ref), loaded, "k", m2, k2)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


# ---------------------------------------------------------------------------
# plan shape
# ---------------------------------------------------------------------------


def test_probe_broadcasts_small_filter(spark):
    ref = _keys(spark, [f"r-{i}" for i in range(100)])
    m, k = bloom.bloom_parameters(100, 0.01)
    filt = bloom.build_bloom_filter(ref, "k", m, k)
    probed = bloom.probe_bloom(_keys(spark, ["a"]), filt, "k", m, k)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_probe_shuffled_when_forced(spark):
    ref = _keys(spark, [f"r-{i}" for i in range(100)])
    m, k = bloom.bloom_parameters(100, 0.01)
    filt = bloom.build_bloom_filter(ref, "k", m, k)
    probed = bloom.probe_bloom(
        _keys(spark, ["a"]), filt, "k", m, k, broadcast=False
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the filter side must NOT ride a broadcast exchange when the caller
    # declares it too big (AQE may still pick SMJ or shuffled-hash)
    assert "BroadcastExchange" not in plan


# ---------------------------------------------------------------------------
# keep_best_per_component (cluster-representative selection)
# ---------------------------------------------------------------------------


def test_keep_best_per_component_hand_graph(spark):
    # components: {1,2,3} (chain), {10,11}; quality: 3 wins on n_chars,
    # 10-vs-11 ties on n_chars → smallest id (10) wins
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=10, doc_b=11)]
    )
    quality = spark.createDataFrame(
        [
            Row(doc_id=1, n_chars=5),
            Row(doc_id=2, n_chars=7),
            Row(doc_id=3, n_chars=9),
            Row(doc_id=10, n_chars=4),
            Row(doc_id=11, n_chars=4),
            Row(doc_id=99, n_chars=1),  # not in the graph: not emitted
        ]
    )
    out = dedup.keep_best_per_component(pairs, quality)
    rows = {r["doc_id"]: (r["component"], r["kept"]) for r in out.collect()}
    assert rows == {
        1: (1, False), 2: (1, False), 3: (1, True),
        10: (10, True), 11: (10, False),
    }


def test_keep_best_selection_is_aggregate_not_window(spark):
    """A window over component would serialize a viral cluster into one
    task; the argmax must stay a partial-aggregating max(struct)."""
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2)])
    quality = spark.createDataFrame(
        [Row(doc_id=1, n_chars=5), Row(doc_id=2, n_chars=7)]
    )
    out = dedup.keep_best_per_component(pairs, quality)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.count() == 2


def test_mark_members_rejects_column_collision(spark):
    df = _keys(spark, ["a"]).withColumn("is_member", F.lit(True))
    with pytest.raises(ValueError, match="already exists"):
        bloom.mark_members(df, _keys(spark, ["a"]), "k")
    df2 = _keys(spark, ["a"]).withColumn("snapshot_overlap", F.lit(0.0))
    with pytest.raises(ValueError, match="already exists"):
        bloom.gram_overlap_vs_filter(
            df2.withColumnRenamed("k", "text").withColumn("doc_id", F.lit(1)),
            _keys(spark, ["x"]), 64, 1,
        )
