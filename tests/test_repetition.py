"""Gopher-style repetition metrics (operators/textops.py): hand-computed
oracles on crafted docs, a pandas brute-force cross-check, the gate's
threshold semantics, and the no-Python / single-projection plan contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import textops


def _feat(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return textops.repetition_features(df).collect()[0]


def test_duplicate_line_metrics(spark):
    r = _feat(spark, "aa bb\ncc dd\naa bb\n\nee")
    # 4 non-empty lines, 3 distinct → 1/4 duplicated
    assert r["dup_line_frac"] == pytest.approx(0.25)
    # chars: 5+5+5+2 = 17 total, 5 in the repeat → 5/17
    assert r["dup_line_char_frac"] == pytest.approx(5 / 17)


def test_top_ngram_char_mass(spark):
    # "x y" occurs 3 times (len 3) → mass 9; dominant over any other
    r = _feat(spark, "x y z x y w x y")
    assert r["top2gram_char_frac"] == pytest.approx(9 / 15)


def test_dup_ngram_mass_counts_all_occurrences(spark):
    # 5-gram "a b c d e" appears twice (len 9 → mass 18 of 19 chars)
    r = _feat(spark, "a b c d e a b c d e")
    assert r["dup5gram_char_frac"] == pytest.approx(18 / 19)
    # no repeated 10-gram in 10 tokens
    assert r["dup10gram_char_frac"] == 0.0


def test_symbol_word_ratio_and_empty_doc(spark):
    # Gopher A1: ONLY '#' and ellipsis are symbols — 3 hashes / 3 words
    r = _feat(spark, "ok!! then### done")
    assert r["symbol_word_ratio"] == pytest.approx(3 / 3)
    # ellipsis: '…' and a 3+-dot run each count once; ratio is the
    # WORSE of the two per-glyph ratios (2 ellipses vs 1 hash, 4 words)
    e2 = _feat(spark, "wait… what.... is# this")
    assert e2["symbol_word_ratio"] == pytest.approx(2 / 4)
    # ordinary punctuated/accented prose has ratio 0 — the gate must
    # not reject normal text (commas/periods/accents are NOT symbols)
    p = _feat(spark, "Hello, world. It's a fine day in Köln, naïve café.")
    assert p["symbol_word_ratio"] == 0.0
    # empty doc: every ratio NULL (try_divide), gate must fail it
    e = _feat(spark, "")
    assert e["dup_line_frac"] is None
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    assert textops.gopher_gate(df).collect()[0]["gopher_pass"] is False


def test_brute_force_cross_check(spark):
    """Metrics match an independent pure-Python recomputation on
    irregular docs (repeats, near-repeats, single tokens)."""
    docs = [
        (1, "spam spam spam spam spam"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a b a b a b a b c d"),
        (4, "one\ntwo\none\nthree\ntwo\none"),
        (5, "solo"),
    ]
    rows = {
        r["doc_id"]: r
        for r in textops.repetition_features(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    from collections import Counter

    for doc_id, text in docs:
        toks = text.split(" ")
        n_chars = len(text)
        for n in (2, 3, 4):
            grams = [
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            ]
            c = Counter(grams)
            best = max((k * len(g) for g, k in c.items()), default=0)
            assert rows[doc_id][f"top{n}gram_char_frac"] == pytest.approx(
                best / n_chars
            ), (doc_id, n)
        for n in (5, 10):
            grams = [
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            ]
            c = Counter(grams)
            mass = sum(k * len(g) for g, k in c.items() if k >= 2)
            assert rows[doc_id][f"dup{n}gram_char_frac"] == pytest.approx(
                mass / n_chars
            ), (doc_id, n)
        lines = [ln for ln in text.split("\n") if ln]
        lc = Counter(lines)
        dup_lines = sum(k - 1 for k in lc.values())
        dup_chars = sum((k - 1) * len(ln) for ln, k in lc.items())
        assert rows[doc_id]["dup_line_frac"] == pytest.approx(
            dup_lines / len(lines)
        )
        assert rows[doc_id]["dup_line_char_frac"] == pytest.approx(
            dup_chars / sum(len(ln) for ln in lines)
        )


def test_gate_thresholds_and_overrides(spark):
    # Gopher's thresholds target ≥50-word documents (on a 10-word doc a
    # singleton 2-gram is already >20% of the chars); keep the clean doc
    # realistically sized
    clean = " ".join(f"word{i} item{i} thing{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # pure repetition
            (2, clean),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["gopher_pass"] for r in textops.gopher_gate(df).collect()}
    assert out == {1: False, 2: True}
    # loosening every bound admits the spam doc
    loose = {k: 10.0 for k in textops.GOPHER_THRESHOLDS}
    out2 = {
        r["doc_id"]: r["gopher_pass"]
        for r in textops.gopher_gate(df, thresholds=loose).collect()
    }
    assert out2 == {1: True, 2: True}
    with pytest.raises(ValueError, match="unknown gopher"):
        textops.gopher_gate(df, thresholds={"nope": 1.0})


def test_plan_is_pure_projection(spark):
    """One scan, no shuffle, no Python anywhere in the plan — the
    100 TB contract for per-row quality metrics."""
    df = spark.createDataFrame(
        [(1, "a b c a b c")], ["doc_id", "text"]
    )
    plan = (
        textops.gopher_gate(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "PythonUDF", "ArrowEval", "BatchEvalPython"):
        assert bad not in plan, plan[:2000]
