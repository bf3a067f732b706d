"""Repeated-span dedup (dedup.drop_repeated_spans): crafted-case
semantics, a randomized pure-Python brute-force oracle for both modes,
and the Window-free skew-hardened plan contract (same posture as
tests/test_line_dedup.py for dedup_lines)."""

from __future__ import annotations

import random

import pytest

from etl_olho_vivo_spark.operators.dedup import drop_repeated_spans


def _brute(rows, k, min_count=2, mode="keep_first", drop_empty=True):
    toks = {d: t.split(" ") for d, t in rows}
    grams: dict[tuple, list] = {}
    for d, words in toks.items():
        for i in range(len(words) - k + 1):
            grams.setdefault(tuple(words[i:i + k]), []).append((d, i))
    covered = set()
    for occs in grams.values():
        if len(occs) < min_count:
            continue
        first = min(occs)
        for d, i in occs:
            if mode == "keep_first" and (d, i) == first:
                continue
            for p in range(i, i + k):
                covered.add((d, p))
    out = {}
    for d, words in toks.items():
        kept = " ".join(
            w for p, w in enumerate(words) if (d, p) not in covered
        )
        if kept or not drop_empty:
            out[d] = kept
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["text"]
        for r in drop_repeated_spans(df, **kw).collect()
    }


def test_keep_first_crafted(spark):
    rows = [
        (1, "the quick brown fox jumps over it"),
        (2, "lo the quick brown fox jumps away"),
        (3, "entirely different words here now"),
    ]
    out = _run(spark, rows, k=5)
    # doc 1 owns the first occurrence of the shared 5-gram; doc 2's
    # copy is cut (positions 1-5), leaving its unshared words
    assert out[1] == "the quick brown fox jumps over it"
    assert out[2] == "lo away"
    assert out[3] == "entirely different words here now"


def test_drop_all_and_short_docs_untouched(spark):
    rows = [
        (1, "a b c d e tail"),
        (2, "a b c d e other"),
        (3, "a b c d"),  # < k words: no grams, never touched
    ]
    out = _run(spark, rows, k=5, mode="drop_all")
    assert out[1] == "tail" and out[2] == "other"
    assert out[3] == "a b c d"
    with pytest.raises(ValueError, match="mode"):
        _run(spark, rows, mode="nope")
    with pytest.raises(ValueError, match="k must"):
        _run(spark, rows, k=1)


def test_overlapping_spans_cover_union(spark):
    # "x a b c d e y" vs two docs sharing staggered 5-grams: coverage
    # is the UNION of removable occurrences' positions
    rows = [
        (1, "a b c d e f"),
        (2, "z a b c d e f"),  # shares grams (a..e) and (b..f)
    ]
    out = _run(spark, rows, k=5)
    assert out == _brute(rows, k=5)


@pytest.mark.sweep
def test_brute_force_fuzz_both_modes(spark):
    rng = random.Random(1107)
    vocab = [f"w{i}" for i in range(12)]
    for mode in ("keep_first", "drop_all"):
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
            for d in range(60)
        ]
        want = _brute(rows, k=3, mode=mode)
        got = _run(spark, rows, k=3, mode=mode)
        assert got == want, mode
        # drop_empty_docs=False keeps fully-cut docs as empty strings
        want_all = _brute(rows, k=3, mode=mode, drop_empty=False)
        got_all = _run(
            spark, rows, k=3, mode=mode, drop_empty_docs=False
        )
        assert got_all == want_all, mode


def test_hot_gram_plan_is_window_free(spark):
    """A gram repeated across the whole corpus (boilerplate sentence)
    must flow through the groupBy-aggregate + join shape — never a
    window over the gram hash (the dedup_lines advisor finding applies
    identically here)."""
    hot = "all rights reserved to the owner"
    rows = [(i, f"{hot} body{i} unique{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = drop_repeated_spans(df, k=5, mode="drop_all")
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # the 6-word hot sentence spans two staggered 5-grams → all 6
    # positions cut everywhere; the unique tail survives
    assert got[0] == "body0 unique0" and got[99] == "body99 unique99"
    assert len(got) == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final, final[:2000]
    assert "HashAggregate" in final or "SortAggregate" in final
