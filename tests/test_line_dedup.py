"""Corpus-wide line dedup (dedup.dedup_lines): crafted-case semantics,
a randomized pure-Python brute-force oracle for both modes, and the
slim-shuffle plan contract."""

from __future__ import annotations

import random

import pytest

from etl_olho_vivo_spark.operators.dedup import dedup_lines


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["text"] for r in dedup_lines(df, **kw).collect()
    }


def test_keep_first_preserves_order_and_first_copy(spark):
    rows = [
        (1, "header\nunique one\nfooter"),
        (2, "header\nunique two\nfooter"),
        (3, "header\nfooter"),
    ]
    out = _run(spark, rows)
    # doc 1 holds the first (smallest id, pos) copy of header+footer
    assert out[1] == "header\nunique one\nfooter"
    assert out[2] == "unique two"
    assert 3 not in out  # nothing survived → dropped


def test_drop_boilerplate_removes_all_copies(spark):
    rows = [
        (1, "nav\ncontent alpha\nnav"),
        (2, "nav\ncontent beta"),
    ]
    out = _run(spark, rows, mode="drop_boilerplate")
    assert out == {1: "content alpha", 2: "content beta"}
    # raising min_count above the 3 occurrences keeps everything
    out2 = _run(spark, rows, mode="drop_boilerplate", min_count=4)
    assert out2[1] == "nav\ncontent alpha\nnav"


def test_blank_lines_are_structure_not_duplicates(spark):
    rows = [(1, "a\n\nb"), (2, "c\n\nd")]
    out = _run(spark, rows)
    assert out == {1: "a\n\nb", 2: "c\n\nd"}


def test_non_text_columns_survive_and_empty_docs_kept_on_request(spark):
    rows = [(1, "same"), (2, "same")]
    spark_df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr("doc_id", "text", "doc_id * 10 AS meta")
    )
    out = dedup_lines(spark_df, drop_empty_docs=False).collect()
    got = {r["doc_id"]: (r["text"], r["meta"]) for r in out}
    assert got == {1: ("same", 10), 2: ("", 20)}
    with pytest.raises(ValueError, match="mode"):
        dedup_lines(spark_df, mode="bogus")
    with pytest.raises(ValueError, match="min_count"):
        dedup_lines(spark_df, min_count=1)


def test_brute_force_oracle_both_modes(spark):
    """Random corpora from a tiny line vocabulary (forcing heavy
    duplication) match an independent pure-Python recomputation."""
    rng = random.Random(42)
    vocab = [f"line {i}" for i in range(12)] + [""]
    rows = [
        (d, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 9))))
        for d in range(40)
    ]

    def brute(mode, min_count):
        from collections import Counter

        counts = Counter(
            ln
            for _, t in rows
            for ln in t.split("\n")
            if ln != ""
        )
        seen = set()
        out = {}
        for d, t in sorted(rows):
            keep = []
            for ln in t.split("\n"):
                if ln == "":
                    keep.append(ln)
                elif counts[ln] < min_count:
                    keep.append(ln)
                elif mode == "keep_first":
                    if ln not in seen:
                        seen.add(ln)
                        keep.append(ln)
            joined = "\n".join(keep)
            if joined:
                out[d] = joined
        return out

    for mode, mc in (
        ("keep_first", 2),
        ("drop_boilerplate", 2),
        ("drop_boilerplate", 4),
    ):
        got = _run(spark, rows, mode=mode, min_count=mc)
        assert got == brute(mode, mc), (mode, mc)


def test_run_corpus_line_dedup_stage(spark, tmp_path):
    """corpus --dedup-lines: the boilerplate line survives only in the
    first (id, pos) occurrence corpus-wide, and fingerprints reflect
    the rewritten text (two docs identical AFTER line dedup collapse
    in the exact-dedup stage)."""
    from pyspark.sql import functions as F

    from etl_olho_vivo_spark.plans.corpus import run_corpus

    boiler = "subscribe to the newsletter for more updates"
    rows = [
        (1, f"{boiler}\nthe first real article body is here", "en", "s0"),
        (2, f"{boiler}\nthe second real article body is there", "en", "s0"),
        # identical to doc 2 once the boilerplate line is deleted
        (3, "the second real article body is there", "en", "s0"),
    ]
    sf = tmp_path / "sf"
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        .withColumn("n_chars", F.length("text"))
        .write.parquet(str(sf / "documents.parquet"))
    )
    stats = run_corpus(
        spark,
        str(sf),
        str(tmp_path / "out"),
        min_tokens=3,
        line_dedup="keep_first",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert boiler in out[1]
    # doc 2 lost the boilerplate line, became doc 3's exact twin, and
    # exact dedup kept the smaller doc_id
    assert 3 not in out and out[2] == rows[2][1]
    assert stats["exact_dedup"] == 2


def test_plan_shuffles_slim_rows_only(spark):
    """The ranking exchange must carry (hash, id, pos, line) rows
    hash-partitioned on the line hash — and no Python appears."""
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    out = dedup_lines(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "hashpartitioning(lh" in final, final[:2000]
    for bad in ("PythonUDF", "BatchEvalPython", "CartesianProduct"):
        assert bad not in final


def test_hot_boilerplate_line_and_no_window(spark):
    """The primary target of drop_boilerplate — ONE line repeated across
    the whole corpus — must (a) compute correctly and (b) never route
    through a window over the line hash: the round-6 advisor showed the
    row_number/count window serializes the hot key's entire occurrence
    set into one task's sort buffer, while the groupBy+join form
    partial-aggregates it map-side and stays AQE-skew-splittable."""
    hot = "all rights reserved"
    rows = [
        (i, f"{hot}\nbody {i}\n{hot}") for i in range(200)
    ] + [(1000, "no boilerplate here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = dedup_lines(df, mode="drop_boilerplate", min_count=10)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[0] == "body 0" and got[199] == "body 199"
    assert got[1000] == "no boilerplate here"
    assert len(got) == 201

    keep = dedup_lines(df, mode="keep_first")
    gk = {r["doc_id"]: r["text"] for r in keep.collect()}
    # doc 0 owns both copies' first occurrences (pos 0 beats pos 2)
    assert gk[0] == f"{hot}\nbody 0"
    assert gk[5] == "body 5"

    for frame in (out, keep):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the occurrence stats come from a partial-aggregated groupBy
        # (HashAggregate), never a Window over the line hash
        assert "Window" not in final, final[:2000]
        assert "HashAggregate" in final or "SortAggregate" in final
