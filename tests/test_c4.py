"""C4 heuristic cleanup (operators/textops.py: c4_clean_lines + c4_gate,
Raffel et al. 2020 §2.2): line-survival semantics, page rejection rules,
plan purity, and the composed run_corpus --c4 stage over a crafted
documents table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators import textops

GOOD = (
    'The first sentence is here and it is long enough.\n'
    'Another good sentence follows with plenty of words!\n'
    'Is this a question with enough words in it?'
)


def _clean(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return df.select(
        textops.c4_clean_lines("text", **kw).alias("t")
    ).collect()[0]["t"]


def test_clean_lines_keeps_only_terminal_punct_and_min_words(spark):
    doc = (
        "This line ends with a period and has many words.\n"
        "short line.\n"                       # < 5 words → dropped
        "no terminal punctuation at all here\n"  # no punct → dropped
        'He said the quote ends properly."\n'    # end-quote terminal
        "Navigation | Home | About\n"            # dropped
        "Final line asks a real question with words?"
    )
    out = _clean(spark, doc)
    assert out.splitlines() == [
        "This line ends with a period and has many words.",
        'He said the quote ends properly."',
        "Final line asks a real question with words?",
    ]
    # min_words dial
    assert _clean(spark, "One two three.\n", min_words=3) == "One two three."
    # everything dropped → empty string, not NULL
    assert _clean(spark, "menu\nlinks\nfooter") == ""


def test_gate_page_rules(spark):
    rows = [
        (1, GOOD),                                     # passes
        (2, "Lorem Ipsum dolor sit amet. More text. Again."),  # lorem
        (3, "A sentence. Another one. if (x) { return; } Yes."),  # brace
        (4, "Only one sentence here."),                # < 3 sentences
        (5, ""),                                       # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["c4_pass"] for r in textops.c4_gate(df).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}
    # caller-supplied badword list (case-insensitive)
    bad = {
        r["doc_id"]: r["c4_pass"]
        for r in textops.c4_gate(df, badwords=("QUESTION",)).collect()
    }
    assert bad[1] is False


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    gated = textops.c4_gate(
        df.withColumn("text", textops.c4_clean_lines("text"))
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "PythonUDF", "ArrowEval", "BatchEvalPython"):
        assert bad not in plan, plan[:2000]


@pytest.mark.sweep
def test_run_corpus_c4_stage(spark, tmp_path):
    """--c4 end-to-end: line cleanup happens BEFORE profiling (token
    counts and fingerprints reflect shipped text), the page gate drops
    rule-breaking survivors, and stats record the stage."""
    from etl_olho_vivo_spark.plans.corpus import run_corpus

    prose = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "A second sentence brings the total word count higher.\n"
        "And a third one makes the page pass the sentence rule."
    )
    rows = [
        (1, prose, "en", "s0"),
        # survives line cleanup but then trips the brace rule
        (2, prose + "\nA brace appears in this long line { right here.",
         "en", "s0"),
        # every line is navigation junk → text empties → length gate
        (3, "Home | About\nContact\nmenu", "en", "s0"),
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
        spark, str(sf), str(tmp_path / "out"), min_tokens=3, c4=True
    )
    assert stats["c4"] == 1
    out = spark.read.parquet(str(tmp_path / "out"))
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]
    # shipped text is the CLEANED text (3 surviving lines of doc 1)
    assert out.collect()[0]["text"] == prose
