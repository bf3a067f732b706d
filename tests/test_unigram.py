"""Unigram-LM tokenizer trainer (operators/unigram.py, round 12):
lattice-math pins, parity of the distributed trainer against a
brute-force pure-Python reference, determinism under repartitioning,
the Viterbi application path, and the corpus CLI wiring."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import Decimal

import pytest

from etl_olho_vivo_spark.operators import unigram

TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "the mat sat on the cat",
    "rats and cats",
    "the the the cat cat",
    "on a mat on a mat",
    "a tame cat sat",
]


# ---------------------------------------------------------------------------
# Brute-force reference: plain Python, NO Spark — mirrors every
# deterministic choice of the distributed trainer (histogram/seed
# tiebreaks, per-word decimal rounding, exact decimal sums) while
# reusing the same pure lattice functions, so parity checks the
# DISTRIBUTION of the computation, not a reimplementation of the math.
# ---------------------------------------------------------------------------

def _ref_train(texts, vocab_size, *, max_piece_len=8, seed_size=20_000,
               top_k=100_000, em_iters=2, shrink=0.75):
    ws = re.compile("[ \t\n\x0b\f\r]+")
    strip = re.compile("[\x1f\x1e]")
    cnt: Counter = Counter()
    for t in texts:
        for w in ws.split(strip.sub("", t)):
            if w:
                cnt[w] += 1
    hist = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]

    sub: Counter = Counter()
    for w, n in hist:
        for j in range(len(w)):
            for i in range(j + 1, min(len(w), j + max_piece_len) + 1):
                sub[w[j:i]] += n
    seeds = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]),
    )[:seed_size]
    seeds.update(dict(multi))
    total = sum(c * len(p) for p, c in seeds.items())
    model = {
        p: math.log(c * len(p) / total) for p, c in sorted(seeds.items())
    }

    q = Decimal(1).scaleb(-10)
    while True:
        counts_list: list = []
        for _ in range(em_iters):
            counts: dict = defaultdict(Decimal)
            for w, n in hist:
                for piece, ec in unigram.word_expected_counts(
                    w, model, max_piece_len
                ).items():
                    counts[piece] += Decimal(repr(ec * n)).quantize(q)
            counts_list = list(counts.items())
            model = unigram._m_step(counts_list, set(model))
        if len(model) <= vocab_size:
            break
        keep = max(vocab_size, int(len(model) * shrink))
        model = unigram._prune(model, dict(counts_list), keep)
    return model


# ---------------------------------------------------------------------------
# Lattice math pins
# ---------------------------------------------------------------------------

def test_word_expected_counts_analytic_pin():
    """Two-path lattice by hand: 'ab' under {a, b, ab} with equal
    piece log-probs -1.  P([ab]) = e^-1, P([a,b]) = e^-2,
    Z = e^-1 + e^-2 → ec(ab) = e^-1/Z, ec(a) = ec(b) = e^-2/Z."""
    model = {"a": -1.0, "b": -1.0, "ab": -1.0}
    ec = unigram.word_expected_counts("ab", model, 2)
    z = math.exp(-1) + math.exp(-2)
    assert ec["ab"] == pytest.approx(math.exp(-1) / z)
    assert ec["a"] == pytest.approx(math.exp(-2) / z)
    assert ec["b"] == pytest.approx(math.exp(-2) / z)
    # expected counts conserve path mass: sum over pieces weighted by
    # occurrences = expected segmentation length
    assert sum(ec.values()) == pytest.approx(
        1 * math.exp(-1) / z + 2 * math.exp(-2) / z
    )
    # unsegmentable → {}
    assert unigram.word_expected_counts("xyz", model, 2) == {}


def test_viterbi_pins():
    model = {"a": -2.0, "b": -2.0, "ab": -1.0, "abc": -5.0, "c": -2.0}
    got = unigram.viterbi_segment("abc", model, 3)
    assert got is not None
    pieces, lp = got
    assert pieces == ["ab", "c"] and lp == pytest.approx(-3.0)
    # excluding the winning piece falls back to the next-best path
    pieces2, lp2 = unigram.viterbi_segment("abc", model, 3, exclude="ab")
    assert pieces2 == ["abc"] and lp2 == pytest.approx(-5.0)
    assert unigram.viterbi_segment("xq", model, 3) is None


# ---------------------------------------------------------------------------
# Trainer parity + determinism
# ---------------------------------------------------------------------------

def test_train_unigram_matches_brute_force(spark):
    """The distributed trainer (Spark histogram, distributed seeding,
    mapInPandas E-steps with exact decimal reduction) equals the
    pure-Python reference EXACTLY — same pieces, bit-identical
    log-probabilities — on a corpus small enough to brute-force."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = unigram.train_unigram(docs, vocab_size=30, seed_size=50)
    want = _ref_train(TEXTS, 30, seed_size=50)
    assert got == want
    # single chars are never pruned, and probabilities normalize
    chars = {c for t in TEXTS for c in t if c != " "}
    assert chars <= set(got)
    assert sum(math.exp(lp) for lp in got.values()) == pytest.approx(
        1.0, abs=1e-6
    )


def test_train_unigram_deterministic_under_repartition(spark):
    """Bit-identical model from 1 partition and from 7 — the decimal
    E-step reduction is addition-order-independent by construction."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    m1 = unigram.train_unigram(
        docs.coalesce(1), vocab_size=25, seed_size=40
    )
    m7 = unigram.train_unigram(
        docs.repartition(7), vocab_size=25, seed_size=40
    )
    assert m1 == m7


def test_train_unigram_guards(spark):
    docs = spark.createDataFrame([("ab ba",)], "text string")
    with pytest.raises(ValueError, match="vocab_size"):
        unigram.train_unigram(docs, vocab_size=0)
    with pytest.raises(ValueError, match="shrink"):
        unigram.train_unigram(docs, vocab_size=5, shrink=1.5)
    with pytest.raises(ValueError, match="em_iters"):
        unigram.train_unigram(docs, vocab_size=5, em_iters=0)
    with pytest.raises(ValueError, match="distinct characters"):
        unigram.train_unigram(docs, vocab_size=1)  # 2 chars


# ---------------------------------------------------------------------------
# Application
# ---------------------------------------------------------------------------

def test_unigram_apply_tokens_ids_both(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = unigram.train_unigram(docs, vocab_size=30, seed_size=50)
    vocab = unigram.unigram_vocabulary(model)

    out = unigram.unigram_apply(
        docs, model, emit="both", vocab=vocab
    ).collect()
    t2i = {t: i for i, t in enumerate(vocab)}
    for r in out:
        toks = r["unigram_tokens"].split(" ")
        # lossless: concatenating pieces reproduces the text's words
        assert "".join(toks) == r["text"].replace(" ", "")
        # every emitted piece is in the model, ids match the vocab
        assert all(t in model for t in toks)
        assert r["unigram_ids"] == [t2i[t] for t in toks]

    # ids mode alone returns the flat id stream
    ids = unigram.unigram_apply(
        docs, model, emit="ids", vocab=vocab, out="ids"
    ).collect()
    assert all(isinstance(r["ids"], list) and r["ids"] for r in ids)


def test_unigram_apply_unknown_chars_and_guards(spark):
    model = {"a": -1.0, "b": -1.5, "ab": -1.0}
    vocab = unigram.unigram_vocabulary(model)
    docs = spark.createDataFrame(
        [("ab zq ab",), (None,)], "text string"
    )
    rows = unigram.unigram_apply(
        docs, model, emit="both", vocab=vocab
    ).collect()
    got = {r["text"]: (r["unigram_tokens"], r["unigram_ids"])
           for r in rows}
    # novel chars become their own tokens with id -1; NULL text flows
    # (vocab sorts by -logp then piece: [a, ab, b] → 'ab' is id 1)
    assert got["ab zq ab"] == ("ab z q ab", [1, -1, -1, 1])
    assert got[None] == (None, None)

    with pytest.raises(ValueError, match="already exists"):
        unigram.unigram_apply(docs, model, out="text")
    with pytest.raises(ValueError, match="emit"):
        unigram.unigram_apply(docs, model, emit="words")
    with pytest.raises(ValueError, match="vocab"):
        unigram.unigram_apply(docs, model, emit="ids")
    with pytest.raises(ValueError, match="empty model"):
        unigram.unigram_apply(docs, {}, emit="tokens")


def test_sample_segment_distribution_and_limits():
    """Subword-regularization draws: alpha→large concentrates on the
    Viterbi split; alpha=1 reproduces the analytic segmentation
    distribution (P([ab]) = e^-1/(e^-1+e^-2) ≈ 0.731 on the two-path
    lattice) over distinct keys; the same key always replays the same
    draw (md5 stream — pure function of its inputs)."""
    model = {"a": -1.0, "b": -1.0, "ab": -1.0}
    assert unigram.sample_segment("ab", model, 2, 50.0, "k") == ["ab"]
    n = 400
    hits = sum(
        unigram.sample_segment("ab", model, 2, 1.0, f"k{i}") == ["ab"]
        for i in range(n)
    )
    p = math.exp(-1) / (math.exp(-1) + math.exp(-2))
    assert abs(hits / n - p) < 0.06, (hits / n, p)
    assert unigram.sample_segment("ab", model, 2, 1.0, "z") == \
        unigram.sample_segment("ab", model, 2, 1.0, "z")
    assert unigram.sample_segment("xq", model, 2, 1.0, "z") is None


def test_unigram_apply_sampling_mode(spark):
    """sample_alpha: per-occurrence draws (both split variants appear
    across one document's occurrences), lossless coverage, identical
    output under repartitioning (content-keyed md5 randomness), a
    different seed changes the corpus, and alpha <= 0 is rejected."""
    model = {"a": -1.0, "b": -1.0, "ab": -1.0}
    docs = spark.createDataFrame(
        [(" ".join(["ab"] * 60),), ("ab ba ab",), (None,)],
        "text string",
    )
    out1 = {
        r["text"]: r["unigram_tokens"]
        for r in unigram.unigram_apply(
            docs.coalesce(1), model, sample_alpha=1.0, sample_seed=3
        ).collect()
    }
    out7 = {
        r["text"]: r["unigram_tokens"]
        for r in unigram.unigram_apply(
            docs.repartition(7), model, sample_alpha=1.0, sample_seed=3
        ).collect()
    }
    assert out1 == out7  # partitioning-independent draws
    assert out1[None] is None
    long_toks = out1[" ".join(["ab"] * 60)].split(" ")
    assert "".join(long_toks) == "ab" * 60  # lossless
    # regularization actually varies the split across occurrences
    assert {"ab", "a"} <= set(long_toks)
    # unknown chars still fall back per-run in sampling mode
    assert "".join(out1["ab ba ab"].split(" ")) == "abbaab"

    other = {
        r["text"]: r["unigram_tokens"]
        for r in unigram.unigram_apply(
            docs, model, sample_alpha=1.0, sample_seed=4
        ).collect()
    }
    assert other[" ".join(["ab"] * 60)] != out1[" ".join(["ab"] * 60)]

    with pytest.raises(ValueError, match="sample_alpha"):
        unigram.unigram_apply(docs, model, sample_alpha=0.0)


def test_unigram_vocabulary_deterministic():
    model = {"b": -1.0, "a": -1.0, "ab": -0.5}
    assert unigram.unigram_vocabulary(model) == ["ab", "a", "b"]


# ---------------------------------------------------------------------------
# CLI wiring
# ---------------------------------------------------------------------------

@pytest.mark.sweep
def test_corpus_unigram_tokenize_cli(spark, tmp_path, capsys,
                                     monkeypatch):
    """--unigram-tokenize end-to-end through the corpus pipeline:
    token/id columns land in the corpus, the model and vocabulary
    artifacts persist beside it, and --bpe-tokenize is refused in the
    same run."""
    import json

    import etl_olho_vivo_spark.plans.corpus as corpus_mod
    from pyspark.sql import functions as F
    from etl_olho_vivo_spark.__main__ import main

    df = spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(TEXTS * 3)],
        ["doc_id", "text", "lang", "source"],
    ).withColumn("n_chars", F.length("text"))
    monkeypatch.setattr(corpus_mod, "read_table", lambda _s, _d, _n: df)

    out = str(tmp_path / "corpus")
    assert main(["--cpus", "8", "corpus", "--sf-dir", "unused",
                 "--out", out,
                 "--min-tokens", "1", "--unigram-tokenize", "30"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < stats["unigram_pieces"] <= 30
    corpus = spark.read.parquet(out)
    assert {"unigram_tokens", "unigram_ids"} <= set(corpus.columns)
    model = {
        r["piece"]: r["logp"]
        for r in spark.read.parquet(out + "_unigram_model").collect()
    }
    vocab = [
        r["piece"] for r in spark.read.parquet(out + "_unigram_vocab")
        .orderBy("id").collect()
    ]
    assert vocab == unigram.unigram_vocabulary(model)
    for r in corpus.select("text", "unigram_tokens").collect():
        assert "".join(r["unigram_tokens"].split(" ")) == \
            r["text"].replace(" ", "")

    with pytest.raises(ValueError, match="mutually exclusive"):
        main(["--cpus", "8", "corpus", "--sf-dir", "unused",
              "--out", out, "--min-tokens", "1",
              "--unigram-tokenize", "30", "--bpe-tokenize", "10"])