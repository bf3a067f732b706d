"""BPE tokenizer training support — the corpus-side statistics pass.

Training a byte-pair-encoding vocabulary (Sennrich et al. 2016) over a
100 TB corpus does NOT iterate over the corpus: every practical
implementation (sentencepiece, HF tokenizers) reduces the corpus to a
**word histogram** first and runs the merge loop on that — the corpus
is scanned exactly once, and each of the ~30k merge iterations touches
only the distinct-word table, which is vocabulary-sized, not
corpus-sized.  This module follows that two-phase shape:

1. ``word_histogram`` — ONE distributed pass: whitespace words →
   groupBy(word).count(), with a ``top_k`` frequency cutoff (standard
   practice; the histogram must be driver-bounded, and words below the
   cutoff cannot influence early merges materially).
2. ``bpe_merges`` — the classic greedy merge loop, driver-side over the
   collected histogram.  Deterministic: pair ties break lexicographically
   (published implementations vary here; fixing the tiebreak makes
   vocabularies reproducible across runs).
3. ``bpe_segment_expr`` — applying a trained merge list back to the
   corpus as a JVM-side Column expression for SMALL merge lists (each
   merge is one ``replace`` over a boundary-marked word string); for
   production-sized vocabularies apply a real tokenizer in
   ``mapInPandas`` instead (same posture as multimodal decode).

Relation to the reference (JonasMarma/etl-olho-vivo): none — part of the
beyond-reference training-data surface (SURVEY §2.11 text analysis).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (Sennrich et al.); chosen outside the corpus
#: alphabet for the driver tables, and escaped nowhere — callers with
#: '</w>' in their text should pre-clean.
EOW = "</w>"


def word_histogram(
    docs: DataFrame,
    text: str = "text",
    top_k: int = 100_000,
    min_count: int = 1,
) -> DataFrame:
    """Distinct-word counts, descending, cut to the ``top_k`` most
    frequent (deterministic tail tiebreak on the word itself).

    The ONE corpus-sized job of BPE training: map-side split + partial
    counts, one shuffle on the word.  ``top_k`` bounds what the driver
    later collects — at 100 TB the raw distinct-word count (typos,
    numbers, hashes) is unbounded, and frequency-ranked truncation is
    the standard fix, not a limitation.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.col(text), r"\s+"), lambda w: w != F.lit("")
            )
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "word")
        .limit(top_k)
    )


def bpe_merges(
    histogram: list[tuple[str, int]] | DataFrame,
    n_merges: int = 1000,
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from a word histogram.

    ``histogram`` is either the ``word_histogram`` frame (collected
    here — bounded by its ``top_k`` construction) or an already-local
    ``[(word, count), ...]``.  Returns ``[(left, right), ...]`` in
    merge order; applying them in order to a character-split word
    reproduces the trained segmentation.

    Classic algorithm: every word starts as its character sequence +
    EOW; each round merges the globally most frequent adjacent symbol
    pair (count-weighted by word frequency), ties broken
    lexicographically; stops early when no pair repeats.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if isinstance(histogram, DataFrame):
        histogram = [
            (r["word"], int(r["n"])) for r in histogram.collect()
        ]
    vocab: dict[tuple[str, ...], int] = {}
    for word, count in histogram:
        symbols = tuple(word) + (EOW,)
        vocab[symbols] = vocab.get(symbols, 0) + count
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, count in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + count
        if not pairs:
            break
        (a, b), best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break  # nothing repeats — further merges are noise
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for symbols, count in vocab.items():
            res: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    res.append(merged)
                    i += 2
                else:
                    res.append(symbols[i])
                    i += 1
            key = tuple(res)
            out[key] = out.get(key, 0) + count
        vocab = out
        merges.append((a, b))
    return merges


def bpe_vocabulary(
    histogram: list[tuple[str, int]] | DataFrame, n_merges: int = 1000
) -> list[str]:
    """The token vocabulary implied by a merge list: base characters +
    EOW + one token per merge, in deterministic order."""
    if isinstance(histogram, DataFrame):
        histogram = [
            (r["word"], int(r["n"])) for r in histogram.collect()
        ]
    merges = bpe_merges(histogram, n_merges)
    chars = sorted({c for w, _ in histogram for c in w})
    return chars + [EOW] + [a + b for a, b in merges]


def bpe_segment_expr(
    merges: list[tuple[str, str]], text: str = "text", sep: str = " "
) -> Column:
    """Apply a SMALL trained merge list corpus-side, as a pure Column
    expression: words become space-joined token sequences.

    Each merge compiles to one ``replace`` over a marker-delimited
    symbol string, so the expression depth grows with ``len(merges)``
    — fine for the few-hundred-merge vocabularies used in tests and
    feature pipelines; use a real tokenizer under ``mapInPandas`` for
    30k-merge production vocabularies (expression trees that deep
    stress codegen for no benefit).
    """
    if len(merges) > 512:
        raise ValueError(
            f"bpe_segment_expr is for small merge lists (<= 512); got "
            f"{len(merges)} — apply a real tokenizer via mapInPandas"
        )
    # Every symbol is ENCLOSED in \x1f markers (m+sym+m), so the merge
    # pattern m+a+m+m+b+m can only match whole symbols — a bare
    # a+DELIM+b pattern would also match when a multi-char symbol
    # merely ENDS with `a` (e.g. symbol "aa" before "b" contains
    # "a⟂b"), silently producing out-of-vocabulary tokens.  Words are
    # joined with \x1e.  Both control chars are stripped from the
    # input first: corpus text containing them would otherwise inject
    # fake symbol boundaries.
    m, g = "\x1f", "\x1e"
    clean = F.regexp_replace(F.col(text), F.lit("[\\x1f\\x1e]"), F.lit(""))
    enclose = lambda c: F.concat(F.lit(m), c, F.lit(m))  # noqa: E731
    word_syms = F.transform(
        F.filter(F.split(clean, r"\s+"), lambda w: w != F.lit("")),
        lambda w: F.concat(
            F.array_join(F.transform(F.split(w, ""), enclose), ""),
            F.lit(m + EOW + m),
        ),
    )
    joined = F.array_join(word_syms, g)
    for a, b in merges:
        joined = F.replace(
            joined,
            F.lit(m + a + m + m + b + m),
            F.lit(m + a + b + m),
        )
    # decode: token gap (m+m) and word gap (g) → separator, then strip
    # the enclosing markers
    out = F.replace(joined, F.lit(m + m), F.lit(sep))
    out = F.replace(out, F.lit(g), F.lit(sep))
    return F.replace(out, F.lit(m), F.lit(""))
