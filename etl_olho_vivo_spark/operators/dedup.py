"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash.

Scale design (the 100 TB story):
- signatures (shingles → MinHash → band keys) are computed **per row with
  array higher-order functions** — no explode, no shuffle, pure map;
- the only shuffles are (1) the LSH band self-join on ``(band, band_sig)``
  — candidate generation touches just B small keys per doc, never the
  O(n²) cross product — and (2) the final verify join, which is bounded by
  the candidate count;
- band keys are near-uniform (md5-derived), so the band join is skew-free;
  a hot band (e.g. boilerplate) is exactly what AQE skew-split handles.

MinHash-LSH follows the classic banding construction (Broder; Leskovec et
al., "Mining of Massive Datasets" ch.3) — K hashes, B bands × r rows:
P(candidate) = 1 − (1 − J^r)^B.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from etl_olho_vivo_spark.caching import CacheBag

from etl_olho_vivo_spark.functions.hashing import (
    P,
    minhash_perm_expr,
    shingle3_expr,
    spark_token_hash,
)

NUM_HASHES = 8
ROWS_PER_BAND = 2
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
SIMHASH_BITS = 16            # fingerprint width (matched by the SQL oracle)
SIMHASH_NEAR_DUP_BITS = 32   # pairing width: segments must track log2(n)


def exact_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the first row (min ``order_col``) per exact key — the scalable
    groupBy form of ``dropDuplicates`` with a deterministic survivor."""
    return df.groupBy(*keys).agg(
        F.min(order_col).alias("keep_" + order_col),
        F.count(F.lit(1)).alias("n_dupes"),
    )


def dedup_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    mode: str = "keep_first",
    min_count: int = 2,
    drop_empty_docs: bool = True,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level dedup (the C4/CCNet pass, public papers:
    Raffel et al. 2020 §2.2, Wenzek et al. 2019): rewrite every
    document with its duplicated lines removed, preserving line order.
    ``sep`` is the line delimiter ("\\n" for real corpora; the driver
    oracle uses " " because the synthetic docs are single-line).

    Modes:

    - ``keep_first`` — of every line occurring ≥ ``min_count`` times
      corpus-wide, keep only the occurrence with the smallest
      (id, position) and delete the rest (C4's "keep one" form);
    - ``drop_boilerplate`` — delete ALL occurrences of any line
      occurring ≥ ``min_count`` times (the CCNet form: a line repeated
      across many pages is navigation/boilerplate, and the "first" page
      deserves it no more than the others).  ``min_count`` defaults to
      2 but is typically raised (e.g. 10) in this mode.

    Scale shape — this is a corpus-granularity operator, and LINE TEXT
    CROSSES EXACTLY ONE EXCHANGE (the final doc-level join); every
    line-hash-keyed exchange carries only slim ``(lh, id, pos)`` rows:
    (1) per-hash occurrence stats come from a ``groupBy("lh")``
    AGGREGATE (count + min(struct(id, pos))), not a window — the
    window form serializes every occurrence of one hash into a single
    task's sort buffer, and the heavily-repeated boilerplate line a
    corpus-wide dedup exists to catch ("Privacy Policy" across
    billions of pages) is precisely such a hot key; the aggregate
    absorbs hot keys map-side (partial aggregation) into ONE slim row
    per hash.  (2) the slim line keys join back to that stats relation
    on ``lh`` — a join, not a window, so AQE skew-split can further
    divide a hot hash's probe partition, and a hot hash concentrates
    ~20-byte keys, never text.  (3) the rows marked DELETE collapse to
    one ``(id, [pos...])`` list per affected document (bounded by the
    document's own line count), and the original doc rows join that
    relation on ``id`` — unique keys, so the one text-bearing exchange
    is skew-free by construction — and are rebuilt in place with a
    positional ``filter`` over ``split(text)``: O(L·|deleted|) per doc,
    |deleted| ≪ L on real corpora because only duplicated lines carry
    positions.  (The round-7 formulation shuffled full line text on
    ``lh`` AND re-grouped it on ``id`` — two corpus-text exchanges with
    a hot-key hazard; this shape was the advisor-prompted fix.)  Empty
    lines are preserved as document structure, not dedup'd (every
    blank line would otherwise collapse corpus-wide into one) — and
    they BYPASS the line-hash exchanges entirely: ``md5('')`` would be
    a guaranteed corpus-wide hot key on web text (~10% blank lines),
    and since blanks never enter the hash relation they can never be
    marked for deletion.
    """
    if mode not in ("keep_first", "drop_boilerplate"):
        raise ValueError(
            f"mode must be keep_first|drop_boilerplate, got {mode!r}"
        )
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")

    import re

    # F.split takes a JAVA REGEX: escape the separator so "." or "|"
    # separators split literally (re.escape only escapes regex
    # metacharacters — compatible with Java Pattern for those).
    # Blank lines are excluded BEFORE hashing — they bypass every hash
    # exchange and can never be deleted (see docstring) — and the line
    # text is dropped in the same projection: only (id, pos, lh) ever
    # shuffles on the line hash.
    hashed = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text), re.escape(sep), -1)).alias(
            "pos", "line"
        ),
    ).filter(F.col("line") != "").select(
        id_col, "pos", F.md5("line").alias("lh")
    )
    # one slim row per distinct line hash: occurrence count + the
    # first (id, pos) — map-side partial aggregation flattens hot keys
    stats = hashed.groupBy("lh").agg(
        F.count(F.lit(1)).alias("__lh_n__"),
        F.min(F.struct(id_col, "pos")).alias("__lh_first__"),
    )
    # symmetric corpus-scaled joins (line stats, deletion lists) pinned
    # merge, like drop_repeated_spans: AQE's runtime broadcast of a
    # corpus-scaled side dies under a starved driver (30× probe), while
    # sort-merge spills and keeps AQE's skew-split
    joined = hashed.join(stats.hint("merge"), "lh")
    frequent = F.col("__lh_n__") >= F.lit(min_count)
    if mode == "keep_first":
        delete = frequent & ~(
            (F.col(id_col) == F.col(f"__lh_first__.{id_col}"))
            & (F.col("pos") == F.col("__lh_first__.pos"))
        )
    else:
        delete = frequent
    # one (id, [pos...]) row per document that loses at least one line
    # — bounded by the doc's own line count, usually far smaller
    del_pos = (
        joined.filter(delete)
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__del__"))
    )
    # rebuild in place: positional filter over the re-split text keeps
    # original order for free (no collect_list + array_sort pass) and
    # costs O(L·|deleted|) per doc; docs with no deletions carry an
    # empty list through the coalesce
    out = (
        docs.join(del_pos.hint("merge"), id_col, "left")
        .withColumn(
            "__del__",
            F.coalesce("__del__", F.expr("CAST(array() AS ARRAY<INT>)")),
        )
        .withColumn(
            text,
            F.concat_ws(
                sep,
                F.filter(
                    F.split(F.col(text), re.escape(sep), -1),
                    lambda line, i: ~F.array_contains(F.col("__del__"), i),
                ),
            ),
        )
        .drop("__del__")
    )
    if drop_empty_docs:
        out = out.filter(F.length(F.col(text)) > 0)
    return out.select(*docs.columns)


def drop_repeated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 5,
    mode: str = "keep_first",
    min_count: int = 2,
    drop_empty_docs: bool = True,
) -> DataFrame:
    """Corpus-wide repeated-SPAN removal — the shingle approximation of
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": repeated ≥50-token substrings
    are removed corpus-wide; here the unit is a ``k``-word gram, the
    same rolling-hash grams the decontamination operator uses).

    A word position is deleted when it is covered by any REMOVABLE
    occurrence of a ``k``-gram whose corpus-wide occurrence count is
    ≥ ``min_count``; under ``keep_first`` the single globally-first
    occurrence of each gram — smallest (id, gram position) — is not
    removable (its words survive unless another removable gram overlaps
    them); ``drop_all`` removes every occurrence (the boilerplate
    form).  Documents shorter than ``k`` words have no grams and are
    never touched.  Survivor words are re-joined in order; empty
    results are dropped or kept per ``drop_empty_docs``, as in
    ``dedup_lines``.

    Scale shape — deliberately identical to ``dedup_lines``'s hardened
    form: gram occurrences are slim (hash, id, pos) rows; occurrence
    stats come from a ``groupBy(gram)`` AGGREGATE (map-side partials
    flatten the hot boilerplate gram), the probe is a JOIN
    (AQE-skew-splittable), covered positions are an integer explode of
    at most ``k`` per removable occurrence, survivors come from a
    LEFT ANTI join on (id, pos), and reassembly is one doc-keyed
    aggregation bounded by a single document's length.  The gram pass
    itself is pure map (one materialized token-hash array per doc —
    the ``with_token_hashes`` O(tokens²)-inlining guard applies, and
    the gram explode is ``posexplode_outer`` for the same
    InferFiltersFromGenerate reason as decontam).
    """
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"mode must be keep_first|drop_all, got {mode!r}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from etl_olho_vivo_spark.functions.hashing import ngram_hash_expr

    gram = ngram_hash_expr([f"wh[i + {j}]" for j in range(k)])
    grams_arr = (
        f"CASE WHEN size(wh) >= {k} THEN "
        f"transform(sequence(0, size(wh) - {k}), i -> {gram}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    occ = (
        with_token_hashes(docs.select(id_col, text), text)
        .withColumn("__gs__", F.expr(grams_arr))
        .select(
            id_col,
            F.posexplode_outer("__gs__").alias("gpos", "gh"),
        )
        .filter(F.col("gh").isNotNull())
    )
    stats = occ.groupBy("gh").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min(F.struct(id_col, "gpos")).alias("__first__"),
    )
    removable = F.col("__n__") >= F.lit(min_count)
    if mode == "keep_first":
        removable = removable & ~(
            (F.col(id_col) == F.col(f"__first__.{id_col}"))
            & (F.col("gpos") == F.col("__first__.gpos"))
        )
    # every join below is SYMMETRIC corpus-scaled (gram stats, covered
    # positions, rebuilt docs all grow with the corpus) — pinned merge
    # per the round-6 join-strategy hardening: AQE's runtime broadcast
    # of such a side dies with "Not enough memory to build and
    # broadcast" under a starved driver (reproduced by the 30× probe in
    # tests/test_memory_probe.py), while sort-merge spills both sides
    # and still gets AQE's skew-split
    covered = (
        occ.join(stats.hint("merge"), "gh")
        .filter(removable)
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(k - 1))
            ).alias("pos"),
        )
    )
    tokens = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text), " ", -1)).alias("pos", "word"),
    )
    survivors = tokens.join(
        covered.hint("merge"), [id_col, "pos"], "left_anti"
    )
    rebuilt = survivors.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
        ).alias(text)
    )
    base = docs.drop(text)
    if drop_empty_docs:
        out = base.join(
            rebuilt.filter(F.length(F.col(text)) > 0).hint("merge"),
            id_col,
        )
    else:
        out = base.join(rebuilt.hint("merge"), id_col, "left").withColumn(
            text, F.coalesce(F.col(text), F.lit(""))
        )
    return out.select(*docs.columns)


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Scale-ADAPTIVE pre-compute spread (round 15, guide §2.5 "input
    skew: one huge unsplittable file... repartition immediately after
    the read").

    The expensive per-row compute downstream of a scan (md5 token
    hashing, fingerprint folds, n-gram windows) inherits the SCAN's
    parallelism.  A single-file, single-row-group input — the shape of
    every local test table, and of any badly-compacted landing zone —
    yields ONE input split, serializing the whole corpus's compute on
    one core (measured: simhash32 at sf0.1 runs 3.9× faster with the
    spread).  When the scan already provides at least the session's
    default parallelism — every healthy at-scale layout — this is a
    NO-OP: no exchange is added, so the at-scale plan shape is
    unchanged and no text payload is ever shuffled for nothing.

    Round-robin (keyless) on purpose: a hash key derived from content
    would re-serialize a duplicate-heavy corpus onto hot partitions,
    and the deterministic sort-before-repartition keeps retries safe.
    Streaming frames pass through untouched — their parallelism belongs
    to the source.

    Target = cores/4, NOT cores (measured, interleaved min-of-3 at
    sf0.1 on local[32]: minhash 3.56 s off / 1.62 s at 8 / 3.60 s at
    32).  The spread frames are typically persisted and consumed by
    SEVERAL downstream stages in one action; a lazily-materialized
    cache computes each block under the BlockManager's per-block lock,
    so every concurrent consumer stage schedules its own full task set
    and the waiters HOLD executor slots while the computing tasks
    queue behind them — spread × concurrent-consumers must stay within
    the core count, and /4 covers the worst in-repo fan-out (the
    MinHash signature's three consumers plus slack) while still lifting
    the compute off a single core.

    The partition-count probe (``df.rdd.getNumPartitions()``) forces
    physical planning of the input, measured 0.1-0.2 s per fresh scan
    plan and multi-second on a deep lineage — and the builders rebuild
    semantically identical plans on every call (bench reruns, the
    per-order model builders).  The decision is therefore MEMOIZED on
    the analyzed plan's semantic hash (round 16): a repeat probe costs
    one py4j hash call (~1 ms) instead of re-planning.  Keyed per
    session, bounded; a stale entry can only mis-size parallelism for
    a same-session same-plan input whose underlying files changed —
    a performance heuristic, never a correctness surface."""
    if df.isStreaming:
        return df
    target = max(2, df.sparkSession.sparkContext.defaultParallelism // 4)
    key = (
        id(df.sparkSession._jsparkSession),
        df._jdf.queryExecution().analyzed().semanticHash(),
        target,
    )
    wide = _SPREAD_MEMO.get(key)
    if wide is None:
        wide = df.rdd.getNumPartitions() >= target
        if len(_SPREAD_MEMO) >= 4096:  # bound the per-process footprint
            _SPREAD_MEMO.clear()
        _SPREAD_MEMO[key] = wide
    if wide:
        return df
    return df.repartition(target)


#: spread_small_scan's memoized (session, plan-hash, target) → "already
#: wide enough" decisions — see its docstring
_SPREAD_MEMO: dict[tuple, bool] = {}


def with_token_hashes(
    df: DataFrame, text: str = "text", out: str = "wh",
    spread: bool = True,
) -> DataFrame:
    """Materialize the per-token md5-hash array ONCE as a column.

    Performance-critical: the naive formulation inlines the whole
    ``transform(split(text), w -> md5(w))`` array at every ``element_at``
    site inside a per-index lambda, and Spark re-evaluates the inner
    ``transform`` on each outer-lambda invocation — O(tokens²) md5 calls
    per document (measured 156 s for 5k docs at sf0.1).  Materialized as
    its own projection the array is computed once per row; Catalyst's
    CollapseProject will not inline it back because a non-cheap alias
    referenced more than once is never duplicated.

    Every caller is a fingerprint/window/aggregate shape (never a
    pinned zero-exchange projection), so the adaptive
    ``spread_small_scan`` rides here: the md5 pass is the single most
    repeated heavy compute in the engine and must not inherit a
    one-split scan's parallelism.
    """
    wh = f"transform(split({text}, ' '), w -> {spark_token_hash('w')})"
    base = spread_small_scan(df) if spread else df
    return base.withColumn(out, F.expr(wh))


def with_shingles(
    df: DataFrame, text: str = "text", out: str = "sh",
    spread: bool = True,
) -> DataFrame:
    """Distinct word-3-gram shingle hashes per document (array column).

    ``spread=False`` opts a call site out of the adaptive pre-compute
    spread (see ``with_token_hashes``) when its downstream is a single
    immediate aggregate that re-exchanges anyway (the bloom bitmap
    path measured +0.1 s from the extra exchange, everything else
    measured flat-or-faster)."""
    sh = shingle3_expr("wh[i]", "wh[i + 1]", "wh[i + 2]")
    expr = (
        f"CASE WHEN size(wh) >= 3 THEN "
        f"array_distinct(transform(sequence(0, size(wh) - 3), i -> {sh})) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return (
        with_token_hashes(df, text, spread=spread)
        .withColumn(out, F.expr(expr))
        .drop("wh")
    )


def minhash_signature(
    df: DataFrame,
    text: str = "text",
    num_hashes: int = NUM_HASHES,
    out: str = "minhash",
) -> DataFrame:
    """K-element MinHash signature per document (array<bigint>).

    Documents too short to shingle are pruned BEFORE any hash compute with
    a cheap predicate on the raw text.  Filtering on ``size(sh) > 0``
    *after* would be catastrophic: predicate pushdown substitutes the full
    shingle expression (token-hash array inlined at every element access)
    into the filter condition, re-evaluating the md5 transform per element
    — O(tokens²) per row (measured 40× slowdown at sf0.1).
    """
    # per-k expressions from the ONE shared permutation definition
    # (functions/hashing.py emits both engines' forms — inlining the
    # formula here is how Spark/DuckDB minhash parity would drift)
    mins = ", ".join(
        f"array_min(transform(sh, s -> {minhash_perm_expr('s', k)}))"
        for k in range(num_hashes)
    )
    sig = f"array({mins})"
    pre = df.filter(F.size(F.split(F.col(text), " ")) >= 3)
    return with_shingles(pre, text).withColumn(out, F.expr(sig))


def lsh_bands(df: DataFrame, sig_col: str = "minhash") -> DataFrame:
    """Explode the signature into slim (doc_id, band, band_sig) key rows.

    Deliberately does NOT carry the shingle array: the band self-join
    should shuffle ~40-byte key rows, not text-sized shingle payloads.
    """
    bands = (
        f"transform(sequence(0, {NUM_BANDS - 1}), b -> "
        f"struct(b AS band, array_join(transform("
        f"slice({sig_col}, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}), "
        f"x -> CAST(x AS STRING)), '_') AS band_sig))"
    )
    return df.select(
        "doc_id", F.explode(F.expr(bands)).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_sig")


def candidate_pairs(banded: DataFrame) -> DataFrame:
    """Doc-id pairs sharing any (band, band_sig) key — the LSH candidates.

    merge (sort-merge) pinned: both sides are corpus-sized band-key
    relations.  Without a hint AQE's runtime size estimate can pick a
    broadcast join (corpus-scaled broadcast = the plan that dies first
    at scale), and shuffle_hash builds a per-partition in-memory map
    that cannot spill — the starved-JVM probe showed both OOM at 30×
    density while the sort-merge plan spills and completes.
    """
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        a.hint("merge")
        .join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def near_duplicates(
    df: DataFrame | None = None,
    text: str = "text",
    threshold: float = 0.5,
    persist: bool = True,
    sig: DataFrame | None = None,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard ≥ threshold).  Jaccard is an int/int
    ratio over distinct shingle sets — engine-exact.

    The signature frame is the **signature store**: persisted once
    (MEMORY_AND_DISK) and consumed three times — band generation plus both
    sides of the verify join.  Without it the whole text-scan + md5 +
    shingle pipeline runs once per consumer (measured 4 full scans in the
    unpersisted plan); at 100 TB signatures are ~1% of corpus size, so
    this trades a tiny cache for 3 redundant scans of the corpus.

    Cache lifecycle: pass ``caches`` (a ``caching.CacheBag``) to own the
    signature cache's release — the caller unpersists after materializing
    the pairs.  Without a bag the cache has session lifetime (LRU-bounded).
    Alternatively pass a precomputed ``sig`` frame — (doc_id, sh, minhash),
    e.g. a slice of one shared ``minhash_signature`` pass or a
    ``read_signature_store`` frame — and no cache is created here at all
    (the caller owns the signature relation's lifetime).
    """
    if sig is None:
        if df is None:
            raise ValueError("near_duplicates needs df or a precomputed sig")
        sig = minhash_signature(df, text).select("doc_id", "sh", "minhash")
        if persist:
            sig = _persist(sig, caches)
    pairs = candidate_pairs(lsh_bands(sig))
    sh_a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # verify joins pinned merge: `pairs` scales with candidates and the
    # sh_* sides (shingle arrays) with the corpus — neither may be
    # broadcast, and a shuffled-hash build map of shingle arrays is the
    # first thing to OOM under memory pressure; SMJ spills instead
    return (
        pairs.hint("merge")
        .join(sh_a, "doc_a")
        .hint("merge")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _persist(df: DataFrame, caches) -> DataFrame:
    """Persist MEMORY_AND_DISK, tracked in ``caches`` when provided.

    With no bag the cache is registered in the module-level
    ``SESSION_BAG`` instead of being raw-persisted: a raw persist has NO
    release path (the CacheManager pins the plan — and any disk blocks —
    until session end), while SESSION_BAG entries are released by every
    harness between queries (``caching.release_session_caches``).  A
    released cache that is still referenced simply recomputes — never
    wrong rows, only a cold re-run.
    """
    from etl_olho_vivo_spark.caching import SESSION_BAG

    return (caches if caches is not None else SESSION_BAG).add(df)


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 15,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, component).

    The component label is the MIN doc_id reachable through the pair
    graph — the canonical "cluster survivor" convention.  Iterative
    hash-min label propagation: each round pushes every node's current
    label across its edges and keeps the minimum (one join + one
    groupBy per round, both hash-shuffles on doc_id); rounds needed =
    graph diameter, and near-dup clusters are shallow (pairs chain
    through shared content), so convergence is typically 2-4 rounds.
    Deterministic: min() over any orderable id type, no seeds.  Works
    for string ids too: the fixpoint is detected by comparing each
    node's new min-label against its old one inside the propagation
    aggregate (an earlier sum()-based check was numeric-only and would
    NULL out — declaring false convergence — on non-numeric ids).
    Raises if the graph hasn't converged after ``max_iter`` rounds
    rather than returning a silently-wrong clustering.

    This is the exact resolution whose cheap approximation is the corpus
    pipeline's edge-greedy drop (plans/corpus.py): greedy keeps a doc
    that is only *transitively* near another survivor, components does
    not.

    Result lifecycle: the labels are materialized eagerly (so the
    iteration caches can be released before returning); the FINAL
    round's persisted frame is handed to ``caches`` (or the session
    bag) directly — it is already materialized by that round's own
    action, so no copy is made — and the caller unpersists
    deterministically after consuming.  An earlier version returned a
    ``localCheckpoint`` instead; its backing RDD cannot be unpersisted
    safely (truncated lineage → data loss on release) and lingers until
    the async ContextCleaner collects the reference, i.e. an unbounded
    soft leak under repeated pipeline runs.  A bag-tracked persist is
    both releasable and recomputable (the full label-propagation plan
    stays attached, so an evicted block re-derives instead of failing).

    Per-round cost (round 16): ONE job.  The fixpoint check rides the
    propagation aggregate itself — the old label is one tagged branch
    of the union the groupBy already consumes, so ``min(comp)`` (the
    new label) and ``min(comp) WHERE old`` (the old label; exactly one
    old row per node) come out of the SAME partial-aggregating shuffle,
    and ``changed`` is a scan-of-cache aggregate over the frame the
    round materializes anyway.  Label-type agnostic (min/< work for
    string ids; a sum()-based checksum would NULL out).  This is NOT
    the round-9 experiment that measured worse: that one attached the
    old label with an extra per-round JOIN, which defeated AQE's
    post-shuffle coalescing — here no join is added, one whole
    comparison job (broadcast + join + limit) is removed per round.
    """
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("comp", F.col("node")).persist()
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    try:
        for _ in range(max_iter):
            msgs = both.join(
                labels, both.src == labels.node
            ).select(
                F.col("dst").alias("node"), "comp",
                F.lit(False).alias("old"),
            )
            stepped = (
                labels.select("node", "comp", F.lit(True).alias("old"))
                .union(msgs)
                .groupBy("node")
                .agg(
                    F.min("comp").alias("comp"),
                    # every node has exactly ONE old row (labels covers
                    # the full node set; msgs only re-mentions nodes),
                    # so min() recovers its value exactly
                    F.min(F.when(F.col("old"), F.col("comp"))).alias(
                        "__old_comp__"
                    ),
                )
            )
            new_labels = stepped.select(
                "node", "comp",
                # min-labels are monotone ↓: moved ⇔ strictly smaller
                (F.col("comp") < F.col("__old_comp__")).alias("__chg__"),
            ).persist()
            # ONE action: the full-scan aggregate materializes the
            # round's cache AND returns the fixpoint flag (None on an
            # empty graph = trivially converged)
            changed = bool(
                new_labels.agg(F.max("__chg__")).collect()[0][0]
            )
            if not changed:  # fixpoint
                # hand the final round's frame (already materialized by
                # the action above) to the bag — no second persist+copy;
                # ``labels`` still names the PREVIOUS round's frame, so
                # the finally block below releases exactly the
                # iteration caches and never this result
                return _persist(new_labels, caches).select(
                    F.col("node").alias("doc_id"),
                    F.col("comp").alias("component"),
                )
            labels.unpersist()
            labels = new_labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter — raise it)"
        )
    finally:
        labels.unpersist()
        both.unpersist()


def keep_best_per_component(
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    a: str = "doc_a",
    b: str = "doc_b",
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Cluster-representative selection over near-dup pairs — the
    SemDeDup/FineWeb resolution step: group the pair graph into
    connected components, keep exactly ONE document per component (the
    highest-``quality_col``, ties to the smallest id), mark the rest as
    duplicates to drop.

    Returns (id_col, component, quality_col, kept) for every node of
    the pair graph.  Docs with no near-dup pair are not emitted — they
    are trivially kept and a caller filters them through unchanged
    (left-anti join on this result's ``kept = false`` rows).  Ids must
    be numeric (the smallest-id tiebreak rides the ``-id`` component of
    one max(struct) aggregate); string-keyed corpora map ids through a
    dense numeric surrogate first, which they need for the MinHash
    band join anyway.

    Scale shape: components come from the iterative hash-min
    propagation of :func:`connected_components` (diameter-bounded
    rounds, all exchanges on the doc id); the per-component argmax is a
    ``groupBy(component).agg(max(struct(quality, -id)))`` — a partial
    (map-side-combining) aggregate that a window over ``component``
    would NOT be: one viral boilerplate cluster with 10^7 members would
    serialize a window's rank into a single task, while max(struct)
    reduces it tree-wise.  The kept-id join-back is on ``component``
    (cardinality = number of clusters, hot only if one cluster
    dominates — which AQE skew-split handles since the probe side
    carries slim rows).

    The greedy edge-drop in plans/corpus.py is the cheap approximation
    of this operator; this one is exact and quality-aware.
    """
    # the pair relation is consumed twice inside connected_components
    # (node extraction + the symmetric edge frame) — persist it so an
    # expensive pair pipeline (MinHash verify joins) runs once
    pairs = _persist(pairs.select(a, b), caches)
    comps = connected_components(pairs, a=a, b=b, caches=caches)
    # labeled feeds BOTH the per-component argmax and the final kept
    # join — persisted, or each side re-runs the comps-quality join
    # (measured: the unpersisted final join alone cost 6 s at sf0.1)
    labeled = _persist(
        comps.join(quality.select(id_col, quality_col), id_col), caches
    )
    best = (
        labeled.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col(quality_col).alias("q"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("m")
        )
        .select("component", (-F.col("m.nid")).alias("kept_id"))
    )
    return labeled.join(best, "component").select(
        id_col,
        "component",
        quality_col,
        (F.col(id_col) == F.col("kept_id")).alias("kept"),
    )


def write_signature_store(
    df: DataFrame | None = None,
    path: str = "",
    text: str = "text",
    n_buckets: int = 32,
    sig: DataFrame | None = None,
) -> None:
    """Persist the MinHash signature store as parquet, bucketed by doc_id.

    The 100 TB dedup story is incremental: a new crawl batch must dedup
    against the existing corpus WITHOUT rescanning or re-hashing it.
    Signatures are ~1% of corpus size; materializing them once turns
    every later batch's dedup into (batch-signature compute) + (band join
    against the store).  ``doc_id``-bucketing keeps the verify join's
    store side pre-shuffled on disk.

    Pass ``sig`` (doc_id, sh, minhash) to write precomputed signatures —
    the compaction path (``compact_signature_store``) uses this so the
    corpus text is never re-hashed.
    """
    if not path:
        raise ValueError(
            "write_signature_store requires an explicit path (an empty "
            "path would land the table silently in the warehouse dir)"
        )
    if sig is None:
        if df is None:
            raise ValueError("write_signature_store needs df or sig")
        sig = minhash_signature(df, text).select("doc_id", "sh", "minhash")
    else:
        sig = sig.select("doc_id", "sh", "minhash")
    (
        sig.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .option("path", path)
        .saveAsTable(_store_table(path))
    )


def compact_signature_store(
    spark, append_dir: str, path: str, n_buckets: int = 32
) -> int:
    """Compact a batch-partitioned append store (the streaming ingestion
    loop's ``store_dir``) into the doc_id-bucketed layout.

    The append store accumulates one small parquet partition per
    micro-batch — correct, but the verify join must shuffle it every
    batch.  Compaction is ONE signature-sized job (never touches corpus
    text): read the accumulated signatures, write them back bucketed and
    sorted so the store side of every later join is pre-shuffled on
    disk.  Returns the number of signatures compacted.  The
    log-structured lifecycle: append per batch, compact on schedule.
    """
    sig = spark.read.parquet(append_dir).select("doc_id", "sh", "minhash")
    write_signature_store(sig=sig, path=path, n_buckets=n_buckets)
    return read_signature_store(spark, path).count()


def _store_table(path: str) -> str:
    # content-derived, session-stable name (Python's hash() is seed-random)
    import hashlib

    return "sigstore_" + hashlib.md5(path.encode()).hexdigest()[:12]


def read_signature_store(spark, path: str) -> DataFrame:
    """Read a signature store written by ``write_signature_store``."""
    return spark.table(_store_table(path))


def incremental_near_duplicates(
    new_docs: DataFrame | None = None,
    store: DataFrame | None = None,
    text: str = "text",
    threshold: float = 0.5,
    persist: bool = True,
    new_sig: DataFrame | None = None,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and an existing signature store.

    Only the new batch is tokenized/hashed; the store contributes its
    precomputed (doc_id, sh, minhash) rows.  Candidate generation is the
    banded join of new-batch band keys against store band keys — cost
    scales with the batch, not the corpus.  Returns
    (doc_new, doc_old, jaccard ≥ threshold); resolve drops on the caller's
    policy (typically: drop doc_new, the corpus row wins).

    Cache lifecycle mirrors ``near_duplicates``: the batch-signature frame
    feeds two consumers (band keys + verify side), so it is persisted;
    pass ``caches`` to own its release, or a precomputed ``new_sig``
    (doc_id, sh, minhash) to skip both the signature compute and the
    cache entirely.
    """
    if store is None:
        raise ValueError("incremental_near_duplicates needs a store frame")
    if new_sig is None:
        if new_docs is None:
            raise ValueError(
                "incremental_near_duplicates needs new_docs or new_sig"
            )
        new_sig = minhash_signature(new_docs, text).select(
            "doc_id", "sh", "minhash"
        )
        if persist:
            new_sig = _persist(new_sig, caches)
    new_bands = lsh_bands(new_sig).withColumnRenamed("doc_id", "doc_new")
    old_bands = lsh_bands(store).withColumnRenamed("doc_id", "doc_old")
    # deliberately UNHINTED — the one pair join whose sides are
    # asymmetric: old_bands is CORPUS-sized but new_bands scales with
    # the micro-batch.  A merge pin here would shuffle+sort the whole
    # store on EVERY batch (cost ∝ corpus — the exact contract this
    # function exists to avoid); letting AQE decide keeps cost ∝ batch:
    # its broadcast picks use ACTUAL runtime bytes against the
    # threshold (bounded by construction, unlike estimate-based static
    # broadcasts), so a normal batch broadcasts its slim band keys and
    # the store is only scanned, while a degenerate corpus-sized
    # catch-up batch falls back to a spillable sort-merge join.
    pairs = (
        new_bands.join(old_bands, ["band", "band_sig"])
        # identity guard: doc ids are globally unique, so doc_new ==
        # doc_old can only mean the store holds the batch's OWN earlier
        # write (at-least-once replay — possibly already folded into a
        # compacted base partition, where partition-level exclusion
        # cannot see it).  Without this a replayed doc self-matches at
        # jaccard 1.0 and deletes itself from the corpus.
        .filter(F.col("doc_new") != F.col("doc_old"))
        .select("doc_new", "doc_old")
        .dropDuplicates(["doc_new", "doc_old"])
    )
    sh_new = new_sig.select(
        F.col("doc_id").alias("doc_new"), F.col("sh").alias("sh_a")
    )
    sh_old = store.select(
        F.col("doc_id").alias("doc_old"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        # unhinted for the same reason as the band join above: pairs and
        # sh_new are batch/candidate-scaled, sh_old is corpus-scaled —
        # AQE's byte-bounded broadcast of the small sides keeps the
        # store un-shuffled on the normal path
        pairs.join(sh_new, "doc_new")
        .join(sh_old, "doc_old")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_old", "jaccard")
    )


def simhash_near_dups(
    df: DataFrame,
    text: str = "text",
    max_hamming: int = 3,
    bits: int = SIMHASH_NEAR_DUP_BITS,
    n_bands: int = 4,
    caches: "CacheBag | None" = None,
) -> DataFrame:
    """Doc pairs with Hamming(simhash_a, simhash_b) ≤ ``max_hamming``.

    Blocking is the pigeonhole construction (Manku et al., WWW'07 —
    "Detecting Near-Duplicates for Web Crawling"): split the b-bit hash
    into ``n_bands`` contiguous segments; any pair within Hamming
    ≤ n_bands − 1 must agree exactly on at least one segment, so
    candidates come from equi-joins on (band, segment) keys — never a
    cross product.  Verification is exact:
    ``bit_count(a XOR b) ≤ max_hamming``.

    Scale note — segment width is the capacity dial: random (non-near)
    docs collide in a band with probability 2^-(bits/n_bands), so
    candidate volume is ~n²·n_bands/2^(bits/n_bands); keep
    ``bits/n_bands ≳ log2(n)`` (the default 32/4 = 8-bit segments are
    fine to ~10⁴ docs; web scale wants a 64-bit simhash — this engine's
    token hashes are 32-bit, so 32 is the honest ceiling here, Manku's
    64-bit variant needs a wider base hash).

    ``max_hamming`` must be < ``n_bands`` or the pigeonhole guarantee
    breaks (a qualifying pair could differ in every segment) — rejected
    loudly rather than silently losing recall.
    """
    # persisted for the same reason as the media pairings: the pairing
    # lineage consumes the fingerprint frame four times, and the
    # simhash expression re-tokenizes + re-hashes the full corpus text
    # on every consumer without the cache
    sims = _persist(
        simhash(df, text, bits).select("doc_id", "simhash"), caches
    )
    return hamming_near_dups(
        sims,
        hash_col="simhash",
        bits=bits,
        max_hamming=max_hamming,
        n_bands=n_bands,
    )


def _hamming_validate(bits: int, max_hamming: int, n_bands: int) -> None:
    """Shared parameter contract for the pigeonhole pairings — also
    called at stream start-up so a bad config fails before the first
    micro-batch."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(got {n_bands}): with fewer bands a qualifying pair can "
            "differ in every segment and would be missed"
        )
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    if bits % n_bands:
        raise ValueError(f"bits={bits} not divisible by n_bands={n_bands}")


def _hamming_band_keys(sims: DataFrame, bits: int, n_bands: int) -> DataFrame:
    """(doc_id, __h__, band, seg) keys for a (doc_id, __h__) frame.
    Segment extraction uses ``shiftrightunsigned`` so full-width 64-bit
    hashes (stored as SIGNED longs, possibly negative) band correctly.

    The full hash rides along (round 15): the verify payload is ONE
    64-bit value, so carrying it through the band join costs 8 bytes
    per key row and removes the two merge join-backs (plus their
    sorts/exchanges) that used to re-attach hashes to candidate pairs
    — the §8 "shuffle a few bytes of metadata" trade, measured as the
    dominant cost of the pairing stage."""
    w = bits // n_bands
    # full-width segment (n_bands=1, bits=64): the mask 2^64-1 does not
    # fit a BIGINT literal (Spark parses it as DECIMAL and `&` rejects
    # it) — but as a SIGNED 64-bit value all-ones IS -1, and x & -1 = x
    mask = (2 ** w - 1) if w < 64 else -1
    seg = (
        f"transform(sequence(0, {n_bands - 1}), b -> "
        f"struct(b AS band, shiftrightunsigned(__h__, b * {w}) "
        f"& {mask} AS seg))"
    )
    return sims.select(
        "doc_id", "__h__", F.explode(F.expr(seg)).alias("bk")
    ).select("doc_id", "__h__", "bk.band", "bk.seg")


def hamming_near_dups(
    hashes: DataFrame,
    *,
    hash_col: str,
    bits: int,
    max_hamming: int,
    n_bands: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Generic pigeonhole Hamming pairing over ANY b-bit integer hash
    column (SimHash for text, dHash for images, the audio spectral
    fingerprint): split the hash into ``n_bands`` contiguous segments,
    equi-join on (band, segment) — any pair within Hamming ≤
    n_bands − 1 agrees on at least one segment — then verify exactly
    with ``bit_count(a XOR b)``.  Returns (doc_a, doc_b, hamming).

    Plan shape (round 15): the band keys CARRY the 64-bit hash, so the
    band join's output is verifiable in place — bit_count is one codegen
    instruction — and the pair de-dup (a pair agreeing on k segments
    emerges k times) runs AFTER the Hamming filter, over the verified
    pairs (a subset of the candidates), instead of before two hash
    join-backs.  vs the round-14 shape this removes two sort-merge
    joins and their exchanges (7 exchanges → 3 for the simhash row)
    and shrinks the de-dup exchange from candidate volume to verified
    volume, for +8 bytes per band-key row."""
    _hamming_validate(bits, max_hamming, n_bands)
    sims = hashes.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("__h__")
    )
    banded = _hamming_band_keys(sims, bits, n_bands)
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("__h__").alias("ha"),
        "band", "seg",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("__h__").alias("hb"),
        "band", "seg",
    )
    hamming = F.bit_count(F.expr("ha ^ hb"))
    return (
        a.hint("merge")
        .join(b, ["band", "seg"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def hamming_near_dups_incremental(
    new_hashes: DataFrame,
    store: DataFrame,
    *,
    hash_col: str,
    bits: int,
    max_hamming: int,
    n_bands: int,
    id_col: str = "doc_id",
    dedup_pairs: bool = True,
) -> DataFrame:
    """Hamming near-dup pairs between a NEW batch of fingerprints and a
    persisted fingerprint store — the pigeonhole sibling of
    ``incremental_near_duplicates``.  Both frames carry (id_col,
    hash_col); only slim 64-bit rows are involved (the caller already
    paid the decode).  Returns (doc_new, doc_old, hamming ≤
    max_hamming); resolve drops on the caller's policy (typically:
    drop doc_new — the stored row was admitted first).

    Scale shape: the band join is deliberately UNHINTED for the same
    reason as the MinHash incremental pairing — the store side is
    CORPUS-sized but the batch side scales with the micro-batch, so
    AQE's byte-bounded runtime broadcast of the batch band keys keeps
    cost ∝ batch, while a degenerate corpus-sized catch-up batch falls
    back to a spillable sort-merge join.  The ``doc_new != doc_old``
    identity guard keeps an at-least-once replay (own earlier write
    already folded into a compacted store base) from matching itself.

    ``dedup_pairs=False`` (round 14) skips the (doc_new, doc_old)
    dropDuplicates — a whole extra exchange+aggregate — when the
    CALLER already de-duplicates downstream at its own granularity: a
    pair agreeing on k bands emerges k times, each copy verifies to
    the same hamming, and ``media_containment_pairs``'s rollup
    collapses them at the (probe doc, probe frame, index doc) triple
    anyway.  Admit loops keep the default: their consumers treat each
    pair row as one near-dup fact.

    Plan shape (round 15, same as ``hamming_near_dups``): the band
    keys carry the hash, the band join's output verifies in place, and
    the optional pair de-dup runs over VERIFIED pairs — the two
    join-backs that re-attached hashes to candidates are gone (they
    re-shuffled the corpus-sized store per micro-batch when AQE
    declined the broadcast)."""
    _hamming_validate(bits, max_hamming, n_bands)
    new_sims = new_hashes.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("__h__")
    )
    old_sims = store.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("__h__")
    )
    new_b = _hamming_band_keys(new_sims, bits, n_bands).select(
        F.col("doc_id").alias("doc_new"), F.col("__h__").alias("ha"),
        "band", "seg",
    )
    old_b = _hamming_band_keys(old_sims, bits, n_bands).select(
        F.col("doc_id").alias("doc_old"), F.col("__h__").alias("hb"),
        "band", "seg",
    )
    out = (
        # unhinted: new_b is batch-scaled, old_b corpus-scaled — AQE's
        # byte-bounded runtime broadcast ships the batch band keys,
        # while a degenerate corpus-sized catch-up batch falls back to
        # a spillable sort-merge join
        new_b.join(old_b, ["band", "seg"])
        .filter(F.col("doc_new") != F.col("doc_old"))
        .withColumn("hamming", F.bit_count(F.expr("ha ^ hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_new", "doc_old", "hamming")
    )
    if dedup_pairs:
        out = out.dropDuplicates(["doc_new", "doc_old"])
    return out


def simhash_expr(col: str, bits: int) -> str:
    """SQL expression string: frequency-weighted SimHash over an
    integer-array column (the per-bit sign fold of ``simhash``,
    factored out in round 13 so registry rows can build multi-half
    fingerprints from transformed token-hash streams without
    duplicating the formula)."""
    terms = []
    for j in range(bits):
        w = 2**j
        bit_sum = (
            f"aggregate({col}, 0, (acc, x) -> acc + "
            f"(CASE WHEN (x div {w}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN ({bit_sum}) > 0 THEN {w} ELSE 0 END)")
    return " + ".join(terms)


def simhash(df: DataFrame, text: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Frequency-weighted SimHash over md5-derived token hashes.

    bit_j = sign(Σ_tokens (±1 depending on bit j of h(w))); the token
    multiset (with multiplicity) is used, so repeated words weigh more.

    The token-hash array is materialized once (``with_token_hashes``) so
    the 16 per-bit folds are 16 linear passes over a computed array, not
    16 full re-tokenize+md5 passes.
    """
    return (
        with_token_hashes(df, text)
        .withColumn("simhash", F.expr(simhash_expr("wh", bits)))
        .drop("wh")
    )
