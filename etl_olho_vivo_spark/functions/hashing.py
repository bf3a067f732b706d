"""Cross-engine deterministic hashing for dedup/fingerprint operators.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different functions,
so sketch operators built on them could never be oracle-checked.  Instead
every hash here derives from **md5** (identical hex output in both engines)
reduced to an integer with explicit base-16 arithmetic that both engines
evaluate exactly:

    h(s) = int(md5(s)[0:8], 16)          ∈ [0, 2^32)

All downstream mixing (shingles, MinHash permutations, SimHash bits) is
64-bit-safe integer arithmetic (documented bounds), bit-identical in Spark
and DuckDB.  Helpers emit BOTH the Spark SQL expression and the DuckDB SQL
expression from one definition so the two can't drift.
"""

from __future__ import annotations

# Large prime > 2^32 used as the MinHash/shingle modulus.
P = 4294967311
# Mixing multiplier for shingle composition (small enough that
# (P-1)*MIX + 2^32 < 2^63 — no 64-bit overflow).
MIX = 1000003


def spark_hex2int(hexpr: str) -> str:
    """Spark SQL: first-8-hex-chars → BIGINT via conv()."""
    return f"CAST(conv(substring({hexpr}, 1, 8), 16, 10) AS BIGINT)"


def duck_hex2int(hexpr: str) -> str:
    """DuckDB SQL: same value via positional base-16 expansion (no conv())."""
    terms = []
    for i in range(8):
        weight = 16 ** (7 - i)
        terms.append(
            f"(strpos('0123456789abcdef', substring({hexpr}, {i + 1}, 1)) - 1)"
            f" * {weight}"
        )
    return "(" + " + ".join(terms) + ")"


def seeded_key_expr(col: str, seed: int | str) -> str:
    """Spark SQL for the seeded 32-bit row key shared by the
    shuffle/split/cap/mix operators: ``int(md5(CAST(col AS STRING) ‖
    ':' ‖ seed)[0:8], 16)``.

    One definition on purpose: global_shuffle (io/export.py),
    split_column and cap_per_group (operators/split.py), and
    sample_mixture (operators/mix.py) all guarantee "same key + same
    seed ⇒ same placement", and that contract only holds while they
    hash byte-identically.

    Domain separation: an operator whose behavior depends on the key's
    MAGNITUDE must use a unique salt (``"mix-"``, ``"cap-"``,
    ``"shuffle-"`` — Bernoulli thresholds, keep-lowest-N ranks, and the
    shuffle's within-shard ORDER all qualify): two magnitude-sensitive
    operators on the raw shared seed produce perfectly correlated
    selections/orderings.  Purely modulo-based rules (split bands) are
    insensitive to a magnitude restriction and use the raw seed.
    """
    return spark_hex2int(f"md5(concat(CAST({col} AS STRING), ':', '{seed}'))")


def spark_token_hash(wexpr: str) -> str:
    return spark_hex2int(f"md5({wexpr})")


def duck_token_hash(wexpr: str) -> str:
    return duck_hex2int(f"md5({wexpr})")


def shingle3_expr(h1: str, h2: str, h3: str) -> str:
    """Word-3-gram hash from three token hashes (same string for both
    engines — pure ``* + %`` arithmetic).

    Bounds: h < 2^32; h*MIX + h < 4.3e15 < 2^63; after % P the second round
    has the same bound.
    """
    return f"((({h1}) * {MIX} + ({h2})) % {P} * {MIX} + ({h3})) % {P}"


def ngram_hash_expr(token_hashes: list[str]) -> str:
    """Rolling word-n-gram hash from n token-hash expressions (same string
    for both engines — pure ``* + %`` arithmetic, left fold).

    ``shingle3_expr`` is the unrolled n=3 special case and stays separate
    because its exact string is load-bearing for the existing oracles.
    Bounds hold at every fold step: after ``% P`` the accumulator < P,
    and (P-1)·MIX + 2^32 < 2^63 — no 64-bit overflow at any n.
    """
    if not token_hashes:
        raise ValueError("ngram_hash_expr needs at least one token hash")
    acc = f"({token_hashes[0]})"
    for h in token_hashes[1:]:
        acc = f"(({acc}) * {MIX} + ({h})) % {P}"
    return acc


def minhash_perm_expr(sh: str, k: int) -> str:
    """k-th MinHash permutation of a shingle hash: (a_k·s + b_k) mod P.

    a_k odd keeps the map injective mod 2^32-ish; bounds: a_k ≤ 2K+1 small,
    product ≤ ~1e12 — no overflow.
    """
    a_k = 2 * k + 1
    b_k = 12345 * k + 1
    return f"(({sh}) * {a_k} + {b_k}) % {P}"
