"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, find the most recent right row with the same key and
``right.ts <= left.ts`` (inclusive).  The classic use is enriching a fact
stream with the latest state of a slowly-changing source (quotes→trades,
sensor-last-reading, campaign-state at click time).

Scale design (SURVEY §2.11 pattern): implemented as **union + one keyed
window**, NOT a range join —

- a range-predicate join (``l.ts >= r.ts``) explodes to O(|L|·|R|) per
  key before picking the max; the union form is O(|L|+|R|) rows through
  ONE hash shuffle on the key, then a linear sorted scan per partition;
- ordering ``(ts, is_left, tiebreak)`` puts right rows before left rows
  on equal timestamps, which yields exactly the inclusive as-of
  semantics of DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle
  used to certify this operator);
- ``last(<right-row struct>, ignorenulls=True)`` with an UNBOUNDED
  PRECEDING frame is the running "latest right ROW seen so far" (one
  struct, row-atomic — value columns never mix across right rows) —
  whole-stage-codegen window aggregation, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Enrich ``left`` with ``right_cols`` from the as-of right row.

    ``direction="backward"`` (default) takes the latest right row with
    ``right.ts <= left.ts``; ``"forward"`` takes the earliest right row
    with ``right.ts >= left.ts`` — both inclusive, both the union+window
    plan (never a range join).  ``tolerance`` bounds the staleness: a
    match farther than ``tolerance`` in ``ts`` units is nulled out, the
    pandas ``merge_asof`` semantics.  ``left`` and ``right`` must both
    carry the key column(s) ``on`` and the (numeric or timestamp) ``ts``
    column; ``right_cols`` appear NULL where no qualifying right row
    exists.  ``tiebreak`` orders right rows sharing (key, ts); backward
    takes the last such row, forward the first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        # withColumn would silently REPLACE the left column (and null it
        # on unmatched rows) — pandas merge_asof suffixes; we fail loud
        raise ValueError(
            f"right_cols {clash} already exist on the left side; alias "
            "them on one side first"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lhs = left.withColumn("__is_l", F.lit(1))
    for c in right_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rhs_cols = list(right_cols)
    extra_tiebreak = (
        tiebreak is not None
        and tiebreak not in rhs_cols
        and tiebreak not in keys
        and tiebreak != ts
    )
    if extra_tiebreak:
        rhs_cols.append(tiebreak)
    # a right row with NULL ts has no place on the time axis: NULLS
    # FIRST ordering would otherwise rank it "older than everything" and
    # let it match (with an unknowable staleness) whenever tolerance is
    # unset — drop such rows up front, consistently for both directions
    rhs = right.filter(F.col(ts).isNotNull()).select(
        *keys, ts, *rhs_cols, F.lit(0).alias("__is_l")
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)
    # The matched right row travels as ONE struct (row-atomic, like a real
    # as-of join): picking each value column independently with
    # ignorenulls would let a value from an OLDER right row pair with the
    # newest row's timestamp — wrong staleness under `tolerance`, and
    # per-column forward-fill rather than as-of semantics.
    u = u.withColumn(
        "__r",
        F.when(
            F.col("__is_l") == 0,
            F.struct(
                F.col(ts).alias("__r_ts"),
                *[F.col(c) for c in right_cols],
            ),
        ),
    )

    if direction == "backward":
        # right rows sort BEFORE left on equal ts → inclusive match;
        # running last(ignorenulls) = latest right row seen so far
        order = [F.col(ts), F.col("__is_l")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__r", ignorenulls=True)
    else:
        # left rows sort BEFORE right on equal ts → inclusive match;
        # first(ignorenulls) over the following frame = earliest right row
        order = [F.col(ts), F.col("__is_l").desc()]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__r", ignorenulls=True)
    if tiebreak is not None:
        # ascending for BOTH directions: backward's last() takes the
        # greatest tiebreak, forward's first() the smallest
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)
    u = u.withColumn("__r", pick.over(w))
    out = u.filter(F.col("__is_l") == 1).drop("__is_l")
    keep = F.col("__r").isNotNull()
    if tolerance is not None:
        # TimestampType subtraction yields an interval (not comparable to
        # an int), so timestamps go through a TZ-free epoch-seconds cast;
        # numeric ts keeps EXACT native subtraction — a double cast would
        # round 64-bit values above 2^53 (e.g. epoch nanos) and misjudge
        # gaps near the tolerance bound.
        is_ts = left.schema[ts].dataType.typeName().startswith("timestamp")
        ts_v = F.col(ts).cast("double") if is_ts else F.col(ts)
        r_ts_v = (
            F.col("__r.__r_ts").cast("double")
            if is_ts
            else F.col("__r.__r_ts")
        )
        gap = ts_v - r_ts_v if direction == "backward" else r_ts_v - ts_v
        keep = keep & (gap <= tolerance)
    for c in right_cols:
        out = out.withColumn(c, F.when(keep, F.col(f"__r.{c}")))
    out = out.drop("__r")
    if extra_tiebreak and tiebreak not in left.columns:
        out = out.drop(tiebreak)
    return out
