"""Time-grid resampling: irregular per-key series → fixed-step grid.

The transit domain's canonical need (and every sensor/telemetry
pipeline's): bus pings arrive irregularly (reference cadence is "about
every poll", ``get-bus-data.py``), but downstream consumers want one row
per vehicle per minute.  The reference has no analogue — analysts get
raw ping rows.

Plan shape (all linear, no range join):
1. per-key [min, max] bounds — one aggregate;
2. grid points via ``sequence()`` + ``explode`` — one generator, rows
   proportional to the OUTPUT grid, never |L|·|R|;
3. backward as-of join of grid against observations
   (``operators/asof.py`` — union + one keyed window), optional
   ``tolerance`` so a reading older than the gap bound yields NULL
   (a gap, not a stale carry-forward).

Cost: one agg + one window over (grid + observations) — both hash
shuffles on the key.  At 100 TB the grid is bounded by
keys × (span/step), independent of observation burstiness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_olho_vivo_spark.operators.asof import asof_join


def resample(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    step: int,
    value_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """One row per key per ``step`` ticks of ``ts`` (integer units),
    forward-filled from the latest observation at-or-before each tick.

    The grid spans each key's own [min(ts), max(ts)], aligned down to a
    multiple of ``step`` (so grids of different keys share phase and can
    be joined/unioned downstream).  ``tolerance`` bounds staleness:
    ticks whose latest observation is older than ``tolerance`` get NULL
    values — gaps stay visible instead of being bridged silently.
    """
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    keys = list(keys)
    bounds = df.groupBy(*keys).agg(
        F.min(ts).alias("__lo"), F.max(ts).alias("__hi")
    )
    # integer alignment, NOT floor(__lo / step): `/` is double division,
    # and above 2^53 (epoch nanos — which tables.py reads as raw longs)
    # the rounded quotient can land one step off, silently dropping or
    # inventing the key's first grid tick.  pmod keeps the math exact at
    # any int64 magnitude and floor-aligns negatives correctly too.
    aligned = (F.col("__lo") - F.pmod(F.col("__lo"), F.lit(step))).cast(
        df.schema[ts].dataType
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(aligned, F.col("__hi"), F.lit(step))
        ).alias(ts),
    )
    obs = df.select(*keys, ts, *value_cols)
    return asof_join(
        grid,
        obs,
        on=keys,
        ts=ts,
        right_cols=list(value_cols),
        direction="backward",
        tolerance=tolerance,
    )
