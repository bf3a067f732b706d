"""Single-pass table profiling — the data-quality dashboard primitive.

One aggregation job computes, for every column: row count, null count,
approximate distinct count (HyperLogLog++ — order-independent mergeable
sketch, the only viable distinct at 100 TB), and min/max rendered as
strings.  The whole profile is ONE scan and ONE reduce regardless of
column count; at scale this is the difference between a profiling pass
you run on every ingest and one you can't afford.

The reference has no profiling; pandas ``describe()`` on a sampled day
is the closest analogue (and is neither distributed nor mergeable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per-column profile of ``df`` as a (column, metric...) frame.

    Output columns: ``column``, ``n_rows``, ``n_nulls``,
    ``approx_distinct``, ``min_str``, ``max_str``.  Complex-typed
    columns (arrays/structs/maps/binary) get null min/max (no total
    order) but keep null/distinct accounting via their string form.
    """
    simple = {"string", "boolean", "int", "bigint", "smallint", "tinyint",
              "float", "double", "decimal", "date", "timestamp",
              "timestamp_ntz"}
    # case-INSENSITIVE duplicate check: Spark resolution is
    # case-insensitive by default, so ('k', 'K') would pass a plain set
    # test and then die with an opaque AMBIGUOUS_REFERENCE mid-plan
    folded = [c.lower() for c in df.columns]
    if len(set(folded)) != len(folded):
        dupes = sorted(
            {c for c in df.columns if folded.count(c.lower()) > 1}
        )
        raise ValueError(
            f"duplicate column name(s) {dupes} (case-insensitive): alias "
            "them before profiling (references would be ambiguous)"
        )
    dtypes = dict(df.dtypes)  # built once; names are unique (checked)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        dtype = dtypes[c].split("(")[0]
        # backticked reference: a dot in the name must not parse as a
        # struct-field access (df[c] and bare F.col both would)
        col = F.col("`" + c.replace("`", "``") + "`")
        probe = col if dtype in simple else col.cast("string")
        aggs += [
            # coalesce: sum() over ZERO rows is NULL, and an empty
            # ingest must profile as n_nulls=0, not NULL (quality checks
            # compare and divide these)
            F.coalesce(
                F.sum(col.isNull().cast("long")), F.lit(0)
            ).alias(f"__nulls_{c}"),
            F.approx_count_distinct(probe, rsd=rsd).alias(f"__dist_{c}"),
            (
                F.min(col).cast("string")
                if dtype in simple
                else F.lit(None).cast("string")
            ).alias(f"__min_{c}"),
            (
                F.max(col).cast("string")
                if dtype in simple
                else F.lit(None).cast("string")
            ).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                # backticked + escaped: dots must not read as struct
                # access and backticks in the source name must not break
                # the quoting (same escaping as the source reference)
                F.col(f"`__nulls_{c.replace('`', '``')}`").alias("n_nulls"),
                F.col(f"`__dist_{c.replace('`', '``')}`").alias(
                    "approx_distinct"
                ),
                F.col(f"`__min_{c.replace('`', '``')}`").alias("min_str"),
                F.col(f"`__max_{c.replace('`', '``')}`").alias("max_str"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
