"""Scale-focused + SQL-surface-breadth queries (SURVEY §2.11 / §4.2).

These extend the reference surface (which has no joins, no analytic
windows, no sampling — SURVEY §2.3/§2.5) with the operations a 100 TB
training-data pipeline needs, each expressed so the physical plan is the
one you'd want on a 1000-executor cluster:

- analytic window suite: single exchange on the partition key serves
  every window function (rank family reuses the row_number sort);
- deterministic universe sampling: md5-prefix predicate — pushes to the
  scan, reproducible across engines/retries, clusters by key so sampled
  orders keep all their lineitems;
- approximate distinct: HyperLogLog++ sketch (mergeable partial state —
  constant memory per group at any scale) checked against the exact
  count;
- GROUPING SETS: multi-granularity rollup in one pass over the fact;
- salted skew join: hot-key spreading (operators/skew.py);
- epoch-arithmetic datetime surface: session-TZ-free by construction;
- unpivot/melt: wide→long without a shuffle.

Every double that leaves an aggregation is rounded or carried as integer
cents (registry.py determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_olho_vivo_spark.registry import register
from etl_olho_vivo_spark.sources.tables import read_table


@register(
    "window_rank_suite",
    """
SELECT o_custkey, o_orderkey,
       row_number() OVER wu AS rn,
       ntile(4) OVER wu AS quartile,
       lead(o_orderkey) OVER wu AS next_ok,
       first_value(o_orderkey) OVER wu AS top_ok,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
         OVER (wu ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS running_cents,
       rank() OVER wp AS prio_rank,
       dense_rank() OVER wp AS prio_dense,
       round(percent_rank() OVER wp, 6) AS prio_pctrank,
       round(cume_dist() OVER wp, 6) AS prio_cumedist
FROM orders
WINDOW wu AS (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey),
       wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
""",
    doc="Analytic-window breadth (SURVEY §2.5 notes the reference has "
    "none): ranking, ntile, lead, first_value, running sum, rank family. "
    "One hash exchange on o_custkey feeds every function; the rank-family "
    "window orders by a coarse key (values are tie-order-independent), "
    "while row-order-dependent functions use a unique tiebreak. Running "
    "sum in integer cents with an explicit ROWS frame — exact on both "
    "engines.",
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    wu = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wu_run = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(wu).alias("rn"),
        F.ntile(4).over(wu).alias("quartile"),
        F.lead("o_orderkey").over(wu).alias("next_ok"),
        F.first("o_orderkey").over(wu).alias("top_ok"),
        F.sum(cents).over(wu_run).alias("running_cents"),
        F.rank().over(wp).alias("prio_rank"),
        F.dense_rank().over(wp).alias("prio_dense"),
        F.round(F.percent_rank().over(wp), 6).alias("prio_pctrank"),
        F.round(F.cume_dist().over(wp), 6).alias("prio_cumedist"),
    )


@register(
    "approx_distinct_users",
    """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_within_10pct
FROM events GROUP BY event_type
""",
    doc="HyperLogLog++ approximate distinct (rsd=0.02) checked against "
    "the exact count: emits the exact value plus a boolean asserting the "
    "sketch landed within 10%% (5 sigma at rsd 0.02 — deterministically "
    "true).  At 100 TB the sketch is the only viable plan: constant "
    "memory per group, mergeable partial state, no distinct-expand "
    "shuffle of raw user_ids.  driver=False since round 9 (rotation "
    "policy category 3: the row's value is mostly plan-shape, pinned in "
    "tests/test_plans.py, and the exact-count value semantics stay "
    "driver-covered by distinct_suppliers_per_part); local parity via "
    "tests/test_oracle_parity.py.",
    driver=False,
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("__approx") - F.col("n_users_exact"))
                <= 0.10 * F.col("n_users_exact")
            ).alias("approx_within_10pct"),
        )
    )


@register(
    "salted_skew_join_events",
    """
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS type_len FROM events
)
SELECT e.event_type, d.type_len,
       count(*) AS n,
       CAST(sum(CAST(round(e.value * 10000, 0) AS BIGINT)) AS BIGINT)
         AS value_e4
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type, d.type_len
""",
    doc="Salted shuffle join (operators/skew.py:salted_join) on the "
    "maximally-skewed events.event_type (5 hot keys): the fact side gets "
    "a deterministic hash-salt, the dim side is exploded over all salts, "
    "so each hot key spreads across 16 reducers instead of hot-spotting "
    "one.  Oracle is the plain join — the rewrite is exact.",
)
def q_salted_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_olho_vivo_spark.operators.skew import salted_join

    e = read_table(spark, sf_dir, "events")
    dim = e.select("event_type").distinct().withColumn(
        "type_len", F.length("event_type")
    )
    joined = salted_join(
        e, dim, on=["event_type"], n_salts=16, salt_source="event_id"
    )
    v_e4 = F.round(F.col("value") * 10000, 0).cast("long")
    return joined.groupBy("event_type", "type_len").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v_e4).alias("value_e4"),
    )


@register(
    "datetime_function_surface",
    """
SELECT event_id,
       epoch_ms(ts) // 1000 AS epoch_s,
       (epoch_ms(ts) // 1000) // 86400 AS epoch_day,
       ((epoch_ms(ts) // 1000) % 86400) // 3600 AS hour_utc,
       (((epoch_ms(ts) // 1000) % 86400) % 3600) // 60 AS minute_utc,
       ((epoch_ms(ts) // 1000) // 86400 + 4) % 7 AS dow,
       CAST(DATE '1970-01-01'
            + CAST((epoch_ms(ts) // 1000) // 86400 AS INT) AS VARCHAR)
         AS date_utc,
       year(DATE '1970-01-01'
            + CAST((epoch_ms(ts) // 1000) // 86400 AS INT)) AS y,
       month(DATE '1970-01-01'
            + CAST((epoch_ms(ts) // 1000) // 86400 AS INT)) AS m
FROM events
""",
    doc="Datetime surface via pure epoch arithmetic (SURVEY §2.8 F1/F6 "
    "generalized): second/day/hour/minute extraction, day-of-week "
    "(1970-01-01 = Thursday = 4), ISO date, year/month — all session-"
    "timezone-free by construction, so results are identical no matter "
    "what TZ the host session runs (the reference's latent TZ bug, "
    "SURVEY §4.3.5, engineered out).",
)
def q_datetime_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    epoch_s = (F.unix_millis(F.col("ts")) / 1000).cast("long")
    epoch_day = (epoch_s / 86400).cast("long")
    date_utc = F.date_add(
        F.lit("1970-01-01").cast("date"), epoch_day.cast("int")
    )
    return e.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        epoch_day.alias("epoch_day"),
        ((epoch_s % 86400) / 3600).cast("long").alias("hour_utc"),
        (((epoch_s % 86400) % 3600) / 60).cast("long").alias("minute_utc"),
        ((epoch_day + 4) % 7).alias("dow"),
        date_utc.cast("string").alias("date_utc"),
        F.year(date_utc).alias("y"),
        F.month(date_utc).alias("m"),
    )


@register(
    "unpivot_part_measures",
    """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
FROM part
""",
    doc="Unpivot/melt (wide→long) via stack(): narrow-row shape for "
    "per-measure pipelines, produced in the scan projection with no "
    "shuffle and no second pass over the fact.  Inverse of the pivot "
    "query (order_priority_pivot).  driver=False since round 9 "
    "(rotation policy category 2: parameter variant of a driver row — "
    "the pivot/unpivot pair keeps order_priority_pivot in the window); "
    "local parity via tests/test_oracle_parity.py.",
    driver=False,
)
def q_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'p_size', CAST(p_size AS DOUBLE), "
            "'p_retailprice', p_retailprice) AS (measure, value)"
        ),
    )
