"""SQL-surface parity: ONE ANSI string, TWO engines.

The registry pairs DataFrame plans with hand-written oracle SQL; this
module pins a different property — the engine's `spark.sql` entry point
executes dialect-neutral ANSI (correlated scalar subqueries, EXISTS /
NOT EXISTS, IN + HAVING, CTE + window) byte-for-byte identically to
DuckDB when given the *same query text*.  A user of the reference who
brings plain SQL, not DataFrame code, gets the same answers.

Queries avoid float-boundary comparisons (aggregates compared are
counts / maxes / keys — exact in both engines).
"""

from __future__ import annotations

import pytest

from etl_olho_vivo_spark.sources.tables import TABLE_NAMES, read_table

SF = "/root/testdata/sf0.01"

QUERIES = {
    "correlated_scalar": """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE o_totalprice >= (
    SELECT max(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
ORDER BY o_orderkey
""",
    "exists_correlated": """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
    "not_exists_anti": """
SELECT s_suppkey
FROM supplier s
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
)
ORDER BY s_suppkey
""",
    "in_subquery_having": """
SELECT o_custkey, count(*) AS n_orders
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
GROUP BY o_custkey
HAVING count(*) >= 10
ORDER BY o_custkey
""",
    "cte_window": """
WITH ranked AS (
    SELECT o_custkey, o_orderkey,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderkey DESC
           ) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey
FROM ranked WHERE rn = 1
ORDER BY o_custkey
""",
}


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in TABLE_NAMES:
        read_table(spark, SF, t).createOrReplaceTempView(t)
    yield
    for t in TABLE_NAMES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_same_sql_same_answer(spark, name):
    from tests.oracle_check import compare, duck_connection

    sql = QUERIES[name]
    con = duck_connection(SF)
    try:
        problems = compare(spark.sql(sql), con.execute(sql).df())
        assert not problems, problems
    finally:
        con.close()
