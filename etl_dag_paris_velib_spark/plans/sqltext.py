"""Shared-text SQL specs: the Spark plan and the DuckDB oracle are the
SAME SQL STRING, run verbatim by both engines.

Everywhere else the repo keeps a DataFrame plan adjacent to an equivalent
oracle; here the equivalence is by construction — one string — so the
differential check covers Spark's SQL dialect/analyzer itself: view
resolution, LEFT JOIN with a non-key ON-condition, double grouping, and
correlated-scalar-subquery decorrelation all pass through ``spark.sql``
exactly as DuckDB parses them. This is the "a user of the reference could
paste their SQL at us" guarantee (the reference's consumers query its
postgres mart in plain SQL; SURVEY §2 relational rows).

Determinism notes (the usual cross-engine FP discipline):
- q99 is integer-only (counts of counts) — exact.
- q100's final value is S/700 for an integer cents-sum S, which is never
  on a half-cent rounding boundary (200*S = 700*odd has no integer
  solution), so round(x, 2) agrees across engines despite sum-order ulps.
  The correlated threshold 0.2*avg(quantity) compares against integer
  quantities summed exactly in doubles — identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tpch import register_views
from .spec import Registry

S = Registry()


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register every testdata table as a temp view and run ``sql``
    verbatim. ``spark.sql`` resolves the views at analysis time, so the
    returned plan is bound to ``sf_dir`` even if a later call re-registers
    the views at another scale factor."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


_Q99_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey AS custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@S.add(
    "q99_sql_order_distribution",
    oracle=_Q99_SQL,
    doc="TPC-H Q13 shape (customer distribution by non-urgent order "
    "count) as a SHARED-TEXT spec: Spark executes the identical string "
    "the oracle runs. Exercises LEFT OUTER JOIN with a filtering ON "
    "clause (NULL-extending, not row-dropping — a WHERE would silently "
    "turn it inner) and the two-level aggregate. Plan: join shuffles on "
    "custkey, first agg reuses that partitioning, second agg is a tiny "
    "20-row exchange; at 100 TB orders bucket on o_custkey and the join "
    "is zero-exchange.",
    tags=("sql", "join", "relational", "shared-text"),
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _Q99_SQL)


_Q100_SQL = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""".strip()


@S.add(
    "q100_sql_small_qty_revenue",
    oracle=_Q100_SQL,
    doc="TPC-H Q17 shape (revenue from small-quantity orders of one "
    "brand) as a SHARED-TEXT spec. Exercises Catalyst's correlated-"
    "scalar-subquery decorrelation through the SQL surface: the "
    "per-partkey avg becomes ONE grouped aggregate joined back on "
    "p_partkey — never an inner query per outer row — with the brand "
    "filter pushed to the part scan and broadcast against lineitem. "
    "The q74 spec pins the same rewrite from the DataFrame API; this "
    "pins it from SQL text DuckDB also runs.",
    tags=("sql", "subquery", "relational", "shared-text"),
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _Q100_SQL)
