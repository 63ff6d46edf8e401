"""Relational/analytical query surface over the testdata star schema.

These are the declared capabilities from SURVEY.md §2.3-2.7 — the full
predicate/aggregation/join/window/set-op surface the reference's accumulated
time-series tables need downstream. Each spec pairs the Spark DataFrame plan
with its DuckDB oracle SQL (same column aliases, same rounding) for the
driver's differential gate.

Scale notes are per-query docstrings; common ones:
- dims (region, nation, supplier, part) are broadcast — at 100 TB the fact
  tables shuffle only when the grouping key demands it;
- double aggregates are rounded in BOTH engines (sum order differs across
  engines/partitionings; the value hash must not see the last ulp);
- every LIMIT query carries a unique-key tie-break so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tpch import load_table
from .spec import Registry

R = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan-filter-agg, the map-side
# partial-agg workhorse. At 100 TB: no join, one shuffle of ~4 groups.
# ---------------------------------------------------------------------------
@R.add(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="Filter + grouped aggregation with arithmetic expressions (SURVEY §2.4).",
    tags=("agg", "filter"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — selective filter + sum (TPC-H Q6 shape): the predicate-pushdown
# showcase. All three predicates reach the parquet row-group level.
# ---------------------------------------------------------------------------
@R.add(
    "q02_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="Conjunctive predicates pushed to the scan; global aggregate (SURVEY §2.3).",
    tags=("filter", "agg", "pushdown"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — shipping priority (TPC-H Q3 shape): 3-way join, agg, deterministic
# top-10. customer side is filtered then broadcast-able at test sf; at 100 TB
# customer×orders co-shuffle on custkey, lineitem joins on orderkey.
# ---------------------------------------------------------------------------
@R.add(
    "q03_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    doc="Multi-join + agg + top-k with unique tie-break (SURVEY §2.5, §2.6).",
    tags=("join", "agg", "topk"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — order priority check (TPC-H Q4 shape): EXISTS → left-semi join.
# ---------------------------------------------------------------------------
@R.add(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    doc="Semi-join (EXISTS) + agg (SURVEY §2.5).",
    tags=("join", "semi", "agg"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q05 — region revenue (TPC-H Q5 shape): 5-way join through broadcast dims.
# region(5) and nation(25) broadcast at any scale; customer broadcasts at
# test sf and co-shuffles at 100 TB (AQE decides).
# ---------------------------------------------------------------------------
@R.add(
    "q05_region_revenue",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM region JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    doc="Star join across all dims with broadcast hints (SURVEY §2.5).",
    tags=("join", "broadcast", "agg"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# q06 — latest order per customer: the row_number window pattern; same shape
# dedups the velib station table to its latest snapshot (SURVEY §2.6).
# ---------------------------------------------------------------------------
@R.add(
    "q06_latest_order_per_customer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM customer JOIN orders ON o_custkey = c_custkey
) WHERE rn = 1
""",
    doc="row_number window: latest-snapshot-per-key dedup pattern.",
    tags=("window", "join"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# q07 — per-user running total over the events stream: rows-frame window.
# ---------------------------------------------------------------------------
@R.add(
    "q07_running_total",
    oracle="""
SELECT event_id, user_id, ts, event_type,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value
FROM events
WHERE event_type = 'purchase'
""",
    doc="Cumulative window with rows frame over event time (SURVEY §2.6).",
    tags=("window", "events"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# q08 — lag/lead deltas: inter-event gap per user.
# ---------------------------------------------------------------------------
@R.add(
    "q08_event_gaps",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(date_diff('second',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
          AS BIGINT) AS gap_seconds
FROM events
""",
    doc="lag() window: event-time deltas (SURVEY §2.6).",
    tags=("window", "events"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).cast("bigint").alias("gap_seconds"),
    )


# ---------------------------------------------------------------------------
# q09 — rollup: order counts/revenue by (status, priority) with subtotals.
# ---------------------------------------------------------------------------
@R.add(
    "q09_status_priority_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="ROLLUP grouping sets (SURVEY §2.4).",
    tags=("agg", "rollup"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# q10 — cube over events.
# ---------------------------------------------------------------------------
@R.add(
    "q10_events_cube",
    oracle="""
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE (event_type, user_bucket)
""",
    doc="CUBE grouping sets (SURVEY §2.4).",
    tags=("agg", "cube"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("bigint")
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q11 — distinct counting (exact; the approx variant is a separate
# rows-only spec since HLL estimates differ across engines).
# ---------------------------------------------------------------------------
@R.add(
    "q11_distinct_customers",
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
    doc="COUNT DISTINCT (expand+two-phase in Spark) (SURVEY §2.4).",
    tags=("agg", "distinct"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@R.add(
    "q11b_approx_distinct",
    # HLL sketch values are engine-specific, so the oracle checks the
    # tolerance CONTRACT instead: the exact count (hash-checkable) plus a
    # deterministic within-5%-of-exact verdict. rsd=0.01 means a 1%
    # standard error; 5% is a 5-sigma band, so the flag is stably true.
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       true AS approx_ok
FROM events
GROUP BY event_type
""",
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB path for "
    "distincts. Checked as a tolerance flag: |approx - exact| <= 5% of "
    "exact, alongside the exact count itself.",
    tags=("agg", "approx"),
)
def q11b(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct-first instead of agg(count_distinct, approx_…): mixing an
    # exact distinct with another aggregate makes Catalyst Expand-double
    # every scan row before the shuffle; pre-distincting collapses
    # duplicates map-side and the HLL sketch is unchanged (duplicates
    # never alter a sketch's observed-value set)
    d = (
        _t(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q12 — set operations.
# ---------------------------------------------------------------------------
@R.add(
    "q12_set_ops",
    oracle="""
WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
     building AS (SELECT c_custkey AS custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM buyers INTERSECT SELECT * FROM building)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM buyers)
UNION ALL
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM buyers UNION SELECT * FROM building)
""",
    doc="INTERSECT / EXCEPT / UNION DISTINCT (SURVEY §2.6).",
    tags=("setops",),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    buyers = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )

    def count_of(df, label):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(label).alias("op"), "n"
        )

    return (
        count_of(buyers.intersect(building), "intersect")
        .unionAll(count_of(building.subtract(buyers), "except"))
        .unionAll(count_of(buyers.union(building).distinct(), "union"))
    )


# ---------------------------------------------------------------------------
# q13 — hourly event aggregation: the velib "bikes per hour" time-series
# shape on the events table (date_trunc equi-bucket).
# ---------------------------------------------------------------------------
@R.add(
    "q13_hourly_events",
    oracle="""
SELECT hour, event_type, n_events, total_value,
       floor(total_value / n_events * 10000 + 0.5) / 10000 AS avg_value
FROM (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events,
         round(sum(value), 2) AS total_value
  FROM events
  GROUP BY hour, event_type
)
""",
    doc="Time-bucketed aggregation (the reference's implied hourly rollup). "
    "The average derives from the ROUNDED sum and is itself rounded with "
    "explicit floor(x*1e4+0.5) arithmetic: round(avg(value),4) directly "
    "sits one ulp from a boundary when summation order differs, and the "
    "rounded-sum quotient can land on an EXACT .5 where Spark (HALF_UP on "
    "shortest decimal) and DuckDB (binary-value rounding) disagree by "
    "policy — identical float arithmetic sidesteps both engines' round().",
    tags=("agg", "time", "events"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn(
            "avg_value",
            F.floor(F.col("total_value") / F.col("n_events") * 10000 + 0.5) / 10000,
        )
    )


# ---------------------------------------------------------------------------
# q14 — pivot via conditional aggregation (portable to SQL).
# ---------------------------------------------------------------------------
@R.add(
    "q14_event_pivot",
    oracle="""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY user_id
""",
    doc="Pivot as conditional aggregation (single shuffle, no pivot pass).",
    tags=("agg", "pivot"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def n(et):
        return F.sum(F.when(F.col("event_type") == et, 1).otherwise(0)).cast(
            "bigint"
        ).alias(f"n_{et}")

    return ev.groupBy("user_id").agg(
        n("click"), n("view"), n("purchase"), n("signup"), n("error")
    )


# ---------------------------------------------------------------------------
# q15 — as-of join: each purchase gets the user's most recent prior click.
# ---------------------------------------------------------------------------
@R.add(
    "q15_asof_purchase_click",
    oracle="""
WITH purchases AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     clicks    AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       round(p.value, 2) AS purchase_value,
       (SELECT max(c.ts) FROM clicks c
         WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS ts_asof,
       (SELECT max(c.event_id) FROM clicks c
         WHERE c.user_id = p.user_id AND c.ts <= p.ts
           AND c.ts = (SELECT max(c2.ts) FROM clicks c2
                       WHERE c2.user_id = p.user_id AND c2.ts <= p.ts)) AS event_id_asof
FROM purchases p
""",
    doc="As-of join composed as union+window (operators.asof); oracle uses "
    "correlated argmax. One shuffle on user_id vs O(n*m) range join.",
    tags=("asof", "window", "events"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_cols=(),
        right_id="event_id",
    ).select(
        "event_id", "user_id", "ts", "purchase_value", "ts_asof", "event_id_asof"
    )


# ---------------------------------------------------------------------------
# q16 — top-k per group: most valuable order per priority class (rank).
# ---------------------------------------------------------------------------
@R.add(
    "q16_topk_per_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
    doc="Top-k per group via window (no global sort; SURVEY §2.6).",
    tags=("window", "topk"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# q17 — anti join: customers with no 1997 orders. (Every customer has SOME
# order in this testdata, so the year predicate keeps the complement
# non-empty — an all-customers anti join would be vacuously green.)
# ---------------------------------------------------------------------------
@R.add(
    "q17_customers_without_orders",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_mktsegment
""",
    doc="Anti join (NOT EXISTS) (SURVEY §2.5).",
    tags=("join", "anti"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders_1997 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        cust.join(orders_1997, cust.c_custkey == orders_1997.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q18 — scalar function surface: string/date/math/json in one projection.
# ---------------------------------------------------------------------------
@R.add(
    "q18_scalar_functions",
    oracle="""
SELECT event_id,
       upper(event_type) AS event_type_upper,
       substr(event_type, 1, 3) AS event_type_prefix,
       concat(event_type, ':', CAST(user_id AS VARCHAR)) AS event_key,
       CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
       CAST(dayofweek(ts) AS INT) AS dow,
       round(abs(value - 50.0), 2) AS dist_from_50,
       round(sqrt(greatest(value, 0.0)), 4) AS sqrt_value,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
       CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS value_band,
       coalesce(nullif(event_type, 'error'), 'ERR') AS safe_type
FROM events
""",
    doc="String/date/math/JSON scalar functions + CASE/COALESCE/NULLIF "
    "(the §2.3 scalar surface). All codegen'd, zero UDFs.",
    tags=("scalar", "functions"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6.
    # Normalize to DuckDB's numbering in the Spark plan.
    return ev.select(
        "event_id",
        F.upper("event_type").alias("event_type_upper"),
        F.substring("event_type", 1, 3).alias("event_type_prefix"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("event_key"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.round(F.abs(F.col("value") - 50.0), 2).alias("dist_from_50"),
        F.round(F.sqrt(F.greatest("value", F.lit(0.0))), 4).alias("sqrt_value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("value_band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias("safe_type"),
    )


# ---------------------------------------------------------------------------
# q19 — join with inequality + aggregation over parts/lineitems:
# small-qty orders of large parts (join + HAVING shape).
# ---------------------------------------------------------------------------
@R.add(
    "q19_brand_revenue",
    oracle="""
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size >= 30 AND l_quantity BETWEEN 10 AND 40
GROUP BY p_brand
HAVING count(*) > 10
""",
    doc="Fact-dim broadcast join + HAVING post-aggregate filter.",
    tags=("join", "agg", "having"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(10, 40))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") > 10)
    )


# ---------------------------------------------------------------------------
# q39 — GROUPING SETS via the SQL entry path (completes the A4/A5 family:
# rollup=q09, cube=q10, explicit sets here). Also the one spec exercising
# spark.sql + temp-view registration as a first-class query surface.
# ---------------------------------------------------------------------------
@R.add(
    "q39_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="Explicit GROUPING SETS — one shuffle computes all three grouping "
    "levels (Catalyst expands to a single Expand + hash aggregate, not "
    "three scans).",
    tags=("agg", "groupingsets", "sql"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q39_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM q39_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# q40b — gaps-and-islands sessionization (batch twin of the streaming
# session_window in streaming/gbfs.py): lag -> new-session flag -> running
# sum as session id -> per-session aggregate. Two window passes + one agg,
# all on the same user_id partitioning — ONE shuffle total.
# ---------------------------------------------------------------------------
@R.add(
    "q43_sessionize_events",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_no
""",
    doc="Sessionization with a 30-minute inactivity gap (gaps-and-islands): "
    "the batch twin of the streaming session_window. lag + running sum + "
    "agg share one hash partitioning on user_id — a single shuffle.",
    tags=("window", "sessionize", "events"),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (Spark 4.1 reads parquet TIMESTAMP(NANOS) natively
    # as NTZ, micro-truncated). ANSI forbids casting NTZ to BIGINT, and
    # unix_timestamp() would re-interpret the wall-clock in the session TZ —
    # timestampdiff from the epoch is both legal and TZ-independent, and for
    # positive epochs equals the oracle's floor(epoch(ts)).
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    gap = sec - F.lag(sec).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_no", F.sum("is_new").over(run))
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# q66 — unpivot (wide metrics -> long form)
# ---------------------------------------------------------------------------
@R.add(
    "q66_unpivot_metrics",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2)                      AS sum_qty,
         round(sum(l_extendedprice), 2)                 AS sum_price,
         round(sum(l_extendedprice * l_discount), 2)    AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty'   AS metric, sum_qty   AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_disc'  AS metric, sum_disc  AS value FROM wide
""",
    doc="Unpivot/melt: a wide per-flag aggregate turned into long "
    "(flag, metric, value) form via DataFrame.unpivot — the inverse of "
    "q14's pivot and the missing piece of the reshape surface "
    "(SURVEY §2.6). Unpivot is a zero-shuffle local Expand node over an "
    "already-aggregated frame, so its cost is O(groups x metrics) "
    "regardless of fact size. Oracle spells it as UNION ALL, the "
    "engine-portable form.",
    tags=("reshape", "relational"),
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "sum_disc"
        ),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# q67 — rank-distribution window functions (ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------
@R.add(
    "q67_rank_distribution",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_orderkey,
         ntile(4)       OVER w AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist()    OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey)
)
SELECT o_orderpriority, quartile,
       count(*)            AS n,
       round(min(pr), 9)   AS min_pr,
       round(max(pr), 9)   AS max_pr,
       round(max(cd), 9)   AS max_cd
FROM r GROUP BY o_orderpriority, quartile
""",
    doc="Distribution-rank window surface: ntile(4), percent_rank and "
    "cume_dist per order-priority partition, folded to one row per "
    "(priority, quartile). The tie-break on o_orderkey makes ntile's "
    "row-position assignment deterministic across engines. One window "
    "Exchange on the partition key, then a partial-agg rollup — "
    "both shuffles are on low-cardinality keys, scale-safe.",
    tags=("window", "relational"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    r = od.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("pr"), 9).alias("min_pr"),
        F.round(F.max("pr"), 9).alias("max_pr"),
        F.round(F.max("cd"), 9).alias("max_cd"),
    )


# ---------------------------------------------------------------------------
# q69 — semi-structured VARIANT projection (Spark 4 parse_json)
# ---------------------------------------------------------------------------
@R.add(
    "q69_variant_props",
    oracle="""
SELECT event_type,
       count(*)                                        AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       round(avg(json_extract(props, '$.k')::BIGINT), 6) AS avg_k,
       max(json_extract(props, '$.k')::BIGINT)         AS max_k
FROM events
GROUP BY event_type
""",
    doc="Semi-structured projection through Spark 4's VARIANT type: the "
    "events.props JSON string is parsed once into an open-schema variant "
    "(parse_json) and the field extracted with variant_get — the "
    "binary-encoded, shreddable path for schema-on-read columns, instead "
    "of per-row get_json_object string re-parsing. Aggregation then runs "
    "fully JVM-side; one low-cardinality shuffle. Oracle spells the same "
    "extraction as DuckDB json_extract.",
    tags=("variant", "semistructured", "relational"),
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q74 — correlated scalar subquery (Catalyst decorrelation)
# ---------------------------------------------------------------------------
@R.add(
    "q74_correlated_subquery",
    oracle="""
SELECT p.p_partkey, p.p_name,
       (SELECT CAST(round(max(CAST(l.l_extendedprice AS DECIMAL(15,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(15,4)))), 2)
               AS DOUBLE)
        FROM lineitem l WHERE l.l_partkey = p.p_partkey) AS max_line_rev
FROM part p
WHERE p.p_size >= 48
""",
    doc="Correlated scalar subquery — the last big SQL surface the engine "
    "had not declared: per-part max single-line revenue, written as a "
    "subquery referencing the outer row. Catalyst's "
    "RewriteCorrelatedScalarSubquery decorrelates it into a grouped "
    "aggregate over lineitem LEFT OUTER JOINed to the filtered part "
    "scan — the execution shape a hand-written plan would pick, derived "
    "automatically from the declarative form; parts with no lineitem "
    "rows surface as NULL, exactly the subquery semantics. At 100 TB the "
    "aggregate shuffles on l_partkey once and the filtered dim side "
    "broadcasts. The revenue product runs in DECIMAL, not DOUBLE: at "
    "sf0.1 a max value landed on a round-half boundary where Spark "
    "(exact-BigDecimal HALF_UP) and DuckDB (scaled-double rounding) "
    "disagree by a cent — decimal arithmetic is exact and identical in "
    "both engines, then casts back to DOUBLE for rendering.",
    tags=("subquery", "sql", "relational"),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("q74_part")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q74_lineitem")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_name,
               (SELECT CAST(round(max(CAST(l.l_extendedprice AS DECIMAL(15,2))
                                      * (1 - CAST(l.l_discount AS DECIMAL(15,4)))), 2)
                       AS DOUBLE)
                FROM q74_lineitem l WHERE l.l_partkey = p.p_partkey) AS max_line_rev
        FROM q74_part p
        WHERE p.p_size >= 48
        """
    )


# ---------------------------------------------------------------------------
# q76 — robust statistics per group (median + MAD, two grouped passes)
# ---------------------------------------------------------------------------
@R.add(
    "q76_robust_stats",
    oracle="""
WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
  FROM events e JOIN m USING (event_type)
)
SELECT event_type,
       round(any_value(med), 4)            AS median_value,
       round(quantile_cont(ad, 0.5), 4)    AS mad
FROM d GROUP BY event_type
""",
    doc="Robust per-group statistics: median and MAD (median absolute "
    "deviation) — the outlier-resistant spread measure a quality-scoring "
    "pipeline uses where stddev would be dragged by heavy tails. "
    "Inherently two passes (the deviation needs the median first); the "
    "median table is |event_type| rows so the second pass re-reads the "
    "fact ONCE with a broadcast join — no fact-fact shuffle, and both "
    "exact percentile sorts are per-group. Spark `percentile` == DuckDB "
    "`quantile_cont` (linear interpolation), rounded in both engines.",
    tags=("agg", "robust", "percentile"),
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    return d.groupBy("event_type").agg(
        F.round(F.any_value("med"), 4).alias("median_value"),
        F.round(F.expr("percentile(ad, 0.5)"), 4).alias("mad"),
    )


# ---------------------------------------------------------------------------
# q77 — ANALYZE-style column statistics (CBO stats collection)
# ---------------------------------------------------------------------------
@R.add(
    "q77_table_stats",
    oracle="""
SELECT 'l_quantity' AS col, round(min(l_quantity), 6) AS min_val,
       round(max(l_quantity), 6) AS max_val,
       count(DISTINCT l_quantity)::BIGINT AS ndv,
       (count(*) - count(l_quantity))::BIGINT AS n_nulls
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', round(min(l_extendedprice), 6),
       round(max(l_extendedprice), 6),
       count(DISTINCT l_extendedprice)::BIGINT,
       (count(*) - count(l_extendedprice))::BIGINT
FROM lineitem
UNION ALL
SELECT 'l_discount', round(min(l_discount), 6), round(max(l_discount), 6),
       count(DISTINCT l_discount)::BIGINT,
       (count(*) - count(l_discount))::BIGINT
FROM lineitem
UNION ALL
SELECT 'l_tax', round(min(l_tax), 6), round(max(l_tax), 6),
       count(DISTINCT l_tax)::BIGINT,
       (count(*) - count(l_tax))::BIGINT
FROM lineitem
""",
    doc="ANALYZE-style statistics collection — min/max/NDV/null-count per "
    "numeric column in long form, the inputs a cost-based optimizer and "
    "a data-skipping layout both feed on. The Spark side is ONE "
    "aggregate over one scan: multiple exact count(DISTINCT)s in a "
    "single agg make Catalyst Expand the input (one replica per "
    "distinct-column), the classic exact-NDV cost; at 100 TB the scale "
    "path swaps approx_count_distinct (HLL, one pass, no Expand — the "
    "q11b member of this family) and min/max/null stay single-pass. "
    "Long form comes from a zero-shuffle unpivot of the 1-row aggregate "
    "(same Expand-free reshape as q66).",
    tags=("stats", "agg", "relational"),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__ndv").alias("ndv"),
            F.col(f"{c}__nulls").alias("n_nulls"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("s")
    ).select("s.col", "s.min_val", "s.max_val", "s.ndv", "s.n_nulls")


# ---------------------------------------------------------------------------
# q79 — incremental aggregate maintenance (partial-agg merge)
# ---------------------------------------------------------------------------
@R.add(
    "q79_incremental_agg_merge",
    oracle="""
SELECT o_orderstatus,
       count(*)                       AS n_orders,
       round(sum(o_totalprice), 2)    AS total,
       round(avg(o_totalprice), 4)    AS avg_price,
       round(max(o_totalprice), 2)    AS max_price
FROM orders
GROUP BY o_orderstatus
""",
    doc="Incremental aggregate maintenance: the Spark side never runs the "
    "one-shot aggregate the oracle spells. It splits orders at "
    "1997-01-01 into a 'base' partial aggregate (the materialized "
    "yesterday-state) and a 'delta' partial aggregate (today's "
    "increment), then MERGES the partials — counts and sums add, maxes "
    "max, avg is re-derived from merged sum/count at the end "
    "(avg itself is NOT mergeable; carrying sum+count is the algebraic "
    "decomposition every incremental view maintenance engine uses). "
    "Hash-matching the single-pass oracle proves the merge is lossless. "
    "At 100 TB this is how a daily gold table absorbs a day's delta "
    "without rescanning history: the base side is pre-aggregated "
    "(|groups| rows), so the merge shuffles only group-sized data.",
    tags=("agg", "incremental", "relational"),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_totalprice").alias("sm"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(od.filter(F.col("o_orderdate") < cut))
    delta = partial(od.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("cnt").alias("n_orders"),
            F.sum("sm").alias("raw_sum"),
            F.max("mx").alias("raw_max"),
        )
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        F.round("raw_sum", 2).alias("total"),
        F.round(F.col("raw_sum") / F.col("n_orders"), 4).alias("avg_price"),
        F.round("raw_max", 2).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# q83 — data-quality constraint report (expectations in one pass)
# ---------------------------------------------------------------------------
@R.add(
    "q83_data_quality_report",
    oracle="""
SELECT 'o_custkey_not_null' AS rule,
       sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_violations,
       count(*) AS n_rows
FROM orders
UNION ALL
SELECT 'o_orderstatus_in_set',
       sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  OR o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(*)
FROM orders
UNION ALL
SELECT 'o_totalprice_in_range',
       sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 400000
                  OR o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(*)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::BIGINT,
       sum(c)::BIGINT
FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'fk:o_custkey',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       count(*)
FROM orders
""",
    doc="Declarative data-quality report (operators/quality.py): the "
    "reference's implicit contract — a fixed DDL that silently coerces "
    "(SURVEY §1.4) — made explicit and measured. Null / set-membership / "
    "range expectations fold into ONE aggregate over ONE scan (map-side "
    "partial counters, 1-row result, then a free explode to long form); "
    "the uniqueness rule adds its own keyed shuffle (global property) "
    "and the referential rule an anti-join against the broadcast "
    "customer key set. The range rule is deliberately tight "
    "(o_totalprice ≤ 400k) so the report is non-vacuous on clean data. "
    "At 100 TB the row-rule pass rides any existing scan — compose with "
    "`check()` to gate a pipeline stage, or `observe()` to measure "
    "during the sink write itself (pipeline.py).",
    tags=("quality", "constraints", "relational"),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        fk_violations,
        in_range,
        in_set,
        not_null,
        quality_report,
        unique_key,
    )

    od = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    report = quality_report(
        od,
        [
            not_null("o_custkey"),
            in_set("o_orderstatus", ("O", "F", "P")),
            in_range("o_totalprice", 0, 400000),
            unique_key("o_orderkey"),
        ],
    )
    return report.unionByName(fk_violations(od, "o_custkey", cust, "c_custkey"))


# ---------------------------------------------------------------------------
# q143 — VARIANT path matrix: nested / missing / array / null-vs-missing
# ---------------------------------------------------------------------------
@R.add(
    "q143_variant_path_matrix",
    oracle="""
WITH j AS (
  SELECT event_type,
         '{"k":' || CAST(event_id % 97 AS VARCHAR)
         || CASE WHEN event_id % 3 <> 0
            THEN ',"m":{"a":' || CAST(user_id % 13 AS VARCHAR)
                 || CASE WHEN event_id % 4 <> 0
                    THEN ',"b":"u' || CAST(user_id % 5 AS VARCHAR) || '"'
                    ELSE '' END
                 || '}'
            ELSE '' END
         || CASE WHEN event_id % 6 <> 0
            THEN ',"a":[' || CAST(event_id % 3 AS VARCHAR) || ','
                 || CAST(event_id % 5 AS VARCHAR) || ','
                 || CAST(event_id % 7 AS VARCHAR) || ']'
            ELSE '' END
         || CASE WHEN event_id % 11 = 0 THEN ',"z":null' ELSE '' END
         || '}' AS jd
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(TRY_CAST(json_extract(jd, '$.k') AS BIGINT))::BIGINT AS sum_k,
       count(TRY_CAST(json_extract(jd, '$.m.a') AS BIGINT))::BIGINT AS n_ma,
       sum(CASE WHEN TRY_CAST(json_extract(jd, '$.m.a') AS BIGINT) IS NOT NULL
                 AND json_extract_string(jd, '$.m.b') IS NULL
            THEN 1 ELSE 0 END)::BIGINT AS n_mb_missing,
       max(json_extract_string(jd, '$.m.b')) AS max_mb,
       sum(TRY_CAST(json_extract(jd, '$.a[2]') AS BIGINT))::BIGINT AS sum_a2,
       sum(CASE WHEN json_type(jd, '$.z') = 'NULL' THEN 1 ELSE 0 END)::BIGINT
         AS n_znull
FROM j
GROUP BY event_type
""",
    doc="VARIANT path matrix — the full schema-on-read extraction surface "
    "q69 only sampled: a synthetic JSON doc (built by the SAME concat "
    "expression in both engines, so the parsed text is byte-identical) "
    "exercises nested-object paths, ABSENT keys at two depths, array "
    "indexing (0-based in both dialects), string extraction, and the "
    "null-vs-missing discrimination that typed extraction erases — "
    "Spark's is_variant_null(try_variant_get(...)) vs DuckDB's "
    "json_type(...) = 'NULL' are the two engines' only ways to tell "
    "{\"z\":null} from no z at all. The doc parses ONCE into a variant "
    "column and every path reads the binary encoding (q69's rule); all "
    "aggregates are exact integer arithmetic. Dialect mapping pinned by "
    "fuzz grammar #18 (tests/test_fuzz_differential.py): "
    "try_variant_get <-> TRY_CAST(json_extract), 'string' <-> "
    "json_extract_string; the ONE divergence — fractional JSON number "
    "to integer (Spark truncates toward zero, DuckDB rounds half-even: "
    "3.5 -> 3 vs 4) — is pinned in "
    "test_variant_fractional_to_int_divergence and this spec extracts "
    "integers only. Scale: one projection pass, one low-cardinality "
    "shuffle; at 100 TB the variant column would be shredded at the "
    "parquet layer and these paths prune to subcolumns.",
    tags=("variant", "semistructured", "json", "relational"),
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = lambda c: c.cast("string")  # noqa: E731
    e, u = F.col("event_id"), F.col("user_id")
    jd = F.concat(
        F.lit('{"k":'),
        s(e % 97),
        F.when(
            e % 3 != 0,
            F.concat(
                F.lit(',"m":{"a":'),
                s(u % 13),
                F.when(
                    e % 4 != 0,
                    F.concat(F.lit(',"b":"u'), s(u % 5), F.lit('"')),
                ).otherwise(""),
                F.lit("}"),
            ),
        ).otherwise(""),
        F.when(
            e % 6 != 0,
            F.concat(
                F.lit(',"a":['), s(e % 3), F.lit(","), s(e % 5),
                F.lit(","), s(e % 7), F.lit("]"),
            ),
        ).otherwise(""),
        F.when(e % 11 == 0, F.lit(',"z":null')).otherwise(""),
        F.lit("}"),
    )
    parsed = ev.withColumn("jd", jd).withColumn(
        "vj", F.expr("parse_json(jd)")
    )
    k = F.expr("try_variant_get(vj, '$.k', 'bigint')")
    ma = F.expr("try_variant_get(vj, '$.m.a', 'bigint')")
    mb = F.expr("try_variant_get(vj, '$.m.b', 'string')")
    a2 = F.expr("try_variant_get(vj, '$.a[2]', 'bigint')")
    znull = F.expr("is_variant_null(try_variant_get(vj, '$.z'))")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.count(ma).alias("n_ma"),
        F.sum(
            F.when(ma.isNotNull() & mb.isNull(), 1).otherwise(0)
        ).alias("n_mb_missing"),
        F.max(mb).alias("max_mb"),
        F.sum(a2).alias("sum_a2"),
        F.sum(F.when(znull, 1).otherwise(0)).alias("n_znull"),
    )


# ---------------------------------------------------------------------------
# q146 — checked-arithmetic matrix: try_* overflow / zero-division surface
# ---------------------------------------------------------------------------
@R.add(
    "q146_try_arithmetic_matrix",
    oracle="""
WITH t AS (
  SELECT l_returnflag,
         TRY_CAST(CAST(l_orderkey % 9400 AS HUGEINT)
                  * 1000000000000000 AS BIGINT) AS v_mul,
         TRY_CAST(CAST(l_orderkey % 5900 AS HUGEINT)
                  + 9223372036854770000 AS BIGINT) AS v_add,
         (l_orderkey / NULLIF(l_partkey % 3, 0)) AS v_div,
         TRY_CAST(l_extendedprice % 10300.0 AS DECIMAL(6,2)) AS v_dec,
         TRY_CAST((l_orderkey % 11000) * 200000 AS INTEGER) AS v_int,
         (l_partkey % 3) AS den,
         l_orderkey
  FROM lineitem
)
SELECT l_returnflag,
       count(*)::BIGINT AS n,
       count(CASE WHEN v_mul IS NULL THEN 1 END)::BIGINT AS z_mul,
       max(v_mul)::BIGINT AS m_mul,
       count(CASE WHEN v_add IS NULL THEN 1 END)::BIGINT AS z_add,
       min(v_add)::BIGINT AS m_add,
       TRY_CAST(sum(CAST(l_orderkey % 20000 AS HUGEINT) * 50000000000)
                AS BIGINT) AS s_chk,
       count(CASE WHEN den = 0 THEN 1 END)::BIGINT AS z_div,
       max(v_div) AS m_div,
       count(CASE WHEN v_dec IS NULL THEN 1 END)::BIGINT AS z_dec,
       max(v_dec) AS d_cap,
       count(CASE WHEN v_int IS NULL THEN 1 END)::BIGINT AS z_int
FROM t
GROUP BY l_returnflag
""",
    doc="Checked-arithmetic matrix — the numeric-edge surface fuzz "
    "grammar #19 sweeps (tests/test_fuzz_differential.py:"
    "_gen_overflow_query), pinned as one fixed registered plan the way "
    "q143 pinned grammar #18's: per-row multiply/add overflow at the "
    "BIGINT boundary (try_multiply/try_add <-> DuckDB's exact HUGEINT "
    "arithmetic TRY_CAST back to BIGINT — nulls under the identical "
    "out-of-domain condition), ACCUMULATION overflow (try_sum of "
    "non-negative per-row-safe products, where partial-sum monotonicity "
    "makes Spark's checked accumulator and DuckDB's exact HUGEINT total "
    "null together — per group, so at sf0.01 some l_returnflag groups "
    "overflow and others survive, exercising both sides of the boundary "
    "in ONE result), zero-division (try_divide <-> / NULLIF), and "
    "range-capped TRY_CAST to INTEGER and DECIMAL(6,2) (shared "
    "spelling). Every aggregate is a null-pattern count, a min/max "
    "selection, or the checked sum itself — exact in both engines. "
    "Operands are MODULO-BOUNDED (l_orderkey % 9400 etc.) so every "
    "per-row overflow boundary sits inside the operand range at EVERY "
    "sf with a ~2-3 pct overflow band; the ACCUMULATION leg's bounded "
    "operand ((k % 20000) * 5e10) keeps the per-row product ANSI-safe "
    "at any key range (try_sum guards only the accumulation — an "
    "unbounded child multiply throws before it can null) and crosses "
    "the sum boundary BETWEEN tiers: all three groups fit at sf0.01, "
    "all overflow to NULL at sf0.1+, and the fuzz grammar's "
    "predicate-filtered sweeps cover the mixed regime. The bounding is "
    "also the performance design: "
    "Spark's try_* family is exception-driven (each overflowing row "
    "throws ArithmeticException for TryEval to catch, measured ~15us/"
    "throw: an unbounded operand made 94 pct of sf0.1 rows throw and "
    "this one scan-and-agg spec cost 40s), so at 100 TB a checked-"
    "arithmetic plan must keep the expected overflow fraction near "
    "zero — bound the operands, or pre-filter the overflow range with "
    "a cheap predicate and try_* only the residue. Each try expression "
    "is also projected ONCE below the aggregate instead of being "
    "re-evaluated per consuming aggregate. Scale: one scan, one "
    "low-cardinality shuffle; checked arithmetic is JVM-side whole-"
    "stage codegen, no UDFs. Reference counterpart: none (north-star "
    "extension).",
    tags=("numeric", "overflow", "relational"),
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # modulo-bounded operands + project-once-below-the-aggregate: see the
    # doc's exception-cost note — every try expression is evaluated
    # exactly once per row, and only the narrow band above each boundary
    # (9223/9400, 5807/5900, 10000/10300, 10737/11000) ever throws
    t = li.select(
        "l_returnflag",
        "l_orderkey",
        F.expr("try_multiply(l_orderkey % 9400, 1000000000000000)").alias(
            "v_mul"
        ),
        F.expr("try_add(l_orderkey % 5900, 9223372036854770000)").alias(
            "v_add"
        ),
        F.expr("try_divide(l_orderkey, l_partkey % 3)").alias("v_div"),
        F.expr("try_cast(l_extendedprice % 10300.0D AS DECIMAL(6,2))").alias(
            "v_dec"
        ),
        F.expr("try_cast((l_orderkey % 11000) * 200000 AS INT)").alias(
            "v_int"
        ),
        (F.col("l_partkey") % 3).alias("den"),
    )
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("v_mul").isNull(), 1)).alias("z_mul"),
        F.max("v_mul").alias("m_mul"),
        F.count(F.when(F.col("v_add").isNull(), 1)).alias("z_add"),
        F.min("v_add").alias("m_add"),
        # the sum operand is modulo-bounded too ((c % 20000) * 5e10 <
        # 1e15 per row at ANY key range): try_sum guards only the
        # ACCUMULATION — an unbounded per-row child multiply throws
        # ARITHMETIC_OVERFLOW under ANSI before try_sum can null it
        # (latent at sf<=1.0 where keys stay under 1.8e8, fatal at the
        # sf3.0+ rungs)
        F.expr("try_sum((l_orderkey % 20000) * 50000000000)").alias("s_chk"),
        F.count(F.when(F.col("den") == 0, 1)).alias("z_div"),
        F.max("v_div").alias("m_div"),
        F.count(F.when(F.col("v_dec").isNull(), 1)).alias("z_dec"),
        F.max("v_dec").alias("d_cap"),
        F.count(F.when(F.col("v_int").isNull(), 1)).alias("z_int"),
    )


# ---------------------------------------------------------------------------
# q148 — exact GLOBAL running revenue + global rank, no single-partition
# window (operators/ordered.py:range_prefix)
# ---------------------------------------------------------------------------
@R.add(
    "q148_global_running_revenue",
    oracle="""
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS global_rank,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              OVER (ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT)
         AS cum_cents
FROM orders
""",
    doc="Exact global cumulative revenue and global rank over the full "
    "orders total order (o_orderdate, o_orderkey) — the semantics of "
    "``SUM() OVER (ORDER BY ...)`` with NO PARTITION BY, the one window "
    "shape the plan lint bans outright as the single-reducer sort "
    "(tests/test_plan_lint.py). The engine side never builds that "
    "window: operators/ordered.py:range_prefix runs the two-phase "
    "exscan — literal-boundary bucketing (bucket id is a PURE row "
    "function baked in from a seeded driver sample, NOT "
    "spark_partition_id after repartitionByRange, whose RDD-id-seeded "
    "re-sampling we measured placing rows differently across plan "
    "branches), a <=n-row per-bucket totals frame exclusive-scanned and "
    "broadcast back, one hash shuffle, and a codegen'd JVM window "
    "PARTITIONED by bucket (the explicit bucket-id repartition already "
    "satisfies the window's clustering requirement — no second "
    "exchange, no Python round-trip). Money moves as BIGINT "
    "cents end to end, so the cumulative sum is exact and associative — "
    "a double cumsum would make the result depend on bucket boundaries "
    "and diverge from the oracle's strictly-sequential accumulation. "
    "The result is boundary-invariant by construction: ranks and "
    "running sums come out identical for ANY bucket placement, which is "
    "what the oracle (DuckDB's true global window, fine single-node) "
    "hash-checks. 100 TB: one hash shuffle on the bucket id — the "
    "irreducible cost of a global order — plus a column-pruned "
    "count+sample pre-pass; cumulative token budgets in corpus order "
    "and exact global quality ranks are this exact plan. Reference "
    "counterpart: none (north-star extension; the reference's pandas "
    "stage is single-node cumsum).",
    tags=("window", "ordered", "orders", "scale"),
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import range_prefix

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return range_prefix(
        o,
        ["o_orderdate", "o_orderkey"],
        "cents",
        cumsum_col="cum_cents",
    ).select("o_orderkey", "global_rank", "cum_cents")


# ---------------------------------------------------------------------------
# q150 — exact global quantiles by rank selection with bucket pruning
# (operators/ordered.py:global_order_statistics)
# ---------------------------------------------------------------------------
@R.add(
    "q150_global_order_statistics",
    oracle="""
WITH n AS (SELECT count(*) AS c FROM lineitem),
r AS (SELECT l_extendedprice, l_orderkey, l_linenumber,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS global_rank
      FROM lineitem),
qs AS (SELECT unnest([1,5,10,25,50,75,90,95,99,100]) AS pct)
SELECT pct, global_rank, l_extendedprice, l_orderkey, l_linenumber
FROM qs, n
JOIN r ON r.global_rank = greatest(1, (pct * c + 99) // 100)
""",
    doc="Exact global quantiles of l_extendedprice (p1..p100) by rank "
    "selection with BUCKET PRUNING "
    "(operators/ordered.py:global_order_statistics) — the distributed "
    "selection algorithm: per-bucket counts locate which literal-"
    "boundary buckets straddle each target rank, only those <= |pcts| "
    "buckets are ever shuffled or sorted (row_number windows PARTITIONED "
    "by pruned bucket + the bucket's count offset = global rank), and "
    "the full sort the oracle runs single-node never exists in the "
    "Spark plan. Target ranks are pure integer arithmetic — "
    "max(1, (pct*N + 99) // 100) — spelled identically in both engines, "
    "so no float ceil boundary can flip a row selection at any N. The "
    "exact-quantile complement to q38: q38's per-group `percentile` "
    "sorts each group inside the aggregate and its documented scale "
    "path is the mergeable t-digest when the cut line tolerates error; "
    "this is the path when it does NOT (exact corpus-wide quality-score "
    "cut lines for top-p%% selection). All JVM-side: no pandas, no "
    "unpartitioned window over anything unbounded (the exclusive scan "
    "runs over the <= num_partitions-row totals frame). 100 TB: two "
    "scans + a shuffle of ~|pcts| buckets' rows; the tie-broken total "
    "order (price, orderkey, linenumber) keeps rank selection "
    "deterministic under duplicate prices. Reference counterpart: none "
    "(north-star extension).",
    tags=("ordered", "quantile", "lineitem", "scale"),
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import global_order_statistics

    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return global_order_statistics(
        li,
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        [1, 5, 10, 25, 50, 75, 90, 95, 99, 100],
    )
