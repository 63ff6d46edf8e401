"""Temporal & sketch query surface: range join, gap-filled hypertable
rollup, count-min heavy hitters.

The reference's two tables accumulate hourly observations
(`etl_dag.py:317` @hourly; event time at `etl_dag.py:240`) — these specs
are the time-series questions such tables exist to answer, each built the
way it must be built at 100 TB:

- q49: range self-join WITHOUT an equi-key via gap-width bucketization
  (operators/rangejoin.py) — never a BroadcastNestedLoopJoin.
- q50: time-bucketed rollup with GAP-FILLED empty buckets (the
  hypertable/time_bucket_gapfill shape) — the dense grid is generated,
  not scanned, so its cost is O(hours × types), independent of fact size.
- q51: count-min sketch heavy-hitter estimates (operators/sketch.py) —
  sketch state is depth×width cells regardless of input size, and the
  md5-bucket construction is bit-identical in DuckDB so the oracle
  checks the estimates exactly, no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ntz_epoch_us
from ..operators.rangejoin import range_self_join_pairs
from ..operators.sketch import cm_estimate, count_min_table
from ..sources.tpch import load_table
from .spec import Registry

T = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# q49 — range self-join: purchase pairs within 30 seconds
# ---------------------------------------------------------------------------
@T.add(
    "q49_range_join_pairs",
    oracle="""
SELECT a.event_id AS id_a, b.event_id AS id_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 SECOND
 AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
WHERE a.event_type = 'purchase' AND b.event_type = 'purchase'
""",
    doc="Range join with no equi-key: ordered pairs of purchase events "
    "within 30 seconds of each other. Spark side bucketizes the timestamp "
    "to gap width and equi-joins on the bucket id "
    "(operators/rangejoin.py:range_self_join_pairs) — a naive range "
    "predicate plans as BroadcastNestedLoopJoin (all-pairs), which the "
    "plan lock in tests/test_plans.py forbids. DuckDB's IEJoin handles "
    "the raw inequality form natively, making it the exact oracle.",
    tags=("join", "range", "temporal"),
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts")
    )
    return range_self_join_pairs(ev, ts_col="ts", id_col="event_id", max_gap_seconds=30)


# ---------------------------------------------------------------------------
# q50 — gap-filled hourly rollup (hypertable time_bucket_gapfill shape)
# ---------------------------------------------------------------------------
@T.add(
    "q50_gapfill_rollup",
    oracle="""
WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
types AS (SELECT DISTINCT event_type FROM ev),
hourly AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2)
SELECT t.event_type, hr.h AS bucket_hour,
       CAST(coalesce(hy.n, 0) AS BIGINT) AS n_events
FROM types t CROSS JOIN hours hr
LEFT JOIN hourly hy ON hy.event_type = t.event_type AND hy.h = hr.h
""",
    doc="Hourly event counts per type with MISSING HOURS FILLED with 0 — "
    "the hypertable rollup + gapfill shape. The dense (type × hour) grid "
    "is GENERATED from one global min/max agg via sequence()+explode, "
    "never scanned, so grid cost is independent of fact-table size; the "
    "fact table contributes one partial-agg shuffle, and the grid↔hourly "
    "join broadcasts the aggregated side (≤ types × active hours rows).",
    tags=("agg", "temporal", "gapfill"),
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    hourly = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    # grid bounds and the type list derive from the hourly aggregate, not
    # the raw event stream. Catalyst still plans three (column-pruned,
    # 2-column) scans because each consumer prunes the subplan differently
    # — the single wide shuffle remains the dominant cost; on a real
    # cluster `hourly.persist()` is the knob that makes these one scan
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    grid = hourly.select("event_type").distinct().crossJoin(hours)
    return grid.join(F.broadcast(hourly), ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("bucket_hour"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q51 — count-min sketch heavy hitters
# ---------------------------------------------------------------------------
@T.add(
    "q51_countmin_heavy_hitters",
    oracle="""
WITH rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
cm AS (
  SELECT rs.r,
         ('0x' || substr(md5(rs.r::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::UBIGINT % 64 AS bucket,
         count(*) AS c
  FROM events CROSS JOIN rs GROUP BY 1, 2
),
top AS (
  SELECT user_id, count(*) AS exact_cnt FROM events
  GROUP BY 1 ORDER BY exact_cnt DESC, user_id LIMIT 10
)
SELECT t.user_id, t.exact_cnt, CAST(min(cm.c) AS BIGINT) AS cm_est
FROM top t CROSS JOIN rs
JOIN cm ON cm.r = rs.r
 AND cm.bucket = ('0x' || substr(md5(rs.r::VARCHAR || ':' || t.user_id::VARCHAR), 1, 15))::UBIGINT % 64
GROUP BY 1, 2
""",
    doc="Count-min sketch (depth 4 × width 64) frequency estimates for "
    "the top-10 exact heavy hitters (operators/sketch.py). Bucket "
    "indexes use the portable md5-prefix idiom, so the DuckDB oracle "
    "reproduces the estimates BIT-IDENTICALLY — the gate verifies the "
    "sketch math (including its deliberate collisions at width 64 ≪ 150 "
    "users), not a tolerance band. CM guarantees cm_est >= exact_cnt.",
    tags=("agg", "sketch", "approx"),
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cm = count_min_table(ev, "user_id", depth=4, width=64)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(10)
    )
    return cm_estimate(cm, top, "user_id", depth=4, width=64)


# ---------------------------------------------------------------------------
# q53 — bloom-pruned semi join
# ---------------------------------------------------------------------------
@T.add(
    "q53_bloom_semi_join",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag
""",
    doc="Exact semi-join of lineitem against urgent orders with a "
    "BLOOM-FILTER map-side pre-prune (operators/bloom.py): the dim keys "
    "build a fixed-size broadcast bitmap, the fact side drops most "
    "non-matching rows before its join Exchange, and the exact semi-join "
    "on the survivors removes bloom false positives — so the result (and "
    "the oracle) is the plain semi-join, while the shuffle sees only "
    "survivors. The explicit form of Spark's runtime bloom-filter join.",
    tags=("join", "sketch", "prune"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    dim = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    j = bloom_semi_join(li, dim, fact_key="l_orderkey", dim_key="o_orderkey")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q60 — range-frame rolling window: 5-minute trailing stats per user
# ---------------------------------------------------------------------------
@T.add(
    "q60_rolling_range_frame",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER w AS n_5min,
       round(sum(value) OVER w, 6) AS value_5min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
""",
    doc="Trailing 5-minute event count and value total per user via a "
    "RANGE window frame over event-time (epoch micros) — the frame type "
    "W3's running total (ROWS frame) does not exercise: the frame edge is "
    "a time offset, not a row offset, so simultaneous events are peers "
    "and gaps shrink the frame. Partitioned by user_id — the window sorts "
    "inside each user's partition only, no global sort; at 100 TB this is "
    "one shuffle on the (hash-distributed, ~uniform) user key. Frame "
    "arithmetic on integer micros (unix_micros / epoch_us) so both "
    "engines bound the frame on identical values.",
    tags=("window", "temporal"),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", ntz_epoch_us("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-300 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_5min"),
        F.round(F.sum("value").over(w), 6).alias("value_5min"),
    )


# ---------------------------------------------------------------------------
# q71 — KMV distinct sketch (portable estimates, exact oracle)
# ---------------------------------------------------------------------------
@T.add(
    "q71_kmv_distinct",
    oracle="""
WITH dh AS (
  SELECT DISTINCT event_type AS g,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 14))::UBIGINT)::BIGINT AS h
  FROM events
),
r AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh
),
a AS (
  SELECT g, count(*)::BIGINT AS n_seen,
         max(CASE WHEN rn = 64 THEN h END) AS h_k
  FROM r WHERE rn <= 64 GROUP BY g
)
SELECT g AS event_type,
       (CASE WHEN n_seen < 64 THEN n_seen
             ELSE 63 * 72057594037927936 // h_k END)::BIGINT
         AS est_distinct
FROM a
""",
    doc="K-minimum-values distinct-user sketch per event type "
    "(operators/sketch.py:kmv_distinct, k=64): state is 64 hashes per "
    "group at ANY input size, and the md5-based construction makes the "
    "ESTIMATES bit-identical in DuckDB — the sketch's math is checked "
    "exactly, not through a tolerance flag (same property as the q51 "
    "count-min table; contrast q11b where Spark's HLL internals are "
    "engine-specific).",
    tags=("sketch", "approx", "temporal"),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_distinct

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_distinct(ev, "event_type", "user_id", k=64)


# ---------------------------------------------------------------------------
# q73 — event-path analysis (ordered aggregation / funnel shape)
# ---------------------------------------------------------------------------
@T.add(
    "q73_event_paths",
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id
)
SELECT path, count(*)::BIGINT AS n_users
FROM p GROUP BY path
HAVING count(*) >= 2
""",
    doc="Per-user ENTRY paths (the funnel/journey shape: each user's first "
    "3 events as 'click>view>purchase') aggregated to path frequencies. "
    "Full-history paths are unique per user in this corpus (~86 events "
    "each), which made the aggregate vacuous — the bounded prefix is both "
    "the realistic product question (entry funnel) and non-vacuous at "
    "every sf. Ordered aggregation is engine-divergent by default — "
    "Spark's collect_list has no ORDER BY — so the deterministic "
    "construction sorts an array of (ts, event_id, type) structs AFTER "
    "collection (array_sort on struct fields is lexicographic on field "
    "order), slices the first 3, and joins the projected types; the "
    "(ts, event_id) tie-break matches the oracle's row_number ORDER BY "
    "exactly. Two shuffles, both keyed and partial-agg'd; per-user state "
    "is the user's own event list, the same bound any sessionizer "
    "carries.",
    tags=("window", "funnel", "temporal"),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    path = F.array_join(
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                1,
                3,
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    per_user = ev.groupBy("user_id").agg(path.alias("path"))
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= 2)
    )


# ---------------------------------------------------------------------------
# q75 — retention cohorts (cohort week × activity week matrix)
# ---------------------------------------------------------------------------
@T.add(
    "q75_retention_cohorts",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS active_week
  FROM events
)
SELECT f.cohort_week,
       ((epoch(a.active_week)::BIGINT - epoch(f.cohort_week)::BIGINT)
         / 604800)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM first_seen f JOIN activity a USING (user_id)
GROUP BY f.cohort_week, week_offset
""",
    doc="Retention cohort matrix: users grouped by first-activity week "
    "(cohort), counted in each later activity week as a week offset — "
    "the standard product-analytics retention triangle. Three keyed "
    "shuffles, all bounded: min-per-user and distinct-(user, week) both "
    "hash on user_id (AQE reuses the partitioning for the self-join, so "
    "the cohort join is co-located, not a third full exchange), and the "
    "final rollup shuffles |cohorts × weeks| rows. The week offset is "
    "integer-exact — epoch seconds of week-truncated timestamps divide "
    "evenly by 604800 — so the hash has no FP surface. At 100 TB the "
    "per-user state is one timestamp; nothing collects a user's history.",
    tags=("cohort", "temporal", "join"),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    j = first_seen.join(activity, "user_id")
    week_offset = (
        (ntz_epoch_us("active_week") - ntz_epoch_us("cohort_week"))
        / F.lit(604800000000)
    ).cast("long")
    return (
        j.withColumn("week_offset", week_offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q78 — Z-order layout keys (multi-dimensional clustering for data skipping)
# ---------------------------------------------------------------------------
def _zorder_terms(a_expr: str, b_expr: str, bits: int, shift_op: bool) -> str:
    """Bit-interleave SQL for two ``bits``-wide ints, emitted for either
    engine from ONE generator so the arithmetic cannot drift: Spark
    (shift_op=False → shiftleft/shiftright calls) or DuckDB
    (shift_op=True → << / >> operators)."""
    terms = []
    for i in range(bits):
        if shift_op:
            terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(
                f"shiftleft(shiftright({a_expr}, {i}) & 1, {2 * i})"
            )
            terms.append(
                f"shiftleft(shiftright({b_expr}, {i}) & 1, {2 * i + 1})"
            )
    return " + ".join(terms)


@T.add(
    "q78_zorder_layout",
    oracle=f"""
WITH k AS (
  SELECT user_id & 255 AS ua,
         (floor(epoch(ts))::BIGINT // 3600) & 255 AS hb
  FROM events
),
z AS (
  SELECT ua, hb, ({_zorder_terms('ua', 'hb', 8, True)}) AS zkey FROM k
)
SELECT (zkey >> 10)::BIGINT AS z_bucket,
       count(*)::BIGINT AS n_rows,
       min(ua)::BIGINT AS min_user, max(ua)::BIGINT AS max_user,
       min(hb)::BIGINT AS min_hour, max(hb)::BIGINT AS max_hour
FROM z GROUP BY z_bucket
""",
    doc="Z-order (Morton) layout keys: interleave the low 8 bits of "
    "user_id with the low 8 bits of the event hour and bucket rows by "
    "the top Z-key bits — the multi-dimensional clustering key a Delta "
    "ZORDER BY / data-skipping layout sorts files on, so that BOTH "
    "per-user and per-hour predicates prune most buckets (each 64-key "
    "bucket spans at most a 32×32 square of the (user, hour) grid — the "
    "min/max columns in the output ARE the per-file skipping stats such "
    "a layout would publish). Pure integer bit arithmetic generated "
    "from one Python function for both engines, all inside whole-stage "
    "codegen; one |buckets|-sized shuffle. At 100 TB the same key feeds "
    "repartitionByRange(zkey) before the write, turning the bucket "
    "stats into real parquet row-group pruning.",
    tags=("layout", "zorder", "temporal"),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = ev.select(
        (F.col("user_id").bitwiseAND(255)).alias("ua"),
        F.expr(
            "(div(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
            " 3600)) & 255"
        ).alias("hb"),
    )
    z = k.withColumn("zkey", F.expr(_zorder_terms("ua", "hb", 8, False)))
    return (
        z.withColumn("z_bucket", F.expr("shiftright(zkey, 10)").cast("long"))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ua").cast("long").alias("min_user"),
            F.max("ua").cast("long").alias("max_user"),
            F.min("hb").cast("long").alias("min_hour"),
            F.max("hb").cast("long").alias("max_hour"),
        )
    )


# ---------------------------------------------------------------------------
# q82 — sliding-window distinct users (batch twin of the streaming window)
# ---------------------------------------------------------------------------
@T.add(
    "q82_sliding_distinct_users",
    oracle="""
WITH expanded AS (
  SELECT DISTINCT
         to_timestamp((floor(epoch(ts))::BIGINT // 900 - k.k) * 900)::TIMESTAMP
           AS window_start,
         user_id
  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
)
SELECT window_start, count(*)::BIGINT AS n_users
FROM expanded
GROUP BY window_start
""",
    doc="Distinct users per 1-hour window sliding every 15 minutes — the "
    "batch twin of the streaming sliding-window aggregate (SURVEY §2.8), "
    "oracle-checked where the streaming tier is pytest-checked. Spark's "
    "built-in window(ts, '1 hour', '15 minutes') expands each event into "
    "exactly overlap=4 windows aligned to the unix epoch; the oracle "
    "spells that same alignment arithmetic explicitly "
    "((epoch // 900 - k) * 900). The duplication factor is the overlap "
    "count — bounded by window/slide = 4, independent of data size — "
    "then one count-distinct shuffle keyed by (window, user). At 100 TB "
    "the same plan holds; the streaming path adds a watermark to bound "
    "state instead of the batch shuffle.",
    tags=("window", "sliding", "temporal"),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "user_id"
    )
    return (
        w.select(F.col("w.start").alias("window_start"), "user_id")
        .groupBy("window_start")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q85 — SCD2 history build (type-2 slowly-changing dimension)
# ---------------------------------------------------------------------------
@T.add(
    "q85_scd2_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
  SELECT user_id, ts, event_id, event_type,
         sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS version
  FROM ordered
),
spans AS (
  SELECT user_id, version,
         min(event_type) AS attr_value,  -- constant within the version
         min(ts) AS valid_from,
         count(*)::BIGINT AS n_events
  FROM versioned
  GROUP BY user_id, version
)
SELECT user_id, version, attr_value, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         IS NULL) AS is_current,
       n_events
FROM spans
""",
    doc="Type-2 slowly-changing dimension build from the event stream: "
    "per user, consecutive runs of the same event_type collapse into "
    "versioned validity spans (valid_from, valid_to = next version's "
    "start, open span ⇒ NULL + is_current) — the standard warehouse "
    "history-table shape the reference's append-only snapshots exist to "
    "feed (SURVEY §1.1: hourly observations accumulating into a "
    "time-series). Deterministic ordering tie-break on (ts, event_id). "
    "Shape: two window passes and one groupBy, ALL partitioned by "
    "user_id — a single hash exchange that every later stage reuses; "
    "per-user state in each window is one row. At 100 TB this is the "
    "same one-shuffle plan; the streaming twin is the "
    "change-detection stateful operator (streaming/gbfs.py), which "
    "emits exactly these spans incrementally.",
    tags=("window", "scd2", "temporal"),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    )
    versioned = ev.withColumn(
        "version",
        F.sum(F.when(changed, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    spans = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("attr_value"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return spans.select(
        "user_id",
        "version",
        "attr_value",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# q88 — LOCF forward fill (time-series imputation)
# ---------------------------------------------------------------------------
@T.add(
    "q88_locf_forward_fill",
    oracle="""
WITH base AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events
),
grp AS (
  SELECT user_id, ts, event_id, v,
         count(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM base
)
SELECT user_id, ts, event_id, v,
       max(v) OVER (PARTITION BY user_id, g) AS v_filled
FROM grp
""",
    doc="LOCF (last-observation-carried-forward) imputation: per-user "
    "forward fill of missing readings with the most recent non-null "
    "value — the standard time-series repair for sensor feeds like the "
    "reference's hourly station snapshots (a station that misses a "
    "report keeps its last known bike count). Nulls are planted "
    "deterministically (event_id % 7) so both engines see the same "
    "holes; leading nulls stay null. Spark is the idiomatic "
    "last(ignorenulls) over an unbounded-preceding row frame — ONE "
    "user_id exchange, one sort, per-row state a single value; the "
    "oracle spells the same semantics portably (running non-null count "
    "forms carry groups; max within (user, group) recovers the carried "
    "value). No arithmetic touches the doubles, so values hash "
    "bit-identically. At 100 TB this is the q85 plan shape: everything "
    "rides one hash partitioning on the key.",
    tags=("window", "temporal", "gapfill", "locf"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.withColumn("v_filled", F.last("v", ignorenulls=True).over(w))


# ---------------------------------------------------------------------------
# q89 — interval overlap join (sessions × busiest hours)
# ---------------------------------------------------------------------------
@T.add(
    "q89_interval_overlap",
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
),
sess AS (
  SELECT user_id, session_no,
         min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, session_no
),
hours AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) AS hb, count(*)::BIGINT AS hour_events
  FROM events GROUP BY 1
),
hot AS (
  SELECT hb, hour_events FROM (
    SELECT hb, hour_events,
           row_number() OVER (ORDER BY hour_events DESC, hb) AS rn
    FROM hours
  ) WHERE rn <= 20
)
SELECT sess.user_id, sess.session_no, sess.session_start, sess.session_end,
       hot.hb AS hour_bucket, hot.hour_events
FROM sess JOIN hot
  ON floor(epoch(sess.session_start))::BIGINT < (hot.hb + 1) * 3600
 AND floor(epoch(sess.session_end))::BIGINT >= hot.hb * 3600
""",
    doc="Interval OVERLAP join: which user sessions (q43's gaps-and-islands "
    "intervals) overlap the 20 busiest hours of the feed — the "
    "interval×interval temporal join (Flink interval join / kdb wj "
    "family), distinct from q49's point-range join and q15's as-of. "
    "Spark has no IEJoin, so the raw double-inequality predicate would "
    "plan as a nested loop; instead each session explodes into the hour "
    "buckets it spans (sequence(start_hb, end_hb) — fan-out bounded by "
    "session duration, itself bounded by the 30-min-gap rule) and "
    "equi-joins the broadcast hot-hour list on the bucket id. Bucket "
    "membership is EXACTLY the half-open overlap predicate (floor "
    "arithmetic both sides), so DuckDB's native IEJoin on the raw "
    "inequalities is the exact oracle. Hot hours use an integer "
    "(count, bucket) rank — no FP threshold surface; the output keys "
    "are the bucket id, not a constructed timestamp, so no session-"
    "timezone surface either. At 100 TB: sessionization is one user_id "
    "exchange (q43), the hour histogram is one map-side-combined "
    "rollup, and the overlap join broadcasts 20 rows.",
    tags=("join", "interval", "temporal", "sessionize"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import q43

    sess = q43(spark, sf_dir).drop("n_events")
    sec_of = lambda c: F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"
    )
    ev = _t(spark, sf_dir, "events")
    hours = (
        ev.select(F.floor(sec_of("ts") / 3600).cast("long").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).alias("hour_events"))
    )
    hot = hours.orderBy(F.desc("hour_events"), "hb").limit(20)
    spanned = sess.select(
        "user_id",
        "session_no",
        "session_start",
        "session_end",
        F.explode(
            F.sequence(
                F.floor(sec_of("session_start") / 3600).cast("long"),
                F.floor(sec_of("session_end") / 3600).cast("long"),
            )
        ).alias("hb"),
    )
    return spanned.join(F.broadcast(hot), "hb").select(
        "user_id",
        "session_no",
        "session_start",
        "session_end",
        F.col("hb").alias("hour_bucket"),
        "hour_events",
    )


# ---------------------------------------------------------------------------
# q151 — calendar-arithmetic matrix: the per-engine temporal mappings
# ---------------------------------------------------------------------------
@T.add(
    "q151_calendar_arithmetic",
    oracle="""
SELECT extract(dow FROM ts)::BIGINT AS dow,
       CAST(date_trunc('month', ts + INTERVAL 1 MONTH) AS TIMESTAMP)
         AS next_month,
       last_day(CAST(ts AS DATE)) AS eom,
       count(*)::BIGINT AS n,
       CAST(min(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
         AS BIGINT) AS min_days,
       CAST(max(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
         AS BIGINT) AS max_days,
       CAST(sum(epoch(date_trunc('second', ts))::BIGINT) AS BIGINT)
         AS sum_epoch
FROM events
GROUP BY 1, 2, 3
""",
    doc="Calendar-arithmetic matrix over events — the registered-spec "
    "companion of fuzz grammar #22 (the q143/q146 precedent: every "
    "dialect-pair surface gets one spec pinning the mapping): "
    "day-of-week profile via the PINNED per-engine mapping (Spark "
    "dayofweek(ts)-1 == DuckDB extract(dow) — the shared-text form "
    "diverges, tests/test_fuzz_differential.py::"
    "test_extract_dow_divergence), day-distance via Spark "
    "datediff(a,b) == DuckDB date_diff('day',b,a) (DATE - DATE "
    "diverges at the type level), epoch seconds via to_unix_timestamp "
    "== epoch (UTC session pins the NTZ reading), month-CLAMPED "
    "next-month buckets (ts + INTERVAL 1 MONTH — Jan 29-31 all clamp "
    "into Feb 29 2024, exercising the boundary the grammar sweeps), "
    "and last_day end-of-month anchors (shared syntax, probed). "
    "100 TB: ONE map-side-partial hash aggregate; group count is "
    "bounded by |dow| x |months| x |month-ends| (~tens), so the "
    "exchange moves partial rows only — the flat-profile rollup "
    "shape. The BIGINT casts dodge DuckDB's HUGEINT sum widening "
    "(the standing lint trap). Reference counterpart: none "
    "(north-star extension; the reference's hourly DAG schedule is "
    "the only calendar logic it has).",
    tags=("temporal", "calendar", "dialect", "events"),
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    days_since = F.datediff(d, F.lit("2024-01-01").cast("date")).cast("bigint")
    return (
        e.select(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.date_trunc("month", F.col("ts") + F.expr("INTERVAL 1 MONTH"))
            .cast("timestamp")
            .alias("next_month"),
            F.last_day(d).alias("eom"),
            days_since.alias("_days"),
            # date_trunc('second') on BOTH sides: events.ts carries
            # sub-second micros, and the engines disagree on the
            # fraction (Spark to_unix_timestamp truncates, DuckDB
            # epoch()::BIGINT rounds) — grammar #22's extract(second)
            # pin is the same fraction trap
            F.expr(
                "CAST(to_unix_timestamp(date_trunc('second', ts)) AS BIGINT)"
            ).alias("_epoch"),
        )
        .groupBy("dow", "next_month", "eom")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("_days").alias("min_days"),
            F.max("_days").alias("max_days"),
            F.sum("_epoch").cast("bigint").alias("sum_epoch"),
        )
    )


# ---------------------------------------------------------------------------
# q155 — window frame / null-ordering / tie matrix
# ---------------------------------------------------------------------------
@T.add(
    "q155_window_frame_matrix",
    oracle="""
WITH w AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END AS val,
         CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amt
  FROM orders
)
SELECT o_orderkey,
  CAST(rank() OVER (PARTITION BY o_custkey
       ORDER BY val DESC NULLS LAST) AS BIGINT) AS rnk,
  CAST(dense_rank() OVER (PARTITION BY o_custkey
       ORDER BY bucket DESC) AS BIGINT) AS drnk,
  CAST(row_number() OVER (PARTITION BY o_custkey
       ORDER BY val ASC NULLS FIRST, o_orderkey) AS BIGINT) AS rn,
  CAST(sum(amt) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS s_back,
  CAST(sum(amt) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS s_fwd,
  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY bucket
       RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS c_rng,
  CAST(lead(bucket, 2, -1) OVER (PARTITION BY o_custkey
       ORDER BY o_orderkey) AS BIGINT) AS ld
FROM w
""",
    doc="Window frame / null-ordering / tie matrix over orders — the "
    "registered-spec companion of fuzz grammar #23 (the q151/#22 "
    "precedent: every dialect surface the fuzzer sweeps gets one spec "
    "pinning the agreed mapping). Eight window shapes share ONE "
    "partitioning: rank with DESC NULLS LAST over a nullable measure "
    "(null placement must be SPELLED — Spark's bare DESC defaults "
    "NULLS LAST, DuckDB's NULLS FIRST, the fuzzer-caught divergence), "
    "dense_rank over a deliberately tie-prone bucket (gap vs no-gap "
    "tie behavior), row_number with ASC NULLS FIRST + key tiebreak "
    "(total order => deterministic), a NEGATIVE-END rows frame "
    "(3 PRECEDING .. 1 PRECEDING — NULL sum on each partition's first "
    "row), a FOLLOWING-only frame (1 FOLLOWING .. UNBOUNDED "
    "FOLLOWING), a RANGE frame over integer buckets (peers + adjacent "
    "bucket), and lead(offset=2, default=-1). Money sums run in "
    "DECIMAL and cast to DOUBLE at the edge (the q74 cent-rounding "
    "lesson — double-sum frames would diverge in the last ulp). "
    "100 TB: every window partitions by o_custkey (high cardinality, "
    "no skew key), so the plan is ONE hash exchange on custkey with "
    "per-partition sorts — no global sort, no single-reducer window; "
    "frames are constant-width, so state per row is O(1). "
    "Reference counterpart: none (north-star extension).",
    tags=("window", "frames", "dialect", "relational"),
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("val"),
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
    )
    pb = Window.partitionBy("o_custkey")
    return w.select(
        "o_orderkey",
        F.rank()
        .over(pb.orderBy(F.desc_nulls_last("val")))
        .cast("bigint")
        .alias("rnk"),
        F.dense_rank()
        .over(pb.orderBy(F.desc("bucket")))
        .cast("bigint")
        .alias("drnk"),
        F.row_number()
        .over(pb.orderBy(F.asc_nulls_first("val"), "o_orderkey"))
        .cast("bigint")
        .alias("rn"),
        F.sum("amt")
        .over(pb.orderBy("o_orderkey").rowsBetween(-3, -1))
        .cast("double")
        .alias("s_back"),
        F.sum("amt")
        .over(pb.orderBy("o_orderkey").rowsBetween(1, Window.unboundedFollowing))
        .cast("double")
        .alias("s_fwd"),
        F.count(F.lit(1))
        .over(pb.orderBy("bucket").rangeBetween(-1, 0))
        .cast("bigint")
        .alias("c_rng"),
        F.lead("bucket", 2, -1)
        .over(pb.orderBy("o_orderkey"))
        .cast("bigint")
        .alias("ld"),
    )
