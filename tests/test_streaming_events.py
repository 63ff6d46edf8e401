"""Stream-stream interval join: the streaming events feed joined to
itself (clicks -> purchases) with watermark-bounded state, checked against
the identical batch join."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.sources.tpch import normalize_event_ts
from etl_dag_paris_velib_spark.streaming.events import purchase_click_attribution
from etl_dag_paris_velib_spark.streaming.gbfs import run_available_now
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path, spark):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    return str(d)


def _batch_matches(batch):
    clicks = batch.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = batch.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
    )


@pytest.fixture()
def split_events_dir(tmp_path, spark):
    """The events split into two files at a point BETWEEN a known matched
    click/purchase pair, so the join's state must carry the batch-1 click
    forward to match the batch-2 purchase."""
    import os

    d = tmp_path / "events_split"
    d.mkdir()
    batch = normalize_event_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    strict = (
        _batch_matches(batch)
        .filter(F.col("click_ts") < F.col("purchase_ts"))
        .orderBy("purchase_ts")
        .first()
    )
    assert strict is not None, "testdata must contain a strict click<purchase pair"
    # split strictly below the purchase at MICROSECOND resolution (the
    # join compares micro-truncated timestamps, so one microsecond under
    # the purchase is the tightest strict split)
    from datetime import timedelta

    split = strict.purchase_ts - timedelta(microseconds=1)
    batch.filter(F.col("ts") <= F.lit(split)).coalesce(1).write.parquet(str(d / "b0"))
    batch.filter(F.col("ts") > F.lit(split)).coalesce(1).write.parquet(str(d / "b1"))
    files = []
    for sub in ("b0", "b1"):
        (part,) = [f for f in os.listdir(d / sub) if f.endswith(".parquet")]
        dest = d / f"poll_{sub}.parquet"
        os.rename(d / sub / part, dest)
        files.append(dest)
    shutil.rmtree(d / "b0")
    shutil.rmtree(d / "b1")
    os.utime(files[0], (1_700_000_000, 1_700_000_000))
    os.utime(files[1], (1_700_003_600, 1_700_003_600))
    return str(d), split


def test_interval_join_matches_batch(spark, events_dir):
    raw = spark.read.parquet(events_dir)
    batch = normalize_event_ts(raw)
    stream = normalize_event_ts(
        spark.readStream.schema(raw.schema).parquet(events_dir)
    )
    joined = purchase_click_attribution(stream)
    run_available_now(joined, "attrib_out", output_mode="append")
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("attrib_out").collect()
    }

    clicks = batch.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = batch.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r.p_user, r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert want, "testdata must contain attributable purchases"
    assert got == want


def test_interval_join_state_spans_batches(spark, split_events_dir):
    """Clicks buffered in micro-batch 1 must still match purchases that
    only arrive in micro-batch 2 — the state-store carry the hourly-poll
    deployment depends on."""
    d, split = split_events_dir
    raw = spark.read.parquet(d)
    batch = normalize_event_ts(raw)
    stream = normalize_event_ts(
        spark.readStream.schema(raw.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    run_available_now(
        purchase_click_attribution(stream), "attrib_split_out", output_mode="append"
    )
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("attrib_split_out").collect()
    }
    split_ts = F.lit(split)
    matched = _batch_matches(batch)
    want = {(r.p_user, r.purchase_id, r.click_id) for r in matched.collect()}
    cross_batch = {
        (r.p_user, r.purchase_id, r.click_id)
        for r in matched.filter(
            (F.col("click_ts") <= split_ts) & (F.col("purchase_ts") > split_ts)
        ).collect()
    }
    assert cross_batch, "split point must produce cross-batch attributions"
    assert cross_batch <= got  # state carried batch-1 clicks into batch 2
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    """Stream-static broadcast join: the drained stream must equal the
    identical batch join, and the plan must carry no streaming state
    (stateless map-side enrichment)."""
    from etl_dag_paris_velib_spark.sources.tpch import load_table
    from etl_dag_paris_velib_spark.streaming.events import enrich_with_customers

    customers = load_table(spark, "customer", SF_SMOKE)
    raw = spark.read.parquet(events_dir)
    batch = normalize_event_ts(raw)
    stream = normalize_event_ts(spark.readStream.schema(raw.schema).parquet(events_dir))

    run_available_now(
        enrich_with_customers(stream, customers), "enriched_out", output_mode="append"
    )
    got = {
        (r.event_id, r.customer_name, r.mktsegment)
        for r in spark.table("enriched_out").collect()
    }
    want = {
        (r.event_id, r.customer_name, r.mktsegment)
        for r in enrich_with_customers(batch, customers).collect()
    }
    assert got == want
    assert len(got) == raw.count()
    # left join must have matched every user (user_id 0..149 ⊂ custkeys)
    assert all(name is not None for _, name, _ in got)


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """Streaming KMV distinct-count over two forced micro-batches: the
    sketch state (k smallest hashes) carries across batches, and the
    LAST emission per event type is bit-identical to the batch
    kmv_distinct over everything streamed — the merge law applied to an
    unbounded feed."""
    import os

    from etl_dag_paris_velib_spark.operators.sketch import kmv_distinct
    from etl_dag_paris_velib_spark.streaming.events import (
        streaming_distinct_users,
    )

    d = tmp_path / "events_kmv"
    d.mkdir()
    batch = normalize_event_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    for i, half in enumerate(
        (batch.filter("event_id % 2 = 0"), batch.filter("event_id % 2 = 1"))
    ):
        sub = d / f"b{i}"
        half.coalesce(1).write.parquet(str(sub))
        (part,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / part, d / f"poll_{i}.parquet")
        shutil.rmtree(sub)

    raw = spark.read.parquet(str(d))
    stream = spark.readStream.schema(raw.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d))
    run_available_now(
        streaming_distinct_users(stream, k=16), "kmv_out", output_mode="update"
    )
    rows = spark.table("kmv_out").collect()
    last = {}
    for r in rows:
        if r.event_type not in last or r.n_batches > last[r.event_type].n_batches:
            last[r.event_type] = r
    # both files contain every event type, so state evolved over 2 batches
    assert all(r.n_batches == 2 for r in last.values()), rows

    want = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(
            batch.select("event_type", "user_id"), "event_type", "user_id", k=16
        ).collect()
    }
    got = {t: r.est_distinct for t, r in last.items()}
    assert got == want


# ---------------------------------------------------------------------------
# driver-checkable streaming specs (plans/streamq.py)
# ---------------------------------------------------------------------------

def test_streamq_dedup_suppresses_planted_doubles(spark):
    """q110 unions the event stream with itself; the drained sink must
    hold each event exactly ONCE (the watermarked dedup worked) — the
    property the DuckDB oracle then prices in aggregate."""
    from etl_dag_paris_velib_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    base = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = REGISTRY.specs["q110_stream_dedup_rollup"].fn(spark, SF_SMOKE)
    got = {r["event_type"]: r["n_events"] for r in out.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in base.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want  # doubled input, un-doubled output


def test_streamq_window_rollup_totals(spark):
    """q108's streaming windowed rollup must partition the event count:
    sum of per-window n_events == total events (no row lost or double-
    counted across window boundaries)."""
    from pyspark.sql import functions as F

    from etl_dag_paris_velib_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    out = REGISTRY.specs["q108_stream_hourly_rollup"].fn(spark, SF_SMOKE)
    total = out.agg(F.sum("n_events")).first()[0]
    n = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert total == n
    # windows are exactly one hour and epoch-aligned
    bad = out.filter(
        (F.unix_timestamp("window_end") - F.unix_timestamp("window_start") != 3600)
        | (F.unix_timestamp("window_start") % 3600 != 0)
    )
    assert bad.count() == 0


def test_streamq_drain_guard_rejects_batch_fallback(spark):
    """_drain_to_memory must refuse to return when the streaming engine
    processed zero rows (the evidence guard the driver row relies on)."""
    import pytest

    from etl_dag_paris_velib_spark.plans.streamq import _drain_to_memory

    empty_dir = "/tmp/streamq_empty_dir"
    import os

    os.makedirs(empty_dir, exist_ok=True)
    s = spark.readStream.schema("a long").parquet(empty_dir)
    with pytest.raises(RuntimeError, match="zero input rows"):
        _drain_to_memory(s, "emptytest", "append")


def test_crawl_admission_crash_replay(spark, tmp_path):
    """q158's idempotency claim, crash-tested (the r11 verdict's #1):
    kill the stream AFTER a micro-batch's kept/index writes but BEFORE
    its checkpoint commit, restart from the same checkpoint (the batch
    replays — foreachBatch is at-least-once), and assert the kept table
    AND both index tables equal an uninterrupted twin run's exactly.
    Under the old blind-append sink this fails: the replayed batch
    double-appends its admitted rows and index artifacts, and the
    doubled index then flips later batches' admission decisions."""
    import os

    from etl_dag_paris_velib_spark.plans.streamq import (
        run_crawl_admission,
        stage_crawl_batches,
    )
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    docs = load_table(spark, "documents", SF_SMOKE)

    def rows(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    # uninterrupted twin
    clean_root = str(tmp_path / "clean")
    os.makedirs(clean_root)
    src = stage_crawl_batches(docs, clean_root)
    k0, b0, h0, moved = run_crawl_admission(spark, docs.schema, src, clean_root)
    assert len(moved) == 3

    # crashed run: batch 1 dies after ALL its writes, before the commit —
    # the exact window where an append sink double-writes on replay
    crash_root = str(tmp_path / "crash")
    os.makedirs(crash_root)
    src2 = stage_crawl_batches(docs, crash_root)
    crashed = []

    def die_once(batch_id):
        if batch_id == 1 and not crashed:
            crashed.append(batch_id)
            raise RuntimeError("injected crash between writes and commit")

    with pytest.raises(Exception, match="injected crash"):
        run_crawl_admission(
            spark, docs.schema, src2, crash_root, fail_hook=die_once
        )
    # the dangerous window is real: the doomed attempt's writes all landed
    assert crashed == [1]
    for sub in ("kept", "index_bands", "index_hashes"):
        assert os.path.exists(os.path.join(crash_root, sub, "batch=1"))

    # restart from the same checkpoint: batch 1 replays (overwriting its
    # own partitions), batch 2 runs once — final state must match clean
    k1, b1, h1, moved2 = run_crawl_admission(
        spark, docs.schema, src2, crash_root, fail_hook=die_once
    )
    assert rows(k1) == rows(k0)
    assert rows(b1) == rows(b0)
    assert rows(h1) == rows(h0)
