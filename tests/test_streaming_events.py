"""Stream-stream interval join: the streaming events feed joined to
itself (clicks -> purchases) with watermark-bounded state, checked against
the identical batch join."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.streaming.events import purchase_click_attribution
from etl_dag_paris_velib_spark.streaming.gbfs import run_available_now
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path, spark):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_interval_join_matches_batch(spark, events_dir):
    raw = spark.read.parquet(events_dir)
    # events.parquet carries nanos timestamps read as long under
    # nanosAsLong (session conf) — convert exactly like sources.tpch
    to_ts = F.expr("timestamp_micros(ts DIV 1000)")
    batch = raw.withColumn("ts", to_ts)
    stream = (
        spark.readStream.schema(raw.schema).parquet(events_dir).withColumn("ts", to_ts)
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
