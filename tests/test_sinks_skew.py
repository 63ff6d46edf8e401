"""CSV export/read round-trip (reference K3/S4 — previously untested) and
the salted-join equivalence invariant."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.operators.skew import salted_join
from etl_dag_paris_velib_spark.schemas import VELIB_ENVELOPE_SCHEMA
from etl_dag_paris_velib_spark.sinks.writers import export_csv
from etl_dag_paris_velib_spark.sources.readers import read_csv, read_json
from etl_dag_paris_velib_spark.sources.velib import flatten_station_status
from tests.conftest import SF_SMOKE


def test_csv_roundtrip(spark, fixtures_dir, tmp_path):
    flat = flatten_station_status(
        read_json(
            spark,
            f"{fixtures_dir}/station_status.json",
            VELIB_ENVELOPE_SCHEMA,
            multiline=True,
        )
    ).select("station_id", "num_bikes_available", "last_reported")
    out = str(tmp_path / "export")
    export_csv(flat, out)
    back = read_csv(spark, out, flat.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, flat.collect()))


def test_salted_join_equals_plain_join(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("user_id", "value")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    plain = events.join(cust, events.user_id == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    salted = salted_join(events, cust, "user_id", "c_custkey", salts=8).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_orc_export_round_trips_natively(spark, tmp_path):
    """ORC keeps native types through the write-read cycle (contrast the
    CSV boundary, which stringifies timestamps by contract)."""
    from etl_dag_paris_velib_spark.sinks.writers import export_orc
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    src = load_table(spark, "orders", "/root/testdata/sf0.001")
    p = str(tmp_path / "orders_orc")
    export_orc(src, p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The third skew tool next to salting (operators/skew.py) and
    bucketing (test_bucketing.py): AQE's runtime skew-join split. With
    the thresholds scaled down to testdata size, a join where one key
    holds ~95% of the rows must show SortMergeJoin(skew=true) in the
    FINAL adaptive plan — Spark re-planned the hot partition into
    sub-splits at runtime, no code change needed. This is the default
    answer at 100 TB when the skew is not known ahead of time (salting
    is for when it is)."""
    import re

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # force a shuffle join: broadcasting the small side would dodge
        # the skew instead of demonstrating the split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 285_000, F.lit(0))
            .otherwise((F.col("id") % 64) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(65).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # global aggregate above the join: a groupBy on the join key would
        # legally block the split (it requires the unsplit hash
        # distribution), which is itself part of the lesson
        # sum(v) keeps the unique-valued column through the shuffle: with
        # only the constant key surviving column pruning, the hot
        # partition lz4-compresses below any detection threshold
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        [row] = joined.collect()
        assert row["n"] == 300_000  # correctness unaffected by the split
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"SortMergeJoin.*skew=true", plan) or "skew=true" in plan, (
            plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
