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
