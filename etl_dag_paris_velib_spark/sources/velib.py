"""Vélib GBFS station_status ingestion — the reference's station branch
(etl_dag.py:168-311) re-expressed as one lazy Spark plan.

Reference pipeline: HTTP fetch → JSON to S3 → download → pd.json_normalize →
7-column projection → epoch→string timestamps → CSV to S3 → download →
pandas → row-at-a-time Postgres inserts (five serialization hops, SURVEY §3.3).

Here: ``read_json(envelope schema) → explode(data.stations) → project/cast →
lineage columns`` — a single whole-stage-codegen pass from scan to sink. The
HTTP fetch stays outside the engine behind a fetcher seam (SURVEY §7): the
engine only ever sees files or DataFrames, so tests inject fixture JSON.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import surrogate_key, with_lineage
from ..schemas import VELIB_ENVELOPE_SCHEMA
from .readers import read_json

#: GBFS bike-type counts arrive as an array of single-key maps
#: [{'mechanical': 1}, {'ebike': 0}] (research.ipynb; SURVEY §1.3). Normalize
#: to scalar columns by folding the array of maps into one map then indexing.
_BIKE_TYPES = ("mechanical", "ebike")


def _bike_type_count(kind: str):
    merged = F.aggregate(
        F.col("s.num_bikes_available_types"),
        F.create_map().cast("map<string,int>"),
        lambda acc, m: F.map_concat(acc, m),
    )
    return F.coalesce(merged[kind], F.lit(0))


def flatten_station_status(envelope: DataFrame) -> DataFrame:
    """Envelope → one row per station with faithful types.

    Equivalent of reference ``pd.json_normalize(raw["data"]["stations"])`` +
    projection + epoch conversion (etl_dag.py:225-242), with the columns the
    reference dropped (stationCode, bike-type split) retained per SURVEY §1.5.
    """
    return envelope.select(
        F.explode("data.stations").alias("s"), F.col("lastUpdatedOther")
    ).select(
        F.col("s.station_id").alias("station_id"),
        F.col("s.stationCode").alias("station_code"),
        F.col("s.num_bikes_available").alias("num_bikes_available"),
        _bike_type_count("mechanical").alias("num_bikes_mechanical"),
        _bike_type_count("ebike").alias("num_bikes_ebike"),
        F.col("s.num_docks_available").alias("num_docks_available"),
        F.col("s.is_installed").alias("is_installed"),
        F.col("s.is_renting").alias("is_renting"),
        F.col("s.is_returning").alias("is_returning"),
        F.timestamp_seconds("s.last_reported").alias("last_reported"),
        surrogate_key("s.station_id", "s.last_reported").alias("record_id"),
    )


def ingest_station_status(
    spark: SparkSession,
    json_path: str,
    run_ts: datetime,
    dag_id: str = "citymapper_dag",
    task_id: str = "transfer_station_status_data",
) -> DataFrame:
    """Full station branch: bronze JSON → flat, typed, lineage-stamped rows.

    Append to the accumulated table with
    ``df.write.partitionBy("ingest_date", "ingest_hour").mode("overwrite")``
    under dynamic partition overwrite → exactly-once per run (SURVEY §7).
    """
    # one pretty-printed API envelope per poll file → multiline parse
    envelope = read_json(spark, json_path, VELIB_ENVELOPE_SCHEMA, multiline=True)
    flat = flatten_station_status(envelope)
    return with_lineage(flat, run_ts, dag_id, task_id)


def with_ingest_partitions(df: DataFrame, ts_col: str = "execution_date") -> DataFrame:
    """Add hive-style partition columns. The reference encodes run time in
    S3 filenames under one flat prefix (etl_dag.py:185,192) — unprunable;
    a dt/hour layout gives partition pruning on time predicates for free."""
    return df.withColumn(
        "ingest_date", F.date_format(ts_col, "yyyy-MM-dd")
    ).withColumn("ingest_hour", F.date_format(ts_col, "HH"))
