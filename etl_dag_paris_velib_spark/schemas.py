"""Explicit schemas for every source the engine reads.

The reference infers types at read and pins a (partly wrong) DDL at the sink
(SURVEY.md §1.4-1.5: ``station_id`` declared FLOAT despite values >int32,
``is_renting`` declared TEXT, etc. — reference airflow/dags/etl_dag.py:266-283).
We declare source-faithful types once and enforce them at read time: schema
drift becomes an analysis error, not a silent Postgres coercion.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Vélib GBFS station_status feed (reference etl_dag.py:177-196, 225-242;
# envelope shape documented in research/research.ipynb).
# ---------------------------------------------------------------------------

#: One station record inside data.stations. Faithful types per SURVEY §1.5:
#: station_id is a JSON integer up to ~1.9e10 (> int32) → LongType;
#: is_* flags are 0/1 ints → IntegerType (kept as int, not bool, to match
#: the GBFS wire format); num_bikes_available_types is an array of
#: single-key maps [{'mechanical': 1}, {'ebike': 0}].
STATION_STRUCT = StructType(
    [
        StructField("station_id", LongType()),
        StructField("stationCode", StringType()),
        StructField("is_installed", IntegerType()),
        StructField("is_renting", IntegerType()),
        StructField("is_returning", IntegerType()),
        StructField("last_reported", LongType()),
        StructField("num_bikes_available", IntegerType()),
        StructField("num_docks_available", IntegerType()),
        StructField("numBikesAvailable", IntegerType()),
        StructField("numDocksAvailable", IntegerType()),
        StructField(
            "num_bikes_available_types",
            ArrayType(MapType(StringType(), IntegerType())),
        ),
    ]
)

#: Full GBFS envelope: {lastUpdatedOther, ttl, data: {stations: [...]}}
VELIB_ENVELOPE_SCHEMA = StructType(
    [
        StructField("lastUpdatedOther", LongType()),
        StructField("ttl", LongType()),
        StructField(
            "data",
            StructType([StructField("stations", ArrayType(STATION_STRUCT))]),
        ),
    ]
)

#: Flat silver/gold schema for the accumulated station_status table
#: (reference table etl_dag.py:266-283 + faithful-type fixes + lineage).
STATION_STATUS_SCHEMA = StructType(
    [
        StructField("station_id", LongType()),
        StructField("station_code", StringType()),
        StructField("num_bikes_available", IntegerType()),
        StructField("num_bikes_mechanical", IntegerType()),
        StructField("num_bikes_ebike", IntegerType()),
        StructField("num_docks_available", IntegerType()),
        StructField("is_installed", IntegerType()),
        StructField("is_renting", IntegerType()),
        StructField("is_returning", IntegerType()),
        StructField("last_reported", TimestampType()),
        StructField("record_id", StringType()),  # surrogate: station_id_lastreported
        StructField("execution_date", TimestampType()),
        StructField("dag_id", StringType()),
        StructField("task_id", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# OpenWeatherMap one-call feed (reference etl_dag.py:36-55, 84-99).
# ---------------------------------------------------------------------------

WEATHER_CONDITION_STRUCT = StructType(
    [
        StructField("id", LongType()),
        StructField("main", StringType()),
        StructField("description", StringType()),
        StructField("icon", StringType()),
    ]
)

WEATHER_ENVELOPE_SCHEMA = StructType(
    [
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("timezone", StringType()),
        StructField("timezone_offset", LongType()),
        StructField(
            "current",
            StructType(
                [
                    StructField("dt", LongType()),
                    StructField("sunrise", LongType()),
                    StructField("sunset", LongType()),
                    StructField("temp", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("pressure", LongType()),
                    StructField("humidity", LongType()),
                    StructField("dew_point", DoubleType()),
                    StructField("uvi", DoubleType()),
                    StructField("clouds", LongType()),
                    StructField("visibility", LongType()),
                    StructField("wind_speed", DoubleType()),
                    StructField("wind_deg", LongType()),
                    StructField("weather", ArrayType(WEATHER_CONDITION_STRUCT)),
                ]
            ),
        ),
    ]
)

#: Flat weather table (reference etl_dag.py:122-139 + lineage).
WEATHER_SCHEMA = StructType(
    [
        StructField("temp", DoubleType()),
        StructField("feels_like", DoubleType()),
        StructField("pressure", IntegerType()),
        StructField("humidity", IntegerType()),
        StructField("wind_speed", DoubleType()),
        StructField("weather_description", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("execution_date", TimestampType()),
        StructField("dag_id", StringType()),
        StructField("task_id", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; TESTDATA.md). Parquet carries
# its own schema; these are the declared contracts used by tests and by
# multimodal/similarity operators.
# ---------------------------------------------------------------------------

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("label", IntegerType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: Multimodal rows: opaque binary payload + typed metadata (BASELINE.json
#: north-star). The decode step is stubbed (no image/audio libs in this
#: container) but the schema, partitioning, and UDF batch shapes are real.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
