"""OpenWeatherMap one-call ingestion — the reference's weather branch
(etl_dag.py:27-165) as one Spark plan.

Reference transform extracts six scalars from ``current.*`` plus
``current.weather[0].description`` and a formatted epoch timestamp
(etl_dag.py:84-99). Timestamps stay TimestampType end-to-end here; the
reference's strftime-to-string happens only at CSV export.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import with_lineage
from ..schemas import WEATHER_ENVELOPE_SCHEMA
from .readers import read_json


def flatten_weather(envelope: DataFrame) -> DataFrame:
    """Envelope → one flat row (reference P1/P2/P3, SURVEY §2.3)."""
    return envelope.select(
        F.col("current.temp").alias("temp"),
        F.col("current.feels_like").alias("feels_like"),
        F.col("current.pressure").cast("int").alias("pressure"),
        F.col("current.humidity").cast("int").alias("humidity"),
        F.col("current.wind_speed").alias("wind_speed"),
        # reference: current["weather"][0]["description"] (etl_dag.py:93)
        F.element_at("current.weather", 1)["description"].alias(
            "weather_description"
        ),
        F.timestamp_seconds("current.dt").alias("timestamp"),
    )


def ingest_weather(
    spark: SparkSession,
    json_path: str,
    run_ts: datetime,
    dag_id: str = "citymapper_dag",
    task_id: str = "transfer_weather_data",
) -> DataFrame:
    # one pretty-printed API envelope per poll file → multiline parse
    envelope = read_json(spark, json_path, WEATHER_ENVELOPE_SCHEMA, multiline=True)
    return with_lineage(flatten_weather(envelope), run_ts, dag_id, task_id)
