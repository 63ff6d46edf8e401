"""Loaders for the driver's testdata star schema (TESTDATA.md)."""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-session DataFrame cache. spark.read.parquet() lists the path and reads
# a footer for schema on every call; across a 50+ query suite each table is
# re-opened dozens of times for identical immutable testdata. DataFrames are
# immutable lazy plans, so handing back the same object is safe; keying on
# the session (weakly — a stopped session must not be pinned) keeps plans
# from leaking across JVMs.
_TABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Bring events.ts to plain TimestampType whatever the runtime read it as.

    events.parquet stores INT64 TIMESTAMP(NANOS). Older Spark needed
    ``spark.sql.legacy.parquet.nanosAsLong`` and surfaced raw long nanos;
    Spark 4.1 reads the column natively as TIMESTAMP_NTZ (micro-truncated).
    Streaming interval joins and watermark arithmetic want a single concrete
    type, so convert either representation to TimestampType (session TZ is
    UTC, so the NTZ cast preserves the wall clock and matches DuckDB).
    Works on batch and streaming DataFrames alike.
    """
    t = df.schema["ts"].dataType
    if isinstance(t, T.LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if isinstance(t, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    # Runtime-settable SQL conf so a VANILLA SparkSession (e.g. an external
    # harness that did not go through session.get_spark) can read
    # events.parquet's INT64 TIMESTAMP(NANOS) column on older runtimes.
    # Spark 4.1 ignores it and reads the column natively as TIMESTAMP_NTZ;
    # both arrival types are handled below / by normalize_event_ts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Older runtimes (nanosAsLong honored) surface ts as raw long nanos:
    # convert nanos → micros → TimestampType, matching DuckDB's truncation
    # so the differential oracle agrees. On Spark 4.1 ts arrives as
    # TIMESTAMP_NTZ and this branch is skipped.
    # Integer division (DIV) — float division would round-trip the long
    # through double and lose sub-microsecond precision at 1.7e18 nanos.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    per_session[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
