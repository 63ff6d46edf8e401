"""Batch readers (reference operators S3/S4/S5, SURVEY.md §2.1).

The reference downloads S3 objects to /tmp and reads them with pandas
(s3_to_postgres.py:55-60); Spark reads object-store paths directly through
the Hadoop connectors, so the "download" operator disappears — a path is a
path (``s3a://...`` or local). All readers take an explicit schema: inferred
schemas are a correctness hazard at scale (a single odd file reshapes the
table) and inference itself is an extra full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> DataFrame:
    """JSON read with a declared schema (reference S3: json.load at
    etl_dag.py:80-81/221-222).

    Default is NDJSON: a multiline file is ONE non-splittable parse task,
    which is fine for a 1,474-station hourly payload and a scale-killer
    for anything bigger — so splittable is the default and the
    pretty-printed API-envelope readers opt in with ``multiline=True``.
    """
    return (
        spark.read.schema(schema)
        .option("multiLine", "true" if multiline else "false")
        .option("mode", "FAILFAST")
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    """CSV read with declared schema (reference S4: pd.read_csv at
    s3_to_postgres.py:60 relies on inference; we do not)."""
    return (
        spark.read.schema(schema)
        .option("header", "true" if header else "false")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Schema comes from the file footer; column pruning and
    predicate pushdown reach the row-group level automatically."""
    return spark.read.parquet(path)
