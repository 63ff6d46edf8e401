"""Scalar column helpers used by the ingestion pipelines.

All are compositions of built-in ``pyspark.sql.functions`` — they stay inside
whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_to_ts(col) -> Column:
    """Epoch seconds → TimestampType (reference P3/P6: strftime per row at
    etl_dag.py:94-96 and pd.to_datetime at etl_dag.py:240-242)."""
    return F.timestamp_seconds(col)


def ntz_epoch_us(colname: str) -> Column:
    """Epoch microseconds (BIGINT) from a TIMESTAMP_NTZ column.

    Spark 4.1 reads parquet TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ
    (micro-truncated); ANSI forbids ``cast(ntz as bigint)`` and
    ``unix_micros`` rejects NTZ, while ``unix_timestamp`` would
    re-interpret the wall-clock in the session timezone. ``timestampdiff``
    from the NTZ epoch is legal, TZ-independent, and for positive epochs
    equals DuckDB's ``epoch_us(ts)`` on the same values.
    """
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" `{colname}`)"
    )


def surrogate_key(*cols) -> Column:
    """Deterministic surrogate key ``a_b_...`` (reference notebook's intended
    natural key station_id+'_'+last_reported, research.ipynb; SURVEY §1.5).
    Replaces the reference's Postgres SERIAL (etl_dag.py:124,269), which has
    no distributed equivalent — a value derived from the natural key is
    stable under retries and partition-parallel writes, SERIAL is neither."""
    return F.concat_ws("_", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])


def with_lineage(
    df: DataFrame, run_ts: datetime, dag_id: str, task_id: str
) -> DataFrame:
    """Lineage columns the reference appends per row in pandas
    (s3_to_postgres.py:63-69). ``lit()`` constants → Catalyst folds them;
    the reference materialized a python list of N copies."""
    return (
        df.withColumn("execution_date", F.lit(run_ts).cast("timestamp"))
        .withColumn("dag_id", F.lit(dag_id))
        .withColumn("task_id", F.lit(task_id))
    )
