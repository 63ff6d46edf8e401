"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in ``etl_dag_paris_velib_spark.plans``
(one :class:`QuerySpec` per declared capability, Spark plan + DuckDB
oracle adjacent in source); this module is a thin view over that
registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_dag_paris_velib_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    spec = REGISTRY.specs["q01_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.specs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; specs with ``oracle=None`` are
    non-SQL-expressible and get the driver's rows-only check."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.specs.items()
        if spec.oracle is not None
    }
