"""SparkSession construction with scale-oriented defaults.

The reference executes eagerly on a single Celery worker with full
materialization between stages (SURVEY.md §4). Here the session is configured
once for lazy, whole-stage-codegen execution:

- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting, which is what keeps a fixed ``shuffle.partitions`` setting sane
  across scale factors (sf0.001 local test → 100 TB cluster).
- Arrow on: every pandas_udf / applyInPandas boundary is Arrow-batched.
- Dynamic partition overwrite: re-running an ingest hour replaces exactly that
  partition — the exactly-once semantics the reference lacks
  (reference retries double-insert; see s3_to_postgres.py:80-82 discussion in
  SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl-dag-paris-velib-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[N]`` where N = SPARK_GRAFT_CPUS (32 here);
    on a real cluster the caller passes the cluster master / lets
    spark-submit set it and this function only applies SQL confs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")

    confs = {
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # read nested parquet columns only when referenced
        "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
        # broadcast joins for dims up to 64 MB (region/nation/supplier/part
        # stay broadcast-able far beyond sf0.1)
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # keep timestamps deterministic across engines (oracle = DuckDB UTC)
        "spark.sql.session.timeZone": "UTC",
        # events.parquet stores INT64 TIMESTAMP(NANOS). Spark 4.1 reads it
        # natively as TIMESTAMP_NTZ (micro-truncated) and ignores this
        # legacy conf; on older runtimes the conf makes the column arrive
        # as long nanos, which sources.tpch.load_table then converts.
        # Harmless no-op on 4.1, load-bearing on 3.x — keep for both.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    # NOTE: spark.driver.memory cannot be set after the JVM starts — it must
    # come from spark-submit / SPARK_DRIVER_MEMORY before launch; setting it
    # via builder.config on an existing session is a silent no-op, so we
    # deliberately do not pass it here.
    if extra_conf:
        confs.update(extra_conf)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
