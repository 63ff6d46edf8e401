"""Bucketed co-located join: the 100 TB shuffle-elimination strategy.

Writing both fact tables bucketed+sorted on the join key lets the
sort-merge join read pre-partitioned, pre-sorted buckets — zero Exchange
in the plan. This is the layout a recurring 100 TB join pays for once at
write time and amortizes over every downstream query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def warehouse_tables(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    ords = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    for name in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ords.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "ord_bucketed"
    )
    yield "li_bucketed", "ord_bucketed"
    for name in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    li_t, ord_t = warehouse_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li_t).join(
            spark.table(ord_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets align: no shuffle either side
        # and the join result is right
        expected = (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_SMOKE}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
