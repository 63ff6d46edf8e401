"""Physical-plan regression tests: lock in the plan properties the 100 TB
design depends on (pushdown reaching the scan, dims broadcast, bounded
shuffle counts), so a refactor that silently degrades a plan fails CI —
not the bench three rounds later. Plus the FAILFAST read contract."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q02_predicates_reach_parquet_scan(spark):
    plan = _plan(spark, "q02_forecast_revenue")
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_q05_dims_are_broadcast(spark):
    plan = _plan(spark, "q05_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no fact-fact shuffle join at this shape


def test_q20_dedup_is_single_shuffle(spark):
    plan = _plan(spark, "q20_exact_dedup")
    # one Exchange for the fingerprint window; AQE may add a read node but
    # never a second shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_vector_queries_broadcast_the_query_side(spark):
    for name in ("q22_vector_topk", "q29_ivf_topk"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" in plan, name


def test_failfast_on_malformed_json(spark, tmp_path):
    from etl_dag_paris_velib_spark.schemas import VELIB_ENVELOPE_SCHEMA
    from etl_dag_paris_velib_spark.sources.readers import read_json

    bad = tmp_path / "bad.json"
    bad.write_text('{"lastUpdatedOther": "not-a-long", "data": []}')
    with pytest.raises(Exception, match="MALFORMED_RECORD_IN_PARSING|FAILFAST"):
        read_json(spark, str(bad), VELIB_ENVELOPE_SCHEMA, multiline=True).collect()
