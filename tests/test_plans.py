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


def test_q63_rank_never_windows_whole_source(spark):
    # the selection rank must come from the (source, bucket) histogram
    # plan: the broadcast of the tiny histogram is present, and no window
    # exchange partitions by source alone (that's the single-reducer shape
    # the histogram rank exists to avoid). The tiny histogram's own
    # window IS partitioned by source — over |sources| x 51 rows — so the
    # assertion targets the exchange feeding the big row-level window,
    # identified by its (source, bkt) partitioning.
    plan = _plan(spark, "q63_quality_selection")
    assert "BroadcastHashJoin" in plan
    assert any(
        "hashpartitioning" in line and "bkt" in line and "source" in line
        for line in plan.splitlines()
        if "Exchange" in line
    )


def test_q65_shuffles_hashes_not_strings(spark):
    # the corpus-wide occurrence count must key on the 60-bit md5 long,
    # never the 15-token shingle string: the exchange feeding the count
    # window partitions by h
    plan = _plan(spark, "q65_repeated_spans")
    assert any(
        "hashpartitioning(h" in line
        for line in plan.splitlines()
        if "Exchange" in line
    )


def test_q66_unpivot_adds_no_shuffle(spark):
    """The melt must be a local Expand over the aggregate — exactly the
    one Exchange the groupBy needs, nothing for the reshape."""
    plan = _plan(spark, "q66_unpivot_metrics")
    assert "Expand" in plan
    assert plan.count("Exchange") == 1


def test_q67_single_window_pass(spark):
    """ntile/percent_rank/cume_dist share one window spec: one Window
    node, one Exchange, one Sort — not one pass per function."""
    plan = _plan(spark, "q67_rank_distribution")
    assert plan.count("Window") == 1
    # the rollup's grouping keys are a superset of the window partition
    # key, so the final aggregate reuses the window's Exchange: exactly 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_q68_vocab_is_broadcast(spark):
    """The corpus-frequency table must broadcast to the exploded token
    stream — a SortMergeJoin here would shuffle every token occurrence."""
    plan = _plan(spark, "q68_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q54_zero_shuffle(spark):
    """Repetition signals are row-local: one scan, an Arrow map, and NO
    Exchange — the exploded-gram groupBy form shuffled O(total grams)
    strings twice."""
    plan = _plan(spark, "q54_repetition_signals")
    assert plan.count("FileScan parquet") == 1
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_q74_subquery_is_decorrelated(spark):
    """The correlated scalar subquery must plan as a decorrelated
    aggregate joined LeftOuter — never a per-row re-execution (which
    would surface as a nested-loop join)."""
    plan = _plan(spark, "q74_correlated_subquery")
    assert "LeftOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-partkey max is partial-agg'd before its exchange
    assert "partial_max" in plan


def test_q79_merge_adds_no_exchange_above_union(spark):
    """Merging the base/delta partial aggregates must reuse their
    partitioning: exactly the two per-branch exchanges, none above the
    Union — the exchange-free merge IS the incremental-maintenance
    contract."""
    plan = _plan(spark, "q79_incremental_agg_merge")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Union" in plan


def test_q81_band_codes_single_arrow_pass(spark):
    """SRP band codes come from ONE Arrow batch (the integer GEMM) per
    scan branch, and the top-k prunes per-partition before the final
    q_id exchange (WindowGroupLimit Partial), so no partition collects a
    query's full candidate stream."""
    plan = _plan(spark, "q81_srp_lsh_topk")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_q82_window_expands_not_joins(spark):
    """The sliding window must plan as the codegen Expand (x4 overlap,
    data-size independent) — not a windows-table join — and the distinct
    count must pre-aggregate on (window, user) before the final
    per-window count."""
    plan = _plan(spark, "q82_sliding_distinct_users")
    assert "Expand" in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_q78_zorder_single_shuffle_pruned_scan(spark):
    """The bit interleave is pure codegen over a 2-column scan; the only
    exchange is the |buckets|-sized rollup."""
    plan = _plan(spark, "q78_zorder_layout")
    assert plan.count("Exchange") == 1
    assert "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint>" in plan


def test_q84_pair_join_is_equi_keyed(spark):
    """The basket self-join must key on l_orderkey (SortMerge/Hash join,
    never a nested-loop all-pairs), and top-25 must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "q84_copurchase_pairs")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_q86_pagerank_reads_two_columns_no_nested_loop(spark):
    """Edge build + two unrolled rank iterations stay equi-join only;
    the scan is pruned to (orderkey, suppkey)."""
    plan = _plan(spark, "q86_supplier_pagerank")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint>" in plan


def test_q85_scd2_single_user_exchange(spark):
    """Every window and the span rollup partition by user_id: one hash
    exchange on user_id feeds the whole plan (AQE may add nothing)."""
    plan = _plan(spark, "q85_scd2_history")
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert exchanges, plan[:500]
    assert all(e.startswith("user_id") for e in exchanges), exchanges


def test_q87_diff_is_single_outer_join(spark):
    """CDC diff = one full-outer equi-join on the key; the orderkey
    modulus filters reach the scan as data filters, and no nested loop
    appears."""
    plan = _plan(spark, "q87_snapshot_diff")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert "FullOuter" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_q88_locf_single_user_exchange(spark):
    """Forward fill rides one hash exchange on user_id (q85's shape)."""
    import re

    plan = _plan(spark, "q88_locf_forward_fill")
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert exchanges and all(e.startswith("user_id") for e in exchanges), exchanges


def test_q89_overlap_is_bucketized_broadcast(spark):
    """The interval overlap must run as explode + broadcast equi-join on
    the bucket id — never a nested-loop inequality join."""
    plan = _plan(spark, "q89_interval_overlap")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan


def test_q107_dim_joins_degrade_without_broadcast(spark):
    """The r05 verdict's scale flaw, locked: q107's item-count dims are
    corpus-linear (|parts| ~ 2B rows at 100 TB), so they must carry NO
    broadcast hint — with auto-broadcast disabled (simulating dims too
    large to fit) the dim joins MUST degrade to shuffle joins, while the
    explicitly-hinted 1-row basket total stays a (whitelisted) broadcast
    nested loop. With the default threshold the planner still broadcasts
    the small dims by its own size estimate — adaptivity both ways."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["q107_association_rules"]
    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, orig)
    assert "BroadcastHashJoin" not in plan, "dim join must not be hint-forced"
    assert (
        plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 2
    ), "both dim joins must degrade to shuffle joins"
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row total only

    # default threshold: the planner's own size estimate broadcasts the dims
    plan2 = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2


def test_readme_counts_match_registry():
    """The stale-count advice item recurred three rounds running; the
    counts are now machine-written (tools/inventory.py patches README.md
    from the registry) and this test pins them to the live registry so a
    spec added without re-running inventory fails CI."""
    import os
    import re

    from etl_dag_paris_velib_spark.plans import REGISTRY
    from tools.inventory import fuzz_query_count

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    n = len(REGISTRY.specs)
    max_q = max(
        int(m.group(1))
        for m in (re.match(r"q(\d+)", nm) for nm in REGISTRY.specs)
        if m
    )
    assert f"{n} specs, q01–q{max_q}" in readme
    assert f"the {n} hand-written specs" in readme
    assert f"{fuzz_query_count()} generated SQL queries" in readme
    ops = open(os.path.join(root, "OPERATORS.md")).read()
    assert ops.splitlines()[2].startswith(f"{n} specs;")
