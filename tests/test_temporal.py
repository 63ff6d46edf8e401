"""Temporal/sketch surface: range self-join, gap-filled rollup, count-min.

The bucketized range join is differential-tested against the naive
all-pairs predicate (the semantics it must reproduce WITHOUT planning an
all-pairs join), the CM sketch against its never-underestimates guarantee
and exactness at collision-free width, and the gap-fill against grid
density + mass conservation.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.operators.rangejoin import range_self_join_pairs
from etl_dag_paris_velib_spark.operators.sketch import cm_estimate, count_min_table
from etl_dag_paris_velib_spark.plans import REGISTRY

from tests.conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_self_join_matches_naive_predicate(spark):
    """Bucketized pairs == the raw range predicate evaluated all-pairs,
    including the exact-boundary gap, equal-timestamp ties (id-ordered,
    emitted once), and cross-bucket pairs."""
    base = dt.datetime(2024, 1, 1)
    secs = [0, 5, 29, 30, 31, 61, 61, 100, 100, 130]
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(secs)],
        ["event_id", "ts"],
    )
    got = {
        (r.id_a, r.id_b, r.gap_us)
        for r in range_self_join_pairs(df, max_gap_seconds=30).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r.id_a, r.id_b, r.gap_us)
        for r in a.crossJoin(b)
        .filter(
            (F.col("b.ts") >= F.col("a.ts"))
            & (
                F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
                <= 30_000_000
            )
            & (
                (F.col("a.ts") < F.col("b.ts"))
                | (F.col("a.event_id") < F.col("b.event_id"))
            )
        )
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias(
                "gap_us"
            ),
        )
        .collect()
    }
    assert got == naive
    assert (0, 3, 30_000_000) in got  # inclusive boundary
    assert (0, 4, 31_000_000) not in got  # just past the gap
    assert (5, 6, 0) in got and (6, 5, 0) not in got  # tie emitted once


def test_range_join_plan_has_no_nested_loop(spark):
    """The reason the operator exists: the plan must be an equi-join on
    the bucket id, never BroadcastNestedLoopJoin / CartesianProduct."""
    plan = _plan(REGISTRY.specs["q49_range_join_pairs"].fn(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_countmin_never_underestimates_and_exact_when_wide(spark):
    df = spark.range(2000).select((F.col("id") % 37).alias("k"))
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))

    est = cm_estimate(
        count_min_table(df, "k", depth=4, width=16), exact, "k", depth=4, width=16
    ).collect()
    assert len(est) == 37
    assert all(r.cm_est >= r.exact_cnt for r in est)  # CM's one-sided error
    assert any(r.cm_est > r.exact_cnt for r in est)  # width 16 < 37 must collide

    wide = cm_estimate(
        count_min_table(df, "k", depth=4, width=4096), exact, "k", depth=4, width=4096
    ).collect()
    assert all(r.cm_est == r.exact_cnt for r in wide)  # collision-free -> exact


def test_gapfill_grid_is_dense_and_mass_conserving(spark):
    out = REGISTRY.specs["q50_gapfill_rollup"].fn(spark, SF_SMOKE).collect()
    types = {r.event_type for r in out}
    hours = {r.bucket_hour for r in out}
    assert len(out) == len(types) * len(hours)  # dense grid, no holes
    assert all(r.n_events is not None and r.n_events >= 0 for r in out)
    total = sum(r.n_events for r in out)
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    assert total == load_table(spark, "events", SF_SMOKE).count()  # fill adds 0s only
    assert any(r.n_events == 0 for r in out)  # and there ARE gaps to fill


def test_bloom_semi_join_exact_and_pruning(spark):
    """bloom_semi_join must equal the plain left-semi join (false
    positives die at the exact join); bloom_prune must pass a superset of
    true matches while dropping most non-matching rows."""
    from etl_dag_paris_velib_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
        bloom_semi_join,
    )
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    dim = (
        load_table(spark, "orders", SF_SMOKE)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    got = {
        r.l_orderkey
        for r in bloom_semi_join(li, dim, "l_orderkey", "o_orderkey")
        .select("l_orderkey")
        .collect()
    }
    plain = {
        r.l_orderkey
        for r in li.join(
            dim, li.l_orderkey == dim.o_orderkey, "left_semi"
        )
        .select("l_orderkey")
        .collect()
    }
    assert got == plain and got  # exact, and non-vacuous

    bloom = bloom_build(dim, "o_orderkey")
    n_fact = li.count()
    n_true = li.filter(F.col("l_orderkey").isin(plain)).count()
    n_pruned = bloom_prune(li, "l_orderkey", bloom).count()
    assert n_true <= n_pruned  # never drops a true match
    assert n_pruned < n_fact  # and actually prunes
    # at 64k bits / 3 probes over ~300 keys the fp rate is ~0: the pass
    # set should hug the true set, not the fact table
    assert n_pruned <= int(n_true * 1.05) + 10


def test_rolling_range_frame_matches_naive(spark):
    # Brute-force check on one user's events: the range frame must include
    # exactly the events within the trailing 300s, peers-at-same-ts included.
    import pytest

    import __spark_entry__ as entrymod
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    from etl_dag_paris_velib_spark.functions.scalar import ntz_epoch_us

    out = entrymod.queries()["q60_rolling_range_frame"](spark, SF_SMOKE)
    ev = (
        load_table(spark, "events", SF_SMOKE)
        .select("event_id", "user_id", "value", ntz_epoch_us("ts").alias("us"))
    )
    uid = ev.select("user_id").first().user_id
    rows = ev.filter(F.col("user_id") == uid).collect()
    got = {
        r.event_id: (r.n_5min, r.value_5min)
        for r in out.filter(F.col("user_id") == uid).collect()
    }
    for r in rows:
        frame = [x for x in rows if r.us - 300_000_000 <= x.us <= r.us]
        n, v = got[r.event_id]
        assert n == len(frame)
        assert v == pytest.approx(round(sum(x.value for x in frame), 6), abs=1e-5)
