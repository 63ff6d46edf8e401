"""Invariant tests for the graph-analytics specs (plans/graph.py) and the
SCD2 history build (plans/temporal.py:q85) — properties the DuckDB
differential can't see because both engines could share a systematic bug:
mass conservation, span contiguity, symmetry."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from etl_dag_paris_velib_spark.plans.graph import _cosupply_graph
from etl_dag_paris_velib_spark.sources.tpch import load_table
from tests.conftest import SF_SMOKE


def test_cosupply_graph_is_symmetric_no_self_loops(spark):
    edges, deg, n_nodes = _cosupply_graph(spark, SF_SMOKE)
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # symmetry: (a,b) present iff (b,a) present
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert fwd.exceptAll(rev).count() == 0
    assert deg.count() == n_nodes


def test_pagerank_mass_is_conserved(spark):
    """Symmetric graph, no dangling nodes ⇒ every iteration redistributes
    all rank: total mass stays 1 (up to FP) and every rank is positive."""
    df = entrymod.queries()["q86_supplier_pagerank"](spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(r["rank"] > 0 for r in rows)
    # recompute full (unlimited) rank sum via the same graph
    edges, deg, n_nodes = _cosupply_graph(spark, SF_SMOKE)
    rank = deg.select("src", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(2):
        contrib = (
            edges.join(rank.withColumnRenamed("src", "node"), F.col("node") == edges.src)
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("degree")).alias("share"))
        )
        rank = (
            contrib.groupBy("dst")
            .agg((F.lit(0.15 / n_nodes) + F.lit(0.85) * F.sum("share")).alias("rank"))
            .withColumnRenamed("dst", "src")
        )
        total = rank.agg(F.sum("rank")).first()[0]
        assert abs(total - 1.0) < 1e-9, total


def test_scd2_spans_partition_each_users_events(spark):
    """Per user: versions are 1..k contiguous, span event counts sum to
    the user's event count, exactly one open (is_current) span, and each
    closed span's valid_to equals the next span's valid_from."""
    spans = entrymod.queries()["q85_scd2_history"](spark, SF_SMOKE)
    ev_counts = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events_user"))
    )
    per_user = spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("version").alias("max_version"),
        F.min("version").alias("min_version"),
        F.sum("n_events").alias("span_event_sum"),
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
    )
    joined = per_user.join(ev_counts, "user_id")
    bad = joined.filter(
        (F.col("n_spans") != F.col("max_version"))
        | (F.col("min_version") != 1)
        | (F.col("span_event_sum") != F.col("n_events_user"))
        | (F.col("n_open") != 1)
    )
    assert bad.count() == 0, bad.limit(5).collect()
    # closed spans chain: valid_to == next valid_from (lead over version)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    chained = spans.withColumn("next_from", F.lead("valid_from").over(w)).filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert chained.count() == 0


def test_copurchase_pairs_are_ordered_and_positive(spark):
    rows = entrymod.queries()["q84_copurchase_pairs"](spark, SF_SMOKE).collect()
    assert rows, "expected co-purchase pairs at smoke scale"
    assert all(r["part_a"] < r["part_b"] and r["n_orders"] >= 1 for r in rows)
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_basket_cap_excludes_pathological_mega_basket(spark):
    """A planted 1,000-item basket must contribute ZERO pairs under a cap
    (it would otherwise explode into C(1000,2) ≈ 500k rows — the O(b²)
    guard the 100 TB design note promises), while normal baskets are
    untouched. Default cap (10k) keeps both."""
    from etl_dag_paris_velib_spark.plans.graph import basket_pair_counts

    rows = [(1, i) for i in range(1000)]  # the mega-basket
    rows += [(2, 2000), (2, 2001), (2, 2002)]  # a normal 3-item basket
    basket = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    capped = basket_pair_counts(basket, max_basket=100).collect()
    assert len(capped) == 3  # only order 2's C(3,2) pairs survive
    assert all(
        r["part_a"] in (2000, 2001) and r["part_b"] in (2001, 2002) for r in capped
    )

    uncapped = basket_pair_counts(basket, max_basket=None)
    assert uncapped.count() == 1000 * 999 // 2 + 3

    default = basket_pair_counts(basket)  # DEFAULT_MAX_BASKET = 10k: no-op
    assert default.count() == 1000 * 999 // 2 + 3


def test_frequent_triples_downward_closure(spark):
    """Every support-2 triple's three sub-pairs must each have pair
    support >= the triple's support (A-priori downward closure) — the
    invariant the q109 prune relies on for exactness."""
    from etl_dag_paris_velib_spark.plans.graph import basket_pair_counts
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    triples = entrymod.queries()["q109_frequent_triples"](spark, SF_SMOKE).collect()
    assert all(r["part_a"] < r["part_b"] < r["part_c"] for r in triples)
    assert all(r["n_orders"] >= 2 for r in triples)
    if not triples:
        return  # smoke scale may have no support-2 triples; sf0.01 parity does
    basket = (
        load_table(spark, "lineitem", SF_SMOKE)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pc = {
        (r["part_a"], r["part_b"]): r["n_ab"]
        for r in basket_pair_counts(basket).collect()
    }
    for t in triples:
        a, b, c = t["part_a"], t["part_b"], t["part_c"]
        for pair in ((a, b), (a, c), (b, c)):
            assert pc.get(pair, 0) >= t["n_orders"], (t, pair)


def test_pagerank_k2_matches_unrolled_q86(spark):
    """pagerank(tol=0, max_iterations=2) must reproduce the unrolled q86
    ranks exactly — same _pr_step body, driver-loop vs static plan."""
    from etl_dag_paris_velib_spark.plans.graph import pagerank

    edges, deg, n_nodes = _cosupply_graph(spark, SF_SMOKE)
    rank, rounds = pagerank(edges, deg, n_nodes, max_iterations=2, tol=0.0)
    assert rounds == 2
    looped = {r.src: r.rank for r in rank.collect()}
    rank.unpersist()
    q86 = entrymod.queries()["q86_supplier_pagerank"](spark, SF_SMOKE).collect()
    assert q86, "q86 should rank suppliers at smoke scale"
    for r in q86:  # q86 rounds to 9dp for the oracle; compare at that grain
        assert abs(looped[r.s_suppkey] - r.rank) < 5e-10, r.s_suppkey


def test_pagerank_converges_and_conserves_mass(spark):
    from etl_dag_paris_velib_spark.plans.graph import pagerank

    edges, deg, n_nodes = _cosupply_graph(spark, SF_SMOKE)
    rank, rounds = pagerank(edges, deg, n_nodes, max_iterations=50, tol=1e-10)
    assert rounds < 50, "tolerance stop never fired"
    total = rank.agg(F.sum("rank").alias("m")).collect()[0]["m"]
    # on a symmetric graph with no dangling nodes rank mass is conserved
    assert abs(total - 1.0) < 1e-6
    # converged means one more step moves ranks by less than tol
    from etl_dag_paris_velib_spark.plans.graph import _pr_step

    stepped = _pr_step(edges, deg, rank, F.lit(0.15 / n_nodes))
    delta = (
        stepped.alias("n")
        .join(rank.alias("o"), "src")
        .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    rank.unpersist()
    assert delta < 1e-10


def test_oriented_triangles_on_planted_graphs(spark):
    """K4 has exactly 4 triangles, each found once; a star graph (hub
    with leaves, no leaf-leaf edges) has none — the orientation must
    neither duplicate nor invent triangles, and canonical output is
    id-sorted."""
    from etl_dag_paris_velib_spark.plans.graph import oriented_triangles

    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "part_a long, part_b long",
    )
    got = sorted(
        tuple(r) for r in oriented_triangles(k4).collect()
    )
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]

    star = spark.createDataFrame(
        [(0, leaf) for leaf in range(1, 9)], "part_a long, part_b long"
    )
    assert oriented_triangles(star).count() == 0

    # triangle hanging off a hub: only the closed wedge counts
    mixed = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)],
        "part_a long, part_b long",
    )
    assert [tuple(r) for r in oriented_triangles(mixed).collect()] == [
        (0, 1, 2)
    ]


def test_bfs_hops_on_planted_graphs(spark):
    """Path graph 1-2-3-4-5-6 seeded at 1: hop distances are exact,
    capped at max_hops (node 6 at distance 5 stays unreached with
    max_hops=4); a disconnected node never appears; first-reach-wins
    equals min distance on a graph with a short and a long route."""
    from etl_dag_paris_velib_spark.plans.graph import bfs_hops

    def undirected(rows):
        df = spark.createDataFrame(rows, "src long, dst long")
        return df.unionByName(
            df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    path = undirected([(i, i + 1) for i in range(1, 6)])
    seed = spark.createDataFrame([(1,)], "v long")
    got = {r["v"]: r["hops"] for r in bfs_hops(path, seed, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    # short route 1-2-5 and long route 1-3-4-5: node 5 reached at hop 2,
    # and the disconnected edge 8-9 is never reached
    multi = undirected([(1, 2), (2, 5), (1, 3), (3, 4), (4, 5), (8, 9)])
    got = {r["v"]: r["hops"] for r in bfs_hops(multi, seed, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 5: 2, 4: 2}
