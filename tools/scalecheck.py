"""Scaling evidence: run headline queries at every available scale factor
and report wall-time growth vs data growth.

At local[32] with sf ≤ 0.1 most queries are overhead-dominated (JVM,
planning, task dispatch) — the interesting signal is the MARGINAL cost:
t(sf0.1) - t(sf0.01) ≈ the data-proportional part. A query whose time is
flat across a 100x data range is paying fixed overhead, not compute; one
whose time grows ~10x per sf decade is scan/shuffle-bound and its plan
shape is what matters at 100 TB. Writes SCALING.md.

Usage: python tools/scalecheck.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADLINE = (
    "q01_pricing_summary",      # scan + partial agg (TPC-H Q1)
    "q03_shipping_priority",    # 3-way join + top-k
    "q08_event_gaps",           # window over events
    "q21_near_dup_pairs",       # MinHash-LSH
    "q42_dedup_clusters",       # iterative connected components
    "q54_repetition_signals",   # single-scan gram fan-out
    "q63_quality_selection",    # histogram rank
    "q68_unigram_logprob",      # vocab join
    "q70_weighted_sample",      # hash-threshold sampling
    "q74_correlated_subquery",  # decorrelated scalar subquery
    "q81_srp_lsh_topk",         # hyperplane LSH band join
    "q82_sliding_distinct_users",  # Expand x4 + two-phase distinct
    "q92_funnel_conversion",    # three chained windows, one user_id exchange
    "q95_bigram_logprob",       # bigram freq join + vocab broadcast
    "q97_kmv_sketch_merge",     # bounded-state sketch merge (k rows/group)
    "q103_kmv_set_overlap",     # pairwise set-op estimates from k-row sketches
    "q99_sql_order_distribution",  # shared-text SQL: outer join + 2-level agg
    "q100_sql_small_qty_revenue",  # shared-text SQL: decorrelated scalar subquery
    "q86_supplier_pagerank",    # iterative rank over the co-supply graph
    "q48_kmeans_clusters",      # capped-codebook Lloyd's (driver state O(k·dim))
    "q107_association_rules",   # basket pair mining + un-hinted dim joins
    "q109_frequent_triples",    # A-priori step 3, pruned cubic fan-out
    "q108_stream_hourly_rollup",  # real StreamingQuery: windowed agg drain
    "q110_stream_dedup_rollup",   # chained stateful dedup -> agg drain
    "q115_bpe_pair_stats",      # vocab build + HOF pair fan-out (r06)
    "q117_bm25_topk",           # query-filtered tf shuffle + stats broadcast (r06)
    "q118_semantic_dedup",      # O(clusters) rep broadcast, map-side scoring (r06)
    "q119_bpe_encode_counts",   # vocab-level merge passes + word-keyed join (r06)
    "q116_stream_interval_join",  # stream-stream state join, r07 sf3 tier
    "q121_copurchase_triangles",  # degree-oriented wedge join (r06)
    "q122_copurchase_bfs_hops",   # frontier-join BFS rounds (r06)
    "q131_personalized_pagerank",  # seeded rank loop, r07 sf3 tier
    "q136_pq_adc_recall",         # PQ encode + ADC LUT join sweep (r07)
    "q139_ivfadc_topk",           # composed IVF routing + ADC (r07)
    "q140_vocab_growth_curve",    # first-occurrence vocab shuffle (r07)
    "q141_ivfadc_residual_topk",  # residual IVFADC: per-list LUT joins (r08)
    "q130_bm25_batch_topk",       # batch BM25: query-filtered tf shuffle (r09 deep)
    "q138_retrieval_eval_metrics",  # MRR/nDCG eval joins (r09 deep)
    "q145_trained_ivfadc_recall",  # kmeans-trained residual IVFADC + exact leg (r09)
    "q142_rrf_query_vectors",     # hybrid RRF, explicit query vectors (r08)
    "q143_variant_path_matrix",   # VARIANT parse-once path extraction (r08)
    "q148_global_running_revenue",  # literal-boundary exscan, 1 hash shuffle (r09)
    "q149_quality_auc",           # histogram Mann-Whitney, bounded shuffles (r09)
    "q150_global_order_statistics",  # bucket-pruned rank selection (r09)
    "q124_masked_lm_pairs",     # posexplode + order-preserving reassembly (r06)
    "q125_source_kl_drift",     # two grouped passes + vocab window (r06)
    "q126_centroid_drift",      # exploded-dim partials, folded global (r06)
    # dedup-stress tier: sf1.0 plants 10-replica near-dup clusters, so
    # CANDIDATE volume grows ~(replicas²)x, not 10x — these rows measure
    # that deliberately superlinear regime, not a plan defect
    "q28_simhash_pairs",        # band self-join, output ∝ true pair count
    "q46_edit_distance_pairs",  # LSH candidates + thresholded levenshtein
    "q52_embedding_dedup",      # exact block-matmul threshold pairs, O(n²) GEMM
    # dedup LIFECYCLE tier (r11): purge/admission/crawl-loop — the
    # 100 TB story's flagship movers; same replica-cluster caveat as
    # the dedup-stress tier applies to their candidate volumes
    "q152_near_dup_purge",        # components + corpus anti-join (r10)
    "q153_incremental_purge",     # delta-only admission probe (r10)
    "q154_multi_increment_dedup",  # 3-round growing-index crawl loop (r10)
    "q156_purge_from_stored_index",  # zero-reshingle purge off parquet (r11)
    "q157_incremental_ivf",       # stored codebook + delta assign (r11)
    "q158_stream_crawl_admission",  # the crawl loop as a StreamingQuery (r11)
    "q155_window_frame_matrix",   # frame/null-order/tie matrix (r11)
    "q159_drift_rebuild_ivf",     # drift monitor -> codebook retrain (r12)
    "q160_stream_sliding_rollup",  # overlapping streaming window state (r12)
    "q161_stream_session_rollup",  # merging session-window state (r12)
    "q162_graph_ann_recall",       # k-NN graph build + NSW beam sweep (r12)
)

SFS = ("0.001", "0.01", "0.1", "1.0", "3.0", "10.0")


def sf_dir(sf: str) -> str:
    """testdata holds sf ≤ 0.1; sf1.0 / sf3.0 are local 10x / 30x
    replicas (tools/make_scale.py) under the repo's gitignored .scale/.
    Missing tiers are skipped (main() filters on isdir)."""
    if float(sf) >= 1.0:
        return os.path.join(ROOT, ".scale", f"sf{sf}")
    return f"/root/testdata/sf{sf}"


def main() -> None:
    import __spark_entry__ as entrymod
    from etl_dag_paris_velib_spark.session import get_spark

    names = sys.argv[1:] or list(HEADLINE)
    sfs = [sf for sf in SFS if os.path.isdir(sf_dir(sf))]
    # This process launches the JVM itself, so driver memory set here is
    # honored (it's a no-op only on an already-running session). The
    # default 1g heap holds through sf0.1 but sf1.0 broadcasts
    # (64 MB autoBroadcastJoinThreshold sides grow ~10x) need headroom.
    spark = get_spark(
        "scalecheck",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    from etl_dag_paris_velib_spark.plans import REGISTRY

    streaming = {n for n, s in REGISTRY.specs.items() if "streaming" in s.tags}
    driver_loop = {
        n for n, s in REGISTRY.specs.items() if "driver-loop" in s.tags
    }

    def run(name: str, sf: str) -> float:
        if name in driver_loop:
            # the query fn itself executes jobs while BUILDING the plan
            # (per-round take(1) in the BFS loop) and persists per-call
            # intermediates — warm-timing only the returned DF would
            # measure a cache read, and cross-call CacheManager plan
            # matching leaks one cell's cache into the next. Time the
            # FULL call, genuinely cold each iteration. Clear ONLY the
            # graph persist tracker, NOT clear_plan_caches: a global
            # clear would force a second in-session build of the
            # pandas-UDF LSH pair cache later in the sweep, which Spark
            # 4.1.2 cannot do ([INTERNAL_ERROR] in the cache
            # serializer — the repo-wide persist gotcha).
            from etl_dag_paris_velib_spark.plans.graph import (
                clear_graph_persists,
            )

            qs[name](spark, sf_dir(sf))  # warm: listing + codegen only
            best = float("inf")
            for _ in range(2):
                clear_graph_persists()
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir(sf))
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return best
        if name in streaming:
            # a streaming spec executes its availableNow drain INSIDE the
            # query fn and returns a memory-table scan — timing only the
            # returned DF would measure the scan (~0.02s) and hide the
            # drain. Time the whole fn call instead.
            qs[name](spark, sf_dir(sf))  # warm: source listing, codegen
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir(sf))
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return best
        df = qs[name](spark, sf_dir(sf))
        df.write.format("noop").mode("overwrite").save()  # warm plan + pages
        best = float("inf")
        for _ in range(2):  # min-of-2: one GC pause shouldn't publish
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    top = sfs[-1]
    prev = sfs[-2]
    # TWO full sweeps, elementwise min: this VM shows sustained host
    # steal-time windows (minutes) under 32-way load that swallow a whole
    # per-query min-of-2; two sweeps separated by the rest of the suite
    # rarely both land in one (observed: the same cell 0.2s vs 26s across
    # back-to-back runs with identical plans).
    # Tier caps. The dedup-stress tier is measured up to sf1.0 only: its
    # cost tracks TRUE candidate-pair count, which the replica
    # construction grows quadratically — higher tiers would spend the
    # superlinear cost to re-demonstrate a regime the sf1.0 cells already
    # pin (and q52 is the deliberate exact-GEMM baseline whose documented
    # scale path is IVF/SRP-LSH anyway). Everything else defaults to
    # sf3.0; the sf10.0 rung (when built) is reserved for the DEEP set —
    # the four heavy graph/stream movers whose scaling behavior is the
    # open question each round — so a full sweep stays ~an hour instead
    # of several.
    STRESS_CAP = {
        "q28_simhash_pairs": 1.0,
        "q46_edit_distance_pairs": 1.0,
        "q52_embedding_dedup": 1.0,
        # q158's sf3.0 cell (~240s cold x 2 reps) would add ~8 min per
        # sweep; its deep-tier evidence is recorded once in
        # bench_budget["3.0"] + the SCALING.md r12 rung, and the
        # deterministic index-growth curve has its own tool
        # (tools/index_growth_q158.py) — the sweep stops at sf1.0
        "q158_stream_crawl_admission": 1.0,
    }
    DEEP = {
        "q116_stream_interval_join",
        "q121_copurchase_triangles",
        "q122_copurchase_bfs_hops",
        "q131_personalized_pagerank",
        # r09 (the r08 verdict's #3 ask): the ANN/retrieval movers get
        # the sf10.0 cell too — their scaling behavior is the open
        # question now that the graph/stream movers are characterized
        "q130_bm25_batch_topk",
        "q136_pq_adc_recall",
        "q138_retrieval_eval_metrics",
        "q139_ivfadc_topk",
        "q141_ivfadc_residual_topk",
        "q145_trained_ivfadc_recall",
        # r09: the total-order tier shuffles the full fact table by
        # construction — its deep-tier behavior is the open question
        # (q149 is histogram-bound and stays at the 3.0 cap)
        "q148_global_running_revenue",
        "q150_global_order_statistics",
        # r10 (the r09 verdict's #4 and #6 asks): the O(N^1.5)
        # all-vector IVF NN after the capped-fold rewrite, plus the
        # three heavy curation movers with the largest sf3.0 marginals
        "q147_ivf_all_nn",
        "q63_quality_selection",
        "q107_association_rules",
        "q109_frequent_triples",
    }

    def cells_for(name):
        cap = STRESS_CAP.get(name, 10.0 if name in DEEP else 3.0)
        return [sf for sf in sfs if float(sf) <= cap]

    t: dict[tuple[str, str], float] = {}
    for _ in range(2):
        for name in names:
            for sf in cells_for(name):
                v = run(name, sf)
                k = (name, sf)
                t[k] = min(t.get(k, float("inf")), v)
    rows = []
    for name in names:
        have = cells_for(name)
        marg = t[(name, have[-1])] - t[(name, have[-2])]
        rows.append(
            (name, [t.get((name, sf)) for sf in sfs], marg)
        )

    span = f"{int(float(top) / float(sfs[0])):,}x"
    out = [
        f"# SCALING — headline queries across a {span} data range",
        "",
        "Warm second-run wall time (noop sink, local[32]). `marginal` =",
        "each row's two largest MEASURED tiers subtracted (rows are",
        f"tier-capped; globally t(sf{top}) - t(sf{prev})): the",
        "data-proportional component once",
        "fixed overhead cancels. Flat columns = overhead-bound at this",
        "scale; the plan audit (EXPLAIN.md) is the evidence beyond it.",
        "Graph rows with internal persists (q121's oriented edge list,",
        "like q21/q42/q86 before them) time the CONSUMERS of the cached",
        "artifact per the warm policy; their genuinely cold end-to-end",
        "costs live in tools/bench_budget.json (bench.py clears every",
        "plan cache per query). q122 (driver-loop BFS) is timed fully",
        "cold per cell — its fn executes jobs while building the plan —",
        "and its column is NON-monotonic by data, not by plan: the",
        "support-pruned co-purchase graph's density (and therefore the",
        "number of BFS rounds before the frontier empties) varies",
        "non-monotonically with sf; each round is a fixed small number",
        "of jobs, so wall time tracks rounds, not rows.",
        "Streaming rows (q108/q110) time the FULL availableNow drain —",
        "a fresh StreamingQuery per run, so their floor is the streaming",
        "engine's per-query start/commit overhead (~2s), data-invariant",
        "until the event volume dominates it.",
        "sf1.0 / sf3.0 (when present) are the 10x / 30x key-offset",
        "replicas of sf0.1 (tools/make_scale.py): sf1.0 ~6M lineitem /",
        "1M events / 50k documents; sf3.0 triples that — the r07 tier",
        "for the graph/stream movers (q116/q121/q122/q131), whose r06",
        "evidence topped out at sf1.0. Each document replica group is a",
        "planted near-dup cluster — the dedup tier's candidate volume",
        "grows superlinearly there by construction.",
        "",
        "| query | " + " | ".join(f"sf{sf}" for sf in sfs) + " | marginal (s) |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    note = (
        "\nThe last three rows are the dedup-stress tier: sf1.0's"
        "\nplanted 10-replica clusters square the candidate volume"
        "\n(every original near-dup pair becomes a 10x10 replica block),"
        "\nso their sf1.0 cost tracks TRUE pair count, which grows"
        "\n~(replicas^2)x by construction — the right behavior for a"
        "\ndedup operator; q52 is additionally the exact O(n^2) GEMM"
        "\nbaseline whose documented scale path is IVF/SRP-LSH"
        "\n(q29/q81, flat rows above). The tier is measured up to sf1.0"
        "\n(— cells beyond): sf3.0's 30-replica clusters would spend ~9x"
        "\nsf1.0's superlinear cost to re-demonstrate the same"
        "\nquadratic-by-construction regime.\n"
        "\nNear-zero warm times on q21/q42 are the session pair cache"
        "\n(operators/similarity.py:_PAIR_CACHE): the LSH pair set is"
        "\nmaterialized once per (session, input, params) and every"
        "\ndownstream consumer (q42/q46/q56) reads it back — the"
        "\nreuse-not-recompute behavior a production pipeline wants.\n"
    )
    for name, ts, m in rows:
        cells = " | ".join("—" if t is None else f"{t:.2f}" for t in ts)
        out.append(f"| {name} | {cells} | {m:+.2f} |")
    text = "\n".join(out) + "\n" + note
    with open(os.path.join(ROOT, "SCALING.md"), "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
