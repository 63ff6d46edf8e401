"""Measure per-query shuffle/input/spill volume — the numbers `.explain`
can't show and "measure, don't guess" demands.

Runs each query cold under its own Spark job group, then reads the Spark
UI REST API (/api/v1/applications/{app}/jobs + /stages) to attribute
completed-stage metrics — input bytes, shuffle write/read bytes,
memory/disk spill — to the query that ran them.

Why this matters at 100 TB: wall time at sf0.1 is overhead-dominated
(SCALING.md), but shuffle bytes scale with data by plan shape — a query
that shuffles 10x its input at sf0.1 shuffles 10x its input at 100 TB,
where that is the bottleneck. This report puts numbers on the movement
claims the plan audit (EXPLAIN.md) makes qualitatively.

Two consumers:
- ``python tools/shufflemeter.py [sf_dir]`` — the full HEADLINE sweep,
  writes SHUFFLE.md (human report).
- ``python tools/shufflemeter.py <sf_dir> --json <out> [names...]`` —
  machine mode for tests/test_shuffle_budget.py, which runs this in a
  SUBPROCESS (fresh JVM: job-group attribution is clean, and the
  LSH pair-set cache builds exactly once — Spark 4.1.2 cannot rebuild
  a pandas-UDF-bearing cache twice in one session, see verify notes)
  and fails CI when a plan change doubles a query's shuffle bytes.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.scalecheck import HEADLINE  # noqa: E402

#: SHUFFLE.md sweeps more than the scaling HEADLINE: the eval/recall
#: tier and the r08 additions belong in the movement ledger even though
#: their wall time doesn't earn a scaling row. q135 (streaming
#: crash-restart) is excluded like all streaming specs — its stages run
#: on the StreamingQuery thread outside the job group (see header note).
LEDGER_EXTRA = (
    "q132_quality_threshold_sweep",
    "q133_ivf_recall_curve",
    "q134_srp_recall_curve",
    "q137_rrf_hybrid_retrieval",
    "q138_retrieval_eval_metrics",
    "q144_incremental_lsh_pairs",
    # r09 ledger additions: the streaming interval join (q116) cannot be
    # job-group-attributed, so its BATCH twin q89 carries the movement
    # row for that join shape; q145/q146 are the round's new specs
    "q89_interval_overlap",
    "q145_trained_ivfadc_recall",
    "q146_try_arithmetic_matrix",
    "q147_ivf_all_nn",
    # r11 ledger additions: q152-q154 also earn SCALING rows (HEADLINE);
    # q151/q155 are cheap single-exchange profiles that belong in the
    # movement ledger only; q156/q157 are the stored-index serving paths
    "q151_calendar_arithmetic",
    "q155_window_frame_matrix",
    "q156_purge_from_stored_index",
    "q157_incremental_ivf",
    # r12 ledger additions: the graph-ANN builder/serving paths (q162
    # itself earns a SCALING row via HEADLINE)
    "q163_nn_descent_curve",
    "q164_graph_ann_from_stored_index",
)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _mb(b: float) -> str:
    return f"{b / 1e6:,.1f}"


def measure_queries(spark, names, sf_dir: str) -> dict[str, dict[str, float]]:
    """Run each named query cold in its own job group and attribute
    completed-stage metrics to it via the UI REST API. Caches are
    cleared ONCE up front (not per query — the pandas-UDF double-cache
    limitation); running in declaration order means family consumers
    (q42/q46 after q21) measure their MARGINAL movement on top of the
    shared persisted artifact, the production reuse behavior."""
    import __spark_entry__ as entry
    from etl_dag_paris_velib_spark.cacheutil import clear_plan_caches

    sc = spark.sparkContext
    qs = entry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["q01_pricing_summary"](spark, sf_dir))  # warm JVM outside groups
    clear_plan_caches(spark)
    for name in names:
        sc.setJobGroup(name, name)
        try:
            force(qs[name](spark, sf_dir))
        finally:
            sc.setJobGroup(None, None)

    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    jobs = _get(f"{api}/jobs?status=succeeded")
    stages = {s["stageId"]: s for s in _get(f"{api}/stages?status=complete")}
    per_query: dict[str, dict[str, float]] = {}
    seen_stage: set[tuple[str, int]] = set()
    wanted = set(names)
    for j in jobs:
        g = j.get("jobGroup")
        if g not in wanted:
            continue
        agg = per_query.setdefault(
            g,
            {"input": 0.0, "sw": 0.0, "sr": 0.0, "spill": 0.0, "stages": 0},
        )
        for sid in j["stageIds"]:
            if (g, sid) in seen_stage or sid not in stages:
                continue  # skipped stage (reused exchange) or shared
            seen_stage.add((g, sid))
            s = stages[sid]
            agg["input"] += s.get("inputBytes", 0)
            agg["sw"] += s.get("shuffleWriteBytes", 0)
            agg["sr"] += s.get("shuffleReadBytes", 0)
            agg["spill"] += s.get("memoryBytesSpilled", 0) + s.get(
                "diskBytesSpilled", 0
            )
            agg["stages"] += 1
    return per_query


def main() -> None:
    from etl_dag_paris_velib_spark.session import get_spark

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = tuple(args[1:]) or (HEADLINE + LEDGER_EXTRA)
    names = tuple(dict.fromkeys(names))  # HEADLINE/EXTRA overlap-proof

    # this process launches the JVM, so driver memory set here is
    # honored; the 1g default OOMed once the r11 dedup-lifecycle movers
    # joined the single-session sweep (accumulated persisted pair sets +
    # index artifacts across 50+ queries — same class as the diffcheck
    # full-sweep OOM, heap is not a query-semantics conf)
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "12g"
            ),
            # the full-ledger sweep runs >1000 jobs / >2000 stages; the
            # UI store's default retention (1000/1000) evicts the
            # EARLIEST queries' jobs before the REST read, silently
            # dropping their rows (observed r12: the first 16 HEADLINE
            # rows vanished once q162's lazy-persist hops pushed the
            # job count over the cap)
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        }
    )
    per_query = measure_queries(spark, names, sf_dir)

    if json_out is not None:
        with open(json_out, "w") as f:
            json.dump(per_query, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(per_query)} queries)")
        return

    lines = [
        "# SHUFFLE — measured per-query data movement at "
        + os.path.basename(sf_dir.rstrip("/")),
        "",
        "Completed-stage metrics from the Spark UI REST API, one run per",
        "query in its own job group. Shuffle write/read are the plan-shape",
        "invariant that survives scale-up: they grow with data even where",
        "sf0.1 wall time is overhead-bound, and at 100 TB they ARE the",
        "bottleneck. Caveats: input MB under-reports on local file://",
        "scans (Hadoop FS counters miss some vectorized-reader reads), so",
        "the shuffle columns are the signal; LSH-family consumers",
        "(q42/q46/q152 — and q21 itself in suites where the lifecycle",
        "specs sort first) share one persisted pair set, so",
        "their rows measure the marginal movement on top of the shared",
        "artifact — the production reuse behavior.",
        "The top movers are BUDGETED: tests/test_shuffle_budget.py re-measures",
        "them at sf0.01 in CI and fails when a plan change doubles a query's",
        "shuffle bytes (ledger: tools/shuffle_budget.json).",
        "Streaming rows (q108/q110; q135 is excluded outright) read ~0",
        "here: their stages run on the StreamingQuery's own thread, outside",
        "the caller's job group — their state/shuffle profile is documented",
        "in EXPLAIN.md instead (dedup state O(keys/watermark), agg state",
        "O(groups)).",
        "Regenerate: python tools/shufflemeter.py",
        "",
        "| query | stages | input MB | shuffle write MB | shuffle read MB | spill MB |",
        "|---|---|---|---|---|---|",
    ]
    for name in names:
        m = per_query.get(name)
        if not m:
            continue
        lines.append(
            f"| {name} | {m['stages']:.0f} | {_mb(m['input'])} | "
            f"{_mb(m['sw'])} | {_mb(m['sr'])} | {_mb(m['spill'])} |"
        )
    lines.append("")
    out = os.path.join(ROOT, "SHUFFLE.md")
    # hand-written analysis sections (e.g. the r10 q121 wedge-split
    # evaluation) live below the marker and survive regeneration
    marker = "<!-- MANUAL SECTIONS BELOW — shufflemeter preserves everything after this line -->"
    manual = ""
    if os.path.exists(out):
        prev = open(out).read()
        if marker in prev:
            manual = prev[prev.index(marker):]
    if manual:
        lines.append(manual)
    else:
        lines.append(marker)
        lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(per_query)} queries)")


if __name__ == "__main__":
    main()
