"""Measure per-query shuffle/input/spill volume — the numbers `.explain`
can't show and "measure, don't guess" demands.

Runs each headline query (tools/scalecheck.py's set) cold under its own
Spark job group, then reads the Spark UI REST API
(/api/v1/applications/{app}/jobs + /stages) to attribute completed-stage
metrics — input bytes, shuffle write/read bytes, memory/disk spill — to
the query that ran them. Writes SHUFFLE.md.

Why this matters at 100 TB: wall time at sf0.1 is overhead-dominated
(SCALING.md), but shuffle bytes scale with data by plan shape — a query
that shuffles 10x its input at sf0.1 shuffles 10x its input at 100 TB,
where that is the bottleneck. This report puts numbers on the movement
claims the plan audit (EXPLAIN.md) makes qualitatively.

Usage: python tools/shufflemeter.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.scalecheck import HEADLINE  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _mb(b: float) -> str:
    return f"{b / 1e6:,.1f}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry
    from etl_dag_paris_velib_spark.cacheutil import clear_plan_caches
    from etl_dag_paris_velib_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    qs = entry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["q01_pricing_summary"](spark, sf_dir))  # warm JVM outside groups
    # Clear ONCE, not per query: re-building the LSH pair set after a
    # clear is a second in-session cache build of a pandas-UDF-bearing
    # plan, which Spark 4.1.2 cannot do (see the verify notes). Running
    # in HEADLINE order (q21 before q42/q46) means family consumers read
    # the persisted pair set — their rows measure the MARGINAL movement
    # on top of the shared artifact, which is the production behavior.
    clear_plan_caches(spark)
    for name in HEADLINE:
        sc.setJobGroup(name, name)
        try:
            force(qs[name](spark, sf_dir))
        finally:
            sc.setJobGroup(None, None)

    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    jobs = _get(f"{api}/jobs?status=succeeded")
    stages = {
        s["stageId"]: s
        for s in _get(f"{api}/stages?status=complete")
    }
    per_query: dict[str, dict[str, float]] = {}
    seen_stage: set[tuple[str, int]] = set()
    for j in jobs:
        g = j.get("jobGroup")
        if g not in set(HEADLINE):
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
        "(q42/q46) run after q21 and read its persisted pair set, so",
        "their rows measure the marginal movement on top of the shared",
        "artifact — the production reuse behavior.",
        "Regenerate: python tools/shufflemeter.py",
        "",
        "| query | stages | input MB | shuffle write MB | shuffle read MB | spill MB |",
        "|---|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        m = per_query.get(name)
        if not m:
            continue
        lines.append(
            f"| {name} | {m['stages']:.0f} | {_mb(m['input'])} | "
            f"{_mb(m['sw'])} | {_mb(m['sr'])} | {_mb(m['spill'])} |"
        )
    lines.append("")
    out = os.path.join(ROOT, "SHUFFLE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(per_query)} queries)")


if __name__ == "__main__":
    main()
