"""Measure q154's construction-time driver work: AQE job count and wall
time for fn() PLAN CONSTRUCTION (the eager components fixpoints run
while the plan is being built, before any sink action), then the noop
force, in a fresh session.

The r12 verdict measured ~107 eager AQE jobs during construction with
the three serialized per-round fixpoints; the r13 fused multi-graph
fixpoint (near_dup_components_multi) should cut that to roughly one
loop's worth. Usage:

    python tools/probe_q154_jobs.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    from etl_dag_paris_velib_spark.session import get_spark

    spark = get_spark(
        "probe_q154_jobs",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warmup (JVM + codegen + Python worker pool)
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    st = spark.sparkContext.statusTracker()
    j0 = len(st.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    df = qs["q154_multi_increment_dedup"](spark, sf_dir)
    t1 = time.perf_counter()
    j1 = len(st.getJobIdsForGroup(None))
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    j2 = len(st.getJobIdsForGroup(None))
    print(
        json.dumps(
            {
                "construct_jobs": j1 - j0,
                "construct_sec": round(t1 - t0, 2),
                "force_jobs": j2 - j1,
                "force_sec": round(t2 - t1, 2),
                "total_sec": round(t2 - t0, 2),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
