"""Time ONE registered query fully cold: fresh process, q01 JVM warmup,
noop-sink force, print one JSON line {"name":..., "sf_dir":..., "sec":...}.

This is the deep-tier COLD budget protocol (SCALING.md sf3.0/sf10.0
rungs): one process per rep so no session cache, no AQE stat carryover,
and no pandas-UDF cache rebuild hazard can contaminate the cell; callers
take the min over invocations (host steal-time makes any single timing
5-30x off — verify-skill note).

Usage: python tools/cold_time_one.py <query_name> <sf_dir> [driver_mem]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    mem = sys.argv[3] if len(sys.argv) > 3 else "48g"
    import __spark_entry__ as entrymod
    from etl_dag_paris_velib_spark.session import get_spark

    spark = get_spark(
        "cold_time_one",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": mem,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup with a DIFFERENT query than the one being timed
    # (timing q01 after a q01 warmup would record a warm cell: page cache
    # hot, codegen compiled — the opposite of the cold protocol)
    warm = (
        "q01_pricing_summary"
        if name != "q01_pricing_summary"
        else "q02_forecast_revenue"
    )
    force(qs[warm](spark, sf_dir))
    t0 = time.perf_counter()
    force(qs[name](spark, sf_dir))
    print(json.dumps({
        "name": name, "sf_dir": sf_dir,
        "sec": round(time.perf_counter() - t0, 2),
    }))


if __name__ == "__main__":
    main()
