"""Offline sweep for fuzz grammar #26 (streaming SESSION-window/batch equivalence).

Replays the recorded seed range (default 34000-34999, the docstring's
1,000-config sweep) through the SAME generator + comparator the pytest
subset runs — each seed drains a real StreamingQuery (availableNow ->
memory sink) and holds it to the exact rows+schema+hash gate against the
DuckDB batch replay. Divergent seeds are printed and re-raised at the
end; a clean run prints the ZERO-divergence line the grammar docstring
records.

Usage:
    python tools/fuzz_sweep_26.py [start] [count]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import random  # noqa: E402

import duckdb  # noqa: E402

from etl_dag_paris_velib_spark.session import get_spark  # noqa: E402
from tests.conftest import SF_ORACLE  # noqa: E402
from tests.test_fuzz_differential import (  # noqa: E402
    _compare_stream,
    _gen_session_config,
)


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 34000
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="fuzz26", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_ORACLE}/events.parquet'"
    )
    engines = (spark, con)
    failures: list[tuple[int, str]] = []
    t0 = time.time()
    for i in range(count):
        seed = start + i
        build, duck_sql = _gen_session_config(random.Random(seed))
        try:
            _compare_stream(engines, build, duck_sql)
        except Exception as e:  # record and continue — a sweep maps ALL
            failures.append((seed, f"{type(e).__name__}: {e}"))
            print(f"DIVERGE seed={seed}: {e}", flush=True)
        if (i + 1) % 50 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(
                f"{i + 1}/{count} swept, {len(failures)} divergences, "
                f"{rate:.2f} seeds/s",
                flush=True,
            )
    print(
        f"DONE seeds {start}-{start + count - 1}: "
        f"{len(failures)} divergences in {time.time() - t0:.0f}s"
    )
    for seed, msg in failures:
        print(f"  seed={seed}: {msg[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
