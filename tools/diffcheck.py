"""Local differential harness mirroring the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and compares
against the DuckDB oracle: row count, column names (sorted), and an
order-insensitive value hash (rows sorted by their string form, columns
sorted by name, floats rounded via repr). Usage:

    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate last-ulp noise: round to 9 significant digits
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e

    if os.environ.get("SPARK_GRAFT_TUNED_SESSION"):
        from etl_dag_paris_velib_spark.session import get_spark

        spark = get_spark("diffcheck")
    else:
        # VANILLA session, deliberately: the driver's correctness harness
        # builds its own plain SparkSession (round-2 verdict — the tuned
        # get_spark masked a conf dependency for a whole round). Every
        # query must be self-sufficient on a session with no repo confs.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("diffcheck-vanilla")
            # still vanilla SQL-wise, but the FULL 131-query sweep in one
            # session accumulates cached intermediates (graph edge lists,
            # frequency tables, LSH pair sets) that the 1g default heap
            # cannot hold at sf0.1 — observed: heap OOM at q86 killed the
            # SparkContext and cascaded 13 phantom failures. Heap size is
            # not a query-semantics conf, so raising it keeps the
            # "self-sufficient on a plain session" guarantee intact.
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
            )
            .getOrCreate()
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            hs, hd = canon_hash(scols, srows), canon_hash(dcols, drows)
            if hs != hd:
                problems.append("value hash mismatch")
                # show first differing canonical line for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("\x01".join(_canon_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("\x01".join(_canon_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark: {a[:200]!r}")
                        problems.append(f"  duck : {b[:200]!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
