"""Re-test harness for the Spark 4.1.2 pandas-UDF / AQE stage-prep crash
(the r08 sf3.0 dedup-stress finding, SCALING.md "sf3.0 rung").

VANILLA session, no repo imports: this reconstructs the engine's
PRE-r08 minhash candidate build — Arrow pandas-UDF signature, 8-way
band fan-out in one Project, posexplode, bucket aggregate — over a
synthetic corpus, and runs it twice in one session (the observed
failure mode was WARMED-session-only). The original crash was

    [INTERNAL_ERROR] Cannot evaluate expression: minhash_sig(...)

from an InterpretedUnsafeProjection: AQE stage preparation lost the
Python-UDF extraction (the ArrowEvalPython node) from the executed
stage, leaving the raw PythonUDF expression inside a plain projection
the interpreted evaluator cannot run.

DISTILLATION RECORD (r09): a minimal isolated trigger was NOT found.
All of the following come back clean on this Spark 4.1.2 build in a
fresh process: (a) this script at the original corpus scale (150k docs
x 120 shingles, warmed second run); (b) the exact pre-r08 repo chain
(shingle persist -> Arrow UDF signature -> band fan-out -> bucket
collect_list) against the real .scale/sf3.0 documents table, warmed;
(c) plain-persist rebuilds of UDF-bearing plans in several shapes (UDF
column in the cached output; UDF below an aggregate; UDF nested in HOF
band expressions; ObjectHashAggregate forced into sort-fallback). The
r08 crash therefore also depended on accumulated session state (the
sf1.0-then-sf3.0 cache history: CacheManager canonical-form rematches
against earlier persisted plans) that a standalone script does not
carry. The engine keeps its durable fix — the JVM signature expression
(functions/text.py:minhash_signature_int, property-pinned bit-identical
to the UDF) and the eager non-adaptive cache capture
(operators/similarity.py:_persist_udf_cache) — and this script remains
the harness to re-test on ANY Spark upgrade:
tests/test_spark_bug_canary.py fails on a pyspark version other than
the pinned 4.1.2 with instructions to run this (plus the repo-state
sweep it names) and retire the workarounds if everything stays clean.

Usage:
    python tools/repro_aqe_udf_extraction.py [--docs N] [--words W]

Defaults (150k docs x 120 words) match the corpus scale that triggered
the original crash; expect a few minutes on local[32]. Exit code 0 and
"NO CRASH" means the bug did not reproduce at this size; "CRASH" plus
the exception means it did.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--words", type=int, default=120)
    ap.add_argument("--k", type=int, default=16, help="minhash lanes")
    ap.add_argument("--bands", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("repro_aqe_udf_extraction")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("pyspark:", spark.version)

    k, bands = args.k, args.bands
    r = k // bands

    # synthetic near-dup-heavy corpus: 10-doc replica clusters drawing
    # words from a small vocabulary, so band buckets are dense the way
    # the sf3.0 documents table's planted clusters made them
    docs = spark.range(args.docs).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(args.words - 1)),
            lambda i: F.concat(
                F.lit("w"),
                (
                    (F.col("id") / 10).cast("long") * 37 + i * i + i % 7
                ).__mod__(5000).cast("string"),
            ),
        ).alias("sh"),
    )

    a = 2 * np.arange(k, dtype=np.int64) + 1
    b = 40503 * np.arange(k, dtype=np.int64) + 11
    P = (1 << 61) - 1

    # NOTE: no type hints on the UDF — `from __future__ import
    # annotations` stringifies them and pandas_udf's eval-type inference
    # rejects string hints; the explicit returnType carries the schema
    @pandas_udf(ArrayType(LongType()))
    def minhash_sig(shingles):
        import hashlib

        out = []
        for arr in shingles:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            ms = np.array(
                [
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    for s in arr
                ],
                dtype=np.int64,
            )
            lanes = (ms[:, None] * a[None, :] + b[None, :]) % P
            out.append(lanes.min(axis=0).tolist())
        return pd.Series(out)

    def run(tag: str) -> None:
        sh = docs.select("id", "sh").persist()
        sig = sh.select("id", minhash_sig(F.col("sh")).alias("sig"))
        band_arr = F.array(
            *[
                F.array_join(
                    F.transform(
                        F.slice("sig", bb * r + 1, r),
                        lambda x: x.cast("string"),
                    ),
                    "|",
                )
                for bb in range(bands)
            ]
        )
        banded = sig.select(
            "id", F.posexplode(band_arr).alias("band", "band_key")
        )
        pairs = (
            banded.groupBy("band", "band_key")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode("ids").alias("id"))
        )
        t0 = time.perf_counter()
        n = pairs.count()
        sh.unpersist()
        print(f"{tag}: {n} bucket members, {time.perf_counter() - t0:.1f}s")

    run("first (session-cold)")
    try:
        run("second (warmed)")
    except Exception as e:  # noqa: BLE001 - the point is to show the crash
        print("CRASH:", type(e).__name__)
        print(str(e)[:2000])
        return 1
    print("NO CRASH: the AQE/UDF extraction bug did not reproduce at "
          f"docs={args.docs}, words={args.words} on Spark {spark.version}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
