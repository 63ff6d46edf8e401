"""Generate an Nx replica of /root/testdata/sf0.1 under .scale/ for
scaling measurements (default 10x -> .scale/sf1.0: ~6M lineitem, 1M
events, 50k documents; 30 -> .scale/sf3.0, the r07 tier for the graph /
stream movers — the output name is sf{replicas/10}).

Replication preserves the star schema's join structure: every key column
gets a per-replica offset large enough to keep replicas disjoint, so
fact↔dim joins land exactly as in the source (dims region/nation are
kept single-copy; customer/supplier/part replicate with their facts).
Documents get a per-replica marker appended to the text, which turns
each replica group into a realistic NEAR-duplicate cluster (Jaccard
~0.97 for 128-token docs) — a deliberate stress of the dedup tier —
while events keep their timestamps, so temporal density grows 10x (the
realistic shape for a busier feed).

The output directory is gitignored; regenerate with:
    python tools/make_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"

#: id-offset stride per replica — far above every source key range
STRIDE = 10_000_000

#: key columns to offset per table (join structure preserved)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: dims kept single-copy (tiny, broadcast in every plan)
SINGLE = ("region", "nation")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # sf name follows the replica count: 10x sf0.1 -> sf1.0, 30x -> sf3.0
    dst = os.path.join(ROOT, ".scale", f"sf{replicas / 10:.1f}")
    from pyspark.sql import functions as F

    from etl_dag_paris_velib_spark.session import get_spark

    # this process launches the JVM itself, so driver memory set here is
    # honored; the default 1g heap OOMs on the 30-replica repartition(32)
    spark = get_spark(
        "make-scale",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for t in SINGLE:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: single copy")

    for t, keys in OFFSETS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(replicas):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if t == "documents" and i > 0:
                # near-dup (not exact-dup) replicas: one appended token
                df = df.withColumn(
                    "text", F.concat("text", F.lit(f" replica{i}"))
                ).withColumn("n_chars", F.length("text"))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one file per core, not one per replica branch: a 10-file table
        # caps local[32] scan parallelism at 10 tasks and distorts the
        # scaling measurements this replica exists for
        out.repartition(32).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows ({replicas} replicas)")


if __name__ == "__main__":
    main()
