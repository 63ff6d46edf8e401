"""Record the q158 stored-index growth profile (the r11 verdict's #3).

The streaming crawl admission's durable state is the parquet band+hash
index, and its size COMPOUNDS across increments — this script measures
that curve: it runs the production admission topology (the same
stage_crawl_batches + run_crawl_admission the spec runs) against a given
sf dir and prints, per micro-batch, the batch's delta row counts and the
cumulative index size the NEXT batch will probe.

Row counts are deterministic (plan-shaped, host-noise-immune), so one
run per tier is a faithful cell — unlike the timing rungs, which use
the min-of-N cold protocol.

Usage: python tools/index_growth_q158.py <sf_dir> [driver_mem]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1]
    mem = sys.argv[2] if len(sys.argv) > 2 else "16g"
    from pyspark.sql import functions as F

    from etl_dag_paris_velib_spark.plans.streamq import (
        run_crawl_admission,
        stage_crawl_batches,
    )
    from etl_dag_paris_velib_spark.session import get_spark
    from etl_dag_paris_velib_spark.sources.tpch import load_table

    spark = get_spark(
        "index_growth_q158",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": mem,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="sg_q158_growth_")
    try:
        src = stage_crawl_batches(docs, root)
        kept_dir, bands_dir, hashes_dir, moved = run_crawl_admission(
            spark, docs.schema, src, root
        )

        def per_batch(path):
            return {
                int(r["batch"]): r["n"]
                for r in spark.read.parquet(path)
                .groupBy("batch")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }

        bands = per_batch(bands_dir)
        hashes = per_batch(hashes_dir)
        kept = per_batch(kept_dir)
        batches = sorted(b for b in bands if b >= 0)
        rows = []
        cum_b = cum_h = 0
        for b in batches:
            rows.append(
                {
                    "batch": b,
                    "probed_band_rows": cum_b,  # index size this batch probed
                    "delta_band_rows": bands.get(b, 0),
                    "delta_hash_rows": hashes.get(b, 0),
                    "admitted": kept.get(b, 0),
                }
            )
            cum_b += bands.get(b, 0)
            cum_h += hashes.get(b, 0)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "final_band_rows": cum_b,
                    "final_hash_rows": cum_h,
                    "batches": rows,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
