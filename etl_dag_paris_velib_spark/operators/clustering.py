"""Embedding clustering: distributed Lloyd's k-means.

The missing step between raw embeddings and the IVF index
(operators/similarity.py:ivf_topk uses deterministic id-picked centroids;
this produces TRAINED ones for the same dataflow), and the standard
corpus-organization pass (topic bucketing, dedup blocking, data mixing).

Execution model — the canonical iterative-ML shape on Spark:
- the MODEL (C x dim centroids) lives on the driver and is broadcast each
  round; the DATA never leaves executors;
- assignment = broadcast cross join + per-row argmin (one pass, no
  shuffle beyond the tiny window on vec_id);
- update = posexplode to (cluster, dim, value) + groupBy mean — one
  map-side-combined shuffle of C x dim cells;
- iterations are a driver loop over lazy plans, exactly like
  near_dup_components (operators/dedup.py).

Determinism: centroid seeds are id-picked (vec_id %% seed_mod == 0), ties
break to the lowest centroid id, so repeated runs agree bit-for-bit on
assignments (floating-point summation order can differ across
partitionings only in the last ulp of the means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _as_double


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def embedding_kmeans(
    embeddings: DataFrame,
    seed_mod: int = 50,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means (squared-L2) with deterministic id-picked seeds.

    Returns the assignment table (vec_id, cluster, dist_sq) after
    ``iterations`` rounds. Cluster ids are the 0-based ordinal of the seed
    vectors in ascending vec_id order.
    """
    spark = embeddings.sparkSession
    base = _as_double(embeddings, id_col, vec_col).select("vec_id", "v")

    seeds = (
        base.filter(F.col("vec_id") % seed_mod == 0).orderBy("vec_id").collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]

    assigned = None
    for _ in range(iterations):
        cents_df = spark.createDataFrame(centroids, "c_id long, cv array<double>")
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist_sq"), F.asc("c_id"))
        assigned = (
            base.crossJoin(F.broadcast(cents_df))
            .withColumn("dist_sq", _l2sq(F.col("v"), F.col("cv")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "v", "c_id", "dist_sq")
        )
        # update: element-wise mean per cluster — C x dim cells come back
        # to the driver (the model), the data stays distributed
        means = (
            assigned.select("c_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("c_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("c_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        new_centroids = {r["c_id"]: list(r["cv"]) for r in means}
        # empty clusters keep their previous centroid
        centroids = [
            (cid, new_centroids.get(cid, vec)) for cid, vec in centroids
        ]

    return assigned.select("vec_id", "c_id", "dist_sq")


def kmeans_summary(assignments: DataFrame) -> DataFrame:
    """Per-cluster size + inertia from :func:`embedding_kmeans` output."""
    return assignments.groupBy("c_id").agg(
        F.count(F.lit(1)).alias("size"),
        F.round(F.sum("dist_sq"), 2).alias("inertia"),
    )
