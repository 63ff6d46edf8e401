"""Embedding clustering: distributed Lloyd's k-means.

The missing step between raw embeddings and the IVF index
(operators/similarity.py:ivf_topk uses deterministic id-picked centroids
by default; this produces TRAINED ones for the same dataflow — see
:func:`kmeans_centroids`, which plugs straight into
``ivf_topk(centroids=...)``), and the standard corpus-organization pass
(topic bucketing, dedup blocking, data mixing).

Execution model — the canonical iterative-ML shape on Spark:
- the MODEL (C x dim centroids) lives on the driver and is broadcast each
  round; the DATA never leaves executors;
- each round is ONE ``mapInPandas`` pass emitting per-batch sufficient
  statistics (cluster count + vector sum), merged on the driver — the
  map-side-combine formulation of the centroid update;
- iterations are a driver loop over lazy plans, exactly like
  near_dup_components (operators/dedup.py).

Determinism: centroid seeds are id-picked (vec_id %% seed_mod == 0, id
below the ``seed_cap`` bound), ties break to the lowest centroid id, so
repeated runs agree bit-for-bit on assignments (floating-point summation
order can differ across partitionings only in the last ulp of the means).

Scale: every piece of driver state is O(seed_cap * dim) — the seed
collect is bounded by ``seed_cap`` REGARDLESS of corpus size (without the
bound, ``vec_id % seed_mod == 0`` selects n/seed_mod vectors: 2% of a
100 TB corpus on the driver). A real index has a fixed codebook; the cap
keeps that property while staying deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double

#: default max codebook size: bounds every driver-side structure at
#: O(seed_cap * dim) independent of corpus size. Not binding below
#: seed_mod * seed_cap rows of dense ids (sf0.1's 5k embeddings use all
#: 100 seeds); a 100 TB corpus trains on the first seed_cap seeds only.
DEFAULT_SEED_CAP = 256


def _seed_filter(seed_mod: int, seed_cap: int | None, id_col: str = "vec_id"):
    cond = F.col(id_col) % seed_mod == 0
    if seed_cap is not None:
        cond = cond & (F.col(id_col) < seed_mod * seed_cap)
    return cond


def _dists(block, c):
    """||v - c||^2 for every (row, centroid) pair — one GEMM per batch;
    clamp: cancellation can yield -1e-16 for a vector AT its centroid."""
    import numpy as np

    d = (
        (block * block).sum(axis=1)[:, None]
        - 2.0 * (block @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )
    return np.maximum(d, 0.0, out=d)


def _train(base: DataFrame, seed_mod: int, seed_cap: int | None, iterations: int):
    """Run the Lloyd loop over a persisted (vec_id, v) frame; returns the
    final (C x dim) numpy centroid matrix. Driver state is O(C * dim)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = base.sparkSession
    seeds = (
        base.filter(_seed_filter(seed_mod, seed_cap)).orderBy("vec_id").collect()
    )
    if not seeds:
        base.unpersist()
        raise ValueError(
            f"no seed vectors: no vec_id satisfies % {seed_mod} == 0 under "
            f"seed_cap={seed_cap} — lower seed_mod / raise the cap"
        )
    cents = np.array([r["v"] for r in seeds], dtype=np.float64)

    stats_schema = StructType(
        [
            StructField("c_id", LongType()),
            StructField("n", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
        ]
    )

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(cents)

        def partial_stats(batches):
            c = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                block = np.array(pdf["v"].tolist(), dtype=np.float64)
                assign = _dists(block, c).argmin(axis=1)
                out = []
                for cid in np.unique(assign):
                    members = block[assign == cid]
                    out.append((int(cid), len(members), members.sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["c_id", "n", "vsum"])

        partials = base.mapInPandas(partial_stats, stats_schema).collect()
        bc.unpersist(blocking=False)  # round's model copy is dead on executors
        counts = np.zeros(len(cents))
        sums = np.zeros_like(cents)
        for r in partials:
            counts[r["c_id"]] += r["n"]
            sums[r["c_id"]] += np.array(r["vsum"])
        nonempty = counts > 0  # empty clusters keep their previous centroid
        cents[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return cents


def embedding_kmeans(
    embeddings: DataFrame,
    seed_mod: int = 50,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_cap: int | None = DEFAULT_SEED_CAP,
) -> DataFrame:
    """Lloyd's k-means (squared-L2) with deterministic id-picked seeds.

    Returns the assignment table (vec_id, c_id, dist_sq) after
    ``iterations`` rounds. Cluster ids are the 0-based ordinal of the seed
    vectors in ascending vec_id order. ``seed_cap`` bounds the codebook
    (and so every driver-side collect/broadcast) at O(seed_cap * dim)
    regardless of corpus size; pass ``None`` to disable the bound.

    Each round is ONE ``mapInPandas`` pass emitting per-batch sufficient
    statistics (cluster count + vector sum — C x (dim+1) doubles per
    batch); the driver merges those into new centroids. That is the
    map-side-combine formulation: nothing wider than the model ever
    leaves an executor, and the distance kernel is a numpy GEMM instead
    of an interpreted array fold (~5x faster measured at sf0.1).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = embeddings.sparkSession
    # persisted for iterations+1 passes; stays cached for the returned
    # (lazy) assignment DataFrame — same cache-lifetime contract as
    # operators.similarity (see that module docstring)
    base = _as_double(embeddings, id_col, vec_col).select("vec_id", "v").persist()
    cents = _train(base, seed_mod, seed_cap, iterations)

    bc_final = spark.sparkContext.broadcast(cents)
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("c_id", LongType()),
            StructField("dist_sq", DoubleType()),
        ]
    )

    def final_assign(batches):
        c = bc_final.value
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.array(pdf["v"].tolist(), dtype=np.float64)
            d = _dists(block, c)
            assign = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "c_id": assign,
                    "dist_sq": d[np.arange(len(assign)), assign],
                }
            )

    return base.mapInPandas(final_assign, out_schema)


def kmeans_centroids(
    embeddings: DataFrame,
    seed_mod: int = 50,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_cap: int | None = DEFAULT_SEED_CAP,
) -> DataFrame:
    """Train the same Lloyd loop and return the CODEBOOK as a (c_id, cv)
    DataFrame — the bridge into :func:`~..operators.similarity.ivf_topk`'s
    ``centroids`` parameter, turning the id-picked demo codebook into a
    trained IVF index over the identical dataflow:

        ivf_topk(emb, qs, centroids=kmeans_centroids(emb))

    The codebook is O(seed_cap * dim) rows built driver-side by design
    (the model IS driver state in the broadcast-model execution shape);
    the returned frame is what ivf_topk broadcasts.
    """
    spark = embeddings.sparkSession
    base = _as_double(embeddings, id_col, vec_col).select("vec_id", "v").persist()
    try:
        cents = _train(base, seed_mod, seed_cap, iterations)
    finally:
        base.unpersist()
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "c_id long, cv array<double>",
    )


def kmeans_summary(assignments: DataFrame) -> DataFrame:
    """Per-cluster size + inertia from :func:`embedding_kmeans` output."""
    return assignments.groupBy("c_id").agg(
        F.count(F.lit(1)).alias("size"),
        F.round(F.sum("dist_sq"), 2).alias("inertia"),
    )


def centroid_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
) -> float:
    """Normalized mean-shift between two embedding corpora — the
    retraining-contract scalar of the drift-to-maintenance seam (q159):
    ``a`` is the stripe a stored codebook was built from, ``b`` the
    increments it now serves; a score above the pipeline's threshold
    means frozen-codebook incremental maintenance (q157) is no longer
    the right plan and the codebook retrains below a new cutoff.

        drift = ||mean(a) - mean(b)||_2 / sqrt(mean_a(||v||^2))

    i.e. the distance between the two global centroids in units of the
    training stripe's RMS vector norm. Scale-invariant and zero-mean-
    safe: for same-distribution sides the numerator concentrates at
    sigma*sqrt(d*(1/n_a+1/n_b)) (score ~ sqrt(1/n_a+1/n_b) -> 0 as the
    corpus grows), while a systematic per-component shift s scores
    ~ s*sqrt(d)/rms regardless of corpus size. A raw cosine between the
    mean vectors is NOT usable here: zero-centered embedding corpora
    have near-zero mean vectors whose direction is noise, so the
    no-drift cosine is itself noise (measured 0.08-0.20 on the
    testdata) rather than ~1.

    Dimension changes count as drift, not silently vanish: the per-dim
    partials join FULL OUTER with missing-side means coalesced to 0, so
    an encoder that GROWS the dimensionality (b is 128-dim over a
    64-dim training stripe) contributes the new dims' full mass to the
    numerator instead of being dropped by an inner join. An empty side
    raises ValueError — no meaningful score exists and a silent 0/NaN
    would mis-route the retraining decision either way.

    One-sided cost note: scoring SEVERAL candidate increments against
    one training stripe should use :func:`centroid_drift_many`, which
    folds the (dominant) a-side partials once.

    Same mergeable-partials plan shape as q126: each side folds to
    per-dim (sum, sum-of-squares, count) in exploded (dim, value)
    space — ONE dims-sized fact shuffle per side — then the score
    reduces to a single row (bounded-collect family: graph.py's delta
    probe, q126's own fold). No arrays through shuffles, no UDFs, no
    corpus collect.
    """
    return centroid_drift_many(a, [b], vec_col=vec_col)[0]


def _drift_partials(df: DataFrame, side: str, vec_col: str) -> DataFrame:
    return (
        df.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "dim", "val"
            )
        )
        .groupBy("dim")
        .agg(
            (F.sum("val") / F.count(F.lit(1))).alias(f"m_{side}"),
            (F.sum(F.col("val") * F.col("val")) / F.count(F.lit(1))).alias(
                f"sq_{side}"
            ),
        )
    )


def centroid_drift_many(
    a: DataFrame,
    bs: list,
    vec_col: str = "embedding",
) -> list:
    """:func:`centroid_drift` for several ``b`` sides against ONE
    training stripe, folding the a-side partials once (q159 scores both
    the no-drift control and the staged increment; the base stripe is
    6/7 of the corpus, so re-folding it per score doubled the monitor's
    dominant cost). The a-partials frame is dims-sized — persisting it
    is pennies; it is unpersisted before returning."""
    ap = _drift_partials(a, "a", vec_col).persist()
    try:
        out = []
        for b in bs:
            joined = ap.join(
                _drift_partials(b, "b", vec_col), "dim", "full_outer"
            )
            row = joined.agg(
                (
                    F.sqrt(
                        F.sum(
                            F.pow(
                                F.coalesce(F.col("m_a"), F.lit(0.0))
                                - F.coalesce(F.col("m_b"), F.lit(0.0)),
                                F.lit(2),
                            )
                        )
                    )
                    / F.sqrt(F.sum("sq_a"))
                ).alias("drift"),
                F.count(F.col("m_b")).alias("nb"),
            ).first()
            if row["drift"] is None or row["nb"] == 0:
                raise ValueError(
                    "centroid_drift: empty side (no vectors / no dims) — "
                    "no meaningful drift score exists"
                )
            out.append(float(row["drift"]))
        return out
    finally:
        ap.unpersist()
