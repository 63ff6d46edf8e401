"""k-means differential vs a numpy Lloyd's reference with identical
deterministic seeding."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.operators.clustering import (
    embedding_kmeans,
    kmeans_summary,
)
from tests.conftest import SF_SMOKE


def _numpy_kmeans(ids, m, seed_mod=50, iterations=3):
    seed_ids = sorted(i for i in ids if i % seed_mod == 0)
    cents = np.stack([m[np.where(ids == s)[0][0]] for s in seed_ids])
    assign = None
    for _ in range(iterations):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, C)
        assign = d.argmin(axis=1)  # ties -> lowest c_id, matches the window
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return assign, d.min(axis=1)


def test_kmeans_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").orderBy("vec_id")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)

    got = {
        r.vec_id: r.c_id for r in embedding_kmeans(emb).collect()
    }
    want_assign, want_d = _numpy_kmeans(ids, m)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got[int(vid)] != int(want_assign[i])
    )
    # float summation-order ulps could flip an assignment sitting exactly
    # on a Voronoi boundary; random data makes that measure-zero
    assert mismatches == 0

    sizes = {
        r.c_id: r.size for r in kmeans_summary(embedding_kmeans(emb)).collect()
    }
    np_sizes = {int(c): int((want_assign == c).sum()) for c in set(want_assign)}
    assert sizes == np_sizes
