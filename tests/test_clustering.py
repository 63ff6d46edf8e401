"""k-means differential vs a numpy Lloyd's reference with identical
deterministic seeding.

Exact label equality is NOT a sound invariant here: the operator
accumulates cluster means from per-batch partial sums, so float summation
order differs from a single-pass numpy mean, and points near Voronoi
boundaries can legitimately land on either side after three rounds of
compounding. The sound invariants: near-total assignment agreement,
matching cluster-size distribution, and near-identical inertia.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.operators.clustering import (
    embedding_kmeans,
    kmeans_centroids,
    kmeans_summary,
)
from tests.conftest import SF_SMOKE


def _numpy_kmeans(ids, m, seed_mod=50, iterations=3):
    seed_ids = sorted(i for i in ids if i % seed_mod == 0)
    cents = np.stack([m[np.where(ids == s)[0][0]] for s in seed_ids])

    def dists(c):
        return (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )

    assign = None
    for _ in range(iterations):
        assign = dists(cents).argmin(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d = dists(cents)
    assign = d.argmin(axis=1)
    return assign, d[np.arange(len(assign)), assign]


def test_kmeans_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").orderBy("vec_id")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)

    got_rows = embedding_kmeans(emb).collect()
    got = {r.vec_id: r.c_id for r in got_rows}
    got_inertia = sum(r.dist_sq for r in got_rows)

    want_assign, want_d = _numpy_kmeans(ids, m)
    n = len(ids)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got[int(vid)] != int(want_assign[i])
    )
    assert mismatches <= 0.03 * n, f"{mismatches}/{n} assignments diverged"
    # inertia (the objective) must agree tightly even where labels flip —
    # a boundary point has near-equal distance to both candidate centroids
    assert abs(got_inertia - want_d.sum()) / want_d.sum() < 1e-3

    # summary over the already-trained assignments (no second training run)
    assigned_df = spark.createDataFrame(got_rows)
    sizes = {r.c_id: r.size for r in kmeans_summary(assigned_df).collect()}
    np_sizes = {int(c): int((want_assign == c).sum()) for c in set(want_assign)}
    assert set(sizes) == set(np_sizes)
    assert sum(sizes.values()) == n
    for c in np_sizes:
        assert abs(sizes[c] - np_sizes[c]) <= max(3, 0.1 * np_sizes[c]), c


def test_seed_cap_not_binding_is_identity(spark):
    """The default seed_cap (256 seeds) must not change results where it
    doesn't bind: sf0.001's 500 embeddings yield 10 seeds either way."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    capped = {(r.vec_id, r.c_id) for r in embedding_kmeans(emb).collect()}
    uncapped = {
        (r.vec_id, r.c_id)
        for r in embedding_kmeans(emb, seed_cap=None).collect()
    }
    assert capped == uncapped


def test_seed_cap_bounds_codebook(spark):
    """A binding cap keeps the codebook (= the driver collect) at
    O(seed_cap) rows regardless of how many ids pass the modulus."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    # seed_mod=10 selects 50 of the 500 ids; cap at 5 → ids {0,10,...,40}
    assigned = embedding_kmeans(emb, seed_mod=10, seed_cap=5)
    assert assigned.select("c_id").distinct().count() <= 5
    assert assigned.count() == 500  # every vector still assigned
    cb = kmeans_centroids(emb, seed_mod=10, seed_cap=5)
    assert cb.count() == 5


def test_trained_centroids_feed_ivf(spark):
    """kmeans_centroids -> ivf_topk(centroids=...) is the production ANN
    composition: on a CLUSTERED corpus the trained codebook's recall is at
    least the id-picked one's (id-picked seeds land wherever the id layout
    happens to put them; Lloyd's rounds move them to cluster centers)."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        make_query_set,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(5, 16)) * 10.0
    rows = []
    for i in range(400):
        c = i % 5  # cluster ids interleave, so id-modulus seeds oversample
        rows.append((i, (centers[c] + rng.normal(size=16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = make_query_set(emb, F.col("vec_id") < 10)
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(emb, qs, k=10).collect()}

    def recall(res):
        got = {(r.q_id, r.vec_id) for r in res.collect()}
        return len(got & exact) / len(exact)

    id_picked = recall(ivf_topk(emb, qs, k=10, centroid_mod=50, nprobe=2))
    trained = recall(
        ivf_topk(
            emb,
            qs,
            k=10,
            nprobe=2,
            centroids=kmeans_centroids(emb, seed_mod=50, iterations=3),
        )
    )
    assert trained >= id_picked
    assert trained >= 0.5


def test_kmeans_feeds_semantic_dedup_composition(spark):
    """embedding_kmeans assignments -> semantic_dedup -> anti-join prune is
    the production SemDeDup composition (q118's spec scores id-picked
    cluster columns; this is the trained-assignment path, the same
    composition upgrade kmeans_centroids -> ivf_topk got for ANN).

    Planted geometry: 4 orthogonal cluster directions; within each
    cluster, a 'parallel' family lies exactly on the cluster direction
    (cosine 1.0 to the representative, which is the lowest id and
    parallel by construction) and an 'angled' family sits at 30 degrees
    (cosine ~0.866). At threshold 0.95 the prune list must be exactly
    the non-representative parallel members — across the REAL kmeans
    assignments, not hand-made labels."""
    import math

    from etl_dag_paris_velib_spark.operators.clustering import embedding_kmeans
    from etl_dag_paris_velib_spark.operators.dedup import semantic_dedup

    cos30, sin30 = math.cos(math.pi / 6), math.sin(math.pi / 6)
    rows, parallel_ids = [], set()
    for i in range(200):
        c = i % 4
        scale = 10.0 * (1.0 + 0.001 * i)
        v = [0.0] * 8
        if (i // 4) % 3 == 0:  # parallel family (includes ids 0..3 = reps)
            v[2 * c] = scale
            parallel_ids.add(i)
        else:  # angled family: 30 degrees off the cluster direction
            v[2 * c] = scale * cos30
            v[2 * c + 1] = scale * sin30
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # seed_mod=51 picks ids 0/51/102/153 — exactly four seeds, one per
    # direction (directions 0/3/2/1); a modulus selecting two seeds in
    # one direction would legitimately split that direction's two rays
    # into separate clusters and the angled ray would become its own
    # rep — correct SemDeDup behavior, but not this test's geometry
    assigned = embedding_kmeans(emb, seed_mod=51, iterations=3).select(
        "vec_id", "c_id"
    )
    labeled = emb.join(assigned, "vec_id")
    prune = semantic_dedup(
        labeled, cluster_col="c_id", threshold=0.95
    ).collect()

    assert {r["vec_id"] for r in prune} == parallel_ids - {0, 1, 2, 3}
    assert all(round(r["score"], 6) == 1.0 for r in prune)
    assert {r["rep_id"] for r in prune} == {0, 1, 2, 3}
    # the anti-join prune: survivors = corpus minus the prune list
    kept = emb.join(
        spark.createDataFrame(
            [(r["vec_id"],) for r in prune], "vec_id long"
        ),
        "vec_id",
        "left_anti",
    )
    assert kept.count() == 200 - len(prune)


def test_ivf_sweep_matches_pointwise_runs(spark):
    """ivf_topk_sweep is an OPTIMIZATION of |settings| independent IVF
    queries (shared assign/probe/score passes) — per setting its rows
    must equal ivf_topk(nprobe=setting) exactly. Run on the real
    embeddings table so ties and probe-boundary cases are the data's,
    not a toy's."""
    from etl_dag_paris_velib_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_sweep,
        make_query_set,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = make_query_set(emb, F.col("vec_id") < 8)
    swept = ivf_topk_sweep(
        emb, qs, k=10, centroid_mod=50, nprobes=(1, 2, 4), centroid_cap=3200
    ).collect()
    by_setting = {}
    for r in swept:
        by_setting.setdefault(r["nprobe"], set()).add(
            (r["q_id"], r["vec_id"], round(r["score"], 9))
        )
    for s in (1, 2, 4):
        point = {
            (r["q_id"], r["vec_id"], round(r["score"], 9))
            for r in ivf_topk(
                emb, qs, k=10, centroid_mod=50, nprobe=s, centroid_cap=3200
            ).collect()
        }
        assert by_setting.get(s, set()) == point, f"nprobe={s} diverged"


def test_srp_bits_regroup_matches_direct_band_codes(spark):
    """q134's band-regroup path (srp_bits posexplode -> div/mod -> summed
    shifted bits) must produce, at the default 4x6 banding, the same
    candidate sets as srp_lsh_topk's direct GEMM band codes — checked
    through the operators' outputs: top-k from regrouped candidates ==
    srp_lsh_topk's top-k."""
    from pyspark.sql import Window

    from etl_dag_paris_velib_spark.functions.vector import dot, l2_norm
    from etl_dag_paris_velib_spark.operators.similarity import (
        srp_bits,
        srp_lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    direct = {
        (r["q_id"], r["vec_id"], round(r["score"], 9))
        for r in srp_lsh_topk(emb, F.col("vec_id") < 8, k=10).collect()
    }
    bits = srp_bits(emb).select(
        "vec_id", F.posexplode("bits").alias("j", "bit")
    )
    pb = 6
    codes = (
        bits.select(
            "vec_id",
            F.floor(F.col("j") / pb).cast("int").alias("band_idx"),
            (
                F.col("bit").cast("long")
                * F.pow(F.lit(2.0), (F.col("j") % pb)).cast("long")
            ).alias("w"),
        )
        .groupBy("vec_id", "band_idx")
        .agg(F.sum("w").cast("long").alias("code"))
    )
    qcodes = codes.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "band_idx", "code"
    )
    cand = (
        codes.join(qcodes, ["band_idx", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("nv", l2_norm("v"))
    qside = base.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    regroup = {
        (r["q_id"], r["vec_id"], round(r["score"], 9))
        for r in (
            cand.join(base, "vec_id")
            .join(F.broadcast(qside), "q_id")
            .select(
                "q_id",
                "vec_id",
                (dot("qv", "v") / (F.col("nq") * F.col("nv"))).alias("score"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 10)
            .collect()
        )
    }
    assert regroup == direct


def test_residual_ivfadc_beats_raw_codes_on_clustered_geometry(spark):
    """The r07 verdict's #4 ask — the full production composition
    kmeans_centroids -> residual encode -> per-list LUT -> ADC
    (operators/similarity.py:ivfadc_topk, the structure FAISS's
    IndexIVFPQ ships). On clustered geometry the residual form must
    recall AT LEAST as well as the raw-code form (q139's structure,
    trained): once coarse routing explains the cluster offset, residual
    codes spend the whole code budget on within-cluster structure,
    while raw codes waste it re-encoding the offsets.

    Geometry: 4 well-separated cluster centers in dim 16 (offset +-40),
    members displaced along 3 cluster-specific directions plus small
    noise — low-rank within-cluster structure, exactly the regime the
    residual transform exists for: raw codes must spend their budget
    re-encoding the +-40 offsets (measured recall 0.425 at m=4/ks=16),
    residual codes see only the centered low-rank spread (0.95)."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.clustering import (
        kmeans_centroids,
    )
    from etl_dag_paris_velib_spark.operators.similarity import ivfadc_topk

    rng = np.random.RandomState(7)
    dim, n_clusters, per_cluster = 16, 4, 60
    centers = rng.choice([-40.0, 40.0], size=(n_clusters, dim))
    dirs = rng.normal(size=(n_clusters, 3, dim))
    rows = []
    vecs = []
    for ci in range(n_clusters):
        for i in range(per_cluster):
            coef = rng.normal(0.0, 3.0, size=3)
            v = centers[ci] + coef @ dirs[ci] + rng.normal(0.0, 0.3, size=dim)
            vid = ci * per_cluster + i
            rows.append((vid, [float(x) for x in v]))
            vecs.append(v)
    X = np.array(vecs)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # trained coarse codebook through the kmeans seam: 4 seeds
    # (vec_id % 60 == 0 -> ids 0/60/120/180, one per planted cluster)
    cents = kmeans_centroids(emb, seed_mod=per_cluster, iterations=3)
    assert cents.count() == n_clusters

    q_ids = [0, 61, 122, 183]
    queries = spark.createDataFrame(
        [(int(q), rows[q][1]) for q in q_ids], "q_id long, qv array<double>"
    )

    # exact squared-L2 top-10 (numpy oracle, self excluded)
    k = 10
    exact = {}
    for q in q_ids:
        d = ((X - X[q]) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if i != q]
        exact[q] = set(order[:k])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & exact[q]) for q in q_ids
        ) / (k * len(q_ids))

    common = dict(k=k, nprobe=1, m=4, ks=16, pq_iterations=3)
    r_res = recall(ivfadc_topk(emb, queries, cents, residual=True, **common))
    r_raw = recall(ivfadc_topk(emb, queries, cents, residual=False, **common))

    # measured 0.95 vs 0.425; the margin assertion leaves room for the
    # last-ulp partial-sum nondeterminism in the trained coarse means
    assert r_res >= r_raw + 0.2, (r_res, r_raw)
    assert r_res >= 0.9, r_res


def test_ivfadc_with_saturated_codebook_is_exact(spark):
    """Degenerate-exactness invariant: with ks >= list size every
    residual slice becomes its own code (Lloyd init = the points,
    assignments are identity, means stay put), so the ADC estimate
    ||q_res_j - code_j||^2 summed over subspaces IS the true squared-L2
    distance — (q - c) - (v - c) == q - v term by term. On INTEGER
    vectors and INTEGER centroids every subtraction/product/sum is
    exact in doubles, so ivfadc_topk with nprobe = #lists must
    reproduce the brute-force squared-L2 top-k EXACTLY — ids, order,
    and adc_dist values — in both residual and raw-code forms. This
    certifies the assign/encode/LUT/ADC join machinery itself, not
    just 'recall is decent'."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.similarity import ivfadc_topk

    rng = np.random.RandomState(11)
    n, dim = 60, 8
    X = rng.randint(0, 21, size=(n, dim)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    # integer centroids picked from the corpus -> residuals stay exact
    cent_ids = [0, 20, 40]
    cents = spark.createDataFrame(
        [(ci, [float(x) for x in X[vid]]) for ci, vid in enumerate(cent_ids)],
        "c_id long, cv array<double>",
    )
    q_ids = [1, 7, 13, 29, 55]
    queries = spark.createDataFrame(
        [(int(q), [float(x) for x in X[q]]) for q in q_ids],
        "q_id long, qv array<double>",
    )

    k = 10
    want = {}
    for q in q_ids:
        d = ((X - X[q]) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if i != q]
        # brute-force key (dist, vec_id) == the operator's (adc, vec_id)
        order.sort(key=lambda i: (d[i], i))
        want[q] = [(i, d[i]) for i in order[:k]]

    for residual in (True, False):
        got = {}
        res = ivfadc_topk(
            emb, queries, cents, k=k, nprobe=len(cent_ids), m=4, ks=n,
            residual=residual, pq_iterations=2,
        ).collect()
        for r in res:
            got.setdefault(r["q_id"], []).append((r["vec_id"], r["adc_dist"]))
        for q in q_ids:
            assert got[q] == want[q], (residual, q, got[q][:3], want[q][:3])


def test_ivfadc_untrained_list_guard(spark):
    """The r08 advice's recall-hole guard: with residual=True and a
    train_id_bound that leaves a coarse list with members but no
    training vector, ivfadc_topk must NOT silently drop that list from
    encode/search. Default raises naming the uncovered lists;
    on_untrained_list='global' falls back to a pooled per-subspace
    codebook so the list's members stay searchable."""
    import pytest

    from etl_dag_paris_velib_spark.operators.similarity import ivfadc_topk

    rng = np.random.RandomState(3)
    dim = 8
    centers = np.array([[0.0] * dim, [100.0] * dim, [-100.0] * dim])
    rows = []
    for ci in range(3):
        for i in range(20):
            v = centers[ci] + rng.normal(0.0, 1.0, size=dim)
            rows.append((ci * 20 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(ci, [float(x) for x in centers[ci]]) for ci in range(3)],
        "c_id long, cv array<double>",
    )
    # query at cluster-2's center: nprobe=1 routes to exactly the list
    # whose members (ids 40..59) all sit ABOVE the id bound
    queries = spark.createDataFrame(
        [(999, [float(x) for x in centers[2]])],
        "q_id long, qv array<double>",
    )
    common = dict(k=5, nprobe=1, m=4, ks=8, residual=True)

    with pytest.raises(ValueError, match="untrained"):
        ivfadc_topk(emb, queries, cents, train_id_bound=40, **common)

    got = ivfadc_topk(
        emb, queries, cents, train_id_bound=40,
        on_untrained_list="global", **common,
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert len(got) == 5 and ids <= set(range(40, 60)), ids

    # no false positive: bound 41 gives list 2 one trainable member
    ok = ivfadc_topk(
        emb, queries, cents, train_id_bound=41, **common
    ).collect()
    assert len(ok) == 5

    with pytest.raises(ValueError, match="on_untrained_list"):
        ivfadc_topk(
            emb, queries, cents, train_id_bound=40,
            on_untrained_list="bogus", **common,
        )


def test_centroid_drift_separates_shift_from_noise(spark):
    """The q159 retraining monitor: a same-distribution split scores near
    sqrt(1/n_a + 1/n_b) (sampling noise), a systematic per-component
    shift s scores ~ s*sqrt(dim)/rms regardless of corpus size — the two
    regimes the 1.0 threshold separates. Closed-form check: unit-norm
    embeddings shifted by +0.5 on all 64 dims must score ~4.0."""
    from etl_dag_paris_velib_spark.operators.clustering import centroid_drift
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id")).first()[0]
    cut = 6 * (mx + 1) // 7
    base = emb.filter(F.col("vec_id") < cut)
    raw_delta = emb.filter(F.col("vec_id") >= cut)
    control = centroid_drift(base, raw_delta)
    assert 0.0 <= control < 0.5  # sampling noise, well under threshold

    shifted = raw_delta.withColumn(
        "embedding",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + F.lit(0.5)
        ),
    )
    dim = emb.select(F.size("embedding")).first()[0]
    drifted = centroid_drift(base, shifted)
    # rms norm of the (unit-normalized) corpus is ~1, so the score is
    # ~ 0.5 * sqrt(dim) up to the control's noise floor
    expect = 0.5 * dim**0.5
    assert abs(drifted - expect) < 0.5 + control
    # identical corpora: exactly zero shift
    assert centroid_drift(base, base) < 1e-12

    # the many-form (one base fold for several sides) matches the
    # single-pair form on both sides
    from etl_dag_paris_velib_spark.operators.clustering import (
        centroid_drift_many,
    )

    c2, d2 = centroid_drift_many(base, [raw_delta, shifted])
    assert abs(c2 - control) < 1e-9 and abs(d2 - drifted) < 1e-9

    # a DIMENSIONALITY change counts as drift (full-outer dim join):
    # growing 64 -> 80 dims with unit mass in the new dims must score
    # at least the new dims' mass, not drop them like an inner join
    import pytest

    grown = raw_delta.withColumn(
        "embedding",
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(1.0)] * 16),
        ),
    )
    g = centroid_drift(base, grown)
    assert g >= (16**0.5) * 0.9  # ||(1,)*16|| = 4, minus noise slack

    # empty sides raise instead of returning a silent 0/None score
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty side"):
        centroid_drift(base, empty)
    with pytest.raises(ValueError, match="empty side"):
        centroid_drift(empty, raw_delta)
