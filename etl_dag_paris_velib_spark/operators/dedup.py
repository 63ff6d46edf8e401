"""Deduplication operators for large-scale document pipelines.

The reference's intended natural key is (station_id, last_reported)
(reference research/research.ipynb surrogate-key cell, raw line 11421);
generalized here to the dedup family a 100 TB training-data pipeline needs
(SURVEY.md §2.10): exact dedup on a content fingerprint, bag-of-words dedup
for reordered-content dupes, and (in ``operators.similarity``) MinHash-LSH /
SimHash near-dup joins.

Scale design: every operator here is a single hash shuffle on the dedup key
with map-side partial work — no collects, no windows over unbounded
partitions except per-key (bounded by duplicate multiplicity). A key
duplicated billions of times would skew its partition; AQE skew-split plus
``row_number`` over the key handles it without a driver round-trip.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, tokens


def keep_first(
    df: DataFrame,
    keys: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep exactly one row per key, the first under ``order_by``.

    Deterministic alternative to ``dropDuplicates`` (which keeps an
    arbitrary row). One shuffle on ``keys``; at 100 TB this is the
    canonical dedup plan — partial aggregation does not apply to
    row-preserving dedup, so the shuffle is irreducible, but AQE coalesces
    the post-shuffle partitions.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_dedup_rn", F.row_number().over(w))
        .filter(F.col("_dedup_rn") == 1)
        .drop("_dedup_rn")
    )


def keep_first_grouped(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """``applyInPandas`` variant of :func:`keep_first` — same semantics,
    Python per group. Use it when the within-group survivor logic outgrows
    SQL (fuzzy matching, model-scored canonicalization); for plain
    keep-first the window version stays JVM-side and is strictly cheaper.
    The shuffle profile is identical (one hash partition on ``keys``);
    the delta is the Arrow round-trip per group."""

    def first_row(pdf):
        return pdf.sort_values(list(order_by)).head(1)

    return df.groupBy(*keys).applyInPandas(first_row, df.schema)


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-content dedup: one row per md5(normalized text), keeping the
    lowest id. Adds the ``fingerprint`` column (kept in the output so
    downstream incremental runs can anti-join on it)."""
    with_fp = df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    return keep_first(with_fp, ["fingerprint"], [F.col(id_col)])


#: bounded LRU of computed component maps (same shape as
#: similarity._PAIR_CACHE): the iterative CC costs rounds x shuffles, and
#: q42/q56-class consumers ask for the SAME pair graph's components within
#: one session — reuse the localCheckpoint-backed result instead of
#: re-running the fixpoint.
from ..cacheutil import PinnedLRU, register_cache_clearer, session_token

# 16, not 8 (r11): q153/q154/q156/q158 insert 8 component entries between
# q152's warm and q42's re-request in alphabetical sweep order — at cap 8
# the entry q42 reuses was evicted and q42 ran the fixpoint cold (2.9s vs
# its 0.025s warm sf1.0 budget). localCheckpoint-backed entries are
# bounded by cluster-member counts, so 16 is cheap. Since r12 the q42
# standing canary's entry is PINNED (cap-immune, per-session) through
# the shared cacheutil.PinnedLRU policy — see
# similarity.py's pair-cache note for the rotation-eviction story.
_CC_CACHE_MAX = 16

# entries are localCheckpoint-backed: dropping the reference releases
# them, no unpersist needed on evict
_CC_CACHE = PinnedLRU(_CC_CACHE_MAX)


def _cc_cache_put(key: tuple, df: DataFrame, pin: bool = False) -> None:
    try:
        tok = session_token(df.sparkSession)
    except Exception:
        tok = None
    _CC_CACHE.put(key, df, pin=pin, session_token=tok)


def _cc_cache_hit(key: tuple, pin: bool = False) -> DataFrame:
    return _CC_CACHE.hit(key, pin=pin)


@register_cache_clearer
def clear_cc_cache() -> None:
    """Drop every cached component map, pinned included (cold-path
    measurement resets the canary pins with the entries)."""
    _CC_CACHE.clear()


def _iterate_scan_partitions(n_rows: int) -> int:
    """Partition count for the per-round scan of a fixpoint's persisted
    edge frame, derived from its ROW COUNT (r13; guide §2.2 — make
    partitioning scale-adaptive, derive from input size).

    Why this exists: a persisted frame keeps its creation-time shuffle
    partitioning for the cache's whole lifetime — AQE cannot re-coalesce
    a cached plan (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
    is false) — so a tiny component graph built under
    spark.sql.shuffle.partitions = core count fragments into ~2x
    core-count cached partitions, and EVERY fixpoint round's join then
    scans them all as separate scheduled tasks. Measured at sf0.1
    (q154's three admission graphs): 999 edge rows held in 64 cached
    partitions cost 201 tasks across 12 stages PER ROUND, ~1.6-2.6 s/
    round of pure task-scheduling floor. The same disease class as the
    streaming state-store pinning fixed in plans/streamq.py — partition
    count inherited from the core count instead of the data.

    The fix is a narrow ``coalesce(ceil(n_rows / target))`` over the
    cache: rows-per-partition ``target`` is env-tunable
    (SPARK_GRAFT_CC_ROWS_PER_PARTITION, default 1M rows ~ tens of MB of
    (tag, src, dst) longs — the guide's §2.2 partition-size band for an
    in-memory hash-join probe side). No upper clamp is needed:
    ``coalesce`` never INCREASES partition count, so a 100 TB edge list
    whose ceil(n/target) exceeds its existing partitioning keeps that
    partitioning unchanged — small graphs merge, big graphs are
    untouched, and nothing is pinned to the local core count."""
    import os

    target = int(
        os.environ.get("SPARK_GRAFT_CC_ROWS_PER_PARTITION", str(1 << 20))
    )
    return max(1, -(-n_rows // target))


def near_dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    method: str = "label",
    pin: bool = False,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc in a
    cluster gets ``component`` = the smallest doc id reachable from it.
    The canonicalization step after any pairwise near-dup join — keep one
    doc per COMPONENT, not per pair (pairs are not transitive-closed:
    A~B, B~C must collapse A,B,C together even when A~C was never
    emitted).

    ``method="label"`` (default): min-label propagation to fixpoint —
    each node repeatedly adopts the smallest label among itself and its
    neighbors. Iterations are bounded by the cluster DIAMETER (near-dup
    clusters are shallow; 20 covers any real corpus). Each round is one
    join + one groupBy on the edge list — no driver-side graph.

    ``method="star"``: alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log²) rounds regardless of diameter, the right choice
    for high-diameter graphs (chains of chunk-shifted near-dups) and the
    100 TB default. Differential-tested against the label method in
    tests/test_llm_operators.py, including a chain graph where label
    propagation's round budget blows up and star converges.

    Returns (doc_id, component) for every doc appearing in any pair.
    """
    try:
        cache_key = (
            "cc",
            session_token(pairs.sparkSession),
            pairs.semanticHash(),
            id_a,
            id_b,
            method,
            max_iterations,
        )
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _CC_CACHE:
        return _cc_cache_hit(cache_key, pin=pin)

    if method == "star":
        out = _components_star(pairs, id_a, id_b, max_iterations)
        if cache_key is not None:
            _cc_cache_put(cache_key, out, pin=pin)
        return out
    if method != "label":
        raise ValueError(f"unknown method: {method!r} (label | star)")
    # symmetric edge list + self-loops seed the labels. Symmetrization
    # is an EXPLODE of both orientations from one scan, not a
    # self-union: union(pairs, reversed(pairs)) embeds the pairs
    # subtree twice in the physical plan, and for callers that pass an
    # unpersisted pair set (q152/q153: the LSH verify chain) the whole
    # candidate+verify computation ran twice inside the one edges
    # materialization (guide §2.3 — compute once, fan out rows).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # labels and edges_self are localCheckpoint(eager=False), NOT persist
    # (r13): a cached frame short-circuits EXECUTION but keeps its full
    # LOGICAL plan, so every fixpoint round's query re-analyzes the whole
    # upstream candidate+verify tree through the InMemoryRelation —
    # measured on q154's graphs (999 edge rows): 1.6-2.6 s/round of
    # driver-side Catalyst work vs a 0.28 s same-shape round against a
    # lineage-free frame. The checkpoint truncates the lineage the same
    # way the per-round `stepped` checkpoint has since r11 (same
    # executor-loss trade, documented there), cutting the whole fixpoint
    # 8.9 -> 2.9 s at sf0.1 with identical labels. Storage is released
    # when the reference is GC'd (the _CC_CACHE entry note).
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
        .localCheckpoint(eager=False)
    )
    # labels only ever decrease, so "no row changed this round" is the
    # exact fixpoint test — checked per ROW (new != old), not via a sum
    # potential, so there is no overflow to guard and no baseline sum to
    # measure. Each iteration localCheckpoints its result: without
    # lineage truncation the logical plan doubles per round
    # (L' = L ⋈ f(L)) and the analyzer, not the data, becomes the
    # bottleneck — the canonical Spark iterative-algorithm trap. The
    # checkpoint is LAZY (eager=False) and the changed-row count is the
    # first action over it, so one round costs ONE driver action —
    # materialize + fixpoint test together — where the r11 shape paid
    # two per round (eager checkpoint, then a sum) plus an up-front
    # baseline-sum job.
    # One round = ONE join + ONE map-side-combinable aggregation (r12).
    # The r11 shape ran three shuffling operators per round (neighbor
    # join, groupBy-min, left-join-back onto the old labels); appending
    # a SELF-LOOP row per node to the (symmetric, persisted) edge list
    # folds all three into a single groupBy(src): the self-loop row
    # carries label[src], so min(label) over the group is exactly
    # least(old, neighbor-min), the conditional min over the self-loop
    # row recovers the old label for the fixpoint test, and no node can
    # drop out (every src has its self-loop row — what the left join
    # used to guarantee). Partial aggregation shrinks what the round
    # shuffles to one (src, partial-min) row per map partition per src
    # (guide §2.3/§2.4); measured per-CC-call AQE job count 29–37 →
    # 23–30 across the q152–q158 lifecycle with identical labels, and
    # local sf0.1 wall time UNCHANGED within host noise — this is a
    # plan-shape win (2 exchanges/round instead of 3–4, partial agg
    # before the shuffle), not a local-latency one. Path compression
    # (label ← label[label]) was tried and REVERTED: the planted
    # near-dup clusters converge in 2 rounds, so the extra join per
    # round cost more than the rounds it could save.
    edges_self = edges.unionByName(
        labels.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    ).localCheckpoint(eager=False)
    # ONE count materializes the checkpoints (the union's branches read
    # edges' cache and compute labels) — round 1 paid exactly this
    # lazily before — and its row count sizes a narrow coalesce of the
    # per-round scan, so a tiny graph stops fragmenting into core-count
    # partitions (see _iterate_scan_partitions; labels' round-1 view
    # gets the same treatment — rounds 2+ join against the 1-partition
    # stepped checkpoint). edges is fully consumed once both
    # checkpoints are materialized, so its cache is released HERE, not
    # at function exit — the residual footprint is the two
    # checkpointed, GC-released frames.
    nparts = _iterate_scan_partitions(edges_self.count())
    scan = edges_self.coalesce(nparts)
    edges.unpersist()
    labels = labels.coalesce(nparts)
    for _ in range(max_iterations):
        stepped = (
            scan.join(labels, scan.dst == labels.id)
            .groupBy("src")
            .agg(
                F.min(
                    F.when(F.col("dst") == F.col("src"), F.col("label"))
                ).alias("_old"),
                F.min("label").alias("label"),
            )
            .select(F.col("src").alias("id"), "_old", "label")
            .localCheckpoint(eager=False)  # truncates lineage; caches on
            # first action (the count below), costing zero extra jobs
        )
        n_changed = stepped.filter(F.col("label") != F.col("_old")).count()
        labels = stepped.select("id", "label")
        if n_changed == 0:
            break
    else:
        # exiting without the break = non-fixpoint: some cluster's diameter
        # exceeds the budget and its labels are WRONG, not approximate
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iterations} "
            "iterations — raise max_iterations (diameter exceeds budget) "
            "or use method='star' (diameter-independent)"
        )
    out = labels.select(F.col("id").alias("doc_id"), F.col("label").alias("component"))
    if cache_key is not None:
        _cc_cache_put(cache_key, out, pin=pin)
    return out


def near_dup_components_multi(
    tagged_pairs: DataFrame,
    tag_col: str = "rnd",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    pin: bool = False,
) -> DataFrame:
    """Connected components over SEVERAL independent pair graphs in ONE
    fixpoint loop: ``tagged_pairs`` carries a ``tag_col`` column naming
    the graph each pair belongs to, and the result is
    ``(tag, doc_id, component)`` — exactly
    :func:`near_dup_components`'s output per tag.

    Why it exists (r13, guide §2.4/§2.6): a caller that needs the
    components of k INDEPENDENT graphs (q154's three admission rounds —
    their pair sets all derive from pre-built index artifacts, with no
    round feeding the next round's edges) would otherwise run k
    serialized driver-loop fixpoints, paying k× the per-round action
    latency (edges build + one count per round, each a full AQE job
    barrier) while every job runs over a tiny label frame. Folding the
    tag into the key — the same recurrence fold as the r12 beam-sweep
    (`beam` as a frontier column) — runs ONE loop in
    max(per-graph rounds) iterations over the union.

    EQUIVALENCE: every key below is ``(tag, id)`` and no operator mixes
    tags — the edge join matches on tag, the groupBy groups by tag, the
    self-loop rows carry their tag — so for a fixed tag the label
    evolution is row-for-row the single-graph recurrence; the only
    shared thing is the fixpoint TEST (max over tags of per-graph
    rounds), and extra rounds past a graph's own fixpoint are identity
    on its labels (min over an unchanged frontier). Pinned by
    tests/test_llm_operators.py's multi-vs-single differential.
    """
    try:
        cache_key = (
            "cc-multi",
            session_token(tagged_pairs.sparkSession),
            tagged_pairs.semanticHash(),
            tag_col,
            id_a,
            id_b,
            max_iterations,
        )
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _CC_CACHE:
        return _cc_cache_hit(cache_key, pin=pin)

    tag = F.col(tag_col).alias("tag")
    edges = (
        tagged_pairs.select(
            tag,
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e"),
        )
        .select("tag", "e.src", "e.dst")
        .distinct()
        .persist()
    )
    # localCheckpoint + sizing count + narrow coalesce, exactly as in
    # near_dup_components — see the comments there for the measured
    # lineage-reanalysis and fragmentation numbers (both measured on
    # THIS caller's graphs, q154)
    labels = (
        edges.select("tag", "src")
        .distinct()
        .select("tag", F.col("src").alias("id"), F.col("src").alias("label"))
        .localCheckpoint(eager=False)
    )
    edges_self = edges.unionByName(
        labels.select("tag", F.col("id").alias("src"), F.col("id").alias("dst"))
    ).localCheckpoint(eager=False)
    nparts = _iterate_scan_partitions(edges_self.count())
    scan = edges_self.coalesce(nparts)
    edges.unpersist()
    labels = labels.coalesce(nparts)
    for _ in range(max_iterations):
        # the label side is RE-ALIASED per join (ltag/lid): round 1's
        # labels lineage is embedded inside edges_self (the self-loop
        # union branch), so unaliased references would be ambiguous
        # under Spark's dataset-id self-join check — the single-graph
        # version dodges this only because its join touches no shared
        # column NAME; here `tag` is on both sides
        lab = labels.select(
            F.col("tag").alias("ltag"),
            F.col("id").alias("lid"),
            "label",
        )
        stepped = (
            scan.join(
                lab,
                (F.col("tag") == F.col("ltag"))
                & (F.col("dst") == F.col("lid")),
            )
            .groupBy("tag", "src")
            .agg(
                F.min(
                    F.when(F.col("dst") == F.col("src"), F.col("label"))
                ).alias("_old"),
                F.min("label").alias("label"),
            )
            .select("tag", F.col("src").alias("id"), "_old", "label")
            .localCheckpoint(eager=False)
        )
        n_changed = stepped.filter(F.col("label") != F.col("_old")).count()
        labels = stepped.select("tag", "id", "label")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"near_dup_components_multi did not converge in {max_iterations}"
            " iterations — raise max_iterations (diameter exceeds budget)"
        )
    out = labels.select(
        F.col("tag").alias(tag_col),
        F.col("id").alias("doc_id"),
        F.col("label").alias("component"),
    )
    if cache_key is not None:
        _cc_cache_put(cache_key, out, pin=pin)
    return out


def near_dup_purge(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    method: str = "label",
) -> DataFrame:
    """Materialize the DEDUPLICATED corpus: the transform a pipeline
    actually runs after pairwise near-dup detection (q21) and cluster
    canonicalization (q42). Survivor rule: each connected component
    keeps its smallest-id member (the component label from
    :func:`near_dup_components` IS that id under min-label/star
    propagation), every other cluster member is dropped, and docs that
    appear in no pair pass through untouched.

    Plan: components over the pair graph (bounded by cluster diameter /
    O(log^2) rounds for ``method="star"``), a loser list of
    O(|cluster members|) ids — corpus-SUBLINEAR, since near-dup
    clusters are a small fraction of a crawl — then ONE left-anti join
    of the corpus against it. At 100 TB the loser side broadcasts when
    it fits and AQE falls back to a shuffle anti-join when it doesn't;
    either way the corpus is scanned exactly once and never shuffled on
    a text column. Keep-min is deterministic, so reruns are idempotent
    (the r08 incremental-dedup family's requirement).
    """
    comp = near_dup_components(pairs, id_a=id_a, id_b=id_b, method=method)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")


def incremental_near_dup_purge(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    base_bands: DataFrame | None = None,
    base_hashes: DataFrame | None = None,
    delta_bands: DataFrame | None = None,
    delta_hashes: DataFrame | None = None,
    method: str = "label",
) -> DataFrame:
    """Per-increment dedup admission: which DELTA docs enter the kept
    corpus. The daily-crawl companion of :func:`near_dup_purge` — the
    base corpus STAYS untouched; each increment only decides the new
    batch's fate.

    Built on :func:`operators.similarity.incremental_lsh_pairs` (pairs
    touching the delta — per-increment cost O(|delta| x bands) probes
    against the stored band index, never a corpus recomputation) and
    components over that pair set.

    FATE EQUIVALENCE with the full recompute holds under either of two
    PRECONDITIONS — it is a theorem given one of them, not a general
    property of arbitrary splits:

    - **monotone ids** (every base id < every delta id — the natural
      crawl shape, ids assigned in arrival order): if a delta doc's
      full-graph component contains any base doc, walking from the
      delta doc to the FIRST base doc on the path uses only
      delta-touching edges, so the incremental component already holds
      a smaller-id (base) neighbor and the doc drops in both views;
      an all-delta component has identical edges in both views. The
      premise matters — with interleaved ids a delta doc linked to a
      mid-sized base doc that base-base edges connect to a smaller id
      is kept incrementally but dropped by the full recompute.
    - **deduplicated base** (no base-base edge at the threshold): then
      EVERY full-graph edge touches the delta, so the incremental pair
      set IS the full pair set restricted to relevant components.

    Under monotone ids, keep-min can additionally never evict a base
    doc, so increments compose (q154). The q153 oracle certifies the
    monotone-id form cross-engine by computing the FULL-graph purge
    restricted to an id-cutoff delta.

    Pass ``base_bands`` / ``base_hashes`` (see
    :func:`operators.similarity.build_lsh_index`) to consume the stored
    index, and ``delta_bands`` / ``delta_hashes`` to reuse the delta's
    own artifacts when the caller builds them anyway to grow the index
    (one shingle pass per increment — the q154 crawl loop). ``k`` /
    ``bands`` / ``shingle_n`` are forwarded to the pair probe and must
    match the parameters any passed artifacts were built with. Returns
    the kept subset of ``delta`` with its columns.

    SEQUENCE-of-increments caveat (q154): fate equivalence holds for
    ONE increment against a fixed base. Across a sequence, online
    admission is order-dependent and legitimately diverges from the
    global one-shot purge — a doc connected to a smaller id only
    through a FUTURE doc's edges is admitted online (the future edge
    does not exist yet) but dropped offline. That is the intended
    crawl-loop semantics; replaying the same batch order reproduces
    it exactly, and rejected docs must STAY indexed so later
    near-dups of them are still rejected.
    """
    from .similarity import incremental_lsh_pairs

    pairs = incremental_lsh_pairs(
        base,
        delta,
        id_col=id_col,
        text_col=text_col,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
        base_bands=base_bands,
        base_hashes=base_hashes,
        delta_bands=delta_bands,
        delta_hashes=delta_hashes,
    )
    comp = near_dup_components(pairs, method=method)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return delta.join(losers, on=id_col, how="left_anti")


def _components_star(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iterations: int,
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    One round = large-star then small-star, each a groupBy-min plus a
    re-keyed projection of the symmetric edge list:

    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u});
    - small-star(u): every neighbor v <= u, and u itself, re-attaches
      to m.

    Both steps strictly shrink a potential over edge endpoints, and the
    alternation converges to a star forest whose centers are the
    component minima in O(log²) rounds (Kiveris et al.) — independent of
    graph diameter, unlike label propagation. Fixpoint = the canonical
    edge SET is unchanged (count + empty anti-join: exact, no arithmetic
    to overflow).
    """

    def _sym(e: DataFrame) -> DataFrame:
        # explode, not self-union: one scan of e per symmetrization (the
        # star rounds' e is an unpersisted projection — see the label
        # method's edges note)
        return (
            e.select(
                F.explode(
                    F.array(
                        F.struct(F.col("src"), F.col("dst")),
                        F.struct(
                            F.col("dst").alias("src"),
                            F.col("src").alias("dst"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
        )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        s = _sym(e)
        m = (
            s.groupBy("src")
            .agg(F.min("dst").alias("_mn"))
            .select("src", F.least("src", "_mn").alias("_m"))
        )
        joined = s.join(m, "src")
        if large:
            out = joined.filter(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("_m").alias("dst")
            )
        else:
            out = joined.filter(F.col("dst") <= F.col("src")).select(
                F.col("dst").alias("src"), F.col("_m").alias("dst")
            ).unionByName(m.select("src", F.col("_m").alias("dst")))
        return out.filter(F.col("src") != F.col("dst")).distinct()

    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .persist()
    )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    for _ in range(max_iterations):
        # localCheckpoint: one round's plan is ~8 operators; without
        # truncation the per-round plan would grow geometrically
        new_edges = _star(_star(edges, large=True), large=False).localCheckpoint()
        n_new = new_edges.count()
        unchanged = (
            n_new == edges.count()
            and new_edges.join(edges, ["src", "dst"], "left_anti").isEmpty()
        )
        edges.unpersist()
        edges = new_edges
        if unchanged:
            break
    else:
        edges.unpersist()
        nodes.unpersist()
        raise RuntimeError(
            f"star components did not converge in {max_iterations} rounds"
        )
    # star forest: every non-center node has exactly one edge to its
    # center (= component min); centers label themselves
    labeled = nodes.join(edges, nodes.id == edges.src, "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("dst", "id").alias("component"),
    )
    nodes.unpersist()
    return labeled


def bow_fingerprint(text_col) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 over the sorted
    distinct token set. Catches dupes that shuffle word order (template
    churn, scraped re-renders) that exact fingerprints miss."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " "))


def bow_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bag-of-words dedup: one row per distinct token set, keeping the
    lowest id."""
    with_fp = df.withColumn("bow_fp", bow_fingerprint(F.col(text_col)))
    return keep_first(with_fp, ["bow_fp"], [F.col(id_col)])


def semantic_dedup(
    emb: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.15,
) -> DataFrame:
    """SemDeDup-style within-cluster embedding pruning (Abbas et al.
    2023's shape): inside each semantic cluster, score every member by
    cosine to the cluster's deterministic representative (lowest id)
    and flag members above ``threshold`` as redundant. Returns the
    PRUNE LIST — (cluster, vec_id, rep_id, score) — which a curation
    pipeline anti-joins against the corpus.

    Scale shape: one shuffle (the per-cluster min-id aggregate, O(rows)
    partial-combined to O(clusters)); the representative table — id AND
    vector, O(clusters) rows — broadcasts back onto the corpus, so the
    scoring pass is map-side only: a JVM ``zip_with``/``aggregate``
    dot-product fold per row, no Python, no second shuffle, output
    bounded by the true redundancy count. In production the cluster
    column comes from k-means over the embeddings
    (operators/clustering.py:embedding_kmeans feeds assignments
    straight in); any deterministic cluster id works identically.

    Exactness: vectors cast float->double ONCE up front so every dot
    product is a single left-to-right double fold — bit-identical to
    DuckDB's ``list_dot_product`` (the q33 construction) — and the
    threshold compares the ROUNDED score on both engines, so the
    cutoff cannot straddle a sub-ULP divergence.
    """
    e = emb.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # the groupBy key keeps e's expression id, so the aggregate output is
    # re-aliased immediately — otherwise every later self-join resolves
    # "cluster" against both lineages and fails as ambiguous
    reps = (
        e.groupBy("cluster")
        .agg(F.min("vec_id").alias("rep_id"))
        .select(F.col("cluster").alias("r_cluster"), "rep_id")
    )
    rvec = e.join(
        F.broadcast(reps), e["vec_id"] == reps["rep_id"]
    ).select("r_cluster", "rep_id", e["v"].alias("rvec"))
    from ..functions.vector import cosine_similarity

    # the members/representatives join is a SELF-join three plans deep
    # (rvec derives from e twice over); SubqueryAlias boundaries are the
    # only disambiguation Spark accepts here
    m, r = e.alias("m"), rvec.alias("rv")
    scored = (
        m.join(F.broadcast(r), F.col("m.cluster") == F.col("rv.r_cluster"))
        .filter(F.col("m.vec_id") != F.col("rv.rep_id"))
        .select(
            F.col("m.cluster"),
            F.col("m.vec_id"),
            F.col("rv.rep_id"),
            F.round(
                cosine_similarity(F.col("m.v"), F.col("rv.rvec")), 6
            ).alias("score"),
        )
    )
    return scored.filter(F.col("score") > F.lit(threshold))
