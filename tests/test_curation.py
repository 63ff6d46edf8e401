"""Curation query surface (plans/curation.py): planted-case semantics plus
the plan locks its 100 TB story depends on (q55's benchmark side broadcast,
q54 join-free). The differential gate (tools/diffcheck.py) covers oracle
parity; these tests pin behavior on hand-built rows where the expected
values are computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from etl_dag_paris_velib_spark.plans.curation import BENCH_SOURCES
from tests.conftest import SF_ORACLE, SF_SMOKE


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q54_repetition_fractions_planted(spark):
    # "a a a a" -> top unigram 4/4, bigrams "a a" x3 -> 3/3, trigrams dup 2/3
    # "w x y z" -> all distinct: top uni 1/4, top bi 1/3, dup tri 0
    from etl_dag_paris_velib_spark.plans.curation import q54
    import etl_dag_paris_velib_spark.plans.curation as cur

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a a"), Row(doc_id=2, text="w x y z")]
    )
    orig = cur._docs
    cur._docs = lambda s, d: df
    try:
        out = {r.doc_id: r for r in q54(spark, "ignored").collect()}
    finally:
        cur._docs = orig
    assert out[1].n_tokens == 4
    assert out[1].top_unigram_frac == 1.0
    assert out[1].top_bigram_frac == 1.0
    assert out[1].dup_trigram_frac == pytest.approx(1 - 1 / 2)
    assert out[2].top_unigram_frac == 0.25
    assert out[2].top_bigram_frac == pytest.approx(round(1 / 3, 6))
    assert out[2].dup_trigram_frac == 0.0


def test_q55_flags_planted_contamination(spark):
    # train doc 3 shares its full 8-gram with benchmark doc 1; doc 4 shares
    # nothing. Only doc 3 is flagged, with frac 1.0 (its only shingle hits).
    from etl_dag_paris_velib_spark.plans.curation import q55
    import etl_dag_paris_velib_spark.plans.curation as cur

    eight = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source=BENCH_SOURCES[0], text=eight),
            Row(doc_id=3, source="srcX", text=eight),
            Row(doc_id=4, source="srcX", text="alpha beta gamma delta e f g h"),
        ]
    )
    orig = cur._docs
    cur._docs = lambda s, d: df
    try:
        rows = {r.doc_id: r for r in q55(spark, "ignored").collect()}
    finally:
        cur._docs = orig
    assert set(rows) == {3}
    assert rows[3].n_hits == 1 and rows[3].contamination_frac == 1.0


def test_q55_benchmark_side_is_broadcast(spark):
    plan = _plan(spark, "q55_decontamination")
    assert "BroadcastHashJoin" in plan
    # the contamination probe itself must not shuffle-join the train side
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_q54_is_join_free(spark):
    plan = _plan(spark, "q54_repetition_signals")
    assert "Join" not in plan


def test_q56_canonical_is_best_member(spark):
    # Canonical doc must belong to its component and carry the component's
    # max quality score (cross-checked against q42 + q26 outputs).
    comp = {
        r.doc_id: r.component
        for r in entrymod.queries()["q42_dedup_clusters"](spark, SF_SMOKE).collect()
    }
    qual = {
        r.doc_id: r.quality_score
        for r in entrymod.queries()["q26_quality_score"](spark, SF_SMOKE).collect()
    }
    rows = entrymod.queries()["q56_canonical_docs"](spark, SF_SMOKE).collect()
    assert rows
    members_by_comp: dict = {}
    for d, c in comp.items():
        members_by_comp.setdefault(c, []).append(d)
    for r in rows:
        assert comp[r.canonical_doc_id] == r.component
        assert r.n_members == len(members_by_comp[r.component])
        assert r.best_quality == max(qual[d] for d in members_by_comp[r.component])


def test_q57_codes_roundtrip_and_bound(spark):
    rows = entrymod.queries()["q57_quantized_embeddings"](spark, SF_SMOKE).collect()
    assert rows and all(r.err_within_bound for r in rows)
    assert all(r.scale > 0 for r in rows)


def test_q58_weights_invert_distribution(spark):
    rows = entrymod.queries()["q58_mixture_weights"](spark, SF_SMOKE).collect()
    total = sum(r.n_docs for r in rows)
    k = len(rows)
    for r in rows:
        assert r.actual_frac == pytest.approx(r.n_docs / total, abs=1e-6)
        # weight * actual_frac == uniform target share
        assert r.weight * r.actual_frac == pytest.approx(1 / k, rel=1e-4)


def test_q59_packing_planted(spark):
    # Three docs in one source: 300 + 300 + 100 tokens with capacity 512.
    # Doc 1 starts at cum 0 -> bin 0; doc 2 at cum 300 -> bin 0; doc 3 at
    # cum 600 -> bin 1. Bin 0 holds 600 tokens (overflow allowed: the doc
    # that STARTS in a bin counts there), bin 1 holds 100.
    from etl_dag_paris_velib_spark.plans.curation import q59
    import etl_dag_paris_velib_spark.plans.curation as cur

    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text="tok " * 300),
            Row(doc_id=2, source="s", text="tok " * 300),
            Row(doc_id=3, source="s", text="tok " * 100),
        ]
    )
    orig = cur._docs
    cur._docs = lambda s, d: df
    try:
        bins = {r.bin_id: r for r in q59(spark, "ignored").collect()}
    finally:
        cur._docs = orig
    assert bins[0].n_docs == 2 and bins[0].bin_tokens == 600
    assert bins[0].first_doc == 1 and bins[0].last_doc == 2
    assert bins[1].n_docs == 1 and bins[1].bin_tokens == 100


def test_q59_window_is_partitioned_by_source(spark):
    # The packing cumsum must never be a single global window: the sort
    # key list in the physical plan has to carry the source partition.
    plan = _plan(spark, "q59_sequence_packing")
    assert "Window" in plan
    assert "partitionBy=[source" in plan.replace(" ", "") or "source" in plan


def test_q61_overlap_planted(spark):
    # Sources A and B share exactly one 5-gram ("one two three four five");
    # B's trailing tokens add a second distinct shingle to B only.
    from etl_dag_paris_velib_spark.plans.curation import q61
    import etl_dag_paris_velib_spark.plans.curation as cur

    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="one two three four five"),
            Row(doc_id=2, source="b", text="one two three four five six"),
        ]
    )
    orig = cur._docs
    cur._docs = lambda s, d: df
    try:
        rows = q61(spark, "ignored").collect()
    finally:
        cur._docs = orig
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b) == ("a", "b")
    assert r.n_common == 1 and r.n_a == 1 and r.n_b == 2
    assert r.jaccard == 0.5


def test_q61_has_no_shingle_self_join(spark):
    # The overlap matrix is built by grouping on the shingle and exploding
    # bounded source-set pairs — a self-join on the shingle key would
    # appear as a SortMergeJoin over g.
    plan = _plan(spark, "q61_source_overlap")
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# q104 shard shuffle invariants
# ---------------------------------------------------------------------------

def test_shard_shuffle_reproducible_balanced_contiguous(spark):
    """Identity-hash shuffle: (a) rerun is byte-identical, (b) shards are
    balanced without sampling, (c) positions are contiguous 1..|shard| —
    the reproducible epoch-0 order contract."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    fn = entrymod.queries()["q104_shard_shuffle"]
    a = sorted(map(tuple, fn(spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, fn(spark, SF_ORACLE).collect()))
    assert a == b and len(a) == 500

    from collections import Counter, defaultdict

    by_shard = Counter(r[1] for r in a)
    assert set(by_shard) == set(range(16))
    # md5 uniformity: 500 docs / 16 shards = 31.25 expected; generous bound
    assert max(by_shard.values()) - min(by_shard.values()) < 60
    pos = defaultdict(list)
    for _, shard, p in a:
        pos[shard].append(p)
    for shard, ps in pos.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard} gap"


def test_mixture_resample_rates_and_determinism(spark):
    """Realized copy rates concentrate at the target (0.4 even / 1.7 odd
    sources), every document keeps >= floor(r) copies, and the fan-out is
    a pure function of identity (rerun-identical)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    fn = entrymod.queries()["q105_mixture_resample"]
    rows = fn(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, fn(spark, SF_ORACLE).collect())
    )
    from collections import Counter

    n_docs = Counter()   # (parity -> docs), from the source table
    n_copies = Counter()
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect()
    for d in docs:
        n_docs[int(d["source"][3:]) % 2] += 1
    per_doc = Counter()
    for r in rows:
        parity = int(r["source"][3:]) % 2
        n_copies[parity] += 1
        per_doc[r["doc_id"]] += 1
    assert abs(n_copies[0] / n_docs[0] - 0.4) < 0.1
    assert abs(n_copies[1] / n_docs[1] - 1.7) < 0.1
    # odd sources guarantee floor(1.7) = 1 copy; max is 2
    for r in rows:
        assert 1 <= per_doc[r["doc_id"]] <= 2


# ---------------------------------------------------------------------------
# q111 — priority sampling (weighted, without replacement)
# ---------------------------------------------------------------------------

def test_priority_sample_estimator_and_determinism(spark):
    """DLT invariants: the sample is exactly k rows, priorities are
    strictly ordered above tau, est_weight = max(w, tau), the sum of
    est_weight over the sample is an (unbiased) estimate of the corpus
    total weight — a single realization must land within a loose band —
    and the whole thing is rerun-identical (hash-derived uniforms, no
    RNG state)."""
    fn = entrymod.queries()["q111_priority_sample"]
    rows = fn(spark, SF_ORACLE).collect()
    assert len(rows) == 200
    min_sampled = min(r["priority"] for r in rows)
    assert min_sampled > 0
    # est_weight = max(w, tau) with tau the (k+1)-th priority: it is
    # never below the item's own weight, the rows where it EXCEEDS the
    # weight all share the single value tau, and tau sits strictly below
    # the smallest sampled priority
    taus = {r["est_weight"] for r in rows if r["est_weight"] > r["n_chars"]}
    assert len(taus) == 1, taus
    (tau,) = taus
    assert tau < min_sampled
    for r in rows:
        assert r["est_weight"] == max(float(r["n_chars"]), tau)
    total = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .agg(F.sum("n_chars"))
        .first()[0]
    )
    est = sum(r["est_weight"] for r in rows)
    assert abs(est - total) / total < 0.25, (est, total)
    # determinism: a second run returns the identical sample
    again = fn(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_priority_sample_single_scan_plan(spark):
    """Rank and tau both derive from the same k+1-row top-k frame: the
    executed plan must contain exactly ONE TakeOrderedAndProject and ONE
    parquet scan of documents (the r06 shape built the orderBy().limit()
    lineage twice — once for ranked, once for the tau aggregate)."""
    fn = entrymod.queries()["q111_priority_sample"]
    plan = (
        fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("TakeOrderedAndProject") == 1, plan
    assert plan.count("documents.parquet") == 1, plan


def test_priority_sample_exact_weights_when_corpus_fits(spark, tmp_path):
    """DLT prescribes the EXACT weight w when the corpus has <= k docs
    (there is no (k+1)-th priority to truncate at): with 50 documents
    and k=200 every doc is sampled and est_weight == n_chars exactly —
    the estimator sums to the true total, not an inflated one."""
    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50)
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    fn = entrymod.queries()["q111_priority_sample"]
    rows = fn(spark, str(tmp_path)).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["est_weight"] == float(r["n_chars"]), r
