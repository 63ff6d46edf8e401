"""Corpus-curation query surface: the filters a training-data pipeline runs
between raw crawl and tokenizer — repetition filtering, benchmark
decontamination, cluster canonicalization, embedding quantization, and
mixture reweighting.

Same registry/oracle idiom as plans.llm: every spec carries the DuckDB SQL
that reproduces it bit-identically (md5-portable hashes, rounds AFTER
thresholds, BIGINT casts on both sides — see plans/llm.py header for the
cross-engine conventions).

No reference counterpart — these extend SURVEY.md §2.10 (the reference,
`/root/reference/airflow/dags/etl_dag.py`, is an ingest DAG with no corpus
analytics); the operator family follows the public Gopher/RefinedWeb-style
curation recipes re-expressed as Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from ..operators.textstats import quality_features
from ..sources.tpch import load_table
from .llm import _SQL_MINHASH_CAND, _SQL_TOKS
from .spec import Registry

C = Registry()

#: Sources treated as the held-out benchmark/eval suite by q55. Two of the
#: twenty synthetic sources — the realistic shape: the eval set is tiny
#: relative to the training crawl, which is what makes the broadcast
#: semi-join the right 100 TB plan.
BENCH_SOURCES = ("src0", "src1")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "documents", sf_dir)


# ---------------------------------------------------------------------------
# q54 — Gopher-style repetition signals
# ---------------------------------------------------------------------------
@C.add(
    "q54_repetition_signals",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id, 'uni' AS k, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, 'bi' AS k,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 1)),
                i -> array_to_string(t[i:i+1], ' '))) AS g
  FROM toks
  UNION ALL
  SELECT doc_id, 'tri' AS k,
         unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                i -> array_to_string(t[i:i+2], ' '))) AS g
  FROM toks
),
c AS (SELECT doc_id, k, g, count(*) AS c FROM g GROUP BY doc_id, k, g),
p AS (
  SELECT doc_id,
         sum(CASE WHEN k = 'uni' THEN c END)::BIGINT AS n_tokens,
         max(CASE WHEN k = 'uni' THEN c END)::BIGINT AS max_uni,
         sum(CASE WHEN k = 'bi' THEN c END)::BIGINT AS n_bigrams,
         max(CASE WHEN k = 'bi' THEN c END)::BIGINT AS max_bi,
         sum(CASE WHEN k = 'tri' THEN c END)::BIGINT AS n_trigrams,
         count(CASE WHEN k = 'tri' THEN 1 END)::BIGINT AS n_distinct_tri
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(max_uni::DOUBLE / n_tokens, 6) AS top_unigram_frac,
       round(max_bi::DOUBLE / n_bigrams, 6) AS top_bigram_frac,
       round(1.0 - n_distinct_tri::DOUBLE / n_trigrams, 6) AS dup_trigram_frac
FROM p
""",
    doc="Per-document repetition signals (the Gopher repetition filters "
    "re-expressed): most-frequent-unigram fraction, most-frequent-bigram "
    "fraction, duplicate-trigram fraction. One union'd gram stream -> one "
    "shuffle on (doc_id, kind, gram) -> one shuffle on doc_id; both keyed "
    "by doc_id so partial aggregation absorbs the fan-out map-side. No "
    "joins, no UDFs — survives 100x by partition count alone.",
    tags=("textstats", "curation", "llm"),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir).select("doc_id", tokens(F.col("text")).alias("t"))
    grams = (
        base.select("doc_id", F.lit("uni").alias("k"), F.explode("t").alias("g"))
        .unionByName(
            base.select(
                "doc_id",
                F.lit("bi").alias("k"),
                F.explode(word_shingles(F.col("t"), 2)).alias("g"),
            )
        )
        .unionByName(
            base.select(
                "doc_id",
                F.lit("tri").alias("k"),
                F.explode(word_shingles(F.col("t"), 3)).alias("g"),
            )
        )
    )
    cnt = grams.groupBy("doc_id", "k", "g").agg(F.count(F.lit(1)).alias("c"))
    uni = F.when(F.col("k") == "uni", F.col("c"))
    bi = F.when(F.col("k") == "bi", F.col("c"))
    tri = F.when(F.col("k") == "tri", F.col("c"))
    p = cnt.groupBy("doc_id").agg(
        F.sum(uni).alias("n_tokens"),
        F.max(uni).alias("max_uni"),
        F.sum(bi).alias("n_bigrams"),
        F.max(bi).alias("max_bi"),
        F.sum(tri).alias("n_trigrams"),
        F.count(tri).alias("n_distinct_tri"),
    )
    return p.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("max_uni") / F.col("n_tokens"), 6).alias("top_unigram_frac"),
        F.round(F.col("max_bi") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        F.round(1.0 - F.col("n_distinct_tri") / F.col("n_trigrams"), 6).alias(
            "dup_trigram_frac"
        ),
    )


# ---------------------------------------------------------------------------
# q55 — benchmark decontamination (n-gram overlap vs held-out sources)
# ---------------------------------------------------------------------------
@C.add(
    "q55_decontamination",
    oracle=f"""
WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(generate_series(1, greatest(len(t) - 7, 1)),
                       i -> array_to_string(t[i:i+7], ' '))) AS s
  FROM toks
),
ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
bench AS (SELECT DISTINCT g FROM ex WHERE source IN ('src0', 'src1')),
train AS (SELECT doc_id, g FROM ex WHERE source NOT IN ('src0', 'src1')),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM train GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits
  FROM train JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT h.doc_id, n_shingles, n_hits,
       round(n_hits::DOUBLE / n_shingles, 6) AS contamination_frac
FROM hits h JOIN sizes z ON h.doc_id = z.doc_id
""",
    doc="Benchmark decontamination: flag training docs sharing any 8-word "
    "shingle with the held-out benchmark sources (src0/src1). The "
    "benchmark shingle set is DISTINCT'd and broadcast — eval suites are "
    "tiny relative to a 100 TB crawl, so the contamination check is a "
    "map-side broadcast hash join over the exploded train shingles; the "
    "only shuffles are the per-doc count aggregations, keyed by doc_id. "
    "Non-vacuous here: planted near-dup docs cross the source split "
    "(6 contaminated docs at sf0.001, 4 at sf0.01).",
    tags=("curation", "llm", "join"),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    is_bench = F.col("source").isin(*BENCH_SOURCES)

    def _shingled(side: DataFrame) -> DataFrame:
        # source filter BEFORE tokenize/shingle/explode: the benchmark
        # branch only ever scans benchmark docs, the train branch scans the
        # rest exactly once.
        return side.select(
            "doc_id",
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), 8))
            ).alias("g"),
        )

    bench = _shingled(d.filter(is_bench)).select("g").distinct()
    train = _shingled(d.filter(~is_bench))
    # Single pass over the exploded train side: broadcast LEFT join marks
    # contaminated shingles, one doc_id-keyed aggregation counts both the
    # shingle total and the hits (count of non-null markers). An inner-join
    # formulation needs a second scan of the train side for the sizes.
    marked = train.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "g", "left"
    )
    per = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("contamination_frac"),
    )


# ---------------------------------------------------------------------------
# q56 — canonical document per near-dup cluster (quality-argmax survivor)
# ---------------------------------------------------------------------------
@C.add(
    "q56_canonical_docs",
    oracle=f"""
WITH RECURSIVE
{_SQL_MINHASH_CAND},
pairs AS (
  SELECT id_a, id_b
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.id_a
  JOIN sh sb ON sb.doc_id = cand.id_b
  WHERE len(list_intersect(sa.s, sb.s))::DOUBLE / len(list_distinct(sa.s || sb.s)) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.b AS id, r.label FROM reach r JOIN edges e ON e.a = r.id
),
comp AS (SELECT id AS doc_id, min(label) AS component FROM reach GROUP BY id),
tq AS (SELECT doc_id, text, {_SQL_TOKS} AS tk FROM documents),
qual AS (
  SELECT doc_id,
         round(0.3 * least(len(tk) / 100.0, 1.0)
               + 0.3 * (len(list_distinct(tk))::DOUBLE / len(tk))
               + 0.2 * (len(list_filter(tk,
                     x -> list_contains(['the','a','and','of','is','to'], x)))::DOUBLE
                   / len(tk))
               + 0.2 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
                   / length(text)), 6) AS quality_score
  FROM tq
)
SELECT component, doc_id AS canonical_doc_id, n_members, quality_score AS best_quality
FROM (
  SELECT component, c.doc_id, quality_score,
         count(*) OVER (PARTITION BY component)::BIGINT AS n_members,
         row_number() OVER (PARTITION BY component
                            ORDER BY quality_score DESC, c.doc_id) AS rn
  FROM comp c JOIN qual q ON c.doc_id = q.doc_id
)
WHERE rn = 1
""",
    doc="Survivor selection: within each near-dup component (q42's "
    "connected components over the q21 LSH pair graph) keep the highest-"
    "quality member (q26's rounded quality_score, doc_id tiebreak). The "
    "component map is bounded by the pair graph — a small fraction of the "
    "corpus — so it broadcasts against the quality side and the only "
    "shuffle is the per-component window over that small join result. "
    "Ranking uses the ROUNDED score in both engines so the comparison is "
    "on identical values; the doc_id tiebreak makes equal scores "
    "deterministic (plans/llm.py cross-engine conventions).",
    tags=("dedup", "curation", "llm", "graph"),
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_components
    from ..operators.similarity import minhash_lsh_pairs

    d = _docs(spark, sf_dir)
    comp = near_dup_components(minhash_lsh_pairs(d, threshold=0.5))
    qual = quality_features(d).select("doc_id", "quality_score")
    j = F.broadcast(comp).join(qual, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    wc = Window.partitionBy("component")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("canonical_doc_id"),
            "n_members",
            F.col("quality_score").alias("best_quality"),
        )
    )


# ---------------------------------------------------------------------------
# q57 — int8 symmetric embedding quantization
# ---------------------------------------------------------------------------
@C.add(
    "q57_quantized_embeddings",
    oracle="""
WITH x AS (
  SELECT vec_id, label,
         list_transform(embedding, v -> v::DOUBLE) AS xv
  FROM embeddings
),
s AS (
  SELECT vec_id, label, xv,
         list_max(list_transform(xv, v -> abs(v))) AS scale
  FROM x
),
q AS (
  SELECT vec_id, label, xv, scale,
         list_transform(xv, v -> round(v * 127.0 / scale)::INTEGER) AS qv
  FROM s
)
SELECT vec_id, label,
       round(scale, 6) AS scale,
       md5(array_to_string(list_transform(qv, v -> v::VARCHAR), ',')) AS qhash,
       list_max(list_transform(generate_series(1, len(xv)),
             i -> abs(xv[i] - qv[i] * scale / 127.0))) <= scale / 254.0
         AS err_within_bound
FROM q
""",
    doc="Int8 symmetric quantization of the embedding column — the storage/"
    "bandwidth step before ANN indexing at scale (4x smaller vectors, "
    "SIMD-able dot products). Per-row map: scale = max|x|, q_i = "
    "round(127 x_i / scale). Zero shuffles, whole-stage codegen, "
    "embarrassingly parallel at any scale. qhash md5s the quantized codes "
    "so the oracle verifies every code of every vector; the reconstruction "
    "bound err <= scale/254 is emitted as a FLAG computed on raw doubles — "
    "threshold-compare-then-never-round, because both engines produce "
    "bit-identical IEEE doubles but their round() implementations diverge "
    "within ~1e-10 of the half-way grid (observed once in 500 rows).",
    tags=("embedding", "curation", "llm"),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    d = e.select("vec_id", "label", x.alias("xv"))
    d = d.withColumn(
        "scale", F.array_max(F.transform(F.col("xv"), lambda v: F.abs(v)))
    )
    qv = F.transform(
        F.col("xv"), lambda v: F.round(v * 127.0 / F.col("scale")).cast("int")
    )
    d = d.withColumn("qv", qv)
    err = F.zip_with(
        F.col("xv"),
        F.col("qv"),
        lambda a, b: F.abs(a - b.cast("double") * F.col("scale") / 127.0),
    )
    # Materialize qhash/flag BEFORE the projection that aliases the rounded
    # scale to "scale": an unresolved F.col("scale") inside these lambdas
    # placed in that same select resolves against the ROUNDED sibling alias
    # (observed: dequant with rounded scale flipped the bound flag on one
    # razor-edge row), while the oracle uses the raw scale throughout.
    d = d.withColumn(
        "qhash",
        F.md5(F.array_join(F.transform(F.col("qv"), lambda v: v.cast("string")), ",")),
    ).withColumn("err_within_bound", F.array_max(err) <= F.col("scale") / 254.0)
    return d.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 6).alias("scale"),
        "qhash",
        "err_within_bound",
    )


# ---------------------------------------------------------------------------
# q58 — mixture reweighting to a uniform language target
# ---------------------------------------------------------------------------
@C.add(
    "q58_mixture_weights",
    oracle="""
WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang)
SELECT lang, n_docs,
       round(n_docs::DOUBLE / sum(n_docs) OVER (), 6) AS actual_frac,
       round((1.0 / count(*) OVER ())
             / (n_docs::DOUBLE / sum(n_docs) OVER ()), 6) AS weight
FROM g
""",
    doc="Data-mixture reweighting: per-language sampling weight that turns "
    "the observed language distribution into a uniform target "
    "(weight = target_frac / actual_frac — the knob a pretraining mix "
    "sweep tunes). One partial-aggregated groupBy on a low-cardinality "
    "key, then windows over the handful of group rows — the window input "
    "is |langs| rows regardless of corpus size.",
    tags=("curation", "llm", "agg"),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _docs(spark, sf_dir).groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    actual = F.col("n_docs") / F.sum("n_docs").over(w)
    weight = (F.lit(1.0) / F.count(F.lit(1)).over(w)) / actual
    return g.select(
        "lang",
        "n_docs",
        F.round(actual, 6).alias("actual_frac"),
        F.round(weight, 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# q59 — sequence packing: concat-then-chunk token bins per source shard
# ---------------------------------------------------------------------------
#: Context-window budget per packed bin (tokens). Small enough that sf0.001
#: already produces multiple bins per source.
PACK_CAPACITY = 512

@C.add(
    "q59_sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len({_SQL_TOKS}) AS n_tokens FROM documents
),
c AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT source,
       cum_before // {PACK_CAPACITY} AS bin_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS bin_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY source, bin_id
""",
    doc="Sequence packing for pretraining: documents are concatenated in "
    "doc_id order within their source shard and split into "
    f"{PACK_CAPACITY}-token context windows; a doc belongs to the bin where "
    "its first token lands (concat-then-chunk, the standard streaming "
    "packing). The running total is a window partitioned BY SOURCE SHARD — "
    "never a global single-partition sort: at 100 TB each shard packs "
    "independently and in parallel, exactly how a real tokenizer sharding "
    "job runs. Integer-only arithmetic (DIV on the cumulative count) keeps "
    "the bin assignment bit-identical across engines.",
    tags=("curation", "llm", "window"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    t = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.withColumn("bin_id", F.expr(f"cum_before DIV {PACK_CAPACITY}"))
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# q61 — cross-source shingle overlap (corpus contamination matrix)
# ---------------------------------------------------------------------------
@C.add(
    "q61_source_overlap",
    oracle=f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS tk FROM documents),
sh AS (
  SELECT DISTINCT source,
         unnest(list_transform(generate_series(1, greatest(len(tk) - 4, 1)),
                i -> array_to_string(tk[i:i+4], ' '))) AS g
  FROM t
),
sizes AS (SELECT source, count(*)::BIGINT AS n FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_common
  FROM sh a JOIN sh b USING (g)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common, sa.n AS n_a, sb.n AS n_b,
       round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.source = pairs.src_a
JOIN sizes sb ON sb.source = pairs.src_b
""",
    doc="Pairwise 5-gram-shingle Jaccard between source shards — the "
    "corpus-level overlap matrix used to spot mirrored crawls before "
    "mixture weighting. The Spark plan inverts the oracle's self-join: "
    "group by shingle (collect_set dedups, so no separate DISTINCT "
    "shuffle), then explode the (bounded, ≤ |sources|) source set's "
    "ordered pairs INCLUDING the (x, x) diagonal — the diagonal count IS "
    "the per-source distinct-shingle size, so the whole matrix including "
    "the denominators falls out of ONE lineage with one corpus scan, one "
    "shingle-keyed shuffle, and per-key work bounded by |sources|². The "
    "oracle's separate sizes branch would re-scan the corpus here; the "
    "windows that read the diagonal run over the ≤ |sources|² matrix "
    "rows only.",
    tags=("curation", "llm", "dedup"),
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    mat = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), 5))
            ).alias("g"),
        )
        .groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .select(
            F.explode(
                # slice from i+1 (1-based) keeps x itself: the (x, x)
                # diagonal row per shingle, plus each ordered pair (x, y>x)
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 1, size(ss)), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.src_a", "p.src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    diag = F.when(F.col("src_a") == F.col("src_b"), F.col("n_common"))
    n_a = F.max(diag).over(Window.partitionBy("src_a"))
    n_b = F.max(diag).over(Window.partitionBy("src_b"))
    return (
        mat.withColumn("n_a", n_a)
        .withColumn("n_b", n_b)
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
