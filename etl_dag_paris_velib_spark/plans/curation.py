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
    "fraction, duplicate-trigram fraction. The signals are row-local "
    "pure functions, so the right plan has ZERO shuffles and one scan: "
    "an Arrow mapInPandas kernel (tokenize once, Counter passes per "
    "doc — operators/textstats.py:repetition_signals), parity-locked "
    "against its whole-stage-codegen HOF twin repetition_signals_expr. "
    "The exploded-gram groupBy form this replaced shuffled O(total "
    "grams) strings twice; measured 3.6x slower at sf0.1 and strictly "
    "worse at 100 TB. Embarrassingly parallel — scales by partition "
    "count alone.",
    tags=("textstats", "curation", "llm"),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


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
  JOIN hsets sa ON sa.doc_id = cand.id_a
  JOIN hsets sb ON sb.doc_id = cand.id_b
  WHERE len(list_intersect(sa.hs, sb.hs))::DOUBLE / len(list_distinct(sa.hs || sb.hs)) >= 0.5
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
       (cum_before // {PACK_CAPACITY})::BIGINT AS bin_id,
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
        # group on the 64-bit hash, not the ~40-byte shingle string: the
        # shingle-keyed Exchange carries 8-byte longs (same keyspace
        # reasoning as q65's 60-bit span keys — collision odds ~n²/2^65
        # are below the md5-idiom's own). The oracle groups by the string;
        # identical groups absent a collision.
        .select("source", F.xxhash64("g").alias("g"))
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


# ---------------------------------------------------------------------------
# q62 — chunk-level boilerplate detection (CCNet/RefinedWeb line dedup)
# ---------------------------------------------------------------------------
@C.add(
    "q62_boilerplate_chunks",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
ch AS (
  SELECT doc_id, source,
         unnest(list_transform(
             generate_series(1, greatest((len(t) + 9) // 10, 1)),
             i -> array_to_string(t[(i-1)*10+1:(i-1)*10+10], ' '))) AS chunk
  FROM toks
),
d AS (
  SELECT doc_id, source, chunk, count(*) AS n_in_doc,
         len(string_split(chunk, ' ')) AS chunk_tokens
  FROM ch GROUP BY doc_id, source, chunk
),
w AS (
  SELECT *, count(*) OVER (PARTITION BY source, chunk) AS n_docs FROM d
)
SELECT doc_id, source,
       sum(n_in_doc)::BIGINT AS n_chunks,
       sum(CASE WHEN n_docs >= 2 THEN n_in_doc ELSE 0 END)::BIGINT
         AS n_boiler_chunks,
       sum(CASE WHEN n_docs < 2 THEN n_in_doc * chunk_tokens ELSE 0 END)::BIGINT
         AS n_tokens_kept
FROM w GROUP BY doc_id, source
""",
    doc="Line-level boilerplate removal (the CCNet / RefinedWeb "
    "shared-line filter) adapted to this corpus's newline-free text: the "
    "dedup unit is the contiguous 10-token chunk, and a chunk is "
    "boilerplate when its exact text recurs in >= 2 distinct documents of "
    "the same source shard. One explode -> one (doc, source, chunk) "
    "groupBy -> one window keyed by (source, chunk) -> one per-doc "
    "re-aggregation: three shuffles, each keyed by a hash with "
    "corpus-bounded fanout, no join back to the corpus. The hot keys ARE "
    "the boilerplate chunks being detected, so the window partition size "
    "is bounded by the very frequency the filter caps.",
    tags=("curation", "llm", "dedup"),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tokens(F.col("text"))
    n_chunks = F.greatest(
        F.floor((F.size(t) + F.lit(9)) / F.lit(10)).cast("int"), F.lit(1)
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.array_join(F.slice(t, (i - F.lit(1)) * F.lit(10) + F.lit(1), 10), " "),
    )
    per_doc_chunk = (
        _docs(spark, sf_dir)
        .select("doc_id", "source", F.explode(chunk_arr).alias("chunk"))
        .groupBy("doc_id", "source", "chunk")
        .agg(F.count(F.lit(1)).alias("n_in_doc"))
        .withColumn("chunk_tokens", F.size(F.split(F.col("chunk"), " ")))
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("source", "chunk"))
    boiler = F.col("n_docs") >= 2
    return (
        per_doc_chunk.withColumn("n_docs", n_docs)
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n_in_doc").cast("bigint").alias("n_chunks"),
            F.sum(F.when(boiler, F.col("n_in_doc")).otherwise(0))
            .cast("bigint")
            .alias("n_boiler_chunks"),
            F.sum(
                F.when(~boiler, F.col("n_in_doc") * F.col("chunk_tokens")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# q63 — top-quality selection via distributed exact rank (histogram rank)
# ---------------------------------------------------------------------------
@C.add(
    "q63_quality_selection",
    oracle="""
WITH t AS (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
f AS (
  SELECT doc_id, source,
         round(0.3 * least(len(tk) / 100.0, 1.0)
               + 0.3 * (len(list_distinct(tk))::DOUBLE / len(tk))
               + 0.2 * (len(list_filter(tk,
                     x -> list_contains(['the','a','and','of','is','to'], x)))::DOUBLE
                   / len(tk))
               + 0.2 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
                   / length(text)), 6) AS quality_score
  FROM t
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality_score DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM f
)
SELECT doc_id, source, quality_score, rk::BIGINT AS rk
FROM r WHERE rk * 5 <= n
""",
    doc="Per-source top-20% selection by quality score — the data-selection "
    "step after scoring, done with an EXACT distributed rank that never "
    "creates a single-reducer window: rows bucket by floor(score*50), a "
    "tiny (source x bucket) histogram yields cumulative bucket offsets and "
    "per-source totals, the histogram broadcast-joins back, and a window "
    "partitioned by (source, bucket) — partition size bounded by the "
    "histogram resolution, not the source size — supplies the within-bucket "
    "order. rank = bucket offset + within-bucket row_number, identical to "
    "the oracle's one-big-window row_number. The oracle's "
    "PARTITION BY source window would put each 100 TB source shard on one "
    "reducer; the histogram plan's largest shuffle partition is "
    "|source|/50. Selection threshold rk*5 <= n is integer math — no "
    "float-boundary risk (plans/llm.py header conventions). Ties order by "
    "the 6dp-rounded score then doc_id, both deterministic cross-engine "
    "(q26 hash-verifies the rounded score).",
    tags=("curation", "llm", "window"),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "source", "quality_score"
    )
    b = s.withColumn(
        "bkt", F.floor(F.col("quality_score") * F.lit(50)).cast("int")
    )
    hist = b.groupBy("source", "bkt").agg(F.count(F.lit(1)).alias("c"))
    w_src = Window.partitionBy("source")
    w_cum = w_src.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    off = hist.select(
        "source",
        "bkt",
        (F.sum("c").over(w_cum) - F.col("c")).alias("off"),
        F.sum("c").over(w_src).alias("n_src"),
    )
    w_rk = Window.partitionBy("source", "bkt").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    return (
        b.join(F.broadcast(off), ["source", "bkt"])
        .withColumn("rk", (F.col("off") + F.row_number().over(w_rk)).cast("bigint"))
        .filter(F.col("rk") * 5 <= F.col("n_src"))
        .select("doc_id", "source", "quality_score", "rk")
    )


# ---------------------------------------------------------------------------
# q64 — deterministic train/valid/test split assignment
# ---------------------------------------------------------------------------
@C.add(
    "q64_split_assignment",
    oracle="""
SELECT doc_id, source,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT % 100)::BIGINT
         AS bucket,
       CASE
         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT % 100 < 80
           THEN 'train'
         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT % 100 < 90
           THEN 'valid'
         ELSE 'test'
       END AS split
FROM documents
""",
    doc="Stable train/valid/test assignment: bucket = 60-bit md5 prefix of "
    "the document key mod 100, split by fixed 80/10/10 cutoffs. Hashing "
    "the KEY (not row position or random()) makes the assignment a pure "
    "function of identity — append more corpus and existing documents "
    "never migrate between splits, the property eval-set hygiene needs. "
    "Zero shuffles, embarrassingly parallel, md5-portable to the oracle "
    "(functions/text.py header).",
    tags=("curation", "llm"),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# q65 — exact-substring repeated spans (Lee et al. 2022 dedup signal)
# ---------------------------------------------------------------------------
@C.add(
    "q65_repeated_spans",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, len(t) AS n, i AS pos,
         ('0x' || substr(md5(array_to_string(t[i:i+14], ' ')), 1, 15))::UBIGINT
           AS h
  FROM toks, unnest(generate_series(1, greatest(len(t) - 14, 1))) AS u(i)
),
m AS (
  SELECT *, count(*) OVER (PARTITION BY h) AS cnt FROM sh
),
isl AS (
  SELECT doc_id, n, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w >= 15
              THEN 1 ELSE 0 END AS new_island
  FROM m WHERE cnt >= 2
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, n, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, n, island,
         max(pos) - min(pos) + 15 AS span_tokens
  FROM grp GROUP BY doc_id, n, island
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       least(sum(span_tokens), n)::BIGINT AS repeated_tokens,
       n::BIGINT AS n_tokens,
       round(least(sum(span_tokens), n)::DOUBLE / n, 6) AS repeated_frac
FROM spans GROUP BY doc_id, n
""",
    doc="Exact-substring duplication signal (the deduplicate-training-data "
    "ExactSubstr pass re-expressed relationally): positions whose 15-token "
    "window recurs ANYWHERE in the corpus, merged into maximal disjoint "
    "spans per document via gaps-and-islands, reported as a per-document "
    "duplicated-token fraction. Plan: positional shingles JVM-side, 60-bit "
    "md5 keys so the corpus-wide occurrence count shuffles 8-byte longs "
    "(not 15-token strings), one window keyed by hash — hot keys are the "
    "repeated substrings themselves, fanout bounded by their true "
    "frequency — then two per-document windows over position (documents "
    "are bounded, sources are not: per-doc windows scale freely). The "
    "suffix-array construction the paper uses is sequential; this "
    "fixed-window relational form is the shuffle-native equivalent with "
    "resolution L=15.",
    tags=("curation", "llm", "dedup"),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tokens(F.col("text"))
    base = _docs(spark, sf_dir).select(
        "doc_id", t.alias("t"), F.size(t).alias("n")
    )
    sh = base.select(
        "doc_id",
        "n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("n") - 14, F.lit(1))),
                lambda i: F.conv(
                    F.substring(F.md5(F.array_join(F.slice(F.col("t"), i, 15), " ")), 1, 15),
                    16,
                    10,
                ).cast("long"),
            )
        ).alias("pos0", "h"),
    ).select("doc_id", "n", (F.col("pos0") + 1).alias("pos"), "h")
    cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w_doc)
    new_island = F.when(prev.isNull() | (F.col("pos") - prev >= 15), 1).otherwise(0)
    matched = (
        sh.withColumn("cnt", cnt)
        .filter(F.col("cnt") >= 2)
        .withColumn("new_island", new_island)
        .withColumn(
            "island",
            F.sum("new_island").over(
                w_doc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = matched.groupBy("doc_id", "n", "island").agg(
        (F.max("pos") - F.min("pos") + 15).alias("span_tokens")
    )
    rep = F.least(F.sum("span_tokens"), F.first("n"))
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            rep.cast("bigint").alias("repeated_tokens"),
            F.first("n").cast("bigint").alias("n_tokens"),
            F.round(rep.cast("double") / F.first("n"), 6).alias("repeated_frac"),
        )
    )


# ---------------------------------------------------------------------------
# q70 — balanced mixture sampling (deterministic hash thresholding)
# ---------------------------------------------------------------------------
@C.add(
    "q70_weighted_sample",
    oracle="""
WITH c AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY source),
g AS (SELECT sum(n_s)::BIGINT AS total, count(*)::BIGINT AS n_src FROM c)
SELECT d.doc_id, d.source
FROM documents d JOIN c USING (source) CROSS JOIN g
WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT % 1000000)::BIGINT
        * g.n_src * c.n_s
      < g.total * 1000000
""",
    doc="Apply a mixture: sample every source down to an equal share of "
    "the corpus (weight w_s = min(1, total/(|S| * n_s))) by hash "
    "thresholding — keep doc iff md5-uniform(doc_id) < w_s. The "
    "comparison is cross-multiplied to pure BIGINT arithmetic, so the "
    "kept set is a deterministic function of document identity: "
    "bit-portable to the oracle, append-stable, and re-runnable with no "
    "RNG state to coordinate across 1000 executors (the reason hash "
    "sampling, not rand(), is the 100 TB idiom). Per-source counts ride "
    "a tiny broadcast; the fact stream never shuffles. Overflow bound: "
    "r * |S| * n_s stays under int64 for n_s up to ~5e11 docs/source.",
    tags=("curation", "sampling", "llm"),
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy()
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn("total", F.sum("n_s").over(w))
        .withColumn("n_src", F.count(F.lit(1)).over(w))
    )
    r = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 1_000_000
    )
    return (
        docs.join(F.broadcast(counts), "source")
        .filter(r * F.col("n_src") * F.col("n_s") < F.col("total") * F.lit(1_000_000))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# q72 — grouped-agg pandas UDAF (length-weighted quality per source)
# ---------------------------------------------------------------------------
@C.add(
    "q72_weighted_quality",
    oracle="""
WITH t AS (
  SELECT doc_id, source, n_chars, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
q AS (
  SELECT doc_id, source, n_chars,
         round(
           0.3 * least(len(tk) / 100.0, 1.0)
         + 0.3 * (len(list_distinct(tk))::DOUBLE / len(tk))
         + 0.2 * (len(list_filter(tk, x -> list_contains(['the','a','and','of','is','to'], x)))::DOUBLE / len(tk))
         + 0.2 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE / length(text))
         , 6) AS quality_score
  FROM t
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       round(sum(quality_score * n_chars) / sum(n_chars), 6)
         AS weighted_quality
FROM q GROUP BY source
""",
    doc="Length-weighted mean quality per source via a GROUPED_AGG "
    "pandas_udf (functions/udfs.py:make_weighted_mean_udaf) — the UDAF "
    "member of the Python-surface taxonomy (SURVEY §2.9), exercised on "
    "q26's quality score weighted by document length. Spark plans it as "
    "a real aggregate (partial batches per group feed one Arrow "
    "reduction); the oracle is the algebraic sum(v*w)/sum(w). Weighted "
    "corpus statistics are the mixture-design input q58 consumes.",
    tags=("udaf", "curation", "llm"),
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import make_group_count_udaf, make_weighted_mean_udaf

    q = quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "source", "n_chars", "quality_score"
    )
    wm = make_weighted_mean_udaf()
    cnt = make_group_count_udaf()
    # JVM count() cannot share an agg() with a grouped-agg pandas UDF
    # (INVALID_PANDAS_UDF_PLACEMENT) — both reductions ride Arrow
    return q.groupBy("source").agg(
        cnt(F.col("doc_id")).alias("n_docs"),
        F.round(
            wm(F.col("quality_score"), F.col("n_chars").cast("double")), 6
        ).alias("weighted_quality"),
    )


# ---------------------------------------------------------------------------
# q80 — PII-style pattern scrubbing (regex redaction accounting)
# ---------------------------------------------------------------------------
@C.add(
    "q80_pii_scrub",
    oracle="""
SELECT event_type,
       count(*)                                             AS n_events,
       sum(len(props) - len(regexp_replace(props, '[0-9]+', '', 'g')))::BIGINT
                                                            AS digits_removed,
       sum(CASE WHEN regexp_matches(props, '[0-9]{2,}')
                THEN 1 ELSE 0 END)::BIGINT                  AS events_with_runs,
       min(regexp_replace(props, '[0-9]+', '#', 'g'))       AS sample_redacted
FROM events
GROUP BY event_type
""",
    doc="PII-style redaction pass: scrub digit runs from the "
    "semi-structured props payload and account for what was removed — "
    "the shape of the email/phone/SSN scrub every crawl-to-training "
    "pipeline runs before tokenization (here over the corpus's only "
    "digit-bearing column; the pattern set is pluggable). All "
    "regexp_replace/rlike in whole-stage codegen — zero Python, zero "
    "extra shuffles beyond the |event_type| rollup; at 100 TB this is "
    "scan-rate bound, the redacted column writes straight back out. The "
    "regex subset ([0-9]+, [0-9]{2,}) parses identically under Java "
    "regex and RE2, so the oracle is exact, including the min() sample "
    "of the redacted text.",
    tags=("curation", "pii", "regex"),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    redacted = F.regexp_replace("props", "[0-9]+", "#")
    stripped = F.regexp_replace("props", "[0-9]+", "")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.length("props") - F.length(stripped)).alias("digits_removed"),
        F.sum(
            F.when(F.col("props").rlike("[0-9]{2,}"), 1).otherwise(0)
        ).alias("events_with_runs"),
        F.min(redacted).alias("sample_redacted"),
    )


# ---------------------------------------------------------------------------
# q104 — deterministic corpus shard shuffle (training-data epoch-0 order)
# ---------------------------------------------------------------------------
@C.add(
    "q104_shard_shuffle",
    oracle="""
WITH s AS (
  SELECT doc_id,
         md5('shuffle:' || doc_id::VARCHAR) AS skey,
         (('0x' || substr(md5('shuffle:' || doc_id::VARCHAR), 1, 15))::UBIGINT
          % 16)::BIGINT AS shard
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)::BIGINT
         AS position
FROM s
""",
    doc="Deterministic corpus shuffle into balanced training shards: each "
    "document's shard and within-shard position are pure functions of its "
    "identity (salted md5 order), so the epoch-0 data order a trainer "
    "reads is REPRODUCIBLE — rerunning the pipeline on the same corpus "
    "yields byte-identical shards, the property loss-curve debugging "
    "needs and random()/rand-based shuffles destroy. One hash Exchange "
    "on shard (which IS the shard writer's partitioning — no second "
    "shuffle to write), then a per-shard sort; at 100 TB n_shards is "
    "sized to corpus/target-shard-size (thousands), keeping every "
    "per-task sort bounded, and the md5 key distributes uniformly so "
    "shards stay balanced without sampling. doc_id tiebreak makes the "
    "order total even under (astronomically unlikely) md5 ties. No "
    "reference counterpart (north-star extension).",
    tags=("curation", "llm", "shuffle"),
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    skey = F.md5(F.concat_ws(":", F.lit("shuffle"), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(skey, 1, 15), 16, 10).cast("bigint") % 16
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", skey.alias("skey"), shard)
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("position"),
        )
    )


# ---------------------------------------------------------------------------
# q105 — deterministic mixture resampling (apply per-source epoch rates)
# ---------------------------------------------------------------------------
@C.add(
    "q105_mixture_resample",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN (substr(source, 4)::INT % 2) = 0 THEN 0 ELSE 1 END
         + CASE WHEN (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::UBIGINT
                      % 1000000)
                     < CASE WHEN (substr(source, 4)::INT % 2) = 0
                            THEN 400000 ELSE 700000 END
                THEN 1 ELSE 0 END AS n_copies
  FROM documents
)
SELECT doc_id, source,
       unnest(range(1, n_copies + 1))::BIGINT AS copy_id
FROM t
WHERE n_copies > 0
""",
    doc="Apply per-source mixture rates to the corpus: source rate r "
    "(here 0.4 for even-numbered sources — downsample — and 1.7 for odd "
    "— ~1.7 training epochs) becomes floor(r) guaranteed copies plus one "
    "more with probability frac(r), decided by a salted identity hash "
    "rather than rand() — so the resampled corpus is REPRODUCIBLE and "
    "append-stable (a document's copy count never changes when the "
    "corpus grows), and realized rates concentrate at r by md5 "
    "uniformity. This is the operator that APPLIES q58's computed "
    "mixture weights; composing them is a join on source. One scan, "
    "zero shuffles: the copy fan-out is a narrow explode(sequence()), "
    "embarrassingly parallel at 100 TB. No reference counterpart "
    "(north-star extension).",
    tags=("curation", "llm", "sampling"),
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = F.substring("source", 4, 10).cast("int")
    base = F.when(idx % 2 == 0, F.lit(0)).otherwise(F.lit(1))
    thr = F.when(idx % 2 == 0, F.lit(400000)).otherwise(F.lit(700000))
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("mix"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    n_copies = (base + (h < thr).cast("int")).alias("n_copies")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("_c"),
        )
        .select("doc_id", "source", F.col("_c").cast("bigint").alias("copy_id"))
    )


# ---------------------------------------------------------------------------
# q106 — per-source content checksum (anti-entropy / migration parity)
# ---------------------------------------------------------------------------
@C.add(
    "q106_content_checksum",
    oracle="""
SELECT source,
       count(*)::BIGINT AS n_rows,
       bit_xor((('0x' || substr(md5(
           doc_id::VARCHAR || ':' || n_chars::VARCHAR || ':' || md5(text)
         ), 1, 14))::UBIGINT)::BIGINT) AS checksum
FROM documents
GROUP BY source
""",
    doc="Order-insensitive per-source content fingerprint: XOR of a "
    "56-bit md5 over each row's canonical form (id : n_chars : md5(text)) "
    "plus the row count — the anti-entropy primitive for verifying two "
    "copies of a 100 TB table agree WITHOUT moving data (each side "
    "computes its own 1-row-per-group summary; compare summaries). XOR "
    "is commutative/associative, so the aggregate is partial-merge "
    "friendly (map-side combine, one tiny shuffle) and insensitive to "
    "row order and partitioning; identical duplicate ROWS would cancel, "
    "but rows here are unique by doc_id inside the hash preimage. The "
    "DuckDB oracle reproduces the checksum bit-exactly — which is "
    "itself the operator's use case, demonstrated cross-engine. "
    "Reference counterpart: none (the reference trusts its appends, "
    "s3_to_postgres.py:80; this is the op that would catch its silent "
    "double-insert on retry).",
    tags=("curation", "quality", "checksum"),
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.concat (NOT concat_ws): concat propagates NULL like the oracle's
    # '||', while concat_ws silently SKIPS null arguments — a NULL
    # n_chars would otherwise hash differently per engine, fatal for an
    # operator whose whole purpose is cross-engine parity (ADVICE r05)
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("n_chars").cast("string"),
                        F.lit(":"),
                        F.md5("text"),
                    )
                ),
                1,
                14,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    return (
        _docs(spark, sf_dir)
        .select("source", h)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# q111 — weighted sampling without replacement (priority sampling, DLT)
# ---------------------------------------------------------------------------
@C.add(
    "q111_priority_sample",
    oracle="""
WITH pr AS (
  SELECT doc_id, n_chars,
         n_chars / ((('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::UBIGINT
                     + 1) / 281474976710656.0) AS priority
  FROM documents
),
topk1 AS (
  SELECT doc_id, n_chars, priority
  FROM pr ORDER BY priority DESC, doc_id LIMIT 201
),
r AS (
  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
  FROM topk1
),
-- tau = the (k+1)-th priority, NULL when the corpus has <= k docs: DLT
-- prescribes the EXACT weight w when n <= k, so est_weight falls back
-- to w via coalesce instead of inflating through max(w, min-priority)
t AS (SELECT max(CASE WHEN rn = 201 THEN priority END) AS tau FROM r)
SELECT doc_id, n_chars, priority,
       greatest(n_chars::DOUBLE, coalesce(tau, n_chars::DOUBLE)) AS est_weight
FROM r
CROSS JOIN t
WHERE rn <= 200
""",
    doc="Weighted sampling WITHOUT replacement via priority sampling "
    "(Duffield-Lund-Thorup, JACM 2007): each doc gets priority w/u with "
    "u a deterministic uniform in (0,1], the k=200 largest priorities "
    "form the sample, and est_weight = max(w, tau) with tau the "
    "(k+1)-th priority is the DLT unbiased per-item weight estimator "
    "(sum over the sample estimates the corpus total — tested "
    "invariant); when the corpus has <= k docs there IS no (k+1)-th "
    "priority and DLT prescribes the exact weight w, so tau is NULL "
    "and est_weight coalesces to w (no inflation at tiny scale). The "
    "one-pass, merge-friendly alternative to sort-by-random() for "
    "weighted corpus subsampling: at 100 TB the sample is ONE "
    "TakeOrderedAndProject (per-partition top-k, merged on the driver "
    "— no global sort, no shuffle of the corpus, and the corpus is "
    "scanned exactly once: rank and tau both derive from the same "
    "k+1-row frame via bounded single-partition windows, not a second "
    "orderBy().limit() lineage). FP-safety of the cross-engine "
    "hash: u = (h48 + 1) / 2^48 with h48 from 12 md5 hex chars — "
    "h+1 <= 2^48 < 2^53 is exact in a double and the power-of-two "
    "division is exact, so priority = w/u is ONE correctly-rounded "
    "IEEE division from identical operands: bit-identical in both "
    "engines, no transcendental (the A-ES u^(1/w) form would hit "
    "cross-engine pow/ln last-ulp noise). Deterministic by "
    "construction — append-stable like q64's splits. Reference "
    "counterpart: none (north-star extension).",
    tags=("curation", "llm", "sampling"),
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 200
    two48 = float(1 << 48)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(two48)
    pr = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    topk1 = pr.orderBy(F.desc("priority"), "doc_id").limit(k + 1)
    # both windows are single-partition by construction but bounded at
    # k+1 rows — the same bounded-window argument as q63's within-bucket
    # rank. Deriving tau from the rn == k+1 row (instead of a second
    # min() aggregate over topk1) keeps the corpus scan + top-k to ONE
    # TakeOrderedAndProject in the executed plan, and makes tau NULL
    # when the corpus has <= k docs — where DLT prescribes the exact
    # weight w, restored by the coalesce below.
    ranked = topk1.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("priority"), "doc_id"))
    ).withColumn(
        "tau",
        F.max(F.when(F.col("rn") == k + 1, F.col("priority"))).over(
            Window.partitionBy()
        ),
    )
    w = F.col("n_chars").cast("double")
    return ranked.filter(F.col("rn") <= k).select(
        "doc_id",
        "n_chars",
        "priority",
        F.greatest(w, F.coalesce(F.col("tau"), w)).alias("est_weight"),
    )


# ---------------------------------------------------------------------------
# q115 — BPE pair statistics (tokenizer-training step 1)
# ---------------------------------------------------------------------------
@C.add(
    "q115_bpe_pair_stats",
    oracle="""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
vocab AS (
  SELECT w, count(*)::BIGINT AS freq FROM words
  WHERE length(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                i -> w[i:i+1])) AS sym_pair, freq
  FROM vocab
)
SELECT sym_pair, sum(freq)::BIGINT AS n_weighted
FROM pairs GROUP BY sym_pair
ORDER BY n_weighted DESC, sym_pair
LIMIT 25
""",
    doc="BPE tokenizer-training statistics, step 1: frequency-weighted "
    "adjacent character-pair counts over the corpus vocabulary — the "
    "argmax of this table IS the first learned merge, and every "
    "subsequent round is the same aggregation over progressively merged "
    "symbol arrays (operators/bpe.py:bpe_learn, the full iterative "
    "trainer, differential-tested against a pure-python Sennrich-style "
    "reference for 8 rounds: identical merge lists and final vocabs). "
    "Scale shape: the ONLY corpus-sized step is the vocab build (one "
    "word-keyed shuffle, q41's top-terms shape); pair counting and merge "
    "application run over the VOCAB — orders of magnitude smaller than "
    "the corpus — as pure JVM higher-order functions (no UDF), with one "
    "O(distinct pairs) map-side-combined shuffle per round and a 1-row "
    "argmax collect (the CC-fixpoint driver idiom). At 100 TB this is "
    "exactly how a production tokenizer's merge table is learned. The "
    "spec's step-1 form stays SQL-expressible (adjacent char pair = "
    "2-char substring), giving the driver an exact oracle; ties order "
    "lexically. Reference counterpart: none (north-star extension).",
    tags=("curation", "llm", "textstats", "bpe"),
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import build_vocab

    vocab = build_vocab(_docs(spark, sf_dir))
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("sym_pair"),
        "freq",
    )
    return (
        pairs.groupBy("sym_pair")
        .agg(F.sum("freq").cast("bigint").alias("n_weighted"))
        .orderBy(F.desc("n_weighted"), "sym_pair")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q119 — BPE encode under a shipped merge table (tokenizer-training step 2)
# ---------------------------------------------------------------------------
#: the shipped tokenizer: the first 6 merges bpe_learn() learns at
#: sf0.01, frozen as literals the way a production tokenizer.json ships;
#: the last merge consumes a merged symbol ("m"+"er"), so the multi-char
#: symbol path is exercised
BPE_MERGE_TABLE = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
)


@C.add(
    "q119_bpe_encode_counts",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
v AS (SELECT DISTINCT w FROM t),
m AS (
  SELECT w,
         replace(replace(replace(replace(replace(replace(
           regexp_replace(w, '(.)', '|\\1', 'g'),
           '|e|r', '|er'), '|i|n', '|in'), '|o|w', '|ow'),
           '|o|r', '|or'), '|s|t', '|st'), '|m|er', '|mer') AS enc
  FROM v
),
c AS (
  SELECT w,
         (length(enc) - length(replace(enc, '|', '')))::BIGINT AS n_syms
  FROM m
)
SELECT t.doc_id,
       sum(c.n_syms)::BIGINT AS n_bpe_tokens,
       count(*)::BIGINT AS n_words
FROM t JOIN c USING (w)
GROUP BY t.doc_id
""",
    doc="BPE ENCODE — tokenizer-training step 2, the apply side of "
    "q115's learn side: per-document token counts under a FIXED "
    "6-merge table (the first merges bpe_learn() produces at sf0.01, "
    "frozen as literals exactly the way a production tokenizer.json "
    "ships — applying a fixed table is well-defined at every sf). The "
    "oracle encodes each vocab word as a marker-delimited string "
    "('star' -> '|s|t|a|r') and applies the merge list as a chain of "
    "plain replace() calls ('|s|t' -> '|st'): a single left-to-right "
    "non-overlapping replace pass is EXACTLY the greedy merge "
    "semantics of operators/bpe.py:apply_merge's left fold (both scan "
    "once, never rescan into a replacement), and the marker makes "
    "symbol boundaries unambiguous even for multi-char symbols, so "
    "the two implementations agree by construction; symbol count = "
    "marker count. Scale shape: merges apply to the DISTINCT VOCAB "
    "(orders of magnitude smaller than the corpus) as 6 JVM aggregate "
    "passes — the corpus-sized work is one explode + the word-keyed "
    "count join (vocab side broadcast-eligible under AQE) + the "
    "doc_id rollup; per-token Python never runs. Reference "
    "counterpart: none (north-star extension; completes the q115 "
    "tokenizer family).",
    tags=("curation", "llm", "textstats", "bpe"),
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import apply_merge, init_symbols

    words = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    syms = init_symbols(words.select("w").distinct())
    for a, b in BPE_MERGE_TABLE:
        syms = apply_merge(syms, a, b)
    counts = syms.select("w", F.size("syms").cast("long").alias("n_syms"))
    return (
        words.join(counts, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )


# ---------------------------------------------------------------------------
# q123 — deterministic contrastive negative sampling
# ---------------------------------------------------------------------------
@C.add(
    "q123_negative_samples",
    oracle="""
WITH n AS (SELECT count(*) AS nd FROM documents),
cand AS (
  SELECT d.doc_id, i AS neg_idx,
         ((('0x' || substr(md5(d.doc_id || ':' || i), 1, 15))::UBIGINT
           % n.nd))::BIGINT AS partner_id
  FROM documents d
  CROSS JOIN n
  CROSS JOIN unnest([1, 2, 3]) AS t(i)
)
SELECT c.doc_id, c.neg_idx, c.partner_id, p.source AS partner_source
FROM cand c
JOIN documents p ON p.doc_id = c.partner_id
WHERE c.partner_id <> c.doc_id
ORDER BY c.doc_id, c.neg_idx
""",
    doc="Contrastive negative sampling: k=3 deterministic pseudo-random "
    "partner documents per document, the negative-pair generation step "
    "of embedding/contrastive training (word2vec negative sampling, "
    "SimCLR-style batch negatives materialized offline). Partner index "
    "= hash60(doc_id:i) mod corpus size — the documents table carries a "
    "DENSE 0..N-1 doc_id, so the modulus lands on a real key and the "
    "pairing is a plain hash JOIN on the computed key, never a random "
    "shuffle or a driver-side sample; self-hits are filtered (keyspace "
    "law, identical in both engines). The corpus count rides along as a "
    "1-row cross join (no collected literal). Scale: one count pass, "
    "one k-way row fan-out (explode of a 3-element literal array), one "
    "join keyed on partner_id — at 100 TB the join shuffles both sides "
    "once on the partner key; skew-free by construction because hash60 "
    "is uniform. Reference counterpart: none (north-star extension).",
    tags=("sampling", "llm", "training-pairs"),
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash60

    d = _docs(spark, sf_dir)
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    cand = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("neg_idx"),
            F.col("nd"),
        )
        .withColumn(
            "partner_id",
            hash60(F.concat_ws(":", F.col("doc_id"), F.col("neg_idx")))
            % F.col("nd"),
        )
        .filter(F.col("partner_id") != F.col("doc_id"))
    )
    partners = d.select(
        F.col("doc_id").alias("partner_id"), F.col("source").alias("partner_source")
    )
    return (
        cand.join(partners, "partner_id")
        .select("doc_id", "neg_idx", "partner_id", "partner_source")
        .orderBy("doc_id", "neg_idx")
    )


# ---------------------------------------------------------------------------
# q124 — masked-LM training-pair generation (T5-style token masking)
# ---------------------------------------------------------------------------
@C.add(
    "q124_masked_lm_pairs",
    oracle=f"""
WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
pos AS (
  SELECT doc_id, i AS pos, t[i] AS tok,
         ((('0x' || substr(md5(doc_id || ':' || i), 1, 15))::UBIGINT % 5) = 0)
           AS masked
  FROM toks CROSS JOIN unnest(generate_series(1, len(t))) AS u(i)
)
SELECT doc_id,
       string_agg(CASE WHEN masked THEN '<X>' ELSE tok END, ' ' ORDER BY pos)
         AS input_text,
       coalesce(
         string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE masked), '')
         AS target_text,
       count(*) FILTER (WHERE masked)::BIGINT AS n_masked
FROM pos
GROUP BY doc_id
ORDER BY doc_id
""".replace("{toks}", "regexp_extract_all(lower(text), '[a-z0-9]+')"),
    doc="Masked-LM training-pair generation (T5-style span corruption, "
    "token granularity): every ~5th token — selected by "
    "hash60(doc_id:pos) mod 5, the deterministic cross-engine mask "
    "law — is replaced by a sentinel in the input and emitted to the "
    "target, producing the (input_text, target_text) pairs a denoising "
    "pretraining pipeline materializes. Spark reassembles order with "
    "array_sort over (pos, token) structs inside the per-doc aggregate "
    "(no window, no global sort); the oracle uses ordered string_agg — "
    "the hash match proves tokenization, mask law, and positional "
    "reassembly agree exactly. Zero-mask docs emit an empty target in "
    "both engines (array_join on empty = coalesce(NULL-agg, '')). "
    "Scale: tokenize + posexplode is one linear scan, the only shuffle "
    "is the groupBy(doc_id) reassembly, and state per doc is its own "
    "token list — the same single-shuffle shape as q59's packing. "
    "Reference counterpart: none (north-star extension).",
    tags=("llm", "training-pairs", "textstats"),
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash60

    d = _docs(spark, sf_dir)
    pos = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "tok",
        (
            hash60(F.concat_ws(":", F.col("doc_id"), (F.col("pos0") + 1))) % 5 == 0
        ).alias("masked"),
    )
    agg = pos.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "pos",
                    F.when(F.col("masked"), F.lit("<X>"))
                    .otherwise(F.col("tok"))
                    .alias("itok"),
                )
            )
        ).alias("in_arr"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("masked"), F.struct("pos", F.col("tok").alias("itok")))
            )
        ).alias("tgt_arr"),
        F.sum(F.col("masked").cast("bigint")).alias("n_masked"),
    )
    return agg.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("in_arr"), lambda x: x["itok"]), " "
        ).alias("input_text"),
        F.array_join(
            F.transform(F.col("tgt_arr"), lambda x: x["itok"]), " "
        ).alias("target_text"),
        "n_masked",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q125 — per-source KL-divergence drift vs the corpus unigram distribution
# ---------------------------------------------------------------------------
@C.add(
    "q125_source_kl_drift",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest({_SQL_TOKS}) AS tok FROM documents
),
sfreq AS (
  SELECT source, tok, count(*)::BIGINT AS cs FROM toks GROUP BY source, tok
),
swin AS (
  SELECT source, tok, cs,
         sum(cs) OVER (PARTITION BY source) AS ts
  FROM sfreq
),
cfreq AS (
  SELECT tok, sum(cs)::BIGINT AS cc FROM sfreq GROUP BY tok
),
cwin AS (SELECT tok, cc, sum(cc) OVER () AS tc FROM cfreq)
SELECT s.source,
       count(*)::BIGINT AS n_terms,
       round(sum((s.cs::DOUBLE / s.ts::DOUBLE)
             * ln((s.cs::DOUBLE / s.ts::DOUBLE)
                  / (c.cc::DOUBLE / c.tc::DOUBLE))), 6) AS kl_drift
FROM swin s
JOIN cwin c USING (tok)
GROUP BY s.source
ORDER BY s.source
""",
    doc="Mixture-drift monitor: KL(P_source || P_corpus) over the unigram "
    "distribution, per source — the statistic a training-mixture "
    "pipeline tracks to catch a crawl source drifting away from (or "
    "collapsing into) the corpus distribution; complements q58's "
    "mixture weights and q105's resampling with the monitoring side. "
    "No smoothing needed: every source term exists in the corpus, so "
    "q > 0 exactly. Plan: one tokenize pass -> (source, tok) counts; "
    "source totals ride along as a window sum (no join), corpus "
    "totals as q95's one unpartitioned window over the |V|-row term "
    "table; the only fact-sized shuffles are the two groupBys. "
    "Per-term doubles are identical cross-engine (exact BIGINT ratios "
    "through ln); only the per-source SUM order differs, hence the "
    "rounding (repo FP rule). At 100 TB the |V|-row window swaps to a "
    "1-row agg broadcast. Reference counterpart: none (north-star "
    "extension).",
    tags=("llm", "mixture", "textstats", "monitoring"),
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import track_persist

    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    # both frequency tables derive from this (source, tok) count; persist
    # it so the corpus is tokenized ONCE, not once per consumer (the
    # vocab-sized table is the right thing to cache, not the token rows)
    sfreq = track_persist(
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    swin = sfreq.withColumn(
        "ts", F.sum("cs").over(Window.partitionBy("source"))
    )
    cfreq = sfreq.groupBy("tok").agg(F.sum("cs").cast("bigint").alias("cc"))
    cwin = cfreq.withColumn("tc", F.sum("cc").over(Window.partitionBy()))
    p = F.col("cs").cast("double") / F.col("ts").cast("double")
    q = F.col("cc").cast("double") / F.col("tc").cast("double")
    return (
        swin.join(cwin, "tok")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_drift"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q132 — quality-filter threshold sweep (precision/recall operating curve)
# ---------------------------------------------------------------------------
@C.add(
    "q132_quality_threshold_sweep",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
f AS (
  SELECT lang,
         round(0.3 * least(len(tk) / 100.0, 1.0)
               + 0.3 * (len(list_distinct(tk))::DOUBLE / len(tk))
               + 0.2 * (len(list_filter(tk,
                   x -> list_contains(['the','a','and','of','is','to'], x)
                 ))::DOUBLE / len(tk))
               + 0.2 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
                        / length(text)), 6) AS score
  FROM t
),
b AS (
  SELECT least(floor(score * 20), 19)::BIGINT AS bucket,
         count(*)::BIGINT AS n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos
  FROM f GROUP BY 1
),
c AS (
  SELECT bucket, n, pos,
         sum(n) OVER (ORDER BY bucket DESC) AS cum_n,
         sum(pos) OVER (ORDER BY bucket DESC) AS cum_pos,
         sum(pos) OVER () AS tot_pos
  FROM b
)
SELECT (bucket / 20.0) AS threshold,
       cum_n::BIGINT AS n_kept,
       cum_pos::BIGINT AS n_pos_kept,
       round(cum_pos::DOUBLE / cum_n, 6) AS precision_at,
       round(cum_pos::DOUBLE / tot_pos, 6) AS recall_at
FROM c
ORDER BY threshold DESC
""",
    doc="Quality-filter OPERATING CURVE: precision and recall of the "
    "q26 quality score against an English-prose proxy label "
    "(lang = 'en') at every score threshold — the eval table a "
    "curation pipeline publishes before picking its filter cutoff "
    "(the eval-harness member of the family: q26 scores docs, q63 "
    "selects by score, THIS spec says what any cutoff costs). "
    "Scale-safe by construction: scores collapse into 20 fixed-width "
    "buckets FIRST (one corpus scan + one tiny groupBy — never a "
    "global sort of documents), then the cumulative precision/recall "
    "fold runs over <= 20 bucket rows (the single-partition window is "
    "O(buckets), not O(corpus)). Bucketing keys off the ROUNDED score "
    "(round 6, the repo canonicalization q26's hash already proves "
    "identical cross-engine), so no ulp can flip a bucket edge. "
    "Counts are exact BIGINTs; precision/recall are one division "
    "each, rounded. Reference counterpart: none (north-star "
    "extension).",
    tags=("llm", "quality", "eval", "monitoring"),
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    f = quality_features(d).select(
        "lang", F.col("quality_score").alias("score")
    )
    b = (
        f.select(
            F.least(F.floor(F.col("score") * 20), F.lit(19))
            .cast("bigint")
            .alias("bucket"),
            "lang",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("lang") == "en").cast("int"))
            .cast("bigint")
            .alias("pos"),
        )
    )
    w_cum = Window.orderBy(F.desc("bucket"))
    w_all = Window.partitionBy()
    c = b.select(
        "bucket",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("pos").over(w_all).alias("tot_pos"),
    )
    return c.select(
        (F.col("bucket") / F.lit(20.0)).alias("threshold"),
        F.col("cum_n").cast("bigint").alias("n_kept"),
        F.col("cum_pos").cast("bigint").alias("n_pos_kept"),
        F.round(
            F.col("cum_pos").cast("double") / F.col("cum_n"), 6
        ).alias("precision_at"),
        F.round(
            F.col("cum_pos").cast("double") / F.col("tot_pos"), 6
        ).alias("recall_at"),
    ).orderBy(F.desc("threshold"))


# ---------------------------------------------------------------------------
# q140 — vocabulary growth curve (Heaps' law) over the ingest order
# ---------------------------------------------------------------------------
@C.add(
    "q140_vocab_growth_curve",
    oracle="""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
n AS (SELECT count(*)::BIGINT AS n_docs FROM d),
t AS (SELECT DISTINCT doc_id, unnest(tk) AS term FROM d),
first_seen AS (SELECT term, min(doc_id) AS first_doc FROM t GROUP BY term),
toks AS (SELECT doc_id, count(*)::BIGINT AS n_tok
         FROM (SELECT doc_id, unnest(tk) AS term FROM d) GROUP BY doc_id),
decile AS (
  SELECT fs.term,
         least(((fs.first_doc * 10) // n.n_docs) + 1, 10) AS bucket
  FROM first_seen fs CROSS JOIN n
),
newv AS (SELECT bucket, count(*)::BIGINT AS new_terms FROM decile GROUP BY bucket),
tokd AS (
  SELECT least(((t2.doc_id * 10) // n.n_docs) + 1, 10) AS bucket,
         sum(t2.n_tok)::BIGINT AS n_tokens
  FROM toks t2 CROSS JOIN n GROUP BY 1
),
grid AS (SELECT unnest(generate_series(1, 10)) AS bucket)
SELECT g.bucket,
       coalesce(nv.new_terms, 0)::BIGINT AS new_terms,
       sum(coalesce(nv.new_terms, 0)) OVER (ORDER BY g.bucket)::BIGINT
         AS cum_vocab,
       coalesce(td.n_tokens, 0)::BIGINT AS n_tokens,
       sum(coalesce(td.n_tokens, 0)) OVER (ORDER BY g.bucket)::BIGINT
         AS cum_tokens
FROM grid g
LEFT JOIN newv nv ON nv.bucket = g.bucket
LEFT JOIN tokd td ON td.bucket = g.bucket
""",
    doc="Vocabulary growth curve (Heaps' law V ~ k*N^beta, the "
    "tokenizer-sizing diagnostic): the corpus is split into ten "
    "ingest-order deciles by doc_id, and each decile reports the count "
    "of terms whose FIRST occurrence falls in it, the cumulative "
    "vocabulary, and the token volume — the curve that says whether a "
    "vocab is saturating (new_terms falling per decile) or the corpus "
    "keeps minting terms (dedup/quality problems upstream show up here "
    "as a refusing-to-flatten tail). Exact, not sampled: first "
    "occurrence = min(doc_id) per term — one (term)-keyed shuffle of "
    "the DISTINCT per-doc term stream; the decile bucketing is EXACT "
    "integer division (Spark `div`, DuckDB `//`) because the float "
    "route diverges: DuckDB's int `/` yields a double whose ::BIGINT "
    "cast rounds where Spark's cast truncates; "
    "the cumulative sums are 10-row windows. At 100 TB the per-term "
    "min is map-side combined and the curve costs one token-stream "
    "shuffle — same order as building the vocab at all. The "
    "unpartitioned cumulative windows run over exactly 10 rows "
    "(whitelisted bounded site). Reference counterpart: none "
    "(north-star extension).",
    tags=("curation", "textstats", "llm"),
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("tk")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = d.select("doc_id", F.explode(F.array_distinct("tk")).alias("term"))
    first_seen = t.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    # exact integer division on BOTH engines: DuckDB's int `/` returns a
    # DOUBLE whose ::BIGINT cast ROUNDS, Spark's double->bigint cast
    # truncates — `div` / `//` sidestep the divergence entirely
    bucket_of = lambda c: F.least(
        F.expr(f"({c} * 10) div n_docs") + 1, F.lit(10)
    )
    newv = (
        first_seen.crossJoin(F.broadcast(n_docs))
        .select(bucket_of("first_doc").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_terms"))
    )
    toks = d.select("doc_id", F.size("tk").cast("bigint").alias("n_tok"))
    tokd = (
        toks.crossJoin(F.broadcast(n_docs))
        .select(bucket_of("doc_id").alias("bucket"), "n_tok")
        .groupBy("bucket")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    grid = spark.range(1, 11).select(F.col("id").alias("bucket"))
    w = Window.orderBy("bucket")
    return (
        grid.join(newv, "bucket", "left")
        .join(tokd, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_terms", F.lit(0)).cast("bigint").alias("new_terms"),
            F.sum(F.coalesce("new_terms", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_vocab"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("n_tokens", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q149 — exact distributed ROC-AUC of a quality signal vs a label
# (operators/ordered.py:exact_auc)
# ---------------------------------------------------------------------------
@C.add(
    "q149_quality_auc",
    oracle="""
WITH h AS (
  SELECT n_chars AS s,
         count(*)::BIGINT AS t,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p
  FROM documents
  GROUP BY n_chars
),
c AS (
  SELECT t, p,
         COALESCE(sum(t) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cb
  FROM h
),
u AS (
  SELECT CAST(sum(p) AS BIGINT) AS npos,
         CAST(sum(t - p) AS BIGINT) AS nneg,
         sum(2 * p * cb + p * (t + 1)) AS u2
  FROM c
)
SELECT npos, nneg,
       CASE WHEN npos > 0 AND nneg > 0 THEN
         round((CAST(u2 AS DOUBLE) - CAST(npos AS DOUBLE) * (npos + 1))
               / (2.0 * npos * nneg), 6)
       END AS auc
FROM u
""",
    doc="Exact ROC-AUC of a document quality signal (n_chars) against a "
    "downstream label (lang = 'en') — THE eval scalar for every "
    "quality-classifier gate in a curation pipeline, computed exactly "
    "at corpus scale by operators/ordered.py:exact_auc: Mann-Whitney "
    "rank-sum with average-rank tie handling (bit-identical to "
    "sklearn.metrics.roc_auc_score; tests/test_ordered.py pins the "
    "numpy differential). The distributed shape is the point: collapse "
    "to the distinct-score histogram (one map-side-partial shuffle, "
    "|distinct scores| rows), exclusive-prefix the tie counts in score "
    "order via range_prefix (q148's literal-boundary exscan — no "
    "single-partition window even when the histogram is large), then "
    "one integral fold: U2 = sum(2*p*cum_before + p*(t+1)) with "
    "AUC = (U2 - npos*(npos+1)) / (2*npos*nneg), every term exact in "
    "DECIMAL(38,0) until the final double division, so both engines "
    "divide the SAME integers and the rounded double hash-matches. The "
    "complement to q132's threshold-sweep operating curve: q132 walks "
    "20 cut points, this is the threshold-free area under the whole "
    "curve. 100 TB: two bounded shuffles (histogram, bucket totals) "
    "plus a 1-row fold; quantize truly continuous scores first if "
    "|distinct| ~ |rows|. Reference counterpart: none (north-star "
    "extension).",
    tags=("curation", "eval", "auc", "ordered"),
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import exact_auc

    d = _docs(spark, sf_dir).withColumn("is_en", F.col("lang") == "en")
    a = exact_auc(d, "n_chars", "is_en")
    return a.select("npos", "nneg", F.round("auc", 6).alias("auc"))
