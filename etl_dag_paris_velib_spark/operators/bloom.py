"""Bloom-filter join pruning — cut fact-table rows BEFORE the join shuffle.

The third sketch in the family (HLL = built-in approx_count_distinct,
count-min = operators/sketch.py): a bitmap built from the (filtered) dim
side's join keys, broadcast to the fact side, where a k-probe membership
test drops most non-matching rows map-side. The exact join still runs —
Bloom false positives are eliminated there — so results are EXACTLY the
plain join's; the sketch only moves work off the shuffle. This is the
hand-built, fully-controllable form of Spark's own runtime bloom-filter
join (`spark.sql.optimizer.runtime.bloomFilter.enabled`), kept explicit
so the bitmap size/probe count are tunable per pipeline and the plan is
inspectable.

Scale: the bitmap is ``n_bits/64`` longs regardless of dim cardinality
(the build shuffles at most that many partially-aggregated words); the
fact side adds a broadcast of one array row and a few md5 evaluations
per row — repaid whenever the dim filter is selective, because every
pruned row skips the join Exchange entirely.

Hashing uses native xxhash64 (one codegen intrinsic per probe): the
join-result oracle is the plain join by design — bloom false positives
never reach the result — so the hash needs determinism, not cross-engine
portability, and the md5-prefix idiom's hex-string + conv() cost per
fact row is pure overhead here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key_str: Column, n_bits: int, k: int) -> Column:
    """array of k bit positions for a key — pmod(xxhash64(i, key), n_bits).

    xxhash64 is the native 64-bit hash (one codegen intrinsic per probe);
    the earlier md5-prefix form paid a hex string + conv() per probe per
    row — measurable at fact-table row counts, and portability buys
    nothing here because the spec's oracle is the PLAIN join (bloom false
    positives never reach the result)."""
    return F.array(
        *[F.pmod(F.xxhash64(F.lit(i), key_str), F.lit(n_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Build the bitmap: a ONE-ROW DataFrame with ``words: array<long>``
    of length n_bits/64, bit p set iff some key hashed to p.

    Set bits are aggregated per 64-bit word with ``bit_or`` (map-side
    partial, so the shuffle carries at most n_bits/64 rows), then packed
    into a dense ordered array via a sorted struct collect over that
    word-count-sized set.
    """
    n_words = (n_bits + 63) // 64
    pos = (
        df.select(_positions(F.col(key_col).cast("string"), n_bits, k).alias("ps"))
        .select(F.explode("ps").alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )
    spark = df.sparkSession
    dense = (
        spark.range(n_words)
        .select(F.col("id").alias("w"))
        .join(pos, "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("long")).alias("word"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))), lambda s: s["word"]
        ).alias("words")
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key PASSES the bloom membership test
    (all k probed bits set). Guaranteed superset of the true matches —
    compose with the exact join for exact results."""
    probes = _positions(F.col(key_col).cast("string"), n_bits, k)
    hit = F.forall(
        probes,
        lambda p: (
            F.element_at(F.col("words"), ((p / 64).cast("long") + 1).cast("int"))
            .bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
            )
            != 0
        ),
    )
    return fact.crossJoin(F.broadcast(bloom)).filter(hit).drop("words")


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Exact left-semi join with bloom pre-pruning: prune the fact side
    map-side, then run the exact semi join on the survivors. Result is
    identical to ``fact.join(dim_keys, fact.key == dim.key, "left_semi")``
    — tested property — with the shuffle fed only bloom survivors."""
    bloom = bloom_build(dim_keys, dim_key, n_bits, k)
    pruned = bloom_prune(fact, fact_key, bloom, n_bits, k)
    return pruned.join(
        dim_keys.select(F.col(dim_key).alias("__dk")).distinct(),
        F.col(fact_key) == F.col("__dk"),
        "left_semi",
    )
