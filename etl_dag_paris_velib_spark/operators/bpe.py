"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The north-star's text tier asks for "token counting (whitespace + a
BPE-ish regex)" — this module goes one step further and implements the
TRAINING side: learn the merge table itself from corpus statistics, the
way a tokenizer for a 100 TB corpus is actually built (the pair-count
pass over the weighted vocabulary is the only corpus-scale step; merges
apply to the VOCAB, which is orders of magnitude smaller than the
corpus).

Dataflow per merge round (the classic Sennrich-style algorithm, each
piece mapped to a Spark-scale primitive):

1. **Vocab build** (once): tokenize → explode → word frequency count.
   One shuffle on the word; at 100 TB this is the q41 top-terms shape.
2. **Pair counts**: adjacent symbol pairs per word, weighted by word
   frequency — a JVM higher-order-function fan-out over the syms array
   (no UDF), then one aggregation keyed by the pair. Map-side combine
   keeps the shuffle at O(distinct pairs).
3. **Best pair**: max count, ties broken lexically — a 1-row
   TakeOrderedAndProject collect (bounded driver state, the
   operators/dedup.py CC-fixpoint idiom).
4. **Merge application**: rewrite every word's symbol array, replacing
   adjacent (a, b) with the merged symbol left-to-right — expressed as
   a pure JVM ``aggregate`` lambda over the array (symbols are
   ``[a-z0-9]+`` substrings, so embedding them in the expression text
   is injection-safe). The new vocab persists for the next round; the
   previous round unpersists.

Exactness: differential-tested against a pure-python reference
implementation (tests/test_llm_operators.py) — identical merge lists
and identical final symbol arrays. Reference counterpart: none
(north-star extension; the reference has no text analytics at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import tokens


def build_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → weighted vocabulary: (word, freq), words of length >= 2
    (single-char words carry no pairs). One shuffle on the word key."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def init_symbols(vocab: DataFrame) -> DataFrame:
    """Split every word into its character symbols: (w, freq, syms)."""
    return vocab.withColumn("syms", F.split(F.col("w"), ""))


#: adjacent-pair fan-out over the syms array — pure JVM HOF; the size
#: guard matters because Spark's sequence(1, 0) generates a DESCENDING
#: [1, 0] rather than an empty array
_PAIRS_EXPR = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)) END"
)


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts: (a, b, n)."""
    return (
        vocab_syms.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("bigint").alias("n"))
    )


def apply_merge(vocab_syms: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) in every word's symbol array with
    the merged symbol, left-to-right non-overlapping — a single JVM
    ``aggregate`` pass per word. Symbols are [a-z0-9]+ substrings
    (functions/text.py:TOKEN_RE), so the literal embedding is safe; the
    assert is the guard against future symbol-alphabet changes."""
    assert all(c.isalnum() for c in a + b), "symbols must stay [a-z0-9]+"
    merged = a + b
    expr = (
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' AND x = '{b}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{merged}')), "
        "concat(acc, array(x))))"
    )
    return vocab_syms.withColumn("syms", F.expr(expr))


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list [(a, b, weighted_count), ...] in learned order and the final
    symbolized vocab (persisted — caller unpersists). Stops early when
    no pair remains. Driver state per round is ONE row (the argmax
    pair); ties break on (count desc, a, b) so the result is
    deterministic and matches the python reference bit-for-bit."""
    vocab = init_symbols(build_vocab(docs, text_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        new_vocab = apply_merge(vocab, a, b).persist(StorageLevel.MEMORY_AND_DISK)
        new_vocab.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = new_vocab
    return merges, vocab
