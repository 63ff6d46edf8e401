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
