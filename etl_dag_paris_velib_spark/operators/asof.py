"""As-of (point-in-time) join — an operator Spark lacks natively.

Composition strategy (SURVEY §2.5): union both sides with a type tag and use
one window pass with ``last(..., ignorenulls=True)`` to carry the most recent
right-side row forward onto each left-side row. Compared to the naive
range-join (left × right with ``r.ts <= l.ts`` then argmax), this is a single
shuffle on the join key and O(n log n) per key instead of O(n·m) — the shape
that survives 100 TB: state per key is one carried row, and skewed keys are
handled by AQE since it's a plain window, not a join.

Tie semantics: right rows at exactly ``l.ts`` match (>=, like DuckDB's
ASOF JOIN); among equal timestamps the row with the greatest ``right_id``
wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: tuple[str, ...],
    right_id: str,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row sharing the ``on``
    key: the most recent with ``right.ts <= left.ts`` (``backward``, the
    default) or the next with ``right.ts >= left.ts`` (``forward``) —
    pandas ``merge_asof`` semantics, including exact-ts matches.

    ``right_cols`` are the right-side columns to carry; ``right_id`` is a
    unique right-side column used as the deterministic tie-break (among
    equal timestamps the greatest ``right_id`` wins). ``tolerance_sec``
    nulls the carried columns when the matched row is further than the
    tolerance — matches outside the horizon are no match, exactly like
    ``merge_asof(tolerance=...)``.

    The forward direction is the same single window pass with the
    traversal order reversed; tolerance is a post-predicate on the carried
    struct, so neither option changes the one-shuffle cost model.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carry = list(dict.fromkeys([*right_cols, ts, right_id]))
    lhs = left.withColumn("_tag", F.lit(1))
    # Carry ALL right columns as ONE struct so the matched row is atomic —
    # carrying columns independently with last(ignorenulls) would mix values
    # from different right rows whenever the newest row holds a NULL.
    rhs = right.select(
        on,
        ts,
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("_r"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (_tag 0 < 1) so ties
    # match; for forward the timestamp traversal reverses and "last right
    # seen" becomes the nearest upcoming one
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_tag").asc(), F.col(f"_r.{right_id}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last(F.col("_r"), ignorenulls=True).over(w))
    if tolerance_sec is not None:
        within = (
            F.abs(
                F.col(ts).cast("double") - F.col(f"_m.{ts}").cast("double")
            )
            <= F.lit(float(tolerance_sec))
        )
        matched = matched.withColumn(
            "_m", F.when(within, F.col("_m")).otherwise(F.lit(None))
        )
    return matched.filter(F.col("_tag") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in carry],
    )
