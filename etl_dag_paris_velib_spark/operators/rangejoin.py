"""Range (interval) self-join — temporal pair matching without an equi-key.

The reference's accumulated time-series tables (SURVEY.md §2.5 names the
as-of variant; `etl_dag.py:240` carries the event time) invite queries
like "pairs of events within N seconds of each other" — a join whose only
predicate is a range. Spark's planner turns a bare range predicate into
``BroadcastNestedLoopJoin`` (all-pairs: O(n²) compares, one side fully
broadcast), which is exactly what must not happen at 100 TB.

The scale-safe construction is **bucketization**: quantize the timestamp
into buckets the width of the maximum gap. A pair within ``max_gap`` can
only span adjacent buckets, so emitting each left row into its own bucket
and the next one, and equi-joining on the bucket id, covers every
candidate exactly once (the right row's bucket is single-valued, and the
left row's two emitted buckets are distinct — no dedup pass needed). The
range predicate then runs as a post-join filter on a shuffle-partitioned
equi-join: sort-merge/shuffled-hash, AQE-splittable, no broadcast of the
fact table, 2× row inflation on one side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import ntz_epoch_us


def range_self_join_pairs(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: int = 30,
) -> DataFrame:
    """Ordered pairs (earlier, later) of rows whose timestamps are within
    ``max_gap_seconds``: returns (id_a, id_b, gap_us) with
    ``0 <= ts_b - ts_a <= max_gap`` and ties on equal timestamps broken by
    id so each unordered pair appears exactly once.

    Bucket width = ``max_gap`` ⟹ the later row's bucket is either the
    earlier row's bucket or the next one; the left side explodes into
    those two buckets and the join is a plain equi-join on the bucket id.
    """
    gap_us = int(max_gap_seconds) * 1_000_000
    us = ntz_epoch_us(ts_col)
    bk = F.floor(us / F.lit(gap_us))
    left = df.select(
        F.col(id_col).alias("id_a"),
        us.alias("us_a"),
        F.explode(F.array(bk, bk + 1)).alias("bk"),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        us.alias("us_b"),
        bk.alias("bk"),
    )
    return (
        left.join(right, "bk")
        .filter(
            (F.col("us_b") >= F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= F.lit(gap_us))
            & (
                (F.col("us_a") < F.col("us_b"))
                | (F.col("id_a") < F.col("id_b"))
            )
        )
        .select(
            "id_a",
            "id_b",
            (F.col("us_b") - F.col("us_a")).alias("gap_us"),
        )
    )
