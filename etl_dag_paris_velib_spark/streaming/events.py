"""Stream-stream interval join over the events stream (SURVEY §2.8).

The batch as-of join (operators/asof.py, q15) answers "which click
preceded this purchase" over accumulated history; this is the streaming
formulation: two watermarked streams joined on user with a time-range
condition. Spark bounds the join state by the watermark + interval — each
side buffers only rows that could still match, which is what makes the
join runnable forever on an unbounded feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to every click by the same user within the
    preceding ``lookback`` interval.

    State bound: clicks are kept for watermark + lookback of event time;
    purchases for the watermark. The join key (user_id) co-partitions both
    sides — one shuffle each, then state-store lookups.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """STREAM-STATIC join: the unbounded event stream enriched against the
    static customer dimension (user_id maps onto c_custkey).

    The static side is broadcast, so enrichment is stateless and
    map-side: no watermark, no state store, every micro-batch joins
    against the (re-read) dim snapshot. This is the canonical streaming
    lookup-table shape — contrast purchase_click_attribution, whose
    stream-stream state must be watermark-bounded.
    """
    dim = F.broadcast(
        customers.select(
            (F.col("c_custkey") - 1).alias("user_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "customer_name", "mktsegment"
    )


def streaming_distinct_users(events: DataFrame, k: int = 16) -> DataFrame:
    """Streaming KMV distinct-count: per event type, maintain the k
    smallest md5-hashes of user_id as arbitrary state
    (``applyInPandasWithState``) and emit the refreshed estimate each
    micro-batch.

    This is the mergeable-sketch story (operators/sketch.py:
    kmv_merge_distinct) applied to an unbounded stream: each batch is a
    sub-sketch, and the merge law top-k(state ∪ batch) == top-k(all rows
    so far) makes the state BOUNDED (k longs per group, forever) while
    the last emission is BIT-IDENTICAL to the batch
    ``kmv_distinct(everything seen)`` — which is exactly what the
    differential test asserts. Contrast ``dropDuplicates`` distinct
    counting, whose state grows with true cardinality and needs a
    watermark to stay bounded; the sketch needs neither.

    The md5 construction matches the batch operator (Spark's
    ``conv(substring(md5(cast(u AS STRING)), 1, 14), 16, 10)`` ==
    ``int(hashlib.md5(str(u).encode()).hexdigest()[:14], 16)``), so the
    stream, the batch operator, and the DuckDB oracle (q97) all agree on
    the estimates, not just approximately.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    numerator = (k - 1) * (1 << 56)
    assert numerator < (1 << 63), "estimator numerator must fit BIGINT"

    def update(key, pdf_iter, state):
        if state.exists:
            kept, n_batches = list(state.get[0]), int(state.get[1])
        else:
            kept, n_batches = [], 0
        seen = set(kept)
        for pdf in pdf_iter:
            for u in pdf["user_id"]:
                h = int(hashlib.md5(str(int(u)).encode()).hexdigest()[:14], 16)
                seen.add(h)
        kept = sorted(seen)[:k]
        n_batches += 1
        state.update((kept, n_batches))
        est = len(kept) if len(kept) < k else numerator // kept[-1]
        yield pd.DataFrame(
            [(key[0], n_batches, est)],
            columns=["event_type", "n_batches", "est_distinct"],
        )

    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "event_type string, n_batches int, est_distinct long"
            ),
            stateStructType="hashes array<long>, n_batches int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
