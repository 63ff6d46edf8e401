"""Scale-safe global total-order operators: prefix sums, global ranks, AUC.

The one plan shape this repo's lint bans outright is the unpartitioned
window over a fact table (tests/test_plan_lint.py) — ``SUM() OVER (ORDER BY
...)`` with no PARTITION BY funnels every row through a single WindowExec
task, the canonical 100 TB killer. But the *semantics* (an exact global
running total, an exact global rank, a classifier AUC over billions of
scored rows) are real training-pipeline needs: cumulative token budgets in
corpus order, exact global quality ranks for top-p% selection, ROC-AUC of a
quality classifier against a downstream label.

This module provides those semantics with the classic two-phase
partitioned-prefix algorithm (the MPI ``exscan`` / Blelloch scan shape, on
Spark):

1. Bucket rows into ``n`` contiguous key ranges. The bucket id is a PURE
   FUNCTION of the row — a comparison against driver-sampled boundary keys
   baked into the plan as literals — NOT ``spark_partition_id()`` after a
   ``repartitionByRange``. That distinction is load-bearing: Spark's
   RangePartitioner seeds its reservoir sample with the RDD id, so two
   physical instantiations of the same logical exchange can place rows
   differently (ReuseExchange is an optimization, not a guarantee — we
   measured the divergence: duplicate global ranks when the totals branch
   and the scan branch each re-sampled). With literal boundaries, every
   re-evaluation agrees.
2. Per-bucket totals via one map-side-partial ``groupBy`` (n rows out),
   exclusive-scanned by a window over that <= n-row frame (bounded,
   data-independent — the whitelisted window shape) and broadcast back.
3. One hash shuffle on the bucket id + ``sortWithinPartitions(bucket,
   *order)``, then a vectorized per-bucket running scan via
   ``mapInPandas`` with a carry across Arrow batches that resets on bucket
   change (hash collisions may co-locate two buckets in one task — the
   reset keeps them independent). A JVM window ``PARTITION BY bucket``
   would be bit-identical but adds nothing: it shuffles the same bytes and
   sorts the same rows; the Arrow pass keeps the scan O(rows) vectorized.

Values are required to be integral (LongType) so every arithmetic step is
exact and associative — money goes through cents, never floating point;
a float cumsum would make the result depend on bucket boundaries.

Reference counterpart: none (north-star extension — the reference's pandas
stage is single-node, where ``Series.cumsum`` is trivially global).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField

_BKT = "_rp_bucket"
_LRANK = "_rp_local_rank"
_LCUM = "_rp_local_cum"

#: target driver-side sample rows per output bucket when picking boundaries
_SAMPLE_PER_BUCKET = 64


def _bucket_expr(df: DataFrame, order_cols: list[str], n: int) -> Column:
    """Bucket id 0..<=n-1 as a pure row function: count of sampled boundary
    key tuples <= the row's key tuple.

    Boundaries come from a seeded, driver-sorted sample (bounded:
    ``n * _SAMPLE_PER_BUCKET`` rows collected); they are baked in as an
    array-of-structs literal, so the expression is deterministic across
    any number of plan re-evaluations. Balance is approximate (sampling
    error only skews sizes, never correctness). Cost: one column-pruned
    count + one column-pruned sample scan before the main job, then
    O(n) codegen'd struct comparisons per row (the aggregate HOF is
    linear — fine to a few thousand buckets; past that, route rows
    through a two-level bucket-of-buckets before reaching for this).
    """
    cnt = df.count()
    target = n * _SAMPLE_PER_BUCKET
    boundaries: list[tuple] = []
    if cnt > 0 and n > 1:
        frac = min(1.0, float(target) / float(cnt))
        smp = (
            df.select(*order_cols)
            .sample(withReplacement=False, fraction=frac, seed=9)
            .collect()
        )
        keys = sorted(tuple(r) for r in smp)
        if keys:
            step = len(keys) / float(n)
            idxs = {int(step * i) for i in range(1, n)}
            boundaries = sorted({keys[i] for i in idxs if 0 < i < len(keys)})
    row_key = F.struct(*[F.col(c) for c in order_cols])
    if not boundaries:
        return F.lit(0)
    dtypes = [df.schema[c].dataType for c in order_cols]
    blit = F.array(
        *[
            F.struct(
                *[
                    F.lit(v).cast(dt).alias(c)
                    for v, c, dt in zip(b, order_cols, dtypes)
                ]
            )
            for b in boundaries
        ]
    )
    return F.aggregate(
        blit,
        F.lit(0),
        lambda acc, b: acc + F.when(b <= row_key, F.lit(1)).otherwise(F.lit(0)),
    ).cast("int")


def range_prefix(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str | None = None,
    *,
    num_partitions: int | None = None,
    rank_col: str = "global_rank",
    cumsum_col: str = "global_cumsum",
) -> DataFrame:
    """Exact global rank (row_number) and running sum over a total order.

    Equivalent to::

        row_number() OVER (ORDER BY *order_cols)                AS rank_col
        sum(value_col) OVER (ORDER BY *order_cols
                             ROWS UNBOUNDED PRECEDING)          AS cumsum_col

    but with NO single-partition window: literal-boundary bucketing, a
    bounded (<= num_partitions rows) offsets frame broadcast back, one
    hash shuffle, and a vectorized per-bucket scan (module doc has the
    full algorithm). ``order_cols`` must be a total order (no ties) —
    ties would make the window semantics ambiguous; append a unique key
    column to break them. ``order_cols`` must be non-null (boundary
    comparison and DuckDB/Spark null-ordering differ).

    ``value_col`` must be LongType and non-null (exact, associative — see
    module doc); pass ``None`` to compute ranks only. Output adds
    ``rank_col`` (and ``cumsum_col`` when ``value_col`` is given) to the
    input columns.

    100 TB notes: the hash shuffle on the bucket id is the irreducible
    cost of a global order; boundary sampling adds a column-pruned count
    + sample pass (metadata-cheap on parquet scans). The offsets frame is
    O(num_partitions) through one window task and a broadcast. A hot
    order-key value cannot straddle buckets (ties share a bucket), so
    dedup the key or accept one hot bucket — same trade as any range
    partitioning.
    """
    order_cols = list(order_cols)
    if not order_cols:
        raise ValueError("range_prefix: order_cols must be non-empty")
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    if value_col is not None:
        vf = df.schema[value_col]
        if not isinstance(vf.dataType, LongType):
            raise TypeError(
                f"range_prefix: value_col {value_col!r} must be LongType "
                f"for exact associative sums, got {vf.dataType.simpleString()}"
                " — convert money to cents / counts to longs first"
            )

    base = df.withColumn(_BKT, _bucket_expr(df, order_cols, n))

    # -- per-bucket totals -> exclusive prefix offsets (bounded frame) ----
    agg = [F.count(F.lit(1)).alias("_rp_cnt")]
    if value_col is not None:
        agg.append(F.sum(value_col).alias("_rp_tot"))
    totals = base.groupBy(_BKT).agg(*agg)
    # <= num_partitions rows: the bounded, data-independent frame the
    # unpartitioned-window whitelist exists for (tests/test_plan_lint.py).
    w_excl = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _BKT,
        F.coalesce(F.sum("_rp_cnt").over(w_excl), F.lit(0)).alias("_rp_cnt_off"),
        *(
            [F.coalesce(F.sum("_rp_tot").over(w_excl), F.lit(0)).alias("_rp_tot_off")]
            if value_col is not None
            else []
        ),
    )

    # -- one shuffle + vectorized per-bucket scan --------------------------
    scanned_schema = (
        base.schema
        .add(StructField(_LRANK, LongType(), False))
        .add(StructField(_LCUM, LongType(), False))
    )
    vcol = value_col  # bind for the closure

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry across Arrow batches within one task; a task may hold
        # several buckets (hash collisions) — rows arrive sorted by
        # (bucket, *order), so reset the carry on bucket change.
        last_bkt: int | None = None
        rank_carry = 0
        cum_carry = 0
        for pdf in batches:
            if len(pdf) == 0:
                empty = pd.Series([], dtype="int64")
                yield pdf.assign(**{_LRANK: empty, _LCUM: empty})
                continue
            bkt = pdf[_BKT].to_numpy()
            ranks = pd.Series(range(len(pdf)), dtype="int64")
            # restart the intra-batch counter at each bucket change
            starts = pd.Series(bkt).ne(pd.Series(bkt).shift()).cumsum()
            local_rank = ranks.groupby(starts.values).cumcount() + 1
            if vcol is not None:
                local_cum = (
                    pdf[vcol].astype("int64").groupby(starts.values).cumsum()
                )
            else:
                local_cum = pd.Series(0, index=pdf.index, dtype="int64")
            first_bkt = int(bkt[0])
            if last_bkt is not None and first_bkt == last_bkt:
                head = starts.values == starts.values[0]
                local_rank = local_rank + pd.Series(head, dtype="int64") * rank_carry
                if vcol is not None:
                    local_cum = local_cum + pd.Series(head, dtype="int64") * cum_carry
            last_bkt = int(bkt[-1])
            rank_carry = int(local_rank.iloc[-1])
            cum_carry = int(local_cum.iloc[-1]) if vcol is not None else 0
            pdf[_LRANK] = local_rank.to_numpy()
            pdf[_LCUM] = local_cum.to_numpy()
            yield pdf

    local = (
        base.repartition(n, _BKT)
        .sortWithinPartitions(_BKT, *order_cols)
        .mapInPandas(_scan, schema=scanned_schema)
    )

    out = local.join(F.broadcast(offsets), _BKT)
    out = out.withColumn(rank_col, (F.col(_LRANK) + F.col("_rp_cnt_off")).cast("long"))
    if value_col is not None:
        out = out.withColumn(
            cumsum_col, (F.col(_LCUM) + F.col("_rp_tot_off")).cast("long")
        )
    drop = [_BKT, _LRANK, _LCUM, "_rp_cnt_off"]
    if value_col is not None:
        drop.append("_rp_tot_off")
    return out.drop(*drop)


def global_order_statistics(
    df: DataFrame,
    order_cols: Sequence[str],
    pcts: Sequence[int],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global order statistics (value at rank ceil(pct*N/100)) by
    rank selection with BUCKET PRUNING — no full sort anywhere.

    The discrete quantile at integer percentage ``pct`` is the row whose
    global rank under ``ORDER BY *order_cols`` is
    ``max(1, (pct*N + 99) // 100)`` — pure integer arithmetic, so both
    engines select the identical row (no float ``ceil`` boundary to
    diverge on). Plan, all JVM-side:

    1. Literal-boundary bucket id (same pure row function as
       :func:`range_prefix`), per-bucket counts exclusive-scanned over the
       <= n-row totals frame.
    2. Locate target buckets: broadcast-join the offsets and keep only
       rows whose bucket straddles a target rank — at most ``len(pcts)``
       buckets (~len(pcts) * N/n rows) survive.
    3. ``row_number`` over a window PARTITIONED by bucket (lint-clean:
       every partition is one pruned bucket) + the bucket's count offset
       = the global rank; filter to the target ranks.

    Returns one row per pct: ``(pct, global_rank, *order_cols)``.
    ``order_cols`` must be a total order (append a unique key) and
    non-null. 100 TB: the fact table is scanned twice (totals, probe) but
    only the target buckets are ever shuffled or sorted — the classic
    distributed selection algorithm, and the exact-quantile complement to
    the mergeable t-digest (q38's documented scale path).
    """
    order_cols = list(order_cols)
    pcts = sorted(set(int(p) for p in pcts))
    if not pcts or pcts[0] < 0 or pcts[-1] > 100:
        raise ValueError("pcts must be integers in [0, 100]")
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cnt = df.count()
    if cnt == 0:
        sel = [F.lit(0).alias("pct"), F.lit(0).cast("long").alias("global_rank")]
        sel += [F.col(c) for c in order_cols]
        return df.select(*sel).limit(0)
    targets = {p: max(1, (p * cnt + 99) // 100) for p in pcts}
    rank_lits = F.array(*[F.lit(int(r)).cast("long") for r in set(targets.values())])

    base = df.withColumn(_BKT, _bucket_expr(df, order_cols, n))
    totals = base.groupBy(_BKT).agg(F.count(F.lit(1)).alias("_rp_cnt"))
    w_excl = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _BKT,
        F.col("_rp_cnt"),
        F.coalesce(F.sum("_rp_cnt").over(w_excl), F.lit(0)).alias("_rp_cnt_off"),
    )

    pruned = (
        base.join(F.broadcast(offsets), _BKT)
        # keep only buckets that straddle a target rank
        .filter(
            F.exists(
                rank_lits,
                lambda r: (r > F.col("_rp_cnt_off"))
                & (r <= F.col("_rp_cnt_off") + F.col("_rp_cnt")),
            )
        )
    )
    w_in = Window.partitionBy(_BKT).orderBy(*order_cols)
    ranked = pruned.withColumn(
        "global_rank",
        (F.row_number().over(w_in) + F.col("_rp_cnt_off")).cast("long"),
    ).filter(F.array_contains(rank_lits, F.col("global_rank")))

    pct_map = spark.createDataFrame(
        [(p, int(r)) for p, r in targets.items()], "pct int, global_rank long"
    )
    return ranked.join(F.broadcast(pct_map), "global_rank").select(
        "pct", "global_rank", *order_cols
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` predicting boolean ``label_col``.

    Mann-Whitney form with average-rank tie handling — identical to
    ``sklearn.metrics.roc_auc_score`` — computed distributively:

    1. Collapse to the distinct-score histogram ``(score, t=count,
       p=positive count)`` — one hash shuffle with map-side partials; the
       frame is |distinct scores| rows, the sublinear pivot that makes a
       global rank affordable (quantize truly continuous scores first if
       |distinct| ~ |rows|).
    2. Exclusive prefix of ``t`` in score order via :func:`range_prefix`
       (inclusive cumsum minus own count) — no single-partition window
       even when the histogram is large.
    3. Average rank of a score bucket = cum_before + (t+1)/2. Doubling to
       stay integral:  U2 = sum(2*p*cum_before + p*(t+1))  and
       AUC = (U2 - npos*(npos+1)) / (2*npos*nneg), every term exact in
       DECIMAL(38,0) until the final double division.

    Returns a 1-row DataFrame ``(npos, nneg, auc)``; ``auc`` is NULL when
    either class is empty. NULL labels count as negatives; scores must be
    non-null. Overflow headroom: U2 < N^2 fits DECIMAL(38,0) to N ~ 1e19
    rows.
    """
    hist = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_t"),
        F.coalesce(F.sum(F.col(label_col).cast("long")), F.lit(0)).alias("_p"),
    )
    scanned = range_prefix(
        hist,
        ["_s"],
        "_t",
        num_partitions=num_partitions,
        rank_col="_r",
        cumsum_col="_cum",
    )
    d38 = "decimal(38,0)"
    cb = (F.col("_cum") - F.col("_t")).cast(d38)
    t = F.col("_t").cast(d38)
    p = F.col("_p").cast(d38)
    terms = scanned.select(
        (2 * p * cb + p * (t + 1)).alias("_u2"),
        F.col("_p").alias("_np"),
        (F.col("_t") - F.col("_p")).alias("_nn"),
    )
    agg = terms.agg(
        F.sum("_u2").alias("_u2"),
        F.sum("_np").alias("npos"),
        F.sum("_nn").alias("nneg"),
    )
    npos_d = F.col("npos").cast("double")
    nneg_d = F.col("nneg").cast("double")
    auc = F.when(
        (F.col("npos") > 0) & (F.col("nneg") > 0),
        (F.col("_u2").cast("double") - npos_d * (npos_d + 1))
        / (2.0 * npos_d * nneg_d),
    )
    return agg.select(
        F.col("npos").cast("long").alias("npos"),
        F.col("nneg").cast("long").alias("nneg"),
        auc.alias("auc"),
    )
