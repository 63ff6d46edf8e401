"""Sinks (reference operators K1-K5, SURVEY.md §2.2).

The reference's serving layer is row-at-a-time inserts into Postgres
(s3_to_postgres.py:80-82 — ``insert_rows(rows=df.values.tolist())``), its
scalability ceiling. The native serving layer here is partitioned Parquet
written in parallel by every executor; JDBC append exists only for parity
with external Postgres consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_table(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("ingest_date", "ingest_hour"),
    mode: str = "overwrite",
) -> None:
    """Gold-layer append with exactly-once per run.

    With ``partitionOverwriteMode=dynamic`` (set in session.py) and
    ``mode="overwrite"``, a re-run replaces only the partitions it produces —
    the idempotency the reference approximates with ``replace=True`` on CSV
    uploads only (etl_dag.py:111) and entirely lacks on the DB insert.
    Replaces K4+K5: the table is created by the first write; no DDL step.
    """
    # per-write option rather than session conf: any externally-built
    # vanilla session gets dynamic (not table-wiping static) overwrite too
    df.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        *partition_cols
    ).mode(mode).parquet(path)


def export_csv(df: DataFrame, path: str) -> None:
    """CSV export (reference K3). Timestamps render as the reference's
    ``yyyy-MM-dd HH:mm:ss`` at this boundary only — types stay native
    inside the engine."""
    df.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).mode("overwrite").csv(path)


def export_json(df: DataFrame, path: str) -> None:
    """Raw/bronze JSON persistence (reference K1)."""
    df.write.mode("overwrite").json(path)


def export_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC export — no reference counterpart (the reference's
    only columnar-adjacent boundary is transient pandas, SURVEY §1.2);
    included so the silver layer interoperates with ORC-native warehouses
    (Hive/Trino) without a parquet conversion hop. Types round-trip
    natively, unlike the CSV boundary."""
    df.write.mode("overwrite").orc(path)


def upsert_partitioned_table(
    df: DataFrame,
    path: str,
    keys: tuple[str, ...],
    partition_cols: tuple[str, ...] = ("ingest_date", "ingest_hour"),
) -> None:
    """Delta-style MERGE (upsert) onto a partitioned parquet table: rows
    in ``df`` replace existing rows with the same ``keys``; everything
    else survives. Partition-pruned: only partitions PRESENT in the batch
    are read back and rewritten (broadcast semi-join on the partition
    values + dynamic partition overwrite) — an upsert touching one hour
    of a year-long table moves one hour of data, which is what makes the
    pattern viable at 100 TB. Untouched partitions are never read.

    The batch must carry its partition columns, and keys must not move
    rows across partitions (true for ingest-time layouts).

    ``localCheckpoint`` materializes the merged result before the write —
    Spark cannot atomically overwrite a path it is still lazily reading
    (the self-overwrite trap). On a real deployment the ACID version of
    this operator is Delta/Iceberg ``MERGE INTO``; the dataflow (prune →
    anti-join → union → dynamic overwrite) is identical.
    """
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path)
        has_table = True
    except Exception:
        has_table = False
    if has_table:
        from pyspark.sql.functions import broadcast

        touched = df.select(*partition_cols).distinct()
        in_touched = existing.join(broadcast(touched), list(partition_cols), "left_semi")
        survivors = in_touched.join(
            df.select(*keys).distinct(), list(keys), "left_anti"
        )
        out = survivors.unionByName(df).localCheckpoint()
    else:
        out = df
    out.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        *partition_cols
    ).mode("overwrite").parquet(path)


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 10_000,
    num_partitions: int = 8,
    properties: dict | None = None,
) -> None:
    """Postgres-parity sink: partition-parallel batched INSERTs — the
    distributed replacement for the reference's single-threaded
    ``insert_rows`` loop (s3_to_postgres.py:76-82). Round-trip-tested
    against embedded Derby (tests/test_ingestion.py) — the same Spark
    JDBC write path an external Postgres takes, modulo URL/driver."""
    writer = (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def compact_partitions(
    spark,
    path: str,
    partition_cols: tuple[str, ...] = ("ingest_date", "ingest_hour"),
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction for a partitioned parquet table — the
    maintenance op every long-running ingest layout needs (an hourly
    writer like the reference's produces 24 × 365 tiny files/year/branch;
    at 100 TB, scan-task count and object-store LIST/GET amplification
    from small files dominate read cost long before data volume does).

    Plan-then-rewrite, touching ONLY partitions that need it:

    1. list leaf files per partition directory via the Hadoop FS API
       (works identically on file:// and s3a://),
    2. a partition needs compaction iff ``n_files > ceil(bytes/target)``,
    3. each such partition is rewritten with exactly that many output
       files (``repartition(n_out)`` scoped to the partition's rows) into
       a HIDDEN staging dir under the table root (dot-prefixed — Spark's
       file index ignores it, so concurrent readers never see partials),
    4. staged partition dirs replace the originals by a rename-aside swap
       (live → trash, staged → live, delete trash) — a crash mid-swap
       never leaves a partition absent with no recoverable copy, and
       Spark is never overwriting a path it is lazily reading.

    Layout validation (data-loss guard): every data file must sit at
    EXACTLY ``len(partition_cols)`` directory levels below the table
    root, each level named ``<col>=...`` in declared order. A file at
    the wrong depth (e.g. dumped at the table root) would otherwise
    yield an empty partition key whose "directory" IS the table root —
    the swap would then delete the whole table. Such files raise.

    Object-store caveat: on s3a:// each "rename" is a non-atomic
    copy+delete, so a reader listing mid-swap can observe a partition
    briefly absent (the trash copy still exists for recovery). The
    listing/plan/rewrite phases work identically; only the swap's
    atomicity is filesystem-grade. The ACID version of this operator is
    a table format's OPTIMIZE (Delta/Iceberg); the dataflow is
    identical.

    Returns ``{partition_rel_path: (bytes, files_before, files_after)}``
    for the rewritten partitions. Reference counterpart: none (the
    reference appends one-file-per-hour CSVs and never compacts,
    etl_dag.py:248-255).
    """
    import math
    import uuid

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    qroot = fs.makeQualified(root).toString()

    sizes: dict[str, tuple[int, int]] = {}
    it = fs.listFiles(root, True)
    while it.hasNext():
        f = it.next()
        fp = f.getPath().toString()
        rel = fp[len(qroot) + 1 :]
        parts = rel.split("/")
        if any(seg.startswith((".", "_")) for seg in parts):
            continue  # hidden/staging/_SUCCESS
        dirs = parts[:-1]
        if len(dirs) != len(partition_cols) or any(
            not seg.startswith(f"{col}=")
            for col, seg in zip(partition_cols, dirs)
        ):
            raise ValueError(
                f"compact_partitions: data file {rel!r} does not sit at "
                f"the declared partition depth {partition_cols!r} — "
                "refusing to plan a swap over a malformed layout"
            )
        d = "/".join(dirs)
        b, n = sizes.get(d, (0, 0))
        sizes[d] = (b + f.getLen(), n + 1)

    plan = {
        d: (b, n, max(1, math.ceil(b / target_file_bytes)))
        for d, (b, n) in sizes.items()
        if n > max(1, math.ceil(b / target_file_bytes))
    }
    if not plan:
        return {}

    token = uuid.uuid4().hex[:12]
    staging = f"{path}/.compact-{token}"
    trash = f"{path}/.compact-trash-{token}"
    report: dict[str, tuple[int, int, int]] = {}
    for d, (b, n_before, n_out) in plan.items():
        part_df = spark.read.parquet(f"{path}/{d}")
        part_df.repartition(n_out).write.mode("overwrite").parquet(
            f"{staging}/{d}"
        )
        report[d] = (b, n_before, n_out)
    for d in plan:
        assert d, "empty partition key must be impossible post-validation"
        live = jvm.org.apache.hadoop.fs.Path(f"{path}/{d}")
        staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{d}")
        aside = jvm.org.apache.hadoop.fs.Path(f"{trash}/{d}")
        fs.mkdirs(aside.getParent())
        if not fs.rename(live, aside):
            raise IOError(f"compaction rename-aside failed for partition {d}")
        if not fs.rename(staged, live):
            # restore the original so the partition is never left absent
            fs.rename(aside, live)
            raise IOError(f"compaction swap failed for partition {d}")
        # drop the per-partition _SUCCESS marker the staged write left
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{d}/_SUCCESS"), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(trash), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return report
