"""Sinks: single-file CSV (reference O1 parity) and console (O2).

The reference forces single-file CSV output with
``writeAsCsv(...).setParallelism(1)`` (VehicleTelematics.java:179-181,
CongestionArea.java:64, SaturatedVendor.java:95) in Flink's tuple encoding:
comma-delimited, no header, no quoting.  ``write_single_csv`` reproduces
that: coalesce(1) -> write -> promote the part file to the requested path.

Scale note: coalesce(1) is correct here because every query's OUTPUT is
small (fines/aggregates), matching the reference's own choice; bulk data
paths write partitioned parquet instead (``write_parquet``).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_single_csv(df: DataFrame, path: str) -> None:
    """Write ``df`` as ONE headerless CSV file at ``path`` (not a dir)."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_csv_")
    try:
        df.coalesce(1).write.mode("overwrite").option("header", "false").csv(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.csv"))
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Partitioned parquet for bulk outputs (the at-scale default)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed parquet table (hash-bucketed by ``bucket_cols``).

    The co-located-join layout for 100 TB fact/fact joins: two tables
    bucketed by the same key with the same bucket count join with ZERO
    exchange — the shuffle is paid once at write time instead of on every
    query (pinned in tests/test_scale_layout.py).  ``sort_cols`` presorts
    within buckets so sort-merge joins skip the per-task sort too.
    Bucketing requires the table catalog (``saveAsTable``); point ``table``
    at a database created with an explicit LOCATION to control the path.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def show(df: DataFrame, n: int = 20) -> None:
    """Console sink (reference ``print()``, O2)."""
    df.show(n, truncate=False)


def write_jsonl(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """JSON-lines sink (one object per line, newline-delimited).

    The interchange format for text-corpus pipelines; partitioned like the
    parquet sink so downstream consumers can prune.  Nulls are omitted per
    JSON-lines convention (Spark's writer default).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, key: str = "doc_id"
) -> None:
    """Deterministic content-addressed shard layout for training output:
    every row lands in shard ``h56(key) % n_shards``, written as
    ``shard=K/`` parquet partitions with exactly one file per shard.

    Why not ``df.repartition(n).write``: round-robin repartition assigns
    rows by PHYSICAL layout, so the same corpus re-written after any
    upstream change lands in different shards — downstream dataloader
    checkpoints, shard-level dedup ledgers, and resume-from-shard-K all
    break.  Hashing the stable key makes shard membership a pure function
    of the data (same contract as ``sample_stratified`` vs
    ``DataFrame.sample``), repeatable across writes, layouts, and
    cluster sizes; hash uniformity keeps shards balanced without a sort.

    Scale: one exchange on the shard id (the write was going to shuffle
    for layout anyway), no global sort, no driver collection.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — the sink would silently "
            "clobber it; rename or drop it first"
        )
    from pyspark.sql import functions as F

    from cloudcomputing_flink_application_spark.functions import text as X

    # A NULL key would hash to a NULL shard and land in a silent
    # __HIVE_DEFAULT_PARTITION__ no shard ledger expects; fail loudly
    # inside the write (no extra validation job).
    shard = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(f"write_training_shards: NULL {key} — shard assignment "
                  "requires a non-null key")
        ).cast("int"),
    ).otherwise((X.h56(F.col(key).cast("string")) % n_shards).cast("int"))
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
