"""Data-layout operators: partitioned corpus writes and small-file
compaction.

No reference counterpart (the reference reads/writes single local CSVs)
— but at 100 TB the file layout *is* the query plan: partition pruning
only works if the data is partitioned by the pruning column, scans only
run at disk bandwidth if files are near the parquet row-group sweet
spot, and a day of streaming micro-batches leaves thousands of tiny
files that turn listing into the bottleneck. These helpers make the
layout decisions explicit and testable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 << 20  # parquet row-group sweet spot


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (parquet statistics /
    sampled relation sizes) — no extra scan."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Write `df` hive-partitioned by `partition_cols` with a bounded
    number of similar-sized files per partition value.

    A naive `df.write.partitionBy(c)` emits one file per (task ×
    partition value) — tiny-file explosion at any real task count.
    Here rows are first shuffled to ceil(estimated_size/target) tasks
    on (partition_cols, random salt), so each partition value lands on
    ~proportional task count and every task writes one file per value
    it holds. `sort_cols` sorts within files (min/max zone-map pruning
    for range predicates on those columns). Returns the task count.
    """
    # Catalyst's estimate for join-derived plans is a cardinality
    # product that can blow past any real size (even past int64). When
    # it's clearly bogus (> 1 PB), fall back to a counted estimate at
    # ~512 B/row — one cheap aggregate beats 65k empty write tasks.
    est = _estimated_bytes(df)
    if est > 1 << 50:
        est = df.count() * 512
    n_files = int(max(1, min(math.ceil(est / target_file_bytes), 1 << 16)))
    salted = df.repartition(
        n_files, *[F.col(c) for c in partition_cols], (F.rand(seed=42) * n_files).cast("int")
    )
    if sort_cols:
        salted = salted.sortWithinPartitions(*partition_cols, *sort_cols)
    salted.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return n_files


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a parquet directory into ceil(size/target) files — the
    standard maintenance pass after streaming micro-batches (each
    trigger writes its own small files; thousands of them make file
    listing and task scheduling the bottleneck, not I/O). Coalesce (no
    shuffle) merges read-side; returns the output file count. On a
    real lakehouse table this is OPTIMIZE/rewrite_data_files; the
    mechanism is the same."""
    import os
    import shutil

    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(_estimated_bytes(df) / target_file_bytes))
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    # Swap-on-write (local FS semantics; a lakehouse table format makes
    # this transactional instead).
    shutil.rmtree(path)
    os.replace(tmp, path)
    return n_files
