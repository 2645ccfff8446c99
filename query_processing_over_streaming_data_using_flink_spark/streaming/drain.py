"""The one file-source drain harness every streaming face shares.

Each face (IVM Q3, incremental rollups, LM trainers, gates/routers,
ANN indexes, the export manifest) consumes micro-batches through
`foreachBatch`; only the per-batch handler differs. In production the
source swaps to Kafka (`readStream.format("kafka")` + the wire parser)
— that swap happens HERE, once, not in seven copies.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def drain_file_source(
    spark: SparkSession,
    src_dir: str,
    handle: Callable[[DataFrame, int], None],
    files_per_trigger: int = 2,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain a parquet directory as micro-batches through `handle` with
    availableNow semantics (process everything present, then stop);
    blocks until drained. Schema is probed from a static read of the
    same directory. With `checkpoint_dir`, a re-run resumes the stream
    instead of replaying from scratch."""
    static = spark.read.parquet(src_dir)
    writer = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
