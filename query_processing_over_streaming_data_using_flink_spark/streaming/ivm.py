"""Incremental view maintenance (IVM) of TPC-H Q3 over a changelog
stream — the Spark-native equivalent of the reference's stateful
streaming pipeline (`TPCHQuery3_StreamProcessor.java:183-265`).

The reference maintains per-key operator state (ValueState/MapState in
two CoProcessFunctions + a keyed aggregate) and pushes Insert/Delete
actions through it event-by-event. Here each micro-batch of events is
applied with the multilinear delta rule

    Δ(C ⋈ O ⋈ L) = ΔC⋈O⋈L  +  C'⋈ΔO⋈L  +  C'⋈O'⋈ΔL      (X' = X+ΔX)

so the per-batch work is three *distributed* joins sized by the delta,
not a recompute — and, unlike the reference's approach, it needs no
ordering guarantee: the signed-weight algebra is commutative, so any
batching/ordering of events converges to the same state.

State lives in per-epoch parquet snapshots (swap-on-write). On a real
cluster the same pipeline runs with Delta/Iceberg MERGE for the state
tables and `foreachBatch` exactly-once semantics; state size is bounded
by the live window, and every join key is hash-partitioned by Spark —
no single-task bottleneck like the reference's keyBy(0) TopN.

Throughput shape (measured, local[32], sf0.1 = 1.53M events): the state
merge re-aggregates old∪delta each epoch, so per-epoch cost is
O(state), amortized by batch size — 74K events/s at 4 emissions, 420K/s
evaluated in one pass (bench.py), vs the reference's 215K/s. With a
MERGE-capable state table (Delta) the merge becomes O(delta) and epoch
cadence decouples from state size; parquet snapshots were also measured
faster locally than localCheckpoint-based in-memory state (columnar
compression beats block-manager row storage here).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import ts_lit
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import PAYLOAD_COLS


class IncrementalQ3:
    """foreachBatch handler maintaining Q3 state incrementally."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        segment: str = "BUILDING",
        cutoff: str = "1995-03-15",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.segment = segment
        self.cutoff = cutoff
        self.epoch = -1
        os.makedirs(state_dir, exist_ok=True)

    # -- state I/O -----------------------------------------------------------

    def _path(self, name: str, epoch: int) -> str:
        return os.path.join(self.state_dir, f"{name}_{epoch}")

    def _read(self, name: str, schema: str) -> DataFrame:
        if self.epoch < 0:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._path(name, self.epoch))

    # -- delta extraction ----------------------------------------------------

    def _split(self, batch: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Project + filter each relation's delta, aggregated to
        (key → net weight) — filters are weight-preserving (SURVEY §7)."""
        cut = ts_lit(self.cutoff)
        dc = (
            batch.filter((F.col("relation") == "customer") & (F.col("mktsegment") == self.segment))
            .groupBy(F.col("custkey").alias("c_custkey"))
            .agg(F.sum("op").alias("w_c"))
        )
        do = (
            batch.filter((F.col("relation") == "orders") & (F.col("orderdate") < cut))
            .groupBy(
                F.col("orderkey").alias("o_orderkey"),
                F.col("o_custkey"),
                F.col("orderdate").alias("o_orderdate"),
            )
            .agg(F.sum("op").alias("w_o"))
        )
        dl = (
            batch.filter((F.col("relation") == "lineitem") & (F.col("shipdate") > cut))
            .select(
                F.col("orderkey").alias("l_orderkey"),
                F.col("linenumber"),
                (
                    F.col("op")
                    * F.round(
                        F.col("extendedprice") * (F.lit(1.0) - F.col("discount")) * 10000, 0
                    ).cast("long")
                ).alias("w_cents"),
            )
            .groupBy("l_orderkey", "linenumber")
            .agg(F.sum("w_cents").alias("w_cents"))
        )
        return dc, do, dl

    # -- the foreachBatch hook -------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = self.spark
        dc, do, dl = self._split(batch)

        c_old = self._read("c", "c_custkey long, w_c long")
        o_old = self._read("o", "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz, w_o long")
        l_old = self._read("l", "l_orderkey long, linenumber int, w_cents long")
        r_old = self._read("r", "l_orderkey long, o_orderdate timestamp_ntz, cents long")

        c_new = (
            c_old.unionByName(dc).groupBy("c_custkey").agg(F.sum("w_c").alias("w_c"))
        ).cache()
        o_new = (
            o_old.unionByName(do)
            .groupBy("o_orderkey", "o_custkey", "o_orderdate")
            .agg(F.sum("w_o").alias("w_o"))
        ).cache()
        l_new = (
            l_old.unionByName(dl)
            .groupBy("l_orderkey", "linenumber")
            .agg(F.sum("w_cents").alias("w_cents"))
        ).cache()

        def contribution(c: DataFrame, o: DataFrame, li: DataFrame) -> DataFrame:
            return (
                c.join(o, F.col("c_custkey") == F.col("o_custkey"))
                .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("l_orderkey", "o_orderdate")
                .agg(F.sum(F.col("w_c") * F.col("w_o") * F.col("w_cents")).alias("cents"))
            )

        delta_r = (
            contribution(dc, o_old, l_old)
            .unionByName(contribution(c_new, do, l_old))
            .unionByName(contribution(c_new, o_new, dl))
        )
        r_new = (
            r_old.unionByName(delta_r)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum("cents").alias("cents"))
            .filter(F.col("cents") != 0)
        )

        nxt = self.epoch + 1
        for name, df in (("c", c_new), ("o", o_new), ("l", l_new), ("r", r_new)):
            df.write.mode("overwrite").parquet(self._path(name, nxt))
        for df in (c_new, o_new, l_new):
            df.unpersist()
        prev = self.epoch
        self.epoch = nxt
        if prev >= 0:
            for name in ("c", "o", "l", "r"):
                shutil.rmtree(self._path(name, prev), ignore_errors=True)

    # -- result --------------------------------------------------------------

    def top_n(self, n: int = 20) -> DataFrame:
        """Current Top-N — the reference's periodic TopNFunction output
        (`TPCHQuery3_StreamProcessor.java:983-1062`), computed correctly
        (latest aggregate per group, no stale entries — SURVEY §2.5)."""
        r = self._read("r", "l_orderkey long, o_orderdate timestamp_ntz, cents long")
        return (
            r.filter(F.col("cents") > 0)
            .select(
                "l_orderkey",
                (F.col("cents") / F.lit(10000.0)).alias("revenue"),
                "o_orderdate",
                F.lit(0).alias("o_shippriority"),
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
            .limit(n)
        )


def run_streaming_q3(
    spark: SparkSession,
    changelog_dir: str,
    state_dir: str,
    files_per_trigger: int = 4,
    top_n: int = 20,
    on_progress=None,
) -> DataFrame:
    """Consume a parquet-directory changelog as a Structured Streaming
    source (micro-batches of whole files, like the reference's
    file-driven UnifiedStreamSource,
    `TPCHQuery3_StreamProcessor.java:268-344`) and maintain Q3.

    `on_progress(epoch_id, top_df)` mirrors the periodic Top-N emission
    (console/WebSocket sink in the reference); pass e.g.
    ``lambda e, df: df.show()``.
    """
    static = spark.read.parquet(changelog_dir)
    pipe = IncrementalQ3(spark, state_dir)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        pipe.process_batch(batch, epoch_id)
        if on_progress is not None:
            on_progress(epoch_id, pipe.top_n(top_n))

    query = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(changelog_dir)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return pipe.top_n(top_n)
