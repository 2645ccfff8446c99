"""Stateful symmetric join (applyInPandasWithState) — stream-batch
equivalence: the accumulated weighted delta stream must equal the
batch join of the changelog's net states.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
from query_processing_over_streaming_data_using_flink_spark.streaming.retraction import changelog_state
from query_processing_over_streaming_data_using_flink_spark.streaming.stateful import (
    stateful_join_customer_orders,
)
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


def _expected_join_state(spark, log):
    cust = (
        changelog_state(log, "customer", ["custkey"])
        .filter(F.col("mktsegment") == "BUILDING")
        .select("custkey", F.col("w").alias("w_c"))
    )
    orders = (
        changelog_state(log, "orders", ["orderkey"])
        .filter(F.col("orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .select(F.col("o_custkey"), "orderkey", "orderdate", F.col("w").alias("w_o"))
    )
    return (
        cust.join(orders, F.col("custkey") == F.col("o_custkey"))
        .select(
            "custkey", "orderkey", "orderdate", (F.col("w_c") * F.col("w_o")).alias("w")
        )
        .filter(F.col("w") != 0)
    )


def test_stateful_join_stream_batch_equivalence(spark, tmp_path):
    n_total = sum(
        load_table(spark, SF_SMOKE, t).count() for t in ("customer", "orders", "lineitem")
    )
    w = (n_total * 2) // 3
    k = n_total + n_total // 2
    log = build_changelog(spark, SF_SMOKE, window=w).filter(F.col("seq") <= k)

    changelog_dir = str(tmp_path / "events")
    log.repartition(6).write.parquet(changelog_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(changelog_dir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(changelog_dir)
    )
    joined = stateful_join_customer_orders(stream)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("sym_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT custkey, orderkey, orderdate, w FROM sym_join")
        .groupBy("custkey", "orderkey", "orderdate")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )
    want = _expected_join_state(spark, log)
    g = sorted([tuple(r) for r in got.collect()], key=repr)
    e = sorted([tuple(r) for r in want.collect()], key=repr)
    assert len(g) > 0
    assert g == e


def test_stateful_join_single_batch_stream(spark, tmp_path):
    """The same operator fed the whole changelog as one micro-batch
    (applyInPandasWithState is streaming-only; one file → one batch)."""
    log = build_changelog(spark, SF_SMOKE)
    changelog_dir = str(tmp_path / "events_one")
    log.coalesce(1).write.parquet(changelog_dir)
    stream = spark.readStream.schema(spark.read.parquet(changelog_dir).schema).parquet(
        changelog_dir
    )
    q = (
        stateful_join_customer_orders(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sym_join_one")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT custkey, orderkey, orderdate, w FROM sym_join_one")
        .groupBy("custkey", "orderkey", "orderdate")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )
    want = _expected_join_state(spark, log)
    assert sorted([tuple(r) for r in got.collect()], key=repr) == sorted(
        [tuple(r) for r in want.collect()], key=repr
    )


# NOTE (round 2): a transformWithState variant of the reference's
# IncrementalAggregateFunction existed here behind a protobuf skipif.
# The container has no protobuf and no network, so the path could never
# execute; per the round-1 review it was deleted rather than shipped
# untested. applyInPandasWithState (above) is the exercised keyed-state
# path, and streaming/retraction.py carries the same += / -= semantics.
