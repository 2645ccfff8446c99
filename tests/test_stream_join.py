"""Stream-stream interval join: the watermarked streaming face emits
exactly the batch pair set (single-batch and multi-batch replays), and
the last-touch reduction agrees with the pair relation's argmax.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.plans.suite_eventtime import (
    attr_interval_join_pairs,
    attr_last_touch,
)
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.join import (
    interval_join_pairs,
    split_click_purchase,
    stream_interval_join,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _batch_pairs(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    clicks, purchases = split_click_purchase(ev)
    return interval_join_pairs(clicks, purchases)


def _run_stream(spark, tmp_path, n_files: int, watermark_delay: str):
    """Replay the smoke events through the watermarked join, split
    into n_files chronological micro-batch files per side."""
    ev = load_table(spark, SF_SMOKE, "events")
    clicks, purchases = split_click_purchase(ev)
    srcs = {}
    for name, df, ts_col in (
        ("clicks", clicks, "click_ts"),
        ("purchases", purchases, "purchase_ts"),
    ):
        path = str(tmp_path / name)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        rows = df.count()
        per = max(1, rows // n_files + 1)
        # chronological files (increasing mtime) so event time advances
        # monotonically across micro-batches
        ranked = df.withColumn(
            "part",
            ((F.row_number().over(Window.orderBy(ts_col)) - 1) / per).cast("int"),
        )
        for i in range(n_files):
            chunk = ranked.filter(F.col("part") == i).drop("part")
            chunk.coalesce(1).write.mode("append").parquet(path)
        srcs[name] = (path, df.schema)

    c_stream = (
        spark.readStream.schema(srcs["clicks"][1])
        .option("maxFilesPerTrigger", 1)
        .parquet(srcs["clicks"][0])
    )
    p_stream = (
        spark.readStream.schema(srcs["purchases"][1])
        .option("maxFilesPerTrigger", 1)
        .parquet(srcs["purchases"][0])
    )
    out = stream_interval_join(c_stream, p_stream, watermark_delay=watermark_delay)
    qname = f"sj_{n_files}_{abs(hash(watermark_delay)) % 997}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def _pair_keys(df):
    return {
        (r.purchase_event_id, r.click_event_id)
        for r in df.select("purchase_event_id", "click_event_id").collect()
    }


def test_stream_join_single_batch_equals_batch(spark, tmp_path):
    """One file per side = one micro-batch: the watermark never
    advances mid-join, so the streamed pair set is exactly the batch
    join."""
    got = _pair_keys(_run_stream(spark, tmp_path, 1, "1 hour"))
    want = _pair_keys(_batch_pairs(spark))
    assert want, "batch join is empty — test data broken"
    assert got == want


def test_stream_join_multi_batch_equals_batch(spark, tmp_path):
    """Chronological multi-batch replay with a watermark delay wider
    than the replay's out-of-orderness: no pair is lost across
    micro-batch boundaries (clicks from earlier batches join purchases
    from later ones out of retained state)."""
    got = _pair_keys(_run_stream(spark, tmp_path, 4, "30 days"))
    want = _pair_keys(_batch_pairs(spark))
    assert got == want


def test_last_touch_is_argmax_of_pairs(spark):
    """attr_last_touch == per-purchase argmax over the pair relation,
    including NULL rows for unattributable purchases."""
    pairs = attr_interval_join_pairs(spark, SF_SMOKE)
    purchases = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_event_id"))
    )
    best = pairs.groupBy("purchase_event_id").agg(
        F.max(F.struct("click_ts", "click_event_id")).alias("b")
    )
    want = {
        r.purchase_event_id: (r.b.click_event_id if r.b is not None else None)
        for r in purchases.join(best, "purchase_event_id", "left").collect()
    }
    got = {
        r.purchase_event_id: r.click_event_id
        for r in attr_last_touch(spark, SF_SMOKE).collect()
    }
    assert got == want
