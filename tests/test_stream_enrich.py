"""Stream-static enrichment: the streaming face computes the same
rollup as the oracle-checked batch face, and the dimension side is
broadcast (stream side unshuffled for the join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.plans.suite_eventtime import (
    enrich_segment_activity,
)
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.enrich import (
    enrich_events,
    segment_activity,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _norm(df):
    return {
        (r.mktsegment, r.event_type): (r.n_events, round(r.sum_value, 6), r.n_users)
        for r in df.collect()
    }


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Streamed rollup == batch rollup exactly on the additive columns;
    the distinct-user column (HLL in streaming — exact distinct is
    unsupported on streams) must land within its 5% envelope."""
    ev = load_table(spark, SF_SMOKE, "events")
    cust = load_table(spark, SF_SMOKE, "customer")
    src = str(tmp_path / "events")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out = segment_activity(enrich_events(stream, cust), exact_distinct=False)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_seg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _norm(
        spark.table("enrich_seg").withColumn("sum_value", F.round("sum_value", 6))
    )
    want = _norm(segment_activity(enrich_events(ev, cust)))
    assert want and got.keys() == want.keys()
    for k, (n_events, sum_value, n_users) in want.items():
        g = got[k]
        assert g[0] == n_events and g[1] == sum_value, (k, g)
        assert abs(g[2] - n_users) <= max(1, 0.05 * n_users), (k, g)


def test_batch_face_plan_broadcasts_dimension(spark):
    plan = enrich_segment_activity(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
