"""Sketch suite: approximation envelopes hold at another scale factor
than the oracle gate's, and HLL union is lossless at test cardinality
(sparse-mode sketches — merged rollup == direct sketch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.plans.suite_sketch import (
    approx_distinct_users,
    approx_quantiles_event_value,
    hll_union_daily_users,
)
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_envelope_flags_hold_at_smoke_scale(spark):
    for fn, flags in (
        (approx_distinct_users, ["approx_within_5pct"]),
        (hll_union_daily_users, ["merged_within_5pct"]),
        (approx_quantiles_event_value, ["p50_ok", "p95_ok"]),
    ):
        rows = fn(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            for flag in flags:
                assert r[flag] is True, (fn.__name__, flag, r)


def test_hll_daily_rollup_equals_direct_sketch(spark):
    """Union of per-day sketches must estimate identically to one
    direct sketch over all events: HLL register-max union is
    commutative and, at this cardinality (sparse mode), lossless."""
    ev = load_table(spark, SF_SMOKE, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    merged = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    assert direct == merged
