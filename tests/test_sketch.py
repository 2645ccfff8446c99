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


def test_bloom_membership_never_false_negative(spark, tmp_path):
    """Planted member/non-member split: the Bloom audit must report 0
    false negatives and exact member counts per segment, at any fp."""
    import os

    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (i, i % 7, "O", 1.0, d0, "1-URGENT" if i % 2 == 0 else "3-MEDIUM")
            for i in range(40)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(k, f"Customer#{k}", 0, 0.0, "SEG" + str(k % 2)) for k in range(20)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    d = str(tmp_path / "bloomsf")
    orders.write.parquet(os.path.join(d, "orders.parquet"))
    cust.write.parquet(os.path.join(d, "customer.parquet"))

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_sketch import bloom_membership_audit

    rows = bloom_membership_audit(spark, d).collect()
    assert rows, "audit must produce per-segment rows"
    # urgent orders hit custkeys {0,2,4,6} (i%7 of even i covers 0..6);
    # every even i -> custkey in {0,2,4,6,1,3,5}: compute exactly
    members = {i % 7 for i in range(40) if i % 2 == 0}
    total_members = sum(1 for k in range(20) if k in members)
    assert sum(r["n_members"] for r in rows) == total_members
    assert all(r["false_negatives"] == 0 for r in rows)
    # maybe-count is always >= exact member count (one-sided error)
    assert sum(r["n_maybe"] for r in rows) >= total_members
