"""Salted join: exact semantics of the plain join (inner and left,
matched and unmatched keys), and planted heavy-hitter keys actually
spread across salt buckets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators.skew import (
    salt_column,
    salted_join,
)
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_inner_join_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    cols = ["event_id", "user_id", "c_nationkey"]
    got = _norm(salted_join(ev, cust, on="user_id").select(*cols), cols)
    want = _norm(ev.join(cust, "user_id").select(*cols), cols)
    assert got == want and want


def test_salted_left_join_preserves_unmatched(spark):
    probe = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    build = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("dim").alias("d")
    )
    cols = ["k", "v", "d"]
    got = _norm(salted_join(probe, build, on="k", how="left"), cols)
    want = _norm(probe.join(build, "k", "left"), cols)
    assert got == want
    assert sum(1 for r in got if r[2] is None) == 50


def test_planted_hot_key_spreads_over_buckets(spark):
    """One key owning 50k rows must land in every salt bucket with no
    bucket holding more than 2x the even share — the property that
    breaks the one-reducer funnel at scale."""
    buckets = 16
    hot = spark.range(0, 50_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    per_bucket = (
        hot.withColumn("s", salt_column(hot, buckets))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(per_bucket) == buckets
    even = 50_000 / buckets
    assert max(r["count"] for r in per_bucket) < 2 * even
