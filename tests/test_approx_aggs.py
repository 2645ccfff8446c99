"""Approximate aggregates (engine surface beyond the reference —
SURVEY §2.4 notes the reference has none). Sketches are
engine-specific, so these are tolerance tests against exact answers,
not oracle hash-matches.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_ORACLE
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


def test_approx_count_distinct(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_quantiles_multi(spark):
    e = load_table(spark, SF_ORACLE, "events")
    qs = e.stat.approxQuantile("value", [0.25, 0.5, 0.75], 0.01)
    assert qs[0] <= qs[1] <= qs[2]
