"""Scale-behavior tests: physical-plan assertions (pushdown, broadcast,
partial top-k), salted-join correctness, bucketed co-located joins
(no Exchange), and AQE being active — the habits that matter at 100 TB,
checked mechanically so they can't regress.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_ORACLE, SF_SMOKE
from query_processing_over_streaming_data_using_flink_spark.operators.relational import (
    equi_join,
    salted_equi_join,
)
from query_processing_over_streaming_data_using_flink_spark.plans.tpch import q3_shipping_priority
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _formatted(spark, df) -> str:
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q3_plan_shape(spark):
    df = q3_shipping_priority(spark, SF_ORACLE)
    plan = _formatted(spark, df)
    # Filters reach the parquet scan (not evaluated post-scan only).
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "TakeOrderedAndProject" in plan, "top-20 must not be a global sort"
    # Only needed columns are read from the widest table.
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,l_shipdate" in plan


def test_q3_uses_broadcast_joins_at_small_scale(spark):
    df = q3_shipping_priority(spark, SF_ORACLE)
    df.collect()  # let AQE finalize
    assert "BroadcastHashJoin" in _plan(df)


def test_dim_join_broadcasts(spark):
    c = load_table(spark, SF_ORACLE, "customer")
    n = load_table(spark, SF_ORACLE, "nation")
    df = equi_join(c, n, F.col("c_nationkey") == F.col("n_nationkey"), broadcast_right=True)
    assert "BroadcastHashJoin" in _plan(df)


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    plain = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_equi_join(o, c, "o_custkey", "c_custkey", salt=4)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted([tuple(r) for r in salted.collect()]) == sorted(
        [tuple(r) for r in plain.collect()]
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing co-locates the join: neither side shuffles.
    (The write-side story for repeated joins on the same key at scale.)

    At toy scale the planner rightly prefers broadcast, which bypasses
    bucketing — disable the broadcast threshold to surface the
    sort-merge path a 100 TB fact-fact join would take."""
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("l_bucketed")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("o_bucketed").join(
            spark.table("l_bucketed"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
        spark.sql("DROP TABLE IF EXISTS l_bucketed")


def test_aqe_enabled_and_coalesces(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_no_cartesian_in_lsh_candidates(spark):
    """LSH candidate generation must be an equi-join on (band, key),
    never a cross product."""
    from query_processing_over_streaming_data_using_flink_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _optimized(minhash_lsh_pairs(docs, 0.5))
    assert "CartesianProduct" not in plan and "cartesian" not in plan.lower()
