"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(`query_processing_over_streaming_data_using_flink_spark/registry.py`):
every implemented operator from SURVEY.md §2 registers a Spark callable
plus its DuckDB oracle SQL there; this module just re-exports them in
the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_processing_over_streaming_data_using_flink_spark import registry
from query_processing_over_streaming_data_using_flink_spark.plans.tpch import q3_shipping_priority

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3, the reference's one canonical query)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted entries get a
    rows-only check)."""
    return registry.all_oracles()
