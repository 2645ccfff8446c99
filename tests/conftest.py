"""Shared test fixtures: one tuned SparkSession per test run, plus a
driver-faithful oracle comparison helper (row-count + schema + order-
insensitive value comparison vs DuckDB at the given scale factor).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_processing_over_streaming_data_using_flink_spark.session import get_spark
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def built_queries(spark):
    """Every registered query BUILT ONCE at SF_SMOKE, shared by the
    whole-registry lints (plan red-flags in test_scale_plans, flat
    result schemas in test_entry_contract). Building a query is not
    free — eager result pins and iterative operators (connected
    components, power iteration, BPE training) run real jobs — and the
    two lints used to pay that for all 199 queries twice (once at
    sf0.01): ~8.5 min of suite wall-clock for two passes over the same
    DataFrames (r15, the round-14 verdict's verify-budget item)."""
    from query_processing_over_streaming_data_using_flink_spark import registry

    return {
        name: fn(spark, SF_SMOKE) for name, fn in sorted(registry.all_queries().items())
    }


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir, prefix in ((SF_ORACLE, ""), (SF_SMOKE, "smoke_")):
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalized_rows(cols, rows):
    """Column-name-sorted, order-insensitive multiset of rows (the
    driver sorts columns by name before hashing)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=repr,
    )


def assert_matches_oracle(spark_df, duck_con, sql, check_names=True):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} != oracle {len(d_rows)}"
    if check_names:
        assert sorted(s_cols) == sorted(d_cols), f"columns {sorted(s_cols)} != {sorted(d_cols)}"
    sn, dn = normalized_rows(s_cols, s_rows), normalized_rows(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mism, f"value mismatch at sorted rows {mism[:5]}: spark={ [sn[i] for i in mism[:2]] } oracle={ [dn[i] for i in mism[:2]] }"
