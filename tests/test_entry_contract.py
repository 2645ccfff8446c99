"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, and every oracle-backed query hash-matches DuckDB at
sf0.01 — the same check the driver runs (CORRECTNESS gate).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_ORACLE, assert_matches_oracle

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
)
_entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry_mod)


def test_entry_smoke(spark):
    df = _entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_shippriority"]


def test_oracle_keys_subset_of_queries():
    q = _entry_mod.queries()
    o = _entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


@pytest.mark.parametrize("name", sorted(_entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    fn = _entry_mod.queries()[name]
    sql = _entry_mod.oracle_sql()[name]
    assert_matches_oracle(fn(spark, SF_ORACLE), duck, sql)


def test_engine_facade(spark):
    """The one-import user surface: named queries, catalog tables,
    ad-hoc SQL over registered views, and helpful unknown-name errors."""
    from tests.conftest import SF_SMOKE
    from query_processing_over_streaming_data_using_flink_spark.api import Engine

    eng = Engine(SF_SMOKE, spark=spark)
    assert "q3_shipping_priority" in eng.names()
    assert eng.query("q3_shipping_priority").columns == [
        "l_orderkey", "revenue", "o_orderdate", "o_shippriority",
    ]
    assert eng.table("nation").count() == 25
    n = eng.sql("SELECT count(*) AS n FROM customer").collect()[0]["n"]
    assert n == eng.table("customer").count()
    assert "SELECT" in (eng.oracle_sql("q3_shipping_priority") or "").upper()
    with pytest.raises(KeyError, match="did you mean"):
        eng.query("q3_shiping_priority")


def test_registry_priority_names_are_real():
    """A typo in the prefix ordering lists would silently change which
    queries the driver certifies — every listed name must exist, the
    lists must not overlap, and the checked prefix must be exactly the
    intended 50 entries."""
    from query_processing_over_streaming_data_using_flink_spark import registry

    registry._load()
    known = set(registry._REGISTRY)
    missing_first = [n for n in registry._PRIORITY_FIRST if n not in known]
    missing_last = [n for n in registry._PUSH_LAST if n not in known]
    assert not missing_first, f"unknown names in _PRIORITY_FIRST: {missing_first}"
    assert not missing_last, f"unknown names in _PUSH_LAST: {missing_last}"
    overlap = set(registry._PRIORITY_FIRST) & set(registry._PUSH_LAST)
    assert not overlap, f"names in both lists: {overlap}"
    assert len(registry._PRIORITY_FIRST) == len(set(registry._PRIORITY_FIRST))
    assert len(registry._PUSH_LAST) == len(set(registry._PUSH_LAST))
    # The driver checks a 50-entry prefix. The list may run PAST 50
    # only as the explicit overflow queue (forced demand > 50 slots, a
    # rare round shape) — the rotation test validates that overflow is
    # legitimate; here we pin that the intended prefix itself is 50.
    assert len(registry._PRIORITY_FIRST) >= 50, (
        f"driver checks a 50-entry prefix; priority list has "
        f"{len(registry._PRIORITY_FIRST)}"
    )
    # Round 8: the r7 CORRECTNESS file never landed, so the entire r7
    # forced set (51 queries) still occupies the prefix and every new
    # r8 query must queue in the overflow block — the queue grows until
    # the next driver check lands and the prefix can rotate again. The
    # rotation test below still enforces that overflow entries are
    # contiguous and never-checked; this cap only guards runaway growth.
    assert len(registry._PRIORITY_FIRST) <= 70, (
        "overflow queue should stay small — rotate, don't accumulate"
    )


def test_registry_rotation_covers_stalest_queries():
    """The rotation POLICY, mechanized: the driver certifies a 50-entry
    prefix per round, and the builder's staleness bound says no
    registered query goes >3 rounds without a driver-green row. So
    every query whose last green CORRECTNESS row is ≥3 rounds old (or
    that has never been checked) must sit inside the current prefix —
    a hand-edited priority list that silently strands a stale query
    fails here instead of in a future verdict."""
    import glob
    import json
    import re

    from query_processing_over_streaming_data_using_flink_spark import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver CORRECTNESS files yet (round 1)")
    last_green: dict[str, int] = {}
    rounds = []
    for path in files:
        rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                ok = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") in (True, None)
                )
                if ok:
                    last_green[name] = max(last_green.get(name, 0), rnd)
    current_round = max(rounds) + 1  # CORRECTNESS_rN is written after round N
    names = list(registry.all_queries())
    prefix = set(names[:50])
    forced = [
        n
        for n in names
        if current_round - last_green.get(n, current_round - 99) >= 3
    ]
    stranded = [n for n in forced if n not in prefix]
    if len(forced) <= 50:
        assert not stranded, (
            f"queries ≥3 rounds stale but outside the 50-entry driver "
            f"prefix: {stranded}"
        )
    else:
        # Overflow round: more forced queries than slots. The policy
        # then requires (a) exactly the overflow count is stranded,
        # (b) stranded queries queue CONTIGUOUSLY right after the
        # prefix (first in line for next round), and (c) each is
        # never-driver-checked (a new query waiting its first check) —
        # an already-stale query must never be the one bumped.
        assert len(stranded) == len(forced) - 50, (forced, stranded)
        assert set(names[50 : 50 + len(stranded)]) == set(stranded), (
            f"overflow must queue contiguously at position 51+: {stranded}"
        )
        assert all(n not in last_green for n in stranded), (
            f"bumped queries must be new, never already-stale: {stranded}"
        )


def test_complex_column_lint_catches_planted_offender(spark):
    """The round-4 red row (`embedding_label_centroids`) was a correct
    query whose array<double> column crashed the driver's pandas
    canonicalizer. `complex_toplevel_columns` is the guard — it must
    flag array/map/struct top-level columns and pass flat schemas
    (nested complex types inside are the cells' problem, but top-level
    is what pandas factorize chokes on)."""
    from pyspark.sql import functions as F

    from query_processing_over_streaming_data_using_flink_spark.registry import complex_toplevel_columns

    offender = spark.range(3).select(
        "id",
        F.array(F.lit(1.0), F.lit(2.0)).alias("vec"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
    )
    flagged = complex_toplevel_columns(offender.schema)
    assert sorted(c.split(":")[0] for c in flagged) == ["m", "s", "vec"]

    clean = spark.range(3).select("id", F.lit("x").alias("t"), F.lit(1.5).alias("v"))
    assert complex_toplevel_columns(clean.schema) == []


def test_registered_queries_have_flat_schemas(spark):
    """Every registered query must emit a driver-hashable (flat) result
    schema — the same lint scripts/verify_contract.py applies, checked
    here schema-only (no execution) so it runs fast in CI."""
    from query_processing_over_streaming_data_using_flink_spark.registry import (
        all_queries,
        complex_toplevel_columns,
    )

    bad = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF_ORACLE)
        cols = complex_toplevel_columns(df.schema)
        if cols:
            bad[name] = cols
    assert not bad, f"registered queries with complex top-level columns: {bad}"
