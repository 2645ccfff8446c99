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
    # Round 9 shape: 50-entry prefix + the next-stalest cohort queued
    # contiguously behind it (r5-green overflow, ~20) + this round's new
    # registrations (which displace prefix fillers into the queue). The
    # rotation test enforces ordering; this cap only guards runaway
    # growth of the hand-ordered block.
    assert len(registry._PRIORITY_FIRST) <= 80, (
        "overflow queue should stay small — rotate, don't accumulate"
    )


def test_registry_rotation_covers_stalest_queries():
    """The rotation POLICY, mechanized (amended round 9 per the round-8
    verdict — the old fixed 3-calendar-round bound became arithmetically
    unsatisfiable once the registry outgrew 150 and the r7 driver files
    never landed):

    * Staleness is counted in LANDED driver rounds — CORRECTNESS files
      actually on disk — not calendar rounds, so a driver skip (r7)
      cannot age two cohorts at once. staleness(q) = 1 + number of
      landed files newer than q's last green row (i.e. what q's age
      becomes if the upcoming round's 50-entry check skips it too).
      Never-checked queries are infinitely stale (first check is always
      urgent).
    * The bound is DYNAMIC: with N registered queries cycling through a
      50-slot prefix, a full certification pass needs ceil(N/50) landed
      rounds, so the policy allows ceil(N/50) + 1 — one round of slack
      for red-row retries — instead of the old hard-coded 3.
    * FORCED = queries at/over the bound (or never checked). All must
      sit inside the 50-entry prefix; a hand-edited priority list that
      silently strands one fails here instead of in a future verdict.
    * FILL rule: prefix slots not needed by forced queries go to the
      stalest remainder — no query outside the prefix may be STRICTLY
      staler than one inside (ties are free choice).
    * QUEUE rule: after the prefix, staleness must be non-increasing,
      so the overflow block at 51+ is exactly the next-stalest cohort,
      first in line for the following round, and a freshly registered
      (never-checked) query can never be parked at the tail.
    """
    import glob
    import json
    import math
    import re

    from query_processing_over_streaming_data_using_flink_spark import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver CORRECTNESS files yet (round 1)")
    last_green: dict[str, int] = {}
    landed = []
    for path in files:
        rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        landed.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                ok = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") in (True, None)
                )
                if ok:
                    last_green[name] = max(last_green.get(name, 0), rnd)

    names = list(registry.all_queries())
    NEVER = 10**6

    def staleness(q: str) -> int:
        if q not in last_green:
            return NEVER
        return 1 + sum(1 for r in landed if r > last_green[q])

    bound = math.ceil(len(names) / 50) + 1
    forced = [n for n in names if staleness(n) >= bound]
    prefix = names[:50]
    stranded = [n for n in forced if n not in prefix]
    if len(forced) <= 50:
        assert not stranded, (
            f"queries at the staleness bound ({bound} landed rounds) but "
            f"outside the 50-entry driver prefix: {stranded}"
        )
        # Fill rule: remaining slots hold the stalest of the rest.
        inside_min = min(staleness(n) for n in prefix)
        outside_max = max((staleness(n) for n in names[50:]), default=0)
        assert outside_max <= inside_min, (
            f"a query outside the prefix (staleness {outside_max}) is "
            f"strictly staler than one inside (staleness {inside_min}) — "
            f"fill the free slots stalest-first"
        )
    else:
        # Overflow round: more forced queries than slots — only possible
        # after repeated driver skips. Then the stranded ones must queue
        # contiguously at 51+ (first in line next round) and be the
        # LEAST stale of the forced set (never bump the oldest).
        assert set(names[50 : 50 + len(stranded)]) == set(stranded), (
            f"overflow must queue contiguously at position 51+: {stranded}"
        )
        kept = [n for n in forced if n in set(prefix)]
        # With >50 forced queries the prefix must be forced-only: exactly
        # len(forced) - 50 of them are stranded, no more, no fewer.
        assert len(kept) == 50 and len(stranded) == len(forced) - 50, (
            f"overflow prefix must hold exactly 50 forced queries "
            f"(kept {len(kept)}, stranded {len(stranded)} of {len(forced)})"
        )
        bumped_max = max(staleness(n) for n in stranded)
        kept_min = min(staleness(n) for n in kept)
        assert bumped_max <= kept_min, "bumped queries must be the least stale"
    # Queue rule: tail staleness is non-increasing, so position 51+ is
    # always the next-stalest cohort and new queries can't hide at the end.
    tail = [staleness(n) for n in names[50:]]
    assert all(a >= b for a, b in zip(tail, tail[1:])), (
        "tail must be ordered stalest-first (non-increasing staleness)"
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


def test_registered_queries_have_flat_schemas(built_queries):
    """Every registered query must emit a driver-hashable (flat) result
    schema — the same lint scripts/verify_contract.py applies, checked
    schema-only. Result schemas are SF-independent, so the queries come
    from the shared SF_SMOKE `built_queries` fixture (building all 199
    again at sf0.01 — eager pins and iterative operators run real jobs
    — cost this test ~4.5 min solo)."""
    from query_processing_over_streaming_data_using_flink_spark.registry import (
        complex_toplevel_columns,
    )

    bad = {}
    for name, df in built_queries.items():
        cols = complex_toplevel_columns(df.schema)
        if cols:
            bad[name] = cols
    assert not bad, f"registered queries with complex top-level columns: {bad}"
