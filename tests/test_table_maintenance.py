"""Semantics tests for the table-maintenance operators: MERGE upsert,
snapshot diff (round-trip law: old + diff == new), and blocked fuzzy
entity-resolution pairs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators.relational import (
    blocked_fuzzy_pairs,
    merge_upsert,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, n long")


def test_merge_upsert_three_arms(spark):
    target = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    source = spark.createDataFrame(
        [
            (2, "B", 200, False),  # update
            (3, "c", 30, True),  # delete
            (9, "z", 90, False),  # insert
        ],
        "k long, v string, n long, del boolean",
    )
    out = {
        r["k"]: (r["v"], r["n"])
        for r in merge_upsert(target, source, ["k"], delete_col="del").collect()
    }
    assert out == {1: ("a", 10), 2: ("B", 200), 9: ("z", 90)}


def test_merge_upsert_without_delete_col_upserts_only(spark):
    target = _snap(spark, [(1, "a", 10)])
    source = _snap(spark, [(1, "A", 11), (2, "b", 20)])
    out = {
        r["k"]: (r["v"], r["n"]) for r in merge_upsert(target, source, ["k"]).collect()
    }
    assert out == {1: ("A", 11), 2: ("b", 20)}


def test_snapshot_diff_classifies_changes(spark):
    old = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)])
    new = _snap(spark, [(2, "B", 20), (3, "c", 30), (4, None, 40), (5, "e", 50)])
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # unchanged rows (3, and 4 with a NULL compared null-safely) absent
    assert out == {1: "delete", 2: "update", 5: "insert"}


def test_merge_then_diff_round_trip(spark):
    """snapshot_diff(old, merge(old, src)) reports exactly the CDC arms
    that changed something."""
    target = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    source = spark.createDataFrame(
        [(2, "B", 200, False), (3, "c", 30, True), (9, "z", 90, False),
         (1, "a", 10, False)],  # no-op update: same values
        "k long, v string, n long, del boolean",
    )
    merged = merge_upsert(target, source, ["k"], delete_col="del")
    out = {r["k"]: r["change"] for r in snapshot_diff(target, merged, ["k"]).collect()}
    assert out == {2: "update", 3: "delete", 9: "insert"}


def test_blocked_fuzzy_pairs_respects_block_and_threshold(spark):
    df = spark.createDataFrame(
        [("red gear",), ("tan gear",), ("red ring",), ("golden gear",)],
        "name string",
    )
    pairs = blocked_fuzzy_pairs(
        df, "name", F.split(F.col("name"), " ").getItem(1), max_distance=3
    ).collect()
    got = {(r["name_a"], r["name_b"]) for r in pairs}
    # 'red gear' ~ 'tan gear' (distance 3); 'golden gear' too far from
    # both (6/5); 'red ring' in another block despite distance 3.
    assert got == {("red gear", "tan gear")}
    (row,) = pairs
    assert row["distance"] == 3 and row["block"] == "gear"


@pytest.mark.slow  # property sweep: MERGE + diff stay attested by the oracle-backed
# merge_upsert_customer / snapshot_diff_customer rows
def test_merge_diff_round_trip_property(spark):
    """Property (hypothesis): for arbitrary small target/source tables,
    applying the diff of (old -> merge(old, src)) to a pure-Python
    model of MERGE reproduces the merged snapshot, and diff classifies
    every key exactly as the model says. Spark is the system under
    test; the model is 10 lines of Python."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.integers(0, 6)
    vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

    @st.composite
    def tables(draw):
        tkeys = draw(st.sets(keys, max_size=5))
        skeys = draw(st.sets(keys, max_size=5))
        target = [(k, draw(vals), draw(st.integers(0, 3))) for k in sorted(tkeys)]
        source = [
            # delete flag may be NULL — CDC semantics: NULL == not-delete
            (k, draw(vals), draw(st.integers(0, 3)),
             draw(st.one_of(st.none(), st.booleans())))
            for k in sorted(skeys)
        ]
        return target, source

    @settings(max_examples=12, deadline=None)
    @given(tables())
    def check(tb):
        target_rows, source_rows = tb
        target = spark.createDataFrame(target_rows, "k long, v string, n long") \
            if target_rows else spark.createDataFrame([], "k long, v string, n long")
        source = spark.createDataFrame(
            source_rows, "k long, v string, n long, del boolean"
        ) if source_rows else spark.createDataFrame(
            [], "k long, v string, n long, del boolean"
        )
        got = {
            r["k"]: (r["v"], r["n"])
            for r in merge_upsert(target, source, ["k"], delete_col="del").collect()
        }
        # pure-Python MERGE model
        model = {k: (v, n) for k, v, n in target_rows}
        for k, v, n, dele in source_rows:
            if dele:  # None and False both mean upsert
                model.pop(k, None)
            else:
                model[k] = (v, n)
        assert got == model, (target_rows, source_rows)

        changes = {
            r["k"]: r["change"]
            for r in snapshot_diff(
                target,
                merge_upsert(target, source, ["k"], delete_col="del"),
                ["k"],
            ).collect()
        }
        old = {k: (v, n) for k, v, n in target_rows}
        expect = {}
        for k in set(old) | set(model):
            if k not in old:
                expect[k] = "insert"
            elif k not in model:
                expect[k] = "delete"
            elif old[k] != model[k]:
                expect[k] = "update"
        assert changes == expect, (target_rows, source_rows)

    check()


def test_merge_upsert_null_delete_flag_means_not_delete(spark):
    """CDC feeds carry NULL delete flags meaning 'not a delete': a NULL
    flag must behave exactly like false (update applies, insert lands
    with its values), never like row-absence."""
    target = _snap(spark, [(1, "a", 10)])
    source = spark.createDataFrame(
        [(1, "A", 11, None), (2, "b", 20, None)],
        "k long, v string, n long, del boolean",
    )
    out = {
        r["k"]: (r["v"], r["n"])
        for r in merge_upsert(target, source, ["k"], delete_col="del").collect()
    }
    assert out == {1: ("A", 11), 2: ("b", 20)}


def test_blocked_fuzzy_pairs_handles_one_word_names(spark):
    """One-word names share the '' block (mirroring DuckDB's
    split_part) instead of a NULL block that can never join."""
    df = spark.createDataFrame([("bolt",), ("bolts",), ("red gear",)], "name string")
    pairs = blocked_fuzzy_pairs(
        df, "name", F.coalesce(F.get(F.split(F.col("name"), " "), 1), F.lit("")),
        max_distance=2,
    ).collect()
    assert {(r["name_a"], r["name_b"]) for r in pairs} == {("bolt", "bolts")}
