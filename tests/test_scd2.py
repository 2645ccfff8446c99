"""SCD2 changelog materialization: multi-version keys (re-insert after
delete) get disjoint validity intervals, and the live set equals the
signed-weight net state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.streaming.scd2 import scd2_from_changelog


def _log(spark, rows):
    return spark.createDataFrame(rows, "seq long, op int, k string")


def test_multi_version_key_gets_disjoint_intervals(spark):
    # key 'a': insert@1 delete@3 insert@5 (live); key 'b': insert@2 (live);
    # key 'c': insert@4 delete@6 (dead).
    log = _log(
        spark,
        [(1, 1, "a"), (2, 1, "b"), (3, -1, "a"), (4, 1, "c"), (5, 1, "a"), (6, -1, "c")],
    )
    got = {
        (r.k, r.version): (r.valid_from, r.valid_to, r.is_live)
        for r in scd2_from_changelog(log, ["k"]).collect()
    }
    assert got == {
        ("a", 1): (1, 3, False),
        ("a", 2): (5, None, True),
        ("b", 1): (2, None, True),
        ("c", 1): (4, 6, False),
    }


def test_live_versions_equal_net_state(spark):
    """Keys with a live SCD2 version == keys with positive signed
    weight — the algebra the IVM pipeline maintains."""
    import random

    rng = random.Random(7)
    rows, seq = [], 0
    live = set()
    for _ in range(400):
        seq += 1
        k = f"k{rng.randrange(40)}"
        if k in live and rng.random() < 0.5:
            rows.append((seq, -1, k))
            live.discard(k)
        elif k not in live:
            rows.append((seq, 1, k))
            live.add(k)
        else:
            rows.append((seq, 1, f"k{rng.randrange(40, 80)}"))
            live.add(rows[-1][2])
    log = _log(spark, rows)
    scd2_live = {
        r.k for r in scd2_from_changelog(log, ["k"]).filter("is_live").collect()
    }
    net_live = {
        r.k
        for r in log.groupBy("k").agg(F.sum("op").alias("w")).filter("w > 0").collect()
    }
    assert scd2_live == net_live == live
