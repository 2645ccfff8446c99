"""SCD2 (slowly-changing-dimension type 2) materialization of a
changelog: collapse a key's insert/delete event history into validity
intervals [valid_from, valid_to), one row per version.

The reference replays its CDC stream into *current-state* keyed maps
and discards history (`/root/reference/src/main/java/org/example/
TPCHQuery3_StreamProcessor.java:391-449`); a warehouse consuming the
same stream usually wants the full validity history — "what did this
dimension row look like at sequence/time T" — which is exactly the SCD2
row shape.

Construction (pure relational, two same-key stages):
  1. version-stamp every event with a running count of inserts for its
     key (`sum(op=+1) over (partition by key order by seq)`) — a
     re-inserted key starts a new version;
  2. group by (key, version): `valid_from` = the insert's seq,
     `valid_to` = the delete's seq or NULL while live.

Scale: the window and the groupBy hash on the same key columns, so the
exchange inserted for stage 1 is reused by stage 2 — one shuffle of
the changelog total. No state, no driver loops; works identically as a
batch query over a staged changelog or inside foreachBatch on a live
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(log: DataFrame, key_cols: list[str]) -> DataFrame:
    """`log` must carry (seq BIGINT, op INT in {+1,-1}) plus key_cols.
    Returns one row per (key, version) with valid_from / valid_to /
    is_live. Assumes a well-formed changelog (no delete before its
    insert — guaranteed by construction in `streaming/changelog.py`)."""
    w = Window.partitionBy(*key_cols).orderBy("seq")
    ver = F.sum(F.when(F.col("op") == 1, 1).otherwise(0)).over(w)
    return (
        log.withColumn("version", ver.cast("long"))
        .groupBy(*key_cols, "version")
        .agg(
            F.min(F.when(F.col("op") == 1, F.col("seq"))).alias("valid_from"),
            F.min(F.when(F.col("op") == -1, F.col("seq"))).alias("valid_to"),
        )
        .withColumn("is_live", F.col("valid_to").isNull())
    )


def scd2_sql(events_sql: str, key_cols: list[str]) -> str:
    """DuckDB oracle mirroring `scd2_from_changelog` over an events
    subquery with the same (seq, op, key) columns."""
    keys = ", ".join(key_cols)
    return f"""
WITH ev AS ({events_sql}),
versioned AS (
  SELECT *, CAST(sum(CASE WHEN op = 1 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY {keys} ORDER BY seq) AS BIGINT) AS version
  FROM ev
)
SELECT {keys}, version,
       min(CASE WHEN op = 1 THEN seq END) AS valid_from,
       min(CASE WHEN op = -1 THEN seq END) AS valid_to,
       min(CASE WHEN op = -1 THEN seq END) IS NULL AS is_live
FROM versioned
GROUP BY {keys}, version
"""
