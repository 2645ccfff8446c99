"""Reusable relational operators — the reference's operator inventory
(SURVEY.md §2.2-2.7) as thin, scale-aware wrappers over DataFrame ops.

Design: these are *compositions*, not reimplementations. Catalyst owns
predicate pushdown, column pruning, and join strategy; the wrappers
only add the scale-sensitive decisions Spark can't infer (broadcast
hints for known-small sides, deterministic top-k ordering).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str] | str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join (reference: the stateful symmetric joins,
    `TPCHQuery3_StreamProcessor.java:390-513`, which in batch semantics
    are plain hash joins).

    `broadcast_right=True` pins a broadcast-hash join for dimension
    tables — at 100 TB a sort-merge against region/nation/supplier is
    a pointless fact-table shuffle. AQE also auto-converts, but the
    hint removes the dependence on runtime statistics.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def grouped_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """Hash aggregate with named outputs (reference:
    `TPCHQuery3SQL_Batch.java:102,112-115` and the reduce at
    `TPCHQuery3_BatchProcessor.java:279-291`). Spark performs map-side
    partial aggregation before the shuffle automatically."""
    return df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (reference: ORDER BY ... LIMIT 20,
    `TPCHQuery3SQL_Batch.java:116-119`; single-task TopNFunction,
    `TPCHQuery3_StreamProcessor.java:983-1062`).

    orderBy().limit(k) plans as TakeOrderedAndProject: per-partition
    bounded heaps merged on the driver — O(k) driver memory, no global
    sort, unlike the reference's collapse-to-one-task design.
    """
    return df.orderBy(*order).limit(k)


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: the skewed (left) side gets a random
    salt in [0, salt); the small-to-medium right side is replicated
    `salt` times with every salt value; the join key becomes
    (key, salt), splitting one hot key's rows across `salt` tasks.

    AQE's skew-join split (enabled in session.py) handles most skew at
    runtime; explicit salting is for the pathological key whose single
    partition still exceeds executor memory. Replication factor is the
    cost — use only on genuinely skewed joins.
    """
    salted_left = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)])).alias("_salt")
    replicated_right = right.select("*", salts)
    joined = salted_left.join(
        replicated_right,
        (F.col(left_key) == F.col(right_key)) & (salted_left["_salt"] == replicated_right["_salt"]),
        how,
    )
    return joined.drop("_salt")


def top_k_per_group(
    df: DataFrame,
    group_keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k within each group via row_number window — the 'latest/best
    per key' construct the reference's TopN approximates (SURVEY.md
    §2.5 notes its staleness bug; this is the correct semantics)."""
    w = Window.partitionBy(*group_keys).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
