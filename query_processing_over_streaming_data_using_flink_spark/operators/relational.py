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


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global rank (≡ ``row_number() OVER (ORDER BY order_cols)``
    for a unique ordering key) WITHOUT a single-partition sort.

    ``Window.orderBy`` with no partitionBy collapses to one task — the
    classic scale killer. This is the two-pass form: range-repartition
    on the ordering key (parallel sort), then rank = cumulative count
    of the preceding partitions + position within the partition.
    Within-partition positions come from `monotonically_increasing_id`,
    which is contiguous per partition after `sortWithinPartitions`; the
    per-partition offsets are a tiny (num_partitions)-row aggregate
    broadcast back. Result is the deterministic global rank regardless
    of how the range sampler draws boundaries.

    Requires `order_cols` to be a unique key (ties could straddle a
    range boundary and within-partition ids don't see across it).
    One exchange + one persisted pass — the plan you want at 100 TB.
    """
    cols = list(order_cols)
    part = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    part = (
        part.sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    bounds = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_pid")
        .agg(F.min("_mid").alias("_first"), F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(bounds), F.lit(0)))
        .select("_pid", "_first", "_off")
    )
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_mid") - F.col("_first") + 1).cast("long"))
        .drop("_pid", "_mid", "_first", "_off")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the payload of
    the latest right row with the same key and ``right_ts <= left_ts``
    (ties on timestamp broken by the largest ``tiebreak``, a right-side
    column; left rows need none — right rows sort before left rows at
    equal timestamps, and equal-ts left rows all observe the same
    state). Left rows with no prior right row keep NULL payload
    (left-join semantics).

    No Spark built-in expresses this (it's not in the reference either
    — SURVEY.md §2.3 'no as-of joins'), and the naive formulation
    (range join + per-row max) explodes quadratically per key. This is
    the scalable union-trick plan: tag both sides, union, and take
    ``last(payload, ignorenulls)`` over a key-partitioned window
    ordered by (ts, side, tiebreak) with right rows sorting before
    left rows at equal timestamps. Exactly ONE shuffle (the window
    partitionBy), no row explosion, no per-key state on the driver —
    at 100 TB this is a single sort-based exchange, the same cost as
    any keyed aggregation of both inputs.
    """
    r_struct = F.struct(*[F.col(c) for c in payload])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    tb_type = right.schema[tiebreak].dataType
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lhs.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lhs.unionByName(rhs)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    return matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in payload],
    )


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


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """CDC upsert-stream compaction: reduce a change/event stream to its
    latest record per key under a total `order` (pass desc() columns;
    make the order total — e.g. ts then a unique id — or the survivor
    is nondeterministic). The batch face of latest-wins materialization
    (Kafka log compaction, Delta MERGE latest-wins, Flink upsert
    sinks): one shuffle on the key, per-partition window scan, no
    driver involvement."""
    return top_k_per_group(df, keys, order, k=1)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics as one relational pass (Delta/Iceberg
    MERGE, SQL:2003 MERGE): rows of `source` update matching `target`
    rows, insert when unmatched, and delete when `delete_col` is true.
    Both inputs must share the schema (plus the optional delete flag on
    the source side).

    Rendering: a full outer join on the merge keys, then one projection
    per column preferring the source side — a single key shuffle, no
    driver involvement, exactly how Delta's join-based MERGE plans at
    scale. The source must be key-unique (standard MERGE precondition:
    multiple source matches per target row are ambiguous — compact with
    `latest_per_key` first)."""
    data_cols = [c for c in target.columns if c not in keys]
    src = source
    if delete_col is None:
        src = src.withColumn("__del", F.lit(False))
    else:
        src = src.withColumnRenamed(delete_col, "__del")
    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__t_{c}") for c in data_cols],
    )
    # Explicit presence marker (the snapshot_diff pattern): the delete
    # flag itself is NOT a presence signal — CDC feeds routinely carry
    # NULL there meaning "not a delete", and conflating the two would
    # drop such updates and null out such inserts.
    s = src.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in data_cols],
        F.coalesce(F.col("__del"), F.lit(False)).alias("__del"),
        F.lit(True).alias("__src"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__tk_{k}") == F.col(f"__sk_{k}")
        cond = eq if cond is None else cond & eq
    joined = t.join(s, cond, "full_outer")
    matched = F.col("__src").isNotNull()  # source row present
    kept = joined.filter(~matched | ~F.col("__del"))
    out_cols = [
        F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k) for k in keys
    ] + [
        F.when(matched, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}")).alias(c)
        for c in data_cols
    ]
    return kept.select(*out_cols)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Diff two snapshots of the same table into a change feed:
    (keys..., change ∈ {insert, delete, update}) — the inverse of
    `merge_upsert`, and the audit primitive for table-format time
    travel (Delta CDF / Iceberg changelog scans). One full outer join
    on the key; `update` compares every non-key column null-safely
    inside codegen."""
    data_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in data_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in data_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    same = None
    for c in data_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else same & eq
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(same, F.lit(None).cast("string"))
        .otherwise(F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in keys
            ],
            "change",
        )
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block_col,
    max_distance: int,
) -> DataFrame:
    """Entity-resolution candidate pairs: distinct names equi-joined on
    a blocking key, kept when Levenshtein(name_a, name_b) <= threshold.
    The blocking key bounds the candidate set (the record-linkage
    'blocking' step) — the quadratic comparison only ever runs inside a
    block, never across the corpus, which is what keeps fuzzy matching
    alive at 10^9 rows; the distance is computed JVM-side.

    Returns (name_a, name_b, block, distance) with name_a < name_b."""
    names = (
        df.select(F.col(name_col).alias("name"), block_col.alias("block"))
        .distinct()
    )
    a = names.select(F.col("name").alias("name_a"), "block")
    b = names.select(F.col("name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "block", "distance")
    )
