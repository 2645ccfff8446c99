"""Changelog (CDC event-stream) generator — the reference's
`StreamDataProcessor.py:122-260` re-expressed as relational operators.

The reference's Python generator merges the three TPC-H tables into one
interleaved insert/delete event log:
  * inserts preserve the table row-count ratios (6M:1.5M:150K —
    `StreamDataProcessor.py:31-35,170-213`),
  * once the sliding window (default = whole dataset,
    `StreamDataProcessor.py:22`) is full, each new insert is preceded
    by the deletion of the oldest still-live row (`:221-249` drains the
    remaining deletes after the inserts are exhausted),
  * each event carries only the columns the query needs (parse-time
    projection, `TPCHQuery3_StreamProcessor.java:313-332`).

Here the same stream is *declared*: per-relation insert index i →
proportional position pos = (i * n_max) / n_rel → global insert rank g
(row_number) → delete of insert g ordered right after insert g+W.
Everything is exact integer arithmetic until one final IEEE division,
so the DuckDB oracle reproduces the sequence bit-for-bit.

Scale note: every global rank here (`i`, `g`, `seq`) picks its plan
by input size, the way Spark itself picks broadcast vs shuffle joins:
below `RANK_SINGLE_TASK_MAX` rows a one-task `Window.orderBy`
row_number wins (one sort, no persist/extra exchange); above it the
rank switches to `operators/relational.py:global_rank` —
range-repartitioned parallel sort + per-partition cumulative offsets —
so no stage ever funnels 100 TB through one task. Both strategies emit
the identical sequence (unique ordering keys); `global_rank` is
equivalence-tested against row_number directly. (The reference's
generator is a sequential Python loop over 15.3M rows,
`StreamDataProcessor.py:122-260`.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from query_processing_over_streaming_data_using_flink_spark.operators.relational import global_rank
from query_processing_over_streaming_data_using_flink_spark.pin import pin_result
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

# Cost-based rank strategy cutover: a single-task sort of a few million
# narrow rows beats the two-pass parallel rank (persist + extra
# exchange + broadcast-back); beyond it, only the parallel form scales.
RANK_SINGLE_TASK_MAX = 4_000_000


def _rank(df: DataFrame, order_cols: list[str], name: str, n_rows: int) -> DataFrame:
    if n_rows <= RANK_SINGLE_TASK_MAX:
        w = Window.orderBy(*[F.asc(c) for c in order_cols])
        # long, matching global_rank: a rank past 2^31 rows must not wrap,
        # and both strategies must agree on type for plan-independent schemas.
        return df.withColumn(name, F.row_number().over(w).cast("long"))
    return global_rank(df, order_cols, name)

# Unified projected payload schema (union of the reference's per-table
# projections, `TPCHQuery3_StreamProcessor.java:313-332`).
PAYLOAD_COLS = (
    "custkey",
    "mktsegment",
    "orderkey",
    "o_custkey",
    "orderdate",
    "linenumber",
    "extendedprice",
    "discount",
    "shipdate",
)

_NULLS = {
    "custkey": "CAST(NULL AS BIGINT)",
    "mktsegment": "CAST(NULL AS STRING)",
    "orderkey": "CAST(NULL AS BIGINT)",
    "o_custkey": "CAST(NULL AS BIGINT)",
    "orderdate": "CAST(NULL AS TIMESTAMP_NTZ)",
    "linenumber": "CAST(NULL AS INT)",
    "extendedprice": "CAST(NULL AS DOUBLE)",
    "discount": "CAST(NULL AS DOUBLE)",
    "shipdate": "CAST(NULL AS TIMESTAMP_NTZ)",
}


def _projected(spark: SparkSession, sf_dir: str, relation: str, n_rows: int) -> DataFrame:
    """Per-relation projection + deterministic insert index i."""
    if relation == "customer":
        df = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        order_cols, rel_rank = ["custkey"], 0
    elif relation == "orders":
        df = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("o_custkey"),
            F.col("o_orderdate").alias("orderdate"),
        )
        order_cols, rel_rank = ["orderkey"], 1
    elif relation == "lineitem":
        df = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_shipdate").alias("shipdate"),
        )
        order_cols, rel_rank = ["orderkey", "linenumber"], 2
    else:
        raise ValueError(relation)

    df = _rank(df, order_cols, "i", n_rows)
    for col in PAYLOAD_COLS:
        if col not in df.columns:
            df = df.withColumn(col, F.expr(_NULLS[col]))
    return df.select(
        F.lit(relation).alias("relation"),
        F.lit(rel_rank).alias("rel_rank"),
        "i",
        *PAYLOAD_COLS,
    )


def build_changelog(
    spark: SparkSession,
    sf_dir: str,
    window: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Build the interleaved insert/delete event stream.

    Returns schema: (seq BIGINT, op INT {+1,-1}, relation STRING,
    <PAYLOAD_COLS...>).  `window` = sliding-window capacity in rows
    (None → insert-only changelog; reference default = dataset size →
    all inserts then a full drain of deletes).

    `pin` (round 14): localCheckpoint the ranked frame so consumers
    that branch over the changelog several times (q3_on_state filters
    it 3x, the PIT join 2x) share ONE compute of the rank machinery.
    Callers that consume the stream exactly once (single aggregate, or
    a write to parquet for staged replay) pass pin=False and skip the
    materialization cost.
    """
    # Parquet row counts are metadata reads — one cheap job each, and
    # they feed both the pos arithmetic and the rank-strategy choice.
    sizes = {
        rel: load_table(spark, sf_dir, rel).count()
        for rel in ("customer", "orders", "lineitem")
    }
    n_max = max(sizes.values())
    n_total = sum(sizes.values())
    ins = (
        _projected(spark, sf_dir, "customer", sizes["customer"])
        .unionByName(_projected(spark, sf_dir, "orders", sizes["orders"]))
        .unionByName(_projected(spark, sf_dir, "lineitem", sizes["lineitem"]))
    )
    counts = spark.createDataFrame(
        [(k, v) for k, v in sizes.items()], "relation string, n_rel long"
    )

    # Proportional position: exact integer product, one IEEE division —
    # bit-identical in DuckDB (see module docstring).
    # i is row_number (int32); the product needs 64-bit room (ANSI mode
    # raises on overflow rather than wrapping).
    ins = ins.join(F.broadcast(counts), "relation").withColumn(
        "pos", (F.col("i").cast("long") * F.lit(int(n_max))) / F.col("n_rel")
    )
    ordered = _rank(ins, ["pos", "rel_rank", "i"], "g", n_total)

    # The interleaved sequence number is ANALYTIC in g — no third global
    # rank over 2N rows (the round-3 profile showed that rank dominating
    # SF-1 generation). Derivation: events sort by (k1, k2, k3) where
    # inserts carry (g, 0, g) and the delete of insert g carries
    # (min(g+W, N), 1, g); deletes order by g among themselves, so
    #   seq(insert g) = g + #{deletes before it} = g + max(0, g - W - 1)
    #   seq(delete g) = #{inserts before it} + #{earlier deletes} + 1
    #                 = min(g + W, N) + g.
    # Both are bijections onto their slots of 1..2N, and with W = N they
    # reduce to the reference's phase-2 full drain (inserts 1..N then
    # deletes N+1..2N). The DuckDB oracle keeps the independent
    # row_number() spec, so the hash-match certifies this closed form.
    if window is None:
        return ordered.select(
            F.col("g").alias("seq"), F.lit(1).alias("op"), "relation", *PAYLOAD_COLS
        )
    # Windowed form (round 14, guide §2.4 "remove shuffles/passes
    # outright"): the old inserts.unionByName(deletes) duplicated the
    # ENTIRE generator subtree — 3 scans, 3 per-relation rank windows,
    # the broadcast join and the global-rank sort ran TWICE per
    # consumption, and a consumer that reads the changelog k times
    # (q3_on_state filters it 3x) paid 2k recomputes (measured: the
    # changelog_q3_current_state plan held SIX copies of the subtree).
    # Two changes, same rows bit-for-bit:
    #   1. Each ordered row EXPLODES into its insert+delete event pair
    #      (a 2-element struct array), so the generator appears once
    #      per consumer plan instead of twice.
    #   2. The ranked frame is pinned (localCheckpoint; explain-mode
    #      no-op, pin.py) so ALL consumer branches share ONE compute of
    #      the rank machinery — N narrow rows materialized per build,
    #      the explode/seq arithmetic stays a cheap map over them.
    w_lit, n_lit = F.lit(int(window)), F.lit(int(n_total))
    if pin:
        ordered = pin_result(ordered)
    ins_seq = F.col("g") + F.greatest(F.lit(0), F.col("g") - w_lit - F.lit(1))
    del_seq = F.least(F.col("g") + w_lit, n_lit) + F.col("g")
    return ordered.select(
        F.explode(
            F.array(
                F.struct(ins_seq.alias("seq"), F.lit(1).alias("op")),
                F.struct(del_seq.alias("seq"), F.lit(-1).alias("op")),
            )
        ).alias("e"),
        "relation",
        *PAYLOAD_COLS,
    ).select(F.col("e.seq").alias("seq"), F.col("e.op").alias("op"), "relation", *PAYLOAD_COLS)


def changelog_sql(window: int | None = None, prefix: str = "") -> str:
    """DuckDB oracle SQL mirroring `build_changelog` exactly (same
    integer arithmetic, same orderings). `prefix` prefixes the base
    table view names (e.g. 'smoke_')."""
    w_ins = "row_number() OVER (ORDER BY pos, rel_rank, i)"
    deletes = (
        ""
        if window is None
        else f"""
    UNION ALL
    SELECT -1 AS op, relation, custkey, mktsegment, orderkey, o_custkey,
           orderdate, linenumber, extendedprice, discount, shipdate,
           least(g + {window}, (SELECT count(*) FROM ins)) AS k1, 1 AS k2, g AS k3
    FROM ordered"""
    )
    return f"""
WITH ins AS (
  SELECT 'customer' AS relation, 0 AS rel_rank,
         row_number() OVER (ORDER BY c_custkey) AS i,
         c_custkey AS custkey, c_mktsegment AS mktsegment,
         CAST(NULL AS BIGINT) AS orderkey, CAST(NULL AS BIGINT) AS o_custkey,
         CAST(NULL AS TIMESTAMP) AS orderdate, CAST(NULL AS INT) AS linenumber,
         CAST(NULL AS DOUBLE) AS extendedprice, CAST(NULL AS DOUBLE) AS discount,
         CAST(NULL AS TIMESTAMP) AS shipdate
  FROM {prefix}customer
  UNION ALL
  SELECT 'orders', 1, row_number() OVER (ORDER BY o_orderkey),
         NULL, NULL, o_orderkey, o_custkey, o_orderdate, NULL, NULL, NULL, NULL
  FROM {prefix}orders
  UNION ALL
  SELECT 'lineitem', 2, row_number() OVER (ORDER BY l_orderkey, l_linenumber),
         NULL, NULL, l_orderkey, NULL, NULL, l_linenumber,
         l_extendedprice, l_discount, l_shipdate
  FROM {prefix}lineitem
),
counts AS (SELECT relation, count(*) AS n_rel FROM ins GROUP BY relation),
positioned AS (
  SELECT ins.*, (i * (SELECT max(n_rel) FROM counts)) / n_rel AS pos
  FROM ins JOIN counts USING (relation)
),
ordered AS (SELECT *, {w_ins} AS g FROM positioned),
events AS (
  SELECT 1 AS op, relation, custkey, mktsegment, orderkey, o_custkey,
         orderdate, linenumber, extendedprice, discount, shipdate,
         g AS k1, 0 AS k2, g AS k3
  FROM ordered{deletes}
)
SELECT row_number() OVER (ORDER BY k1, k2, k3) AS seq, op, relation,
       custkey, mktsegment, orderkey, o_custkey, orderdate, linenumber,
       extendedprice, discount, shipdate
FROM events
"""
