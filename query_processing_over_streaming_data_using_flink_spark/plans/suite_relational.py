"""Relational operator micro-suite — one oracle-checked query per
operator class from SURVEY.md §2 (scans, filters, projections, joins,
aggregations, sort/limit, window functions, set ops, scalar functions),
generalized beyond the reference's single Q3 to the full driver star
schema.

Every query here is a pure DataFrame composition (JVM-side, codegen'd)
with a DuckDB oracle. Determinism rules shared with the oracle side:
  - computed columns aliased identically in Spark and SQL,
  - fixed-point (money/quantity) SUM/AVG via the exact quantized form
    (`functions.scalar.exact_sum` — testdata uses double, SURVEY §7
    hard-part 4; float sums are order-dependent across engines),
  - free-form doubles (events.value) are quantized to cents at the
    input, making their aggregates exact as well,
  - per-row products rounded at 4dp (inputs have ≤4 true decimals, so
    no value sits on a rounding boundary),
  - every LIMIT preceded by a total-order ORDER BY (unique tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import (
    exact_avg,
    exact_sum,
    exact_sum_sql,
    revenue,
    ts_lit,
)
from query_processing_over_streaming_data_using_flink_spark.operators.relational import (
    asof_join,
    blocked_fuzzy_pairs,
    equi_join,
    latest_per_key,
    merge_upsert,
    snapshot_diff,
    top_k,
    top_k_per_group,
)
from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


# --- §2.2 projections / filters / predicates --------------------------------


def filter_project_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate + projection (reference: CustomerFilter,
    `TPCHQuery3_StreamProcessor.java:347-355`; parse-time projection
    `:313-316`). Catalyst pushes both into the parquet scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def filter_dates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicates (reference: OrderFilter/LineItemFilter,
    `TPCHQuery3_StreamProcessor.java:357-387`) plus conjunction."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= ts_lit("1995-01-01"))
            & (F.col("o_orderdate") < ts_lit("1995-03-15"))
            & (F.col("o_orderstatus") != "F")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


# --- §2.3 joins ---------------------------------------------------------------


def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders equi-join keyed by custkey (reference:
    CustomerOrderJoinFunction, `TPCHQuery3_StreamProcessor.java:390-449`,
    batch semantics)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return equi_join(c, o, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_orderdate", "o_totalprice"
    )


def join_orders_lineitem_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem keyed by orderkey with the revenue expression
    (reference: OrderLineItemJoinFunction,
    `TPCHQuery3_StreamProcessor.java:451-513`)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return equi_join(o, li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "l_linenumber",
        "o_orderdate",
        F.round(revenue(), 4).alias("line_revenue"),
    )


def join_snowflake_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈nation⋈region snowflake rollup — broadcast-joins the
    constant-size dims (no reference counterpart table-wise; operator
    class = the same equi-join). At 100 TB nation/region must never be
    the build side of a shuffle join — hence explicit broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        equi_join(c, n, F.col("c_nationkey") == F.col("n_nationkey"), broadcast_right=True)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum(F.col("c_acctbal"), 100).alias("total_acctbal"),
        )
    )


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (EXISTS / NOT EXISTS): customers with
    at least one 'O'-status order but no 'F'-status order. Operator
    class beyond the reference's inner joins; required engine surface."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O")
    filled_o = o.filter(F.col("o_orderstatus") == "F")
    return (
        c.join(open_o, F.col("c_custkey") == open_o["o_custkey"], "left_semi")
        .join(filled_o, F.col("c_custkey") == filled_o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + count (customers with zero orders kept) —
    outer-join surface the reference lacks (SURVEY §2.3 'no other join
    kinds')."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --- §2.4 aggregations ---------------------------------------------------------


def agg_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregate on the events stream table: count / sum /
    avg / min / max (reference operator class:
    `TPCHQuery3SQL_Batch.java:102,112-115`). sum/avg are over the
    cent-quantized value (exact across engines); min/max are raw
    (no arithmetic → bit-identical)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 100).alias("sum_value"),
            exact_avg(F.col("value"), 100).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def agg_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregate (tumbling day) — the batch shape of a
    streaming windowed agg. Truncation via to_date on the NTZ column
    (date_trunc would round-trip through the session timezone)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.to_date(F.col("ts")).cast("timestamp_ntz").alias("day"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), 100).alias("sum_value"))
    )


def agg_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the classic multi-aggregate
    groupBy; exercises map-side partial aggregation at scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= ts_lit("1998-09-02")
    )
    disc_price = revenue()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum(F.col("l_quantity"), 100).alias("sum_qty"),
        exact_sum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
        exact_sum(disc_price, 10000).alias("sum_disc_price"),
        exact_sum(charge, 1000000).alias("sum_charge"),
        exact_avg(F.col("l_quantity"), 100).alias("avg_qty"),
        exact_avg(F.col("l_extendedprice"), 100).alias("avg_price"),
        exact_avg(F.col("l_discount"), 100).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def agg_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all grouping-set
    combinations (absent from the reference, SURVEY §2.4)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), exact_sum(F.col("l_quantity"), 100).alias("sum_qty"))
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split at >30-minute gaps —
    lag() to detect gaps, running sum of gap flags as the session id,
    then per-session aggregates. The batch form of streaming
    session_window (SURVEY §2.9: reference has no session semantics)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # tz-independent epoch seconds (ts is TIMESTAMP_NTZ; a direct long
    # cast is unsupported and a via-ltz cast would depend on session tz)
    secs = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    gap = F.when(secs - F.lag(secs, 1).over(w) > 1800, 1).otherwise(0)
    sessions = (
        load_table(spark, sf_dir, "events")
        .withColumn("new_session", gap)
        .withColumn(
            "session_no",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        exact_sum(F.col("value"), 100).alias("session_value"),
    )


def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchical aggregate (orderstatus → orderpriority) —
    grouping-set surface absent from the reference (SURVEY §2.4)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), exact_sum(F.col("o_totalprice"), 100).alias("sum_price"))
    )


# --- §2.5 sort / limit / top-k -------------------------------------------------


def agg_median_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (order-statistics aggregate) — Spark's
    percentile() matches DuckDB's quantile_cont bit-for-bit on doubles."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median"),
            F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
            F.count("*").alias("n_orders"),
        )
    )


def agg_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-type, per-user,
    and grand-total aggregates in one pass."""
    from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table as _lt

    _lt(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id, count(*) AS n,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (reference: ORDER BY ... LIMIT 20 / TopNFunction).
    Plans as TakeOrderedAndProject — bounded heaps, no global sort."""
    return top_k(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        15,
    )


def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment — row_number window top-k, the
    correct form of the reference's 'latest per key then rank'
    (SURVEY §2.5 staleness-bug note)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = equi_join(o, c, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        joined,
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
        rank_col="rank_in_segment",
        keep_rank=True,
    )


# --- §2.6 window functions -----------------------------------------------------


def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame: per-customer running order total + lag —
    window-function surface the reference lacks (SURVEY §2.6 'none')."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            (
                F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)) / F.lit(100.0)
            ).alias("running_total"),
            F.row_number().over(w).alias("order_seq"),
            F.lag("o_totalprice", 1, 0.0).over(w).alias("prev_price"),
        )
    )


# --- §2.7 set operations --------------------------------------------------------


def set_ops_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over key sets (reference has none —
    SURVEY §2.7; the stream split/merge maps to filter+union)."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    recent = o.filter(F.col("o_orderdate") >= ts_lit("1997-01-01")).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return hi.intersect(recent).union(urgent.exceptAll(hi).distinct()).distinct()


# --- §2.8 scalar functions -----------------------------------------------------


def scalar_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar-function surface in one projection:
    arithmetic revenue (`TPCHQuery3SQL_Batch.java:102`), date
    compare/extract (`TPCHQuery3_BatchProcessor.java:164-170`), string
    substring/split/concat (`TPCHQuery3_StreamProcessor.java:306-307`),
    numeric cast, CASE, and JSON construction (`:1036-1052`)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(revenue(), 4).alias("line_revenue"),
        (F.col("l_shipdate") > ts_lit("1995-03-15")).cast("int").alias("ships_after_cutoff"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.substring("l_returnflag", 1, 1).alias("flag_initial"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.split(F.concat_ws("-", "l_returnflag", "l_linestatus"), "-").getItem(1).alias("status_part"),
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.when(F.col("l_discount") >= 0.05, "HIGH").otherwise("LOW").alias("discount_band"),
        F.length("l_comment").alias("comment_len") if "l_comment" in li.columns else F.lit(None).cast("int").alias("comment_len"),
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props payload — maps the
    reference's string-built JSON sink format
    (`TPCHQuery3_StreamProcessor.java:1036-1052`) to a proper JSON
    function surface."""
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k") > 90)
    )


def events_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON construction — the reference builds its sink payloads by
    string concatenation (`TPCHQuery3_StreamProcessor.java:1036-1052`);
    the engine surface is to_json(struct(...)), byte-identical to
    DuckDB's to_json for int/string fields."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.to_json(F.struct("event_id", "event_type", "user_id")).alias("payload"),
        )
    )


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event_type holding per-user counts —
    reshaping surface (conditional aggregation at the oracle)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


# --- registration ---------------------------------------------------------------

register(
    "filter_project_customer",
    filter_project_customer,
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)

register(
    "filter_dates_orders",
    filter_dates_orders,
    """
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND o_orderstatus <> 'F'
    """,
)

register(
    "join_customer_orders",
    join_customer_orders,
    """
    SELECT c_custkey, c_mktsegment, o_orderkey, o_orderdate, o_totalprice
    FROM customer JOIN orders ON c_custkey = o_custkey
    """,
)

register(
    "join_orders_lineitem_revenue",
    join_orders_lineitem_revenue,
    """
    SELECT o_orderkey, l_linenumber, o_orderdate,
           round(l_extendedprice * (1 - l_discount), 4) AS line_revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)

register(
    "join_snowflake_dims",
    join_snowflake_dims,
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)

register(
    "join_semi_anti",
    join_semi_anti,
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)

register(
    "join_outer_order_counts",
    join_outer_order_counts,
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)

register(
    "agg_events_by_type",
    agg_events_by_type,
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / (100.0 * count(*)) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)

register(
    "agg_events_daily",
    agg_events_daily,
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)

register(
    "agg_lineitem_pricing_summary",
    agg_lineitem_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_charge,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / (100.0 * count(*)) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / (100.0 * count(*)) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / (100.0 * count(*)) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

register(
    "agg_cube_lineitem",
    agg_cube_lineitem,
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_items,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

register(
    "sessionize_events",
    sessionize_events,
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no, count(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
    FROM sessions GROUP BY user_id, session_no
    """,
)

register(
    "agg_rollup_orders",
    agg_rollup_orders,
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)

register(
    "agg_median_order_price",
    agg_median_order_price,
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS median,
           quantile_cont(o_totalprice, 0.75) AS p75,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)

register(
    "agg_grouping_sets_events",
    agg_grouping_sets_events,
    """
    SELECT event_type, user_id, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
)

register(
    "topk_orders",
    topk_orders,
    """
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)

register(
    "topk_orders_per_segment",
    topk_orders_per_segment,
    """
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_segment
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rank_in_segment <= 3
    """,
)

register(
    "window_running_totals",
    window_running_totals,
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS running_total,
           row_number() OVER w AS order_seq,
           coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)

register(
    "set_ops_active_keys",
    set_ops_active_keys,
    """
    SELECT DISTINCT custkey FROM (
      SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      )
      UNION
      SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      )
    )
    """,
)

register(
    "scalar_expressions",
    scalar_expressions,
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS line_revenue,
           CAST(l_shipdate > TIMESTAMP '1995-03-15' AS INT) AS ships_after_cutoff,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           substr(l_returnflag, 1, 1) AS flag_initial,
           l_returnflag || '-' || l_linestatus AS flag_status,
           string_split(l_returnflag || '-' || l_linestatus, '-')[2] AS status_part,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CASE WHEN l_discount >= 0.05 THEN 'HIGH' ELSE 'LOW' END AS discount_band,
           CAST(NULL AS INT) AS comment_len
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)

register(
    "events_json_extract",
    events_json_extract,
    """
    SELECT event_id, event_type, CAST(props ->> '$.k' AS INT) AS k
    FROM events WHERE CAST(props ->> '$.k' AS INT) > 90
    """,
)

register(
    "events_to_json",
    events_to_json,
    """
    SELECT event_id,
           CAST(to_json(struct_pack(event_id := event_id,
                                    event_type := event_type,
                                    user_id := user_id)) AS VARCHAR) AS payload
    FROM events WHERE event_type = 'purchase'
    """,
)

register(
    "pivot_event_counts",
    pivot_event_counts,
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)


def join_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each click event picks up the latest
    prior purchase by the same user — the point-in-time-correct
    feature-lookup pattern. Union-trick plan: one shuffle, no range
    explosion (`operators/relational.py:asof_join`; oracle = DuckDB
    LATERAL top-1, the O(n²) spec form)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "value"],
        tiebreak="event_id",
    ).select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("last_purchase_id"),
        F.col("asof_value").alias("last_purchase_value"),
    )


def join_range_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range join: orders against a price-tier dimension on
    `lo <= o_totalprice < hi`. The tier dim is tiny → broadcast
    nested-loop is the *correct* plan (k rows × n, k≈4); at no scale
    does this shuffle the fact table."""
    tiers = spark.createDataFrame(
        [
            ("budget", 0.0, 50_000.0),
            ("mid", 50_000.0, 150_000.0),
            ("high", 150_000.0, 300_000.0),
            ("premium", 300_000.0, 600_000.0),
        ],
        "tier string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(tiers),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_orders"),
        exact_sum(F.col("o_totalprice"), 100).alias("sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


register(
    "join_asof_purchase",
    join_asof_purchase,
    """
    SELECT c.event_id, c.user_id,
           p.event_id AS last_purchase_id, p.value AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN LATERAL (
        SELECT event_id, value FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts <= c.ts
        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
    ) p ON TRUE
    """,
)

register(
    "join_range_price_tiers",
    join_range_price_tiers,
    f"""
    WITH tiers(tier, lo, hi) AS (VALUES
        ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
        ('high', 150000.0, 300000.0), ('premium', 300000.0, 600000.0))
    SELECT tier, count(*) AS n_orders,
           {exact_sum_sql('o_totalprice', 100)} AS sum_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
    """,
)


_Q17_SQL = """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0e0 / 7.0e0
           AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity threshold). One SQL string runs on BOTH engines: Spark
    exercises Catalyst's subquery decorrelation (rewrites the
    correlation into an aggregate + join — the scale-correct plan,
    never a per-row probe), DuckDB is the oracle. Revenue sum is
    cent-quantized (exact_sum form) for cross-engine determinism."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_Q17_SQL)


def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: hourly event counts per type over the
    complete hour spine (gaps -> 0) with forward-filled average value —
    the gap-fill/ffill primitive of monitoring and feature pipelines.

    The spine is generated (sequence over the observed bounds), the
    type dim is broadcast (tiny × tiny grid), counts left-join in, and
    the forward fill is one last(ignorenulls) window per type — a
    single shuffle on event_type at any scale."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.date_trunc("hour", F.col("ts"))
    )
    bounds = ev.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy("hr", "event_type").agg(
        F.count("*").alias("n"), exact_avg(F.col("value"), 100).alias("av")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(agg, ["hr", "event_type"], "left")
        .select(
            "hr",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.last(F.col("av"), ignorenulls=True).over(w).alias("avg_value_ffill"),
        )
    )


register("q17_small_quantity_revenue", q17_small_quantity_revenue, _Q17_SQL)

register(
    "resample_gap_fill",
    resample_gap_fill,
    """
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
               FROM events),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     / (100.0 * count(*)) AS av
            FROM events GROUP BY 1, 2)
    SELECT s.hr, t.event_type, coalesce(a.n, 0) AS n,
           last_value(a.av IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_ffill
    FROM spine s CROSS JOIN types t
    LEFT JOIN agg a ON a.hr = s.hr AND a.event_type = t.event_type
    """,
)


def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per day, how many clicks convert to a
    purchase by the same user within 1 hour. The scalable shape is a
    forward-looking window (min purchase-ts over the following rows
    per user) — one shuffle on user_id, no self-join row explosion;
    the oracle states the same thing as the O(n²) EXISTS spec."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    next_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    clicks = (
        ev.withColumn("np", next_purchase)
        .filter(F.col("event_type") == "click")
        .withColumn(
            "converted",
            (F.col("np").isNotNull())
            & (F.col("np") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        )
    )
    return clicks.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_clicks"),
        F.sum(F.col("converted").cast("int")).alias("n_converted"),
        F.round(F.sum(F.col("converted").cast("int")) / F.count(F.lit(1)), 6).alias(
            "conversion_rate"
        ),
    )


register(
    "funnel_click_to_purchase",
    funnel_click_to_purchase,
    """
    WITH c AS (
      SELECT e.ts, e.user_id,
             EXISTS (SELECT 1 FROM events p
                     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                       AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR)
             AS converted
      FROM events e WHERE e.event_type = 'click'
    )
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks,
           CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(round(sum(CASE WHEN converted THEN 1 ELSE 0 END) / count(*), 6)
             AS DOUBLE) AS conversion_rate
    FROM c GROUP BY 1
    """,
)


def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert-stream compaction over the events table: the latest
    record per user under the total order (ts, event_id) — log
    compaction / latest-wins materialization
    (`operators/relational.py:latest_per_key`). One shuffle keyed by
    user_id; at 100 TB this is the standard "current state of every
    entity" reduction of an event log."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


register(
    "cdc_latest_per_key",
    cdc_latest_per_key,
    """
    SELECT user_id,
           event_id AS last_event_id,
           ts AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: foreign-key orphan counts across the star
    schema (orders→customer, lineitem→orders, customer→nation,
    events→customer-as-user). Each check is a LEFT ANTI join — at scale
    the dim side broadcasts (nation) or the fact side shuffles once on
    its key; no row data ever reaches the driver, just one count per
    relationship."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    ev = load_table(spark, sf_dir, "events")

    def orphans(name, fact, dim, fk, pk):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(
                F.lit(name).alias("relationship"),
                "n_orphans",
            )
        )

    return (
        orphans("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionByName(orphans("lineitem->orders", li, o, "l_orderkey", "o_orderkey"))
        .unionByName(orphans("customer->nation", c, n, "c_nationkey", "n_nationkey"))
        .unionByName(orphans("events->customer", ev, c, "user_id", "c_custkey"))
    )


register(
    "dq_referential_integrity",
    dq_referential_integrity,
    """
    SELECT 'orders->customer' AS relationship,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'events->customer',
           (SELECT count(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
    """,
)


def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of orders in ONE scan: per column a
    row of (non-null count, distinct estimate as exact here, min/max as
    strings). The one-pass profile is the standard pre-ingest audit —
    every statistic is an ordinary aggregate with map-side partials, so
    the whole profile costs a single reduce at any scale."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col, typ):
        return o.agg(
            F.lit(col).alias("column"),
            F.lit(typ).alias("dtype"),
            F.count(col).alias("n_non_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )

    return (
        prof("o_orderkey", "bigint")
        .unionByName(prof("o_custkey", "bigint"))
        .unionByName(prof("o_orderstatus", "string"))
        .unionByName(prof("o_totalprice", "double"))
        .unionByName(prof("o_orderpriority", "string"))
    )


register(
    "dq_profile_orders",
    dq_profile_orders,
    """
    SELECT 'o_orderkey' AS column, 'bigint' AS dtype,
           count(o_orderkey) AS n_non_null, count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value, CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', 'bigint', count(o_custkey), count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', 'string', count(o_orderstatus), count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_totalprice', 'double', count(o_totalprice), count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'string', count(o_orderpriority), count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders
    """,
)


def clean_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier winsorization: clip events.value to the per-type
    [p01, p99] band. The per-group percentile table is tiny (one row
    per event type) and broadcasts back onto the fact scan — one
    aggregate plus a broadcast join, never a fact-table re-shuffle.
    Spark's percentile() is bit-identical to DuckDB's quantile_cont on
    doubles (proven by agg_median_order_price), so the clip bounds —
    and therefore every clipped value — match exactly."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")), 6).alias(
                "value_winsorized"
            ),
            (F.col("value") < F.col("p01")).alias("clipped_low"),
            (F.col("value") > F.col("p99")).alias("clipped_high"),
        )
    )


register(
    "clean_winsorize_values",
    clean_winsorize_values,
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           round(least(greatest(value, p01), p99), 6) AS value_winsorized,
           value < p01 AS clipped_low,
           value > p99 AS clipped_high
    FROM events e JOIN bounds USING (event_type)
    """,
)


def unpivot_lineitem_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (UNPIVOT): each lineitem's money-ish measures
    (extendedprice, discount, tax) become (measure, amount) rows —
    the normalization step feeding generic per-measure aggregates.
    `unpivot` is pure row expansion (a Generate node): map-side only,
    zero shuffles, so the melt itself is free at any scale; the
    aggregate after it is one ordinary reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("amount"), 6).alias("min_amount"),
            F.round(F.max("amount"), 6).alias("max_amount"),
            (F.sum(F.round(F.col("amount") * 10000, 0).cast("long")).cast("bigint")
             / F.lit(10000.0)).alias("sum_amount"),
        )
    )


register(
    "unpivot_lineitem_amounts",
    unpivot_lineitem_amounts,
    """
    WITH long AS (
      SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, count(*) AS n,
           round(min(amount), 6) AS min_amount,
           round(max(amount), 6) AS max_amount,
           CAST(sum(CAST(round(amount * 10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_amount
    FROM long GROUP BY measure
    """,
)


def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregates: one pass over orders
    computing per-priority totals alongside status-sliced counts and a
    high-value-order share — the many-metrics-one-scan pattern that
    replaces N separate filtered scans with a single reduce."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_orderstatus") == "P").alias("n_pending"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_high_value"),
        F.round(
            F.count_if(F.col("o_totalprice") > 200000) / F.count("*"), 6
        ).alias("high_value_share"),
    )


register(
    "agg_filtered_counts",
    agg_filtered_counts,
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_high_value,
           round(count(*) FILTER (WHERE o_totalprice > 200000) / count(*), 6) AS high_value_share
    FROM orders GROUP BY o_orderpriority
    """,
)


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in the
    same order, with support counts (min support 2), top 100 by
    support. The pair generation is a self-equi-join keyed by orderkey
    — per-order line counts are small and bounded, so the blow-up is
    sum(k_i choose 2), linear-ish in orders at any corpus size; the
    support aggregate is one shuffle on the pair. The frequent-itemset
    counting primitive."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(100)
    )


register(
    "basket_part_pairs",
    basket_part_pairs,
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY support DESC, part_a, part_b
    LIMIT 100
    """,
)


def orders_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: cumulative orders placed minus
    orders fully shipped, per day — the event-sourcing balance curve
    (how much WIP exists at each date). Per-day net deltas aggregate
    with map-side partials; the running sum's window spans only the
    DISTINCT DAYS (bounded regardless of corpus size), so the
    single-partition cumulative scan is over thousands of rows at any
    scale, never the fact table."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opens = o.select(F.to_date("o_orderdate").alias("day")).groupBy("day").agg(
        F.count("*").alias("opened")
    )
    closes = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("closed"))
    )
    net = (
        opens.join(closes, "day", "full")
        .select(
            "day",
            F.coalesce(F.col("opened"), F.lit(0)).alias("opened"),
            F.coalesce(F.col("closed"), F.lit(0)).alias("closed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return net.select(
        "day",
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).alias("backlog"),
    )


register(
    "orders_backlog_curve",
    orders_backlog_curve,
    """
    WITH opens AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS opened
      FROM orders GROUP BY 1
    ),
    closes AS (
      SELECT day, count(*) AS closed FROM (
        SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS day
        FROM lineitem GROUP BY l_orderkey
      ) GROUP BY day
    ),
    net AS (
      SELECT day,
             coalesce(opened, 0) AS opened,
             coalesce(closed, 0) AS closed
      FROM opens FULL JOIN closes USING (day)
    )
    SELECT day, opened, closed,
           CAST(sum(opened - closed) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
    FROM net
    """,
)


def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates done DETERMINISTICALLY: per-returnflag
    Pearson correlation and least-squares slope/intercept of
    l_extendedprice on l_quantity, computed from EXACT integer moment
    sums (values quantized to cents, Σx/Σy/Σxy/Σx²/Σy² accumulated as
    decimal(38,0) — associative, bit-identical under any partitioning)
    and combined in one fixed double expression at the end. The
    built-in `corr`/`regr_slope` aggregates are order-dependent float
    folds that can differ across engines and even across runs — the
    moment rendering is how a 1000-executor job gets a reproducible
    answer. One map-side-partial hash aggregate; no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    qx = F.floor(F.col("l_quantity") * 100).cast("decimal(38,0)")
    qy = F.floor(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(qx).cast("double").alias("sx"),
        F.sum(qy).cast("double").alias("sy"),
        F.sum(qx * qx).cast("double").alias("sxx"),
        F.sum(qy * qy).cast("double").alias("syy"),
        F.sum(qx * qy).cast("double").alias("sxy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        # slope/intercept are in cents per cent == price units per
        # quantity unit, so no de-quantization factor is needed for the
        # slope; the intercept converts back to price units (/100).
        F.round(slope, 6).alias("slope_cents"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n") / 100.0, 6).alias(
            "intercept_price"
        ),
    )


_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT) * CAST(floor(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT) * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy,
         CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT) * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n / 100.0, 6) AS intercept_price
FROM m
"""

register("agg_corr_regression", agg_corr_regression, _CORR_SQL)


# ---------------------------------------------------------------------------
# Round 8: table-maintenance operators — MERGE upsert, snapshot diff,
# blocked fuzzy entity resolution.
# ---------------------------------------------------------------------------


def _customer_cdc_source(cust: DataFrame) -> DataFrame:
    """Deterministic CDC batch over the customer snapshot: updates for
    custkey ≡ 0 (mod 10), deletes for ≡ 3 (mod 10), and brand-new rows
    (custkey + 10M) for ≡ 7 (mod 100) — the three MERGE arms."""
    upd = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(100.5))
        .withColumn("c_mktsegment", F.lit("UPDATED"))
        .withColumn("is_delete", F.lit(False))
    )
    dele = cust.filter(F.col("c_custkey") % 10 == 3).withColumn(
        "is_delete", F.lit(True)
    )
    ins = cust.filter(F.col("c_custkey") % 100 == 7).select(
        (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
        F.concat(F.lit("Customer#NEW"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(False).alias("is_delete"),
    )
    return upd.unionByName(dele).unionByName(ins)


def merge_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO over the customer snapshot: one deterministic CDC
    batch carrying updates, deletes, and inserts is applied with
    `operators.relational.merge_upsert` (full-outer join on the key +
    per-column source-preference projection — the Delta/Iceberg MERGE
    plan shape: one key shuffle, linear in |target| + |source|).
    Returns the complete post-merge snapshot."""
    cust = load_table(spark, sf_dir, "customer")
    merged = merge_upsert(
        cust, _customer_cdc_source(cust), keys=["c_custkey"], delete_col="is_delete"
    )
    return merged.select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


_MERGE_SRC_SQL = """
src AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.5 AS c_acctbal,
         'UPDATED' AS c_mktsegment, false AS is_delete
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, true
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey + 10000000, 'Customer#NEW' || CAST(c_custkey AS VARCHAR),
         c_nationkey, 0.0, 'NEWSEG', false
  FROM customer WHERE c_custkey % 100 = 7
)
"""

# The merge oracle: full outer join on the key, source side wins.
_MERGE_SQL = f"""
WITH {_MERGE_SRC_SQL.strip()}
SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN s.is_delete IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
       CASE WHEN s.is_delete IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
       CASE WHEN s.is_delete IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
       CASE WHEN s.is_delete IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
WHERE s.is_delete IS NULL OR NOT s.is_delete
"""

register("merge_upsert_customer", merge_upsert_customer, _MERGE_SQL)


def snapshot_diff_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between the pre- and post-merge customer snapshots
    (`operators.relational.snapshot_diff`) — the audit face of MERGE:
    applying the diff to the old snapshot reproduces the new one.
    Every CDC arm must surface: updates, deletes, inserts; unchanged
    rows must NOT appear."""
    cust = load_table(spark, sf_dir, "customer")
    merged = merge_upsert(
        cust, _customer_cdc_source(cust), keys=["c_custkey"], delete_col="is_delete"
    )
    return snapshot_diff(cust, merged, keys=["c_custkey"])


_DIFF_SQL = f"""
WITH {_MERGE_SRC_SQL.strip()},
new_snap AS (
  SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
         CASE WHEN s.is_delete IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
         CASE WHEN s.is_delete IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
         CASE WHEN s.is_delete IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
         CASE WHEN s.is_delete IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
  FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
  WHERE s.is_delete IS NULL OR NOT s.is_delete
)
SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS change
FROM customer o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR NOT (o.c_name IS NOT DISTINCT FROM n.c_name
           AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
           AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
           AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
"""

register("snapshot_diff_customer", snapshot_diff_customer, _DIFF_SQL)


ER_MAX_DISTANCE = 3


def er_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over part names: distinct
    names blocked on their noun (second token), paired when the
    Levenshtein distance ≤ 3 — the record-linkage blocking pattern
    ('red gear' ~ 'tan gear', but never compared against 'ring' rows).
    The quadratic comparison runs only inside a block; the name table
    is vocabulary-bounded regardless of corpus row count."""
    part = load_table(spark, sf_dir, "part")
    # coalesce to '' for one-word names: DuckDB's split_part returns ''
    # out of range while Spark's getItem(1) returns NULL, and NULL
    # blocks would silently never join — '' keeps both engines (and
    # one-word names) comparable.
    return blocked_fuzzy_pairs(
        part,
        "p_name",
        F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")),
        max_distance=ER_MAX_DISTANCE,
    )


_ER_SQL = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name, split_part(p_name, ' ', 2) AS block FROM part
)
SELECT a.name AS name_a, b.name AS name_b, a.block AS block,
       levenshtein(a.name, b.name) AS distance
FROM names a JOIN names b USING (block)
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= {ER_MAX_DISTANCE}
"""

register("er_fuzzy_part_names", er_fuzzy_part_names, _ER_SQL)
