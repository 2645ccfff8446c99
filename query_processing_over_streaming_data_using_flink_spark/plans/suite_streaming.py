"""Changelog / retraction semantics suite — the batch-expressible faces
of the streaming engine, oracle-checked against DuckDB.

Three registered queries:
  * changelog_build          — the generator itself (sliding-window
                               insert/delete event stream)
  * changelog_state_counts   — net live-row counts after consuming a
                               prefix of the stream
  * changelog_q3_current_state — Q3 on the stream's current state via
                               the signed-weight algebra

The *incremental* evaluation of the same semantics (micro-batch IVM
pipeline, `streaming/ivm.py`) is verified in tests/test_streaming.py by
stream-batch equivalence — the reference's own convergence criterion
(`README.md:154-159`).

Window/prefix parameters derive from the dataset size by integer
arithmetic so the suite scales with sf: W = ⌊2N/3⌋ (deletes begin while
inserts still flow), K = N + ⌊N/2⌋ (stream truncated mid-drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import (
    build_changelog,
    changelog_sql,
)
from query_processing_over_streaming_data_using_flink_spark.operators.relational import asof_join
from query_processing_over_streaming_data_using_flink_spark.streaming.retraction import q3_on_state
from query_processing_over_streaming_data_using_flink_spark.streaming.scd2 import (
    scd2_from_changelog,
    scd2_sql,
)

# SQL forms of the size-derived parameters (DuckDB `//` = floor div on
# positives, matching Python's // used on the Spark side).
_N_SQL = "((SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) + (SELECT count(*) FROM lineitem))"
_W_SQL = f"(({_N_SQL} * 2) // 3)"
_K_SQL = f"({_N_SQL} + {_N_SQL} // 2)"


def _totals(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

    n = sum(load_table(spark, sf_dir, t).count() for t in ("customer", "orders", "lineitem"))
    return (n * 2) // 3, n + n // 2


def changelog_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator output itself (reference:
    `StreamDataProcessor.py:122-260`): ratio-interleaved inserts +
    sliding-window deletes, truncated to the first K events to keep the
    comparison bounded."""
    w, k = _totals(spark, sf_dir)
    return build_changelog(spark, sf_dir, window=w, pin=False).filter(
        F.col("seq") <= k
    )


def changelog_state_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net state sizes after consuming the first K events — verifies
    insert/delete bookkeeping per relation."""
    w, k = _totals(spark, sf_dir)
    log = build_changelog(spark, sf_dir, window=w, pin=False).filter(
        F.col("seq") <= k
    )
    return log.groupBy("relation").agg(
        F.count("*").alias("n_events"),
        F.sum("op").alias("net_rows"),
        F.sum(F.when(F.col("op") == 1, 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == -1, 1).otherwise(0)).alias("n_deletes"),
    )


def changelog_windowed_churn_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-churn rendering of the sliding window: W = ⌊N/4⌋ (the
    reference's default window equals the whole dataset, so deletes
    only drain at the end — this variant makes inserts and deletes
    interleave from a quarter of the way in) with the stream truncated
    at K = N. Verifies the generator's delete timing under genuine
    churn: per relation, event/insert/delete counts, net live rows
    (= the window occupancy at K), and the churn ratio."""
    from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

    n = sum(
        load_table(spark, sf_dir, t).count() for t in ("customer", "orders", "lineitem")
    )
    log = build_changelog(spark, sf_dir, window=n // 4, pin=False).filter(
        F.col("seq") <= n
    )
    return log.groupBy("relation").agg(
        F.count("*").alias("n_events"),
        F.sum("op").alias("net_rows"),
        F.sum(F.when(F.col("op") == 1, 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == -1, 1).otherwise(0)).alias("n_deletes"),
        F.round(
            F.sum(F.when(F.col("op") == -1, 1).otherwise(0))
            / F.sum(F.when(F.col("op") == 1, 1).otherwise(0)),
            6,
        ).alias("churn_ratio"),
    )


def changelog_q3_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 over the surviving sliding window at event K — what the
    reference's dashboard shows mid-stream, computed by signed-weight
    retraction (SURVEY §7 milestone 2c)."""
    w, k = _totals(spark, sf_dir)
    log = build_changelog(spark, sf_dir, window=w).filter(F.col("seq") <= k)
    return q3_on_state(log)


def changelog_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals (`streaming/scd2.py`) for the customer
    dimension over the first K changelog events: one row per customer
    version with [valid_from, valid_to) in stream sequence numbers,
    NULL valid_to = still live at K. History the reference's
    current-state maps discard."""
    w, k = _totals(spark, sf_dir)
    log = build_changelog(spark, sf_dir, window=w, pin=False).filter(
        (F.col("seq") <= k) & (F.col("relation") == "customer")
    )
    return scd2_from_changelog(
        log.select("seq", "op", "custkey", "mktsegment"),
        ["custkey", "mktsegment"],
    )


def pit_orders_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join: each order-insert event is
    decorated with the customer dimension version that was live AT THE
    ORDER'S STREAM POSITION — never a later one (no feature leakage),
    never an already-deleted one. Latest-valid lookup runs on the as-of
    union-trick plan (`operators/relational.py:asof_join`, one shuffle,
    no interval explosion); dead-at-that-moment matches are nulled by
    the `valid_to` check afterwards. The oracle states the same thing
    directly as a disjoint-interval join."""
    w, k = _totals(spark, sf_dir)
    log = build_changelog(spark, sf_dir, window=w).filter(F.col("seq") <= k)
    versions = scd2_from_changelog(
        log.filter(F.col("relation") == "customer").select(
            "seq", "op", "custkey", "mktsegment"
        ),
        ["custkey", "mktsegment"],
    )
    order_ev = log.filter(
        (F.col("relation") == "orders") & (F.col("op") == 1)
    ).select(
        F.col("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("seq"),
    )
    joined = asof_join(
        order_ev,
        versions,
        on="custkey",
        left_ts="seq",
        right_ts="valid_from",
        payload=["mktsegment", "valid_to"],
        tiebreak="valid_from",
    )
    covered = F.col("asof_valid_to").isNull() | (F.col("asof_valid_to") > F.col("seq"))
    return joined.select(
        "orderkey",
        "custkey",
        F.col("seq").alias("order_seq"),
        F.when(covered, F.col("asof_mktsegment")).alias("mktsegment_at_order"),
    )


def _events_prefix_sql() -> str:
    return f"SELECT * FROM ({changelog_sql(window=_W_SQL)}) WHERE seq <= {_K_SQL}"


register(
    "changelog_build",
    changelog_build,
    _events_prefix_sql(),
)

register(
    "changelog_state_counts",
    changelog_state_counts,
    f"""
    SELECT relation, count(*) AS n_events,
           CAST(sum(op) AS BIGINT) AS net_rows,
           CAST(sum(CASE WHEN op = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
           CAST(sum(CASE WHEN op = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
    FROM ({_events_prefix_sql()})
    GROUP BY relation
    """,
)

register(
    "changelog_windowed_churn_state",
    changelog_windowed_churn_state,
    f"""
    SELECT relation, count(*) AS n_events,
           CAST(sum(op) AS BIGINT) AS net_rows,
           CAST(sum(CASE WHEN op = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
           CAST(sum(CASE WHEN op = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
           round(sum(CASE WHEN op = -1 THEN 1 ELSE 0 END)
                 / sum(CASE WHEN op = 1 THEN 1 ELSE 0 END), 6) AS churn_ratio
    FROM ({changelog_sql(window=f"({_N_SQL} // 4)")}) WHERE seq <= {_N_SQL}
    GROUP BY relation
    """,
)

register(
    "changelog_q3_current_state",
    changelog_q3_current_state,
    f"""
    WITH events AS ({_events_prefix_sql()}),
    cust_state AS (
      SELECT custkey, sum(op) AS w_c FROM events
      WHERE relation = 'customer' AND mktsegment = 'BUILDING'
      GROUP BY custkey, mktsegment HAVING sum(op) > 0
    ),
    ord_state AS (
      SELECT orderkey, o_custkey, orderdate, sum(op) AS w_o FROM events
      WHERE relation = 'orders' AND orderdate < TIMESTAMP '1995-03-15'
      GROUP BY orderkey, o_custkey, orderdate HAVING sum(op) > 0
    ),
    li_state AS (
      SELECT orderkey, linenumber, extendedprice, discount, sum(op) AS w_l
      FROM events
      WHERE relation = 'lineitem' AND shipdate > TIMESTAMP '1995-03-15'
      GROUP BY orderkey, linenumber, extendedprice, discount, shipdate
      HAVING sum(op) > 0
    )
    SELECT li.orderkey AS l_orderkey,
           CAST(sum(w_c * w_o * w_l *
                    CAST(round(extendedprice * (1 - discount) * 10000) AS BIGINT))
                AS BIGINT) / 10000.0 AS revenue,
           o.orderdate AS o_orderdate,
           0 AS o_shippriority
    FROM cust_state c
    JOIN ord_state o ON c.custkey = o.o_custkey
    JOIN li_state li ON li.orderkey = o.orderkey
    GROUP BY li.orderkey, o.orderdate
    HAVING revenue > 0
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 20
    """,
)

register(
    "changelog_scd2_customer",
    changelog_scd2_customer,
    scd2_sql(
        f"SELECT seq, op, custkey, mktsegment FROM ({_events_prefix_sql()}) "
        "WHERE relation = 'customer'",
        ["custkey", "mktsegment"],
    ),
)

_SCD2_CUSTOMER_SQL = scd2_sql(
    f"SELECT seq, op, custkey, mktsegment FROM ({_events_prefix_sql()}) "
    "WHERE relation = 'customer'",
    ["custkey", "mktsegment"],
)

register(
    "pit_orders_customer_segment",
    pit_orders_customer_segment,
    f"""
    WITH versions AS ({_SCD2_CUSTOMER_SQL}),
    order_ev AS (
      SELECT orderkey, o_custkey AS custkey, seq
      FROM ({_events_prefix_sql()})
      WHERE relation = 'orders' AND op = 1
    )
    SELECT o.orderkey, o.custkey, o.seq AS order_seq,
           v.mktsegment AS mktsegment_at_order
    FROM order_ev o
    LEFT JOIN versions v
      ON v.custkey = o.custkey
     AND v.valid_from <= o.seq
     AND (v.valid_to IS NULL OR v.valid_to > o.seq)
    """,
)


def changelog_monthly_revenue_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous monthly-revenue rollup's CURRENT VIEW at event K
    — the batch rendering of `streaming/incragg.py`'s incrementally
    maintained aggregate (`Δagg(R) = agg(ΔR)`: linearity makes the
    batch fold and the micro-batched maintenance provably identical;
    the equivalence is also tested stream-vs-batch). Money is
    fixed-point quantized before summation, so any batching or engine
    produces bit-identical cents."""
    from query_processing_over_streaming_data_using_flink_spark.streaming.incragg import (
        monthly_revenue_delta,
        present_monthly_revenue,
    )

    w, k = _totals(spark, sf_dir)
    log = build_changelog(spark, sf_dir, window=w, pin=False).filter(
        F.col("seq") <= k
    )
    return present_monthly_revenue(monthly_revenue_delta(log))


register(
    "changelog_monthly_revenue_state",
    changelog_monthly_revenue_state,
    f"""
    WITH events AS ({_events_prefix_sql()})
    SELECT CAST(date_trunc('month', shipdate) AS DATE) AS ship_month,
           CAST(sum(op) AS BIGINT) AS net_lines,
           CAST(sum(op * CAST(round(extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS gross_revenue,
           CAST(sum(op * CAST(round(extendedprice * (1 - discount) * 10000) AS BIGINT)) AS BIGINT)
             / 10000.0 AS disc_revenue
    FROM events
    WHERE relation = 'lineitem'
    GROUP BY date_trunc('month', shipdate)
    HAVING sum(op) > 0
    """,
)
