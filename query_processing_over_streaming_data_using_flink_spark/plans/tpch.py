"""TPC-H-style end-to-end plans over the catalog tables.

Flagship = TPC-H Q3 "Shipping Priority", the one query the reference
implements five ways (canonical SQL:
`/root/reference/src/main/java/org/example/TPCHQuery3SQL_Batch.java:100-119`).

Scale notes (100 TB stance):
- customer is the smallest side after its segment filter; orders after
  its date filter is next. Catalyst+AQE broadcast them when they fit;
  the join order (customer⋈orders first, lineitem last) matches both
  the reference's hand-built plan and what CBO picks.
- The final ORDER BY ... LIMIT 20 plans as TakeOrderedAndProject — a
  per-partition top-k + driver merge of 20-row heaps, NOT a global
  sort. That is the scalable form of the reference's single-task TopN
  (`TPCHQuery3_StreamProcessor.java:983-1062`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import exact_sum, revenue, ts_lit
from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

Q3_CUTOFF = "1995-03-15"
Q3_SEGMENT = "BUILDING"


def q3_shipping_priority(
    spark: SparkSession,
    sf_dir: str,
    segment: str = Q3_SEGMENT,
    cutoff: str = Q3_CUTOFF,
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q3 over the driver tables.

    Driver `orders` lacks `o_shippriority` (FIXTURES.md §B), so the
    reference's GROUP BY (l_orderkey, o_orderdate, o_shippriority)
    degrades to (l_orderkey, o_orderdate) with a constant-0 priority
    column preserving the output shape. Revenue uses the exact
    fixed-point SUM (testdata money is double, not DECIMAL(10,2) —
    SURVEY.md §7 hard-part 4; see `functions.scalar.exact_sum`) and
    ordering is made total with the l_orderkey tie-break so the
    top-`limit` set is deterministic vs the oracle.
    """
    cut = ts_lit(cutoff)
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)

    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(revenue(), 10000).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            "o_orderdate",
            F.lit(0).alias("o_shippriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(limit)
    )


Q3_ORACLE_SQL = f"""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       o_orderdate,
       0 AS o_shippriority
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 20
"""

def q3_shipping_priority_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship query through the SQL API (the reference's
    oracle path is Flink SQL, `TPCHQuery3SQL_Batch.java:100-124`) —
    Catalyst produces the same plan either way; registered separately
    to cover the `spark.sql` entry surface."""
    from query_processing_over_streaming_data_using_flink_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        f"""
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) / CAST(10000 AS DOUBLE) AS revenue,
               o_orderdate,
               0 AS o_shippriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = '{Q3_SEGMENT}'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
          AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 20
        """
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume) adapted to the driver
    schema: customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region,
    region filter + order-date year, revenue by nation. The supplier
    must be in the customer's nation (the Q5 co-location predicate).
    Dims broadcast; the two fact joins shuffle on their keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(exact_sum(revenue(), 10000).alias("revenue"))
    )


Q5_ORACLE_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting) adapted: revenue lost
    to returns per customer in a quarter, top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1995-10-01"))
        & (F.col("o_orderdate") < ts_lit("1996-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(exact_sum(revenue(), 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


register("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE_SQL)
register("q3_shipping_priority_sql", q3_shipping_priority_sql, Q3_ORACLE_SQL)
register("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE_SQL)
register("q10_returned_items", q10_returned_items, Q10_ORACLE_SQL)
