"""Retraction (Insert/Delete changelog) evaluation — signed-weight
algebra over the unified event stream.

The reference threads an `action` (Insert/Delete) through every
operator (`TPCHQuery3_StreamProcessor.java:404-435,540-544`): joins
emit Insert only when both sides are Inserts, deletes clear state and
emit retractions, and the aggregate adds/subtracts. The algebraic form
of all of that is a signed weight: op ∈ {+1,-1} rides along each event,
joins multiply weights, and aggregation sums weight·value. Filters,
projections and joins are then *ordinary Spark operators* — retraction
costs nothing extra and the algebra is commutative, so events may be
consumed in any order or batching and the final state is identical
(the reference needs its single-threaded source for this; we don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import ts_lit


def changelog_state(
    changelog: DataFrame,
    relation: str,
    key_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Net live rows of one relation after applying all events:
    group by payload, keep keys with net weight > 0.

    (Batch materialization of the per-key ValueState/MapState the
    reference's join operators maintain,
    `TPCHQuery3_StreamProcessor.java:391-399,452-460`.)

    `payload_cols` narrows the grouping to the relation's own columns —
    the unified schema carries every relation's payload, so grouping by
    all of it drags constant-NULL columns through the shuffle (their
    values are per-relation constants, so the result is identical
    either way, just with narrower shuffle rows).
    """
    payload = payload_cols or [
        c for c in changelog.columns if c not in ("seq", "op", "relation")
    ]
    return (
        changelog.filter(F.col("relation") == relation)
        .groupBy(*payload)
        .agg(F.sum("op").alias("w"))
        .filter(F.col("w") > 0)
    )


def q3_on_state(
    changelog: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q3 over the *current state* of a changelog — the query the
    reference's streaming pipeline maintains continuously
    (`TPCHQuery3_StreamProcessor.java:183-265`), evaluated with the
    signed-weight algebra.

    Weights multiply through the joins and scale each line's revenue in
    the aggregate: sum(w_c·w_o·w_l · revenue). With per-key net weights
    in {0,1} this equals Q3 on the surviving window; the formulation
    stays correct for any interleaving of inserts and deletes.
    """
    cut = ts_lit(cutoff)
    # Filters sit BELOW the state aggregation: they are weight-preserving
    # (reference CustomerFilter/OrderFilter pre-filter events the same
    # way, `:347-371`), and filtering 15M events before the groupBy is
    # the difference between aggregating the survivors and aggregating
    # the world. Grouping keys are narrowed to each relation's payload.
    cust = (
        changelog_state(
            changelog.filter(F.col("mktsegment") == segment),
            "customer",
            ["custkey"],
            payload_cols=["custkey", "mktsegment"],
        )
        .select(F.col("custkey").alias("c_custkey"), F.col("w").alias("w_c"))
    )
    orders = (
        changelog_state(
            changelog.filter(F.col("orderdate") < cut),
            "orders",
            ["orderkey"],
            payload_cols=["orderkey", "o_custkey", "orderdate"],
        )
        .select(
            F.col("orderkey").alias("o_orderkey"),
            F.col("o_custkey"),
            F.col("orderdate").alias("o_orderdate"),
            F.col("w").alias("w_o"),
        )
    )
    lineitem = (
        changelog_state(
            changelog.filter(F.col("shipdate") > cut),
            "lineitem",
            ["orderkey", "linenumber"],
            payload_cols=["orderkey", "linenumber", "extendedprice", "discount", "shipdate"],
        )
        .select(
            F.col("orderkey").alias("l_orderkey"),
            F.col("extendedprice"),
            F.col("discount"),
            F.col("w").alias("w_l"),
        )
    )
    weighted_cents = (
        F.col("w_c")
        * F.col("w_o")
        * F.col("w_l")
        * F.round(F.col("extendedprice") * (F.lit(1.0) - F.col("discount")) * 10000, 0).cast(
            "long"
        )
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(weighted_cents) / F.lit(10000.0)).alias("revenue"))
        .filter(F.col("revenue") > 0)
        .select("l_orderkey", "revenue", "o_orderdate", F.lit(0).alias("o_shippriority"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(limit)
    )
