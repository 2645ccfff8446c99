"""Stream-static enrichment join: a live event stream decorated with a
dimension table, the standard star-schema pattern at ingest time.

The reference keeps its only dimension (customer) as *streamed* keyed
state and replays it through the same changelog as the facts
(`/root/reference/src/main/java/org/example/TPCHQuery3_StreamProcessor.java:268-344`);
that is the right machinery for a dimension that itself changes, and it
lives here in `streaming/ivm.py`. For the (much more common) slowly- or
never-changing dimension, Spark's stream-static join is strictly
better: the static side is broadcast to every task, the stream side
never shuffles, and no join state accrues at all — per micro-batch the
join is a map-side hash lookup.

100 TB design notes:

* The dimension must be broadcast-sized (customer at SF-1000 is not —
  that case belongs to the IVM path or a bucketed stream-stream join).
  `enrich_events` takes an explicit `broadcast_dim` switch so callers
  state the size assumption; the plan is asserted broadcast in tests.
* Inner/left joins need no watermark: unmatched stream rows resolve
  within their own micro-batch against the *current* static snapshot.
* The static side is re-resolved per micro-batch in Structured
  Streaming, so a dimension refreshed in place (overwrite of the
  parquet dir) is picked up without restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(
    events: DataFrame, customer: DataFrame, broadcast_dim: bool = True
) -> DataFrame:
    """Decorate events (batch or streaming) with the owning customer's
    market segment. Column names stay disjoint by projection."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").alias("user_nationkey"),
    )
    if broadcast_dim:
        dim = F.broadcast(dim)
    return events.join(dim, "user_id", "left")


def segment_activity(enriched: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Per-segment activity rollup over enriched events. Streaming
    DataFrames forbid exact distinct aggregation (unbounded per-group
    key state) — the streaming face passes exact_distinct=False and
    counts users with HyperLogLog++, the state-bounded form that is
    also what you'd run at 100 TB."""
    n_users = (
        F.countDistinct("user_id")
        if exact_distinct
        else F.approx_count_distinct("user_id", rsd=0.01)
    )
    return (
        enriched.groupBy("mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            n_users.alias("n_users"),
        )
    )
