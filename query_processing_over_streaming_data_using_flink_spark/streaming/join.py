"""Stream-stream event-time interval join (click -> purchase
attribution).

The reference's join machinery is the stateful symmetric changelog
join over keyed state (C join O join L,
`/root/reference/src/main/java/org/example/TPCHQuery3_StreamProcessor.java:268-449`),
covered by `streaming/stateful.py` + `streaming/ivm.py`. This module
adds the event-time generalization Spark provides natively and the
reference lacks: a watermarked stream-stream join whose condition
bounds one stream's event time by an interval of the other's
(SURVEY §2.9 beyond-reference surface).

Scale notes (the reason to use the native operator):

* Both sides shuffle once on the equi key (`user_id`); the time-range
  conjuncts (`click_ts <= purchase_ts`, `click_ts >= purchase_ts -
  horizon`) let Spark derive a state-eviction bound from the
  watermark, so per-key state holds only the last `horizon +
  watermark-delay` of clicks — O(rate x horizon), not O(history).
* The SAME join expression runs on batch DataFrames (where it plans as
  a SortMergeJoin with a range residual), which is how the oracle-
  checked batch faces in `plans/suite_eventtime.py` pin the semantics.

Pair semantics (identical in batch, streaming, and the DuckDB oracle):
a click is attributable to a purchase of the same user iff the click
precedes the purchase in (ts, event_id) lexicographic order and
`click_ts >= purchase_ts - horizon`. The event_id tie-break makes the
relation total even for equal timestamps, so last-touch attribution
(`argmax` over the attributable clicks) is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON_MIN = 30


def split_click_purchase(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two join faces out of the unified events table with
    disjoint column names (stream-stream joins forbid ambiguous
    attribute references)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def interval_join_condition(horizon_min: int = DEFAULT_HORIZON_MIN):
    """The join condition, shared verbatim by the batch and streaming
    faces. Conjunctive time bounds first (these are what Structured
    Streaming mines for watermark state eviction), then the residual
    tie-break."""
    return (
        (F.col("click_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon_min} MINUTES")
        )
        & (
            (F.col("click_ts") < F.col("purchase_ts"))
            | (F.col("click_event_id") < F.col("purchase_event_id"))
        )
    )


def interval_join_pairs(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_min: int = DEFAULT_HORIZON_MIN,
) -> DataFrame:
    """All attributable (purchase, click) candidate pairs. Works on
    batch and streaming inputs alike."""
    return purchases.join(
        clicks, on=interval_join_condition(horizon_min), how="inner"
    ).select(
        "purchase_event_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        "click_event_id",
        "click_ts",
    )


def stream_interval_join(
    click_stream: DataFrame,
    purchase_stream: DataFrame,
    horizon_min: int = DEFAULT_HORIZON_MIN,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming face. Inputs are streaming DataFrames
    already shaped by `split_click_purchase` column names, with
    TIMESTAMP (not NTZ) event-time columns. Click state for a key is
    dropped once the purchase-side watermark passes `click_ts +
    horizon + delay`; purchase rows never wait (inner join, clicks
    precede purchases by construction)."""
    c = click_stream.withWatermark("click_ts", watermark_delay)
    p = purchase_stream.withWatermark("purchase_ts", watermark_delay)
    return interval_join_pairs(c, p, horizon_min)
