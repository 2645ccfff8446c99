"""Event-time window suite — Spark-native tumbling / sliding / session
windows over the events table, oracle-checked in DuckDB.

These are the batch faces of Structured Streaming's windowed
aggregations (the same `F.window` / `F.session_window` expressions run
unchanged under `readStream` + watermark; tests/test_streaming.py
exercises that path). The reference's only windowing is the
count-based sliding changelog window (`StreamDataProcessor.py:122-260`,
covered by `suite_streaming`); time-based windows are part of the
beyond-reference streaming surface (SURVEY §2.9).

Semantics pinned by the oracles:
- tumbling/sliding windows are [start, end), aligned to the epoch;
- a 30-min slide-15-min window means every event lands in exactly two
  windows (start = floor(t/15min)*15min - {0, 15min});
- session windows merge events whose gap is strictly less than the
  timeout: an event at exactly prev_ts + gap starts a NEW session
  (Spark's window is [first_ts, last_ts + gap)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import layout as lay
from query_processing_over_streaming_data_using_flink_spark.operators.skew import salted_join
from query_processing_over_streaming_data_using_flink_spark.streaming.enrich import enrich_events
from query_processing_over_streaming_data_using_flink_spark.streaming.join import (
    interval_join_pairs,
    split_click_purchase,
)

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import (
    exact_sum,
    exact_sum_sql,
)
from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event type: count + exact sum.
    Plans as a plain hash aggregate on (type, floor(ts)) — one shuffle,
    map-side partials; nothing window-specific survives into the
    physical plan, which is exactly why the tumbling case scales."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy("event_type", w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 100).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


EVENTS_TUMBLING_SQL = f"""
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       count(*) AS n_events,
       {exact_sum_sql('value', 100)} AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def events_sliding_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (30-min length, 15-min slide) per event type.
    Spark expands each row into length/slide = 2 window instances
    before the aggregate — the blow-up factor is the ratio, not the
    window length, so memory stays bounded at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "30 minutes", "15 minutes")
    return (
        ev.groupBy("event_type", w.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


# Each event belongs to exactly 2 windows: starts at
# (floor(t/15min) - {0,1}) * 15min. Integer microsecond arithmetic
# (epoch_us) avoids float epoch rounding; timestamps stay naive on
# both sides.
EVENTS_SLIDING_SQL = """
SELECT event_type, window_start,
       window_start + INTERVAL 30 MINUTE AS window_end,
       count(*) AS n_events
FROM (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 900000000 - off) * 900000000) AS window_start
  FROM events, (VALUES (0), (1)) offsets(off)
)
GROUP BY event_type, window_start
"""


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity timeout —
    the native `F.session_window` (dynamic, merging windows), vs the
    manual lag/cumsum sessionization in `sessionize_events`. State per
    key is one open session (Spark merges on overlap), so streaming
    state size is O(active users), not O(events)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 100).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# Island construction: a session breaks where the gap is >= the
# timeout (an event at exactly prev + 30min is outside the previous
# window's [start, last+30min) bound). session_end = last event + gap,
# matching Spark's session_window.end. Both window clauses order by
# (ts, event_id): with tied timestamps, the running sum must walk rows
# in the SAME total order the lag flags were computed in, or a
# session-start flag can land on the wrong side of its tied peer.
EVENTS_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       {exact_sum_sql('value', 100)} AS sum_value
FROM sess
GROUP BY user_id, sid
"""


def attr_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-stream interval join
    (`streaming/join.py`): all (purchase, click) pairs where the
    same-user click precedes the purchase in (ts, event_id) order
    within a 30-minute horizon. One shuffle on user_id each side, then
    a sort-merge join with the time bounds as a range residual — the
    exact plan shape that survives a 100x scale-up (no broadcast of a
    big side, no cartesian). The streaming face runs the SAME join
    expression under watermarks; tests/test_stream_join.py asserts
    pair-set equality."""
    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = split_click_purchase(ev)
    return interval_join_pairs(clicks, purchases)


ATTR_PAIRS_SQL = """
SELECT p.event_id AS purchase_event_id,
       p.user_id AS user_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value,
       c.event_id AS click_event_id,
       c.ts AS click_ts
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND (c.ts < p.ts OR c.event_id < p.event_id)
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


def attr_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the LATEST
    attributable click (the argmax of the pair relation above), NULL
    if none. Implemented join-free as a per-user ordered scan —
    `last(click, ignorenulls)` over the strictly-preceding rows — so
    it costs ONE shuffle of the events table and never materializes
    the pair blow-up; the 30-minute bound is applied after, which is
    equivalent because any click older than the latest one is further
    outside the horizon. The oracle states the same thing as the
    declarative argmax over the pair relation."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    lc_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    in_horizon = F.col("lc_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return (
        ev.withColumn("lc_ts", lc_ts)
        .withColumn("lc_id", lc_id)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            F.when(in_horizon, F.col("lc_id")).alias("click_event_id"),
            F.when(in_horizon, F.col("lc_ts")).alias("click_ts"),
        )
    )


ATTR_LAST_TOUCH_SQL = """
WITH pairs AS (
  SELECT p.event_id AS purchase_event_id,
         p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
         c.event_id AS click_event_id, c.ts AS click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON c.user_id = p.user_id
   AND c.ts <= p.ts
   AND c.ts >= p.ts - INTERVAL 30 MINUTE
   AND (c.ts < p.ts OR c.event_id < p.event_id)
)
SELECT purchase_event_id, user_id, purchase_ts, purchase_value,
       click_event_id, click_ts
FROM pairs WHERE rn = 1
"""


def enrich_segment_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-static enrichment join
    (`streaming/enrich.py`): events decorated with the owning
    customer's market segment via a broadcast dimension (stream side
    never shuffles for the join), then a per-(segment, type) rollup.
    tests/test_stream_enrich.py runs the SAME join as a streaming
    query and asserts result equality plus the broadcast plan shape."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        enrich_events(ev, cust)
        .groupBy("mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 100).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ENRICH_SEGMENT_SQL = f"""
SELECT c.c_mktsegment AS mktsegment,
       e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {exact_sum_sql("e.value", 100)} AS sum_value,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


def join_salted_user_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient variant of the enrichment join
    (`operators/skew.py`): events salted on a deterministic row hash,
    customer dimension exploded one copy per salt, equi-join on
    (user_id, salt) — the shape for a probe side with heavy-hitter
    keys and a build side too big to broadcast. Semantics are exactly
    the plain join; the oracle is the unsalted SQL."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        salted_join(ev, cust, on="user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 100).alias("sum_value"),
        )
    )


SALTED_JOIN_SQL = f"""
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       {exact_sum_sql("e.value", 100)} AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
"""


register("events_tumbling_hourly", events_tumbling_hourly, EVENTS_TUMBLING_SQL)
register("events_sliding_30m_15m", events_sliding_30m_15m, EVENTS_SLIDING_SQL)
register("events_session_window", events_session_window, EVENTS_SESSION_SQL)
register("attr_interval_join_pairs", attr_interval_join_pairs, ATTR_PAIRS_SQL)
register("attr_last_touch", attr_last_touch, ATTR_LAST_TOUCH_SQL)
register("enrich_segment_activity", enrich_segment_activity, ENRICH_SEGMENT_SQL)
register("join_salted_user_nation", join_salted_user_nation, SALTED_JOIN_SQL)


def rollup_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: DAILY stats
    composed from HOURLY partials — the two-level pre-aggregation
    hierarchy (TimescaleDB continuous aggregates / materialized rollup
    tables). The daily layer never touches raw events: sums of sums,
    sums of counts, min/max of mins/maxes, and the daily average
    reconstructed as total/count. At 100 TB the hourly layer is the
    materialized table; daily/weekly/monthly all derive from it with
    aggregation over 24x fewer rows, and the hourly aggregate itself is
    one map-side-combined shuffle. The oracle aggregates raw events
    directly — certifying that the partial-composition is lossless."""
    ev = load_table(spark, sf_dir, "events")
    # Hourly partials keep the sum as INTEGER cents: composing double
    # partials would reorder IEEE addition and drift from the direct
    # aggregation; integer partials compose exactly in any order.
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    return (
        hourly.groupBy(
            F.to_date(F.date_trunc("day", F.col("hour"))).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("cents").cast("bigint") / F.lit(100.0)).alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.round(
                (F.sum("cents").cast("bigint") / F.lit(100.0)) / F.sum("n"), 6
            ).alias("avg_value"),
        )
    )


ROLLUP_HOURLY_DAILY_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
       event_type,
       count(*) AS n_events,
       {exact_sum_sql('value', 100)} AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round({exact_sum_sql('value', 100)} / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""

register("rollup_hourly_daily", rollup_hourly_daily, ROLLUP_HOURLY_DAILY_SQL)


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by their FIRST
    activity week, counted in each subsequent week they return. Two
    aggregates sharing one shuffle key (user_id) — the first-touch
    window and the (cohort, offset) count — no joins against the fact
    table twice at scale: the cohort label rides along via a window
    min. The classic growth-analytics operator."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    w = Window.partitionBy("user_id")
    labeled = ev.select(
        "user_id",
        week.alias("week"),
    ).withColumn("cohort_week", F.min("week").over(w))
    return (
        labeled.select(
            F.to_date("cohort_week").alias("cohort_week"),
            ((F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
             / F.lit(604800)).cast("int").alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH labeled AS (
  SELECT user_id,
         date_trunc('week', ts) AS week,
         min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
  FROM events
)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST((epoch(week) - epoch(cohort_week)) / 604800 AS INT) AS weeks_since,
       count(DISTINCT user_id) AS n_users
FROM labeled
GROUP BY 1, 2
"""

register("events_retention_cohorts", events_retention_cohorts, RETENTION_SQL)


def events_twa_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per (user, day) — the
    hypertable `time_weight('locf')` aggregate for irregular samples:
    each observation holds (LOCF) until the user's next event, and the
    day's average weights each value by how long it held. Semantics
    pinned for the oracle: a segment belongs to the day its START falls
    in and only counts when the next event lands on the same day (no
    midnight splitting); single-event days have no segments and are
    absent. One user_id shuffle (the lead window) + one (user, day)
    aggregate. Determinism: weights are integer microseconds and values
    quantize to integer cents BEFORE the multiply-accumulate, so both
    sums are associative integer aggregates; the final twa is one exact
    long/long division (bounds: cents <= ~1e7, gap_us < 8.64e10, but a
    segment product caps at cents * day_us ~ 1e12 * n_segments —
    far inside int64)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    seg = (
        ev.withColumn("us", us)
        .withColumn("next_us", F.lead("us", 1).over(w))
        .withColumn("next_day", F.to_date(F.lead("ts", 1).over(w)))
        .withColumn("day", F.to_date("ts"))
        .filter(F.col("next_us").isNotNull() & (F.col("next_day") == F.col("day")))
        .select(
            "user_id",
            "day",
            (F.col("next_us") - F.col("us")).alias("dur_us"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("cents") * F.col("dur_us")).alias("wsum"),
            F.sum("dur_us").alias("dur_total"),
        )
        .select(
            "user_id",
            "day",
            "n_segments",
            F.round(F.col("wsum") / F.col("dur_total") / 100.0, 6).alias("twa"),
        )
    )


TWA_SQL = """
WITH seg AS (
  SELECT user_id,
         CAST(ts AS DATE) AS day,
         CAST(ts AS DATE) = CAST(lead(ts) OVER w AS DATE) AS same_day,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, day,
       count(*) AS n_segments,
       round(CAST(sum(cents * dur_us) AS BIGINT)
             / CAST(sum(dur_us) AS BIGINT) / 100.0, 6) AS twa
FROM seg
WHERE dur_us IS NOT NULL AND same_day
GROUP BY user_id, day
"""

register("events_twa_daily", events_twa_daily, TWA_SQL)


def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose event count per type
    deviates >= 2 sample standard deviations from that type's daily
    mean. The variance comes from INTEGER power sums (sum n, sum n² —
    exact in int64 at any scale), not a float stddev aggregate whose
    partial-merge order would differ between engines: both sides
    compute identical doubles from identical integers. Two narrow
    aggregates (day grain, then type grain) + a broadcast-size join
    back — the fact table shuffles once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    joined = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("s1") / F.col("d")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("d")) / (F.col("d") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        joined.select(
            "event_type",
            "day",
            "n",
            F.round(mean, 6).alias("mean_n"),
            F.round(z, 4).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2.0)
    )


ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, count(*) AS d, sum(n) AS s1, sum(n * n) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type, day, n,
       round(s1 / d, 6) AS mean_n,
       round((n - s1 / d) / sqrt((s2 - s1 * s1 / d) / (d - 1)), 4) AS z
FROM daily JOIN stats USING (event_type)
WHERE abs((n - s1 / d) / sqrt((s2 - s1 * s1 / d) / (d - 1))) >= 2.0
"""

register("events_daily_anomalies", events_daily_anomalies, ANOMALY_SQL)


def events_moving_7d_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily event counts per type —
    the RANGE window frame (value-based bounds over sparse days: a day
    preceded by a data gap still looks back 7 CALENDAR days, which a
    ROWS frame gets wrong). Ordered by integer epoch-day so Spark's
    numeric rangeBetween and DuckDB's RANGE INTERVAL frame agree
    exactly; the average is an integer-sum / integer-count division —
    engine-exact. One day-grain aggregate + one per-type window, both
    on the same small keyspace."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch_day)
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("n_7d"),
        F.count("n").over(w).alias("d_7d"),
        F.round(F.sum("n").over(w) / F.count("n").over(w), 6).alias("avg_7d"),
    )


MOVING_7D_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(sum(n) OVER w AS BIGINT) AS n_7d,
       count(n) OVER w AS d_7d,
       round(CAST(sum(n) OVER w AS BIGINT) / count(n) OVER w, 6) AS avg_7d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
"""

register("events_moving_7d_avg", events_moving_7d_avg, MOVING_7D_SQL)


def zorder_events_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of events on (ts, user_id) — the
    multi-dimensional file-layout primitive (`operators/layout.py:
    zorder_key`; no reference counterpart — the reference reads one
    local CSV, but at 100 TB the layout IS the query plan). Each event
    gets a 32-bit Morton key interleaving its 16-bit-quantized time and
    user ranks; the key's top 8 bits assign it to one of 256 clusters
    (≈ files under a `write_zordered` range-partitioned write). The
    output is the per-cluster zone map — count + min/max of each
    quantized dimension — i.e. exactly the parquet footer stats a
    scan would prune on, as oracle-checked NUMBERS: every cluster
    covers a small rectangle of (time, user) space instead of a
    full-width slab, so predicates on EITHER dimension skip most
    clusters. All-integer (exact decimal division inside
    `quantize_dim`), one aggregation shuffle on the 256-key space."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    df = ev.select(us.alias("t"), F.col("user_id").alias("u"))
    bounds = df.agg(
        F.min("t").alias("tmin"),
        F.max("t").alias("tmax"),
        F.min("u").alias("umin"),
        F.max("u").alias("umax"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).select(
        lay.quantize_dim(F.col("t"), F.col("tmin"), F.col("tmax")).alias("qt"),
        lay.quantize_dim(F.col("u"), F.col("umin"), F.col("umax")).alias("qu"),
    )
    z = keyed.withColumn("z", lay.zorder_key(F.col("qt"), F.col("qu")))
    return (
        z.groupBy(F.shiftright("z", 24).cast("long").alias("cluster"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("qt").alias("qt_min"),
            F.max("qt").alias("qt_max"),
            F.min("qu").alias("qu_min"),
            F.max("qu").alias("qu_max"),
        )
        .select(
            "cluster",
            "n_events",
            "qt_min",
            "qt_max",
            (F.col("qt_max") - F.col("qt_min")).alias("qt_span"),
            "qu_min",
            "qu_max",
            (F.col("qu_max") - F.col("qu_min")).alias("qu_span"),
        )
    )


# The bit-dilation ladder in plain int64 <</&/| — identical constants
# and step order as `_spread16`, so the Morton keys are bit-equal.
ZORDER_SQL = """
WITH e AS (SELECT epoch_us(ts) AS t, user_id AS u FROM events),
b AS (SELECT min(t) AS tmin, max(t) AS tmax, min(u) AS umin, max(u) AS umax FROM e),
q AS (
  SELECT CASE WHEN tmax - tmin <= 0 THEN 0
              ELSE ((t - tmin) * 65535) // (tmax - tmin) END AS qt,
         CASE WHEN umax - umin <= 0 THEN 0
              ELSE ((u - umin) * 65535) // (umax - umin) END AS qu
  FROM e CROSS JOIN b
),
s1 AS (SELECT qt, qu, (qt | (qt << 8)) & 16711935 AS xa,
                      (qu | (qu << 8)) & 16711935 AS ya FROM q),
s2 AS (SELECT qt, qu, (xa | (xa << 4)) & 252645135 AS xb,
                      (ya | (ya << 4)) & 252645135 AS yb FROM s1),
s3 AS (SELECT qt, qu, (xb | (xb << 2)) & 858993459 AS xc,
                      (yb | (yb << 2)) & 858993459 AS yc FROM s2),
s4 AS (SELECT qt, qu, (xc | (xc << 1)) & 1431655765 AS xd,
                      (yc | (yc << 1)) & 1431655765 AS yd FROM s3),
z AS (SELECT qt, qu, xd | (yd << 1) AS z FROM s4)
SELECT z >> 24 AS cluster, count(*) AS n_events,
       min(qt) AS qt_min, max(qt) AS qt_max, max(qt) - min(qt) AS qt_span,
       min(qu) AS qu_min, max(qu) AS qu_max, max(qu) - min(qu) AS qu_span
FROM z GROUP BY 1
"""

register("zorder_events_clusters", zorder_events_clusters, ZORDER_SQL)


def hilbert_events_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering of events on (ts, user_id) — the
    seam-free sibling of `zorder_events_clusters` (`operators/
    layout.py:with_hilbert_key`): the Z curve teleports at quadrant
    seams, so a key-range file can cover two far-apart rectangles;
    consecutive Hilbert cells are always grid neighbors, so worst-case
    per-file bounding boxes are strictly tighter. Dims quantize to 8
    bits (256×256 grid), the xy2d rotation ladder runs as 8 chained
    integer projections, and the key's top 8 bits give 256 clusters;
    the output is the same oracle-checked zone map (count + min/max
    per quantized dim) a parquet scan would prune on."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    df = ev.select(us.alias("t"), F.col("user_id").alias("u"))
    bounds = df.agg(
        F.min("t").alias("tmin"),
        F.max("t").alias("tmax"),
        F.min("u").alias("umin"),
        F.max("u").alias("umax"),
    )
    zmax = (1 << lay.HILBERT_ORDER) - 1
    keyed = df.crossJoin(F.broadcast(bounds)).select(
        lay.quantize_dim(F.col("t"), F.col("tmin"), F.col("tmax"), zmax).alias("qt"),
        lay.quantize_dim(F.col("u"), F.col("umin"), F.col("umax"), zmax).alias("qu"),
    )
    h = lay.with_hilbert_key(keyed, "qt", "qu", "h")
    return (
        h.groupBy(F.shiftright("h", 8).cast("long").alias("cluster"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("qt").alias("qt_min"),
            F.max("qt").alias("qt_max"),
            F.min("qu").alias("qu_min"),
            F.max("qu").alias("qu_max"),
        )
        .select(
            "cluster",
            "n_events",
            "qt_min",
            "qt_max",
            (F.col("qt_max") - F.col("qt_min")).alias("qt_span"),
            "qu_min",
            "qu_max",
            (F.col("qu_max") - F.col("qu_min")).alias("qu_span"),
        )
    )


def _hilbert_sql(order: int = 8) -> str:
    """The xy2d rotation ladder unrolled as chained CTEs — same step
    order, constants, and tie handling as `with_hilbert_key`."""
    zmax = (1 << order) - 1
    sql = f"""
WITH e AS (SELECT epoch_us(ts) AS t, user_id AS u FROM events),
b AS (SELECT min(t) AS tmin, max(t) AS tmax, min(u) AS umin, max(u) AS umax FROM e),
q AS (
  SELECT CASE WHEN tmax - tmin <= 0 THEN 0
              ELSE ((t - tmin) * {zmax}) // (tmax - tmin) END AS qt,
         CASE WHEN umax - umin <= 0 THEN 0
              ELSE ((u - umin) * {zmax}) // (umax - umin) END AS qu
  FROM e CROSS JOIN b
),
h0 AS (SELECT qt, qu, CAST(0 AS BIGINT) AS d, qt AS x, qu AS y FROM q),
"""
    prev = "h0"
    for i in range(order):
        s = 1 << (order - 1 - i)
        name = f"h{i + 1}"
        sql += f"""{name} AS (
  SELECT qt, qu,
         d + {s * s} * xor((CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END) * 3,
                           CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d,
         CASE WHEN (y & {s}) = 0
              THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN (y & {s}) = 0
              THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END)
              ELSE y END AS y
  FROM {prev}),
"""
        prev = name
    sql += f"""final AS (SELECT qt, qu, d FROM {prev})
SELECT d >> 8 AS cluster, count(*) AS n_events,
       min(qt) AS qt_min, max(qt) AS qt_max, max(qt) - min(qt) AS qt_span,
       min(qu) AS qu_min, max(qu) AS qu_max, max(qu) - min(qu) AS qu_span
FROM final GROUP BY 1
"""
    return sql


register("hilbert_events_clusters", hilbert_events_clusters, _hilbert_sql())
