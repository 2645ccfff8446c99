"""Approximate (sketch) aggregation suite — beyond-reference surface.

The reference maintains exact aggregates only (hash state per key,
`/root/reference/src/main/java/org/example/TPCHQuery3_StreamProcessor.java:391-449`);
at 100 TB the first thing a production pipeline swaps in is mergeable
sketches: HyperLogLog distinct counts, approximate quantiles. Both are
built into Spark (JVM-side, whole-stage-codegen aggregates; the HLL
pair uses the Apache DataSketches wire format, so sketches built by
different jobs/engines union cleanly) and both are *mergeable* — the
map-side partial aggregate IS the sketch, so the shuffle carries a few
KB per group instead of the distinct key set. That mergeability is the
100 TB design: per-partition/per-day sketches roll up without ever
re-touching raw data.

Oracle pattern (driver-checkable despite approximation): each query
emits (a) exact anchor columns any engine reproduces bit-for-bit and
(b) boolean `*_ok` columns asserting the Spark-side approximation lies
within its documented error envelope of the Spark-side exact value.
The DuckDB oracle emits the same anchors and literal TRUE — so the
driver's hash compare verifies the anchors exactly AND fails loudly if
an approximation ever leaves its envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: exact (expensive: shuffles the
    distinct key set) next to HyperLogLog++ (`approx_count_distinct`,
    rsd=1% → fixed ~few-KB state per group regardless of cardinality).
    At 100 TB only the HLL column survives; the exact column is the
    oracle anchor at test scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            # rsd=0.01 → 1-sigma 1%; 5% is a >>4-sigma envelope.
            (
                (F.col("n_approx") >= (F.col("n_exact") * F.lit(0.95)).cast("long"))
                & (F.col("n_approx") <= (F.col("n_exact") * F.lit(1.05)).cast("long") + F.lit(1))
            ).alias("approx_within_5pct"),
        )
    )


APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
"""


def hll_union_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, the property exactness can't offer: build
    one DataSketches HLL per day (`hll_sketch_agg`), then roll the
    daily sketches up with `hll_union_agg` — no second pass over raw
    events. The rollup estimate must land in the same error envelope
    as a direct whole-table sketch; both are checked against the exact
    distinct count. This is the incremental pattern for 100 TB: daily
    partitions each persist a KB-sized sketch, and any date-range
    distinct count is a union over sketches, not a scan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_day_exact"),
    )
    rolled = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged"),
        F.count("*").alias("n_days"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(rolled).select(
        "n_exact",
        F.col("n_days").alias("n_days"),
        (
            (F.col("n_merged") >= (F.col("n_exact") * F.lit(0.95)).cast("long"))
            & (F.col("n_merged") <= (F.col("n_exact") * F.lit(1.05)).cast("long") + F.lit(1))
        ).alias("merged_within_5pct"),
    )


HLL_UNION_SQL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST((SELECT count(DISTINCT CAST(ts AS DATE)) FROM events) AS BIGINT) AS n_days,
       TRUE AS merged_within_5pct
FROM events
"""


def approx_quantiles_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles: exact interpolated `percentile`
    (anchor — matches DuckDB `quantile_cont` bit-for-bit on doubles,
    see agg_median_order_price) next to `percentile_approx`
    (Greenwald-Khanna, accuracy=10000 → bounded *rank* error n/10000,
    constant memory, mergeable). The `*_ok` envelope converts the rank
    bound to a value bound via the group's value spread."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
        F.expr("percentile(value, 0.95)").alias("_p95x"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("_p50a"),
        F.expr("percentile_approx(value, 0.95, 10000)").alias("_p95a"),
        F.max("value").alias("_mx"),
        F.min("value").alias("_mn"),
    )
    spread = F.col("_mx") - F.col("_mn")
    return g.select(
        "event_type",
        "n_values",
        "p50_exact",
        (F.abs(F.col("_p50a") - F.col("p50_exact")) <= spread * F.lit(0.05) + F.lit(1e-6)).alias("p50_ok"),
        (F.abs(F.col("_p95a") - F.col("_p95x")) <= spread * F.lit(0.05) + F.lit(1e-6)).alias("p95_ok"),
    )


APPROX_QUANTILES_SQL = """
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       round(quantile_cont(value, 0.5), 6) AS p50_exact,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM events
GROUP BY event_type
"""


register("approx_distinct_users", approx_distinct_users, APPROX_DISTINCT_SQL)
register("hll_union_daily_users", hll_union_daily_users, HLL_UNION_SQL)
register("approx_quantiles_event_value", approx_quantiles_event_value, APPROX_QUANTILES_SQL)


# Count-min sketch geometry: CM_D independent hash rows of CM_W
# counters. Error envelope: overestimate only, by at most
# eps*N with eps = e/CM_W at confidence 1 - (1/e)^CM_D.
CM_D = 4
CM_W = 256


def cm_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (top-20 users by event volume) read out of a
    count-min sketch, next to their exact counts — the
    frequency-estimation sketch that completes the approx family (HLL
    distinct, GK quantiles, CM frequencies). The sketch is CM_D×CM_W
    INTEGER counters built by one fixed-size aggregate — state is
    constant no matter how many distinct users exist, and counters from
    different partitions/days merge by addition (the 100 TB property).
    Estimate = min over rows of the hashed counter; CM only ever
    OVERESTIMATES, so `est >= exact` is asserted per row in the result
    itself (`cm_ok`). md5-derived row hashes make the sketch
    bit-identical in DuckDB — approximation, oracle-checked exactly."""
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(i: int, col):
        return F.pmod(md5_hash64(F.concat(F.lit(f"cm{i}:"), col.cast("string"))), F.lit(CM_W))

    rows = ev.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"), bucket(i, F.col("user_id")).alias("b"))
                for i in range(CM_D)
            ])
        ).alias("rb")
    ).select("rb.row", "rb.b")
    counters = rows.groupBy("row", "b").agg(F.count("*").alias("c"))

    exact = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    probes = exact.select(
        "user_id",
        "n_exact",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"), bucket(i, F.col("user_id")).alias("b"))
                for i in range(CM_D)
            ])
        ).alias("rb"),
    ).select("user_id", "n_exact", "rb.row", "rb.b")
    est = (
        probes.join(F.broadcast(counters), ["row", "b"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").alias("n_est"))
    )
    return (
        est.select(
            "user_id", "n_exact", "n_est", (F.col("n_est") >= F.col("n_exact")).alias("cm_ok")
        )
        .orderBy(F.desc("n_est"), F.asc("user_id"))
        .limit(20)
    )


def _cm_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql

    def bucket(i: int, expr: str) -> str:
        h = md5_hash64_sql(f"'cm{i}:' || CAST({expr} AS VARCHAR)")
        return f"(({h}) % {CM_W} + {CM_W}) % {CM_W}"

    row_union = " UNION ALL ".join(
        f"SELECT {i} AS row, {bucket(i, 'user_id')} AS b FROM events" for i in range(CM_D)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT user_id, n_exact, {i} AS row, {bucket(i, 'user_id')} AS b FROM exact"
        for i in range(CM_D)
    )
    return f"""
WITH rows_ AS ({row_union}),
counters AS (SELECT row, b, count(*) AS c FROM rows_ GROUP BY row, b),
exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id),
probes AS ({probe_union}),
est AS (
  SELECT user_id, n_exact, min(c) AS n_est
  FROM probes JOIN counters USING (row, b)
  GROUP BY user_id, n_exact
)
SELECT user_id, n_exact, n_est, n_est >= n_exact AS cm_ok
FROM est ORDER BY n_est DESC, user_id LIMIT 20
"""


register("cm_sketch_heavy_hitters", cm_sketch_heavy_hitters, _cm_sql())


# ---------------------------------------------------------------------------
# Round 8: Bloom-filter membership sketch
# ---------------------------------------------------------------------------

BLOOM_BITS = 65_536  # m: sized for ~10k members at ~1% fp (m ≈ 10·n)
BLOOM_WORD = 32  # 32-bit words — DuckDB raises on BIGINT << 63, so
#                  the mask 1 << (pos % 32) stays far from the sign bit
BLOOM_K = 3  # hash functions


def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership with an exact audit — the runtime-filter
    / semi-join-reduction primitive: the set of custkeys holding an
    URGENT order is compressed to a fixed m-bit sketch (k salted md5
    positions, bit_or into 32-bit words), then EVERY customer is probed
    against it and compared to the exact semi-join answer.

    Output per market segment: probes, exact members, sketch 'maybe'
    count, false positives (the sketch's documented slack), and false
    negatives — which a correct Bloom filter can NEVER produce, so that
    column doubles as a self-check the oracle hash pins at 0.

    Scale shape: the sketch is ~2k words regardless of member count —
    the build is a map-side bit_or partial aggregate (the shuffle
    carries words, not keys) and the probe side broadcasts the sketch.
    This is exactly how engines push build-side Bloom filters into
    scan-side runtime filters to prune a big probe table before the
    real join."""
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    salts = spark.range(BLOOM_K).select(F.col("id").alias("i"))

    def pos(key_col) -> F.Column:
        return F.pmod(
            md5_hash64(
                F.concat(
                    F.lit("bf"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    key_col.cast("string"),
                )
            ),
            F.lit(BLOOM_BITS),
        )

    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
    )
    bits = members.crossJoin(F.broadcast(salts)).select(pos(F.col("k")).alias("pos"))
    bloom = bits.groupBy((F.col("pos") / BLOOM_WORD).cast("long").alias("word")).agg(
        F.bit_or(mask).alias("bm")
    )

    probes = cust.crossJoin(F.broadcast(salts)).select(
        "c_custkey", "c_mktsegment", pos(F.col("c_custkey")).alias("pos")
    )
    hit = (
        probes.join(
            F.broadcast(bloom),
            (F.col("pos") / BLOOM_WORD).cast("long") == F.col("word"),
            "left",
        )
        .withColumn(
            "bit_set",
            F.when(
                F.col("bm").isNotNull() & (F.col("bm").bitwiseAND(mask) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.min("bit_set").alias("all_set"))
    )
    audited = hit.join(
        members.withColumnRenamed("k", "c_custkey").withColumn("is_member", F.lit(1)),
        "c_custkey",
        "left",
    )
    return (
        audited.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_probes"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0))).alias("n_members"),
            F.sum("all_set").alias("n_maybe"),
            F.sum(
                F.when((F.col("all_set") == 1) & F.col("is_member").isNull(), 1).otherwise(0)
            ).alias("false_positives"),
            F.sum(
                F.when((F.col("all_set") == 0) & F.col("is_member").isNotNull(), 1).otherwise(0)
            ).alias("false_negatives"),
        )
    )


def _bloom_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql

    def pos(key: str) -> str:
        h = md5_hash64_sql(f"'bf' || CAST(s.i AS VARCHAR) || ':' || CAST({key} AS VARCHAR)")
        return f"({h}) % {BLOOM_BITS}"

    return f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
),
bits AS (
  SELECT {pos("k")} AS pos
  FROM members, (SELECT unnest(range(0, {BLOOM_K})) AS i) s
),
bloom AS (
  SELECT CAST(pos // {BLOOM_WORD} AS BIGINT) AS word,
         bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD} AS INTEGER)) AS bm
  FROM bits GROUP BY 1
),
probes AS (
  SELECT c_custkey, c_mktsegment, {pos("c_custkey")} AS pos
  FROM customer, (SELECT unnest(range(0, {BLOOM_K})) AS i) s
),
hit AS (
  SELECT p.c_custkey, p.c_mktsegment,
         min(CASE WHEN b.bm IS NOT NULL
                   AND (b.bm & (1::BIGINT << CAST(p.pos % {BLOOM_WORD} AS INTEGER))) != 0
              THEN 1 ELSE 0 END) AS all_set
  FROM probes p LEFT JOIN bloom b ON b.word = p.pos // {BLOOM_WORD}
  GROUP BY 1, 2
)
SELECT h.c_mktsegment,
       count(*) AS n_probes,
       CAST(sum(CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(sum(h.all_set) AS BIGINT) AS n_maybe,
       CAST(sum(CASE WHEN h.all_set = 1 AND m.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
       CAST(sum(CASE WHEN h.all_set = 0 AND m.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
FROM hit h LEFT JOIN members m ON h.c_custkey = m.k
GROUP BY 1
"""


register("bloom_membership_audit", bloom_membership_audit, _bloom_sql())
