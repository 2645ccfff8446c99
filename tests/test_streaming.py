"""Streaming-core tests: changelog generation invariants, signed-weight
retraction, IVM stream-batch equivalence (the reference's convergence
criterion, README.md:154-159), and native Structured Streaming
windowed aggregation.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE
from query_processing_over_streaming_data_using_flink_spark.plans.tpch import q3_shipping_priority
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import run_streaming_q3
from query_processing_over_streaming_data_using_flink_spark.streaming.retraction import (
    changelog_state,
    q3_on_state,
)


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_changelog_insert_only_counts(spark):
    log = build_changelog(spark, SF_SMOKE)
    n = {t: load_table(spark, SF_SMOKE, t).count() for t in ("customer", "orders", "lineitem")}
    per_rel = {r["relation"]: r["n"] for r in log.groupBy("relation").agg(F.count("*").alias("n")).collect()}
    assert per_rel == n
    total = sum(n.values())
    seqs = log.agg(F.min("seq"), F.max("seq"), F.countDistinct("seq")).collect()[0]
    assert tuple(seqs) == (1, total, total)


def test_changelog_ratio_interleave(spark):
    """Within any prefix, table proportions track the global ratios
    (reference StreamDataProcessor.py:170-213)."""
    log = build_changelog(spark, SF_SMOKE)
    total = log.count()
    prefix = log.filter(F.col("seq") <= total // 10)
    counts = {r["relation"]: r["n"] for r in prefix.groupBy("relation").agg(F.count("*").alias("n")).collect()}
    # sf0.001: 6000:1500:150 → a 765-event prefix holds ~600:150:15
    assert abs(counts["lineitem"] - 40 * counts["customer"]) <= 41
    assert abs(counts["orders"] - 10 * counts["customer"]) <= 11


def test_full_cycle_drains_to_empty(spark):
    """Insert+delete of every row → empty state (window = dataset)."""
    n_total = sum(
        load_table(spark, SF_SMOKE, t).count() for t in ("customer", "orders", "lineitem")
    )
    log = build_changelog(spark, SF_SMOKE, window=n_total)
    assert log.count() == 2 * n_total
    for rel in ("customer", "orders", "lineitem"):
        assert changelog_state(log, rel, []).count() == 0
    assert q3_on_state(log).count() == 0


def test_insert_only_state_equals_batch_q3(spark):
    """Signed-weight Q3 on an insert-only changelog == batch Q3."""
    log = build_changelog(spark, SF_SMOKE)
    assert _rows(q3_on_state(log)) == _rows(q3_shipping_priority(spark, SF_SMOKE))


def test_ivm_stream_matches_batch_state(spark, tmp_path):
    """Micro-batched IVM over the full windowed changelog converges to
    the same Top-20 as the one-shot signed-weight evaluation."""
    n_total = sum(
        load_table(spark, SF_SMOKE, t).count() for t in ("customer", "orders", "lineitem")
    )
    w = (n_total * 2) // 3
    k = n_total + n_total // 2
    log = build_changelog(spark, SF_SMOKE, window=w).filter(F.col("seq") <= k)

    changelog_dir = str(tmp_path / "changelog")
    # Many files → many micro-batches, deliberately unordered vs seq.
    log.repartition(8).write.parquet(changelog_dir)

    emissions = []
    result = run_streaming_q3(
        spark,
        changelog_dir,
        str(tmp_path / "state"),
        files_per_trigger=2,
        on_progress=lambda e, df: emissions.append(e),
    )
    assert len(emissions) >= 3, "expected multiple micro-batches"
    assert _rows(result) == _rows(q3_on_state(log))


def test_native_streaming_windowed_agg(spark, tmp_path):
    """Structured Streaming tumbling-window aggregation with watermark
    over the events table == its batch equivalent (idiomatic-Spark
    upgrade of the reference's processing-time-only semantics,
    SURVEY §2.9)."""
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_src")
    # One file per ~week, written in chronological order (increasing
    # mtime) so micro-batches advance event time monotonically — a
    # realistic stream; random file order would legitimately drop
    # whole out-of-order chunks past the watermark.
    for lo, hi in (("2024-01-01", "2024-01-08"), ("2024-01-08", "2024-01-15"),
                   ("2024-01-15", "2024-01-22"), ("2024-01-22", "2024-02-01")):
        (events.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
         .coalesce(1).write.mode("append").parquet(src))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # Watermarks require TIMESTAMP (with local tz); session tz is UTC.
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.col("window.start").alias("day"), "event_type", "n", "v")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_agg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT day, event_type, n, round(v, 4) AS v FROM win_agg")
    want = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    # Watermark in append mode withholds the final (unclosed) window;
    # compare on the windows the stream emitted.
    got_rows = {tuple(r[:2]): tuple(r) for r in got.collect()}
    want_rows = {tuple(r[:2]): tuple(r) for r in want.collect()}
    assert got_rows, "stream emitted nothing"
    for key, row in got_rows.items():
        assert row == want_rows[key]
    # The final day's windows stay open at the last watermark (5 event
    # types × 1 day) — correct append-mode behavior.
    assert len(got_rows) >= len(want_rows) - 5


def test_native_streaming_session_window(spark, tmp_path):
    """session_window(ts, gap) streaming aggregation == the batch
    sessionization operator (suite_relational.sessionize_events) on
    session counts per user."""
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_relational import (
        sessionize_events,
    )

    events = load_table(spark, SF_SMOKE, "events")
    # A far-future sentinel event (excluded below) pushes the final
    # watermark past every real session so append mode closes them all;
    # everything ships as ONE file/batch so nothing is ever late.
    sentinel = spark.createDataFrame(
        [(-1, "2024-06-01 00:00:00", -1, "click", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    src = str(tmp_path / "sess_src")
    events.unionByName(sentinel).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_win")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events "
        "FROM sess_win WHERE user_id >= 0 GROUP BY user_id"
    )
    want = (
        sessionize_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got.collect()}
    e = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in want.collect()}
    assert g == e


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicates split across micro-batches must still dedupe: the
    watermarked fingerprint state survives between triggers, and the
    survivor set equals the batch exact-dedup canonicals."""
    from query_processing_over_streaming_data_using_flink_spark.streaming import dedup as sdd

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    src = str(tmp_path / "docs_src")
    # Same-content duplicates land in BOTH files; ts within one hour so
    # the watermark horizon covers the whole replay.
    half = docs.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    (half.coalesce(1).write.mode("append").parquet(src))
    (half.withColumn("ts", F.lit("2024-01-01 00:30:00").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdd.streaming_exact_dedup(stream, delay="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT fingerprint, count(*) AS n FROM stream_dedup GROUP BY fingerprint")
    assert got.filter(F.col("n") > 1).count() == 0, "a fingerprint was emitted twice"
    n_distinct = (
        sdd.with_fingerprint(docs).select("fingerprint").distinct().count()
    )
    assert got.count() == n_distinct, "survivor set != batch distinct fingerprints"


def test_streaming_near_dedup_across_batches(spark, tmp_path):
    """Band-ownership state must persist across micro-batches: exact
    dups and a 1-word-changed near-dup arriving in a later batch get
    flagged against their batch-1 canonicals; fresh docs are admitted."""
    from query_processing_over_streaming_data_using_flink_spark.streaming.dedup import (
        IncrementalNearDedup,
    )

    base = [" ".join(f"w{i}t{j}" for j in range(30)) for i in range(10)]
    b1 = spark.createDataFrame(
        [(i, base[i]) for i in range(10)], "doc_id long, text string"
    )
    near = base[1].replace("w1t15", "CHANGED")
    b2 = spark.createDataFrame(
        [(10, base[0]), (11, base[0]), (12, near),
         (13, " ".join(f"zz{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    h = IncrementalNearDedup(spark, str(tmp_path / "state"))
    v1 = {r["doc_id"]: r["dup_of"] for r in h.process_batch(b1, 0).collect()}
    assert all(v is None for v in v1.values()), "batch 1 docs are all originals"
    v2 = {r["doc_id"]: r["dup_of"] for r in h.process_batch(b2, 1).collect()}
    assert v2[10] == 0 and v2[11] == 0, "exact dups flag their canonical"
    assert v2[12] == 1, "near-dup flags its canonical"
    assert v2[13] is None, "unrelated doc admitted"


def test_ivm_merge_is_o_delta(spark, tmp_path):
    """Round-2 scale mandate: per-epoch merge cost must not scale with
    state size. Seeded with the full sf0.001 changelog, a follow-up
    delta touching ONE new customer key must (a) rewrite only that key's
    bucket directory of the c table, (b) leave every file of every other
    bucket/table byte-identical in place, and (c) read the state tables
    through dynamic-partition-pruned scans."""
    import pathlib

    from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import (
        IncrementalQ3,
        NUM_BUCKETS,
    )

    state = tmp_path / "state"
    pipe = IncrementalQ3(spark, str(state))
    pipe.process_batch(build_changelog(spark, SF_SMOKE), 0)

    def snapshot():
        return {
            str(p.relative_to(state)): p.stat().st_mtime_ns
            for p in pathlib.Path(state).rglob("*")
            if p.is_file() and "_tmp_" not in str(p)
        }

    before = snapshot()
    assert before, "seed epoch must have written state"

    # A customer key absent from the data: delta_r is empty, so ONLY the
    # c table's single bucket for this key may change.
    new_key = 10**9 + 7
    batch = spark.createDataFrame(
        [(1, "customer", new_key, "BUILDING")],
        "op int, relation string, custkey long, mktsegment string",
    ).selectExpr(
        "op", "relation", "custkey", "mktsegment",
        "CAST(NULL AS BIGINT) AS orderkey", "CAST(NULL AS BIGINT) AS o_custkey",
        "CAST(NULL AS TIMESTAMP_NTZ) AS orderdate", "CAST(NULL AS INT) AS linenumber",
        "CAST(NULL AS DOUBLE) AS extendedprice", "CAST(NULL AS DOUBLE) AS discount",
        "CAST(NULL AS TIMESTAMP_NTZ) AS shipdate",
    )
    # Plan shape check: the state restriction must be dynamic-partition-pruned.
    dc, do, dl = pipe._spill_deltas(*pipe._split(batch))
    restricted = pipe._restrict(pipe._read("c"), dc)
    plan = restricted._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    pipe.process_batch(batch, 1)
    after = snapshot()

    bucket = None
    for path in set(after) - set(before):
        assert path.startswith("c/bucket="), f"unexpected new file {path}"
        bucket = path.split("/")[1]
    assert bucket is not None, "the touched bucket must have been rewritten"
    changed = {
        p for p in before
        if p in after and after[p] != before[p]
    }
    assert not {p for p in changed if not p.startswith(f"c/{bucket}")}, changed
    untouched_gone = {
        p for p in set(before) - set(after) if not p.startswith(f"c/{bucket}")
    }
    assert not untouched_gone, untouched_gone
    # And the new key is in state with weight 1.
    got = pipe._read("c").filter(F.col("c_custkey") == new_key).collect()
    assert [(r["c_custkey"], r["w_c"]) for r in got] == [(new_key, 1)]
