"""Continuous-trigger soak demonstration — the reference's live
pipeline shape, run for real against a rate-limited replay rather than
an availableNow drain.

Architecture mirrors the reference exactly
(`TPCHQuery3_StreamProcessor.java`):
  * event processing runs continuously — a ``processingTime='1 second'``
    triggered stream consumes changelog files as a feeder thread drips
    them into a watched directory (simulating live CDC arrival), and
    each micro-batch updates state through the O(delta) IVM pipeline;
  * Top-N emission runs on an INDEPENDENT processing-time timer
    (reference: 1-3 s timers, `:988,:521`) — every 2 s an emitter
    thread reads the current state and appends one timestamped Top-20
    JSON payload, regardless of where event processing is.

After the feed drains, the final state's Top-20 is checked against the
one-shot batch evaluation of the same changelog (the reference's
convergence criterion, README.md:154-159).

Usage:
    python scripts/soak_demo.py [sf_dir] [--seconds 30] [--out PATH]

Artifact: JSON lines, one per emission —
    {"tick": ..., "wall_ms": ..., "epochs_done": ..., "top": [...]}
plus a trailing summary line {"summary": {...}}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_processing_over_streaming_data_using_flink_spark.session import get_spark
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import IncrementalQ3
from query_processing_over_streaming_data_using_flink_spark.streaming.retraction import q3_on_state

EMIT_EVERY_S = 2.0  # the reference's Top-N timer cadence (1-3 s)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--seconds", type=float, default=30.0, help="feed duration")
    ap.add_argument("--files", type=int, default=24, help="changelog part files")
    ap.add_argument("--out", default=None, help="emissions JSONL path")
    args = ap.parse_args()

    spark = get_spark("soak_demo")
    # Tiny per-batch data: small shuffles keep epoch latency low.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    work = tempfile.mkdtemp(prefix="soak_")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out", "soak_emissions.jsonl"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    open(out_path, "w").close()

    try:
        n_total = sum(
            load_table(spark, args.sf_dir, t).count()
            for t in ("customer", "orders", "lineitem")
        )
        window = (n_total * 2) // 3
        log = build_changelog(spark, args.sf_dir, window=window, pin=False)
        staged = os.path.join(work, "staged")
        live = os.path.join(work, "live")
        os.makedirs(live)
        log.repartition(args.files).write.parquet(staged)
        parts = sorted(glob.glob(os.path.join(staged, "part-*")))
        print(f"staged {len(parts)} files, {2 * n_total} events; feeding over ~{args.seconds}s")

        interval = args.seconds / len(parts)
        feed_done = threading.Event()
        stop_emitter = threading.Event()

        def feeder() -> None:
            for p in parts:
                shutil.move(p, os.path.join(live, os.path.basename(p)))
                time.sleep(interval)
            feed_done.set()

        pipe = IncrementalQ3(spark, os.path.join(work, "state"))
        t0 = time.time()
        epochs_done = [0]
        emissions: list[dict] = []

        def handle(batch, epoch_id: int) -> None:
            pipe.process_batch(batch, epoch_id)
            epochs_done[0] += 1

        def emitter() -> None:
            tick = 0
            while not stop_emitter.is_set():
                time.sleep(EMIT_EVERY_S)
                tick += 1
                with pipe.swap_lock:
                    rows = pipe.top_n(20).collect()
                top = [
                    {
                        "rank": i,
                        "orderkey": r["l_orderkey"],
                        "revenue": round(r["revenue"], 4),
                        "orderdate": str(r["o_orderdate"].date()),
                    }
                    for i, r in enumerate(rows, 1)
                ]
                rec = {
                    "tick": tick,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "epochs_done": epochs_done[0],
                    "top": top,
                }
                emissions.append(rec)
                with open(out_path, "a", encoding="utf-8") as fh:
                    fh.write(json.dumps(rec) + "\n")
                lead = top[0] if top else None
                print(f"[{rec['wall_ms']/1000:7.2f}s] tick {tick} "
                      f"(epochs {epochs_done[0]}): top1={lead}")

        schema = spark.read.parquet(staged).schema
        query = (
            spark.readStream.schema(schema)
            .parquet(live)
            .writeStream.foreachBatch(handle)
            .trigger(processingTime="1 second")
            .start()
        )
        threading.Thread(target=feeder, daemon=True).start()
        threading.Thread(target=emitter, daemon=True).start()
        feed_done.wait()
        # Let the trigger drain whatever arrived last, then stop.
        time.sleep(8)
        query.stop()
        query.awaitTermination()
        stop_emitter.set()

        want = sorted(
            (r["l_orderkey"], round(r["revenue"], 2), str(r["o_orderdate"]))
            for r in q3_on_state(log).collect()
        )
        got = sorted(
            (r["l_orderkey"], round(r["revenue"], 2), str(r["o_orderdate"]))
            for r in pipe.top_n(20).collect()
        )
        gaps = [b["wall_ms"] - a["wall_ms"] for a, b in zip(emissions, emissions[1:])]
        summary = {
            "emissions": len(emissions),
            "median_gap_ms": sorted(gaps)[len(gaps) // 2] if gaps else None,
            "epochs": epochs_done[0],
            "converged": got == want,
            "events": 2 * n_total,
        }
        with open(out_path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps({"summary": summary}) + "\n")
        print(json.dumps({"summary": summary}))
        return 0 if summary["converged"] and len(emissions) >= 5 else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
