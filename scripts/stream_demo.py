"""Live streaming Q3 demo — the engine's equivalent of the reference's
`run_realtime_demo.sh` + WebSocket dashboard pipeline
(`TPCHQuery3_StreamProcessor.java`): generate the changelog, stream it
in micro-batches, maintain Q3 incrementally, and emit the Top-20 every
batch to the console and a JSON-lines feed (tail it, or point any
dashboard/websocket shim at it).

Usage:
    python scripts/stream_demo.py [sf_dir] [--window FRACTION] [--json PATH]
                                  [--serve PORT [--linger SEC]]

With --serve, a stdlib WebSocket server broadcasts each epoch's Top-20
payload; open http://127.0.0.1:PORT/ in a browser for the live
dashboard (the reference's run_realtime_demo.sh + simple_index.html
experience).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_processing_over_streaming_data_using_flink_spark.session import get_spark
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import run_streaming_q3
from query_processing_over_streaming_data_using_flink_spark.streaming.sinks import (
    ConsoleTopNSink,
    JsonLinesTopNSink,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--window", type=float, default=0.66, help="sliding window as fraction of inserts")
    ap.add_argument("--json", default=None, help="JSON-lines output path")
    ap.add_argument("--files-per-trigger", type=int, default=2)
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="serve dashboard + WebSocket Top-20 feed on this port")
    ap.add_argument("--linger", type=float, default=30.0,
                    help="with --serve: seconds to keep serving after the drain")
    args = ap.parse_args()

    server = None
    if args.serve is not None:
        from query_processing_over_streaming_data_using_flink_spark.streaming.websocket import (
            TopNWebSocketServer,
        )

        server = TopNWebSocketServer(port=args.serve)
        server.start()
        print(f"dashboard: http://127.0.0.1:{server.port}/  (WebSocket on the same port)")

    spark = get_spark("stream_demo")
    if server is not None:
        # System-metrics channel (reference dashboard parity): periodic
        # {"type":"threads",...} frames with Spark job/stage counts.
        server.start_metrics_monitor(spark)
    work = tempfile.mkdtemp(prefix="streamq_demo_")
    try:
        n_total = sum(
            load_table(spark, args.sf_dir, t).count()
            for t in ("customer", "orders", "lineitem")
        )
        window = int(n_total * args.window)
        print(f"generating changelog: {n_total} inserts, window={window} → {2*n_total} events")
        log = build_changelog(spark, args.sf_dir, window=window, pin=False)
        changelog_dir = os.path.join(work, "changelog")
        log.repartition(16).write.parquet(changelog_dir)

        console = ConsoleTopNSink()
        json_sink = JsonLinesTopNSink(args.json) if args.json else None

        def progress(epoch: int, top, stats=None) -> None:
            console(epoch, top)
            if json_sink:
                json_sink(epoch, top)
            if server is not None:
                from query_processing_over_streaming_data_using_flink_spark.streaming.sinks import (
                    pipeline_json_payload,
                    topn_json_payload,
                )

                n = server.broadcast(topn_json_payload(top))
                # Job-graph view (reference dashboard parity): one
                # pipeline frame per epoch with per-node row counts,
                # not replayed to late joiners.
                server.broadcast_aux(pipeline_json_payload(epoch, stats=stats))
                print(f"  → pushed epoch {epoch} to {n} websocket client(s)")

        final = run_streaming_q3(
            spark,
            changelog_dir,
            os.path.join(work, "state"),
            files_per_trigger=args.files_per_trigger,
            on_progress=progress,
        )
        print("=== final Top-20 (post-drain state) ===")
        final.show(20, False)
        if server is not None and args.linger > 0:
            import time

            print(f"serving dashboard for {args.linger:.0f}s more (Ctrl-C to stop)")
            try:
                time.sleep(args.linger)
            except KeyboardInterrupt:
                pass
    finally:
        if server is not None:
            server.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
