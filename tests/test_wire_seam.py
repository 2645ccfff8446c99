"""The Kafka seam, executable: `streaming/drain.py` claims the
file→Kafka swap happens in one place. This test proves it by driving a
production streaming face (the `IncrementalGroupedAgg` monthly revenue
rollup) from a real TCP SOCKET through the reference wire parser
(`sources/wire.py:parse_stream_lines`, the same parser a Kafka value
column would route through) — no file source anywhere in the stream —
and requiring bit-equality with the batch evaluation of the same
lines. Only the source construction differs from the file-based
stream==batch tests; the handler is byte-for-byte the same object.
"""

from __future__ import annotations

import socket
import threading

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _serve_lines(lines: list[str]) -> tuple[int, threading.Event]:
    """One-shot line server: accepts a single connection, writes every
    line, then HOLDS the socket open (EOF would make Spark's socket
    source reconnect and see a fresh server = duplicated data) until
    the returned event is set."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    release = threading.Event()

    def run() -> None:
        conn, _ = srv.accept()
        try:
            conn.sendall(("\n".join(lines) + "\n").encode())
            release.wait(timeout=180)
        finally:
            conn.close()
            srv.close()

    threading.Thread(target=run, daemon=True).start()
    return port, release


def test_socket_wire_stream_matches_batch(spark, tmp_path):
    from query_processing_over_streaming_data_using_flink_spark.sources import wire
    from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
    from query_processing_over_streaming_data_using_flink_spark.streaming.drain import (
        drain_unbounded_source,
    )
    from query_processing_over_streaming_data_using_flink_spark.streaming.incragg import (
        monthly_revenue_delta,
        monthly_revenue_rollup,
        present_monthly_revenue,
    )

    # Wire-format lines with inserts AND deletes interleaved (window <
    # stream length), truncated mid-drain so the final state is
    # non-trivial.
    log = build_changelog(spark, SF_SMOKE, window=1000).filter(F.col("seq") <= 4000)
    lines = [r["value"] for r in wire.format_stream_lines(log).collect()]
    port, release = _serve_lines(lines)

    # The stream: socket -> wire parser -> the SAME foreachBatch
    # handler the file-based faces use. No file source.
    parsed = wire.parse_stream_lines(
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    pipe = monthly_revenue_rollup(spark, str(tmp_path / "state"))
    seen = {"rows": 0}

    def handle(batch, epoch_id):
        # Socket micro-batches are memory-backed, so the extra count
        # does not re-read the source.
        n = batch.count()
        pipe.process_batch(batch, epoch_id)
        # Count only AFTER the fold is committed: done() firing mid-
        # write would let the poll loop stop() the query and cancel the
        # state commit it is waiting for.
        seen["rows"] += n

    try:
        drain_unbounded_source(
            parsed,
            handle,
            done=lambda: seen["rows"] >= len(lines),
            timeout_sec=120.0,
        )
    finally:
        release.set()
    assert seen["rows"] == len(lines)  # nothing duplicated by a reconnect

    # Batch evaluation of the very same lines (delta of one batch == the
    # aggregate), via the batch wire parser.
    batch_lines = spark.createDataFrame([(ln,) for ln in lines], "value string")
    expect = {
        str(r["ship_month"]): (r["net_lines"], r["gross_cents"], r["disc_cents"])
        for r in monthly_revenue_delta(wire.parse_stream_lines(batch_lines))
        .filter(F.col("net_lines") != 0)
        .collect()
    }
    got = {
        str(r["ship_month"]): (r["net_lines"], r["gross_cents"], r["disc_cents"])
        for r in pipe.result().filter(F.col("net_lines") != 0).collect()
    }
    assert got == expect and len(got) > 0

    # And the user-facing de-quantized view agrees with the same view
    # over the batch fold.
    stream_view = {
        str(r["ship_month"]): (r["gross_revenue"], r["disc_revenue"])
        for r in present_monthly_revenue(pipe.result()).collect()
    }
    batch_view = {
        str(r["ship_month"]): (r["gross_revenue"], r["disc_revenue"])
        for r in present_monthly_revenue(
            monthly_revenue_delta(wire.parse_stream_lines(batch_lines))
        ).collect()
    }
    assert stream_view == batch_view
