"""Minimal stdlib WebSocket push server for the live Top-N dashboard —
the engine's counterpart of the reference's hand-rolled NIO server
(`/root/reference/src/main/java/org/example/TPCHQuery3_StreamProcessor.java:584-974`
serves the Top-20 JSON payload to a browser over RFC 6455).

Implemented from the public RFC 6455 spec with `socket` + `threading`
only (the `websockets` package is not available in this environment):

* HTTP Upgrade handshake: `Sec-WebSocket-Accept` =
  base64(sha1(key + RFC GUID)).
* Server→client TEXT frames, unmasked (per spec, servers MUST NOT
  mask); 7/16/64-bit payload-length encodings.
* Client frames are drained only for CLOSE (we are a pure push
  channel, like the reference's broadcaster).
* A plain GET (no `Upgrade` header) is answered with an embedded
  single-page dashboard that connects back over WebSocket — one port
  serves both the page and the feed.

This is demo/serving infrastructure, not a query operator: the payload
comes from `sinks.topn_json_payload` (field-compatible with the
reference's broadcast, `TPCHQuery3_StreamProcessor.java:1036-1055`).
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

_DASHBOARD_HTML = """<!DOCTYPE html>
<html>
<head><meta charset="utf-8"><title>Q3 Top-20 live</title>
<style>
 body { font-family: monospace; margin: 2rem; background: #111; color: #eee; }
 table { border-collapse: collapse; }
 td, th { padding: 2px 12px; border-bottom: 1px solid #333; text-align: right; }
 th { color: #8bf; } #ts { color: #888; }
</style></head>
<body>
<h3>TPC-H Q3 — live Top-20 (streaming IVM)</h3>
<div id="ts">waiting for data…</div>
<table><thead><tr><th>rank</th><th>orderkey</th><th>revenue</th>
<th>orderdate</th><th>pri</th></tr></thead><tbody id="rows"></tbody></table>
<h3>pipeline</h3>
<div id="pipeline" style="display:flex;align-items:center;flex-wrap:wrap;gap:4px">
waiting for first epoch…</div>
<div id="epoch" style="color:#888"></div>
<h3>system metrics</h3>
<div id="spark"></div>
<table><thead><tr><th>thread</th><th>state</th></tr></thead>
<tbody id="threads"></tbody></table>
<script>
 const ws = new WebSocket("ws://" + location.host + "/");
 let prevRanks = {};  // orderkey -> rank of the previous frame
 ws.onmessage = (ev) => {
   const msg = JSON.parse(ev.data);
   if (msg.type === "pipeline") {
     // job-graph view: one box per operator node with its per-epoch
     // row count (reference DAG's per-node event counters), arrows
     // between
     document.getElementById("pipeline").innerHTML = msg.nodes.map(n =>
       `<span style="border:1px solid ${n.status === "ok" ? "#4a4" : "#a44"};` +
       `border-radius:4px;padding:2px 8px;background:#1a2a1a;text-align:center">` +
       `${n.name}` +
       (n.count == null ? "" :
         `<br><span class="nodecount" style="color:#8bf">${n.count.toLocaleString()}</span>`) +
       `</span>`
     ).join(`<span style="color:#8bf">→</span>`);
     document.getElementById("epoch").textContent = `epoch ${msg.epoch}`;
     return;
   }
   if (msg.type === "threads") {
     // system-metrics channel (reference dashboard parity)
     if (msg.spark) document.getElementById("spark").textContent =
       `jobs: ${msg.spark.activeJobs.length}  stages: ` +
       `${msg.spark.activeStages.length}  tasks: ${msg.spark.numActiveTasks}`;
     document.getElementById("threads").innerHTML = msg.data.map(t =>
       `<tr><td>${t.name}</td><td>${t.state}</td></tr>`).join("");
     return;
   }
   document.getElementById("ts").textContent =
     new Date(msg.timestamp).toISOString();
   // Rank-change coloring (reference dashboard's rank animations):
   // green = climbed or entered, red = fell, default = unchanged.
   const color = (r) => {
     const p = prevRanks[r.orderkey];
     if (p === undefined) return Object.keys(prevRanks).length ? "#6d6" : "#eee";
     return r.rank < p ? "#6d6" : (r.rank > p ? "#d66" : "#eee");
   };
   document.getElementById("rows").innerHTML = msg.data.map(r =>
     `<tr style="color:${color(r)}"><td>${r.rank}</td><td>${r.orderkey}</td>` +
     `<td>${r.revenue.toFixed(4)}</td>` +
     `<td>${r.orderdate ?? ""}</td><td>${r.shippriority}</td></tr>`).join("");
   prevRanks = Object.fromEntries(msg.data.map(r => [r.orderkey, r.rank]));
 };
</script>
</body></html>
"""


def _accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def _text_frame(payload: str) -> bytes:
    """One unmasked FIN TEXT frame (opcode 0x1)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + data


class TopNWebSocketServer:
    """Threaded broadcast server: `start()`, then `broadcast(json_str)`
    from any thread (e.g. the foreachBatch progress hook); every
    connected dashboard receives the frame. `stop()` closes the socket
    and all clients."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765) -> None:
        self.host = host
        self.port = port
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._server: socket.socket | None = None
        self._stopping = False
        self.last_payload: str | None = None

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> None:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        self.port = srv.getsockname()[1]  # resolve port 0 → ephemeral
        srv.listen(8)
        self._server = srv
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def stop(self) -> None:
        self._stopping = True
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients.clear()
        if self._server is not None:
            self._server.close()

    # -- plumbing ------------------------------------------------------------

    def _accept_loop(self) -> None:
        assert self._server is not None
        while not self._stopping:
            try:
                conn, _ = self._server.accept()
            except OSError:
                return  # socket closed by stop()
            threading.Thread(target=self._handshake, args=(conn,), daemon=True).start()

    def _handshake(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(5.0)
            request = b""
            while b"\r\n\r\n" not in request:
                chunk = conn.recv(4096)
                if not chunk:
                    conn.close()
                    return
                request += chunk
            headers = {}
            for line in request.decode("latin-1").split("\r\n")[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            if "websocket" not in headers.get("upgrade", "").lower():
                # Plain HTTP GET → serve the dashboard page.
                body = _DASHBOARD_HTML.encode("utf-8")
                conn.sendall(
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                    + f"Content-Length: {len(body)}\r\n\r\n".encode("ascii")
                    + body
                )
                conn.close()
                return
            key = headers.get("sec-websocket-key", "")
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
                ).encode("ascii")
            )
            conn.settimeout(None)
            with self._lock:
                self._clients.append(conn)
                replay = self.last_payload
            # Late joiner sees the current standings immediately.
            if replay is not None:
                try:
                    conn.sendall(_text_frame(replay))
                except OSError:
                    self._drop(conn)
        except (OSError, UnicodeDecodeError):
            conn.close()

    def _drop(self, conn: socket.socket) -> None:
        with self._lock:
            if conn in self._clients:
                self._clients.remove(conn)
        conn.close()

    # -- system-metrics monitor ---------------------------------------------

    def start_metrics_monitor(self, spark=None, interval: float = 2.0) -> None:
        """Periodic `{"type":"threads",...}` broadcast — the reference's
        dashboard system-metrics channel
        (`TPCHQuery3_StreamProcessor.java:773-800` monitors every 2 s
        and pushes only when clients are connected; same here). Runs
        until `stop()`."""
        from query_processing_over_streaming_data_using_flink_spark.streaming.sinks import (
            threads_json_payload,
        )

        def loop() -> None:
            import time as _time

            while not self._stopping:
                _time.sleep(interval)
                with self._lock:
                    has_clients = bool(self._clients)
                if has_clients:
                    try:
                        self.broadcast_aux(threads_json_payload(spark))
                    except Exception:
                        pass  # metrics are best-effort, never kill the feed

        threading.Thread(target=loop, daemon=True).start()

    def broadcast_aux(self, payload: str) -> int:
        """Broadcast WITHOUT updating the Top-N replay payload (metrics
        frames must not replace the standings a late joiner receives)."""
        frame = _text_frame(payload)
        with self._lock:
            clients = list(self._clients)
        sent = 0
        for c in clients:
            try:
                c.sendall(frame)
                sent += 1
            except OSError:
                self._drop(c)
        return sent

    # -- the push API --------------------------------------------------------

    def broadcast(self, payload: str) -> int:
        """Send one TEXT frame to every connected client; returns the
        number of clients that received it. The payload becomes the
        replay sent to late joiners."""
        self.last_payload = payload
        return self.broadcast_aux(payload)
