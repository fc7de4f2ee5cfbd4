"""Socket sink: executor-side TCP writes (no driver collect).

Mirrors the reference SocketSinkConfig.scala contract: every row arrives
as one newline-delimited JSON record. The server accepts concurrent
connections because each partition opens its own.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


def test_socket_sink_delivers_all_rows_partitioned(spark):
    from flinkrunner_spark.sinks.factory import SocketSinkConfig

    received: list[str] = []
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                with lock:
                    received.append(line.decode().rstrip("\n"))

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server(("localhost", 0), Handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        df = spark.range(0, 500).selectExpr("id", "id * 2 AS twice").repartition(4)
        SocketSinkConfig("test", {"connector": "socket", "port": port}).write(df)
        srv.shutdown()

    rows = sorted(json.loads(r)["id"] for r in received)
    assert rows == list(range(500))
    assert all(
        json.loads(r)["twice"] == 2 * json.loads(r)["id"] for r in received
    )
