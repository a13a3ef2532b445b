"""Minimal HTTP service wrapping the engine — parity with the
reference's Flask app (reference: app.py:1-17: GET/POST
``/graph_creation/<config path>`` shells out to the rdfizer; ``/`` is a
greeting). stdlib-only (no flask in this environment); one SparkSession
is shared across requests, which is also the right Spark shape — session
startup dominates small jobs.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlparse

GREETING = "Welcome to the Rdf Graph Service"


def make_handler(spark, semantify_fn=None):
    from .engine import semantify as _semantify

    run = semantify_fn or _semantify
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, text: str) -> None:
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _handle(self) -> None:
            path = urlparse(self.path).path
            if path == "/":
                self._reply(200, GREETING)
                return
            if path.startswith("/graph_creation/"):
                config = "/" + unquote(path[len("/graph_creation/"):])
                try:
                    with lock:   # one materialization at a time per service
                        run(config, spark)
                except Exception as e:   # noqa: BLE001 — surface to client
                    self._reply(500, f"semantification failed: {e}\n")
                    return
                self._reply(200, f"The file has been semantified {config}\n")
                return
            self._reply(404, "not found\n")

        do_GET = _handle
        do_POST = _handle

        def log_message(self, *args):   # quiet like a library should be
            pass

    return Handler


def serve(spark, host: str = "127.0.0.1", port: int = 4000):
    """Blocking server entry. The reference binds 0.0.0.0 (its Flask
    app.run default) — loopback here because /graph_creation accepts
    filesystem paths with no auth (ADVICE r2); pass host="0.0.0.0"
    explicitly to expose it."""
    server = ThreadingHTTPServer((host, port), make_handler(spark))
    server.serve_forever()


def start_background(spark, host: str = "127.0.0.1", port: int = 0):
    """Non-blocking start; returns the server (``.server_port``,
    ``.shutdown()``)."""
    server = ThreadingHTTPServer((host, port), make_handler(spark))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
