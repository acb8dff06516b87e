"""Inbound HTTP (webhook) source — the reference's ``http_server`` task
(``internal/pkg/pipeline/task/http/server.go``): an endpoint that accepts
POSTed records and feeds them into the pipeline.

Spark has no push-based server source, so the idiomatic mapping is a
**spool bridge**: the embedded stdlib HTTP server writes each request body
as an atomically-renamed file in a spool directory, and Structured
Streaming tails that directory (``spark.readStream`` /
``streaming.apply.stream_changelog``) — push ingestion becomes the
pull-based file stream every other source already uses, checkpointing and
exactly-once included. On a real deployment the same spool shape is
produced by an API gateway writing to object storage; this class is the
single-node stand-in with identical on-disk contract.
"""

from __future__ import annotations

import itertools
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class WebhookSpool:
    """POST bodies -> one spool file each (atomic tmp+rename so the file
    stream never reads a partial write). Filenames sort in arrival order:
    ``<epoch_ns>-<seq>.jsonl``."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._seq = itertools.count()
        self._received = 0
        self._lock = threading.Lock()  # handlers run on server threads
        spool = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib casing)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                name = f"{time.time_ns()}-{next(spool._seq):06d}.jsonl"
                tmp = os.path.join(spool.spool_dir, f".{name}.tmp")
                final = os.path.join(spool.spool_dir, name)
                with open(tmp, "wb") as f:
                    f.write(body if body.endswith(b"\n") else body + b"\n")
                os.rename(tmp, final)  # atomic: readers never see partials
                with spool._lock:
                    spool._received += 1
                self.send_response(202)
                self.end_headers()
                self.wfile.write(b"accepted")

            def log_message(self, *a):  # quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    @property
    def received(self) -> int:
        return self._received

    def start(self) -> "WebhookSpool":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
