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

import base64
import hmac
import itertools
import os
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# parity with the reference's accessDeniedError (server/auth.go:127-132)
UNAUTHORIZED_BODY = b'{"ok":false, "error":"access denied"}'


@dataclass(frozen=True)
class AuthBehavior:
    """Webhook auth config — behavior-selected like the reference's
    ``authBehavior`` (``server/auth.go:15-21``, selection
    ``server.go:77-87``): ``api-key`` checks every configured header for
    an exact value, ``ip-whitelist`` checks the client IP (first
    ``X-Forwarded-For`` entry, else the socket peer), ``basic-auth``
    checks RFC 7617 credentials. Secret compares are constant-time."""

    behavior: str
    headers: dict[str, str] = field(default_factory=dict)
    whitelist_ips: tuple[str, ...] = ()
    username: str = ""
    password: str = ""

    BEHAVIORS = ("api-key", "ip-whitelist", "basic-auth")

    def __post_init__(self):
        if self.behavior not in self.BEHAVIORS:
            # hard-error parity with server.go:85 ("unknown behavior")
            raise ValueError(f"unknown behavior: {self.behavior}")

    def allows(self, headers, client_ip: str) -> bool:
        # compare_digest on str raises TypeError for non-ASCII input; the
        # reference never errors (auth.go:55-73), so compare UTF-8 bytes.
        def _eq(a: str, b: str) -> bool:
            return hmac.compare_digest(a.encode("utf-8"), b.encode("utf-8"))

        if self.behavior == "api-key":
            return all(
                _eq(headers.get(k) or "", v) for k, v in self.headers.items()
            )
        if self.behavior == "ip-whitelist":
            xff = headers.get("X-Forwarded-For") or ""
            # empty first XFF entry (", 10.0.0.7") falls back to the socket
            # peer, matching getClientIP (auth.go:104-125)
            ip = (xff.split(",")[0].strip() if xff.strip() else "") or client_ip
            return ip in set(self.whitelist_ips)
        auth = headers.get("Authorization") or ""
        if not auth.startswith("Basic "):
            return False
        try:
            decoded = base64.b64decode(auth[len("Basic "):], validate=True)
            user, _, pw = decoded.decode("utf-8").partition(":")
        except Exception:
            return False
        if not _:  # no colon: not a credential pair (auth.go:96-99)
            return False
        return _eq(user, self.username) and _eq(pw, self.password)


class WebhookSpool:
    """POST bodies -> one spool file each (atomic tmp+rename so the file
    stream never reads a partial write). Filenames sort in arrival order:
    ``<epoch_ns>-<seq>.jsonl``. ``auth`` (an :class:`AuthBehavior`) guards
    ingest the way the reference's middleware chain does — a rejected
    request gets 401 + the JSON denial body and writes nothing."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        auth: AuthBehavior | None = None,
    ):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._seq = itertools.count()
        self._received = 0
        self._denied = 0
        self._lock = threading.Lock()  # handlers run on server threads
        spool = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib casing)
                if auth is not None and not auth.allows(
                    self.headers, self.client_address[0]
                ):
                    with spool._lock:
                        spool._denied += 1
                    self.send_response(401)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(UNAUTHORIZED_BODY)))
                    self.end_headers()
                    self.wfile.write(UNAUTHORIZED_BODY)
                    return
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

    @property
    def denied(self) -> int:
        return self._denied

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
