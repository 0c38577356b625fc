"""Thin HTTP shim over the command interpreter.

The analog of hunt-server's Warp/Servant routes
(``hunt-server/src/Hunt/Server.hs:87-101``, ``hunt-api/src/Hunt/API.hs:41-48``)
— stdlib-only, mapping the reference's REST surface onto
:class:`hunt_ray.query.commands.CommandInterpreter`:

- ``GET /search/<query>``                     → search (default paging)
- ``GET /search/<query>/<offset>/<max>``      → paged search
- ``GET /completion/<query>/<max>``           → word completions
- ``GET /status``                             → index status
- ``POST /eval``                              → raw command JSON (the full
  envelope, incl. ``sequence`` batching — ``POST /document/insert`` etc.
  are expressible through it like the reference's ``/eval``)

Responses follow the reference's ``{"code": 0, "msg": …}`` envelope
(``Hunt/Server/Common.hs`` JsonResponse): code 0 = success payload, else an
error message. This is a serving convenience, not a scale surface — at real
scale many shim processes would front the same immutable index generation
(reads need no coordination).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from .query.commands import CommandInterpreter


def _ok(payload) -> bytes:
    return json.dumps({"code": 0, "msg": payload}).encode("utf-8")


def _err(msg: str) -> bytes:
    return json.dumps({"code": 1, "msg": msg}).encode("utf-8")


def _make_handler(interp: CommandInterpreter):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # silence per-request stderr noise
            pass

        def _send(self, body: bytes, status: int = 200) -> None:
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib casing)
            parts = [unquote(p) for p in self.path.split("?")[0].split("/") if p]
            try:
                if not parts:
                    self._send(_ok({"endpoints": ["/search", "/completion",
                                                  "/status", "/eval"]}))
                elif parts[0] == "status":
                    self._send(_ok(interp.execute({"cmd": "status"})))
                elif parts[0] == "search" and len(parts) >= 2:
                    cmd = {"cmd": "search", "query": parts[1]}
                    if len(parts) >= 4:
                        cmd["offset"], cmd["max"] = int(parts[2]), int(parts[3])
                    self._send(_ok(interp.execute(cmd)))
                elif parts[0] == "completion" and len(parts) >= 2:
                    cmd = {"cmd": "completion", "query": parts[1]}
                    if len(parts) >= 3:
                        cmd["max"] = int(parts[2])
                    self._send(_ok(interp.execute(cmd)))
                else:
                    self._send(_err(f"unknown route {self.path!r}"), status=404)
            except Exception as e:  # surface as JSON error like the reference
                self._send(_err(str(e)), status=500)

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", "0"))
                cmd = json.loads(self.rfile.read(n) or b"{}")
                if self.path.rstrip("/") == "/eval":
                    self._send(_ok(interp.execute(cmd)))
                else:
                    self._send(_err(f"unknown route {self.path!r}"), status=404)
            except Exception as e:
                self._send(_err(str(e)), status=500)

    return Handler


class HuntServer:
    """Serve a CommandInterpreter over HTTP; ``port=0`` picks a free port."""

    def __init__(self, interp: CommandInterpreter, host: str = "127.0.0.1",
                 port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(interp))
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "HuntServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._httpd.server_close()
