"""HTTP client bindings for :mod:`hunt_ray.server` — the analog of
``hunt-client/src/Hunt/Client.hs`` over the shim's REST routes.

Thin stdlib wrapper: each method returns the decoded ``msg`` payload of
the server's ``{"code": 0, "msg": …}`` envelope, raising
:class:`HuntClientError` on non-zero codes or transport errors.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request


class HuntClientError(RuntimeError):
    pass


class HuntClient:
    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _decode(self, raw: bytes) -> dict:
        payload = json.loads(raw)
        if payload.get("code") != 0:
            raise HuntClientError(str(payload.get("msg")))
        return payload["msg"]

    def _get(self, path: str) -> dict:
        try:
            with urllib.request.urlopen(self.base + path,
                                        timeout=self.timeout) as r:
                return self._decode(r.read())
        except urllib.error.HTTPError as e:
            raise HuntClientError(e.read().decode("utf-8", "replace")) from e

    def search(self, query, offset: int = 0, max: int = 20) -> dict:
        """GET /search/<query>/<offset>/<max> — accepts a query string or a
        builder AST (rendered via render_query)."""
        from .query.parser import render_query

        q = query if isinstance(query, str) else render_query(query)
        return self._get(f"/search/{urllib.parse.quote(q, safe='')}"
                         f"/{offset}/{max}")

    def complete(self, query, max: int = 20) -> list[dict]:
        from .query.parser import render_query

        q = query if isinstance(query, str) else render_query(query)
        return self._get(f"/completion/{urllib.parse.quote(q, safe='')}"
                         f"/{max}")["words"]

    def status(self) -> dict:
        return self._get("/status")

    def eval(self, command: dict) -> dict:
        """POST /eval — the full command envelope (insert/delete/search/
        sequence/compact…)."""
        req = urllib.request.Request(
            self.base + "/eval", data=json.dumps(command).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return self._decode(r.read())
        except urllib.error.HTTPError as e:
            raise HuntClientError(e.read().decode("utf-8", "replace")) from e

    def insert(self, uri: str, index: dict, description: dict | None = None,
               weight: float = 0.0) -> dict:
        from .query.commands import CommandInterpreter as C

        return self.eval(C.cmd_insert_doc(uri, index, description, weight))

    def delete(self, uri: str) -> dict:
        from .query.commands import CommandInterpreter as C

        return self.eval(C.cmd_delete_doc(uri))
