"""Thin HTTP admin service over the crawl's operational surface.

The reference is an express app (`app.js:24-33`) exposing REST routes
over the running crawler service: queue new requests
(`routes/requests.js:23-29`), inspect/manage deadletters
(`routes/deadletters.js`), read service status, and live-patch the
configuration (`routes/config.js` over the redis pub-sub channel,
`lib/crawlerFactory.js:194-251`). The repo's primary surface is the
library + CLI (SURVEY.md §2.9 scopes it that way); this module is the
operator-facing shim that closes the "POST to a running crawl" gap —
a stdlib ``http.server`` wrapper over ``admin.py`` and the hot-config
file channel, good for one operator console, NOT a data-path component
(nothing in the engine depends on it).

Routes (all JSON):
- ``GET  /status``            → SUMMARY.json + per-wave manifest digest
- ``GET  /deadletters[?reason=]`` → deadletter rows
- ``GET  /deadletters/count`` → {"count": n}
- ``DELETE /deadletters``     → body {urls?|reason?} → {"deleted": n}
- ``POST /requests``          → body {seeds: [{url, priority, seq[,
  policy]}...], wave: K[, signature]} → inject into wave K's frontier.
  With a server-side secret configured, the body must carry a valid
  ``admin.webhook_signature`` (`routes/webhook.js:22-38` HMAC-SHA1 +
  constant-time compare); a bad/missing signature is a 401 and the
  payload is deadlettered ``bad_signature``.
- ``PATCH /config``           → body {wave: K, patch: {...}} → validated
  by ``pipelines.wave.coerce_patch`` and written to
  ``config_patches/wave=K.json``, which a running / resumed engine
  applies before wave K (the pub-sub patch analogue).

Auth scope note: only ``POST /requests`` is HMAC-checked (mirroring the
reference, whose webhook route is the signed one while admin routes sit
behind a fronting proxy's token auth, `middleware/auth.js`); bind to
loopback (the default) for the rest.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import pandas as pd

from . import admin
from .pipelines.wave import coerce_patch


def _seeds_frame(rows: list[dict]) -> pd.DataFrame:
    df = pd.DataFrame(rows)
    for col in ("url", "priority", "seq"):
        if col not in df:
            raise ValueError(f"seed rows need a {col!r} field")
    return df


class AdminHandler(BaseHTTPRequestHandler):
    """One handler class per server instance via ``make_server`` — the
    out_dir/secret ride on the class, keeping stdlib wiring trivial."""

    out_dir: Path
    secret: str | None
    server_version = "ghcrawler-ray-admin/1"

    # -- plumbing ------------------------------------------------------
    def log_message(self, fmt, *args):   # quiet by default
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b"{}"
        return json.loads(raw or b"{}")

    # -- routes --------------------------------------------------------
    def do_GET(self):
        u = urlparse(self.path)
        if u.path == "/status":
            return self._json(200, self._status())
        if u.path == "/deadletters/count":
            return self._json(
                200, {"count": admin.count_deadletters(self.out_dir)})
        if u.path == "/deadletters":
            q = parse_qs(u.query)
            reason = q.get("reason", [None])[0]
            df = admin.list_deadletters(self.out_dir, reason=reason)
            return self._json(200, {"deadletters":
                                    df.to_dict(orient="records")})
        self._json(404, {"error": f"no route {u.path}"})

    def do_DELETE(self):
        u = urlparse(self.path)
        if u.path == "/deadletters":
            try:
                body = self._body()
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            n = admin.delete_deadletters(self.out_dir,
                                         urls=body.get("urls"),
                                         reason=body.get("reason"))
            return self._json(200, {"deleted": n})
        self._json(404, {"error": f"no route {u.path}"})

    def do_POST(self):
        u = urlparse(self.path)
        if u.path != "/requests":
            return self._json(404, {"error": f"no route {u.path}"})
        try:
            body = self._body()
            seeds = _seeds_frame(body.get("seeds") or [])
            wave = int(body["wave"])
        except (ValueError, KeyError, TypeError) as e:
            return self._json(400, {"error": str(e)})
        n = admin.inject_seeds(self.out_dir, seeds, wave,
                               secret=self.secret,
                               signature=body.get("signature"))
        if n < 0:
            # rejected + deadlettered 'bad_signature' by inject_seeds —
            # the webhook's 401/400 (`routes/webhook.js:22-27`)
            return self._json(401, {"error": "bad signature",
                                    "injected": 0})
        return self._json(201, {"injected": n, "wave": wave})

    def do_PATCH(self):
        u = urlparse(self.path)
        if u.path != "/config":
            return self._json(404, {"error": f"no route {u.path}"})
        try:
            body = self._body()
            wave = int(body["wave"])
            patch = coerce_patch(dict(body["patch"]))
        except (ValueError, KeyError, TypeError) as e:
            return self._json(400, {"error": str(e)})
        d = self.out_dir / "config_patches"
        d.mkdir(parents=True, exist_ok=True)
        f = d / f"wave={wave}.json"
        merged = json.loads(f.read_text()) if f.exists() else {}
        merged.update(patch)
        f.write_text(json.dumps(merged))
        return self._json(200, {"patched": merged, "wave": wave})

    # -- helpers -------------------------------------------------------
    def _status(self) -> dict:
        out = Path(self.out_dir)
        status: dict = {"out_dir": str(out)}
        summary = out / "SUMMARY.json"
        if summary.exists():
            status["summary"] = json.loads(summary.read_text())
        manis = sorted((out / "manifests").glob("wave=*.json"),
                       key=lambda p: int(p.stem.split("=")[1])) \
            if (out / "manifests").exists() else []
        status["waves_complete"] = len(manis)
        if manis:
            last = json.loads(manis[-1].read_text())
            status["last_wave"] = last
        status["deadletter_count"] = admin.count_deadletters(out)
        return status


def make_server(out_dir: str | Path, host: str = "127.0.0.1",
                port: int = 0, secret: str | None = None
                ) -> ThreadingHTTPServer:
    """Build (not start) the admin server over one crawl out_dir; port 0
    binds an ephemeral port (``server.server_address`` has the real
    one)."""
    handler = type("BoundAdminHandler", (AdminHandler,),
                   {"out_dir": Path(out_dir), "secret": secret})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(out_dir: str | Path, host: str = "127.0.0.1",
                     port: int = 0, secret: str | None = None
                     ) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread (tests / operator consoles);
    call ``server.shutdown()`` to stop."""
    srv = make_server(out_dir, host, port, secret)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
