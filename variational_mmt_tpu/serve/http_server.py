"""Minimal production HTTP front end over :class:`TranslationService`.

Stdlib-only (``http.server``): each connection is handled on its own
thread, so concurrent clients' requests land in the service queue together
and are coalesced into full device batches by the dynamic batcher — the
HTTP layer itself never touches the device.

Endpoints:

- ``GET /healthz``  -> ``{"ok": true, "model_type": ..., "step": ...}``
- ``GET /stats``    -> service counters (requests, batches, busy_s, ...)
- ``POST /translate`` with JSON body::

      {"texts": ["a sentence", ...],           # required
       "imgs": [[...2048 floats...], ...],     # optional, aligned to texts
       "timeout": 60}                           # optional, seconds

  -> ``{"results": [[{"score": s, "text": t}, ...n-best...], ...]}``

- ``POST /translate`` with ``Content-Type: application/x-msgpack``: the
  same map, but ``imgs`` is ``{"shape": [n, d], "data": <raw float32
  little-endian bytes>}`` and the response is msgpack too. JSON-encoding
  2048 floats per request dominates the HTTP path's cost (measured ~7x
  throughput loss vs the direct queue); the binary format removes it.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

try:
    import msgpack
except ImportError:  # binary wire format degrades to a clean 501
    msgpack = None

from variational_mmt_tpu.serve.service import TranslationService


def make_handler(service: TranslationService, info: dict):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _msgpack(self, code: int, payload: dict) -> None:
            body = msgpack.packb(payload)
            self.send_response(code)
            self.send_header("Content-Type", "application/x-msgpack")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **info})
            elif self.path == "/stats":
                with service._stats_lock:
                    self._json(200, dict(service.stats))
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            binary = "msgpack" in (self.headers.get("Content-Type") or "")
            if binary and msgpack is None:
                # must still drain the body: leftover bytes desync keep-alive
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                self._json(501, {"error": "msgpack not available on this server"})
                return
            reply = self._msgpack if binary else self._json
            if self.path != "/translate":
                # drain before replying (keep-alive connections would parse
                # the unread body as the next request line otherwise)
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                if binary:
                    req = msgpack.unpackb(raw or b"\x80")
                else:
                    req = json.loads(raw or b"{}")
                texts = req["texts"]
                if not isinstance(texts, list) or not all(isinstance(t, str) for t in texts):
                    raise ValueError("'texts' must be a list of strings")
                imgs = req.get("imgs")
                if imgs is not None:
                    if binary:
                        # {"shape": [n, d...], "data": raw f32 LE bytes}
                        imgs = np.frombuffer(imgs["data"], dtype="<f4").reshape(
                            imgs["shape"]
                        )
                    else:
                        imgs = np.asarray(imgs, np.float32)
                    if len(imgs) != len(texts):
                        raise ValueError("'imgs' must align to 'texts'")
                timeout = float(req.get("timeout", 60.0))
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                reply(400, {"error": str(e)})
                return
            try:
                out = service.translate_text(texts, imgs, timeout=timeout)
            except Exception as e:  # noqa: BLE001 — surface to the client
                reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            reply(200, {
                "results": [
                    [{"score": s, "text": t} for s, t in nbest] for nbest in out
                ]
            })

    return Handler


class ServingServer:
    """Owns the ThreadingHTTPServer; ``start()`` returns immediately (serve
    loop on a daemon thread) so tests and embedding apps can drive it."""

    def __init__(self, service: TranslationService, host: str = "127.0.0.1",
                 port: int = 8080, info: Optional[dict] = None):
        self.service = service
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(service, info or {})
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="vmmt-http"
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.service.stop()
