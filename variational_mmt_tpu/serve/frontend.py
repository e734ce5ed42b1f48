"""HTTP front-end building blocks, shared by the in-process server and the
multi-process dispatchers.

This module must stay **jax-free**: dispatcher processes import it and must
never initialize the device runtime (``run_dispatcher`` is the
``multiprocessing``-spawn entry point).

Endpoints (same surface for both servers):

- ``GET /healthz``  -> ``{"ok": true, "model_type": ..., "step": ...}``
- ``GET /stats``    -> service counters (requests, batches, busy_s, ...)
- ``POST /translate`` with JSON body::

      {"texts": ["a sentence", ...],           # required
       "imgs": [[...2048 floats...], ...],     # optional, aligned to texts
       "sample_ids": [0, 1, ...],              # optional, aligned to texts
       "timeout": 60}                           # optional, seconds

  ``sample_ids`` (sampling services only) keys each sentence's PRNG
  stream: repeating a (text, sample_id) pair reproduces the sampled
  answer regardless of batching; different ids are alternative
  translations. Rejected (400) by deterministic services.

  -> ``{"results": [[{"score": s, "text": t}, ...n-best...], ...]}``

  ``timeout`` is both the result wait AND the shed deadline: a request
  still queued past it is failed server-side (503 "overloaded") instead
  of computed — under overload the queue drains at dispatch speed rather
  than dragging every later request past its own deadline too.

- ``POST /translate`` with ``Content-Type: application/x-msgpack``: the
  same map, but ``imgs`` is ``{"shape": [n, d], "data": <raw float32
  little-endian bytes>}`` and the response is msgpack too. JSON-encoding
  2048 floats per request dominates the HTTP path's cost (measured ~7x
  throughput loss vs the direct queue); the binary format removes it.
"""

from __future__ import annotations

import json
import os
import socket
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

from variational_mmt_tpu.serve.errors import ClientError

try:
    import msgpack
except ImportError:  # binary wire format degrades to a clean 501
    msgpack = None


class Backend:
    """What a handler needs from the world behind it (duck-typed)."""

    def translate(self, texts: List[str], imgs: Optional[np.ndarray],
                  timeout: float,
                  sample_ids: Optional[List[int]] = None,
                  ) -> List[List[Tuple[float, str]]]:
        raise NotImplementedError

    def healthz(self) -> dict:
        raise NotImplementedError

    def stats(self) -> dict:
        raise NotImplementedError


def make_http_handler(backend: Backend):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # largest accepted request body; without a cap every handler thread
        # buffers an attacker-controlled Content-Length in full (OOM). 64 MB
        # comfortably fits batch_size x conv-region f32 features.
        MAX_BODY = int(os.environ.get("VMMT_SERVE_MAX_BODY", 64 * 1024 * 1024))

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
                self._json(200, backend.healthz())
            elif self.path == "/stats":
                self._json(200, backend.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            binary = "msgpack" in (self.headers.get("Content-Type") or "")
            try:
                n_body = int(self.headers.get("Content-Length", 0))
            except ValueError:
                n_body = -1
            if n_body < 0 or n_body > self.MAX_BODY:
                # too large to drain for keep-alive — close the connection
                self.close_connection = True
                self._json(413, {"error": f"request body exceeds "
                                          f"{self.MAX_BODY} bytes"})
                return
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
                sample_ids = req.get("sample_ids")
                if sample_ids is not None:
                    if (not isinstance(sample_ids, list)
                            or not all(isinstance(s, int) for s in sample_ids)):
                        raise ValueError("'sample_ids' must be a list of ints")
                    if len(sample_ids) != len(texts):
                        raise ValueError("'sample_ids' must align to 'texts'")
                timeout = float(req.get("timeout", 60.0))
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                reply(400, {"error": str(e)})
                return
            try:
                out = backend.translate(texts, imgs, timeout,
                                        sample_ids=sample_ids)
            except ClientError as e:  # bad request (e.g. over-length source)
                reply(400, {"error": str(e)})
                return
            except TimeoutError as e:  # overloaded: queued past the client's
                # own timeout and shed (or the result wait expired) — a
                # retryable server condition, not a bug
                reply(503, {"error": f"overloaded: {e}"})
                return
            except Exception as e:  # noqa: BLE001 — surface to the client
                reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            reply(200, {
                "results": [
                    [{"score": s, "text": t} for s, t in nbest] for nbest in out
                ]
            })

    return Handler


class ReuseportHTTPServer(ThreadingHTTPServer):
    """Binds with SO_REUSEPORT so N dispatcher processes share one port and
    the kernel load-balances accepted connections across them."""

    def server_bind(self):
        self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        super().server_bind()


class _DispatcherBackend(Backend):
    """Runs in a dispatcher process: tokenize/BPE locally (each dispatcher
    burns its own GIL, in parallel across processes), forward token lists +
    binary features over the unix-socket RPC.

    When the server ships its vocab tables (``vocabs``), the dispatcher
    upgrades to the id-level wire: it vocab-encodes sources and decodes/
    detoks the returned hypothesis ids itself, so the device-owning process
    touches no text at all — its GIL budget goes entirely to padding and
    device dispatch (docs/perf_notes.md serving ladder)."""

    def __init__(self, rpc_client, bpe_merges, lower: bool, vocabs=None):
        from variational_mmt_tpu.data.tokenizer import tokenize

        self._rpc = rpc_client
        self._tokenize = tokenize
        self._lower = lower
        self._bpe = None
        if bpe_merges is not None:
            from variational_mmt_tpu.data.bpe import BPE

            self._bpe = BPE([tuple(m) for m in bpe_merges])
        self._src_vocab = self._tgt_vocab = None
        if vocabs is not None:
            from variational_mmt_tpu.data.vocab import Vocab

            self._src_vocab = Vocab(vocabs[0])
            self._tgt_vocab = Vocab(vocabs[1])

    def _call(self, payload, timeout):
        resp = self._rpc.call(payload, timeout)
        if "error" in resp:
            if resp["error"].startswith("ClientError:"):
                # re-raise as the client-error type so the handler maps it
                # to a 400 exactly like the in-process backend; server-side
                # ValueErrors deliberately do NOT match (they are bugs, and
                # must surface as 500s, not as the client's fault)
                raise ClientError(resp["error"].split(": ", 1)[1])
            if resp["error"].startswith("TimeoutError:"):
                # shed/expired under load -> 503 (same as in-process)
                raise TimeoutError(resp["error"].split(": ", 1)[1])
            raise RuntimeError(resp["error"])
        return resp

    def translate(self, texts, imgs, timeout, sample_ids=None):
        tokens = []
        for t in texts:
            toks = self._tokenize(t, lower=self._lower)
            if self._bpe is not None:
                toks = self._bpe.segment(toks)
            tokens.append(toks)
        wire = None
        if imgs is not None:
            a = np.ascontiguousarray(imgs, dtype="<f4")
            wire = {"shape": list(a.shape), "data": a.tobytes()}
        if self._src_vocab is not None:
            ids = [self._src_vocab.encode(toks) for toks in tokens]
            resp = self._call(
                {"op": "translate_ids", "ids": ids, "imgs": wire,
                 "timeout": timeout, "sample_ids": sample_ids},
                timeout,
            )
            # Vocab.ids_to_text IS Translator.nbest_to_text's detok (no
            # replace_unk on this wire: the server refuses the ids op when
            # replace_unk is configured)
            return [
                [(s, self._tgt_vocab.ids_to_text(out_ids)) for s, out_ids in nbest]
                for nbest in resp["results"]
            ]
        resp = self._call(
            {"op": "translate_tokens", "tokens": tokens, "imgs": wire,
             "timeout": timeout, "sample_ids": sample_ids},
            timeout,
        )
        return [[(s, t) for s, t in nbest] for nbest in resp["results"]]

    def healthz(self):
        return self._rpc.call({"op": "healthz"}, 10.0)

    def stats(self):
        return self._rpc.call({"op": "stats"}, 10.0)


def run_dispatcher(host: str, port: int, rpc_path: str, bpe_merges,
                   lower: bool, ready, vocabs=None) -> None:
    """multiprocessing-spawn entry point for one HTTP dispatcher process.
    Signals readiness (the bound port) through the ``ready`` pipe end, then
    serves forever; the parent terminates the process on shutdown.
    ``vocabs``: optional (src_itos, tgt_itos) token tables — when present
    the dispatcher runs the id-level wire (see _DispatcherBackend)."""
    from variational_mmt_tpu.serve.rpc import RPCClient

    backend = _DispatcherBackend(RPCClient(rpc_path), bpe_merges, lower,
                                 vocabs=vocabs)
    httpd = ReuseportHTTPServer((host, port), make_http_handler(backend))
    try:
        ready.send(httpd.server_address[1])
        ready.close()
    except (BrokenPipeError, OSError):
        pass  # parent gave up; still serve (it may just be slow)
    httpd.serve_forever()
