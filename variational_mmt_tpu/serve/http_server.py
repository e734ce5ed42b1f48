"""HTTP servers over :class:`TranslationService`.

Two deployment shapes (endpoint surface identical — serve/frontend.py):

- :class:`ServingServer` — single-process ``ThreadingHTTPServer``. Simple,
  zero extra processes; every handler thread contends on this process's
  GIL with tokenization and the service worker (measured at ~1/3 of the
  direct-queue throughput under a 32-client load — docs/perf_notes.md).
- :class:`MPServingServer` — N dispatcher processes sharing one port via
  ``SO_REUSEPORT``; each parses HTTP + body and tokenizes in its own
  interpreter, forwarding token lists + binary features over a unix-socket
  RPC (serve/rpc.py) to the device-owning process. The service process
  spends its GIL only on queue hops, so HTTP throughput approaches the
  direct-queue ceiling.
"""

from __future__ import annotations

import os
import socket
import tempfile
import threading
from typing import List, Optional

import numpy as np

from variational_mmt_tpu.serve.frontend import Backend, make_http_handler
from variational_mmt_tpu.serve.service import TranslationService


class _ServiceBackend(Backend):
    """In-process adapter: handler threads call the service directly."""

    def __init__(self, service: TranslationService, info: dict):
        self.service = service
        self.info = info

    def translate(self, texts: List[str], imgs: Optional[np.ndarray],
                  timeout: float, sample_ids=None):
        return self.service.translate_text(texts, imgs, timeout=timeout,
                                           sample_ids=sample_ids)

    def healthz(self) -> dict:
        return {"ok": True, **self.info}

    def stats(self) -> dict:
        with self.service._stats_lock:
            return dict(self.service.stats)


class ServingServer:
    """Owns the ThreadingHTTPServer; ``start()`` returns immediately (serve
    loop on a daemon thread) so tests and embedding apps can drive it."""

    def __init__(self, service: TranslationService, host: str = "127.0.0.1",
                 port: int = 8080, info: Optional[dict] = None):
        from http.server import ThreadingHTTPServer

        self.service = service
        self.httpd = ThreadingHTTPServer(
            (host, port), make_http_handler(_ServiceBackend(service, info or {}))
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        self._serving = True
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="vmmt-http"
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._serving = True
        self.httpd.serve_forever()

    def stop(self) -> None:
        # shutdown() blocks on an event only serve_forever() ever sets —
        # calling it on a never-started server would hang forever
        if getattr(self, "_serving", False):
            self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.service.stop()


class MPServingServer:
    """Multi-process HTTP front end: ``procs`` dispatcher processes accept
    on one shared port (``SO_REUSEPORT`` — the kernel balances connections),
    each forwarding over a unix-socket RPC to this (device-owning) process.

    The parent holds a bound-but-not-listening socket on the port for its
    whole lifetime: with ``port=0`` this picks the ephemeral port every
    dispatcher then binds, and it keeps the number reserved against reuse
    (a non-listening member of a reuseport group receives no connections).
    """

    def __init__(self, service: TranslationService, host: str = "127.0.0.1",
                 port: int = 0, procs: int = 4, info: Optional[dict] = None):
        import multiprocessing as mp

        from variational_mmt_tpu.serve.frontend import run_dispatcher
        from variational_mmt_tpu.serve.rpc import RPCServer

        self.service = service
        self._rpc_path = os.path.join(
            tempfile.mkdtemp(prefix="vmmt-rpc-"), "rpc.sock"
        )
        # ship the vocab tables so dispatchers run the id-level wire (all
        # text work in THEIR interpreters) — unless the decode config needs
        # replace_unk, whose attention/source-token plumbing only the
        # token-level op carries
        vocabs = None
        if not service.dcfg.replace_unk:
            vocabs = (service.translator.src_vocab.itos,
                      service.translator.tgt_vocab.itos)
        # advertised on healthz (the rpc.py wire contract): whether this
        # server's dispatchers run the id-level op
        self.rpc = RPCServer(
            service, {**(info or {}), "ids_wire": vocabs is not None},
            self._rpc_path)
        self._reserve = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._reserve.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        self._reserve.bind((host, port))
        self.port = self._reserve.getsockname()[1]

        # spawn (not fork): a forked child would inherit the parent's live
        # device-runtime state (remote-TPU client threads, fds)
        ctx = mp.get_context("spawn")
        merges = service.bpe.merges if service.bpe is not None else None
        self._procs = []
        self._ready = []
        for _ in range(max(1, procs)):
            rd, wr = ctx.Pipe(duplex=False)
            p = ctx.Process(
                target=run_dispatcher,
                args=(host, self.port, self._rpc_path, merges,
                      service.scfg.lower, wr, vocabs),
                daemon=True,
            )
            p.start()
            wr.close()
            self._procs.append(p)
            self._ready.append(rd)

    def start(self, timeout: float = 60.0) -> None:
        """Block until every dispatcher is accepting connections."""
        for p, rd in zip(self._procs, self._ready):
            if not rd.poll(timeout):
                raise RuntimeError(
                    f"dispatcher pid={p.pid} not ready after {timeout}s"
                )
            assert rd.recv() == self.port
            rd.close()

    def stop(self) -> None:
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=5)
        self.rpc.stop()
        try:
            self._reserve.close()
        except OSError:
            pass
        try:
            os.unlink(self._rpc_path)
            os.rmdir(os.path.dirname(self._rpc_path))
        except OSError:
            pass
        self.service.stop()
