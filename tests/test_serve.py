"""Online serving: dynamic batcher + HTTP front end."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.serve import (ClientError, ServeConfig, ServingServer,
                                       TranslationService)
from variational_mmt_tpu.train.trainer import create_train_state


def small_service(model_type="vmmt_c", max_wait_ms=50.0, batch_size=4, warmup=False,
                  **scfg_kw):
    cfg = Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=24, tgt_vocab_size=24, emb_dim=16,
            hidden_dim=32, enc_layers=1, dec_layers=2, latent_dim=4, img_feat_dim=8,
            dropout=0.0, compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(beam_size=4, max_length=12, batch_size=batch_size),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    svc = TranslationService(
        model, state.params, vocab, vocab, cfg.decode, buckets=[8],
        scfg=ServeConfig(max_wait_ms=max_wait_ms, warmup=warmup, **scfg_kw),
    )
    return cfg, model, state, vocab, svc


def test_service_matches_offline():
    """Online answers are identical to the offline translate path."""
    cfg, model, state, vocab, svc = small_service()
    try:
        texts = ["w1 w2 w3", "w4 w5", "w6 w7 w8 w9"]
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((3, 8)).astype(np.float32)
        online = svc.translate_text(texts, imgs)

        tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
        offline = tr.translate_tokens([t.split() for t in texts], imgs)
        assert [nb[0][1] for nb in online] == [nb[0][1] for nb in offline]
        assert [nb[0][0] for nb in online] == pytest.approx(
            [nb[0][0] for nb in offline]
        )
    finally:
        svc.stop()


def test_over_length_request_rejected_not_compiled():
    """A source longer than the largest warmed bucket must be refused at
    submit time (the offline catch-all bucket would mean an in-line XLA
    compile per distinct over-length, stalling the batcher), and the serving
    path must never see a bucket beyond the warmed set."""
    _, _, _, _, svc = small_service()  # buckets=[8]
    try:
        long_text = " ".join(f"w{i % 20}" for i in range(9))
        with pytest.raises(ValueError, match="caps at 8"):
            svc.translate_text([long_text])
        # in-cap requests still work after a rejection
        assert svc.translate_text(["w1 w2"], np.zeros((1, 8), np.float32))
    finally:
        svc.stop()


def test_over_length_truncate_matches_offline_prefix():
    """over_length='truncate' serves the capped prefix — identical to the
    offline translation of that prefix."""
    cfg, model, state, vocab, svc = small_service(over_length="truncate")
    try:
        toks = [f"w{i % 20}" for i in range(11)]
        img = np.zeros((1, 8), np.float32)
        online = svc.translate_text([" ".join(toks)], img)
        tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
        offline = tr.translate_tokens([toks[:8]], img)
        assert online[0][0][1] == offline[0][0][1]
    finally:
        svc.stop()


def test_max_src_tokens_extends_warmed_buckets():
    """max_src_tokens above the largest bucket adds a warmed bucket of that
    length; a source of exactly that length is accepted, one beyond is not."""
    _, _, _, _, svc = small_service(max_src_tokens=12)
    try:
        assert 12 in svc.translator.buckets
        ok = svc.translate_text([" ".join(f"w{i % 20}" for i in range(12))],
                                np.zeros((1, 8), np.float32))
        assert ok and ok[0]
        with pytest.raises(ValueError, match="caps at 12"):
            svc.translate_text([" ".join(f"w{i % 20}" for i in range(13))])
    finally:
        svc.stop()


def test_batch_rejection_is_atomic():
    """A multi-sentence request with one over-length source enqueues NOTHING:
    the valid sentences must not consume device work whose results are
    discarded when the request 400s."""
    _, _, _, _, svc = small_service()  # buckets=[8]
    try:
        texts = ["w1 w2", "w3 w4", " ".join(f"w{i % 20}" for i in range(9))]
        before = svc.stats["requests"]
        with pytest.raises(ClientError, match="caps at 8"):
            svc.translate_text(texts)
        assert svc.stats["requests"] == before  # nothing reached the queue
    finally:
        svc.stop()


def test_negative_max_src_tokens_rejected_at_construction():
    with pytest.raises(ValueError, match="max_src_tokens"):
        small_service(max_src_tokens=-5)


def test_dispatcher_maps_only_client_errors_to_400():
    """Server-side ValueErrors crossing the RPC stay server errors (500);
    only the dedicated ClientError type is unwrapped for the 400 path —
    a bug must never be reported to the client as its own malformed input."""
    from variational_mmt_tpu.serve.frontend import _DispatcherBackend

    class FakeRPC:
        def __init__(self, resp):
            self.resp = resp

        def call(self, obj, timeout):
            return self.resp

    be = _DispatcherBackend(FakeRPC({"error": "ClientError: too long"}),
                            None, lower=True)
    with pytest.raises(ClientError, match="too long"):
        be.translate(["x"], None, 5.0)
    be = _DispatcherBackend(FakeRPC({"error": "ValueError: server bug"}),
                            None, lower=True)
    with pytest.raises(RuntimeError, match="server bug"):
        be.translate(["x"], None, 5.0)


def test_dynamic_batching_coalesces():
    """Concurrent requests inside the wait window share device calls."""
    _, _, _, _, svc = small_service(max_wait_ms=200.0, batch_size=4)
    try:
        imgs = np.zeros((8,), np.float32)
        futs = [svc.submit_text(f"w{1 + i % 5} w2", imgs) for i in range(8)]
        for f in futs:
            f.result(timeout=120)
        assert svc.stats["requests"] == 8
        # 8 requests, batch cap 4 -> at most 2 full batches + slack for the
        # race between submission and the first collect
        # loose bound: under heavy host load the coalescing window can be
        # outpaced by GIL stalls between submits (a tight <=4 flakes)
        assert svc.stats["batches"] <= 6
        assert svc.stats["requests"] == 8
    finally:
        svc.stop()


def test_missing_img_zero_filled():
    """A latent model serves text-only requests via the zero feature vector."""
    _, model, state, vocab, svc = small_service()
    try:
        out = svc.translate_text(["w1 w2"])
        assert len(out) == 1 and isinstance(out[0][0][1], str)
    finally:
        svc.stop()


def test_img_shape_validated():
    _, _, _, _, svc = small_service()
    try:
        with pytest.raises(ValueError):
            svc.submit_text("w1", np.zeros((5,), np.float32))
    finally:
        svc.stop()


def test_http_roundtrip():
    _, _, state, _, svc = small_service()
    server = ServingServer(svc, port=0, info={"model_type": "vmmt_c", "step": 0})
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model_type"] == "vmmt_c"

        body = json.dumps({"texts": ["w1 w2 w3", "w4"]}).encode()
        req = urllib.request.Request(base + "/translate", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2
        for nbest in out["results"]:
            assert {"score", "text"} <= set(nbest[0])

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            base + "/translate", data=b'{"texts": "nope"}', method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        # over-length source -> 400 client error (never an in-line compile)
        long_body = json.dumps(
            {"texts": [" ".join(f"w{i % 20}" for i in range(9))]}).encode()
        over = urllib.request.Request(
            base + "/translate", data=long_body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(over, timeout=30)
        assert ei.value.code == 400 and b"caps at 8" in ei.value.read()

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2
    finally:
        server.stop()


def test_http_concurrent_clients_batch_together():
    """Two HTTP clients in flight at once end up in one device batch."""
    _, _, _, _, svc = small_service(max_wait_ms=300.0)
    server = ServingServer(svc, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    results = {}

    def client(i):
        body = json.dumps({"texts": [f"w{i + 1} w2"]}).encode()
        req = urllib.request.Request(base + "/translate", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            results[i] = json.loads(r.read())

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        assert svc.stats["batched_requests"] >= 2
    finally:
        server.stop()


def test_serve_cli_args_parse():
    import argparse

    from variational_mmt_tpu.cli.serve import add_args

    p = argparse.ArgumentParser()
    add_args(p)
    opt = p.parse_args(["-model", "x", "-port", "0", "-max_wait_ms", "2.5",
                        "-max_src_tokens", "96", "-over_length", "truncate",
                        "-ensemble_mode", "logprob",
                        "-infer_dtype", "bfloat16"])
    assert opt.port == 0 and opt.max_wait_ms == 2.5
    assert opt.max_src_tokens == 96 and opt.over_length == "truncate"
    assert opt.ensemble_mode == "logprob"
    assert opt.infer_dtype == "bfloat16"


def test_http_msgpack_binary_wire_matches_json():
    """The binary msgpack endpoint (raw float32 image bytes, msgpack
    response) returns exactly what the JSON endpoint returns."""
    import http.client

    msgpack = pytest.importorskip("msgpack")

    _, _, _, _, svc = small_service()
    server = ServingServer(svc, port=0)
    server.start()
    try:
        texts = ["w1 w2 w3", "w4"]
        imgs = np.random.default_rng(3).standard_normal((2, 8)).astype(np.float32)

        body_j = json.dumps({"texts": texts, "imgs": imgs.tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/translate", data=body_j, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out_json = json.loads(r.read())

        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        body_m = msgpack.packb({
            "texts": texts,
            "imgs": {"shape": list(imgs.shape), "data": imgs.tobytes()},
        })
        conn.request("POST", "/translate", body=body_m,
                     headers={"Content-Type": "application/x-msgpack"})
        resp = conn.getresponse()
        assert resp.status == 200
        out_mp = msgpack.unpackb(resp.read())
        conn.close()

        assert [n[0]["text"] for n in out_mp["results"]] == \
               [n[0]["text"] for n in out_json["results"]]

        # malformed binary body -> msgpack 400, not a crash
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("POST", "/translate", body=b"\x81\xa5texts\xa4nope",
                     headers={"Content-Type": "application/x-msgpack"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"error" in resp.read()
        conn.close()
    finally:
        server.stop()


def test_cancelled_future_does_not_poison_batch():
    """A client cancelling its queued request must not corrupt the other
    requests coalesced into the same device batch."""
    _, _, _, _, svc = small_service(max_wait_ms=400.0)
    try:
        f1 = svc.submit_text("w1 w2")
        f2 = svc.submit_text("w3 w4")
        f3 = svc.submit_text("w5")
        assert f2.cancel()  # queued futures are cancellable
        r1 = f1.result(timeout=120)
        r3 = f3.result(timeout=120)
        assert isinstance(r1[0][1], str) and isinstance(r3[0][1], str)
        assert f2.cancelled()
    finally:
        svc.stop()


def test_stop_drains_racing_submissions():
    """A request enqueued behind the stop sentinel must fail loudly, not
    hang its caller forever."""
    from concurrent.futures import Future

    from variational_mmt_tpu.serve.service import _Request

    _, _, _, _, svc = small_service()
    svc.stop()  # worker gone
    req = _Request(ids=[5], img=None)
    svc._q.put(req)  # simulates the submit-vs-stop race losing the race
    svc.stop()  # idempotent; must drain and fail the straggler
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="service stopped"):
        req.future.result(timeout=5)


def test_mp_server_roundtrip_matches_in_process():
    """Multi-process SO_REUSEPORT front end: same endpoint surface, same
    results as the in-process server (dispatchers tokenize + RPC token
    lists to the service process)."""
    import http.client

    msgpack = pytest.importorskip("msgpack")
    from variational_mmt_tpu.serve import MPServingServer

    cfg, model, state, vocab, svc = small_service()
    server = MPServingServer(svc, port=0, procs=2,
                             info={"model_type": "vmmt_c", "step": 0})
    try:
        server.start(timeout=120)
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model_type"] == "vmmt_c"
        # the documented wire contract: healthz advertises the id-level op
        # when the dispatchers hold the vocab (no replace_unk configured)
        assert health["ids_wire"] is True

        texts = ["w1 w2 w3", "w4", "w5 w6"]
        imgs = np.random.default_rng(3).standard_normal((3, 8)).astype(np.float32)

        # json request through the dispatchers
        body = json.dumps({"texts": texts, "imgs": imgs.tolist()}).encode()
        req = urllib.request.Request(base + "/translate", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out_http = json.loads(r.read())
        assert len(out_http["results"]) == 3

        # msgpack request (binary imgs)
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        conn.request("POST", "/translate", body=msgpack.packb({
            "texts": texts,
            "imgs": {"shape": list(imgs.shape), "data": imgs.tobytes()},
        }), headers={"Content-Type": "application/x-msgpack"})
        resp = conn.getresponse()
        assert resp.status == 200
        out_mp = msgpack.unpackb(resp.read())
        conn.close()

        # both transports agree with the direct service path
        direct = svc.translate_text(texts, imgs)
        assert [n[0]["text"] for n in out_http["results"]] == \
               [nb[0][1] for nb in direct]
        assert [n[0]["text"] for n in out_mp["results"]] == \
               [nb[0][1] for nb in direct]

        # malformed request -> 400 through a dispatcher too
        bad = urllib.request.Request(
            base + "/translate", data=b'{"texts": "nope"}', method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        # over-length source -> 400 through the real RPC unwrap (the
        # service's ClientError crosses the unix socket as a typed error)
        over = urllib.request.Request(
            base + "/translate",
            data=json.dumps(
                {"texts": [" ".join(f"w{i % 20}" for i in range(9))]}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(over, timeout=30)
        assert ei.value.code == 400 and b"caps at 8" in ei.value.read()

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 6
    finally:
        server.stop()


def test_mp_server_concurrent_clients():
    """Concurrent clients through different dispatcher processes still
    coalesce into shared device batches in the service process."""
    from variational_mmt_tpu.serve import MPServingServer

    _, _, _, _, svc = small_service(max_wait_ms=300.0)
    server = MPServingServer(svc, port=0, procs=2)
    results = {}
    try:
        server.start(timeout=120)
        base = f"http://127.0.0.1:{server.port}"

        def client(i):
            body = json.dumps({"texts": [f"w{i + 1} w2"]}).encode()
            req = urllib.request.Request(base + "/translate", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        assert svc.stats["batched_requests"] >= 2
    finally:
        server.stop()


def test_empty_source_rejected():
    """An empty/whitespace-only text must be a ClientError (HTTP 400), not
    an all-PAD row whose uniformly-masked attention decodes to garbage."""
    from variational_mmt_tpu.serve import ClientError

    _, _, _, _, svc = small_service()
    try:
        with pytest.raises(ClientError, match="empty source"):
            svc.translate_text(["w1 w2", ""])
        # atomic: the valid sentence must not have been enqueued
        assert svc.stats["requests"] == 0
    finally:
        svc.stop()


def test_stop_without_start_does_not_hang():
    """stop() on a constructed-but-never-served HTTP server must return
    (BaseServer.shutdown() would otherwise wait forever on an event only
    serve_forever() sets)."""
    _, _, _, _, svc = small_service()
    server = ServingServer(svc, port=0)
    t0 = time.time()
    server.stop()
    assert time.time() - t0 < 5.0


def test_oversized_body_rejected():
    """A huge Content-Length must be refused up front (413), not buffered
    into memory."""
    import socket as _socket

    _, _, _, _, svc = small_service()
    server = ServingServer(svc, port=0)
    server.start()
    try:
        s = _socket.create_connection(("127.0.0.1", server.port), timeout=30)
        s.sendall(b"POST /translate HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Type: application/json\r\n"
                  b"Content-Length: 10737418240\r\n\r\n")
        s.settimeout(30)
        reply = s.recv(4096).decode("utf-8", "replace")
        assert " 413 " in reply.splitlines()[0]
        s.close()
    finally:
        server.stop()


def test_dispatcher_import_stays_modelfree():
    """The MP dispatcher target module must not drag the model stack in via
    package __init__ imports ('jax' is preloaded by the environment here,
    so assert on the framework's own heavy modules instead)."""
    import subprocess
    import sys as _sys

    code = (
        "import sys\n"
        "import variational_mmt_tpu.serve.frontend\n"
        "bad = [m for m in sys.modules if m.startswith('variational_mmt_tpu')\n"
        "       and any(k in m for k in ('service', 'translator', 'models', 'prng'))]\n"
        "assert not bad, bad\n"
        "import variational_mmt_tpu.utils.platform\n"
        "assert 'variational_mmt_tpu.utils.prng' not in sys.modules\n"
        "print('clean')\n"
    )
    out = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0 and "clean" in out.stdout, out.stderr


def test_submit_ids_batch_matches_tokens_path():
    """The id-level submit path (the MP dispatchers' wire) returns the same
    hypotheses as the text path, as raw ids — and never builds text in the
    service process."""
    cfg, model, state, vocab, svc = small_service()
    try:
        texts = ["w1 w2 w3", "w4 w5", "w6 w7 w8 w9"]
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((3, 8)).astype(np.float32)
        toks = [t.split() for t in texts]
        ids = [vocab.encode(t) for t in toks]
        raw = [f.result(timeout=120)
               for f in svc.submit_ids_batch(ids, imgs)]
        text_out = svc.translate_text(texts, imgs)
        for nbest_ids, nbest_text in zip(raw, text_out):
            assert [s for s, _ in nbest_ids] == pytest.approx(
                [s for s, _ in nbest_text])
            rebuilt = [" ".join(vocab.decode(i, strip_special=False))
                       for _, i in nbest_ids]
            # the small vocab has no BPE continuations, so join == detok
            assert rebuilt == [t for _, t in nbest_text]
    finally:
        svc.stop()


def test_pipelined_worker_many_groups_in_order():
    """Sustained load forces the two-deep pipeline (group N+1 dispatched
    before group N finalizes); every future must still resolve to its own
    sentence's translation."""
    cfg, model, state, vocab, svc = small_service(max_wait_ms=1.0, batch_size=2)
    try:
        texts = [f"w{1 + (i % 19)} w{1 + ((i * 7) % 19)}" for i in range(24)]
        futs = [svc.submit_text(t) for t in texts]
        got = [f.result(timeout=120)[0][1] for f in futs]

        # the service zero-fills missing features; match that offline
        imgs = np.zeros((len(texts), 8), np.float32)
        tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
        want = [nb[0][1]
                for nb in tr.translate_tokens([t.split() for t in texts], imgs)]
        assert got == want
        # with batch cap 2 and 24 requests the worker must have run many
        # groups — i.e. the pipeline really cycled
        assert svc.stats["batches"] >= 12
    finally:
        svc.stop()


def test_rpc_translate_ids_refused_with_replace_unk():
    """replace_unk needs source tokens + attention; the id-level RPC op must
    refuse (and MPServingServer ships no vocab in that case) rather than
    silently dropping UNK replacement."""
    from variational_mmt_tpu.serve.rpc import RPCServer

    cfg = Config(
        model=ModelConfig(
            model_type="nmt", src_vocab_size=24, tgt_vocab_size=24, emb_dim=16,
            hidden_dim=32, enc_layers=1, dec_layers=1, dropout=0.0,
            compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(beam_size=2, max_length=8, batch_size=2,
                            replace_unk=True),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    svc = TranslationService(model, state.params, vocab, vocab, cfg.decode,
                             buckets=[8],
                             scfg=ServeConfig(max_wait_ms=1.0, warmup=False))
    try:
        srv = RPCServer.__new__(RPCServer)  # no socket: test _dispatch only
        srv.service = svc
        srv.info = {}
        with pytest.raises(ValueError, match="replace_unk"):
            srv._dispatch({"op": "translate_ids", "ids": [[5, 6]]})
    finally:
        svc.stop()


def test_pipeline_depth1_matches_depth2():
    """The A/B baseline worker (pipeline_depth=1, classic serial loop)
    resolves every request to exactly what the pipelined worker returns."""
    texts = [f"w{1 + (i % 19)} w{1 + ((i * 5) % 19)} w{1 + ((i * 11) % 19)}"
             for i in range(17)]
    outs = {}
    for depth in (1, 2):
        _, _, _, _, svc = small_service(max_wait_ms=1.0, batch_size=4,
                                        pipeline_depth=depth)
        try:
            futs = [svc.submit_text(t) for t in texts]
            outs[depth] = [f.result(timeout=120) for f in futs]
            assert svc.stats["batches"] >= 2  # both modes really batched
        finally:
            svc.stop()
    assert outs[1] == outs[2]


def test_pipeline_depth_auto_resolves_from_host_cores(monkeypatch):
    """pipeline_depth=0 (the serve-CLI default) auto-selects the worker
    mode from the host core count: serial on 1-core hosts (where the
    round-4 one-window table measured pipelining at -17% throughput and
    2.7x p99), pipelined otherwise. Explicit 1/2 always forces."""
    import variational_mmt_tpu.serve.service as service_mod

    monkeypatch.setattr(service_mod.os, "cpu_count", lambda: 1)
    assert ServeConfig().resolved_pipeline_depth() == 1
    assert ServeConfig(pipeline_depth=2).resolved_pipeline_depth() == 2
    monkeypatch.setattr(service_mod.os, "cpu_count", lambda: 4)
    assert ServeConfig().resolved_pipeline_depth() == 2
    assert ServeConfig(pipeline_depth=1).resolved_pipeline_depth() == 1
    # containers can report None
    monkeypatch.setattr(service_mod.os, "cpu_count", lambda: None)
    assert ServeConfig().resolved_pipeline_depth() == 1

    # the service resolves once at construction and runs with it
    monkeypatch.setattr(service_mod.os, "cpu_count", lambda: 1)
    _, _, _, _, svc = small_service(max_wait_ms=1.0, batch_size=4)
    try:
        assert svc.pipeline_depth == 1
        assert svc.submit_text("w1 w2").result(timeout=120)
    finally:
        svc.stop()


def test_collect_fill_contract():
    """The pipeline's fill rules, pinned: (a) empty queue + nothing gathered
    -> return [] immediately WITHOUT probing device readiness (each probe is
    a runtime RPC; measured ~20% serving cost when polled at 1ms); (b) a
    full batch returns without probing (early dispatch); (c) a partial
    gather waits on readiness and is returned for the caller to top up."""
    from variational_mmt_tpu.serve.service import _Request

    _, _, _, _, svc = small_service(batch_size=3)
    svc.stop()  # detach the worker; drive _collect_fill directly
    svc._stop_seen = False  # the worker flagged the stop sentinel on exit
    probes = []

    def never_ready():
        probes.append(1)
        return False

    assert svc._collect_fill(never_ready) == []
    assert not probes  # (a) no readiness probe on an idle queue

    for _ in range(3):
        svc._q.put(_Request(ids=[5], img=None))
    assert len(svc._collect_fill(never_ready)) == 3
    assert not probes  # (b) full fill never needed the probe

    svc._q.put(_Request(ids=[5], img=None))
    calls = []

    def ready_on_second():
        calls.append(1)
        return len(calls) >= 2

    assert len(svc._collect_fill(ready_on_second)) == 1  # (c) partial
    assert svc._stop_seen is False


def test_expired_requests_shed_not_computed():
    """A request whose caller-stated timeout has already passed when the
    worker reaches it is failed with TimeoutError (load shedding) — device
    work never runs for answers nobody is waiting for — while live requests
    in the same gather succeed untouched."""
    _, _, _, _, svc = small_service(max_wait_ms=20.0, batch_size=4)
    try:
        dead = svc.submit_text("w1 w2", timeout_s=-1.0)  # already expired
        live = svc.submit_text("w3 w4")  # no deadline
        out = live.result(timeout=120)
        assert out and isinstance(out[0][1], str)
        with pytest.raises(TimeoutError, match="shed"):
            dead.result(timeout=120)
        assert svc.stats["shed"] == 1
    finally:
        svc.stop()


def test_http_maps_shed_to_503():
    """The HTTP front end maps TimeoutError (shed/overload) to 503, for
    both the in-process backend and the MP dispatchers' RPC-wire string."""
    from variational_mmt_tpu.serve.frontend import make_http_handler, Backend

    class _SheddingBackend(Backend):
        def __init__(self):
            pass

        def translate(self, texts, imgs, timeout, sample_ids=None):
            raise TimeoutError("request deadline expired (shed under load)")

        def healthz(self):
            return {"ok": True}

        def stats(self):
            return {}

    import http.server
    import socketserver

    handler = make_http_handler(_SheddingBackend())
    httpd = socketserver.TCPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"texts": ["hi"]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
        assert "overloaded" in json.loads(ei.value.read())["error"]
    finally:
        httpd.shutdown()


# ---------- sampled serving (per-request PRNG streams) ----------

def _sampling_svc(latent=False, **scfg_kw):
    cfg = Config(
        model=ModelConfig(
            model_type="vmmt_c", src_vocab_size=24, tgt_vocab_size=24,
            emb_dim=16, hidden_dim=32, enc_layers=1, dec_layers=2,
            latent_dim=4, img_feat_dim=8, dropout=0.0,
            compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(beam_size=1, max_length=12, batch_size=4,
                            sampling_temp=1.2,
                            latent_from="sample" if latent else "mean"),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    svc = TranslationService(
        model, state.params, vocab, vocab, cfg.decode, buckets=[8],
        scfg=ServeConfig(max_wait_ms=30.0, warmup=False, **scfg_kw),
    )
    return cfg, model, state, vocab, svc


def test_sampled_serving_reproducible_and_group_invariant():
    """A sampled answer is keyed by (seed, sample_id, source, image) — NOT
    by where the dynamic batcher placed the request in its group."""
    _, _, _, _, svc = _sampling_svc(latent=True)
    try:
        rng = np.random.default_rng(0)
        img = rng.standard_normal(8).astype(np.float32)
        # alone in its group
        alone = svc.submit_tokens(["w3", "w4"], img, sample_id=5).result(120)
        # same request sharing a group with other traffic, different position
        futs = [
            svc.submit_tokens(["w9", "w8", "w7"], img, sample_id=1),
            svc.submit_tokens(["w3", "w4"], img, sample_id=5),
            svc.submit_tokens(["w1"], img, sample_id=2),
        ]
        grouped = futs[1].result(120)
        assert grouped == alone
        # different sample_ids on the SAME source are alternative draws:
        # over several ids at T=1.2 at least one must differ
        outs = {
            tuple(svc.submit_tokens(["w3", "w4"], img, sample_id=s)
                  .result(120)[0][1].split())
            for s in range(6)
        }
        assert len(outs) > 1
    finally:
        svc.stop()


def test_sample_id_rejected_on_deterministic_service():
    _, _, _, _, svc = small_service()  # beam-4 service
    try:
        with pytest.raises(ClientError, match="sampling service"):
            svc.submit_tokens(["w1"], None, sample_id=3)
        # sample_id=0 (the default stream) is always accepted
        assert svc.submit_tokens(["w1"], None, sample_id=0).result(120)
    finally:
        svc.stop()


def test_negative_sample_id_rejected():
    _, _, _, _, svc = _sampling_svc()
    try:
        with pytest.raises(ClientError, match=">= 0"):
            svc.submit_tokens(["w1"], None, sample_id=-1)
    finally:
        svc.stop()


def test_sampled_serving_http_sample_ids():
    """sample_ids ride the HTTP JSON wire; deterministic servers 400 them."""
    _, _, _, _, svc = _sampling_svc()
    server = ServingServer(svc, port=0, info={"model_type": "vmmt_c", "step": 0})
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        body = json.dumps({"texts": ["w3 w4", "w3 w4"],
                           "sample_ids": [4, 4]}).encode()
        req = urllib.request.Request(base + "/translate", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        # same (source, sample_id) in one request: identical draws
        assert out["results"][0] == out["results"][1]

        bad = urllib.request.Request(
            base + "/translate",
            data=json.dumps({"texts": ["w1"], "sample_ids": [1, 2]}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.stop()
        svc.stop()


def test_http_sample_ids_rejected_by_beam_server():
    _, _, _, _, svc = small_service()
    server = ServingServer(svc, port=0, info={"model_type": "vmmt_c", "step": 0})
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        bad = urllib.request.Request(
            base + "/translate",
            data=json.dumps({"texts": ["w1"], "sample_ids": [1]}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=120)
        assert ei.value.code == 400 and b"sampling service" in ei.value.read()
    finally:
        server.stop()
        svc.stop()
