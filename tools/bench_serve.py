#!/usr/bin/env python
"""Online-serving load benchmark: drive TranslationService with concurrent
synthetic clients and report throughput / latency / dynamic-batch fill.

    python tools/bench_serve.py [-clients 32] [-requests 512] [-batch 64]
                                [-max_wait_ms 8] [-http]

-http routes requests through the real ServingServer (adds the HTTP layer
to the measurement); default drives the service queue directly.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-clients", type=int, default=32)
    p.add_argument("-requests", type=int, default=512)
    p.add_argument("-batch", type=int, default=64)
    p.add_argument("-max_wait_ms", type=float, default=8.0)
    p.add_argument("-beam_size", type=int, default=4)
    p.add_argument("-max_length", type=int, default=32)
    p.add_argument("-src_len", type=int, default=18)
    p.add_argument("-http", action="store_true")
    p.add_argument("-wire", default="msgpack", choices=["msgpack", "json"],
                   help="HTTP body format (msgpack = binary imgs + keep-alive; "
                        "json matches the naive-client worst case)")
    p.add_argument("-procs", type=int, default=0,
                   help="with -http: dispatcher processes via SO_REUSEPORT "
                        "(0 = in-process ThreadingHTTPServer)")
    p.add_argument("-req_batch", type=int, default=1,
                   help="sentences per HTTP request (the server's texts:[...] "
                        "schema; amortizes per-request transport cost)")
    args = p.parse_args()

    import jax  # before honor_env_platform so the compile cache engages

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # the axon plugin otherwise overrides JAX_PLATFORMS

    from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.serve import ServeConfig, ServingServer, TranslationService
    from variational_mmt_tpu.train.trainer import create_train_state

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        model=ModelConfig(
            model_type="vmmt_c", src_vocab_size=10000, tgt_vocab_size=10000,
            emb_dim=500, hidden_dim=500, enc_layers=2, dec_layers=2,
            latent_dim=128, img_feat_dim=2048,
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=on_tpu, scan_unroll=4 if on_tpu else 1,
        ),
        train=TrainConfig(seed=0),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(9000)])
    dcfg = DecodeConfig(beam_size=args.beam_size, max_length=args.max_length,
                        batch_size=args.batch)
    svc = TranslationService(
        model, state.params, vocab, vocab, dcfg,
        buckets=[args.src_len + 2],
        scfg=ServeConfig(max_wait_ms=args.max_wait_ms),
    )
    server = None
    if args.http:
        if args.procs > 0:
            from variational_mmt_tpu.serve import MPServingServer

            server = MPServingServer(svc, port=0, procs=args.procs)
        else:
            server = ServingServer(svc, port=0)
        server.start()

    rng = np.random.default_rng(0)
    texts = [
        " ".join(f"w{k}" for k in rng.integers(0, 9000, args.src_len))
        for _ in range(args.requests)
    ]
    imgs = rng.standard_normal((args.requests, 2048)).astype(np.float32)
    lat = []
    errors = []
    lock = threading.Lock()

    def direct_client(lo, hi):
        for i in range(lo, hi):
            t0 = time.monotonic()
            svc.submit_text(texts[i], imgs[i]).result(timeout=600)
            with lock:
                lat.append(time.monotonic() - t0)

    def http_client(lo, hi):
        # one keep-alive connection per client thread (urllib reconnects
        # per request, which alone costs ~2x at this request size)
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=600)
        if args.wire == "msgpack":
            import msgpack

            def encode(i, j):
                block = np.ascontiguousarray(imgs[i:j])
                return msgpack.packb({
                    "texts": texts[i:j],
                    "imgs": {"shape": list(block.shape), "data": block.tobytes()},
                    "timeout": 600,  # match direct mode (server default is 60s)
                }), {"Content-Type": "application/x-msgpack"}
        else:
            def encode(i, j):
                return (json.dumps({"texts": texts[i:j],
                                    "imgs": imgs[i:j].tolist(),
                                    "timeout": 600}).encode(),
                        {"Content-Type": "application/json"})

        i = lo
        while i < hi:
            j = min(i + args.req_batch, hi)
            body, headers = encode(i, j)
            t0 = time.monotonic()
            conn.request("POST", "/translate", body=body, headers=headers)
            resp = conn.getresponse()
            resp.read()
            if resp.status != 200:
                raise RuntimeError(f"HTTP {resp.status}")
            with lock:
                # per-sentence latency entries keep the percentile math and
                # the completion check comparable across req_batch settings
                lat.extend([time.monotonic() - t0] * (j - i))
            i = j
        conn.close()

    inner = http_client if args.http else direct_client

    def client(lo, hi):
        # a silently-dead thread would make the throughput/percentile math
        # lie (requests counted but never completed); record and fail loudly
        try:
            inner(lo, hi)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(repr(e))
    chunk = (args.requests + args.clients - 1) // args.clients
    threads = [
        threading.Thread(target=client, args=(c * chunk, min((c + 1) * chunk, args.requests)))
        for c in range(args.clients)
    ]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    # stop FIRST (joins the worker): the last batch's stats update happens
    # after its futures resolve, so snapshotting before the join races it
    if server is not None:
        server.stop()
    else:
        svc.stop()
    stats = dict(svc.stats)
    if errors or len(lat) != args.requests:
        print(json.dumps({"error": f"only {len(lat)}/{args.requests} requests "
                                   f"completed; first failures: {errors[:3]}"}))
        sys.exit(1)
    lat_a = np.array(lat)
    print(json.dumps({
        "metric": "serve_sent_per_sec",
        "value": round(len(lat) / wall, 1),
        "unit": "sent/s",
        "platform": jax.default_backend(),
        "clients": args.clients,
        "transport": (f"http-{args.wire}"
                      + (f"-mp{args.procs}" if args.procs else "")
                      + (f"-rb{args.req_batch}" if args.req_batch > 1 else "")
                      if args.http else "direct"),
        "latency_ms_p50": round(1000 * float(np.percentile(lat_a, 50)), 1),
        "latency_ms_p99": round(1000 * float(np.percentile(lat_a, 99)), 1),
        "device_batches": stats["batches"],
        "mean_batch_fill": round(stats["requests"] / max(stats["batches"], 1), 1),
        "device_busy_frac": round(stats["busy_s"] / wall, 3),
    }))


if __name__ == "__main__":
    main()
