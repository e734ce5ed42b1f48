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
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _make_workload(requests: int, src_len: int):
    """Deterministic (seed 0) so out-of-process clients regenerate the exact
    texts/imgs the single-process mode uses."""
    rng = np.random.default_rng(0)
    texts = [
        " ".join(f"w{k}" for k in rng.integers(0, 9000, src_len))
        for _ in range(requests)
    ]
    imgs = rng.standard_normal((requests, 2048)).astype(np.float32)
    return texts, imgs


def _http_client_loop(port, texts, imgs, lo, hi, wire, req_batch, lat, lock):
    # one keep-alive connection per client thread (urllib reconnects
    # per request, which alone costs ~2x at this request size)
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    if wire == "msgpack":
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
        j = min(i + req_batch, hi)
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


def _run_threads(n_threads, lo, hi, run_range):
    """Split [lo, hi) across n_threads; run_range(lo, hi) per thread.
    Returns (latencies, errors)."""
    lat: list = []
    errors: list = []
    lock = threading.Lock()
    total = hi - lo

    def client(clo, chi):
        # a silently-dead thread would make the throughput/percentile math
        # lie (requests counted but never completed); record and fail loudly
        try:
            run_range(clo, chi, lat, lock)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(repr(e))

    chunk = (total + n_threads - 1) // n_threads
    threads = [
        threading.Thread(target=client,
                         args=(lo + c * chunk, min(lo + (c + 1) * chunk, hi)))
        for c in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, errors


def _run_open_loop(args, svc, texts, imgs) -> None:
    """Open-loop load: submit on a Poisson schedule at -arrival_rate
    regardless of completions (closed-loop clients self-throttle to the
    server's speed and can never overload it; production traffic does not).
    With -req_timeout, requests queued past their deadline are shed
    server-side — the goodput/shed split at rates beyond capacity is the
    load-shedding behavior under overload."""
    n = args.requests
    rng = np.random.default_rng(1)
    sched = np.cumsum(rng.exponential(1.0 / args.arrival_rate, n))
    done_t = [None] * n
    futs = [None] * n
    sub_t = [None] * n

    def mk_cb(i):
        def cb(_f):
            done_t[i] = time.monotonic()
        return cb

    t_start = time.monotonic()
    late = 0.0
    for i in range(n):
        lag = t_start + sched[i] - time.monotonic()
        if lag > 0:
            time.sleep(lag)
        else:
            late = max(late, -lag)
        sub_t[i] = time.monotonic()
        futs[i] = svc.submit_text(texts[i], imgs[i],
                                  timeout_s=args.req_timeout or None)
        futs[i].add_done_callback(mk_cb(i))

    ok_lat, shed, failed = [], 0, []
    for i, f in enumerate(futs):
        try:
            f.result(timeout=600)
            if done_t[i] is None:
                # result() waiters wake BEFORE done-callbacks run; if we
                # lost that race the resolution was this instant — stamp it
                done_t[i] = time.monotonic()
            ok_lat.append(done_t[i] - sub_t[i])
        except TimeoutError:
            shed += 1
        except Exception as e:  # noqa: BLE001
            failed.append(repr(e))
        if done_t[i] is None:
            done_t[i] = time.monotonic()  # same race on the exception path
    wall = max(done_t) - t_start
    svc.stop()
    stats = dict(svc.stats)
    if failed:
        print(json.dumps({"error": f"{len(failed)} failed: {failed[:3]}"}))
        sys.exit(1)
    # all-shed runs have no completion latencies: emit null, not NaN (NaN is
    # not valid JSON and breaks strict parsers downstream)
    pct = (lambda q: round(1000 * float(np.percentile(np.array(ok_lat), q)), 1)) \
        if ok_lat else (lambda q: None)
    import jax

    print(json.dumps({
        "metric": "serve_goodput_sent_per_sec",
        "value": round(len(ok_lat) / wall, 1),
        "unit": "sent/s",
        "platform": jax.default_backend(),
        # serving numbers are host-regime-dependent (round-3 verdict #4:
        # incomparable rows were quoted together) — stamp every row
        "host_cpus": os.cpu_count(),
        "infer_dtype": args.infer_dtype,
        "ensemble": args.ensemble,
        "pipeline_depth": svc.pipeline_depth,  # resolved (0=auto stamps 1|2)
        "mode": "open-loop",
        "target_rate": args.arrival_rate,
        "req_timeout_s": args.req_timeout,
        "completed": len(ok_lat),
        "shed": shed,
        "shed_frac": round(shed / n, 3),
        "latency_ms_p50": pct(50),
        "latency_ms_p99": pct(99),
        "max_submit_lag_s": round(late, 3),  # >0.1: the generator, not the
        # server, failed to sustain the target rate — result not comparable
        "device_batches": stats["batches"],
        # shed requests never dispatch; only computed ones can fill batches
        "mean_batch_fill": round((stats["requests"] - stats["shed"])
                                 / max(stats["batches"], 1), 1),
        "device_busy_frac": round(stats["busy_s"] / wall, 3),
    }))


def _client_proc_main(args) -> None:
    """Entry for an out-of-process load generator (--_client_port): pure
    HTTP client, never imports jax, so it steals no GIL time from the
    device-owning process being measured."""
    texts, imgs = _make_workload(args.requests, args.src_len)

    def run_range(lo, hi, lat, lock):
        _http_client_loop(args._client_port, texts, imgs, lo, hi,
                          args.wire, args.req_batch, lat, lock)

    start = time.time()
    lat, errors = _run_threads(args.clients, args._client_lo, args._client_hi,
                               run_range)
    end = time.time()
    np.savez(args._client_out, lat=np.array(lat), start=start, end=end,
             n_errors=len(errors))
    if errors:
        print(f"client proc errors: {errors[:3]}", file=sys.stderr)
        sys.exit(1)
    sys.exit(0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-clients", type=int, default=32)
    p.add_argument("-requests", type=int, default=512)
    p.add_argument("-batch", type=int, default=64)
    p.add_argument("-max_wait_ms", type=float, default=8.0)
    p.add_argument("-beam_size", type=int, default=4)
    p.add_argument("-sampling_temp", type=float, default=0.0,
                   help="> 0: bench SAMPLED serving (beam forced to 1; "
                        "per-request streams keyed by workload index)")
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
    p.add_argument("-arrival_rate", type=float, default=0.0,
                   help="open-loop mode (direct transport only): submit "
                        "requests on a Poisson schedule at this rate "
                        "(sent/s) regardless of completions — the "
                        "production regime. Reports goodput, shed count "
                        "and completion-latency percentiles at that rate")
    p.add_argument("-req_timeout", type=float, default=2.0,
                   help="open-loop per-request deadline in seconds; queued "
                        "requests older than this are shed server-side "
                        "(0 = no deadline)")
    p.add_argument("-infer_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="serving weight precision (Translator casts at "
                        "init; int8 = weight-only per-channel)")
    p.add_argument("-ensemble", type=int, default=1,
                   help="N>1: serve an N-member checkpoint ensemble "
                        "(independent random param trees, flagship shape)")
    p.add_argument("-pipeline_depth", type=int, default=0,
                   help="service worker pipeline depth (0 = auto from host "
                        "cores, the serve-CLI default; 2 = overlap host "
                        "postprocessing with device compute; 1 = classic "
                        "serial loop, the A/B baseline)")
    p.add_argument("-client_procs", type=int, default=0,
                   help="with -http: run the load generators in N separate "
                        "processes (-clients threads EACH) instead of as "
                        "threads inside the device-owning process. In-process "
                        "clients steal GIL time from the service and cap the "
                        "measurement; this mode measures the server itself")
    # hidden: out-of-process load-generator mode (spawned by -client_procs)
    p.add_argument("--_client_port", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--_client_lo", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--_client_hi", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--_client_out", default="", help=argparse.SUPPRESS)
    args = p.parse_args()

    if args._client_port:
        _client_proc_main(args)  # exits; never touches jax

    if args.arrival_rate > 0 and (args.http or args.client_procs):
        p.error("-arrival_rate is direct-transport only (open-loop HTTP "
                "would measure the client threads, not the server)")

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
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(9000)])
    dcfg = DecodeConfig(beam_size=1 if args.sampling_temp > 0 else args.beam_size,
                        max_length=args.max_length,
                        batch_size=args.batch, infer_dtype=args.infer_dtype,
                        sampling_temp=args.sampling_temp)
    import dataclasses

    if args.ensemble > 1:
        members = [model] * args.ensemble
        mparams = []
        for i in range(args.ensemble):
            c_i = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, seed=i))
            mparams.append(create_train_state(c_i, model).params)
        model, params = members, mparams
    else:
        params = create_train_state(cfg, model).params
    svc = TranslationService(
        model, params, vocab, vocab, dcfg,
        buckets=[args.src_len + 2],
        scfg=ServeConfig(max_wait_ms=args.max_wait_ms,
                         pipeline_depth=args.pipeline_depth),
    )
    server = None
    if args.http:
        if args.procs > 0:
            from variational_mmt_tpu.serve import MPServingServer

            server = MPServingServer(svc, port=0, procs=args.procs)
        else:
            server = ServingServer(svc, port=0)
        server.start()

    texts, imgs = _make_workload(args.requests, args.src_len)

    if args.client_procs > 0:
        if not args.http:
            p.error("-client_procs requires -http (direct mode shares the "
                    "process by definition)")
        # spawn P pure-client processes; each regenerates the workload and
        # drives its own contiguous request range. Wall = span from the
        # earliest client start to the latest client end (epoch clocks).
        outs, procs = [], []
        P = args.client_procs
        chunk = (args.requests + P - 1) // P
        for c in range(P):
            lo, hi = c * chunk, min((c + 1) * chunk, args.requests)
            if lo >= hi:
                continue
            out = tempfile.NamedTemporaryFile(suffix=".npz", delete=False).name
            outs.append(out)
            procs.append(subprocess.Popen([
                sys.executable, os.path.abspath(__file__),
                "-requests", str(args.requests), "-src_len", str(args.src_len),
                "-clients", str(args.clients), "-req_batch", str(args.req_batch),
                "-wire", args.wire,
                "--_client_port", str(server.port), "--_client_lo", str(lo),
                "--_client_hi", str(hi), "--_client_out", out,
            ]))
        rcs = [q.wait() for q in procs]
        lat, errors, starts, ends = [], [], [], []
        for rc, out in zip(rcs, outs):
            if rc != 0:
                errors.append(f"client proc rc={rc}")
                continue
            z = np.load(out)
            lat.extend(z["lat"].tolist())
            starts.append(float(z["start"]))
            ends.append(float(z["end"]))
            if int(z["n_errors"]):
                errors.append(f"{int(z['n_errors'])} request errors")
        for out in outs:
            try:
                os.unlink(out)
            except OSError:
                pass
        wall = (max(ends) - min(starts)) if starts else 0.0
    elif args.arrival_rate > 0:
        _run_open_loop(args, svc, texts, imgs)
        return
    else:
        def direct_range(lo, hi, lat, lock):
            for i in range(lo, hi):
                t0 = time.monotonic()
                svc.submit_text(texts[i], imgs[i]).result(timeout=600)
                with lock:
                    lat.append(time.monotonic() - t0)

        def http_range(lo, hi, lat, lock):
            _http_client_loop(server.port, texts, imgs, lo, hi,
                              args.wire, args.req_batch, lat, lock)

        t0 = time.monotonic()
        lat, errors = _run_threads(
            args.clients, 0, args.requests,
            http_range if args.http else direct_range)
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
        # serving numbers are host-regime-dependent (round-3 verdict #4:
        # incomparable rows were quoted together) — stamp every row
        "host_cpus": os.cpu_count(),
        "infer_dtype": args.infer_dtype,
        "decode": (f"sampling T={args.sampling_temp}" if args.sampling_temp > 0
                   else f"beam {args.beam_size}"),
        "ensemble": args.ensemble,
        "pipeline_depth": svc.pipeline_depth,  # resolved (0=auto stamps 1|2)
        "clients": args.clients * max(1, args.client_procs),
        "transport": (f"http-{args.wire}"
                      + (f"-mp{args.procs}" if args.procs else "")
                      + (f"-rb{args.req_batch}" if args.req_batch > 1 else "")
                      + (f"-cp{args.client_procs}" if args.client_procs else "")
                      if args.http else "direct"),
        "latency_ms_p50": round(1000 * float(np.percentile(lat_a, 50)), 1),
        "latency_ms_p99": round(1000 * float(np.percentile(lat_a, 99)), 1),
        "device_batches": stats["batches"],
        "mean_batch_fill": round(stats["requests"] / max(stats["batches"], 1), 1),
        "device_busy_frac": round(stats["busy_s"] / wall, 3),
    }))


if __name__ == "__main__":
    main()
