"""``serve`` CLI — online translation server over a trained checkpoint.

Production counterpart of the ``translate`` CLI (which the reference stack
stops at, SURVEY.md §3.3): loads a checkpoint, warms every (bucket x batch)
decode shape, then serves HTTP requests with dynamic batching so the TPU
always runs full static-shape batches.

    python -m variational_mmt_tpu.cli.serve -model ckpts/ -port 8080
    curl -s localhost:8080/translate -d '{"texts": ["a man rides a horse ."]}'
"""

from __future__ import annotations

import argparse

from variational_mmt_tpu.config import DecodeConfig


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-model", required=True,
                   help="checkpoint dir (or specific step dir); "
                        "comma-separate several for an ensemble")
    p.add_argument("-use_ema", action="store_true",
                   help="serve the EMA (Polyak-averaged) weights instead of "
                        "the raw params (requires -ema_decay > 0 at train)")
    p.add_argument("-ensemble_mode", default="prob", choices=["prob", "logprob"],
                   help="ensemble combination of per-step distributions: "
                        "mean probability (prob) or mean log-prob (logprob)")
    p.add_argument("-infer_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="decode-time weight precision: bfloat16 halves HBM "
                        "weight traffic on the bandwidth-bound decode step; "
                        "int8 (weight-only, per-channel) quarters the "
                        "persistent weight footprint for serving density")
    p.add_argument("-host", default="127.0.0.1")
    p.add_argument("-port", type=int, default=8080)
    p.add_argument("-beam_size", type=int, default=4)
    p.add_argument("-n_best", type=int, default=1)
    p.add_argument("-max_length", type=int, default=100)
    p.add_argument("-min_length", type=int, default=0)
    p.add_argument("-alpha", type=float, default=0.6)
    p.add_argument("-coverage_beta", type=float, default=0.0)
    p.add_argument("-block_ngram_repeat", type=int, default=0,
                   help="g > 0: no served hypothesis may contain a repeated "
                        "g-gram (same semantics as the translate CLI)")
    p.add_argument("-ignore_when_blocking", default="",
                   help="space-separated tokens exempt from ngram blocking")
    p.add_argument("-batch_size", type=int, default=32,
                   help="device batch = dynamic-batch cap. Size to the "
                        "expected CONCURRENT in-flight request count, NOT "
                        "the offline decode knee: closed-loop fill is "
                        "client-bound, and an oversized static batch only "
                        "pads the program (measured round 5: batch 256 at "
                        "32 clients loses 34%% throughput at 2x p50 vs "
                        "batch 32-64 — docs/perf_notes.md)")
    p.add_argument("-max_wait_ms", type=float, default=5.0,
                   help="batching window after the first queued request")
    p.add_argument("-bpe_codes", default="", help="BPE codes applied to request text")
    p.add_argument("-max_src_tokens", type=int, default=0,
                   help="longest accepted source in post-BPE tokens (0 = the "
                        "largest bucket; larger values add a warmed bucket)")
    p.add_argument("-over_length", choices=["reject", "truncate"],
                   default="reject",
                   help="sources beyond the cap: reject -> HTTP 400, "
                        "truncate -> serve the capped prefix")
    p.add_argument("-no_lower", action="store_true")
    p.add_argument("-no_warmup", action="store_true")
    p.add_argument("-tensor_parallel", type=int, default=1,
                   help=">1: serve decode on a 2-D (data, model) mesh with "
                        "vocab-parallel embeddings+generator")
    p.add_argument("-pipeline_depth", type=int, default=0, choices=[0, 1, 2],
                   help="worker pipeline depth: 0 = auto (default; serial "
                        "on single-core hosts where pipelining measured "
                        "-17%% throughput / 2.7x p99, pipelined otherwise "
                        "— docs/perf_notes.md consolidated serving table); "
                        "2 overlaps host postprocessing with device "
                        "compute; 1 forces the classic serial loop")
    p.add_argument("-procs", type=int, default=0,
                   help="HTTP dispatcher processes sharing the port via "
                        "SO_REUSEPORT (0 = single-process threaded server); "
                        "use >=2 to lift HTTP throughput toward the "
                        "direct-queue ceiling under concurrent load")
    p.add_argument("-sampling_temp", type=float, default=0.0,
                   help="> 0: serve ancestral SAMPLING instead of beam "
                        "(forces beam_size/n_best 1); requests may pass "
                        "per-sentence 'sample_ids' — the sampled answer is "
                        "reproducible per (seed, sample_id, source, image) "
                        "and ids give alternative translations")
    p.add_argument("-sampling_topk", type=int, default=0,
                   help="sampling truncation: keep the k most likely tokens")
    p.add_argument("-sampling_topp", type=float, default=0.0,
                   help="nucleus truncation: smallest set with cum-prob >= p")
    p.add_argument("-latent_from", default="mean", choices=["mean", "sample"],
                   help="decode-time z: prior mean or per-sentence sample")
    p.add_argument("-seed", type=int, default=7,
                   help="decode PRNG seed (sampling services)")


def main(argv=None) -> None:
    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser("vmmt-tpu serve")
    add_args(p)
    opt = p.parse_args(argv)

    from variational_mmt_tpu.data.bpe import BPE
    from variational_mmt_tpu.serve import (
        MPServingServer,
        ServeConfig,
        ServingServer,
        TranslationService,
    )
    from variational_mmt_tpu.cli.loading import load_model_spec

    lm = load_model_spec(opt.model, use_ema=opt.use_ema)
    cfg, sv, tv = lm.cfg, lm.src_vocab, lm.tgt_vocab
    if lm.ensemble:
        if opt.tensor_parallel > 1:
            raise SystemExit("-tensor_parallel: not supported with an "
                             "ensemble — serve a single -model")
        print(f"ensemble of {len(lm.models)} checkpoints ({opt.ensemble_mode})")

    beam_size, n_best = opt.beam_size, opt.n_best
    if opt.sampling_temp > 0.0:
        beam_size = n_best = 1  # sampling decodes one draw per stream
    dcfg = DecodeConfig(
        beam_size=beam_size, n_best=n_best, max_length=opt.max_length,
        min_length=opt.min_length, alpha=opt.alpha, batch_size=opt.batch_size,
        coverage_beta=opt.coverage_beta, ensemble_mode=opt.ensemble_mode,
        infer_dtype=opt.infer_dtype, sampling_temp=opt.sampling_temp,
        sampling_topk=opt.sampling_topk, sampling_topp=opt.sampling_topp,
        latent_from=opt.latent_from, decode_seed=opt.seed,
        block_ngram_repeat=opt.block_ngram_repeat,
        ignore_when_blocking=opt.ignore_when_blocking,
    )
    scfg = ServeConfig(
        max_wait_ms=opt.max_wait_ms, warmup=not opt.no_warmup,
        lower=not opt.no_lower, max_src_tokens=opt.max_src_tokens,
        over_length=opt.over_length, pipeline_depth=opt.pipeline_depth,
    )
    bpe = BPE.load(opt.bpe_codes) if opt.bpe_codes else None
    mesh = None
    if opt.tensor_parallel > 1:
        import jax

        from variational_mmt_tpu.parallel.tp import (
            make_mesh_2d, validate_tp_divisibility,
        )

        validate_tp_divisibility(cfg.model, opt.tensor_parallel)
        n_data = max(1, len(jax.devices()) // opt.tensor_parallel)
        mesh = make_mesh_2d(n_data, opt.tensor_parallel)
        print(f"serving over ({n_data} data x {opt.tensor_parallel} model) mesh")
    print("compiling decode shapes..." if scfg.warmup else "warmup skipped")
    svc_model, svc_params = lm.translator_args()
    service = TranslationService(
        svc_model, svc_params, sv, tv, dcfg,
        buckets=cfg.data.buckets or [16, 24, 32, 48, 64], scfg=scfg, bpe=bpe,
        mesh=mesh,
    )
    # keep 'step' an int and 'model_type' a string for monitoring clients
    # that predate ensembles; per-member detail rides the plural fields
    info = {"model_type": ",".join(c.model.model_type for c in lm.cfgs)
            if lm.ensemble else cfg.model.model_type,
            "step": lm.steps[0],
            "beam_size": dcfg.beam_size,  # EFFECTIVE width (1 when sampling)
            "ensemble": len(lm.models) if lm.ensemble else 0}
    if dcfg.sampling_temp > 0.0:
        info["sampling_temp"] = dcfg.sampling_temp  # advertises sample_ids
    if lm.ensemble:
        info["steps"] = list(lm.steps)
        info["model_types"] = [c.model.model_type for c in lm.cfgs]
    if opt.procs > 0:
        server = MPServingServer(service, opt.host, opt.port,
                                 procs=opt.procs, info=info)
        server.start()
        print(f"serving on http://{opt.host}:{server.port}  "
              f"({opt.procs} dispatcher processes, POST /translate)")
        try:
            import threading

            threading.Event().wait()  # dispatchers own the sockets
        except KeyboardInterrupt:
            pass
        finally:
            server.stop()
        return
    server = ServingServer(service, opt.host, opt.port, info=info)
    print(f"serving on http://{opt.host}:{server.port}  (POST /translate)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
