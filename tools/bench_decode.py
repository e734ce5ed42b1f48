#!/usr/bin/env python
"""Decode throughput benchmark: beam-4 sentences/sec on the flagship model
(BASELINE.md: "beam-4 sentences/sec — no reference value exists; rebuild
must measure and publish")."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
import jax.numpy as jnp
import numpy as np


def main():
    import argparse

    from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig
    from variational_mmt_tpu.decode.translator import make_translate_fn
    from variational_mmt_tpu.models.model import build_model, init_params

    ap = argparse.ArgumentParser("bench_decode")
    ap.add_argument("-ensemble", type=int, default=1,
                    help="N>1: decode an N-member checkpoint ensemble "
                         "(independent random param trees of the same "
                         "flagship shape) to measure the combination cost")
    ap.add_argument("-ensemble_mode", default="prob", choices=["prob", "logprob"])
    ap.add_argument("-infer_dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("-pallas_step", type=int, default=0,
                    help="1: fused Pallas decode-step kernel (full step); "
                         "2: fused GRU chain only, attention in XLA "
                         "(ops/pallas/decode_step.py)")
    ap.add_argument("-batch", type=int, default=0,
                    help="decode batch size (0 = default: 64 on TPU, 8 off); "
                         "per-step cost is serial-latency bound, so batch is "
                         "the throughput lever — see perf_notes 'Decode "
                         "batch scaling'")
    opt = ap.parse_args()
    if opt.ensemble < 1:
        ap.error(f"-ensemble must be >= 1, got {opt.ensemble}")

    on_tpu = jax.default_backend() == "tpu"
    B, S = (64, 24) if on_tpu else (8, 16)
    if opt.batch > 0:
        B = opt.batch
    cfg = ModelConfig(
        model_type="vmmt_c", src_vocab_size=10000, tgt_vocab_size=10000,
        emb_dim=500, hidden_dim=500, enc_layers=2, dec_layers=2, latent_dim=128,
        img_feat_dim=2048, compute_dtype="bfloat16" if on_tpu else "float32",
    )
    dcfg = DecodeConfig(beam_size=4, max_length=60 if on_tpu else 20,
                        batch_size=B, ensemble_mode=opt.ensemble_mode,
                        infer_dtype=opt.infer_dtype,
                        pallas_step=opt.pallas_step)
    model = build_model(cfg)
    M = opt.ensemble
    # this tool calls make_translate_fn directly (no Translator), so the
    # -infer_dtype weight cast Translator.__init__ would do is applied here
    from variational_mmt_tpu.decode.translator import cast_params_for_inference
    if M > 1:
        params = tuple(
            cast_params_for_inference(
                init_params(model, jax.random.PRNGKey(i)), opt.infer_dtype)
            for i in range(M))
        fn = jax.jit(make_translate_fn([model] * M, dcfg))
        print(f"{M}-member ensemble ({dcfg.ensemble_mode})")
    else:
        params = cast_params_for_inference(
            init_params(model, jax.random.PRNGKey(0)), opt.infer_dtype)
        fn = jax.jit(make_translate_fn(model, dcfg))

    leaves = jax.tree_util.tree_leaves(params)
    pbytes = sum(l.size * l.dtype.itemsize for l in leaves)
    print(f"infer_dtype={opt.infer_dtype}  param leaf dtype "
          f"{leaves[0].dtype}  total {pbytes/1e6:.1f} MB")

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 10000, (B, S)), jnp.int32)
    img = jnp.asarray(rng.standard_normal((B, 2048)), jnp.float32)

    t0 = time.time()
    toks, scores = fn(params, src, img)
    float(scores.sum())
    print(f"compile+first: {time.time()-t0:.1f}s")

    # median of N timed repetitions + IQR: one-sample decode numbers swing
    # 3x between quiet and noisy chip windows (round-2 verdict #7)
    reps = int(os.environ.get("VMMT_BENCH_DECODE_REPS", 5))
    n = 20 if on_tpu else 3
    samples = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            toks, scores = fn(params, src, img)
        float(scores.sum())
        samples.append(n * B / (time.time() - t0))
    med = float(np.median(samples))
    q1, q3 = np.percentile(samples, [25, 75])
    print(f"beam-{dcfg.beam_size} decode: {med:.1f} sent/s median "
          f"(IQR {q1:.1f}-{q3:.1f}, {reps} reps x {n} batches, batch {B}, "
          f"src_len {S}, max_len {dcfg.max_length}, {jax.default_backend()})")


if __name__ == "__main__":
    main()
