#!/usr/bin/env python
"""Decode-step latency breakdown (round-4 verdict #4).

bench decode is serial-latency bound at ~0.24 ms/beam-step (perf_notes
"Decode batch scaling"); this tool isolates WHERE that time goes before any
kernel work. Each component is timed as N serialized iterations inside ONE
``lax.scan`` dispatch (the realistic regime: the beam's while_loop body is
a serial chain on-device), so per-iteration numbers include the real
op-to-op latency, not host dispatch.

Components at flagship decode shape (B=64, K=4 -> 256 rows, S=24, H=500,
V=10k, bf16):
  step_full      the production translate-fn beam body (reference total)
  recurrent      emb gather + z-proj + 2 GRU cells + input feed
  attention      linear_in + scores + masked softmax + context + linear_out
  generator      (256,500)@(500,10k) GEMM + f32 log_softmax
  topk           beam top-k over (64, K*V) + the %/// decode of indices
  reorder        carry/token gathers by parent (the beam bookkeeping)

Usage: python tools/profile_decode_step.py [-iters 60] [-batch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp


def _time(fn, *args, reps=5, chain=8):
    """Median seconds per call. Each timed sample chains ``chain``
    dispatches before draining — a single call per sample would be
    dominated by the axon tunnel's per-dispatch RTT (~10-30 ms), which
    async dispatch pipelines away across consecutive calls."""
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(chain):
            out = fn(*args)
        # full drain (axon: scalar block under-reports)
        np.asarray(jax.tree.leaves(out)[0]).sum()
        samples.append((time.time() - t0) / chain)
    return float(np.median(samples))


def main():
    ap = argparse.ArgumentParser("decode step profile")
    ap.add_argument("-iters", type=int, default=60)
    ap.add_argument("-batch", type=int, default=64)
    ap.add_argument("-beam", type=int, default=4)
    ap.add_argument("-src_len", type=int, default=24)
    ap.add_argument("-hidden", type=int, default=500)
    ap.add_argument("-emb", type=int, default=500)
    ap.add_argument("-vocab", type=int, default=10000)
    ap.add_argument("-latent", type=int, default=128)
    args = ap.parse_args()

    from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig
    from variational_mmt_tpu.decode.translator import make_translate_fn
    from variational_mmt_tpu.models.model import VMMTModel, build_model, init_params

    B, K, S, H, V = args.batch, args.beam, args.src_len, args.hidden, args.vocab
    N = B * K
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(
        model_type="vmmt_c", src_vocab_size=V, tgt_vocab_size=V,
        emb_dim=args.emb, hidden_dim=H, enc_layers=2, dec_layers=2,
        latent_dim=args.latent, img_feat_dim=2048, dropout=0.0,
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=on_tpu)
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, V, (B, S)), jnp.int32)
    img = jnp.asarray(rng.standard_normal((B, 2048)), jnp.float32)

    results = {}

    # ---- full production path (reference total) ----
    dcfg = DecodeConfig(beam_size=K, max_length=args.iters, min_length=args.iters,
                        batch_size=B)
    # min_length == max_length forces the loop to run all iters (no early
    # EOS exit) so per-step division is exact
    tfn = jax.jit(make_translate_fn(model, dcfg))
    total_s = _time(lambda: tfn(params, src, img))
    results["step_full_ms"] = 1000 * total_s / args.iters

    # ---- shared device state for component timings ----
    mem, finals, src_mask, summary = model.apply(
        {"params": params}, src, method=VMMTModel.encode)
    z = model.apply({"params": params}, summary, img,
                    method=VMMTModel.prior_latent)
    init_hs = model.apply({"params": params}, finals, z,
                          method=VMMTModel.init_decoder_state)
    carry0 = model.apply({"params": params}, init_hs,
                         method=VMMTModel.init_decode_carry)
    keys = model.apply({"params": params}, mem,
                       method=VMMTModel.project_memory)
    tile = lambda x: jnp.repeat(x, K, axis=0)
    mem_t, keys_t, mask_t, z_t = tile(mem), tile(keys), tile(src_mask), tile(z)
    carry_t = jax.tree.map(tile, carry0)
    toks0 = jnp.full((N,), 2, jnp.int32)

    def scan_n(body, init):
        def f(c, _):
            return body(c), None
        return jax.lax.scan(f, init, None, length=args.iters)[0]

    # ---- recurrent + attention chain (decode_step minus generator) ----
    def rec_attn_body(c):
        carry, toks = c
        new_carry, (attn_h, _) = model.apply(
            {"params": params}, carry,
            model.apply({"params": params},
                        method=lambda m: m.tgt_embed(toks)),
            mem_t, mask_t,
            extra_input_proj=model.apply(
                {"params": params}, z_t, method=VMMTModel.z_extra_proj),
            keys=keys_t,
            method=lambda m, *a, **k: m.decoder.one_step(*a, **k))
        # data-dependent next token keeps iterations serialized
        nxt = (attn_h[:, :1].astype(jnp.float32).sum(-1).astype(jnp.int32) % 7 + 4)
        return (new_carry, nxt)

    rec = jax.jit(lambda c, t: scan_n(rec_attn_body, (c, t)))
    results["recurrent_attn_ms"] = 1000 * _time(rec, carry_t, toks0) / args.iters

    # ---- generator GEMM + log_softmax ----
    h0 = jnp.asarray(rng.standard_normal((N, H)),
                     jnp.bfloat16 if on_tpu else jnp.float32)

    def gen_body(h):
        logits = model.apply({"params": params}, h, method=VMMTModel._gen)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # feed a transform of the output back in to serialize
        return (h + (logp[:, :H] + logp.mean()).astype(h.dtype) * 0).astype(h.dtype)

    gen = jax.jit(lambda h: scan_n(gen_body, h))
    results["generator_ms"] = 1000 * _time(gen, h0) / args.iters

    # ---- beam top-k over (B, K*V) ----
    logp0 = jnp.asarray(rng.standard_normal((B, K * V)), jnp.float32)

    def topk_body(x):
        scores, idx = jax.lax.top_k(x, K)
        parents, toks = idx // V, idx % V
        upd = (scores.sum() + parents.sum() + toks.sum()).astype(x.dtype) * 0.0
        return x + upd

    topk = jax.jit(lambda x: scan_n(topk_body, x))
    results["topk_ms"] = 1000 * _time(topk, logp0) / args.iters

    # ---- beam reorder bookkeeping (carry + token gathers) ----
    from variational_mmt_tpu.ops.beam import _gather_beams

    tokens0 = jnp.zeros((B, K, args.iters), jnp.int32)
    parents0 = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)

    def reorder_body(c):
        carry, tokens, parents = c
        carry = _gather_beams(carry, parents, B, K)
        tokens = jnp.take_along_axis(tokens, parents[..., None], axis=1)
        parents = (parents + tokens[:, :, 0]) % K  # serialize
        return (carry, tokens, parents)

    reo = jax.jit(lambda c: scan_n(reorder_body, c))
    results["reorder_ms"] = 1000 * _time(
        reo, (carry_t, tokens0, parents0)) / args.iters

    results["iters"] = args.iters
    results["shape"] = f"B{B} K{K} S{S} H{H} V{V}"
    results["platform"] = jax.default_backend()
    comp_sum = (results["recurrent_attn_ms"] + results["generator_ms"]
                + results["topk_ms"] + results["reorder_ms"])
    results["component_sum_ms"] = comp_sum
    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
