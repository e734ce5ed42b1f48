#!/usr/bin/env python
"""Isolated decoder-kernel benchmark: Pallas fused input-feed decoder vs the
XLA scan (models/fused_decoder.py custom-VJP path) at flagship shape,
forward and forward+grad. Mirrors tools/bench_gru_kernel.py."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
import jax.numpy as jnp
import numpy as np

# (compile cache already configured by honor_env_platform above)


def main():
    from variational_mmt_tpu.models.fused_decoder import (
        _fwd_scan, fused_input_feed_decoder,
    )
    from variational_mmt_tpu.ops.pallas.decoder import (
        decoder_fwd_pallas, fused_decoder_pallas,
    )

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    B, T, S, H = (256, 32, 32, 500) if on_tpu else (8, 4, 4, 16)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.array(rng.standard_normal(s) * 0.1, dt)
    args = (
        r(B, T, 3 * H), jnp.ones((B, T, H), dt), r(B, H), r(B, H),
        r(H, 3 * H), r(H, 3 * H), r(3 * H), r(H, 3 * H), r(3 * H),
        r(H, 3 * H), r(3 * H), r(B, S, H), r(B, S, H), r(H, H),
        jnp.zeros((B, S), jnp.float32),
    )

    def timeit(f, n=30):
        out = f()
        jax.block_until_ready(out)
        # full drain (axon under-reports on scalars)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        t0 = time.time()
        for _ in range(n):
            out = f()
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        return (time.time() - t0) / n * 1000

    xla_fwd = jax.jit(lambda a: _fwd_scan(*a, unroll=4)[0])
    pal_fwd = jax.jit(lambda a: decoder_fwd_pallas(*a, interpret=interpret)[0])
    print(f"B={B} T={T} S={S} H={H} dtype={dt.__name__}")
    print(f"fwd  XLA scan (unroll4): {timeit(lambda: xla_fwd(args)):7.2f} ms")
    print(f"fwd  Pallas            : {timeit(lambda: pal_fwd(args)):7.2f} ms")

    def loss_xla(a):
        attn, probs = fused_input_feed_decoder(*a, 4)
        return (attn.astype(jnp.float32) ** 2).sum() + (probs.astype(jnp.float32) ** 2).sum()

    def loss_pal(a):
        attn, probs = fused_decoder_pallas(*a, interpret, 0)
        return (attn ** 2).sum() + (probs ** 2).sum()

    g_xla = jax.jit(jax.grad(loss_xla))
    g_pal = jax.jit(jax.grad(loss_pal))
    print(f"grad XLA custom-VJP    : {timeit(lambda: g_xla(args)):7.2f} ms")
    print(f"grad Pallas            : {timeit(lambda: g_pal(args)):7.2f} ms")


if __name__ == "__main__":
    main()
