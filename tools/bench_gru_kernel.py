#!/usr/bin/env python
"""Microbenchmark: Pallas fused GRU-layer scan vs XLA lax.scan (UniGRU path)
at the flagship bench shape. Run on real TPU; informs whether
ModelConfig.use_pallas should default on for inference.
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def drain(x):
    return float(jnp.sum(x))


def main():
    from variational_mmt_tpu.models.gru import UniGRU
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan

    B, T, E, H = 256, 32, 500, 256  # one encoder direction (hidden//2 rounded up)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    m = jnp.ones((B, T), jnp.float32)

    mod = UniGRU(hidden=H)
    params = mod.init(jax.random.PRNGKey(0), x, m)["params"]
    apply_fn = jax.jit(lambda p, x, m: mod.apply({"params": p}, x, m))

    Wi = jnp.asarray(params["ih"]["kernel"]); bi = jnp.asarray(params["ih"]["bias"])
    Wh = jnp.asarray(params["scan"]["cell"]["hh"]["kernel"]); bh = jnp.asarray(params["scan"]["cell"]["hh"]["bias"])
    h0 = jnp.zeros((B, H), jnp.float32)

    proj = jax.jit(lambda x: x @ Wi + bi)
    x_proj = proj(x)

    kernel_fn = jax.jit(lambda xp, m: gru_layer_scan(xp, m, h0, Wh, bh))

    # correctness on-device first
    o1, f1 = apply_fn(params, x, m)
    o2, f2 = kernel_fn(x_proj, m)
    err = float(jnp.abs(o1 - o2).max())
    print(f"max |XLA - pallas| = {err:.3e}")

    def bench(fn, *args, n=50):
        out = fn(*args)
        drain(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        drain(jax.tree.leaves(out)[0])
        return (time.time() - t0) / n * 1000

    t_xla = bench(apply_fn, params, x, m)
    t_pal_total = bench(lambda x, m: kernel_fn(proj(x), m), x, m)
    t_pal_core = bench(kernel_fn, x_proj, m)
    print(f"XLA scan (incl input proj): {t_xla:.3f} ms")
    print(f"pallas  (incl input proj): {t_pal_total:.3f} ms")
    print(f"pallas  (scan only):       {t_pal_core:.3f} ms")


if __name__ == "__main__":
    main()
