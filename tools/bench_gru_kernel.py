#!/usr/bin/env python
"""Microbenchmark: Pallas fused GRU-layer scan vs XLA lax.scan (UniGRU path)
at the flagship bench shape. Run on real TPU; informs whether
ModelConfig.use_pallas should default on for inference.
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
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
    Wh = jnp.asarray(params["hh_kernel"]); bh = jnp.asarray(params["hh_bias"])
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
    print(f"[f32] XLA scan (incl input proj): {t_xla:.3f} ms")
    print(f"[f32] pallas  (incl input proj): {t_pal_total:.3f} ms")
    print(f"[f32] pallas  (scan only):       {t_pal_core:.3f} ms")

    # ---- bf16 comparison (the model's training dtype) ----
    mod16 = UniGRU(hidden=H, dtype=jnp.bfloat16)
    apply16 = jax.jit(lambda p, x, m: mod16.apply({"params": p}, x, m))
    xp16 = x_proj.astype(jnp.bfloat16)
    Wh16 = Wh.astype(jnp.bfloat16)
    k16 = jax.jit(lambda xp, m: gru_layer_scan(xp, m, h0, Wh16, bh))
    o3, _ = k16(xp16, m)
    err16 = float(jnp.abs(o1 - o3).max())
    print(f"[bf16] max |f32 XLA - bf16 pallas| = {err16:.3e}")
    t_xla16 = bench(apply16, params, x, m)
    t_pal16 = bench(k16, xp16, m)
    print(f"[bf16] XLA scan (incl input proj): {t_xla16:.3f} ms")
    print(f"[bf16] pallas (scan only):         {t_pal16:.3f} ms")

    # ---- train-mode fwd+bwd comparison ----
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

    def loss_xla(p):
        outs, fin = mod16.apply({"params": p}, x, m)
        return (outs.astype(jnp.float32) ** 2).sum()

    def loss_pal(p):
        # cast x too: f32 @ bf16 promotes to f32, which would stream a
        # 2x-larger x_proj than the real bf16 training path
        xp = (x.astype(jnp.bfloat16) @ p["ih"]["kernel"].astype(jnp.bfloat16)
              + p["ih"]["bias"].astype(jnp.bfloat16))
        outs, fin = gru_layer_scan_ad(xp, m, h0, p["hh_kernel"].astype(jnp.bfloat16), p["hh_bias"], False, False)
        return (outs ** 2).sum()

    gx = jax.jit(jax.grad(loss_xla))
    gp = jax.jit(jax.grad(loss_pal))
    t_gx = bench(gx, params)
    t_gp = bench(gp, params)
    print(f"[bf16 grad] XLA scan:    {t_gx:.3f} ms")
    print(f"[bf16 grad] pallas VJP:  {t_gp:.3f} ms")


if __name__ == "__main__":
    main()
