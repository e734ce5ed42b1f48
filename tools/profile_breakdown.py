#!/usr/bin/env python
"""Step-time breakdown by ablation (no profiler needed — the axon tunnel
doesn't expose jax.profiler): times the flagship train step under variants
that isolate decoder scan, input feeding, latent machinery, and backward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
import jax.numpy as jnp
import numpy as np


def make_batch(B, L, V=10000, img_dim=2048, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "src": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "tgt_in": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "tgt_out": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.asarray(rng.standard_normal((B, img_dim)), jnp.float32),
    }


def main():
    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.loss import compute_loss
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    B, L = 256, 32
    base = dict(
        model_type="vmmt_c", src_vocab_size=10000, tgt_vocab_size=10000,
        emb_dim=500, hidden_dim=500, enc_layers=2, dec_layers=2, latent_dim=128,
        img_feat_dim=2048, dropout=0.3, word_dropout=0.1, compute_dtype="bfloat16",
    )
    variants = [
        ("full vmmt_c", dict()),
        ("full + pallas GRU encoders", dict(use_pallas=True, pallas_decoder=False)),
        ("full + pallas enc+dec", dict(use_pallas=True, pallas_decoder=True)),
        ("full + pallas enc+dec + fused_ce", dict(use_pallas=True, pallas_decoder=True, fused_ce=True)),
        ("full + fused_ce only", dict(fused_ce=True)),
        ("full + pallas enc + unroll4", dict(use_pallas=True, pallas_decoder=False,
                                             scan_unroll=4)),
        ("full + pallas enc+dec + fused_ce + unroll4",
         dict(use_pallas=True, pallas_decoder=True, fused_ce=True, scan_unroll=4)),
        ("full + pallas enc + fused_ce + unroll4 (DEFAULTS)",
         dict(use_pallas=True, fused_ce=True, scan_unroll=4)),
        ("full + unroll4", dict(scan_unroll=4)),
        ("no input feed", dict(input_feed=False)),
        ("fast: no-feed + pallas + unroll4",
         dict(input_feed=False, use_pallas=True, scan_unroll=4)),
        ("nmt (no latent)", dict(model_type="nmt", use_img_predict=False)),
        ("enc_layers=1 dec_layers=1", dict(enc_layers=1, dec_layers=1)),
    ]
    batch = make_batch(B, L)

    def timeit(cfgkw, fwd_only=False):
        cfg = Config(model=ModelConfig(**{**base, **cfgkw}), train=TrainConfig(batch_size=B))
        model = build_model(cfg.model)
        state = create_train_state(cfg, model)
        if fwd_only:
            def fwd(params, batch, step):
                out = model.apply({"params": params}, batch["src"], batch["tgt_in"],
                                  batch.get("img"), deterministic=True, sample=False)
                loss, _ = compute_loss(out, batch["tgt_out"], batch["example_mask"],
                                       batch.get("img"), cfg.model, cfg.train, step)
                return loss

            f = jax.jit(fwd)
            f(state.params, batch, state.step)  # compile
            float(f(state.params, batch, state.step))
            n = 30
            t0 = time.time()
            for _ in range(n):
                l = f(state.params, batch, state.step)
            float(l)
            return (time.time() - t0) / n * 1000
        step_fn = make_train_step(cfg, model)
        for _ in range(3):
            state, m = step_fn(state, batch)
        float(jax.tree.leaves(state.params)[0].sum())
        n = 30
        t0 = time.time()
        for _ in range(n):
            state, m = step_fn(state, batch)
        float(jax.tree.leaves(state.params)[0].sum())
        return (time.time() - t0) / n * 1000

    print(f"platform={jax.default_backend()} B={B} L={L}")
    full_fwd = timeit({}, fwd_only=True)
    print(f"{'full fwd only':30s} {full_fwd:8.2f} ms")
    for name, kw in variants:
        ms = timeit(kw)
        print(f"{name:30s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
