#!/usr/bin/env python
"""Compiled-memory report for the train step (XLA memory_analysis).

Quantifies the HBM story the docs claim qualitatively — in particular that
fused CE (ops/fused_ce.py) removes the (B·T, V) logits tensor from the
step's temporary memory:

    python tools/memory_report.py                 # flagship shape
    python tools/memory_report.py -batch_size 512 -seq_len 48

Prints one JSON line per variant {fused, naive} with XLA's generated-code
memory breakdown (argument/output/temp/alias bytes) and the delta.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def analyze(cfg, B, L):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    rng = np.random.default_rng(0)
    batch = {
        "src": jnp.asarray(rng.integers(4, cfg.model.src_vocab_size, (B, L)), jnp.int32),
        "tgt_in": jnp.asarray(rng.integers(4, cfg.model.tgt_vocab_size, (B, L)), jnp.int32),
        "tgt_out": jnp.asarray(rng.integers(4, cfg.model.tgt_vocab_size, (B, L)), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.asarray(rng.standard_normal((B, cfg.model.img_feat_dim)), jnp.float32),
    }
    # steps_per_call=1: per-step memory, no stacked-batch inflation; the
    # exposed raw jit keeps the production donation/sharding signature
    step = make_train_step(cfg, model, None, steps_per_call=1)
    c = step._jit.lower(state, batch).compile()
    ma = c.memory_analysis()
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        out[k.replace("_size_in_bytes", "_mb")] = round(
            getattr(ma, k) / 2**20, 2) if ma is not None else None
    return out


def main():
    p = argparse.ArgumentParser("memory report")
    p.add_argument("-batch_size", type=int, default=256)
    p.add_argument("-seq_len", type=int, default=32)
    p.add_argument("-vocab", type=int, default=10000)
    args = p.parse_args()

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    import jax

    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig

    platform = jax.devices()[0].platform
    # "axon" is the remote-tunnel TPU plugin; a native runtime reports "tpu"
    on_tpu = platform in ("axon", "tpu")
    rows = {}
    for fused in (True, False):
        m = ModelConfig(
            model_type="vmmt_c", src_vocab_size=args.vocab,
            tgt_vocab_size=args.vocab, emb_dim=500, hidden_dim=500,
            enc_layers=2, dec_layers=2, latent_dim=128, img_feat_dim=2048,
            dropout=0.3, compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=on_tpu, fused_ce=fused,
        )
        cfg = Config(model=m, train=TrainConfig(learning_rate=4e-4))
        rows["fused" if fused else "naive"] = analyze(
            cfg, args.batch_size, args.seq_len)
    naive_t, fused_t = rows["naive"]["temp_mb"], rows["fused"]["temp_mb"]
    print(json.dumps({
        "metric": "train_step_temp_mb",
        "platform": "tpu" if on_tpu else platform,
        "batch": args.batch_size, "seq_len": args.seq_len, "vocab": args.vocab,
        "fused": rows["fused"], "naive": rows["naive"],
        "temp_saved_mb": (round(naive_t - fused_t, 2)
                          if None not in (naive_t, fused_t) else None),
        "logits_tensor_mb": round(
            args.batch_size * args.seq_len * args.vocab * 4 / 2**20, 2),
    }))


if __name__ == "__main__":
    main()
