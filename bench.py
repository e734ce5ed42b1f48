#!/usr/bin/env python
"""Benchmark harness: training throughput of the flagship VMMT_C model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference has no published throughput numbers (BASELINE.md: "no
reference value exists; rebuild must measure and publish"), so vs_baseline
is computed against the first recorded TPU number of this rebuild
(_ROUND1_BASELINE below); until that constant is filled from a real TPU
run, vs_baseline is 1.0.

Model/bench shape follows the reference's training regime (SURVEY.md §2.6):
Multi30k-scale vocab (10k BPE), emb 500 / GRU 500 / 2+2 layers, latent 128,
2048-d pool5 features, KL-annealed multi-task ELBO, bfloat16 compute.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (per-user, VMMT_COMPILE_CACHE override) so repeat
# bench runs skip the ~3min first-compile; also honors JAX_PLATFORMS
from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()


def main() -> None:
    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.parallel.mesh import batch_sharding, make_mesh
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    platform = jax.default_backend()
    n_dev = len(jax.devices())
    on_tpu = platform == "tpu"

    # B=256 is the training-realistic default; B=512 is the measured
    # throughput sweet spot (docs/perf_notes.md #3) — override to compare:
    #   VMMT_BENCH_BATCH=512 python bench.py
    B = int(os.environ.get("VMMT_BENCH_BATCH", 256 if on_tpu else 32))
    L = 32  # bucket length (covers Multi30k's ~20-token BPE sentences)
    cfg = Config(
        model=ModelConfig(
            model_type="vmmt_c", src_vocab_size=10000, tgt_vocab_size=10000,
            emb_dim=500, hidden_dim=500, enc_layers=2, dec_layers=2,
            latent_dim=128, img_feat_dim=2048, dropout=0.3, word_dropout=0.1,
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=on_tpu,  # fused GRU encoder + input-feed decoder kernels
            scan_unroll=4 if on_tpu else 1,  # decoder loop unrolling
            fused_ce=on_tpu,  # generator GEMM fused into the chunked CE
        ),
        # steps_per_call matches the recommended training config (multi-step
        # lax.scan dispatch amortizes per-dispatch host/RPC latency — the
        # same program a real -steps_per_call 8 run executes)
        train=TrainConfig(batch_size=B, learning_rate=4e-4,
                          steps_per_call=int(os.environ.get("VMMT_BENCH_SPC", 8 if on_tpu else 1))),
    )
    model = build_model(cfg.model)
    mesh = make_mesh()
    state = create_train_state(cfg, model)
    spc = max(1, cfg.train.steps_per_call)
    step = make_train_step(cfg, model, mesh)

    rng = np.random.default_rng(0)
    lens = rng.integers(L // 2, L, size=B)
    src = np.zeros((B, L), np.int32)
    tgt = np.zeros((B, L), np.int32)
    for i, ln in enumerate(lens):
        src[i, :ln] = rng.integers(4, 10000, ln)
        tgt[i, : ln - 1] = rng.integers(4, 10000, ln - 1)
    tgt_in = np.roll(tgt, 1, axis=1)
    tgt_in[:, 0] = 2
    batch = {
        "src": jnp.asarray(src),
        "tgt_in": jnp.asarray(tgt_in),
        "tgt_out": jnp.asarray(tgt),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.asarray(rng.standard_normal((B, 2048)), jnp.float32),
    }
    if spc > 1:
        # stacked (spc, B, ...) batches, second axis sharded (trainer layout)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (spc,) + x.shape), batch)
        batch = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    else:
        batch = jax.device_put(batch, batch_sharding(mesh))
    n_tokens = int((tgt != 0).sum()) * spc

    def drain(s):
        # force FULL materialization: under the axon remote client,
        # block_until_ready on a single scalar under-reports; fetching a
        # param reduction forces the whole update chain
        return float(jax.tree.leaves(s.params)[0].sum())

    # warmup / compile (two signatures: fresh state + donated-state steady)
    t0 = time.time()
    state, m = step(state, batch)
    drain(state)
    compile_s = time.time() - t0
    for _ in range(3):
        state, m = step(state, batch)
    drain(state)

    n_calls = (32 if on_tpu else 10) // spc if spc > 1 else (30 if on_tpu else 10)
    n_calls = max(2, n_calls)
    t0 = time.time()
    for _ in range(n_calls):
        state, m = step(state, batch)
    drain(state)
    dt = time.time() - t0

    n_opt_steps = n_calls * spc
    tok_per_sec = n_tokens * n_calls / dt
    per_chip = tok_per_sec / n_dev
    step_s = dt / n_opt_steps

    # analytic MFU (matmul FLOPs only -> conservative); peak overridable
    # for non-v5e chips via VMMT_PEAK_FLOPS
    from variational_mmt_tpu.utils.flops import V5E_BF16_PEAK, train_step_flops

    peak = float(os.environ.get("VMMT_PEAK_FLOPS", V5E_BF16_PEAK))
    flops = train_step_flops(cfg.model, B, L, L)
    mfu = flops / step_s / (peak * n_dev) if on_tpu else 0.0

    # --- beam-4 decode throughput (same flagship checkpoint) ---
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.decode.translator import make_translate_fn

    DB, DS = (64, 24) if on_tpu else (8, 8)
    dcfg = DecodeConfig(beam_size=4, max_length=60 if on_tpu else 12, batch_size=DB)
    tfn = jax.jit(make_translate_fn(model, dcfg))
    dsrc = jnp.asarray(rng.integers(4, 10000, (DB, DS)), jnp.int32)
    dimg = jnp.asarray(rng.standard_normal((DB, 2048)), jnp.float32)
    toks, _ = tfn(state.params, dsrc, dimg)
    toks.block_until_ready()
    n_dec = 10 if on_tpu else 2
    t0 = time.time()
    for _ in range(n_dec):
        toks, _ = tfn(state.params, dsrc, dimg)
    float(toks.sum())  # full drain (axon: scalar block under-reports)
    dec_dt = time.time() - t0
    dec_sent_s = DB * n_dec / dec_dt

    # First real-TPU measurement of this rebuild becomes the baseline the
    # driver tracks across rounds (reference published no perf numbers).
    _ROUND1_BASELINE = 365000.0  # tok/s/chip, v5e-1, round 1 (2026-08-16)
    vs = per_chip / _ROUND1_BASELINE if on_tpu else 1.0

    print(json.dumps({
        "metric": "train_tokens_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(vs, 3),
        "platform": platform,
        "n_devices": n_dev,
        "global_batch": B,
        "seq_len": L,
        "step_ms": round(1000 * step_s, 2),
        "steps_per_call": spc,
        "mfu": round(mfu, 4),
        "decode_beam4_sent_per_sec": round(dec_sent_s, 1),
        "compile_s": round(compile_s, 1),
        "model": ("vmmt_c 500/500x2+2 z128 bf16 pallas+fusedce" if on_tpu
                  else "vmmt_c 500/500x2+2 z128 f32"),
    }))


if __name__ == "__main__":
    main()
