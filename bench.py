#!/usr/bin/env python
"""Benchmark harness: training throughput of the flagship VMMT_C model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference has no published throughput numbers (BASELINE.md: "no
reference value exists; rebuild must measure and publish"), so vs_baseline
is computed against the first recorded TPU number of this rebuild
(_ROUND1_BASELINE below).

Model/bench shape follows the reference's training regime (SURVEY.md §2.6):
Multi30k-scale vocab (10k BPE), emb 500 / GRU 500 / 2+2 layers, latent 128,
2048-d pool5 features, KL-annealed multi-task ELBO, bfloat16 compute.

Fault tolerance (round-2 verdict #1): every measurement phase runs inside a
retry loop that absorbs transient backend faults (FAILED_PRECONDITION /
UNAVAILABLE / dropped tunnel on the remote-TPU client), resets the JAX
backend, rebuilds device state from scratch, and retries with backoff. The
decode sub-bench is additionally non-fatal: if it exhausts its retries the
train JSON line is still printed with ``"decode_beam4_sent_per_sec": null``.
Decode throughput is the median of N timed repetitions with an IQR field
(verdict #7: single-sample decode numbers swung 3x run-to-run).

Fault-injection hooks for the resilience test (tests/test_bench_resilience.py):
``VMMT_BENCH_INJECT_FAULTS=N`` makes the first N drains raise a fake
FAILED_PRECONDITION; ``VMMT_BENCH_INJECT_DECODE_FAULTS=always`` makes every
decode drain fail (exercising the decode-null path).
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
from variational_mmt_tpu.utils.platform import compile_cache_stats, honor_env_platform

honor_env_platform()

# ---------------------------------------------------------------------------
# Transient-fault machinery
# ---------------------------------------------------------------------------

# Backend error markers that indicate a transient chip/tunnel fault rather
# than a code bug. Round 2's official capture died on FAILED_PRECONDITION
# during the drain; the identical command succeeded 7 minutes later.
_TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "INTERNAL",
    "Socket closed",
    "Connection reset",
    "failed to connect",
)

_inject_remaining = int(os.environ.get("VMMT_BENCH_INJECT_FAULTS", "0"))
_inject_decode = os.environ.get("VMMT_BENCH_INJECT_DECODE_FAULTS", "")


class _InjectedFault(RuntimeError):
    pass


def _is_transient(e: BaseException) -> bool:
    if isinstance(e, _InjectedFault):
        return True
    s = f"{type(e).__name__}: {e}"
    if any(m in s for m in _TRANSIENT_MARKERS):
        return True
    # XlaRuntimeError subclasses vary across jax versions; a runtime error
    # from the backend (not a trace-time TypeError) is worth one retry
    return isinstance(e, jax.errors.JaxRuntimeError)


def _reset_backend() -> None:
    """Tear down live backend clients so the next jax call reconnects."""
    try:
        jax.extend.backend.clear_backends()
    except Exception as e:  # pragma: no cover - best effort
        print(f"bench: backend reset failed ({e}); retrying anyway", file=sys.stderr)


def _retry(phase_name, fn, attempts=3,
           backoff_s=float(os.environ.get("VMMT_BENCH_BACKOFF", 5.0))):
    """Run fn() absorbing transient backend faults.

    Each retry resets the backend first, so fn must rebuild ALL device
    state (old Arrays are invalid after a reset).
    """
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classified below
            if not _is_transient(e) or i == attempts - 1:
                raise
            wait = backoff_s * (2**i)
            print(
                f"bench: transient fault in {phase_name} "
                f"(attempt {i + 1}/{attempts}): {type(e).__name__}: "
                f"{str(e)[:200]} -- resetting backend, retrying in {wait:.0f}s",
                file=sys.stderr,
            )
            _reset_backend()
            time.sleep(wait)
    raise AssertionError("unreachable")


def _drain(x) -> float:
    """Force FULL materialization: under the axon remote client,
    block_until_ready on a single scalar under-reports; fetching a
    reduction forces the whole update chain."""
    global _inject_remaining
    if _inject_remaining > 0:
        _inject_remaining -= 1
        raise _InjectedFault("FAILED_PRECONDITION: injected transient fault (test)")
    return float(x)


def _drain_decode(x) -> float:
    if _inject_decode:
        raise _InjectedFault("FAILED_PRECONDITION: injected decode fault (test)")
    return _drain(x)


# ---------------------------------------------------------------------------
# Bench phases (each builds ALL of its device state so retries are clean)
# ---------------------------------------------------------------------------


def _flagship_cfg(on_tpu: bool):
    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig

    # B=256 is the training-realistic default; B=512 is the measured
    # throughput sweet spot (docs/perf_notes.md #3) — override to compare:
    #   VMMT_BENCH_BATCH=512 python bench.py
    B = int(os.environ.get("VMMT_BENCH_BATCH", 256 if on_tpu else 32))
    if os.environ.get("VMMT_BENCH_TINY"):
        # self-test mode (tests/test_bench_resilience.py): exercise the full
        # harness — retries, phases, JSON — on a seconds-scale model
        return Config(
            model=ModelConfig(
                model_type="vmmt_c", src_vocab_size=64, tgt_vocab_size=64,
                emb_dim=16, hidden_dim=32, enc_layers=1, dec_layers=1,
                latent_dim=8, img_feat_dim=2048, dropout=0.0,
                compute_dtype="float32"),
            train=TrainConfig(batch_size=8, learning_rate=4e-4,
                              steps_per_call=1),
        )
    return Config(
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
                          steps_per_call=int(os.environ.get(
                              "VMMT_BENCH_SPC", 8 if on_tpu else 1)),
                          pack=bool(int(os.environ.get("VMMT_BENCH_PACK", "0"))),
                          pack_segments=int(os.environ.get(
                              "VMMT_BENCH_PACK_SEGMENTS", "4"))),
    )


def _make_batch(cfg, mesh, on_tpu: bool):
    from variational_mmt_tpu.parallel.mesh import batch_sharding

    B = cfg.train.batch_size
    V = cfg.model.src_vocab_size
    L = 32  # bucket length (covers Multi30k's ~20-token BPE sentences)
    spc = max(1, cfg.train.steps_per_call)
    if cfg.train.pack:
        return _make_packed_batch(cfg, mesh, B, V, L, spc)
    rng = np.random.default_rng(0)
    lens = rng.integers(L // 2, L, size=B)
    src = np.zeros((B, L), np.int32)
    tgt = np.zeros((B, L), np.int32)
    for i, ln in enumerate(lens):
        src[i, :ln] = rng.integers(4, V, ln)
        tgt[i, : ln - 1] = rng.integers(4, V, ln - 1)
    tgt_in = np.roll(tgt, 1, axis=1)
    tgt_in[:, 0] = 2
    batch = {
        "src": jnp.asarray(src),
        "tgt_in": jnp.asarray(tgt_in),
        "tgt_out": jnp.asarray(tgt),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.asarray(
            rng.standard_normal((B, cfg.model.img_feat_dim)), jnp.float32),
    }
    if spc > 1:
        # stacked (spc, B, ...) batches, second axis sharded (trainer layout)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (spc,) + x.shape), batch)
        batch = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    else:
        batch = jax.device_put(batch, batch_sharding(mesh))
    n_tokens = int((tgt != 0).sum()) * spc
    return batch, n_tokens, L


def _make_packed_batch(cfg, mesh, B, V, L, spc):
    """VMMT_BENCH_PACK=1: the same (B, L) step shape fed by the sequence
    packer (data/packing.py) over a Multi30k-like length distribution
    (BPE p50~12, p90~22) — real tokens per step rise by the recovered
    padding fraction. Stamped ``"packed": true`` in the JSON; NOT the
    headline (round-over-round comparability keeps the unpacked shape)."""
    from variational_mmt_tpu.data.dataset import BinarizedDataset
    from variational_mmt_tpu.data.packing import PackedBucketIterator

    rng = np.random.default_rng(0)
    n = B * cfg.train.pack_segments * 2
    lens = np.clip(rng.normal(13.0, 5.0, n).astype(int), 5, L - 1)
    src = [rng.integers(4, V, l).astype(np.int32) for l in lens]
    tgt = [rng.integers(4, V, max(2, l - 1)).astype(np.int32) for l in lens]
    it = PackedBucketIterator(BinarizedDataset(src, tgt), B, [L], seed=0,
                              max_segments=cfg.train.pack_segments)
    pb = next(it.epoch(0))
    K = pb.seg_mask.shape[1]
    batch = {
        "src": jnp.asarray(pb.src), "tgt_in": jnp.asarray(pb.tgt_in),
        "tgt_out": jnp.asarray(pb.tgt_out),
        "src_seg": jnp.asarray(pb.src_seg), "tgt_seg": jnp.asarray(pb.tgt_seg),
        "seg_first": jnp.asarray(pb.seg_first),
        "seg_last": jnp.asarray(pb.seg_last),
        "seg_mask": jnp.asarray(pb.seg_mask),
        "img": jnp.asarray(
            rng.standard_normal((B, K, cfg.model.img_feat_dim)), jnp.float32),
    }
    if spc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (spc,) + x.shape), batch)
        batch = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    else:
        from variational_mmt_tpu.parallel.mesh import batch_sharding

        batch = jax.device_put(batch, batch_sharding(mesh))
    n_tokens = int((pb.tgt_seg >= 0).sum()) * spc
    return batch, n_tokens, L


def _train_phase(pack_override=None):
    """Build the flagship model + train step, measure throughput.

    Returns (result_dict, params_host) — params come back as host numpy so
    the decode phase can survive a backend reset between phases.

    pack_override=True reruns the same flagship config through the sequence
    packer (data/packing.py) for the secondary packed line in main().
    """
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.parallel.mesh import make_mesh
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    platform = jax.default_backend()
    n_dev = len(jax.devices())
    on_tpu = platform == "tpu"
    cfg = _flagship_cfg(on_tpu)
    if pack_override is not None:
        from dataclasses import replace

        cfg = replace(cfg, train=replace(cfg.train, pack=pack_override))
    model = build_model(cfg.model)
    mesh = make_mesh()
    state = create_train_state(cfg, model)
    spc = max(1, cfg.train.steps_per_call)
    step = make_train_step(cfg, model, mesh)
    batch, n_tokens, L = _make_batch(cfg, mesh, on_tpu)

    # warmup / compile (two signatures: fresh state + donated-state steady)
    t0 = time.time()
    state, m = step(state, batch)
    _drain(jax.tree.leaves(state.params)[0].sum())
    compile_s = time.time() - t0
    for _ in range(3):
        state, m = step(state, batch)
    _drain(jax.tree.leaves(state.params)[0].sum())

    n_calls = (32 if on_tpu else 10) // spc if spc > 1 else (30 if on_tpu else 10)
    n_calls = max(2, n_calls)
    t0 = time.time()
    for _ in range(n_calls):
        state, m = step(state, batch)
    _drain(jax.tree.leaves(state.params)[0].sum())
    dt = time.time() - t0

    n_opt_steps = n_calls * spc
    tok_per_sec = n_tokens * n_calls / dt
    per_chip = tok_per_sec / n_dev
    step_s = dt / n_opt_steps

    # analytic MFU (matmul FLOPs only -> conservative); peak overridable
    # for non-v5e chips via VMMT_PEAK_FLOPS
    from variational_mmt_tpu.utils.flops import V5E_BF16_PEAK, train_step_flops

    peak = float(os.environ.get("VMMT_PEAK_FLOPS", V5E_BF16_PEAK))
    flops = train_step_flops(cfg.model, cfg.train.batch_size, L, L)
    mfu = flops / step_s / (peak * n_dev) if on_tpu else 0.0

    result = {
        "platform": platform,
        "n_devices": n_dev,
        # host cores gate the Python side of the decode line (beam
        # postprocessing) and any serving numbers taken the same day —
        # rounds run on heterogeneous driver boxes (round 3c saw 1 core)
        "host_cpus": os.cpu_count(),
        "global_batch": cfg.train.batch_size,
        "seq_len": L,
        "per_chip": per_chip,
        "step_ms": 1000 * step_s,
        "steps_per_call": spc,
        "mfu": mfu,
        "compile_s": compile_s,
        "on_tpu": on_tpu,
    }
    if cfg.train.pack:
        result["packed"] = True
        result["pack_segments"] = cfg.train.pack_segments
    # pull params to host so decode can rebuild device state independently
    params_host = jax.tree.map(np.asarray, state.params)
    return result, params_host, cfg


def _decode_phase(params_host, cfg, on_tpu: bool):
    """Beam-4 decode throughput on the trained params.

    Median of N timed repetitions + IQR (verdict #7: one-sample decode
    numbers swung 3x between quiet and noisy chip windows).
    """
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.decode.translator import make_translate_fn
    from variational_mmt_tpu.models.model import build_model

    model = build_model(cfg.model)
    params = jax.tree.map(jnp.asarray, params_host)
    rng = np.random.default_rng(1)
    # decode batch 256 = the measured throughput knee (perf_notes "Decode
    # batch scaling": 5250-5340 sent/s at 256 vs 4392 at 64 and 4240 at
    # 512). Rounds 1-3 benched at 64; decode_batch is stamped in the JSON
    # so numbers are only compared at the same operating point.
    DB, DS = (256, 24) if on_tpu else (8, 8)
    dcfg = DecodeConfig(beam_size=4, max_length=60 if on_tpu else 12, batch_size=DB)
    tfn = jax.jit(make_translate_fn(model, dcfg))
    dsrc = jnp.asarray(
        rng.integers(4, cfg.model.src_vocab_size, (DB, DS)), jnp.int32)
    dimg = jnp.asarray(
        rng.standard_normal((DB, cfg.model.img_feat_dim)), jnp.float32)
    toks, _ = tfn(params, dsrc, dimg)
    _drain_decode(toks.sum())  # compile + warmup

    n_rep = int(os.environ.get("VMMT_BENCH_DECODE_REPS", 5))
    n_dec = 10 if on_tpu else 2
    samples = []
    for _ in range(n_rep):
        t0 = time.time()
        for _ in range(n_dec):
            toks, _ = tfn(params, dsrc, dimg)
        _drain_decode(toks.sum())  # full drain (axon: scalar block under-reports)
        samples.append(DB * n_dec / (time.time() - t0))
    med = float(np.median(samples))
    q1, q3 = np.percentile(samples, [25, 75])
    return {
        "decode_beam4_sent_per_sec": round(med, 1),
        "decode_iqr": [round(float(q1), 1), round(float(q3), 1)],
        "decode_reps": n_rep,
        "decode_batch": DB,
    }


def main() -> None:
    # Train phase is mandatory: exhausting its retries kills the bench.
    res, params_host, cfg = _retry("train", _train_phase)

    # Secondary PACKED train line (TPU only, best-effort): same flagship
    # config fed by the sequence packer — measures real-token throughput
    # with padding recovered (perf_notes "Sequence packing": +20.6%). The
    # headline stays the unpacked shape for round-over-round comparability;
    # this stamps the packed number into the same official JSON line.
    packed_extra = {}
    if res.get("platform") == "tpu" and not cfg.train.pack \
            and not os.environ.get("VMMT_BENCH_TINY") \
            and not os.environ.get("VMMT_BENCH_NO_PACKED"):
        try:
            pres, _, _ = _retry(
                "train_packed", lambda: _train_phase(pack_override=True),
                attempts=2)
            packed_extra = {
                "packed_per_chip": round(pres["per_chip"], 1),
                "packed_step_ms": round(pres["step_ms"], 4),
                "packed_mfu": round(pres["mfu"], 4),
            }
        except Exception as e:  # noqa: BLE001 - never lose the headline
            print(f"bench: packed sub-bench failed after retries: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    # Decode phase is best-effort: never lose the train number to it.
    if cfg.train.pack:
        # packed mode measures TRAINING only: its corpus carries real EOS
        # tokens, so the briefly-trained params emit EOS immediately and
        # beams early-exit — a 4x "decode speedup" that measures nothing.
        # The unpacked run's decode line is the comparable one.
        dec = {"decode_beam4_sent_per_sec": None, "decode_iqr": None,
               "decode_reps": 0}
    else:
        try:
            dec = _retry("decode", lambda: _decode_phase(params_host, cfg, res["on_tpu"]),
                         attempts=2)
        except Exception as e:  # noqa: BLE001
            print(f"bench: decode sub-bench failed after retries: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            dec = {"decode_beam4_sent_per_sec": None, "decode_iqr": None,
                   "decode_reps": 0}

    # First real-TPU measurement of this rebuild becomes the baseline the
    # driver tracks across rounds (reference published no perf numbers).
    _ROUND1_BASELINE = 365000.0  # tok/s/chip, v5e-1, round 1 (2026-08-16)
    on_tpu = res.pop("on_tpu")
    vs = res["per_chip"] / _ROUND1_BASELINE if on_tpu else 1.0

    cache = compile_cache_stats()
    out = {
        "metric": "train_tokens_per_sec_per_chip",
        "value": round(res.pop("per_chip"), 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(vs, 3),
        **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in res.items()},
        **packed_extra,
        **dec,
        "compile_cache": cache,
        "model": ("vmmt_c 500/500x2+2 z128 bf16 pallas+fusedce" if on_tpu
                  else "vmmt_c 500/500x2+2 z128 f32"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
