"""Fused beam-decode STEP kernel (round-4 verdict #4).

The beam's while-loop body at inference shapes (B·K=256 rows, S<=32,
H=500) runs the input-feed recurrence as ~10 separate XLA fusions per
step — each paying a kernel launch plus an HBM round-trip for its (256,
1500)-ish intermediate. The training-time *sequence* kernel
(ops/pallas/decoder.py) could not win because training shapes blow VMEM
and the backward dominates; the INFERENCE step is a different regime:
forward-only, keys+mem_v ≈ 12 MB at decode shapes, so one launch per
step fuses

    x0 = emb_proj + feed @ Wfeed
    h0' = GRU(x0, h0)                      (no dropout: inference)
    h1' = GRU(h0' @ Wmid + bmid, h1)
    probs = masked softmax((h1' · keys) + mask_bias)
    attn  = tanh(sum_s probs·mem_v + h1' @ Wc_q)

into a single Pallas call: five weight blocks stay VMEM-resident across
the row-chunk grid, every intermediate lives in registers/VMEM, and the
only HBM traffic is inputs, outputs, and one read of the resident blocks.

Same weight decomposition as models/fused_decoder.py (mem_v = memory @
Wc_ctx hoisted per sequence; linear_out split into Wc_ctx/Wc_q halves).
Exactness vs the XLA one_step path is tested in f32 interpret mode
(tests/test_pallas.py); scope = the flagship 2-layer GRU + general
attention + input_feed configuration (SURVEY.md §2.2's named native
equivalent: "fused GRU+attention decoder step").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from variational_mmt_tpu.models.gru import gru_gates as _gru_fwd_math
from variational_mmt_tpu.ops.pallas.gru import pallas_available  # noqa: F401

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pass

f32 = jnp.float32


def _step_kernel(
    ep_ref, h0_ref, h1_ref, f_ref,
    wf_ref, wh0_ref, bh0_ref, wm_ref, bm_ref, wh1_ref, bh1_ref,
    k_ref, mv_ref, wcq_ref, mb_ref,
    h0o_ref, h1o_ref, attn_ref, pr_ref,
):
    cdt = wf_ref.dtype  # MXU dtype follows the weights (bf16 or f32)
    h0 = h0_ref[:].astype(f32)
    h1 = h1_ref[:].astype(f32)
    feed = f_ref[:].astype(f32)
    x0 = ep_ref[:].astype(f32) + jnp.dot(
        feed.astype(cdt), wf_ref[:], preferred_element_type=f32)
    hp0 = jnp.dot(h0.astype(cdt), wh0_ref[:], preferred_element_type=f32) + bh0_ref[0]
    h0n = _gru_fwd_math(x0, hp0, h0)
    x1 = jnp.dot(h0n.astype(cdt), wm_ref[:], preferred_element_type=f32) + bm_ref[0]
    hp1 = jnp.dot(h1.astype(cdt), wh1_ref[:], preferred_element_type=f32) + bh1_ref[0]
    h1n = _gru_fwd_math(x1, hp1, h1)

    # general attention over the resident pre-projected memory; batched
    # dot_general does not lower in Mosaic here (see ops/pallas/decoder.py)
    # so the contractions are broadcast-multiply-reduces on the VPU
    scores = (h1n[:, None, :].astype(cdt) * k_ref[:]).sum(-1, dtype=f32)
    scores = scores + mb_ref[:]
    scores = scores - scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = e / e.sum(axis=-1, keepdims=True)
    ctx = (probs[:, :, None].astype(cdt) * mv_ref[:]).sum(1, dtype=f32)
    attn = jnp.tanh(ctx + jnp.dot(
        h1n.astype(cdt), wcq_ref[:], preferred_element_type=f32))

    h0o_ref[:] = h0n.astype(h0o_ref.dtype)
    h1o_ref[:] = h1n.astype(h1o_ref.dtype)
    attn_ref[:] = attn.astype(attn_ref.dtype)
    pr_ref[:] = probs.astype(pr_ref.dtype)


def _chain_kernel(
    ep_ref, h0_ref, h1_ref, f_ref,
    wf_ref, wh0_ref, bh0_ref, wm_ref, bm_ref, wh1_ref, bh1_ref,
    h0o_ref, h1o_ref,
):
    """GRU chain only (attention stays in XLA): fewer VMEM-resident blocks
    (~6 MB of weights, no keys/mem_v), so all beam rows fit one chunk."""
    cdt = wf_ref.dtype
    h0 = h0_ref[:].astype(f32)
    h1 = h1_ref[:].astype(f32)
    feed = f_ref[:].astype(f32)
    x0 = ep_ref[:].astype(f32) + jnp.dot(
        feed.astype(cdt), wf_ref[:], preferred_element_type=f32)
    hp0 = jnp.dot(h0.astype(cdt), wh0_ref[:], preferred_element_type=f32) + bh0_ref[0]
    h0n = _gru_fwd_math(x0, hp0, h0)
    x1 = jnp.dot(h0n.astype(cdt), wm_ref[:], preferred_element_type=f32) + bm_ref[0]
    hp1 = jnp.dot(h1.astype(cdt), wh1_ref[:], preferred_element_type=f32) + bh1_ref[0]
    h1n = _gru_fwd_math(x1, hp1, h1)
    h0o_ref[:] = h0n.astype(h0o_ref.dtype)
    h1o_ref[:] = h1n.astype(h1o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_chain_pallas(
    emb_proj, h0, h1, feed,
    Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
    interpret: bool = False,
):
    """Fused 2-layer input-feed GRU chain for one decode step (no
    attention). Returns (h0n, h1n) in the carry dtypes."""
    N, H3 = emb_proj.shape
    H = H3 // 3
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chain_kernel,
        in_specs=[vm()] * 11,
        out_specs=[vm(), vm()],
        out_shape=[jax.ShapeDtypeStruct((N, H), h0.dtype),
                   jax.ShapeDtypeStruct((N, H), h1.dtype)],
        interpret=interpret,
    )(
        emb_proj, h0, h1, feed,
        Wfeed, Wh0, bh0.astype(f32).reshape(1, H3),
        Wmid, bmid.astype(f32).reshape(1, H3),
        Wh1, bh1.astype(f32).reshape(1, H3),
    )


def _rows_per_chunk(H: int, S: int, itemsize: int) -> int:
    """keys+mem_v dominate VMEM at decode shapes; leave ~7 MB for the five
    resident weight blocks (≈6.5 MB bf16 at H=500) plus streams."""
    budget = 7 * 1024 * 1024
    per_row = 2 * S * H * itemsize + 16 * H * 4
    rows = budget // max(per_row, 1)
    return max(8, min(512, (rows // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk"))
def decode_step_pallas(
    emb_proj, h0, h1, feed,
    Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
    keys, mem_v, Wc_q, mask_bias,
    interpret: bool = False, row_chunk: int = 0,
):
    """One fused decode step over N rows.

    emb_proj (N,3H) = ih_emb(tok_emb) [+ z_input_proj], f32 or compute
    dtype; h0/h1/feed (N,H) carry; weights as models/decoder.py preps them
    (compute dtype); keys/mem_v (N,S,H); Wc_q (H,H); mask_bias (N,S) f32
    (0 real / -1e9 pad). Returns (h0n, h1n, attn, probs) with carry dtypes
    matching their inputs and probs in keys.dtype.
    """
    N, H3 = emb_proj.shape
    H = H3 // 3
    S = keys.shape[1]
    chunk = row_chunk or _rows_per_chunk(H, S, keys.dtype.itemsize)
    pad = (-N) % chunk if N > chunk else chunk - N
    if pad:
        padr = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        emb_proj, h0, h1, feed = map(padr, (emb_proj, h0, h1, feed))
        keys, mem_v, mask_bias = map(padr, (keys, mem_v, mask_bias))
    Np = emb_proj.shape[0]
    G = Np // chunk

    row2 = lambda d1: pl.BlockSpec((chunk, d1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    row3 = lambda d1, d2: pl.BlockSpec((chunk, d1, d2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    h0n, h1n, attn, probs = pl.pallas_call(
        _step_kernel,
        grid=(G,),
        in_specs=[
            row2(H3), row2(H), row2(H), row2(H),
            const((H, H3)), const((H, H3)), const((1, H3)),
            const((H, H3)), const((1, H3)),
            const((H, H3)), const((1, H3)),
            row3(S, H), row3(S, H),
            const((H, H)),
            row2(S),
        ],
        out_specs=[row2(H), row2(H), row2(H), row2(S)],
        out_shape=[
            jax.ShapeDtypeStruct((Np, H), h0.dtype),
            jax.ShapeDtypeStruct((Np, H), h1.dtype),
            jax.ShapeDtypeStruct((Np, H), feed.dtype),
            jax.ShapeDtypeStruct((Np, S), keys.dtype),
        ],
        interpret=interpret,
    )(
        emb_proj, h0, h1, feed,
        Wfeed, Wh0, bh0.astype(f32).reshape(1, H3),
        Wmid, bmid.astype(f32).reshape(1, H3),
        Wh1, bh1.astype(f32).reshape(1, H3),
        keys, mem_v, Wc_q, mask_bias.astype(f32),
    )
    if pad:
        h0n, h1n, attn, probs = (a[:N] for a in (h0n, h1n, attn, probs))
    return h0n, h1n, attn, probs
