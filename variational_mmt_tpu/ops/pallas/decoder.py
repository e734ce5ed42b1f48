"""Fused input-feed decoder sequence kernel (forward + custom VJP).

docs/perf_notes.md #1 / SURVEY.md §2.2: the input-feed recurrence
(GRU0 -> dropout -> GRU1 -> general attention -> tanh output, attn output
fed back into the next step's input) serializes the whole decoder; under
``lax.scan`` XLA re-stages every weight block and re-launches the body per
timestep, and the backward's serial dh-chain costs ~2x the forward. These
kernels run the WHOLE sequence (fwd or bwd) as one ``pallas_call`` with a
sequential time grid:

- the five weight blocks (Wfeed, Wh0, Wmid, Wh1, Wc_q ~ 6.5 MB bf16 at
  H=500) and the pre-projected attention memory (keys = mem @ Wq^T,
  mem_v = mem @ Wc_ctx) use constant index maps, so Mosaic keeps them
  VMEM-resident across all T steps — loaded from HBM once per sequence;
- per step only 5 (C,H)x(H,3H|H) GEMMs + 2 attention contractions +
  softmax remain; the recurrent state (h0, h1, feed) lives in VMEM scratch;
- the backward kernel runs the time grid in reverse, carries ONLY the
  (dh0, dh1, dfeed) chain, recomputes the gates, and streams per-step local
  gradients to HBM; every weight gradient is then ONE large batched einsum
  over the (T*B)-long activation streams OUTSIDE the kernel (the
  decomposition proven exact in models/fused_decoder.py) — this avoids both
  the (B,S,H) dMemory accumulator and the 15 MB weight-grad accumulators;
- VMEM forces batch chunks (~64 rows fwd / ~32 bwd at H=500, S=32); rows
  are independent, so the wrapper splits and concatenates.

Numerical contract matches models/fused_decoder.py:_fwd_scan with f32 state
and gate math (the jax path computes in the compute dtype; tests compare in
f32 where both are exact). Scope: 2-layer input-feed decoder with 'general'
attention — the flagship configuration (reference
onmt.Models.InputFeedRNNDecoder, SURVEY.md §2.1 #8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from variational_mmt_tpu.ops.pallas.gru import pallas_available  # noqa: F401

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pass

f32 = jnp.float32


# single source of the gate math (models/gru.py): the kernel bodies lower
# these jnp ops directly
from variational_mmt_tpu.models.gru import gru_bwd_core as _gru_bwd_math
from variational_mmt_tpu.models.gru import gru_gates as _gru_fwd_math


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
def _dec_fwd_kernel(
    ep_ref, dm_ref, h00_ref, h01_ref, wf_ref, wh0_ref, bh0_ref, wm_ref,
    bm_ref, wh1_ref, bh1_ref, k_ref, mv_ref, wcq_ref, mb_ref,
    attn_ref, h0s_ref, h1s_ref, pr_ref,
    h0_scr, h1_scr, f_scr,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h0_scr[:] = h00_ref[:].astype(f32)
        h1_scr[:] = h01_ref[:].astype(f32)
        f_scr[:] = jnp.zeros_like(f_scr)

    cdt = wf_ref.dtype  # MXU dtype follows the weights (bf16 or f32)
    h0, h1, feed = h0_scr[:], h1_scr[:], f_scr[:]
    x0 = ep_ref[0].astype(f32) + jnp.dot(
        feed.astype(cdt), wf_ref[:], preferred_element_type=f32
    )
    hp0 = jnp.dot(h0.astype(cdt), wh0_ref[:], preferred_element_type=f32) + bh0_ref[0]
    h0n = _gru_fwd_math(x0, hp0, h0)
    mid = dm_ref[0].astype(f32) * h0n
    x1 = jnp.dot(mid.astype(cdt), wm_ref[:], preferred_element_type=f32) + bm_ref[0]
    hp1 = jnp.dot(h1.astype(cdt), wh1_ref[:], preferred_element_type=f32) + bh1_ref[0]
    h1n = _gru_fwd_math(x1, hp1, h1)

    # general attention over the resident pre-projected memory. NOTE:
    # batched dot_general does not lower in Mosaic here (no lhs
    # non-contracting dim -> parse error; adding a singleton dim -> an
    # unsupported shape cast), so the contractions are explicit
    # broadcast-multiply-reduces on the VPU.
    scores = (h1n[:, None, :].astype(cdt) * k_ref[:]).sum(-1, dtype=f32)
    scores = scores + mb_ref[:]
    scores = scores - scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = e / e.sum(axis=-1, keepdims=True)
    ctx = (probs[:, :, None].astype(cdt) * mv_ref[:]).sum(1, dtype=f32)
    attn = jnp.tanh(ctx + jnp.dot(h1n.astype(cdt), wcq_ref[:], preferred_element_type=f32))

    h0_scr[:] = h0n
    h1_scr[:] = h1n
    f_scr[:] = attn
    # activation streams saved in the compute dtype (bf16 halves the
    # HBM write traffic; the jax reference path saves in dt as well)
    attn_ref[0] = attn.astype(attn_ref.dtype)
    h0s_ref[0] = h0n.astype(h0s_ref.dtype)
    h1s_ref[0] = h1n.astype(h1s_ref.dtype)
    pr_ref[0] = probs.astype(pr_ref.dtype)


def _fwd_rows(H: int, S: int, itemsize: int) -> int:
    """Rows per kernel call: keys+mem_v (2*C*S*H*w) + per-row streams must
    leave room for ~7 MB of resident weights in 16 MB VMEM."""
    budget = 6 * 1024 * 1024
    per_row = 2 * S * H * itemsize + 40 * H  # memory blocks + dbl-buffered streams
    rows = budget // max(per_row, 1)
    return max(8, min(512, (rows // 8) * 8))


@functools.partial(
    jax.jit, static_argnames=("interpret", "row_chunk")
)
def decoder_fwd_pallas(
    emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
    keys, mem_v, Wc_q, mask_bias, interpret: bool = False, row_chunk: int = 0,
):
    """Forward-only fused decoder scan. Shapes as in
    models/fused_decoder.py:_fwd_scan. Returns (attn_hs, h0s, h1s, probs),
    batch-major, in the COMPUTE dtype (keys.dtype; bf16 at the flagship
    config — halves the activation-stream HBM traffic, and the jax
    reference path saves activations in the compute dtype too)."""
    B, T, H3 = emb_proj.shape
    H = H3 // 3
    S = keys.shape[1]
    chunk = row_chunk or _fwd_rows(H, S, keys.dtype.itemsize)
    if B > chunk:
        parts = [
            decoder_fwd_pallas(
                emb_proj[s], dmid[s], h00[s], h01[s], Wfeed, Wh0, bh0, Wmid,
                bmid, Wh1, bh1, keys[s], mem_v[s], Wc_q, mask_bias[s],
                interpret=interpret, row_chunk=row_chunk,
            )
            for s in _slices(B, chunk)
        ]
        return tuple(jnp.concatenate([p[i] for p in parts], 0) for i in range(4))

    tm = lambda a: a.swapaxes(0, 1)  # batch-major -> time-major
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    step3 = lambda shape: pl.BlockSpec(shape, lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)

    attn, h0s, h1s, probs = pl.pallas_call(
        _dec_fwd_kernel,
        grid=(T,),
        in_specs=[
            step3((1, B, H3)),            # emb_proj
            step3((1, B, H)),             # dmid
            const((B, H)), const((B, H)),  # h00, h01
            const((H, H3)), const((H, H3)), const((1, H3)),  # Wfeed, Wh0, bh0
            const((H, H3)), const((1, H3)),                   # Wmid, bmid
            const((H, H3)), const((1, H3)),                   # Wh1, bh1
            const((B, S, H)), const((B, S, H)),                # keys, mem_v
            const((H, H)),                                     # Wc_q
            const((B, S)),                                     # mask_bias
        ],
        out_specs=[step3((1, B, H)), step3((1, B, H)), step3((1, B, H)),
                   step3((1, B, S))],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), keys.dtype),
            jax.ShapeDtypeStruct((T, B, H), keys.dtype),
            jax.ShapeDtypeStruct((T, B, H), keys.dtype),
            jax.ShapeDtypeStruct((T, B, S), keys.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32)] * 3,
        interpret=interpret,
    )(
        tm(emb_proj), tm(dmid), h00.astype(f32), h01.astype(f32),
        Wfeed, Wh0, bh0.astype(f32).reshape(1, H3),
        Wmid, bmid.astype(f32).reshape(1, H3),
        Wh1, bh1.astype(f32).reshape(1, H3),
        keys, mem_v, Wc_q, mask_bias.astype(f32),
    )
    return tm(attn), tm(h0s), tm(h1s), tm(probs)


def _slices(B, chunk):
    return [slice(i, min(i + chunk, B)) for i in range(0, B, chunk)]


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------
def _dec_bwd_kernel(
    ep_ref, dm_ref, h0s_ref, pr_ref, attn_ref,
    h0p_ref, h1p_ref, fp_ref,  # prev-step blocks (index map t-1)
    da_ref, dpr_ref,
    h00_ref, h01_ref, wf_ref, wh0_ref, bh0_ref, wm_ref, bm_ref,
    wh1_ref, bh1_ref, k_ref, mv_ref, wcq_ref,
    dx0_ref, dhp0_ref, dx1_ref, dhp1_ref, pre_ref, dsc_ref,
    dh00_ref, dh01_ref,
    dh0_scr, dh1_scr, df_scr,
):
    g = pl.program_id(0)
    T = pl.num_programs(0)
    first_t = g == T - 1  # grid step g processes forward time t = T-1-g

    @pl.when(g == 0)
    def _():
        dh0_scr[:] = jnp.zeros_like(dh0_scr)
        dh1_scr[:] = jnp.zeros_like(dh1_scr)
        df_scr[:] = jnp.zeros_like(df_scr)

    cdt = wf_ref.dtype
    attn = attn_ref[0].astype(f32)
    da = da_ref[0] + df_scr[:]
    pre = (1.0 - attn * attn) * da
    dq = jnp.dot(pre.astype(cdt), wcq_ref[:].T, preferred_element_type=f32)
    dprobs = (pre[:, None, :].astype(cdt) * mv_ref[:]).sum(-1, dtype=f32) + dpr_ref[0]
    prf = pr_ref[0].astype(f32)
    dscores = prf * (dprobs - (dprobs * prf).sum(-1, keepdims=True))
    dh1n = dq + (dscores[:, :, None].astype(cdt) * k_ref[:]).sum(1, dtype=f32) + dh1_scr[:]

    h0n = h0s_ref[0].astype(f32)
    dm = dm_ref[0].astype(f32)
    mid = dm * h0n
    x1 = jnp.dot(mid.astype(cdt), wm_ref[:], preferred_element_type=f32) + bm_ref[0]
    h1prev = jnp.where(first_t, h01_ref[:], h1p_ref[0].astype(f32))
    hp1 = jnp.dot(h1prev.astype(cdt), wh1_ref[:], preferred_element_type=f32) + bh1_ref[0]
    dx1, dhp1, dh1prev = _gru_bwd_math(dh1n, x1, hp1, h1prev)
    dh1prev = dh1prev + jnp.dot(dhp1.astype(cdt), wh1_ref[:].T, preferred_element_type=f32)

    dh0n = dm * jnp.dot(dx1.astype(cdt), wm_ref[:].T, preferred_element_type=f32) + dh0_scr[:]
    fprev = jnp.where(first_t, jnp.zeros_like(attn), fp_ref[0].astype(f32))
    x0 = ep_ref[0].astype(f32) + jnp.dot(
        fprev.astype(cdt), wf_ref[:], preferred_element_type=f32
    )
    h0prev = jnp.where(first_t, h00_ref[:], h0p_ref[0].astype(f32))
    hp0 = jnp.dot(h0prev.astype(cdt), wh0_ref[:], preferred_element_type=f32) + bh0_ref[0]
    dx0, dhp0, dh0prev = _gru_bwd_math(dh0n, x0, hp0, h0prev)
    dh0prev = dh0prev + jnp.dot(dhp0.astype(cdt), wh0_ref[:].T, preferred_element_type=f32)

    df_scr[:] = jnp.dot(dx0.astype(cdt), wf_ref[:].T, preferred_element_type=f32)
    dh0_scr[:] = dh0prev
    dh1_scr[:] = dh1prev
    dx0_ref[0] = dx0
    dhp0_ref[0] = dhp0
    dx1_ref[0] = dx1
    dhp1_ref[0] = dhp1
    pre_ref[0] = pre
    dsc_ref[0] = dscores

    @pl.when(g == T - 1)
    def _():
        dh00_ref[:] = dh0prev
        dh01_ref[:] = dh1prev


def _bwd_rows(H: int, S: int, itemsize: int) -> int:
    # streams: ~10 input blocks (mostly bf16) + 4x (B,3H) f32 local-grad
    # outputs, double-buffered; measured: 40 rows at H=500/S=32/bf16
    # overflows the 16 MB VMEM by 0.5 MB, 32 fits
    budget = 5 * 1024 * 1024
    per_row = 2 * S * H * itemsize + 150 * H
    rows = budget // max(per_row, 1)
    return max(8, min(256, (rows // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk"))
def decoder_bwd_pallas(
    emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
    keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs, d_attn, d_probs,
    interpret: bool = False, row_chunk: int = 0,
):
    """Reverse-time kernel. All sequence args batch-major. Returns
    (dx0, dhp0, dx1, dhp1, pre, dscores) batch-major f32 + (dh00, dh01)."""
    B, T, H3 = emb_proj.shape
    H = H3 // 3
    S = keys.shape[1]
    chunk = row_chunk or _bwd_rows(H, S, keys.dtype.itemsize)
    if B > chunk:
        parts = [
            decoder_bwd_pallas(
                emb_proj[s], dmid[s], h00[s], h01[s], Wfeed, Wh0, bh0, Wmid,
                bmid, Wh1, bh1, keys[s], mem_v[s], Wc_q, attn_hs[s], h0s[s],
                h1s[s], probs[s], d_attn[s], d_probs[s],
                interpret=interpret, row_chunk=row_chunk,
            )
            for s in _slices(B, chunk)
        ]
        return tuple(jnp.concatenate([p[i] for p in parts], 0) for i in range(8))

    tm = lambda a: a.swapaxes(0, 1)
    const = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    # grid g processes forward time t = T-1-g
    cur = lambda shape: pl.BlockSpec(shape, lambda g: (T - 1 - g, 0, 0),
                                     memory_space=pltpu.VMEM)
    prev = lambda shape: pl.BlockSpec(
        shape, lambda g: (jnp.maximum(T - 2 - g, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        _dec_bwd_kernel,
        grid=(T,),
        in_specs=[
            cur((1, B, H3)),   # emb_proj
            cur((1, B, H)),    # dmid
            cur((1, B, H)),    # h0s
            # h1s only as the PREV-step block below: h1n is recomputed from
            # the recurrence inputs, so streaming the current-step h1s was a
            # dead double-buffered fetch per step
            cur((1, B, S)),    # probs
            cur((1, B, H)),    # attn_hs
            prev((1, B, H)),   # h0s prev
            prev((1, B, H)),   # h1s prev
            prev((1, B, H)),   # attn prev (feed history)
            cur((1, B, H)),    # d_attn
            cur((1, B, S)),    # d_probs
            const((B, H)), const((B, H)),  # h00, h01
            const((H, H3)), const((H, H3)), const((1, H3)),
            const((H, H3)), const((1, H3)),
            const((H, H3)), const((1, H3)),
            const((B, S, H)), const((B, S, H)), const((H, H)),
        ],
        out_specs=[
            cur((1, B, H3)), cur((1, B, H3)), cur((1, B, H3)), cur((1, B, H3)),
            cur((1, B, H)), cur((1, B, S)),
            const((B, H)), const((B, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), f32),
            jax.ShapeDtypeStruct((T, B, H3), f32),
            jax.ShapeDtypeStruct((T, B, H3), f32),
            jax.ShapeDtypeStruct((T, B, H3), f32),
            jax.ShapeDtypeStruct((T, B, H), f32),
            jax.ShapeDtypeStruct((T, B, S), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32)] * 3,
        interpret=interpret,
    )(
        tm(emb_proj), tm(dmid), tm(h0s), tm(probs), tm(attn_hs),
        tm(h0s), tm(h1s), tm(attn_hs),
        tm(d_attn.astype(f32)), tm(d_probs.astype(f32)),
        h00.astype(f32), h01.astype(f32),
        Wfeed, Wh0, bh0.astype(f32).reshape(1, H3),
        Wmid, bmid.astype(f32).reshape(1, H3),
        Wh1, bh1.astype(f32).reshape(1, H3),
        keys, mem_v, Wc_q,
    )
    dx0, dhp0, dx1, dhp1, pre, dsc, dh00, dh01 = outs
    return (tm(dx0), tm(dhp0), tm(dx1), tm(dhp1), tm(pre), tm(dsc), dh00, dh01)


# ----------------------------------------------------------------------
# differentiable wrapper (weight grads assembled outside as big einsums)
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16))
def fused_decoder_pallas(emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid,
                         bmid, Wh1, bh1, keys, mem_v, Wc_q, mask_bias,
                         interpret=False, row_chunk=0):
    """Same contract as models/fused_decoder.py:fused_input_feed_decoder,
    with both passes as Pallas sequence kernels. Returns
    (attn_hs (B,T,H), probs (B,T,S)) in the compute dtype (keys.dtype)."""
    attn_hs, _, _, probs = decoder_fwd_pallas(
        emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
        keys, mem_v, Wc_q, mask_bias, interpret=interpret, row_chunk=row_chunk,
    )
    return attn_hs, probs


def _pal_fwd(emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
             keys, mem_v, Wc_q, mask_bias, interpret, row_chunk):
    attn_hs, h0s, h1s, probs = decoder_fwd_pallas(
        emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
        keys, mem_v, Wc_q, mask_bias, interpret=interpret, row_chunk=row_chunk,
    )
    res = (emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
           keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs)
    return (attn_hs, probs), res


def _pal_bwd(interpret, row_chunk, res, grads):
    (emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
     keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs) = res
    d_attn, d_probs = grads
    B, T, H = attn_hs.shape

    dx0, dhp0, dx1, dhp1, pre, dscores, dh00, dh01 = decoder_bwd_pallas(
        emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
        keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs, d_attn, d_probs,
        interpret=interpret, row_chunk=row_chunk,
    )

    # histories (step-t INPUTS) for the hoisted weight-grad einsums
    zeros_h = jnp.zeros((B, 1, H), f32)
    feed_hist = jnp.concatenate([zeros_h, attn_hs[:, :-1]], axis=1)
    h0_hist = jnp.concatenate([h00.astype(f32)[:, None], h0s[:, :-1]], axis=1)
    h1_hist = jnp.concatenate([h01.astype(f32)[:, None], h1s[:, :-1]], axis=1)
    mid_hist = dmid.astype(f32) * h0s

    demb_proj = dx0.astype(emb_proj.dtype)
    dWfeed = jnp.einsum("bth,btk->hk", feed_hist, dx0)
    dWh0 = jnp.einsum("bth,btk->hk", h0_hist, dhp0)
    dbh0 = dhp0.sum((0, 1))
    dWmid = jnp.einsum("bth,btk->hk", mid_hist, dx1)
    dbmid = dx1.sum((0, 1))
    dWh1 = jnp.einsum("bth,btk->hk", h1_hist, dhp1)
    dbh1 = dhp1.sum((0, 1))
    dWc_q = jnp.einsum("bth,btk->hk", h1s, pre)
    dkeys = jnp.einsum("bts,bth->bsh", dscores, h1s)
    dmem_v = jnp.einsum("bts,bth->bsh", probs, pre)

    cast = lambda g, ref: g.astype(ref.dtype)
    return (
        demb_proj, jnp.zeros_like(dmid), cast(dh00, h00), cast(dh01, h01),
        cast(dWfeed, Wfeed), cast(dWh0, Wh0), cast(dbh0, bh0),
        cast(dWmid, Wmid), cast(dbmid, bmid), cast(dWh1, Wh1), cast(dbh1, bh1),
        cast(dkeys, keys), cast(dmem_v, mem_v), cast(dWc_q, Wc_q),
        jnp.zeros((B, probs.shape[-1]), f32),
    )


fused_decoder_pallas.defvjp(_pal_fwd, _pal_bwd)
