"""Custom-VJP input-feed decoder scan (pure JAX, no Pallas needed).

XLA's autodiff of the input-feed decoder ``lax.scan`` accumulates every
weight gradient INSIDE the backward loop: per step, T tiny
(H, B) x (B, 3H) GEMMs per weight — K=B puts the MXU far off its sweet
spot, and these dominate the step time (backward ≈ 2.5x forward).

This module re-derives the decoder-scan VJP by hand with the classic
"save activations, hoist weight gradients" decomposition:

- forward: one scan carrying (h0, h1, feed); saves per-step h0', h1',
  attention probs (the feed history is just the shifted attn output);
  the attention query projection is pre-folded into the memory
  (``keys = mem @ Wq^T``) and the context half of the output projection
  into the values (``mem_v = mem @ Wc_ctx``) — both loop-invariant;
- backward: one reverse scan carrying ONLY the (dh0, dh1, dfeed) chain,
  emitting per-step local gradients (dx0, dhp0, dx1, dhp1, pre, dscores);
  every weight gradient then becomes ONE big batched einsum over the
  (T*B)-long activation streams — K = T*B = 8192 instead of 256, exactly
  the MXU-friendly shape.

Scope: 2-layer input-feed decoder with 'general' attention (the flagship /
reference-default configuration). Other configurations use the generic
nn.scan path in models/decoder.py. Dropout inside the recurrence is
handled via a precomputed per-step mask tensor (one RNG draw; same
distribution as flax's per-step dropout, different stream).

Gradients w.r.t. the dropout masks and the additive source-mask bias are
returned as zeros (they are non-differentiable inputs by construction).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from variational_mmt_tpu.models.gru import gru_gates

NEG_INF = -1e9


def _fwd_scan(emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
              keys, mem_v, Wc_q, mask_bias, unroll):
    """Returns (attn_hs (B,T,H), h0s, h1s (B,T,H), probs (B,T,S))."""

    def step(carry, xs):
        h0, h1, feed = carry
        ep, dm = xs
        x0 = ep + feed @ Wfeed
        h0n = gru_gates(x0, h0 @ Wh0 + bh0, h0)
        mid = dm * h0n
        x1 = mid @ Wmid + bmid
        h1n = gru_gates(x1, h1 @ Wh1 + bh1, h1)
        scores = jnp.einsum("bh,bsh->bs", h1n, keys).astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(h1n.dtype)
        ctxv = jnp.einsum("bs,bsh->bh", probs, mem_v)
        attn = jnp.tanh(ctxv + h1n @ Wc_q)
        return (h0n, h1n, attn), (attn, h0n, h1n, probs)

    (_, _, _), (attn_hs, h0s, h1s, probs) = jax.lax.scan(
        step, (h00, h01, jnp.zeros_like(h01)),
        (emb_proj.swapaxes(0, 1), dmid.swapaxes(0, 1)), unroll=unroll,
    )
    return (attn_hs.swapaxes(0, 1), h0s.swapaxes(0, 1),
            h1s.swapaxes(0, 1), probs.swapaxes(0, 1))


def _gru_bwd_local(dh_new, x_proj, h_prev, Wh, bh):
    """Local VJP of one GRU cell application h_new = gru_gates(x, h@Wh+bh, h).
    Returns (dx_proj, dh_proj, dh_prev FULL incl. the Wh^T backprop).
    Gate math lives in ONE place: models/gru.py:gru_bwd_core."""
    from variational_mmt_tpu.models.gru import gru_bwd_core

    dx, dhp, dh_prev_partial = gru_bwd_core(dh_new, x_proj, h_prev @ Wh + bh, h_prev)
    return dx, dhp, dh_prev_partial + dhp @ Wh.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(15,))
def fused_input_feed_decoder(emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid,
                             bmid, Wh1, bh1, keys, mem_v, Wc_q, mask_bias,
                             unroll=1):
    """emb_proj (B,T,3H) [incl. biases and z extras], dmid (B,T,H) dropout
    scale masks (ones when deterministic), init states (B,H), weights as in
    models/decoder.py, keys/mem_v (B,S,H) pre-projected memory, Wc_q (H,H),
    mask_bias (B,S) additive f32. Returns (attn_hs (B,T,H), probs (B,T,S))."""
    attn_hs, _, _, probs = _fwd_scan(
        emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
        keys, mem_v, Wc_q, mask_bias, unroll,
    )
    return attn_hs, probs


def _fused_fwd(emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1,
               bh1, keys, mem_v, Wc_q, mask_bias, unroll):
    attn_hs, h0s, h1s, probs = _fwd_scan(
        emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
        keys, mem_v, Wc_q, mask_bias, unroll,
    )
    res = (emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
           keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs)
    return (attn_hs, probs), res


def _fused_bwd(unroll, res, grads):
    (emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
     keys, mem_v, Wc_q, attn_hs, h0s, h1s, probs) = res
    d_attn_seq, d_probs_seq = grads

    B, T, H = attn_hs.shape
    dt = attn_hs.dtype

    # shifted histories (the step-t inputs): feed_t = attn_{t-1}, etc.
    zeros_h = jnp.zeros((B, 1, H), dt)
    feed_hist = jnp.concatenate([zeros_h, attn_hs[:, :-1]], axis=1)
    h0_hist = jnp.concatenate([h00[:, None], h0s[:, :-1]], axis=1)
    h1_hist = jnp.concatenate([h01[:, None], h1s[:, :-1]], axis=1)
    mid_hist = dmid * h0s  # recompute the dropped layer-1 inputs

    def bstep(carry, xs):
        dh0c, dh1c, dfeedc = carry
        (ep, dm, fprev, h0prev, h1prev, h0n, h1n, pr, attn, da_t, dpr_t) = xs
        da = da_t + dfeedc
        pre = (1.0 - attn * attn) * da
        dq = pre @ Wc_q.T
        dprobs = jnp.einsum("bh,bsh->bs", pre, mem_v) + dpr_t
        dprobs = dprobs.astype(jnp.float32)
        prf = pr.astype(jnp.float32)
        dscores = (prf * (dprobs - (dprobs * prf).sum(-1, keepdims=True))).astype(dt)
        dh1n = dq + jnp.einsum("bs,bsh->bh", dscores, keys) + dh1c
        x1 = (dm * h0n) @ Wmid + bmid
        dx1, dhp1, dh1prev = _gru_bwd_local(dh1n, x1, h1prev, Wh1, bh1)
        dh0n = dm * (dx1 @ Wmid.T) + dh0c
        x0 = ep + fprev @ Wfeed
        dx0, dhp0, dh0prev = _gru_bwd_local(dh0n, x0, h0prev, Wh0, bh0)
        dfeed_next = dx0 @ Wfeed.T
        return (dh0prev, dh1prev, dfeed_next), (dx0, dhp0, dx1, dhp1, pre, dscores)

    tm = lambda x: x.swapaxes(0, 1)  # (B,T,..) -> (T,B,..)
    (dh00, dh01, _), outs = jax.lax.scan(
        bstep, (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt), jnp.zeros((B, H), dt)),
        (tm(emb_proj), tm(dmid), tm(feed_hist), tm(h0_hist), tm(h1_hist),
         tm(h0s), tm(h1s), tm(probs), tm(attn_hs), tm(d_attn_seq),
         tm(d_probs_seq)),
        reverse=True, unroll=unroll,
    )
    dx0, dhp0, dx1, dhp1, pre, dscores = outs  # all (T,B,..)

    # ---- all weight grads as single big batched einsums (K = T*B) ----
    demb_proj = dx0.swapaxes(0, 1)
    dWfeed = jnp.einsum("tbh,tbk->hk", tm(feed_hist), dx0)
    dWh0 = jnp.einsum("tbh,tbk->hk", tm(h0_hist), dhp0)
    dbh0 = dhp0.sum((0, 1))
    dWmid = jnp.einsum("tbh,tbk->hk", tm(mid_hist), dx1)
    dbmid = dx1.sum((0, 1))
    dWh1 = jnp.einsum("tbh,tbk->hk", tm(h1_hist), dhp1)
    dbh1 = dhp1.sum((0, 1))
    dWc_q = jnp.einsum("tbh,tbk->hk", tm(h1s), pre)
    dkeys = jnp.einsum("tbs,tbh->bsh", dscores, tm(h1s))
    dmem_v = jnp.einsum("tbs,tbh->bsh", tm(probs), pre)

    return (demb_proj, jnp.zeros_like(dmid), dh00, dh01, dWfeed, dWh0, dbh0,
            dWmid, dbmid, dWh1, dbh1, dkeys, dmem_v, dWc_q,
            jnp.zeros((B, probs.shape[-1]), jnp.float32))


fused_input_feed_decoder.defvjp(_fused_fwd, _fused_bwd)
