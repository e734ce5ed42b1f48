"""Fused generator + cross-entropy (SURVEY.md §2.1 #9, docs/perf_notes.md #2).

The reference shards its NLL loss to bound GPU memory because the
(B*T, V) logits tensor is the memory hot spot. The TPU-native answer is to
never materialize it at all: this op fuses the generator GEMM with the
softmax-CE in row chunks —

- forward: for each chunk of C rows, compute logits (C, V) on the MXU
  (bf16 inputs, f32 accumulate), reduce immediately to logsumexp, target
  logit, argmax, and (for label smoothing) the PAD logit and the logit sum;
  only O(N) per-row scalars leave the chunk. Peak intermediate = (C, V)
  instead of (B*T, V), and no full-logits tensor is ever written for the
  backward.
- backward (custom VJP): recompute each chunk's logits, form
  dlogits = g * (p - q) (q = the smoothed label distribution: 1-eps on
  gold, eps/(V-2) on classes that are neither PAD nor gold), and
  accumulate dx = dlogits W^T, dW = x^T dlogits, db = sum dlogits — the
  Liger-kernel recomputation strategy expressed as an XLA scan.

Numerics match train/loss.py:token_ce exactly (f32 softmax, same smoothing
convention); tests/test_loss.py asserts value- and gradient-equality.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from variational_mmt_tpu.data.vocab import PAD


def _pad_rows(a: jax.Array, n_pad: int):
    if n_pad == 0:
        return a
    pad_width = ((0, n_pad),) + ((0, 0),) * (a.ndim - 1)
    return jnp.pad(a, pad_width)


def _chunk_stats(x_c, W, b, tgt_c):
    """One chunk: logits -> (lse, z_t, logit_pad, logit_sum, pred)."""
    logits = jnp.dot(x_c, W, preferred_element_type=jnp.float32) + b
    m = logits.max(axis=-1)
    lse = m + jnp.log(jnp.exp(logits - m[:, None]).sum(axis=-1))
    z_t = jnp.take_along_axis(logits, tgt_c[:, None], axis=-1)[:, 0]
    return (
        lse,
        z_t,
        logits[:, PAD],
        logits.sum(axis=-1),
        jnp.argmax(logits, axis=-1).astype(jnp.int32),
    )


def _nll_from_stats(lse, z_t, logit_pad, logit_sum, V, eps):
    nll_raw = lse - z_t
    if eps > 0.0:
        # smoothing term: -mean over classes != gold, != PAD of logp
        sum_logp = logit_sum - V * lse
        rest = sum_logp - (z_t - lse) - (logit_pad - lse)
        smooth = -rest / (V - 2.0)
        nll = (1.0 - eps) * nll_raw + eps * smooth
    else:
        nll = nll_raw
    return nll, nll_raw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_generator_ce(
    x: jax.Array,  # (N, H) decoder outputs (compute dtype)
    W: jax.Array,  # (H, V) generator kernel
    b: jax.Array,  # (V,) generator bias
    targets: jax.Array,  # (N,) int32
    mask: jax.Array,  # (N,) float32 token mask
    label_smoothing: float = 0.0,
    chunk: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (nll (N,) masked training CE, nll_raw (N,) masked unsmoothed
    NLL, n_correct scalar). Differentiable in x, W, b AND mask (the mask
    cotangent is the per-token unmasked NLL, saved at fwd time — (N,) f32,
    negligible next to x); targets/n_correct carry no gradient."""
    return _fused_fwd_impl(x, W, b, targets, mask, label_smoothing, chunk)[0]


def _fused_fwd_impl(x, W, b, targets, mask, eps, chunk):
    N, H = x.shape
    V = W.shape[1]
    C = min(chunk, max(8, N))
    n_pad = (-N) % C
    xp = _pad_rows(x, n_pad).reshape(-1, C, H)
    tp = _pad_rows(targets, n_pad).reshape(-1, C)
    mp = _pad_rows(mask, n_pad).reshape(-1, C)
    bf = b.astype(jnp.float32)

    def body(_, xs):
        x_c, t_c, m_c = xs
        lse, z_t, l_pad, l_sum, pred = _chunk_stats(x_c, W, b=bf, tgt_c=t_c)
        nll, nll_raw = _nll_from_stats(lse, z_t, l_pad, l_sum, V, eps)
        nc = ((pred == t_c) * m_c).sum()
        return 0, (nll * m_c, nll_raw * m_c, nc, nll, nll_raw)

    _, (nll, nll_raw, ncs, nll_u, nll_raw_u) = jax.lax.scan(body, 0, (xp, tp, mp))
    nll = nll.reshape(-1)[:N]
    nll_raw = nll_raw.reshape(-1)[:N]
    out = (nll, nll_raw, ncs.sum())
    # unmasked per-token NLLs: d(nll_i * m_i)/dm_i, the mask cotangent
    return out, (x, W, b, targets, mask,
                 nll_u.reshape(-1)[:N], nll_raw_u.reshape(-1)[:N])


def _fused_bwd_impl(eps, chunk, res, grads):
    x, W, b, targets, mask, nll_u, nll_raw_u = res
    g_nll, g_raw, _ = grads  # n_correct has no gradient
    N, H = x.shape
    V = W.shape[1]
    C = min(chunk, max(8, N))
    n_pad = (-N) % C
    xp = _pad_rows(x, n_pad).reshape(-1, C, H)
    tp = _pad_rows(targets, n_pad).reshape(-1, C)
    mp = _pad_rows(mask, n_pad).reshape(-1, C)
    gp = _pad_rows(g_nll.astype(jnp.float32) * mask, n_pad).reshape(-1, C)
    grp = _pad_rows(g_raw.astype(jnp.float32) * mask, n_pad).reshape(-1, C)
    bf = b.astype(jnp.float32)
    cdt = W.dtype  # MXU dtype follows the weights

    def body(acc, xs):
        dW_acc, db_acc = acc
        x_c, t_c, m_c, g_c, gr_c = xs
        logits = jnp.dot(x_c, W, preferred_element_type=jnp.float32) + bf
        p = jax.nn.softmax(logits, axis=-1)
        e_t = jax.nn.one_hot(t_c, V, dtype=jnp.float32)
        # d nll / d logits = p - q (q = smoothed label distribution)
        if eps > 0.0:
            e_pad = jax.nn.one_hot(jnp.full_like(t_c, PAD), V, dtype=jnp.float32)
            q = (1.0 - eps) * e_t + (eps / (V - 2.0)) * (1.0 - e_t - e_pad)
        else:
            q = e_t
        dlogits = g_c[:, None] * (p - q) + gr_c[:, None] * (p - e_t)
        dx_c = jnp.dot(dlogits.astype(cdt), W.T, preferred_element_type=jnp.float32)
        dW_acc = dW_acc + jnp.dot(
            x_c.astype(cdt).T, dlogits.astype(cdt), preferred_element_type=jnp.float32
        )
        db_acc = db_acc + dlogits.sum(axis=0)
        return (dW_acc, db_acc), dx_c

    zeroW = jnp.zeros((H, V), jnp.float32)
    zerob = jnp.zeros((V,), jnp.float32)
    (dW, db), dx = jax.lax.scan(body, (zeroW, zerob), (xp, tp, mp, gp, grp))
    dx = dx.reshape(-1, H)[:N].astype(x.dtype)
    # outputs are nll*m and nll_raw*m, so d/dm is the unmasked NLLs
    dmask = (g_nll.astype(jnp.float32) * nll_u
             + g_raw.astype(jnp.float32) * nll_raw_u).astype(mask.dtype)
    return dx, dW.astype(W.dtype), db.astype(b.dtype), None, dmask


fused_generator_ce.defvjp(
    lambda x, W, b, t, m, eps, chunk: _fused_fwd_impl(x, W, b, t, m, eps, chunk),
    _fused_bwd_impl,
)
