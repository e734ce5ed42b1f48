"""Fused GRU-layer scan as a single Pallas kernel.

The XLA lowering of ``lax.scan`` re-stages the (H, 3H) hidden-to-hidden
weight block and re-launches the fused loop body every timestep. This
kernel instead runs the whole sequence in ONE ``pallas_call`` with a
sequential grid over time:

- ``Wh``/``bh`` use a constant index map, so Mosaic keeps them resident in
  VMEM across all T grid steps (loaded from HBM once per sequence);
- the hidden state lives in a VMEM scratch buffer that persists across grid
  iterations (TPU grid steps execute sequentially);
- the per-step input projections (precomputed outside as one big MXU GEMM —
  see models/gru.py) are streamed (B, 3H)-block per step by the pipeline;
- masking (`h' = where(mask, gru(h,x), h)`) implements variable length and
  makes the reversed grid (``reverse=True``) correct over right-padded
  batches.

Forward-only: used by inference paths; training keeps the XLA scan (whose
autodiff is free) until the custom VJP lands. Numerical contract matches
``models/gru.py:gru_gates`` exactly (float32 state, [r|z|n] gate layout).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable lowering; CPU uses interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def pallas_available() -> bool:
    return _PALLAS_IMPORTED


def _gru_step_kernel(x_ref, m_ref, h0_ref, wh_ref, bh_ref, out_ref, fin_ref, h_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    x_proj = x_ref[:, 0, :]
    h_proj = (
        jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    )
    H = h.shape[-1]
    xr, xz, xn = x_proj[:, :H], x_proj[:, H : 2 * H], x_proj[:, 2 * H :]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H : 2 * H], h_proj[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    m = m_ref[:, 0][:, None]
    h_new = jnp.where(m > 0, h_new, h)
    h_scr[:] = h_new
    out_ref[:, 0, :] = h_new

    @pl.when(t == T - 1)
    def _():
        fin_ref[:] = h_new


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_layer_scan(
    x_proj: jax.Array,  # (B, T, 3H) precomputed input projections
    mask: jax.Array,  # (B, T)
    h0: jax.Array,  # (B, H)
    Wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    reverse: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (outputs (B, T, H), final (B, H)); matches models/gru.py
    UniGRU semantics (which it can replace 1:1 at inference)."""
    B, T, H3 = x_proj.shape
    H = H3 // 3
    f32 = jnp.float32
    x_proj = x_proj.astype(f32)
    mask = mask.astype(f32)
    h0 = h0.astype(f32)
    Wh = Wh.astype(f32)
    bh = bh.astype(f32)

    if reverse:
        t_map = lambda t: (0, T - 1 - t, 0)
        tm_map = lambda t: (0, T - 1 - t)
    else:
        t_map = lambda t: (0, t, 0)
        tm_map = lambda t: (0, t)

    outs, fin = pl.pallas_call(
        _gru_step_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, 1, H3), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), tm_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1, H), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32)],
        interpret=interpret,
    )(x_proj, mask, h0, Wh, bh)
    return outs, fin
