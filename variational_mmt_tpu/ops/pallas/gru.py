"""Fused GRU-layer scan as a single Pallas kernel (forward + custom VJP).

The XLA lowering of ``lax.scan`` re-stages the (H, 3H) hidden-to-hidden
weight block and re-launches the fused loop body every timestep. These
kernels instead run the whole sequence in ONE ``pallas_call`` with a
sequential grid over time:

- ``Wh``/``bh`` use a constant index map, so Mosaic keeps them resident in
  VMEM across all T grid steps (loaded from HBM once per sequence);
- the hidden state lives in a VMEM scratch buffer that persists across grid
  iterations (TPU grid steps execute sequentially);
- the per-step input projections (precomputed outside as one big MXU GEMM —
  see models/gru.py) are streamed one (B, 3H) block per step by the
  pipeline, in TIME-MAJOR layout (T, B, 3H) — Mosaic requires the last two
  block dims to be (8, 128)-aligned or full, so time must be the leading
  (grid-indexed) axis;
- masking (`h' = where(mask, gru(h,x), h)`) implements variable length and
  makes the reversed grid (``reverse=True``) correct over right-padded
  batches.

The backward pass is a second kernel running the time grid in the opposite
order, recomputing gates (one extra (B,H)x(H,3H) GEMM per step instead of
storing activations), carrying dL/dh in scratch and accumulating dWh/dbh.

Numerical contract matches ``models/gru.py:gru_gates`` exactly (float32
state, [r|z|n] gate layout, n-gate bias inside ``r * (h @ Whn + bhn)``).
Reference analogue: cuDNN's fused GRU sequence kernels (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable lowering; CPU tests use interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def pallas_available() -> bool:
    return _PALLAS_IMPORTED


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
def _gru_fwd_kernel(has_reset, *refs):
    if has_reset:
        x_ref, m_ref, r_ref, h0_ref, wh_ref, bh_ref, out_ref, fin_ref, h_scr = refs
    else:
        x_ref, m_ref, h0_ref, wh_ref, bh_ref, out_ref, fin_ref, h_scr = refs
        r_ref = None
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    if r_ref is not None:
        # sequence packing: zero the carry at segment starts BEFORE the cell
        # (models/gru.py cell_layer_scan reset semantics, zero-init form)
        h = h * (1.0 - r_ref[0, 0, :][:, None])
    x_proj = x_ref[0].astype(jnp.float32)  # (B, 3H); stream may be bf16
    # MXU GEMM in the weights' dtype (bf16 stream = half the VMEM/HBM
    # traffic), f32 accumulate; gate math stays f32
    h_proj = (
        jnp.dot(h.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32)
        + bh_ref[0]
    )
    H = h.shape[-1]
    xr, xz, xn = x_proj[:, :H], x_proj[:, H : 2 * H], x_proj[:, 2 * H :]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H : 2 * H], h_proj[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    m = m_ref[0, 0, :][:, None]
    h_new = jnp.where(m > 0, h_new, h)
    h_scr[:] = h_new
    out_ref[0] = h_new

    @pl.when(t == T - 1)
    def _():
        fin_ref[:] = h_new


def _max_rows(H: int) -> int:
    """Batch rows per kernel invocation so all VMEM-resident blocks fit.
    The bwd kernel allocates ~28H bytes/row of streamed blocks per buffer
    (x bf16 + outs/prev/g/dx f32), double-buffered by the pipeline; a 6MB
    budget keeps the measured peak (~19.4M at 696 rows, H=250) under the
    16MB VMEM limit with headroom for weights and scratch."""
    rows = (6 * 1024 * 1024) // (72 * max(H, 1))
    return max(64, (rows // 8) * 8)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "row_chunk"))
def gru_layer_scan(
    x_proj: jax.Array,  # (B, T, 3H) precomputed input projections
    mask: jax.Array,  # (B, T)
    h0: jax.Array,  # (B, H)
    Wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    reverse: bool = False,
    interpret: bool = False,
    row_chunk: int = 0,  # 0 = auto (VMEM heuristic); tests override
    reset: jax.Array = None,  # (B, T) 1.0 = zero the carry before this step
) -> Tuple[jax.Array, jax.Array]:
    """Forward-only fused scan. Returns (outputs (B, T, H) float32, final
    (B, H) float32); matches models/gru.py UniGRU semantics 1:1. bf16
    x_proj/Wh inputs stream as bf16 (GEMMs on the MXU in bf16 with f32
    accumulation); state and gate math are always f32. Large batches are
    processed in VMEM-sized chunks (rows are independent). ``reset``:
    sequence-packing segment boundaries (cell_layer_scan reset semantics)."""
    B, T, H3 = x_proj.shape
    H = H3 // 3
    chunk = row_chunk or _max_rows(H)
    if B > chunk:
        n = (B + chunk - 1) // chunk
        outs_parts, fin_parts = [], []
        for i in range(n):
            s = slice(i * chunk, min((i + 1) * chunk, B))
            o, f = gru_layer_scan(
                x_proj[s], mask[s], h0[s], Wh, bh, reverse=reverse,
                interpret=interpret, row_chunk=row_chunk,
                reset=None if reset is None else reset[s],
            )
            outs_parts.append(o)
            fin_parts.append(f)
        return jnp.concatenate(outs_parts, 0), jnp.concatenate(fin_parts, 0)
    f32 = jnp.float32
    xt = x_proj.swapaxes(0, 1)  # (T, B, 3H) time-major, native dtype
    mt = mask.astype(f32).swapaxes(0, 1)[:, None, :]  # (T, 1, B)
    h0 = h0.astype(f32)
    bh2 = bh.astype(f32).reshape(1, H3)

    if reverse:
        t_map = lambda t: (T - 1 - t, 0, 0)
    else:
        t_map = lambda t: (t, 0, 0)

    has_reset = reset is not None
    stream_spec = pl.BlockSpec((1, 1, B), t_map, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, B, H3), t_map, memory_space=pltpu.VMEM),
        stream_spec,
        *([stream_spec] if has_reset else []),
        pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xt, mt]
    if has_reset:
        args.append(reset.astype(f32).swapaxes(0, 1)[:, None, :])
    args += [h0, Wh, bh2]
    outs, fin = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, has_reset),
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B, H), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32)],
        interpret=interpret,
    )(*args)
    return outs.swapaxes(0, 1), fin


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------
def _gru_bwd_kernel(has_reset, *refs):
    if has_reset:
        (x_ref, m_ref, r_ref, h0_ref, wh_ref, bh_ref, prev_ref, g_ref,
         dx_ref, dh0_ref, dwh_ref, dbh_ref, dh_scr, dwh_scr, dbh_scr) = refs
    else:
        (x_ref, m_ref, h0_ref, wh_ref, bh_ref, prev_ref, g_ref,
         dx_ref, dh0_ref, dwh_ref, dbh_ref, dh_scr, dwh_scr, dbh_scr) = refs
        r_ref = None
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbh_scr[:] = jnp.zeros_like(dbh_scr)

    # grid step t processes the (T-1-t)-th step of forward processing order
    h_prev = jnp.where(t == T - 1, h0_ref[:], prev_ref[0].astype(jnp.float32))
    if r_ref is not None:
        # forward zeroed the carry at segment starts; recompute gates from
        # the SAME effective state, and kill the carry cotangent across the
        # boundary at the end (keep = 1 - reset)
        keep = 1.0 - r_ref[0, 0, :][:, None]
        h_prev = h_prev * keep
    x_proj = x_ref[0].astype(jnp.float32)
    m = m_ref[0, 0, :][:, None]
    g = g_ref[0]
    cdt = wh_ref.dtype  # MXU dtype follows the weights (bf16 or f32)

    # recompute forward gates (bias on the hidden side, cuDNN convention)
    h_proj = (
        jnp.dot(h_prev.astype(cdt), wh_ref[:], preferred_element_type=jnp.float32)
        + bh_ref[0]
    )
    H = h_prev.shape[-1]
    xr, xz, xn = x_proj[:, :H], x_proj[:, H : 2 * H], x_proj[:, 2 * H :]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H : 2 * H], h_proj[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    dh_total = g + dh_scr[:]
    dhat = m * dh_total
    dh_prev = (1.0 - m) * dh_total
    dz = dhat * (h_prev - n)
    dn = dhat * (1.0 - z)
    dh_prev = dh_prev + dhat * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)
    dh_proj = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
    dx_proj = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dh_prev = dh_prev + jnp.dot(
        dh_proj.astype(cdt), wh_ref[:].T, preferred_element_type=jnp.float32
    )
    if r_ref is not None:
        dh_prev = dh_prev * keep

    dx_ref[0] = dx_proj
    dh_scr[:] = dh_prev
    dwh_scr[:] = dwh_scr[:] + jnp.dot(
        h_prev.astype(cdt).T, dh_proj.astype(cdt), preferred_element_type=jnp.float32
    )
    dbh_scr[:] = dbh_scr[:] + dh_proj.sum(axis=0, keepdims=True)

    @pl.when(t == T - 1)
    def _():
        dh0_ref[:] = dh_prev
        dwh_ref[:] = dwh_scr[:]
        dbh_ref[:] = dbh_scr[:]


def _gru_scan_bwd_impl(x_proj, mask, h0, Wh, bh, outs, g, reverse, interpret,
                       reset=None):
    """All sequence args time-major (T, B, .) (``reset``: (T, 1, B) or
    None). Returns (dx_proj (T,B,3H), dh0, dWh, dbh). Large batches chunked
    like the forward."""
    T, B, H3 = x_proj.shape
    H = H3 // 3
    f32 = jnp.float32
    chunk = _max_rows(H)
    if B > chunk:
        n = (B + chunk - 1) // chunk
        dx_p, dh0_p, dWh_acc, dbh_acc = [], [], None, None
        for i in range(n):
            s = slice(i * chunk, min((i + 1) * chunk, B))
            dx, dh0_c, dWh_c, dbh_c = _gru_scan_bwd_impl(
                x_proj[:, s], mask[:, :, s], h0[s], Wh, bh, outs[:, s], g[:, s],
                reverse, interpret,
                reset=None if reset is None else reset[:, :, s],
            )
            dx_p.append(dx)
            dh0_p.append(dh0_c)
            dWh_acc = dWh_c if dWh_acc is None else dWh_acc + dWh_c
            dbh_acc = dbh_c if dbh_acc is None else dbh_acc + dbh_c
        return (jnp.concatenate(dx_p, 1), jnp.concatenate(dh0_p, 0), dWh_acc, dbh_acc)

    if reverse:
        # forward processed time T-1 .. 0; backward revisits 0 .. T-1
        t_map = lambda t: (t, 0, 0)
        prev_map = lambda t: (jnp.minimum(t + 1, T - 1), 0, 0)
    else:
        t_map = lambda t: (T - 1 - t, 0, 0)
        prev_map = lambda t: (jnp.maximum(T - 2 - t, 0), 0, 0)

    has_reset = reset is not None
    stream_spec = pl.BlockSpec((1, 1, B), t_map, memory_space=pltpu.VMEM)
    in_args = [x_proj, mask] + ([reset] if has_reset else []) + [h0, Wh, bh, outs, g]
    dx, dh0, dWh, dbh = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, has_reset),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), t_map, memory_space=pltpu.VMEM),
            stream_spec,
            *([stream_spec] if has_reset else []),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            # outs only as the PREV-step block: the kernel recomputes this
            # step's gates from h_prev, so the current-step output is never
            # read (streaming it cost a dead double-buffered (B,H) fetch
            # per step)
            pl.BlockSpec((1, B, H), prev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), t_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H3), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),
            pltpu.VMEM((H, H3), f32),
            pltpu.VMEM((1, H3), f32),
        ],
        interpret=interpret,
    )(*in_args)
    return dx, dh0, dWh, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_layer_scan_ad(x_proj, mask, h0, Wh, bh, reverse=False, interpret=False,
                      reset=None):
    """Differentiable fused GRU scan (custom VJP; both passes are Pallas
    kernels). Same contract as :func:`gru_layer_scan` (``reset``: sequence
    packing; treated as a constant — no cotangent)."""
    return gru_layer_scan(x_proj, mask, h0, Wh, bh, reverse=reverse,
                          interpret=interpret, reset=reset)


def _gru_ad_fwd(x_proj, mask, h0, Wh, bh, reverse, interpret, reset=None):
    outs, fin = gru_layer_scan(x_proj, mask, h0, Wh, bh, reverse=reverse,
                               interpret=interpret, reset=reset)
    return (outs, fin), (x_proj, mask, h0, Wh, bh, outs, reset)


def _gru_ad_bwd(reverse, interpret, res, grads):
    x_proj, mask, h0, Wh, bh, outs, reset = res
    g_outs, g_fin = grads
    f32 = jnp.float32
    T = outs.shape[1]
    g = g_outs.astype(f32)
    # fold the final-state cotangent into the last processed step's output
    # grad — exact because fwd writes out[t] = carry at every t (masked
    # steps write the passed-through carry), so out[last] == final
    if g_fin is not None:
        idx = 0 if reverse else T - 1
        g = g.at[:, idx, :].add(g_fin.astype(f32))
    dx, dh0, dWh, dbh = _gru_scan_bwd_impl(
        x_proj.swapaxes(0, 1),  # native dtype; kernel upcasts on load
        mask.astype(f32).swapaxes(0, 1)[:, None, :],
        h0.astype(f32),
        Wh,  # native dtype: sets the MXU dtype inside the kernel
        bh.astype(f32).reshape(1, -1),
        outs.swapaxes(0, 1),
        g.swapaxes(0, 1),
        reverse,
        interpret,
        reset=(None if reset is None
               else reset.astype(f32).swapaxes(0, 1)[:, None, :]),
    )
    return (
        dx.swapaxes(0, 1).astype(x_proj.dtype),
        None,
        dh0.astype(h0.dtype),
        dWh.astype(Wh.dtype),
        dbh.reshape(-1).astype(bh.dtype),
        None,  # reset: boundary indicator, no cotangent
    )


gru_layer_scan_ad.defvjp(_gru_ad_fwd, _gru_ad_bwd)
