"""GRU recurrences, TPU-style.

The reference uses cuDNN ``nn.GRU`` for the bi-directional source encoder and
``StackedGRU`` cells for the decoder (SURVEY.md §2.1 #7/#8). The TPU-native
equivalent is a ``lax.scan`` (via ``nn.scan``) over time with two key
shape/perf choices:

- **Hoisted input projections**: the input-to-hidden matmul for *all*
  timesteps is computed as one big (B*T, E) x (E, 3H) GEMM before the scan
  (great MXU utilization); only the hidden-to-hidden (B, H) x (H, 3H) GEMM
  lives inside the scan.
- **Masked carries instead of packed sequences**: cuDNN's
  ``pack_padded_sequence`` becomes ``h' = where(mask_t, gru(h, x_t), h)``,
  which also makes the *reverse* direction correct over right-padded
  batches (pads are no-ops, so the backward carry at t=0 summarizes exactly
  the real tokens).

Gate math follows the cuDNN/torch convention the reference inherits:
``r,z`` sigmoid gates, candidate ``n = tanh(x_n + r * (h @ Whn + bhn))``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def lstm_gates(
    x_proj: jax.Array, h_proj: jax.Array, c: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """LSTM cell from precomputed projections (reference ``-rnn_type LSTM``).

    x_proj, h_proj: (..., 4H) laid out as [i | f | g | o]; c: (..., H).
    Forget-gate bias +1 (standard initialization trick). Returns (h', c').
    """
    xi, xf, xg, xo = jnp.split(x_proj, 4, axis=-1)
    hi, hf, hg, ho = jnp.split(h_proj, 4, axis=-1)
    i = jax.nn.sigmoid(xi + hi)
    f = jax.nn.sigmoid(xf + hf + 1.0)
    g = jnp.tanh(xg + hg)
    o = jax.nn.sigmoid(xo + ho)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def n_gates(cell_type: str) -> int:
    """Projection multiple: GRU packs 3 gate blocks, LSTM 4."""
    return 4 if cell_type == "lstm" else 3


def gru_gates(x_proj: jax.Array, h_proj: jax.Array, h: jax.Array) -> jax.Array:
    """Combine precomputed input/hidden projections into the new hidden state.

    x_proj, h_proj: (..., 3H) laid out as [r | z | n]; h: (..., H).
    """
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_bwd_core(
    dh_new: jax.Array, x_proj: jax.Array, h_proj: jax.Array, h_prev: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Hand-derived local VJP of :func:`gru_gates` (one cell application).

    Returns (dx_proj, dh_proj_grad, dh_prev_partial); the ``Wh^T`` backprop
    into ``dh_prev`` is the caller's job (it owns the weights). This is THE
    single source of the gate backward math — the custom-VJP scan
    (models/fused_decoder.py) and the Pallas decoder kernel
    (ops/pallas/decoder.py) both consume it, so the cuDNN gate convention
    stays in one place.
    """
    H = h_prev.shape[-1]
    xr, xz, xn = x_proj[:, :H], x_proj[:, H:2 * H], x_proj[:, 2 * H:]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H:2 * H], h_proj[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    dz = dh_new * (h_prev - n)
    dn = dh_new * (1.0 - z)
    dh_prev = dh_new * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)
    dx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
    return dx, dhp, dh_prev


class GRUCell(nn.Module):
    """Recurrent half of a GRU: expects the input projection precomputed."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, x_proj: jax.Array) -> jax.Array:
        h_proj = nn.Dense(
            3 * self.hidden, use_bias=True, dtype=self.dtype, name="hh"
        )(h)
        return gru_gates(x_proj, h_proj, h)


def cell_layer_scan(x_proj, carry0, wh, bh, cell_type="gru", unroll=1,
                    mask=None, reverse=False, reset=None, init_seq=None):
    """Scan ONE recurrent layer over pre-projected inputs x_proj (B,T,G·H).

    ``carry0``: (B,H) for GRU, (B,2H) [h;c] for LSTM. Returns
    (outs (B,T,H), final carry). With ``mask`` (B,T), masked steps pass the
    carry through (variable-length encoder sequences); ``mask=None`` is the
    mask-free decoder fast path. The single home for the gate-step/scan
    idiom — UniGRU and the input_feed=False decoder both run through here.

    ``reset`` (B,T): 1.0 at sequence-packing segment boundaries — the
    incoming carry is replaced BEFORE the cell consumes position t, by
    ``init_seq[:, t]`` when ``init_seq`` (B,T,H) is given (per-segment
    decoder init states) or by zeros (encoder segment starts). This is the
    packed-batch analogue of starting a fresh sentence at h0.
    """
    xs = x_proj.swapaxes(0, 1)
    extras = [a.swapaxes(0, 1) for a in (mask, reset, init_seq) if a is not None]
    args = xs if not extras else (xs, *extras)
    has_m, has_r = mask is not None, reset is not None

    def unpack(xs_t):
        if not extras:
            return xs_t, None, None, None
        it = iter(xs_t[1:])
        m_t = next(it) if has_m else None
        r_t = next(it) if has_r else None
        i_t = next(it) if init_seq is not None else None
        return xs_t[0], m_t, r_t, i_t

    if cell_type == "lstm":
        H = carry0.shape[-1] // 2

        def step(hc, xs_t):
            xp_t, m_t, r_t, i_t = unpack(xs_t)
            if r_t is not None:
                fresh = (jnp.concatenate([i_t, jnp.zeros_like(i_t)], axis=-1)
                         if i_t is not None else jnp.zeros_like(hc))
                hc = jnp.where(r_t[:, None] > 0, fresh, hc)
            h, c = jnp.split(hc, 2, axis=-1)
            h_new, c_new = lstm_gates(xp_t, h @ wh + bh, c)
            hc_new = jnp.concatenate([h_new, c_new], axis=-1)
            if m_t is not None:
                hc_new = jnp.where(m_t[:, None] > 0, hc_new, hc)
            return hc_new, hc_new[..., :H]
    else:
        def step(h, xs_t):
            xp_t, m_t, r_t, i_t = unpack(xs_t)
            if r_t is not None:
                fresh = i_t if i_t is not None else jnp.zeros_like(h)
                h = jnp.where(r_t[:, None] > 0, fresh, h)
            h_new = gru_gates(xp_t, h @ wh + bh, h)
            if m_t is not None:
                h_new = jnp.where(m_t[:, None] > 0, h_new, h)
            return h_new, h_new

    final, outs = jax.lax.scan(step, carry0, args, reverse=reverse, unroll=unroll)
    return outs.swapaxes(0, 1), final


class UniGRU(nn.Module):
    """One direction, one layer. Returns (outputs (B,T,H), final state).

    ``cell_type``: "gru" (final = h (B,H)) or "lstm" (final = [h | c]
    (B, 2H) — packing the LSTM state into ONE array keeps every consumer
    (bridges, beam-state gathers, checkpoints) shape-generic).

    Two execution paths over the same parameters: a plain ``lax.scan``
    (XLA), or — with ``use_pallas`` — the fused Pallas sequence kernel
    (ops/pallas/gru.py, forward + custom-VJP backward) that keeps Wh/bh
    resident in VMEM for the whole sequence (1.5-1.6x faster on v5e).
    The Pallas path is GRU-only; LSTM always takes the XLA scan."""

    hidden: int
    reverse: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    unroll: int = 1
    cell_type: str = "gru"

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 reset: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        B, T, _ = x.shape
        H = self.hidden
        G = n_gates(self.cell_type)
        # hoisted input projection: one GEMM for all timesteps
        x_proj = nn.Dense(G * H, dtype=self.dtype, name="ih")(x)
        wh = self.param("hh_kernel", nn.initializers.lecun_normal(), (H, G * H), jnp.float32)
        bh = self.param("hh_bias", nn.initializers.zeros_init(), (G * H,), jnp.float32)
        h0 = jnp.zeros((B, H), self.dtype)

        if self.use_pallas and self.cell_type == "gru":
            from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

            interpret = jax.default_backend() != "tpu"
            outs, final = gru_layer_scan_ad(
                x_proj, mask, h0, wh.astype(self.dtype), bh, self.reverse,
                interpret, reset
            )
            return outs.astype(self.dtype), final.astype(self.dtype)

        wh = wh.astype(self.dtype)
        bh = bh.astype(self.dtype)
        m = mask.astype(self.dtype)
        carry0 = (jnp.concatenate([h0, h0], axis=-1)
                  if self.cell_type == "lstm" else h0)
        return cell_layer_scan(x_proj, carry0, wh, bh, self.cell_type,
                               self.unroll, mask=m, reverse=self.reverse,
                               reset=reset)


class BiGRUEncoder(nn.Module):
    """Bi-directional multi-layer GRU encoder (reference: onmt RNNEncoder with
    -encoder_type brnn). ``hidden`` is the *total* size: each direction gets
    hidden//2 so encoder output dim == decoder hidden dim, matching the
    reference's rnn_size convention."""

    hidden: int
    layers: int = 2
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    unroll: int = 1
    cell_type: str = "gru"

    @nn.compact
    def __call__(
        self, emb: jax.Array, mask: jax.Array, deterministic: bool = True,
        seg: Optional[jax.Array] = None,
        seg_bounds: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """emb: (B,T,E), mask: (B,T) -> (memory (B,T,H), finals [per layer:
        (B,H) for GRU, (B,2H) = [h | c] for LSTM]).

        Sequence packing (``seg`` (B,T) segment ids, -1 at pads): the
        recurrent carry resets at segment boundaries in both directions, so
        each packed segment is encoded exactly as if it were alone in the
        row. With ``seg_bounds=(first_idx, last_idx)`` ((B,K) positions),
        finals become PER-SEGMENT states (B,K,H): the forward direction's
        state at the segment's last token + the backward direction's at its
        first — the same [fwd_fin | bwd_fin] layout as unpacked rows."""
        assert self.hidden % 2 == 0
        half = self.hidden // 2
        x = emb
        reset_f = reset_b = None
        if seg is not None:
            valid = seg >= 0
            prev = jnp.pad(seg[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
            nxt = jnp.pad(seg[:, 1:], ((0, 0), (0, 1)), constant_values=-2)
            reset_f = (valid & (seg != prev)).astype(jnp.float32)
            reset_b = (valid & (seg != nxt)).astype(jnp.float32)
        finals: List[jax.Array] = []
        for layer in range(self.layers):
            if layer > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            fwd_out, fwd_fin = UniGRU(half, False, self.dtype, self.use_pallas,
                                      self.unroll, self.cell_type,
                                      name=f"fwd{layer}")(x, mask, reset=reset_f)
            bwd_out, bwd_fin = UniGRU(half, True, self.dtype, self.use_pallas,
                                      self.unroll, self.cell_type,
                                      name=f"bwd{layer}")(x, mask, reset=reset_b)
            x = jnp.concatenate([fwd_out, bwd_out], axis=-1)
            if seg_bounds is not None:
                # per-segment finals: gather the per-direction output streams
                # at the segment's boundary positions (invalid segments point
                # at position 0; callers mask them)
                first, last = seg_bounds
                fwd_fin = jnp.take_along_axis(
                    fwd_out, last[..., None].astype(jnp.int32), axis=1)
                bwd_fin = jnp.take_along_axis(
                    bwd_out, first[..., None].astype(jnp.int32), axis=1)
                if self.cell_type == "lstm":
                    raise NotImplementedError(
                        "sequence packing supports rnn_type=gru only (the "
                        "output stream carries h, not the LSTM cell state)")
            if self.cell_type == "lstm":
                # repack per-direction [h|c] halves into [h_f h_b | c_f c_b]
                # so final[:, :H] is the hidden and final[:, H:] the cell
                fh, fc = jnp.split(fwd_fin, 2, axis=-1)
                bh_, bc = jnp.split(bwd_fin, 2, axis=-1)
                finals.append(jnp.concatenate([fh, bh_, fc, bc], axis=-1))
            else:
                finals.append(jnp.concatenate([fwd_fin, bwd_fin], axis=-1))
        return x, finals


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """(B,T,H),(B,T) -> (B,H) mean over real positions (sentence summary for
    the inference/prior networks)."""
    m = mask[..., None].astype(x.dtype)
    return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


def segment_mean(x: jax.Array, seg: jax.Array, n_segments: int) -> jax.Array:
    """(B,T,H), seg (B,T) ids in [-1, K) -> (B,K,H) per-segment mean — the
    packed-batch analogue of :func:`masked_mean` (one summary per packed
    sentence). Implemented as a one-hot einsum so it lowers to a single MXU
    matmul instead of K gathers."""
    onehot = (seg[:, None, :] == jnp.arange(n_segments)[None, :, None])
    onehot = onehot.astype(x.dtype)  # (B,K,T)
    sums = jnp.einsum("bkt,bth->bkh", onehot, x)
    counts = onehot.sum(axis=-1)[..., None]
    return sums / jnp.maximum(counts, 1.0)
