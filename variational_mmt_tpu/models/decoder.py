"""Input-feeding GRU decoder with global attention.

Reference: ``onmt.Models.InputFeedRNNDecoder`` + ``StackedGRU`` — a per-token
Python loop over timesteps on GPU (SURVEY.md §2.1 #8, §3.2 inner hot loop).
TPU-native version:

- teacher-forced training runs the whole sequence in ONE ``nn.scan`` (no
  Python loop, one compiled region);
- the embedding half of the layer-0 input projection is hoisted out of the
  scan as a single (B*T, E) x (E, 3H) GEMM; only the input-feed half and the
  hidden-to-hidden GEMMs recur;
- the same ``DecoderStep`` module is reused for single-step calls by the
  on-device greedy/beam decoders, so train and decode share parameters by
  construction;
- with ``input_feed=False`` the recurrence has no attention feedback, so
  each layer becomes an independent unidirectional GRU sequence — executed
  per-layer either as a ``lax.scan`` or as the fused Pallas kernel
  (ops/pallas/gru.py), with ONE batched attention call afterwards. This is
  the TPU-fast configuration (the reference's StdRNNDecoder analogue).

Carry = (per-layer hidden states, input-feed vector = previous attentional
hidden).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from variational_mmt_tpu.models.attention import GlobalAttention
from variational_mmt_tpu.models.gru import (cell_layer_scan, gru_gates,
                                             lstm_gates, n_gates)

Dtype = Any

# carry: (tuple of per-layer hidden (B,H), input-feed (B,H))
DecoderCarry = Tuple[Tuple[jax.Array, ...], jax.Array]


class DecoderStep(nn.Module):
    """One decoder timestep over the whole batch. Expects the embedding part
    of the layer-0 input projection precomputed (``emb_proj``: (B, 3H)).
    Owns the recurrent weights as raw (H, 3H) params so the fused Pallas
    sequence path can reuse the exact same parameter tree."""

    hidden: int
    layers: int = 2
    dropout: float = 0.0
    attn_type: str = "general"
    input_feed: bool = True
    dtype: Dtype = jnp.float32
    cell_type: str = "gru"  # gru | lstm (lstm state packed as [h | c])

    def setup(self):
        H = self.hidden
        G = n_gates(self.cell_type)
        self.hh_kernels = [
            self.param(f"hh_kernel{l}", nn.initializers.lecun_normal(), (H, G * H), jnp.float32)
            for l in range(self.layers)
        ]
        self.hh_biases = [
            self.param(f"hh_bias{l}", nn.initializers.zeros_init(), (G * H,), jnp.float32)
            for l in range(self.layers)
        ]
        if self.input_feed:
            self.ih_feed = nn.Dense(G * self.hidden, use_bias=False, dtype=self.dtype)
        self.ih_mid = [
            nn.Dense(G * self.hidden, use_bias=True, dtype=self.dtype, name=f"ih_mid{l}")
            for l in range(self.layers - 1)
        ]
        self.attn = GlobalAttention(self.hidden, self.attn_type, self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def cell(self, l: int, s: jax.Array, x_proj: jax.Array) -> jax.Array:
        """s: per-layer state — (B,H) for GRU, (B,2H) [h|c] for LSTM."""
        wh = self.hh_kernels[l].astype(self.dtype)
        bh = self.hh_biases[l].astype(self.dtype)
        if self.cell_type == "lstm":
            h, c = jnp.split(s, 2, axis=-1)
            h_new, c_new = lstm_gates(x_proj, h @ wh + bh, c)
            return jnp.concatenate([h_new, c_new], axis=-1)
        return gru_gates(x_proj, s @ wh + bh, s)

    def _h(self, s: jax.Array) -> jax.Array:
        return s[..., : self.hidden] if self.cell_type == "lstm" else s

    def __call__(
        self,
        carry: DecoderCarry,
        emb_proj: jax.Array,
        memory: jax.Array,
        src_mask: jax.Array,
        deterministic: bool = True,
        keys: jax.Array = None,
    ):
        hs, feed = carry
        x_proj = emb_proj
        if self.input_feed:
            x_proj = x_proj + self.ih_feed(feed)
        new_hs: List[jax.Array] = []
        for l in range(self.layers):
            s_new = self.cell(l, hs[l], x_proj)
            new_hs.append(s_new)
            if l + 1 < self.layers:
                x_proj = self.ih_mid[l](self.drop(self._h(s_new), deterministic=deterministic))
        attn_h, align = self.attn(self._h(new_hs[-1]), memory, src_mask, keys=keys)
        return (tuple(new_hs), attn_h), (attn_h, align)


class GRUDecoder(nn.Module):
    hidden: int
    layers: int = 2
    dropout: float = 0.0
    attn_type: str = "general"
    input_feed: bool = True
    dtype: Dtype = jnp.float32
    unroll: int = 1
    use_pallas: bool = False
    pallas_decoder: bool = True  # gate the fused decoder kernel separately
    fused: bool = False  # custom-VJP scan (models/fused_decoder.py) when eligible
    cell_type: str = "gru"

    def setup(self):
        self.ih_emb = nn.Dense(n_gates(self.cell_type) * self.hidden,
                               use_bias=True, dtype=self.dtype)
        self.step = DecoderStep(
            self.hidden, self.layers, self.dropout, self.attn_type,
            self.input_feed, self.dtype, self.cell_type
        )
        self.out_drop = nn.Dropout(self.dropout)

    def init_carry(self, init_hs: List[jax.Array]) -> DecoderCarry:
        # feed is the previous attentional hidden: always (B, H), also for
        # LSTM states packed as (B, 2H)
        feed = jnp.zeros_like(init_hs[-1][..., : self.hidden])
        return (tuple(init_hs), feed)

    def __call__(
        self,
        emb: jax.Array,  # (B, T, E) target-input embeddings (teacher forcing)
        memory: jax.Array,  # (B, S, H)
        src_mask: jax.Array,  # (B, S)
        init_hs: List[jax.Array],  # per-layer (B, H)
        deterministic: bool = True,
        extra_input_proj: jax.Array = None,  # (B, 3H), e.g. projected z
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced full sequence. Returns (attn hiddens (B,T,H),
        alignments (B,T,S))."""
        B, T, _ = emb.shape
        emb_proj = self.ih_emb(emb)  # hoisted: one GEMM for all T
        if extra_input_proj is not None:
            emb_proj = emb_proj + extra_input_proj[:, None, :]

        if not self.input_feed:
            # fast path: per-layer recurrences, one batched attention after
            x_proj = emb_proj
            top = None
            ones = jnp.ones((B, T), jnp.float32)
            for l in range(self.layers):
                wh = self.step.hh_kernels[l].astype(self.dtype)
                bh = self.step.hh_biases[l].astype(self.dtype)
                h0 = init_hs[l]
                if self.use_pallas and self.cell_type == "gru":
                    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

                    interpret = jax.default_backend() != "tpu"
                    outs_l, _ = gru_layer_scan_ad(x_proj, ones, h0, wh, bh, False, interpret)
                    outs_l = outs_l.astype(self.dtype)
                else:
                    outs_l, _ = cell_layer_scan(
                        x_proj, h0, wh, bh, self.cell_type, self.unroll)
                top = outs_l
                if l + 1 < self.layers:
                    x_proj = self.step.ih_mid[l](
                        self.step.drop(outs_l, deterministic=deterministic)
                    )
            attn_h, align = self.step.attn(top, memory, src_mask)
            return self.out_drop(attn_h, deterministic=deterministic), align

        # hoist the loop-invariant attention memory projection out of the
        # scan: scores = (q Wq) m^T == q (m Wq^T)^T  (one GEMM per sequence
        # instead of one per step)
        keys = self.step.attn.project_memory(memory)

        # fused input-feed paths for the flagship 2-layer/general config:
        # Pallas sequence kernels (use_pallas) or the custom-VJP jax scan
        # (fused). init uses the generic path so every lazily-created Dense
        # param exists in the tree.
        eligible = (
            self.layers == 2
            and self.attn_type == "general"
            and self.cell_type == "gru"
            and not self.is_initializing()
        )
        use_pallas_dec = self.use_pallas and self.pallas_decoder and eligible
        use_fused = self.fused and eligible
        if use_pallas_dec or use_fused:
            step = self.step
            p_feed = step.ih_feed.variables["params"]["kernel"].astype(self.dtype)
            p_mid = step.ih_mid[0].variables["params"]
            p_out = step.attn.linear_out.variables["params"]["kernel"].astype(self.dtype)
            Wc_ctx, Wc_q = p_out[: self.hidden], p_out[self.hidden :]
            mem_v = memory @ Wc_ctx
            mask_bias = (1.0 - src_mask.astype(jnp.float32)) * -1e9
            if deterministic or self.dropout == 0.0:
                dmid = jnp.ones((B, T, self.hidden), self.dtype)
            else:
                keep = 1.0 - self.dropout
                dmid = (
                    jax.random.bernoulli(self.make_rng("dropout"), keep, (B, T, self.hidden))
                    .astype(self.dtype) / keep
                )
            wargs = (
                emb_proj, dmid, init_hs[0], init_hs[1],
                p_feed,
                step.hh_kernels[0].astype(self.dtype), step.hh_biases[0].astype(self.dtype),
                p_mid["kernel"].astype(self.dtype), p_mid["bias"].astype(self.dtype),
                step.hh_kernels[1].astype(self.dtype), step.hh_biases[1].astype(self.dtype),
                keys, mem_v, Wc_q, mask_bias,
            )
            if use_pallas_dec:
                from variational_mmt_tpu.ops.pallas.decoder import fused_decoder_pallas

                interpret = jax.default_backend() != "tpu"
                attn_hs, probs = fused_decoder_pallas(*wargs, interpret, 0)
                attn_hs = attn_hs.astype(self.dtype)
            else:
                from variational_mmt_tpu.models.fused_decoder import fused_input_feed_decoder

                attn_hs, probs = fused_input_feed_decoder(*wargs, self.unroll)
            return self.out_drop(attn_hs, deterministic=deterministic), probs

        def body(mod, carry, x_t):
            return mod(carry, x_t, memory, src_mask, deterministic, keys)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )
        carry0 = self.init_carry(init_hs)
        _, (outs, aligns) = scan(self.step, carry0, emb_proj)
        return self.out_drop(outs, deterministic=deterministic), aligns

    def packed_seq(
        self,
        emb: jax.Array,  # (B, T, E) packed target-input embeddings
        memory: jax.Array,  # (B, S, H) packed source memory
        src_seg: jax.Array,  # (B, S) int32 segment ids, -1 at pads
        tgt_seg: jax.Array,  # (B, T) int32 segment ids, -1 at pads
        init_hs_seg: List[jax.Array],  # per-layer PER-SEGMENT inits (B, K, H)
        deterministic: bool = True,
        extra_input_proj_seg: jax.Array = None,  # (B, K, G·H) per-segment z proj
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced decode over a sequence-PACKED batch.

        Semantics match running each packed segment through :meth:`__call__`
        alone: at every segment start the carry is replaced by that
        segment's bridge init (input-feed resets to zero), and attention is
        masked to the segment's own source positions. GRU cells only; the
        Pallas/fused sequence kernels don't know about resets, so this path
        always takes the XLA scan."""
        if self.cell_type != "gru":
            raise NotImplementedError("sequence packing supports rnn_type=gru only")
        B, T, _ = emb.shape
        emb_proj = self.ih_emb(emb)
        seg_clip = jnp.clip(tgt_seg, 0, None)
        if extra_input_proj_seg is not None:
            emb_proj = emb_proj + jnp.take_along_axis(
                extra_input_proj_seg.astype(emb_proj.dtype),
                seg_clip[..., None], axis=1)
        # per-position init states: gather each step's segment init up front
        # ((B,T,H) per layer) so the scan body is pure where/gather-free math
        init_sel = [
            jnp.take_along_axis(h.astype(self.dtype), seg_clip[..., None], axis=1)
            for h in init_hs_seg
        ]
        valid = tgt_seg >= 0
        prev = jnp.pad(tgt_seg[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
        reset = (valid & (tgt_seg != prev)).astype(jnp.float32)  # (B,T)
        # per-step attention mask: target position t sees exactly its own
        # segment's source tokens ((B,T,S); ~1 MB at flagship shapes)
        amask = ((tgt_seg[:, :, None] == src_seg[:, None, :])
                 & (src_seg >= 0)[:, None, :]).astype(jnp.float32)
        keys = self.step.attn.project_memory(memory)

        if not self.input_feed:
            # per-layer recurrences with segment resets, one batched
            # attention after (the StdRNNDecoder-analogue fast path)
            x_proj = emb_proj
            top = None
            for l in range(self.layers):
                wh = self.step.hh_kernels[l].astype(self.dtype)
                bh = self.step.hh_biases[l].astype(self.dtype)
                outs_l, _ = cell_layer_scan(
                    x_proj, jnp.zeros_like(init_sel[l][:, 0]), wh, bh,
                    "gru", self.unroll, reset=reset, init_seq=init_sel[l])
                top = outs_l
                if l + 1 < self.layers:
                    x_proj = self.step.ih_mid[l](
                        self.step.drop(outs_l, deterministic=deterministic))
            attn_h, align = self.step.attn(top, memory, amask, keys=keys)
            return self.out_drop(attn_h, deterministic=deterministic), align

        def body(mod, carry, xs):
            ep_t, r_t, am_t, init_t = xs
            hs, feed = carry
            r = r_t[:, None] > 0
            hs_eff = tuple(jnp.where(r, i, h) for i, h in zip(init_t, hs))
            feed_eff = jnp.where(r, jnp.zeros_like(feed), feed)
            return mod((hs_eff, feed_eff), ep_t, memory, am_t, deterministic, keys)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )
        carry0 = (tuple(jnp.zeros_like(i[:, 0]) for i in init_sel),
                  jnp.zeros((B, self.hidden), self.dtype))
        _, (outs, aligns) = scan(
            self.step, carry0, (emb_proj, reset, amask, tuple(init_sel)))
        return self.out_drop(outs, deterministic=deterministic), aligns

    def project_memory(self, memory: jax.Array, with_values: bool = False):
        """Pre-projected attention keys for repeated one_step decoding
        (compute once per sequence, pass to every one_step call).

        ``with_values``: additionally hoist the context half of linear_out
        (``mem_v = memory @ Wc_ctx``, the models/fused_decoder.py
        decomposition) and return ``(keys, mem_v)`` — the layout the fused
        Pallas decode-step kernel consumes (one_step dispatches on the
        tuple). Requires the flagship structure (2-layer GRU, general
        attention, input_feed)."""
        keys = self.step.attn.project_memory(memory)
        if not with_values:
            return keys
        if not (self.layers == 2 and self.attn_type == "general"
                and self.cell_type == "gru" and self.input_feed):
            raise ValueError(
                "project_memory(with_values=True) (fused decode step) "
                "requires 2-layer GRU + general attention + input_feed; "
                f"got layers={self.layers} attn={self.attn_type} "
                f"cell={self.cell_type} input_feed={self.input_feed}")
        p_out = self.step.attn.linear_out.variables["params"]["kernel"]
        mem_v = memory @ p_out[: self.hidden].astype(memory.dtype)
        return keys, mem_v

    def one_step(
        self,
        carry: DecoderCarry,
        tok_emb: jax.Array,  # (B, E)
        memory: jax.Array,
        src_mask: jax.Array,
        extra_input_proj: jax.Array = None,
        keys: jax.Array = None,
    ):
        """Single decode step (greedy/beam). Deterministic (inference).

        ``keys`` may be the plain pre-projected keys (XLA step) or the
        ``(keys, mem_v)`` tuple from ``project_memory(with_values=True)``,
        which routes through the fused Pallas decode-step kernel
        (ops/pallas/decode_step.py) — one launch for the whole
        GRU0->GRU1->attention chain with VMEM-resident weights."""
        emb_proj = self.ih_emb(tok_emb)
        if extra_input_proj is not None:
            emb_proj = emb_proj + extra_input_proj
        if isinstance(keys, tuple):
            from variational_mmt_tpu.ops.pallas.decode_step import (
                decode_step_pallas, gru_chain_pallas)

            step = self.step
            p_feed = step.ih_feed.variables["params"]["kernel"].astype(self.dtype)
            p_mid = step.ih_mid[0].variables["params"]
            hs, feed = carry
            interpret = jax.default_backend() != "tpu"
            wargs = (
                p_feed,
                step.hh_kernels[0].astype(self.dtype),
                step.hh_biases[0].astype(self.dtype),
                p_mid["kernel"].astype(self.dtype),
                p_mid["bias"].astype(self.dtype),
                step.hh_kernels[1].astype(self.dtype),
                step.hh_biases[1].astype(self.dtype),
            )
            if len(keys) == 1:
                # chain-only variant: fused GRU chain, attention in XLA
                h0n, h1n = gru_chain_pallas(
                    emb_proj, hs[0], hs[1], feed, *wargs,
                    interpret=interpret)
                attn_h, probs = step.attn(h1n, memory, src_mask, keys=keys[0])
            else:
                k, mem_v = keys
                p_out = step.attn.linear_out.variables["params"]["kernel"].astype(self.dtype)
                mask_bias = (1.0 - src_mask.astype(jnp.float32)) * -1e9
                h0n, h1n, attn_h, probs = decode_step_pallas(
                    emb_proj, hs[0], hs[1], feed, *wargs,
                    k, mem_v, p_out[self.hidden:], mask_bias,
                    interpret=interpret,
                )
            return ((h0n, h1n), attn_h), (attn_h, probs)
        new_carry, (attn_h, align) = self.step(carry, emb_proj, memory, src_mask, True, keys)
        return new_carry, (attn_h, align)
