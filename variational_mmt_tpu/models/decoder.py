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
  construction.

Carry = (per-layer hidden states, input-feed vector = previous attentional
hidden). With ``input_feed=False`` the recurrence drops the feed projection
and attention is computed for all steps in one batched call after the scan
(a documented fast path the reference's StdRNNDecoder also had).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from variational_mmt_tpu.models.attention import GlobalAttention
from variational_mmt_tpu.models.gru import GRUCell

Dtype = Any

# carry: (tuple of per-layer hidden (B,H), input-feed (B,H))
DecoderCarry = Tuple[Tuple[jax.Array, ...], jax.Array]


class DecoderStep(nn.Module):
    """One decoder timestep over the whole batch. Expects the embedding part
    of the layer-0 input projection precomputed (``emb_proj``: (B, 3H))."""

    hidden: int
    layers: int = 2
    dropout: float = 0.0
    attn_type: str = "general"
    input_feed: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cells = [GRUCell(self.hidden, self.dtype, name=f"cell{l}") for l in range(self.layers)]
        if self.input_feed:
            self.ih_feed = nn.Dense(3 * self.hidden, use_bias=False, dtype=self.dtype)
        self.ih_mid = [
            nn.Dense(3 * self.hidden, use_bias=True, dtype=self.dtype, name=f"ih_mid{l}")
            for l in range(self.layers - 1)
        ]
        self.attn = GlobalAttention(self.hidden, self.attn_type, self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        carry: DecoderCarry,
        emb_proj: jax.Array,
        memory: jax.Array,
        src_mask: jax.Array,
        deterministic: bool = True,
    ):
        hs, feed = carry
        x_proj = emb_proj
        if self.input_feed:
            x_proj = x_proj + self.ih_feed(feed)
        new_hs: List[jax.Array] = []
        for l in range(self.layers):
            h_new = self.cells[l](hs[l], x_proj)
            new_hs.append(h_new)
            if l + 1 < self.layers:
                x_proj = self.ih_mid[l](self.drop(h_new, deterministic=deterministic))
        attn_h, align = self.attn(new_hs[-1], memory, src_mask)
        return (tuple(new_hs), attn_h), (attn_h, align)


class GRUDecoder(nn.Module):
    hidden: int
    layers: int = 2
    dropout: float = 0.0
    attn_type: str = "general"
    input_feed: bool = True
    dtype: Dtype = jnp.float32
    unroll: int = 1

    def setup(self):
        self.ih_emb = nn.Dense(3 * self.hidden, use_bias=True, dtype=self.dtype)
        self.step = DecoderStep(
            self.hidden, self.layers, self.dropout, self.attn_type, self.input_feed, self.dtype
        )
        self.out_drop = nn.Dropout(self.dropout)

    def init_carry(self, init_hs: List[jax.Array]) -> DecoderCarry:
        feed = jnp.zeros_like(init_hs[-1])
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
        emb_proj = self.ih_emb(emb)  # hoisted: one GEMM for all T
        if extra_input_proj is not None:
            emb_proj = emb_proj + extra_input_proj[:, None, :]

        if not self.input_feed:
            # fast path: recurrence first, one batched attention after
            def body(mod, carry, x_t):
                hs = carry
                x_proj, = (x_t,)
                new_hs = []
                for l in range(self.layers):
                    h_new = mod.cells[l](hs[l], x_proj)
                    new_hs.append(h_new)
                    if l + 1 < self.layers:
                        x_proj = mod.ih_mid[l](mod.drop(h_new, deterministic=deterministic))
                return tuple(new_hs), new_hs[-1]

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1,
                out_axes=1,
                unroll=self.unroll,
            )
            _, top = scan(self.step, tuple(init_hs), emb_proj)
            attn_h, align = self.step.attn(top, memory, src_mask)
            return self.out_drop(attn_h, deterministic=deterministic), align

        def body(mod, carry, x_t):
            return mod(carry, x_t, memory, src_mask, deterministic)

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

    def one_step(
        self,
        carry: DecoderCarry,
        tok_emb: jax.Array,  # (B, E)
        memory: jax.Array,
        src_mask: jax.Array,
        extra_input_proj: jax.Array = None,
    ):
        """Single decode step (greedy/beam). Deterministic (inference)."""
        emb_proj = self.ih_emb(tok_emb)
        if extra_input_proj is not None:
            emb_proj = emb_proj + extra_input_proj
        new_carry, (attn_h, align) = self.step(carry, emb_proj, memory, src_mask, True)
        return new_carry, (attn_h, align)
