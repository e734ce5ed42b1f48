"""Global (Luong) attention — reference's ``onmt.modules.GlobalAttention``
(SURVEY.md §2.1 #8): score variants general/dot/mlp, masked softmax over
source positions, attentional hidden ``h~ = tanh(Wc [ctx; h])``.

Two call shapes:
- single-step (decode loop): query (B, H) -> (B, H) attn hidden + (B, S) align
- sequence (used when input_feed=False): query (B, T, H) in one batched GEMM.
Softmax runs in float32 regardless of compute dtype (TPU numerics rule).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
NEG_INF = -1e9


class GlobalAttention(nn.Module):
    hidden: int
    attn_type: str = "general"  # general | dot | mlp
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.attn_type == "general":
            self.linear_in = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)
        elif self.attn_type == "mlp":
            self.linear_query = nn.Dense(self.hidden, use_bias=True, dtype=self.dtype)
            self.linear_context = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)
            self.v = nn.Dense(1, use_bias=False, dtype=self.dtype)
        # out_bias=False for general/dot matches the reference family
        self.linear_out = nn.Dense(
            self.hidden, use_bias=(self.attn_type == "mlp"), dtype=self.dtype
        )

    def project_memory(self, memory: jax.Array) -> jax.Array:
        """Hoist the loop-invariant memory projection out of the decode/scan
        step. 'general': scores = (q Wq) m^T == q (m Wq^T)^T, so keys =
        m @ Wq^T once per sequence. 'mlp': keys = Wk m (the context half of
        the Bahdanau score) once per sequence. Identity for 'dot'."""
        if self.attn_type == "general":
            if self.is_initializing():
                # materialize linear_in's params (lazy Dense) during init
                self.linear_in(memory[:, :1])
            kernel = self.linear_in.variables["params"]["kernel"]
            return memory @ kernel.T.astype(memory.dtype)
        if self.attn_type == "mlp":
            return self.linear_context(memory)
        return memory

    def scores(self, query: jax.Array, memory: jax.Array, keys=None) -> jax.Array:
        """query (B,T,H), memory (B,S,H) -> (B,T,S)."""
        if self.attn_type in ("general", "dot"):
            if keys is not None:
                return jnp.einsum("bth,bsh->bts", query, keys)
            q = self.linear_in(query) if self.attn_type == "general" else query
            return jnp.einsum("bth,bsh->bts", q, memory)
        # mlp (Bahdanau): v^T tanh(Wq q + Wk m); Wk m may be pre-projected
        q = self.linear_query(query)  # (B,T,H)
        k = keys if keys is not None else self.linear_context(memory)  # (B,S,H)
        T = q.shape[1]
        if T <= 8:  # decode step / tiny sequences: one broadcast is fine
            return self.v(jnp.tanh(q[:, :, None, :] + k[:, None, :, :])).squeeze(-1)
        # full-sequence mode: the (B,T,S,H) tanh broadcast is O(T·S·H) HBM
        # per example AND saved for backward (gigabytes at training shapes)
        # — chunk the query axis so only (B,8,S,H) is ever live
        if self.is_initializing():
            self.v(q[:, :1, None, :])  # materialize v's lazy params
        vk = self.v.variables["params"]["kernel"].astype(q.dtype)  # (H,1)
        c = 8
        pad = (-T) % c
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
        qc = qp.reshape(q.shape[0], -1, c, q.shape[-1]).swapaxes(0, 1)

        def chunk(_, q_c):  # q_c (B,c,H)
            s = jnp.tanh(q_c[:, :, None, :] + k[:, None, :, :]) @ vk
            return 0, s[..., 0]  # (B,c,S)

        _, sc = jax.lax.scan(chunk, 0, qc)
        sc = sc.swapaxes(0, 1).reshape(q.shape[0], -1, k.shape[1])
        return sc[:, :T]

    def __call__(
        self, query: jax.Array, memory: jax.Array, src_mask: jax.Array, keys=None
    ) -> Tuple[jax.Array, jax.Array]:
        """query (B,H) or (B,T,H); memory (B,S,H); src_mask (B,S) 1=real —
        or (B,T,S) for per-query-position masks (sequence packing: each
        target position attends only to its own segment's source tokens).
        ``keys``: optional pre-projected memory from :meth:`project_memory`.

        Returns (attn_hidden same leading shape as query, align weights)."""
        single = query.ndim == 2
        if single:
            query = query[:, None, :]
        align = self.scores(query, memory, keys).astype(jnp.float32)
        mask3 = src_mask if src_mask.ndim == 3 else src_mask[:, None, :]
        align = jnp.where(mask3 > 0, align, NEG_INF)
        align = jax.nn.softmax(align, axis=-1).astype(memory.dtype)
        ctx = jnp.einsum("bts,bsh->bth", align, memory)
        attn_h = jnp.tanh(self.linear_out(jnp.concatenate([ctx, query], axis=-1)))
        if single:
            return attn_h[:, 0], align[:, 0]
        return attn_h, align
