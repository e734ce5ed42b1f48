"""Latent-variable machinery — the fork's core (SURVEY.md §2.1 #10).

- ``InferenceNetwork``: Gaussian q(z|x,y,v) over [source summary; target
  summary; image features] -> (mu_q, sigma_q).
- ``ConditionalPrior``: p(z|x,v) for VMMT_C; VMMT_F uses the fixed N(0, I).
- ``ImagePredictor``: p(v|z) head, the image-feature-prediction side
  objective of the multi-task ELBO.
- reparameterized sampling + analytic diagonal-Gaussian KL.

Sigmas come from softplus with a floor (``min_sigma``) for stability; all
distribution math is float32 even under bfloat16 compute.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class GaussianHead(nn.Module):
    """MLP trunk -> (mu, sigma) of a diagonal Gaussian."""

    latent_dim: int
    hidden: int = 512
    n_layers: int = 1
    min_sigma: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = x
        for i in range(self.n_layers):
            h = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype, name=f"mlp{i}")(h))
        mu = nn.Dense(self.latent_dim, dtype=jnp.float32, name="mu")(h.astype(jnp.float32))
        pre = nn.Dense(self.latent_dim, dtype=jnp.float32, name="sigma")(h.astype(jnp.float32))
        sigma = jax.nn.softplus(pre) + self.min_sigma
        return mu, sigma


class InferenceNetwork(nn.Module):
    """q(z|x,y,v): consumes source summary, target summary, image feats."""

    latent_dim: int
    hidden: int = 512
    min_sigma: float = 1e-3
    use_img: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src_summary, tgt_summary, img) -> Tuple[jax.Array, jax.Array]:
        parts = [src_summary, tgt_summary]
        if self.use_img and img is not None:
            parts.append(img.astype(src_summary.dtype))
        x = jnp.concatenate(parts, axis=-1)
        return GaussianHead(self.latent_dim, self.hidden, 1, self.min_sigma, self.dtype, name="head")(x)


class ConditionalPrior(nn.Module):
    """p(z|x,v): source summary + image feats (VMMT_C)."""

    latent_dim: int
    hidden: int = 512
    min_sigma: float = 1e-3
    use_img: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src_summary, img) -> Tuple[jax.Array, jax.Array]:
        parts = [src_summary]
        if self.use_img and img is not None:
            parts.append(img.astype(src_summary.dtype))
        x = jnp.concatenate(parts, axis=-1)
        return GaussianHead(self.latent_dim, self.hidden, 1, self.min_sigma, self.dtype, name="head")(x)


class RegionAttentionPool(nn.Module):
    """Attention pooling over conv-feature regions (SURVEY.md §2.1 #6: the
    7x7x2048 *local* feature variant): a text-conditioned additive attention
    over the R regions replaces the structure-collapsing mean-pool, so
    q(z|x,y,v) / p(z|x,v) can weight the image regions the sentence is
    about. Enabled via ``ModelConfig.img_pool='attn'``."""

    hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, query: jax.Array) -> jax.Array:
        """img (B, R, D), query (B, H) -> (B, D) pooled features."""
        k = nn.Dense(self.hidden, dtype=self.dtype, name="key")(img.astype(self.dtype))
        q = nn.Dense(self.hidden, dtype=self.dtype, name="query")(query)
        scores = nn.Dense(1, use_bias=False, dtype=self.dtype, name="v")(
            jnp.tanh(k + q[:, None, :])
        )[..., 0]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        return (probs[..., None] * img.astype(jnp.float32)).sum(axis=1)


class ImagePredictor(nn.Module):
    """p(v|z): MLP z -> image-feature vector (2048-d pool5 by default)."""

    img_dim: int = 2048
    hidden: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype, name="mlp0")(z.astype(self.dtype)))
        return nn.Dense(self.img_dim, dtype=jnp.float32, name="out")(h.astype(jnp.float32))


# ----------------------------------------------------------------------
# distribution math (pure functions, float32)
# ----------------------------------------------------------------------
def reparameterize(rng: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + sigma * eps


def gaussian_kl_per_dim(mu_q, sigma_q, mu_p=None, sigma_p=None) -> jax.Array:
    """Analytic KL(q || p) per latent dimension -> (..., D).
    p defaults to N(0, I). Diagonal Gaussians, so the KL factorizes over
    dims — the per-dim vector localizes posterior collapse (a collapsed
    dim has KL_d ~ 0; see decode/diagnostics.py)."""
    if mu_p is None:
        return 0.5 * (sigma_q**2 + mu_q**2 - 1.0 - 2.0 * jnp.log(sigma_q))
    return (
        jnp.log(sigma_p / sigma_q)
        + (sigma_q**2 + (mu_q - mu_p) ** 2) / (2.0 * sigma_p**2)
        - 0.5
    )


def gaussian_kl(mu_q, sigma_q, mu_p=None, sigma_p=None) -> jax.Array:
    """KL(q || p) summed over latent dim -> (B,)."""
    return gaussian_kl_per_dim(mu_q, sigma_q, mu_p, sigma_p).sum(axis=-1)


def gaussian_log_prob(x, mu, sigma) -> jax.Array:
    """log N(x; mu, diag sigma^2) summed over last dim -> (...,)."""
    log2pi = jnp.log(2.0 * jnp.pi)
    return (-0.5 * (((x - mu) / sigma) ** 2 + log2pi) - jnp.log(sigma)).sum(axis=-1)


def kl_free_bits(kl_per_dim_sum: jax.Array, free_bits: float, latent_dim: int) -> jax.Array:
    """Apply a total free-bits floor: max(KL, free_bits * latent_dim)."""
    if free_bits <= 0:
        return kl_per_dim_sum
    return jnp.maximum(kl_per_dim_sum, free_bits * latent_dim)
