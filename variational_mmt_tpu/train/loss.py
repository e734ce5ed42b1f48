"""Multi-task ELBO assembly (SURVEY.md §2.4):

    L = E_q[log p(y|x,z)] - beta * KL(q || p) + gamma * log p(v|z)

- masked token cross-entropy (optionally label-smoothed) replaces the
  reference's sharded NLL (sharding was a GPU-memory workaround; on TPU one
  fused logits+CE over the whole padded batch is both simpler and faster);
- analytic diagonal-Gaussian KL with a jit-safe annealing schedule
  beta(step) and optional free-bits floor;
- image loss variants: 'logprob' (unit-variance Gaussian log-density),
  'mse', 'cosine' (SURVEY.md §2.4 [U-MED] on the reference's exact choice).

The scalar loss is the mean per-sentence negative ELBO; reported stats keep
raw sums (CE sum, token counts) so perplexity/accuracy match the reference's
Statistics semantics.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from variational_mmt_tpu.config import ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import PAD
from variational_mmt_tpu.models.latent import gaussian_kl, gaussian_log_prob, kl_free_bits


def kl_beta(step: jax.Array, cfg: TrainConfig) -> jax.Array:
    """Annealing schedule beta(step): 0 -> 1. Pure/jit-safe."""
    if cfg.kl_anneal == "none":
        return jnp.float32(1.0)
    t = (step - cfg.kl_anneal_start) / jnp.maximum(1.0, cfg.kl_anneal_steps)
    if cfg.kl_anneal == "linear":
        return jnp.clip(t, 0.0, 1.0).astype(jnp.float32)
    # sigmoid: smooth ramp centered mid-schedule
    return jax.nn.sigmoid(10.0 * (t - 0.5)).astype(jnp.float32)


def token_ce(
    logits: jax.Array,  # (B, T, V) float32
    targets: jax.Array,  # (B, T) int32
    token_mask: jax.Array,  # (B, T) float32
    label_smoothing: float = 0.0,
    per_token: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (per-sentence training CE sum (B,), per-sentence raw NLL sum
    (B,), n_correct scalar) — or masked PER-TOKEN (B,T) arrays with
    ``per_token=True`` (sequence packing aggregates per segment instead of
    per row).

    Label smoothing follows the reference convention: confidence 1-eps on
    the gold class, eps spread uniformly over the V-2 classes that are
    neither PAD nor gold. The raw (unsmoothed) NLL is returned alongside so
    reported ppl and the plateau-decay metric stay smoothing-independent.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll_raw = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    nll = nll_raw
    if label_smoothing > 0.0:
        V = logits.shape[-1]
        # sum of logp over classes != gold, != PAD (gold==PAD only on padded
        # positions, which the mask zeroes anyway).
        logp_pad = logp[..., PAD]
        rest = logp.sum(axis=-1) - (-nll_raw) - logp_pad
        smooth = -rest / (V - 2.0)
        nll = (1.0 - label_smoothing) * nll_raw + label_smoothing * smooth
    nll = nll * token_mask
    nll_raw = nll_raw * token_mask
    pred = jnp.argmax(logits, axis=-1)
    n_correct = ((pred == targets) * token_mask).sum()
    if per_token:
        return nll, nll_raw, n_correct
    return nll.sum(axis=-1), nll_raw.sum(axis=-1), n_correct


def image_loss(
    v: jax.Array, v_pred: jax.Array, kind: str
) -> jax.Array:
    """Per-sentence image objective (to *minimize*), (B,)."""
    v = v.astype(jnp.float32)
    if v.ndim == 3:  # conv features: pool regions (matches model input pooling)
        v = v.mean(axis=1)
    if kind == "logprob":
        return -gaussian_log_prob(v, v_pred, jnp.float32(1.0))
    if kind == "mse":
        return ((v - v_pred) ** 2).sum(axis=-1)
    # cosine distance
    num = (v * v_pred).sum(axis=-1)
    den = jnp.linalg.norm(v, axis=-1) * jnp.linalg.norm(v_pred, axis=-1) + 1e-8
    return 1.0 - num / den


def compute_loss(
    out: Dict[str, jax.Array],
    tgt_out: jax.Array,
    example_mask: jax.Array,
    img: Optional[jax.Array],
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    step: jax.Array,
    generator_params: Optional[Dict[str, jax.Array]] = None,
    tgt_seg: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Scalar training loss (mean per-sentence -ELBO) + metric sums.

    ``generator_params``: required when the model ran with ``fused_ce``
    (out carries pre-generator ``dec_out`` instead of ``logits``); the
    generator GEMM is then fused into the chunked CE (ops/fused_ce.py).

    ``tgt_seg`` (B, T): sequence-packed batches. "Sentence" then means
    packed SEGMENT: CE aggregates per segment, and every per-sentence
    tensor in ``out`` (latent params, image prediction) plus
    ``example_mask`` and ``img`` arrives flattened (B·K, ...) — identical
    normalization to an unpacked batch of B·K rows."""
    if tgt_seg is not None:
        K = example_mask.shape[0] // tgt_seg.shape[0]
        token_mask = ((tgt_out != PAD) & (tgt_seg >= 0)).astype(jnp.float32)
    else:
        token_mask = (tgt_out != PAD).astype(jnp.float32) * example_mask[:, None]

    def per_sent(nll_bt):
        """(B,T) masked per-token NLL -> per-sentence sums ((B,) unpacked,
        (B·K,) packed via the one-hot segment matmul)."""
        if tgt_seg is None:
            return nll_bt.sum(axis=-1)
        onehot = (tgt_seg[:, None, :] == jnp.arange(K)[None, :, None]).astype(
            nll_bt.dtype)
        return jnp.einsum("bkt,bt->bk", onehot, nll_bt).reshape(-1)

    if "dec_out" in out:
        from variational_mmt_tpu.ops.fused_ce import fused_generator_ce

        B, T, H = out["dec_out"].shape
        cdt = out["dec_out"].dtype
        nll, nll_raw, n_correct = fused_generator_ce(
            out["dec_out"].reshape(B * T, H),
            generator_params["kernel"].astype(cdt),
            generator_params["bias"],
            tgt_out.reshape(-1),
            token_mask.reshape(-1),
            tcfg.label_smoothing,
        )
        ce_per_sent = per_sent(nll.reshape(B, T))
        nll_per_sent = per_sent(nll_raw.reshape(B, T))
    else:
        ce_tok, nll_tok, n_correct = token_ce(
            out["logits"], tgt_out, token_mask, tcfg.label_smoothing,
            per_token=True,
        )
        ce_per_sent = per_sent(ce_tok)
        nll_per_sent = per_sent(nll_tok)
    n_sents = jnp.maximum(example_mask.sum(), 1.0)
    n_tokens = token_mask.sum()

    loss = ce_per_sent.sum() / n_sents
    # ce_sum reports the RAW NLL (smoothing-independent) so ppl and the
    # plateau metric match the reference's Statistics semantics.
    metrics = {
        "ce_sum": nll_per_sent.sum(),
        "n_tokens": n_tokens,
        "n_correct": n_correct,
        "n_sents": example_mask.sum(),
        "kl_sum": jnp.float32(0.0),
        "img_loss_sum": jnp.float32(0.0),
        "beta": jnp.float32(1.0),
    }

    if "mu_q" in out:
        kl = gaussian_kl(out["mu_q"], out["sigma_q"], out.get("mu_p"), out.get("sigma_p"))
        kl = kl * example_mask
        metrics["kl_sum"] = kl.sum()
        kl = kl_free_bits(kl, tcfg.kl_free_bits, mcfg.latent_dim) * example_mask
        beta = kl_beta(step, tcfg)
        metrics["beta"] = beta
        loss = loss + beta * kl.sum() / n_sents

    if "img_pred" in out and img is not None:
        # prefer the model's own pooled conditioning vector (img_pool='attn'
        # pools with text-conditioned attention; re-pooling here by mean
        # would train p(v|z) against a DIFFERENT target than z saw)
        target = out.get("img_target", img)
        il = image_loss(target, out["img_pred"], mcfg.img_loss) * example_mask
        metrics["img_loss_sum"] = il.sum()
        loss = loss + mcfg.img_loss_weight * il.sum() / n_sents

    metrics["loss"] = loss
    return loss, metrics
