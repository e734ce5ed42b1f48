"""K-sample importance-weighted ELBO evaluation (SURVEY.md §3.4, [B] config 5):

    IW_K = log (1/K) sum_k  p(y|x,z_k) * p(v|z_k) * p(z_k|x,v) / q(z_k|x,y,v)

with z_k ~ q. Used for model comparison/selection (tighter bound than the
1-sample ELBO), not for decoding. TPU shape: one jitted function; the K
samples run under ``lax.map`` (memory-bounded — one decoder pass per sample,
K passes total) with per-sample folded PRNG keys.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from variational_mmt_tpu.data.vocab import PAD
from variational_mmt_tpu.models.latent import gaussian_log_prob, reparameterize
from variational_mmt_tpu.models.model import VMMTModel


def make_iw_elbo_fn(model: VMMTModel, k_samples: int) -> Callable:
    """fn(params, batch, rng) -> dict of per-corpus sums. batch needs src,
    tgt_in, tgt_out, example_mask (+ img for multimodal models)."""
    if not model.is_latent:
        raise ValueError("IW-ELBO eval requires a latent model (vmmt_f/vmmt_c)")

    def fn(params, batch, rng):
        src, tgt_in, tgt_out = batch["src"], batch["tgt_in"], batch["tgt_out"]
        ex_mask = batch["example_mask"]
        img = batch.get("img")

        def m_apply(method, *args):
            return model.apply({"params": params}, *args, method=method)

        memory, finals, src_mask, summary = m_apply(VMMTModel.encode, src)
        mu_q, sigma_q = model.apply(
            {"params": params}, summary, tgt_out, img, method=VMMTModel.posterior
        )
        mu_p, sigma_p = m_apply(VMMTModel.prior_params, summary, img)
        tok_mask = (tgt_out != PAD).astype(jnp.float32) * ex_mask[:, None]
        # hoisted: loop-invariant region pooling must not re-run per sample
        v_target = None
        if model.cfg.use_img_predict and img is not None:
            v_target = m_apply(VMMTModel._img_in, img, summary)

        def one_sample(key):
            z = reparameterize(key, mu_q, sigma_q)
            init_hs = m_apply(VMMTModel.init_decoder_state, finals, z)
            logits, _ = model.apply(
                {"params": params}, tgt_in, memory, src_mask, init_hs, z, True,
                method=VMMTModel.decode_train,
            )
            logp_tok = jax.nn.log_softmax(logits, axis=-1)
            ll_y = (
                jnp.take_along_axis(logp_tok, tgt_out[..., None], axis=-1)[..., 0]
                * tok_mask
            ).sum(axis=-1)
            # text-only weight: p(y,z|x)/q(z) — a bound on log p(y|x)
            logw_text = ll_y + gaussian_log_prob(z, mu_p, sigma_p) - gaussian_log_prob(z, mu_q, sigma_q)
            logw_joint = logw_text
            if v_target is not None:
                # the model's own pooling (mean or region-attention) — the
                # joint bound must score p(v|z) on what z conditioned on
                v_pred = m_apply(VMMTModel.predict_img, z)
                # joint weight adds p(v|z): a bound on log p(y,v|x)
                logw_joint = logw_joint + gaussian_log_prob(v_target, v_pred, jnp.float32(1.0))
            return jnp.stack([logw_joint, logw_text])  # (2, B)

        keys = jax.random.split(rng, k_samples)
        logws = jax.lax.map(one_sample, keys)  # (K, 2, B)
        iw = jax.nn.logsumexp(logws, axis=0) - jnp.log(float(k_samples))  # (2, B)
        iw = iw * ex_mask[None, :]
        return {
            "iw_elbo_sum": iw[0].sum(),  # joint bound (model comparison)
            "iw_text_sum": iw[1].sum(),  # text-only bound (-> IW perplexity)
            "n_sents": ex_mask.sum(),
            "n_tokens": tok_mask.sum(),
        }

    return fn


def iw_elbo_corpus(
    model, params, batches, k_samples: int, rng, mesh=None
) -> Dict[str, float]:
    """Aggregate the IW bound over an iterator of device batches.

    ``mesh``: optional device mesh — each batch is sharded on its leading
    axis and GSPMD reduces the per-corpus sums across chips (the outputs
    are scalars, so the only collective is one small all-reduce per batch)."""
    fn = jax.jit(make_iw_elbo_fn(model, k_samples))
    sharding = None
    if mesh is not None and mesh.size > 1:
        from variational_mmt_tpu.parallel.mesh import batch_sharding, replicated_sharding
        from variational_mmt_tpu.parallel.tp import MODEL_AXIS, tree_shardings

        sharding = batch_sharding(mesh)
        if MODEL_AXIS in mesh.axis_names:
            # tensor-parallel eval: vocab-sharded embeddings + generator
            params = jax.device_put(params, tree_shardings(params, mesh))
        else:
            params = jax.device_put(params, replicated_sharding(mesh))
    tot, tot_text, n_sent, n_tok = 0.0, 0.0, 0.0, 0.0
    for i, batch in enumerate(batches):
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        out = fn(params, batch, jax.random.fold_in(rng, i))
        tot += float(out["iw_elbo_sum"])
        tot_text += float(out["iw_text_sum"])
        n_sent += float(out["n_sents"])
        n_tok += float(out["n_tokens"])
    import math

    return {
        "iw_elbo_per_sent": tot / max(1.0, n_sent),  # joint log p(y,v|x) bound
        "iw_text_per_sent": tot_text / max(1.0, n_sent),  # log p(y|x) bound
        "iw_ppl": math.exp(min(-tot_text / max(1.0, n_tok), 100.0)),
        "n_sents": n_sent,
    }
