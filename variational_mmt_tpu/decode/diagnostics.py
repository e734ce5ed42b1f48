"""Latent-usage diagnostics: the posterior-collapse instruments.

SURVEY.md §7 names posterior collapse as the central fidelity risk of the
VMMT objective ("KL annealing schedule + word dropout determine whether z
is used at all; must log KL per step to detect"). The training loop logs
total KL per step; this module adds the two standard *per-dimension*
instruments, computed over a held-out corpus:

- **Active units** (Burda et al. 2016, IWAE): ``AU = #{d : Var_x(E_q[z_d|x])
  > delta}`` with delta = 0.01 — the number of latent dimensions whose
  posterior mean actually moves with the input. A collapsed model has
  AU ~ 0 while a healthy one uses a subset of its budget.
- **Per-dim KL**: diagonal Gaussians factorize, so KL(q||p) = sum_d KL_d,
  and the sorted KL_d spectrum shows *which* dims carry information
  (KL_d ~ 0 <=> dim d transmits nothing). Free bits (config
  ``kl_free_bits``) clamps exactly this quantity from below per dim.

Instrument choice matters by prior family (measured, real v5e, 4k-step
q8gate checkpoints): a trained vmmt_c reads AU 64/64 yet KL/sent 0.040
with 0 KL-active dims — under a CONDITIONAL prior the posterior mean
tracks mu_p(x,v), so it varies with the input even when q has collapsed
onto p. Read the per-dim KL spectrum for vmmt_c; AU is the discriminating
instrument for vmmt_f's fixed prior (where input-dependence of the
posterior mean can only come from q using the data).

TPU shape: one jitted stats pass per batch returning per-dim *sums*
(sum mu, sum mu^2, sum KL_d, count); the host aggregates across batches —
variance and thresholding happen once on ~D scalars, so corpus size never
touches device memory.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from variational_mmt_tpu.models.latent import gaussian_kl_per_dim
from variational_mmt_tpu.models.model import VMMTModel


def make_latent_stats_fn(model: VMMTModel) -> Callable:
    """fn(params, batch) -> per-dim sufficient statistics for the batch.

    ``batch`` uses the IW-eval layout (src, tgt_out, example_mask, + img
    for multimodal models). Returns per-dim sums masked by example_mask:
    {"sum_mu", "sum_mu2", "sum_kl"} of shape (D,) plus scalar "n_sents".
    """
    if not model.is_latent:
        raise ValueError(
            "latent diagnostics require a latent model (vmmt_f/vmmt_c)")

    def fn(params, batch):
        src, tgt_out = batch["src"], batch["tgt_out"]
        ex_mask = batch["example_mask"].astype(jnp.float32)
        img = batch.get("img")

        def m_apply(method, *args):
            return model.apply({"params": params}, *args, method=method)

        _, _, _, summary = m_apply(VMMTModel.encode, src)
        mu_q, sigma_q = m_apply(VMMTModel.posterior, summary, tgt_out, img)
        mu_p, sigma_p = m_apply(VMMTModel.prior_params, summary, img)
        kl_d = gaussian_kl_per_dim(
            mu_q.astype(jnp.float32), sigma_q.astype(jnp.float32),
            None if mu_p is None else mu_p.astype(jnp.float32),
            None if sigma_p is None else sigma_p.astype(jnp.float32))
        m = ex_mask[:, None]
        mu32 = mu_q.astype(jnp.float32)
        return {
            "sum_mu": (mu32 * m).sum(axis=0),
            "sum_mu2": (mu32**2 * m).sum(axis=0),
            "sum_kl": (kl_d * m).sum(axis=0),
            "n_sents": ex_mask.sum(),
        }

    return fn


def aggregate_latent_stats(
    stats: List[Dict[str, np.ndarray]], delta: float = 0.01
) -> Dict[str, object]:
    """Host-side reduction of per-batch sufficient statistics.

    Pure NumPy so it is unit-testable against hand-computed values.
    Returns AU, the posterior-mean variance spectrum, and the KL spectrum.
    """
    if not stats:
        raise ValueError("no batches")
    n = float(sum(float(s["n_sents"]) for s in stats))
    if n <= 0:
        raise ValueError("no unmasked sentences")
    sum_mu = np.sum([np.asarray(s["sum_mu"], np.float64) for s in stats], axis=0)
    sum_mu2 = np.sum([np.asarray(s["sum_mu2"], np.float64) for s in stats], axis=0)
    sum_kl = np.sum([np.asarray(s["sum_kl"], np.float64) for s in stats], axis=0)
    mean_mu = sum_mu / n
    # population variance of the posterior mean across the corpus
    var_mu = np.maximum(sum_mu2 / n - mean_mu**2, 0.0)
    kl_d = sum_kl / n
    order = np.argsort(-kl_d)
    return {
        "n_sents": int(n),
        "latent_dim": int(var_mu.shape[0]),
        "au": int((var_mu > delta).sum()),
        "au_delta": float(delta),
        "kl_per_sent": float(kl_d.sum()),
        "kl_active_dims": int((kl_d > 1e-2).sum()),
        "kl_top8": [round(float(kl_d[i]), 4) for i in order[:8]],
        "var_mu_max": float(var_mu.max()),
        "var_mu_median": float(np.median(var_mu)),
    }


def latent_stats_corpus(
    model, params, batches: Iterable, delta: float = 0.01
) -> Dict[str, object]:
    """Run the jitted stats pass over device batches and aggregate.

    ``batches``: iterator of IW-eval-layout batches (decode/iw_eval.py's
    corpus plumbing produces exactly this — reuse it)."""
    fn = jax.jit(make_latent_stats_fn(model))
    host = [jax.device_get(fn(params, b)) for b in batches]
    return aggregate_latent_stats(host, delta=delta)
