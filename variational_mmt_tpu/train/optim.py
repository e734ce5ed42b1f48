"""Optimizer wrapper — the reference's ``onmt.Optim`` surface
(SURVEY.md §2.1 #12): SGD/Adam/Adadelta selection, gradient-norm clipping,
and multiplicative LR decay on validation-perplexity plateau.

TPU design note: the learning rate is NOT baked into the optax transform —
the transform produces direction-only updates (clip -> scale_by_*) and the
train step multiplies by a *traced* ``lr`` scalar carried in TrainState.
Plateau decay then just writes a new scalar into the state between steps —
no recompilation, no host->device param reload.
"""

from __future__ import annotations

import optax

from variational_mmt_tpu.config import TrainConfig


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Direction-only transform; caller applies -lr * updates."""
    parts = []
    if cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.optimizer == "adam":
        parts.append(optax.scale_by_adam(b1=cfg.adam_beta1, b2=cfg.adam_beta2))
    elif cfg.optimizer == "adadelta":
        parts.append(optax.scale_by_adadelta())
    elif cfg.optimizer == "adagrad":
        # accumulator starts at 0 like the reference's torch Adagrad (optax
        # defaults to 0.1, which damps early updates)
        parts.append(optax.scale_by_rss(initial_accumulator_value=0.0))
    elif cfg.optimizer == "sgd":
        pass  # raw (clipped) gradient
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer}")
    return optax.chain(*parts) if parts else optax.identity()


class PlateauScheduler:
    """Host-side plateau logic matching the reference's
    ``Optim.update_learning_rate`` (SURVEY.md §2.1 #12): decay latches ON
    when validation ppl worsens versus the *previous* validation OR once
    past ``start_decay_at``; after latching, every validation decays.
    """

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.last: float | None = None
        self.start_decay = False

    def update(self, val_metric: float, step: int, lr: float) -> float:
        # start_decay_at <= 0 disables the step-count trigger (decay then
        # latches only on a worsening validation), mirroring the reference's
        # far-future epoch default.
        if self.cfg.start_decay_at > 0 and step >= self.cfg.start_decay_at:
            self.start_decay = True
        if self.last is not None and val_metric > self.last:
            self.start_decay = True
        self.last = val_metric
        return lr * self.cfg.lr_decay if self.start_decay else lr
